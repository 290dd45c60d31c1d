"""Unit oracles for the round-3 additions substring_dup_stats (Lee et
al. 2022 exact-substring dedup shape) and dsir_weights (Xie et al. 2023
hashed-ngram importance resampling): full pure-Python recomputes on the
real sf0.001 corpus, independent of both Spark and DuckDB."""

import hashlib
import math
import re
from collections import Counter

SF_DIR = "/root/testdata/sf0.001"


def _toks(text):
    # identical to analytics.base.tokens / string_split_regex(text,'\s+')
    return re.split(r"\s+", text)


def _md5(s):
    return hashlib.md5(s.encode()).hexdigest()


def _docs(spark):
    return {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }


def test_substring_dup_stats_recompute(spark):
    from pdf_extractor_spark.analytics.dedup import (
        SUBSTR_W,
        substring_dup_stats,
    )

    docs = _docs(spark)
    wins = {}  # doc_id -> list of window hashes
    occurrences = Counter()
    for doc_id, text in docs.items():
        t = _toks(text)
        hs = [
            _md5(" ".join(t[i : i + SUBSTR_W]))
            for i in range(len(t) - SUBSTR_W + 1)
        ]
        wins[doc_id] = hs
        occurrences.update(hs)
    dup_set = {h for h, c in occurrences.items() if c > 1}

    out = {r["doc_id"]: r for r in substring_dup_stats(spark, SF_DIR).collect()}
    assert set(out) == set(docs)
    saw_dup = saw_zero_window = False
    for doc_id, hs in wins.items():
        row = out[doc_id]
        want_dup = sum(1 for h in hs if h in dup_set)
        want_tot = len(hs)
        assert row["dup_windows"] == want_dup, doc_id
        assert row["total_windows"] == want_tot, doc_id
        if want_tot:
            want_frac = math.floor(want_dup / want_tot * 10000 + 1e-6) / 10000
        else:
            want_frac = 0.0
            saw_zero_window = True
        assert row["dup_fraction"] == want_frac, doc_id
        saw_dup = saw_dup or want_dup > 0
    # the corpus must actually exercise the operator
    assert saw_dup


def test_dsir_weights_recompute(spark):
    from pdf_extractor_spark.analytics.curation import (
        DSIR_BUCKETS,
        DSIR_TARGET_MAX_ID,
        dsir_weights,
    )

    docs = _docs(spark)
    feats = {}  # doc_id -> list of bucket keys
    for doc_id, text in docs.items():
        t = _toks(text)
        grams = list(t) + [f"{t[i]} {t[i+1]}" for i in range(len(t) - 1)]
        feats[doc_id] = [_md5(g)[:2] for g in grams]

    raw = Counter(b for bs in feats.values() for b in bs)
    tgt = Counter(
        b
        for doc_id, bs in feats.items()
        if doc_id < DSIR_TARGET_MAX_ID
        for b in bs
    )
    nr = sum(raw.values())
    nt = sum(tgt.values())
    logratio = {
        b: math.log((tgt.get(b, 0) + 1.0) / (nt + DSIR_BUCKETS))
        - math.log((raw[b] + 1.0) / (nr + DSIR_BUCKETS))
        for b in raw
    }

    out = {r["doc_id"]: r for r in dsir_weights(spark, SF_DIR).collect()}
    assert set(out) == set(docs)
    for doc_id, bs in feats.items():
        row = out[doc_id]
        assert row["n_feats"] == len(bs), doc_id
        want = sum(logratio[b] for b in bs)
        # fp sum order differs across engines: allow one floor step
        assert abs(row["dsir_weight"] - math.floor(want * 10000 + 1e-6) / 10000) \
            <= 1.0001e-4, doc_id

    # the target stand-in must tilt weights: target docs score higher
    # on their own distribution than the raw pool average
    tgt_mean = sum(
        out[d]["dsir_weight"] for d in out if d < DSIR_TARGET_MAX_ID
    ) / max(1, sum(1 for d in out if d < DSIR_TARGET_MAX_ID))
    pool_mean = sum(r["dsir_weight"] for r in out.values()) / len(out)
    assert tgt_mean >= pool_mean


def test_substring_dedup_rewrite_recompute(spark):
    from pdf_extractor_spark.analytics.dedup import (
        SUBSTR_W,
        substring_dedup_rewrite,
    )

    docs = _docs(spark)
    occ = {}  # h -> list of (doc_id, pos) in any order
    toks = {}
    for doc_id, text in docs.items():
        t = _toks(text)
        toks[doc_id] = t
        for i in range(len(t) - SUBSTR_W + 1):
            h = _md5(" ".join(t[i : i + SUBSTR_W]))
            occ.setdefault(h, []).append((doc_id, i + 1))

    covered = {}  # doc_id -> set of 1-based token indexes removed
    for h, places in occ.items():
        if len(places) < 2:
            continue
        winner = min(places)
        for doc_id, pos in places:
            if (doc_id, pos) == winner:
                continue
            covered.setdefault(doc_id, set()).update(
                range(pos, pos + SUBSTR_W)
            )

    out = {
        r["doc_id"]: r
        for r in substring_dedup_rewrite(spark, SF_DIR).collect()
    }
    assert set(out) == set(docs)
    saw_removed = False
    for doc_id, t in toks.items():
        cut = covered.get(doc_id, set())
        kept = [tok for i, tok in enumerate(t, start=1) if i not in cut]
        row = out[doc_id]
        assert row["n_tokens"] == len(t), doc_id
        assert row["n_removed"] == len(t) - len(kept), doc_id
        assert row["dedup_text_md5"] == _md5(" ".join(kept)), doc_id
        saw_removed = saw_removed or row["n_removed"] > 0
    assert saw_removed  # the corpus must actually exercise removal


def test_tfidf_keywords_recompute(spark):
    from pdf_extractor_spark.analytics.textstats import (
        TFIDF_TOP_K,
        tfidf_keywords,
    )

    docs = _docs(spark)
    tf = {}
    df = Counter()
    for doc_id, text in docs.items():
        c = Counter(_toks(text))
        tf[doc_id] = c
        df.update(c.keys())
    n = len(docs)

    want = {}
    for doc_id, c in tf.items():
        scored = []
        for term, k in c.items():
            raw = k * (math.log((n + 1.0) / (df[term] + 1.0)) + 1.0)
            scored.append(
                (math.floor(raw * 10000 + 1e-6) / 10000, term, k)
            )
        scored.sort(key=lambda x: (-x[0], x[1]))
        want[doc_id] = [
            (r + 1, term, k, df[term], s)
            for r, (s, term, k) in enumerate(scored[:TFIDF_TOP_K])
        ]

    out = {}
    for r in tfidf_keywords(spark, SF_DIR).collect():
        out.setdefault(r["doc_id"], []).append(
            (r["rank"], r["term"], r["tf"], r["df"], r["tfidf"])
        )
    for doc_id in out:
        out[doc_id].sort()
    assert out == want


def test_search_results_log_format(spark):
    """Formatting parity with the reference's log line (bm25 call
    site): recompute each display line in pure Python from the graded
    bm25 top-10 + raw docs (bm25 numeric correctness has its own
    oracle gate; this pins enumeration, truncation quirk, tag join,
    and %.4f rendering)."""
    from pdf_extractor_spark.analytics.textstats import (
        _TAG_KEYWORDS,
        bm25_search,
        search_results_log,
    )

    docs = _docs(spark)
    top = sorted(
        [(r["doc_id"], r["bm25"]) for r in bm25_search(spark, SF_DIR).collect()],
        key=lambda x: (-x[1], x[0]),
    )
    want = []
    for i, (doc_id, score) in enumerate(top, start=1):
        text = docs[doc_id]
        problem = text[:80] + "..."
        toks = set(_toks(text))
        tags = ", ".join(k for k in _TAG_KEYWORDS if k in toks)
        want.append(
            (i, doc_id,
             f"  {i}. Score: {score:.4f} | Key: {doc_id} | "
             f"Problem: {problem} | Tags: [{tags}]")
        )

    got = [
        (r["pos"], r["doc_id"], r["line"])
        for r in search_results_log(spark, SF_DIR).collect()
    ]
    assert got == want
    assert any(t[2].rstrip("]").endswith(("spark", "vector", "stream", "hash"))
               for t in got)  # tags actually render


def test_bloom_decontaminate_recompute(spark):
    """Pure-Python bloom recompute + the FP envelope: bloom hits must
    be a superset of exact hits, and the corpus must actually contain
    at least one contaminated doc and one clean doc."""
    from pdf_extractor_spark.analytics.curation import (
        BLOOM_K,
        BLOOM_M,
        DECON_BENCH_MAX_ID,
        DECON_N,
        bloom_decontaminate,
    )

    docs = _docs(spark)

    def grams(text):
        t = _toks(text)
        return [
            " ".join(t[i : i + DECON_N])
            for i in range(len(t) - DECON_N + 1)
        ]

    def positions(g):
        return [
            int(_md5(f"{j}|{g}")[:8], 16) % BLOOM_M for j in range(BLOOM_K)
        ]

    bench = {
        g
        for d, text in docs.items()
        if d < DECON_BENCH_MAX_ID
        for g in grams(text)
    }
    bits = {p for g in bench for p in positions(g)}

    want = {}
    for d, text in docs.items():
        if d < DECON_BENCH_MAX_ID:
            continue
        gs = grams(text)
        if not gs:
            continue
        n_bloom = sum(1 for g in gs if all(p in bits for p in positions(g)))
        n_exact = sum(1 for g in gs if g in bench)
        want[d] = (len(gs), n_bloom, n_exact, n_bloom > 0)

    out = {
        r["doc_id"]: (
            r["n_grams"],
            r["n_bloom_hits"],
            r["n_exact_hits"],
            r["flagged"],
        )
        for r in bloom_decontaminate(spark, SF_DIR).collect()
    }
    assert out == want
    assert all(b >= e for _, b, e, _ in want.values())  # FP envelope
    assert any(f for *_, f in want.values())
    assert any(not f for *_, f in want.values())


def test_shingle_containment_recompute_and_dups(spark):
    """Every returned pair's containment values recomputed from raw
    text (independent of the candidate machinery); injected exact dups
    must surface as mutual 1.0/1.0 pairs."""
    from pdf_extractor_spark.analytics.dedup import (
        CONTAIN_THRESHOLD,
        DUP_ID_OFFSET,
        N_INJECTED_DUPS,
        SHINGLE,
        shingle_containment_pairs,
    )

    docs = _docs(spark)

    def shset(doc_id):
        base = doc_id - DUP_ID_OFFSET if doc_id >= DUP_ID_OFFSET else doc_id
        t = _toks(docs[base])
        return {
            " ".join(t[i : i + SHINGLE])
            for i in range(max(len(t) - SHINGLE + 1, 0))
        } or {docs[base]}  # mirror _shingles' short-doc fallback

    rows = shingle_containment_pairs(spark, SF_DIR).collect()
    assert rows
    seen = set()
    for r in rows:
        a, b = shset(r["a_id"]), shset(r["b_id"])
        inter = len(a & b)
        ca = math.floor(inter / len(a) * 10000 + 1e-6) / 10000
        cb = math.floor(inter / len(b) * 10000 + 1e-6) / 10000
        assert r["containment_a"] == ca, (r["a_id"], r["b_id"])
        assert r["containment_b"] == cb, (r["a_id"], r["b_id"])
        assert max(ca, cb) >= CONTAIN_THRESHOLD
        want_dir = (
            "a_in_b" if ca > cb else "b_in_a" if ca < cb else "mutual"
        )
        assert r["direction"] == want_dir
        seen.add((r["a_id"], r["b_id"]))
    for i in range(N_INJECTED_DUPS):
        assert (i, i + DUP_ID_OFFSET) in seen, f"dup {i} missed"


def test_cluster_profile_recompute(spark):
    """numpy recompute of the seeded assignment + per-cluster stats."""
    import numpy as np

    from pdf_extractor_spark.analytics.similarity import (
        SEMDEDUP_K,
        cluster_profile,
    )

    rows = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=float) for r in rows}
    seeds = {i: vecs[i] for i in sorted(vecs) if i < SEMDEDUP_K}

    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na == 0 or nb == 0:
            return -2.0
        return float(np.dot(a, b) / (na * nb))

    per_cluster = {}
    for vid, v in vecs.items():
        scored = [(cos(v, s), -sid) for sid, s in seeds.items()]
        c, nid = max(scored)
        per_cluster.setdefault(-nid, []).append(c)

    out = {r["cluster"]: r for r in cluster_profile(spark, SF_DIR).collect()}
    assert set(out) == set(per_cluster)
    for cl, cs in per_cluster.items():
        row = out[cl]
        real = [c for c in cs if c != -2.0]
        assert row["n_vectors"] == len(cs)
        assert row["n_junk"] == len(cs) - len(real)
        if real:
            # floor4 boundary: allow one grid step for fp sum-order noise
            assert abs(row["min_cos"] - math.floor(min(real) * 10000 + 1e-6) / 10000) <= 1.0001e-4
            want_mean = math.floor(sum(real) / len(real) * 10000 + 1e-6) / 10000
            assert abs(row["mean_cos"] - want_mean) <= 1.0001e-4
    # populations must cover the whole table
    assert sum(r["n_vectors"] for r in out.values()) == len(vecs)
