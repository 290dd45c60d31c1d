

def test_truncate_by_tokens_recompute(spark):
    """Head+tail truncation matches a pure-Python recompute of the
    reference rule (spacy_utils.py:87-100 under the \\S+ proxy) on
    within-budget, over-budget, empty, and NULL docs."""
    import pyspark.sql.functions as F

    from pdf_extractor_spark.analytics.curation import (
        TRUNC_MAX_TOKENS,
        truncate_by_tokens,
    )

    sf_dir = "/root/testdata/sf0.001"
    out = {r["doc_id"]: r for r in truncate_by_tokens(spark, sf_dir).collect()}
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    half = TRUNC_MAX_TOKENS // 2
    saw_long = saw_short = False
    for doc_id, text in docs.items():
        row = out[doc_id]
        if text is None:
            assert row["n_tokens"] is None and row["truncated"] is None
            continue
        toks = text.split()
        assert row["n_tokens"] == len(toks)
        if len(toks) <= TRUNC_MAX_TOKENS:
            saw_short = True
            assert row["truncated"] == text
        else:
            saw_long = True
            want = " ".join(toks[:half]) + "... " + " ".join(toks[-half:])
            assert row["truncated"] == want
    assert saw_long and saw_short  # fixture exercises both branches


def test_language_mix_sample_recompute(spark):
    """Selection is the exact pure function of (doc_id, lang) the mixer
    documents: rates = share * M / count with M = min(count/share);
    accept iff the 8-hex md5 fraction clears the language's rate. Full
    recompute in Python, plus the binding language keeps EVERY doc."""
    import hashlib

    from pdf_extractor_spark.analytics.curation import (
        TARGET_MIX,
        language_mix_sample,
    )

    sf_dir = "/root/testdata/sf0.001"
    got = {
        r["doc_id"]: r["lang"]
        for r in language_mix_sample(spark, sf_dir).collect()
    }
    docs = {
        r["doc_id"]: r["lang"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "lang")
        .collect()
    }
    counts = {}
    for lang in docs.values():
        if lang in TARGET_MIX:
            counts[lang] = counts.get(lang, 0) + 1
    m = min(counts[lang] / TARGET_MIX[lang] for lang in counts)
    rates = {lang: TARGET_MIX[lang] * m / counts[lang] for lang in counts}
    binding = min(rates, key=lambda lg: abs(rates[lg] - 1.0))

    want = {}
    for doc_id, lang in docs.items():
        if lang not in rates:
            continue
        frac = (
            int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
            / 4294967296.0
        )
        if frac < rates[lang]:
            want[doc_id] = lang
    assert got == want
    # the binding language is kept whole (rate exactly 1.0)
    assert rates[binding] == 1.0
    kept_binding = sum(1 for lg in got.values() if lg == binding)
    assert kept_binding == counts[binding]
    # no out-of-target language leaks through
    assert set(got.values()) <= set(TARGET_MIX)


def test_curriculum_buckets_invariants(spark):
    """Exact ntile recompute per language: bucket sizes differ by at
    most one, deciles are monotone in (quality, doc_id) order, and
    every doc appears exactly once."""
    from pdf_extractor_spark.analytics.curation import (
        CURRICULUM_BUCKETS,
        curriculum_buckets,
    )

    sf_dir = "/root/testdata/sf0.001"
    rows = curriculum_buckets(spark, sf_dir).collect()
    n_docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    )
    assert len(rows) == n_docs
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: (
            (0, r["quality"]) if r["quality"] is not None else (1, 0.0),
            r["doc_id"],
        ))
        n = len(rs)
        base, extra = divmod(n, CURRICULUM_BUCKETS)
        want = []
        for b in range(1, CURRICULUM_BUCKETS + 1):
            want += [b] * (base + (1 if b <= extra else 0))
        got = [r["decile"] for r in rs]
        assert got == want[:n], (lang, got[:20], want[:20])


def test_shuffle_shard_invariants(spark):
    """The shard export is a valid permutation: every doc appears
    exactly once, positions within each shard are 0..n-1 dense, the
    within-shard order follows the salted sort key, the split ratio is
    ~90/5/5, and — the resharding guarantee — split assignment is a
    pure function of doc_id alone (recomputing with a different
    N_SHARDS moves shard membership but never the split)."""
    import hashlib

    from pdf_extractor_spark.analytics.curation import (
        N_SHARDS,
        SPLIT_TRAIN_PCT,
        shuffle_shard_assign,
    )

    sf_dir = "/root/testdata/sf0.001"
    rows = shuffle_shard_assign(spark, sf_dir).collect()
    n = len(rows)
    assert len({r["doc_id"] for r in rows}) == n  # permutation, no dup

    def h(salt, did):
        return int(
            hashlib.md5(f"{salt}|{did}".encode()).hexdigest()[:8], 16
        )

    by_shard = {}
    for r in rows:
        assert r["shard_id"] == h("shard", r["doc_id"]) % N_SHARDS
        pct = h("split", r["doc_id"]) % 100
        want = (
            "train" if pct < SPLIT_TRAIN_PCT
            else "valid" if pct < SPLIT_TRAIN_PCT + 5 else "test"
        )
        assert r["split"] == want  # split independent of shard count
        by_shard.setdefault(r["shard_id"], []).append(r)
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r["pos"])
        assert [r["pos"] for r in shard_rows] == list(range(len(shard_rows)))
        keys = [
            hashlib.md5(f"order|{r['doc_id']}".encode()).hexdigest()
            for r in shard_rows
        ]
        assert keys == sorted(keys)  # within-shard order = sort key
    n_train = sum(1 for r in rows if r["split"] == "train")
    assert 0.80 * n <= n_train <= 0.97 * n  # hash split ≈ 90%


def test_domain_cap_two_level_equals_single_window(spark):
    """The two-level (bucketed) tournament keeps EXACTLY the global
    top-K per source that a single window would (containment proof
    exercised on real data), caps every source at K, and ranks follow
    the salted-hash order."""
    import hashlib

    from pdf_extractor_spark.analytics.curation import (
        DOMCAP_K,
        domain_cap_sample,
    )

    sf_dir = "/root/testdata/sf0.001"
    rows = domain_cap_sample(spark, sf_dir).collect()
    docs = [
        (r["doc_id"], r["source"])
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "source").collect()
    ]
    by_src = {}
    for did, src in docs:
        key = hashlib.md5(f"domcap|{did}".encode()).hexdigest()
        by_src.setdefault(src, []).append((key, did))
    want = {}
    for src, lst in by_src.items():
        lst.sort()
        for rank, (_, did) in enumerate(lst[:DOMCAP_K], 1):
            want[did] = (src, rank, len(lst))
    got = {
        r["doc_id"]: (r["source"], r["rank_in_source"], r["n_source_docs"])
        for r in rows
    }
    assert got == want
    counts = {}
    for src, _, _ in got.values():
        counts[src] = counts.get(src, 0) + 1
    assert all(c <= DOMCAP_K for c in counts.values())
    assert any(n > DOMCAP_K for _, _, n in got.values())  # cap did cut


def test_unimax_matches_sequential_waterfill(spark):
    """The closed-form allocation equals a literal sequential waterfill
    (cap ascending languages while affordable, share the rest), spends
    the whole budget when any language is share-bound, and never
    exceeds the epoch cap."""
    import math

    from pdf_extractor_spark.analytics.curation import (
        UNIMAX_BUDGET_FACTOR,
        UNIMAX_EPOCH_CAP,
        unimax_allocation,
    )

    sf_dir = "/root/testdata/sf0.001"
    rows = {r["lang"]: r for r in unimax_allocation(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    sizes = {}
    for r in docs:
        import re
        sizes[r["lang"]] = sizes.get(r["lang"], 0) + len(
            re.split(r"\s+", r["text"])
        )
    budget = math.floor(UNIMAX_BUDGET_FACTOR * sum(sizes.values()))
    order = sorted(sizes, key=lambda l: (sizes[l], l))
    # literal sequential waterfill
    alloc, remaining = {}, budget
    langs_left = list(order)
    while langs_left:
        lang = langs_left[0]
        cap = UNIMAX_EPOCH_CAP * sizes[lang]
        share = remaining / len(langs_left)
        if cap <= share:
            alloc[lang] = cap
            remaining -= cap
            langs_left.pop(0)
        else:
            for l in langs_left:
                alloc[l] = share
            langs_left = []
    for lang, r in rows.items():
        assert r["alloc_tokens"] == math.floor(alloc[lang]), lang
        assert r["epochs"] <= UNIMAX_EPOCH_CAP + 1e-9
        assert r["capped"] == (
            math.isclose(alloc[lang], UNIMAX_EPOCH_CAP * sizes[lang])
        ), lang
    assert any(r["capped"] for r in rows.values())
    assert any(not r["capped"] for r in rows.values())


def test_weighted_sample_es_recompute(spark):
    """The distributed top-N equals a pure-Python E-S priority sample
    on the same weights and salted uniforms (exact, not statistical)."""
    import hashlib
    import math
    import re

    from pdf_extractor_spark.analytics.curation import (
        WS_N,
        weighted_sample_es,
    )

    sf_dir = "/root/testdata/sf0.001"
    got = [r["doc_id"] for r in weighted_sample_es(spark, sf_dir).collect()]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    pri = []
    for r in docs:
        n = len(re.split(r"\s+", r["text"]))
        w = math.log(2.0 + n)
        h = int(
            hashlib.md5(f"essample|{r['doc_id']}".encode()).hexdigest()[:8],
            16,
        )
        u = (h + 0.5) / 4294967296.0
        key = math.floor(math.log(u) / w * 1e8 + 1e-6) / 1e8
        pri.append((-key, r["doc_id"]))
    pri.sort()
    want = [d for _, d in pri[:WS_N]]
    assert got == want
    # heavier docs are overrepresented vs uniform (weighted semantics)
    lens = {r["doc_id"]: len(re.split(r"\s+", r["text"])) for r in docs}
    mean_all = sum(lens.values()) / len(lens)
    mean_sample = sum(lens[d] for d in got) / len(got)
    assert mean_sample > mean_all


def test_bottomk_sample_is_mergeable(spark):
    """R4-21: bottom-k of a union equals bottom-k of per-partition
    bottom-ks — the property that makes the sample maintainable without
    reshuffling the corpus (each executor ships at most K rows)."""
    import pyspark.sql.functions as F

    from pdf_extractor_spark.analytics.curation import (
        BOTTOMK_K,
        bottomk_hash_sample,
    )

    sf_dir = "/root/testdata/sf0.001"
    full = [r["doc_id"] for r in bottomk_hash_sample(spark, sf_dir).collect()]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    h = F.md5(F.concat(F.lit("bk|"), F.col("doc_id").cast("string")))
    hashed = docs.select("doc_id", h.alias("h"))
    parts = []
    for m in (0, 1, 2):  # three disjoint "partitions"
        parts.append(
            hashed.where(F.col("doc_id") % 3 == m)
            .orderBy("h", "doc_id").limit(BOTTOMK_K)
        )
    merged = parts[0].union(parts[1]).union(parts[2])
    remerged = [
        r["doc_id"]
        for r in merged.orderBy("h", "doc_id").limit(BOTTOMK_K).collect()
    ]
    assert remerged == full
    # deterministic: same sample on a re-run
    again = [r["doc_id"] for r in bottomk_hash_sample(spark, sf_dir).collect()]
    assert again == full


def test_train_test_overlap_consistent_with_decontaminate(spark):
    """R4-20: severity degrades to decontaminate's binary flag —
    overlap_ratio > 0 exactly when the doc is flagged contaminated —
    and the ratio is a valid fraction of the doc's distinct grams."""
    from pdf_extractor_spark.analytics.curation import (
        decontaminate,
        train_test_overlap,
    )

    sf_dir = "/root/testdata/sf0.001"
    flags = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate(spark, sf_dir).collect()
    }
    rows = train_test_overlap(spark, sf_dir).collect()
    assert {r["doc_id"] for r in rows} == set(flags)
    saw_hit = saw_clean = False
    for r in rows:
        assert 0 <= r["n_hit"] <= r["n_grams"]
        assert (r["n_hit"] > 0) == flags[r["doc_id"]]
        assert (r["overlap_ratio"] > 0) == flags[r["doc_id"]]
        saw_hit |= r["n_hit"] > 0
        saw_clean |= r["n_hit"] == 0
    assert saw_hit and saw_clean  # fixture exercises both branches


def test_length_buckets_cover_and_bound(spark):
    """R4-22: every doc lands in the unique power-of-2 bucket with
    bucket/2 < ntok <= bucket, totals add up, and pad_efficiency is in
    (0.5, 1] by construction (tokens always exceed half the bucket)."""
    import pyspark.sql.functions as F

    from pdf_extractor_spark.analytics.curation import length_bucket_pack

    sf_dir = "/root/testdata/sf0.001"
    rows = length_bucket_pack(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ntoks = [
        r["n"]
        for r in docs.select(
            F.size(F.filter(F.split("text", r"\s+"), lambda t: t != "")).alias("n")
        ).collect()
        if r["n"] > 0
    ]
    assert sum(r["n_docs"] for r in rows) == len(ntoks)
    assert sum(r["sum_tokens"] for r in rows) == sum(ntoks)
    for r in rows:
        b = r["seq_bucket"]
        assert b & (b - 1) == 0  # power of two
        members = [n for n in ntoks if (b // 2 if b > 1 else 0) < n <= b]
        assert r["n_docs"] == len(members)
        assert 0.5 < r["pad_efficiency"] <= 1.0


def test_token_entropy_recompute_and_bounds(spark):
    """R4-27: entropy equals a pure-Python recompute and sits in
    [0, log2(n_distinct)]; constant-token docs (if any) score 0."""
    import math
    import re
    from collections import Counter

    from pdf_extractor_spark.analytics.textstats import token_entropy

    sf_dir = "/root/testdata/sf0.001"
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    rows = token_entropy(spark, sf_dir).collect()
    assert {r["doc_id"] for r in rows} == set(docs)
    for r in rows:
        toks = [t for t in re.split(r"\s+", docs[r["doc_id"]] or "") if t != ""]
        assert r["n_tokens"] == len(toks)
        assert r["n_distinct"] == len(set(toks))
        if not toks:
            assert r["entropy"] is None
            continue
        n = len(toks)
        clogc = sum(c * math.log2(c) for c in Counter(toks).values())
        want = math.floor((math.log2(n) - clogc / n) * 10000 + 1e-6) / 10000
        assert abs(r["entropy"] - want) < 1e-9
        assert -1e-9 <= r["entropy"] <= math.log2(max(r["n_distinct"], 1)) + 1e-9


def test_global_rank_matches_single_window_and_range_join_recompute(spark):
    """R4-28: offset ranking equals the naive global sort's ranks.
    R4-26: window counts equal a pure-Python interval scan."""
    from pdf_extractor_spark.analytics.relational import (
        RANGE_WINDOW_US,
        events_range_join,
        global_rank_offset,
    )

    sf_dir = "/root/testdata/sf0.001"
    got = {
        r["doc_id"]: (r["global_rank"], r["percentile"])
        for r in global_rank_offset(spark, sf_dir).collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "n_chars"
    ).collect()
    order = sorted(docs, key=lambda r: (r["n_chars"], r["doc_id"]))
    assert len(got) == len(order)
    for i, r in enumerate(order, start=1):
        assert got[r["doc_id"]][0] == i

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    import datetime as dt

    def us(ts):
        return int(ts.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)

    by_user = {}
    for e in ev:
        by_user.setdefault(e["user_id"], []).append(e)
    want = {}
    for e in ev:
        if e["event_type"] != "purchase":
            continue
        t0 = us(e["ts"])
        want[e["event_id"]] = sum(
            1
            for o in by_user[e["user_id"]]
            if o["event_type"] != "purchase" and t0 <= us(o["ts"]) < t0 + RANGE_WINDOW_US
        )
    rows = {r["window_id"]: r["n_in_window"] for r in events_range_join(spark, sf_dir).collect()}
    assert rows == want and len(want) > 0


def test_cohort_retention_recompute(spark):
    """R4-30: the retention matrix equals a pure-Python cohort scan;
    offset-0 retention is 1.0 by construction (first week is active)."""
    import math

    from pdf_extractor_spark.analytics.relational import cohort_retention

    sf_dir = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "ts"
    ).collect()

    def week(ts):
        d = ts.date()
        monday = d.fromordinal(d.toordinal() - d.weekday())
        return monday

    first = {}
    weeks = set()
    for e in ev:
        w = week(e["ts"])
        weeks.add((e["user_id"], w))
        if e["user_id"] not in first or w < first[e["user_id"]]:
            first[e["user_id"]] = w
    sizes = {}
    for c in first.values():
        sizes[c] = sizes.get(c, 0) + 1
    cells = {}
    for u, w in weeks:
        key = (first[u], (w - first[u]).days // 7)
        cells[key] = cells.get(key, 0) + 1
    rows = cohort_retention(spark, sf_dir).collect()
    got = {
        (r["cohort_week"], r["week_offset"]): (
            r["cohort_size"], r["active_users"], r["retention"]
        )
        for r in rows
    }
    assert len(got) == len(cells) > 0
    for (cw, off), n in cells.items():
        size, active, ret = got[(cw.strftime("%Y-%m-%d"), off)]
        assert size == sizes[cw] and active == n
        want = math.floor(n / sizes[cw] * 10000 + 1e-6) / 10000
        assert abs(ret - want) < 1e-9
        if off == 0:
            assert abs(ret - 1.0) < 1e-9  # every user is active in week 0


def test_pmi_collocations_recompute(spark):
    """R4-31: PMI scores equal a pure-Python bigram recompute and the
    min-count floor holds."""
    import math
    import re
    from collections import Counter

    from pdf_extractor_spark.analytics.textstats import (
        PMI_MIN_COUNT,
        pmi_collocations,
    )

    sf_dir = "/root/testdata/sf0.001"
    texts = [
        r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("text")
        .collect()
    ]
    uni, bg = Counter(), Counter()
    for t in texts:
        toks = [x for x in re.split(r"\s+", t or "") if x != ""]
        if len(toks) < 2:
            continue
        uni.update(toks)
        bg.update(zip(toks, toks[1:]))
    t_total, b_total = sum(uni.values()), sum(bg.values())
    rows = pmi_collocations(spark, sf_dir).collect()
    want_keys = {k for k, c in bg.items() if c >= PMI_MIN_COUNT}
    assert {(r["w1"], r["w2"]) for r in rows} == want_keys and want_keys
    for r in rows:
        c = bg[(r["w1"], r["w2"])]
        assert r["c_pair"] == c >= PMI_MIN_COUNT
        assert r["c1"] == uni[r["w1"]] and r["c2"] == uni[r["w2"]]
        pmi = math.log2(
            (c / b_total)
            / ((uni[r["w1"]] / t_total) * (uni[r["w2"]] / t_total))
        )
        want = math.floor(pmi * 10000 + 1e-6) / 10000
        assert abs(r["pmi"] - want) < 1e-9


def test_exact_group_median_recompute(spark):
    """R4-35: histogram-walk median/p90 equal a pure-Python sort."""
    import math

    from pdf_extractor_spark.analytics.relational import exact_group_median

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "lang", "n_chars"
    ).collect()
    by_lang = {}
    for r in docs:
        by_lang.setdefault(r["lang"], []).append(r["n_chars"])
    rows = exact_group_median(spark, sf_dir).collect()
    assert {r["lang"] for r in rows} == set(by_lang)
    for r in rows:
        vals = sorted(by_lang[r["lang"]])
        n = len(vals)
        assert r["n_docs"] == n
        lo = vals[math.floor((n + 1) / 2) - 1]
        hi = vals[math.ceil((n + 1) / 2) - 1]
        want_med = math.floor((lo + hi) / 2.0 * 10000 + 1e-6) / 10000
        assert abs(r["median"] - want_med) < 1e-9
        assert r["p90"] == vals[math.ceil(n * 0.9) - 1]


def test_skipgram_pairs_recompute(spark):
    """R4-36: pair counts and subsampling expectations equal a
    pure-Python window walk; the table is symmetric in (center,
    context) counts."""
    import math
    import re
    from collections import Counter

    from pdf_extractor_spark.analytics.textstats import (
        SKIPGRAM_MIN_PAIRS,
        SKIPGRAM_T,
        SKIPGRAM_WINDOW,
        skipgram_pairs,
    )

    sf_dir = "/root/testdata/sf0.001"
    texts = [
        r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("text")
        .collect()
    ]
    uni, pairs = Counter(), Counter()
    for t in texts:
        toks = [x for x in re.split(r"\s+", t or "") if x != ""]
        if len(toks) < 2:
            continue
        uni.update(toks)
        for i, w in enumerate(toks):
            for d in range(1, SKIPGRAM_WINDOW + 1):
                if i + d < len(toks):
                    pairs[(w, toks[i + d])] += 1
                    pairs[(toks[i + d], w)] += 1
    t_total = sum(uni.values())

    def keep(w):
        return min(1.0, math.sqrt(SKIPGRAM_T / (uni[w] / t_total)))

    rows = skipgram_pairs(spark, sf_dir).collect()
    want_keys = {k for k, c in pairs.items() if c >= SKIPGRAM_MIN_PAIRS}
    got = {(r["center"], r["context"]): (r["n_pairs"], r["expected_count"])
           for r in rows}
    assert set(got) == want_keys and want_keys
    for (c, x), (n, e) in got.items():
        assert n == pairs[(c, x)]
        want = math.floor(n * keep(c) * keep(x) * 10000 + 1e-6) / 10000
        assert abs(e - want) < 1e-9
        # symmetry of the raw counts
        if (x, c) in got:
            assert got[(x, c)][0] == n


def test_content_defined_chunks_recompute_and_shift_invariance(spark):
    """R4-39: chunks equal a pure-Python boundary walk, and the CDC
    property holds — the same token sequence yields the same interior
    chunk fingerprints wherever it appears."""
    import hashlib
    import re

    from pdf_extractor_spark.analytics.curation import (
        CDC_GATE,
        content_defined_chunks,
    )

    sf_dir = "/root/testdata/sf0.001"
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }

    def boundary(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % CDC_GATE == 0

    want = []
    for did in sorted(docs):
        toks = [t for t in re.split(r"\s+", docs[did] or "") if t != ""]
        if not toks:
            continue
        chunks, cur = [], []
        for t in toks:
            cur.append(t)
            if boundary(t):
                chunks.append(cur)
                cur = []
        if cur:
            chunks.append(cur)
        for i, ch in enumerate(chunks):
            want.append(
                (did, i, len(ch),
                 hashlib.md5(" ".join(ch).encode()).hexdigest())
            )
    got = [
        (r["doc_id"], r["chunk_idx"], r["n_tokens"], r["fingerprint"])
        for r in content_defined_chunks(spark, sf_dir).collect()
    ]
    assert sorted(got) == sorted(want) and want
    # shift invariance: a boundary-terminated chunk's fingerprint is a
    # pure function of its content — identical fingerprints must carry
    # identical token counts wherever (and in whichever doc) they occur
    sizes = {}
    for _, _, n, fp in got:
        assert sizes.setdefault(fp, n) == n


def test_last_touch_attribution_recompute(spark):
    """R4-41: channel credit equals a pure-Python stream walk with the
    same tie rule (same-timestamp touch attributes to the purchase)."""
    import math

    from pdf_extractor_spark.analytics.relational import (
        ATTR_WINDOW_US,
        last_touch_attribution,
    )

    sf_dir = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "ts", "event_type"
    ).collect()
    import datetime as dt

    def us(ts):
        return int(ts.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)

    by_user = {}
    for e in ev:
        if e["event_type"] in ("view", "click", "purchase"):
            by_user.setdefault(e["user_id"], []).append(e)
    credit, lags = {}, {}
    for u, es in by_user.items():
        es.sort(key=lambda e: (us(e["ts"]),
                               e["event_type"] == "purchase", e["event_id"]))
        last = None
        for e in es:
            if e["event_type"] != "purchase":
                last = e
            else:
                if last is not None and us(e["ts"]) - us(last["ts"]) <= ATTR_WINDOW_US:
                    ch = last["event_type"]
                    lags.setdefault(ch, []).append(
                        (us(e["ts"]) - us(last["ts"])) / 60_000_000.0
                    )
                else:
                    ch = "none"
                credit[ch] = credit.get(ch, 0) + 1
    rows = last_touch_attribution(spark, sf_dir).collect()
    got = {r["channel"]: (r["n_purchases"], r["avg_lag_min"]) for r in rows}
    assert {c: n for c, n in credit.items()} == {
        c: v[0] for c, v in got.items()
    }
    for ch, ls in lags.items():
        want = math.floor(sum(ls) / len(ls) * 10000 + 1e-6) / 10000
        assert abs(got[ch][1] - want) < 1e-9


def test_doc_novelty_bounds_and_duplicate_docs_not_novel(spark):
    """R4-43: novelty ∈ [0, 1]; docs sharing every shingle with another
    doc (if any exact text dup exists) score 0; short docs are NULL."""
    import re

    from pdf_extractor_spark.analytics.curation import (
        DECON_N,
        doc_novelty_score,
    )

    sf_dir = "/root/testdata/sf0.001"
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    rows = {r["doc_id"]: r for r in doc_novelty_score(spark, sf_dir).collect()}
    assert set(rows) == set(docs)
    # recompute exactly
    shingles = {}
    for did, t in docs.items():
        toks = re.split(r"\s+", t or "")
        gs = {
            " ".join(toks[i:i + DECON_N])
            for i in range(max(len(toks) - DECON_N + 1, 0))
        }
        shingles[did] = gs
    df = {}
    for gs in shingles.values():
        for g in gs:
            df[g] = df.get(g, 0) + 1
    for did, gs in shingles.items():
        r = rows[did]
        assert r["n_grams"] == len(gs)
        if not gs:
            assert r["novelty"] is None
            continue
        uniq = sum(1 for g in gs if df[g] == 1)
        assert r["n_unique"] == uniq
        assert 0.0 <= r["novelty"] <= 1.0


def test_mixture_weight_tables_properties(spark):
    """R4-46/47: class-balanced weights average to 1 over classes and
    order inversely with counts; temperature sampling sums to 1 and
    upsamples tail languages (p_sample > raw_share iff below-average
    count)."""
    from pdf_extractor_spark.analytics.curation import (
        class_balanced_weights,
        temperature_mix_weights,
    )

    sf_dir = "/root/testdata/sf0.001"
    cb = class_balanced_weights(spark, sf_dir).collect()
    k = len(cb)
    assert abs(sum(r["weight"] for r in cb) - k) < k * 1e-5
    by_n = sorted(cb, key=lambda r: r["n_docs"])
    for a, b in zip(by_n, by_n[1:]):
        if a["n_docs"] < b["n_docs"]:
            assert a["weight"] >= b["weight"]  # rarer class, larger weight

    tm = temperature_mix_weights(spark, sf_dir).collect()
    assert abs(sum(r["p_sample"] for r in tm) - 1.0) < 1e-4
    assert abs(sum(r["raw_share"] for r in tm) - 1.0) < 1e-4
    mean_n = sum(r["n_docs"] for r in tm) / len(tm)
    for r in tm:
        if r["n_docs"] < mean_n:
            assert r["p_sample"] >= r["raw_share"]  # tail upsampled


def test_rouge_pair_scores_recompute_and_dup_anchor(spark):
    """R4-48: clipped-overlap P/R/F equal a pure-Python recompute over
    the same candidate pairs; injected exact-dup pairs score 1.0."""
    import math
    import re
    from collections import Counter

    from pdf_extractor_spark.analytics.base import DUP_ID_OFFSET
    from pdf_extractor_spark.analytics.dedup import (
        ROUGE_NS,
        minhash_lsh_pairs,
        rouge_pair_scores,
    )

    sf_dir = "/root/testdata/sf0.001"
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    from pdf_extractor_spark.analytics.base import N_INJECTED_DUPS

    for d in list(docs):
        if d < N_INJECTED_DUPS:
            docs[d + DUP_ID_OFFSET] = docs[d]
    pairs = {
        (r["a_id"], r["b_id"])
        for r in minhash_lsh_pairs(spark, sf_dir).collect()
    }

    def grams(text, n):
        toks = [t for t in re.split(r"\s+", text or "") if t != ""]
        return Counter(
            " ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)
        )

    rows = rouge_pair_scores(spark, sf_dir).collect()
    got = {
        (r["a_id"], r["b_id"], r["n"]): r for r in rows
    }
    for (a, b) in pairs:
        for n in ROUGE_NS:
            ga, gb = grams(docs[a], n), grams(docs[b], n)
            if not ga or not gb:
                assert (a, b, n) not in got
                continue
            clip = sum(min(c, gb[g]) for g, c in ga.items() if g in gb)
            r = got[(a, b, n)]
            assert r["clip"] == clip
            assert r["tot_a"] == sum(ga.values())
            assert r["tot_b"] == sum(gb.values())
            for name, want in (
                ("recall", clip / sum(ga.values())),
                ("precision", clip / sum(gb.values())),
                ("f1", 2 * clip / (sum(ga.values()) + sum(gb.values()))),
            ):
                assert abs(
                    r[name] - math.floor(want * 10000 + 1e-6) / 10000
                ) < 1e-9
            # exact-dup anchor
            if b == a + DUP_ID_OFFSET:
                assert r["f1"] == 1.0
    assert len(got) == sum(
        1 for (a, b) in pairs for n in ROUGE_NS
        if grams(docs[a], n) and grams(docs[b], n)
    )


def test_tfidf_pair_cosine_anchors_and_bounds(spark):
    """R4-49: lexical cosine ∈ [0, 1]; injected exact-dup pairs score
    exactly 1.0; pair set matches the MinHash candidates."""
    from pdf_extractor_spark.analytics.base import DUP_ID_OFFSET
    from pdf_extractor_spark.analytics.dedup import (
        minhash_lsh_pairs,
        tfidf_pair_cosine,
    )

    sf_dir = "/root/testdata/sf0.001"
    rows = tfidf_pair_cosine(spark, sf_dir).collect()
    pairs = {
        (r["a_id"], r["b_id"])
        for r in minhash_lsh_pairs(spark, sf_dir).collect()
    }
    assert {(r["a_id"], r["b_id"]) for r in rows} == pairs and pairs
    n_dup_anchor = 0
    for r in rows:
        assert -1e-9 <= r["lex_cos"] <= 1.0 + 1e-9
        if r["b_id"] == r["a_id"] + DUP_ID_OFFSET:
            assert r["lex_cos"] == 1.0
            n_dup_anchor += 1
    assert n_dup_anchor > 0


def test_transition_entropy_recompute(spark):
    """R4-51: per-state conditional entropy equals a pure-Python
    transition walk and is bounded by log2(#next states)."""
    import math

    from pdf_extractor_spark.analytics.relational import (
        event_transition_entropy,
    )

    sf_dir = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    by_user = {}
    for e in ev:
        by_user.setdefault(e["user_id"], []).append(e)
    counts = {}
    for es in by_user.values():
        es.sort(key=lambda e: (e["ts"], e["event_id"]))
        for a, b in zip(es, es[1:]):
            counts.setdefault(a["event_type"], {}).setdefault(
                b["event_type"], 0
            )
            counts[a["event_type"]][b["event_type"]] += 1
    got = {
        r["cur"]: (r["n_transitions"], r["entropy"])
        for r in event_transition_entropy(spark, sf_dir).collect()
    }
    assert set(got) == set(counts)
    for cur, nxts in counts.items():
        n = sum(nxts.values())
        clogc = sum(c * math.log2(c) for c in nxts.values())
        want = math.floor((math.log2(n) - clogc / n) * 10000 + 1e-6) / 10000
        assert got[cur][0] == n
        assert abs(got[cur][1] - want) < 1e-9
        assert got[cur][1] <= math.log2(len(nxts)) + 1e-9
