

def test_embedding_stats_numpy_recompute(spark):
    """embedding_stats matches numpy (np.std ddof=0, L2 norm) after the
    shared floor4 rounding; NULL/empty embeddings give all-NULL stats."""
    import math

    import numpy as np

    from pdf_extractor_spark.analytics.similarity import embedding_stats

    sf_dir = "/root/testdata/sf0.001"
    got = {r["vec_id"]: r for r in embedding_stats(spark, sf_dir).collect()}
    vecs = {
        r["vec_id"]: r["embedding"]
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }

    def fl4(x):
        return math.floor(x * 10000 + 1e-6) / 10000

    checked = 0
    for vec_id, emb in list(vecs.items())[:25]:
        row = got[vec_id]
        if emb is None or len(emb) == 0:
            assert all(
                row[c] is None
                for c in ("emb_min", "emb_max", "emb_mean", "emb_std", "emb_norm")
            )
            continue
        v = np.array(emb, dtype=np.float64)
        assert row["emb_min"] == fl4(v.min())
        assert row["emb_max"] == fl4(v.max())
        assert abs(row["emb_mean"] - fl4(v.mean())) <= 1e-4
        assert abs(row["emb_std"] - fl4(v.std())) <= 1e-4
        assert abs(row["emb_norm"] - fl4(np.linalg.norm(v))) <= 1e-4
        checked += 1
    assert checked > 0


def test_embedding_quantize_error_numpy_recompute(spark):
    """int8 quantization audit matches numpy: scale = max|x|/127,
    q = clip(floor(x/scale + 0.5)), L2 reconstruction error and
    cosine(original, dequantized) after floor4; cos_dq stays ≥ 0.99
    for real vectors (the audit's point)."""
    import math

    import numpy as np

    from pdf_extractor_spark.analytics.similarity import (
        QUANT_LEVELS,
        embedding_quantize_error,
    )

    sf_dir = "/root/testdata/sf0.001"
    got = {
        r["vec_id"]: r
        for r in embedding_quantize_error(spark, sf_dir).collect()
    }
    vecs = {
        r["vec_id"]: r["embedding"]
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }

    def fl4(x):
        return math.floor(x * 10000 + 1e-6) / 10000

    checked = 0
    for vec_id, emb in list(vecs.items())[:25]:
        row = got[vec_id]
        v = np.array(emb, dtype=np.float64)
        scale = np.abs(v).max() / QUANT_LEVELS
        if scale == 0:
            assert row["l2_err"] == 0.0 and row["cos_dq"] is None
            continue
        q = np.clip(np.floor(v / scale + 0.5), -QUANT_LEVELS, QUANT_LEVELS)
        dq = q * scale
        err = float(np.sqrt(((v - dq) ** 2).sum()))
        cos = float(
            (v @ dq) / (np.linalg.norm(v) * np.linalg.norm(dq))
        )
        assert abs(row["q_scale"] - fl4(scale)) <= 1e-4
        assert abs(row["l2_err"] - fl4(err)) <= 1e-4
        assert abs(row["cos_dq"] - fl4(cos)) <= 1e-4
        assert row["cos_dq"] >= 0.99
        checked += 1
    assert checked > 0


def test_semantic_dedup_recompute(spark):
    """SemDeDup verdicts equal a numpy recompute of the seeded
    assignment + within-cluster cosine dedup: injected exact copies are
    marked duplicates of their originals (same cluster by construction)
    and keep-lowest-id survivorship holds per duplicate group."""
    import numpy as np

    from pdf_extractor_spark.analytics.base import (
        DUP_ID_OFFSET,
        N_INJECTED_DUPS,
    )
    from pdf_extractor_spark.analytics.similarity import (
        SEMDEDUP_K,
        SEMDEDUP_THRESHOLD,
        semantic_dedup,
    )

    sf_dir = "/root/testdata/sf0.001"
    out = {r["vec_id"]: r for r in semantic_dedup(spark, sf_dir).collect()}
    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }
    corpus = dict(emb)
    for vid in range(N_INJECTED_DUPS):
        corpus[vid + DUP_ID_OFFSET] = emb[vid]
    seeds = {sid: emb[sid] for sid in range(SEMDEDUP_K)}

    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        return None if na == 0 or nb == 0 else float(a @ b / (na * nb))

    cluster = {}
    for vid, v in corpus.items():
        scored = [
            (c if (c := cos(v, s)) is not None else -2.0, -sid, sid)
            for sid, s in seeds.items()
        ]
        cluster[vid] = max(scored)[2]
    dup_of = {}
    ids = sorted(corpus)
    for i, b_id in enumerate(ids):
        for a_id in ids[:i]:
            if cluster[a_id] != cluster[b_id]:
                continue
            c = cos(corpus[a_id], corpus[b_id])
            if c is not None and c >= SEMDEDUP_THRESHOLD:
                dup_of.setdefault(b_id, a_id)
                break  # ids ascending: first hit is the min keep_id
    assert set(out) == set(corpus)
    for vid in corpus:
        row = out[vid]
        assert row["cluster"] == cluster[vid], vid
        assert row["kept"] == (vid not in dup_of), vid
        assert row["dup_of"] == dup_of.get(vid), vid
    # the injected copies can never survive against their originals
    injected = [vid for vid in corpus if vid >= DUP_ID_OFFSET]
    assert injected and all(not out[vid]["kept"] for vid in injected)
    assert any(out[vid]["kept"] for vid in corpus if vid < DUP_ID_OFFSET)


def test_embedding_validation_recompute(spark):
    """Fingerprint/dim/presence checks match a pure-Python recompute of
    the reference fixture-compare (embedding_utils.py:135-209) under
    the canonical fixed-point serialization; planted drift and missing
    rows are flagged, everything else validates."""
    import hashlib
    import math

    from pdf_extractor_spark.analytics.similarity import (
        EV_DRIFT_MOD,
        EV_MISSING_MOD,
        embedding_validation_profile,
    )

    sf_dir = "/root/testdata/sf0.001"
    out = {
        r["vec_id"]: r
        for r in embedding_validation_profile(spark, sf_dir).collect()
    }
    vecs = {
        r["vec_id"]: r["embedding"]
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }
    assert set(out) == set(vecs)

    def fp(v):
        return hashlib.md5(
            ",".join(
                str(int(math.floor(
                    min(max(float(x), -9e10), 9e10) * 10000 + 1e-6
                ))) for x in v
            ).encode()
        ).hexdigest()

    n_invalid = 0
    for vid, v in vecs.items():
        row = out[vid]
        assert row["n_dims"] == len(v) and row["dim_ok"]
        assert row["fingerprint"] == fp(v)
        want_match = vid % EV_DRIFT_MOD != 0 or fp(
            [float(__import__("numpy").float32(v[0] + 0.5))] + [float(x) for x in v[1:]]
        ) == fp(v)
        assert row["hash_match"] == want_match
        assert row["in_fixture"] == (vid % EV_MISSING_MOD != 0)
        if not row["valid"]:
            n_invalid += 1
    assert n_invalid >= 2  # both planted branches exercised


def test_ann_recall_audit_monotone_and_exact_at_full_probe(spark):
    """Recall@K is monotone in probe depth, n_returned is always K,
    and probing every cluster reproduces the brute-force truth exactly
    (recall 1.0) — the invariant that makes the curve trustworthy."""
    from pdf_extractor_spark.analytics.similarity import (
        RECALL_MAX_PROBE,
        TOP_K,
        ann_recall_audit,
    )

    sf_dir = "/root/testdata/sf0.001"
    rows = {r["n_probe"]: r for r in ann_recall_audit(spark, sf_dir).collect()}
    assert sorted(rows) == list(range(1, RECALL_MAX_PROBE + 1))
    n_labels = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("label").distinct().count()
    )
    prev = -1.0
    for p in sorted(rows):
        r = rows[p]
        assert r["n_returned"] == TOP_K
        assert r["recall_at_k"] >= prev  # monotone
        prev = r["recall_at_k"]
        assert r["n_hits"] <= TOP_K
    if RECALL_MAX_PROBE >= n_labels:
        assert rows[max(rows)]["recall_at_k"] == 1.0


def test_mmr_rerank_greedy_recompute(spark):
    """R4-33: the distributed greedy selection equals a pure-Python
    MMR walk over the same floored pool; ranks are a permutation
    prefix and the first pick is the relevance argmax."""
    import math

    from pdf_extractor_spark.analytics.similarity import (
        MMR_K,
        MMR_LAMBDA,
        MMR_POOL,
        QUERY_VEC_ID,
        mmr_rerank,
    )

    sf_dir = "/root/testdata/sf0.001"
    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }

    def f4(x):
        return math.floor(x * 10000 + 1e-6) / 10000

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(y * y for y in b))
        return d / (na * nb)

    q = vecs[QUERY_VEC_ID]
    pool = sorted(
        ((f4(cos(v, q)), vid) for vid, v in vecs.items() if vid != QUERY_VEC_ID),
        key=lambda t: (-t[0], t[1]),
    )[:MMR_POOL]
    selected, want = [], []
    remaining = {vid: rel for rel, vid in pool}
    for step in range(1, MMR_K + 1):
        best = None
        for vid, rel in remaining.items():
            ms = max(
                (f4(cos(vecs[vid], vecs[s])) for s in selected), default=0.0
            )
            mmr = f4(MMR_LAMBDA * rel - (1.0 - MMR_LAMBDA) * ms)
            key = (-mmr, vid)
            if best is None or key < best[0]:
                best = (key, vid, rel, mmr)
        selected.append(best[1])
        want.append((step, best[1], best[2], best[3]))
        del remaining[best[1]]

    rows = mmr_rerank(spark, sf_dir).collect()
    got = [(r["rank"], r["vec_id"], r["rel"], r["mmr"]) for r in rows]
    assert got == want
    assert got[0][1] == pool[0][1]  # first pick is the rel argmax
    assert len({v for _, v, _, _ in got}) == MMR_K  # no repeats


def test_hard_negative_mining_recompute(spark):
    """R4-34: per-anchor hard negatives equal a pure-Python pass over
    the same LSH candidates; every emitted cos is below the positive
    threshold and ranks are dense per anchor."""
    import math

    from pdf_extractor_spark.analytics.similarity import (
        DIMS,
        HARD_NEG_ANCHOR_MOD,
        HARD_NEG_K,
        HARD_NEG_POS_TH,
        HP_BANDS,
        HP_BITS,
        hard_negative_mining,
    )

    sf_dir = "/root/testdata/sf0.001"
    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }

    def f4(x):
        return math.floor(x * 10000 + 1e-6) / 10000

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    def band_key(v, band):
        key = 0
        for r in range(HP_BITS):
            j = band * HP_BITS + r
            dot = sum(
                v[i] * math.sin((j + 1) * (i + 1)) for i in range(DIMS)
            )
            if dot >= 0:
                key += 2**r
        return key

    buckets = {}
    for vid, v in vecs.items():
        for b in range(HP_BANDS):
            buckets.setdefault((b, band_key(v, b)), []).append(vid)
    want = {}
    for (b, k), ids in buckets.items():
        for a in ids:
            if a % HARD_NEG_ANCHOR_MOD != 0:
                continue
            for o in ids:
                if o != a:
                    want.setdefault(a, set()).add(o)
    expect = []
    for a in sorted(want):
        scored = sorted(
            (
                (f4(cos(vecs[a], vecs[o])), o)
                for o in want[a]
                if f4(cos(vecs[a], vecs[o])) < HARD_NEG_POS_TH
            ),
            key=lambda t: (-t[0], t[1]),
        )[:HARD_NEG_K]
        for rank, (c, o) in enumerate(scored, start=1):
            expect.append((a, o, c, rank))

    rows = hard_negative_mining(spark, sf_dir).collect()
    got = [(r["anchor_id"], r["neg_id"], r["cos"], r["rank"]) for r in rows]
    assert got == expect and len(got) > 0
    assert all(c < HARD_NEG_POS_TH for _, _, c, _ in got)


def test_cluster_silhouette_recompute(spark):
    """R4-38: per-cluster simplified silhouette equals a pure-Python
    centroid recompute; values live in [-1, 1]."""
    import math

    from pdf_extractor_spark.analytics.similarity import cluster_silhouette

    sf_dir = "/root/testdata/sf0.001"
    rows = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r["label"], []).append(
            [float(x) for x in r["embedding"]]
        )
    cents = {
        lab: [sum(col) / len(vs) for col in zip(*vs)]
        for lab, vs in by_label.items()
    }

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    want = {}
    for lab, vs in by_label.items():
        ss = []
        for v in vs:
            a = 1.0 - cos(v, cents[lab])
            b = min(
                1.0 - cos(v, c) for l2, c in cents.items() if l2 != lab
            )
            m = max(a, b)
            ss.append((b - a) / m if m > 0 else 0.0)
        mean = sum(ss) / len(ss)
        want[lab] = (
            len(vs), math.floor(mean * 10000 + 1e-6) / 10000
        )
    got = {
        r["label"]: (r["n_vecs"], r["mean_silhouette"])
        for r in cluster_silhouette(spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for lab in want:
        assert got[lab][0] == want[lab][0]
        assert abs(got[lab][1] - want[lab][1]) < 1e-9
        assert -1.0 - 1e-9 <= got[lab][1] <= 1.0 + 1e-9


def test_bitext_margin_recompute(spark):
    """R4-45: margin-mined pairs equal a pure-Python LSH walk; every
    pair is cross-lingual from the source language and margins clear
    the threshold."""
    import math

    from pdf_extractor_spark.analytics.similarity import (
        BITEXT_MARGIN_TH,
        BITEXT_NN_K,
        BITEXT_SRC_LANG,
        DIMS,
        HP_BANDS,
        HP_BITS,
        bitext_margin_mining,
    )

    sf_dir = "/root/testdata/sf0.001"
    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }
    langs = {
        r["doc_id"]: r["lang"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }

    def f4(x):
        return math.floor(x * 10000 + 1e-6) / 10000

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    def band_key(v, band):
        key = 0
        for r in range(HP_BITS):
            j = band * HP_BITS + r
            if sum(v[i] * math.sin((j + 1) * (i + 1)) for i in range(DIMS)) >= 0:
                key += 2**r
        return key

    buckets = {}
    for vid in vecs:
        if vid not in langs:
            continue
        for b in range(HP_BANDS):
            buckets.setdefault((b, band_key(vecs[vid], b)), []).append(vid)
    pairs = set()
    for ids in buckets.values():
        for a in ids:
            for b in ids:
                if a < b:
                    pairs.add((a, b))
    cosmap = {(a, b): f4(cos(vecs[a], vecs[b])) for a, b in pairs}
    nbrs = {}
    for (a, b), c in cosmap.items():
        nbrs.setdefault(a, []).append((c, b))
        nbrs.setdefault(b, []).append((c, a))
    avgk = {
        v: sum(c for c, _ in sorted(ns, key=lambda t: (-t[0], t[1]))[:BITEXT_NN_K])
        / min(len(ns), BITEXT_NN_K)
        for v, ns in nbrs.items()
    }
    expect = set()
    for (a, b), c in cosmap.items():
        la, lb = langs[a], langs[b]
        if la == BITEXT_SRC_LANG and lb != BITEXT_SRC_LANG:
            x, y = a, b
        elif lb == BITEXT_SRC_LANG and la != BITEXT_SRC_LANG:
            x, y = b, a
        else:
            continue
        margin = f4(c / ((avgk[x] + avgk[y]) / 2))
        if margin >= BITEXT_MARGIN_TH:
            expect.add((x, y, langs[y], c, margin))
    got = {
        (r["x_id"], r["y_id"], r["y_lang"], r["cos"], r["margin"])
        for r in bitext_margin_mining(spark, sf_dir).collect()
    }
    assert got == expect and got
    assert all(yl != BITEXT_SRC_LANG for _, _, yl, _, _ in got)
    assert all(m >= BITEXT_MARGIN_TH for _, _, _, _, m in got)


def test_ann_ndcg_monotone_and_saturates(spark):
    """R4-52: NDCG is in (0, 1], non-decreasing in probe depth, and at
    full probe depth the IVF ranking IS the exact ranking (ndcg=1)."""
    from pdf_extractor_spark.analytics.similarity import (
        RECALL_MAX_PROBE,
        ann_ndcg_audit,
    )

    sf_dir = "/root/testdata/sf0.001"
    rows = sorted(
        ann_ndcg_audit(spark, sf_dir).collect(), key=lambda r: r["n_probe"]
    )
    assert [r["n_probe"] for r in rows] == list(range(1, RECALL_MAX_PROBE + 1))
    last = 0.0
    for r in rows:
        assert 0.0 <= r["ndcg"] <= 1.0 + 1e-9
        assert r["ndcg"] >= last - 1e-9  # deeper probes never hurt
        last = r["ndcg"]
