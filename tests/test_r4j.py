"""R4-91..94 units: pure-Python recomputes of tie-aware Spearman rho,
the MAD robust-outlier report, the ER blocking scorecard, and the
Clauset power-law alpha (the DuckDB gate covers full parity; these pin
the semantics against independent walks / the published closed
forms)."""

import math
from collections import Counter

SF = "/root/testdata/sf0.001"


def _fl(x, k):
    return math.floor(x * 10**k + 1e-6) / 10**k


def _avg_ranks_doubled(values):
    """value -> doubled average rank (2*(cum_before) + n_v + 1)."""
    hist = Counter(values)
    out = {}
    cum = 0
    for v in sorted(hist):
        out[v] = 2 * cum + hist[v] + 1
        cum += hist[v]
    return out


def test_spearman_recompute(spark):
    """rho equals Pearson over tie-averaged ranks computed by an
    independent Python walk, and the doubled ranks satisfy the
    closed identity sum(2r) = n(n+1)."""
    from pdf_extractor_spark.analytics.quality_rules import (
        quality_classifier_linear,
    )
    from pdf_extractor_spark.analytics.textstats import spearman_len_quality

    lens = {
        r["doc_id"]: r["n_chars"]
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    scores = {
        r["doc_id"]: math.floor(r["score"] * 10000 + 1e-6)
        for r in quality_classifier_linear(spark, SF).collect()
    }
    assert set(lens) == set(scores)
    rx = _avg_ranks_doubled(lens.values())
    ry = _avg_ranks_doubled(scores.values())
    n = len(lens)
    assert sum(rx[v] for v in lens.values()) == n * (n + 1)
    assert sum(ry[v] for v in scores.values()) == n * (n + 1)
    xs = [rx[lens[d]] for d in lens]
    ys = [ry[scores[d]] for d in lens]
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    rho = (n * sxy - sx * sy) / (
        math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
    )
    [got] = spearman_len_quality(spark, SF).collect()
    assert got["n"] == n
    assert got["spearman_rho"] == _fl(rho, 6)
    assert -1.0 <= got["spearman_rho"] <= 1.0


def _median2(values):
    """Doubled nearest-rank-pair median of an integer multiset."""
    s = sorted(values)
    n = len(s)
    lo = (n + 1) // 2
    hi = n // 2 + 1 if n % 2 == 0 else lo
    return s[lo - 1] + s[hi - 1]


def test_mad_outliers_recompute(spark):
    """Per-segment n / median / MAD / outlier count equal the
    two-nested-median Python walk with the same doubled-integer
    decision rule."""
    from pdf_extractor_spark.analytics.relational import (
        MAD_K,
        mad_outlier_flags,
    )

    seg = {
        r["c_custkey"]: r["c_mktsegment"]
        for r in spark.read.parquet(f"{SF}/customer.parquet").collect()
    }
    by_seg = {}
    for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
        v = math.floor(r["o_totalprice"] * 100 + 1e-6)
        by_seg.setdefault(seg[r["o_custkey"]], []).append(v)
    rows = {r["c_mktsegment"]: r for r in mad_outlier_flags(spark, SF).collect()}
    assert set(rows) == set(by_seg)
    for s, vals in by_seg.items():
        med2 = _median2(vals)
        mad4 = _median2([abs(2 * v - med2) for v in vals])
        n_out = sum(1 for v in vals if 2 * abs(2 * v - med2) > MAD_K * mad4)
        got = rows[s]
        assert got["n_orders"] == len(vals)
        assert got["median_price"] == med2 / 200.0
        assert got["mad_price"] == mad4 / 400.0
        assert got["n_outliers"] == n_out
        assert got["outlier_share"] == _fl(n_out / len(vals), 6)


def test_blocking_audit_recompute(spark):
    """Reduction ratio recomputes from the candidate-pair count and
    pair completeness is exactly 1.0: every injected exact dup pair
    (identical text, identical signature) must share a band."""
    from pdf_extractor_spark.analytics.base import (
        DUP_ID_OFFSET,
        N_INJECTED_DUPS,
    )
    from pdf_extractor_spark.analytics.dedup import (
        blocking_quality_audit,
        minhash_lsh_pairs,
    )

    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    pairs = {
        (r["a_id"], r["b_id"]) for r in minhash_lsh_pairs(spark, SF).collect()
    }
    n_truth = min(n_docs, N_INJECTED_DUPS)
    truth = {(d, d + DUP_ID_OFFSET) for d in range(n_truth)}
    assert truth <= pairs  # identical sigs -> every truth pair blocked
    [got] = blocking_quality_audit(spark, SF).collect()
    n_pool = n_docs + n_truth
    all_pairs = n_pool * (n_pool - 1) // 2
    assert got["n_pool"] == n_pool
    assert got["n_all_pairs"] == all_pairs
    assert got["n_candidates"] == len(pairs)
    assert got["n_truth"] == n_truth
    assert got["n_found"] == n_truth
    assert got["reduction_ratio"] == _fl(1.0 - len(pairs) / all_pairs, 6)
    assert got["pair_completeness"] == 1.0
    assert got["reduction_ratio"] > 0.99  # blocking must actually prune


def test_powerlaw_mle_recompute(spark):
    """n_tail, the floored log sum, and alpha equal the CSN continuous
    MLE over an independently built degree histogram."""
    from pdf_extractor_spark.analytics.graphalgo import (
        PL_DMIN,
        degree_powerlaw_mle,
    )

    n = spark.read.parquet(f"{SF}/documents.parquet").count()
    und = set()
    for s in range(n):
        for d in ((7 * s + 1) % n, (s * s + 3) % n, s // 2):
            if s != d:
                und.add((min(s, d), max(s, d)))
    deg = Counter()
    for a, b in und:
        deg[a] += 1
        deg[b] += 1
    hist = Counter(d for d in deg.values() if d >= PL_DMIN)
    n_tail = sum(hist.values())
    sum_ln_i = sum(
        n_d * math.floor(math.log(d / PL_DMIN) * 1000000 + 1e-6)
        for d, n_d in hist.items()
    )
    alpha = 1.0 + n_tail * 1000000.0 / sum_ln_i
    [got] = degree_powerlaw_mle(spark, SF).collect()
    assert got["n_tail"] == n_tail
    assert got["sum_ln_i"] == sum_ln_i
    assert got["alpha_mle"] == _fl(alpha, 6)
    assert got["alpha_mle"] > 1.0
