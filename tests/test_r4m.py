"""R4-103..106 units: pure-Python recomputes of the decile-grid
Kendall tau-b, the QQ drift table, the Gumbel method-of-moments fit,
and the Lorenz curve points (the DuckDB gate covers full parity;
these pin the semantics against independent walks / the published
closed forms)."""

import math
from collections import Counter

SF = "/root/testdata/sf0.001"


def _fl(x, k):
    return math.floor(x * 10**k + 1e-6) / 10**k


def _deciles(pairs, key, b):
    """doc_id -> bucket via histogram cum_before + in-tie doc_id rank."""
    n = len(pairs)
    hist = Counter(v for _d, v in pairs)
    cb = {}
    cum = 0
    for v in sorted(hist):
        cb[v] = cum
        cum += hist[v]
    seen = Counter()
    out = {}
    for d, v in sorted(pairs):  # doc_id order within each tie group
        rank0 = cb[v] + seen[v]
        seen[v] += 1
        out[d] = math.floor(rank0 * b / n) + 1
    return out


def test_kendall_recompute(spark):
    """C/D/tie counts and tau-b equal the brute-force pair walk over
    the recomputed decile buckets; |tau_b| <= 1."""
    from pdf_extractor_spark.analytics.quality_rules import (
        quality_classifier_linear,
    )
    from pdf_extractor_spark.analytics.textstats import (
        KENDALL_BUCKETS,
        kendall_tau_len_quality,
    )

    lens = [
        (r["doc_id"], r["n_chars"])
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    ]
    scores = [
        (r["doc_id"], math.floor(r["score"] * 10000 + 1e-6))
        for r in quality_classifier_linear(spark, SF).collect()
    ]
    dx = _deciles(lens, 1, KENDALL_BUCKETS)
    dy = _deciles(scores, 1, KENDALL_BUCKETS)
    pts = [(dx[d], dy[d]) for d, _v in lens]
    n = len(pts)
    conc = disc = tx = ty = 0
    for i in range(n):
        for j in range(i + 1, n):
            (x1, y1), (x2, y2) = pts[i], pts[j]
            if x1 == x2:
                tx += 1
            if y1 == y2:
                ty += 1
            if (x1 - x2) * (y1 - y2) > 0:
                conc += 1
            elif (x1 - x2) * (y1 - y2) < 0:
                disc += 1
    n0 = n * (n - 1) // 2
    tau = (conc - disc) / (math.sqrt(n0 - tx) * math.sqrt(n0 - ty))
    [got] = kendall_tau_len_quality(spark, SF).collect()
    assert got["n"] == n
    assert got["n_pairs"] == n0
    assert got["concordant"] == conc
    assert got["discordant"] == disc
    assert got["ties_x"] == tx
    assert got["ties_y"] == ty
    assert got["tau_b"] == _fl(tau, 6)
    assert -1.0 <= got["tau_b"] <= 1.0


def test_qq_drift_recompute(spark):
    """Every decile pick equals the nearest-rank (ceil(p*n)) order
    statistic of its wave, and gap = q_new - q_old."""
    from pdf_extractor_spark.analytics.textstats import qq_length_drift

    docs = [
        (r["doc_id"], r["n_chars"])
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    ]
    mid = (min(d for d, _ in docs) + max(d for d, _ in docs)) / 2
    old = sorted(c for d, c in docs if d < mid)
    new = sorted(c for d, c in docs if d >= mid)
    rows = {r["p"]: r for r in qq_length_drift(spark, SF).collect()}
    assert set(rows) == set(range(10, 100, 10))
    for p, got in rows.items():
        qo = old[math.ceil(p * len(old) / 100) - 1]
        qn = new[math.ceil(p * len(new) / 100) - 1]
        assert got["q_old"] == qo
        assert got["q_new"] == qn
        assert got["gap"] == qn - qo


def _daily_cents(spark):
    daily = Counter()
    for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
        daily[r["o_orderdate"].date()] += math.floor(
            r["o_totalprice"] * 100 + 1e-6
        )
    return daily


def test_gumbel_recompute(spark):
    """beta/mu/p_exceed equal the closed-form MoM fit over the
    independently computed monthly maxima; p_exceed in (0, 1)."""
    from pdf_extractor_spark.analytics.relational import (
        EULER_GAMMA,
        GUMBEL_STRESS_MULT,
        gumbel_monthly_peak_fit,
    )

    daily = _daily_cents(spark)
    monthly = Counter()
    for d, c in daily.items():
        key = (d.year, d.month)
        monthly[key] = max(monthly[key], c) if key in monthly else c
    ys = [c // 100 for c in monthly.values()]
    m = len(ys)
    sy, syy = sum(ys), sum(y * y for y in ys)
    mean = sy / m
    var = (m * syy - sy * sy) / (m * (m - 1))
    beta = math.sqrt(var * 6.0) / math.pi
    mu = mean - EULER_GAMMA * beta
    t = GUMBEL_STRESS_MULT * mean
    p = 1.0 - math.exp(-math.exp(-(t - mu) / beta))
    [got] = gumbel_monthly_peak_fit(spark, SF).collect()
    assert got["m"] == m
    assert got["mean_peak"] == _fl(mean, 2)
    assert got["gumbel_beta"] == _fl(beta, 4)
    assert got["gumbel_mu"] == _fl(mu, 4)
    assert got["stress_level"] == _fl(t, 2)
    assert got["p_exceed_stress"] == _fl(p, 6)
    assert 0.0 <= got["p_exceed_stress"] < 1.0


def test_lorenz_recompute(spark):
    """Every curve point equals the bottom-r revenue mass of the
    ascending sort; the curve is monotone, convex, ends at 1, and
    never exceeds the diagonal."""
    from pdf_extractor_spark.analytics.relational import (
        lorenz_curve_revenue,
    )

    rev = Counter()
    for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
        rev[r["o_custkey"]] += math.floor(r["o_totalprice"] * 100 + 1e-6)
    revs = sorted(rev.values())
    n, total = len(revs), sum(revs)
    rows = {r["p"]: r for r in lorenz_curve_revenue(spark, SF).collect()}
    assert set(rows) == set(range(10, 101, 10))
    prev_share = 0.0
    prev_inc = -1.0
    for p in range(10, 101, 10):
        r_cnt = p * n // 10 // 10  # floor(p*n/100)
        cum = sum(revs[:r_cnt])
        got = rows[p]
        assert got["n_customers"] == n
        assert got["n_bottom"] == r_cnt
        assert got["cum_cents"] == cum
        assert got["cum_share"] == _fl(cum / total, 6)
        inc = got["cum_share"] - prev_share
        assert inc >= max(prev_inc - 1e-6, 0.0)  # monotone + convex
        assert got["cum_share"] <= p / 100 + 1e-6  # below the diagonal
        prev_share, prev_inc = got["cum_share"], inc
    assert rows[100]["cum_share"] == 1.0
