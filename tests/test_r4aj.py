"""R4-193/194 units: order-statistic median CI and embedding
participation ratio — pure-Python recomputes at sf0.001."""

import math

SF = "/root/testdata/sf0.001"


def _fl(x, k):
    return math.floor(x * 10**k + 1e-6) / 10**k


def test_median_ci_recompute(spark):
    """R4-193: median and CI bounds equal the sorted-order lookup at
    the closed-form ranks; the interval brackets the median and the
    empirical coverage mass is >= the nominal 95%."""
    from pdf_extractor_spark.analytics.relational import (
        MEDIAN_CI_Z,
        median_ci_order_stats,
    )

    cents = sorted(
        math.floor(r["o_totalprice"] * 100 + 1e-6)
        for r in spark.read.parquet(f"{SF}/orders.parquet").collect()
    )
    n = len(cents)
    nd = float(n)
    m_rank = math.floor((nd + 1.0) / 2.0 + 1e-6)
    l_rank = max(
        1, math.floor((nd - MEDIAN_CI_Z * math.sqrt(nd)) / 2.0 + 1e-6)
    )
    u_rank = min(
        n,
        math.floor(
            (nd + MEDIAN_CI_Z * math.sqrt(nd)) / 2.0 + 1.0 + 1e-6
        ),
    )
    r = median_ci_order_stats(spark, SF).collect()[0]
    assert r["n_orders"] == n
    assert r["median_cents"] == cents[m_rank - 1]
    assert r["ci_lo_cents"] == cents[l_rank - 1]
    assert r["ci_hi_cents"] == cents[u_rank - 1]
    assert r["ci_lo_cents"] <= r["median_cents"] <= r["ci_hi_cents"]
    # order-statistic coverage: the rank span carries >= 95% binomial
    # mass around n/2 (loose sanity via the normal z used to build it)
    assert u_rank - l_rank >= MEDIAN_CI_Z * math.sqrt(nd) * 0.9


def test_effective_dim_recompute(spark):
    """R4-194: the participation ratio equals the exact grid-variance
    closed form; 1 <= PR <= n_dims."""
    from pdf_extractor_spark.analytics.similarity import (
        embedding_effective_dim,
    )

    comps = {}
    for row in spark.read.parquet(f"{SF}/embeddings.parquet").collect():
        for i, x in enumerate(row["embedding"]):
            comps.setdefault(i + 1, []).append(
                math.floor(float(x) * 1e6 + 1e-6)
            )
    vqs = []
    for i, xs in comps.items():
        nn = float(len(xs))
        mu = float(sum(xs)) / nn
        var = (float(sum(x * x for x in xs)) / nn - mu * mu) / 1.0e12
        vqs.append(math.floor(var * 1e8 + 1e-6))
    sv = sum(vqs)
    svv = sum(v * v for v in vqs)
    pr = float(sv * sv) / float(svv)
    r = embedding_effective_dim(spark, SF).collect()[0]
    assert r["n_dims"] == len(vqs)
    assert r["effective_dim"] == _fl(pr, 4)
    assert r["pr_ratio"] == _fl(pr / len(vqs), 6)
    assert r["top_dim_var_share"] == _fl(max(vqs) / sv, 6)
    assert 1.0 <= r["effective_dim"] <= len(vqs) + 1e-9


def test_mann_kendall_recompute(spark):
    """R4-195: S, tie-corrected variance, continuity-corrected z and
    the grid-decided verdict equal a direct Python pair walk."""
    from collections import Counter, defaultdict

    from pdf_extractor_spark.analytics.relational import (
        mann_kendall_trend,
    )

    daily = defaultdict(int)
    for row in spark.read.parquet(f"{SF}/orders.parquet").collect():
        daily[row["o_orderdate"].date()] += math.floor(
            row["o_totalprice"] * 100 + 1e-6
        )
    vals = [c for _, c in sorted(daily.items())]
    n = len(vals)
    s = 0
    for i in range(n):
        for j in range(i + 1, n):
            s += (vals[j] > vals[i]) - (vals[j] < vals[i])
    ties = Counter(vals)
    tie_term = sum(
        t * (t - 1) * (2 * t + 5) for t in ties.values() if t >= 2
    )
    var_s = float(n * (n - 1) * (2 * n + 5) - tie_term) / 18.0
    if s > 0:
        z = float(s - 1) / math.sqrt(var_s)
    elif s < 0:
        z = float(s + 1) / math.sqrt(var_s)
    else:
        z = 0.0
    zf = _fl(z, 4)
    trend = (
        "increasing" if zf > 1.96
        else "decreasing" if zf < -1.96
        else "no-trend"
    )
    r = mann_kendall_trend(spark, SF).collect()[0]
    assert r["n_days"] == n
    assert r["s_stat"] == s
    assert r["var_s"] == _fl(var_s, 4)
    assert r["z_score"] == zf
    assert r["trend"] == trend
