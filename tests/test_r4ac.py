"""R4-167..170 units: NTH_VALUE podium, the one-pass correlation
matrix, DAU/MAU stickiness, and discount elasticity."""

import math
from collections import Counter, defaultdict

SF = "/root/testdata/sf0.001"


def _fl(x, k):
    return math.floor(x * 10**k + 1e-6) / 10**k


def test_podium_recompute(spark):
    """Gold/silver/bronze days per segment equal an independent sort
    with the (revenue DESC, day ASC) total order; strictly ordered."""
    from pdf_extractor_spark.analytics.relational import (
        podium_days_per_segment,
    )

    cust = {
        r["c_custkey"]: r["c_mktsegment"]
        for r in spark.read.parquet(f"{SF}/customer.parquet").collect()
    }
    daily = defaultdict(int)
    for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
        daily[(cust[r["o_custkey"]], r["o_orderdate"].date())] += math.floor(
            r["o_totalprice"] * 100 + 1e-6
        )
    per = defaultdict(list)
    for (seg, d), c in daily.items():
        per[seg].append((-c, d))
    rows = {
        r["c_mktsegment"]: r
        for r in podium_days_per_segment(spark, SF).collect()
    }
    assert set(rows) == set(per)
    for seg, lst in per.items():
        lst.sort()
        r = rows[seg]
        assert (r["gold_day"], r["gold_cents"]) == (lst[0][1], -lst[0][0])
        assert (r["silver_day"], r["silver_cents"]) == (lst[1][1], -lst[1][0])
        assert (r["bronze_day"], r["bronze_cents"]) == (lst[2][1], -lst[2][0])
        assert r["gold_cents"] >= r["silver_cents"] >= r["bronze_cents"]


def test_corr_matrix_recompute(spark):
    """All six pairwise correlations equal the closed forms over a
    grid-floored walk; |r| <= 1 and the matrix covers each unordered
    pair exactly once."""
    from pdf_extractor_spark.analytics.relational import (
        _LI_FEATURES,
        lineitem_corr_matrix,
    )

    pts = []
    for r in spark.read.parquet(f"{SF}/lineitem.parquet").collect():
        pts.append(
            {
                "qty": math.floor(r["l_quantity"] + 1e-6),
                "price_c": math.floor(
                    r["l_extendedprice"] / r["l_quantity"] * 100 + 1e-6
                ),
                "disc_bp": math.floor(r["l_discount"] * 10000 + 1e-6),
                "tax_bp": math.floor(r["l_tax"] * 10000 + 1e-6),
            }
        )
    n = len(pts)
    rows = {
        (r["feat_a"], r["feat_b"]): r
        for r in lineitem_corr_matrix(spark, SF).collect()
    }
    expect_pairs = {
        (a, b)
        for i, a in enumerate(_LI_FEATURES)
        for b in _LI_FEATURES[i + 1:]
    }
    assert set(rows) == expect_pairs
    for (a, b), r in rows.items():
        sa = sum(p[a] for p in pts)
        sb = sum(p[b] for p in pts)
        sab = sum(p[a] * p[b] for p in pts)
        saa = sum(p[a] * p[a] for p in pts)
        sbb = sum(p[b] * p[b] for p in pts)
        rr = (n * sab - sa * sb) / math.sqrt(
            (n * saa - sa * sa) * (n * sbb - sb * sb)
        )
        assert r["n_lines"] == n
        assert r["pearson_r"] == _fl(rr, 6)
        assert -1.0 <= r["pearson_r"] <= 1.0


def test_dau_mau_recompute(spark):
    """DAU series and MAU equal independent distinct counts;
    stickiness in (0, 1]."""
    from pdf_extractor_spark.analytics.relational import dau_mau_stickiness

    days = defaultdict(set)
    allu = set()
    for r in spark.read.parquet(f"{SF}/events.parquet").collect():
        d = r["ts"].date()
        days[d].add(r["user_id"])
        allu.add(r["user_id"])
    dau = [len(v) for v in days.values()]
    got = dau_mau_stickiness(spark, SF).collect()
    assert len(got) == 1
    g = got[0]
    assert g["n_days"] == len(days)
    assert g["min_dau"] == min(dau) and g["max_dau"] == max(dau)
    assert g["avg_dau"] == _fl(sum(dau) / len(dau), 4)
    assert g["mau"] == len(allu)
    assert g["stickiness"] == _fl(sum(dau) / len(dau) / len(allu), 6)
    assert 0.0 < g["stickiness"] <= 1.0


def test_discount_elasticity_recompute(spark):
    """Band means and the global OLS slope equal the closed forms;
    every discount band appears once."""
    from pdf_extractor_spark.analytics.relational import discount_elasticity

    band = defaultdict(lambda: [0, 0])
    pts = []
    for r in spark.read.parquet(f"{SF}/lineitem.parquet").collect():
        x = math.floor(r["l_discount"] * 100 + 1e-6)
        q = math.floor(r["l_quantity"] + 1e-6)
        band[x][0] += 1
        band[x][1] += q
        pts.append((x, q))
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(q for _, q in pts)
    sxy = sum(x * q for x, q in pts)
    sxx = sum(x * x for x, _ in pts)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    rows = {r["disc_pct"]: r for r in discount_elasticity(spark, SF).collect()}
    assert set(rows) == set(band)
    for x, (c, s) in band.items():
        r = rows[x]
        assert r["n_lines"] == c
        assert r["avg_qty"] == _fl(s / c, 4)
        assert r["qty_per_disc_pct_slope"] == _fl(slope, 6)
