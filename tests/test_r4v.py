"""R4-139..142 units: growth accounting, the YoY price/volume bridge
(identity pinned), the trend/dow/residual variance decomposition
(shares tile to 1), and the hourly load profile."""

import math
from collections import Counter, defaultdict

SF = "/root/testdata/sf0.001"


def _fl(x, k):
    return math.floor(x * 10**k + 1e-6) / 10**k


def _orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet").collect()


def test_growth_accounting_recompute(spark):
    """Monthly new/returning splits equal an independent first-month
    walk; every month's revenue tiles into the two buckets."""
    from pdf_extractor_spark.analytics.relational import (
        growth_accounting_monthly,
    )

    rows = _orders(spark)
    first = {}
    for r in rows:
        d = r["o_orderdate"].date()
        m = d.year * 12 + d.month
        c = r["o_custkey"]
        first[c] = min(first.get(c, m), m)
    agg = defaultdict(lambda: [0, 0, set(), set()])
    for r in rows:
        d = r["o_orderdate"].date()
        m = d.year * 12 + d.month
        cents = math.floor(r["o_totalprice"] * 100 + 1e-6)
        a = agg[m]
        if m == first[r["o_custkey"]]:
            a[0] += cents
            a[2].add(r["o_custkey"])
        else:
            a[1] += cents
            a[3].add(r["o_custkey"])
    got = {
        (r["month"].year * 12 + r["month"].month): r
        for r in growth_accounting_monthly(spark, SF).collect()
    }
    assert set(got) == set(agg)
    for m, (rn, rr, sn, sr) in agg.items():
        g = got[m]
        assert g["rev_new_cents"] == rn
        assert g["rev_returning_cents"] == rr
        assert g["n_new"] == len(sn)
        assert g["n_returning"] == len(sr)
        assert g["new_rev_share"] == _fl(rn / (rn + rr), 6)
    first_month = min(agg)
    assert got[first_month]["new_rev_share"] == 1.0  # everyone is new


def test_revenue_decomposition_identity(spark):
    """volume + price effects bridge exactly to the revenue delta
    (up to the two floors), per segment, against an independent walk."""
    from pdf_extractor_spark.analytics.relational import (
        DECOMP_Y0,
        DECOMP_Y1,
        revenue_decomposition_yoy,
    )

    cust = {
        r["c_custkey"]: r["c_mktsegment"]
        for r in spark.read.parquet(f"{SF}/customer.parquet").collect()
    }
    agg = defaultdict(lambda: [0, 0, 0, 0])  # n0, r0, n1, r1
    for r in _orders(spark):
        y = r["o_orderdate"].year
        if y not in (DECOMP_Y0, DECOMP_Y1):
            continue
        seg = cust[r["o_custkey"]]
        cents = math.floor(r["o_totalprice"] * 100 + 1e-6)
        a = agg[seg]
        if y == DECOMP_Y0:
            a[0] += 1
            a[1] += cents
        else:
            a[2] += 1
            a[3] += cents
    rows = {
        r["c_mktsegment"]: r
        for r in revenue_decomposition_yoy(spark, SF).collect()
    }
    assert set(rows) == set(agg)
    for seg, (n0, r0, n1, r1) in agg.items():
        g = rows[seg]
        assert (g["n0"], g["rev0_cents"], g["n1"], g["rev1_cents"]) == (
            n0,
            r0,
            n1,
            r1,
        )
        p0, p1 = r0 / n0, r1 / n1
        vol = (n1 - n0) * p0 / 100.0
        price = n1 * (p1 - p0) / 100.0
        assert g["volume_effect_dollars"] == _fl(vol, 2)
        assert g["price_effect_dollars"] == _fl(price, 2)
        assert g["delta_dollars"] == _fl((r1 - r0) / 100.0, 2)
        # bridge identity up to the two independent floors
        assert (
            abs(
                g["volume_effect_dollars"]
                + g["price_effect_dollars"]
                - g["delta_dollars"]
            )
            <= 0.03
        )


def test_variance_decomposition_tiles(spark):
    """The three shares are non-negative-ish and tile to ~1; the dow
    model can only EXPLAIN variance left by the trend (share_dow >= 0
    by construction of sequential SSE)."""
    from pdf_extractor_spark.analytics.relational import (
        variance_decomposition_daily,
    )

    got = variance_decomposition_daily(spark, SF).collect()
    assert len(got) == 1
    r = got[0]
    total = r["share_trend"] + r["share_dow"] + r["share_residual"]
    assert abs(total - 1.0) < 1e-4
    assert r["share_residual"] >= 0.0
    assert r["share_dow"] >= -1e-9  # group SSE <= ungrouped SSE
    assert r["share_trend"] >= -1e-9
    assert r["n_days"] > 0


def test_hourly_load_recompute(spark):
    """The 7x24 grid equals an independent epoch walk; exactly one
    peak hour per weekday, and it is the argmax with the hour
    tiebreak."""
    import datetime

    from pdf_extractor_spark.analytics.relational import hourly_load_profile

    epoch = datetime.datetime(1970, 1, 1)
    grid = Counter()
    for r in spark.read.parquet(f"{SF}/events.parquet").collect():
        t_s = math.floor((r["ts"] - epoch).total_seconds())
        day = t_s // 86400
        grid[((day + 3) % 7, (t_s - day * 86400) // 3600)] += 1
    rows = hourly_load_profile(spark, SF).collect()
    assert {(r["dow"], r["hour"]) for r in rows} == set(grid)
    day_tot = Counter()
    for (dw, _h), c in grid.items():
        day_tot[dw] += c
    peaks = defaultdict(list)
    for r in rows:
        assert r["n_events"] == grid[(r["dow"], r["hour"])]
        assert r["share_of_day"] == _fl(
            grid[(r["dow"], r["hour"])] / day_tot[r["dow"]], 6
        )
        if r["is_peak_hour"]:
            peaks[r["dow"]].append(r["hour"])
    for dw in day_tot:
        assert len(peaks[dw]) == 1
        expect = min(
            (h for (d, h) in grid if d == dw),
            key=lambda h: (-grid[(dw, h)], h),
        )
        assert peaks[dw][0] == expect
