"""R4-119..122 units: pure-Python recomputes of the weekday-adjusted
anomaly cut, the Wald-Wolfowitz runs test, the cohort LTV curve, and
the calendar-gap linear interpolation."""

import math
from collections import defaultdict

SF = "/root/testdata/sf0.001"


def _fl(x, k):
    return math.floor(x * 10**k + 1e-6) / 10**k


def _daily_cents(spark):
    agg = defaultdict(int)
    for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
        agg[r["o_orderdate"].date()] += math.floor(
            r["o_totalprice"] * 100 + 1e-6
        )
    return agg


def test_dow_anomaly_recompute(spark):
    """The top-N cut equals an independent walk on the floored-z grid
    with the date tiebreak, and every z is scored against its own
    weekday's moments."""
    from pdf_extractor_spark.analytics.relational import (
        ANOM_TOP,
        dow_adjusted_anomalies,
    )

    daily = {
        d: (
            (d.toordinal() - 719163 + 3) % 7,
            cents // 100,
        )
        for d, cents in _daily_cents(spark).items()
    }
    mom = defaultdict(lambda: [0, 0, 0])
    for _d, (idx, y) in daily.items():
        m = mom[idx]
        m[0] += 1
        m[1] += y
        m[2] += y * y
    scored = []
    for d, (idx, y) in daily.items():
        n, s, ss = mom[idx]
        mu = s / n
        sd = math.sqrt(ss / n - mu * mu)
        zq = math.floor((y - mu) / sd * 10000 + 1e-6)
        scored.append((-abs(zq), d, idx, y, zq))
    scored.sort()
    expect = scored[:ANOM_TOP]
    rows = dow_adjusted_anomalies(spark, SF).collect()
    assert len(rows) == ANOM_TOP
    got = [
        (r["d"], r["dow_idx"], r["revenue_dollars"], r["z_dow"], r["direction"])
        for r in rows
    ]
    for (_negabs, d, idx, y, zq), g in zip(expect, got):
        assert g == (
            d,
            idx,
            y,
            zq / 10000,
            "high" if zq >= 0 else "low",
        )


def test_runs_test_recompute(spark):
    """Sign-run counts and the normal-approximation z equal the
    closed forms over an independent OLS-residual walk; the same
    quantized residual series as the Durbin-Watson unit."""
    from pdf_extractor_spark.analytics.relational import residual_runs_test

    cents = _daily_cents(spark)
    d0 = min(cents)
    pts = sorted(((d - d0).days, c // 100) for d, c in cents.items())
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(v for _, v in pts)
    sxy = sum(x * v for x, v in pts)
    sxx = sum(x * x for x, _ in pts)
    b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    a = (sy - b * sx) / n
    signs = [
        1 if math.floor(v - (a + b * x) + 1e-6) >= 0 else 0 for x, v in pts
    ]
    n1 = sum(signs)
    n2 = n - n1
    runs = 1 + sum(
        1 for i in range(1, n) if signs[i] != signs[i - 1]
    )
    e_r = 2.0 * n1 * n2 / (n1 + n2) + 1.0
    var_r = (2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)) / (
        (n1 + n2) ** 2 * (n1 + n2 - 1.0)
    )
    got = residual_runs_test(spark, SF).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n_pos"] == n1 and r["n_neg"] == n2
    assert r["n_runs"] == runs
    assert r["expected_runs"] == _fl(e_r, 4)
    assert r["z_runs"] == _fl((runs - e_r) / math.sqrt(var_r), 4)
    assert 2 <= runs <= n


def test_cohort_ltv_recompute(spark):
    """Every (cohort, offset) cell equals an independent walk; the
    cumulative column is monotone and LTV divides by the FULL cohort
    size (not the month's active count)."""
    from pdf_extractor_spark.analytics.relational import (
        LTV_MAX_OFFSET,
        cohort_ltv_curve,
    )

    orders = defaultdict(list)
    for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
        d = r["o_orderdate"].date()
        orders[r["o_custkey"]].append(
            (d.year * 12 + d.month, math.floor(r["o_totalprice"] * 100 + 1e-6))
        )
    cohort = {c: min(m for m, _ in v) for c, v in orders.items()}
    size = defaultdict(int)
    for c, m0 in cohort.items():
        size[m0] += 1
    cell = defaultdict(lambda: [set(), 0])
    for c, v in orders.items():
        m0 = cohort[c]
        for m, cts in v:
            off = m - m0
            if off <= LTV_MAX_OFFSET:
                cell[(m0, off)][0].add(c)
                cell[(m0, off)][1] += cts
    rows = {}
    for r in cohort_ltv_curve(spark, SF).collect():
        cm = r["cohort_month"]
        m0 = cm.year * 12 + cm.month
        rows[(m0, r["offset_m"])] = r
    assert set(rows) == set(cell)
    cum = defaultdict(int)
    for (m0, off) in sorted(cell):
        custs, cts = cell[(m0, off)]
        cum[m0] += cts
        r = rows[(m0, off)]
        assert r["cohort_size"] == size[m0]
        assert r["n_active"] == len(custs)
        assert r["cents_m"] == cts
        assert r["cum_cents"] == cum[m0]
        assert r["ltv_cents_per_cust"] == math.floor(cum[m0] / size[m0])
        assert r["cohort_month"].day == 1


def test_gap_interpolation_recompute(spark):
    """Each filled day equals the exact linear interpolation between
    its nearest observed neighbors, and only dark days are emitted."""
    from pdf_extractor_spark.analytics.relational import (
        daily_gap_interpolation,
    )

    cents = _daily_cents(spark)
    d0, d1 = min(cents), max(cents)
    obs = {d.toordinal(): c for d, c in cents.items()}
    expect = {}
    for o in range(d0.toordinal(), d1.toordinal() + 1):
        if o in obs:
            continue
        px = max(k for k in obs if k < o)
        nx = min(k for k in obs if k > o)
        pv, nv = obs[px], obs[nx]
        expect[o] = (
            px,
            nx,
            pv,
            nv,
            pv + math.floor((nv - pv) * (o - px) / (nx - px) + 1e-6),
        )
    rows = {
        r["d"].toordinal(): r
        for r in daily_gap_interpolation(spark, SF).collect()
    }
    assert set(rows) == set(expect)
    for o, (px, nx, pv, nv, iv) in expect.items():
        r = rows[o]
        assert r["prev_day"].toordinal() == px
        assert r["next_day"].toordinal() == nx
        assert r["prev_cents"] == pv and r["next_cents"] == nv
        assert r["interp_cents"] == iv
        assert min(pv, nv) <= iv <= max(pv, nv)
