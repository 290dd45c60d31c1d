"""R4-53..56 warehouse-analytics units: pure-Python recomputes of the
RFM segmentation, market-basket rules, SCD-2 intervals, and trend
anomaly flags (the DuckDB gate covers full parity; these pin the
semantics against an independent walk)."""

import datetime as dt
import math
from collections import defaultdict
from itertools import combinations

SF = "/root/testdata/sf0.001"


def _fl4(x):
    return math.floor(x * 10000 + 1e-6) / 10000


def _us(ts):
    return int(ts.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)


def test_rfm_segments_recompute(spark):
    """Quartile cells equal a Python nearest-rank walk: cutpoint q =
    value at rank ceil(q*n); bucket = 1 + #cutpoints strictly below."""
    from pdf_extractor_spark.analytics.relational import rfm_segments

    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    ).collect()
    per = {}
    for o in orders:
        d = o["o_orderdate"].date()
        c = per.setdefault(o["o_custkey"], [d, 0, 0.0])
        c[0] = max(c[0], d)
        c[1] += 1
        c[2] += o["o_totalprice"]
    anchor = max(c[0] for c in per.values())
    metrics = {
        k: (
            (anchor - c[0]).days,
            c[1],
            math.floor(c[2]),
        )
        for k, c in per.items()
    }

    def cutpoints(vals):
        vs = sorted(vals)
        n = len(vs)
        return [vs[math.ceil(n * q) - 1] for q in (0.25, 0.5, 0.75)]

    cuts = [cutpoints([m[i] for m in metrics.values()]) for i in range(3)]

    def bucket(v, cps):
        return 1 + sum(1 for c in cps if v > c)

    cells = defaultdict(lambda: [0, 0])
    for r_days, freq, mon_fl in metrics.values():
        key = (
            bucket(r_days, cuts[0]),
            bucket(freq, cuts[1]),
            bucket(mon_fl, cuts[2]),
        )
        cells[key][0] += 1
        cells[key][1] += mon_fl
    want = {
        k: (c[0], _fl4(c[1] / c[0])) for k, c in cells.items()
    }
    got = {
        (r["r_bucket"], r["f_bucket"], r["m_bucket"]): (
            r["n_customers"],
            r["avg_monetary"],
        )
        for r in rfm_segments(spark, SF).collect()
    }
    assert got == want
    assert sum(n for n, _ in got.values()) == len(per)


def test_market_basket_recompute(spark):
    """Top-k rules equal a per-order combinations walk with the same
    min-support gate, scoring, and total tiebreak."""
    from pdf_extractor_spark.analytics.relational import (
        MB_MIN_PAIR,
        MB_TOP_K,
        market_basket_lift,
    )

    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    ).collect()
    baskets = defaultdict(set)
    for r in li:
        baskets[r["l_orderkey"]].add(r["l_partkey"])
    n_orders = len(baskets)
    item = defaultdict(int)
    pair = defaultdict(int)
    for parts in baskets.values():
        for p in parts:
            item[p] += 1
        for a, b in combinations(sorted(parts), 2):
            pair[(a, b)] += 1
    rules = [
        (
            a,
            b,
            c,
            _fl4(c / n_orders),
            _fl4(c / item[a]),
            _fl4(c * n_orders / (item[a] * item[b])),
        )
        for (a, b), c in pair.items()
        if c >= MB_MIN_PAIR
    ]
    rules.sort(key=lambda r: (-r[5], r[0], r[1]))
    want = rules[:MB_TOP_K]
    got = [
        (r["a_part"], r["b_part"], r["pair_cnt"], r["support"],
         r["confidence"], r["lift"])
        for r in market_basket_lift(spark, SF).collect()
    ]
    assert got == want
    assert len(got) > 0  # the synthetic corpus has repeating pairs


def test_scd2_intervals_recompute(spark):
    """Per-state interval counts and exact microsecond durations equal
    a per-user change-compression walk."""
    from pdf_extractor_spark.analytics.relational import scd2_state_intervals

    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    by_user = defaultdict(list)
    for e in ev:
        by_user[e["user_id"]].append(e)
    agg = defaultdict(lambda: [0, 0, 0])  # n_intervals, n_open, dur_us
    for es in by_user.values():
        es.sort(key=lambda e: (_us(e["ts"]), e["event_id"]))
        changes = [
            e for i, e in enumerate(es)
            if i == 0 or es[i - 1]["event_type"] != e["event_type"]
        ]
        for i, e in enumerate(changes):
            a = agg[e["event_type"]]
            a[0] += 1
            if i + 1 < len(changes):
                a[2] += _us(changes[i + 1]["ts"]) - _us(e["ts"])
            else:
                a[1] += 1
    rows = scd2_state_intervals(spark, SF).collect()
    got = {
        r["event_type"]: (
            r["n_intervals"], r["n_open"], r["total_closed_s"],
            r["avg_closed_s"],
        )
        for r in rows
    }
    for state, (n, n_open, dur) in agg.items():
        closed = n - n_open
        want = (
            n,
            n_open,
            _fl4(dur / 1e6),
            _fl4(dur / 1e6 / closed) if closed else 0.0,
        )
        assert got[state] == want, state
    assert set(got) == set(agg)


def test_daily_trend_anomaly_recompute(spark):
    """Fit and z equal the closed-form OLS within floor noise; flags
    match away from the threshold boundary."""
    from pdf_extractor_spark.analytics.relational import (
        TREND_Z_THR,
        daily_trend_anomaly,
    )

    ev = spark.read.parquet(f"{SF}/events.parquet").select("ts").collect()
    daily = defaultdict(int)
    for e in ev:
        daily[e["ts"].date()] += 1
    d0 = min(daily)
    pts = sorted(((d - d0).days, c) for d, c in daily.items())
    n = float(len(pts))
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    den = n * sxx - sx * sx
    slope = (n * sxy - sx * sy) / den if den > 0 else 0.0
    icept = (sy - slope * sx) / n
    resid = {x: y - (slope * x + icept) for x, y in pts}
    rms = math.sqrt(sum(r * r for r in resid.values()) / n)
    rows = daily_trend_anomaly(spark, SF).collect()
    assert len(rows) == len(pts)
    for r in rows:
        d = dt.date.fromisoformat(r["day"])
        x = (d - d0).days
        assert r["n_events"] == daily[d]
        assert abs(r["fit"] - _fl4(slope * x + icept)) < 2e-4
        z = resid[x] / rms if rms > 0 else 0.0
        assert abs(r["z"] - _fl4(z)) < 2e-4
        if abs(abs(_fl4(z)) - TREND_Z_THR) > 1e-3:
            assert r["anomaly"] == (abs(_fl4(z)) >= TREND_Z_THR), r["day"]
