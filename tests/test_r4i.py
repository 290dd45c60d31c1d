"""R4-87..90 units: pure-Python recomputes of the BFS level sets, the
RANGE-frame trailing KPI, the GROUPING SETS report, and the
two-proportion z-test (the DuckDB gate covers full parity; these pin
the semantics against independent walks / the published closed
forms)."""

import math
from collections import defaultdict, deque

SF = "/root/testdata/sf0.001"


def _fl(x, k):
    return math.floor(x * 10**k + 1e-6) / 10**k


def test_bfs_recompute(spark):
    """Every emitted distance equals the unbounded Python BFS distance
    and every vertex within BFS_ROUNDS hops is present — the K-level
    contract, exact in both directions."""
    from pdf_extractor_spark.analytics.graphalgo import (
        BFS_ROUNDS,
        BFS_SOURCE,
        bfs_distance_levels,
    )

    n = spark.read.parquet(f"{SF}/documents.parquet").count()
    out = defaultdict(set)
    for s in range(n):
        for d in ((7 * s + 1) % n, (s * s + 3) % n, s // 2):
            out[s].add(d)
    dist = {BFS_SOURCE: 0}
    q = deque([BFS_SOURCE])
    while q:
        v = q.popleft()
        for w in out[v]:
            if w not in dist:
                dist[w] = dist[v] + 1
                q.append(w)
    want = {v: d for v, d in dist.items() if d <= BFS_ROUNDS}
    got = {
        r["doc_id"]: r["dist"]
        for r in bfs_distance_levels(spark, SF).collect()
    }
    assert got == want
    # the fixture grows a real frontier (some vertex at every level)
    assert set(want.values()) == set(range(BFS_ROUNDS + 1))


def test_trailing_range_recompute(spark):
    """Trailing sums and in-window day counts equal a Python walk
    that windows by DAY VALUE (gap-aware), not by row count."""
    from pdf_extractor_spark.analytics.relational import (
        TRAIL_RANGE_DAYS,
        trailing_revenue_range,
    )

    daily = defaultdict(lambda: [0, 0])  # day_idx -> [cents, n]
    epoch = None
    import datetime

    epoch = datetime.date(1970, 1, 1)
    for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
        d = (r["o_orderdate"].date() - epoch).days
        daily[d][0] += math.floor(r["o_totalprice"] * 100 + 1e-6)
        daily[d][1] += 1
    got = {r["day"]: r for r in trailing_revenue_range(spark, SF).collect()}
    assert len(got) == len(daily)
    for d, (cents, n) in daily.items():
        window = [
            daily[x]
            for x in daily
            if d - (TRAIL_RANGE_DAYS - 1) <= x <= d
        ]
        day = (epoch + datetime.timedelta(days=d)).isoformat()
        r = got[day]
        assert r["n_orders"] == n
        assert r["revenue"] == cents / 100.0
        assert r["trailing_7d_revenue"] == sum(c for c, _ in window) / 100.0
        assert r["days_in_window"] == len(window)
    # early days have short windows (the frame is genuinely bounded)
    assert min(r["days_in_window"] for r in got.values()) < TRAIL_RANGE_DAYS


def test_grouping_sets_recompute(spark):
    """All four grouping sets are present with the Spark/DuckDB shared
    grouping_id bitmask (first column = MSB) and exact counts."""
    from pdf_extractor_spark.analytics.relational import (
        orders_grouping_sets,
    )

    rows = spark.read.parquet(f"{SF}/orders.parquet").collect()
    cells = defaultdict(lambda: [0, 0])
    for r in rows:
        cents = math.floor(r["o_totalprice"] * 100 + 1e-6)
        for key, gid in (
            ((r["o_orderpriority"], r["o_orderstatus"]), 0),
            ((r["o_orderpriority"], "(all)"), 1),
            (("(all)", r["o_orderstatus"]), 2),
            (("(all)", "(all)"), 3),
        ):
            cells[(key[0], key[1], gid)][0] += 1
            cells[(key[0], key[1], gid)][1] += cents
    got = {
        (r["priority"], r["status"], r["gid"]): (r["n_orders"], r["revenue"])
        for r in orders_grouping_sets(spark, SF).collect()
    }
    assert set(got) == set(cells)
    for key, (n, cents) in cells.items():
        assert got[key] == (n, cents / 100.0)
    assert {g for _p, _s, g in got} == {0, 1, 2, 3}


def test_ztest_recompute(spark):
    """Counts, proportions and the z score equal the pooled
    two-proportion closed form over a Python join."""
    from pdf_extractor_spark.analytics.relational import promo_share_ztest

    part = {
        r["p_partkey"]: r["p_type"] == "PROMO"
        for r in spark.read.parquet(f"{SF}/part.parquet").collect()
    }
    o_us = {}
    for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
        import calendar

        dt = r["o_orderdate"]
        o_us[r["o_orderkey"]] = (
            calendar.timegm(dt.timetuple()) * 1_000_000 + dt.microsecond
        )
    mid = (min(o_us.values()) + max(o_us.values())) / 2
    n = {False: 0, True: 0}
    k = {False: 0, True: 0}
    for r in spark.read.parquet(f"{SF}/lineitem.parquet").collect():
        wave = o_us[r["l_orderkey"]] >= mid
        n[wave] += 1
        k[wave] += part[r["l_partkey"]]
    [got] = promo_share_ztest(spark, SF).collect()
    assert (got["n_old"], got["k_old"]) == (n[False], k[False])
    assert (got["n_new"], got["k_new"]) == (n[True], k[True])
    p1, p2 = k[False] / n[False], k[True] / n[True]
    pp = (k[False] + k[True]) / (n[False] + n[True])
    z = (p1 - p2) / math.sqrt(
        pp * (1 - pp) * (1 / n[False] + 1 / n[True])
    )
    assert got["p_old"] == _fl(p1, 6)
    assert got["p_new"] == _fl(p2, 6)
    assert got["z_score"] == _fl(z, 4)
    assert got["significant"] == (abs(_fl(z, 4)) >= 1.96)
