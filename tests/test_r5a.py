"""R5-1..R5-4 units: the TPC-H 22/22 close (Q11/Q12/Q20/Q21) —
each recomputed independently in pure Python (pandas + hashlib md5)
over the sf0.001 fixture, including the md5-derived
shipmode/commit/receipt attributes and the exact-integer partsupp
stand-in."""

import hashlib
import math
from collections import defaultdict

import pandas as pd

SF = "/root/testdata/sf0.001"

MODES = ("AIR", "AIR REG", "FOB", "MAIL", "RAIL", "SHIP", "TRUCK")


def _tbl(name):
    return pd.read_parquet(f"{SF}/{name}.parquet")


def _h(ok, ln, lo, hi):
    d = hashlib.md5(f"lx|{ok}|{ln}".encode()).hexdigest()
    return int(d[lo:hi], 16)


def _ext_row(ok, ln):
    mode = MODES[_h(ok, ln, 0, 8) % 7]
    commit = _h(ok, ln, 8, 16) % 31
    receipt = _h(ok, ln, 16, 24) % 30 + 1
    return mode, commit, receipt


def _ps(li):
    """Exact-integer partsupp stand-in: availqty + supplycost grid."""
    agg = {}
    for r in li.itertuples():
        k = (r.l_partkey, r.l_suppkey)
        q = math.floor(r.l_quantity + 1e-6)
        uc = r.l_extendedprice / r.l_quantity
        if k not in agg:
            agg[k] = [q, uc]
        else:
            agg[k][0] += q
            agg[k][1] = min(agg[k][1], uc)
    return {
        k: (int(v[0]), int(math.floor(v[1] * 10000 + 1e-6)))
        for k, v in agg.items()
    }


def test_tpch_q11_recompute(spark):
    """R5-1: per-part stock value over the nation slice, cut at
    2x the mean on the exact BIGINT grid."""
    from pdf_extractor_spark.analytics.relational import (
        TPCH_Q11_MULT,
        tpch_q11_important_stock,
    )

    li, sup = _tbl("lineitem"), _tbl("supplier")
    nat = set(
        sup[sup.s_nationkey % 5 == 0].s_suppkey.astype(int)
    )
    per_part = defaultdict(int)
    for (pk, sk), (availqty, cost_grid) in _ps(li).items():
        if sk in nat:
            per_part[int(pk)] += cost_grid * availqty
    total = sum(per_part.values())
    n_parts = len(per_part)
    expect = sorted(
        (
            (pk, v, v / 1e4)
            for pk, v in per_part.items()
            if v * n_parts > TPCH_Q11_MULT * total
        ),
        key=lambda t: (-t[1], t[0]),
    )
    got = [
        (r["partkey"], r["value_grid"], r["value"])
        for r in tpch_q11_important_stock(spark, SF).collect()
    ]
    assert got == expect and len(got) > 0


def test_tpch_q12_recompute(spark):
    """R5-2: high/low priority late-line counts for MAIL/SHIP in the
    1996 ship window."""
    from pdf_extractor_spark.analytics.relational import (
        tpch_q12_shipmode_priority,
    )

    li, orders = _tbl("lineitem"), _tbl("orders")
    prio = dict(
        zip(orders.o_orderkey.astype(int), orders.o_orderpriority)
    )
    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1997-01-01")
    counts = defaultdict(lambda: [0, 0])
    for r in li.itertuples():
        mode, commit, receipt = _ext_row(
            int(r.l_orderkey), int(r.l_linenumber)
        )
        if (
            mode in ("MAIL", "SHIP")
            and receipt > commit
            and lo <= r.l_shipdate < hi
        ):
            hi_p = prio[int(r.l_orderkey)] in ("1-URGENT", "2-HIGH")
            counts[mode][0 if hi_p else 1] += 1
    expect = sorted(
        (m, c[0], c[1]) for m, c in counts.items()
    )
    got = [
        (r["shipmode"], r["high_line_count"], r["low_line_count"])
        for r in tpch_q12_shipmode_priority(spark, SF).collect()
    ]
    assert got == expect and len(got) == 2


def test_tpch_q20_recompute(spark):
    """R5-3: nation-slice suppliers with availqty > half the 1996
    window shipments of a 'small%' part."""
    from pdf_extractor_spark.analytics.relational import (
        tpch_q20_promotion_suppliers,
    )

    li, part, sup = _tbl("lineitem"), _tbl("part"), _tbl("supplier")
    small = set(
        part[part.p_name.str.startswith("small")].p_partkey.astype(int)
    )
    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1997-01-01")
    window = defaultdict(int)
    for r in li.itertuples():
        if lo <= r.l_shipdate < hi:
            window[(int(r.l_partkey), int(r.l_suppkey))] += math.floor(
                r.l_quantity + 1e-6
            )
    excess_supp = set()
    for (pk, sk), (availqty, _) in _ps(li).items():
        k = (int(pk), int(sk))
        if (
            int(pk) in small
            and k in window
            and availqty * 2 > window[k]
        ):
            excess_supp.add(int(sk))
    expect = sorted(
        (r.s_name, int(r.s_suppkey))
        for r in sup.itertuples()
        if r.s_nationkey % 4 == 1 and int(r.s_suppkey) in excess_supp
    )
    expect = [(sk, nm) for nm, sk in expect]
    got = [
        (r["s_suppkey"], r["s_name"])
        for r in tpch_q20_promotion_suppliers(spark, SF).collect()
    ]
    assert got == expect and len(got) > 0


def test_tpch_q21_recompute(spark):
    """R5-4: the multi-EXISTS anti pattern — sole-late suppliers on
    multi-supplier F orders, counted per supplier."""
    from pdf_extractor_spark.analytics.relational import (
        tpch_q21_waiting_suppliers,
    )

    li, orders, sup = _tbl("lineitem"), _tbl("orders"), _tbl("supplier")
    f_orders = set(
        orders[orders.o_orderstatus == "F"].o_orderkey.astype(int)
    )
    nat = {
        int(r.s_suppkey): r.s_name
        for r in sup.itertuples()
        if r.s_nationkey % 5 == 2
    }
    supp_by_order = defaultdict(set)
    late_by_order = defaultdict(set)
    for r in li.itertuples():
        ok, sk = int(r.l_orderkey), int(r.l_suppkey)
        supp_by_order[ok].add(sk)
        _, commit, receipt = _ext_row(ok, int(r.l_linenumber))
        if receipt > commit:
            late_by_order[ok].add(sk)
    numwait = defaultdict(int)
    for ok, late in late_by_order.items():
        if ok not in f_orders:
            continue
        for sk in late:
            if (
                sk in nat
                and len(supp_by_order[ok]) >= 2
                and late == {sk}
            ):
                numwait[nat[sk]] += 1
    expect = sorted(
        ((nm, c) for nm, c in numwait.items()),
        key=lambda t: (-t[1], t[0]),
    )[:100]
    got = [
        (r["s_name"], r["numwait"])
        for r in tpch_q21_waiting_suppliers(spark, SF).collect()
    ]
    assert got == expect and len(got) > 0
