"""R4-75..78 units: pure-Python recomputes of the calibration
reliability bins, the DQ constraint audit, the cross-fold leakage
grid, and the per-day concurrency sweep (the DuckDB gate covers full
parity; these pin the semantics against independent walks)."""

import calendar
import datetime
import hashlib
import math
from collections import defaultdict

SF = "/root/testdata/sf0.001"

US_PER_DAY = 86_400_000_000


def _fl4(x):
    return math.floor(x * 10000 + 1e-6) / 10000


def test_calibration_recompute(spark):
    """Bin counts, mean predicted p and realized keep rate equal a
    Python walk over the sampler's own output; bins partition the
    corpus; the gap column is the exact-integer |conf - acc|."""
    from pdf_extractor_spark.analytics.quality_rules import (
        calibration_reliability,
        classifier_rejection_sample,
    )

    sampled = classifier_rejection_sample(spark, SF).collect()
    bins = defaultdict(lambda: [0, 0, 0])  # n, kept, sum_p_i
    for r in sampled:
        p_i = math.floor(r["p_keep"] * 10000 + 1e-6)
        b = min(p_i // 1000, 9)
        bins[b][0] += 1
        bins[b][1] += int(r["kept"])
        bins[b][2] += p_i
    got = {r["bin"]: r for r in calibration_reliability(spark, SF).collect()}
    assert set(got) == set(bins)
    assert sum(r["n"] for r in got.values()) == len(sampled)
    for b, (n, k, sp) in bins.items():
        r = got[b]
        assert r["n"] == n and r["kept_n"] == k
        assert r["mean_p_keep"] == _fl4(sp / (10000.0 * n))
        assert r["keep_rate"] == _fl4(k / n)
        assert r["abs_gap"] == _fl4(abs(sp - 10000 * k) / (10000.0 * n))


def test_dq_audit_recompute(spark):
    """Every check's (n_checked, n_violations) equals a Python
    recompute over the raw tables; the synthetic warehouse passes all
    referential checks (and the audit proves both engines agree on the
    anti-join / distinct / domain semantics that establish that)."""
    from pdf_extractor_spark.analytics.relational import (
        dq_referential_audit,
    )

    li = spark.read.parquet(f"{SF}/lineitem.parquet").collect()
    orders = spark.read.parquet(f"{SF}/orders.parquet").collect()
    cust = {
        r["c_custkey"]
        for r in spark.read.parquet(f"{SF}/customer.parquet").collect()
    }
    okeys = {r["o_orderkey"] for r in orders}
    odate = {r["o_orderkey"]: r["o_orderdate"] for r in orders}
    want = {
        "lineitem_orderkey_fk": (
            len(li),
            sum(1 for r in li if r["l_orderkey"] not in okeys),
        ),
        "orders_custkey_fk": (
            len(orders),
            sum(1 for r in orders if r["o_custkey"] not in cust),
        ),
        "orders_orderkey_pk": (len(orders), len(orders) - len(okeys)),
        "lineitem_line_pk": (
            len(li),
            len(li) - len({(r["l_orderkey"], r["l_linenumber"]) for r in li}),
        ),
        "lineitem_discount_domain": (
            len(li),
            sum(1 for r in li if not 0 <= r["l_discount"] <= 1),
        ),
        "lineitem_quantity_positive": (
            len(li),
            sum(1 for r in li if r["l_quantity"] <= 0),
        ),
        "ship_on_or_after_order": (
            sum(1 for r in li if r["l_orderkey"] in okeys),
            sum(
                1
                for r in li
                if r["l_orderkey"] in okeys
                and r["l_shipdate"] < odate[r["l_orderkey"]]
            ),
        ),
    }
    got = {
        r["check_name"]: (r["n_checked"], r["n_violations"], r["passed"])
        for r in dq_referential_audit(spark, SF).collect()
    }
    assert set(got) == set(want)
    for name, (nc, nv) in want.items():
        assert got[name] == (nc, nv, nv == 0), name


def test_fold_leakage_recompute(spark):
    """The fold grid equals hashing the live candidate pairs in
    Python; the grid is the complete upper triangle; injected dups
    guarantee total pair mass > 0."""
    from pdf_extractor_spark.analytics.dedup import (
        N_FOLDS,
        fold_leakage_audit,
        minhash_lsh_pairs,
    )

    def fold(doc_id):
        h = hashlib.md5(f"fold|{doc_id}".encode()).hexdigest()[:8]
        return int(h, 16) % N_FOLDS

    want = defaultdict(int)
    for r in minhash_lsh_pairs(spark, SF).collect():
        fa, fb = fold(r["a_id"]), fold(r["b_id"])
        want[(min(fa, fb), max(fa, fb))] += 1
    got = {
        (r["fold_a"], r["fold_b"]): (r["n_pairs"], r["is_leak"])
        for r in fold_leakage_audit(spark, SF).collect()
    }
    assert set(got) == {
        (a, b) for a in range(N_FOLDS) for b in range(a, N_FOLDS)
    }
    assert sum(n for n, _ in got.values()) > 0
    for (a, b), (n, leak) in got.items():
        assert n == want.get((a, b), 0)
        assert leak == (a != b)


def _us(dt: datetime.datetime) -> int:
    return (
        calendar.timegm(dt.timetuple()) * 1_000_000 + dt.microsecond
    )


def test_concurrent_peak_recompute(spark):
    """Per-day peak, its earliest instant, and the day-session count
    equal a sequential sweep over Python-sessionized intervals
    (inclusive-µs occupancy, net-delta-per-instant semantics)."""
    from pdf_extractor_spark.analytics.relational import (
        SESSION_GAP_S,
        concurrent_sessions_peak,
    )

    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    per_user = defaultdict(list)
    for r in rows:
        per_user[r["user_id"]].append((_us(r["ts"]), r["event_id"]))
    sessions = []
    for evs in per_user.values():
        evs.sort()
        cur = None
        for t, _eid in evs:
            if cur is None or t - prev >= SESSION_GAP_S * 1_000_000:
                if cur is not None:
                    sessions.append(cur)
                cur = [t, t]
            else:
                cur[1] = t
            prev = t
        sessions.append(cur)

    segs = defaultdict(list)  # day index -> [(s, e_exclusive)]
    for s, e in sessions:
        for d in range(s // US_PER_DAY, e // US_PER_DAY + 1):
            lo = max(s, d * US_PER_DAY)
            hi = min(e, (d + 1) * US_PER_DAY - 1) + 1
            segs[d].append((lo, hi))

    got = {
        r["day"]: (
            r["n_day_sessions"],
            r["peak_concurrency"],
            r["peak_at_us"],
        )
        for r in concurrent_sessions_peak(spark, SF).collect()
    }
    epoch = datetime.date(1970, 1, 1)
    want_days = {
        (epoch + datetime.timedelta(days=d)).isoformat() for d in segs
    }
    assert set(got) == want_days
    for d, items in segs.items():
        net = defaultdict(int)
        for lo, hi in items:
            net[lo] += 1
            net[hi] -= 1
        cum, peak, peak_at = 0, -1, None
        for t in sorted(net):
            cum += net[t]
            if cum > peak:
                peak, peak_at = cum, t
        day = (epoch + datetime.timedelta(days=d)).isoformat()
        assert got[day] == (len(items), peak, peak_at), day
    assert any(p > 1 for _n, p, _t in got.values())
