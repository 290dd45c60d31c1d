"""R4-163..166 units: three-model attribution comparison, month
seasonality, balance-activity correlation, brand return rates."""

import math
import datetime
from collections import Counter, defaultdict

SF = "/root/testdata/sf0.001"


def _fl(x, k):
    return math.floor(x * 10**k + 1e-6) / 10**k


def test_attribution_compare_recompute(spark):
    """All three models equal an independent event walk; last-touch
    purchase counts tile to the purchase total, and the three models'
    total credited revenue is identical (conservation)."""
    from pdf_extractor_spark.analytics.relational import (
        ATTR_WINDOW_US,
        attribution_model_compare,
    )

    epoch = datetime.datetime(1970, 1, 1)
    by = defaultdict(list)
    for r in spark.read.parquet(f"{SF}/events.parquet").collect():
        t_us = round((r["ts"] - epoch).total_seconds() * 1e6)
        by[r["user_id"]].append(
            (t_us, r["event_id"], r["event_type"], r["value"])
        )
    last_n = Counter()
    last_rev = Counter()
    first_n = Counter()
    first_rev = Counter()
    lin_qq = Counter()
    n_purch = 0
    for u, evs in by.items():
        touches = sorted(
            (t, eid, typ)
            for t, eid, typ, _v in evs
            if typ in ("view", "click")
        )
        for t_us, eid, typ, v in evs:
            if typ != "purchase":
                continue
            n_purch += 1
            rev = math.floor(v * 100 + 1e-6)
            win = [
                (t, i, ty)
                for t, i, ty in touches
                if t < t_us and t_us - t <= ATTR_WINDOW_US
            ]
            if not win:
                last_n["none"] += 1
                last_rev["none"] += rev
                first_n["none"] += 1
                first_rev["none"] += rev
                lin_qq["none"] += rev * 10000
                continue
            lch = max(win)[2]
            fch = min(win)[2]
            last_n[lch] += 1
            last_rev[lch] += rev
            first_n[fch] += 1
            first_rev[fch] += rev
            for _t, _i, ty in win:
                lin_qq[ty] += math.floor(rev * 10000 / len(win))
    rows = {
        r["channel"]: r
        for r in attribution_model_compare(spark, SF).collect()
    }
    assert set(rows) == set(last_n) | set(first_n) | set(lin_qq)
    for ch, r in rows.items():
        assert r["last_n"] == last_n.get(ch, 0)
        assert r["last_rev_cents"] == last_rev.get(ch, 0)
        assert r["first_n"] == first_n.get(ch, 0)
        assert r["first_rev_cents"] == first_rev.get(ch, 0)
        assert r["linear_rev_dollars"] == _fl(
            lin_qq.get(ch, 0) / 10000.0 / 100.0, 2
        )
    assert sum(r["last_n"] for r in rows.values()) == n_purch
    assert sum(r["last_rev_cents"] for r in rows.values()) == sum(
        r["first_rev_cents"] for r in rows.values()
    )


def test_month_seasonality_recompute(spark):
    """12 month rows; the (year,month)-weighted mean index is 1."""
    from pdf_extractor_spark.analytics.relational import (
        month_seasonality_index,
    )

    cents = Counter()
    months = defaultdict(set)
    for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
        d = r["o_orderdate"].date()
        cents[d.month] += math.floor(r["o_totalprice"] * 100 + 1e-6)
        months[d.month].add((d.year, d.month))
    nn = sum(len(v) for v in months.values())
    ss = sum(cents.values())
    rows = {r["moy"]: r for r in month_seasonality_index(spark, SF).collect()}
    assert set(rows) == set(range(1, 13))
    wsum = 0.0
    for m, r in rows.items():
        assert r["n_months"] == len(months[m])
        assert r["cents"] == cents[m]
        expect = (cents[m] / len(months[m])) / (ss / nn)
        assert r["seasonal_index"] == _fl(expect, 6)
        wsum += len(months[m]) * expect
    assert abs(wsum / nn - 1.0) < 1e-9


def test_acctbal_corr_recompute(spark):
    """Pearson r over ALL customers (zero-order ones included) equals
    the closed form; |r| <= 1 and actives <= customers."""
    from pdf_extractor_spark.analytics.relational import acctbal_activity_corr

    bal = {
        r["c_custkey"]: math.floor(r["c_acctbal"] * 100 + 1e-6)
        for r in spark.read.parquet(f"{SF}/customer.parquet").collect()
    }
    cnt = Counter()
    for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
        cnt[r["o_custkey"]] += 1
    pts = [(cnt.get(c, 0), b) for c, b in bal.items()]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    syy = sum(y * y for _, y in pts)
    r_exp = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    got = acctbal_activity_corr(spark, SF).collect()
    assert len(got) == 1
    g = got[0]
    assert g["n_customers"] == n
    assert g["n_active"] == sum(1 for x, _ in pts if x > 0)
    assert g["neg_active"] == sum(1 for x, y in pts if x > 0 and y < 0)
    assert g["pearson_r"] == _fl(r_exp, 6)
    assert -1.0 <= g["pearson_r"] <= 1.0
    assert g["neg_active_share"] == _fl(g["neg_active"] / g["n_active"], 6)


def test_brand_return_recompute(spark):
    """Per-brand counts and Wilson bounds equal the closed forms; the
    rate sits inside its own interval; the worse-than-corpus flag
    compares FLOORED bounds."""
    from pdf_extractor_spark.analytics.relational import (
        _BRAND_Z,
        brand_return_rates,
    )

    brand = {
        r["p_partkey"]: r["p_brand"]
        for r in spark.read.parquet(f"{SF}/part.parquet").collect()
    }
    n_l = Counter()
    n_r = Counter()
    for r in spark.read.parquet(f"{SF}/lineitem.parquet").collect():
        b = brand[r["l_partkey"]]
        n_l[b] += 1
        if r["l_returnflag"] == "R":
            n_r[b] += 1
    tn, tr = sum(n_l.values()), sum(n_r.values())
    corpus_q = math.floor(tr / tn * 1e6 + 1e-6)
    rows = {r["p_brand"]: r for r in brand_return_rates(spark, SF).collect()}
    assert set(rows) == set(n_l)
    z2 = _BRAND_Z * _BRAND_Z
    for b in n_l:
        n, k = n_l[b], n_r[b]
        p = k / n
        center = (p + z2 / (2.0 * n)) / (1.0 + z2 / n)
        half = (
            _BRAND_Z
            * math.sqrt(p * (1.0 - p) / n + z2 / (4.0 * n * n))
            / (1.0 + z2 / n)
        )
        r = rows[b]
        assert (r["n_lines"], r["n_returns"]) == (n, k)
        assert r["return_rate"] == _fl(p, 6)
        assert r["wilson_lo"] == _fl(center - half, 6)
        assert r["wilson_hi"] == _fl(center + half, 6)
        assert r["wilson_lo"] - 1e-9 <= r["return_rate"] <= r["wilson_hi"] + 1e-9
        assert r["worse_than_corpus"] == (
            math.floor((center - half) * 1e6 + 1e-6) > corpus_q
        )
