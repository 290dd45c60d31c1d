"""R4-155..158 units: nation CAGR star, weekday box quantiles, BM25
hyperparameter sensitivity, and top-term drift between hash waves."""

import hashlib
import math
import re
from collections import Counter, defaultdict

SF = "/root/testdata/sf0.001"


def _fl(x, k):
    return math.floor(x * 10**k + 1e-6) / 10**k


def test_nation_growth_recompute(spark):
    """Per-nation first/last-year revenue and CAGR equal an
    independent star walk; only both-years-active nations appear."""
    from pdf_extractor_spark.analytics.relational import (
        nation_revenue_growth,
    )

    cust = {
        r["c_custkey"]: r["c_nationkey"]
        for r in spark.read.parquet(f"{SF}/customer.parquet").collect()
    }
    nat = {
        r["n_nationkey"]: (r["n_name"], r["n_regionkey"])
        for r in spark.read.parquet(f"{SF}/nation.parquet").collect()
    }
    reg = {
        r["r_regionkey"]: r["r_name"]
        for r in spark.read.parquet(f"{SF}/region.parquet").collect()
    }
    orders = spark.read.parquet(f"{SF}/orders.parquet").collect()
    years = [r["o_orderdate"].year for r in orders]
    y0, y1 = min(years), max(years)
    agg = defaultdict(lambda: [0, 0])
    for r in orders:
        y = r["o_orderdate"].year
        if y not in (y0, y1):
            continue
        nk = cust[r["o_custkey"]]
        name, rk = nat[nk]
        key = (reg[rk], name)
        cents = math.floor(r["o_totalprice"] * 100 + 1e-6)
        agg[key][0 if y == y0 else 1] += cents
    expect = {
        k: v for k, v in agg.items() if v[0] > 0 and v[1] > 0
    }
    rows = {
        (r["region"], r["nation"]): r
        for r in nation_revenue_growth(spark, SF).collect()
    }
    assert set(rows) == set(expect) and expect
    for k, (r0, r1) in expect.items():
        g = rows[k]
        assert g["rev_first_cents"] == r0
        assert g["rev_last_cents"] == r1
        assert g["n_years"] == y1 - y0
        assert g["cagr"] == _fl(
            (r1 / r0) ** (1.0 / (y1 - y0)) - 1.0, 6
        )


def test_weekday_box_recompute(spark):
    """Per-weekday quartiles equal the grouped histogram rule;
    p25 <= p50 <= p75 and IQR is their difference."""
    from pdf_extractor_spark.analytics.relational import weekday_revenue_box

    daily = defaultdict(int)
    for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
        daily[r["o_orderdate"].date()] += math.floor(
            r["o_totalprice"] * 100 + 1e-6
        )
    by = defaultdict(list)
    for d, cents in daily.items():
        by[(d.toordinal() - 719163 + 3) % 7].append(cents // 100)
    rows = {r["dow"]: r for r in weekday_revenue_box(spark, SF).collect()}
    assert set(rows) == set(by)
    for dow, ys in by.items():
        ys.sort()
        n = len(ys)
        def q(p):
            return ys[math.ceil(n * p / 100.0) - 1]
        r = rows[dow]
        assert r["n_days"] == n
        assert r["p25_dollars"] == q(25)
        assert r["p50_dollars"] == q(50)
        assert r["p75_dollars"] == q(75)
        assert r["p25_dollars"] <= r["p50_dollars"] <= r["p75_dollars"]
        assert r["iqr_dollars"] == r["p75_dollars"] - r["p25_dollars"]


def test_bm25_sensitivity_invariants(spark):
    """Two variant rows; overlap counts within [0, K]; footrule 0 only
    when the common set ranks identically; no_b (length-blind) must
    actually change the ranking on this length-varied corpus OR agree
    fully — either way the numbers are consistent."""
    from pdf_extractor_spark.analytics.textstats import (
        BM25_SENS_K,
        BM25_VARIANTS,
        bm25_param_sensitivity,
    )

    rows = {r["variant"]: r for r in bm25_param_sensitivity(spark, SF).collect()}
    assert set(rows) == {name for name, _k, _b in BM25_VARIANTS[1:]}
    for name, r in rows.items():
        assert r["k"] == BM25_SENS_K
        assert 0 <= r["n_common"] <= BM25_SENS_K
        assert r["overlap_share"] == _fl(r["n_common"] / BM25_SENS_K, 6)
        assert r["footrule"] >= 0
        # max possible footrule on n_common members of two K-lists
        assert r["footrule"] <= r["n_common"] * (BM25_SENS_K - 1)


def test_term_drift_recompute(spark):
    """Wave counts and both rankings equal an independent md5 walk;
    every reported term is in at least one wave's top-M."""
    from pdf_extractor_spark.analytics.textstats import (
        TERM_DRIFT_M,
        top_term_drift_waves,
    )

    c_old = Counter()
    c_new = Counter()
    for r in spark.read.parquet(f"{SF}/documents.parquet").collect():
        h = hashlib.md5(f"wave|{r['doc_id']}".encode()).hexdigest()
        tgt = c_old if int(h[:8], 16) % 2 == 0 else c_new
        for t in re.split(r"\s+", r["text"]):
            tgt[t] += 1
    vocab = set(c_old) | set(c_new)
    r_old = {
        t: i + 1
        for i, t in enumerate(
            sorted(vocab, key=lambda t: (-c_old.get(t, 0), t))
        )
    }
    r_new = {
        t: i + 1
        for i, t in enumerate(
            sorted(vocab, key=lambda t: (-c_new.get(t, 0), t))
        )
    }
    rows = {r["term"]: r for r in top_term_drift_waves(spark, SF).collect()}
    expect = {
        t for t in vocab if r_old[t] <= TERM_DRIFT_M or r_new[t] <= TERM_DRIFT_M
    }
    assert set(rows) == expect
    for t, r in rows.items():
        assert r["c_old"] == c_old.get(t, 0)
        assert r["c_new"] == c_new.get(t, 0)
        assert r["r_old"] == r_old[t]
        assert r["r_new"] == r_new[t]
        assert r["rank_shift"] == r_new[t] - r_old[t]
