"""R4-111..114 units: pure-Python recomputes of the daily-revenue
time-series diagnostics — ACF, Durbin-Watson, day-of-week seasonal
index, and the volume-vs-ticket lead-lag cross-correlation (the DuckDB
gate covers full parity; these pin the semantics against independent
walks and the textbook closed forms)."""

import math
from collections import defaultdict

SF = "/root/testdata/sf0.001"


def _fl(x, k):
    return math.floor(x * 10**k + 1e-6) / 10**k


def _daily(spark):
    """day-index -> (n_orders, cents) from an independent walk."""
    rows = spark.read.parquet(f"{SF}/orders.parquet").collect()
    agg = defaultdict(lambda: [0, 0])
    for r in rows:
        d = r["o_orderdate"].date()
        a = agg[d]
        a[0] += 1
        a[1] += math.floor(r["o_totalprice"] * 100 + 1e-6)
    d0 = min(agg)
    return {(d - d0).days: (c, cents) for d, (c, cents) in agg.items()}, {
        d: v for d, v in agg.items()
    }


def test_acf_recompute(spark):
    """Every lag's ACF equals the Box-Jenkins global-mean estimator
    over an independent series walk, and |acf| <= 1."""
    from pdf_extractor_spark.analytics.relational import (
        ACF_MAX_LAG,
        acf_daily_revenue,
    )

    byx, _ = _daily(spark)
    y = {x: cents // 100 for x, (_c, cents) in byx.items()}
    n = len(y)
    s = sum(y.values())
    syy = sum(v * v for v in y.values())
    mu = s / n
    denom = syy - n * mu * mu
    rows = {r["lag"]: r for r in acf_daily_revenue(spark, SF).collect()}
    assert set(rows) == set(range(1, ACF_MAX_LAG + 1))
    for k in range(1, ACF_MAX_LAG + 1):
        pairs = [(y[x], y[x - k]) for x in y if (x - k) in y]
        num = (
            sum(a * b for a, b in pairs)
            - mu * sum(a + b for a, b in pairs)
            + len(pairs) * mu * mu
        )
        got = rows[k]
        assert got["n_pairs"] == len(pairs)
        assert got["acf"] == _fl(num / denom, 6)
        assert abs(got["acf"]) <= 1.0 + 1e-9


def test_durbin_watson_recompute(spark):
    """DW equals the ratio over the quantized-residual series of an
    independent OLS fit, and sits in the [0, 4] range."""
    from pdf_extractor_spark.analytics.relational import durbin_watson_trend

    byx, _ = _daily(spark)
    pts = sorted((x, cents // 100) for x, (_c, cents) in byx.items())
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(v for _, v in pts)
    sxy = sum(x * v for x, v in pts)
    sxx = sum(x * x for x, _ in pts)
    b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    a = (sy - b * sx) / n
    eq = [math.floor(v - (a + b * x) + 1e-6) for x, v in pts]
    num = sum((eq[i] - eq[i - 1]) ** 2 for i in range(1, n))
    den = sum(e * e for e in eq)
    got = durbin_watson_trend(spark, SF).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n_days"] == n
    assert r["dw_stat"] == _fl(num / den, 6)
    assert r["rho_lag1"] == _fl(1.0 - (num / den) / 2, 6)
    assert 0.0 <= r["dw_stat"] <= 4.0


def test_dow_seasonality_recompute(spark):
    """Per-weekday sums equal an independent calendar walk; the
    day-weighted mean of the seasonal index is 1 by construction."""
    from pdf_extractor_spark.analytics.relational import (
        dow_seasonality_index,
    )

    _, byd = _daily(spark)
    per = defaultdict(lambda: [0, 0])
    for d, (_c, cents) in byd.items():
        idx = (d.toordinal() - 719163 + 3) % 7  # 719163 = 1970-01-01
        per[idx][0] += 1
        per[idx][1] += cents
    nn = sum(v[0] for v in per.values())
    ss = sum(v[1] for v in per.values())
    rows = {r["dow_idx"]: r for r in dow_seasonality_index(spark, SF).collect()}
    assert set(rows) == set(per)
    wsum = 0.0
    for idx, (nd, sc) in per.items():
        got = rows[idx]
        assert got["n_days"] == nd
        assert got["sum_cents"] == sc
        assert got["seasonal_index"] == _fl((sc / nd) / (ss / nn), 6)
        wsum += nd * (sc / nd) / (ss / nn)
    assert abs(wsum / nn - 1.0) < 1e-9
    names = {rows[i]["dow_name"] for i in rows}
    assert names <= {"Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun"}


def test_xcorr_recompute(spark):
    """Each lag's Pearson r equals the closed form over independently
    aligned (volume, ticket) pairs; lag 0 aligns every day."""
    from pdf_extractor_spark.analytics.relational import (
        XCORR_LAGS,
        volume_ticket_xcorr,
    )

    byx, _ = _daily(spark)
    cnt = {x: c for x, (c, _s) in byx.items()}
    ticket = {
        x: math.floor(cents / c / 100.0 + 1e-6)
        for x, (c, cents) in byx.items()
    }
    rows = {r["lag"]: r for r in volume_ticket_xcorr(spark, SF).collect()}
    assert set(rows) == set(XCORR_LAGS)
    for k in XCORR_LAGS:
        pairs = [(cnt[x], ticket[x + k]) for x in cnt if (x + k) in cnt]
        m = len(pairs)
        sx = sum(a for a, _ in pairs)
        sy = sum(b for _, b in pairs)
        sxy = sum(a * b for a, b in pairs)
        sxx = sum(a * a for a, _ in pairs)
        syy = sum(b * b for _, b in pairs)
        r = (m * sxy - sx * sy) / math.sqrt(
            (m * sxx - sx * sx) * (m * syy - sy * sy)
        )
        got = rows[k]
        assert got["n_pairs"] == m
        assert got["xcorr"] == _fl(r, 6)
        assert abs(got["xcorr"]) <= 1.0 + 1e-9
    assert rows[0]["n_pairs"] == len(cnt)
