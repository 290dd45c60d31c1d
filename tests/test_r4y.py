"""R4-151..154 units: markup-density profile, cross-source dup
matrix (seam recompute over the engine's own scored pairs),
per-dimension variance profile, and the seasonal-naive backtest."""

import math
import re
from collections import Counter, defaultdict

SF = "/root/testdata/sf0.001"


def _fl(x, k):
    return math.floor(x * 10**k + 1e-6) / 10**k


def test_markup_density_recompute(spark):
    """Per-source structure shares equal a Python-regex walk with the
    same patterns; shares in [0, 1]."""
    from pdf_extractor_spark.analytics.textstats import (
        _MARKUP_PATTERNS,
        markup_density_profile,
    )

    agg = defaultdict(lambda: Counter())
    nd = Counter()
    for r in spark.read.parquet(f"{SF}/documents.parquet").collect():
        nd[r["source"]] += 1
        for name, pat in _MARKUP_PATTERNS.items():
            if re.search(pat, r["text"]):
                agg[r["source"]][name] += 1
    rows = {
        r["source"]: r for r in markup_density_profile(spark, SF).collect()
    }
    assert set(rows) == set(nd)
    for s in nd:
        r = rows[s]
        assert r["n_docs"] == nd[s]
        for name in _MARKUP_PATTERNS:
            share = r[f"{name}_share"]
            assert share == _fl(agg[s][name] / nd[s], 6)
            assert 0.0 <= share <= 1.0


def test_cross_source_dup_recompute(spark):
    """The matrix equals grouping the engine's own threshold-passing
    pairs by canonical source pair; rates normalize by the smaller
    feed."""
    from pdf_extractor_spark.analytics.base import DUP_ID_OFFSET
    from pdf_extractor_spark.analytics.dedup import (
        JACCARD_THRESHOLD,
        _jaccard_scored_pairs,
        cross_source_dup_matrix,
    )

    src = {
        r["doc_id"]: r["source"]
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    sizes = Counter(src.values())
    cnt = Counter()
    for r in _jaccard_scored_pairs(spark, SF).collect():
        if r["jaccard"] < JACCARD_THRESHOLD:
            continue
        sa = src[r["a_id"] % DUP_ID_OFFSET]
        sb = src[r["b_id"] % DUP_ID_OFFSET]
        cnt[(min(sa, sb), max(sa, sb))] += 1
    rows = {
        (r["src_a"], r["src_b"]): r
        for r in cross_source_dup_matrix(spark, SF).collect()
    }
    assert set(rows) == set(cnt) and cnt
    for (sa, sb), n in cnt.items():
        r = rows[(sa, sb)]
        assert r["n_dup_pairs"] == n
        assert r["docs_a"] == sizes[sa] and r["docs_b"] == sizes[sb]
        assert r["dup_rate_vs_smaller"] == _fl(
            n / min(sizes[sa], sizes[sb]), 6
        )


def test_dim_variance_recompute(spark):
    """Per-dimension moments equal a grid-quantized walk; variance
    shares tile to ~1 and every variance is positive on this fixture."""
    from pdf_extractor_spark.analytics.similarity import (
        DIMS,
        embedding_dim_variance,
    )

    s = [0] * DIMS
    ss = [0] * DIMS
    n = 0
    for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect():
        n += 1
        for i, x in enumerate(r["embedding"]):
            xq = math.floor(float(x) * 1e6 + 1e-6)
            s[i] += xq
            ss[i] += xq * xq
    rows = {r["dim"]: r for r in embedding_dim_variance(spark, SF).collect()}
    assert set(rows) == set(range(DIMS))
    vqs = []
    for i in range(DIMS):
        mu = s[i] / n
        var = (ss[i] / n - mu * mu) / 1e12
        r = rows[i]
        assert r["mean_c"] == _fl(mu / 1e6, 6)
        assert r["var_c"] == _fl(var, 8)
        assert r["var_c"] > 0
        vqs.append(math.floor(var * 1e8 + 1e-6))
    vt = sum(vqs)
    share_sum = 0.0
    for i in range(DIMS):
        assert rows[i]["var_share"] == _fl(vqs[i] / vt, 6)
        share_sum += rows[i]["var_share"]
    assert abs(share_sum - 1.0) < 1e-3


def test_seasonal_backtest_recompute(spark):
    """MAPE and bias equal an independent calendar walk of the
    same-weekday lookback mean; MAPE >= |bias|."""
    from pdf_extractor_spark.analytics.relational import (
        BACKTEST_DAYS,
        BACKTEST_LOOKBACK,
        seasonal_naive_backtest,
    )

    daily = defaultdict(int)
    for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
        daily[r["o_orderdate"].date()] += math.floor(
            r["o_totalprice"] * 100 + 1e-6
        )
    import datetime

    dmax = max(daily)
    s_ape = s_err = n_scored = 0
    for d, actual in daily.items():
        if (dmax - d).days >= BACKTEST_DAYS:
            continue
        hist = [
            daily[d - datetime.timedelta(days=7 * k)]
            for k in range(1, BACKTEST_LOOKBACK + 1)
            if (d - datetime.timedelta(days=7 * k)) in daily
        ]
        if not hist:
            continue
        fc = sum(hist) / len(hist)
        n_scored += 1
        s_ape += math.floor(abs(actual - fc) / actual * 1e8 + 1e-6)
        s_err += math.floor((fc - actual) / actual * 1e8 + 1e-6)
    got = seasonal_naive_backtest(spark, SF).collect()
    assert len(got) == 1
    g = got[0]
    assert g["n_days_scored"] == n_scored and n_scored > 0
    assert g["mape"] == _fl(s_ape / 1e8 / n_scored, 6)
    assert g["mean_bias"] == _fl(s_err / 1e8 / n_scored, 6)
    assert g["mape"] >= abs(g["mean_bias"]) - 1e-6
