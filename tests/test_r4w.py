"""R4-143..146 units: RBO between retrieval tiers (recomputed from
the engine's own rankings), Wilcoxon signed-rank, per-segment OLS
t-stats, and the max-drawdown walk."""

import math
from collections import defaultdict

SF = "/root/testdata/sf0.001"


def _fl(x, k):
    return math.floor(x * 10**k + 1e-6) / 10**k


def test_rbo_recompute(spark):
    """RBO equals the truncated Webber sum over the engine's own two
    top-K lists; bounded by [0, 1-ish] and consistent with overlap@K."""
    from pdf_extractor_spark.analytics.hybrid import (
        RBO_K,
        RBO_P,
        rbo_lexical_semantic,
    )
    from pdf_extractor_spark.analytics.similarity import QUERY_VEC_ID
    from pdf_extractor_spark.analytics.textstats import bm25_scores
    from pdf_extractor_spark.analytics.base import load

    lex_rows = (
        bm25_scores(load(spark, SF, "documents")).collect()
    )
    lex = [
        r["doc_id"]
        for r in sorted(lex_rows, key=lambda r: (-r["bm25"], r["doc_id"]))[
            :RBO_K
        ]
    ]
    embs = {
        r["vec_id"]: list(r["embedding"])
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    }
    qv = embs[QUERY_VEC_ID]

    def cos4(a, b):
        dot = na = nb = 0.0
        for x, y in zip(a, b):
            dot = dot + float(x) * float(y)
        for x in a:
            na = na + float(x) * float(x)
        for y in b:
            nb = nb + float(y) * float(y)
        return math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 10000 + 1e-6) / 10000

    scored = [
        (vid, cos4(e, qv)) for vid, e in embs.items() if vid != QUERY_VEC_ID
    ]
    sem = [
        v for v, _c in sorted(scored, key=lambda t: (-t[1], t[0]))[:RBO_K]
    ]
    rbo_q = 0
    for d in range(1, RBO_K + 1):
        agree = len(set(lex[:d]) & set(sem[:d]))
        rbo_q += math.floor(
            (RBO_P ** (d - 1)) * agree / d * 1e9 + 1e-6
        )
    overlap = len(set(lex) & set(sem))
    got = rbo_lexical_semantic(spark, SF).collect()
    assert len(got) == 1
    g = got[0]
    assert g["k"] == RBO_K
    assert g["overlap_at_k"] == overlap
    assert g["jaccard_at_k"] == _fl(overlap / RBO_K, 6)
    assert g["rbo_truncated"] == _fl((1.0 - RBO_P) * (rbo_q / 1e9), 6)
    assert 0.0 <= g["rbo_truncated"] <= 1.0


def test_wilcoxon_recompute(spark):
    """W+ and z equal the average-rank walk over nonzero MoM deltas;
    W+ is within [0, n(n+1)/2]."""
    from pdf_extractor_spark.analytics.relational import (
        wilcoxon_monthly_revenue,
    )

    monthly = defaultdict(int)
    for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
        d = r["o_orderdate"].date()
        monthly[d.year * 12 + d.month] += math.floor(
            r["o_totalprice"] * 100 + 1e-6
        )
    ms = sorted(monthly)
    deltas = [
        monthly[ms[i]] - monthly[ms[i - 1]] for i in range(1, len(ms))
    ]
    deltas = [x for x in deltas if x != 0]
    n = len(deltas)
    order = sorted(range(n), key=lambda i: abs(deltas[i]))
    rank2 = [0] * n
    i = 0
    while i < n:
        j = i
        while (
            j + 1 < n
            and abs(deltas[order[j + 1]]) == abs(deltas[order[i]])
        ):
            j += 1
        r2 = (i + 1) + (j + 1)  # first + last row_number in tie group
        for t in range(i, j + 1):
            rank2[order[t]] = r2
        i = j + 1
    w_plus2 = sum(rank2[i] for i in range(n) if deltas[i] > 0)
    mu = n * (n + 1) / 4.0
    sigma = math.sqrt(n * (n + 1) * (2 * n + 1) / 24.0)
    got = wilcoxon_monthly_revenue(spark, SF).collect()
    assert len(got) == 1
    g = got[0]
    assert g["n_pairs"] == n
    assert g["w_plus"] == _fl(w_plus2 / 2.0, 1)
    assert g["w_expected"] == _fl(mu, 1)
    assert g["z_wilcoxon"] == _fl((w_plus2 / 2.0 - mu) / sigma, 4)
    assert 0 <= g["w_plus"] <= n * (n + 1) / 2


def test_segment_trend_recompute(spark):
    """Per-segment slope/SE/t equal the closed-form OLS over an
    independent join walk; SE > 0."""
    from pdf_extractor_spark.analytics.relational import segment_trend_tstats

    cust = {
        r["c_custkey"]: r["c_mktsegment"]
        for r in spark.read.parquet(f"{SF}/customer.parquet").collect()
    }
    daily = defaultdict(int)
    for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
        seg = cust[r["o_custkey"]]
        daily[(seg, r["o_orderdate"].date())] += math.floor(
            r["o_totalprice"] * 100 + 1e-6
        )
    d0 = min(d for _s, d in daily)
    by = defaultdict(list)
    for (seg, d), cents in daily.items():
        by[seg].append(((d - d0).days, cents // 100))
    rows = {
        r["c_mktsegment"]: r for r in segment_trend_tstats(spark, SF).collect()
    }
    assert set(rows) == set(by)
    for seg, pts in by.items():
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        syy = sum(y * y for _, y in pts)
        sxx_c = sxx - sx * sx / n
        sxy_c = sxy - sx * sy / n
        syy_c = syy - sy * sy / n
        b = sxy_c / sxx_c
        sse = syy_c - b * sxy_c
        se = math.sqrt(sse / (n - 2) / sxx_c)
        g = rows[seg]
        assert g["n_days"] == n
        assert g["slope_dollars_per_day"] == _fl(b, 4)
        assert g["slope_se"] == _fl(se, 4)
        assert g["t_stat"] == _fl(b / se, 4)
        assert g["slope_se"] > 0


def test_drawdown_recompute(spark):
    """The trough day and depth equal an independent running-max walk
    over the scaled deviation curve; drawdown >= 0."""
    from pdf_extractor_spark.analytics.relational import revenue_drawdown

    daily = defaultdict(int)
    for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
        daily[r["o_orderdate"].date()] += math.floor(
            r["o_totalprice"] * 100 + 1e-6
        )
    n = len(daily)
    s = sum(daily.values())
    eq = 0
    peak = -(10**30)
    best = None  # (draw, day, peak)
    for d in sorted(daily):
        eq += n * daily[d] - s
        peak = max(peak, eq)
        draw = peak - eq
        if best is None or draw > best[0]:
            best = (draw, d, peak)
    got = revenue_drawdown(spark, SF).collect()
    assert len(got) == 1
    g = got[0]
    assert g["trough_day"] == best[1]
    assert g["max_drawdown_dollars"] == _fl(best[0] / n / 100.0, 2)
    assert g["peak_equity_dollars"] == _fl(best[2] / n / 100.0, 2)
    assert g["max_drawdown_dollars"] >= 0.0
