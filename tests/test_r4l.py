"""R4-99..102 units: pure-Python recomputes of the lang×source mutual
information, the Theil-Sen robust slope, the CUSUM change point, and
the vocabulary coverage curve (the DuckDB gate covers full parity;
these pin the semantics against independent walks / the published
closed forms)."""

import math
import re
from collections import Counter

SF = "/root/testdata/sf0.001"


def _fl(x, k):
    return math.floor(x * 10**k + 1e-6) / 10**k


def _f8(x):
    return math.floor(x * 1e8 + 1e-6)


def test_mutual_info_recompute(spark):
    """MI, both entropies and the normalized ratio equal the cell-walk
    recompute; the information inequality 0 <= MI <= min(H) holds up
    to flooring slack."""
    from pdf_extractor_spark.analytics.textstats import (
        mutual_info_lang_source,
    )

    cells = Counter()
    for r in spark.read.parquet(f"{SF}/documents.parquet").collect():
        cells[(r["lang"], r["source"])] += 1
    n = sum(cells.values())
    rt = Counter()
    ct = Counter()
    for (l, s), c in cells.items():
        rt[l] += c
        ct[s] += c
    mi8 = sum(
        _f8((c / n) * math.log2(n * c / (rt[l] * ct[s])))
        for (l, s), c in cells.items()
    )
    hl8 = sum(_f8(-(c / n) * math.log2(c / n)) for c in rt.values())
    hs8 = sum(_f8(-(c / n) * math.log2(c / n)) for c in ct.values())
    [got] = mutual_info_lang_source(spark, SF).collect()
    assert got["n"] == n
    assert got["mi_bits"] == _fl(mi8 / 1e8, 6)
    assert got["h_lang_bits"] == _fl(hl8 / 1e8, 6)
    assert got["h_source_bits"] == _fl(hs8 / 1e8, 6)
    assert got["normalized_mi"] == _fl(mi8 / min(hl8, hs8), 6)
    assert -1e-4 <= got["mi_bits"]
    assert got["mi_bits"] <= min(got["h_lang_bits"], got["h_source_bits"]) + 1e-4


def _daily_cents(spark):
    daily = Counter()
    for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
        daily[r["o_orderdate"].date()] += math.floor(
            r["o_totalprice"] * 100 + 1e-6
        )
    return daily


def test_theil_sen_recompute(spark):
    """The pairwise-slope median and the whole-currency OLS slope equal
    the quadratic Python recompute."""
    from pdf_extractor_spark.analytics.relational import (
        theil_sen_daily_revenue,
    )

    daily = _daily_cents(spark)
    d0 = min(daily)
    pts = sorted(((d - d0).days, c) for d, c in daily.items())
    slopes = []
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            (x1, c1), (x2, c2) = pts[i], pts[j]
            slopes.append(math.floor((c2 - c1) / (x2 - x1) * 1e4 + 1e-6))
    slopes.sort()
    m = len(slopes)
    lo, hi = (m + 1) // 2, (m // 2 + 1 if m % 2 == 0 else (m + 1) // 2)
    med2 = slopes[lo - 1] + slopes[hi - 1]
    nd = len(pts)
    xs = [x for x, _ in pts]
    ys = [c // 100 for _, c in pts]
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    ols = (nd * sxy - sx * sy) / (nd * sxx - sx * sx)
    [got] = theil_sen_daily_revenue(spark, SF).collect()
    assert got["n_days"] == nd
    assert got["n_pairs"] == m
    assert got["theil_sen_slope"] == _fl(med2 / 20000.0 / 100.0, 4)
    assert got["ols_slope"] == _fl(ols, 4)


def test_cusum_recompute(spark):
    """The reported peak day maximizes |D*prefix_k - k*S| with day-asc
    tie-break, exactly as the integer walk computes it."""
    from pdf_extractor_spark.analytics.relational import cusum_change_point

    daily = _daily_cents(spark)
    days = sorted(daily)
    nd = len(days)
    s_total = sum(daily.values())
    best = None
    prefix = 0
    for k, d in enumerate(days, start=1):
        prefix += daily[d]
        cus = nd * prefix - k * s_total
        if best is None or abs(cus) > abs(best[2]):
            best = (d, k, cus)
    d, k, cus = best
    [got] = cusum_change_point(spark, SF).collect()
    assert got["change_day"] == d.strftime("%Y-%m-%d")
    assert got["day_index"] == k
    assert got["n_days"] == nd
    assert got["cusum_peak"] == _fl(cus / (nd * 100.0), 2)
    assert got["level_drop_after"] == (cus > 0)


def test_vocab_coverage_recompute(spark):
    """Coverage at each K equals the head mass of the (tf desc, term
    asc) ordering, and the curve is monotone in K."""
    from pdf_extractor_spark.analytics.textstats import (
        COVERAGE_KS,
        vocab_coverage_curve,
    )

    tf = Counter()
    for r in spark.read.parquet(f"{SF}/documents.parquet").collect():
        tf.update(t for t in re.split(r"\s+", r["text"]) if t != "")
    n_tokens = sum(tf.values())
    ordered = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))
    rows = {r["k"]: r for r in vocab_coverage_curve(spark, SF).collect()}
    assert set(rows) == set(COVERAGE_KS)
    prev = -1.0
    for k in sorted(COVERAGE_KS):
        head = ordered[:k]
        covered = sum(c for _t, c in head)
        got = rows[k]
        assert got["n_types_at_k"] == len(head)
        assert got["covered_tokens"] == covered
        assert got["n_tokens"] == n_tokens
        assert got["n_types"] == len(tf)
        assert got["coverage"] == _fl(covered / n_tokens, 6)
        assert got["coverage"] >= prev
        prev = got["coverage"]
