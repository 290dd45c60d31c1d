"""R4-95..98 units: pure-Python recomputes of the tie-corrected
Mann-Whitney U, the winsorized mean, HHI concentration, and the
Jensen-Shannon divergence (the DuckDB gate covers full parity; these
pin the semantics against independent walks / the published closed
forms)."""

import math
import re
from collections import Counter

SF = "/root/testdata/sf0.001"


def _fl(x, k):
    return math.floor(x * 10**k + 1e-6) / 10**k


def _load_seg_cents(spark):
    seg = {
        r["c_custkey"]: r["c_mktsegment"]
        for r in spark.read.parquet(f"{SF}/customer.parquet").collect()
    }
    rows = []
    for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
        rows.append(
            (
                seg[r["o_custkey"]],
                r["o_custkey"],
                math.floor(r["o_totalprice"] * 100 + 1e-6),
            )
        )
    return rows


def test_mannwhitney_recompute(spark):
    """U, the tie sum and z equal the textbook tie-averaged rank-sum
    computed by an independent Python walk."""
    from pdf_extractor_spark.analytics.relational import (
        MW_SEG_A,
        MW_SEG_B,
        mannwhitney_segment_prices,
    )

    a = [v for s, _c, v in _load_seg_cents(spark) if s == MW_SEG_A]
    b = [v for s, _c, v in _load_seg_cents(spark) if s == MW_SEG_B]
    hist = Counter(a + b)
    ranks = {}
    cum = 0
    for v in sorted(hist):
        ranks[v] = cum + (hist[v] + 1) / 2  # tie-average rank
        cum += hist[v]
    n_a, n_b, n = len(a), len(b), len(a) + len(b)
    r_a = sum(ranks[v] for v in a)
    u_a = r_a - n_a * (n_a + 1) / 2
    tie_sum = sum(t**3 - t for t in hist.values())
    var = n_a * n_b / 12 * ((n + 1) - tie_sum / (n * (n - 1)))
    z = (u_a - n_a * n_b / 2) / math.sqrt(var)
    [got] = mannwhitney_segment_prices(spark, SF).collect()
    assert (got["n_a"], got["n_b"]) == (n_a, n_b)
    assert got["u_stat"] == u_a
    assert got["tie_sum"] == tie_sum
    assert got["z_score"] == _fl(z, 4)
    assert got["significant"] == (_fl(abs(z), 4) >= 1.96)


def test_winsorized_recompute(spark):
    """Clamp values and mean equal sorting each segment, replacing the
    k smallest/largest with the boundary order statistics."""
    from pdf_extractor_spark.analytics.relational import (
        TRIM_PCT_DEN,
        TRIM_PCT_NUM,
        winsorized_mean_robust,
    )

    by_seg = {}
    for s, _c, v in _load_seg_cents(spark):
        by_seg.setdefault(s, []).append(v)
    rows = {
        r["c_mktsegment"]: r
        for r in winsorized_mean_robust(spark, SF).collect()
    }
    assert set(rows) == set(by_seg)
    for s, vals in by_seg.items():
        vals = sorted(vals)
        n = len(vals)
        k = n * TRIM_PCT_NUM // TRIM_PCT_DEN
        v_lo, v_hi = vals[k], vals[n - k - 1]
        wins = [min(max(v, v_lo), v_hi) for v in vals]
        got = rows[s]
        assert got["n_orders"] == n
        assert got["win_k"] == k
        assert got["clamp_lo"] == v_lo / 100.0
        assert got["clamp_hi"] == v_hi / 100.0
        assert got["winsorized_mean"] == _fl(sum(wins) / (100.0 * n), 4)


def test_hhi_recompute(spark):
    """HHI, top share and effective N equal the fixed-point share walk;
    the uniform bound 1/n <= HHI <= 1 holds after flooring slack."""
    from pdf_extractor_spark.analytics.relational import (
        HHI_CONCENTRATED,
        hhi_revenue_concentration,
    )

    rev = Counter()
    for s, c, v in _load_seg_cents(spark):
        rev[(s, c)] += v
    by_seg = {}
    for (s, _c), r in rev.items():
        by_seg.setdefault(s, []).append(r)
    rows = {
        r["c_mktsegment"]: r
        for r in hhi_revenue_concentration(spark, SF).collect()
    }
    assert set(rows) == set(by_seg)
    for s, revs in by_seg.items():
        tot = sum(revs)
        sh6 = [math.floor(r / tot * 1e6 + 1e-6) for r in revs]
        hhi12 = sum(x * x for x in sh6)
        got = rows[s]
        assert got["n_customers"] == len(revs)
        assert got["hhi"] == _fl(hhi12 / 1e12, 6)
        assert got["top_share"] == _fl(max(sh6) / 1e6, 6)
        assert got["effective_n"] == _fl(1e12 / hhi12, 4)
        assert got["concentrated"] == (_fl(hhi12 / 1e12, 6) > HHI_CONCENTRATED)
        assert 1 / len(revs) - 1e-4 <= got["hhi"] <= 1.0


def test_jsd_recompute(spark):
    """The floored-term JSD equals the Python recompute, is symmetric
    by construction, and sits in [0, 1] (log2) up to flooring slack."""
    from pdf_extractor_spark.analytics.textstats import (
        JSD_LANG_A,
        JSD_LANG_B,
        jsd_language_divergence,
    )

    c_a, c_b = Counter(), Counter()
    for r in spark.read.parquet(f"{SF}/documents.parquet").collect():
        if r["lang"] == JSD_LANG_A:
            c_a.update(re.split(r"\s+", r["text"]))
        elif r["lang"] == JSD_LANG_B:
            c_b.update(re.split(r"\s+", r["text"]))
    n_a, n_b = sum(c_a.values()), sum(c_b.values())
    vocab = set(c_a) | set(c_b)
    sum_a8 = sum_b8 = 0
    for t in vocab:
        ca, cb = c_a.get(t, 0), c_b.get(t, 0)
        den = ca * n_b + cb * n_a
        if ca > 0:
            sum_a8 += math.floor(
                (ca / n_a) * math.log2(2 * ca * n_b / den) * 1e8 + 1e-6
            )
        if cb > 0:
            sum_b8 += math.floor(
                (cb / n_b) * math.log2(2 * cb * n_a / den) * 1e8 + 1e-6
            )
    [got] = jsd_language_divergence(spark, SF).collect()
    assert got["n_tokens_a"] == n_a
    assert got["n_tokens_b"] == n_b
    assert got["vocab"] == len(vocab)
    assert got["sum_a8"] == sum_a8
    assert got["sum_b8"] == sum_b8
    assert got["jsd_bits"] == _fl((sum_a8 + sum_b8) / 2e8, 6)
    assert -1e-3 <= got["jsd_bits"] <= 1.0
