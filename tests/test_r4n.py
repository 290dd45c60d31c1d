"""R4-107..110 units: pure-Python recomputes of the Kaplan-Meier
churn survival, the Wilson score intervals, the ROC threshold table,
and the word2vec negative-sampling distribution (the DuckDB gate
covers full parity; these pin the semantics against independent
walks / the published closed forms)."""

import math
import re
from collections import Counter

SF = "/root/testdata/sf0.001"


def _fl(x, k):
    return math.floor(x * 10**k + 1e-6) / 10**k


def test_km_recompute(spark):
    """Survival at every horizon equals the product-limit estimator
    over an independent event walk; S is monotone non-increasing."""
    from pdf_extractor_spark.analytics.relational import (
        CHURN_W,
        KM_HORIZONS,
        km_churn_survival,
    )

    first, last = {}, {}
    cal_end = None
    for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
        d = r["o_orderdate"].date()
        c = r["o_custkey"]
        first[c] = min(first.get(c, d), d)
        last[c] = max(last.get(c, d), d)
        cal_end = d if cal_end is None else max(cal_end, d)
    evs = []
    for c in first:
        death = (cal_end - last[c]).days > CHURN_W
        t = (
            (last[c] - first[c]).days
            if death
            else (cal_end - first[c]).days
        )
        evs.append((t, death))
    n_total = len(evs)
    death_hist = Counter(t for t, d in evs if d)
    all_hist = Counter(t for t, _d in evs)
    rows = {r["horizon_days"]: r for r in km_churn_survival(spark, SF).collect()}
    assert set(rows) == set(KM_HORIZONS)
    prev = 1.0 + 1e-9
    for h in sorted(KM_HORIZONS):
        sum_f8 = 0
        zeroed = False
        deaths_by_h = 0
        cum_before = 0
        for t in sorted(all_hist):
            d_t = death_hist.get(t, 0)
            n_t = n_total - cum_before
            if d_t > 0 and t <= h:
                deaths_by_h += d_t
                if d_t == n_t:
                    zeroed = True
                else:
                    sum_f8 += math.floor(
                        math.log(1.0 - d_t / n_t) * 1e8 + 1e-6
                    )
            cum_before += all_hist[t]
        s = 0.0 if zeroed else math.exp(sum_f8 / 1e8)
        got = rows[h]
        assert got["n_total"] == n_total
        assert got["n_at_risk"] == sum(1 for t, _d in evs if t >= h)
        assert got["deaths_by_h"] == deaths_by_h
        assert got["km_survival"] == _fl(s, 6)
        assert got["km_survival"] <= prev
        prev = got["km_survival"]


def test_wilson_recompute(spark):
    """Both intervals equal the closed-form Wilson score bounds over
    the independently counted waves, and each contains its p_hat."""
    from pdf_extractor_spark.analytics.relational import (
        ZTEST_CRIT,
        promo_share_wilson_ci,
    )
    import calendar

    promo = {
        r["p_partkey"]: r["p_type"].startswith("PROMO")
        for r in spark.read.parquet(f"{SF}/part.parquet").collect()
    }
    o_us = {}
    for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
        dt = r["o_orderdate"]
        o_us[r["o_orderkey"]] = (
            calendar.timegm(dt.timetuple()) * 1_000_000 + dt.microsecond
        )
    mid = (min(o_us.values()) + max(o_us.values())) / 2
    n = {False: 0, True: 0}
    k = {False: 0, True: 0}
    for r in spark.read.parquet(f"{SF}/lineitem.parquet").collect():
        wave = o_us[r["l_orderkey"]] >= mid
        n[wave] += 1
        k[wave] += promo[r["l_partkey"]]

    def wilson(kk, nn):
        z, z2 = ZTEST_CRIT, ZTEST_CRIT * ZTEST_CRIT
        p = kk / nn
        den = 1.0 + z2 / nn
        c = (p + z2 / (2 * nn)) / den
        hw = z * math.sqrt(p * (1 - p) / nn + z2 / (4 * nn * nn)) / den
        return c - hw, c + hw

    [got] = promo_share_wilson_ci(spark, SF).collect()
    for wave, pre in [(False, "old"), (True, "new")]:
        lo, hi = wilson(k[wave], n[wave])
        assert got[f"n_{pre}"] == n[wave]
        assert got[f"k_{pre}"] == k[wave]
        assert got[f"p_{pre}"] == _fl(k[wave] / n[wave], 6)
        assert got[f"lo_{pre}"] == _fl(lo, 6)
        assert got[f"hi_{pre}"] == _fl(hi, 6)
        assert got[f"lo_{pre}"] <= got[f"p_{pre}"] <= got[f"hi_{pre}"]
    assert got["disjoint"] == (
        got["hi_old"] < got["lo_new"] or got["hi_new"] < got["lo_old"]
    )


def test_roc_recompute(spark):
    """Every threshold row equals the brute-force confusion counts;
    TPR/FPR are non-increasing in the threshold and dominate random."""
    from pdf_extractor_spark.analytics.quality_rules import (
        ROC_THRESHOLDS,
        gopher_quality_filter,
        quality_classifier_linear,
    )
    from pdf_extractor_spark.analytics.quality_rules import (
        classifier_roc_points,
    )

    s = {
        r["doc_id"]: math.floor(r["score"] * 10000 + 1e-6)
        for r in quality_classifier_linear(spark, SF).collect()
    }
    y = {
        r["doc_id"]: bool(r["keep"])
        for r in gopher_quality_filter(spark, SF).collect()
    }
    n_pos = sum(y.values())
    n_neg = len(y) - n_pos
    rows = {r["thr"]: r for r in classifier_roc_points(spark, SF).collect()}
    assert set(rows) == set(ROC_THRESHOLDS)
    prev_tpr, prev_fpr = 2.0, 2.0
    for thr in sorted(ROC_THRESHOLDS):
        tp = sum(1 for d in s if s[d] >= thr and y[d])
        fp = sum(1 for d in s if s[d] >= thr and not y[d])
        got = rows[thr]
        assert (got["tp"], got["fp"]) == (tp, fp)
        assert (got["fn"], got["tn"]) == (n_pos - tp, n_neg - fp)
        assert got["tpr"] == _fl(tp / n_pos, 6)
        assert got["fpr"] == _fl(fp / n_neg, 6)
        assert got["tpr"] <= prev_tpr and got["fpr"] <= prev_fpr
        prev_tpr, prev_fpr = got["tpr"], got["fpr"]


def test_negative_sampling_recompute(spark):
    """Every table row matches the unigram^0.75 recompute; the flatten
    ratio rises as frequency falls (the point of the 3/4 power: head
    terms are damped RELATIVE to rarer ones)."""
    from pdf_extractor_spark.analytics.textstats import (
        NEG_SAMPLE_POW,
        NEG_SAMPLE_TOP,
        negative_sampling_table,
    )

    tf = Counter()
    for r in spark.read.parquet(f"{SF}/documents.parquet").collect():
        tf.update(t for t in re.split(r"\s+", r["text"]) if t != "")
    n_tokens = sum(tf.values())
    w4 = {t: math.floor(f**NEG_SAMPLE_POW * 1e4 + 1e-6) for t, f in tf.items()}
    z4 = sum(w4.values())
    got = negative_sampling_table(spark, SF).collect()
    assert len(got) == NEG_SAMPLE_TOP
    want = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:NEG_SAMPLE_TOP]
    prev_ratio = -1.0
    for row, (term, f) in zip(got, want):
        assert row["term"] == term
        assert row["f"] == f
        assert row["p_neg"] == _fl(w4[term] / z4, 8)
        assert row["p_unigram"] == _fl(f / n_tokens, 8)
        assert row["flatten_ratio"] == _fl(
            (w4[term] / z4) / (f / n_tokens), 4
        )
        # ratio ∝ f^-0.25: non-decreasing down the frequency-sorted table
        assert row["flatten_ratio"] >= prev_ratio - 1e-3
        prev_ratio = row["flatten_ratio"]
    assert got[0]["flatten_ratio"] <= got[-1]["flatten_ratio"]
