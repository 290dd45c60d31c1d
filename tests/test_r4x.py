"""R4-147..150 units: transition dwell profile, customer order
regularity, per-source language entropy, and the PSI drift metric —
pure-Python recomputes, plus PSI's null-drift calibration."""

import hashlib
import math
import re
from collections import Counter, defaultdict

SF = "/root/testdata/sf0.001"


def _fl(x, k):
    return math.floor(x * 10**k + 1e-6) / 10**k


def _hist_q(hist, p):
    n = sum(hist.values())
    target = math.ceil(n * p / 100.0)
    cum = 0
    for v in sorted(hist):
        cum += hist[v]
        if cum >= target:
            return v
    raise AssertionError


def test_transition_dwell_recompute(spark):
    """Per-pair n/mean/p90 equal an independent event walk; dwell
    pairs tile the lag-1 transition count of the Markov check."""
    import datetime

    from pdf_extractor_spark.analytics.relational import (
        transition_dwell_profile,
    )

    epoch = datetime.datetime(1970, 1, 1)
    by = defaultdict(list)
    for r in spark.read.parquet(f"{SF}/events.parquet").collect():
        by[r["user_id"]].append(
            (
                r["ts"],
                r["event_id"],
                r["event_type"],
                math.floor((r["ts"] - epoch).total_seconds()),
            )
        )
    hists = defaultdict(Counter)
    for u, evs in by.items():
        evs.sort()
        for i in range(1, len(evs)):
            a, b = evs[i - 1][2], evs[i][2]
            hists[(a, b)][evs[i][3] - evs[i - 1][3]] += 1
    rows = {
        (r["from_type"], r["to_type"]): r
        for r in transition_dwell_profile(spark, SF).collect()
    }
    assert set(rows) == set(hists)
    for pair, h in hists.items():
        n = sum(h.values())
        s = sum(g * c for g, c in h.items())
        r = rows[pair]
        assert r["n_transitions"] == n
        assert r["mean_gap_s"] == _fl(s / n, 4)
        assert r["p90_gap_s"] == _hist_q(h, 90)


def test_customer_regularity_recompute(spark):
    """Class counts and the median CV equal an independent per-customer
    gap walk; classes tile to the customer count."""
    from pdf_extractor_spark.analytics.relational import (
        REG_MIN_ORDERS,
        customer_order_regularity,
    )

    days = defaultdict(list)
    for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
        days[r["o_custkey"]].append(r["o_orderdate"].date())
    cvqs = []
    for c, ds in days.items():
        ds.sort()
        gaps = [(ds[i] - ds[i - 1]).days for i in range(1, len(ds))]
        if len(gaps) < REG_MIN_ORDERS - 1 or sum(gaps) == 0:
            continue
        n, s, ss = len(gaps), sum(gaps), sum(g * g for g in gaps)
        mu = s / n
        cvqs.append(
            math.floor(math.sqrt(ss / n - mu * mu) / mu * 10000 + 1e-6)
        )
    got = customer_order_regularity(spark, SF).collect()
    assert len(got) == 1
    g = got[0]
    assert g["n_customers"] == len(cvqs)
    cvqs.sort()
    med = cvqs[(len(cvqs) + 1) // 2 - 1]
    assert g["median_cv"] == med / 10000
    assert g["n_subscription"] == sum(1 for v in cvqs if v < 5000)
    assert g["n_steady"] == sum(1 for v in cvqs if 5000 <= v < 10000)
    assert g["n_sporadic"] == sum(1 for v in cvqs if v >= 10000)
    assert (
        g["n_subscription"] + g["n_steady"] + g["n_sporadic"]
        == g["n_customers"]
    )


def test_source_lang_entropy_recompute(spark):
    """Entropy and effective-language counts equal a floored-term
    walk; 0 <= H <= ln(n_langs) and 1 <= exp(H) <= n_langs."""
    from pdf_extractor_spark.analytics.textstats import source_lang_entropy

    cell = Counter()
    for r in spark.read.parquet(f"{SF}/documents.parquet").collect():
        cell[(r["source"], r["lang"])] += 1
    per = defaultdict(dict)
    for (s, l), c in cell.items():
        per[s][l] = c
    rows = {r["source"]: r for r in source_lang_entropy(spark, SF).collect()}
    assert set(rows) == set(per)
    for s, langs in per.items():
        n = sum(langs.values())
        hq = sum(
            math.floor(-(c / n) * math.log(c / n) * 1e9 + 1e-6)
            for c in langs.values()
        )
        h = hq / 1e9
        r = rows[s]
        assert r["n_docs"] == n and r["n_langs"] == len(langs)
        assert r["lang_entropy"] == _fl(h, 6)
        assert r["effective_langs"] == _fl(math.exp(h), 4)
        assert -1e-9 <= r["lang_entropy"] <= math.log(len(langs)) + 1e-6
        assert 1.0 - 1e-4 <= r["effective_langs"] <= len(langs) + 1e-4


def test_psi_recompute_and_null_calibration(spark):
    """PSI equals the Laplace-smoothed floored-term walk over an
    independent score recompute, bins tile the corpus, and the
    deterministic hash split lands in the 'stable' band (< 0.1) —
    the metric's null-drift calibration."""
    from pdf_extractor_spark.analytics.quality_rules import (
        PSI_BINS,
        psi_quality_drift,
    )
    from pdf_extractor_spark.analytics.textstats import STOPWORDS

    c_old = Counter()
    c_new = Counter()
    for r in spark.read.parquet(f"{SF}/documents.parquet").collect():
        toks = re.split(r"\s+", r["text"])
        n_t = len(toks)
        stop_ratio = sum(1 for t in toks if t in STOPWORDS) / n_t
        avg_len = (r["n_chars"] - (n_t - 1)) / n_t
        score = (
            0.5 * min(float(n_t), 256.0) / 256.0
            + 0.3 * (1.0 - stop_ratio)
            + 0.2 * min(avg_len, 8.0) / 8.0
        )
        q = _fl(score, 4)
        b = min(int(math.floor(q * PSI_BINS)), PSI_BINS - 1)
        h = hashlib.md5(f"wave|{r['doc_id']}".encode()).hexdigest()
        if int(h[:8], 16) % 2 == 0:
            c_old[b] += 1
        else:
            c_new[b] += 1
    n_old = sum(c_old.values())
    n_new = sum(c_new.values())
    rows = {r["bin"]: r for r in psi_quality_drift(spark, SF).collect()}
    assert set(rows) == set(range(PSI_BINS))
    psi_q = 0
    for b in range(PSI_BINS):
        p_o = (c_old.get(b, 0) + 1) / (n_old + PSI_BINS)
        p_n = (c_new.get(b, 0) + 1) / (n_new + PSI_BINS)
        tq = math.floor((p_n - p_o) * math.log(p_n / p_o) * 1e9 + 1e-6)
        psi_q += tq
        r = rows[b]
        assert r["c_old"] == c_old.get(b, 0)
        assert r["c_new"] == c_new.get(b, 0)
        assert r["p_old"] == _fl(p_o, 6)
        assert r["p_new"] == _fl(p_n, 6)
        assert r["psi_term"] == _fl(tq / 1e9, 6)
    total = rows[0]["psi_total"]
    assert total == _fl(psi_q / 1e9, 6)
    assert all(rows[b]["psi_total"] == total for b in rows)
    assert total < 0.1  # null-drift calibration: hash split is stable
    assert (
        sum(r["c_old"] + r["c_new"] for r in rows.values())
        == n_old + n_new
    )
