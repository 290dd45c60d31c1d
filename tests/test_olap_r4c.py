"""R4-57..60 units: pure-Python recomputes of the Benford audit,
month-over-month growth, Pareto/ABC classes, and Flesch readability
(the DuckDB gate covers full parity; these pin the semantics against
an independent walk and the published closed forms)."""

import math
import re
from collections import defaultdict

SF = "/root/testdata/sf0.001"


def _fl4(x):
    return math.floor(x * 10000 + 1e-6) / 10000


def test_benford_recompute(spark):
    """Digit shares and chi-square terms equal a Python walk using the
    string first digit; expected shares are log10(1+1/d) and sum to 1."""
    from pdf_extractor_spark.analytics.relational import benford_first_digit

    prices = [
        r["o_totalprice"]
        for r in spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_totalprice")
        .collect()
    ]
    counts = defaultdict(int)
    for p in prices:
        counts[int(str(int(math.floor(p)))[0])] += 1
    total = sum(counts.values())
    got = {r["digit"]: r for r in benford_first_digit(spark, SF).collect()}
    assert set(got) == set(range(1, 10))
    assert abs(sum(math.log10(1 + 1 / d) for d in range(1, 10)) - 1) < 1e-12
    for d in range(1, 10):
        n = counts.get(d, 0)
        exp = math.log10(1 + 1 / d)
        assert got[d]["n"] == n
        assert got[d]["observed_share"] == _fl4(n / total)
        assert got[d]["chi2_term"] == _fl4(
            total * (n / total - exp) ** 2 / exp
        )


def test_monthly_growth_recompute(spark):
    """Growth ratios and cumulative share equal a Python walk over
    exact cents; first month has NULL growth; last cum_share is 1.0."""
    from pdf_extractor_spark.analytics.relational import (
        monthly_revenue_growth,
    )

    rows = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_orderdate", "o_totalprice")
        .collect()
    )
    cents = defaultdict(int)
    n_ord = defaultdict(int)
    for r in rows:
        m = r["o_orderdate"].strftime("%Y-%m")
        cents[m] += int(math.floor(r["o_totalprice"] * 100 + 1e-6))
        n_ord[m] += 1
    months = sorted(cents)
    total = sum(cents.values())
    got = monthly_revenue_growth(spark, SF).collect()
    assert [r["month"] for r in got] == months
    cum = 0
    prev = None
    for r, m in zip(got, months):
        cum += cents[m]
        assert r["n_orders"] == n_ord[m]
        assert r["revenue"] == cents[m] / 100.0
        if prev is None:
            assert r["mom_growth"] is None
        else:
            assert r["mom_growth"] == _fl4((cents[m] - prev) / prev)
        assert r["cum_share"] == _fl4(cum / total)
        prev = cents[m]
    assert got[-1]["cum_share"] == 1.0


def test_pareto_abc_recompute(spark):
    """Class membership equals a Python cumulative walk ordered by
    (revenue DESC, partkey); classes partition all parts and shares
    sum to 1 within floor noise; A-share never exceeds 0.80 + one
    part's worth."""
    from pdf_extractor_spark.analytics.relational import pareto_abc

    rows = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_partkey", "l_extendedprice", "l_discount")
        .collect()
    )
    rev = defaultdict(int)
    for r in rows:
        rev[r["l_partkey"]] += int(
            math.floor(
                r["l_extendedprice"] * (1 - r["l_discount"]) * 100 + 1e-6
            )
        )
    total = sum(rev.values())
    cum = 0
    cls = defaultdict(lambda: [0, 0])
    for pk in sorted(rev, key=lambda k: (-rev[k], k)):
        cum += rev[pk]
        share = cum / total
        c = "A" if share <= 0.80 else ("B" if share <= 0.95 else "C")
        cls[c][0] += 1
        cls[c][1] += rev[pk]
    got = {r["abc_class"]: r for r in pareto_abc(spark, SF).collect()}
    assert set(got) == set(cls)
    for c, (n, ccents) in cls.items():
        assert got[c]["n_parts"] == n
        assert got[c]["class_revenue"] == ccents / 100.0
        assert got[c]["revenue_share"] == _fl4(ccents / total)
    assert sum(r["n_parts"] for r in got.values()) == len(rev)


def test_flesch_recompute(spark):
    """Per-language averages equal a Python recompute of the Flesch
    closed form with the same vowel-group syllable heuristic; scores
    land in the plausible band for synthetic prose."""
    from pdf_extractor_spark.analytics.textstats import flesch_readability

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("lang", "text")
        .collect()
    )
    agg = defaultdict(lambda: [0, 0, 0, 0, 0])  # docs, words, sents, syll, fre_i
    for r in docs:
        t = r["text"].lower()
        words = [w for w in re.split(r"\s+", t) if w]
        if not words:
            continue
        n_w = len(words)
        n_s = max(1, len(re.findall(r"[.!?]+", t)))
        n_y = sum(
            max(1, len(re.findall(r"[aeiouy]+", w))) for w in words
        )
        fre = 206.835 - 1.015 * (n_w / n_s) - 84.6 * (n_y / n_w)
        a = agg[r["lang"]]
        a[0] += 1
        a[1] += n_w
        a[2] += n_s
        a[3] += n_y
        a[4] += math.floor(fre * 10000 + 1e-6)
    got = {r["lang"]: r for r in flesch_readability(spark, SF).collect()}
    assert set(got) == set(agg)
    for lang, (nd, nw, ns, ny, fi) in agg.items():
        g = got[lang]
        assert g["n_docs"] == nd
        assert g["avg_words_per_sentence"] == _fl4(nw / ns)
        assert g["avg_syllables_per_word"] == _fl4(ny / nw)
        assert g["avg_flesch"] == _fl4(fi / (nd * 10000.0))
        # synthetic prose: readable-band sanity, not a fixture pin
        assert -100 < g["avg_flesch"] < 120
