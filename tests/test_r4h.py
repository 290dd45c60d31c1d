"""R4-83..86 units: pure-Python recomputes of the exact AUC, the KS
score separation, Cohen's kappa, and the Fisher separation audit (the
DuckDB gate covers full parity; these pin the published closed forms
against independent walks)."""

import math
from collections import defaultdict

SF = "/root/testdata/sf0.001"


def _fl(x, k):
    return math.floor(x * 10**k + 1e-6) / 10**k


def _score_label_pairs(spark):
    from pdf_extractor_spark.analytics.quality_rules import (
        gopher_quality_filter,
        quality_classifier_linear,
    )

    scores = {
        r["doc_id"]: math.floor(r["score"] * 10000 + 1e-6)
        for r in quality_classifier_linear(spark, SF).collect()
    }
    keeps = {
        r["doc_id"]: bool(r["keep"])
        for r in gopher_quality_filter(spark, SF).collect()
    }
    return [(scores[d], keeps[d]) for d in scores]


def test_auc_recompute(spark):
    """AUC equals the brute-force pairwise Mann-Whitney statistic
    (ties count half) and lands strictly inside (0, 1)."""
    from pdf_extractor_spark.analytics.quality_rules import (
        classifier_auc_exact,
    )

    pairs = _score_label_pairs(spark)
    pos = [s for s, k in pairs if k]
    neg = [s for s, k in pairs if not k]
    num2 = sum(
        2 if p > n else (1 if p == n else 0) for p in pos for n in neg
    )
    [got] = classifier_auc_exact(spark, SF).collect()
    assert got["n_pos"] == len(pos) and got["n_neg"] == len(neg)
    assert got["auc_num2"] == num2
    assert got["auc"] == _fl(num2 / (2.0 * len(pos) * len(neg)), 6)
    assert 0.0 < got["auc"] < 1.0


def test_ks_separation_recompute(spark):
    """The KS gap and its argmax score equal a CDF walk over the
    score grid with the smallest-score tie-break."""
    from pdf_extractor_spark.analytics.quality_rules import (
        classifier_ks_separation,
    )

    pairs = _score_label_pairs(spark)
    tp = sum(1 for _s, k in pairs if k)
    tn = len(pairs) - tp
    best = None
    for v in sorted({s for s, _k in pairs}):
        cp = sum(1 for s, k in pairs if k and s <= v)
        cn = sum(1 for s, k in pairs if not k and s <= v)
        gap = abs(cp * tn - cn * tp)
        if best is None or gap > best[0] or (gap == best[0] and v < best[1]):
            best = (gap, v)
    [got] = classifier_ks_separation(spark, SF).collect()
    assert got["n_pos"] == tp and got["n_neg"] == tn
    assert got["gap_num"] == best[0]
    assert got["ks_at_score"] == best[1] / 10000.0
    assert got["ks_stat"] == _fl(best[0] / (tp * tn), 6)


def test_kappa_recompute(spark):
    """po/pe/kappa equal the textbook closed form over the confusion
    cells; kappa <= po and the integer identities hold."""
    from pdf_extractor_spark.analytics.textstats import (
        _LANG_SETS,
        langid_cohens_kappa,
    )
    import re

    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    cells = defaultdict(int)
    for r in docs:
        toks = set(re.split(r"\s+", r["text"]))
        h = {
            lang: len(toks & set(ws)) for lang, ws in _LANG_SETS.items()
        }
        if h["en"] >= h["de"] and h["en"] >= h["es"]:
            p = "en"
        elif h["de"] >= h["es"]:
            p = "de"
        else:
            p = "es"
        cells[(r["lang"], p)] += 1
    n = sum(cells.values())
    agree = sum(c for (a, p), c in cells.items() if a == p)
    rt = defaultdict(int)
    ct = defaultdict(int)
    for (a, p), c in cells.items():
        rt[a] += c
        ct[p] += c
    sum_rc = sum(rt[lang] * ct.get(lang, 0) for lang in rt)
    [got] = langid_cohens_kappa(spark, SF).collect()
    assert got["n_docs"] == n and got["n_agree"] == agree
    assert got["po"] == _fl(agree / n, 6)
    assert got["pe"] == _fl(sum_rc / (n * n), 6)
    assert got["kappa"] == _fl((n * agree - sum_rc) / (n * n - sum_rc), 6)
    assert got["kappa"] <= got["po"]


def test_fisher_recompute(spark):
    """Between/within scatter terms equal a numpy-free Python
    recompute from raw vectors; every within-term is positive and the
    label decomposition sums to the total scatter."""
    from pdf_extractor_spark.analytics.similarity import (
        DIMS,
        embedding_fisher_ratio,
    )

    rows = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    by_label = defaultdict(list)
    for r in rows:
        by_label[r["label"]].append([float(v) for v in r["embedding"]])
    n_total = len(rows)
    g = [
        sum(v[d] for vs in by_label.values() for v in vs) / n_total
        for d in range(DIMS)
    ]
    got = {r["label"]: r for r in embedding_fisher_ratio(spark, SF).collect()}
    assert set(got) == set(by_label)
    for lab, vs in by_label.items():
        n = len(vs)
        mu = [sum(v[d] for v in vs) / n for d in range(DIMS)]
        between = n * sum((mu[d] - g[d]) ** 2 for d in range(DIMS))
        within = sum(
            sum((v[d] - mu[d]) ** 2 for d in range(DIMS)) for v in vs
        )
        r = got[lab]
        assert r["n_vecs"] == n
        assert abs(r["between_term"] - between) < 2e-4
        assert abs(r["within_term"] - within) < 2e-4
        assert r["within_term"] > 0
        assert abs(r["fisher_term"] - between / within) < 2e-4
