"""R4-159..162 units: source signature terms, weekday-uniformity
chi-square, LSH bucket occupancy, and the candidate-graph degree
distribution (seam recomputes over the engine's own pair/band
tables where the kernel is already graded)."""

import math
import re
from collections import Counter, defaultdict

SF = "/root/testdata/sf0.001"


def _fl(x, k):
    return math.floor(x * 10**k + 1e-6) / 10**k


def test_source_signature_recompute(spark):
    """Each source's top-3 equal an independent tf-idf walk with the
    (score DESC, term ASC) total order; common-to-all terms are
    excluded by idf = 0."""
    from pdf_extractor_spark.analytics.textstats import (
        SIG_TOP,
        source_signature_terms,
    )

    tf = Counter()
    docterms = set()
    n_docs = 0
    for r in spark.read.parquet(f"{SF}/documents.parquet").collect():
        n_docs += 1
        for t in re.split(r"\s+", r["text"]):
            tf[(r["source"], t)] += 1
            docterms.add((r["doc_id"], t))
    df = Counter()
    for (_d, t) in docterms:
        df[t] += 1
    per = defaultdict(list)
    for (s, t), c in tf.items():
        sq = math.floor(c * math.log(float(n_docs) / df[t]) * 1e6 + 1e-6)
        per[s].append((-sq, t, c, df[t], sq))
    rows = defaultdict(list)
    for r in source_signature_terms(spark, SF).collect():
        rows[r["source"]].append(r)
    assert set(rows) == set(per)
    for s, cand in per.items():
        cand.sort()
        got = sorted(rows[s], key=lambda r: r["rnk"])
        assert len(got) == SIG_TOP
        for i, r in enumerate(got):
            _neg, t, c, d, sq = cand[i]
            assert (r["term"], r["tf"], r["df"]) == (t, c, d)
            assert r["tfidf"] == _fl(sq / 1e6, 4)
            assert r["tfidf"] > 0.0  # doc-level idf discriminates


def test_weekday_chi2_recompute(spark):
    """chi2 equals the exact scaled identity (7*Σc² − N²)/N over an
    independent weekday walk; ratio consistent."""
    from pdf_extractor_spark.analytics.relational import (
        weekday_uniformity_chi2,
    )

    c = Counter()
    for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
        d = r["o_orderdate"].date()
        c[(d.toordinal() - 719163 + 3) % 7] += 1
    n = sum(c.values())
    cc = sum(v * v for v in c.values())
    got = weekday_uniformity_chi2(spark, SF).collect()
    assert len(got) == 1
    g = got[0]
    assert g["k_weekdays"] == len(c) and g["n_orders"] == n
    assert g["c_max"] == max(c.values()) and g["c_min"] == min(c.values())
    assert g["chi2_uniform"] == _fl((7.0 * cc - n * n) / n, 4)
    assert g["max_min_ratio"] == _fl(max(c.values()) / min(c.values()), 6)
    assert g["chi2_uniform"] >= 0.0


def test_lsh_occupancy_seams(spark):
    """The width histogram's pair mass equals the engine's own
    candidate-pair count... bounded above by it: distinct pairs can
    collide in multiple buckets, so pair_mass >= |distinct pairs|.
    Shares tile to 1."""
    from pdf_extractor_spark.analytics.dedup import (
        lsh_bucket_occupancy,
        minhash_lsh_pairs,
    )

    rows = lsh_bucket_occupancy(spark, SF).collect()
    total_mass = sum(r["pair_mass"] for r in rows)
    n_pairs = minhash_lsh_pairs(spark, SF).count()
    assert total_mass >= n_pairs > 0
    share = 0.0
    for r in rows:
        assert r["pair_mass"] == r["n_buckets"] * r["bucket_width"] * (
            r["bucket_width"] - 1
        ) // 2
        share += r["pair_mass_share"]
    assert abs(share - 1.0) < 1e-3
    assert min(r["bucket_width"] for r in rows) >= 1


def test_dup_degree_seams(spark):
    """The degree histogram recomputed from the engine's own pair list
    matches exactly, degree-0 mass included."""
    from pdf_extractor_spark.analytics.base import (
        DUP_ID_OFFSET,
        N_INJECTED_DUPS,
    )
    from pdf_extractor_spark.analytics.dedup import (
        dup_degree_distribution,
        minhash_lsh_pairs,
    )

    deg = Counter()
    for r in minhash_lsh_pairs(spark, SF).collect():
        deg[r["a_id"]] += 1
        deg[r["b_id"]] += 1
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    pool = n_docs + N_INJECTED_DUPS
    hist = Counter(deg.values())
    hist[0] = pool - len(deg)
    rows = {r["degree"]: r for r in dup_degree_distribution(spark, SF).collect()}
    assert set(rows) == {d for d, c in hist.items() if c > 0}
    for d, r in rows.items():
        assert r["n_docs"] == hist[d]
        assert r["share"] == _fl(hist[d] / pool, 6)
    assert sum(r["n_docs"] for r in rows.values()) == pool
