"""Skew drill: degenerate corpus (thousands of byte-identical docs →
one hot (band_id, band_hash) bucket) against the near-dup pipeline.

The 100 TB hazard: identical docs share every LSH band, so a naive
band self-join is quadratic in the duplication factor — AQE skew-join
can split the hot partition but cannot shrink n²/2 output rows. The
pipeline therefore collapses identical texts to one representative
BEFORE the join (dedup._survivors_from_pool); these tests pin both the
correctness and the boundedness of that shape. docs/PLANS.md records
the analysis.
"""

from pyspark.sql import functions as F

N_COPIES = 2000     # one spam document, duplicated
N_DISTINCT = 30     # ordinary corpus tail


def degenerate_pool(spark):
    spam = [(i, "buy cheap widgets now best price guaranteed") for i in range(N_COPIES)]
    tail = [
        (N_COPIES + i, f"unique document number {i} about topic {i * 7} with body {i * 13}")
        for i in range(N_DISTINCT)
    ]
    return spark.createDataFrame(spam + tail, "doc_id long, text string")


def test_degenerate_corpus_survivors_correct(spark):
    from pdf_extractor_spark.analytics.dedup import _survivors_from_pool

    survivors = sorted(
        r["doc_id"] for r in _survivors_from_pool(degenerate_pool(spark)).collect()
    )
    # the 2000 identical copies collapse to exactly one survivor: min id
    assert survivors[0] == 0
    assert all(s >= N_COPIES for s in survivors[1:])
    # every distinct doc survives (no accidental band collisions here)
    assert len(survivors) == 1 + N_DISTINCT


def test_band_join_input_bounded_by_distinct_texts(spark):
    """The join-side evidence: after the exact collapse, band rows are
    LSH_BANDS × distinct-texts — duplication factor 2000 contributes
    exactly one representative, so no (band_id, band_hash) bucket can
    be wider than the number of DISTINCT colliding texts."""
    from pdf_extractor_spark.analytics.dedup import LSH_BANDS, _with_bands

    pool = degenerate_pool(spark)
    groups = pool.groupBy("text").agg(F.min("doc_id").alias("rep"))
    bands = _with_bands(groups.select(F.col("rep").alias("doc_id"), "text"))
    n_texts = 1 + N_DISTINCT
    assert bands.count() == LSH_BANDS * n_texts
    widest = (
        bands.groupBy("band_id", "band_hash").count().agg(F.max("count")).collect()[0][0]
    )
    assert widest < N_COPIES / 100, f"hot bucket leaked through: {widest}"


def test_aqe_skew_join_backstop_enabled(spark):
    """For skewed-but-distinct corpora (many near-identical variants),
    the residual mitigation is AQE's skew-join split — pinned on so a
    config regression is caught here, not at 100 TB."""
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


def test_survivors_quality_keeps_original_over_injected_copy(spark):
    """In every multi-member cluster the argmax-by-(len, id) survivor
    is the ORIGINAL doc (injected +OFFSET copies tie on length and
    lose the id tie-break); singleton clusters survive as themselves;
    membership counts sum to the pool size."""
    from pdf_extractor_spark.analytics.base import (
        DUP_ID_OFFSET,
        N_INJECTED_DUPS,
    )
    from pdf_extractor_spark.analytics.dedup import dedup_survivors_quality

    sf_dir = "/root/testdata/sf0.001"
    rows = dedup_survivors_quality(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r["n_members"] for r in rows) == n_docs + N_INJECTED_DUPS
    multi = [r for r in rows if r["n_members"] > 1]
    assert len(multi) >= N_INJECTED_DUPS
    for r in rows:
        assert r["survivor_q"] < DUP_ID_OFFSET  # never the injected copy
        if r["n_members"] == 1:
            assert r["survivor_q"] == r["component"]


def test_cluster_histogram_consistency(spark):
    """Histogram mass equals the pool size, singleton count matches the
    CC labelling, and the injected copies guarantee >=1 multi-doc
    cluster bin."""
    from pdf_extractor_spark.analytics.base import N_INJECTED_DUPS
    from pdf_extractor_spark.analytics.dedup import (
        dedup_cluster_histogram,
        dedup_connected_components,
    )

    sf_dir = "/root/testdata/sf0.001"
    hist = {r["cluster_size"]: r for r in
            dedup_cluster_histogram(spark, sf_dir).collect()}
    labels = dedup_connected_components(spark, sf_dir).collect()
    sizes = {}
    for r in labels:
        sizes[r["survivor"]] = sizes.get(r["survivor"], 0) + 1
    want = {}
    for s in sizes.values():
        want[s] = want.get(s, 0) + 1
    assert {k: v["n_clusters"] for k, v in hist.items()} == want
    assert sum(v["n_docs"] for v in hist.values()) == len(labels)
    assert any(k > 1 for k in hist)  # injected dups form real clusters
    assert len(labels) >= N_INJECTED_DUPS


def test_jaccard_threshold_curve_monotone(spark):
    """The calibration curve is monotone non-increasing in threshold
    (both pairs and docs touched), and the 0.9 cutoff still catches
    every injected exact duplicate (jaccard 1.0)."""
    from pdf_extractor_spark.analytics.base import N_INJECTED_DUPS
    from pdf_extractor_spark.analytics.dedup import jaccard_threshold_curve

    rows = {r["threshold"]: r
            for r in jaccard_threshold_curve(
                spark, "/root/testdata/sf0.001").collect()}
    ts = sorted(rows)
    for a, b in zip(ts, ts[1:]):
        assert rows[a]["n_pairs"] >= rows[b]["n_pairs"]
        assert rows[a]["n_docs_touched"] >= rows[b]["n_docs_touched"]
    assert rows[max(ts)]["n_pairs"] >= N_INJECTED_DUPS


def test_contrastive_pairs_validity(spark):
    """Every anchor's positive is its mined near-dup at jaccard 1.0,
    negatives are in-corpus ids distinct from the anchor (and from the
    positive by id-space construction), and negatives are
    deterministic salted hashes."""
    import hashlib

    from pdf_extractor_spark.analytics.base import (
        DUP_ID_OFFSET,
        N_INJECTED_DUPS,
    )
    from pdf_extractor_spark.analytics.dedup import NEG_K, contrastive_pairs

    sf_dir = "/root/testdata/sf0.001"
    rows = {r["anchor_id"]: r for r in contrastive_pairs(spark, sf_dir).collect()}
    n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert set(rows) == set(range(N_INJECTED_DUPS))
    for aid, r in rows.items():
        assert r["positive_id"] == aid + DUP_ID_OFFSET
        assert r["positive_jaccard"] == 1.0  # exact copy
        for j in range(1, NEG_K + 1):
            raw = int(
                hashlib.md5(f"neg{j}|{aid}".encode()).hexdigest()[:8], 16
            ) % n
            want = (raw + 1) % n if raw == aid else raw
            assert r[f"neg_{j}"] == want
            assert 0 <= r[f"neg_{j}"] < n and r[f"neg_{j}"] != aid
