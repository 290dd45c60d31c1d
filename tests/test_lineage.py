"""Checkpoint/lineage resume: crash-injection + idempotency."""

import pytest

from pdf_extractor_spark.corpus import corpus_rows
from pdf_extractor_spark.docmodel import extract_document
from pdf_extractor_spark.lineage import (
    META_KEY,
    read_lineage,
    read_output,
    run_with_lineage,
)


def buckets(lineage):
    return {b: e for b, e in lineage.items() if b != META_KEY}
from pdf_extractor_spark.schema import DOCS_SCHEMA

N_DOCS = 16
N_BUCKETS = 4


@pytest.fixture()
def docs_df(spark):
    return spark.createDataFrame(corpus_rows(N_DOCS), schema=DOCS_SCHEMA)


def expected_total_rows():
    return sum(len(extract_document(r["spans"])) for r in corpus_rows(N_DOCS))


def test_crash_resume_produces_complete_output(spark, docs_df, tmp_path):
    out = str(tmp_path / "out")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_with_lineage(
            spark, docs_df, out, n_buckets=N_BUCKETS, run_id="r1", fail_after_buckets=2
        )
    partial = buckets(read_lineage(out))
    assert sum(e["status"] == "done" for e in partial.values()) == 2

    lineage = buckets(
        run_with_lineage(spark, docs_df, out, n_buckets=N_BUCKETS, run_id="r2")
    )
    assert len(lineage) == N_BUCKETS
    # resumed buckets carry the resume run_id; completed ones keep r1
    assert {e["run_id"] for e in lineage.values()} == {"r1", "r2"}
    assert read_output(spark, out).count() == expected_total_rows()


def test_second_run_is_noop(spark, docs_df, tmp_path):
    out = str(tmp_path / "out")
    first = buckets(
        run_with_lineage(spark, docs_df, out, n_buckets=N_BUCKETS, run_id="r1")
    )
    again = buckets(
        run_with_lineage(spark, docs_df, out, n_buckets=N_BUCKETS, run_id="r3")
    )
    assert first == again  # nothing re-done, run_ids unchanged
    assert all(e["run_id"] == "r1" for e in again.values())


def test_metrics_recorded(spark, docs_df, tmp_path):
    out = str(tmp_path / "out")
    lineage = buckets(run_with_lineage(spark, docs_df, out, n_buckets=N_BUCKETS))
    assert sum(e["row_count"] for e in lineage.values()) == expected_total_rows()
    assert all(
        e["wall_ms"] >= 0 and (e["bytes"] > 0 or e["row_count"] == 0)
        for e in lineage.values()
    )


def test_batch_commit_mode_equivalent(spark, docs_df, tmp_path):
    """Batch mode (one partitioned write, no per-bucket job loop)
    produces the same output and manifest totals as per-bucket mode,
    and resumes the same way."""
    out_b = str(tmp_path / "batch")
    lineage = buckets(
        run_with_lineage(
            spark, docs_df, out_b, n_buckets=N_BUCKETS, run_id="rb",
            commit_mode="batch",
        )
    )
    assert len(lineage) == N_BUCKETS
    assert sum(e["row_count"] for e in lineage.values()) == expected_total_rows()
    assert read_output(spark, out_b).count() == expected_total_rows()
    # partial manifest → batch resume completes only the missing buckets
    out_p = str(tmp_path / "resume")
    with pytest.raises(RuntimeError):
        run_with_lineage(
            spark, docs_df, out_p, n_buckets=N_BUCKETS, run_id="r1",
            fail_after_buckets=2,
        )
    resumed = buckets(
        run_with_lineage(
            spark, docs_df, out_p, n_buckets=N_BUCKETS, run_id="r2",
            commit_mode="batch",
        )
    )
    assert {e["run_id"] for e in resumed.values()} == {"r1", "r2"}
    assert read_output(spark, out_p).count() == expected_total_rows()


def test_empty_buckets_and_nbucket_guard(spark, tmp_path):
    """Empty buckets are committed with row_count 0 (not crashed on);
    resuming with a different n_buckets raises instead of silently
    dropping documents."""
    few = spark.createDataFrame(corpus_rows(3), schema=DOCS_SCHEMA)
    out = str(tmp_path / "few")
    lineage = buckets(run_with_lineage(spark, few, out, n_buckets=8, run_id="r1"))
    assert len(lineage) == 8
    assert sum(e["row_count"] == 0 for e in lineage.values()) > 0
    total = sum(len(extract_document(r["spans"])) for r in corpus_rows(3))
    assert read_output(spark, out).count() == total
    with pytest.raises(ValueError, match="n_buckets"):
        run_with_lineage(spark, few, out, n_buckets=4)

    # batch mode with empty buckets
    out_b = str(tmp_path / "few_batch")
    run_with_lineage(spark, few, out_b, n_buckets=8, commit_mode="batch")
    assert read_output(spark, out_b).count() == total


# ---------------------------------------------------------------------------
# S16 — keyed MERGE (upsert/delete) on the extracted store
# (reference arangodb/crud.py update/replace/delete; copy-on-write
#  versioned bucket rewrite + manifest commit)
# ---------------------------------------------------------------------------


def test_upsert_replaces_exactly_once(spark, docs_df, tmp_path):
    from pyspark.sql import functions as F

    from pdf_extractor_spark.lineage import upsert_elements

    out = str(tmp_path / "out")
    run_with_lineage(spark, docs_df, out, n_buckets=N_BUCKETS, run_id="r1")
    before = read_output(spark, out)
    target = before.orderBy("doc_id", "offset").limit(1).collect()[0]

    updates = before.filter(
        (F.col("doc_id") == target["doc_id"]) & (F.col("offset") == target["offset"])
    ).withColumn("text", F.lit("CORRECTED TEXT"))
    upsert_elements(spark, out, updates)

    after = read_output(spark, out)
    assert after.count() == before.count()  # replace, not append
    hits = after.filter(
        (F.col("doc_id") == target["doc_id"]) & (F.col("offset") == target["offset"])
    ).collect()
    assert len(hits) == 1  # exactly once
    assert hits[0]["text"] == "CORRECTED TEXT"
    # untouched rows unchanged
    others = after.filter(F.col("doc_id") != target["doc_id"]).count()
    assert others == before.filter(F.col("doc_id") != target["doc_id"]).count()


def test_upsert_inserts_new_key_and_versions_bucket(spark, docs_df, tmp_path):
    from pyspark.sql import functions as F

    from pdf_extractor_spark.lineage import read_lineage, upsert_elements

    out = str(tmp_path / "out")
    run_with_lineage(spark, docs_df, out, n_buckets=N_BUCKETS, run_id="r1")
    before = read_output(spark, out)
    donor = before.orderBy("doc_id", "offset").limit(1)
    new_row = donor.withColumn("offset", F.lit(999_999))
    upsert_elements(spark, out, new_row)
    after = read_output(spark, out)
    assert after.count() == before.count() + 1
    assert after.filter(F.col("offset") == 999_999).count() == 1
    # the affected bucket advanced to v1 and points at the rewrite dir
    lineage = buckets(read_lineage(out))
    versioned = [e for e in lineage.values() if e.get("version")]
    assert len(versioned) == 1 and versioned[0]["path"].endswith("__v1")

    # second merge on the same bucket advances the version again
    upsert_elements(spark, out, donor.withColumn("offset", F.lit(999_998)))
    lineage2 = buckets(read_lineage(out))
    assert max(e.get("version", 0) for e in lineage2.values()) == 2


def test_delete_removes_key_and_resume_stays_noop(spark, docs_df, tmp_path):
    from pyspark.sql import functions as F

    from pdf_extractor_spark.lineage import delete_elements

    out = str(tmp_path / "out")
    first = buckets(
        run_with_lineage(spark, docs_df, out, n_buckets=N_BUCKETS, run_id="r1")
    )
    before = read_output(spark, out)
    target = before.orderBy("doc_id", "offset").limit(1)
    delete_elements(spark, out, target.select("doc_id", "offset"))
    after = read_output(spark, out)
    assert after.count() == before.count() - 1
    t = target.collect()[0]
    assert (
        after.filter(
            (F.col("doc_id") == t["doc_id"]) & (F.col("offset") == t["offset"])
        ).count()
        == 0
    )
    # a re-run after the merge must NOT re-extract (all buckets done)
    again = buckets(
        run_with_lineage(spark, docs_df, out, n_buckets=N_BUCKETS, run_id="r9")
    )
    assert all(e["run_id"] != "r9" for e in again.values())
    assert read_output(spark, out).count() == before.count() - 1


def test_merge_algebra_roundtrip(spark, docs_df, tmp_path):
    """MERGE invariants over a randomized batch of updates: after
    upsert, store = (old \ matched-keys) ∪ updates; deleting the
    inserted new keys restores exactly old-with-replacements."""
    import random

    from pyspark.sql import functions as F

    from pdf_extractor_spark.lineage import delete_elements, upsert_elements

    rng = random.Random(7)
    out = str(tmp_path / "out")
    run_with_lineage(spark, docs_df, out, n_buckets=N_BUCKETS, run_id="r1")
    old = {(r["doc_id"], r["offset"]): r["text"] for r in read_output(spark, out).collect()}

    keys = sorted(old)
    matched = rng.sample(keys, 5)
    donor = read_output(spark, out).limit(1).collect()[0]

    def mk(doc_id, offset, text):
        d = donor.asDict()
        d.update(doc_id=doc_id, offset=offset, text=text)
        return d

    new_keys = [(k[0], 10_000 + i) for i, k in enumerate(matched)]
    updates = [mk(d, o, f"UPD-{d}-{o}") for d, o in matched] + [
        mk(d, o, f"NEW-{d}-{o}") for d, o in new_keys
    ]
    upsert_elements(spark, out, spark.createDataFrame(updates, read_output(spark, out).schema))

    got = {(r["doc_id"], r["offset"]): r["text"] for r in read_output(spark, out).collect()}
    want = dict(old)
    for d, o in matched:
        want[(d, o)] = f"UPD-{d}-{o}"
    for d, o in new_keys:
        want[(d, o)] = f"NEW-{d}-{o}"
    assert got == want

    # delete the inserted keys -> old with replacements only
    delete_elements(
        spark, out,
        spark.createDataFrame([{"doc_id": d, "offset": o} for d, o in new_keys]),
    )
    got2 = {(r["doc_id"], r["offset"]): r["text"] for r in read_output(spark, out).collect()}
    for d, o in new_keys:
        del want[(d, o)]
    assert got2 == want


def test_merge_crash_between_write_and_commit_is_idempotent(
    spark, docs_df, tmp_path, monkeypatch
):
    """Copy-on-write protocol: a crash AFTER the new version dir is
    written but BEFORE the manifest commit leaves the old version
    served; retrying the merge converges to exactly-once effect."""
    from pyspark.sql import functions as F

    from pdf_extractor_spark import lineage as L

    out = str(tmp_path / "out")
    run_with_lineage(spark, docs_df, out, n_buckets=N_BUCKETS, run_id="r1")
    before = read_output(spark, out)
    target = before.orderBy("doc_id", "offset").limit(1)
    updates = target.withColumn("text", F.lit("CRASHED-EDIT"))

    real_commit = L._commit_lineage
    calls = {"n": 0}

    def exploding_commit(output_dir, entries):
        calls["n"] += 1
        raise RuntimeError("injected crash before manifest commit")

    monkeypatch.setattr(L, "_commit_lineage", exploding_commit)
    with pytest.raises(RuntimeError, match="injected crash"):
        L.upsert_elements(spark, out, updates)
    assert calls["n"] == 1
    monkeypatch.setattr(L, "_commit_lineage", real_commit)

    # old version still served — the write happened but was never committed
    t = target.collect()[0]
    mid = read_output(spark, out)
    assert mid.count() == before.count()
    assert (
        mid.filter(
            (F.col("doc_id") == t["doc_id"]) & (F.col("offset") == t["offset"])
        ).collect()[0]["text"]
        == t["text"]
    )

    # retry converges: edit lands exactly once, version advances past the
    # orphaned (uncommitted) v1 directory
    L.upsert_elements(spark, out, updates)
    after = read_output(spark, out)
    assert after.count() == before.count()
    hits = after.filter(
        (F.col("doc_id") == t["doc_id"]) & (F.col("offset") == t["offset"])
    ).collect()
    assert len(hits) == 1 and hits[0]["text"] == "CRASHED-EDIT"
