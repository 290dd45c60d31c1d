"""Incremental near-dup ingest against the persistent band store.

The continuous-crawl contract: each batch is deduped against every
previously-ingested document (MinHash/LSH band collision, the same
policy as dedup_survivors), survivors' bands fold into the store, and
a replayed batch converges to the identical store state. Semantics of
the status kernel are exact-gated against DuckDB by the
``neardup_incremental_ingest`` registry entry; these tests cover the
on-disk protocol (accumulation, replay, pruning).
"""

from pyspark.sql import functions as F

from pdf_extractor_spark.analytics.dedup import (
    _store_bands,
    band_store_init,
    neardup_ingest,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _text(i: int) -> str:
    # 12 words unique to doc i: no shingle is shared across distinct
    # docs, so band collisions happen ONLY between injected copies
    return " ".join(f"t{i}x{j}" for j in range(12))


def test_ingest_lifecycle_accumulation_and_replay(spark, tmp_path):
    store = str(tmp_path / "bands")
    band_store_init(
        spark, store, _docs(spark, [(i, _text(i)) for i in range(20)])
    )
    base = 4 * 20  # LSH_BANDS rows per doc

    # batch 1: two fresh docs, a copy of corpus doc 3, two copies of
    # fresh doc 100 under larger ids
    batch1 = _docs(spark, [
        (100, _text(100)),
        (101, _text(101)),
        (9003, _text(3)),      # dup of corpus
        (9100, _text(100)),    # dup of in-batch doc 100
        (9101, _text(100)),    # second copy — also dup_in_batch
    ])
    st1 = {r["doc_id"]: r["status"]
           for r in neardup_ingest(spark, store, batch1, 1).collect()}
    assert st1 == {
        100: "kept", 101: "kept",
        9003: "dup_of_corpus",
        9100: "dup_in_batch", 9101: "dup_in_batch",
    }
    full = spark.read.parquet(store)
    assert full.count() == base + 4 * 2  # only survivors' bands added

    # batch 2: a copy of batch-1 survivor 100 now dups AGAINST THE
    # STORE (accumulation), a fresh doc is kept
    st2 = {r["doc_id"]: r["status"]
           for r in neardup_ingest(
               spark, store,
               _docs(spark, [(200, _text(200)), (9200, _text(100))]), 2,
           ).collect()}
    assert st2 == {200: "kept", 9200: "dup_of_corpus"}
    assert spark.read.parquet(store).count() == base + 4 * 3

    # replay batch 1 under the SAME batch id: identical statuses
    # (its own dir is excluded from the decision), store converges
    st1r = {r["doc_id"]: r["status"]
            for r in neardup_ingest(spark, store, batch1, 1).collect()}
    assert st1r == st1
    assert spark.read.parquet(store).count() == base + 4 * 3

    # at-least-once under a NEW batch id: the incoming ids are
    # anti-joined out of the store side, so survivors stay kept
    # (duplicate band rows, same values — collision logic unaffected)
    st1n = {r["doc_id"]: r["status"]
            for r in neardup_ingest(spark, store, batch1, 3).collect()}
    assert st1n == st1


def test_first_ingest_bootstraps_empty_store(spark, tmp_path):
    store = str(tmp_path / "bands")
    st = {r["doc_id"]: r["status"]
          for r in neardup_ingest(
              spark, store,
              _docs(spark, [(1, _text(1)), (2, _text(2)), (3, _text(1))]), 0,
          ).collect()}
    assert st == {1: "kept", 2: "kept", 3: "dup_in_batch"}
    assert spark.read.parquet(store).count() == 4 * 2


def test_ingest_store_scan_is_prefix_pruned(spark, tmp_path):
    store = str(tmp_path / "bands")
    band_store_init(
        spark, store, _docs(spark, [(i, _text(i)) for i in range(40)])
    )
    def scanned(df):
        # files the executed scan actually touches (inputFiles() lists
        # the whole relation BEFORE partition pruning)
        return {
            r["f"]
            for r in df.select(F.input_file_name().alias("f")).distinct().collect()
        }

    all_files = scanned(spark.read.parquet(store))
    # a one-doc batch touches ≤ 4 hash prefixes — the pruned store
    # frame must scan strictly fewer files than the full store
    from pdf_extractor_spark.analytics.dedup import _with_bands

    # same text as corpus doc 0 → its 4 prefixes are guaranteed present
    one = _with_bands(_docs(spark, [(999, _text(0))]))
    pfxs = [r["p"] for r in one.select(
        F.concat(F.lit("x"), F.substring("band_hash", 1, 2)).alias("p")
    ).distinct().collect()]
    pruned = scanned(_store_bands(spark, store, "b9", pfxs))
    assert pruned and pruned < all_files


def test_stream_neardup_ingest_two_waves(spark, tmp_path):
    """Streaming face: wave 2 dedupes against wave 1's survivors via
    the persistent store; a checkpointed replay reprocesses nothing."""
    from pdf_extractor_spark.streaming import stream_neardup_ingest

    inbox = str(tmp_path / "inbox")
    store = str(tmp_path / "bands")
    ckpt = str(tmp_path / "ckpt")
    audit = str(tmp_path / "statuses")

    _docs(spark, [(1, _text(1)), (2, _text(2))]).coalesce(1) \
        .write.mode("append").parquet(inbox)
    stream_neardup_ingest(spark, inbox, store, ckpt, statuses_dir=audit)
    assert spark.read.parquet(store).count() == 4 * 2

    # wave 2: a copy of wave-1 doc 1 under a new id + a fresh doc
    _docs(spark, [(3, _text(1)), (4, _text(4))]).coalesce(1) \
        .write.mode("append").parquet(inbox)
    stream_neardup_ingest(spark, inbox, store, ckpt, statuses_dir=audit)
    assert spark.read.parquet(store).count() == 4 * 3  # only doc 4 added

    st = {r["doc_id"]: r["status"]
          for r in spark.read.parquet(audit).collect()}
    assert st == {1: "kept", 2: "kept", 3: "dup_of_corpus", 4: "kept"}

    # replay with nothing new: checkpoint sees no files, state unchanged
    stream_neardup_ingest(spark, inbox, store, ckpt, statuses_dir=audit)
    assert spark.read.parquet(store).count() == 4 * 3
    assert spark.read.parquet(audit).count() == 4
