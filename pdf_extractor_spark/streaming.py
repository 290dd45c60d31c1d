"""Incremental ingestion via Structured Streaming.

The reference is strictly batch (SURVEY.md §2.9) — its only
"incremental" machinery is the cache-based resume we re-express in
lineage.py. This module adds the Spark-native continuous counterpart:
new document files landing in a directory are extracted exactly once,
with the stream checkpoint providing the resume guarantee (the
streaming analog of the lineage table's anti-join).

Map-only streaming: the extraction kernel is the same Arrow-batched
``mapInPandas`` as the batch flat path, which is fully
streaming-compatible (no stateful operator, no watermark needed).
Mega-documents are a batch concern — the streaming path extracts every
doc through the scalar kernel; a production deployment routes
``size(spans) >= threshold`` rows to a side topic for batch backfill
(the groupBy/applyInPandas skew path is not streamable without the
state-store API, and does not need to be).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .operators.extract import _flat_batches
from .schema import DOCS_SCHEMA, FLAT_SCHEMA


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    merge_strategy: str = "default",
    max_files_per_trigger: int | None = None,
):
    """Watch ``input_dir`` for parquet docs, extract, append parquet.

    Runs with ``trigger(availableNow=True)`` — drain everything new,
    then stop — so callers (and tests) invoke it per micro-batch wave;
    a long-running deployment would use a processingTime trigger
    instead. Returns the finished StreamingQuery.
    """
    reader = spark.readStream.schema(DOCS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.parquet(input_dir)
    flat = docs.mapInPandas(_flat_batches(merge_strategy), schema=FLAT_SCHEMA)
    query = (
        flat.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query


def read_stream_output(spark: SparkSession, output_dir: str) -> DataFrame:
    return spark.read.schema(FLAT_SCHEMA).parquet(output_dir)


def stream_windowed_event_counts(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
):
    """Event-time tumbling-window aggregation with a watermark.

    The engine's streaming-analytics face (the reference has none —
    SURVEY.md §2.9): counts + value sums per (event_type, window) with
    late data bounded by the watermark, so state is evicted and the
    job runs forever at constant memory. Append output mode: windows
    emit once finalized (watermark passed), exactly-once via the
    checkpoint.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    events_schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )
    ev = spark.readStream.schema(events_schema).parquet(input_dir)
    agg = (
        ev.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    query = (
        agg.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query


def stream_sessionize_stateful(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    gap_s: int = 1800,
):
    """Custom stateful streaming operator: per-user sessionization via
    ``applyInPandasWithState`` (the arbitrary-state API the batch
    window version W5 cannot express incrementally).

    State per user = (last_ts, session_start, n_events). A gap larger
    than ``gap_s`` closes the running session and emits it; the open
    session survives in the state store across micro-batches and
    restarts (checkpointed). Emits only CLOSED sessions.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("session_start", LongType()),  # epoch seconds
            StructField("session_end", LongType()),
            StructField("n_events", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("last_ts", LongType()),
            StructField("start_ts", LongType()),
            StructField("n", LongType()),
        ]
    )
    events_schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
        ]
    )

    def fn(key, pdfs, state):
        (user_id,) = key
        last_ts, start_ts, n = state.get if state.exists else (None, None, 0)
        closed = []
        batch = pd.concat(list(pdfs))
        for ts in sorted(int(t.timestamp()) for t in batch["ts"]):
            if last_ts is not None and ts < last_ts:
                # cross-batch late arrival: drop (the stateful analog
                # of a watermark) — last_ts must stay monotone or a
                # session could close with end < start
                continue
            if last_ts is not None and ts - last_ts > gap_s:
                closed.append((user_id, start_ts, last_ts, n))
                start_ts, n = None, 0
            if start_ts is None:
                start_ts = ts
            last_ts = ts
            n += 1
        state.update((last_ts, start_ts, n))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start", "session_end", "n_events"],
            )

    ev = spark.readStream.schema(events_schema).parquet(input_dir)
    sessions = ev.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
    query = (
        sessions.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query


def stream_extract_merge(
    spark: SparkSession,
    input_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    merge_strategy: str = "default",
):
    """CDC-style incremental extraction: new/updated document files are
    extracted and MERGED into an existing lineage store by
    (doc_id, offset) — re-delivered documents REPLACE their previous
    elements instead of appending duplicates.

    ``foreachBatch`` + :func:`lineage.upsert_elements` composes the
    exactly-once stream checkpoint (which micro-batches were consumed)
    with the store's copy-on-write MERGE commit (how a batch lands).
    A crash between the two replays the micro-batch; replaying an
    upsert of the same keys is idempotent, so the composition stays
    exactly-once in effect. This is the streaming face of the
    reference's update CRUD surface (arangodb/crud.py) — batch face:
    lineage.upsert_elements.

    Re-extracted documents may produce FEWER elements than before; the
    keyed upsert replaces only matched (doc_id, offset) rows, so after
    it lands the batch also deletes each re-delivered doc's stale tail
    (offsets past its new maximum). Crash between the two merge
    commits leaves the tail until the checkpoint replays the batch —
    both steps are idempotent, so replay converges.

    A document delivered TWICE within one micro-batch (rapid edits)
    must not upsert both versions — mixed-version elements would leak
    into the store. The batch therefore dedups per doc_id BEFORE
    extraction, keeping the newest source file (modification time,
    path as tie-break); extraction runs on the deduped batch inside
    ``foreachBatch`` as a plain batch job.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from .lineage import delete_elements, read_output, upsert_elements

    docs = (
        spark.readStream.schema(DOCS_SCHEMA)
        .parquet(input_dir)
        .select(
            "*",
            F.col("_metadata.file_modification_time").alias("_mtime"),
            F.col("_metadata.file_path").alias("_fpath"),
        )
    )

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sess = batch_df.sparkSession
        w = Window.partitionBy("doc_id").orderBy(
            F.desc("_mtime"), F.desc("_fpath")
        )
        latest = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("doc_id", "spans")
        )
        flat = latest.mapInPandas(
            _flat_batches(merge_strategy), schema=FLAT_SCHEMA
        ).persist()
        try:
            upsert_elements(sess, store_dir, flat)
            # stale keys are derived from EVERY delivered doc, not just
            # docs that extracted rows — a doc re-delivered empty must
            # still have its old elements removed (mx = -1 → all stale)
            new_max = (
                latest.select("doc_id")
                .join(
                    flat.groupBy("doc_id").agg(F.max("offset").alias("_mx")),
                    "doc_id",
                    "left",
                )
                .select("doc_id", F.coalesce("_mx", F.lit(-1)).alias("mx"))
            )
            # scan only the buckets the delivered docs hash into, not
            # the whole store (read_output restricted by bucket list)
            stale = (
                read_output(sess, store_dir, for_doc_ids=new_max.select("doc_id"))
                .join(new_max, "doc_id")
                .filter(F.col("offset") > F.col("mx"))
                .select("doc_id", "offset")
                .persist()
            )
            try:
                if not stale.isEmpty():
                    delete_elements(sess, store_dir, stale)
            finally:
                stale.unpersist()
        finally:
            flat.unpersist()

    query = (
        docs.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query
