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
