"""HITL corrections overlay (S15) — broadcast-joined overrides.

Reference: per-page Camelot parameter/accuracy corrections persisted
and re-applied on later runs (table_extraction.py:637-654, applied at
:549-566), plus the Label Studio annotation round-trip whose data
contract this table covers (api.py:190-249).

Spark-first shape: corrections are a tiny table
(doc_id, offset, corrected_text) broadcast-joined onto the extracted
elements; ``coalesce`` keeps the original where no correction exists.
One broadcast, zero shuffle of the big side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_corrections(elements: DataFrame, corrections: DataFrame) -> DataFrame:
    """elements(flat schema) ⟕ corrections(doc_id, offset,
    corrected_text) → elements with text overridden where corrected.

    Corrected rows are re-fingerprinted (section_id = md5(text), F6)
    and re-token-counted so downstream dedup/equality/analytics see the
    corrected content; corrected TABLE rows get their structured fields
    nulled (the text is authoritative — a re-parse pass rebuilds them
    if needed), keeping text and table_rows consistent."""
    fixed = corrections.select(
        "doc_id", "offset", F.col("corrected_text").alias("_corr")
    )
    joined = elements.join(F.broadcast(fixed), ["doc_id", "offset"], "left")
    corrected = F.col("_corr").isNotNull()
    # same tokenization as textproc.token_count (alnum runs + marks);
    # (?U) makes Java's \s Unicode-aware like Python's re — without it
    # NBSP etc. count as marks here but as whitespace in the twin
    n_tokens = F.size(
        F.regexp_extract_all(
            F.col("text"), F.lit(r"(?U)[A-Za-z0-9_]+|[^\sA-Za-z0-9_]"), 0
        )
    )
    corrected_table = corrected & (F.col("kind") == "table")
    return (
        joined.withColumn("text", F.coalesce(F.col("_corr"), F.col("text")))
        .withColumn(
            "section_id",
            F.when(corrected, F.md5(F.col("text"))).otherwise(F.col("section_id")),
        )
        .withColumn(
            "token_count",
            F.when(corrected, n_tokens).otherwise(F.col("token_count")),
        )
        .withColumn(
            "table_headers",
            F.when(corrected_table, F.lit(None)).otherwise(F.col("table_headers")),
        )
        .withColumn(
            "table_rows",
            F.when(corrected_table, F.lit(None)).otherwise(F.col("table_rows")),
        )
        .drop("_corr")
    )
