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

    Corrected rows are re-fingerprinted (section_id = md5(text), F6) so
    downstream dedup/equality sees the corrected content."""
    fixed = corrections.select(
        "doc_id", "offset", F.col("corrected_text").alias("_corr")
    )
    joined = elements.join(F.broadcast(fixed), ["doc_id", "offset"], "left")
    corrected_text = F.coalesce(F.col("_corr"), F.col("text"))
    return (
        joined.withColumn("text", corrected_text)
        .withColumn(
            "section_id",
            F.when(F.col("_corr").isNotNull(), F.md5(F.col("text"))).otherwise(
                F.col("section_id")
            ),
        )
        .drop("_corr")
    )
