"""The flagship extraction pipeline: interleaved spans → ordered elements.

Scale design (this is the 100 TB shape, not just the local[32] shape):

* Extraction is per-document and stateless across documents, so the
  main path is **map-only with zero shuffle**: a scalar Arrow-batched
  pandas UDF over the ``spans`` array column. 1000 executors scan their
  Iceberg/parquet splits and write — no exchange anywhere in the plan.
* Skewed **mega-documents** (span count ≥ ``mega_span_threshold``) are
  the one hazard: a handful of 1000×-median rows inside a batch blow up
  Python-worker memory and straggle a partition. They are split out by
  a cheap native ``size(spans)`` predicate (pushed into the scan),
  exploded to one-row-per-span, shuffled by ``doc_id`` (this salt-like
  explode spreads the *bytes* of the skewed minority across the
  cluster), and re-assembled per doc in ``applyInPandas``. Only the
  skewed tail pays a shuffle (SURVEY.md §4 custom-work items 1-3).
* All tokenize/classify work happens inside Arrow batches — the plan
  contains only ``ArrowEvalPython``/``FlatMapGroupsInPandas`` nodes,
  never row-at-a-time ``BatchEvalPython`` (north-rule "zero per-row
  Python" requirement).

Reference lifecycle being re-expressed: cli.py convert →
process_pdf → extract_from_markdown token walk
(markdown_extractor.py:312-625) → table merge
(improved_table_merger.py:187-254) → ordered JSON sink (SURVEY.md §3.1).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType

from ..docmodel import extract_document
from ..schema import EXTRACTED_SCHEMA, OUT_SPAN_STRUCT

OUT_SPANS_TYPE = ArrayType(OUT_SPAN_STRUCT)


def _spans_to_records(spans) -> list:
    """Arrow hands array<struct> to pandas as a numpy array of dicts."""
    return [
        {
            "kind": s["kind"],
            "text": s["text"],
            "media_ref": s["media_ref"],
            "offset": s["offset"],
        }
        for s in spans
    ]


def make_extract_udf(merge_strategy: str = "default"):
    @F.pandas_udf(OUT_SPANS_TYPE)
    def extract_udf(spans_col: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for series in spans_col:
            yield series.map(
                lambda spans: extract_document(
                    _spans_to_records(spans), merge_strategy
                )
            )

    return extract_udf


def extract_spans(
    docs: DataFrame,
    merge_strategy: str = "default",
    mega_span_threshold: int = 20_000,
) -> DataFrame:
    """docs(doc_id, spans) → (doc_id, out_spans), preserving span order.

    Returns one row per document with the ordered extracted elements.
    """
    udf = make_extract_udf(merge_strategy)
    n_spans = F.size("spans")

    small = docs.filter(n_spans < mega_span_threshold)
    small_out = small.select("doc_id", udf(F.col("spans")).alias("out_spans"))

    mega = docs.filter(n_spans >= mega_span_threshold)
    mega_out = _extract_mega(mega, merge_strategy)
    return small_out.unionByName(mega_out)


def _extract_mega(mega: DataFrame, merge_strategy: str) -> DataFrame:
    """Skew path: explode → shuffle by doc_id → reassemble per group.

    Exploding turns one multi-MB row into thousands of small rows, so
    the shuffle write of a mega-doc is spread over many map tasks and
    AQE's skew handling sees ordinary-sized blocks. ``applyInPandas``
    receives the whole document group and runs the same state machine.
    """

    def run_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("offset")
        spans = pdf[["kind", "text", "media_ref", "offset"]].to_dict("records")
        out = extract_document(spans, merge_strategy)
        return pd.DataFrame(
            {"doc_id": [pdf["doc_id"].iloc[0]], "out_spans": [out]}
        )

    exploded = mega.select(
        "doc_id", F.explode("spans").alias("s")
    ).select(
        "doc_id", "s.kind", "s.text", "s.media_ref", "s.offset"
    )
    return exploded.groupBy("doc_id").applyInPandas(run_group, schema=EXTRACTED_SCHEMA)


def extracted_flat(extracted: DataFrame) -> DataFrame:
    """(doc_id, out_spans) → one row per element, inline columns.

    The exploded view feeds the query layer and the Iceberg/parquet
    sink; ``posexplode`` keeps the equality-tuple order explicit.
    """
    return extracted.select(
        "doc_id", F.posexplode("out_spans").alias("pos", "el")
    ).select(
        "doc_id",
        F.col("el.kind").alias("kind"),
        F.col("el.text").alias("text"),
        F.col("el.media_ref").alias("media_ref"),
        F.col("el.offset").alias("offset"),
        F.col("el.page").alias("page"),
        F.col("el.level").alias("level"),
        F.col("el.token_count").alias("token_count"),
        F.col("el.section_path").alias("section_path"),
        F.col("el.section_id").alias("section_id"),
        F.col("el.table_headers").alias("table_headers"),
        F.col("el.table_rows").alias("table_rows"),
        F.col("el.is_multi_page").alias("is_multi_page"),
        F.col("el.page_range").alias("page_range"),
    )
