"""Native (Catalyst-only) multi-page table merge over extracted elements.

The UDF pipeline (docmodel.merge_multi_page_tables, run inside
extract_elements) is the bit-exact reference path, mirroring
improved_table_merger.py:187-254 *including its quirk*: a merged table
keeps its FIRST page number, so a chain spanning 3+ consecutive pages
does not fully collapse (SURVEY.md §7.4 #1 discusses why we keep the
documented behavior in the UDF path).

This module is the scalable, shuffle-light alternative expressed purely
in window functions + aggregation (SURVEY.md §2.5 W5 sessionization):

    lag() over (doc_id order by offset)  →  should_merge flag
    running sum(1 - flag)                →  merge-group id
    groupBy(doc_id, group)               →  concat rows, min page, max page

Its semantics are the *chain* semantics (a 3-page run of lookalike
tables merges into one), which is what a sane engine wants at scale;
on corpora without 3+-page chains it agrees exactly with the UDF path
(tested both ways in tests/test_table_merge.py).

Merge predicate (improved_table_merger.py:28-65,146-185): consecutive
pages, equal column count, and positionally-matched headers with
(exact + 0.5*partial)/n ≥ 0.7 — all as native column expressions
(zip_with + aggregate + filter higher-order functions, no Python).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HEADER_SIM_THRESHOLD = 0.7


def _norm(h: Column) -> Column:
    return F.transform(h, lambda x: F.lower(F.trim(x)))


def headers_match(h1: Column, h2: Column, threshold: float = HEADER_SIM_THRESHOLD) -> Column:
    """(exact + 0.5·partial)/n ≥ threshold over positionally zipped,
    lowercased+trimmed headers; count mismatch → false.

    partial = one-contains-the-other and not equal
    (improved_table_merger.py:44-65)."""
    n1, n2 = _norm(h1), _norm(h2)
    pair_score = F.zip_with(
        n1,
        n2,
        lambda a, b: F.when(a == b, F.lit(1.0))
        .when(
            (F.length(a) > 0)
            & (F.length(b) > 0)
            & (a.contains(b) | b.contains(a)),
            F.lit(0.5),
        )
        .otherwise(F.lit(0.0)),
    )
    score = F.aggregate(pair_score, F.lit(0.0), lambda acc, v: acc + v) / F.size(h1)
    return (
        (F.size(h1) == F.size(h2)) & (F.size(h1) > 0) & (score >= F.lit(threshold))
    )


def merge_tables_native(elements: DataFrame) -> DataFrame:
    """Flat extracted elements → merged tables, one row per merge group.

    Input: the flat element schema (doc_id, kind, offset, page,
    table_headers, table_rows, ...). Non-table rows pass through
    untouched in the companion view; this operator returns the merged
    tables:

      (doc_id, first_offset, first_page, last_page, is_multi_page,
       page_range, table_headers, table_rows)
    """
    tables = elements.filter(F.col("kind") == "table").select(
        "doc_id", "offset", "page", "table_headers", "table_rows"
    )
    w = Window.partitionBy("doc_id").orderBy("offset")
    prev_headers = F.lag("table_headers").over(w)
    prev_page = F.lag("page").over(w)
    mergeable = (
        prev_headers.isNotNull()
        & (F.col("page") == prev_page + 1)
        & headers_match(prev_headers, F.col("table_headers"))
    )
    flagged = tables.withColumn(
        "new_group", F.when(mergeable, F.lit(0)).otherwise(F.lit(1))
    )
    grouped = flagged.withColumn(
        "merge_group", F.sum("new_group").over(w)
    )
    # min_by keeps the FIRST table's headers deterministically
    # (F.first is shuffle-order-dependent; improved_table_merger.py
    #  keeps d1's header row on merge)
    agg = (
        grouped.groupBy("doc_id", "merge_group")
        .agg(
            F.min("offset").alias("first_offset"),
            F.min("page").alias("first_page"),
            F.max("page").alias("last_page"),
            F.min_by("table_headers", "offset").alias("table_headers"),
            # rows concat in offset order: collect (offset, rows) structs,
            # sort, then flatten — keeps row order deterministic under
            # any shuffle layout
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("offset", "table_rows"))
                    ),
                    lambda s: s["table_rows"],
                )
            ).alias("table_rows"),
        )
        .withColumn("is_multi_page", F.col("last_page") > F.col("first_page"))
        .withColumn(
            "page_range",
            F.when(
                F.col("is_multi_page"),
                F.concat_ws("-", "first_page", "last_page"),
            ),
        )
        .drop("merge_group")
    )
    return agg
