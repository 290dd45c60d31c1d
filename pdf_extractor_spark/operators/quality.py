"""Table quality metrics → confidence score (A5) + accept gate (P2).

Reference: TableQualityEvaluator.calculate_table_confidence consumed at
table_extraction.py:411-433 (the evaluator itself lives in an external
module; the consumed contract is a 0-100 confidence plus quality-issue
flags, gated at CONFIDENCE_THRESHOLD = 75.0, context7/config.py:37).

Re-expressed as native Catalyst column expressions over the flat
element schema — no Python anywhere:

* completeness  = non-empty cells / total cells (aggregate over rows)
* consistency   = 1.0 if every row matches the header width (forall)
* fill          = rows present at all
* confidence    = 100 · (0.5·completeness + 0.3·consistency + 0.2·fill)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CONFIDENCE_THRESHOLD = 75.0  # context7/pdf_extractor/config.py:37


def _cell_counts(rows: Column) -> tuple[Column, Column]:
    total = F.aggregate(rows, F.lit(0), lambda acc, r: acc + F.size(r))
    non_empty = F.aggregate(
        rows,
        F.lit(0),
        lambda acc, r: acc
        + F.size(F.filter(r, lambda c: F.length(F.trim(c)) > 0)),
    )
    return total, non_empty


def with_table_quality(elements: DataFrame) -> DataFrame:
    """Flat elements → table rows annotated with quality metrics.

    Non-table elements are filtered out; returns (doc_id, offset, page,
    completeness, consistency, confidence)."""
    tables = elements.filter(F.col("kind") == "table")
    rows = F.col("table_rows")
    n_cols = F.size("table_headers")
    total, non_empty = _cell_counts(rows)
    completeness = F.when(total > 0, non_empty.cast("double") / total).otherwise(0.0)
    consistency = F.when(
        (F.size(rows) > 0) & F.forall(rows, lambda r: F.size(r) == n_cols), 1.0
    ).otherwise(0.0)  # forall is vacuously true on [], so gate on fill
    fill = F.when(F.size(rows) > 0, 1.0).otherwise(0.0)
    confidence = 100.0 * (
        0.5 * completeness + 0.3 * consistency + 0.2 * fill
    )
    return tables.select(
        "doc_id",
        "offset",
        "page",
        F.round(completeness, 4).alias("completeness"),
        consistency.alias("consistency"),
        F.round(confidence, 2).alias("confidence"),
    )


def accepted_tables(
    elements: DataFrame, threshold: float = CONFIDENCE_THRESHOLD
) -> DataFrame:
    """P2 — drop tables below the confidence gate
    (table_extraction.py:429-433)."""
    return with_table_quality(elements).filter(F.col("confidence") >= threshold)


# ---------------------------------------------------------------------------
# P11 — numeric cell coercion, Spark-native (table_extraction.py:373-392
# ``df.apply(pd.to_numeric, errors="ignore")``: a column converts only
# when EVERY cell parses). try_cast inside nested HOF lambdas keeps the
# whole inference in Catalyst — no Python, no shuffle (pure map).
# The pure-Python twin is parsers.infer_column_types / coerce_numeric_columns.
# ---------------------------------------------------------------------------


def column_types_expr(headers: Column, rows: Column) -> Column:
    """array<string> of per-column type tags ('bigint'|'double'|'string').

    A column is bigint when every cell try_casts to bigint, double when
    every cell try_casts to double, else string — pandas' errors="ignore"
    column semantics. Empty tables yield all-'string' (no evidence)."""

    def col_type(j: Column) -> Column:
        # try_element_at: a ragged row shorter than the header count
        # yields NULL instead of INVALID_ARRAY_INDEX — the missing cell
        # behaves like pandas' NaN pad (blocks bigint, allowed for
        # double), matching parsers._pad_rect
        def cell(r: Column) -> Column:
            return F.try_element_at(r, j)

        all_int = F.forall(
            rows, lambda r: cell(r).try_cast("bigint").isNotNull()
        )
        # pandas maps empty cells to NaN and still converts the column
        # to float — an empty cell blocks bigint but not double; pandas
        # rejects literal "nan"/"inf" strings that Spark's cast accepts
        all_num = F.forall(
            rows,
            lambda r: (
                cell(r).try_cast("double").isNotNull()
                & ~F.lower(F.trim(cell(r))).rlike(r"^[+-]?(nan|inf|infinity)$")
            )
            | (F.length(F.trim(cell(r))) == 0)
            | cell(r).isNull(),
        )
        return (
            F.when(F.size(rows) == 0, "string")
            .when(all_int, "bigint")
            .when(all_num, "double")
            .otherwise("string")
        )

    # guard: sequence(1, 0) on empty headers yields the DESCENDING
    # array [1, 0] and element_at(r, 0) throws INVALID_INDEX_OF_ZERO
    return F.when(
        F.size(headers) > 0,
        F.transform(F.sequence(F.lit(1), F.size(headers)), col_type),
    ).otherwise(F.array().cast("array<string>"))


def with_column_types(elements: DataFrame) -> DataFrame:
    """Table elements annotated with inferred per-column types."""
    tables = elements.filter(F.col("kind") == "table")
    return tables.select(
        "doc_id",
        "offset",
        "table_headers",
        column_types_expr(F.col("table_headers"), F.col("table_rows")).alias(
            "col_types"
        ),
    )
