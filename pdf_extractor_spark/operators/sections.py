"""Native W1/W2: running page + section hierarchy as window functions.

The bit-exact extraction path computes these inside the Arrow state
machine (docmodel). This operator is the SURVEY.md §2.5 mapping made
real — the reference's carried-across-elements heading stack
(markdown_extractor.py:221,359-362) and ``<!-- page: N -->`` tracking
(:373-379) as pure Catalyst window expressions over exploded spans:

    page       = last(page_marker number, ignorenulls) over doc order
    level-j    = last(heading text at level j)  +  its offset
    stack rule = include level j iff its offset exceeds every lower
                 level's offset (a later lower-level heading truncates
                 the stack).

Known divergence from the state machine (documented, pinned by
tests/test_sections_native.py): docmodel truncates the FLAT path list
positionally (``path[:level-1] + [title]``), so a document that opens
with '### A' then '## B' compresses to ['A','B'] there; the per-level
window slots here yield ['B'] (the h3 slot is invalidated by the later
h2). The two agree whenever heading levels never skip upward past an
unseen level — every fixture and the reference golden. Title cleanup
here is the ASCII path of clean_title (control-strip + trim +
'Unnamed Section' fallback); NFC/NFKD folds are UDF-only.

Zero Python: usable as a pre-pass for query planning (e.g. section
filters pushed ahead of the heavy extraction UDF at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MAX_LEVEL = 6


def annotate_spans_native(docs: DataFrame) -> DataFrame:
    """docs(doc_id, spans) → one row per span with native (page,
    level, title, section_path) annotations."""
    spans = docs.select(
        "doc_id", F.posexplode("spans").alias("pos", "s")
    ).select(
        "doc_id",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").alias("offset"),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    page_num = F.when(
        F.col("kind") == "page_marker",
        F.regexp_extract("text", r"<!--\s*page:\s*(\d+)\s*-->", 1).cast("int"),
    )
    hashes = F.regexp_extract(F.trim("text"), r"^(#{1,6})", 1)
    heading_level = F.when(
        F.col("kind") == "heading",
        # hashless headings default to level 1 with the raw text as
        # title — same as the state machine (docmodel heading branch)
        F.greatest(F.length(hashes), F.lit(1)),
    )
    raw_title = F.when(
        F.length(hashes) > 0,
        F.trim(F.regexp_extract(F.trim("text"), r"^#{1,6}\s*(.*)$", 1)),
    ).otherwise(F.trim("text"))
    # clean_title's ASCII path, natively: strip C0 controls + DEL, trim,
    # empty → 'Unnamed Section' (textproc.clean_title)
    cleaned = F.trim(F.regexp_replace(raw_title, r"[\x00-\x1f\x7f]", ""))
    heading_title = F.when(
        F.col("kind") == "heading",
        F.when(F.length(cleaned) > 0, cleaned).otherwise(F.lit("Unnamed Section")),
    )

    annotated = spans.select(
        "*",
        F.coalesce(F.last(page_num, ignorenulls=True).over(w), F.lit(1)).alias(
            "page"
        ),
        heading_level.alias("level"),
        heading_title.alias("title"),
    )

    for j in range(1, MAX_LEVEL + 1):
        lvl_title = F.when(F.col("level") == j, F.col("title"))
        lvl_off = F.when(F.col("level") == j, F.col("offset"))
        annotated = annotated.select(
            "*",
            F.last(lvl_title, ignorenulls=True).over(w).alias(f"h{j}_title"),
            F.last(lvl_off, ignorenulls=True).over(w).alias(f"h{j}_off"),
        )

    # stack rule: keep level j iff its offset beats every lower level's
    def _valid(j: int) -> Column:
        cond = F.col(f"h{j}_off").isNotNull()
        for i in range(1, j):
            cond = cond & (
                F.col(f"h{i}_off").isNull()
                | (F.col(f"h{j}_off") > F.col(f"h{i}_off"))
            )
        return cond

    path = F.filter(
        F.array(
            *[
                F.when(_valid(j), F.col(f"h{j}_title")).otherwise(F.lit(None))
                for j in range(1, MAX_LEVEL + 1)
            ]
        ),
        lambda x: x.isNotNull(),
    )
    return annotated.select(
        "doc_id",
        "kind",
        "text",
        "media_ref",
        "offset",
        "page",
        "level",
        path.alias("section_path"),
    )
