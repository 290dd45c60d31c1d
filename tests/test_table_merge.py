"""Native windowed table merge vs the UDF/oracle merge path."""

import pytest
from pyspark.sql import functions as F

from pdf_extractor_spark.corpus import corpus_rows
from pdf_extractor_spark.docmodel import extract_document
from pdf_extractor_spark.operators.extract import extract_elements
from pdf_extractor_spark.operators.table_merge import merge_tables_native
from pdf_extractor_spark.schema import DOCS_SCHEMA


def _mk_table_spans(pages_headers_rows):
    """Build a doc of bare tables: [(page, headers, rows), ...]."""
    spans = []

    def add(kind, text):
        spans.append({"kind": kind, "text": text, "media_ref": "", "offset": len(spans)})

    page = 0
    for p, headers, rows in pages_headers_rows:
        if p != page:
            add("page_marker", f"<!-- page: {p} -->")
            page = p
        add("table_row", "| " + " | ".join(headers) + " |")
        add("table_row", "|" + "|".join("---" for _ in headers) + "|")
        for r in rows:
            add("table_row", "| " + " | ".join(r) + " |")
        add("text", "")
        add("text", f"between tables p{p}.")
        add("text", "")
    return spans


H5 = ["Signal", "IO", "Description", "Connection", "Type"]


def test_native_merge_agrees_with_oracle_on_pairs(spark):
    """On the standard corpus (2-page chains only) the native windowed
    merge groups exactly the tables the oracle merge path merges."""
    rows = corpus_rows(10)
    df = spark.createDataFrame(rows, schema=DOCS_SCHEMA)
    flat_premerge = extract_elements(df, merge_strategy="none")
    native = merge_tables_native(flat_premerge)
    got = {
        (r["doc_id"], r["first_offset"]): r
        for r in native.collect()
    }
    for row in rows:
        oracle_tables = [
            e for e in extract_document(row["spans"]) if e["kind"] == "table"
        ]
        native_doc = sorted(
            (k[1], v) for k, v in got.items() if k[0] == row["doc_id"]
        )
        assert len(native_doc) == len(oracle_tables), row["doc_id"]
        for (_, nv), ov in zip(native_doc, oracle_tables):
            assert nv["table_headers"] == ov["table_headers"]
            assert [list(r) for r in nv["table_rows"]] == ov["table_rows"]
            assert bool(nv["is_multi_page"]) == ov["is_multi_page"]
            if ov["is_multi_page"]:
                assert nv["page_range"] == ov["page_range"]


def test_native_merge_chains_three_pages(spark):
    """Documented divergence (SURVEY.md §7.4 #1): a 3-page chain fully
    collapses in the native path (chain semantics), while the
    reference-faithful oracle keeps page-1+2 merged and page-3 apart."""
    spans = _mk_table_spans(
        [
            (1, H5, [["a", "in", "x", "S", "t"]]),
            (2, H5, [["b", "out", "y", "S", "t"]]),
            (3, H5, [["c", "in", "z", "S", "t"]]),
        ]
    )
    df = spark.createDataFrame(
        [{"doc_id": "chain", "spans": spans}], schema=DOCS_SCHEMA
    )
    native = merge_tables_native(
        extract_elements(df, merge_strategy="none")
    ).collect()
    assert len(native) == 1
    assert native[0]["page_range"] == "1-3"
    assert len(native[0]["table_rows"]) == 3

    oracle = [
        e for e in extract_document(spans) if e["kind"] == "table"
    ]
    assert len(oracle) == 2  # reference quirk: merged keeps first page
    assert oracle[0]["page_range"] == "1-2"


def test_native_merge_respects_header_mismatch(spark):
    spans = _mk_table_spans(
        [
            (1, H5, [["a", "in", "x", "S", "t"]]),
            (2, ["Different", "Header", "Structure", "Here", "Now"], [["1", "2", "3", "4", "5"]]),
        ]
    )
    df = spark.createDataFrame(
        [{"doc_id": "nomerge", "spans": spans}], schema=DOCS_SCHEMA
    )
    native = merge_tables_native(
        extract_elements(df, merge_strategy="none")
    ).collect()
    assert len(native) == 2
    assert all(not r["is_multi_page"] for r in native)


def test_native_merge_plan_single_shuffle(spark):
    """The merge operator itself must shuffle exactly once: the window's
    Exchange on doc_id is reused by the groupBy(doc_id, merge_group)
    (partial+final aggregate with no second Exchange)."""
    from pdf_extractor_spark.schema import FLAT_SCHEMA

    elements = spark.createDataFrame(
        [
            ("d1", "table", "t", "", 0, 1, 0, 1, [], "s", ["H"], [["r"]], False, None, None, None),
            ("d1", "table", "t", "", 1, 2, 0, 1, [], "s", ["H"], [["r"]], False, None, None, None),
        ],
        schema=FLAT_SCHEMA,
    )
    native = merge_tables_native(elements)
    plan = native._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
