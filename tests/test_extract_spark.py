"""Spark pipeline ↔ pure-Python oracle equality + plan-shape checks."""

import pytest
from pyspark.sql import functions as F

from pdf_extractor_spark.corpus import corpus_rows
from pdf_extractor_spark.docmodel import extract_document
from pdf_extractor_spark.operators.extract import extract_spans, extracted_flat
from pdf_extractor_spark.schema import DOCS_SCHEMA


def tuples(elements):
    return [(e["kind"], e["text"], e["media_ref"], e["offset"]) for e in elements]


@pytest.fixture(scope="module")
def small_corpus(spark):
    rows = corpus_rows(12, mega_every=6, mega_factor=8)
    return rows, spark.createDataFrame(rows, schema=DOCS_SCHEMA)


def test_span_sequence_equality(spark, small_corpus):
    """North rule: exact (kind, text, media_ref, order) equality per doc,
    across both the scalar path and the mega-doc skew path."""
    rows, df = small_corpus
    ext = extract_spans(df, mega_span_threshold=120)
    got = {r["doc_id"]: r for r in ext.collect()}
    assert len(got) == len(rows)
    for row in rows:
        expect = tuples(extract_document(row["spans"]))
        actual = tuples(
            [s.asDict(recursive=True) for s in got[row["doc_id"]]["out_spans"]]
        )
        assert actual == expect, f"span mismatch for {row['doc_id']}"


def test_flat_view_order_and_metadata(spark, small_corpus):
    rows, df = small_corpus
    flat = extracted_flat(extract_spans(df, mega_span_threshold=120))
    one = (
        flat.filter(F.col("doc_id") == rows[0]["doc_id"])
        .orderBy("offset")
        .collect()
    )
    expect = extract_document(rows[0]["spans"])
    assert [r["kind"] for r in one] == [e["kind"] for e in expect]
    assert [r["page"] for r in one] == [e["page"] for e in expect]
    assert [r["section_id"] for r in one] == [e["section_id"] for e in expect]


def test_plan_is_arrow_only(spark, small_corpus):
    """Zero per-row Python: the plan must use Arrow-vectorized eval
    (ArrowEvalPython / FlatMapGroupsInPandas), never BatchEvalPython."""
    _, df = small_corpus
    plan = extract_spans(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan or "EvalPython" not in plan


def test_scalar_path_has_no_shuffle(spark, small_corpus):
    """The non-skew path must be map-only: no Exchange in the plan."""
    _, df = small_corpus
    small_only = df.filter(F.size("spans") < 10_000_000)
    from pdf_extractor_spark.operators.extract import make_extract_udf

    out = small_only.select(
        "doc_id", make_extract_udf()(F.col("spans")).alias("out_spans")
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_deterministic_across_runs(spark, small_corpus):
    rows, df = small_corpus
    a = extract_spans(df).orderBy("doc_id").collect()
    b = extract_spans(df).orderBy("doc_id").collect()
    assert a == b
