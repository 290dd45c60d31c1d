"""Spark pipeline ↔ pure-Python oracle equality + plan-shape checks."""

import pytest
from pyspark.sql import functions as F

from pdf_extractor_spark.corpus import corpus_rows
from pdf_extractor_spark.docmodel import extract_document
from pdf_extractor_spark.operators.extract import (
    extract_elements,
    extract_spans,
    extracted_flat,
)
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


def test_flat_path_matches_oracle(spark, small_corpus):
    """The direct-to-flat performance path produces the identical
    (kind, text, media_ref, order) sequences as the pure-Python oracle,
    across both the map-only and the mega-doc skew path."""
    rows, df = small_corpus
    flat = extract_elements(df, mega_span_threshold=120)
    got: dict = {}
    for r in flat.collect():
        got.setdefault(r["doc_id"], []).append(r)
    assert len(got) == len(rows)
    for row in rows:
        expect = tuples(extract_document(row["spans"]))
        actual = [
            (r["kind"], r["text"], r["media_ref"], r["offset"])
            for r in sorted(got[row["doc_id"]], key=lambda r: r["offset"])
        ]
        assert actual == expect, f"flat-path mismatch for {row['doc_id']}"


def test_flat_path_matches_nested_path(spark, small_corpus):
    _, df = small_corpus
    a = extract_elements(df, mega_span_threshold=120)
    b = extracted_flat(extract_spans(df, mega_span_threshold=120))
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_flat_plan_is_map_only_and_arrow(spark, small_corpus):
    """Scalar flat path: no Exchange (map-only), no BatchEvalPython."""
    _, df = small_corpus
    small_only = df.filter(F.size("spans") < 10_000_000)
    out = extract_elements(small_only, mega_span_threshold=10_000_000)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    # the union includes the (empty) mega branch whose groupBy shuffles;
    # the small branch itself must stay exchange-free: check its side
    small_branch = small_only.select("doc_id", "spans").mapInPandas(
        __import__(
            "pdf_extractor_spark.operators.extract", fromlist=["_flat_batches"]
        )._flat_batches("default"),
        schema=__import__(
            "pdf_extractor_spark.schema", fromlist=["FLAT_SCHEMA"]
        ).FLAT_SCHEMA,
    )
    plan2 = small_branch._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan2


def test_deterministic_across_runs(spark, small_corpus):
    rows, df = small_corpus
    a = extract_spans(df).orderBy("doc_id").collect()
    b = extract_spans(df).orderBy("doc_id").collect()
    assert a == b
