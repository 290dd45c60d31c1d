"""Native window section/page forward-fill vs the state-machine oracle."""

from pdf_extractor_spark.corpus import corpus_rows
from pdf_extractor_spark.docmodel import extract_document
from pdf_extractor_spark.operators.sections import annotate_spans_native
from pdf_extractor_spark.schema import DOCS_SCHEMA


def _doc(spark, spans, doc_id="d"):
    return spark.createDataFrame([{"doc_id": doc_id, "spans": spans}], DOCS_SCHEMA)


def _spans(items):
    return [
        {"kind": k, "text": t, "media_ref": "", "offset": i}
        for i, (k, t) in enumerate(items)
    ]


def test_stack_truncation_and_pages(spark):
    spans = _spans(
        [
            ("heading", "# Top"),
            ("text", "a."),
            ("heading", "### Deep"),       # level 3 directly under 1
            ("text", "b."),
            ("page_marker", "<!-- page: 2 -->"),
            ("heading", "## Mid"),          # truncates the level-3 entry
            ("text", "c."),
            ("heading", "### Deep2"),
            ("text", "d."),
        ]
    )
    rows = {
        r["offset"]: r
        for r in annotate_spans_native(_doc(spark, spans)).collect()
    }
    assert rows[1]["section_path"] == ["Top"] and rows[1]["page"] == 1
    assert rows[3]["section_path"] == ["Top", "Deep"]
    assert rows[6]["section_path"] == ["Top", "Mid"] and rows[6]["page"] == 2
    assert rows[8]["section_path"] == ["Top", "Mid", "Deep2"]


def test_heading_paths_match_oracle_on_corpus(spark):
    rows = corpus_rows(8)
    df = spark.createDataFrame(rows, schema=DOCS_SCHEMA)
    native = annotate_spans_native(df).filter("kind = 'heading'").collect()
    by_doc: dict = {}
    for r in sorted(native, key=lambda r: (r["doc_id"], r["offset"])):
        by_doc.setdefault(r["doc_id"], []).append(r)
    for row in rows:
        oracle_headings = [
            e for e in extract_document(row["spans"]) if e["kind"] == "heading"
        ]
        got = by_doc[row["doc_id"]]
        assert len(got) == len(oracle_headings)
        for n, o in zip(got, oracle_headings):
            assert list(n["section_path"]) == o["section_path"], row["doc_id"]
            assert n["page"] == o["page"]


def test_native_sections_plan_pure_catalyst(spark):
    df = _doc(spark, _spans([("heading", "# H"), ("text", "x.")]))
    plan = (
        annotate_spans_native(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan and "InPandas" not in plan
