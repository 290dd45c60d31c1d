"""Golden JSON-fixture validation (the reference's test methodology:
store expected output as fixture files, compare ACTUAL vs EXPECTED —
docs/memory_bank/VALIDATION_REQUIREMENTS.md:1-36; golden fixture shape
src/test_fixtures/BHT_CV32A65X_expected.json)."""

import json
import os

from pdf_extractor_spark.docmodel import extract_document
from pdf_extractor_spark.operators.extract import extract_elements
from pdf_extractor_spark.schema import DOCS_SCHEMA

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "golden_docs.json")


def load_fixture():
    with open(FIXTURE) as f:
        return json.load(f)


def test_fixture_hand_asserted_invariants():
    """Independent assertions on the frozen expectations themselves —
    the fixture is not purely self-referential."""
    fx = load_fixture()
    mp = fx["golden-multipage-table"]["expected"]
    assert [e["kind"] for e in mp] == ["heading", "text", "text", "table", "text"]
    table = mp[3]
    assert table["is_multi_page"] is True and table["page_range"] == "1-2"
    assert "clk_i" in table["text"] and "data_o" in table["text"]
    # the continuation's duplicate header row was dropped on merge
    assert table["text"].count("| Signal | IO |") == 1

    mixed = fx["golden-mixed-kinds"]["expected"]
    assert [e["kind"] for e in mixed] == [
        "heading", "heading", "text", "image", "code", "text", "heading", "text",
    ]
    assert mixed[3]["media_ref"] == "s3://media/fig1.png"
    # html span: boilerplate dropped, entity unescaped
    assert mixed[5]["text"] == "Kept & cleaned."

    nomerge = fx["golden-no-merge"]["expected"]
    assert [e["kind"] for e in nomerge] == ["table", "table"]
    assert all(not e["is_multi_page"] for e in nomerge)


def test_oracle_matches_fixture():
    fx = load_fixture()
    for name, d in fx.items():
        got = extract_document(d["spans"])
        assert len(got) == len(d["expected"]), name
        for g, e in zip(got, d["expected"]):
            for k in ("kind", "text", "media_ref", "offset", "page",
                      "is_multi_page", "page_range"):
                assert g[k] == e[k], (name, k)


def test_spark_pipeline_matches_fixture(spark):
    fx = load_fixture()
    rows = [{"doc_id": n, "spans": d["spans"]} for n, d in fx.items()]
    df = spark.createDataFrame(rows, schema=DOCS_SCHEMA)
    got: dict = {}
    for r in extract_elements(df).collect():
        got.setdefault(r["doc_id"], []).append(r)
    for name, d in fx.items():
        actual = sorted(got[name], key=lambda r: r["offset"])
        assert len(actual) == len(d["expected"]), name
        for a, e in zip(actual, d["expected"]):
            assert (a["kind"], a["text"], a["media_ref"], a["offset"]) == (
                e["kind"], e["text"], e["media_ref"], e["offset"],
            ), name
