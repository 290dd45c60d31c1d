"""Variable-hop traversal (J5) + corrections overlay (S15)."""

from pyspark.sql import functions as F

from pdf_extractor_spark.operators.corrections import apply_corrections
from pdf_extractor_spark.operators.graph import traverse
from pdf_extractor_spark.schema import FLAT_SCHEMA

EDGES = [
    ("a", "b"), ("b", "c"), ("c", "d"), ("a", "e"), ("e", "d"), ("d", "a"),
]


def _graph(spark):
    edges = spark.createDataFrame(EDGES, "src string, dst string")
    starts = spark.createDataFrame([("a",)], "vertex string")
    return edges, starts


def test_traverse_outbound_min_depth(spark):
    edges, starts = _graph(spark)
    got = {r["vertex"]: r["hops"] for r in traverse(edges, starts, 1, 3).collect()}
    # a→{b,e}@1, →{c,d}@2 (d via e), never revisits a (hop-minimal)
    assert got == {"b": 1, "e": 1, "c": 2, "d": 2}


def test_traverse_min_hops_filter(spark):
    edges, starts = _graph(spark)
    got = {r["vertex"]: r["hops"] for r in traverse(edges, starts, 2, 2).collect()}
    assert got == {"c": 2, "d": 2}


def test_traverse_inbound_and_any(spark):
    edges, starts = _graph(spark)
    inbound = {r["vertex"] for r in traverse(edges, starts, 1, 1, "inbound").collect()}
    assert inbound == {"d"}
    any1 = {r["vertex"] for r in traverse(edges, starts, 1, 1, "any").collect()}
    assert any1 == {"b", "e", "d"}


def test_corrections_override_and_refingerprint(spark):
    elements = spark.createDataFrame(
        [
            ("d1", "text", "orig one", "", 0, 1, 0, 2, [], "sid0", None, None, False, None, None, None),
            ("d1", "text", "orig two", "", 1, 1, 0, 2, [], "sid1", None, None, False, None, None, None),
        ],
        schema=FLAT_SCHEMA,
    )
    corr = spark.createDataFrame(
        [("d1", 1, "fixed two")],
        "doc_id string, offset int, corrected_text string",
    )
    out = {r["offset"]: r for r in apply_corrections(elements, corr).collect()}
    assert out[0]["text"] == "orig one" and out[0]["section_id"] == "sid0"
    assert out[1]["text"] == "fixed two"
    import hashlib

    assert out[1]["section_id"] == hashlib.md5(b"fixed two").hexdigest()
    plan = (
        apply_corrections(elements, corr)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_corrections_recompute_tokens_and_null_table_fields(spark):
    from pdf_extractor_spark.textproc import token_count

    elements = spark.createDataFrame(
        [
            ("d1", "table", "| A |", "", 0, 1, 0, 3, [], "s",
             ["A"], [["1"]], False, None, None, None),
        ],
        schema=FLAT_SCHEMA,
    )
    corr = spark.createDataFrame(
        [("d1", 0, "plain replacement text!")],
        "doc_id string, offset int, corrected_text string",
    )
    out = apply_corrections(elements, corr).collect()[0]
    assert out["token_count"] == token_count("plain replacement text!")
    assert out["table_headers"] is None and out["table_rows"] is None


def test_traverse_edge_type_filter(spark):
    edges = spark.createDataFrame(
        [("a", "b", "cites"), ("a", "c", "links"), ("b", "d", "cites")],
        "src string, dst string, type string",
    )
    starts = spark.createDataFrame([("a",)], "vertex string")
    from pdf_extractor_spark.operators.graph import traverse

    cites_only = {
        r["vertex"]: r["hops"]
        for r in traverse(edges, starts, 1, 2, edge_types=["cites"]).collect()
    }
    assert cites_only == {"b": 1, "d": 2}  # 'links' edge never traversed
    all_types = {r["vertex"] for r in traverse(edges, starts, 1, 2).collect()}
    assert all_types == {"b", "c", "d"}
