"""Verbatim-port recompute units for R4-4 / R4-6.

Each test re-implements the reference routine line-for-line in pure
Python (test-only oracle, same pattern as the lesson-CRUD port) over
the deterministic fixture and compares against the Spark query's
output at sf0.001.

* get_text_for_embedding — embedding_utils.py:220-238
* truncate_vector_for_display / format_embedding_for_debug —
  vector_utils.py:10-76 (values floor-rounded to 4 decimals before
  formatting, the query's disclosed cross-engine divergence)
"""

import math

import duckdb

from pdf_extractor_spark.analytics import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _docs():
    con = duckdb.connect()
    return con.execute(
        f"SELECT doc_id, text FROM read_parquet('{SF_DIR}/documents.parquet')"
        " ORDER BY doc_id"
    ).fetchall()


def _embeddings():
    con = duckdb.connect()
    return con.execute(
        f"SELECT vec_id, embedding, label FROM"
        f" read_parquet('{SF_DIR}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()


# --- reference port: embedding_utils.py:220-238 ---------------------------


def get_text_for_embedding(doc_data):
    parts = [
        doc_data.get("problem", ""),
        doc_data.get("solution", ""),
        doc_data.get("context", ""),
    ]
    return "\n".join(filter(None, parts)).strip()


def _lesson_fixture(doc_id, text):
    """The query's deterministic lesson dict for one doc."""
    data = {}
    if doc_id % 7 == 0:
        data["problem"] = ""
    elif doc_id % 13 == 6:
        data["problem"] = " "
    else:
        data["problem"] = "P: " + text[:30]
    if doc_id % 11 != 3:
        data["solution"] = "S: " + text[30:60]
    if doc_id % 5 == 2:
        data["context"] = None  # present-but-None → dropped by filter
    elif doc_id % 3 != 0:
        data["context"] = f"C: {doc_id}"
    return data


def test_embedding_text_assembly_matches_reference_port(spark):
    got = {
        r["doc_id"]: r["embed_text"]
        for r in QUERIES["embedding_text_assembly"].fn(spark, SF_DIR).collect()
    }
    for doc_id, text in _docs():
        expected = get_text_for_embedding(_lesson_fixture(doc_id, text))
        assert got[doc_id] == expected, (doc_id, got[doc_id], expected)


# --- reference port: vector_utils.py:10-76 --------------------------------


def _floor4(x):
    return math.floor(float(x) * 10000 + 1e-6) / 10000


def truncate_vector_for_display(vector, max_items=3, precision=4):
    if vector is None:
        return "None"
    if not vector:
        return "[]"
    formatted_items = [f"{_floor4(x):.{precision}f}" for x in vector[:max_items]]
    remaining = len(vector) - max_items
    if remaining > 0:
        return f"[{', '.join(formatted_items)}, ... +{remaining} more]"
    return f"[{', '.join(formatted_items)}]"


def format_embedding_for_debug(embedding_data, max_vector_items=3, precision=4):
    if embedding_data is None:
        return "None"
    result = {}
    for key, value in embedding_data.items():
        if key != "embedding":
            result[key] = value
    if "embedding" in embedding_data:
        result["embedding"] = truncate_vector_for_display(
            embedding_data["embedding"],
            max_items=max_vector_items,
            precision=precision,
        )
    return str(result)


def test_vector_debug_display_matches_reference_port(spark):
    rows = {
        r["vec_id"]: r
        for r in QUERIES["vector_debug_display"].fn(spark, SF_DIR).collect()
    }
    branch_counts = {"none": 0, "empty": 0, "short": 0, "full": 0}
    for vec_id, embedding, label in _embeddings():
        if vec_id % 17 == 5:
            vec, branch = None, "none"
        elif vec_id % 19 == 7:
            vec, branch = [], "empty"
        elif vec_id % 23 == 9:
            vec, branch = embedding[:2], "short"
        else:
            vec, branch = embedding, "full"
        branch_counts[branch] += 1
        disp = truncate_vector_for_display(vec)
        debug = format_embedding_for_debug(
            {"vec_id": vec_id, "label": label, "embedding": vec}
        )
        r = rows[vec_id]
        assert r["vec_display"] == disp, (vec_id, r["vec_display"], disp)
        assert r["debug_str"] == debug, (vec_id, r["debug_str"], debug)
    # the fixture must actually exercise every reference branch
    assert all(branch_counts.values()), branch_counts
