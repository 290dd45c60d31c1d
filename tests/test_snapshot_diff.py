"""Unit oracle for snapshot_diff (reference validation_utils.py:65-129
compare_results generalized to corpus-snapshot scale): full pure-Python
recompute of the derived perturbation + full-outer diff on the real
sf0.001 corpus, independent of both Spark and DuckDB."""

import hashlib

SF_DIR = "/root/testdata/sf0.001"


def _md5(s):
    return hashlib.md5(s.encode()).hexdigest()


def _rows(spark):
    return [
        r.asDict()
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    ]


def test_snapshot_diff_recompute(spark):
    from pdf_extractor_spark.analytics.validation import (
        SNAP_ADD_OFFSET,
        snapshot_diff,
    )

    rows = _rows(spark)
    expected = {
        r["doc_id"]: {
            "lang": r["lang"],
            "n_chars": int(r["n_chars"]),
            "source": r["source"],
            "text_md5": _md5(r["text"]),
        }
        for r in rows
    }
    actual = {}
    for r in rows:
        d = _md5(str(r["doc_id"]))[0]
        if d != "0":
            actual[r["doc_id"]] = {
                "lang": "xx" if d == "1" else r["lang"],
                "n_chars": int(r["n_chars"]) + (9 if d == "2" else 0),
                "source": r["source"],
                "text_md5": _md5(
                    r["text"] + " [edited]" if d == "2" else r["text"]
                ),
            }
        if d == "3":
            actual[r["doc_id"] + SNAP_ADD_OFFSET] = {
                "lang": r["lang"],
                "n_chars": int(r["n_chars"]),
                "source": "snapshot",
                "text_md5": _md5(r["text"]),
            }

    want = {}
    for k in set(expected) | set(actual):
        if k not in expected:
            want[k] = ("added", [])
        elif k not in actual:
            want[k] = ("removed", [])
        else:
            fields = [
                f
                for f in ["lang", "n_chars", "source", "text_md5"]
                if expected[k][f] != actual[k][f]
            ]
            if fields:
                want[k] = ("changed", fields)

    got = {
        r["doc_id"]: (r["status"], list(r["changed_fields"]))
        for r in snapshot_diff(spark, SF_DIR).collect()
    }
    assert got == want
    # the corpus must exercise every diff class
    statuses = {s for s, _ in want.values()}
    assert statuses == {"added", "removed", "changed"}
    # and both single- and multi-field changes
    n_fields = {len(f) for s, f in want.values() if s == "changed"}
    assert 1 in n_fields and 2 in n_fields


def test_snapshot_diff_plan_shape(spark):
    """One full-outer join on the key; no explode, no Python in the
    plan, no nested-loop/cartesian fallback."""
    from pdf_extractor_spark.analytics.validation import snapshot_diff

    plan = snapshot_diff(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "FullOuter" in plan
    for bad in ("BatchEvalPython", "CartesianProduct", "BroadcastNestedLoop",
                "Generate"):
        assert bad not in plan, bad
