"""build_dependency_graph vs the reference's own verification matrix
(dependency_graph.py __main__, :176-270 — the seven cases reproduced
with the same expected in-degrees/dependents, plus the depth-check
failure)."""

import pytest
from pyspark.sql import functions as F  # noqa: F401

from pdf_extractor_spark.operators.taskgraph import build_dependency_graph

SCHEMA = "task_id string, seq int, method string, deps array<string>"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _out(spark, rows, **kw):
    got = build_dependency_graph(_df(spark, rows), **kw).collect()
    return {
        r["task_id"]: (r["in_degree"], r["n_dependents"], r["depth"])
        for r in got
    }


def test_simple_concurrent(spark):
    out = _out(spark, [("T0", 0, "concurrent", []),
                       ("T1", 1, "concurrent", [])])
    assert out == {"T0": (0, 0, 0), "T1": (0, 0, 0)}


def test_simple_explicit_seq(spark):
    out = _out(spark, [("T0", 0, "concurrent", []),
                       ("T1", 1, "sequential", ["T0"])])
    assert out == {"T0": (0, 1, 0), "T1": (1, 0, 1)}


def test_simple_implicit_seq(spark):
    out = _out(spark, [("T0", 0, "concurrent", []),
                       ("T1", 1, "sequential", [])])
    # implicit edge T0 -> T1: in-degree 1, T0 gains a dependent,
    # but depth stays 0 (implicit edges never count toward depth)
    assert out == {"T0": (0, 1, 0), "T1": (1, 0, 0)}


def test_mixed_explicit_implicit(spark):
    out = _out(
        spark,
        [
            ("T0", 0, "concurrent", []),
            ("T1", 1, "concurrent", ["T0"]),
            ("T2", 2, "sequential", []),
            ("T3", 3, "concurrent", ["T0"]),
            ("T4", 4, "sequential", []),
        ],
    )
    assert out == {
        "T0": (0, 2, 0),
        "T1": (1, 1, 1),
        "T2": (1, 0, 0),
        "T3": (1, 1, 1),
        "T4": (1, 0, 0),
    }


def test_depth_check_pass_and_fail(spark):
    rows = [
        ("T0", 0, "concurrent", []),
        ("T1", 1, "concurrent", ["T0"]),
        ("T2", 2, "concurrent", ["T1"]),
    ]
    out = _out(spark, rows, max_depth=5)
    assert out == {"T0": (0, 1, 0), "T1": (1, 1, 1), "T2": (1, 0, 2)}
    with pytest.raises(ValueError, match="maximum allowed depth"):
        _out(spark, rows, max_depth=1)


def test_ignore_missing_dep(spark):
    # in_degree counts the missing explicit dep; nobody gains a
    # dependent from it (dependency_graph.py:76-81)
    out = _out(spark, [("T0", 0, "concurrent", []),
                       ("T1", 1, "concurrent", ["T_MISSING"])])
    assert out == {"T0": (0, 0, 0), "T1": (1, 0, 0)}


def test_implicit_does_not_stack_on_explicit(spark):
    out = _out(spark, [("T0", 0, "concurrent", []),
                       ("T1", 1, "sequential", ["T0"])])
    assert out["T1"][0] == 1  # stays 1 — implicit only when no explicit


def test_cycle_raises(spark):
    # disclosed divergence: the reference's visited-set recursion
    # returns the cycle length; the fixpoint iteration raises instead
    with pytest.raises(ValueError):
        _out(
            spark,
            [("T0", 0, "concurrent", ["T1"]), ("T1", 1, "concurrent", ["T0"])],
            max_depth=3,
        )


def test_null_deps_column(spark):
    out = _out(spark, [("T0", 0, "sequential", None),
                       ("T1", 1, "sequential", None)])
    # NULL deps ≡ no explicit deps: T1 gains the implicit edge
    assert out == {"T0": (0, 1, 0), "T1": (1, 0, 0)}


def test_retry_cascade_matches_reference_loop(spark):
    """Row-by-row equality between the set-oriented cascade profile and
    a literal pure-Python transcription of the reference's retry loop
    (retry_llm_call.py:75-188): attempt until validators pass, 2
    feedback messages per failed-but-extractable attempt, call-failure
    branch skips feedback, exhaustion carries the last attempt's
    formatted errors."""
    from pdf_extractor_spark.analytics.taskflow import (
        RETRY_MAX_ATTEMPTS,
        RETRY_MIN_LEN,
        retry_validation_cascade,
    )

    sf_dir = "/root/testdata/sf0.001"
    out = {
        r["task_id"]: r
        for r in retry_validation_cascade(spark, sf_dir).collect()
    }
    doc_ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id").collect()
    ]
    assert set(out) == set(doc_ids)

    statuses = set()
    for did in doc_ids:
        # --- literal reference loop ---
        messages = 1  # the initial message list
        win = None
        last_errors = None
        for a in range(1, RETRY_MAX_ATTEMPTS + 1):
            if did % 7 == 3 and a == 1:  # LLM call raised
                last_errors = "LLM call failed: TimeoutError()"
                continue
            content = f"a{a} d{did}"
            if (did + 2 * a) % 5 != 0:
                content += " padding-block"
            if (did + a) % 3 == 0:
                content += " [valid]"
            errs = []
            if "[valid]" not in content:
                errs.append(
                    "Validator 1 (marker_validator): missing [valid] marker"
                )
            if len(content) < RETRY_MIN_LEN:
                errs.append(
                    "Validator 2 (length_validator): "
                    f"response too short: {len(content)}"
                )
            if not errs:
                win = a
                break
            last_errors = "; ".join(errs)
            messages += 2  # assistant echo + user feedback
        row = out[did]
        if win is not None:
            assert (row["status"], row["winning_attempt"], row["retries"],
                    row["last_errors"]) == ("passed", win, win - 1, None)
        else:
            assert (row["status"], row["winning_attempt"], row["retries"],
                    row["last_errors"]) == (
                "exhausted", None, RETRY_MAX_ATTEMPTS, last_errors)
        assert row["n_messages"] == messages
        statuses.add(row["status"])
        if did % 7 == 3:
            statuses.add("call-failure-seen")
    assert {"passed", "exhausted", "call-failure-seen"} <= statuses
