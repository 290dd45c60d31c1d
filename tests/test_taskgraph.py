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
