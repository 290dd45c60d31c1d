"""Table-quality metrics (A5) + confidence gate (P2)."""

from pyspark.sql import functions as F

from pdf_extractor_spark.operators.quality import accepted_tables, with_table_quality
from pdf_extractor_spark.schema import FLAT_SCHEMA


def _el(doc, offset, headers, rows):
    return (
        doc, "table", "t", "", offset, 1, 0, 1, [], "sid",
        headers, rows, False, None, None, None,
    )


def test_quality_metrics_values(spark):
    elements = spark.createDataFrame(
        [
            # perfect table: all cells filled, consistent widths
            _el("d", 0, ["A", "B"], [["1", "2"], ["3", "4"]]),
            # half-empty cells, consistent
            _el("d", 1, ["A", "B"], [["1", ""], ["", "4"]]),
            # inconsistent row width
            _el("d", 2, ["A", "B"], [["1", "2"], ["3"]]),
            # empty table
            _el("d", 3, ["A", "B"], []),
        ],
        schema=FLAT_SCHEMA,
    )
    q = {r["offset"]: r for r in with_table_quality(elements).collect()}
    assert q[0]["completeness"] == 1.0 and q[0]["consistency"] == 1.0
    assert q[0]["confidence"] == 100.0
    assert q[1]["completeness"] == 0.5 and q[1]["confidence"] == 75.0
    assert q[2]["consistency"] == 0.0
    assert q[2]["confidence"] == round(100 * (0.5 * 1.0 + 0.2), 2)  # 70.0
    assert q[3]["confidence"] == 0.0

    accepted = {r["offset"] for r in accepted_tables(elements).collect()}
    assert accepted == {0, 1}  # >= 75.0 gate (config.py:37)


def test_quality_plan_is_pure_catalyst(spark):
    elements = spark.createDataFrame(
        [_el("d", 0, ["A"], [["x"]])], schema=FLAT_SCHEMA
    )
    plan = (
        with_table_quality(elements)._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan and "InPandas" not in plan
