"""Graded fixture for the task dependency-graph scheduler (reference
``llm_integration/utils/dependency_graph.py:47-141`` — see
operators/taskgraph.py for the operator and the semantics table).

The task batch is derived deterministically from the events table: the
first 120 events in id order become tasks; ``props.k`` drives the
method (k%3==0 → sequential) and the explicit dependencies (k%5==0 →
depends on the task two back, k%7==0 → three back), so the fixture
exercises explicit chains, the implicit-sequential rule, multi-parent
tasks, and dependent fan-out at once."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import load

TASK_BATCH = 120
TASK_MAX_DEPTH = 20  # reference DEFAULT_MAX_DEPTH


def _tasks_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load(spark, sf_dir, "events")
        .select("event_id", "props")
        .where(F.col("event_id") < TASK_BATCH)
    )
    k = F.get_json_object("props", "$.k").cast("int")
    d2 = F.when(
        (k % 5 == 0) & (F.col("event_id") >= 2),
        F.concat(F.lit("T"), (F.col("event_id") - 2).cast("string")),
    )
    d3 = F.when(
        (k % 7 == 0) & (F.col("event_id") >= 3),
        F.concat(F.lit("T"), (F.col("event_id") - 3).cast("string")),
    )
    return ev.select(
        F.concat(F.lit("T"), F.col("event_id").cast("string")).alias(
            "task_id"
        ),
        F.col("event_id").alias("seq"),
        F.when(k % 3 == 0, F.lit("sequential"))
        .otherwise(F.lit("concurrent"))
        .alias("method"),
        F.array_compact(F.array(d2, d3)).alias("deps"),
    )


def task_dependency_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.taskgraph import build_dependency_graph

    out = build_dependency_graph(
        _tasks_df(spark, sf_dir), max_depth=TASK_MAX_DEPTH
    )
    return out.orderBy("task_id")


_TASK_K = "CAST(json_extract(props, '$.k') AS INTEGER)"

TASK_DEPENDENCY_SQL = f"""
WITH RECURSIVE tasks AS (
  SELECT 'T' || event_id AS task_id,
         event_id AS seq,
         CASE WHEN {_TASK_K} % 3 = 0 THEN 'sequential'
              ELSE 'concurrent' END AS method,
         list_filter([
           CASE WHEN {_TASK_K} % 5 = 0 AND event_id >= 2
                THEN 'T' || (event_id - 2) END,
           CASE WHEN {_TASK_K} % 7 = 0 AND event_id >= 3
                THEN 'T' || (event_id - 3) END
         ], x -> x IS NOT NULL) AS deps
  FROM events WHERE event_id < {TASK_BATCH}
), ids AS (
  SELECT task_id FROM tasks
), expl AS (
  SELECT task_id, unnest(deps) AS dep FROM tasks
), in_batch AS (
  SELECT e.task_id, e.dep FROM expl e JOIN ids i ON i.task_id = e.dep
), implicit AS (
  SELECT task_id, dep FROM (
    SELECT task_id, method, len(deps) AS n_expl,
           lag(task_id) OVER (ORDER BY seq) AS dep
    FROM tasks
  ) WHERE lower(method) = 'sequential' AND n_expl = 0 AND dep IS NOT NULL
), dep_edges AS (
  SELECT task_id, dep FROM in_batch
  UNION ALL
  SELECT task_id, dep FROM implicit
), ndep AS (
  SELECT dep AS task_id, count(*) AS n_dependents FROM dep_edges GROUP BY dep
), indeg AS (
  SELECT t.task_id, t.method,
         len(t.deps) + (CASE WHEN i.task_id IS NULL THEN 0 ELSE 1 END)
           AS in_degree
  FROM tasks t LEFT JOIN implicit i ON i.task_id = t.task_id
), walk AS (
  SELECT task_id AS root, task_id AS cur, 0 AS d FROM tasks
  UNION ALL
  SELECT w.root, b.dep, w.d + 1 FROM walk w
  JOIN in_batch b ON b.task_id = w.cur
), depth AS (
  SELECT root AS task_id, max(d) AS depth FROM walk GROUP BY root
)
SELECT i.task_id, i.method,
       CAST(i.in_degree AS INTEGER) AS in_degree,
       CAST(coalesce(n.n_dependents, 0) AS INTEGER) AS n_dependents,
       CAST(d.depth AS INTEGER) AS depth
FROM indeg i
LEFT JOIN ndep n USING (task_id)
JOIN depth d USING (task_id)
ORDER BY task_id
"""
