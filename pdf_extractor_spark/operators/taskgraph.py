"""Task dependency-graph scheduler metadata — the reference's
``llm_integration/utils/dependency_graph.py:47-141``
``build_dependency_graph``: given a batch of tasks with explicit
dependencies and an "implicit sequential" rule, compute per task the
scheduler's in-degree, the dependent count, and the longest explicit
dependency chain, raising like the reference when a chain exceeds
``max_depth``.

Reference semantics carried exactly (verified against the module's own
__main__ test matrix in tests/test_taskgraph.py):

* in_degree counts EVERY explicit dependency, present in the batch or
  not (dependency_graph.py:76 — the "ignore_missing_dep" case keeps
  in_degree 1 while the missing id contributes no dependent edge);
* a task with ``method='sequential'`` and NO explicit dependencies
  gains an implicit dependency on the PREVIOUS task in batch order
  (:87-96) — +1 in-degree, previous task gains a dependent;
* depth is the longest chain through explicit, in-batch dependencies
  only (:98-126) — implicit sequential edges never count toward depth;
* depth > max_depth raises ValueError (:132-138). Divergence
  (disclosed): on a CYCLIC input the reference's visited-set recursion
  returns the cycle length; this operator's fixpoint iteration cannot
  converge and raises ValueError instead — a cycle in a dependency
  batch is an error either way.

Scale shape: task batches are bounded by construction (the reference
takes an in-memory list), so the lag() window over batch order is a
deliberate single-partition window on a small frame; everything else —
the dependency explode, the in-batch semi join, the dependent count,
and each depth-propagation step — is keyed shuffles that scale with
batch size. The depth loop localCheckpoints per iteration so plans do
not grow, mirrors of dedup.connected_components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_MAX_DEPTH = 20  # dependency_graph.py:45


def build_dependency_graph(
    tasks: DataFrame, max_depth: int = DEFAULT_MAX_DEPTH
) -> DataFrame:
    """Input columns: ``task_id`` string, ``seq`` (batch order, any
    sortable type), ``method`` string, ``deps`` array<string> (NULL ≡
    empty). Output: one row per task with ``in_degree``,
    ``n_dependents``, ``depth``."""
    base = tasks.select(
        "task_id",
        "seq",
        "method",
        F.coalesce("deps", F.array().cast("array<string>")).alias("deps"),
    ).localCheckpoint()

    ids = base.select("task_id")
    expl = base.select("task_id", F.explode("deps").alias("dep"))
    # dependent edges require the dependency to exist in the batch
    # (dependency_graph.py:78-81 logs and skips missing ids)
    in_batch = expl.join(
        ids.withColumnRenamed("task_id", "dep"), "dep", "left_semi"
    )

    # implicit sequential edge: no explicit deps, method sequential,
    # not the first task — depends on the previous task in batch order
    w = Window.orderBy("seq")
    implicit = (
        base.select(
            "task_id",
            "method",
            F.size("deps").alias("n_expl"),
            F.lag("task_id").over(w).alias("dep"),
        )
        .where(
            (F.lower("method") == "sequential")
            & (F.col("n_expl") == 0)
            & F.col("dep").isNotNull()
        )
        .select("task_id", "dep")
    )

    dep_edges = in_batch.unionByName(implicit)
    n_dependents = dep_edges.groupBy("dep").agg(
        F.count("*").alias("n_dependents")
    )
    in_deg = base.select(
        "task_id",
        "method",
        F.size("deps").alias("n_expl"),
    ).join(
        implicit.select("task_id", F.lit(1).alias("imp")), "task_id", "left"
    ).select(
        "task_id",
        "method",
        (F.col("n_expl") + F.coalesce("imp", F.lit(0))).alias("in_degree"),
    )

    # longest explicit in-batch chain, by fixpoint iteration:
    # depth(t) = 1 + max(depth(dep)); roots 0. A chain of length d
    # converges after d steps, so non-convergence within max_depth + 1
    # steps means some chain exceeds max_depth (or a cycle) — raise,
    # never return a partial fixpoint.
    edges = in_batch.localCheckpoint()
    cur = ids.select("task_id", F.lit(0).alias("depth")).localCheckpoint()
    converged = False
    for _ in range(max_depth + 2):
        stepped = (
            edges.join(
                cur.select(
                    F.col("task_id").alias("dep"),
                    F.col("depth").alias("dep_depth"),
                ),
                "dep",
            )
            .groupBy("task_id")
            .agg((F.max("dep_depth") + F.lit(1)).alias("depth"))
        )
        new = (
            ids.join(stepped, "task_id", "left")
            .select(
                "task_id", F.coalesce("depth", F.lit(0)).alias("depth")
            )
            .localCheckpoint()
        )
        changed = (
            new.join(
                cur.withColumnRenamed("depth", "old"), "task_id"
            )
            .where(F.col("depth") != F.col("old"))
            .limit(1)
            .count()
        )
        cur = new
        if changed == 0:
            converged = True
            break
    if not converged:
        raise ValueError(
            f"Dependency chain exceeds maximum allowed depth of "
            f"{max_depth} (or the batch contains a cycle)."
        )
    over = cur.where(F.col("depth") > max_depth).limit(1).count()
    if over:
        raise ValueError(
            f"Dependency chain exceeds maximum allowed depth of {max_depth}."
        )

    return (
        in_deg.join(n_dependents.withColumnRenamed("dep", "task_id"),
                    "task_id", "left")
        .join(cur, "task_id")
        .select(
            "task_id",
            "method",
            "in_degree",
            F.coalesce("n_dependents", F.lit(0)).cast("int").alias(
                "n_dependents"
            ),
            "depth",
        )
    )
