"""Fixed-depth graph traversal by iterated self-join (J5/J6).

Reference: AQL ``FOR v,e,p IN min..max OUTBOUND start GRAPH g``
(arangodb/search_api/graph_traverse.py:72-82) and the multi-source
DISTINCT neighborhood fetch (conversation_context.py:183-195). The
reference never traverses deeper than 3, so the Spark-first shape is
an unrolled iterated hash join on the edge table — no GraphFrames, no
iterative framework, and each hop is one shuffle on the join key
(SURVEY.md §1.4).

At scale: the edge table is the big side; the frontier is small and
shrinks/dedups every hop (``dropDuplicates`` before the next join), so
every hop after the first is effectively a broadcast join — AQE makes
that call at runtime from the actual frontier size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def traverse(
    edges: DataFrame,
    starts: DataFrame,
    min_hops: int = 1,
    max_hops: int = 2,
    direction: str = "outbound",
    edge_types: list[str] | None = None,
) -> DataFrame:
    """Vertices reachable from ``starts`` in min..max hops.

    ``edges``: (src, dst[, type]); ``starts``: (vertex).
    ``edge_types`` filters traversable edges by type (P8 —
    ``FILTER e.type IN [...]``, graph_traverse.py:53-70); the filter is
    applied before the hop joins so it pushes into the edge scan.
    Returns (vertex, hops) with the minimal hop count per vertex,
    excluding the start vertices themselves (matching AQL semantics of
    returning visited v per path depth, deduplicated to min depth).
    """
    if edge_types is not None:
        edges = edges.filter(F.col("type").isin(list(edge_types)))
    if direction == "inbound":
        edges = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    elif direction == "any":
        edges = edges.select("src", "dst").unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    else:
        edges = edges.select("src", "dst")

    frontier = starts.select(F.col("vertex").alias("src")).dropDuplicates()
    seen = frontier.select(F.col("src").alias("vertex")).withColumn(
        "hops", F.lit(0)
    )
    out = None
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(edges, "src")
            .select(F.col("dst").alias("vertex"))
            .dropDuplicates()
        )
        # minimal-depth semantics: drop anything reached earlier
        nxt = nxt.join(seen.select("vertex"), "vertex", "left_anti").withColumn(
            "hops", F.lit(hop)
        )
        seen = seen.unionByName(nxt)
        if hop >= min_hops:
            out = nxt if out is None else out.unionByName(nxt)
        frontier = nxt.select(F.col("vertex").alias("src"))
    return out if out is not None else seen.limit(0)
