"""Link-graph algorithms over the document corpus
(training:link-quality) — web-scale pretraining pipelines rank pages
by link structure before sampling (the OpenWebText/CCNet lineage uses
link-derived quality signals), and the reference's graph layer
(`arangodb/relationships.py`, `search_api/graph_traverse.py`) stops at
bounded traversal; PageRank is the canonical iterative companion.

The graded fixture is a deterministic synthetic link graph over the
``documents`` table: every doc emits three out-links —
``(7*doc_id + 1) mod N`` (a bijection, keeps the graph connected),
``(doc_id² + 3) mod N`` (quadratic residues: in-degree 0-4, creates
genuine rank spread) and ``floor(doc_id / 2)`` (2-to-1 onto the low
half: low-id hubs) — DISTINCT-ed, self-loops kept. Contiguous doc_ids
make each map total, so the graph is identical in both engines with no
data exchange beyond the 1-row corpus count. (An earlier all-bijection
fixture was rejected: a 3-regular graph has uniform PageRank ≡ 1/N,
zero test power.)

Semantics: standard damped PageRank, PR_0 = 1/N, K fixed iterations of
``PR(v) = (1-d)/N + d * Σ_{u→v} PR(u)/outdeg(u)``. Every vertex has
outdeg ≥ 1 by construction, so there is no dangling-mass term — the
fixed-point unrolls into plain SQL and the oracle checks every vertex's
score exactly (floored at 8 decimals; the fp divergence of a
differently-ordered double sum is ~1e-18 per iteration, eight orders
below the floor slack).

Scale shape: per iteration ONE shuffle keyed on the edge source (join
ranks→edges) and ONE on dst (the contribution aggregate, map-side
combinable); the edge table and its out-degrees are computed once and
reused. K is a constant (3), so the lineage stays bounded — a
convergence-driven variant would localCheckpoint per iteration exactly
like dedup.connected_components (dedup.py) and pre-partition edges by
src so iterations reuse the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import floor_round, load

PR_DAMPING = 0.85
PR_ITERS = 3
PR_OUT_LINKS = 3


def _edges(docs: DataFrame, n: DataFrame) -> DataFrame:
    """(src, dst) distinct link set; `n` is the 1-row corpus count."""
    src = F.col("src")
    return (
        docs.crossJoin(F.broadcast(n))
        .select(F.col("doc_id").alias("src"), "n")
        .select(
            "src",
            F.explode(
                F.array(
                    (src * 7 + 1) % F.col("n"),
                    (src * src + 3) % F.col("n"),
                    F.floor(src / F.lit(2)).cast("long"),
                )
            ).alias("dst"),
        )
        .distinct()
    )


def pagerank_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id")
    n = docs.agg(F.count("*").alias("n"))
    edges = _edges(docs, n)
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    ranks = docs.crossJoin(F.broadcast(n)).select(
        F.col("doc_id").alias("v"),
        (F.lit(1.0) / F.col("n")).alias("pr"),
    )
    for _ in range(PR_ITERS):
        contribs = (
            edges.join(deg, "src")
            .join(ranks, edges.src == F.col("v"))
            .select("dst", (F.col("pr") / F.col("outdeg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            docs.crossJoin(F.broadcast(n))
            .join(contribs, docs.doc_id == contribs.dst, "left")
            .select(
                F.col("doc_id").alias("v"),
                (
                    F.lit(1.0 - PR_DAMPING) / F.col("n")
                    + F.lit(PR_DAMPING) * F.coalesce("inflow", F.lit(0.0))
                ).alias("pr"),
            )
        )
    return ranks.select(
        F.col("v").alias("doc_id"), floor_round(F.col("pr"), 8).alias("pagerank")
    ).orderBy("doc_id")


def _pr_iter_sql(prev: str, out: str) -> str:
    return f"""{out} AS (
  SELECT d.doc_id AS v,
         {1.0 - PR_DAMPING} / (SELECT n FROM nn)
           + {PR_DAMPING} * coalesce(s.inflow, 0.0) AS pr
  FROM documents d LEFT JOIN (
    SELECT e.dst, sum(p.pr / g.outdeg) AS inflow
    FROM edges e JOIN deg g ON g.src = e.src
                 JOIN {prev} p ON p.v = e.src
    GROUP BY e.dst
  ) s ON s.dst = d.doc_id
)"""


PAGERANK_SQL = f"""
WITH nn AS (SELECT count(*) AS n FROM documents),
edges AS (
  SELECT DISTINCT src, dst FROM (
    SELECT doc_id AS src,
           unnest([(doc_id * 7 + 1) % (SELECT n FROM nn),
                   (doc_id * doc_id + 3) % (SELECT n FROM nn),
                   CAST(floor(doc_id / 2.0) AS BIGINT)]) AS dst
    FROM documents
  )
),
deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
pr0 AS (SELECT doc_id AS v, 1.0 / (SELECT n FROM nn) AS pr FROM documents),
{_pr_iter_sql("pr0", "pr1")},
{_pr_iter_sql("pr1", "pr2")},
{_pr_iter_sql("pr2", "pr3")}
SELECT v AS doc_id,
       floor(pr * 100000000 + 1e-6) / 100000000 AS pagerank
FROM pr3
ORDER BY doc_id
"""
