"""Hybrid search: BM25 ⊕ semantic candidates fused by RRF (J7).

Faithful re-expression of the reference's two-stage hybrid search
(arangodb/search_api/hybrid.py:37-152): fetch ``INITIAL_K`` candidates
from the lexical scorer and from the vector scorer independently, then
reciprocal-rank-fuse (hybrid.py:154-225) with k=60, a missing side
contributing the worst rank (INITIAL_K + 1), and return TOP_N.

Scale shape: both candidate fetches are top-k
(TakeOrderedAndProject — no global sort); the fusion joins two k-row
sets, so the join is a trivially-broadcast full-outer on tiny inputs
regardless of corpus size. The semantic side joins ``embeddings`` to
``documents`` on id — at 100 TB that's the one real shuffle, bucketed
by doc_id in a production layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import similarity
from .base import load
from .textstats import BM25_SCORES_CTE, bm25_scores

RRF_K = 60        # hybrid.py:40
INITIAL_K = 20    # hybrid.py:41
TOP_N = 5         # hybrid.py:42
QUERY_VEC_ID = 0


def _semantic_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, cos) vs the query vector, for docs that have embeddings
    (embeddings.vec_id ≡ documents.doc_id in the synthetic corpus)."""
    emb = load(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("q_embedding")
    )
    cos = similarity._cosine(
        similarity._as_double(F.col("embedding")),
        similarity._as_double(F.col("q_embedding")),
    )
    return emb.crossJoin(F.broadcast(query)).select(
        F.col("vec_id").alias("doc_id"), similarity._floor4(cos).alias("cos")
    )


def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    # top-k FIRST via orderBy().limit() — plans as TakeOrderedAndProject
    # (parallel partial top-k, no single-reducer global window); the
    # row_number window then runs over only INITIAL_K rows.
    w_b = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    bm25_top = (
        bm25_scores(docs)
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(INITIAL_K)
        .withColumn("r_bm25", F.row_number().over(w_b))
        .select("doc_id", "r_bm25")
    )
    w_s = Window.orderBy(F.desc("cos"), F.asc("doc_id"))
    sem_top = (
        _semantic_scores(spark, sf_dir)
        .orderBy(F.desc("cos"), F.asc("doc_id"))
        .limit(INITIAL_K)
        .withColumn("r_sem", F.row_number().over(w_s))
        .select("doc_id", "r_sem")
    )
    worst = INITIAL_K + 1
    fused = bm25_top.join(sem_top, "doc_id", "full_outer").select(
        "doc_id",
        F.coalesce("r_bm25", F.lit(worst)).alias("r1"),
        F.coalesce("r_sem", F.lit(worst)).alias("r2"),
    )
    rrf = 1.0 / (RRF_K + F.col("r1")) + 1.0 / (RRF_K + F.col("r2"))
    return (
        fused.select(
            "doc_id",
            (F.floor(rrf * 1000000 + 1e-6) / 1000000).cast("double").alias("rrf_score"),
        )
        .orderBy(F.desc("rrf_score"), F.asc("doc_id"))
        .limit(TOP_N)
    )


# CTE form so downstream oracles (agent-decision layer) can reuse the
# fused top-N as `hybrid_result`; HYBRID_RRF_SQL below stays
# value-identical to its pre-refactor form.
HYBRID_RRF_CTE = f"""{BM25_SCORES_CTE},
bm25_top AS (
  SELECT doc_id, r_bm25 FROM (
    SELECT doc_id,
           row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS r_bm25
    FROM bm25_scored
  ) WHERE r_bm25 <= {INITIAL_K}
),
sem_scored AS (
  SELECT e.vec_id AS doc_id,
         CAST(floor(({similarity._cosine_sql('e.embedding', 'q.q_embedding')}) * 10000 + 1e-6) / 10000 AS DOUBLE) AS cos
  FROM embeddings e
  CROSS JOIN (SELECT embedding AS q_embedding FROM embeddings
              WHERE vec_id = {QUERY_VEC_ID}) q
),
sem_top AS (
  SELECT doc_id, r_sem FROM (
    SELECT doc_id,
           row_number() OVER (ORDER BY cos DESC, doc_id ASC) AS r_sem
    FROM sem_scored
  ) WHERE r_sem <= {INITIAL_K}
),
hybrid_result AS (
  SELECT doc_id,
         CAST(floor((1.0 / ({RRF_K} + r1) + 1.0 / ({RRF_K} + r2)) * 1000000 + 1e-6) / 1000000 AS DOUBLE) AS rrf_score
  FROM (
    SELECT coalesce(b.doc_id, s.doc_id) AS doc_id,
           coalesce(b.r_bm25, {INITIAL_K + 1}) AS r1,
           coalesce(s.r_sem, {INITIAL_K + 1}) AS r2
    FROM bm25_top b FULL OUTER JOIN sem_top s ON b.doc_id = s.doc_id
  )
  ORDER BY rrf_score DESC, doc_id ASC
  LIMIT {TOP_N}
)"""

HYBRID_RRF_SQL = f"""
WITH {HYBRID_RRF_CTE}
SELECT doc_id, rrf_score FROM hybrid_result
ORDER BY rrf_score DESC, doc_id ASC
"""
