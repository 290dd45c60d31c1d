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
from .base import floor_round, load
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


# ---------------------------------------------------------------------------
# Rank-biased overlap between the BM25 and embedding rankings
# (R4-143): RBO (Webber 2010, truncated prefix form) for the SAME
# fixed query the RRF fusion serves — the principled "how much do the
# two retrieval tiers agree" scalar that explains WHEN hybrid fusion
# helps (low RBO = complementary evidence = fusion wins; high RBO =
# redundant tiers). Both top-K lists are TakeOrdered cuts on their
# already-graded score grids; the depth dimension (1..K) is a
# broadcast spine; overlap-at-depth is an exact BIGINT count and the
# weighted sum accumulates per-depth terms floored to 1e-9 — no float
# summation. Output also carries plain overlap@K for the casual read.
# ---------------------------------------------------------------------------

RBO_K = 20
RBO_P = 0.9


def rbo_lexical_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .similarity import QUERY_VEC_ID, _as_double, _cosine
    from .textstats import bm25_scores

    docs = load(spark, sf_dir, "documents")
    lex = (
        bm25_scores(docs)
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(RBO_K)
        .withColumn(
            "r_lex",
            F.row_number().over(
                Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
            ),
        )
        .select("doc_id", "r_lex")
    )
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("e")
    )
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("e").alias("qe")
    )
    cos = _cosine(F.col("e"), F.col("qe"))
    sem = (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            (F.floor(cos * 10000 + 1e-6) / 10000).alias("cos4"),
        )
        .orderBy(F.desc("cos4"), F.asc("doc_id"))
        .limit(RBO_K)
        .withColumn(
            "r_sem",
            F.row_number().over(
                Window.orderBy(F.desc("cos4"), F.asc("doc_id"))
            ),
        )
        .select("doc_id", "r_sem")
    )
    depths = spark.range(1, RBO_K + 1).select(
        F.col("id").cast("long").alias("d")
    )
    both = lex.join(sem, "doc_id", "inner").select("doc_id", "r_lex", "r_sem")
    at_depth = (
        depths.join(
            both,
            (F.col("r_lex") <= F.col("d")) & (F.col("r_sem") <= F.col("d")),
            "left",
        )
        .groupBy("d")
        .agg(F.count("doc_id").cast("long").alias("agree"))
    )
    term = F.floor(
        F.pow(F.lit(RBO_P), (F.col("d") - 1).cast("double"))
        * F.col("agree").cast("double")
        / F.col("d").cast("double")
        * 1000000000
        + 1e-6
    ).cast("long")
    agg = at_depth.agg(
        F.sum(term).cast("long").alias("rbo_q"),
        F.max(F.when(F.col("d") == RBO_K, F.col("agree"))).alias(
            "overlap_at_k"
        ),
    )
    return agg.select(
        F.lit(RBO_K).cast("long").alias("k"),
        F.col("overlap_at_k").cast("long").alias("overlap_at_k"),
        floor_round(
            F.col("overlap_at_k").cast("double") / F.lit(float(RBO_K)), 6
        ).alias("jaccard_at_k"),
        floor_round(
            F.lit(1.0 - RBO_P) * (F.col("rbo_q").cast("double") / 1.0e9),
            6,
        ).alias("rbo_truncated"),
    )


def _rbo_sql() -> str:
    from .similarity import QUERY_VEC_ID, _cosine_sql
    from .textstats import BM25_SCORES_CTE

    return f"""
WITH {BM25_SCORES_CTE},
lex AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS r_lex
  FROM (SELECT doc_id, bm25 FROM bm25_scored
        ORDER BY bm25 DESC, doc_id ASC LIMIT {RBO_K})
),
qv AS (SELECT embedding AS q_embedding FROM embeddings
       WHERE vec_id = {QUERY_VEC_ID}),
semscore AS (
  SELECT vec_id AS doc_id,
         floor(({_cosine_sql('embedding', 'q_embedding')}) * 10000
               + 1e-6) / 10000 AS cos4
  FROM embeddings, qv WHERE vec_id != {QUERY_VEC_ID}
),
sem AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY cos4 DESC, doc_id ASC) AS r_sem
  FROM (SELECT doc_id, cos4 FROM semscore
        ORDER BY cos4 DESC, doc_id ASC LIMIT {RBO_K})
),
inboth AS (
  SELECT l.doc_id, l.r_lex, s.r_sem FROM lex l JOIN sem s USING (doc_id)
),
depths AS (SELECT unnest(generate_series(1, {RBO_K})) AS d),
at_depth AS (
  SELECT dd.d, CAST(count(b.doc_id) AS BIGINT) AS agree
  FROM depths dd
  LEFT JOIN inboth b ON b.r_lex <= dd.d AND b.r_sem <= dd.d
  GROUP BY 1
),
agg AS (
  SELECT CAST(sum(CAST(floor(pow({RBO_P}, CAST(d - 1 AS DOUBLE))
                             * CAST(agree AS DOUBLE) / CAST(d AS DOUBLE)
                             * 1000000000 + 1e-6) AS BIGINT)) AS BIGINT)
           AS rbo_q,
         max(CASE WHEN d = {RBO_K} THEN agree END) AS overlap_at_k
  FROM at_depth
)
SELECT CAST({RBO_K} AS BIGINT) AS k,
       CAST(overlap_at_k AS BIGINT) AS overlap_at_k,
       CAST(floor(CAST(overlap_at_k AS DOUBLE) / {float(RBO_K)!r}
                  * 1000000 + 1e-6) / 1000000 AS DOUBLE) AS jaccard_at_k,
       CAST(floor({1.0 - RBO_P!r} * (CAST(rbo_q AS DOUBLE) / 1e9)
                  * 1000000 + 1e-6) / 1000000 AS DOUBLE) AS rbo_truncated
FROM agg
"""


RBO_SQL = _rbo_sql()
