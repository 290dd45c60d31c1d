"""Similarity search over the ``embeddings`` table (array<float>, 64-d).

Training-pipeline ANN suite: brute-force cosine top-k as the exactness
baseline, random-hyperplane LSH bucketing as the scale path, and an
embedding-cosine near-dup pair join.

Scale shape: brute-force is a broadcast of the (tiny) query side
against a full scan — embarrassingly parallel, no shuffle. LSH
bucketing reduces the scanned fraction to ~1/2^planes per query; the
bucket id is computed scan-side so the only data movement is the
pruned candidate set. At 100 TB the bucketed variant is the one that
survives; both produce their top-k through TakeOrderedAndProject
(no global sort).

Portability: dot products are evaluated in array order with explicit
float→double casts on both engines; scores are floor-rounded to 4
decimals before ranking so Spark and DuckDB rank identical values.
Hyperplanes are sin-derived (deterministic, identical in both engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

import math

from .base import DUP_ID_OFFSET, N_INJECTED_DUPS, load
from .base import floor_round

DIMS = 64
QUERY_VEC_ID = 0
TOP_K = 10
LSH_PLANES = 8
NEARDUP_MAX_ID = 300
NEARDUP_THRESHOLD = 0.7
def _as_double(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def _floor4(col: Column) -> Column:
    return floor_round(col, 4)


_DOT_SQL = (
    "list_sum(list_transform(generate_series(1, {d}), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)


def _dot_sql(a: str, b: str) -> str:
    return _DOT_SQL.format(a=a, b=b, d=DIMS)


def _cosine_sql(a: str, b: str) -> str:
    return (
        f"{_dot_sql(a, b)} / (sqrt({_dot_sql(a, a)}) * sqrt({_dot_sql(b, b)}))"
    )


# ---------------------------------------------------------------------------
# brute-force cosine top-k (exactness baseline)
# ---------------------------------------------------------------------------


def cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("q_embedding")
    )
    joined = emb.crossJoin(F.broadcast(query))
    cos = _cosine(_as_double(F.col("embedding")), _as_double(F.col("q_embedding")))
    return (
        joined.filter(F.col("vec_id") != QUERY_VEC_ID)
        .select("vec_id", _floor4(cos).alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(TOP_K)
    )


COSINE_TOPK_SQL = f"""
WITH q AS (SELECT embedding AS q_embedding FROM embeddings WHERE vec_id = {QUERY_VEC_ID})
SELECT vec_id,
       CAST(floor(({_cosine_sql('embedding', 'q_embedding')}) * 10000) / 10000 AS DOUBLE) AS cos
FROM embeddings CROSS JOIN q
WHERE vec_id != {QUERY_VEC_ID}
ORDER BY cos DESC, vec_id ASC
LIMIT {TOP_K}
"""


# ---------------------------------------------------------------------------
# embedding-cosine near-dup pairs (with injected exact dups)
# ---------------------------------------------------------------------------


def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < NEARDUP_MAX_ID
    ).select("vec_id", "embedding")
    dups = emb.filter(F.col("vec_id") < N_INJECTED_DUPS).select(
        (F.col("vec_id") + DUP_ID_OFFSET).alias("vec_id"), "embedding"
    )
    pool = emb.unionByName(dups)
    a, b = pool.alias("a"), pool.alias("b")
    cos = _cosine(_as_double(F.col("a.embedding")), _as_double(F.col("b.embedding")))
    pairs = a.join(b, F.col("a.vec_id") < F.col("b.vec_id")).select(
        F.col("a.vec_id").alias("a_id"),
        F.col("b.vec_id").alias("b_id"),
        _floor4(cos).alias("cos"),
    )
    return pairs.filter(F.col("cos") >= NEARDUP_THRESHOLD)


EMBEDDING_NEARDUP_SQL = f"""
WITH pool AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id < {NEARDUP_MAX_ID}
  UNION ALL
  SELECT vec_id + {DUP_ID_OFFSET} AS vec_id, embedding
  FROM embeddings WHERE vec_id < {N_INJECTED_DUPS}
)
SELECT a_id, b_id, cos FROM (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         CAST(floor(({_cosine_sql('a.embedding', 'b.embedding')}) * 10000) / 10000 AS DOUBLE) AS cos
  FROM pool a JOIN pool b ON a.vec_id < b.vec_id
)
WHERE cos >= {NEARDUP_THRESHOLD}
"""


# ---------------------------------------------------------------------------
# random-hyperplane LSH bucketing → bucketed ANN top-k (scale path)
# ---------------------------------------------------------------------------


def _bucket_expr_spark(emb_col: Column) -> Column:
    """sign-bit bucket id from sin-derived hyperplanes (deterministic)."""
    total = None
    for j in range(LSH_PLANES):
        plane = F.array(*[F.lit(math.sin((j + 1) * (i + 1))) for i in range(DIMS)])
        bit = F.when(_dot(_as_double(emb_col), plane) >= 0, F.lit(2**j)).otherwise(F.lit(0))
        total = bit if total is None else total + bit
    return total.cast("long")


def lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", _bucket_expr_spark(F.col("embedding")).alias("bucket")
    )
    query = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("q_embedding"), F.col("bucket").alias("q_bucket")
    )
    cand = emb.join(
        F.broadcast(query), F.col("bucket") == F.col("q_bucket")
    ).filter(F.col("vec_id") != QUERY_VEC_ID)
    cos = _cosine(_as_double(F.col("embedding")), _as_double(F.col("q_embedding")))
    return (
        cand.select("vec_id", "bucket", _floor4(cos).alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(TOP_K)
    )


def _bucket_sql(emb: str) -> str:
    terms = []
    for j in range(LSH_PLANES):
        plane = ", ".join(f"{math.sin((j + 1) * (i + 1))!r}" for i in range(DIMS))
        dot = (
            f"list_sum(list_transform(generate_series(1, {DIMS}), "
            f"i -> CAST({emb}[i] AS DOUBLE) * ([{plane}])[i]))"
        )
        terms.append(f"(CASE WHEN {dot} >= 0 THEN {2**j} ELSE 0 END)")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


LSH_ANN_TOPK_SQL = f"""
WITH b AS (
  SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bucket FROM embeddings
),
q AS (
  SELECT embedding AS q_embedding, bucket AS q_bucket FROM b WHERE vec_id = {QUERY_VEC_ID}
)
SELECT vec_id, bucket,
       CAST(floor(({_cosine_sql('embedding', 'q_embedding')}) * 10000) / 10000 AS DOUBLE) AS cos
FROM b JOIN q ON b.bucket = q.q_bucket
WHERE vec_id != {QUERY_VEC_ID}
ORDER BY cos DESC, vec_id ASC
LIMIT {TOP_K}
"""


# ---------------------------------------------------------------------------
# IVF-style partition-probe ANN (scale path #2): embeddings carry a
# cluster assignment (label); search only the query's cluster. At
# 100 TB the table is physically partitioned by label so the probe
# prunes partitions at the scan (partition pruning, not a filter).
# ---------------------------------------------------------------------------


def ivf_label_probe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("q_embedding"), F.col("label").alias("q_label")
    )
    cand = emb.join(F.broadcast(query), F.col("label") == F.col("q_label")).filter(
        F.col("vec_id") != QUERY_VEC_ID
    )
    cos = _cosine(_as_double(F.col("embedding")), _as_double(F.col("q_embedding")))
    return (
        cand.select("vec_id", "label", _floor4(cos).alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(TOP_K)
    )


IVF_LABEL_PROBE_SQL = f"""
WITH q AS (
  SELECT embedding AS q_embedding, label AS q_label
  FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
)
SELECT vec_id, label,
       CAST(floor(({_cosine_sql('embedding', 'q_embedding')}) * 10000) / 10000 AS DOUBLE) AS cos
FROM embeddings JOIN q ON label = q_label
WHERE vec_id != {QUERY_VEC_ID}
ORDER BY cos DESC, vec_id ASC
LIMIT {TOP_K}
"""
