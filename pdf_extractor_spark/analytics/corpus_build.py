"""End-to-end corpus-build composition (R4-3).

One registry entry chaining the production curation order over the
``documents`` table:

    Gopher quality gate
      → exact + near-dup survivors (text-collapse + MinHash/LSH)
      → benchmark decontamination (5-gram semi-join)
      → language-mix downsample (rates from the SURVIVING pool)
      → shuffle-shard manifest (the artifact a training job reads)

Every stage reuses the exact kernel its standalone graded query uses
(`quality_rules.gopher_verdicts`, `dedup._survivors_from_pool`,
`curation._grams` / `_salted_hash64` / `TARGET_MIX` / shard constants)
— the units prove the components; this proves the COMPOSITION:
threshold interactions (the gate changes who wins a near-dup
collision; dedup changes the language counts the mix rates are fit
to), survivor ordering, and the final manifest totals, against one
CTE-chain DuckDB oracle.

Scale shape (nothing new beyond the components' own plans):
* gate: map-only expressions;
* survivors: one text hash-agg + the banded equi self-join (bounded by
  DISTINCT colliding texts — dedup.py's skew note applies verbatim);
* decontamination: gram explode → ONE broadcast of the (small)
  benchmark gram set → doc_id distinct + left-anti;
* mix: two tiny aggregates broadcast back (the 1-row crossJoin is the
  whitelisted 1-row-broadcast idiom);
* manifest: map-side-combinable hash-agg over (shard_id, split) —
  16×3 output rows regardless of corpus size.
No CartesianProduct, no window over an unbounded partition, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import load, tokens as _tokens
from .curation import (
    DECON_BENCH_MAX_ID,
    DECON_N,
    N_SHARDS,
    SPLIT_TRAIN_PCT,
    TARGET_MIX,
    _grams,
    _salted_hash64,
)
from .dedup import _survivors_from_pool
from .quality_rules import (
    GOPHER_MAX_MEAN_WL,
    GOPHER_MAX_WORDS,
    GOPHER_MIN_ALPHA_FRAC,
    GOPHER_MIN_MEAN_WL,
    GOPHER_MIN_STOP_HITS,
    GOPHER_MIN_WORDS,
    _STOPLIST_SQL,
    gopher_verdicts,
)


def corpus_build_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus_build_from_docs(spark, load(spark, sf_dir, "documents"))


def corpus_build_from_docs(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """The composition over any (doc_id:long, lang, text) table — the
    graded entry binds it to the documents parquet; the 48× scale
    stress drives the same body over its synthesized corpus."""
    # 1. Gopher gate — map-only rule kernel, text carried through
    kept = (
        gopher_verdicts(docs, "lang", "text")
        .filter(F.col("keep"))
        .select("doc_id", "lang", "text")
    )

    # 2+3. exact + near-dup survivors: _survivors_from_pool collapses
    # byte-identical texts to their min-id representative FIRST (exact
    # dedup), then removes any rep that band-collides with a smaller
    # id (near dedup). Join back restores lang/text for the reps.
    surv = _survivors_from_pool(kept.select("doc_id", "text")).join(kept, "doc_id")

    # 4. decontaminate: benchmark grams come from the RAW corpus
    # (benchmark membership is external — not subject to the quality
    # gate); only the surviving pool pays the gram explode.
    bench = (
        docs.filter(F.col("doc_id") < DECON_BENCH_MAX_ID)
        .select(_tokens().alias("toks"))
        .select(F.explode(_grams(F.col("toks"), DECON_N)).alias("g"))
        .distinct()
    )
    pool = surv.filter(F.col("doc_id") >= DECON_BENCH_MAX_ID)
    hits = (
        pool.select("doc_id", _tokens().alias("toks"))
        .select("doc_id", F.explode(_grams(F.col("toks"), DECON_N)).alias("g"))
        .join(F.broadcast(bench), "g", "left_semi")
        .select("doc_id")
        .distinct()
    )
    clean = pool.join(hits, "doc_id", "left_anti")

    # 5. language-mix downsample — rates fit to the CLEAN pool counts
    # (the composition point: dedup + decon change the marginals)
    tgt = F.broadcast(
        spark.createDataFrame(
            [(lang, share) for lang, share in TARGET_MIX.items()],
            "lang string, share double",
        )
    )
    counts = clean.join(tgt, "lang").groupBy("lang", "share").agg(
        F.count("*").alias("cnt")
    )
    m = counts.agg(F.min(F.col("cnt").cast("double") / F.col("share")).alias("m"))
    rates = counts.crossJoin(F.broadcast(m)).select(
        "lang",
        (F.col("share") * F.col("m") / F.col("cnt").cast("double")).alias("rate"),
    )
    did = F.col("doc_id").cast("string")
    frac = (
        F.conv(F.substring(F.md5(did), 1, 8), 16, 10).cast("double")
        / F.lit(4294967296.0)
    )
    sampled = clean.join(F.broadcast(rates), "lang").where(frac < F.col("rate"))

    # 6. shuffle-shard manifest over the final sample
    shard = (_salted_hash64("shard", did) % N_SHARDS).alias("shard_id")
    pct = _salted_hash64("split", did) % 100
    split = (
        F.when(pct < SPLIT_TRAIN_PCT, "train")
        .when(pct < SPLIT_TRAIN_PCT + 5, "valid")
        .otherwise("test")
        .alias("split")
    )
    return (
        sampled.select(shard, split, F.size(_tokens()).alias("n_tokens"))
        .groupBy("shard_id", "split")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
        .orderBy("shard_id", "split")
    )


def _corpus_build_sql() -> str:
    from .curation import _MIX_VALUES
    from .dedup import _minhash_sql

    gram = f"array_to_string(toks[i:i+{DECON_N - 1}], ' ')"
    gram_series = (
        f"unnest(generate_series(1, greatest(len(toks) - {DECON_N - 1}, 0))) AS u(i)"
    )
    return rf"""
WITH t0 AS (
  SELECT doc_id, lang, text, string_split_regex(text, '\s+') AS toks
  FROM documents
),
gate AS (
  SELECT doc_id, lang, text, toks FROM (
    SELECT *,
           len(toks) AS n_words,
           floor(list_sum(list_transform(toks, t -> len(t))) * 1.0
                 / len(toks) * 10000 + 1e-6) / 10000 AS mwl,
           floor(len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]')))
                 * 1.0 / len(toks) * 10000 + 1e-6) / 10000 AS af,
           len(list_intersect(toks, {_STOPLIST_SQL})) AS s_hits
    FROM t0)
  WHERE n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
    AND mwl BETWEEN {GOPHER_MIN_MEAN_WL} AND {GOPHER_MAX_MEAN_WL}
    AND af >= {GOPHER_MIN_ALPHA_FRAC}
    AND s_hits >= {GOPHER_MIN_STOP_HITS}
),
reps AS (SELECT text, min(doc_id) AS rep FROM gate GROUP BY text),
bands AS ({_minhash_sql("SELECT rep AS doc_id, text FROM reps")}),
removed AS (
  SELECT DISTINCT a.doc_id FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
   AND a.doc_id > b.doc_id
),
surv AS (
  SELECT g.doc_id, g.lang, g.toks
  FROM gate g JOIN reps ON g.doc_id = reps.rep
  WHERE g.doc_id NOT IN (SELECT doc_id FROM removed)
),
bench AS (
  SELECT DISTINCT {gram} AS g
  FROM t0, {gram_series}
  WHERE doc_id < {DECON_BENCH_MAX_ID}
),
hits AS (
  SELECT DISTINCT doc_id FROM (
    SELECT s.doc_id, {gram.replace('toks', 's.toks')} AS g
    FROM surv s, {gram_series.replace('toks', 's.toks')}
    WHERE s.doc_id >= {DECON_BENCH_MAX_ID})
  WHERE g IN (SELECT g FROM bench)
),
clean AS (
  SELECT * FROM surv
  WHERE doc_id >= {DECON_BENCH_MAX_ID}
    AND doc_id NOT IN (SELECT doc_id FROM hits)
),
tgt(lang, share) AS (VALUES {_MIX_VALUES}),
c AS (
  SELECT cl.lang, t.share, count(*) AS cnt
  FROM clean cl JOIN tgt t USING (lang) GROUP BY 1, 2
),
m AS (SELECT min(CAST(cnt AS DOUBLE) / share) AS m FROM c),
r AS (SELECT lang, share * m.m / CAST(cnt AS DOUBLE) AS rate FROM c, m),
sampled AS (
  SELECT cl.doc_id, cl.toks
  FROM clean cl JOIN r USING (lang)
  WHERE CAST('0x' || substr(md5(CAST(cl.doc_id AS VARCHAR)), 1, 8) AS BIGINT)
        / 4294967296.0 < r.rate
),
staged AS (
  SELECT CAST('0x' || substr(md5('shard|' || CAST(doc_id AS VARCHAR)), 1, 8)
              AS BIGINT) % {N_SHARDS} AS shard_id,
         CAST('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 8)
              AS BIGINT) % 100 AS pct,
         len(toks) AS n_tokens
  FROM sampled
)
SELECT shard_id,
       CASE WHEN pct < {SPLIT_TRAIN_PCT} THEN 'train'
            WHEN pct < {SPLIT_TRAIN_PCT + 5} THEN 'valid'
            ELSE 'test' END AS split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
FROM staged
GROUP BY 1, 2
ORDER BY shard_id, split
"""


CORPUS_BUILD_SQL = _corpus_build_sql()
