#!/usr/bin/env python
"""48x scale stress for the vector/similarity LSH family (round-5 #1).

The text-side 48x drill (scale_stress.py) caught the band-clique OOM
that every toy-scale gate and plan audit had passed — this is the same
drill for the vector path. ~240,000 synthetic 64-d embeddings (native
expressions, deterministic in vec_id, no UDFs anywhere) with 5,000
injected exact duplicates are pushed through:

* the incremental embedding-ingest kernel (in-memory corpus bands),
* the persistent vector store (init + one ingest commit),
* SemDeDup at a PRODUCTION cluster count (K scaled so cluster width
  stays bounded — the graded K=8 toy setting would hand one join task
  ~30k^2/2 pair evaluations at this scale; asserted, not run),
* hard-negative mining at the default 8 band bits AND at 14 bits,
* bitext margin mining at 14 bits (the full-self-join member — most
  bits-sensitive).

Scale assertions (failures exit non-zero):
* injected exact dups are all detected (recall 1.0 is invariant in
  the band-bit count — identical vectors agree on every sign bit);
* no hot partition / no hot band bucket / no hot cluster (share of
  rows <= 5%);
* driver peak RSS grows < 500 MB.

Report: BENCH/SCALE_STRESS_VEC_r05.json.
Usage: python scripts/scale_stress_vec.py [n_vecs] (default 240000)
"""

from __future__ import annotations

import json
import os
import resource
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_VECS_DEFAULT = 240_000
DUP_POOL_OFFSET = 10_000_000
DUP_CORPUS_OFFSET = 20_000_000
DUP_BATCH_OFFSET = 30_000_000
SEMDEDUP_K_SCALED = 512   # K ~ N / target_width: 245k / 512 ≈ 480-wide
STRESS_BITS = 14          # 16,384 buckets/band at 240k → width ~15
UI_PORT = 4058
MAX_TASK_SHARE = 0.05
MAX_DRIVER_GROWTH_MB = 500


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def rest_shuffle_totals(app_id: str) -> dict:
    url = (
        f"http://localhost:{UI_PORT}/api/v1/applications/{app_id}"
        "/stages?status=complete"
    )
    with urllib.request.urlopen(url, timeout=10) as r:
        stages = json.loads(r.read())
    return {
        "shuffle_read_bytes": sum(s.get("shuffleReadBytes", 0) for s in stages),
        "shuffle_write_bytes": sum(s.get("shuffleWriteBytes", 0) for s in stages),
    }


def main() -> int:
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else N_VECS_DEFAULT
    # splits scale with the corpus so smoke runs at small n stay valid
    ingest_batch = max(500, min(20_000, n_vecs // 12))
    ingest_corpus_dups = ingest_batch // 8
    ingest_batch_dups = ingest_batch // 8
    n_injected = max(100, min(5_000, n_vecs // 48))

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from pdf_extractor_spark.session import ensure_pyfiles

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.appName("scale_stress_vec")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.files.openCostInBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.locality.wait", "0")
        .getOrCreate()
    )
    ensure_pyfiles(spark)
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId

    from pdf_extractor_spark.analytics.similarity import (
        DIMS,
        SEMDEDUP_THRESHOLD,
        _bitext_kernel,
        _hard_negative_kernel,
        _hp_band_structs,
        _semdedup_kernel,
        _vec_bands,
        _vec_ingest_statuses,
        vector_neardup_ingest,
        vector_store_init,
    )

    report: dict = {
        "n_vecs": n_vecs,
        "cpus": int(cpus),
        "stress_bits": STRESS_BITS,
        "semdedup_k": SEMDEDUP_K_SCALED,
        "phases": {},
        "asserts": {},
    }
    failures: list[str] = []

    def phase(name: str, fn):
        before = rest_shuffle_totals(app_id)
        t0 = time.time()
        out = fn()
        wall = time.time() - t0
        after = rest_shuffle_totals(app_id)
        report["phases"][name] = {
            "wall_sec": round(wall, 2),
            "result": out,
            "shuffle_read_mb": round(
                (after["shuffle_read_bytes"] - before["shuffle_read_bytes"])
                / 2**20,
                1,
            ),
            "shuffle_write_mb": round(
                (after["shuffle_write_bytes"] - before["shuffle_write_bytes"])
                / 2**20,
                1,
            ),
        }
        print(f"{name}: {wall:.1f}s {report['phases'][name]}", file=sys.stderr)
        return out

    # --- stage the synthetic embeddings (untimed; deterministic) ---------
    # 64 dims in [-1, 1] from xxhash64(vec_id, dim) — native expressions
    # only, the zero-per-row-Python rule holds for generation too
    emb_expr = F.transform(
        F.sequence(F.lit(1), F.lit(DIMS)),
        lambda i: (
            (F.pmod(F.xxhash64(F.col("vec_id"), i, F.lit("e")), F.lit(2001))
             - 1000)
            / 1000.0
        ).cast("float"),
    )
    langs = ["en", "de", "fr", "es", "zh"]
    base_path = f"/tmp/stress_vecs_{n_vecs}_v1.parquet"
    if not os.path.exists(os.path.join(base_path, "_SUCCESS")):
        (
            spark.range(n_vecs)
            .select(F.col("id").alias("vec_id"))
            .select(
                "vec_id",
                emb_expr.alias("embedding"),
                F.element_at(
                    F.array(*[F.lit(l) for l in langs]),
                    (F.pmod(F.col("vec_id"), F.lit(len(langs))) + 1).cast(
                        "int"
                    ),
                ).alias("lang"),
            )
            .repartition(int(cpus) * 4)
            .write.mode("overwrite")
            .parquet(base_path)
        )
    base = spark.read.parquet(base_path)
    base.count()  # warm the page cache / JVM

    rss_start = rss_mb()

    # hot-task probe on the staged input
    n_base = base.count()
    part_max = (
        base.groupBy(F.spark_partition_id().alias("p"))
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    report["asserts"]["max_partition_share"] = round(part_max / n_base, 4)
    if part_max / n_base > MAX_TASK_SHARE:
        failures.append(f"hot input partition: {part_max}/{n_base}")

    # --- 1. incremental ingest kernel (in-memory corpus bands) ----------
    corpus = base.filter(F.col("vec_id") >= ingest_batch).select(
        "vec_id", "embedding"
    )
    fresh = base.filter(F.col("vec_id") < ingest_batch).select(
        "vec_id", "embedding"
    )
    corpus_dups = (
        base.filter(
            (F.col("vec_id") >= ingest_batch)
            & (F.col("vec_id") < ingest_batch + ingest_corpus_dups)
        ).select(
            (F.col("vec_id") + DUP_CORPUS_OFFSET).alias("vec_id"), "embedding"
        )
    )
    batch_dups = base.filter(F.col("vec_id") < ingest_batch_dups).select(
        (F.col("vec_id") + DUP_BATCH_OFFSET).alias("vec_id"), "embedding"
    )
    batch = fresh.unionByName(corpus_dups).unionByName(batch_dups)
    n_batch = ingest_batch + ingest_corpus_dups + ingest_batch_dups

    def run_ingest_kernel():
        statuses = _vec_ingest_statuses(_vec_bands(corpus), batch)
        return {
            r["status"]: r["n"]
            for r in statuses.groupBy("status")
            .agg(F.count("*").alias("n"))
            .collect()
        }

    ing = phase("ingest_kernel", run_ingest_kernel)
    # injected dups are always found (exact recall is bits-invariant);
    # random 64-d vectors CAN exceed the 0.7 cosine bar occasionally, so
    # the free counts carry slack instead of equality
    if ing.get("dup_of_corpus", 0) < ingest_corpus_dups:
        failures.append(f"corpus dups missed: {ing}")
    if ing.get("dup_in_batch", 0) < ingest_batch_dups:
        failures.append(f"batch dups missed: {ing}")
    if sum(ing.values()) != n_batch:
        failures.append(f"status counts != batch size: {ing}")
    if ing.get("kept", 0) < ingest_batch * 0.95:
        failures.append(f"implausible kept count: {ing}")

    # --- 2. persistent vector store: init 220k + one ingest commit ------
    store_dir = f"/tmp/stress_vecstore_{n_vecs}"
    shutil.rmtree(store_dir, ignore_errors=True)

    def run_store():
        vector_store_init(spark, store_dir, corpus)
        statuses = vector_neardup_ingest(spark, store_dir, batch, "b1")
        return {
            r["status"]: r["n"]
            for r in statuses.groupBy("status")
            .agg(F.count("*").alias("n"))
            .collect()
        }

    store_out = phase("vector_store_roundtrip", run_store)
    if store_out.get("dup_of_corpus", 0) < ingest_corpus_dups:
        failures.append(f"store corpus dups missed: {store_out}")

    # --- 3. SemDeDup at production K ------------------------------------
    pool = base.select("vec_id", "embedding").unionByName(
        base.filter(F.col("vec_id") < n_injected).select(
            (F.col("vec_id") + DUP_POOL_OFFSET).alias("vec_id"), "embedding"
        )
    )
    seeds = base.filter(F.col("vec_id") < SEMDEDUP_K_SCALED).select(
        F.col("vec_id").cast("int").alias("seed_id"),
        F.col("embedding").alias("seed_emb"),
    )

    def run_semdedup():
        out = _semdedup_kernel(pool, seeds).localCheckpoint(eager=True)
        n_rows = out.count()
        n_dup = out.filter(~F.col("kept")).count()
        exact = out.filter(
            (F.col("vec_id") >= DUP_POOL_OFFSET)
            & (F.col("dup_of") == F.col("vec_id") - DUP_POOL_OFFSET)
        ).count()
        widest = (
            out.groupBy("cluster").count().agg(F.max("count")).first()[0]
        )
        return {
            "rows": n_rows,
            "n_dup": n_dup,
            "exact_dup_hits": exact,
            "max_cluster_width": widest,
        }

    sd = phase("semdedup_scaled_k", run_semdedup)
    if sd["rows"] != n_vecs + n_injected:
        failures.append(f"semdedup row count: {sd}")
    # at the 0.95 bar random vectors never collide — dup set == injected
    if sd["n_dup"] != n_injected or sd["exact_dup_hits"] != n_injected:
        failures.append(f"semdedup dup set wrong: {sd}")
    report["asserts"]["max_cluster_share"] = round(
        sd["max_cluster_width"] / (n_vecs + n_injected), 4
    )
    if sd["max_cluster_width"] / (n_vecs + n_injected) > MAX_TASK_SHARE:
        failures.append(f"hot semdedup cluster: {sd}")
    # the toy-K hazard, quantified instead of run: widest cluster at K=8
    k8_width = (n_vecs + n_injected) // 8
    report["asserts"]["k8_would_pair_evals_per_task"] = k8_width * k8_width // 2

    # --- 4. hard negatives: default bits vs scaled bits -----------------
    emb_only = base.select("vec_id", "embedding")

    def bucket_stats(bits):
        bands = emb_only.select(
            F.explode(
                _hp_band_structs(F.col("embedding"), n_bits=bits)
            ).alias("bb")
        ).select("bb.band_id", "bb.band_key")
        n_rows = bands.count()
        widest = (
            bands.groupBy("band_id", "band_key")
            .count()
            .agg(F.max("count"))
            .first()[0]
        )
        return n_rows, widest

    def run_hn(bits):
        out = _hard_negative_kernel(emb_only, n_bits=bits)
        return {"rows": out.count()}

    hn8 = phase("hard_negatives_bits8", lambda: run_hn(8))
    hn14 = phase("hard_negatives_bits14", lambda: run_hn(STRESS_BITS))
    if hn8["rows"] == 0 or hn14["rows"] == 0:
        failures.append("hard negatives empty")
    n_band_rows, width8 = bucket_stats(8)
    _, width14 = bucket_stats(STRESS_BITS)
    report["asserts"]["band_width_bits8"] = width8
    report["asserts"]["band_width_bits14"] = width14
    report["asserts"]["max_band_bucket_share_bits14"] = round(
        width14 / n_band_rows, 6
    )
    if width14 / n_band_rows > MAX_TASK_SHARE:
        failures.append(f"hot band bucket at {STRESS_BITS} bits: {width14}")

    # --- 5. bitext margin mining at scaled bits -------------------------
    def run_bitext():
        out = _bitext_kernel(
            base.select("vec_id", "embedding", "lang"), n_bits=STRESS_BITS
        )
        return {"rows": out.count()}

    phase("bitext_margin_bits14", run_bitext)

    # --- driver growth ---------------------------------------------------
    growth = rss_mb() - rss_start
    report["asserts"]["driver_rss_growth_mb"] = round(growth, 1)
    if growth > MAX_DRIVER_GROWTH_MB:
        failures.append(f"driver RSS grew {growth:.0f} MB")

    report["failures"] = failures
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH",
        "SCALE_STRESS_VEC_r05.json",
    )
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
