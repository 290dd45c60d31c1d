"""Per-partition checkpoint/lineage + idempotent resume (north rule).

Reference analog: the per-file JSON table cache that lets a crashed
run skip already-extracted documents (table_extraction.py:256-283,
load_or_extract_tables short-circuit at :267-280). At 100 TB that
becomes a *lineage table*: one row per completed bucket with recorded
row-count / byte / wall-time metrics, and resume = anti-join of the
input's buckets against the completed set — exactly the shape of
SURVEY.md §4 custom-work item 4.

Bucketing is ``pmod(xxhash64(doc_id), n_buckets)`` — a pure function
of the data (NOT spark_partition_id()), so a resumed run with a
different parallelism or input split layout still agrees on what a
"partition" is. Output is laid out as one parquet subtree per bucket
(Iceberg partition stand-in); a bucket directory is only ever written
whole, then its lineage row committed after, so a crash between the
two leaves a re-doable bucket, never a half-counted one
(write-then-commit ordering = idempotent at-least-once).
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.extract import extract_elements

LINEAGE_FILE = "lineage.json"  # tiny driver-side manifest (Iceberg stand-in)
META_KEY = "__meta__"          # manifest metadata (n_buckets guard)


def _bucket_items(lineage: dict):
    return [(b, e) for b, e in lineage.items() if b != META_KEY]


def bucket_of(doc_id_col, n_buckets: int):
    return F.pmod(F.xxhash64(doc_id_col), F.lit(n_buckets)).cast("int")


def _lineage_path(output_dir: str) -> str:
    return os.path.join(output_dir, LINEAGE_FILE)


def read_lineage(output_dir: str) -> dict[str, dict]:
    path = _lineage_path(output_dir)
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


def _commit_lineage(output_dir: str, entries: dict[str, dict]) -> None:
    path = _lineage_path(output_dir)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(entries, f, indent=1, sort_keys=True)
    os.replace(tmp, path)  # atomic rename = commit point


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def run_with_lineage(
    spark: SparkSession,
    docs: DataFrame,
    output_dir: str,
    n_buckets: int = 16,
    run_id: str = "run-0",
    merge_strategy: str = "default",
    mega_span_threshold: int = 5_000,
    fail_after_buckets: Optional[int] = None,
    commit_mode: str = "per_bucket",
) -> dict[str, dict]:
    """Extract ``docs`` bucket-by-bucket with resumable lineage.

    Re-invoking with the same ``output_dir`` skips completed buckets
    (anti-join against the lineage manifest). ``fail_after_buckets``
    exists for crash-injection tests.

    ``commit_mode``:
    * ``per_bucket`` — one write + lineage commit per bucket, finest
      resume granularity (a crash loses at most one bucket's work);
      costs one Spark job per bucket.
    * ``batch`` — ONE Spark job writes every pending bucket via
      dynamic partition overwrite (``partitionBy(bucket)``), then all
      lineage rows commit together. The scale mode: no driver-side
      job-per-bucket loop; a crash before the commit point redoes the
      whole pending wave (still idempotent — dynamic overwrite
      replaces only pending partitions).

    Returns the lineage manifest {bucket: {status, row_count, bytes,
    wall_ms, run_id}}.
    """
    os.makedirs(output_dir, exist_ok=True)
    lineage = read_lineage(output_dir)
    meta = lineage.get(META_KEY)
    if meta is not None and meta.get("n_buckets") != n_buckets:
        raise ValueError(
            f"resume with n_buckets={n_buckets} but {output_dir} was "
            f"bucketed with n_buckets={meta.get('n_buckets')} — mixing "
            "bucketings would silently drop documents"
        )
    lineage[META_KEY] = {"n_buckets": n_buckets}
    done = {int(b) for b, e in _bucket_items(lineage) if e["status"] == "done"}

    bucketed = docs.withColumn("bucket", bucket_of(F.col("doc_id"), n_buckets))
    todo = sorted(set(range(n_buckets)) - done)

    # One pass computes every pending bucket; per-bucket commit happens
    # in bucket order. (On a real cluster each bucket is one Iceberg
    # partition append + one lineage-row insert — same protocol.)
    pending = bucketed.filter(F.col("bucket").isin([int(b) for b in todo])) if todo else None
    if pending is not None:
        extracted = extract_elements(
            pending.drop("bucket"),
            merge_strategy=merge_strategy,
            mega_span_threshold=mega_span_threshold,
        ).withColumn("bucket", bucket_of(F.col("doc_id"), n_buckets))
        if commit_mode == "batch":
            extracted = extracted.persist()
            try:
                t0 = time.time()
                (
                    extracted.write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("bucket")
                    .parquet(output_dir)
                )
                wall_ms = int((time.time() - t0) * 1000)
                counts = {
                    r["bucket"]: r["count"]
                    for r in extracted.groupBy("bucket").count().collect()
                }
            finally:
                extracted.unpersist()
            for b in todo:
                part_dir = os.path.join(output_dir, f"bucket={b}")
                # empty buckets produce no partition dir under dynamic
                # overwrite; record row_count 0 (read_output skips them)
                lineage[str(b)] = {
                    "status": "done",
                    "row_count": int(counts.get(b, 0)),
                    "bytes": _dir_bytes(part_dir) if b in counts else 0,
                    "wall_ms": wall_ms,  # shared job wall
                    "run_id": run_id,
                }
            _commit_lineage(output_dir, lineage)
            return lineage

        extracted = extracted.persist()
        try:
            for i, b in enumerate(todo):
                if fail_after_buckets is not None and i >= fail_after_buckets:
                    raise RuntimeError(f"injected failure before bucket {b}")
                t0 = time.time()
                part_dir = os.path.join(output_dir, f"bucket={b}")
                part_df = extracted.filter(F.col("bucket") == int(b)).drop("bucket")
                row_count = part_df.count()
                if row_count > 0:
                    part_df.write.mode("overwrite").parquet(part_dir)
                lineage[str(b)] = {
                    "status": "done",
                    "row_count": row_count,
                    "bytes": _dir_bytes(part_dir) if row_count > 0 else 0,
                    "wall_ms": int((time.time() - t0) * 1000),
                    "run_id": run_id,
                }
                _commit_lineage(output_dir, lineage)
        finally:
            extracted.unpersist()
    return lineage


def _bucket_dir(output_dir: str, b: str | int, entry: dict) -> str:
    """Resolve a bucket's current data directory: versioned path if a
    MERGE rewrote it (see :func:`upsert_elements`), base path otherwise."""
    if entry.get("path"):
        return os.path.join(output_dir, entry["path"])
    return os.path.join(output_dir, f"bucket={b}")


def read_output(
    spark: SparkSession,
    output_dir: str,
    for_doc_ids: Optional[DataFrame] = None,
) -> DataFrame:
    """Read back committed non-empty buckets.

    ``for_doc_ids`` (a DataFrame with a doc_id column) restricts the
    scan to the buckets those documents hash into — the Iceberg-style
    partition-pruned read a keyed lookup should do instead of scanning
    the whole store. Pruning collects only the small distinct bucket-id
    list, never the doc_ids themselves."""
    lineage = read_lineage(output_dir)
    wanted: Optional[set] = None
    if for_doc_ids is not None:
        meta = lineage.get(META_KEY) or {}
        n_buckets = meta.get("n_buckets")
        if n_buckets:
            wanted = {
                r["bucket"]
                for r in for_doc_ids.select(
                    bucket_of(F.col("doc_id"), n_buckets).alias("bucket")
                )
                .distinct()
                .collect()
            }
    all_parts = [
        _bucket_dir(output_dir, b, e)
        for b, e in sorted(_bucket_items(lineage), key=lambda kv: int(kv[0]))
        if e["status"] == "done" and e.get("row_count", 0) > 0
    ]
    if not all_parts:
        raise FileNotFoundError(f"no committed buckets under {output_dir}")
    parts = (
        all_parts
        if wanted is None
        else [
            _bucket_dir(output_dir, b, e)
            for b, e in _bucket_items(lineage)
            if e["status"] == "done"
            and e.get("row_count", 0) > 0
            and int(b) in wanted
        ]
    )
    if not parts:
        # pruned to buckets with no committed data: empty, store schema
        return spark.read.parquet(*all_parts).limit(0)
    return spark.read.parquet(*parts)


# ---------------------------------------------------------------------------
# S16 — keyed MERGE on the extracted-element store
# (reference arangodb/crud.py update/replace/delete semantics: mutate
#  documents in place by key. Re-expressed for an immutable parquet
#  store as copy-on-write: the affected buckets are REWRITTEN into a
#  new versioned directory (anti-join out the touched keys, union the
#  new rows), then the manifest row flips to the new path — exactly the
#  Iceberg copy-on-write MERGE protocol. A crash between write and
#  commit leaves the old version referenced, so the operation is
#  idempotent and the store is never half-updated.)
# ---------------------------------------------------------------------------

MERGE_KEYS = ("doc_id", "offset")


def _merge_buckets(
    spark: SparkSession,
    output_dir: str,
    changes: DataFrame,
    *,
    insert: bool,
) -> dict[str, dict]:
    lineage = read_lineage(output_dir)
    meta = lineage.get(META_KEY)
    if meta is None:
        raise FileNotFoundError(f"no lineage manifest under {output_dir}")
    n_buckets = meta["n_buckets"]
    # persist: consumed once for the affected-bucket list and once per
    # affected bucket — without a cache a full upstream pipeline (e.g. a
    # streaming extraction batch) would recompute each time
    keyed = changes.withColumn(
        "bucket", bucket_of(F.col("doc_id"), n_buckets)
    ).persist()
    try:
        affected = sorted(
            r["bucket"] for r in keyed.select("bucket").distinct().collect()
        )
        for b in affected:
            entry = lineage.get(str(b))
            if entry is None or entry.get("status") != "done":
                raise ValueError(
                    f"bucket {b} has no committed data — MERGE targets an "
                    "extracted store, run the pipeline first"
                )
            delta = keyed.filter(F.col("bucket") == int(b)).drop("bucket")
            t0 = time.time()
            if entry.get("row_count", 0) > 0:
                current = spark.read.parquet(_bucket_dir(output_dir, b, entry))
                merged = current.join(
                    delta.select(*MERGE_KEYS), list(MERGE_KEYS), "left_anti"
                )
            else:
                merged = None
            if insert:
                new_rows = delta if merged is None else merged.unionByName(delta)
            else:
                new_rows = merged
            version = entry.get("version", 0) + 1
            rel_path = f"bucket={b}__v{version}"
            new_dir = os.path.join(output_dir, rel_path)
            if new_rows is not None:
                # write once, then count from the written files — a
                # count() before the write would execute the whole
                # read+anti-join+union plan a second time
                new_rows.write.mode("overwrite").parquet(new_dir)
                row_count = spark.read.parquet(new_dir).count()
            else:
                row_count = 0
            lineage[str(b)] = {
                "status": "done",
                "row_count": row_count,
                "bytes": _dir_bytes(new_dir) if row_count > 0 else 0,
                "wall_ms": int((time.time() - t0) * 1000),
                "run_id": entry.get("run_id", "merge"),
                "version": version,
                "path": rel_path if row_count > 0 else None,
            }
            _commit_lineage(output_dir, lineage)
    finally:
        keyed.unpersist()
    return lineage


def upsert_elements(
    spark: SparkSession, output_dir: str, updates: DataFrame
) -> dict[str, dict]:
    """MERGE: rows matching (doc_id, offset) are replaced, new keys are
    inserted. ``updates`` must carry the extracted-element schema."""
    return _merge_buckets(spark, output_dir, updates, insert=True)


def delete_elements(
    spark: SparkSession, output_dir: str, keys: DataFrame
) -> dict[str, dict]:
    """Keyed delete: rows matching (doc_id, offset) are removed."""
    return _merge_buckets(spark, output_dir, keys.select(*MERGE_KEYS), insert=False)
