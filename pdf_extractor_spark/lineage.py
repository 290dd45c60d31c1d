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

import fcntl
import json
import os
import re
import shutil
import time
from contextlib import contextmanager
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .operators.extract import extract_elements

LINEAGE_FILE = "lineage.json"  # tiny driver-side manifest (Iceberg stand-in)
META_KEY = "__meta__"          # manifest metadata (n_buckets guard)
LOCK_WAIT_S = 60.0             # manifest-swap acquisition timeout
MERGE_LOCK_WAIT_S = 600.0      # whole-merge lock: writers serialize on it


def _bucket_items(lineage: dict):
    return [(b, e) for b, e in lineage.items() if b != META_KEY]


def bucket_of(doc_id_col, n_buckets: int):
    return F.pmod(F.xxhash64(doc_id_col), F.lit(n_buckets)).cast("int")


def _key_type_meta(df: DataFrame) -> str:
    """The store key's DDL type string, recorded in the manifest META at
    creation so keyed reads can hash probe keys with the store's native
    type (``xxhash64("5") != xxhash64(5L)`` — a mistyped probe prunes to
    buckets that cannot contain the key)."""
    return df.schema["doc_id"].dataType.simpleString()


def _store_key_type(spark: SparkSession, output_dir: str, lineage: dict):
    """The store's native doc_id type: manifest META fast path; parquet
    footer probe of one committed bucket for stores written before
    key_type was recorded."""
    kt = (lineage.get(META_KEY) or {}).get("key_type")
    if kt:
        try:
            return T._parse_datatype_string(kt)
        except Exception:
            pass  # unparseable legacy value → footer probe below
    sample = next(
        (
            _bucket_dir(output_dir, b, e)
            for b, e in sorted(_bucket_items(lineage), key=lambda kv: int(kv[0]))
            if e["status"] == "done" and e.get("row_count", 0) > 0
        ),
        None,
    )
    if sample is None:
        raise FileNotFoundError(f"no committed buckets under {output_dir}")
    return spark.read.parquet(sample).schema["doc_id"].dataType


def _store_schema(lineage: dict) -> Optional[T.StructType]:
    """The store's registered read schema, if the manifest carries one
    (it does after the first :func:`evolve_store_schema`); None means
    the schema is whatever the data files say — the pre-evolution
    behavior, unchanged."""
    sj = (lineage.get(META_KEY) or {}).get("schema")
    return T.StructType.fromJson(sj) if sj else None


def _conform_updates(
    df: DataFrame, schema: T.StructType, evolved: list[str]
) -> DataFrame:
    """Align an update batch with the evolved store schema: EVOLVED
    columns absent from the batch fill with NULL (a writer predating
    the evolution keeps working); original columns must be present —
    the projection raises on a genuinely malformed batch — and columns
    the store does not know raise instead of silently dropping (the
    same refusal a pre-evolution store's strict unionByName gives).
    Output is in schema order so every generation file lays out
    identically."""
    unknown = set(df.columns) - {f.name for f in schema.fields}
    if unknown:
        raise ValueError(
            f"update columns not in store schema: {sorted(unknown)} "
            "(evolve_store_schema first)"
        )
    for f in schema.fields:
        if f.name in evolved and f.name not in df.columns:
            df = df.withColumn(f.name, F.lit(None).cast(f.dataType))
    return df.select(*[f.name for f in schema.fields])


def evolve_store_schema(
    spark: SparkSession, output_dir: str, add_columns: dict[str, str]
) -> T.StructType:
    """Iceberg ADD COLUMN analog: register new nullable columns on the
    keyed store WITHOUT rewriting a single data file.

    ``add_columns`` maps column name → Spark DDL type string (e.g.
    ``{"quality": "double"}``). The evolved schema is committed into
    the manifest META (one manifest swap — snapshotted, so
    ``read_output(as_of=pre_evolution_version)`` time-travels to the
    narrow schema); data files written before the evolution simply
    lack the column and read back as NULL via the manifest schema,
    exactly Iceberg's read-time reconciliation. Later MERGE writers
    may carry the new columns or omit them (omission fills NULL);
    rewrites happen only when a merge touches a bucket anyway.

    Add-only by design (drop/rename need column-id indirection parquet
    names can't give); duplicate names and unparseable types raise
    before anything commits.
    """
    if not add_columns:
        raise ValueError("add_columns is empty")
    with _manifest_lock(output_dir, wait_s=MERGE_LOCK_WAIT_S):
        lineage = read_lineage(output_dir)
        meta = lineage.get(META_KEY)
        if meta is None:
            raise FileNotFoundError(f"no lineage manifest under {output_dir}")
        schema = _store_schema(lineage)
        if schema is None:
            sample = next(
                (
                    _bucket_dir(output_dir, b, e)
                    for b, e in sorted(
                        _bucket_items(lineage), key=lambda kv: int(kv[0])
                    )
                    if e["status"] == "done" and e.get("row_count", 0) > 0
                ),
                None,
            )
            if sample is None:
                raise FileNotFoundError(
                    f"no committed buckets under {output_dir}"
                )
            schema = spark.read.parquet(sample).schema
        existing = {f.name.lower() for f in schema.fields}
        evolved = list(meta.get("evolved_columns") or [])
        fields = list(schema.fields)
        for name, ddl in add_columns.items():
            if name.lower() in existing:
                raise ValueError(
                    f"column {name!r} already exists in the store schema"
                )
            dt = T._parse_datatype_string(ddl)  # raises on junk DDL
            fields.append(T.StructField(name, dt, True))
            existing.add(name.lower())
            evolved.append(name)
        new_schema = T.StructType(fields)
        _commit_lineage(
            output_dir,
            {
                META_KEY: {
                    "schema": new_schema.jsonValue(),
                    "evolved_columns": evolved,
                }
            },
            locked=True,
        )
        return new_schema


def _lineage_path(output_dir: str) -> str:
    return os.path.join(output_dir, LINEAGE_FILE)


def _snapshot_path(output_dir: str, version: int) -> str:
    return os.path.join(output_dir, f"lineage.v{version}.json")


def read_lineage(
    output_dir: str, as_of: Optional[int] = None
) -> dict[str, dict]:
    """Current manifest, or — with ``as_of`` — the snapshot committed
    at that ``manifest_version`` (time travel; raises if the snapshot
    was expired by :func:`vacuum_store`)."""
    if as_of is not None:
        current = read_lineage(output_dir)
        cur_v = current.get(META_KEY, {}).get("manifest_version", 0)
        if as_of == cur_v:
            return current
        snap = _snapshot_path(output_dir, as_of)
        if not os.path.exists(snap):
            raise FileNotFoundError(
                f"no snapshot at manifest_version={as_of} under "
                f"{output_dir} (current={cur_v}; expired snapshots are "
                "removed by vacuum_store retention)"
            )
        with open(snap) as f:
            return json.load(f)
    path = _lineage_path(output_dir)
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


@contextmanager
def flock_file(lock: str, wait_s: float = LOCK_WAIT_S):
    """Exclusive lock via ``fcntl.flock`` on a permanent lock file.
    Advisory fd locks release automatically when the holder dies,
    so there is no staleness heuristic to mis-judge and no
    check-then-steal window (the previous O_EXCL + mtime-steal protocol
    had both: a TOCTOU between the staleness check and the steal, and a
    stalled-but-alive holder that, once stolen from, would overwrite
    the stealer's commit). The lock file itself is never unlinked —
    unlinking would let a late holder delete the CURRENT holder's lock
    by name. Works across processes and across threads (each ``open``
    is its own file description). Acquisition is bounded: a wedged
    holder surfaces as a TimeoutError, never an indefinite hang.
    Shared by the lineage manifest lock and the band/vector store
    locks (analytics/dedup.py).
    """
    fd = os.open(lock, os.O_CREAT | os.O_RDWR)
    try:
        deadline = time.time() + wait_s
        while True:
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                break
            except OSError:
                if time.time() > deadline:
                    raise TimeoutError(
                        f"could not acquire lock {lock} within "
                        f"{wait_s}s (another writer holds the store)"
                    )
                time.sleep(0.005)
        yield
    finally:
        try:
            fcntl.flock(fd, fcntl.LOCK_UN)
        except OSError:
            pass
        os.close(fd)


def _manifest_lock(output_dir: str, wait_s: float = LOCK_WAIT_S):
    return flock_file(_lineage_path(output_dir) + ".lock", wait_s)


def _commit_lineage(
    output_dir: str, delta: dict[str, dict], locked: bool = False
) -> dict[str, dict]:
    """Concurrency-safe manifest commit: merge ``delta`` into the
    CURRENT manifest under the exclusive store lock, then
    atomic-rename.

    Two concurrent committers (e.g. streaming CDC + a batch backfill)
    previously raced read→write and the loser's rows were silently
    dropped; the lock serializes read-merge-write so both deltas land
    (the file-system stand-in for Iceberg's optimistic manifest swap —
    ``manifest_version`` in the META row is the swap counter).
    ``locked=True`` means the caller already holds the store lock
    (e.g. ``merge_elements`` holds it across data write + commit).
    """
    if not locked:
        with _manifest_lock(output_dir):
            return _commit_lineage(output_dir, delta, locked=True)
    path = _lineage_path(output_dir)
    current = read_lineage(output_dir)
    merged = {**current, **{k: v for k, v in delta.items() if k != META_KEY}}
    meta = {**current.get(META_KEY, {}), **delta.get(META_KEY, {})}
    meta["manifest_version"] = current.get(META_KEY, {}).get(
        "manifest_version", 0
    ) + 1
    merged[META_KEY] = meta
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    # snapshot BEFORE the swap: the superseded manifest becomes the
    # numbered snapshot (Iceberg metadata-file analog) that
    # read_output(as_of=...) resolves; expired by vacuum_store per
    # its retain_snapshots policy. Written with the same tmp+rename
    # protocol as the manifest — a crash mid-write must not leave a
    # truncated snapshot that wedges every later vacuum/as_of read.
    if current:
        prev_v = current.get(META_KEY, {}).get("manifest_version", 0)
        snap = _snapshot_path(output_dir, prev_v)
        if not os.path.exists(snap):
            snap_tmp = snap + ".tmp"
            with open(snap_tmp, "w") as f:
                json.dump(current, f, indent=1, sort_keys=True)
            os.replace(snap_tmp, snap)
    os.replace(tmp, path)  # atomic rename = commit point
    return merged


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
    meta_entry = {"n_buckets": n_buckets, "key_type": _key_type_meta(docs)}
    lineage[META_KEY] = meta_entry
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
                    _clustered(extracted).write.mode("overwrite")
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
            delta: dict[str, dict] = {META_KEY: dict(meta_entry)}
            for b in todo:
                part_dir = os.path.join(output_dir, f"bucket={b}")
                # empty buckets produce no partition dir under dynamic
                # overwrite; record row_count 0 (read_output skips them)
                delta[str(b)] = {
                    "status": "done",
                    "row_count": int(counts.get(b, 0)),
                    "bytes": _dir_bytes(part_dir) if b in counts else 0,
                    "wall_ms": wall_ms,  # shared job wall
                    "run_id": run_id,
                }
            lineage.update({k: v for k, v in delta.items() if k != META_KEY})
            _commit_lineage(output_dir, delta)
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
                    part_df.sortWithinPartitions(*MERGE_KEYS).write.mode(
                        "overwrite"
                    ).parquet(part_dir)
                entry = {
                    "status": "done",
                    "row_count": row_count,
                    "bytes": _dir_bytes(part_dir) if row_count > 0 else 0,
                    "wall_ms": int((time.time() - t0) * 1000),
                    "run_id": run_id,
                }
                lineage[str(b)] = entry
                _commit_lineage(
                    output_dir,
                    {META_KEY: dict(meta_entry), str(b): entry},
                )
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
    as_of: Optional[int] = None,
) -> DataFrame:
    """Read back committed non-empty buckets.

    ``for_doc_ids`` (a DataFrame with a doc_id column) restricts the
    scan to the buckets those documents hash into — the Iceberg-style
    partition-pruned read a keyed lookup should do instead of scanning
    the whole store. Pruning collects only the small distinct bucket-id
    list, never the doc_ids themselves.

    ``as_of`` reads the store AS OF an earlier ``manifest_version``
    (time travel) — valid while that snapshot is within the vacuum
    retention window (``vacuum_store(retain_snapshots=...)``)."""
    lineage = read_lineage(output_dir, as_of=as_of)
    wanted: Optional[set] = None
    if for_doc_ids is not None:
        meta = lineage.get(META_KEY) or {}
        n_buckets = meta.get("n_buckets")
        if n_buckets:
            # hash probe keys with the store's NATIVE key type:
            # xxhash64 is type-sensitive (xxhash64("5") != xxhash64(5L)),
            # so an int-typed probe against a long-keyed store — or any
            # dtype drift in the caller — would prune to buckets that
            # cannot contain the keys and silently return nothing
            key_t = _store_key_type(spark, output_dir, lineage)
            probe = for_doc_ids.select(
                F.col("doc_id").cast(key_t).alias("doc_id")
            )
            wanted = {
                r["bucket"]
                for r in probe.select(
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
    # manifest schema (present after evolve_store_schema) drives the
    # read: files predating an added column fill it with NULL — the
    # Iceberg read-time reconciliation; as_of reads resolve the schema
    # from the SNAPSHOT, so time travel also travels the schema
    schema = _store_schema(lineage)
    reader = spark.read.schema(schema) if schema is not None else spark.read
    if not parts:
        # pruned to buckets with no committed data: empty, store schema
        return reader.parquet(*all_parts).limit(0)
    return reader.parquet(*parts)


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


def init_store(
    spark: SparkSession,
    output_dir: str,
    rows: DataFrame,
    n_buckets: int = 16,
    run_id: str = "init",
) -> dict[str, dict]:
    """CREATE TABLE AS SELECT analog: materialize an arbitrary keyed
    DataFrame (must carry the MERGE_KEYS columns) as a new keyed store
    — bucketed, clustered, manifest-committed — so the generic store
    machinery (merge_elements, point_lookup, compact_store, vacuum,
    time travel) works over collections other than extracted elements
    (e.g. the relationship edge collection,
    reference arangodb/config.py:11 ``relationships``).

    Refuses to overwrite an existing store: mutations go through
    merge_elements, exactly as ArangoDB creation vs CRUD are distinct.
    One Spark wave (the ``batch`` shape of run_with_lineage): dynamic
    partition overwrite + one groupBy(bucket).count() for the manifest.
    """
    for k in MERGE_KEYS:
        if k not in rows.columns:
            raise ValueError(f"init_store rows need column {k!r}")
    os.makedirs(output_dir, exist_ok=True)
    if read_lineage(output_dir).get(META_KEY):
        raise FileExistsError(
            f"{output_dir} already holds a committed store — use "
            "merge_elements to mutate it"
        )
    bucketed = rows.withColumn(
        "bucket", bucket_of(F.col("doc_id"), n_buckets)
    ).persist()
    try:
        t0 = time.time()
        (
            _clustered(bucketed).write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket")
            .parquet(output_dir)
        )
        wall_ms = int((time.time() - t0) * 1000)
        counts = {
            r["bucket"]: r["count"]
            for r in bucketed.groupBy("bucket").count().collect()
        }
    finally:
        bucketed.unpersist()
    delta: dict[str, dict] = {
        META_KEY: {"n_buckets": n_buckets, "key_type": _key_type_meta(rows)}
    }
    for b in range(n_buckets):
        part_dir = os.path.join(output_dir, f"bucket={b}")
        delta[str(b)] = {
            "status": "done",
            "row_count": int(counts.get(b, 0)),
            "bytes": _dir_bytes(part_dir) if b in counts else 0,
            "wall_ms": wall_ms,
            "run_id": run_id,
        }
    _commit_lineage(output_dir, delta)
    return read_lineage(output_dir)


def _clustered(df: DataFrame) -> DataFrame:
    """Cluster rows by the merge key before a partitionBy('bucket')
    write (Iceberg write sort-order analog). The leading 'bucket' key
    satisfies the writer's required partition-column ordering, so no
    extra sort is inserted and the secondary (doc_id, offset) order
    survives into the files — every parquet row group then carries
    tight doc_id min/max stats and a keyed read skips the row groups
    (and whole files) that cannot contain its keys. A task-local sort,
    no exchange."""
    return df.sortWithinPartitions("bucket", *MERGE_KEYS)


def point_lookup(
    spark: SparkSession,
    output_dir: str,
    doc_ids: list,
    as_of: Optional[int] = None,
) -> DataFrame:
    """Primary-key fetch of a few documents from the keyed store.

    Reference analog: ``arangodb/crud.py:95`` ``get_document`` — an
    ArangoDB point read served by the ``_key`` primary index. A 100 TB
    parquet store has no index; the equivalent is layout: (1) the
    manifest prunes the scan to the buckets the keys hash into
    (:func:`read_output`), (2) the ``doc_id IN (...)`` predicate is
    pushed into the parquet scan, where the clustered layout
    (:func:`_clustered`) makes row-group min/max stats selective — a
    lookup reads a handful of row groups, not the bucket.

    The pruning hash MUST run on the store's native key type:
    ``xxhash64("5") != xxhash64(5L)``, so string-coercing the probe
    keys against a store bootstrapped with numeric doc_ids
    (:func:`init_store` accepts any keyed DataFrame) would prune to
    buckets that cannot contain them and silently return nothing. The
    key type comes from the manifest META (recorded at store creation;
    parquet-footer fallback for older stores) and both the pruning
    probe (inside :func:`read_output`) and the ``IN`` predicate here
    use values coerced to it.
    """
    lineage = read_lineage(output_dir, as_of=as_of)
    key_type = _store_key_type(spark, output_dir, lineage)
    if isinstance(key_type, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        vals = [int(d) for d in doc_ids]
    elif isinstance(key_type, T.StringType):
        vals = [str(d) for d in doc_ids]
    else:
        vals = list(doc_ids)
    ids_df = spark.createDataFrame(
        [(v,) for v in vals],
        T.StructType([T.StructField("doc_id", key_type)]),
    )
    scan = read_output(spark, output_dir, for_doc_ids=ids_df, as_of=as_of)
    return scan.where(F.col("doc_id").isin(vals))

_BUCKET_DIR_RE = re.compile(r"^bucket=\d+(__v\d+)?$")
_MERGE_ROOT_RE = re.compile(r"^merge_v\d+$")


def merge_elements(
    spark: SparkSession,
    output_dir: str,
    updates: Optional[DataFrame] = None,
    delete_keys: Optional[DataFrame] = None,
    commit_mode: str = "batch",
    retain_snapshots: int = 0,
) -> dict[str, dict]:
    """Keyed MERGE on the extracted store: one copy-on-write commit that
    replaces rows matching ``updates``' (doc_id, offset), inserts the
    new keys, and removes ``delete_keys``. A key appearing in both
    frames is updated (updates win — delete applies only to keys not
    re-inserted), matching delete-then-upsert CRUD order
    (reference arangodb/crud.py update/replace/delete semantics).

    ``commit_mode``:

    * ``batch`` (default, the 100 TB shape) — ONE Spark wave for any
      number of affected buckets: union-read every affected bucket's
      current version, one global anti-join on the touched keys, one
      ``partitionBy(bucket)`` write into a fresh ``merge_v{gen}``
      generation directory, per-bucket counts from one
      ``groupBy(bucket).count()`` over the written files, then a single
      manifest commit flips every affected bucket to the new generation
      atomically. No per-bucket driver loop — 10⁴ affected buckets cost
      the same number of Spark jobs as 1.
    * ``per_bucket`` — one read+anti-join+write+commit per affected
      bucket; finest commit granularity (a crash loses at most one
      bucket's rewrite) for fine-grain CDC touching a few buckets.

    Either way a crash between write and manifest commit leaves the old
    versions referenced (the new generation directory is orphaned, and
    reclaimed by the post-commit vacuum of the next successful merge),
    so retries converge — the Iceberg copy-on-write MERGE protocol.
    """
    if updates is None and delete_keys is None:
        raise ValueError("merge_elements needs updates and/or delete_keys")
    # The ENTIRE merge — generation allocation, staging write, manifest
    # swap, vacuum — runs under the store lock, so concurrent writers
    # (streaming CDC + a batch backfill) serialize instead of picking
    # the same merge_v{gen} staging root and destroying each other's
    # in-flight data (the manifest-swap lock alone protected only the
    # final rename, not the directories it points at). Iceberg writers
    # retry on optimistic-commit conflict; the local stand-in
    # serializes, which is the same end state.
    with _manifest_lock(output_dir, wait_s=MERGE_LOCK_WAIT_S):
        return _merge_elements_locked(
            spark, output_dir, updates, delete_keys, commit_mode,
            retain_snapshots,
        )


def _merge_elements_locked(
    spark: SparkSession,
    output_dir: str,
    updates: Optional[DataFrame],
    delete_keys: Optional[DataFrame],
    commit_mode: str,
    retain_snapshots: int,
) -> dict[str, dict]:
    lineage = read_lineage(output_dir)
    meta = lineage.get(META_KEY)
    if meta is None:
        raise FileNotFoundError(f"no lineage manifest under {output_dir}")
    n_buckets = meta["n_buckets"]
    # bucket-route with the store's NATIVE key type (same hazard the
    # read side guards: xxhash64 is dtype-sensitive, so a mistyped
    # update/delete frame would rewrite the wrong buckets — deletes
    # silently no-op, upserts land in buckets keyed reads never visit)
    key_t = _store_key_type(spark, output_dir, lineage)
    if updates is not None:
        updates = updates.withColumn("doc_id", F.col("doc_id").cast(key_t))
        schema = _store_schema(lineage)
        if schema is not None:
            updates = _conform_updates(
                updates, schema, meta.get("evolved_columns") or []
            )
    if delete_keys is not None:
        delete_keys = delete_keys.withColumn(
            "doc_id", F.col("doc_id").cast(key_t)
        )

    def keyed_of(df: Optional[DataFrame]) -> Optional[DataFrame]:
        if df is None:
            return None
        return df.withColumn("bucket", bucket_of(F.col("doc_id"), n_buckets))

    # persist: each frame is consumed for the affected-bucket list and
    # again by the rewrite — without a cache a full upstream pipeline
    # (e.g. a streaming extraction batch) would recompute per use
    ups = keyed_of(updates)
    dels = keyed_of(delete_keys.select(*MERGE_KEYS) if delete_keys is not None else None)
    for df in (ups, dels):
        if df is not None:
            df.persist()
    try:
        all_keys = None
        for df in (ups, dels):
            if df is not None:
                k = df.select(*MERGE_KEYS, "bucket")
                all_keys = k if all_keys is None else all_keys.unionByName(k)
        affected = sorted(
            r["bucket"] for r in all_keys.select("bucket").distinct().collect()
        )
        if not affected:
            return lineage
        for b in affected:
            entry = lineage.get(str(b))
            if entry is None or entry.get("status") != "done":
                raise ValueError(
                    f"bucket {b} has no committed data — MERGE targets an "
                    "extracted store, run the pipeline first"
                )
        if commit_mode == "batch":
            lineage = _merge_batch(
                spark, output_dir, lineage, affected, ups, dels, all_keys,
                n_buckets=n_buckets,
            )
        else:
            lineage = _merge_per_bucket(
                spark, output_dir, lineage, affected, ups, all_keys
            )
    finally:
        for df in (ups, dels):
            if df is not None:
                df.unpersist()
    vacuum_store(output_dir, retain_snapshots=retain_snapshots, locked=True)
    return lineage


def _merge_batch(
    spark: SparkSession,
    output_dir: str,
    lineage: dict,
    affected: list,
    ups: Optional[DataFrame],
    dels: Optional[DataFrame],
    all_keys: DataFrame,
    *,
    n_buckets: int,
) -> dict:
    t0 = time.time()
    # one generation per merge commit; computed from COMMITTED versions
    # only, so a retry after a crash reuses (and overwrites) the same
    # orphaned generation directory — idempotent. The max ranges over
    # ALL buckets, not just affected ones: a committed merge_v{N}
    # directory can hold live data for buckets this merge does not
    # touch, and a gen derived from affected-only versions would reuse
    # (and rmtree) that referenced directory — permanent data loss.
    gen = 1 + max(e.get("version", 0) for _, e in _bucket_items(lineage))
    rel_root = f"merge_v{gen}"
    staging = os.path.join(output_dir, rel_root)
    if os.path.isdir(staging):
        shutil.rmtree(staging)  # orphan from a crashed attempt
    src_dirs = [
        _bucket_dir(output_dir, b, lineage[str(b)])
        for b in affected
        if lineage[str(b)].get("row_count", 0) > 0
    ]
    schema = _store_schema(lineage)
    reader = spark.read.schema(schema) if schema is not None else spark.read
    if src_dirs:
        # bucket is a pure function of doc_id, so the partition column
        # is recomputed rather than threaded through the store files;
        # the manifest schema (when evolved) NULL-fills columns the
        # older generation files do not carry, so the union below
        # always sees one shape
        current = reader.parquet(*src_dirs).withColumn(
            "bucket", bucket_of(F.col("doc_id"), n_buckets)
        )
        kept = current.join(
            all_keys.select(*MERGE_KEYS).distinct(), list(MERGE_KEYS), "left_anti"
        )
        new_rows = kept.unionByName(ups) if ups is not None else kept
    else:
        new_rows = ups
    counts: dict = {}
    if new_rows is not None:
        (
            _clustered(new_rows).write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket")
            .parquet(staging)
        )
        has_parts = os.path.isdir(staging) and any(
            name.startswith("bucket=") for name in os.listdir(staging)
        )
        if has_parts:
            counts = {
                r["bucket"]: r["count"]
                for r in spark.read.parquet(staging)
                .groupBy("bucket")
                .count()
                .collect()
            }
    wall_ms = int((time.time() - t0) * 1000)
    delta: dict[str, dict] = {}
    for b in affected:
        old = lineage[str(b)]
        rc = int(counts.get(b, 0))
        rel_path = f"{rel_root}/bucket={b}"
        entry = {
            "status": "done",
            "row_count": rc,
            "bytes": _dir_bytes(os.path.join(output_dir, rel_path)) if rc > 0 else 0,
            "wall_ms": wall_ms,  # shared wave wall
            "run_id": old.get("run_id", "merge"),
            "version": gen,
            "path": rel_path if rc > 0 else None,
        }
        delta[str(b)] = entry
        lineage[str(b)] = entry
    _commit_lineage(output_dir, delta, locked=True)
    return lineage


def _merge_per_bucket(
    spark: SparkSession,
    output_dir: str,
    lineage: dict,
    affected: list,
    ups: Optional[DataFrame],
    all_keys: DataFrame,
) -> dict:
    for b in affected:
        entry = lineage[str(b)]
        t0 = time.time()
        keys_b = all_keys.filter(F.col("bucket") == int(b)).select(*MERGE_KEYS)
        ups_b = (
            ups.filter(F.col("bucket") == int(b)).drop("bucket")
            if ups is not None
            else None
        )
        schema = _store_schema(lineage)
        reader = (
            spark.read.schema(schema) if schema is not None else spark.read
        )
        if entry.get("row_count", 0) > 0:
            current = reader.parquet(_bucket_dir(output_dir, b, entry))
            kept = current.join(keys_b.distinct(), list(MERGE_KEYS), "left_anti")
            new_rows = kept.unionByName(ups_b) if ups_b is not None else kept
        else:
            new_rows = ups_b
        version = entry.get("version", 0) + 1
        rel_path = f"bucket={b}__v{version}"
        new_dir = os.path.join(output_dir, rel_path)
        if new_rows is not None:
            # write once, then count from the written files — a count()
            # before the write would execute the whole plan a second time
            new_rows.sortWithinPartitions(*MERGE_KEYS).write.mode(
                "overwrite"
            ).parquet(new_dir)
            row_count = spark.read.parquet(new_dir).count()
        else:
            row_count = 0
        new_entry = {
            "status": "done",
            "row_count": row_count,
            "bytes": _dir_bytes(new_dir) if row_count > 0 else 0,
            "wall_ms": int((time.time() - t0) * 1000),
            "run_id": entry.get("run_id", "merge"),
            "version": version,
            "path": rel_path if row_count > 0 else None,
        }
        lineage[str(b)] = new_entry
        _commit_lineage(output_dir, {str(b): new_entry}, locked=True)
    return lineage


def list_snapshots(output_dir: str) -> list[int]:
    """Manifest versions readable via ``as_of`` (retained snapshots +
    the current manifest), ascending."""
    versions = []
    for name in os.listdir(output_dir):
        m = re.match(r"^lineage\.v(\d+)\.json$", name)
        if m:
            versions.append(int(m.group(1)))
    cur = read_lineage(output_dir).get(META_KEY, {}).get("manifest_version")
    if cur is not None:
        versions.append(cur)
    return sorted(set(versions))


def vacuum_store(
    output_dir: str, retain_snapshots: int = 0, locked: bool = False
) -> list[str]:
    """Reclaim version directories superseded by the committed manifest.

    Copy-on-write MERGE leaves the previous version of every rewritten
    bucket on disk (that is what makes the commit crash-safe); without
    retention, frequent CDC merges grow the store without bound. After
    a successful commit, every ``bucket=N[__vK]`` dir and ``merge_vG``
    generation member NOT referenced by the manifest — nor by one of
    the ``retain_snapshots`` newest manifest snapshots (the Iceberg
    expire-snapshots window; those stay time-travel-readable via
    ``read_output(as_of=...)``) — is superseded or orphaned — delete
    it. Snapshot files older than the window are expired with their
    data. Called automatically post-commit by :func:`merge_elements`;
    safe to invoke any time — a standalone call takes the store lock
    so it can never reclaim a concurrent writer's in-flight staging
    (readers re-resolve paths from the manifest per query).
    """
    if not locked:
        if not read_lineage(output_dir):
            return []
        with _manifest_lock(output_dir):
            return vacuum_store(output_dir, retain_snapshots, locked=True)
    lineage = read_lineage(output_dir)
    if not lineage:
        return []

    def refs_of(manifest: dict) -> set:
        return {
            e["path"] if e.get("path") else f"bucket={b}"
            for b, e in _bucket_items(manifest)
            if e.get("row_count", 0) > 0
        }

    referenced = refs_of(lineage)
    snap_versions = sorted(
        v
        for v in (
            int(m.group(1))
            for m in (
                re.match(r"^lineage\.v(\d+)\.json$", n)
                for n in os.listdir(output_dir)
            )
            if m
        )
    )
    keep = set(snap_versions[len(snap_versions) - retain_snapshots:]) if retain_snapshots else set()
    removed: list[str] = []
    for v in snap_versions:
        snap = _snapshot_path(output_dir, v)
        if v in keep:
            with open(snap) as f:
                referenced |= refs_of(json.load(f))
        else:
            os.unlink(snap)  # expired snapshot
            removed.append(os.path.basename(snap))
    for name in sorted(os.listdir(output_dir)):
        full = os.path.join(output_dir, name)
        if not os.path.isdir(full):
            continue
        if _BUCKET_DIR_RE.match(name):
            if name not in referenced:
                shutil.rmtree(full)
                removed.append(name)
        elif _MERGE_ROOT_RE.match(name):
            for sub in sorted(os.listdir(full)):
                rel = f"{name}/{sub}"
                subfull = os.path.join(full, sub)
                if os.path.isdir(subfull) and rel not in referenced:
                    shutil.rmtree(subfull)
                    removed.append(rel)
            if not any(r.startswith(name + "/") for r in referenced):
                shutil.rmtree(full)  # only _SUCCESS left
    return removed


def upsert_elements(
    spark: SparkSession,
    output_dir: str,
    updates: DataFrame,
    commit_mode: str = "batch",
    retain_snapshots: int = 0,
) -> dict[str, dict]:
    """MERGE: rows matching (doc_id, offset) are replaced, new keys are
    inserted. ``updates`` must carry the extracted-element schema."""
    return merge_elements(
        spark, output_dir, updates=updates, commit_mode=commit_mode,
        retain_snapshots=retain_snapshots,
    )


def delete_elements(
    spark: SparkSession,
    output_dir: str,
    keys: DataFrame,
    commit_mode: str = "batch",
    retain_snapshots: int = 0,
) -> dict[str, dict]:
    """Keyed delete: rows matching (doc_id, offset) are removed."""
    return merge_elements(
        spark, output_dir, delete_keys=keys, commit_mode=commit_mode,
        retain_snapshots=retain_snapshots,
    )


def delete_where(
    spark: SparkSession,
    output_dir: str,
    condition,
    commit_mode: str = "batch",
    retain_snapshots: int = 0,
) -> dict[str, dict]:
    """Predicate-driven delete — the Iceberg ``DELETE WHERE`` analog
    and the reference's bulk-delete flows (``crud.py:474-515``
    ``delete_conversation`` removes every message matching a
    conversation_id). One scan resolves the matching keys (predicates
    push into the parquet scan; ``merge_elements`` persists the key
    frame so the resolve runs once), then the ordinary single-commit
    keyed-delete MERGE rewrites only the affected buckets.

    ``condition`` is a Column predicate or SQL string over the store's
    columns, e.g. ``F.col("kind") == "code"`` or ``"page > 40"``.
    """
    keys = read_output(spark, output_dir).filter(condition).select(*MERGE_KEYS)
    return merge_elements(
        spark, output_dir, delete_keys=keys, commit_mode=commit_mode,
        retain_snapshots=retain_snapshots,
    )


def patch_elements(
    spark: SparkSession,
    output_dir: str,
    patches: DataFrame,
    keep_null: bool = False,
    commit_mode: str = "batch",
    retain_snapshots: int = 0,
) -> dict[str, dict]:
    """Partial-field UPDATE by key — the reference's
    ``crud.py:130-184 update_document`` (ArangoDB ``collection.update``
    with ``merge=True``), as opposed to :func:`upsert_elements`'s
    whole-row REPLACE semantics.

    ``patches`` carries the MERGE_KEYS plus any subset of the store's
    columns; columns absent from ``patches`` keep their stored values.
    For columns present: with ``keep_null=False`` (default) a NULL
    patch value means "keep the stored value" (per-row sparse patches);
    with ``keep_null=True`` the patch value is written as-is, NULLs
    included (ArangoDB ``keepNull=True`` parity — explicitly nulling a
    field).

    ArangoDB ``update`` does NOT insert missing keys (it raises
    DocumentUpdateError); a batch engine fails the whole batch
    atomically, so keys absent from the store raise ValueError before
    anything commits.

    Shape: ONE bucket-pruned read of the affected keys (the same
    pruning as :func:`point_lookup`), one join to materialize the
    patched rows, then the ordinary single-commit MERGE — patch cost
    scales with the touched buckets, never the store.
    """
    for k in MERGE_KEYS:
        if k not in patches.columns:
            raise ValueError(f"patch rows need column {k!r}")
    # duplicate keys would each survive the inner join and ALL be
    # written, breaking the store's key-uniqueness invariant — refuse
    # the batch (same atomic-refusal convention as missing keys)
    dup = (
        patches.groupBy(*MERGE_KEYS)
        .count()
        .filter(F.col("count") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        raise ValueError(
            f"duplicate MERGE key in patch batch (e.g. "
            f"{tuple(dup[0][k] for k in MERGE_KEYS)}) — one patch row "
            "per key"
        )
    # align the patch key dtype with the store's native key type (the
    # bucket pruning inside read_output hashes with it; the joins below
    # then compare like against like instead of relying on implicit
    # widening, which cannot bridge e.g. string vs long)
    key_t = _store_key_type(spark, output_dir, read_lineage(output_dir))
    patches = patches.withColumn("doc_id", F.col("doc_id").cast(key_t))
    key_df = patches.select(*MERGE_KEYS)
    current = (
        read_output(spark, output_dir, for_doc_ids=key_df)
        .join(key_df, on=list(MERGE_KEYS), how="left_semi")
        .persist()  # validated once, then fed to the MERGE write
    )
    try:
        missing = key_df.join(
            current, on=list(MERGE_KEYS), how="left_anti"
        ).count()
        if missing:
            raise ValueError(
                f"{missing} patch key(s) not present in the store "
                "(ArangoDB update does not insert; use upsert_elements)"
            )
        extra = set(patches.columns) - set(current.columns)
        if extra:
            raise ValueError(
                f"patch columns not in store schema: {sorted(extra)}"
            )
        p = patches.alias("p")
        c = current.alias("c")
        patched_cols = []
        for col in current.columns:
            if col in MERGE_KEYS or col not in patches.columns:
                patched_cols.append(F.col(f"c.{col}").alias(col))
            elif keep_null:
                patched_cols.append(F.col(f"p.{col}").alias(col))
            else:
                patched_cols.append(
                    F.coalesce(F.col(f"p.{col}"), F.col(f"c.{col}")).alias(col)
                )
        merged = c.join(p, on=list(MERGE_KEYS), how="inner").select(*patched_cols)
        return merge_elements(
            spark, output_dir, updates=merged, commit_mode=commit_mode,
            retain_snapshots=retain_snapshots,
        )
    finally:
        current.unpersist()


def compact_store(
    spark: SparkSession,
    output_dir: str,
    files_per_bucket: int = 1,
    retain_snapshots: int = 0,
) -> dict[str, dict]:
    """Small-file compaction (Iceberg ``rewrite_data_files`` analog).

    Every copy-on-write MERGE rewrites affected buckets at the write
    parallelism of the moment, so a store that has absorbed many CDC
    batches accumulates shards of small parquet files per bucket — the
    classic small-file problem that throttles scan throughput at scale
    (file-open overhead, tiny row groups, starved vectorized readers).

    Compaction is a content-identical rewrite: union-read every
    non-empty bucket, ``repartition(n, bucket)`` so each bucket's rows
    land in ``files_per_bucket`` task(s), write one new generation via
    dynamic partition overwrite, commit ONE manifest swap, vacuum the
    superseded dirs. Same crash protocol as MERGE: the new generation
    is orphaned (and later reclaimed) unless the commit lands.

    Returns the committed manifest.
    """
    with _manifest_lock(output_dir, wait_s=MERGE_LOCK_WAIT_S):
        return _compact_store_locked(
            spark, output_dir, files_per_bucket, retain_snapshots
        )


def _compact_store_locked(
    spark: SparkSession,
    output_dir: str,
    files_per_bucket: int,
    retain_snapshots: int,
) -> dict[str, dict]:
    lineage = read_lineage(output_dir)
    meta = lineage.get(META_KEY)
    if meta is None:
        raise FileNotFoundError(f"no lineage manifest under {output_dir}")
    n_buckets = meta["n_buckets"]
    loaded = [
        (int(b), e)
        for b, e in _bucket_items(lineage)
        if e.get("status") == "done" and e.get("row_count", 0) > 0
    ]
    if not loaded:
        return lineage
    # gen over ALL buckets (same collision rule as _merge_batch)
    gen = 1 + max(e.get("version", 0) for _, e in _bucket_items(lineage))
    rel_root = f"merge_v{gen}"
    staging = os.path.join(output_dir, rel_root)
    if os.path.isdir(staging):
        shutil.rmtree(staging)
    t0 = time.time()
    current = spark.read.parquet(
        *[_bucket_dir(output_dir, b, e) for b, e in loaded]
    ).withColumn("bucket", bucket_of(F.col("doc_id"), n_buckets))
    n_tasks = max(1, len(loaded) * files_per_bucket)
    (
        _clustered(current.repartition(n_tasks, "bucket"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(staging)
    )
    counts = {
        r["bucket"]: r["count"]
        for r in spark.read.parquet(staging).groupBy("bucket").count().collect()
    }
    wall_ms = int((time.time() - t0) * 1000)
    delta: dict[str, dict] = {}
    for b, old in loaded:
        rc = int(counts.get(b, 0))
        if rc != old.get("row_count"):
            raise RuntimeError(
                f"compaction row-count drift in bucket {b}: "
                f"{old.get('row_count')} -> {rc} — staging left for "
                "inspection, manifest NOT committed"
            )
        rel_path = f"{rel_root}/bucket={b}"
        entry = {
            "status": "done",
            "row_count": rc,
            "bytes": _dir_bytes(os.path.join(output_dir, rel_path)),
            "wall_ms": wall_ms,
            "run_id": old.get("run_id", "compact"),
            "version": gen,
            "path": rel_path,
        }
        delta[str(b)] = entry
        lineage[str(b)] = entry
    _commit_lineage(output_dir, delta, locked=True)
    vacuum_store(output_dir, retain_snapshots=retain_snapshots, locked=True)
    return lineage


def rebucket_store(
    spark: SparkSession,
    output_dir: str,
    new_n_buckets: int,
    run_id: str = "rebucket",
    retain_snapshots: int = 0,
) -> dict[str, dict]:
    """Partition-spec evolution (Iceberg ``REPLACE PARTITION FIELD``
    analog): re-hash the whole store into a different bucket count in
    ONE Spark wave + ONE manifest swap.

    Why it exists: the bucket count is a capacity decision (buckets ≈
    cluster write parallelism ≈ per-partition file sizes); a store that
    grew 100× needs more buckets, and "mixing bucketings would
    silently drop documents" (the resume guard above) means the count
    can only change through a full, committed re-hash. Protocol is the
    batch-MERGE's: allocate the next ``merge_v{gen}`` generation root
    (the dir class vacuum already reclaims), write every row re-hashed
    with ``partitionBy(bucket)``, take per-bucket counts from one
    ``groupBy(bucket).count()``, then swap the manifest — new META
    ``n_buckets``, every new bucket entry pointing into the
    generation, and (on shrink) tombstones for the dropped bucket ids.
    The pre-swap snapshot keeps the old layout time-travel-readable
    (``read_output(as_of=...)``) until ``vacuum_store`` expires it;
    a crash before the swap leaves an orphaned generation dir that the
    next writer's idempotent re-allocation overwrites.

    Runs entirely under the store lock (same reasoning as
    ``merge_elements``: the lock protects the staging directories, not
    just the manifest rename).
    """
    if new_n_buckets < 1:
        raise ValueError("new_n_buckets must be >= 1")
    with _manifest_lock(output_dir, wait_s=MERGE_LOCK_WAIT_S):
        lineage = read_lineage(output_dir)
        meta = lineage.get(META_KEY)
        if not meta:
            raise FileNotFoundError(f"no committed store under {output_dir}")
        old_n = int(meta["n_buckets"])
        if new_n_buckets == old_n:
            raise ValueError(
                f"store already uses n_buckets={old_n}; rebucket is a "
                "full re-hash — refuse the no-op rather than burn a wave"
            )
        gen = 1 + max(e.get("version", 0) for _, e in _bucket_items(lineage))
        rel_root = f"merge_v{gen}"
        staging = os.path.join(output_dir, rel_root)
        if os.path.isdir(staging):
            shutil.rmtree(staging)  # orphan from a crashed attempt
        src_dirs = [
            _bucket_dir(output_dir, b, e)
            for b, e in _bucket_items(lineage)
            if e["status"] == "done" and e.get("row_count", 0) > 0
        ]
        t0 = time.time()
        counts: dict = {}
        if src_dirs:
            schema = _store_schema(lineage)
            reader = spark.read.schema(schema) if schema else spark.read
            rows = reader.parquet(*src_dirs).withColumn(
                "bucket", bucket_of(F.col("doc_id"), new_n_buckets)
            )
            (
                _clustered(rows).write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("bucket")
                .parquet(staging)
            )
            counts = {
                r["bucket"]: r["count"]
                for r in spark.read.parquet(staging)
                .groupBy("bucket")
                .count()
                .collect()
            }
        wall_ms = int((time.time() - t0) * 1000)
        delta: dict[str, dict] = {
            META_KEY: {**meta, "n_buckets": new_n_buckets}
        }
        for b in range(new_n_buckets):
            rc = int(counts.get(b, 0))
            rel_path = f"{rel_root}/bucket={b}"
            delta[str(b)] = {
                "status": "done",
                "row_count": rc,
                "bytes": _dir_bytes(os.path.join(output_dir, rel_path))
                if rc > 0
                else 0,
                "wall_ms": wall_ms,
                "run_id": run_id,
                "version": gen,
                "path": rel_path if rc > 0 else None,
            }
        for b, _e in _bucket_items(lineage):
            if int(b) >= new_n_buckets:
                # shrink: tombstone dropped ids (rc=0 keeps them out of
                # reads and out of vacuum's reference set; the pre-swap
                # snapshot still resolves their old dirs for as_of)
                delta[str(b)] = {
                    "status": "superseded",
                    "row_count": 0,
                    "bytes": 0,
                    "wall_ms": wall_ms,
                    "run_id": run_id,
                    "version": gen,
                    "path": None,
                }
        _commit_lineage(output_dir, delta, locked=True)
        vacuum_store(output_dir, retain_snapshots, locked=True)
        return read_lineage(output_dir)


def store_stats(spark: SparkSession, output_dir: str) -> DataFrame:
    """Store health report (reference ``check_pdf_extractor_db.py:26``
    ``check_database`` — the "does the database exist, what do its
    collections hold" check, re-expressed over the manifest): one row
    per bucket with status / row_count / bytes / generation / path,
    plus a ``__total__`` summary row. Driver-side metadata only — the
    manifest is bounded by n_buckets, no data files are touched (the
    point of keeping counts in the manifest at 100 TB).

    Raises FileNotFoundError when no committed store exists — the
    reference's "database does not exist" branch.
    """
    lineage = read_lineage(output_dir)
    meta = lineage.get(META_KEY)
    if not meta:
        raise FileNotFoundError(f"no committed store under {output_dir}")
    rows = []
    tot_rows = tot_bytes = 0
    for b, e in sorted(_bucket_items(lineage), key=lambda kv: int(kv[0])):
        rows.append(
            (
                str(b),
                e.get("status"),
                int(e.get("row_count", 0)),
                int(e.get("bytes", 0)),
                int(e.get("version", 0)),
                e.get("path") or f"bucket={b}",
            )
        )
        if e.get("status") == "done":
            tot_rows += int(e.get("row_count", 0))
            tot_bytes += int(e.get("bytes", 0))
    rows.append(
        (
            "__total__",
            f"n_buckets={meta['n_buckets']},"
            f"manifest_version={meta.get('manifest_version', 0)}",
            tot_rows,
            tot_bytes,
            max((r[4] for r in rows), default=0),
            output_dir,
        )
    )
    return spark.createDataFrame(
        rows,
        "bucket STRING, status STRING, row_count LONG, bytes LONG, "
        "version LONG, path STRING",
    )
