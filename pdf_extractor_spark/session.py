"""SparkSession factory with scale-oriented defaults.

Settings chosen for the 100 TB design point (SURVEY.md §4 "custom Spark
work"): AQE on (runtime re-plan + skew-join splitting), Arrow transfer
on with bounded batch sizes so a mega-document's span array cannot blow
an executor's Python worker (reference analog: the 1 GiB memory guard,
table_extraction.py:59).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession


def _package_zip() -> str:
    """Zip this package so executors can import it — the programmatic
    equivalent of ``spark-submit --py-files`` (north rule deployment
    mode). Without this, UDFs unpickle-fail on workers whenever the
    driver wasn't launched from the repo root."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join(tempfile.gettempdir(), "pdf_extractor_spark_pyfiles.zip")
    with zipfile.ZipFile(out, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    zf.write(full, rel)
    return out


def ensure_pyfiles(spark: SparkSession) -> None:
    """Ship this package to executors on an externally-created session
    (the driver contract hands us its own SparkSession). Idempotent —
    repeat addPyFile calls with the same path are no-ops."""
    zip_path = _package_zip()
    sc = spark.sparkContext
    # check the registry instead of classifying exception text (message
    # substrings are version-fragile and can swallow real failures):
    # if our zip is already shipped, this is the benign duplicate case
    zip_name = os.path.basename(zip_path)
    try:
        listed = list(sc.listFiles)
    except Exception:  # noqa: BLE001 — API absent on exotic backends
        listed = []
    if any(f.endswith(zip_name) for f in listed):
        return
    sc.addPyFile(zip_path)


def get_spark(
    app_name: str = "pdf_extractor_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    arrow_batch_rows: int = 1024,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or int(cpus) if str(cpus).isdigit() else 32
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # bound Arrow batches: mega-doc span arrays are large per row, so
        # cap rows-per-batch (SURVEY.md §4 item 3). 1024 rows × the
        # scalar path's 5k-span ceiling ≈ 320 MB worst-case batch per
        # task (~2× in flight with the copy) — fits a 4 GB executor
        # core; docs above the ceiling take the explode/applyInPandas
        # skew path instead. Measured: 1024 is ~35% faster than 256 on
        # the sf0.1 corpus (less per-batch overhead); 4096 regresses.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch_rows))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.addPyFile(_package_zip())
    return spark
