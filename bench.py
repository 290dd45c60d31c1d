#!/usr/bin/env python
"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR.

Prints exactly ONE JSON line on stdout:
  {"metric": ..., "value": <total_sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "docs_per_sec": ...}

Logs go to stderr. Env: SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1), SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pdf_extractor_spark.analytics import QUERIES
    from pdf_extractor_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    n_docs_extracted = 0
    extract_wall = 0.0
    for name, spec in QUERIES.items():
        if not spec.headline:
            continue
        t0 = time.time()
        df = spec.fn(spark, sf_dir)
        if name == "extract_elements_flat":
            # throughput metric = documents fully extracted per second
            n_docs_extracted = df.select("doc_id").distinct().count()
        else:
            df.count()  # force full evaluation
        wall = time.time() - t0
        timings[name] = round(wall, 3)
        if name == "extract_elements_flat":
            extract_wall = wall
        log(f"{name}: {wall:.2f}s")
    spark.stop()

    total = round(sum(timings.values()), 3)
    docs_per_sec = (
        round(n_docs_extracted / extract_wall, 2) if extract_wall else None
    )
    print(
        json.dumps(
            {
                "metric": "headline query wall time (extraction + analytics suite)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "docs_per_sec": docs_per_sec,
                "n_docs_extracted": n_docs_extracted,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
