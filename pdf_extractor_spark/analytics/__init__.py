"""Analytics / query layer over the driver's synthetic tables.

Every query here exists twice, by design:

* a Spark DataFrame builder ``(spark, sf_dir) -> DataFrame`` — the
  engine under test, written Catalyst-first (native functions, no
  per-row Python except where explicitly noted);
* an ANSI-SQL oracle string runnable by DuckDB on the same parquet —
  the independent referee the driver executes side-by-side.

The registry :data:`QUERIES` is consumed by ``__spark_entry__.py``.
"""

from __future__ import annotations

from .registry import QUERIES, QuerySpec, oracle_map, query_map

__all__ = ["QUERIES", "QuerySpec", "query_map", "oracle_map"]
