"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship extraction pipeline at
sf0.001; ``queries()``/``oracle_sql()`` expose every implemented
operator from SURVEY.md §2 plus the training-pipeline suites (dedup,
similarity search, text analysis, multimodal plumbing) with DuckDB
oracles wherever the op is ANSI-SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pdf_extractor_spark.analytics import oracle_map, query_map


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full span-extraction pipeline over the deterministic
    interleaved corpus derived from sf0.001 doc_ids."""
    from pdf_extractor_spark.analytics.extraction_queries import extract_elements_flat

    return extract_elements_flat(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return query_map()


def oracle_sql() -> dict[str, str]:
    return oracle_map()
