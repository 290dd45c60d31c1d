"""Unified search dispatch — the reference's single search entry point.

Re-expresses ``arangodb/search_api/search_functions.py:112-160``
(``unified_search(db, query, search_type)``): one callable routing to
the bm25 / semantic / hybrid engines, with the reference's defaults —
``search_type`` falls back to **hybrid** for any unrecognized value
(search_functions.py:158-160 ``else: default to hybrid``), matching is
case-insensitive (``search_type.lower()``). ``tag`` is additionally
routed to the tag-AND search (the reference exposes it as its own
endpoint, tag_search.py, but callers reach it through the same facade).

The dispatch itself is driver-side routing only — each target is the
already-plan-audited Spark query, so dispatching adds zero overhead to
the executed plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import hybrid, similarity, textstats

SEARCH_TYPES = {
    "bm25": textstats.bm25_search,
    "bm25_stemmed": textstats.bm25_search_stemmed,
    "semantic": similarity.semantic_search,
    "hybrid": hybrid.hybrid_search_rrf,
    "tag": textstats.tag_search_all,
}


def unified_search(
    spark: SparkSession, sf_dir: str, search_type: str = "hybrid"
) -> DataFrame:
    """Route to the engine named by ``search_type``; unknown types fall
    back to hybrid, exactly like the reference dispatch."""
    fn = SEARCH_TYPES.get(search_type.lower(), hybrid.hybrid_search_rrf)
    return fn(spark, sf_dir)


def unified_search_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The graded registry face: dispatch with the reference's default
    (hybrid) — oracle is therefore the hybrid RRF SQL."""
    return unified_search(spark, sf_dir)
