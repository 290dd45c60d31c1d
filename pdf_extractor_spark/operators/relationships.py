"""Relationship edge collection on the keyed store.

Re-expresses the reference's edge CRUD
(``arangodb/relationships.py:86-165`` ``add_relationship``,
``:167-205`` ``delete_relationship``) and the strategic-creation flow
(``arangodb/agent_decision.py:125-168`` ``create_strategic_relationship``
— its durable effect, once the interactive prompts resolve, is exactly
``add_relationship`` with a validated rationale and confidence score).

ArangoDB stores edges in a dedicated edge collection keyed by ``_key``;
here the edge collection is an ordinary keyed store (``lineage.py``):
``doc_id = "<len(from_id)>:<from_id>-><to_id>"`` (length-prefixed so
the key stays injective when an id itself contains ``->`` — build keys
with ``_edge_key``/``_edge_key_py``, never by hand) and ``offset = 0``
are the MERGE keys, so an edge insert/replace is one copy-on-write
MERGE commit, a
delete is a keyed delete, and reads get bucket pruning + clustered
row-group skipping via ``point_lookup`` for free. Re-adding an existing
pair replaces the edge (ArangoDB upsert-by-key semantics); deleting a
missing edge is an idempotent no-op, matching the reference's
``ignore_missing=True`` "True if already gone" contract.

Validation mirrors the reference (task_relationships.md:72-73 and
relationships.py:118-121): rationale non-empty and, for the strategic
path, at least ``RATIONALE_MIN_LENGTH`` chars; relationship type
non-empty; confidence score in ``CONFIDENCE_SCORE_RANGE``. Validation
happens Spark-side over the whole batch in one pass — invalid rows
raise before anything commits (the reference returns None per bad
call; a batch engine fails the batch atomically instead).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lineage import (
    delete_elements,
    delete_where,
    init_store,
    point_lookup,
    read_lineage,
    upsert_elements,
)

RATIONALE_MIN_LENGTH = 50  # task_relationships.md:72
CONFIDENCE_SCORE_RANGE = (1, 5)  # task_relationships.md:73

EDGE_COLS = ("from_id", "to_id", "rel_type", "rationale", "confidence_score")


def _edge_key(from_col, to_col):
    # length-prefixed so the key is injective: a bare "<from>-><to>"
    # would collide ("a->b", "c") with ("a", "b->c") and a later upsert
    # would silently replace the wrong edge. The prefix pins where
    # from_id ends regardless of "->" inside either id. Twin of
    # _edge_key_py — change both together.
    f = from_col.cast("string")
    t = to_col.cast("string")
    return F.concat(F.length(f).cast("string"), F.lit(":"), f, F.lit("->"), t)


def _edge_key_py(from_id, to_id) -> str:
    # Python twin of _edge_key for driver-side probe keys.
    f, t = str(from_id), str(to_id)
    return f"{len(f)}:{f}->{t}"


def _validated(edges: DataFrame, strategic: bool) -> DataFrame:
    """One validation pass over the batch; raises on the first class of
    violation found (counted Spark-side, no per-row Python)."""
    for c in EDGE_COLS:
        if c not in edges.columns:
            raise ValueError(f"edge rows need column {c!r}")
    min_len = RATIONALE_MIN_LENGTH if strategic else 1
    lo, hi = CONFIDENCE_SCORE_RANGE
    bad = edges.select(
        F.sum(
            (
                F.col("rationale").isNull()
                | (F.length(F.trim("rationale")) < min_len)
            ).cast("long")
        ).alias("bad_rationale"),
        F.sum(
            (
                F.col("rel_type").isNull() | (F.length("rel_type") == 0)
            ).cast("long")
        ).alias("bad_type"),
        F.sum(
            (
                # strategic edges REQUIRE a confidence (the reference's
                # agent loop re-prompts until a 1-5 integer is given,
                # agent_decision.py:154-165); non-strategic edges may
                # omit it but a present value must be in range
                (
                    F.lit(strategic) & F.col("confidence_score").isNull()
                )
                | (
                    F.col("confidence_score").isNotNull()
                    & ~F.col("confidence_score").between(lo, hi)
                )
            ).cast("long")
        ).alias("bad_confidence"),
    ).first()
    for field in ("bad_rationale", "bad_type", "bad_confidence"):
        if bad[field]:
            raise ValueError(
                f"{bad[field]} edge row(s) rejected: {field} "
                f"(rationale >= {min_len} chars, non-empty type, "
                f"confidence in {CONFIDENCE_SCORE_RANGE})"
            )
    return edges.select(
        _edge_key(F.col("from_id"), F.col("to_id")).alias("doc_id"),
        F.lit(0).cast("int").alias("offset"),
        F.col("from_id").cast("string"),
        F.col("to_id").cast("string"),
        "rel_type", "rationale",
        F.col("confidence_score").cast("int"),
    )


def add_relationships(
    spark: SparkSession,
    store_dir: str,
    edges: DataFrame,
    strategic: bool = False,
    n_buckets: int = 16,
) -> dict:
    """Insert-or-replace a batch of relationship edges in one MERGE
    commit. ``strategic=True`` applies the agent path's stricter
    rationale bar (agent_decision.py:154-156). Bootstraps the edge
    store on first use (CTAS), then MERGEs."""
    rows = _validated(edges, strategic)
    if not read_lineage(store_dir):
        return init_store(spark, store_dir, rows, n_buckets=n_buckets)
    return upsert_elements(spark, store_dir, rows)


def delete_relationships(
    spark: SparkSession, store_dir: str, pairs: DataFrame
) -> dict:
    """Keyed edge delete by (from_id, to_id); missing edges are a
    no-op (reference ignore_missing=True, relationships.py:188)."""
    keys = pairs.select(
        _edge_key(F.col("from_id"), F.col("to_id")).alias("doc_id"),
        F.lit(0).cast("int").alias("offset"),
    )
    return delete_elements(spark, store_dir, keys)


def delete_documents_cascade(
    spark: SparkSession,
    doc_store_dir: str,
    edge_store_dir: str,
    doc_ids: list,
    delete_edges: bool = True,
) -> dict:
    """Cascade vertex delete: remove documents AND their incident
    edges — the reference's ``lessons.py:189-226`` ``delete_lesson``
    (``delete_edges=True`` runs ``FILTER edge._from == @vid OR
    edge._to == @vid REMOVE edge`` before deleting the vertex),
    generalized to a batch of ids.

    Two idempotent single-commit MERGEs, edges first (the reference's
    order): a crash between them leaves no dangling edge — the re-run
    converges to the same state. Not one atomic commit across the two
    stores (same disclosed protocol as streaming CDC); each commit is
    exactly-once within its store. Missing vertices/edges are no-ops
    (``ignore_missing=True`` parity). The edge cleanup's predicate
    pushes ``from_id``/``to_id`` IN-filters into the edge scan; the
    vertex delete resolves keys through a pushed ``doc_id`` filter and
    rewrites only the affected buckets.
    """
    ids = [str(d) for d in doc_ids]
    out: dict = {}
    if delete_edges and read_lineage(edge_store_dir):
        out["edges"] = delete_where(
            spark,
            edge_store_dir,
            F.col("from_id").isin(ids) | F.col("to_id").isin(ids),
        )
    out["documents"] = delete_where(
        spark, doc_store_dir, F.col("doc_id").isin(ids)
    )
    return out


def get_relationships(
    spark: SparkSession,
    store_dir: str,
    pairs: Optional[list] = None,
) -> DataFrame:
    """Edge reads. With ``pairs`` (list of (from_id, to_id)) this is a
    primary-key fetch — bucket-pruned, row-group-skipping
    (``point_lookup``); without, the full edge scan."""
    if pairs is None:
        from ..lineage import read_output

        return read_output(spark, store_dir)
    keys = [_edge_key_py(f, t) for f, t in pairs]
    return point_lookup(spark, store_dir, keys)


def relationships_of(
    edges: DataFrame,
    vertex: str,
    direction: str = "any",
    types: Optional[list] = None,
) -> DataFrame:
    """1-hop incident-edge fetch — the reference's
    ``get_relationships`` (arangodb/relationship_api.py:75-103):
    ``FOR v, e IN 1..1 {direction} @start GRAPH ... FILTER e.type IN
    [...] RETURN e``, with the same direction validation. OUTBOUND
    matches ``_from``, INBOUND matches ``_to``, ANY either.

    Scale shape: a point predicate on ``_from``/``_to`` (plus the
    optional ``type IN`` filter) pushed straight to the scan — on the
    keyed edge store an OUTBOUND fetch can go through ``point_lookup``
    bucket pruning instead; ANY needs both sides, i.e. one pruned read
    per direction unioned."""
    d = direction.lower()
    if d not in ("outbound", "inbound", "any"):
        raise ValueError(f"Invalid direction: {direction}")
    if d == "outbound":
        cond = F.col("_from") == vertex
    elif d == "inbound":
        cond = F.col("_to") == vertex
    else:
        cond = (F.col("_from") == vertex) | (F.col("_to") == vertex)
    out = edges.filter(cond)
    if types is not None:
        out = out.filter(F.col("type").isin(list(types)))
    return out
