"""Filtered message search + staged-escalation solver.

Reference behaviors under test:
* message_search.py:32-100 — attribute filters narrow candidates but
  BM25 statistics stay view-global (scores identical to the unfiltered
  engine for the same doc).
* advanced_query_solution.py:39-152 — three attempts with count gates:
  direct-sufficient stops, short direct escalates through relationship
  edges (similar before shared_topic, flat 0.7 score, cap 5), and an
  empty direct+related falls through to the expanded search.
"""

from pyspark.sql import functions as F

from pdf_extractor_spark.analytics.search_api import (
    MSG_FILTER_LANG,
    MSG_FILTER_NCHARS,
    MSG_FILTER_SOURCE,
    MSG_FILTER_TOP_N,
    search_messages_filtered,
)
from pdf_extractor_spark.analytics.solve import (
    SOLVE_DIRECT_TOP,
    SOLVE_MIN_RESULTS,
    SOLVE_RELATED_CAP,
    SOLVE_RELATED_SCORE,
    solve_query_escalation,
)
from pdf_extractor_spark.analytics.textstats import BM25_TERMS, bm25_scores
from pdf_extractor_spark.analytics.base import DUP_ID_OFFSET, load

SF = "/root/testdata/sf0.001"


def test_filtered_search_scores_are_view_global(spark):
    """Every hit satisfies the filters AND scores exactly what the
    unfiltered engine gives that doc — the filter narrows candidates,
    it must not re-derive corpus statistics (bm25.py:48-59 applies
    FILTER after SEARCH; BM25() comes from the whole view)."""
    got = search_messages_filtered(spark, SF).collect()
    assert 0 < len(got) <= MSG_FILTER_TOP_N

    docs = {
        r["doc_id"]: r
        for r in load(spark, SF, "documents")
        .filter(F.col("doc_id").isin([r["doc_id"] for r in got]))
        .collect()
    }
    lo, hi = MSG_FILTER_NCHARS
    for r in got:
        d = docs[r["doc_id"]]
        assert d["source"] == MSG_FILTER_SOURCE
        assert d["lang"] == MSG_FILTER_LANG
        assert lo <= d["n_chars"] <= hi
        toks = d["text"].split()
        assert all(t in toks for t in BM25_TERMS)  # ALL IN doc

    global_scores = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(load(spark, SF, "documents"))
        .filter(F.col("doc_id").isin(list(docs)))
        .collect()
    }
    for r in got:
        assert r["bm25"] == global_scores[r["doc_id"]]

    # descending, doc_id-tiebroken, like the reference's SORT…LIMIT
    keys = [(-r["bm25"], r["doc_id"]) for r in got]
    assert keys == sorted(keys)


def test_solve_query_escalates_through_relationships(spark):
    """Fixture path: the 0.95 bar keeps only the query's own document
    (< 3 results), so the solver expands through relationship edges —
    the exact-text duplicate first (similar), then shared-topic
    neighbors — and stops with >= 3 combined (no expanded_search)."""
    rows = solve_query_escalation(spark, SF).collect()
    by_strategy = {}
    for r in rows:
        by_strategy.setdefault(r["strategy"], []).append(r)

    direct = by_strategy["direct_search"]
    assert 0 < len(direct) < SOLVE_MIN_RESULTS  # escalation triggered
    related = by_strategy["graph_traversal"]
    assert 0 < len(related) <= SOLVE_RELATED_CAP
    assert "expanded_search" not in by_strategy  # combined >= 3 stopped it

    seed = direct[0]["doc_id"]
    sim = [r for r in related if r["rel_type"] == "SIMILAR"]
    assert [r["doc_id"] for r in sim] == [seed + DUP_ID_OFFSET]
    assert all(r["score"] == SOLVE_RELATED_SCORE for r in related)
    assert all(r["seed_doc_id"] == seed for r in related)
    # no doc appears under two strategies (result_keys dedup)
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))


def test_solve_query_direct_sufficient_skips_expansion(spark):
    """Reference line 63: >= 3 direct results return immediately —
    with a low bar the direct stage fills and both later stages'
    guards kill their rows."""
    rows = solve_query_escalation(spark, SF, direct_min=0.2).collect()
    assert len(rows) == SOLVE_DIRECT_TOP
    assert {r["strategy"] for r in rows} == {"direct_search"}


def test_solve_query_falls_through_to_expanded(spark):
    """With an unreachable direct bar there are no seeds, so no
    relationship results either — the final attempt (top-10 expanded
    search, line 137) is all that answers."""
    rows = solve_query_escalation(spark, SF, direct_min=1.01).collect()
    assert rows
    assert {r["strategy"] for r in rows} == {"expanded_search"}


def test_relationship_candidates_score_pairs_of_hybrid_topn(spark):
    """agent_decision.py:43-105: every proposal pairs two hybrid top-N
    hits with the higher-ranked doc first; scores recompute from the
    reference formula (rrf proximity + capped shared-tag bonus)."""
    import math

    from pdf_extractor_spark.analytics.hybrid import hybrid_search_rrf
    from pdf_extractor_spark.analytics.solve import relationship_candidates

    hyb = hybrid_search_rrf(spark, SF).collect()
    rrf = {r["doc_id"]: r["rrf_score"] for r in hyb}
    rank = {
        r["doc_id"]: i
        for i, r in enumerate(
            sorted(hyb, key=lambda r: (-r["rrf_score"], r["doc_id"]))
        )
    }
    texts = {
        r["doc_id"]: r["text"]
        for r in load(spark, SF, "documents")
        .filter(F.col("doc_id").isin(list(rrf)))
        .collect()
    }

    got = relationship_candidates(spark, SF).collect()
    assert got
    for r in got:
        assert rank[r["from_doc_id"]] < rank[r["to_doc_id"]]
        assert r["suggested_type"] in {
            "SIMILAR", "SHARED_TOPIC", "REFERENCES", "PREREQUISITE", "CAUSAL"
        }
        shared = len(
            set(texts[r["from_doc_id"]].split())
            & set(texts[r["to_doc_id"]].split())
        )
        c1 = texts[r["from_doc_id"]].lower()
        c2 = texts[r["to_doc_id"]].lower()
        cite = "cite" in c1 and str(r["to_doc_id"]) in c1
        prereq = "basic" in c1 and "advanced" in c2
        causal = "cause" in c1 and "effect" in c2
        bonus = 0.3 if cite else 0.2 if prereq else 0.2 if causal else 0.0
        want = (
            max(0.0, 1.0 - abs(rrf[r["from_doc_id"]] - rrf[r["to_doc_id"]]))
            + (min(shared * 0.1, 0.5) if shared else 0.0)
            + bonus
        )
        assert r["score"] == math.floor(want * 10000) / 10000
        if r["suggested_type"] == "SHARED_TOPIC":
            assert r["explanation"] == f"Shared {shared} tags."
    keys = [(-r["score"], r["from_doc_id"], r["to_doc_id"]) for r in got]
    assert keys == sorted(keys)


def test_relationship_need_score_decomposes(spark):
    """agent_decision.py:27-41: the one-row heuristic equals the
    hand-computed sum of its four signals for the fixture query."""
    import math

    from pdf_extractor_spark.analytics.hybrid import hybrid_search_rrf
    from pdf_extractor_spark.analytics.solve import (
        SOLVE_QUERY_TEXT,
        _static_need,
        relationship_need_score,
    )

    hyb = hybrid_search_rrf(spark, SF).collect()
    row, = relationship_need_score(spark, SF).collect()
    assert row["n_results"] == len(hyb)
    top = max(r["rrf_score"] for r in hyb)
    assert row["top_score"] == top
    want = _static_need(SOLVE_QUERY_TEXT)
    if len(hyb) < 3:
        want += 0.3
    if top < 0.5:
        want += 0.2
    want = min(want, 1.0)
    assert row["need_score"] == math.floor(want * 10000) / 10000


def test_solve_query_use_relationships_false_returns_direct_only(spark):
    """Reference lines 72-80: use_relationships=False returns the
    direct results as-is, however few."""
    rows = solve_query_escalation(spark, SF, use_relationships=False).collect()
    assert rows
    assert {r["strategy"] for r in rows} == {"direct_search"}
    assert len(rows) < SOLVE_MIN_RESULTS


def test_conversation_context_chain_semantics(spark):
    """Context = the 3 messages on each side of the target along the
    per-conversation NEXT chain (reference conversation_context.py:
    get_previous/get_next via 1..3 traversal) + DISTINCT referred
    docs; recomputed independently from the raw events parquet."""
    import pyarrow.parquet as pq

    from pdf_extractor_spark.analytics.search_api import (
        CONV_USER,
        CTX_DEPTH,
        CTX_DOC_MOD,
        CTX_TARGET_RANK,
        conversation_context,
    )

    rows = conversation_context(spark, SF).collect()

    t = pq.read_table(
        SF + "/events.parquet", columns=["event_id", "ts", "user_id"]
    )
    conv = sorted(
        (ts, e)
        for e, ts, u in zip(
            t.column("event_id").to_pylist(),
            t.column("ts").to_pylist(),
            t.column("user_id").to_pylist(),
        )
        if u == CONV_USER
    )
    chain = [e for _, e in conv]
    r0 = CTX_TARGET_RANK - 1  # rank is 1-based
    want_prev = chain[max(r0 - CTX_DEPTH, 0) : r0]
    want_next = chain[r0 + 1 : r0 + 1 + CTX_DEPTH]

    by_role = {}
    for r in rows:
        by_role.setdefault(r["role"], []).append(r)
    assert [r["event_id"] for r in by_role["target"]] == [chain[r0]]
    assert sorted(r["event_id"] for r in by_role["previous"]) == sorted(want_prev)
    assert sorted(r["event_id"] for r in by_role["next"]) == sorted(want_next)
    # depth = chain distance from the target
    for r in by_role["previous"] + by_role["next"]:
        assert abs(chain.index(r["event_id"]) - r0) == r["depth"]
    # related docs = DISTINCT refs of the whole context window
    ctx_ids = [chain[r0]] + want_prev + want_next
    want_docs = sorted({e % CTX_DOC_MOD for e in ctx_ids})
    assert sorted(r["doc_id"] for r in by_role["document"]) == want_docs
    assert all(r["doc_lang"] is not None for r in by_role["document"])
