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
from pyspark.sql import functions as F

from . import hybrid, similarity, textstats
from .base import load

SEARCH_TYPES = {
    "bm25": textstats.bm25_search,
    "bm25_stemmed": textstats.bm25_search_stemmed,
    "semantic": similarity.semantic_search,
    "hybrid": hybrid.hybrid_search_rrf,
    "tag": textstats.tag_search_all,
}


def validate_search_params(
    query_text: str | None, top_n: int, initial_k: int
) -> tuple[str, int, int]:
    """Reference ``search_api/utils.py:12-34`` verbatim semantics:
    empty/None query becomes "", non-positive top_n defaults to 5,
    non-positive initial_k defaults to 20. Applied by unified_search
    before dispatch so a caller's junk parameters degrade exactly as
    the reference's do."""
    if not query_text:
        query_text = ""
    if top_n <= 0:
        top_n = 5
    if initial_k <= 0:
        initial_k = 20
    return query_text, top_n, initial_k


def unified_search(
    spark: SparkSession,
    sf_dir: str,
    search_type: str = "hybrid",
    query: str | None = None,
    top_n: int = 10,
) -> DataFrame:
    """Route to the engine named by ``search_type``; unknown types fall
    back to hybrid, exactly like the reference dispatch.

    ``query`` carries an arbitrary user query string for the lexical
    engines: ``bm25`` tokenizes it lowercase-on-whitespace (the raw
    analyzer), ``bm25_stemmed`` runs it through the full text_en
    analyzer — both sides of the match see the same analysis, as in
    ArangoSearch. The vector engines (semantic/hybrid) key on the
    query EMBEDDING (vec_id 0 in the synthetic corpus) — a text query
    would need the reference's external embedding service, so ``query``
    is ignored there, as is ``top_n`` for engines with reference-pinned
    result sizes. With ``query=None`` every engine runs its graded
    fixture plan unchanged.
    """
    from pyspark.sql import functions as F

    from .base import load

    st = search_type.lower()
    if query is not None and st in ("bm25", "bm25_stemmed"):
        query, top_n, _ = validate_search_params(query, top_n, 20)
        docs = load(spark, sf_dir, "documents")
        if st == "bm25":
            terms = [t for t in query.lower().split() if t]
            if not terms:
                raise ValueError("empty query")
            scored = textstats.bm25_scores(docs, terms)
        else:
            scored = textstats.bm25_scores_stemmed(docs, query)
        return scored.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(top_n)
    fn = SEARCH_TYPES.get(st, hybrid.hybrid_search_rrf)
    return fn(spark, sf_dir)


def unified_search_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The graded registry face: dispatch with the reference's default
    (hybrid) — oracle is therefore the hybrid RRF SQL."""
    return unified_search(spark, sf_dir)


# ---------------------------------------------------------------------------
# Multi-collection merge (search_functions.py:146-199): run the search
# per collection — each collection scores against ITS OWN corpus
# statistics, exactly like per-collection ArangoSearch views — then
# extend, sort by score descending, truncate to top_n. The "collections"
# here are the deterministic halves of the documents table by source
# (src0-src9 vs src10-src19), the stand-in for DOC vs MESSAGE
# collections.
# ---------------------------------------------------------------------------

MULTI_TOP_N = 10


# ---------------------------------------------------------------------------
# Filtered message search (message_search.py:32-100 search_messages):
# attribute predicates (conversation_id / message_type / date_range) are
# applied as a FILTER after the SEARCH clause in the reference AQL
# (bm25.py:48-59) — BM25 statistics therefore stay VIEW-GLOBAL; the
# filter narrows candidates, it does not re-derive df/avgdl/N. The
# synthetic stand-ins: source == conversation_id, lang == message_type,
# n_chars range == date_range (the only range-typed attribute). The
# candidate clause itself keeps the reference's `TOKENS(q) ALL IN doc`
# containment (all query terms present).
#
# Scale shape: the scored side reuses the cached (doc_id, dl, tf_*)
# projection; the candidate side is a fresh scan whose source/lang/
# n_chars predicates push into parquet; the equi-join on doc_id
# broadcasts the (small) filtered side under AQE.
# ---------------------------------------------------------------------------

MSG_FILTER_SOURCE = "src3"  # conversation_id stand-in
MSG_FILTER_LANG = "en"  # message_type stand-in (USER/AGENT/SYSTEM)
MSG_FILTER_NCHARS = (100, 500)  # date_range stand-in (range predicate)
MSG_FILTER_TOP_N = 5  # reference default top_n=5 (message_search.py:37)


def search_messages_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from .base import load
    from .textstats import BM25_TERMS, bm25_scores

    docs = load(spark, sf_dir, "documents")
    scored = bm25_scores(docs)  # view-global corpus statistics
    toks = F.split(F.col("text"), r"\s+")
    cond = (
        (F.col("source") == MSG_FILTER_SOURCE)
        & (F.col("lang") == MSG_FILTER_LANG)
        & F.col("n_chars").between(*MSG_FILTER_NCHARS)
    )
    for t in BM25_TERMS:  # SEARCH ... ALL IN doc (bm25.py:50)
        cond = cond & F.array_contains(toks, t)
    cand = docs.filter(cond).select("doc_id")
    return (
        scored.join(cand, "doc_id")
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(MSG_FILTER_TOP_N)
    )


def _messages_filtered_sql() -> str:
    from .textstats import BM25_SCORES_CTE, BM25_TERMS

    contains = "".join(
        " AND len(list_filter(string_split_regex(text, '\\s+'),"
        f" t -> t = '{t}')) > 0"
        for t in BM25_TERMS
    )
    lo, hi = MSG_FILTER_NCHARS
    return f"""
WITH {BM25_SCORES_CTE},
cand AS (
  SELECT doc_id FROM documents
  WHERE source = '{MSG_FILTER_SOURCE}' AND lang = '{MSG_FILTER_LANG}'
    AND n_chars BETWEEN {lo} AND {hi}{contains}
)
SELECT b.doc_id, b.bm25 FROM bm25_scored b JOIN cand USING (doc_id)
ORDER BY b.bm25 DESC, b.doc_id ASC
LIMIT {MSG_FILTER_TOP_N}
"""


SEARCH_MESSAGES_FILTERED_SQL = _messages_filtered_sql()


def unified_search_collections(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from .base import load
    from .textstats import bm25_scores

    docs = load(spark, sf_dir, "documents")
    coll_a = docs.filter(F.length("source") == 4)   # src0..src9
    coll_b = docs.filter(F.length("source") == 5)   # src10..src19
    merged = bm25_scores(coll_a).unionByName(bm25_scores(coll_b))
    return merged.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(MULTI_TOP_N)


def _collections_sql() -> str:
    from .textstats import bm25_collection_cte

    return f"""
WITH {bm25_collection_cte('a', 'length(source) = 4')},
{bm25_collection_cte('b', 'length(source) = 5')}
SELECT doc_id, bm25 FROM (
  SELECT * FROM a_scored UNION ALL SELECT * FROM b_scored
)
ORDER BY bm25 DESC, doc_id ASC
LIMIT {MULTI_TOP_N}
"""


UNIFIED_SEARCH_COLLECTIONS_SQL = _collections_sql()


# ---------------------------------------------------------------------------
# Conversation context (conversation_context.py:32-203):
# get_conversation_context = previous messages (1..max_depth INBOUND
# along NEXT edges, :98-100) + next messages (OUTBOUND, :139-141) +
# related documents (1-hop REFERS_TO from every context message,
# DISTINCT, :184-188). The reference's NEXT edge collection is a linear
# reply chain per conversation, so the Spark-first traversal is rank
# arithmetic over ONE window (row_number per conversation, |Δrank| <=
# max_depth) instead of an iterated self-join — same result set, no
# join at all; the general 1..n-hop machinery stays in operators/
# graph.py for non-chain graphs. Synthetic stand-ins: conversation =
# events.user_id, message = event (ordered by ts, event_id), NEXT =
# consecutive events, REFERS_TO doc = event_id % 500 (doc_ids 0..499
# exist at every SF). The reference's SORT p.vertices[0].timestamp
# (:100) orders by the traversal START vertex — constant across rows,
# a no-op quirk we replace with deterministic (role, depth) order.
#
# Scale shape: one pushed user_id predicate into the scan, one window
# over the (small) conversation, one broadcast join to documents for
# the related-doc fetch. No shuffle beyond the single conversation's
# window.
# ---------------------------------------------------------------------------

CONV_USER = 3  # conversation_id stand-in
CTX_TARGET_RANK = 5  # the message whose context is assembled
CTX_DEPTH = 3  # reference default max_depth=3 (conversation_context.py:36)
CTX_DOC_MOD = 500  # REFERS_TO stand-in: doc_id = event_id % 500


def conversation_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from .base import load

    ev = load(spark, sf_dir, "events").filter(F.col("user_id") == CONV_USER)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = ev.select(
        "event_id", (F.row_number().over(w) - CTX_TARGET_RANK).alias("delta")
    ).filter(F.abs("delta") <= CTX_DEPTH)
    msgs = ranked.select(
        F.when(F.col("delta") == 0, "target")
        .when(F.col("delta") < 0, "previous")
        .otherwise("next")
        .alias("role"),
        F.abs("delta").cast("int").alias("depth"),
        "event_id",
        F.lit(None).cast("long").alias("doc_id"),
        F.lit(None).cast("string").alias("doc_lang"),
    )
    docs = load(spark, sf_dir, "documents")
    related = (
        ranked.select((F.col("event_id") % CTX_DOC_MOD).alias("doc_id"))
        .distinct()
        .join(F.broadcast(docs.select("doc_id", "lang")), "doc_id")
        .select(
            F.lit("document").alias("role"),
            F.lit(None).cast("int").alias("depth"),
            F.lit(None).cast("long").alias("event_id"),
            "doc_id",
            F.col("lang").alias("doc_lang"),
        )
    )
    return msgs.unionByName(related).orderBy(
        "role",
        F.col("depth").asc_nulls_last(),
        F.col("event_id").asc_nulls_last(),
        F.col("doc_id").asc_nulls_last(),
    )


CONVERSATION_CONTEXT_SQL = f"""
WITH ranked AS (
  SELECT event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           - {CTX_TARGET_RANK} AS delta
  FROM events
  WHERE user_id = {CONV_USER}
),
ctx AS (SELECT * FROM ranked WHERE abs(delta) <= {CTX_DEPTH}),
msgs AS (
  SELECT CASE WHEN delta = 0 THEN 'target'
              WHEN delta < 0 THEN 'previous'
              ELSE 'next' END AS role,
         CAST(abs(delta) AS INT) AS depth,
         event_id,
         CAST(NULL AS BIGINT) AS doc_id,
         CAST(NULL AS VARCHAR) AS doc_lang
  FROM ctx
),
related AS (
  SELECT DISTINCT 'document' AS role,
         CAST(NULL AS INT) AS depth,
         CAST(NULL AS BIGINT) AS event_id,
         d.doc_id,
         d.lang AS doc_lang
  FROM (SELECT DISTINCT event_id % {CTX_DOC_MOD} AS ref FROM ctx) r
  JOIN documents d ON d.doc_id = r.ref
)
SELECT * FROM (SELECT * FROM msgs UNION ALL SELECT * FROM related)
ORDER BY role, depth NULLS LAST, event_id NULLS LAST, doc_id NULLS LAST
"""


# ---------------------------------------------------------------------------
# Graded query: lessons_by_keyword
# (reference llm_integration/utils/db/arango_utils.py:243-302
#  query_lessons_by_keyword, which is also query_lessons_by_concept
#  :304-320 verbatim — multi-keyword OR of case-insensitive LIKEs over
#  three fields, with LIKE wildcards in the keyword escaped so they
#  match literally, :266)
# ---------------------------------------------------------------------------

# the fixture keyword list: 'val_e' carries the reference's escaping
# surface — an UNescaped '_' would wildcard-match 'value' everywhere,
# escaped it matches nothing; 'SRC1' exercises LOWER on both sides
LESSON_KEYWORDS = ["merge", "val_e", "SRC1"]
LESSON_LIMIT = 10


def lessons_by_keyword(spark: SparkSession, sf_dir: str) -> DataFrame:
    """query_lessons_by_keyword over documents standing in for
    lessons_learned (text≈lesson, source≈category, lang≈identifier).

    The reference's bare LIMIT without SORT is nondeterministic AQL;
    graded as ORDER BY doc_id LIMIT (deterministic stand-in, same
    policy as the constant-sort traversal quirk in docs/PARITY.md).
    Map-only LIKE scan + TakeOrdered — no shuffle beyond top-k.
    """
    docs = load(spark, sf_dir, "documents")

    def _pat(kw: str) -> str:
        safe = kw.replace("%", r"\%").replace("_", r"\_")
        return f"%{safe.lower()}%"

    def _hit(kw: str):
        p = _pat(kw)
        return (
            F.lower("text").like(p)
            | F.lower("source").like(p)
            | F.lower("lang").like(p)
        )

    matched = F.array_compact(
        F.array(*[F.when(_hit(kw), F.lit(kw)) for kw in LESSON_KEYWORDS])
    )
    return (
        docs.select("doc_id", "lang", "source", matched.alias("matched_kws"))
        .filter(F.size("matched_kws") > 0)
        .orderBy("doc_id")
        .limit(LESSON_LIMIT)
    )


def _lessons_kw_sql() -> str:
    hits = []
    for kw in LESSON_KEYWORDS:
        safe = kw.replace("%", r"\%").replace("_", r"\_").lower()
        p = f"'%{safe}%'"
        hits.append(
            f"CASE WHEN lower(text) LIKE {p} ESCAPE '\\' "
            f"OR lower(source) LIKE {p} ESCAPE '\\' "
            f"OR lower(lang) LIKE {p} ESCAPE '\\' THEN '{kw}' END"
        )
    arr = "[" + ", ".join(hits) + "]"
    return f"""
SELECT doc_id, lang, source, matched_kws
FROM (
  SELECT doc_id, lang, source,
         list_filter({arr}, x -> x IS NOT NULL) AS matched_kws
  FROM documents
)
WHERE len(matched_kws) > 0
ORDER BY doc_id
LIMIT {LESSON_LIMIT}
"""


LESSONS_BY_KEYWORD_SQL = _lessons_kw_sql()


# ---------------------------------------------------------------------------
# Lesson-insert validation + embedding-text assembly (reference
# ``arangodb/lessons_crud.py:46-113`` add_lesson): required fields
# [problem, solution] checked IN ORDER with the reference's exact
# error string (first failure wins — the loop raises immediately);
# the embedding text is ``' '.join(str(data.get(f, '')) for f in
# [problem, solution, context, example] if f in data)`` whose quirks
# are carried as-is: a present-but-None field contributes the literal
# string 'None', and a present-but-empty field still contributes its
# empty string (double spaces in the join). The reference's
# ``lesson_<uuid4[:8]>`` key is replaced by the deterministic
# ``lesson_<md5(doc_id)[:8]>`` stand-in (disclosed — uuid4 is
# unreproducible by design; the md5 prefix keeps the shape and the
# collision behavior).
#
# Lesson fixture (deterministic per doc_id): problem empty for
# doc_id%7==0 (required-empty failure), solution ABSENT for
# doc_id%11==3 (required-missing failure; problem wins when both),
# context present-but-None for doc_id%5==2 ('None' quirk), example
# present only for doc_id%3==1. Map-only: one projection over the
# scan, no shuffle, no Python.
# ---------------------------------------------------------------------------


def lesson_add_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    problem = F.when(F.col("doc_id") % 7 == 0, F.lit("")).otherwise(
        F.concat(F.lit("P: "), F.substring("text", 1, 30))
    )
    has_solution = ~(F.col("doc_id") % 11 == 3)
    solution = F.concat(F.lit("S: "), F.substring("text", 31, 30))
    has_context = F.col("doc_id") % 5 == 2  # present but None
    has_example = F.col("doc_id") % 3 == 1
    # present-but-EMPTY example (doc_id%9==4) keeps its '' in the join
    # -> the reference's double-space quirk on a VALID row
    example = F.when(F.col("doc_id") % 9 == 4, F.lit("")).otherwise(
        F.concat(F.lit("E: "), F.col("doc_id").cast("string"))
    )

    error = F.when(
        problem == "",
        F.lit("Required field 'problem' is missing or empty in lesson data"),
    ).when(
        ~has_solution,
        F.lit("Required field 'solution' is missing or empty in lesson data"),
    )
    # join over PRESENT fields only; None renders as 'None' (str()),
    # empty strings stay (the double-space quirk)
    parts = F.array_compact(
        F.array(
            problem,  # always present
            F.when(has_solution, solution),
            F.when(has_context, F.lit("None")),
            F.when(has_example, example),
        )
    )
    embed_text = F.array_join(parts, " ")
    key = F.concat(
        F.lit("lesson_"),
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
    )
    return docs.select(
        "doc_id",
        key.alias("lesson_key"),
        error.isNull().alias("valid"),
        error.alias("error"),
        F.when(error.isNull(), embed_text).alias("embed_text"),
    )


LESSON_ADD_SQL = """
WITH fx AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN ''
              ELSE 'P: ' || substr(text, 1, 30) END AS problem,
         doc_id % 11 <> 3 AS has_solution,
         'S: ' || substr(text, 31, 30) AS solution,
         doc_id % 5 = 2 AS has_context,
         doc_id % 3 = 1 AS has_example,
         CASE WHEN doc_id % 9 = 4 THEN ''
              ELSE 'E: ' || doc_id END AS example
  FROM documents
), v AS (
  SELECT *,
         CASE WHEN problem = ''
              THEN 'Required field ''problem'' is missing or empty in lesson data'
              WHEN NOT has_solution
              THEN 'Required field ''solution'' is missing or empty in lesson data'
         END AS error
  FROM fx
)
SELECT doc_id,
       'lesson_' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS lesson_key,
       error IS NULL AS valid,
       error,
       CASE WHEN error IS NULL THEN
         array_to_string(list_filter([
           problem,
           CASE WHEN has_solution THEN solution END,
           CASE WHEN has_context THEN 'None' END,
           CASE WHEN has_example THEN example END
         ], x -> x IS NOT NULL), ' ')
       END AS embed_text
FROM v
"""


# ---------------------------------------------------------------------------
# Graded query: embedding_text_assembly
# (reference llm_integration/utils/embedding_utils.py:220-238
#  get_text_for_embedding — the OTHER field-priority embedding-text
#  assembler, distinct from lessons_crud's: fields [problem, solution,
#  context] in order, ``"\n".join(filter(None, parts)).strip()``.
#  Quirk differences vs lesson_add_validate, carried exactly:
#    * absent fields default to '' (dict.get(f, "")) and filter(None)
#      DROPS empty strings — absent and present-but-empty collapse
#      (no double-space quirk here);
#    * a present-but-None field is None after .get → also dropped by
#      filter(None) — it never renders as the string 'None';
#    * join separator is a NEWLINE and the result is .strip()ped — a
#      whitespace-only surviving part can leave a leading separator
#      that strip() then removes.
#
# Lesson fixture (deterministic per doc_id, same family as
# lesson_add_validate): problem '' for doc_id%7==0 (dropped), problem
# whitespace-only ' ' for doc_id%13==6 (survives filter, then strip()
# eats it at the boundary), solution absent for doc_id%11==3, context
# None for doc_id%5==2 and absent for doc_id%3==0. Map-only.
# ---------------------------------------------------------------------------


def embedding_text_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    problem = (
        F.when(F.col("doc_id") % 7 == 0, F.lit(""))
        .when(F.col("doc_id") % 13 == 6, F.lit(" "))
        .otherwise(F.concat(F.lit("P: "), F.substring("text", 1, 30)))
    )
    solution = F.when(
        F.col("doc_id") % 11 == 3, F.lit(None).cast("string")
    ).otherwise(F.concat(F.lit("S: "), F.substring("text", 31, 30)))
    context = F.when(
        (F.col("doc_id") % 5 == 2) | (F.col("doc_id") % 3 == 0),
        F.lit(None).cast("string"),
    ).otherwise(F.concat(F.lit("C: "), F.col("doc_id").cast("string")))
    # filter(None): drop nulls AND empty strings, keep order
    parts = F.filter(
        F.array(problem, solution, context),
        lambda x: x.isNotNull() & (x != F.lit("")),
    )
    joined = F.array_join(parts, "\n")
    # Python str.strip() — whitespace classes incl. the join newline
    embed_text = F.regexp_replace(joined, r"^\s+|\s+$", "")
    return docs.select("doc_id", embed_text.alias("embed_text")).orderBy("doc_id")


EMBED_TEXT_SQL = r"""
WITH fx AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN ''
              WHEN doc_id % 13 = 6 THEN ' '
              ELSE 'P: ' || substr(text, 1, 30) END AS problem,
         CASE WHEN doc_id % 11 = 3 THEN NULL
              ELSE 'S: ' || substr(text, 31, 30) END AS solution,
         CASE WHEN doc_id % 5 = 2 OR doc_id % 3 = 0 THEN NULL
              ELSE 'C: ' || doc_id END AS context
  FROM documents
)
SELECT doc_id,
       regexp_replace(
         -- DuckDB array_to_string([]) is NULL; Spark array_join is ''
         coalesce(array_to_string(
           list_filter([problem, solution, context],
                       x -> x IS NOT NULL AND x <> ''),
           chr(10)), ''),
         '^\s+|\s+$', '', 'g') AS embed_text
FROM fx
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# End-to-end retrieval pipeline composition (R4-131): the SEARCH-side
# composition proof next to the corpus-build one (R4-3/R4-15) — BM25
# candidate generation → embedding join → near-duplicate collapse
# against higher-ranked candidates (SemDeDup bar, floored-grid
# comparison) → final top-K. Components are individually graded
# (bm25_search, semdedup, cosine kernels); this entry grades the
# SEAMS: rank-stability through the join, the drop rule's ordering,
# and the re-ranked cut. Collapse rule (stated): a candidate is
# dropped if its floored cosine to ANY higher-BM25-ranked candidate
# reaches SEMDEDUP_THRESHOLD — one bounded pair join over the
# RETR_CAND-row candidate table, never over the corpus.
# ---------------------------------------------------------------------------

RETR_CAND = 50
RETR_K = 10


def retrieval_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .similarity import SEMDEDUP_THRESHOLD, _as_double, _cosine

    docs = load(spark, sf_dir, "documents")
    cand = (
        textstats.bm25_scores(docs)
        .where(F.col("bm25") > 0)
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(RETR_CAND)
    )
    # RETR_CAND-row bounded window (TakeOrdered already cut the corpus)
    ranked = cand.withColumn(
        "orig_rank",
        F.row_number().over(Window.orderBy(F.desc("bm25"), F.asc("doc_id"))),
    )
    emb = load(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    ce = emb.join(F.broadcast(ranked), "doc_id").select(
        "doc_id", "bm25", "orig_rank", _as_double(F.col("embedding")).alias("e")
    )
    a, b = ce.alias("a"), ce.alias("b")
    cos = _cosine(F.col("a.e"), F.col("b.e"))
    dropped = (
        a.join(b, F.col("a.orig_rank") < F.col("b.orig_rank"))
        .where(
            (F.floor(cos * 10000 + 1e-6) / 10000) >= SEMDEDUP_THRESHOLD
        )
        .select(F.col("b.doc_id").alias("doc_id"))
        .distinct()
    )
    kept = ce.join(dropped, "doc_id", "left_anti")
    final = kept.withColumn(
        "final_rank",
        F.row_number().over(Window.orderBy("orig_rank")),
    ).where(F.col("final_rank") <= RETR_K)
    return final.select(
        "final_rank", "orig_rank", "doc_id", "bm25"
    ).orderBy("final_rank")


def _retr_sql() -> str:
    from .similarity import SEMDEDUP_THRESHOLD, _cosine_sql

    return f"""
WITH {textstats.BM25_SCORES_CTE},
cand AS (
  SELECT doc_id, bm25 FROM bm25_scored WHERE bm25 > 0
  ORDER BY bm25 DESC, doc_id ASC LIMIT {RETR_CAND}
),
ranked AS (
  SELECT doc_id, bm25,
         row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS orig_rank
  FROM cand
),
ce AS (
  SELECT r.doc_id, r.bm25, r.orig_rank, e.embedding
  FROM ranked r JOIN embeddings e ON e.vec_id = r.doc_id
),
dropped AS (
  SELECT DISTINCT b.doc_id
  FROM ce a JOIN ce b ON a.orig_rank < b.orig_rank
  WHERE floor(({_cosine_sql('a.embedding', 'b.embedding')}) * 10000 + 1e-6)
          / 10000 >= {SEMDEDUP_THRESHOLD}
),
kept AS (
  SELECT c.doc_id, c.bm25, c.orig_rank
  FROM ce c ANTI JOIN dropped d ON c.doc_id = d.doc_id
)
SELECT * FROM (
  SELECT row_number() OVER (ORDER BY orig_rank) AS final_rank,
         orig_rank, doc_id, bm25
  FROM kept
) WHERE final_rank <= {RETR_K}
ORDER BY final_rank
"""


RETRIEVAL_PIPELINE_SQL = _retr_sql()
