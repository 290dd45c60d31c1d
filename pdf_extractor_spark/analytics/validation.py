"""Response-validation queries — the reference's corpus/citation
validation layer re-expressed as Catalyst plans.

Reference surfaces covered here:

* ``llm_client/validators/corpus_validator.py:14-110``
  ``validate_corpus_match`` — score a response against every paragraph
  of an approved corpus with FOUR fuzzy methods (token_set_ratio,
  token_sort_ratio, partial_ratio, simple ratio), keep the best
  (paragraph, method, score), threshold it, and report matching /
  missing keywords + a highlighted response.
* ``llm_integration/validation_utils/citation_validators.py:47-134``
  ``citation_validator`` — the token_set_ratio-vs-corpus path is the
  same kernel (short-content branch, :96-107).
* ``llm_client/text_utils.py:8-41`` ``highlight_matching_words`` —
  bracket-mark words shared by two texts, skipping stopwords.

Fuzzy-kernel convention (docs/PARITY.md): rapidfuzz's InDel-based
ratios are proxied by the normalized-Levenshtein similarity
``100 * (1 - lev(a,b) / max(|a|,|b|,1))`` — the same documented proxy
the partial_ratio search uses (textstats.py) — because Spark and DuckDB
both evaluate ``levenshtein`` natively (JVM-side / vectorized, zero
Python in the hot path). Token handling IS faithful to fuzzywuzzy:
token_sort compares sorted-token joins (duplicates kept); token_set
compares the sorted distinct intersection t0 against t0+diff(a) and
t0+diff(b) and takes the max of the three pairwise similarities.

Scale shape: the corpus is a handful of constant paragraphs (broadcast
by constant-folding — they live inside the expressions, there is no
join at all). Per-document work is map-only except ONE hash aggregate:
partial_ratio's window maximum uses the proven explode→max pattern
(HOF lambdas run interpreted; the explode is codegen'd and the max is
map-side combinable), so the whole query is scan → explode → one
partial-agg shuffle → map-only projection. Documents are capped at
``CV_RESP_CHARS`` chars (bounds every levenshtein; a mega-doc costs
the same as a normal one).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import QuerySpec, floor_round, load

# ---------------------------------------------------------------------------
# Fixture constants
# ---------------------------------------------------------------------------

# Approved-corpus paragraphs (the reference's quantum_corpus analog,
# corpus_validator.py:119-125): lowercase by construction, mixing
# corpus-vocabulary words (high overlap with documents) and words that
# never occur (so token_set's t0-vs-t2 leg does real work and scores
# straddle the threshold).
CV_PARAS: list[str] = [
    "spark merge join window batch stream data table",
    "query filter sort order group agg quantum entanglement",
    "customer value row column part vector superposition qubit physics",
    "the quick brown fox jumps over the lazy dog",
]
CV_THRESHOLD = 75.0  # corpus_validator.py:14 default
CV_RESP_CHARS = 160  # compute bound on the response side (documented cap)
CV_NEEDLE_CHARS = 40  # partial_ratio needle cap (paragraph side)
CV_METHODS = ["token_set", "token_sort", "partial", "simple"]  # tie order
# corpus_validator.py:84 common_words (matching/missing keyword filter)
CV_COMMON = "a an the and or but in on at to for is are".split()
# text_utils.py:33 stopword set (highlighting) — has was/were on top
HL_COMMON = CV_COMMON + ["was", "were"]

# highlight_matching_words fixture: the constant "text2" side — echoes
# the reference's quantum sample (text_utils.py:47-48) with corpus
# vocabulary mixed in so real documents share words with it.
HL_QUERY_TEXT = (
    "a quick spark merge can exist in multiple windows due to "
    "quantum batch principles"
)

_TOKEN_RE = re.compile(r"[0-9A-Za-z_]+")  # \w+ in Java/RE2 is ASCII


def _py_tokens(s: str) -> list[str]:
    return _TOKEN_RE.findall(s.lower())


# ---------------------------------------------------------------------------
# Spark-side kernels
# ---------------------------------------------------------------------------


def _sim(a: Column, b: Column) -> Column:
    """Normalized-Levenshtein similarity, identical shape in DuckDB."""
    return 100.0 * (
        1.0
        - F.levenshtein(a, b).cast("double")
        / F.greatest(F.length(a), F.length(b), F.lit(1)).cast("double")
    )


def _prefix_sim(short: Column, long: Column) -> Column:
    """_sim specialized to ``short`` being a prefix of ``long`` (always
    true for t0 vs t1/t2 — t1 = trim(t0 || ' ' || diff)): the edit
    distance is then EXACTLY len(long) - len(short) (pure insertions),
    so two of token_set's three levenshteins reduce to length
    arithmetic. Not an approximation — integer-identical to the lev
    form in both engines."""
    return 100.0 * (
        1.0
        - (F.length(long) - F.length(short)).cast("double")
        / F.greatest(F.length(long), F.length(short), F.lit(1)).cast("double")
    )


def _lit_arr(words: list[str]) -> Column:
    return F.array(*[F.lit(w) for w in words])


def _highlight(orig: Column, words: Column) -> Column:
    """Bracket-mark every word of ``words`` in ``orig``, case-insensitive,
    replacement lowercased — text_utils.py:36-39 ``pattern.sub(f"[{word}]")``.
    Words are \\w+ tokens, so no regex escaping is needed. The fold is
    order-independent (a bracketed whole word can only re-match its own
    pattern, which Python also applies exactly once), but both engines
    fold the SAME sorted array anyway."""
    return F.aggregate(
        words,
        orig,
        lambda acc, w: F.regexp_replace(
            acc,
            F.concat(F.lit(r"(?i)\b"), w, F.lit(r"\b")),
            F.concat(F.lit("["), w, F.lit("]")),
        ),
    )


def _pair_token_scores() -> dict[str, Column]:
    """token_set / token_sort / simple scores over a (response ×
    paragraph) pair frame. Expects materialized response columns
    ``resp`` / ``rtoks`` / ``d_r`` / ``sort_r`` and paragraph columns
    ``para`` / ``p_dist`` / ``p_sort`` from the broadcast dimension.
    The paragraph side is DATA, not inlined constants, on purpose:
    with four per-paragraph constant copies the duplicated
    levenshtein/array pipelines cost ~10 s of per-build Janino
    expression compilation; as columns each kernel is generated once."""
    d_r = F.col("d_r")
    p_dist = F.col("p_dist")
    inter = F.array_sort(F.array_intersect(d_r, p_dist))
    diff_r = F.array_sort(F.array_except(d_r, p_dist))
    diff_p = F.array_sort(F.array_except(p_dist, d_r))
    t0 = F.array_join(inter, " ")
    t1 = F.trim(F.concat_ws(" ", t0, F.array_join(diff_r, " ")))
    t2 = F.trim(F.concat_ws(" ", t0, F.array_join(diff_p, " ")))
    empty_tok = F.size("rtoks") == 0  # paragraph side never empty
    empty_str = F.length("resp") == 0
    # NULL text needs an explicit guard on token_set only: concat_ws
    # skips NULLs so t1/t2 become '' and sim('','') = 100 — greatest()
    # also skips NULLs, so without the guard a NULL doc would "match".
    null_resp = F.col("resp").isNull()
    return {
        "token_set": F.when(null_resp, F.lit(None).cast("double"))
        .when(empty_tok, 0.0)
        .otherwise(
            F.greatest(_prefix_sim(t0, t1), _prefix_sim(t0, t2), _sim(t1, t2))
        ),
        "token_sort": F.when(empty_tok, 0.0).otherwise(
            _sim(F.col("sort_r"), F.col("p_sort"))
        ),
        "simple": F.when(empty_str, 0.0).otherwise(
            _sim(F.col("resp"), F.col("para"))
        ),
    }


def _pair_window_sim() -> Column:
    """partial_ratio leg over the pair-window frame: the needle (capped
    paragraph) slides over the response; windows are generated per pair
    with the needle's own length, similarity normalized by it."""
    k = F.length("needle")
    return 100.0 * (
        1.0
        - F.levenshtein(
            F.substr(F.col("resp"), F.col("i"), k), F.col("needle")
        ).cast("double")
        / k.cast("double")
    )


# ---------------------------------------------------------------------------
# Graded query: corpus_match_validate
# ---------------------------------------------------------------------------


def corpus_match_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """validate_corpus_match over the documents table: every document is
    a "response" scored against the constant approved corpus; output is
    the reference's results dict as columns — best paragraph (earliest
    strictly-greater winner, corpus_validator.py:74-77), best method
    (first max in token_set > token_sort > partial > simple order, the
    Python ``max`` over the method dict, :66-68), floor4 best score,
    the threshold verdict, matching/missing keyword lists vs the
    winning paragraph (:80-89, common-word filtered), the word-overlap
    percentage (:99-101) and the highlighted response
    (text_utils.py:8-41 via the shared ``_highlight`` fold).

    NULL-text documents yield NULL scores and ``valid=false`` (the
    reference would crash on None — disclosed divergence); empty text
    scores 0 on every method like rapidfuzz's empty-input rule."""
    base = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .select(
            "doc_id",
            F.substring("text", 1, CV_RESP_CHARS).alias("orig"),
        )
        .select(
            "doc_id",
            "orig",
            # scored on the ASCII projection of the capped text: the
            # engines disagree outside ASCII — DuckDB's levenshtein is
            # byte-based (lev('שלום','ab') = 8 vs Spark's 4) and
            # lower('İ') is 'i̇' in Java but 'i' in utf8proc — so the
            # fuzzy kernels compare identically-sanitized strings while
            # the highlighted output keeps the original text intact
            # (found by scripts/adversarial_sweep.py, RTL/NFC docs)
            F.lower(
                F.regexp_replace("orig", r"[^\x20-\x7e]", "")
            ).alias("resp"),
        )
    )
    toked = base.select(
        "doc_id",
        "orig",
        "resp",
        F.expr(r"regexp_extract_all(resp, '\\w+', 0)").alias("rtoks"),
    ).select(
        "*",
        F.array_sort(F.array_distinct("rtoks")).alias("d_r"),
        F.array_join(F.array_sort("rtoks"), " ").alias("sort_r"),
    )
    # The paragraph corpus as a 4-row broadcast dimension. Structure,
    # not style: inlining the paragraphs as constants quadruplicates
    # every levenshtein/array kernel in the generated code (~10 s of
    # Janino compilation per fresh plan), and per-output CASE chains
    # re-inline them further under projection collapse. As a joined
    # dimension each kernel is generated exactly once and the word-set
    # outputs are plain array expressions over one matched row.
    paras_dim = spark.createDataFrame(
        [
            (
                i + 1,
                p,
                sorted(set(_py_tokens(p))),
                " ".join(sorted(_py_tokens(p))),
                p[:CV_NEEDLE_CHARS],
                sorted(set(_py_tokens(p)) - set(CV_COMMON)),
                len(set(_py_tokens(p)) - set(CV_COMMON)),
                sorted(set(_py_tokens(p)) - set(HL_COMMON)),
            )
            for i, p in enumerate(CV_PARAS)
        ],
        "para_id int, para string, p_dist array<string>, p_sort string, "
        "needle string, kw_p array<string>, n_kw int, hl_p array<string>",
    )
    pairs = toked.crossJoin(
        F.broadcast(
            paras_dim.select("para_id", "para", "p_dist", "p_sort", "needle")
        )
    )
    s = _pair_token_scores()
    # Token scores are computed ONCE per pair row (before the window
    # explode — Generate evaluates its child projection per input row)
    # and ride through the window aggregate as doubles: max() over the
    # per-pair-constant value returns it unchanged, keeps every
    # aggregate buffer primitive (HashAggregate with map-side combine;
    # first() on strings/arrays would force a SortAggregate over every
    # exploded window row) and saves a per-pair join.
    winp = pairs.select(
        "doc_id",
        "para_id",
        "resp",
        "needle",
        s["token_set"].alias("ts"),
        s["token_sort"].alias("tso"),
        s["simple"].alias("si"),
    ).select(
        "*",
        F.explode(
            F.sequence(
                F.lit(1),
                F.greatest(
                    F.lit(1),
                    F.length("resp") - F.length("needle") + F.lit(1),
                ),
            )
        ).alias("i"),
    )
    pair_scores = winp.groupBy("doc_id", "para_id").agg(
        F.max(_pair_window_sim()).alias("par"),
        F.max("ts").alias("ts"),
        F.max("tso").alias("tso"),
        F.max("si").alias("si"),
    )
    # Per-pair best method (first max in CV_METHODS order — the Python
    # ``max`` over the method dict), then per-doc best paragraph via
    # max over (coalesce(score,-1), -para_id) structs — the exact
    # equivalent of the reference's strictly-greater paragraph fold
    # (earliest paragraph wins ties; NULL scores lose to everything).
    mcols = {
        "token_set": F.col("ts"),
        "token_sort": F.col("tso"),
        "partial": F.col("par"),
        "simple": F.col("si"),
    }
    pscore = F.greatest(*[mcols[m] for m in CV_METHODS])
    method = F.lit(None).cast("string")
    for m in reversed(CV_METHODS):
        method = F.when(mcols[m] == pscore, F.lit(m)).otherwise(method)
    best = (
        pair_scores.select(
            "doc_id",
            F.struct(
                F.coalesce(pscore, F.lit(-1.0)).alias("s"),
                (-F.col("para_id")).alias("np"),
                pscore.alias("raw"),
                F.col("para_id").alias("para_id"),
                method.alias("method"),
            ).alias("b"),
        )
        .groupBy("doc_id")
        .agg(F.max("b").alias("b"))
    )
    picked = (
        toked.select(
            "doc_id",
            "orig",
            "d_r",
            F.array_sort(
                F.array_except("d_r", _lit_arr(sorted(CV_COMMON)))
            ).alias("kw_r"),
        )
        .join(best, "doc_id")
        .select(
            "doc_id",
            "orig",
            "d_r",
            "kw_r",
            F.col("b.para_id").alias("best_para_id"),
            F.col("b.method").alias("best_method"),
            F.col("b.raw").alias("raw_score"),
        )
    )
    joined = picked.join(
        F.broadcast(
            paras_dim.select(
                F.col("para_id").alias("best_para_id"), "kw_p", "n_kw", "hl_p"
            )
        ),
        "best_para_id",
    )
    matching = F.array_sort(F.array_intersect("kw_r", "kw_p"))
    out = joined.select(
        "doc_id",
        "best_para_id",
        "best_method",
        floor_round(F.col("raw_score"), 4).alias("best_score"),
        F.coalesce(F.col("raw_score") >= CV_THRESHOLD, F.lit(False)).alias(
            "valid"
        ),
        matching.alias("matching_words"),
        F.size(matching).alias("n_matching"),
        F.size(F.array_sort(F.array_except("kw_p", "kw_r"))).alias(
            "n_missing"
        ),
        floor_round(
            F.size(matching) / F.col("n_kw").cast("double") * 100.0, 4
        ).alias("overlap_pct"),
        _highlight(
            F.col("orig"), F.array_sort(F.array_intersect("d_r", "hl_p"))
        ).alias("highlighted"),
    )
    return out.orderBy("doc_id")


# ---------------------------------------------------------------------------
# Graded query: highlight_matching_words (text_utils parity, standalone)
# ---------------------------------------------------------------------------


def highlight_matching_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text_utils.py:8-41 over the documents table vs the constant
    HL_QUERY_TEXT: words shared by both sides (\\w+, lowercased, minus
    the stopword set) get bracket-marked in the document text,
    case-insensitively, replacement lowercased. Map-only — tokenize,
    set-intersect against a folded constant array, one bounded
    regexp_replace fold; no shuffle before the presentation sort."""
    q_words = sorted(set(_py_tokens(HL_QUERY_TEXT)) - set(HL_COMMON))
    base = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .select("doc_id", F.substring("text", 1, CV_RESP_CHARS).alias("orig"))
        .select(
            "doc_id",
            "orig",
            F.expr(r"regexp_extract_all(lower(orig), '\\w+', 0)").alias(
                "toks"
            ),
        )
        .select(
            "doc_id",
            "orig",
            F.array_sort(
                F.array_except(
                    F.array_intersect(
                        F.array_distinct("toks"), _lit_arr(q_words)
                    ),
                    _lit_arr(sorted(HL_COMMON)),
                )
            ).alias("common"),
        )
    )
    return base.select(
        "doc_id",
        F.size("common").alias("n_common"),
        _highlight(F.col("orig"), F.col("common")).alias("highlighted"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# DuckDB oracles (generated from the same constants)
# ---------------------------------------------------------------------------


def _sql_sim(a: str, b: str) -> str:
    return (
        f"100.0 * (1.0 - CAST(levenshtein({a}, {b}) AS DOUBLE)"
        f" / CAST(greatest(len({a}), len({b}), 1) AS DOUBLE))"
    )


def _sql_prefix_sim(short: str, long: str) -> str:
    """_prefix_sim twin: short is a prefix of long ⇒ lev = len diff."""
    return (
        f"100.0 * (1.0 - CAST(len({long}) - len({short}) AS DOUBLE)"
        f" / CAST(greatest(len({long}), len({short}), 1) AS DOUBLE))"
    )


def _sql_lit_list(words: list[str]) -> str:
    inner = ", ".join("'" + w + "'" for w in words)
    return f"[{inner}]"


def _sql_floor4(x: str) -> str:
    return f"CAST(floor(({x}) * 10000 + 1e-6) / 10000 AS DOUBLE)"


def _sql_para_scores(i: int, para: str) -> str:
    """Per-paragraph score columns for the oracle CTE."""
    p_toks = _py_tokens(para)
    p_dist = _sql_lit_list(sorted(set(p_toks)))
    p_sort_join = " ".join(sorted(p_toks))
    needle = para[:CV_NEEDLE_CHARS]
    k = len(needle)
    inter = f"list_sort(list_intersect(d_r, {p_dist}))"
    diff_r = f"list_sort(list_filter(d_r, x -> NOT list_contains({p_dist}, x)))"
    diff_p = f"list_sort(list_filter({p_dist}, x -> NOT list_contains(d_r, x)))"
    t0 = f"array_to_string({inter}, ' ')"
    t1 = f"trim(concat_ws(' ', {t0}, array_to_string({diff_r}, ' ')))"
    t2 = f"trim(concat_ws(' ', {t0}, array_to_string({diff_p}, ' ')))"
    token_set = (
        f"CASE WHEN resp IS NULL THEN NULL "
        f"WHEN len(rtoks) = 0 THEN 0.0 ELSE greatest("
        f"{_sql_prefix_sim('t0_' + str(i), 't1_' + str(i))}, "
        f"{_sql_prefix_sim('t0_' + str(i), 't2_' + str(i))}, "
        f"{_sql_sim('t1_' + str(i), 't2_' + str(i))}) END"
    )
    token_sort = (
        f"CASE WHEN len(rtoks) = 0 THEN 0.0 "
        f"ELSE {_sql_sim('sort_r', repr(p_sort_join))} END"
    )
    simple = (
        f"CASE WHEN len(resp) = 0 THEN 0.0 "
        f"ELSE {_sql_sim('resp', repr(para))} END"
    )
    partial = (
        f"list_max(list_transform("
        f"generate_series(1, greatest(1, len(resp) - {k - 1})), "
        f"i -> 100.0 * (1.0 - CAST(levenshtein(substr(resp, i, {k}), "
        f"{needle!r}) AS DOUBLE) / {float(k)!r})))"
    )
    return {
        "pre": f"{t0} AS t0_{i}, {t1} AS t1_{i}, {t2} AS t2_{i}",
        "token_set": token_set,
        "token_sort": token_sort,
        "partial": partial,
        "simple": simple,
    }


def _corpus_match_sql() -> str:
    n = len(CV_PARAS)
    frags = [_sql_para_scores(i, p) for i, p in enumerate(CV_PARAS)]
    pre_cols = ", ".join(f["pre"] for f in frags)
    method_exprs = []
    for i, f in enumerate(frags):
        cols = ", ".join(
            f"{f[m]} AS {m}_{i}" for m in CV_METHODS
        )
        method_exprs.append(cols)
    method_cols = ", ".join(method_exprs)
    pscore_cols = ", ".join(
        "greatest("
        + ", ".join(f"{m}_{i}" for m in CV_METHODS)
        + f") AS pscore_{i}"
        for i in range(n)
    )
    method_pick = ", ".join(
        "(CASE "
        + " ".join(
            f"WHEN {m}_{i} = pscore_{i} THEN '{m}'" for m in CV_METHODS
        )
        + f" END) AS method_{i}"
        for i in range(n)
    )
    # strictly-greater paragraph fold, expressed as the equivalent
    # ORDER BY (coalesce(score,-1) DESC, para_id ASC) row_number pick
    melt = " UNION ALL ".join(
        f"SELECT doc_id, {i + 1} AS para_id, pscore_{i} AS score, "
        f"method_{i} AS method FROM picked0"
        for i in range(n)
    )
    common = _sql_lit_list(sorted(CV_COMMON))
    hl_common = _sql_lit_list(sorted(HL_COMMON))
    mat_case, mis_case, nkw_case, hlw_case = [], [], [], []
    for i, p in enumerate(CV_PARAS):
        kw_p = _sql_lit_list(sorted(set(_py_tokens(p)) - set(CV_COMMON)))
        n_kw = len(set(_py_tokens(p)) - set(CV_COMMON))
        hl_p = _sql_lit_list(sorted(set(_py_tokens(p)) - set(HL_COMMON)))
        mat_case.append(
            f"WHEN para_id = {i + 1} THEN "
            f"list_sort(list_intersect(kw_r, {kw_p}))"
        )
        mis_case.append(
            f"WHEN para_id = {i + 1} THEN list_sort(list_filter({kw_p}, "
            f"x -> NOT list_contains(kw_r, x)))"
        )
        nkw_case.append(f"WHEN para_id = {i + 1} THEN {n_kw}")
        hlw_case.append(
            f"WHEN para_id = {i + 1} THEN list_sort(list_filter("
            f"list_intersect(d_r, {hl_p}), "
            f"x -> NOT list_contains({hl_common}, x)))"
        )
    return f"""
WITH base AS (
  SELECT doc_id, substr(text, 1, {CV_RESP_CHARS}) AS orig,
         lower(regexp_replace(substr(text, 1, {CV_RESP_CHARS}),
               '[^\\x20-\\x7e]', '', 'g')) AS resp
  FROM documents
), toked AS (
  SELECT doc_id, orig, resp,
         regexp_extract_all(resp, '\\w+') AS rtoks,
         list_sort(list_distinct(regexp_extract_all(resp, '\\w+'))) AS d_r,
         array_to_string(list_sort(regexp_extract_all(resp, '\\w+')), ' ')
           AS sort_r
  FROM base
), pre AS (
  SELECT *, {pre_cols} FROM toked
), methods AS (
  SELECT *, {method_cols} FROM pre
), pscored AS (
  SELECT *, {pscore_cols} FROM (SELECT * FROM methods)
), picked0 AS (
  SELECT *, {method_pick} FROM pscored
), melted AS (
  {melt}
), ranked AS (
  SELECT doc_id, para_id, score, method,
         row_number() OVER (
           PARTITION BY doc_id
           ORDER BY coalesce(score, -1.0) DESC, para_id ASC
         ) AS rn
  FROM melted
), best AS (
  SELECT r.doc_id, r.para_id, r.score, r.method,
         t.orig, t.d_r,
         list_sort(list_filter(t.d_r,
           x -> NOT list_contains({common}, x))) AS kw_r
  FROM ranked r JOIN toked t ON t.doc_id = r.doc_id
  WHERE r.rn = 1
)
SELECT doc_id,
  para_id AS best_para_id,
  method AS best_method,
  {_sql_floor4('score')} AS best_score,
  coalesce(score >= {CV_THRESHOLD}, false) AS valid,
  (CASE {' '.join(mat_case)} END) AS matching_words,
  CAST(len(CASE {' '.join(mat_case)} END) AS INTEGER) AS n_matching,
  CAST(len(CASE {' '.join(mis_case)} END) AS INTEGER) AS n_missing,
  {_sql_floor4(
      'CAST(len(CASE ' + ' '.join(mat_case) + ' END) AS DOUBLE)'
      ' / (CASE ' + ' '.join(nkw_case) + ' END) * 100.0'
  )} AS overlap_pct,
  list_reduce(
    list_prepend(orig, (CASE {' '.join(hlw_case)} END)),
    (acc, w) -> regexp_replace(acc,
       '(?i)\\b' || w || '\\b', '[' || w || ']', 'g')
  ) AS highlighted
FROM best
ORDER BY doc_id
"""


CORPUS_MATCH_SQL = _corpus_match_sql()


def _highlight_sql() -> str:
    q_words = _sql_lit_list(
        sorted(set(_py_tokens(HL_QUERY_TEXT)) - set(HL_COMMON))
    )
    hl_common = _sql_lit_list(sorted(HL_COMMON))
    return f"""
WITH base AS (
  SELECT doc_id, substr(text, 1, {CV_RESP_CHARS}) AS orig
  FROM documents
), toked AS (
  SELECT doc_id, orig,
         list_sort(list_filter(
           list_intersect(
             list_distinct(regexp_extract_all(lower(orig), '\\w+')),
             {q_words}),
           x -> NOT list_contains({hl_common}, x))) AS common
  FROM base
)
SELECT doc_id,
  CAST(len(common) AS INTEGER) AS n_common,
  list_reduce(
    list_prepend(orig, common),
    (acc, w) -> regexp_replace(acc,
       '(?i)\\b' || w || '\\b', '[' || w || ']', 'g')
  ) AS highlighted
FROM toked
ORDER BY doc_id
"""


HIGHLIGHT_SQL = _highlight_sql()


# ---------------------------------------------------------------------------
# Graded query: json_response_validate
# (reference llm_integration/validation_utils/json_validators.py:34-120 —
#  json_validator's direct-parse → ```json fence → generic-fence cascade,
#  and required_fields_validator's missing-field report)
# ---------------------------------------------------------------------------

JV_REQUIRED = ["name", "age"]  # required_fields_validator fixture args


def json_response_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The JSON validators over synthesized per-document "LLM responses"
    (five deterministic forms by doc_id%5: direct JSON, ```json fence,
    generic fence with a language line, plain text, broken JSON). The
    candidate cascade mirrors json_validators.py:45-76: direct parse,
    else the ```json block, else the first generic block with its first
    line stripped (the reference loops over every odd block; the
    fixture's single-block forms make first-block equivalent —
    disclosed). Field check = required_fields_validator:84-120 on the
    winning candidate. Engine-side: try_parse_json + two bounded
    regexp_extracts, map-only."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    did = F.col("doc_id").cast("string")
    mod = F.col("doc_id") % 5
    resp = (
        F.when(
            mod == 0,
            F.concat(
                F.lit('{"name": "d'), did, F.lit('", "age": '), did, F.lit("}")
            ),
        )
        .when(
            mod == 1,
            F.concat(
                F.lit('response: ```json\n{"name": "d'), did, F.lit('"}\n``` ok')
            ),
        )
        .when(
            mod == 2,
            F.concat(
                F.lit('noise ```\n{"age": '), did, F.lit(', "name": "x"}\n``` more')
            ),
        )
        .when(mod == 3, F.lit("not json at all"))
        .otherwise(F.concat(F.lit('{"name": broken'), did))
    )
    base = docs.select("doc_id", resp.alias("resp"))
    fenced = F.trim(F.regexp_extract("resp", r"(?s)```json(.*?)```", 1))
    generic_raw = F.regexp_extract("resp", r"(?s)```(.*?)```", 1)
    # "\n".join(block.split("\n")[1:]) — drop through the first newline
    generic = F.trim(F.regexp_replace(generic_raw, r"^[^\n]*\n", ""))
    cand = (
        F.when(F.try_parse_json("resp").isNotNull(), F.col("resp"))
        .when(F.try_parse_json(fenced).isNotNull(), fenced)
        .when(F.try_parse_json(generic).isNotNull(), generic)
    )
    staged = base.select("doc_id", "resp", cand.alias("cand")).select(
        "doc_id",
        F.col("cand").isNotNull().alias("json_ok"),
        F.array_except(
            F.array(*[F.lit(f) for f in JV_REQUIRED]),
            F.json_object_keys("cand"),
        ).alias("missing"),
    )
    return staged.select(
        "doc_id",
        "json_ok",
        "missing",
        F.coalesce(F.size("missing") == 0, F.lit(False)).alias("fields_ok"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Graded query: log_safe_preview
# (reference arangodb/log_utils.py:8-83 truncate_large_value /
#  log_safe_results — the structured-logging sanitizer)
# ---------------------------------------------------------------------------

LOG_MAX_STR = 100  # truncate_large_value max_str_len default
LOG_MAX_LIST = 10  # max_list_elements_shown default
IMG_HEADER = "data:image/png;base64,"


def _truncate_str(c: Column) -> Column:
    """Generic head...tail string truncation (log_utils.py:45-53):
    strings over LOG_MAX_STR keep the first and last max//2 chars."""
    half = LOG_MAX_STR // 2
    n = F.length(c)
    return F.when(
        n > LOG_MAX_STR,
        F.concat(
            F.substr(c, F.lit(1), F.lit(half)),
            F.lit("..."),
            F.substr(c, n - F.lit(half - 1), F.lit(half)),
        ),
    ).otherwise(c)


def log_safe_preview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """log_safe_results over documents ⨝ embeddings (vec_id ≡ doc_id):
    per row the sanitizer's three behaviors — generic string truncation
    of the text, base64-image-URI truncation that PRESERVES the data
    header and truncates only the payload (log_utils.py:29-43; the URI
    is synthesized as header + md5(text) repeated 1+doc_id%5 times, so
    both the truncated and passthrough branches occur and the payload
    stays in the base64 alphabet), and list summarization
    ``[<n type elements>]`` for arrays over LOG_MAX_LIST elements
    (:55-64; embeddings are dim-64 so the summary branch always fires —
    the short-list pass-through would need a cross-engine float
    rendering and is summarized too: disclosed divergence on a branch
    no graded corpus reaches). Map-only plus one 1:1 equi join."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    emb = load(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    j = docs.join(emb, "doc_id")
    payload = F.repeat(
        F.md5(F.coalesce(F.col("text"), F.lit(""))),
        (F.lit(1) + F.col("doc_id") % 5).cast("int"),
    )
    ne = F.size("embedding")
    return j.select(
        "doc_id",
        _truncate_str(F.col("text")).alias("safe_text"),
        F.concat(F.lit(IMG_HEADER), _truncate_str(payload)).alias("safe_img"),
        F.when(F.col("embedding").isNull(), F.lit(None).cast("string"))
        .when(ne == 0, F.lit("[<0 elements>]"))
        .otherwise(
            F.concat(F.lit("[<"), ne.cast("string"), F.lit(" float elements>]"))
        )
        .alias("safe_embedding"),
    ).orderBy("doc_id")


LOG_SAFE_SQL = f"""
WITH j AS (
  SELECT d.doc_id, d.text, e.embedding,
         repeat(md5(coalesce(d.text, '')),
                CAST(1 + d.doc_id % 5 AS INTEGER)) AS payload
  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
)
SELECT doc_id,
  CASE WHEN len(text) > {LOG_MAX_STR}
       THEN substr(text, 1, {LOG_MAX_STR // 2}) || '...'
            || substr(text, len(text) - {LOG_MAX_STR // 2 - 1},
                      {LOG_MAX_STR // 2})
       ELSE text END AS safe_text,
  '{IMG_HEADER}' ||
  CASE WHEN len(payload) > {LOG_MAX_STR}
       THEN substr(payload, 1, {LOG_MAX_STR // 2}) || '...'
            || substr(payload, len(payload) - {LOG_MAX_STR // 2 - 1},
                      {LOG_MAX_STR // 2})
       ELSE payload END AS safe_img,
  CASE WHEN embedding IS NULL THEN NULL
       WHEN len(embedding) = 0 THEN '[<0 elements>]'
       ELSE '[<' || len(embedding) || ' float elements>]'
  END AS safe_embedding
FROM j
ORDER BY doc_id
"""


_JV_REQ_SQL = "[" + ", ".join(f"'{f}'" for f in JV_REQUIRED) + "]"

JSON_RESPONSE_SQL = f"""
WITH base AS (
  SELECT doc_id,
    CASE doc_id % 5
      WHEN 0 THEN '{{"name": "d' || doc_id || '", "age": ' || doc_id || '}}'
      WHEN 1 THEN 'response: ```json' || chr(10) || '{{"name": "d' || doc_id
                  || '"}}' || chr(10) || '``` ok'
      WHEN 2 THEN 'noise ```' || chr(10) || '{{"age": ' || doc_id
                  || ', "name": "x"}}' || chr(10) || '``` more'
      WHEN 3 THEN 'not json at all'
      ELSE '{{"name": broken' || doc_id
    END AS resp
  FROM documents
), cands AS (
  SELECT doc_id, resp,
    trim(regexp_extract(resp, '(?s)```json(.*?)```', 1)) AS fenced,
    trim(regexp_replace(
      regexp_extract(resp, '(?s)```(.*?)```', 1), '^[^\n]*\n', '')) AS generic
  FROM base
), picked AS (
  SELECT doc_id,
    CASE WHEN json_valid(resp) THEN resp
         WHEN json_valid(fenced) THEN fenced
         WHEN json_valid(generic) THEN generic
    END AS cand
  FROM cands
), staged AS (
  SELECT doc_id,
    cand IS NOT NULL AS json_ok,
    CASE WHEN cand IS NULL THEN NULL
         ELSE list_filter({_JV_REQ_SQL},
                f -> NOT list_contains(json_keys(cand), f))
    END AS missing
  FROM picked
)
SELECT doc_id, json_ok, missing,
  coalesce(len(missing) = 0, false) AS fields_ok
FROM staged
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Graded query: extract_code_block
# (reference llm_client/validators/code_validator.py:103-141
#  extract_code_from_text — the code-extraction front half of the
#  code-execution validator; the actual sandbox POST at :142-190 is an
#  external service and stays out of scope)
# ---------------------------------------------------------------------------

# the reference's fenced-block regex verbatim (code_validator.py:114)
CODE_FENCE_RE = r"(?s)```(?:python)?\n(.*?)```"
# one alternation of the reference's seven line-pattern regexes
# (code_validator.py:126-132); applied per line, so ^ anchors the line
CODE_LINE_RE = (
    r"^\s*(def\s+\w+\s*\(|class\s+\w+|import\s+|from\s+\w+\s+import|"
    r"for\s+\w+\s+in\s+|if\s+.*:|while\s+.*:)"
)


def extract_code_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract_code_from_text over synthesized per-document responses
    (four deterministic forms by doc_id%4: a ```python fence, a bare
    ``` fence, fence-less prose with a code line midway, pure prose).

    Faithful to the reference's two paths: the FIRST fenced block wins
    (findall[0].strip()); otherwise the line walk with the in_code_block
    LATCH — once any line matches a code pattern, every later line is
    kept too (the latch never resets, code_validator.py:133-135).
    Map-only: two regexps + one array fold, no shuffle.
    """
    docs = load(spark, sf_dir, "documents").select("doc_id")
    did = F.col("doc_id").cast("string")
    mod = F.col("doc_id") % 4
    nl = F.lit("\n")
    resp = (
        F.when(
            mod == 0,
            F.concat(
                F.lit("use this ```python\ndef f"), did,
                F.lit("():\n    return "), did, F.lit("\n``` done"),
            ),
        )
        .when(
            mod == 1,
            F.concat(
                F.lit("pre ```\nimport mod"), did, F.lit("\ny = "), did,
                F.lit("\n``` post"),
            ),
        )
        .when(
            mod == 2,
            F.concat(
                F.lit("intro words here"), nl,
                F.lit("from pkg"), did, F.lit(" import thing"), nl,
                F.lit("plain trailing line"), nl, F.lit("x = 1"),
            ),
        )
        .otherwise(F.concat(F.lit("no code at all in response "), did))
    )
    base = docs.select("doc_id", resp.alias("resp"))
    # Python str.strip() removes ALL whitespace; SQL trim() only spaces
    fenced = F.regexp_replace(
        F.regexp_extract("resp", CODE_FENCE_RE, 1), r"^\s+|\s+$", ""
    )
    staged = base.select(
        "doc_id", "resp",
        F.when(F.col("resp").rlike(CODE_FENCE_RE), fenced).alias("fence"),
        F.split("resp", "\n").alias("lines"),
    )
    # first line index matching any code pattern (1-based), NULL if none
    first_idx = F.array_min(
        F.filter(
            F.transform(
                "lines",
                lambda x, i: F.when(x.rlike(CODE_LINE_RE), i + 1),
            ),
            lambda v: v.isNotNull(),
        )
    )
    staged = staged.select(
        "doc_id", "fence", "lines", first_idx.alias("first_idx")
    )
    latched = F.concat_ws(
        "\n",
        F.slice(
            "lines", F.col("first_idx"), F.size("lines") - F.col("first_idx") + 1
        ),
    )
    code = (
        F.when(F.col("fence").isNotNull(), F.col("fence"))
        .when(F.col("first_idx").isNotNull(), latched)
        .otherwise(F.lit(""))
    )
    path = (
        F.when(F.col("fence").isNotNull(), F.lit("fenced"))
        .when(F.col("first_idx").isNotNull(), F.lit("latched"))
        .otherwise(F.lit("none"))
    )
    return staged.select(
        "doc_id", path.alias("path"), code.alias("code"),
        F.length(code).alias("code_chars"),
    ).orderBy("doc_id")


EXTRACT_CODE_SQL = rf"""
WITH base AS (
  SELECT doc_id,
    CASE doc_id % 4
      WHEN 0 THEN 'use this ```python' || chr(10) || 'def f' || doc_id
                  || '():' || chr(10) || '    return ' || doc_id
                  || chr(10) || '``` done'
      WHEN 1 THEN 'pre ```' || chr(10) || 'import mod' || doc_id || chr(10)
                  || 'y = ' || doc_id || chr(10) || '``` post'
      WHEN 2 THEN 'intro words here' || chr(10) || 'from pkg' || doc_id
                  || ' import thing' || chr(10) || 'plain trailing line'
                  || chr(10) || 'x = 1'
      ELSE 'no code at all in response ' || doc_id
    END AS resp
  FROM documents
), staged AS (
  SELECT doc_id,
    CASE WHEN regexp_matches(resp, '{CODE_FENCE_RE}')
         THEN regexp_replace(regexp_extract(resp, '{CODE_FENCE_RE}', 1),
                             '^\s+|\s+$', '', 'g') END AS fence,
    string_split(resp, chr(10)) AS lines
  FROM base
), idx AS (
  SELECT doc_id, fence, lines,
    list_min(list_filter(generate_series(1, len(lines)),
                         i -> regexp_matches(lines[i], '{CODE_LINE_RE}')))
      AS first_idx
  FROM staged
), picked AS (
  SELECT doc_id,
    CASE WHEN fence IS NOT NULL THEN 'fenced'
         WHEN first_idx IS NOT NULL THEN 'latched'
         ELSE 'none' END AS path,
    CASE WHEN fence IS NOT NULL THEN fence
         WHEN first_idx IS NOT NULL
           THEN array_to_string(lines[first_idx:len(lines)], chr(10))
         ELSE '' END AS code
  FROM idx
)
SELECT doc_id, path, code, len(code) AS code_chars
FROM picked
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Graded query: parse_json_mixed
# (reference arangodb/json_utils.py:97-135 parse_json — direct parse,
#  else greedy (\[.*\]|\{.*\}) extraction from mixed content, else
#  repair; repair here is a documented deterministic stand-in for the
#  external json-repair dependency: single→double quote fold + trailing
#  comma strip, the two repairs its README demos and the only ones the
#  fixture forms need)
# ---------------------------------------------------------------------------

JSON_EXTRACT_RE = r"(?s)(\[.*\]|\{.*\})"  # json_utils.py:115 verbatim


def parse_json_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parse_json over six deterministic response forms by doc_id%6:
    direct JSON, JSON embedded in prose, a bare array in prose, a
    single-quoted + trailing-comma object (repair-on-extracted path),
    no JSON at all (original-string fallback, json_utils.py:134-135),
    and a bracket-less single-quoted answer (repair-on-FULL-content:
    json_utils.py:114-120 only narrows `content` when the greedy regex
    matches — repair always runs, so when no [..]/{..} exists the whole
    response is repaired).

    Map-only: regexp extraction + try_parse_json cascade; the winning
    candidate string is fingerprinted (md5) rather than re-serialized
    so both engines hash the identical bytes."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    did = F.col("doc_id").cast("string")
    mod = F.col("doc_id") % 6
    resp = (
        F.when(mod == 0, F.concat(F.lit('{"k": '), did, F.lit(', "v": "a"}')))
        .when(
            mod == 1,
            F.concat(
                F.lit('Sure! here: {"k": '), did, F.lit(', "arr": [1, 2]} hope')
            ),
        )
        .when(mod == 2, F.concat(F.lit("list: [1, 2, "), did, F.lit("] end")))
        .when(
            mod == 3,
            F.concat(F.lit("{'k': "), did, F.lit(", 'b': 'x',}")),
        )
        .when(mod == 4, F.concat(F.lit("nothing parseable "), did))
        .otherwise(F.concat(F.lit("'plain quoted answer "), did, F.lit("'")))
    )
    base = docs.select("doc_id", resp.alias("resp"))
    extracted = F.regexp_extract("resp", JSON_EXTRACT_RE, 1)
    staged = base.select(
        "doc_id", "resp",
        F.when(F.col("resp").rlike(JSON_EXTRACT_RE), extracted).alias("ext"),
    ).select(
        "doc_id", "resp", "ext",
        # reference repairs `content` whether or not the regex narrowed
        # it (json_utils.py:114-120): repair the full response when no
        # bracket candidate exists
        F.regexp_replace(
            F.regexp_replace(F.coalesce("ext", "resp"), r"'", '"'),
            r",\s*([}\]])",
            r"$1",
        ).alias("rep"),
    )
    status = (
        F.when(F.try_parse_json("resp").isNotNull(), F.lit("direct"))
        .when(F.try_parse_json("ext").isNotNull(), F.lit("extracted"))
        .when(F.try_parse_json("rep").isNotNull(), F.lit("repaired"))
        .otherwise(F.lit("original"))
    )
    winning = (
        F.when(F.try_parse_json("resp").isNotNull(), F.col("resp"))
        .when(F.try_parse_json("ext").isNotNull(), F.col("ext"))
        .when(F.try_parse_json("rep").isNotNull(), F.col("rep"))
        .otherwise(F.col("resp"))
    )
    # keys only for OBJECT results: engines disagree on json-keys-of-
    # an-array (Spark NULL vs DuckDB []), so gate on the '{' start
    keys = F.when(
        (status != "original") & F.trim(winning).startswith("{"),
        F.array_sort(F.json_object_keys(winning)),
    )
    return staged.select(
        "doc_id",
        status.alias("status"),
        keys.alias("parsed_keys"),
        F.md5(winning).alias("result_md5"),
    ).orderBy("doc_id")


PARSE_JSON_SQL = rf"""
WITH base AS (
  SELECT doc_id,
    CASE doc_id % 6
      WHEN 0 THEN '{{"k": ' || doc_id || ', "v": "a"}}'
      WHEN 1 THEN 'Sure! here: {{"k": ' || doc_id
                  || ', "arr": [1, 2]}} hope'
      WHEN 2 THEN 'list: [1, 2, ' || doc_id || '] end'
      WHEN 3 THEN '{{''k'': ' || doc_id || ', ''b'': ''x'',}}'
      WHEN 4 THEN 'nothing parseable ' || doc_id
      ELSE '''plain quoted answer ' || doc_id || ''''
    END AS resp
  FROM documents
), staged AS (
  SELECT doc_id, resp,
    CASE WHEN regexp_matches(resp, '{JSON_EXTRACT_RE}')
         THEN regexp_extract(resp, '{JSON_EXTRACT_RE}', 1) END AS ext
  FROM base
), rep AS (
  SELECT doc_id, resp, ext,
    regexp_replace(regexp_replace(coalesce(ext, resp), '''', '"', 'g'),
                   ',\s*([}}\]])', '\1', 'g') AS rep
  FROM staged
), picked AS (
  SELECT doc_id,
    CASE WHEN json_valid(resp) THEN 'direct'
         WHEN json_valid(ext) THEN 'extracted'
         WHEN json_valid(rep) THEN 'repaired'
         ELSE 'original' END AS status,
    CASE WHEN json_valid(resp) THEN resp
         WHEN json_valid(ext) THEN ext
         WHEN json_valid(rep) THEN rep
         ELSE resp END AS winning
  FROM rep
)
SELECT doc_id, status,
  CASE WHEN status <> 'original' AND trim(winning) LIKE '{{%'
       THEN list_sort(json_keys(winning)) END AS parsed_keys,
  md5(winning) AS result_md5
FROM picked
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Graded query: match_from_list_validate
# (reference llm_integration/validation_utils/base.py:206-255
#  match_from_list_validator — best token_set_ratio of the response
#  against a delimiter-split choice list, process.extractOne tie rule:
#  first best in list order, threshold min_similarity)
# ---------------------------------------------------------------------------

MFL_MIN_SIMILARITY = 85.0  # base.py:206 default
# the "corpus" string of choices, comma-delimited as the reference
# splits it (base.py:230); vocabulary-overlapping so real docs score
MFL_CORPUS = (
    "merge batch table, spark window filter order, "
    "customer query line value, quantum entangled physics flux, "
    "slow fast scan"
)
MFL_CHOICES = [c.strip() for c in MFL_CORPUS.split(",") if c.strip()]


def match_from_list_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """match_from_list_validator over documents-as-responses: per doc
    the best token_set score against the choice list, extractOne's
    first-best-in-list-order tie rule, and the >= 85 verdict.

    Same engineering as corpus_match_validate: choices ride as a
    broadcast DIMENSION (not inlined constants — the Janino lesson,
    docs/PLANS.md §14), responses scored on the ASCII projection of
    the capped text; the winner is one map-side-combinable
    max(struct(score, -choice_id)) aggregate.
    """
    base = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.substring("text", 1, CV_RESP_CHARS).alias("orig"))
        .select(
            "doc_id",
            F.lower(F.regexp_replace("orig", r"[^\x20-\x7e]", "")).alias(
                "resp"
            ),
        )
    )
    toked = base.select(
        "doc_id",
        "resp",
        F.expr(r"regexp_extract_all(resp, '\\w+', 0)").alias("rtoks"),
    ).select(
        "doc_id", "resp", "rtoks",
        F.array_sort(F.array_distinct("rtoks")).alias("d_r"),
    )
    dim = spark.createDataFrame(
        [
            (i + 1, c, sorted(set(_py_tokens(c))))
            for i, c in enumerate(MFL_CHOICES)
        ],
        "choice_id int, choice string, c_dist array<string>",
    )
    pairs = toked.crossJoin(F.broadcast(dim))
    inter = F.array_sort(F.array_intersect("d_r", "c_dist"))
    diff_r = F.array_sort(F.array_except("d_r", "c_dist"))
    diff_c = F.array_sort(F.array_except("c_dist", "d_r"))
    t0 = F.array_join(inter, " ")
    t1 = F.trim(F.concat_ws(" ", t0, F.array_join(diff_r, " ")))
    t2 = F.trim(F.concat_ws(" ", t0, F.array_join(diff_c, " ")))
    score = (
        F.when(F.col("resp").isNull(), F.lit(None).cast("double"))
        .when(F.size("rtoks") == 0, 0.0)
        .otherwise(
            F.greatest(_prefix_sim(t0, t1), _prefix_sim(t0, t2), _sim(t1, t2))
        )
    )
    scored = pairs.select(
        "doc_id", "resp", "choice_id", "choice",
        F.coalesce(score, F.lit(-1.0)).alias("s"),
    )
    best = scored.groupBy("doc_id", "resp").agg(
        F.max(F.struct(F.col("s"), (-F.col("choice_id")).alias("nid"))).alias(
            "w"
        )
    )
    status = F.when(
        F.col("resp").isNull() | (F.length("resp") == 0), "empty"
    ).otherwise("ok")
    ok = status == "ok"
    # tie rule: max over (score, -choice_id) = first best in list order
    best_id = (-F.col("w")["nid"]).cast("int")
    return (
        best.join(F.broadcast(dim.select("choice_id", "choice")), best_id == F.col("choice_id"))
        .select(
            "doc_id",
            status.alias("status"),
            F.when(ok, F.col("choice")).alias("best_choice"),
            F.when(ok, floor_round(F.col("w")["s"], 4)).alias("best_score"),
            F.coalesce(
                F.when(ok, F.col("w")["s"] >= MFL_MIN_SIMILARITY), F.lit(False)
            ).alias("passed"),
        )
        .orderBy("doc_id")
    )


def _mfl_sql() -> str:
    score_cols, pre_cols = [], []
    for i, c in enumerate(MFL_CHOICES, start=1):
        c_dist = _sql_lit_list(sorted(set(_py_tokens(c))))
        inter = f"list_sort(list_intersect(d_r, {c_dist}))"
        diff_r = f"list_sort(list_filter(d_r, x -> NOT list_contains({c_dist}, x)))"
        diff_c = f"list_sort(list_filter({c_dist}, x -> NOT list_contains(d_r, x)))"
        t0 = f"array_to_string({inter}, ' ')"
        t1 = f"trim(concat_ws(' ', {t0}, array_to_string({diff_r}, ' ')))"
        t2 = f"trim(concat_ws(' ', {t0}, array_to_string({diff_c}, ' ')))"
        pre_cols.append(f"{t0} AS t0_{i}, {t1} AS t1_{i}, {t2} AS t2_{i}")
        score_cols.append(
            f"CASE WHEN resp IS NULL THEN -1.0 "
            f"WHEN len(rtoks) = 0 THEN 0.0 ELSE greatest("
            f"{_sql_prefix_sim(f't0_{i}', f't1_{i}')}, "
            f"{_sql_prefix_sim(f't0_{i}', f't2_{i}')}, "
            f"{_sql_sim(f't1_{i}', f't2_{i}')}) END AS s_{i}"
        )
    n = len(MFL_CHOICES)
    best = "greatest(" + ", ".join(f"s_{i}" for i in range(1, n + 1)) + ")"
    first_best = "CASE " + " ".join(
        f"WHEN s_{i} = best THEN {i}" for i in range(1, n + 1)
    ) + " END"
    choice_case = "CASE best_id " + " ".join(
        f"WHEN {i} THEN '{c}'" for i, c in enumerate(MFL_CHOICES, start=1)
    ) + " END"
    return f"""
WITH base AS (
  SELECT doc_id,
         lower(regexp_replace(substr(text, 1, {CV_RESP_CHARS}),
                              '[^\\x20-\\x7e]', '', 'g')) AS resp
  FROM documents
), toked AS (
  SELECT doc_id, resp, regexp_extract_all(resp, '\\w+') AS rtoks,
         list_sort(list_distinct(regexp_extract_all(resp, '\\w+'))) AS d_r
  FROM base
), pre AS (
  SELECT doc_id, resp, rtoks, d_r, {", ".join(pre_cols)}
  FROM toked
), scored AS (
  SELECT doc_id, resp, {", ".join(score_cols)}
  FROM pre
), picked AS (
  SELECT doc_id, resp, {best} AS best
  FROM scored
), chosen AS (
  SELECT s.doc_id, s.resp, p.best, {first_best} AS best_id
  FROM scored s JOIN picked p USING (doc_id)
)
SELECT doc_id,
  CASE WHEN resp IS NULL OR len(resp) = 0 THEN 'empty' ELSE 'ok' END AS status,
  CASE WHEN resp IS NOT NULL AND len(resp) > 0 THEN {choice_case} END AS best_choice,
  CASE WHEN resp IS NOT NULL AND len(resp) > 0
       THEN floor(best * 10000 + 1e-6) / 10000 END AS best_score,
  coalesce(CASE WHEN resp IS NOT NULL AND len(resp) > 0
                THEN best >= {MFL_MIN_SIMILARITY} END, false) AS passed
FROM chosen
ORDER BY doc_id
"""


MATCH_FROM_LIST_SQL = _mfl_sql()


# ---------------------------------------------------------------------------
# Graded query: validation_accuracy_profile
# (reference llm_integration/validation_utils/reporting.py:76-123
#  calculate_validation_accuracy — per-document accuracy percentages
#  from match/total count pairs, each guarded to appear only when its
#  total is positive, overall = mean of the PRESENT metrics)
# ---------------------------------------------------------------------------


def validation_accuracy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """calculate_validation_accuracy over synthesized per-document
    count pairs (deterministic functions of doc_id; docs with
    doc_id%7==0 have zero total_cells — the reference's metric-absent
    branch, so overall averages TWO metrics there instead of three).
    Map-only arithmetic."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    m = docs.select(
        "doc_id",
        (300 + d % 200).alias("matching_chars"),
        (400 + d % 150).alias("total_chars"),
        (5 + d % 5).alias("matching_elements"),
        (8 + d % 4).alias("total_elements"),
        F.when(d % 7 != 0, 10 + d % 12).otherwise(F.lit(0)).alias(
            "matching_cells"
        ),
        F.when(d % 7 != 0, 15 + d % 8).otherwise(F.lit(0)).alias("total_cells"),
    )
    text_acc = F.col("matching_chars") / F.col("total_chars") * 100.0
    struct_acc = F.col("matching_elements") / F.col("total_elements") * 100.0
    table_acc = F.when(
        F.col("total_cells") > 0,
        F.col("matching_cells") / F.col("total_cells") * 100.0,
    )
    n_metrics = F.lit(2) + F.when(table_acc.isNotNull(), 1).otherwise(0)
    overall = (
        text_acc + struct_acc + F.coalesce(table_acc, F.lit(0.0))
    ) / n_metrics
    return m.select(
        "doc_id",
        floor_round(text_acc, 4).alias("text_accuracy"),
        floor_round(struct_acc, 4).alias("structure_accuracy"),
        floor_round(table_acc, 4).alias("table_accuracy"),
        n_metrics.alias("n_metrics"),
        floor_round(overall, 4).alias("overall_accuracy"),
    )


VALIDATION_ACCURACY_SQL = """
WITH m AS (
  SELECT doc_id,
         300 + doc_id % 200 AS matching_chars,
         400 + doc_id % 150 AS total_chars,
         5 + doc_id % 5 AS matching_elements,
         8 + doc_id % 4 AS total_elements,
         CASE WHEN doc_id % 7 <> 0 THEN 10 + doc_id % 12 ELSE 0 END
           AS matching_cells,
         CASE WHEN doc_id % 7 <> 0 THEN 15 + doc_id % 8 ELSE 0 END
           AS total_cells
  FROM documents
), a AS (
  SELECT doc_id,
         matching_chars * 100.0 / total_chars AS text_acc,
         matching_elements * 100.0 / total_elements AS struct_acc,
         CASE WHEN total_cells > 0
              THEN matching_cells * 100.0 / total_cells END AS table_acc
  FROM m
)
SELECT doc_id,
  floor(text_acc * 10000 + 1e-6) / 10000 AS text_accuracy,
  floor(struct_acc * 10000 + 1e-6) / 10000 AS structure_accuracy,
  floor(table_acc * 10000 + 1e-6) / 10000 AS table_accuracy,
  2 + (table_acc IS NOT NULL)::INT AS n_metrics,
  floor((text_acc + struct_acc + coalesce(table_acc, 0.0))
        / (2 + (table_acc IS NOT NULL)::INT) * 10000 + 1e-6) / 10000
    AS overall_accuracy
FROM a
"""


# ---------------------------------------------------------------------------
# Corpus snapshot diff (reference
# ``arangodb/validation/validation_utils.py:65-129`` compare_results:
# field-by-field expected-vs-actual comparison emitting a typed failure
# list; document payloads are compared by their ``_key`` fingerprint
# rather than deep content).
#
# Generalized to table scale: diff TWO SNAPSHOTS of the documents
# corpus — the regression check a 100 TB corpus rebuild actually needs
# ("what did the new pipeline version change?"). The "actual" snapshot
# is derived deterministically from the base corpus by the first hex
# digit of md5(doc_id): digit 0 → row deleted, digit 1 → lang field
# rewritten, digit 2 → text edited (so the content fingerprint AND
# n_chars move), digit 3 → an extra row inserted under a new key. The
# diff reports per-key status (added / removed / changed) plus the
# exact fields that moved — compare_results' failure-record shape.
#
# Scale shape: two map-only projections over the same scan (content
# compared by md5 FINGERPRINT, never by payload — diff rows stay tiny
# no matter how big the documents are), then ONE full-outer
# sort-merge join on the snapshot key. No windows, no explode, no
# driver state; AQE splits a skewed key range. 'same' rows are
# filtered out before anything leaves the join, so the result is
# bounded by the churn, not the corpus.
# ---------------------------------------------------------------------------

SNAP_ADD_OFFSET = 5_000_000  # inserted-row key space (clear of DUP/ADV ids)
SNAP_FIELDS = ["lang", "n_chars", "source", "text_md5"]  # compare order


def _snapshot_expected(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.col("n_chars").cast("long").alias("n_chars"),
        "source",
        F.md5("text").alias("text_md5"),
    )


def _snapshot_actual(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    digit = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    base = (
        docs.withColumn("d", digit)
        .filter(F.col("d") != "0")  # deletions
        .select(
            "doc_id",
            F.when(F.col("d") == "1", F.lit("xx")).otherwise(F.col("lang"))
            .alias("lang"),
            F.when(
                F.col("d") == "2",
                (F.col("n_chars") + F.lit(9)).cast("long"),
            ).otherwise(F.col("n_chars").cast("long")).alias("n_chars"),
            "source",
            F.when(
                F.col("d") == "2", F.md5(F.concat(F.col("text"), F.lit(" [edited]")))
            ).otherwise(F.md5("text")).alias("text_md5"),
        )
    )
    inserted = (
        docs.withColumn("d", digit)
        .filter(F.col("d") == "3")  # insertions under a fresh key
        .select(
            (F.col("doc_id") + SNAP_ADD_OFFSET).alias("doc_id"),
            "lang",
            F.col("n_chars").cast("long").alias("n_chars"),
            F.lit("snapshot").alias("source"),
            F.md5("text").alias("text_md5"),
        )
    )
    return base.unionByName(inserted)


def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _snapshot_expected(spark, sf_dir)
    a = _snapshot_actual(spark, sf_dir)
    ec = {f: F.col(f"e_{f}") for f in SNAP_FIELDS}
    ac = {f: F.col(f"a_{f}") for f in SNAP_FIELDS}
    joined = (
        e.select("doc_id", *[F.col(f).alias(f"e_{f}") for f in SNAP_FIELDS])
        .join(
            a.select(
                "doc_id", *[F.col(f).alias(f"a_{f}") for f in SNAP_FIELDS]
            ),
            "doc_id",
            "full_outer",
        )
        .withColumn(
            "status",
            F.when(F.col("e_text_md5").isNull(), F.lit("added"))
            .when(F.col("a_text_md5").isNull(), F.lit("removed"))
            .otherwise(
                F.when(
                    sum(
                        (~ec[f].eqNullSafe(ac[f])).cast("int")
                        for f in SNAP_FIELDS
                    )
                    > 0,
                    F.lit("changed"),
                ).otherwise(F.lit("same"))
            ),
        )
        .filter(F.col("status") != "same")
    )
    changed = F.array_compact(
        F.array(
            *[
                F.when(
                    (F.col("status") == "changed")
                    & ~ec[f].eqNullSafe(ac[f]),
                    F.lit(f),
                )
                for f in SNAP_FIELDS
            ]
        )
    )
    return joined.select("doc_id", "status", changed.alias("changed_fields"))


SNAPSHOT_DIFF_SQL = f"""
WITH e AS (
  SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars, source,
         md5(text) AS text_md5
  FROM documents
),
a_base AS (
  SELECT doc_id,
         CASE WHEN d = '1' THEN 'xx' ELSE lang END AS lang,
         CAST(CASE WHEN d = '2' THEN n_chars + 9 ELSE n_chars END AS BIGINT)
           AS n_chars,
         source,
         CASE WHEN d = '2' THEN md5(text || ' [edited]')
              ELSE md5(text) END AS text_md5
  FROM (SELECT *, substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS d
        FROM documents)
  WHERE d <> '0'
),
a AS (
  SELECT * FROM a_base
  UNION ALL
  SELECT doc_id + {SNAP_ADD_OFFSET} AS doc_id, lang,
         CAST(n_chars AS BIGINT) AS n_chars,
         'snapshot' AS source, md5(text) AS text_md5
  FROM (SELECT *, substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS d
        FROM documents)
  WHERE d = '3'
),
j AS (
  SELECT coalesce(e.doc_id, a.doc_id) AS doc_id,
         CASE WHEN e.text_md5 IS NULL THEN 'added'
              WHEN a.text_md5 IS NULL THEN 'removed'
              WHEN e.lang IS DISTINCT FROM a.lang
                OR e.n_chars IS DISTINCT FROM a.n_chars
                OR e.source IS DISTINCT FROM a.source
                OR e.text_md5 IS DISTINCT FROM a.text_md5 THEN 'changed'
              ELSE 'same' END AS status,
         e.lang AS e_lang, a.lang AS a_lang,
         e.n_chars AS e_n_chars, a.n_chars AS a_n_chars,
         e.source AS e_source, a.source AS a_source,
         e.text_md5 AS e_text_md5, a.text_md5 AS a_text_md5
  FROM e FULL OUTER JOIN a ON e.doc_id = a.doc_id
)
SELECT doc_id, status,
       list_filter([
         CASE WHEN status = 'changed'
               AND e_lang IS DISTINCT FROM a_lang THEN 'lang' END,
         CASE WHEN status = 'changed'
               AND e_n_chars IS DISTINCT FROM a_n_chars THEN 'n_chars' END,
         CASE WHEN status = 'changed'
               AND e_source IS DISTINCT FROM a_source THEN 'source' END,
         CASE WHEN status = 'changed'
               AND e_text_md5 IS DISTINCT FROM a_text_md5 THEN 'text_md5' END
       ], x -> x IS NOT NULL) AS changed_fields
FROM j
WHERE status <> 'same'
"""


# ---------------------------------------------------------------------------
# Graded query: vector_debug_display
# (reference llm_integration/utils/vector_utils.py:10-40
#  truncate_vector_for_display + :43-76 format_embedding_for_debug —
#  the debug renderers next to log_safe_preview in the logging family.)
#
# truncate_vector_for_display: first max_items=3 values at 4 decimals,
# then ", ... +{remaining} more" when longer; None → 'None'; [] → '[]'.
# format_embedding_for_debug: str(dict) of the non-vector fields in
# input order with the vector REPLACED by its truncated string (moved
# to the end — the reference builds a fresh dict and re-appends it),
# so the debug value is "{'vec_id': N, 'label': L, 'embedding': '…'}"
# with the embedding single-quoted (it is a str inside the dict).
#
# Disclosed divergence: the reference formats with Python f"{x:.4f}";
# cross-engine, Java's %.4f (HALF_UP) and C's (half-even) disagree on
# exact ties, so both engines floor-round to 4 decimals FIRST (the
# repo-wide floor_round convention) and then render — never within an
# ulp of a formatting tie, value drift ≤ 1 in the 4th decimal.
#
# Branch fixture: vec_id%17==5 → NULL vector ('None'), %19==7 → empty
# ('[]'), %23==9 → 2-element slice (no '+N more' suffix), else the
# full dim-64 vector. Map-only, zero UDFs.
# ---------------------------------------------------------------------------

VEC_MAX_ITEMS = 3  # truncate_vector_for_display max_items default
VEC_PRECISION = 4  # precision default


def vector_debug_display(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding", "label")
    vec = (
        F.when(F.col("vec_id") % 17 == 5, F.lit(None).cast("array<float>"))
        .when(F.col("vec_id") % 19 == 7, F.array().cast("array<float>"))
        .when(F.col("vec_id") % 23 == 9, F.slice("embedding", 1, 2))
        .otherwise(F.col("embedding"))
    )
    staged = emb.select("vec_id", "label", vec.alias("vec"))
    # LONG-overflow guard (docs/PLANS.md §14, similarity._floor4_safe):
    # Spark floor() lands in LONG and saturates at 2^63 after the ×10^4
    # scaling, while DuckDB floors in double — above the cutoff format
    # the RAW value in both engines (a 1e-4 grid is sub-ulp there).
    def _fmt(x):
        xd = x.cast("double")
        guarded = F.when(
            F.abs(xd) < 9e14, floor_round(xd, VEC_PRECISION)
        ).otherwise(xd)
        return F.format_string(f"%.{VEC_PRECISION}f", guarded)

    head = F.transform(F.slice("vec", 1, VEC_MAX_ITEMS), _fmt)
    remaining = F.size("vec") - VEC_MAX_ITEMS
    display = (
        F.when(F.col("vec").isNull(), F.lit("None"))
        .when(F.size("vec") == 0, F.lit("[]"))
        .when(
            remaining > 0,
            F.concat(
                F.lit("["),
                F.array_join(head, ", "),
                F.lit(", ... +"),
                remaining.cast("string"),
                F.lit(" more]"),
            ),
        )
        .otherwise(F.concat(F.lit("["), F.array_join(head, ", "), F.lit("]")))
    )
    out = staged.select("vec_id", "label", display.alias("vec_display"))
    debug = F.concat(
        F.lit("{'vec_id': "),
        F.col("vec_id").cast("string"),
        F.lit(", 'label': "),
        F.col("label").cast("string"),
        F.lit(", 'embedding': '"),
        F.col("vec_display"),
        F.lit("'}"),
    )
    return out.select(
        "vec_id", "vec_display", debug.alias("debug_str")
    ).orderBy("vec_id")


VECTOR_DISPLAY_SQL = f"""
WITH staged AS (
  SELECT vec_id, label,
         CASE WHEN vec_id % 17 = 5 THEN NULL
              WHEN vec_id % 19 = 7 THEN CAST([] AS FLOAT[])
              WHEN vec_id % 23 = 9 THEN embedding[1:2]
              ELSE embedding END AS vec
  FROM embeddings
), d AS (
  SELECT vec_id, label,
         CASE WHEN vec IS NULL THEN 'None'
              WHEN len(vec) = 0 THEN '[]'
              WHEN len(vec) > {VEC_MAX_ITEMS} THEN
                '[' || array_to_string(
                        list_transform(vec[1:{VEC_MAX_ITEMS}],
                          x -> printf('%.{VEC_PRECISION}f',
                                      CASE WHEN abs(CAST(x AS DOUBLE)) < 9e14
                                      THEN floor(CAST(x AS DOUBLE) * 10000
                                                 + 1e-6) / 10000
                                      ELSE CAST(x AS DOUBLE) END)),
                        ', ')
                    || ', ... +' || (len(vec) - {VEC_MAX_ITEMS}) || ' more]'
              ELSE
                '[' || array_to_string(
                        list_transform(vec[1:{VEC_MAX_ITEMS}],
                          x -> printf('%.{VEC_PRECISION}f',
                                      CASE WHEN abs(CAST(x AS DOUBLE)) < 9e14
                                      THEN floor(CAST(x AS DOUBLE) * 10000
                                                 + 1e-6) / 10000
                                      ELSE CAST(x AS DOUBLE) END)),
                        ', ')
                    || ']'
         END AS vec_display
  FROM staged
)
SELECT vec_id, vec_display,
       '{{''vec_id'': ' || vec_id || ', ''label'': ' || label
         || ', ''embedding'': ''' || vec_display || '''}}' AS debug_str
FROM d
ORDER BY vec_id
"""
