"""Graded fixture for the task dependency-graph scheduler (reference
``llm_integration/utils/dependency_graph.py:47-141`` — see
operators/taskgraph.py for the operator and the semantics table).

The task batch is derived deterministically from the events table: the
first 120 events in id order become tasks; ``props.k`` drives the
method (k%3==0 → sequential) and the explicit dependencies (k%5==0 →
depends on the task two back, k%7==0 → three back), so the fixture
exercises explicit chains, the implicit-sequential rule, multi-parent
tasks, and dependent fan-out at once."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import load

TASK_BATCH = 120
TASK_MAX_DEPTH = 20  # reference DEFAULT_MAX_DEPTH


def _tasks_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load(spark, sf_dir, "events")
        .select("event_id", "props")
        .where(F.col("event_id") < TASK_BATCH)
    )
    k = F.get_json_object("props", "$.k").cast("int")
    d2 = F.when(
        (k % 5 == 0) & (F.col("event_id") >= 2),
        F.concat(F.lit("T"), (F.col("event_id") - 2).cast("string")),
    )
    d3 = F.when(
        (k % 7 == 0) & (F.col("event_id") >= 3),
        F.concat(F.lit("T"), (F.col("event_id") - 3).cast("string")),
    )
    return ev.select(
        F.concat(F.lit("T"), F.col("event_id").cast("string")).alias(
            "task_id"
        ),
        F.col("event_id").alias("seq"),
        F.when(k % 3 == 0, F.lit("sequential"))
        .otherwise(F.lit("concurrent"))
        .alias("method"),
        F.array_compact(F.array(d2, d3)).alias("deps"),
    )


def task_dependency_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.taskgraph import build_dependency_graph

    out = build_dependency_graph(
        _tasks_df(spark, sf_dir), max_depth=TASK_MAX_DEPTH
    )
    return out.orderBy("task_id")


# ---------------------------------------------------------------------------
# Placeholder substitution (reference llm_integration/parser.py:50-157
# substitute_placeholders): replace {{ task_id.result }} placeholders
# with sanitized results from a completed-results map.
# ---------------------------------------------------------------------------

# The fixture's completed-results map (the reference takes a Python
# dict): statuses and values chosen to light every replacer branch.
TPL_RESULTS: dict[str, tuple[str, object]] = {
    "T0": ("success", "alpha beta"),
    "T1": ("success", "   "),  # empty after strip
    "T2": ("failed", "whatever"),
    "T3": ("success", None),
    "T4": ("success", 'it\'s <b>bold</b> & "quoted"'),
    "T5": ("success", "x" * 10001),  # over the 10,000-char cap
}
TPL_PAT = r"\{\{\s*[\w-]+\.result\s*\}\}"  # parser.py:99


def _render_result(status: str, value) -> str:
    """The reference's replacer (parser.py:101-146) for simple-typed
    results, evaluated per TASK at plan build (it is row-independent —
    the engine-side work is the pattern application). Quirk carried
    as-is: the sanitizer's HTML-encode chain (parser.py:86-92) is
    literally self-identity for & < > \" and only rewrites the single
    quote to ``&#39;`` — faithful to the file, not to its comment."""
    if status != "success":
        return "[ERROR: Dependency failed]"
    if value is None:
        return "[ERROR: Null result]"
    s = str(value)
    if len(s) > 10000:
        return "[ERROR: Input too long]"
    s = s.replace("'", "&#39;")
    if not s.strip():
        return "[ERROR: Empty result after sanitization]"
    return s


def _tpl_replacements() -> list[tuple[str, str]]:
    """(pattern, replacement) chain: one exact-task pattern per known
    task, then the catch-all for unknown task ids. Safe as a sequential
    fold because no rendered replacement contains placeholder syntax
    (Python's one-pass re.sub and the fold agree whenever replacements
    cannot re-match — asserted here)."""
    out = []
    for tid, (status, value) in TPL_RESULTS.items():
        repl = _render_result(status, value)
        assert "{{" not in repl
        out.append((r"\{\{\s*" + tid + r"\.result\s*\}\}", repl))
    out.append((TPL_PAT, "[ERROR: Result not found]"))
    return out


def template_substitute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """substitute_placeholders over a per-document template: each doc
    renders ``{{T<doc_id%8>.result}}`` (tight form) and
    ``{{ T<(doc_id+3)%10>.result }}`` (spaced form) plus a text
    snippet, so hits cover every replacer branch — success, quote
    sanitization, empty-after-strip, failed dependency, null result,
    over-length result, and the two missing-id error paths. Map-only:
    a short chain of literal regexp_replace passes, no shuffle before
    the presentation sort."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    tpl = F.concat(
        F.lit("doc "),
        F.col("doc_id").cast("string"),
        F.lit(": {{T"),
        (F.col("doc_id") % 8).cast("string"),
        F.lit(".result}} & {{ T"),
        ((F.col("doc_id") + 3) % 10).cast("string"),
        F.lit(".result }} | "),
        F.coalesce(F.substring("text", 1, 40), F.lit("")),
    )
    base = docs.select("doc_id", tpl.alias("template"))
    rendered = F.col("template")
    for pat, repl in _tpl_replacements():
        rendered = F.regexp_replace(rendered, pat, repl)
    return base.select(
        "doc_id",
        F.regexp_count("template", F.lit(TPL_PAT)).alias("n_placeholders"),
        rendered.alias("rendered"),
    ).orderBy("doc_id")


def _template_sql() -> str:
    tpl = (
        "'doc ' || doc_id || ': {{T' || (doc_id % 8) || '.result}} & "
        "{{ T' || ((doc_id + 3) % 10) || '.result }} | ' "
        "|| coalesce(substr(text, 1, 40), '')"
    )
    rendered = "template"
    for pat, repl in _tpl_replacements():
        rendered = f"regexp_replace({rendered}, '{pat}', '{repl}', 'g')"
    return f"""
WITH base AS (
  SELECT doc_id, {tpl} AS template FROM documents
)
SELECT doc_id,
  CAST(len(regexp_extract_all(template, '{TPL_PAT}')) AS INTEGER)
    AS n_placeholders,
  {rendered} AS rendered
FROM base
ORDER BY doc_id
"""


TEMPLATE_SUBSTITUTE_SQL = _template_sql()


_TASK_K = "CAST(json_extract(props, '$.k') AS INTEGER)"

TASK_DEPENDENCY_SQL = f"""
WITH RECURSIVE tasks AS (
  SELECT 'T' || event_id AS task_id,
         event_id AS seq,
         CASE WHEN {_TASK_K} % 3 = 0 THEN 'sequential'
              ELSE 'concurrent' END AS method,
         list_filter([
           CASE WHEN {_TASK_K} % 5 = 0 AND event_id >= 2
                THEN 'T' || (event_id - 2) END,
           CASE WHEN {_TASK_K} % 7 = 0 AND event_id >= 3
                THEN 'T' || (event_id - 3) END
         ], x -> x IS NOT NULL) AS deps
  FROM events WHERE event_id < {TASK_BATCH}
), ids AS (
  SELECT task_id FROM tasks
), expl AS (
  SELECT task_id, unnest(deps) AS dep FROM tasks
), in_batch AS (
  SELECT e.task_id, e.dep FROM expl e JOIN ids i ON i.task_id = e.dep
), implicit AS (
  SELECT task_id, dep FROM (
    SELECT task_id, method, len(deps) AS n_expl,
           lag(task_id) OVER (ORDER BY seq) AS dep
    FROM tasks
  ) WHERE lower(method) = 'sequential' AND n_expl = 0 AND dep IS NOT NULL
), dep_edges AS (
  SELECT task_id, dep FROM in_batch
  UNION ALL
  SELECT task_id, dep FROM implicit
), ndep AS (
  SELECT dep AS task_id, count(*) AS n_dependents FROM dep_edges GROUP BY dep
), indeg AS (
  SELECT t.task_id, t.method,
         len(t.deps) + (CASE WHEN i.task_id IS NULL THEN 0 ELSE 1 END)
           AS in_degree
  FROM tasks t LEFT JOIN implicit i ON i.task_id = t.task_id
), walk AS (
  SELECT task_id AS root, task_id AS cur, 0 AS d FROM tasks
  UNION ALL
  SELECT w.root, b.dep, w.d + 1 FROM walk w
  JOIN in_batch b ON b.task_id = w.cur
), depth AS (
  SELECT root AS task_id, max(d) AS depth FROM walk GROUP BY root
)
SELECT i.task_id, i.method,
       CAST(i.in_degree AS INTEGER) AS in_degree,
       CAST(coalesce(n.n_dependents, 0) AS INTEGER) AS n_dependents,
       CAST(d.depth AS INTEGER) AS depth
FROM indeg i
LEFT JOIN ndep n USING (task_id)
JOIN depth d USING (task_id)
ORDER BY task_id
"""


# ---------------------------------------------------------------------------
# Message-history assembly (reference ``llm_integration/engine.py:
# 124-166`` build_message_history): for each task, walk its EXPLICIT
# dependencies in sorted order (original_dependencies carries only the
# explicit deps — dependency_graph.py:71; and sorted() on task-id
# STRINGS is lexicographic, so 'T10' < 'T9' — quirk carried as-is),
# and for every dep that is present in completed_results with
# status == 'success' AND a non-null result, append the
# (user: dep question, assistant: dep result) pair and collect the
# result into the corpus; deps that failed, returned null, or never
# completed are skipped (the reference's three warning branches).
# Finally append the task's own question; corpus is the
# '\n\n---\n\n' join of collected results, NULL when none qualified.
#
# Completed-results fixture (deterministic per seq): seq%11==5 never
# completed, seq%4==3 completed-but-failed, seq%10==7 success with a
# null result; otherwise success with result 'R<seq>' (the str branch)
# for even seq and '{"answer": <seq>}' (the json.dumps(dict) branch,
# rendered at fixture level) for odd seq.
#
# Scale shape: explode the (≤2-element) deps array, ONE equi-join back
# to the tasks table for dep question/result, one hash-aggregate
# collecting the sorted pairs, one left join to re-attach dep-less
# tasks. Messages are flattened to 'role: content' strings (the
# engine-portable hash shape); no Python, no window, no nested loop.
# ---------------------------------------------------------------------------


def _result_cols() -> tuple:
    """(status, result) columns for a task row — the fixture above."""
    seq = F.col("seq")
    status = F.when(seq % 11 == 5, F.lit(None).cast("string")).otherwise(
        F.when(seq % 4 == 3, F.lit("failed")).otherwise(F.lit("success"))
    )
    result = F.when(
        seq % 10 == 7, F.lit(None).cast("string")
    ).otherwise(
        F.when(
            seq % 2 == 0, F.concat(F.lit("R"), seq.cast("string"))
        ).otherwise(
            F.concat(F.lit('{"answer": '), seq.cast("string"), F.lit("}"))
        )
    )
    return status, result


def message_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    tasks = _tasks_df(spark, sf_dir)
    status, result = _result_cols()
    results = tasks.select(
        F.col("task_id").alias("dep_id"),
        F.concat(F.lit("ask "), F.col("task_id")).alias("dep_q"),
        status.alias("dep_status"),
        result.alias("dep_result"),
    )
    pairs = (
        tasks.select("task_id", F.explode("deps").alias("dep_id"))
        .join(results, "dep_id")
        .filter(
            (F.col("dep_status") == "success")
            & F.col("dep_result").isNotNull()
        )
        .groupBy("task_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dep_id", "dep_q", "dep_result"))
            ).alias("ctx")
        )
    )
    own_q = F.concat(F.lit("ask "), F.col("task_id"))
    ctx = F.coalesce(
        F.col("ctx"),
        F.array().cast(
            "array<struct<dep_id:string,dep_q:string,dep_result:string>>"
        ),
    )
    messages = F.concat(
        F.flatten(
            F.transform(
                ctx,
                lambda x: F.array(
                    F.concat(F.lit("user: "), x["dep_q"]),
                    F.concat(F.lit("assistant: "), x["dep_result"]),
                ),
            )
        ),
        F.array(F.concat(F.lit("user: "), own_q)),
    )
    corpus = F.when(
        F.size(ctx) > 0,
        F.concat_ws(
            "\n\n---\n\n", F.transform(ctx, lambda x: x["dep_result"])
        ),
    )
    return (
        tasks.join(pairs, "task_id", "left")
        .select(
            "task_id",
            F.size(messages).alias("n_messages"),
            messages.alias("messages"),
            corpus.alias("corpus"),
        )
        .orderBy("task_id")
    )


MESSAGE_HISTORY_SQL = f"""
WITH tasks AS (
  SELECT 'T' || event_id AS task_id,
         event_id AS seq,
         list_filter([
           CASE WHEN {_TASK_K} % 5 = 0 AND event_id >= 2
                THEN 'T' || (event_id - 2) END,
           CASE WHEN {_TASK_K} % 7 = 0 AND event_id >= 3
                THEN 'T' || (event_id - 3) END
         ], x -> x IS NOT NULL) AS deps
  FROM events WHERE event_id < {TASK_BATCH}
), results AS (
  SELECT task_id AS dep_id,
         'ask ' || task_id AS dep_q,
         CASE WHEN seq % 11 = 5 THEN NULL
              WHEN seq % 4 = 3 THEN 'failed'
              ELSE 'success' END AS dep_status,
         CASE WHEN seq % 10 = 7 THEN NULL
              WHEN seq % 2 = 0 THEN 'R' || seq
              ELSE '{{"answer": ' || seq || '}}' END AS dep_result
  FROM tasks
), expl AS (
  SELECT t.task_id, u.dep_id FROM tasks t, unnest(t.deps) AS u(dep_id)
), ok AS (
  SELECT e.task_id, e.dep_id, r.dep_q, r.dep_result
  FROM expl e JOIN results r USING (dep_id)
  WHERE r.dep_status = 'success' AND r.dep_result IS NOT NULL
), pairs AS (
  SELECT task_id,
         flatten(list_transform(
           list_sort(list(struct_pack(
             dep_id := dep_id, dep_q := dep_q, dep_result := dep_result))),
           x -> ['user: ' || x.dep_q, 'assistant: ' || x.dep_result]
         )) AS ctx_msgs,
         list_transform(
           list_sort(list(struct_pack(
             dep_id := dep_id, dep_q := dep_q, dep_result := dep_result))),
           x -> x.dep_result
         ) AS ctx_results
  FROM ok GROUP BY task_id
)
SELECT t.task_id,
       CAST(coalesce(len(p.ctx_msgs), 0) + 1 AS INTEGER) AS n_messages,
       list_append(coalesce(p.ctx_msgs, []), 'user: ask ' || t.task_id)
         AS messages,
       CASE WHEN coalesce(len(p.ctx_results), 0) > 0
            THEN array_to_string(p.ctx_results, '\n\n---\n\n') END AS corpus
FROM tasks t LEFT JOIN pairs p USING (task_id)
ORDER BY t.task_id
"""


# ---------------------------------------------------------------------------
# Validation-retry cascade (reference llm_integration/retry_llm_call.py:
# 75-188 retry_llm_call) — the control loop that re-asks an LLM until a
# validator stack passes, re-expressed as a set-oriented profile: for a
# batch of tasks, which attempt won, how many retries it cost, how the
# conversation grew (2 feedback messages per failed-but-extractable
# attempt, :170-174), and the formatted error string of the terminal
# attempt ("Validator {i+1} ({name}): {msg}" joined with '; ', :146-149;
# a failed CALL contributes "LLM call failed: {err}" and skips feedback,
# :180-183). Tasks whose max_retries attempts all fail surface as
# status='exhausted' (the MaxRetriesExceededError path :185-188).
#
# Attempts are synthesized deterministically per doc: attempt content
# carries a '[valid]' marker iff (doc_id+a)%3==0 and a padding block iff
# (doc_id+2a)%5!=0; validator 1 (marker_validator) requires the marker,
# validator 2 (length_validator) requires >=16 chars, so pass/fail mixes
# are content-derived exactly like the reference's validators-on-response.
# doc_id%7==3 makes attempt 1 a failed CALL (the except branch).
#
# Scale shape: one explode (x MAX_ATTEMPTS, map-side), then ONE shuffle
# on task_id serving both the min-winning-attempt window and the final
# aggregate (same partitioning, Exchange reuse); everything else is
# codegen'd projection.
# ---------------------------------------------------------------------------

RETRY_MAX_ATTEMPTS = 3
RETRY_MIN_LEN = 16


def retry_validation_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents").select("doc_id")
    att = docs.select(
        F.col("doc_id").alias("task_id"),
        F.explode(
            F.array(*[F.lit(i + 1) for i in range(RETRY_MAX_ATTEMPTS)])
        ).alias("a"),
    )
    did, a = F.col("task_id"), F.col("a")
    call_failed = (did % 7 == 3) & (a == 1)
    base = F.concat(F.lit("a"), a.cast("string"), F.lit(" d"),
                    did.cast("string"))
    with_pad = F.when((did + 2 * a) % 5 != 0,
                      F.concat(base, F.lit(" padding-block"))).otherwise(base)
    content = F.when(call_failed, F.lit(None).cast("string")).otherwise(
        F.when((did + a) % 3 == 0,
               F.concat(with_pad, F.lit(" [valid]"))).otherwise(with_pad)
    )
    v1_fail = ~content.contains("[valid]")
    v2_fail = F.length(content) < RETRY_MIN_LEN
    errors = F.when(call_failed, F.lit("LLM call failed: TimeoutError()")).otherwise(
        F.concat_ws(
            "; ",
            F.when(v1_fail, F.lit(
                "Validator 1 (marker_validator): missing [valid] marker")),
            F.when(v2_fail, F.concat(
                F.lit("Validator 2 (length_validator): response too short: "),
                F.length(content).cast("string"))),
        )
    )
    passed = ~call_failed & ~v1_fail & ~v2_fail
    staged = att.select(
        "task_id", "a", call_failed.alias("call_failed"),
        passed.alias("passed"), errors.alias("errors"),
    )
    w = Window.partitionBy("task_id")
    staged = staged.withColumn(
        "win", F.min(F.when(F.col("passed"), F.col("a"))).over(w)
    )
    terminal = F.coalesce(F.col("win"), F.lit(RETRY_MAX_ATTEMPTS))
    out = staged.groupBy("task_id").agg(
        F.first("win").alias("winning_attempt"),
        F.sum(
            F.when(
                ~F.col("call_failed") & ~F.col("passed")
                & (F.col("a") <= terminal) & (F.col("a") != terminal),
                2,
            ).otherwise(
                # the terminal attempt itself feeds back only when the
                # whole task exhausts (loop appends before exiting)
                F.when(
                    ~F.col("call_failed") & ~F.col("passed")
                    & (F.col("a") == terminal) & F.col("win").isNull(),
                    2,
                ).otherwise(0)
            )
        ).cast("int").alias("n_feedback_msgs"),
        F.max(
            F.when((F.col("a") == terminal) & ~F.col("passed"), F.col("errors"))
        ).alias("last_errors"),
    )
    return out.select(
        "task_id",
        F.when(F.col("winning_attempt").isNotNull(), "passed")
        .otherwise("exhausted").alias("status"),
        F.col("winning_attempt").cast("int"),
        F.coalesce(F.col("winning_attempt") - 1, F.lit(RETRY_MAX_ATTEMPTS))
        .cast("int").alias("retries"),
        (F.col("n_feedback_msgs") + 1).cast("int").alias("n_messages"),
        "last_errors",
    ).orderBy("task_id")


RETRY_CASCADE_SQL = f"""
WITH att AS (
  SELECT doc_id AS task_id, a
  FROM documents, unnest([{", ".join(str(i) for i in range(1, RETRY_MAX_ATTEMPTS + 1))}]) AS u(a)
),
staged AS (
  SELECT task_id, a,
         (task_id % 7 = 3 AND a = 1) AS call_failed,
         CASE WHEN (task_id % 7 = 3 AND a = 1) THEN NULL
              ELSE 'a' || a || ' d' || task_id ||
                   CASE WHEN (task_id + 2*a) % 5 <> 0
                        THEN ' padding-block' ELSE '' END ||
                   CASE WHEN (task_id + a) % 3 = 0
                        THEN ' [valid]' ELSE '' END
         END AS content
  FROM att
),
flags AS (
  SELECT task_id, a, call_failed,
         NOT call_failed
           AND content LIKE '%[valid]%'
           AND length(content) >= {RETRY_MIN_LEN} AS passed,
         CASE WHEN call_failed THEN 'LLM call failed: TimeoutError()'
              ELSE concat_ws('; ',
                CASE WHEN content NOT LIKE '%[valid]%'
                     THEN 'Validator 1 (marker_validator): missing [valid] marker'
                END,
                CASE WHEN length(content) < {RETRY_MIN_LEN}
                     THEN 'Validator 2 (length_validator): response too short: '
                          || length(content)
                END)
         END AS errors
  FROM staged
),
winw AS (
  SELECT *, min(CASE WHEN passed THEN a END)
              OVER (PARTITION BY task_id) AS win
  FROM flags
)
SELECT task_id,
       CASE WHEN min(win) IS NOT NULL THEN 'passed' ELSE 'exhausted' END
         AS status,
       CAST(min(win) AS INT) AS winning_attempt,
       CAST(coalesce(min(win) - 1, {RETRY_MAX_ATTEMPTS}) AS INT) AS retries,
       CAST(1 + sum(CASE
           WHEN NOT call_failed AND NOT passed
                AND a < coalesce(win, {RETRY_MAX_ATTEMPTS}) THEN 2
           WHEN NOT call_failed AND NOT passed
                AND a = coalesce(win, {RETRY_MAX_ATTEMPTS})
                AND win IS NULL THEN 2
           ELSE 0 END) AS INT) AS n_messages,
       max(CASE WHEN a = coalesce(win, {RETRY_MAX_ATTEMPTS}) AND NOT passed
                THEN errors END) AS last_errors
FROM winw
GROUP BY task_id
ORDER BY task_id
"""
