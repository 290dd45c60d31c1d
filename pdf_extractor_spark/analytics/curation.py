r"""Corpus-curation operators for a pretraining-data pipeline.

Beyond the reference's own surface (per the build mandate): the cleanup
passes every large-scale training corpus needs before tokenization —
PII redaction, repetition-based quality filtering (Gopher-style), and
deterministic stratified sampling for domain mixing. All pure Catalyst
(regexp / HOF / hash-aggregate), each with an exact DuckDB oracle.

Scale shapes:
* pii_redact — map-only regexp pass; no shuffle at all.
* repetition_filter — token histogram via explode + two-level
  hash-aggregate (map-side combined); the 2-gram dup ratio rides a
  single-pass HOF on the already-materialized token array.
* stratified_sample — map-only: the sampling decision is a pure
  function of (md5(doc_id), lang), so any executor — or a re-run —
  makes the same choice without coordination, and the sample is
  reproducible by construction (no rand(), which would break resume
  and the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .base import floor_round, load
from .base import tokens as _tokens

# ---------------------------------------------------------------------------
# PII redaction (emails + phone numbers)
#
# The synthetic corpus carries no natural PII, so the query plants a
# deterministic contact line per document (same technique as
# metadata_extract's synthesized header) and then redacts it — the op
# is exercised with nonzero counts and the redaction regexes are the
# real surface.
# ---------------------------------------------------------------------------

# Quantifiers are BOUNDED (RFC 5321: local part <= 64, domain <= 255,
# TLD label <= 63) — not just for fidelity: an unbounded `[...]+@` is
# O(len²) on a pathological megatoken (every start position consumes
# the rest of a 50k-char run before failing at `@`; measured 43 s for
# one adversarial doc batch, adversarial-sweep find). Bounds cap the
# per-position work at 64 chars → linear scan. Same pattern semantics
# in Spark's Java regex and DuckDB's RE2.
_EMAIL_RE = r"[A-Za-z0-9._%+-]{1,64}@[A-Za-z0-9.-]{1,255}\.[A-Za-z]{2,63}"
_PHONE_RE = r"\+1-555-[0-9]{4}"


def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    contact = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    n_emails = F.size(F.regexp_extract_all(contact, F.lit(_EMAIL_RE), F.lit(0)))
    n_phones = F.size(F.regexp_extract_all(contact, F.lit(_PHONE_RE), F.lit(0)))
    redacted = F.regexp_replace(
        F.regexp_replace(contact, _EMAIL_RE, "[EMAIL]"), _PHONE_RE, "[PHONE]"
    )
    # guard: Spark's substring(s, -40, 40) returns '' when |s| < 40
    # while the oracle's CASE returns the whole string — mirror the CASE
    tail = F.when(
        F.length(redacted) >= 40, F.substring(redacted, -40, 40)
    ).otherwise(redacted)
    return docs.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        tail.alias("redacted_tail"),
    )


PII_REDACT_SQL = rf"""
SELECT doc_id,
       len(regexp_extract_all(c, '{_EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(c, '\+1-555-[0-9]{{4}}')) AS n_phones,
       CASE WHEN len(r) >= 40 THEN substr(r, len(r) - 39, 40) ELSE r END AS redacted_tail
FROM (
  SELECT doc_id, c,
         regexp_replace(regexp_replace(c, '{_EMAIL_RE}', '[EMAIL]', 'g'),
                        '\+1-555-[0-9]{{4}}', '[PHONE]', 'g') AS r
  FROM (
    SELECT doc_id,
           text || ' contact user' || doc_id || '@example.com or +1-555-' ||
           lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS c
    FROM documents
  )
)
"""


# ---------------------------------------------------------------------------
# Gopher-style repetition filter (Rae et al. 2021 §A1.1 heuristics,
# re-derived for this corpus: drop documents dominated by a single
# token or by repeated 2-grams)
# ---------------------------------------------------------------------------

TOP_TOKEN_MAX_FRAC = 0.20
DUP_2GRAM_MAX_FRAC = 0.60


def repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    # materialize the token array once: HOF-captured expressions are
    # re-evaluated per element (O(len²) on mega-docs otherwise)
    tok_docs = docs.select("doc_id", _tokens().alias("toks"))
    # top-token fraction: explode → (doc, token) counts → max/sum
    per_tok = tok_docs.select("doc_id", F.explode("toks").alias("t"))
    tok_counts = per_tok.groupBy("doc_id", "t").agg(F.count("*").alias("c"))
    top_frac = tok_counts.groupBy("doc_id").agg(
        floor_round(
            F.max("c").cast("double") / F.sum("c"), 4
        ).alias("top_tok_frac")
    )
    # duplicate-2-gram fraction: single-pass HOF on the token array
    toks = F.col("toks")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i, 2)),
    )
    dup_frac = F.when(
        F.size(toks) >= 2,
        floor_round(
            1.0 - F.size(F.array_distinct(grams)).cast("double") / F.size(grams), 4
        ),
    ).otherwise(0.0)
    metrics = tok_docs.select("doc_id", dup_frac.alias("dup_2gram_frac")).join(
        top_frac, "doc_id"
    )
    keep = (F.col("top_tok_frac") <= TOP_TOKEN_MAX_FRAC) & (
        F.col("dup_2gram_frac") <= DUP_2GRAM_MAX_FRAC
    )
    return metrics.select(
        "doc_id", "dup_2gram_frac", "top_tok_frac", keep.cast("int").alias("keep")
    )


REPETITION_FILTER_SQL = rf"""
WITH toksrc AS (
  SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents
),
top AS (
  SELECT doc_id,
         CAST(floor(CAST(max(c) AS DOUBLE) / sum(c) * 10000 + 1e-6) / 10000 AS DOUBLE) AS top_tok_frac
  FROM (
    SELECT doc_id, t, count(*) AS c
    FROM (SELECT doc_id, unnest(toks) AS t FROM toksrc)
    GROUP BY 1, 2
  )
  GROUP BY 1
),
dup AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 2 THEN
           CAST(floor((1.0 - CAST(len(list_distinct(g)) AS DOUBLE) / len(g)) * 10000 + 1e-6) / 10000 AS DOUBLE)
         ELSE 0.0 END AS dup_2gram_frac
  FROM (
    SELECT doc_id, toks,
           list_transform(generate_series(1, len(toks) - 1),
                          i -> toks[i] || ' ' || toks[i + 1]) AS g
    FROM toksrc
  )
)
SELECT d.doc_id, d.dup_2gram_frac, t.top_tok_frac,
       CAST(t.top_tok_frac <= {TOP_TOKEN_MAX_FRAC} AND d.dup_2gram_frac <= {DUP_2GRAM_MAX_FRAC} AS INTEGER) AS keep
FROM dup d JOIN top t ON d.doc_id = t.doc_id
"""


# ---------------------------------------------------------------------------
# deterministic stratified sampling (domain mixing)
#
# Sampling decision = first hex digit of md5(doc_id) against a
# per-language threshold → en keeps 8/16, de 4/16, everything else
# 2/16. Pure function of the row: reproducible across re-runs,
# engines, and cluster sizes; partition-pruning-friendly when the
# table is laid out by lang.
# ---------------------------------------------------------------------------

_LANG_HEX_THRESHOLD = {"en": "8", "de": "4"}
_DEFAULT_HEX_THRESHOLD = "2"


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    digit = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    thr = F.lit(_DEFAULT_HEX_THRESHOLD)
    for lang, t in _LANG_HEX_THRESHOLD.items():
        thr = F.when(F.col("lang") == lang, t).otherwise(thr)
    return (
        docs.filter(digit < thr)
        .select("doc_id", "lang")
    )


_THR_CASE = " ".join(
    f"WHEN lang = '{lang}' THEN '{t}'" for lang, t in _LANG_HEX_THRESHOLD.items()
)

STRATIFIED_SAMPLE_SQL = f"""
SELECT doc_id, lang FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
      < (CASE {_THR_CASE} ELSE '{_DEFAULT_HEX_THRESHOLD}' END)
"""


# ---------------------------------------------------------------------------
# Benchmark decontamination (training:decontaminate)
#
# The canonical pretraining hygiene pass: remove (here: flag) corpus
# documents that share any N-gram with a held-out benchmark/test set,
# so evaluation data cannot leak into training (the GPT-3 appendix-C /
# open-LM-suite overlap rule, done with 8-13-grams on real vocabulary;
# N=5 here because the synthetic 31-word vocabulary makes longer grams
# vanishingly rare).
#
# Scale shape: corpus side explodes to (doc_id, gram) and semi-joins
# the DISTINCT benchmark gram set. Benchmark sets are small (test
# suites, not corpora), so the GRAM SET broadcasts — the corpus side
# never shuffles to find hits. The flag-back join onto documents is a
# doc_id shuffle join: the hit set's size is data-dependent (a
# benchmark gram appearing in boilerplate can flag millions of docs),
# so it must NOT be forced through the driver as a broadcast; AQE
# downgrades to broadcast by itself whenever the hit set is small.
# ---------------------------------------------------------------------------

DECON_N = 5
DECON_BENCH_MAX_ID = 20  # docs 0..19 stand in for the held-out benchmark


def _grams(toks, n: int):
    # toks must be a materialized column ref, not a split() expression
    # (HOF captures re-evaluate per element — see dedup._shingles)
    windows = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.when(F.size(toks) >= n, windows).otherwise(
        F.array().cast("array<string>")
    )


def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    grams = docs.select("doc_id", _tokens().alias("toks")).select(
        "doc_id", F.explode(_grams(F.col("toks"), DECON_N)).alias("g")
    )
    bench = (
        grams.filter(F.col("doc_id") < DECON_BENCH_MAX_ID)
        .select("g")
        .distinct()
    )
    hits = (
        grams.filter(F.col("doc_id") >= DECON_BENCH_MAX_ID)
        .join(F.broadcast(bench), "g", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("contaminated", F.lit(True))
    )
    # NO broadcast hint on hits: its cardinality is O(contaminated
    # corpus docs) — unbounded when a benchmark gram is boilerplate
    # shared by millions of documents — so forcing it through the
    # driver is exactly the OOM the scale note above designs against.
    # Only the (small) benchmark gram set broadcasts; the flag join
    # shuffles on doc_id (AQE still broadcasts it when it happens to
    # be small).
    return (
        docs.filter(F.col("doc_id") >= DECON_BENCH_MAX_ID)
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("contaminated", F.lit(False)).alias("contaminated"),
        )
    )


DECONTAMINATE_SQL = rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents
),
grams AS (
  SELECT doc_id, array_to_string(t[i:i+{DECON_N - 1}], ' ') AS g
  FROM toks, unnest(generate_series(1, greatest(len(t) - {DECON_N - 1}, 0))) AS u(i)
),
bench AS (SELECT DISTINCT g FROM grams WHERE doc_id < {DECON_BENCH_MAX_ID}),
hits AS (
  SELECT DISTINCT doc_id FROM grams
  WHERE doc_id >= {DECON_BENCH_MAX_ID} AND g IN (SELECT g FROM bench)
)
SELECT d.doc_id, (h.doc_id IS NOT NULL) AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
WHERE d.doc_id >= {DECON_BENCH_MAX_ID}
"""


# ---------------------------------------------------------------------------
# Corpus profile (training:profile) — the pre-flight statistics a
# curation run reports per language slice: doc counts, distinct
# sources, token volume, char-length distribution (exact interpolated
# median — Spark `percentile` ≡ DuckDB `quantile_cont`).
# Single hash-aggregate over one scan; every stat map-side combinable
# except the exact percentile, whose per-group state is the value list
# — at real scale swap to percentile_approx (t-digest) and loosen the
# oracle; the exact form is kept here because the gate hash-matches.
# ---------------------------------------------------------------------------


def corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = _tokens()
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.sum(F.size(toks)).alias("total_tokens"),
            floor_round(F.avg("n_chars"), 2).alias("avg_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            floor_round(F.expr("percentile(n_chars, 0.5)"), 2).alias(
                "median_chars"
            ),
        )
        .orderBy("lang")
    )


CORPUS_PROFILE_SQL = r"""
SELECT lang,
       count(*) AS n_docs,
       count(DISTINCT source) AS n_sources,
       CAST(sum(len(string_split_regex(text, '\s+'))) AS BIGINT) AS total_tokens,
       CAST(floor(avg(n_chars) * 100 + 1e-6) / 100 AS DOUBLE) AS avg_chars,
       min(n_chars) AS min_chars,
       max(n_chars) AS max_chars,
       CAST(floor(quantile_cont(n_chars, 0.5) * 100 + 1e-6) / 100 AS DOUBLE) AS median_chars
FROM documents
GROUP BY lang
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# Sequence packing (training:seq-pack) — concatenate-and-chop packing
# of tokenized documents into fixed-length training sequences (the
# GPT-style pretraining layout: documents are streamed in a
# deterministic order, concatenated, and cut every SEQ_PACK_LEN
# tokens; a document belongs to the sequence where its first token
# lands).
#
# The stream order must be reproducible without any global sort, so
# packing runs per *pack group* = a hex prefix of md5(doc_id): a pure
# function of the row (same trick as stratified_sample), uniform by
# construction, and identical across engines, re-runs, and cluster
# sizes. Within a group the window orders by doc_id.
#
# Scale shape: ONE shuffle (hash-partition on pack_group), a window
# sort within each group, then a map-side-combinable count/sum
# aggregate. The group count is the parallelism knob — 16 (one hex
# char) exercises the shape at test scale; at 10^12 docs use 3-4 hex
# chars (4096-65536 groups) so every group is a modest, independent
# stream and no task owns more than corpus/n_groups tokens. Packing
# quality is unaffected by the group count: every group produces
# back-to-back full sequences with only its final sequence ragged
# (≤ n_groups partial sequences total, amortized to nothing).
# ---------------------------------------------------------------------------

SEQ_PACK_LEN = 512


def sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).alias(
            "pack_group"
        ),
        F.size(_tokens()).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("pack_group")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = toks.withColumn(
        "seq_id",
        F.floor(
            (F.sum("n_tokens").over(w) - F.col("n_tokens"))
            / F.lit(float(SEQ_PACK_LEN))
        ),
    )
    return (
        packed.groupBy("pack_group", "seq_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("seq_tokens"),
        )
        .orderBy("pack_group", "seq_id")
    )


SEQUENCE_PACK_SQL = rf"""
WITH toks AS (
  SELECT doc_id,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS pack_group,
         len(string_split_regex(text, '\s+')) AS n_tokens
  FROM documents
),
packed AS (
  SELECT pack_group, n_tokens,
         CAST(floor(
           (SUM(n_tokens) OVER (PARTITION BY pack_group ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            - n_tokens) / {SEQ_PACK_LEN}.0
         ) AS BIGINT) AS seq_id
  FROM toks
)
SELECT pack_group, seq_id,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS seq_tokens
FROM packed
GROUP BY pack_group, seq_id
ORDER BY pack_group, seq_id
"""


# ---------------------------------------------------------------------------
# Document chunking (training:chunk) — fixed-size token windows with
# overlap, the RAG/embedding-prep pass. The reference *intends* a
# text_chunker module (markdown_extractor.py:69,107 imports
# `..text_chunker.SectionHierarchy/hash_string`; the module is absent
# from the checkout — SURVEY.md §7.4 dangling import), so the chunk
# rule here is the standard sliding window: starts every
# CHUNK_STRIDE = CHUNK_SIZE - CHUNK_OVERLAP tokens, window of
# CHUNK_SIZE, final ragged window kept; chunk id = window ordinal;
# chunk fingerprint = md5 (the reference's hash_string fallback,
# markdown_extractor.py:80-82, is exactly md5-hexdigest).
#
# Scale shape: map-only — tokens, window starts (F.sequence), slices
# (F.transform + F.slice) and the posexplode all happen inside one
# projection over the scan; no shuffle anywhere, so it parallelizes
# with the split count. ~len/stride output rows per doc.
# ---------------------------------------------------------------------------

CHUNK_SIZE = 64
CHUNK_OVERLAP = 16
CHUNK_STRIDE = CHUNK_SIZE - CHUNK_OVERLAP


def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = _tokens()

    def _slice(start):
        # factory-free HOF use is safe here: `start` is the lambda arg
        return F.slice(F.col("toks"), start + 1, CHUNK_SIZE)

    with_chunks = docs.select(
        "doc_id",
        toks.alias("toks"),
    ).select(
        "doc_id",
        F.transform(
            F.sequence(
                F.lit(0),
                F.greatest(F.size("toks") - 1, F.lit(0)),
                F.lit(CHUNK_STRIDE),
            ),
            _slice,
        ).alias("chunks"),
    )
    exploded = with_chunks.select(
        "doc_id", F.posexplode("chunks").alias("chunk_id", "chunk")
    )
    chunk_text = F.concat_ws(" ", F.col("chunk"))
    return exploded.select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.size("chunk").alias("chunk_tokens"),
        F.md5(chunk_text).alias("chunk_md5"),
    ).orderBy("doc_id", "chunk_id")


CHUNK_DOCUMENTS_SQL = rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents
),
chunks AS (
  SELECT doc_id,
         CAST((i - 1) / {CHUNK_STRIDE} AS INT) AS chunk_id,
         t[i:i+{CHUNK_SIZE - 1}] AS chunk
  FROM toks,
       unnest(generate_series(1, greatest(len(t), 1), {CHUNK_STRIDE})) AS u(i)
)
SELECT doc_id, chunk_id,
       CAST(len(chunk) AS INT) AS chunk_tokens,
       md5(array_to_string(chunk, ' ')) AS chunk_md5
FROM chunks
ORDER BY doc_id, chunk_id
"""


# ---------------------------------------------------------------------------
# CCNet-style perplexity scoring (Wenzek et al. 2020): per-doc mean
# negative log10-prob under the vendored unigram LM (unigram_lm.py,
# trained deterministically by scripts/train_unigram_lm.py — the
# offline stand-in for CCNet's KenLM, same operator shape). Low NLL =
# generator-voiced text; junk/OOV-heavy docs score toward the OOV
# ceiling and a threshold drops the tail.
#
# Scale shape: explode tokens → broadcast-join the (tiny, pinned) LM
# table → one map-side-combinable hash aggregate per doc. Log-probs
# are exact 4-decimal DECIMALS, so the per-doc sum is exact integer
# arithmetic in both engines — no float-summation-order divergence —
# and only the final mean is floating (one division, then the house
# floor-round). OOV tokens take a half-count log-prob instead of
# leaving the vocabulary contract, so this kernel needs no
# adversarial-sweep exclusion (unlike the BPE VALUES-lookup oracle).
# ---------------------------------------------------------------------------


def perplexity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..unigram_lm import OOV_LOGP, VOCAB_LOGP

    lm = F.broadcast(
        spark.createDataFrame(VOCAB_LOGP, "tok string, logp_s string").select(
            "tok", F.col("logp_s").cast("decimal(9,4)").alias("logp")
        )
    )
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", _tokens().alias("toks")
    )
    per_tok = docs.select("doc_id", F.explode("toks").alias("tok"))
    scored = per_tok.join(lm, "tok", "left").select(
        "doc_id",
        F.coalesce(
            F.col("logp"), F.lit(OOV_LOGP).cast("decimal(9,4)")
        ).alias("logp"),
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.sum("logp").alias("s"), F.count("*").alias("n"))
        .select(
            "doc_id",
            floor_round(
                -F.col("s").cast("double") / F.col("n"), 4
            ).alias("nll"),
        )
        .orderBy("doc_id")
    )


def _lm_values_sql() -> str:
    from ..unigram_lm import VOCAB_LOGP

    return ", ".join(
        "('{}', CAST({} AS DECIMAL(9,4)))".format(tok.replace("'", "''"), lp)
        for tok, lp in VOCAB_LOGP
    )


def _perplexity_sql() -> str:
    from ..unigram_lm import OOV_LOGP

    return rf"""
WITH lm(tok, logp) AS (VALUES {_lm_values_sql()}),
per_tok AS (
  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS tok
  FROM documents
),
scored AS (
  SELECT p.doc_id,
         coalesce(l.logp, CAST({OOV_LOGP} AS DECIMAL(9,4))) AS logp
  FROM per_tok p LEFT JOIN lm l ON p.tok = l.tok
)
SELECT doc_id,
       CAST(floor((-CAST(sum(logp) AS DOUBLE) / count(*)) * 10000 + 1e-6)
            / 10000 AS DOUBLE) AS nll
FROM scored GROUP BY doc_id ORDER BY doc_id
"""


PERPLEXITY_SCORE_SQL = _perplexity_sql()


# ---------------------------------------------------------------------------
# Token-budget truncation (context-window fitting)
# ---------------------------------------------------------------------------

TRUNC_MAX_TOKENS = 50  # the reference's default budget


def truncate_by_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Head-and-tail token-budget truncation — the reference's
    ``truncate_text_by_tokens`` (llm_integration/utils/spacy_utils.py:
    87-100): a doc over the budget keeps its first and last
    ``max_tokens // 2`` tokens joined by ``"... "``; a doc within
    budget passes through verbatim. Tokens here are ``\\S+`` runs (the
    documented spaCy-tokenizer proxy, docs/PARITY.md) and the kept
    halves re-join on single spaces — inner whitespace is normalized
    in the TRUNCATED branch only, mirroring the reference's
    ``.strip()`` at the seam.

    Map-only: the token array is materialized once per row in its own
    projection (never re-derived per slice — the HOF-capture lesson,
    docs/PLANS.md §12), then three O(budget) slices; no shuffle. NULL
    text propagates NULL (the reference would crash on None; disclosed
    divergence)."""
    half = TRUNC_MAX_TOKENS // 2
    toked = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .select(
            "doc_id",
            "text",
            F.expr(r"regexp_extract_all(text, '\\S+', 0)").alias("toks"),
        )
    )
    n = F.size("toks")
    head = F.array_join(F.slice("toks", 1, half), " ")
    tail = F.array_join(F.slice(F.col("toks"), -half, half), " ")
    return toked.select(
        "doc_id",
        n.alias("n_tokens"),
        F.when(n <= TRUNC_MAX_TOKENS, F.col("text"))
        .otherwise(F.concat(head, F.lit("... "), tail))
        .alias("truncated"),
    ).orderBy("doc_id")


TRUNCATE_BY_TOKENS_SQL = f"""
WITH t AS (
  SELECT doc_id, text, regexp_extract_all(text, '\\S+') AS toks
  FROM documents
)
SELECT doc_id,
  CAST(len(toks) AS INTEGER) AS n_tokens,
  CASE WHEN len(toks) <= {TRUNC_MAX_TOKENS} THEN text
       ELSE array_to_string(list_slice(toks, 1, {TRUNC_MAX_TOKENS // 2}), ' ')
            || '... '
            || array_to_string(list_slice(toks, -{TRUNC_MAX_TOKENS // 2}, -1), ' ')
  END AS truncated
FROM t
ORDER BY doc_id
"""

# ---------------------------------------------------------------------------
# Language-mixture sampling (training:data-mixing)
#
# Pretraining corpora are rarely consumed at their natural language
# proportions — a target mixture (the DoReMi / Pile-style domain-weight
# idea, statically applied) says what fraction of the TRAINING set each
# language should be. Given target shares, take the largest corpus the
# observed counts can supply at exactly those shares: M = min over
# target languages of count_l / share_l, keep share_l * M docs from
# language l, i.e. per-language acceptance rate share_l * M / count_l
# (rate 1.0 for the binding language). Languages outside the target
# map are dropped.
#
# Scale shape: ONE tiny aggregate (count per target language — 5 keys,
# map-side combined) broadcast back as per-language rates; the
# selection itself is the same coordination-free md5-threshold rule as
# stratified_sample — a pure function of (doc_id, lang), no rand(), so
# the sample is reproducible run-to-run and resumable shard-by-shard.
# The hash fraction uses 8 hex digits (2^32 grid) so rates resolve to
# ~1e-10, vs the single-digit 1/16 grid of the fixed-rate sampler.
# ---------------------------------------------------------------------------

TARGET_MIX: dict[str, float] = {
    "en": 0.40,
    "de": 0.25,
    "fr": 0.15,
    "es": 0.15,
    "zh": 0.05,
}


def language_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    tgt = F.broadcast(
        spark.createDataFrame(
            [(lang, share) for lang, share in TARGET_MIX.items()],
            "lang string, share double",
        )
    )
    counts = (
        docs.join(tgt, "lang")
        .groupBy("lang", "share")
        .agg(F.count("*").alias("cnt"))
    )
    m = counts.agg(
        F.min(F.col("cnt").cast("double") / F.col("share")).alias("m")
    )
    rates = counts.crossJoin(F.broadcast(m)).select(
        "lang",
        (F.col("share") * F.col("m") / F.col("cnt").cast("double")).alias(
            "rate"
        ),
    )
    frac = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("double")
        / F.lit(4294967296.0)
    )
    return (
        docs.join(F.broadcast(rates), "lang")
        .where(frac < F.col("rate"))
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


_MIX_VALUES = ", ".join(
    f"('{lang}', CAST({share} AS DOUBLE))" for lang, share in TARGET_MIX.items()
)

LANGUAGE_MIX_SQL = f"""
WITH tgt(lang, share) AS (
  VALUES {_MIX_VALUES}
), c AS (
  SELECT d.lang, t.share, count(*) AS cnt
  FROM documents d JOIN tgt t ON t.lang = d.lang
  GROUP BY 1, 2
), m AS (
  SELECT min(CAST(cnt AS DOUBLE) / share) AS m FROM c
), r AS (
  SELECT lang, share * m.m / CAST(cnt AS DOUBLE) AS rate FROM c, m
)
SELECT d.doc_id, d.lang
FROM documents d JOIN r ON r.lang = d.lang
WHERE CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) AS BIGINT)
      / 4294967296.0 < r.rate
ORDER BY d.doc_id
"""

# ---------------------------------------------------------------------------
# Curriculum quality buckets (training:curriculum)
#
# Curriculum / quality-thresholded training schedules need each doc's
# quality RANK within its language, not the raw score (score scales
# differ by language). Deciles via ntile over a lang-partitioned
# window, ordered by (quality ASC NULLS LAST, doc_id) — the explicit
# null order matters cross-engine (Spark defaults nulls-first ASC,
# DuckDB nulls-last) and the doc_id tiebreak makes ntile deterministic
# under floor4 score ties.
#
# Scale note: a per-language total order is inherent to exact decile
# assignment — at 10^12 docs the honest variant is percentile_approx
# cutoffs per language (tiny agg, broadcast back, bucket by
# comparison); the graded query keeps the exact window form so the
# DuckDB oracle can state the same rule.
# ---------------------------------------------------------------------------

CURRICULUM_BUCKETS = 10


def curriculum_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .textstats import quality_score

    q = quality_score(spark, sf_dir).select("doc_id", "quality")
    langs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    w = (
        Window.partitionBy("lang")
        .orderBy(F.asc_nulls_last("quality"), F.asc("doc_id"))
    )
    return (
        langs.join(q, "doc_id")
        .select(
            "doc_id",
            "lang",
            "quality",
            F.ntile(CURRICULUM_BUCKETS).over(w).alias("decile"),
        )
        .orderBy("doc_id")
    )


def _curriculum_sql() -> str:
    from .textstats import QUALITY_SCORE_SQL

    return f"""
WITH q AS ({QUALITY_SCORE_SQL})
SELECT d.doc_id, d.lang, q.quality,
  CAST(ntile({CURRICULUM_BUCKETS}) OVER (
    PARTITION BY d.lang
    ORDER BY q.quality ASC NULLS LAST, d.doc_id ASC
  ) AS INTEGER) AS decile
FROM documents d JOIN q ON q.doc_id = d.doc_id
ORDER BY d.doc_id
"""


CURRICULUM_SQL = _curriculum_sql()


# ---------------------------------------------------------------------------
# DSIR importance weights (training:dsir)
#
# Xie et al. 2023 ("Data Selection for Language Models via Importance
# Resampling"): score every raw-pool document by the log-likelihood
# ratio of a hashed bag-of-ngrams model fit on a target domain vs one
# fit on the raw pool; resampling by these weights shifts the corpus
# toward the target distribution. Features are unigrams + bigrams
# hashed into 256 buckets (first 2 hex chars of md5 — engine-portable,
# same cross-engine-hash rule as the rest of the suite); both bucket
# distributions are Laplace-smoothed (+1 / +B). The "target domain"
# stand-in is docs 0..DSIR_TARGET_MAX_ID-1, the same synthetic-corpus
# technique decontaminate uses for its benchmark set.
#
# Scale shape: feature explode is map-only; bucket counts are two
# hash-aggregates with map-side combine (256 groups — the shuffle
# carries ≤256 rows per task); corpus totals ride a single-row agg
# crossJoin(broadcast(...)) — the bm25 corpus-stats idiom; the 256-row
# log-ratio table broadcasts into a map-side join; the per-doc weight
# is one final hash-aggregate on doc_id. No driver-side state, no
# collect, nothing data-dependent on the driver.
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 256
DSIR_TARGET_MAX_ID = 100  # docs 0..99 stand in for the target domain


def dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", _tokens().alias("toks"))
    feats = toks.select(
        "doc_id",
        F.explode(
            F.concat(F.col("toks"), _grams(F.col("toks"), 2))
        ).alias("g"),
    ).select("doc_id", F.substring(F.md5("g"), 1, 2).alias("b"))
    raw = feats.groupBy("b").agg(F.count("*").alias("n_raw"))
    tgt = (
        feats.filter(F.col("doc_id") < DSIR_TARGET_MAX_ID)
        .groupBy("b")
        .agg(F.count("*").alias("n_tgt"))
    )
    totals = feats.agg(
        F.count("*").alias("nr"),
        F.count(
            F.when(F.col("doc_id") < DSIR_TARGET_MAX_ID, F.lit(1))
        ).alias("nt"),
    )
    logratio = (
        F.log(
            (F.coalesce(F.col("n_tgt"), F.lit(0)) + 1.0)
            / (F.col("nt") + DSIR_BUCKETS)
        )
        - F.log((F.col("n_raw") + 1.0) / (F.col("nr") + DSIR_BUCKETS))
    )
    lr = (
        raw.join(tgt, "b", "left")
        .crossJoin(F.broadcast(totals))
        .select("b", logratio.alias("logratio"))
    )
    return (
        feats.join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_feats"),
            floor_round(F.sum("logratio"), 4).alias("dsir_weight"),
        )
    )


DSIR_WEIGHTS_SQL = rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents
),
feats AS (
  SELECT doc_id, substr(md5(g), 1, 2) AS b
  FROM (
    SELECT doc_id,
           unnest(list_concat(
             t,
             list_transform(generate_series(1, len(t) - 1),
                            i -> t[i] || ' ' || t[i + 1]))) AS g
    FROM toks
  )
),
raw AS (SELECT b, count(*) AS n_raw FROM feats GROUP BY b),
tgt AS (SELECT b, count(*) AS n_tgt FROM feats
        WHERE doc_id < {DSIR_TARGET_MAX_ID} GROUP BY b),
tot AS (SELECT count(*) AS nr,
               count(*) FILTER (WHERE doc_id < {DSIR_TARGET_MAX_ID}) AS nt
        FROM feats),
lr AS (
  SELECT r.b,
         ln((coalesce(g.n_tgt, 0) + 1.0) / (t.nt + {DSIR_BUCKETS}))
       - ln((r.n_raw + 1.0) / (t.nr + {DSIR_BUCKETS})) AS logratio
  FROM raw r LEFT JOIN tgt g ON g.b = r.b CROSS JOIN tot t
)
SELECT f.doc_id,
       CAST(count(*) AS BIGINT) AS n_feats,
       CAST(floor(sum(l.logratio) * 10000 + 1e-6) / 10000 AS DOUBLE)
         AS dsir_weight
FROM feats f JOIN lr l ON l.b = f.b
GROUP BY f.doc_id
"""


# ---------------------------------------------------------------------------
# Bloom-filter decontamination (training:decontaminate-bloom — the
# broadcast-bitset variant of `decontaminate` above, the shape that
# wins at corpus scale when the benchmark gram set is too large to
# broadcast as strings but its BLOOM FILTER is not: m bits travel to
# every task instead of the gram text).
#
# Deterministic bloom: m = 4096 positions, k = 3 salted hashes
# pos_j(g) = int(md5('<j>|' || g)[:8], 16) % m — the same md5-hex
# arithmetic language_mix_sample uses, so both engines compute
# IDENTICAL bit positions and the false-positive set is exactly
# reproducible (and hash-gated) cross-engine. Output carries the
# exact-hit count next to the bloom-hit count, so the query itself
# demonstrates the false-positive envelope (n_bloom_hits >=
# n_exact_hits always; equality iff no FP for that doc).
#
# Scale shape: the bench side collapses to ONE row (a <=m-element
# position array via collect_set) that crossJoin(broadcast(...))s
# into the corpus scan — the corpus side never shuffles to test
# membership. At 100 TB you would pack the array into a real bitset
# inside an Arrow kernel; the declarative array_contains form keeps
# the whole operator SQL-gated and costs O(m) per gram at test scale.
# The exact-hit column reuses decontaminate's broadcast semi-join.
# ---------------------------------------------------------------------------

BLOOM_M = 4096
BLOOM_K = 3


def _bloom_pos(g: Column, j: int) -> Column:
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{j}|"), g)), 1, 8), 16, 10
        ).cast("long")
        % BLOOM_M
    )


def _bench_grams(docs: DataFrame) -> DataFrame:
    """DISTINCT n-grams of the held-out benchmark slice."""
    grams = docs.select("doc_id", _tokens().alias("toks")).select(
        "doc_id", F.explode(_grams(F.col("toks"), DECON_N)).alias("g")
    )
    return (
        grams.filter(F.col("doc_id") < DECON_BENCH_MAX_ID)
        .select("g")
        .distinct()
    )


def _bench_bits_df(bench: DataFrame) -> DataFrame:
    """1-row DataFrame holding the sorted bloom-position array."""
    return bench.select(
        F.explode(
            F.array(*[_bloom_pos(F.col("g"), j) for j in range(BLOOM_K)])
        ).alias("pos")
    ).agg(F.sort_array(F.collect_set("pos")).alias("bits"))


def bloom_bench_bits(spark: SparkSession, sf_dir: str) -> list:
    """Materialize the benchmark bloom bitset as a plain Python list
    (≤ BLOOM_M ints) — the broadcast-into-a-stream entry point: the
    streaming quality gate folds these positions into its plan as a
    constant array, so decontamination runs on an infinite stream with
    zero stream-side joins."""
    [row] = _bench_bits_df(
        _bench_grams(load(spark, sf_dir, "documents"))
    ).collect()
    return list(row["bits"])


def bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    grams = docs.select("doc_id", _tokens().alias("toks")).select(
        "doc_id", F.explode(_grams(F.col("toks"), DECON_N)).alias("g")
    )
    bench = _bench_grams(docs)
    bits = _bench_bits_df(bench)
    corpus = grams.filter(F.col("doc_id") >= DECON_BENCH_MAX_ID)
    in_bloom = None
    for j in range(BLOOM_K):
        c = F.array_contains(F.col("bits"), _bloom_pos(F.col("g"), j))
        in_bloom = c if in_bloom is None else (in_bloom & c)
    probed = corpus.crossJoin(F.broadcast(bits)).select(
        "doc_id", "g", in_bloom.alias("bloom_hit")
    )
    # exact flag via the DISTINCT bench set (left join on a unique key
    # — a corpus gram occurring twice in one doc must count twice in
    # n_grams, so nothing here may multiply or collapse corpus rows)
    bench_flag = bench.withColumn("exact_hit", F.lit(True))
    return (
        probed.join(F.broadcast(bench_flag), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum(F.col("bloom_hit").cast("long")).alias("n_bloom_hits"),
            F.sum(
                F.coalesce(F.col("exact_hit"), F.lit(False)).cast("long")
            ).alias("n_exact_hits"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_bloom_hits",
            "n_exact_hits",
            (F.col("n_bloom_hits") > 0).alias("flagged"),
        )
    )


def _bloom_pos_sql(g: str, j: int) -> str:
    return (
        f"CAST('0x' || substr(md5('{j}|' || {g}), 1, 8) AS BIGINT)"
        f" % {BLOOM_M}"
    )


BLOOM_DECON_SQL = rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents
),
grams AS (
  SELECT doc_id, array_to_string(t[i:i+{DECON_N - 1}], ' ') AS g
  FROM toks,
       unnest(generate_series(1, greatest(len(t) - {DECON_N - 1}, 0))) AS u(i)
),
bench AS (SELECT DISTINCT g FROM grams WHERE doc_id < {DECON_BENCH_MAX_ID}),
bits AS (
  SELECT list(DISTINCT pos) AS bits FROM (
    {' UNION ALL '.join(f"SELECT {_bloom_pos_sql('g', j)} AS pos FROM bench" for j in range(BLOOM_K))}
  )
),
corpus AS (SELECT doc_id, g FROM grams WHERE doc_id >= {DECON_BENCH_MAX_ID}),
probed AS (
  SELECT c.doc_id, c.g,
         {' AND '.join(f"list_contains(b.bits, {_bloom_pos_sql('c.g', j)})" for j in range(BLOOM_K))}
           AS bloom_hit,
         c.g IN (SELECT g FROM bench) AS exact_hit
  FROM corpus c CROSS JOIN bits b
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN bloom_hit THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bloom_hits,
       CAST(sum(CASE WHEN exact_hit THEN 1 ELSE 0 END) AS BIGINT)
         AS n_exact_hits,
       sum(CASE WHEN bloom_hit THEN 1 ELSE 0 END) > 0 AS flagged
FROM probed
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Global shuffle + shard assignment (training:shuffle-shard) — the
# last-mile export op of every pretraining pipeline: give the cleaned
# corpus a reproducible random order and cut it into fixed-count
# shards, with a held-out train/valid/test split riding along.
#
# A naive "ORDER BY random() LIMIT into files" needs a global total
# order; the scalable layout (and the one real pipelines use) makes
# the shard a pure HASH of the row: shard = md5(doc_id) bucket, and
# only the WITHIN-shard order is a sort. That is one hash-partition
# shuffle on shard_id + a per-shard window — no single-partition
# global window anywhere (Window.orderBy without partitionBy would
# funnel 100 TB through one task). The within-shard sort key is a
# differently-salted md5, so shard membership and shard-internal
# order are independent permutations; together they define the same
# deterministic global order (shard_id, pos) on every engine, re-run,
# and cluster size. The split column uses a third salt: resharding
# (changing N_SHARDS) never moves a document across train/valid/test.
#
# At scale the physical write is repartition(N_SHARDS, shard_id) +
# sortWithinPartitions(sort_key) + write; this graded query returns
# the assignment itself so the oracle can check every doc's
# (shard, pos, split) exactly. Reference analog: none (the reference
# is single-process); this is the Spark-native counterpart of its
# JSON-perline export (api.py) at training scale.
# ---------------------------------------------------------------------------

N_SHARDS = 16
SPLIT_TRAIN_PCT = 90  # <90 train, <95 valid, else test


def _salted_hash64(salt: str, col: Column) -> Column:
    """First 8 md5 hex chars of f"{salt}|{col}" as a bigint — the
    engine-portable uniform hash used across the curation suite."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + "|"), col)), 1, 8), 16, 10
    ).cast("long")


def shuffle_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    shard = (_salted_hash64("shard", did) % N_SHARDS).alias("shard_id")
    sort_key = F.md5(F.concat(F.lit("order|"), did)).alias("sort_key")
    pct = _salted_hash64("split", did) % 100
    split = (
        F.when(pct < SPLIT_TRAIN_PCT, "train")
        .when(pct < SPLIT_TRAIN_PCT + 5, "valid")
        .otherwise("test")
        .alias("split")
    )
    staged = docs.select("doc_id", shard, sort_key, split)
    w = Window.partitionBy("shard_id").orderBy("sort_key", "doc_id")
    return (
        staged.withColumn("pos", F.row_number().over(w) - 1)
        .select("doc_id", "shard_id", "pos", "split")
        .orderBy("shard_id", "pos")
    )


SHUFFLE_SHARD_SQL = f"""
WITH staged AS (
  SELECT doc_id,
         CAST('0x' || substr(md5('shard|' || CAST(doc_id AS VARCHAR)), 1, 8)
              AS BIGINT) % {N_SHARDS} AS shard_id,
         md5('order|' || CAST(doc_id AS VARCHAR)) AS sort_key,
         CAST('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 8)
              AS BIGINT) % 100 AS pct
  FROM documents
)
SELECT doc_id, shard_id,
       CAST(row_number() OVER (PARTITION BY shard_id
                               ORDER BY sort_key, doc_id) - 1 AS INT) AS pos,
       CASE WHEN pct < {SPLIT_TRAIN_PCT} THEN 'train'
            WHEN pct < {SPLIT_TRAIN_PCT + 5} THEN 'valid'
            ELSE 'test' END AS split
FROM staged
ORDER BY shard_id, pos
"""


def shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(shard, split) manifest of the export above: doc and token
    totals — what a training job reads to plan epochs. Reuses the
    assignment plan; aggregation is a map-side-combinable hash agg on
    top of the same single shuffle."""
    docs = load(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    shard = (_salted_hash64("shard", did) % N_SHARDS).alias("shard_id")
    pct = _salted_hash64("split", did) % 100
    split = (
        F.when(pct < SPLIT_TRAIN_PCT, "train")
        .when(pct < SPLIT_TRAIN_PCT + 5, "valid")
        .otherwise("test")
        .alias("split")
    )
    return (
        docs.select(
            shard, split, F.size(_tokens()).alias("n_tokens")
        )
        .groupBy("shard_id", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
        .orderBy("shard_id", "split")
    )


SHARD_MANIFEST_SQL = rf"""
WITH staged AS (
  SELECT CAST('0x' || substr(md5('shard|' || CAST(doc_id AS VARCHAR)), 1, 8)
              AS BIGINT) % {N_SHARDS} AS shard_id,
         CAST('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 8)
              AS BIGINT) % 100 AS pct,
         len(string_split_regex(text, '\s+')) AS n_tokens
  FROM documents
)
SELECT shard_id,
       CASE WHEN pct < {SPLIT_TRAIN_PCT} THEN 'train'
            WHEN pct < {SPLIT_TRAIN_PCT + 5} THEN 'valid'
            ELSE 'test' END AS split,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
FROM staged
GROUP BY 1, 2
ORDER BY shard_id, split
"""


# ---------------------------------------------------------------------------
# Per-domain document cap (training:domain-cap) — C4/CCNet-style host
# capping: no single domain may contribute more than DOMCAP_K docs to
# the training mix (mirror sites and SEO farms otherwise dominate a
# crawl). Selection is a salted-hash order per domain — deterministic,
# coordination-free, and unbiased w.r.t. crawl/doc_id order (capping
# "first K crawled" would keep a domain's oldest template pages).
#
# Scale shape: the naive form is one window over source — but a hot
# domain at 100 TB (10^8 docs of one host) makes that partition one
# task's problem. The implemented shape is the two-level tournament:
# rank within (source, salt_bucket) and keep ≤ K per bucket (bounded
# state per task regardless of domain size), then re-rank the ≤ K*B
# survivors per source. The final top-K per source is provably the
# global top-K (it is contained in the union of bucket top-Ks), so the
# single-window oracle checks the two-level plan exactly.
# ---------------------------------------------------------------------------

DOMCAP_K = 10
DOMCAP_BUCKETS = 4


def domain_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    key = F.md5(F.concat(F.lit("domcap|"), did))
    staged = docs.select(
        "doc_id",
        "source",
        key.alias("key"),
        (_salted_hash64("domcap-bucket", did) % DOMCAP_BUCKETS).alias("b"),
    )
    w_bucket = Window.partitionBy("source", "b").orderBy("key", "doc_id")
    survivors = (
        staged.withColumn("rb", F.row_number().over(w_bucket))
        .where(F.col("rb") <= DOMCAP_K)
        .drop("rb", "b")
    )
    w_src = Window.partitionBy("source").orderBy("key", "doc_id")
    kept = (
        survivors.withColumn("rank_in_source", F.row_number().over(w_src))
        .where(F.col("rank_in_source") <= DOMCAP_K)
    )
    totals = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_source_docs")
    )
    return (
        kept.join(F.broadcast(totals), "source")
        .select(
            "doc_id", "source",
            F.col("rank_in_source").cast("int").alias("rank_in_source"),
            "n_source_docs",
        )
        .orderBy("source", "rank_in_source")
    )


DOMAIN_CAP_SQL = f"""
WITH staged AS (
  SELECT doc_id, source,
         md5('domcap|' || CAST(doc_id AS VARCHAR)) AS key
  FROM documents
),
ranked AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY key, doc_id)
           AS rank_in_source
  FROM staged
),
totals AS (
  SELECT source, count(*) AS n_source_docs FROM documents GROUP BY 1
)
SELECT r.doc_id, r.source,
       CAST(r.rank_in_source AS INT) AS rank_in_source,
       t.n_source_docs
FROM ranked r JOIN totals t USING (source)
WHERE r.rank_in_source <= {DOMCAP_K}
ORDER BY r.source, r.rank_in_source
"""


# ---------------------------------------------------------------------------
# UniMax language allocation (training:unimax, Chung et al. 2023 —
# "UniMax: Fairer and More Effective Language Sampling") — allocate a
# token BUDGET across languages so no language repeats more than
# UNIMAX_EPOCH_CAP epochs and the remainder is split EQUALLY (not
# proportionally): the waterfill whose closed form is "cap the
# ascending-size prefix, share the rest".
#
# Closed form (languages sorted ascending by size, k = rank):
#   capped(k)  ⇔  C·cumsum(k) + C·size_k·(n−k) ≤ B
#   k* = max capped k;  share = (B − C·cumsum(k*)) / (n − k*)
#   alloc = C·size for ranks ≤ k*, else share
# The capped set is always an ascending-size prefix, so ONE window
# cumsum + one max decides the whole allocation — no iteration.
#
# Scale shape: per-language token totals are a map-side-combinable
# aggregate; everything after runs on the LANGUAGE table (≤ a few
# hundred rows for any real corpus), where a single-partition window
# is the right plan, not a bottleneck.
# ---------------------------------------------------------------------------

UNIMAX_EPOCH_CAP = 2
UNIMAX_BUDGET_FACTOR = 1.5  # budget = floor(1.5 × corpus tokens)


def unimax_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    per_lang = (
        docs.select("lang", F.size(_tokens()).alias("n"))
        .groupBy("lang")
        .agg(F.sum("n").cast("double").alias("sz"))
    )
    total = per_lang.agg(
        F.sum("sz").alias("tot"), F.count("*").alias("n_langs")
    )
    staged = per_lang.crossJoin(F.broadcast(total)).withColumn(
        "budget", F.floor(F.lit(UNIMAX_BUDGET_FACTOR) * F.col("tot"))
    )
    w = Window.orderBy("sz", "lang")
    staged = staged.withColumn("rk", F.row_number().over(w)).withColumn(
        "cumcap",
        F.lit(float(UNIMAX_EPOCH_CAP))
        * F.sum("sz").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    capped = (
        F.col("cumcap")
        + UNIMAX_EPOCH_CAP * F.col("sz") * (F.col("n_langs") - F.col("rk"))
        <= F.col("budget")
    )
    whole = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    staged = staged.withColumn("is_capped", capped).withColumn(
        "kstar",
        F.coalesce(
            F.max(F.when(F.col("is_capped"), F.col("rk"))).over(whole),
            F.lit(0),
        ),
    ).withColumn(
        "cum_kstar",
        F.coalesce(
            F.max(
                F.when(F.col("rk") == F.col("kstar"), F.col("cumcap"))
            ).over(whole),
            F.lit(0.0),
        ),
    )
    share = (F.col("budget") - F.col("cum_kstar")) / (
        F.col("n_langs") - F.col("kstar")
    )
    alloc = F.when(
        F.col("rk") <= F.col("kstar"),
        F.lit(float(UNIMAX_EPOCH_CAP)) * F.col("sz"),
    ).otherwise(share)
    return staged.select(
        "lang",
        F.col("sz").cast("long").alias("n_tokens"),
        F.col("is_capped").alias("capped"),
        F.floor(alloc).cast("long").alias("alloc_tokens"),
        floor_round(alloc / F.col("sz"), 4).alias("epochs"),
    ).orderBy("lang")


UNIMAX_SQL = rf"""
WITH per_lang AS (
  SELECT lang,
         CAST(sum(len(string_split_regex(text, '\s+'))) AS DOUBLE) AS sz
  FROM documents GROUP BY 1
),
tot AS (SELECT sum(sz) AS tot, count(*) AS n_langs FROM per_lang),
staged AS (
  SELECT lang, sz,
         floor({UNIMAX_BUDGET_FACTOR} * (SELECT tot FROM tot)) AS budget,
         (SELECT n_langs FROM tot) AS n_langs,
         row_number() OVER (ORDER BY sz, lang) AS rk,
         {float(UNIMAX_EPOCH_CAP)} *
           sum(sz) OVER (ORDER BY sz, lang
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cumcap
  FROM per_lang
),
flagged AS (
  SELECT *,
         cumcap + {UNIMAX_EPOCH_CAP} * sz * (n_langs - rk) <= budget
           AS is_capped
  FROM staged
),
solved AS (
  SELECT *,
         coalesce(max(CASE WHEN is_capped THEN rk END) OVER (), 0) AS kstar
  FROM flagged
),
solved2 AS (
  SELECT *,
         coalesce(max(CASE WHEN rk = kstar THEN cumcap END) OVER (), 0.0)
           AS cum_kstar
  FROM solved
)
SELECT lang,
       CAST(sz AS BIGINT) AS n_tokens,
       is_capped AS capped,
       CAST(floor(CASE WHEN rk <= kstar THEN {float(UNIMAX_EPOCH_CAP)} * sz
                       ELSE (budget - cum_kstar) / (n_langs - kstar)
                  END) AS BIGINT) AS alloc_tokens,
       floor((CASE WHEN rk <= kstar THEN {float(UNIMAX_EPOCH_CAP)} * sz
                   ELSE (budget - cum_kstar) / (n_langs - kstar)
              END) / sz * 10000 + 1e-6) / 10000 AS epochs
FROM solved2
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (training:weighted-sample,
# Efraimidis & Spirakis 2006 "Weighted random sampling with a
# reservoir") — pick WS_N docs with inclusion probability proportional
# to a quality weight, in ONE distributed pass: each row computes
# key = ln(u)/w for a deterministic uniform u (salted md5 — the
# corpus-wide reproducibility convention), and the global top-N keys
# ARE the weighted sample. No reservoir, no sequential scan, no
# rand(): the E-S priority trick turns weighted sampling into a
# top-k, which Spark plans as TakeOrderedAndProject (map-side
# partial top-N per partition, no global sort).
#
# Cross-engine ranking rides the floored key (1-ulp ln() noise is
# ~1e-15 absolute here, 8-decimal floor + doc_id tie-break per the
# floor4-on-ORDER lesson, PLANS §16.4).
# ---------------------------------------------------------------------------

WS_N = 100


def weighted_sample_es(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    n_tok = F.size(_tokens())
    w_qual = F.log(F.lit(2.0) + n_tok.cast("double"))
    u = (
        _salted_hash64("essample", F.col("doc_id").cast("string")).cast(
            "double"
        )
        + 0.5
    ) / F.lit(4294967296.0)
    key = F.log(u) / w_qual
    staged = docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        floor_round(w_qual, 4).alias("weight"),
        floor_round(key, 8).alias("priority"),
    )
    return staged.orderBy(F.desc("priority"), F.asc("doc_id")).limit(WS_N)


WEIGHTED_SAMPLE_SQL = rf"""
WITH staged AS (
  SELECT doc_id,
         len(string_split_regex(text, '\s+')) AS n_tokens,
         ln(2.0 + len(string_split_regex(text, '\s+'))) AS w,
         ln((CAST('0x' || substr(md5('essample|' || CAST(doc_id AS VARCHAR)),
                                 1, 8) AS BIGINT) + 0.5) / 4294967296.0)
           AS lnu
  FROM documents
)
SELECT doc_id, n_tokens,
       floor(w * 10000 + 1e-6) / 10000 AS weight,
       floor(lnu / w * 100000000 + 1e-6) / 100000000 AS priority
FROM staged
ORDER BY priority DESC, doc_id
LIMIT {WS_N}
"""


# ---------------------------------------------------------------------------
# Train/test overlap severity (training:overlap-audit, R4-20)
#
# decontaminate answers "is this doc contaminated at all?" (binary);
# model-eval hygiene also needs the SEVERITY — what fraction of a
# document's distinct N-grams appear in the held-out benchmark set
# (the GPT-3 appendix-C "dirtiness" measure that decides between
# dropping a document and merely masking the overlapping span).
#
# Scale shape: identical to decontaminate's — the corpus side explodes
# once to DISTINCT (doc_id, gram), the small benchmark gram set
# broadcasts, and the severity is ONE map-side-combinable hash
# aggregate (count + conditional sum per doc). The re-anchor join onto
# documents restores gram-less docs (< N tokens) at ratio 0 instead of
# silently dropping them.
# ---------------------------------------------------------------------------


def train_test_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    grams = (
        docs.select("doc_id", _tokens().alias("toks"))
        .select("doc_id", F.explode(_grams(F.col("toks"), DECON_N)).alias("g"))
        .distinct()
    )
    bench = (
        grams.filter(F.col("doc_id") < DECON_BENCH_MAX_ID)
        .select("g")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    per_doc = (
        grams.filter(F.col("doc_id") >= DECON_BENCH_MAX_ID)
        .join(F.broadcast(bench), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hit"),
        )
    )
    return (
        docs.filter(F.col("doc_id") >= DECON_BENCH_MAX_ID)
        .select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
            floor_round(
                F.when(
                    F.coalesce("n_grams", F.lit(0)) > 0,
                    F.coalesce("n_hit", F.lit(0))
                    / F.coalesce("n_grams", F.lit(0)),
                ).otherwise(0.0),
                4,
            ).alias("overlap_ratio"),
        )
    )


TRAIN_TEST_OVERLAP_SQL = rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+{DECON_N - 1}], ' ') AS g
  FROM toks, unnest(generate_series(1, greatest(len(t) - {DECON_N - 1}, 0))) AS u(i)
),
bench AS (SELECT DISTINCT g FROM grams WHERE doc_id < {DECON_BENCH_MAX_ID}),
per_doc AS (
  SELECT c.doc_id, count(*) AS n_grams,
         sum(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
  FROM grams c LEFT JOIN bench b USING (g)
  WHERE c.doc_id >= {DECON_BENCH_MAX_ID}
  GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(p.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(coalesce(p.n_hit, 0) AS BIGINT) AS n_hit,
       CAST(floor(
         (CASE WHEN coalesce(p.n_grams, 0) > 0
               THEN CAST(p.n_hit AS DOUBLE) / p.n_grams
               ELSE 0.0 END) * 10000 + 1e-6
       ) / 10000 AS DOUBLE) AS overlap_ratio
FROM documents d LEFT JOIN per_doc p USING (doc_id)
WHERE d.doc_id >= {DECON_BENCH_MAX_ID}
"""


# ---------------------------------------------------------------------------
# Bottom-k hash sample (training:uniform-sample, R4-21)
#
# The mergeable uniform sample: keep the K documents with the smallest
# md5(doc_id). Unlike rand()-based sampling this is deterministic,
# engine-portable, and MERGEABLE — bottom-k of a union is the bottom-k
# of the per-partition bottom-ks, so each executor ships at most K rows
# and the plan is TakeOrderedAndProject (no global sort, no shuffle of
# the corpus). The same property makes the sample incrementally
# maintainable: new data merges by re-taking bottom-k of old-sample ∪
# new-batch. (The KMV/bottom-k sketch construction — Bar-Yossef 2002.)
# ---------------------------------------------------------------------------

BOTTOMK_K = 100


def bottomk_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id")
    h = F.md5(F.concat(F.lit("bk|"), F.col("doc_id").cast("string")))
    return (
        docs.select("doc_id", h.alias("h"))
        .orderBy("h", "doc_id")
        .limit(BOTTOMK_K)
    )


BOTTOMK_SAMPLE_SQL = f"""
SELECT doc_id, md5('bk|' || CAST(doc_id AS VARCHAR)) AS h
FROM documents
ORDER BY h, doc_id
LIMIT {BOTTOMK_K}
"""


# ---------------------------------------------------------------------------
# Length-bucketed sequence packing audit (training:length-buckets,
# R4-22)
#
# Training loaders pad every sequence in a batch to the batch max, so
# batching docs of mixed length burns FLOPs on pad tokens. The standard
# fix is power-of-2 length bucketing; this audit computes, per bucket,
# how efficient that packing is (sum of real tokens / padded slots) —
# the number that decides whether a finer bucket ladder is worth it.
#
# Scale shape: map-only token count (the split stays inside codegen) →
# ONE hash aggregate on ~log2(max_len) keys. ceil(log2(n)) is exact at
# the only points where ceil could flip (exact powers of two are
# representable doubles and libm log2 is exact on them), so the bucket
# boundary is engine-portable without rounding guards.
# ---------------------------------------------------------------------------


def length_bucket_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    ntok = F.size(F.filter(_tokens(), lambda t: t != ""))
    staged = docs.select("doc_id", ntok.alias("ntok")).where(F.col("ntok") > 0)
    bucket = (
        F.pow(F.lit(2.0), F.ceil(F.log2(F.col("ntok")))).cast("long")
    )
    return (
        staged.select("ntok", bucket.alias("seq_bucket"))
        .groupBy("seq_bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("ntok").alias("sum_tokens"),
        )
        .select(
            "seq_bucket", "n_docs", "sum_tokens",
            floor_round(
                F.col("sum_tokens")
                / (F.col("n_docs") * F.greatest(F.col("seq_bucket"), F.lit(1))),
                4,
            ).alias("pad_efficiency"),
        )
        .orderBy("seq_bucket")
    )


LENGTH_BUCKET_SQL = r"""
WITH staged AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(text, '\s+'),
                         x -> x <> '')) AS ntok
  FROM documents
),
b AS (
  SELECT CAST(pow(2.0, ceil(log2(ntok))) AS BIGINT) AS seq_bucket,
         ntok
  FROM staged WHERE ntok > 0
)
SELECT seq_bucket, count(*) AS n_docs,
       CAST(sum(ntok) AS BIGINT) AS sum_tokens,
       CAST(floor(
         CAST(sum(ntok) AS DOUBLE)
         / (count(*) * greatest(seq_bucket, 1)) * 10000 + 1e-6
       ) / 10000 AS DOUBLE) AS pad_efficiency
FROM b
GROUP BY 1
ORDER BY seq_bucket
"""


# ---------------------------------------------------------------------------
# Content-defined chunking (R4-39, training:cdc-chunks — the
# FastCDC/rsync/Borg storage-dedup primitive): chunk boundaries fall
# AFTER any token whose content hash gates to zero, so identical text
# produces identical chunks regardless of where it sits in a document
# — insertions only perturb the one chunk they land in, which is what
# makes chunk-level dedup of shifted/edited near-copies work where
# fixed-size chunking (chunk_documents) resyncs never. Expected chunk
# length = the gate modulus.
#
# Scale shape: tokenize → posexplode → boundary flag from the
# engine-portable md5 gate → chunk ids via ONE prefix-sum window per
# doc (the sessionize shape; the extraction layer splits megadocs
# before any per-doc window) → one hash agg per chunk. The chunk
# fingerprint orders tokens by position inside a chunk-bounded
# collect (state bounded by the gate's geometric tail, not the doc).
CDC_GATE = 8  # expected tokens per chunk


def content_defined_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.filter(_tokens(), lambda t: t != "").alias("toks")
    ).filter(F.size("toks") >= 1)
    pos = toks.select(
        "doc_id", F.posexplode("toks").alias("pos", "tok")
    ).withColumn(
        "boundary",
        (
            F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10)
            .cast("long")
            % CDC_GATE
            == 0
        ).cast("int"),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    chunked = pos.withColumn(
        "chunk_idx", F.coalesce(F.sum("boundary").over(w), F.lit(0)).cast("int")
    )
    return (
        chunked.groupBy("doc_id", "chunk_idx")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("pos", "tok"))
                        ),
                        lambda x: x["tok"],
                    ),
                )
            ).alias("fingerprint"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


CDC_CHUNKS_SQL = rf"""
WITH pos AS (
  SELECT doc_id, u.tok, CAST(u.pos AS INT) - 1 AS pos,
         CASE WHEN CAST('0x' || substr(md5(u.tok), 1, 8) AS BIGINT)
                   % {CDC_GATE} = 0 THEN 1 ELSE 0 END AS boundary
  FROM (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(text, '\s+'),
                              t -> t <> '')) AS tok,
           generate_subscripts(list_filter(string_split_regex(text, '\s+'),
                                           t -> t <> ''), 1) AS pos
    FROM documents
  ) u
),
chunked AS (
  SELECT doc_id, tok, pos,
         CAST(coalesce(sum(boundary) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS INT) AS chunk_idx
  FROM pos
)
SELECT doc_id, chunk_idx,
       CAST(count(*) AS BIGINT) AS n_tokens,
       md5(string_agg(tok, ' ' ORDER BY pos)) AS fingerprint
FROM chunked
GROUP BY doc_id, chunk_idx
ORDER BY doc_id, chunk_idx
"""


# ---------------------------------------------------------------------------
# Document novelty score (R4-43, training:novelty — the inverse of
# dup detection: what fraction of a doc's 5-gram shingles appears in
# NO other document?). High-novelty docs carry unique content worth
# upweighting; near-zero novelty flags boilerplate/templates even when
# no single pair crosses a dup threshold — the corpus-level signal the
# per-pair queries can't see.
#
# Scale shape: within-doc DISTINCT shingles first (hash agg keyed on
# (doc, md5(gram)) — gram text is hashed immediately so shuffle rows
# stay fixed-width), then document frequency per gram (second hash
# agg), then one join back on the gram hash and a per-doc ratio. Two
# map-side-combinable aggregates + one equi-join; no windows.
def doc_novelty_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    grams = (
        docs.select("doc_id", _tokens().alias("toks"))
        .select("doc_id", F.explode(_grams(F.col("toks"), DECON_N)).alias("g"))
        .select("doc_id", F.md5("g").alias("gh"))
        .distinct()
    )
    df = grams.groupBy("gh").agg(F.count("*").alias("gram_df"))
    per_doc = (
        grams.join(df, "gh")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum((F.col("gram_df") == 1).cast("long"))
            .cast("long")
            .alias("n_unique"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_unique", F.lit(0)).cast("long").alias("n_unique"),
            F.when(
                F.col("n_grams") > 0,
                floor_round(F.col("n_unique") / F.col("n_grams"), 4),
            ).alias("novelty"),
        )
        .orderBy("doc_id")
    )


DOC_NOVELTY_SQL = rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents
),
grams AS (
  SELECT DISTINCT doc_id,
         md5(array_to_string(t[i:i+{DECON_N - 1}], ' ')) AS gh
  FROM toks,
       unnest(generate_series(1, greatest(len(t) - {DECON_N - 1}, 0))) AS u(i)
),
df AS (SELECT gh, count(*) AS gram_df FROM grams GROUP BY 1),
per_doc AS (
  SELECT g.doc_id,
         CAST(count(*) AS BIGINT) AS n_grams,
         CAST(sum(CASE WHEN f.gram_df = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_unique
  FROM grams g JOIN df f USING (gh)
  GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(p.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(coalesce(p.n_unique, 0) AS BIGINT) AS n_unique,
       CASE WHEN coalesce(p.n_grams, 0) > 0 THEN
         CAST(floor(CAST(p.n_unique AS DOUBLE) / p.n_grams * 10000 + 1e-6)
              / 10000 AS DOUBLE)
       END AS novelty
FROM documents d LEFT JOIN per_doc p USING (doc_id)
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Class-balanced weights (R4-46, training:class-weights — Cui et al.
# 2019 "effective number of samples"): weight_l ∝ (1−β)/(1−β^{n_l}),
# normalized to sum to the class count. The loss-reweighting table a
# trainer loads next to the language-mix/UniMax allocations; β→1
# approaches inverse-frequency, β=0 is uniform.
#
# Scale shape: one hash aggregate (lang counts) + a 1-row broadcast
# normalizer. β^n computed as exp(n·ln β) in BOTH engines so the
# closed form evaluates identically.
CB_BETA = 0.999


def class_balanced_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math as _math

    docs = load(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    raw = (F.lit(1.0 - CB_BETA)) / (
        F.lit(1.0) - F.exp(F.col("n_docs") * F.lit(_math.log(CB_BETA)))
    )
    scored = counts.select("lang", "n_docs", raw.alias("raw"))
    norm = scored.agg(
        F.sum("raw").alias("raw_sum"), F.count("*").alias("k")
    )
    return (
        scored.crossJoin(F.broadcast(norm))
        .select(
            "lang",
            F.col("n_docs").cast("long").alias("n_docs"),
            floor_round(
                F.col("raw") / F.col("raw_sum") * F.col("k"), 6
            ).alias("weight"),
        )
        .orderBy("lang")
    )


CLASS_BALANCED_SQL = f"""
WITH counts AS (
  SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1
),
scored AS (
  SELECT lang, n_docs,
         (1.0 - {CB_BETA}) / (1.0 - exp(n_docs * ln({CB_BETA}))) AS raw
  FROM counts
),
norm AS (SELECT sum(raw) AS raw_sum, count(*) AS k FROM scored)
SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(floor(raw / norm.raw_sum * norm.k * 1000000 + 1e-6)
            / 1000000 AS DOUBLE) AS weight
FROM scored, norm
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# Temperature-scaled mixture weights (R4-47, training:temperature-mix
# — the mC4/XLM-R multilingual sampling rule, Conneau et al. 2020
# §3.1): sampling probability p_l ∝ n_l^α with α < 1 upsampling tail
# languages; reported next to the raw share so the table shows exactly
# how much each language moves. Same one-agg + 1-row-broadcast shape
# as the class-balanced table.
MIX_ALPHA = 0.3


def temperature_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    scored = counts.select(
        "lang", "n_docs",
        F.pow(F.col("n_docs").cast("double"), F.lit(MIX_ALPHA)).alias("pw"),
    )
    norm = scored.agg(
        F.sum("pw").alias("pw_sum"), F.sum("n_docs").alias("n_total")
    )
    return (
        scored.crossJoin(F.broadcast(norm))
        .select(
            "lang",
            F.col("n_docs").cast("long").alias("n_docs"),
            floor_round(F.col("n_docs") / F.col("n_total"), 6)
            .alias("raw_share"),
            floor_round(F.col("pw") / F.col("pw_sum"), 6).alias("p_sample"),
        )
        .orderBy("lang")
    )


TEMPERATURE_MIX_SQL = f"""
WITH counts AS (
  SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1
),
scored AS (
  SELECT lang, n_docs, pow(CAST(n_docs AS DOUBLE), {MIX_ALPHA}) AS pw
  FROM counts
),
norm AS (SELECT sum(pw) AS pw_sum, sum(n_docs) AS n_total FROM scored)
SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(floor(CAST(n_docs AS DOUBLE) / norm.n_total * 1000000 + 1e-6)
            / 1000000 AS DOUBLE) AS raw_share,
       CAST(floor(pw / norm.pw_sum * 1000000 + 1e-6)
            / 1000000 AS DOUBLE) AS p_sample
FROM scored, norm
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# Bigram-LM cross-entropy of the new crawl wave under the old wave's
# model (R4-81, training:bigram-xent — the sequence-level companion to
# the unigram perplexity_score and the drift family: a wave whose
# cross-entropy under the previous wave's bigram LM jumps has shifted
# STYLE, not just vocabulary). Model: add-one conditional
# p(w2|w1) = (c12 + 1) / (c1 + V) with c1 = Σ_w2 c12 (bigram-left
# counts, a proper conditional) and V = the old wave's unigram
# vocabulary; unseen w1 degrades to the uniform 1/V via the same
# formula (nulls → 0).
#
# Exactness: each bigram's ln p is floored to an INTEGER 1e-6 grid
# BEFORE the per-doc sum (the Flesch pattern) — the sum is then exact
# BIGINT in any order; ln's cross-engine 1-ulp (~1e-16 relative) is
# eight orders below the 1e-6 floor slack. Final per-doc entropy and
# unseen-rate are single divisions.
#
# Scale shape: bigram/unigram counts are map-side-combinable hash
# aggregates over the train wave (vocabulary-bounded state); scoring
# is two equi-joins from the eval wave's bigram relation + one per-doc
# hash agg. The wave split is the deterministic doc_id midpoint.
# ---------------------------------------------------------------------------


def bigram_lm_crossentropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    mid = docs.agg(((F.min("doc_id") + F.max("doc_id")) / 2).alias("mid"))
    toks = (
        docs.crossJoin(F.broadcast(mid))
        .select(
            "doc_id",
            (F.col("doc_id") >= F.col("mid")).alias("new_wave"),
            F.filter(_tokens(), lambda t: t != "").alias("toks"),
        )
    )
    big = toks.filter(F.size("toks") >= 2).select(
        "doc_id",
        "new_wave",
        F.explode(
            F.zip_with(
                F.slice(F.col("toks"), 1, F.size("toks") - 1),
                F.slice(F.col("toks"), 2, F.size("toks") - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("bg"),
    ).select("doc_id", "new_wave", "bg.w1", "bg.w2")
    c12 = (
        big.filter(~F.col("new_wave"))
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("c12"))
    )
    c1 = c12.groupBy("w1").agg(F.sum("c12").cast("long").alias("c1"))
    vocab = (
        toks.filter(~F.col("new_wave"))
        .select(F.explode("toks").alias("tok"))
        .agg(F.countDistinct("tok").cast("long").alias("v"))
    )
    scored = (
        big.filter(F.col("new_wave"))
        .join(c12, ["w1", "w2"], "left")
        .join(c1, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.floor(
                F.log(
                    (F.coalesce(F.col("c12"), F.lit(0)) + 1).cast("double")
                    / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("v"))
                )
                * 1000000
                + 1e-6
            )
            .cast("long")
            .alias("lp_i"),
            F.when(F.col("c12").isNull(), 1).otherwise(0).alias("unseen"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum("lp_i").cast("long").alias("s"),
            F.sum("unseen").cast("long").alias("n_unseen"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            floor_round(
                -F.col("s").cast("double") / (1000000.0 * F.col("n_bigrams")),
                4,
            ).alias("cross_entropy"),
            floor_round(
                F.col("n_unseen").cast("double") / F.col("n_bigrams"), 4
            ).alias("unseen_rate"),
        )
        .orderBy("doc_id")
    )


BIGRAM_XENT_SQL = r"""
WITH mid AS (
  SELECT (min(doc_id) + max(doc_id)) / 2.0 AS mid FROM documents
),
toks AS (
  SELECT doc_id,
         doc_id >= (SELECT mid FROM mid) AS new_wave,
         list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS toks
  FROM documents
),
big AS (
  SELECT doc_id, new_wave, u.bg.w1 AS w1, u.bg.w2 AS w2
  FROM (
    SELECT doc_id, new_wave,
           unnest(list_transform(
             range(1, len(toks)),
             i -> struct_pack(w1 := toks[i], w2 := toks[i + 1])
           )) AS bg
    FROM toks WHERE len(toks) >= 2
  ) u
),
c12 AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
  FROM big WHERE NOT new_wave GROUP BY 1, 2
),
c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY 1),
vocab AS (
  SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v
  FROM (SELECT unnest(toks) AS tok FROM toks WHERE NOT new_wave)
),
scored AS (
  SELECT b.doc_id,
         CAST(floor(ln((coalesce(p.c12, 0) + 1.0)
                       / (coalesce(u.c1, 0) + vocab.v))
                    * 1000000 + 1e-6) AS BIGINT) AS lp_i,
         CASE WHEN p.c12 IS NULL THEN 1 ELSE 0 END AS unseen
  FROM big b
  LEFT JOIN c12 p ON p.w1 = b.w1 AND p.w2 = b.w2
  LEFT JOIN c1 u ON u.w1 = b.w1, vocab
  WHERE b.new_wave
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(floor(-CAST(sum(lp_i) AS DOUBLE) / (1000000.0 * count(*))
                  * 10000 + 1e-6) / 10000 AS DOUBLE) AS cross_entropy,
       CAST(floor(CAST(sum(unseen) AS DOUBLE) / count(*) * 10000 + 1e-6)
            / 10000 AS DOUBLE) AS unseen_rate
FROM scored
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Shard balance audit (R4-136): the straggler check on
# shuffle_shard_assign's hash partitioning — per-shard doc and
# character loads, their CV and max/mean ratio, next to the multinomial
# expectation sqrt((S-1)/N) for the doc-count CV. A hash family whose
# observed CV sits far above that line is biased and the biggest shard
# becomes the job's wall clock; this is the audit that justifies the
# md5-based partitioner everywhere else in the suite. One hash-agg to
# S rows; all moments exact BIGINT.
# ---------------------------------------------------------------------------


def shard_balance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    shard = (_salted_hash64("shard", did) % N_SHARDS).alias("shard_id")
    per = docs.select(shard, F.col("n_chars").cast("long").alias("nc")).groupBy(
        "shard_id"
    ).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("nc").cast("long").alias("chars"),
    )
    agg = per.agg(
        F.count("*").cast("long").alias("n_shards"),
        F.sum("n_docs").cast("long").alias("nd"),
        F.sum(F.col("n_docs") * F.col("n_docs")).cast("long").alias("ndd"),
        F.max("n_docs").cast("long").alias("max_docs"),
        F.sum("chars").cast("long").alias("ch"),
        F.sum(F.col("chars") * F.col("chars")).cast("long").alias("chch"),
        F.max("chars").cast("long").alias("max_chars"),
    )
    s = F.col("n_shards").cast("double")
    mu_d = F.col("nd").cast("double") / s
    sd_d = F.sqrt(F.col("ndd").cast("double") / s - mu_d * mu_d)
    mu_c = F.col("ch").cast("double") / s
    sd_c = F.sqrt(F.col("chch").cast("double") / s - mu_c * mu_c)
    return agg.select(
        "n_shards",
        F.col("nd").alias("total_docs"),
        floor_round(sd_d / mu_d, 6).alias("cv_docs"),
        floor_round(
            F.sqrt((s - 1.0) / F.col("nd").cast("double")), 6
        ).alias("cv_docs_expected"),
        floor_round(F.col("max_docs").cast("double") / mu_d, 6).alias(
            "max_over_mean_docs"
        ),
        floor_round(sd_c / mu_c, 6).alias("cv_chars"),
        floor_round(F.col("max_chars").cast("double") / mu_c, 6).alias(
            "max_over_mean_chars"
        ),
    )


SHARD_BALANCE_SQL = f"""
WITH per AS (
  SELECT CAST('0x' || substr(md5('shard|' || CAST(doc_id AS VARCHAR)), 1, 8)
              AS BIGINT) % {N_SHARDS} AS shard_id,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS chars
  FROM documents GROUP BY 1
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_shards,
         CAST(sum(n_docs) AS BIGINT) AS nd,
         CAST(sum(n_docs * n_docs) AS BIGINT) AS ndd,
         CAST(max(n_docs) AS BIGINT) AS max_docs,
         CAST(sum(chars) AS BIGINT) AS ch,
         CAST(sum(chars * chars) AS BIGINT) AS chch,
         CAST(max(chars) AS BIGINT) AS max_chars
  FROM per
)
SELECT n_shards, nd AS total_docs,
       CAST(floor(sqrt(CAST(ndd AS DOUBLE) / CAST(n_shards AS DOUBLE)
                       - (CAST(nd AS DOUBLE) / CAST(n_shards AS DOUBLE))
                         * (CAST(nd AS DOUBLE) / CAST(n_shards AS DOUBLE)))
                  / (CAST(nd AS DOUBLE) / CAST(n_shards AS DOUBLE))
                  * 1000000 + 1e-6) / 1000000 AS DOUBLE) AS cv_docs,
       CAST(floor(sqrt((CAST(n_shards AS DOUBLE) - 1.0)
                       / CAST(nd AS DOUBLE))
                  * 1000000 + 1e-6) / 1000000 AS DOUBLE)
         AS cv_docs_expected,
       CAST(floor(CAST(max_docs AS DOUBLE)
                  / (CAST(nd AS DOUBLE) / CAST(n_shards AS DOUBLE))
                  * 1000000 + 1e-6) / 1000000 AS DOUBLE)
         AS max_over_mean_docs,
       CAST(floor(sqrt(CAST(chch AS DOUBLE) / CAST(n_shards AS DOUBLE)
                       - (CAST(ch AS DOUBLE) / CAST(n_shards AS DOUBLE))
                         * (CAST(ch AS DOUBLE) / CAST(n_shards AS DOUBLE)))
                  / (CAST(ch AS DOUBLE) / CAST(n_shards AS DOUBLE))
                  * 1000000 + 1e-6) / 1000000 AS DOUBLE) AS cv_chars,
       CAST(floor(CAST(max_chars AS DOUBLE)
                  / (CAST(ch AS DOUBLE) / CAST(n_shards AS DOUBLE))
                  * 1000000 + 1e-6) / 1000000 AS DOUBLE)
         AS max_over_mean_chars
FROM agg
"""


# ---------------------------------------------------------------------------
# Sequence-packing efficiency audit (R4-182, training:pack-audit): the
# measurement pass next to sequence_pack — before shipping a packing
# layout you report how full the sequences actually are (fill ratio
# vs the SEQ_PACK_LEN capacity) and how many documents straddle a
# sequence boundary (spanning docs are the ones attention masking /
# document-causal packing has to handle). Same deterministic pack
# streams as the operator (hex-prefix groups, doc_id order), same
# single hash-partition window; everything after is exact integer
# arithmetic per group — n_seqs = ⌈total/L⌉, capacity = n_seqs·L,
# spanning = first-token sequence ≠ last-token sequence.
# ---------------------------------------------------------------------------


def sequence_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).alias(
            "pack_group"
        ),
        F.size(_tokens()).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("pack_group")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = toks.withColumn("cum", F.sum("n_tokens").over(w)).select(
        "pack_group",
        "n_tokens",
        F.floor(
            (F.col("cum") - F.col("n_tokens"))
            / F.lit(float(SEQ_PACK_LEN))
        ).alias("first_seq"),
        F.floor(
            (F.col("cum") - 1) / F.lit(float(SEQ_PACK_LEN))
        ).alias("last_seq"),
    )
    grp = placed.groupBy("pack_group").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum(
            (F.col("last_seq") > F.col("first_seq")).cast("long")
        ).cast("long").alias("n_spanning_docs"),
    )
    n_seqs = (
        F.floor(
            (F.col("total_tokens") - 1) / F.lit(float(SEQ_PACK_LEN))
        ).cast("long")
        + 1
    )
    return grp.select(
        "pack_group",
        "n_docs",
        "total_tokens",
        n_seqs.alias("n_seqs"),
        (n_seqs * SEQ_PACK_LEN).cast("long").alias("capacity_tokens"),
        floor_round(
            F.col("total_tokens").cast("double")
            / (n_seqs * SEQ_PACK_LEN).cast("double"),
            6,
        ).alias("fill_ratio"),
        "n_spanning_docs",
    ).orderBy("pack_group")


SEQ_PACK_EFFICIENCY_SQL = rf"""
WITH toks AS (
  SELECT doc_id,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS pack_group,
         len(string_split_regex(text, '\s+')) AS n_tokens
  FROM documents
),
placed AS (
  SELECT pack_group, n_tokens,
         CAST(floor((cum - n_tokens) / {SEQ_PACK_LEN}.0) AS BIGINT)
           AS first_seq,
         CAST(floor((cum - 1) / {SEQ_PACK_LEN}.0) AS BIGINT) AS last_seq
  FROM (
    SELECT pack_group, n_tokens,
           SUM(n_tokens) OVER (PARTITION BY pack_group ORDER BY doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS cum
    FROM toks
  )
),
grp AS (
  SELECT pack_group,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         CAST(sum(CASE WHEN last_seq > first_seq THEN 1 ELSE 0 END)
              AS BIGINT) AS n_spanning_docs
  FROM placed GROUP BY 1
)
SELECT pack_group, n_docs, total_tokens,
       CAST(floor((total_tokens - 1) / {SEQ_PACK_LEN}.0) + 1 AS BIGINT)
         AS n_seqs,
       CAST((floor((total_tokens - 1) / {SEQ_PACK_LEN}.0) + 1)
            * {SEQ_PACK_LEN} AS BIGINT) AS capacity_tokens,
       CAST(floor(CAST(total_tokens AS DOUBLE)
                  / ((floor((total_tokens - 1) / {SEQ_PACK_LEN}.0) + 1)
                     * {SEQ_PACK_LEN})
                  * 1000000 + 1e-6) / 1000000 AS DOUBLE) AS fill_ratio,
       n_spanning_docs
FROM grp
ORDER BY pack_group
"""


# ---------------------------------------------------------------------------
# Shard rebalance audit: consistent ring vs mod hashing (R4-185,
# training:shard-rebalance): when the export grows from N to N+1
# shards, how much data MOVES? mod-hashing reassigns ~N/(N+1) of the
# corpus (every doc whose hash changes residue); a consistent ring
# (one anchor point per shard, doc → first anchor clockwise) moves
# only the segment claimed by the new anchor (~1/(N+1) expected, with
# the single-point variance the audit makes visible). This is the
# planning read behind rebucket_store (R3-71): it quantifies the
# copy-on-write cost of a shard-count change under both policies.
#
# All positions are the shared 32-bit md5 grid (_salted_hash64), all
# decisions integer comparisons; the ring argmin is min(struct) over
# a ≤(N+1)-row broadcast anchor table with wraparound handled by
# +2^32 adjustment — exact in both engines.
# ---------------------------------------------------------------------------

REBALANCE_N = 8


def shard_rebalance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.col("doc_id").cast("string").alias("did")
    )
    pos = docs.select(
        "doc_id", _salted_hash64("ring", F.col("did")).alias("pos")
    )
    anchors = spark.range(REBALANCE_N + 1).select(
        F.col("id").cast("int").alias("s"),
        _salted_hash64("anchor", F.col("id").cast("string")).alias("apos"),
    )
    ring = pos.crossJoin(F.broadcast(anchors))
    WRAP = 2**32

    def _ring_assign(df, n_anchors, out):
        return (
            df.where(F.col("s") < n_anchors)
            .select(
                "doc_id",
                F.struct(
                    F.when(
                        F.col("apos") >= F.col("pos"), F.col("apos")
                    )
                    .otherwise(F.col("apos") + WRAP)
                    .alias("adj"),
                    F.col("s").alias("s"),
                ).alias("cand"),
            )
            .groupBy("doc_id")
            .agg(F.min("cand").alias("m"))
            .select("doc_id", F.col("m.s").alias(out))
        )

    ring_n = _ring_assign(ring, REBALANCE_N, "ring_a")
    ring_n1 = _ring_assign(ring, REBALANCE_N + 1, "ring_b")
    moved_ring = (
        ring_n.join(ring_n1, "doc_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(
                (F.col("ring_a") != F.col("ring_b")).cast("long")
            ).cast("long").alias("n_moved"),
        )
        .select(F.lit("ring").alias("policy"), "n_docs", "n_moved")
    )
    moved_mod = pos.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(
            (
                (F.col("pos") % REBALANCE_N)
                != (F.col("pos") % (REBALANCE_N + 1))
            ).cast("long")
        ).cast("long").alias("n_moved"),
    ).select(F.lit("mod").alias("policy"), "n_docs", "n_moved")
    return (
        moved_mod.unionByName(moved_ring)
        .select(
            "policy",
            "n_docs",
            "n_moved",
            floor_round(
                F.col("n_moved").cast("double")
                / F.col("n_docs").cast("double"),
                6,
            ).alias("moved_share"),
        )
        .orderBy("policy")
    )


SHARD_REBALANCE_SQL = f"""
WITH pos AS MATERIALIZED (
  SELECT doc_id,
         CAST('0x' || substr(md5('ring|' || CAST(doc_id AS VARCHAR)), 1, 8)
              AS BIGINT) AS pos
  FROM documents
),
anchors AS (
  SELECT s,
         CAST('0x' || substr(md5('anchor|' || CAST(s AS VARCHAR)), 1, 8)
              AS BIGINT) AS apos
  FROM (SELECT unnest(generate_series(0, {REBALANCE_N})) AS s)
),
ring AS (
  SELECT p.doc_id, p.pos, a.s, a.apos,
         CASE WHEN a.apos >= p.pos THEN a.apos
              ELSE a.apos + 4294967296 END AS adj
  FROM pos p CROSS JOIN anchors a
),
ring_n AS (
  SELECT doc_id, s AS ring_a FROM (
    SELECT doc_id, s,
           row_number() OVER (PARTITION BY doc_id ORDER BY adj, s) AS rk
    FROM ring WHERE s < {REBALANCE_N}
  ) WHERE rk = 1
),
ring_n1 AS (
  SELECT doc_id, s AS ring_b FROM (
    SELECT doc_id, s,
           row_number() OVER (PARTITION BY doc_id ORDER BY adj, s) AS rk
    FROM ring
  ) WHERE rk = 1
),
rows_out AS (
  SELECT 'mod' AS policy,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN pos % {REBALANCE_N}
                        <> pos % {REBALANCE_N + 1}
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_moved
  FROM pos
  UNION ALL
  SELECT 'ring',
         CAST(count(*) AS BIGINT),
         CAST(sum(CASE WHEN a.ring_a <> b.ring_b THEN 1 ELSE 0 END)
              AS BIGINT)
  FROM ring_n a JOIN ring_n1 b USING (doc_id)
)
SELECT policy, n_docs, n_moved,
       CAST(floor(CAST(n_moved AS DOUBLE) / CAST(n_docs AS DOUBLE)
                  * 1000000 + 1e-6) / 1000000 AS DOUBLE) AS moved_share
FROM rows_out
ORDER BY policy
"""
