"""text_en analyzer parity: Porter stemmer pinned fixture + the
stemmed-BM25 divergence the analyzer exists to close.

The stemmer is re-implemented from the published algorithm (M.F. Porter
1980); the fixture below pins the paper's own example words — an
implementation drift on any rule fails a specific word, not a vague
ranking assertion.
"""

import pytest

from pdf_extractor_spark.textproc import porter_stem, text_en_tokens

SF = "/root/testdata/sf0.001"

# (word → stem) pairs from the published algorithm's worked examples,
# one per rule family (steps 1a-5b).
PORTER_FIXTURE = {
    # step 1a
    "caresses": "caress", "ponies": "poni", "ties": "ti",
    "caress": "caress", "cats": "cat",
    # step 1b + cleanup
    "feed": "feed", "agreed": "agre", "plastered": "plaster", "bled": "bled",
    "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "troubled": "troubl", "sized": "size", "hopping": "hop", "tanned": "tan",
    "falling": "fall", "hissing": "hiss", "fizzed": "fizz",
    "failing": "fail", "filing": "file",
    # step 1c
    "happy": "happi", "sky": "sky",
    # step 2
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "conformabli": "conform", "radicalli": "radic", "differentli": "differ",
    "vileli": "vile", "analogousli": "analog", "vietnamization": "vietnam",
    "predication": "predic", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit", "sensibiliti": "sensibl",
    # step 3
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good",
    # step 4
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop", "adjustable": "adjust",
    "defensible": "defens", "irritant": "irrit", "replacement": "replac",
    "adjustment": "adjust", "dependent": "depend", "adoption": "adopt",
    "homologou": "homolog", "communism": "commun", "activate": "activ",
    "angulariti": "angular", "homologous": "homolog", "effective": "effect",
    "bowdlerize": "bowdler",
    # step 5
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll",
}


def test_porter_stemmer_matches_published_examples():
    bad = {
        w: (porter_stem(w), want)
        for w, want in PORTER_FIXTURE.items()
        if porter_stem(w) != want
    }
    assert not bad, f"porter divergence (got, want): {bad}"


def test_porter_short_words_untouched():
    for w in ("a", "be", "is", "s", ""):
        assert porter_stem(w) == w


def test_text_en_analyzer_pipeline():
    # lowercase + accent strip + alnum segmentation + stem, no stopwords
    assert text_en_tokens("Merging TABLES & queries, naïve!") == [
        "merg", "tabl", "queri", "naiv",
    ]
    # stopwords are NOT removed (ArangoDB text_en ships empty stopwords)
    assert text_en_tokens("the a") == ["the", "a"]
    assert text_en_tokens("") == []
    assert text_en_tokens("x2 42") == ["x2", "42"]


def test_corpus_vocab_stems_cover_oracle_map():
    """The oracle's VALUES lookup embeds exactly the non-identity stems
    of the corpus vocabulary — if the vocabulary or the stemmer moves,
    this pins where."""
    from pdf_extractor_spark.analytics.textstats import _CORPUS_VOCAB

    got = {w: porter_stem(w) for w in _CORPUS_VOCAB if porter_stem(w) != w}
    assert got == {
        "customer": "custom", "key": "kei", "merge": "merg",
        "query": "queri", "table": "tabl", "value": "valu",
    }


def test_stemmed_bm25_finds_what_unstemmed_cannot(spark):
    """The divergence the analyzer closes: the query terms are inflected
    forms ("tables", "queries", "merging") that never appear verbatim in
    the corpus — whitespace-token BM25 scores everything 0.0; the
    text_en variant matches the stemmed corpus and ranks."""
    from pyspark.sql import functions as F

    from pdf_extractor_spark.analytics.base import load, tokens
    from pdf_extractor_spark.analytics.textstats import (
        STEMMED_QUERY_TERMS,
        bm25_search_stemmed,
    )

    top = bm25_search_stemmed(spark, SF).collect()
    assert len(top) == 10
    assert top[0]["bm25"] > 0.0
    scores = [r["bm25"] for r in top]
    assert scores == sorted(scores, reverse=True)

    # the same inflected terms, verbatim, occur in zero documents
    docs = load(spark, SF, "documents")
    hits = docs.filter(
        F.arrays_overlap(
            tokens(), F.array(*[F.lit(t) for t in STEMMED_QUERY_TERMS])
        )
    ).count()
    assert hits == 0


def test_unified_search_dispatch_routes_like_reference(spark):
    """search_functions.py:112-160 parity: each search_type reaches its
    engine; unknown types and case variants fall back per reference."""
    from pdf_extractor_spark.analytics.hybrid import hybrid_search_rrf
    from pdf_extractor_spark.analytics.search_api import unified_search
    from pdf_extractor_spark.analytics.similarity import semantic_search
    from pdf_extractor_spark.analytics.textstats import bm25_search

    assert unified_search(spark, SF, "bm25").collect() == bm25_search(
        spark, SF
    ).collect()
    assert unified_search(spark, SF, "semantic").collect() == semantic_search(
        spark, SF
    ).collect()
    hybrid_rows = hybrid_search_rrf(spark, SF).collect()
    assert unified_search(spark, SF, "hybrid").collect() == hybrid_rows
    # reference defaults: unknown type and case-insensitive match
    assert unified_search(spark, SF, "nonsense").collect() == hybrid_rows
    assert unified_search(spark, SF, "BM25").collect() == bm25_search(
        spark, SF
    ).collect()


def test_stemmed_bm25_plan_stays_arrow_batched(spark):
    """The analyzer kernel must be Arrow-batched (ArrowEvalPython /
    scalar pandas UDF), never row-at-a-time BatchEvalPython."""
    from pdf_extractor_spark.analytics.textstats import bm25_search_stemmed

    plan = (
        bm25_search_stemmed(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# A7 upgrade — BPE token counting (vendored merges table)
# ---------------------------------------------------------------------------


def test_bpe_apply_algorithm_hand_worked():
    """Drive the apply loop with a hand-built ranks table — rank order
    (not count order) decides merges, exactly like tiktoken's loop."""
    from pdf_extractor_spark.textproc import bpe_segments

    ranks = {("l", "o"): 0, ("lo", "w"): 1, ("e", "r"): 2, ("w", "</w>"): 3}
    assert bpe_segments("low", ranks) == ["low"]        # l+o → lo+w → low+</w>? no ("low","</w>") rank — stays ["low","</w>"] → marker dropped
    assert bpe_segments("lower", ranks) == ["low", "er"]
    assert bpe_segments("wow", ranks) == ["w", "o", "w</w>"]
    # lowest rank wins even when a later pair appears first in the word
    ranks2 = {("b", "c"): 0, ("a", "b"): 1}
    assert bpe_segments("abc", ranks2) == ["a", "bc"]
    # exact-pair matching: ("a","bc") must not satisfy a ("ab","c") rule
    ranks3 = {("b", "c"): 0, ("ab", "c"): 1}
    assert bpe_segments("abc", ranks3) == ["a", "bc"]
    assert bpe_segments("", {}) == []


def test_bpe_vendored_table_pinned():
    """The merges table is a pinned artifact: a retrain that changes it
    must be a deliberate commit, not drift."""
    import hashlib
    import os

    import pdf_extractor_spark.bpe_vocab as v

    src = open(os.path.abspath(v.__file__), "rb").read()
    assert hashlib.md5(src).hexdigest() == "694dadb66ffa4d4188437bbc18430e7b"
    assert len(v.MERGES) == 48
    assert all(isinstance(a, str) and isinstance(b, str) for a, b in v.MERGES)


def test_bpe_token_count_sums_words():
    from pdf_extractor_spark.textproc import bpe_segments, bpe_token_count

    n = bpe_token_count("window table")
    assert n == len(bpe_segments("window")) + len(bpe_segments("table"))
    assert bpe_token_count("") == 0
    assert bpe_token_count("   ") == 0
    # frequent corpus words merge to few symbols; OOV words fall back
    # toward characters — the defining subword behavior
    assert len(bpe_segments("window")) < len(bpe_segments("zzzqqq"))


def test_unified_search_collections_merges_per_collection_scores(spark):
    """search_functions.py:146-199: each collection is scored against
    ITS OWN corpus statistics, results merged and truncated by score —
    so the merged list interleaves both collections and each side's
    score equals that side's standalone BM25."""
    from pyspark.sql import functions as F

    from pdf_extractor_spark.analytics.base import load
    from pdf_extractor_spark.analytics.search_api import (
        MULTI_TOP_N,
        unified_search_collections,
    )
    from pdf_extractor_spark.analytics.textstats import bm25_scores

    rows = unified_search_collections(spark, SF).collect()
    assert len(rows) == MULTI_TOP_N
    scores = [r["bm25"] for r in rows]
    assert scores == sorted(scores, reverse=True)

    docs = load(spark, SF, "documents")
    a_scores = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(docs.filter(F.length("source") == 4)).collect()
    }
    b_scores = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(docs.filter(F.length("source") == 5)).collect()
    }
    for r in rows:
        side = a_scores if r["doc_id"] in a_scores else b_scores
        assert side[r["doc_id"]] == r["bm25"]


def test_unified_search_adhoc_query_matches_independent_bm25(spark):
    """The dispatch accepts ARBITRARY query strings: verify an ad-hoc
    bm25 query against an independent pure-Python BM25 computed from
    the parquet directly (same floor-rounding contract)."""
    import math

    import pyarrow.parquet as pq

    from pdf_extractor_spark.analytics.search_api import unified_search

    q = "hash value vector"
    got = unified_search(spark, SF, "bm25", query=q, top_n=5).collect()
    assert len(got) == 5

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    ids = t.column("doc_id").to_pylist()
    toks = [txt.split() for txt in t.column("text").to_pylist()]
    terms = q.split()
    n, avgdl = len(ids), sum(len(tk) for tk in toks) / len(ids)
    df = {w: sum(1 for tk in toks if w in tk) for w in terms}
    k1, b = 1.2, 0.75

    def score(tk):
        s = 0.0
        for w in terms:
            tf = tk.count(w)
            idf = math.log(1.0 + (n - df[w] + 0.5) / (df[w] + 0.5))
            s += idf * (tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * len(tk) / avgdl)))
        return math.floor(s * 10000) / 10000

    want = sorted(
        ((score(tk), i) for i, tk in zip(ids, toks)),
        key=lambda p: (-p[0], p[1]),
    )[:5]
    assert [(r["doc_id"], r["bm25"]) for r in got] == [(i, s) for s, i in want]

    # the stemmed engine accepts inflected ad-hoc queries
    got2 = unified_search(spark, SF, "bm25_stemmed", query="hashes valuing", top_n=3).collect()
    assert len(got2) == 3 and got2[0]["bm25"] > 0.0


def test_blank_ocr_span_is_noise_not_paragraph_break():
    """Deliberate semantics (docmodel ocr branch): an OCR span that
    normalizes to empty is dropped WITHOUT flushing the paragraph
    buffer — scanner noise must not split a paragraph — while a blank
    text span IS a paragraph break."""
    from pdf_extractor_spark.docmodel import extract_document

    def spans(mid_kind, mid_text):
        return [
            {"kind": "text", "text": "para one", "media_ref": "", "offset": 0},
            {"kind": mid_kind, "text": mid_text, "media_ref": "", "offset": 1},
            {"kind": "text", "text": "para two", "media_ref": "", "offset": 2},
        ]

    merged = extract_document(spans("ocr", "  \n "))
    assert [e["text"] for e in merged if e["kind"] == "text"] == [
        "para one\npara two"
    ]
    split = extract_document(spans("text", ""))
    assert [e["text"] for e in split if e["kind"] == "text"] == [
        "para one", "para two"
    ]


def test_bpe_adversarial_inputs_count_and_stay_linear():
    """Adversarial-sweep companion (scripts/adversarial_sweep.py
    EXCLUDED rationale): the kernel must count ARBITRARY junk — unknown
    scripts fall back to per-character segments, never crash or NULL —
    and a pathological megatoken must stay fast: the apply loop runs at
    most len(MERGES)+1 linear passes (each pass either applies one
    merge rank everywhere or terminates), so cost is O(48·n), not
    O(n²)."""
    import time

    from pdf_extractor_spark.bpe_vocab import MERGES
    from pdf_extractor_spark.textproc import bpe_segments, bpe_token_count

    # unknown scripts: every char is its own (unmergeable) segment
    assert bpe_token_count("漢字") == 2
    assert bpe_token_count("\U0001f680\U0001f389") == 2
    assert bpe_segments("café")  # accented latin doesn't crash
    # megatokens: exact counts, bounded wall time (quadratic would take
    # minutes on 50k chars; the linear bound is well under a second)
    cases = {
        "x" * 50_000: 50_000,          # no applicable merge: 1 pass
        "er" * 25_000: 25_000,         # ('e','r') chains: halving passes
    }
    t0 = time.time()
    for word, expected in cases.items():
        assert bpe_token_count(word) == expected
    big = bpe_token_count("window" * 8_000)
    assert 0 < big <= 6 * 8_000
    assert time.time() - t0 < 5.0, "BPE megatoken path is not linear"
    assert len(MERGES) == 48  # the linearity bound above assumes this


def test_unigram_lm_artifact_pinned():
    """unigram_lm.py is generated (scripts/train_unigram_lm.py);
    retraining must be a deliberate commit, not drift."""
    import hashlib
    import os

    import pdf_extractor_spark.unigram_lm as lm

    src = open(os.path.abspath(lm.__file__), "rb").read()
    assert hashlib.md5(src).hexdigest() == "6ea5d74346362ce41703dfa53f32b83b"
    assert len(lm.VOCAB_LOGP) == 31  # the generator's full vocabulary
    # exact-decimal contract: every log-prob parses as a 4-decimal string
    assert all(
        lp.startswith("-") and len(lp.split(".")[1]) == 4
        for _, lp in lm.VOCAB_LOGP
    )


def test_perplexity_score_matches_hand_recompute(spark):
    """One doc's NLL recomputed in pure Python (decimal-exact sum, then
    the house floor-round) equals the Spark pipeline's score; a doc of
    pure OOV junk scores exactly the OOV ceiling."""
    from decimal import Decimal
    from math import floor

    from pdf_extractor_spark.analytics.curation import perplexity_score
    from pdf_extractor_spark.unigram_lm import OOV_LOGP, VOCAB_LOGP

    sf = "/root/testdata/sf0.001"
    row = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .orderBy("doc_id")
        .limit(1)
        .collect()[0]
    )
    import re

    toks = re.split(r"\s+", row["text"])
    table = dict(VOCAB_LOGP)
    s = sum(Decimal(table.get(t, OOV_LOGP)) for t in toks)
    want = floor(float(-s) / len(toks) * 10000 + 1e-6) / 10000
    got = {
        r["doc_id"]: r["nll"]
        for r in perplexity_score(spark, sf).filter(
            f"doc_id = {row['doc_id']}"
        ).collect()
    }
    assert got == {row["doc_id"]: want}


def test_tokenizer_fertility_recompute(spark):
    """R4-23: per-language chars/BPE-token equals a pure-Python
    recompute through the same pinned bpe_token_count kernel."""
    import math
    from collections import defaultdict

    from pdf_extractor_spark.analytics.textstats import tokenizer_fertility
    from pdf_extractor_spark.textproc import bpe_token_count

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "lang", "n_chars", "text"
    ).collect()
    chars = defaultdict(int)
    toks = defaultdict(int)
    n = defaultdict(int)
    for r in docs:
        chars[r["lang"]] += r["n_chars"]
        toks[r["lang"]] += bpe_token_count(r["text"] or "")
        n[r["lang"]] += 1
    got = {r["lang"]: r for r in tokenizer_fertility(spark, sf_dir).collect()}
    assert set(got) == set(n)
    for lang in n:
        row = got[lang]
        assert row["n_docs"] == n[lang]
        assert row["sum_chars"] == chars[lang]
        assert row["sum_bpe_tokens"] == toks[lang]
        want = (
            math.floor(chars[lang] / toks[lang] * 10000 + 1e-6) / 10000
            if toks[lang] else None
        )
        assert row["chars_per_token"] == want
