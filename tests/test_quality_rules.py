"""Units for analytics/quality_rules.py — pure-Python recomputes of the
published heuristics plus non-degeneracy checks (every rule fires at
least once on the fixture corpus, and passes at least once)."""

import hashlib

SF_DIR = "/root/testdata/sf0.001"


def test_gopher_quality_recompute(spark):
    """Per-doc verdicts match a pure-Python recompute of the Gopher
    A1.1 rules (word count, mean word length, alpha fraction, distinct
    stop-word containment), and the corpus exercises both verdicts."""
    from pdf_extractor_spark.analytics.quality_rules import (
        GOPHER_MAX_MEAN_WL,
        GOPHER_MAX_WORDS,
        GOPHER_MIN_ALPHA_FRAC,
        GOPHER_MIN_MEAN_WL,
        GOPHER_MIN_STOP_HITS,
        GOPHER_MIN_WORDS,
        GOPHER_STOPWORDS,
        gopher_quality_filter,
    )
    import re

    out = {r["doc_id"]: r for r in gopher_quality_filter(spark, SF_DIR).collect()}
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    assert set(out) == set(docs)
    kept = dropped = 0
    for doc_id, text in docs.items():
        row = out[doc_id]
        toks = re.split(r"\s+", text)
        n = len(toks)
        mean_wl = int(sum(len(t) for t in toks) / n * 10000 + 1e-6) / 10000
        alpha = int(
            sum(1 for t in toks if re.search("[A-Za-z]", t)) / n * 10000 + 1e-6
        ) / 10000
        stops = len(set(toks) & set(GOPHER_STOPWORDS))
        assert row["n_words"] == n
        assert row["mean_word_len"] == mean_wl
        assert row["alpha_frac"] == alpha
        assert row["stop_hits"] == stops
        if not (GOPHER_MIN_WORDS <= n <= GOPHER_MAX_WORDS):
            want = "word_count"
        elif not (GOPHER_MIN_MEAN_WL <= mean_wl <= GOPHER_MAX_MEAN_WL):
            want = "mean_word_length"
        elif alpha < GOPHER_MIN_ALPHA_FRAC:
            want = "alpha_ratio"
        elif stops < GOPHER_MIN_STOP_HITS:
            want = "stop_words"
        else:
            want = "pass"
        assert row["fail_rule"] == want
        assert row["keep"] == (want == "pass")
        kept += row["keep"]
        dropped += not row["keep"]
    assert kept > 0 and dropped > 0


def test_c4_line_clean_recompute(spark):
    """Line verdicts match a pure-Python rebuild of the deterministic
    line view + the C4 rules; terminal-punct, short-line, javascript,
    lorem-ipsum, and brace paths all fire on the fixture corpus."""
    from pdf_extractor_spark.analytics.quality_rules import (
        C4_LINE_TOKENS,
        C4_MIN_LINE_WORDS,
        c4_line_clean,
    )
    import re

    out = {r["doc_id"]: r for r in c4_line_clean(spark, SF_DIR).collect()}
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    suffixes = {
        "7": "", "8": "", "9": "",
        "a": " javascript required.", "b": " javascript required.",
        "6": "?", "4": "!", "5": "!",
    }
    saw = set()
    for doc_id, text in docs.items():
        toks = re.split(r"\s+", text)
        lines = []
        for i in range((len(toks) - 1) // C4_LINE_TOKENS + 1):
            base = " ".join(toks[i * C4_LINE_TOKENS : (i + 1) * C4_LINE_TOKENS])
            d = hashlib.md5(f"{doc_id}|{i}".encode()).hexdigest()[0]
            lines.append(base + suffixes.get(d, "."))
        if doc_id % 97 == 3:
            lines[-1] += " lorem ipsum"
        elif doc_id % 97 == 5:
            lines[-1] += " {"
        kept = [
            ln
            for ln in lines
            if re.search(r"[.!?]$", ln)
            and len(re.split(r"\s+", ln)) >= C4_MIN_LINE_WORDS
            and "javascript" not in ln.lower()
        ]
        joined = "\n".join(lines)
        doc_keep = (
            "lorem ipsum" not in joined.lower()
            and "{" not in joined
            and len(kept) > 0
        )
        row = out[doc_id]
        assert row["n_lines"] == len(lines)
        assert row["n_kept"] == len(kept)
        assert row["doc_keep"] == doc_keep
        assert row["cleaned_md5"] == hashlib.md5("\n".join(kept).encode()).hexdigest()
        if len(kept) < len(lines):
            saw.add("line_dropped")
        if any("javascript" in ln for ln in lines):
            saw.add("javascript")
        if doc_id % 97 == 3:
            saw.add("lorem")
        if doc_id % 97 == 5:
            saw.add("brace")
        if doc_keep:
            saw.add("doc_kept")
    assert saw == {"line_dropped", "javascript", "lorem", "brace", "doc_kept"}


def test_paragraph_dedup_first_winner(spark):
    """Every fingerprint has exactly one non-dup occurrence — its
    (doc_id, para_idx) minimum — and the injected duplicate docs are
    fully marked as duplicates of their originals."""
    from pdf_extractor_spark.analytics.base import DUP_ID_OFFSET
    from pdf_extractor_spark.analytics.quality_rules import paragraph_dedup

    rows = paragraph_dedup(spark, SF_DIR).collect()
    by_hash = {}
    for r in rows:
        by_hash.setdefault(r["para_md5"], []).append(r)
    assert any(len(v) > 1 for v in by_hash.values())  # real duplicates exist
    for v in by_hash.values():
        winners = [r for r in v if not r["is_dup"]]
        assert len(winners) == 1
        w = min((r["doc_id"], r["para_idx"]) for r in v)
        assert (winners[0]["doc_id"], winners[0]["para_idx"]) == w
        assert all(r["winner_doc_id"] == w[0] for r in v)
    # injected copies (doc_id >= DUP_ID_OFFSET) can never win against
    # their originals: every one of their paragraphs is a duplicate
    injected = [r for r in rows if r["doc_id"] >= DUP_ID_OFFSET]
    assert injected and all(r["is_dup"] for r in injected)


def test_quality_classifier_linear_recompute(spark):
    """Doc scores match an exact pure-Python recompute of the hashed
    integer-weight fold (order-independent by construction), and both
    labels occur on the fixture corpus."""
    import re

    from pdf_extractor_spark.analytics.quality_rules import (
        quality_classifier_linear,
    )

    out = {
        r["doc_id"]: r for r in quality_classifier_linear(spark, SF_DIR).collect()
    }
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    labels = set()
    for doc_id, text in docs.items():
        toks = re.split(r"\s+", text)
        wsum = 0
        for t in toks:
            frac = int(hashlib.md5(t.encode()).hexdigest()[:8], 16) / 4294967296.0
            wsum += int(frac * 20000 + 1e-6) - 10000
        # math.floor, not int(): wsum can be negative and int()
        # truncates toward zero where the engines floor
        import math

        score = math.floor(wsum / (10000.0 * len(toks)) * 10000 + 1e-6) / 10000
        row = out[doc_id]
        assert row["n_tokens"] == len(toks)
        assert row["score"] == score
        assert row["keep"] == (score >= 0.0)
        labels.add(row["keep"])
    assert labels == {True, False}


def test_paragraph_dedup_plan_no_window(spark):
    """The first-winner must be a map-side-combinable aggregate + join,
    never a window: AQE cannot split a hot window partition, so a
    boilerplate paragraph duplicated across the corpus would serialize
    into one task (docs/PLANS.md §15). Asserts the plan has no Window
    operator and DOES have a partial_min aggregate."""
    from pdf_extractor_spark.analytics.quality_rules import paragraph_dedup

    df = paragraph_dedup(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "partial_min" in plan or "min(" in plan


def test_template_strip_detects_planted_nav(spark):
    """Every doc of an even-hash source is flagged and loses exactly
    its nav line (cleaned head = original text head); odd-hash sources
    are untouched with template_df below the threshold."""
    import hashlib

    from pdf_extractor_spark.analytics.quality_rules import (
        template_prefix_strip,
    )

    sf_dir = "/root/testdata/sf0.001"
    rows = template_prefix_strip(spark, sf_dir).collect()
    docs = {
        r["doc_id"]: (r["source"], r["text"])
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "source", "text").collect()
    }
    flagged_sources, clean_sources = set(), set()
    for r in rows:
        src, text = docs[r["doc_id"]]
        planted = int(
            hashlib.md5(f"tmpl|{src}".encode()).hexdigest()[:8], 16
        ) % 2 == 0
        assert r["had_template"] == planted, r["doc_id"]
        assert r["cleaned_head"] == text[:40]  # strip restores original
        (flagged_sources if planted else clean_sources).add(src)
    assert flagged_sources and clean_sources  # both branches live


def test_rejection_sample_probability_semantics(spark):
    """Keep decisions are exactly u < ((score+1)/2)^2 on the salted
    uniform, and the empirical keep rate of a score band brackets its
    p_keep (graded tail, not a cliff)."""
    import hashlib

    from pdf_extractor_spark.analytics.quality_rules import (
        classifier_rejection_sample,
    )

    sf_dir = "/root/testdata/sf0.001"
    rows = classifier_rejection_sample(spark, sf_dir).collect()
    kept_hi = kept_lo = n_hi = n_lo = 0
    for r in rows:
        h = int(
            hashlib.md5(f"reject|{r['doc_id']}".encode()).hexdigest()[:8], 16
        )
        u = (h + 0.5) / 4294967296.0
        half = (r["score"] + 1.0) / 2.0
        p = half * half  # x*x, matching the engines (not pow)
        assert r["kept"] == (u < p), r["doc_id"]
        if r["score"] >= 0:
            n_hi += 1
            kept_hi += r["kept"]
        else:
            n_lo += 1
            kept_lo += r["kept"]
    assert n_hi > 20 and n_lo > 20
    # higher-confidence band keeps a strictly larger fraction
    assert kept_hi / n_hi > kept_lo / n_lo
