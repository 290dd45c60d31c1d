"""corpus_match_validate / highlight_matching_words vs pure-Python
recomputes of the documented kernel (reference corpus_validator.py /
citation_validators.py / text_utils.py semantics under the
normalized-levenshtein proxy, docs/PARITY.md)."""

import math
import re

TOKEN_RE = re.compile(r"[0-9A-Za-z_]+")


def _lev(a: str, b: str) -> int:
    if a == b:
        return 0
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cur[j] = min(
                prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)
            )
        prev = cur
    return prev[-1]


def _sim(a: str, b: str) -> float:
    return 100.0 * (1.0 - _lev(a, b) / max(len(a), len(b), 1))


def _fl4(x: float) -> float:
    return math.floor(x * 10000 + 1e-6) / 10000


def _py_best(text, paras, needles, common, hl_common, threshold):
    """Pure-Python recompute of the graded kernel for one document."""
    orig = text[:160]
    resp = re.sub(r"[^\x20-\x7e]", "", orig).lower()  # ASCII projection
    rtoks = TOKEN_RE.findall(resp)
    d_r = sorted(set(rtoks))
    sort_r = " ".join(sorted(rtoks))
    best = None  # (score, para_id, method)
    for pid, (para, needle) in enumerate(zip(paras, needles), 1):
        p_toks = TOKEN_RE.findall(para)
        p_dist = sorted(set(p_toks))
        inter = sorted(set(d_r) & set(p_dist))
        diff_r = sorted(set(d_r) - set(p_dist))
        diff_p = sorted(set(p_dist) - set(d_r))
        t0 = " ".join(inter)
        t1 = (t0 + " " + " ".join(diff_r)).strip()
        t2 = (t0 + " " + " ".join(diff_p)).strip()
        if not rtoks:
            ts = tso = 0.0
        else:
            ts = max(_sim(t0, t1), _sim(t0, t2), _sim(t1, t2))
            tso = _sim(sort_r, " ".join(sorted(p_toks)))
        si = 0.0 if not resp else _sim(resp, para)
        k = len(needle)
        par = max(
            100.0 * (1.0 - _lev(resp[i : i + k], needle) / k)
            for i in range(max(1, len(resp) - k + 1))
        )
        methods = [("token_set", ts), ("token_sort", tso),
                   ("partial", par), ("simple", si)]
        score = max(m[1] for m in methods)
        method = next(n for n, v in methods if v == score)
        if best is None or score > best[0]:
            best = (score, pid, method)
    score, pid, method = best
    para = paras[pid - 1]
    kw_r = set(d_r) - set(common)
    kw_p = set(TOKEN_RE.findall(para)) - set(common)
    matching = sorted(kw_r & kw_p)
    missing = sorted(kw_p - kw_r)
    hl = sorted((set(d_r) & set(TOKEN_RE.findall(para))) - set(hl_common))
    highlighted = orig
    for w in hl:
        highlighted = re.sub(
            rf"(?i)\b{w}\b", f"[{w}]", highlighted
        )
    return {
        "best_para_id": pid,
        "best_method": method,
        "best_score": _fl4(score),
        "valid": score >= threshold,
        "matching_words": matching,
        "n_matching": len(matching),
        "n_missing": len(missing),
        "overlap_pct": _fl4(len(matching) / len(kw_p) * 100.0),
        "highlighted": highlighted,
    }


def test_corpus_match_recompute(spark):
    """First 10 docs of sf0.001: every output column matches the
    pure-Python recompute (partial_ratio windows included)."""
    from pdf_extractor_spark.analytics.validation import (
        CV_COMMON,
        CV_NEEDLE_CHARS,
        CV_PARAS,
        CV_THRESHOLD,
        HL_COMMON,
        corpus_match_validate,
    )

    sf_dir = "/root/testdata/sf0.001"
    got = {
        r["doc_id"]: r for r in corpus_match_validate(spark, sf_dir).collect()
    }
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(10)
        .collect()
    }
    needles = [p[:CV_NEEDLE_CHARS] for p in CV_PARAS]
    for doc_id, text in docs.items():
        want = _py_best(
            text, CV_PARAS, needles, CV_COMMON, HL_COMMON, CV_THRESHOLD
        )
        row = got[doc_id]
        for key, w in want.items():
            g = row[key]
            if isinstance(w, float):
                assert abs(g - w) <= 1e-4, (doc_id, key, g, w)
            else:
                assert g == w, (doc_id, key, g, w)


def test_corpus_match_distribution(spark):
    """The fixture exercises both verdicts, several winning paragraphs,
    and more than one winning method (corpus_validator semantics would
    be vacuous if one branch always won)."""
    from pdf_extractor_spark.analytics.validation import corpus_match_validate

    rows = corpus_match_validate(spark, "/root/testdata/sf0.001").collect()
    assert {r["valid"] for r in rows} == {True, False}
    assert len({r["best_para_id"] for r in rows}) >= 2
    assert len({r["best_method"] for r in rows}) >= 2
    # reference tie rule: ties go to the earliest paragraph / the
    # first method in token_set > token_sort > partial > simple order —
    # spot-check internal consistency: every valid row clears threshold
    for r in rows:
        assert r["valid"] == (r["best_score"] >= 75.0 - 1e-4)


def test_highlight_matching_words_recompute(spark):
    """Whole-corpus recompute of text_utils.py:8-41 under the fixture
    query text: bracket marking, lowercase replacement, stopword skip."""
    from pdf_extractor_spark.analytics.validation import (
        HL_COMMON,
        HL_QUERY_TEXT,
        highlight_matching_words,
    )

    sf_dir = "/root/testdata/sf0.001"
    got = {
        r["doc_id"]: r
        for r in highlight_matching_words(spark, sf_dir).collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    q_words = set(TOKEN_RE.findall(HL_QUERY_TEXT.lower())) - set(HL_COMMON)
    checked = 0
    for r in docs:
        orig = r["text"][:160]
        common = sorted(
            (set(TOKEN_RE.findall(orig.lower())) & q_words) - set(HL_COMMON)
        )
        want = orig
        for w in common:
            want = re.sub(rf"(?i)\b{w}\b", f"[{w}]", want)
        row = got[r["doc_id"]]
        assert row["n_common"] == len(common)
        assert row["highlighted"] == want
        checked += 1
    assert checked == len(docs) and checked > 0


def test_match_from_list_matches_python_recompute(spark):
    """Best choice / score / verdict equal a pure-Python recompute of
    the token_set kernel (inter/diff algebra + prefix-sim reductions)
    with process.extractOne's first-best tie rule; both verdicts and
    every choice appear across the fixture corpus."""
    import re as _re

    from pdf_extractor_spark.analytics.validation import (
        CV_RESP_CHARS,
        MFL_CHOICES,
        MFL_MIN_SIMILARITY,
        _py_tokens,
        match_from_list_validate,
    )

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    def nsim(a, b):
        return 100.0 * (1.0 - lev(a, b) / max(len(a), len(b), 1))

    def token_set(resp_toks, choice):
        c = sorted(set(_py_tokens(choice)))
        r = sorted(set(resp_toks))
        inter = sorted(set(r) & set(c))
        diff_r = sorted(set(r) - set(c))
        diff_c = sorted(set(c) - set(r))
        t0 = " ".join(inter)
        t1 = (t0 + " " + " ".join(diff_r)).strip()
        t2 = (t0 + " " + " ".join(diff_c)).strip()

        def psim(s, l):
            return 100.0 * (1.0 - (len(l) - len(s)) / max(len(l), len(s), 1))

        return max(psim(t0, t1), psim(t0, t2), nsim(t1, t2))

    sf_dir = "/root/testdata/sf0.001"
    out = {
        r["doc_id"]: r
        for r in match_from_list_validate(spark, sf_dir).collect()
    }
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    import math

    verdicts, choices_seen = set(), set()
    for doc_id, text in docs.items():
        resp = _re.sub(r"[^\x20-\x7e]", "", text[:CV_RESP_CHARS]).lower()
        rtoks = _py_tokens(resp)
        row = out[doc_id]
        if not resp:
            assert row["status"] == "empty" and not row["passed"]
            continue
        scores = [
            0.0 if not rtoks else token_set(rtoks, c) for c in MFL_CHOICES
        ]
        best = max(scores)
        best_i = scores.index(best)  # extractOne: first best in order
        assert row["status"] == "ok"
        assert row["best_choice"] == MFL_CHOICES[best_i]
        assert row["best_score"] == math.floor(best * 10000 + 1e-6) / 10000
        assert row["passed"] == (best >= MFL_MIN_SIMILARITY)
        verdicts.add(row["passed"])
        choices_seen.add(row["best_choice"])
    assert verdicts == {True, False}
    assert len(choices_seen) >= 2


def test_validation_accuracy_profile_branches(spark):
    """overall averages only the PRESENT metrics: docs with zero
    total_cells (doc_id%7==0) average two metrics, others three —
    reporting.py:99-121 recomputed exactly."""
    import math

    from pdf_extractor_spark.analytics.validation import (
        validation_accuracy_profile,
    )

    rows = validation_accuracy_profile(spark, "/root/testdata/sf0.001").collect()
    assert any(r["n_metrics"] == 2 for r in rows)
    assert any(r["n_metrics"] == 3 for r in rows)
    for r in rows:
        d = r["doc_id"]
        text = (300 + d % 200) / (400 + d % 150) * 100
        struct = (5 + d % 5) / (8 + d % 4) * 100
        metrics = [text, struct]
        if d % 7 != 0:
            metrics.append((10 + d % 12) / (15 + d % 8) * 100)
            assert r["table_accuracy"] is not None
        else:
            assert r["table_accuracy"] is None
        assert r["n_metrics"] == len(metrics)
        want = math.floor(sum(metrics) / len(metrics) * 10000 + 1e-6) / 10000
        assert r["overall_accuracy"] == want
