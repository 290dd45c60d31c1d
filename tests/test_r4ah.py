"""R4-186..188 units: TextRank, KMV sketch, posting compression —
pure-Python recomputes at sf0.001."""

import hashlib
import math
import re
from collections import Counter, defaultdict

SF = "/root/testdata/sf0.001"


def _fl(x, k):
    return math.floor(x * 10**k + 1e-6) / 10**k


def test_textrank_recompute(spark):
    """R4-186: the quantized weighted-PageRank walk replays step for
    step in Python; top terms carry the heaviest co-occurrence mass."""
    from pdf_extractor_spark.analytics.textstats import (
        STOPWORDS,
        TEXTRANK_D,
        TEXTRANK_ITERS,
        TEXTRANK_TOP,
        _TR_GRID,
        textrank_keywords,
    )

    und = Counter()
    for r in spark.read.parquet(f"{SF}/documents.parquet").collect():
        if r["text"] is None:
            continue
        ft = [
            t
            for t in re.split(r"\s+", r["text"])
            if t != "" and t not in STOPWORDS
        ]
        for x, y in zip(ft, ft[1:]):
            if x != y:
                und[(min(x, y), max(x, y))] += 1
    directed = defaultdict(list)
    for (a, b), w in und.items():
        directed[a].append((b, w))
        directed[b].append((a, w))
    sumw = {u: sum(w for _, w in lst) for u, lst in directed.items()}
    ws = {u: 1.0 for u in sumw}
    for _ in range(TEXTRANK_ITERS):
        s = Counter()
        for u, lst in directed.items():
            for v, w in lst:
                s[v] += math.floor(
                    float(w) * ws[u] * _TR_GRID / float(sumw[u]) + 1e-6
                )
        ws = {
            u: math.floor(
                (
                    (1.0 - TEXTRANK_D)
                    + TEXTRANK_D * (float(s.get(u, 0)) / float(_TR_GRID))
                )
                * _TR_GRID
                + 1e-6
            )
            / float(_TR_GRID)
            for u in sumw
        }
    ranked = sorted(
        sumw, key=lambda u: (-_fl(ws[u], 6), u)
    )[:TEXTRANK_TOP]
    expect = [(u, sumw[u], _fl(ws[u], 6)) for u in ranked]
    got = [
        (r["term"], r["edge_weight"], r["textrank"])
        for r in textrank_keywords(spark, SF).collect()
    ]
    assert got == expect and len(got) == TEXTRANK_TOP
    # graph sanity: every returned term has real co-occurrence mass
    assert all(w > 0 for _, w, _ in got)


def test_kmv_recompute(spark):
    """R4-187: per-lang estimate equals the Python k-th-min replay and
    lands within 50% of exact (k=64 => ~13% expected std error)."""
    from pdf_extractor_spark.analytics.textstats import (
        KMV_K,
        kmv_distinct_audit,
    )

    shingles = defaultdict(set)
    for r in spark.read.parquet(f"{SF}/documents.parquet").collect():
        toks = re.split(r"\s+", r["text"])
        if len(toks) >= 3:
            for i in range(len(toks) - 2):
                shingles[r["lang"]].add(" ".join(toks[i:i + 3]))
    got = {r["lang"]: r for r in kmv_distinct_audit(spark, SF).collect()}
    assert set(got) == set(shingles)
    for lang, ss in shingles.items():
        hashes = sorted(
            {
                int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
                for t in ss
            }
        )
        if len(hashes) >= KMV_K:
            est = math.floor(
                float(KMV_K - 1) * float(2**32) / float(hashes[KMV_K - 1])
                + 1e-6
            )
        else:
            est = len(hashes)
        r = got[lang]
        assert r["n_exact"] == len(ss)
        assert r["kmv_est"] == est
        assert r["rel_err"] == _fl((est - len(ss)) / len(ss), 4)
        assert abs(r["rel_err"]) < 0.5


def test_posting_compression_recompute(spark):
    """R4-188: gamma bit totals equal the Python gap walk; compression
    beats raw 64-bit on every dense term and totals reconcile."""
    from pdf_extractor_spark.analytics.textstats import (
        PCOMP_TOP,
        posting_compression_plan,
    )

    postings = defaultdict(set)
    for r in spark.read.parquet(f"{SF}/documents.parquet").collect():
        if r["text"] is None:
            continue
        for t in set(re.split(r"\s+", r["text"])):
            if t != "":
                postings[t].add(r["doc_id"])
    per = {}
    for t, ids in postings.items():
        ids = sorted(ids)
        gaps = [ids[0] + 1] + [
            b - a for a, b in zip(ids, ids[1:])
        ]
        gamma = sum(2 * (g.bit_length() - 1) + 1 for g in gaps)
        per[t] = (len(ids), 64 * len(ids), gamma)
    top = sorted(per, key=lambda t: (-per[t][0], t))[:PCOMP_TOP]
    rows = {t: per[t] for t in top}
    rows["<TOTAL>"] = tuple(
        sum(v[i] for v in per.values()) for i in range(3)
    )
    got = {
        r["term"]: (r["n_postings"], r["raw_bits"], r["gamma_bits"],
                    r["compressed_ratio"])
        for r in posting_compression_plan(spark, SF).collect()
    }
    assert set(got) == set(rows)
    for t, (n, raw, gamma) in rows.items():
        assert got[t] == (n, raw, gamma, _fl(gamma / raw, 6))
        assert gamma < raw
