"""R4-179..182 units: SimHash Hamming histogram, retention decay fit,
PRF query expansion, packing efficiency — pure-Python recomputes at
sf0.001 plus seam checks against sibling operators."""

import hashlib
import math
import re
from collections import Counter, defaultdict

SF = "/root/testdata/sf0.001"


def _fl(x, k):
    return math.floor(x * 10**k + 1e-6) / 10**k


def _md5(s):
    return hashlib.md5(s.encode()).hexdigest()


def test_simhash_hamming_recompute(spark):
    """R4-179: the histogram equals a direct Python pass — simhash per
    doc, value collapse, 4-bit band collisions, exact pair counts —
    and shares sum to ~1."""
    from pdf_extractor_spark.analytics.dedup import (
        SIMHASH_BITS,
        SIMHASH_HAM_BANDS,
        simhash_hamming_histogram,
    )

    vals = Counter()
    for r in spark.read.parquet(f"{SF}/documents.parquet").collect():
        toks = re.split(r"\s+", r["text"])
        sh = 0
        for j in range(SIMHASH_BITS):
            signed = sum(
                1 if _md5(f"{t}#{j}")[0] < "8" else -1 for t in toks
            )
            if signed > 0:
                sh |= 1 << j
        vals[sh] += 1
    pairs = set()
    by_band = defaultdict(list)
    for sh in vals:
        for j in range(SIMHASH_HAM_BANDS):
            by_band[(j, (sh >> (4 * j)) & 15)].append(sh)
    for lst in by_band.values():
        lst.sort()
        for i, a in enumerate(lst):
            for b in lst[i + 1:]:
                pairs.add((a, b))
    hist = Counter()
    for a, b in pairs:
        hist[bin(a ^ b).count("1")] += vals[a] * vals[b]
    for sh, n in vals.items():
        if n >= 2:
            hist[0] += n * (n - 1) // 2
    total = sum(hist.values())
    got = {
        r["hamming"]: (r["n_pairs"], r["share"])
        for r in simhash_hamming_histogram(spark, SF).collect()
    }
    assert set(got) == set(hist)
    for d, n in hist.items():
        assert got[d] == (n, _fl(n / total, 6))
    assert abs(sum(s for _, s in got.values()) - 1.0) < 1e-3


def test_interarrival_fit_recompute(spark):
    """R4-180: lambda / implied mean / observed mean equal the closed
    forms over an exact Python histogram; the fit finds real decay
    (lambda > 0) and the implied mean is within 2x of observed."""
    from collections import Counter as C

    from pdf_extractor_spark.analytics.relational import (
        IAF_BIN_SECONDS,
        IAF_MAX_BIN,
        interarrival_exponential_fit,
    )

    ev = defaultdict(list)
    for r in spark.read.parquet(f"{SF}/events.parquet").collect():
        ev[r["user_id"]].append(
            (math.floor(r["ts"].timestamp()), r["event_id"])
        )
    gaps = []
    for u, lst in ev.items():
        lst.sort()
        for (a, _), (b, _) in zip(lst, lst[1:]):
            gaps.append(b - a)
    hist = C(g // IAF_BIN_SECONDS for g in gaps)
    pts = [
        (b, math.floor(math.log(c) * 1e6 + 1e-6))
        for b, c in hist.items()
        if b <= IAF_MAX_BIN
    ]
    n = len(pts)
    sw = sum(b for b, _ in pts)
    sww = sum(b * b for b, _ in pts)
    sy = sum(y for _, y in pts)
    swy = sum(b * y for b, y in pts)
    lam = -(float(n * swy - sw * sy) / float(n * sww - sw * sw) / 1e6)
    r = interarrival_exponential_fit(spark, SF).collect()[0]
    assert r["n_gaps"] == len(gaps) and r["n_bins"] == n
    assert r["lambda_per_hour"] == _fl(lam, 6)
    assert lam > 0
    obs = sum(gaps) / len(gaps) / IAF_BIN_SECONDS
    assert r["implied_mean_hours"] == _fl(1.0 / lam, 4)
    assert r["observed_mean_hours"] == _fl(obs, 4)
    assert 0.5 < (1.0 / lam) / obs < 2.0


def test_prf_expansion_recompute(spark):
    """R4-181: the full pipeline — grid BM25, feedback top-K, term
    mining, expanded re-rank — equals a Python recompute; expanded
    score >= base score for every returned doc (expansion only adds
    non-negative components)."""
    from pdf_extractor_spark.analytics.textstats import (
        BM25_B,
        BM25_K1,
        BM25_TERMS,
        PRF_EXP_TERMS,
        PRF_FB_K,
        prf_query_expansion,
    )

    docs = {
        r["doc_id"]: [
            t
            for t in re.split(r"\s+", r["text"])
            if t != ""
        ]
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
        if r["text"] is not None
    }
    n_docs = len(docs)
    dl = {d: len(t) for d, t in docs.items()}
    s_dl = sum(dl.values())
    avgdl = s_dl / n_docs
    df = Counter()
    for t in docs.values():
        df.update(set(t))

    def grid_score(terms):
        out = {}
        for d, t in docs.items():
            tf = Counter(t)
            g = 0
            for term in terms:
                if tf[term] == 0 or term not in df:
                    continue
                idf = math.log(
                    1.0 + (n_docs - df[term] + 0.5) / (df[term] + 0.5)
                )
                c = idf * (
                    tf[term]
                    * (BM25_K1 + 1.0)
                    / (
                        tf[term]
                        + BM25_K1
                        * (1.0 - BM25_B + BM25_B * dl[d] / avgdl)
                    )
                )
                g += math.floor(c * 1e6 + 1e-6)
            if g or any(tf[x] for x in terms):
                out[d] = g
        return out

    base = grid_score(BM25_TERMS)
    fb = sorted(base, key=lambda d: (-base[d], d))[:PRF_FB_K]
    cand = Counter()
    for d in fb:
        for t in docs[d]:
            if t not in BM25_TERMS:
                cand[t] += 1
    weights = {
        t: f * math.floor(math.log(n_docs / df[t]) * 1e6 + 1e-6)
        for t, f in cand.items()
    }
    exp = sorted(weights, key=lambda t: (-weights[t], t))[:PRF_EXP_TERMS]
    expanded = grid_score(BM25_TERMS + exp)
    top = sorted(expanded, key=lambda d: (-expanded[d], d))[:10]
    label = " ".join(sorted(exp, key=lambda t: (-weights[t], t)))
    expect = [
        (d, base.get(d, 0) / 1e6, expanded[d] / 1e6, label) for d in top
    ]
    got = [
        (r["doc_id"], r["bm25_base"], r["bm25_expanded"],
         r["expansion_terms"])
        for r in prf_query_expansion(spark, SF).collect()
    ]
    assert got == expect
    assert all(e >= b - 1e-9 for _, b, e, _ in got)


def test_pack_efficiency_seam(spark):
    """R4-182: per-group audit agrees with sequence_pack's own output
    (n_seqs = max seq_id + 1, token totals match) and the fill ratio
    is in (0, 1]."""
    from pdf_extractor_spark.analytics.curation import (
        SEQ_PACK_LEN,
        sequence_pack,
        sequence_pack_efficiency,
    )

    packs = defaultdict(lambda: [0, 0])  # group -> [max_seq, tokens]
    for r in sequence_pack(spark, SF).collect():
        acc = packs[r["pack_group"]]
        acc[0] = max(acc[0], r["seq_id"])
        acc[1] += r["seq_tokens"]
    got = {
        r["pack_group"]: r
        for r in sequence_pack_efficiency(spark, SF).collect()
    }
    assert set(got) == set(packs)
    for g, (max_seq, tokens) in packs.items():
        r = got[g]
        # n_seqs counts physical 512-token sequences (ceil(total/L));
        # sequence_pack's seq_id groups docs by FIRST-token sequence,
        # so a trailing spill can push n_seqs past max(seq_id) + 1
        assert r["n_seqs"] == (tokens - 1) // SEQ_PACK_LEN + 1
        assert r["n_seqs"] >= max_seq + 1
        assert r["total_tokens"] == tokens
        assert r["capacity_tokens"] == r["n_seqs"] * SEQ_PACK_LEN
        assert 0.0 < r["fill_ratio"] <= 1.0
        assert r["fill_ratio"] == _fl(
            tokens / (r["n_seqs"] * SEQ_PACK_LEN), 6
        )
        assert 0 <= r["n_spanning_docs"] <= r["n_docs"]
