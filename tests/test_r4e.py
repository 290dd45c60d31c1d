"""R4-71..74 units: pure-Python recomputes of the KS length drift,
the chi-square independence grid, the local clustering coefficient,
and the MinHash estimate audit (the DuckDB gate covers full parity;
these pin the semantics against independent sequential walks)."""

import hashlib
import math
import re
from collections import defaultdict

SF = "/root/testdata/sf0.001"


def _fl(x, k):
    return math.floor(x * 10**k + 1e-6) / 10**k


def test_ks_length_drift_recompute(spark):
    """The reported (value, stat) equals a Python walk over the exact
    integer CDF-gap construction, including the min-value tie-break."""
    from pdf_extractor_spark.analytics.textstats import ks_length_drift

    rows = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "n_chars")
        .collect()
    )
    ids = [r["doc_id"] for r in rows]
    mid = (min(ids) + max(ids)) / 2
    old = sorted(r["n_chars"] for r in rows if r["doc_id"] < mid)
    new = sorted(r["n_chars"] for r in rows if r["doc_id"] >= mid)
    n_old, n_new = len(old), len(new)
    best = None
    for v in sorted(set(old) | set(new)):
        c_old = sum(1 for x in old if x <= v)
        c_new = sum(1 for x in new if x <= v)
        gap = abs(c_new * n_old - c_old * n_new)
        if best is None or gap > best[0] or (gap == best[0] and v < best[1]):
            best = (gap, v)
    [got] = ks_length_drift(spark, SF).collect()
    assert got["n_old"] == n_old and got["n_new"] == n_new
    assert got["gap_num"] == best[0]
    assert got["ks_at_chars"] == best[1]
    assert got["ks_stat"] == _fl(best[0] / (n_old * n_new), 6)
    # a same-distribution sanity bound: the split halves come from the
    # same generator, so the statistic should be well below 1
    assert 0.0 <= got["ks_stat"] < 1.0


def test_chi2_lang_source_recompute(spark):
    """Every grid cell's observed count, expected count and chi² term
    equal the contingency-table closed form; the grid is complete."""
    from pdf_extractor_spark.analytics.textstats import chi2_lang_source

    rows = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("lang", "source")
        .collect()
    )
    cells = defaultdict(int)
    rt = defaultdict(int)
    ct = defaultdict(int)
    for r in rows:
        cells[(r["lang"], r["source"])] += 1
        rt[r["lang"]] += 1
        ct[r["source"]] += 1
    n = len(rows)
    got = {
        (r["lang"], r["source"]): r
        for r in chi2_lang_source(spark, SF).collect()
    }
    assert set(got) == {(a, b) for a in rt for b in ct}
    stat = 0.0
    for (a, b), r in got.items():
        obs = cells.get((a, b), 0)
        exp = rt[a] * ct[b] / n
        assert r["n"] == obs
        assert r["expected"] == _fl(exp, 4)
        assert r["chi2_term"] == _fl((obs - exp) ** 2 / exp, 4)
        stat += (obs - exp) ** 2 / exp
    assert stat >= 0.0


def test_local_clustering_recompute(spark):
    """degree / triangle counts / coefficient equal a brute-force
    neighbor-set walk over the deterministic link fixture; every doc
    appears exactly once (isolated ⇒ 0, 0, 0.0)."""
    from pdf_extractor_spark.analytics.graphalgo import (
        local_clustering_coeff,
    )

    n = spark.read.parquet(f"{SF}/documents.parquet").count()
    nbrs = defaultdict(set)
    for s in range(n):
        for d in ((7 * s + 1) % n, (s * s + 3) % n, s // 2):
            if d != s:
                nbrs[s].add(d)
                nbrs[d].add(s)
    got = {r["doc_id"]: r for r in local_clustering_coeff(spark, SF).collect()}
    assert set(got) == set(range(n))
    for v in range(n):
        ns = sorted(nbrs.get(v, ()))
        tri = sum(
            1
            for i in range(len(ns))
            for j in range(i + 1, len(ns))
            if ns[j] in nbrs[ns[i]]
        )
        d = len(ns)
        want_c = _fl(2 * tri / (d * (d - 1)), 6) if d >= 2 else 0.0
        assert got[v]["degree"] == d
        assert got[v]["n_triangles"] == tri
        assert got[v]["clustering"] == want_c
    # the fixture has real clustering spread (not all-zero)
    assert any(r["clustering"] > 0 for r in got.values())


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_minhash_estimate_recompute(spark):
    """Estimates, exact Jaccards and candidate pairs equal a full
    pure-Python MinHash/LSH replay; injected exact dups anchor
    est = exact = 1.0, err = 0.0."""
    from pdf_extractor_spark.analytics.base import (
        DUP_ID_OFFSET,
        N_INJECTED_DUPS,
    )
    from pdf_extractor_spark.analytics.dedup import (
        LSH_BANDS,
        LSH_ROWS,
        MINHASH_K,
        SHINGLE,
        minhash_estimate_audit,
    )

    rows = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    pool = {r["doc_id"]: r["text"] for r in rows}
    for r in rows:
        if r["doc_id"] < N_INJECTED_DUPS:
            pool[r["doc_id"] + DUP_ID_OFFSET] = r["text"]

    sigs, shsets, bands = {}, {}, defaultdict(set)
    for did, text in pool.items():
        toks = re.split(r"\s+", text)
        if len(toks) >= SHINGLE:
            sh = [
                " ".join(toks[i : i + SHINGLE])
                for i in range(len(toks) - SHINGLE + 1)
            ]
        else:
            sh = [text]
        shsets[did] = set(sh)
        sig = [min(_md5(s + f"#{k}") for s in sh) for k in range(MINHASH_K)]
        sigs[did] = sig
        for b in range(LSH_BANDS):
            h = _md5("".join(sig[b * LSH_ROWS + r] for r in range(LSH_ROWS)))
            bands[(b, h)].add(did)

    want = {}
    for members in bands.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                a, b = ms[i], ms[j]
                n_match = sum(
                    1
                    for k in range(MINHASH_K)
                    if sigs[a][k] == sigs[b][k]
                )
                inter = len(shsets[a] & shsets[b])
                union = len(shsets[a] | shsets[b])
                est = n_match / MINHASH_K
                exact = inter / union
                want[(a, b)] = (
                    n_match,
                    _fl(est, 4),
                    _fl(exact, 4),
                    _fl(abs(est - exact), 4),
                )

    got = {
        (r["a_id"], r["b_id"]): (
            r["n_match"],
            r["est_jaccard"],
            r["exact_jaccard"],
            r["abs_err"],
        )
        for r in minhash_estimate_audit(spark, SF).collect()
    }
    assert got == want
    # injected exact dups are present and anchor the estimator
    anchors = [
        (a, b) for (a, b) in got if b == a + DUP_ID_OFFSET
    ]
    assert anchors
    for key in anchors:
        assert got[key] == (MINHASH_K, 1.0, 1.0, 0.0)
