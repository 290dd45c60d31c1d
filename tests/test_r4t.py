"""R4-131..134 units: the retrieval-pipeline composition seams, the
embedding norm profile, the percent_rank/cume_dist league table, and
the Benford second-digit audit — pure-Python recomputes mirroring the
engines' sequential-fold float order exactly."""

import math
import re
from collections import Counter, defaultdict

SF = "/root/testdata/sf0.001"


def _fl(x, k):
    return math.floor(x * 10**k + 1e-6) / 10**k


def _cos(a, b):
    """sequential-fold cosine mirroring similarity._cosine (aggregate
    over zip_with, left-to-right)."""
    dot = 0.0
    for x, y in zip(a, b):
        dot = dot + float(x) * float(y)
    na = 0.0
    for x in a:
        na = na + float(x) * float(x)
    nb = 0.0
    for y in b:
        nb = nb + float(y) * float(y)
    den = math.sqrt(na) * math.sqrt(nb)
    return dot / den if den else None


def test_retrieval_pipeline_seams(spark):
    """The composition's final list equals the stated rule applied to
    the graded BM25 candidate ranking: drop any candidate whose
    floored cosine to a higher-ranked candidate reaches the SemDeDup
    bar, keep original order, cut at K."""
    from pdf_extractor_spark.analytics.search_api import (
        RETR_CAND,
        RETR_K,
        retrieval_pipeline_e2e,
    )
    from pdf_extractor_spark.analytics.similarity import SEMDEDUP_THRESHOLD
    from pdf_extractor_spark.analytics.textstats import bm25_scores
    from pdf_extractor_spark.analytics.base import load

    cand = (
        bm25_scores(load(spark, SF, "documents"))
        .where("bm25 > 0")
        .orderBy("bm25", ascending=False)
        .collect()
    )
    cand = sorted(cand, key=lambda r: (-r["bm25"], r["doc_id"]))[:RETR_CAND]
    emb = {
        r["vec_id"]: list(r["embedding"])
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    }
    # orig_rank is assigned BEFORE the embedding join (engine rule);
    # candidates without an embedding vanish with their rank numbers
    ranked = [
        (i + 1, r["doc_id"], r["bm25"])
        for i, r in enumerate(cand)
        if r["doc_id"] in emb
    ]
    kept = []
    for rk, doc, bm in ranked:
        dup = any(
            math.floor(_cos(emb[kdoc], emb[doc]) * 10000 + 1e-6) / 10000
            >= SEMDEDUP_THRESHOLD
            for _krk, kdoc, _kbm in ranked
            if _krk < rk
        )
        if not dup:
            kept.append((rk, doc, bm))
    expect = [
        (i + 1, rk, doc, bm)
        for i, (rk, doc, bm) in enumerate(kept[:RETR_K])
    ]
    got = [
        (r["final_rank"], r["orig_rank"], r["doc_id"], r["bm25"])
        for r in retrieval_pipeline_e2e(spark, SF).collect()
    ]
    assert got == expect and got
    assert [g[0] for g in got] == list(range(1, len(got) + 1))
    assert all(got[i][1] < got[i + 1][1] for i in range(len(got) - 1))


def test_norm_profile_recompute(spark):
    """Per-label norm moments equal a sequential-fold walk on the
    1e-4 grid; min <= mean <= max."""
    from pdf_extractor_spark.analytics.similarity import (
        embedding_norm_profile,
    )

    by = defaultdict(list)
    for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect():
        acc = 0.0
        for x in r["embedding"]:
            acc = acc + float(x) * float(x)
        by[r["label"]].append(math.floor(math.sqrt(acc) * 10000 + 1e-6))
    rows = {r["label"]: r for r in embedding_norm_profile(spark, SF).collect()}
    assert set(rows) == set(by)
    for label, nq in by.items():
        n, s, ss = len(nq), sum(nq), sum(v * v for v in nq)
        mu = s / n
        sd = math.sqrt(ss / n - mu * mu)
        r = rows[label]
        assert r["n_vecs"] == n
        assert r["mean_norm"] == _fl(mu / 10000.0, 4)
        assert r["cv_norm"] == _fl(sd / mu, 6)
        assert r["min_norm"] == min(nq) / 10000
        assert r["max_norm"] == max(nq) / 10000
        assert r["min_norm"] <= r["mean_norm"] + 1e-4 <= r["max_norm"] + 2e-4


def test_source_league_recompute(spark):
    """percent_rank and cume_dist equal their closed forms over the
    tie-free (tokens DESC, source ASC) total order."""
    from pdf_extractor_spark.analytics.textstats import source_league_table

    vol = Counter()
    nd = Counter()
    for r in spark.read.parquet(f"{SF}/documents.parquet").collect():
        vol[r["source"]] += len(re.split(r"\s+", r["text"]))
        nd[r["source"]] += 1
    order = sorted(vol, key=lambda s: (-vol[s], s))
    n = len(order)
    rows = source_league_table(spark, SF).collect()
    assert [r["source"] for r in rows] == order
    for i, r in enumerate(rows):
        assert r["rnk"] == i + 1
        assert r["n_docs"] == nd[r["source"]]
        assert r["tokens"] == vol[r["source"]]
        assert r["pct_rank"] == _fl(i / (n - 1), 6)
        assert r["cume_dist"] == _fl((i + 1) / n, 6)
    assert rows[0]["pct_rank"] == 0.0
    assert rows[-1]["pct_rank"] == 1.0 and rows[-1]["cume_dist"] == 1.0


def test_benford2_recompute(spark):
    """Observed second-digit counts equal an integer-arithmetic walk;
    expected probs are Nigrini's closed form and sum to ~1; digit 0
    has the highest expected share (unlike the first-digit law)."""
    from pdf_extractor_spark.analytics.relational import (
        _BENFORD2_P,
        benford_second_digit,
    )

    obs = Counter()
    for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
        c = math.floor(r["o_totalprice"] * 100 + 1e-6)
        if c < 10:
            continue
        mag = math.floor(math.log10(float(c)))
        lead2 = math.floor(float(c) / (10.0 ** (mag - 1)))
        obs[lead2 % 10] += 1
    n = sum(obs.values())
    rows = {r["digit"]: r for r in benford_second_digit(spark, SF).collect()}
    assert set(rows) == set(range(10))
    assert abs(sum(_BENFORD2_P) - 1.0) < 1e-9
    assert _BENFORD2_P[0] == max(_BENFORD2_P)
    for d in range(10):
        r = rows[d]
        assert r["n_obs"] == obs.get(d, 0)
        assert r["p_obs"] == _fl(obs.get(d, 0) / n, 6)
        assert r["p_benford2"] == _fl(_BENFORD2_P[d], 6)
        exp = _BENFORD2_P[d] * n
        assert r["chi2_term"] == _fl(
            (obs.get(d, 0) - exp) ** 2 / exp, 6
        )
