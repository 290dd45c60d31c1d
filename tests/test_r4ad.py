"""R4-171..174 units: link prediction, the ERR/MRR cascade audit,
partial correlation, and RAKE keyword extraction — each recomputed
independently in pure Python over the sf0.001 fixture."""

import math
import re
from collections import Counter, defaultdict

SF = "/root/testdata/sf0.001"


def _fl(x, k):
    return math.floor(x * 10**k + 1e-6) / 10**k


def _link_graph(n):
    und = set()
    for s in range(n):
        for d in ((s * 7 + 1) % n, (s * s + 3) % n, s // 2):
            if s != d:
                und.add((min(s, d), max(s, d)))
    deg = Counter()
    for a, b in und:
        deg[a] += 1
        deg[b] += 1
    return und, deg


def test_link_prediction_recompute(spark):
    """R4-171: CN / Jaccard / Adamic-Adar over non-adjacent pairs equal
    a direct Python walk of the same fixture; every emitted pair is a
    genuine non-edge with >= 1 common neighbor."""
    from pdf_extractor_spark.analytics.graphalgo import (
        LP_HUB_CAP,
        LP_TOP,
        link_prediction_scores,
    )

    n = spark.read.parquet(f"{SF}/documents.parquet").count()
    und, deg = _link_graph(n)
    adj = defaultdict(set)
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    cn = Counter()
    aa = Counter()
    for w, nbrs in adj.items():
        if deg[w] > LP_HUB_CAP:
            continue
        term = math.floor(1e6 / math.log(deg[w]) + 1e-6)
        nb = sorted(nbrs)
        for i, u in enumerate(nb):
            for v in nb[i + 1:]:
                cn[(u, v)] += 1
                aa[(u, v)] += term
    cand = [
        (
            -aa[p],
            -cn[p],
            p[0],
            p[1],
            _fl(cn[p] / (deg[p[0]] + deg[p[1]] - cn[p]), 6),
        )
        for p in cn
        if p not in und
    ]
    cand.sort()
    expect = [
        (u, v, -negcn, jac, -negaa / 1e6, -negaa)
        for negaa, negcn, u, v, jac in cand[:LP_TOP]
    ]
    got = [
        (r["u"], r["v"], r["cn"], r["jaccard_capped"], r["adamic_adar"],
         r["aa_grid"])
        for r in link_prediction_scores(spark, SF).collect()
    ]
    assert got == expect and len(got) == LP_TOP
    assert all((u, v) not in und and c >= 1 for u, v, c, _, _, _ in got)


def test_ann_err_mrr_recompute(spark):
    """R4-172: the full probe sweep — affinity ranking, per-probe
    top-K, graded cascade — recomputed in Python; at full probe depth
    the IVF ranking is exact, so MRR = 1 and ERR equals the ideal
    cascade over grades K..1."""
    from pdf_extractor_spark.analytics.similarity import (
        QUERY_VEC_ID,
        RECALL_MAX_PROBE,
        TOP_K,
        ann_err_mrr_audit,
    )

    emb = {
        r["vec_id"]: (r["label"], [float(x) for x in r["embedding"]])
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    }
    q = emb[QUERY_VEC_ID][1]
    qn = math.sqrt(sum(x * x for x in q))
    # label affinity over component means (ALL vectors, query included)
    comp = defaultdict(lambda: defaultdict(list))
    for lab, vec in emb.values():
        for i, x in enumerate(vec):
            comp[lab][i].append(x)
    aff = {}
    for lab, d in comp.items():
        cx = [sum(v) / len(v) for _, v in sorted(d.items())]
        dot = sum(a * b for a, b in zip(cx, q))
        cn = math.sqrt(sum(a * a for a in cx))
        aff[lab] = _fl(dot / (cn * qn), 4)
    label_rank = {
        lab: i + 1
        for i, lab in enumerate(sorted(aff, key=lambda x: (-aff[x], x)))
    }
    scored = []
    for vid, (lab, vec) in emb.items():
        if vid == QUERY_VEC_ID:
            continue
        dot = sum(a * b for a, b in zip(vec, q))
        vn = math.sqrt(sum(a * a for a in vec))
        scored.append((vid, lab, _fl(dot / (vn * qn), 4)))
    truth_order = sorted(scored, key=lambda t: (-t[2], t[0]))[:TOP_K]
    grade = {
        vid: TOP_K - i for i, (vid, _, _) in enumerate(truth_order)
    }
    expect = []
    for np_ in range(1, RECALL_MAX_PROBE + 1):
        cands = [t for t in scored if label_rank[t[1]] <= np_]
        topk = sorted(cands, key=lambda t: (-t[2], t[0]))[:TOP_K]
        gs = [grade.get(vid, 0) for vid, _, _ in topk]
        gs += [0] * (TOP_K - len(gs))
        first = next((i + 1 for i, g in enumerate(gs) if g > 0), None)
        mrr = 1.0 / first if first else 0.0
        err, surv = 0.0, 1.0
        for r, g in enumerate(gs, start=1):
            rr = (2.0 ** g - 1.0) / float(2 ** TOP_K)
            err = err + surv * rr / float(r)
            surv = surv * (1.0 - rr)
        expect.append((np_, _fl(mrr, 6), _fl(err, 6)))
    got = [
        (r["n_probe"], r["mrr"], r["err"])
        for r in sorted(
            ann_err_mrr_audit(spark, SF).collect(),
            key=lambda r: r["n_probe"],
        )
    ]
    assert got == expect
    # the deepest probe finds the true best neighbor first (observed
    # property of the fixture) and ERR is bounded by the ideal cascade
    assert got[-1][1] == 1.0
    ideal_err, surv = 0.0, 1.0
    for r in range(1, TOP_K + 1):
        rr = (2.0 ** (TOP_K - r + 1) - 1.0) / float(2 ** TOP_K)
        ideal_err = ideal_err + surv * rr / float(r)
        surv = surv * (1.0 - rr)
    for _, m, e in got:
        assert 0.0 <= m <= 1.0 + 1e-9
        assert 0.0 <= e <= ideal_err + 1e-9


def test_partial_corr_recompute(spark):
    """R4-173: all three (pair | control) rows equal the closed forms
    over exact integer moments; |r| <= 1 on both columns."""
    from pdf_extractor_spark.analytics.relational import (
        partial_corr_features,
    )

    pts = []
    for r in spark.read.parquet(f"{SF}/lineitem.parquet").collect():
        pts.append(
            (
                math.floor(r["l_quantity"] + 1e-6),
                math.floor(
                    r["l_extendedprice"] / r["l_quantity"] * 100 + 1e-6
                ),
                math.floor(r["l_discount"] * 10000 + 1e-6),
            )
        )
    feats = {"qty": 0, "price_c": 1, "disc_bp": 2}
    n = len(pts)

    def corr(a, b):
        ia, ib = feats[a], feats[b]
        sa = sum(p[ia] for p in pts)
        sb = sum(p[ib] for p in pts)
        sab = sum(p[ia] * p[ib] for p in pts)
        saa = sum(p[ia] * p[ia] for p in pts)
        sbb = sum(p[ib] * p[ib] for p in pts)
        num = float(n) * float(sab) - float(sa) * float(sb)
        den = math.sqrt(
            (float(n) * float(saa) - float(sa) * float(sa))
            * (float(n) * float(sbb) - float(sb) * float(sb))
        )
        return num / den

    got = {
        (r["feat_a"], r["feat_b"]): r
        for r in partial_corr_features(spark, SF).collect()
    }
    names = ["qty", "price_c", "disc_bp"]
    seen = set()
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            z = [f for f in names if f not in (a, b)][0]
            r_xy, r_xz, r_yz = corr(a, b), corr(a, z), corr(b, z)
            den = math.sqrt((1 - r_xz * r_xz) * (1 - r_yz * r_yz))
            part = (r_xy - r_xz * r_yz) / den if den > 0 else None
            row = got[(a, b)]
            assert row["control"] == z
            assert row["r_raw"] == _fl(r_xy, 6)
            assert row["r_partial"] == (
                _fl(part, 6) if part is not None else None
            )
            assert abs(row["r_raw"]) <= 1.0 + 1e-9
            if row["r_partial"] is not None:
                assert abs(row["r_partial"]) <= 1.0 + 1e-9
            seen.add((a, b))
    assert set(got) == seen


def test_rake_recompute(spark):
    """R4-174: top-25 RAKE phrases equal a direct Python pass —
    stopword-delimited phrase runs, deg/freq word grids, exact
    BIGINT phrase sums, (score, phrase) ordering."""
    from pdf_extractor_spark.analytics.textstats import (
        RAKE_MAX_PHRASE,
        RAKE_TOP,
        STOPWORDS,
        rake_keywords,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    phrases = []  # (phrase_tuple)
    for r in docs:
        if r["text"] is None:
            continue
        run = []
        toks = re.split(r"\s+", r["text"])
        for t in toks + [""]:  # sentinel flushes the last run
            if t in STOPWORDS or t == "":
                if run and len(run) <= RAKE_MAX_PHRASE:
                    phrases.append(tuple(run))
                run = []
            else:
                run.append(t)
    freq = Counter()
    deg = Counter()
    for p in phrases:
        for w in p:
            freq[w] += 1
            deg[w] += len(p)
    w_grid = {
        w: math.floor(deg[w] * 1e6 / freq[w] + 1e-6) for w in freq
    }
    by_text = Counter()
    score = {}
    for p in phrases:
        txt = " ".join(p)
        by_text[txt] += 1
        score[txt] = (sum(w_grid[w] for w in p), len(p))
    ranked = sorted(score, key=lambda t: (-score[t][0], t))[:RAKE_TOP]
    expect = [
        (
            t,
            score[t][1],
            by_text[t],
            score[t][0],
            score[t][0] / 1e6,
        )
        for t in ranked
    ]
    got = [
        (r["phrase"], r["n_words"], r["n_occurrences"], r["score_grid"],
         r["rake_score"])
        for r in rake_keywords(spark, SF).collect()
    ]
    assert got == expect and len(got) == RAKE_TOP
