"""R4-135..138 units: seam recompute for the lexical-vs-semantic
agreement audit, exact md5 walk for the shard balance audit, and
floored-term recomputes for ANOVA / Brown-Forsythe."""

import hashlib
import math
import re
from collections import Counter, defaultdict

SF = "/root/testdata/sf0.001"


def _fl(x, k):
    return math.floor(x * 10**k + 1e-6) / 10**k


def test_lex_sem_agreement_seams(spark):
    """Pearson over (floored jaccard, floored fold-cosine) recomputed
    from the engine's own candidate pairs; dup-vs-source pairs
    excluded; |r| <= 1."""
    from pdf_extractor_spark.analytics.base import DUP_ID_OFFSET
    from pdf_extractor_spark.analytics.dedup import (
        _jaccard_scored_pairs,
        lex_sem_agreement,
    )

    emb = {
        r["vec_id"]: list(r["embedding"])
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    }

    def cos4(a, b):
        dot = na = nb = 0.0
        for x, y in zip(a, b):
            dot = dot + float(x) * float(y)
        for x in a:
            na = na + float(x) * float(x)
        for y in b:
            nb = nb + float(y) * float(y)
        return math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 10000 + 1e-6)

    pts = []
    for r in _jaccard_scored_pairs(spark, SF).collect():
        oa, ob = r["a_id"] % DUP_ID_OFFSET, r["b_id"] % DUP_ID_OFFSET
        if oa == ob or oa not in emb or ob not in emb:
            continue
        j4 = math.floor(r["jaccard"] * 10000 + 1e-6)
        pts.append((j4, cos4(emb[oa], emb[ob])))
    n = len(pts)
    sj = sum(j for j, _ in pts)
    sc = sum(c for _, c in pts)
    sjc = sum(j * c for j, c in pts)
    sjj = sum(j * j for j, _ in pts)
    scc = sum(c * c for _, c in pts)
    r_exp = (n * sjc - sj * sc) / math.sqrt(
        (n * sjj - sj * sj) * (n * scc - sc * sc)
    )
    got = lex_sem_agreement(spark, SF).collect()
    assert len(got) == 1
    g = got[0]
    assert g["n_pairs"] == n and n > 0
    assert g["mean_jaccard"] == _fl(sj / 10000.0 / n, 4)
    assert g["mean_cos"] == _fl(sc / 10000.0 / n, 4)
    assert g["pearson_r"] == _fl(r_exp, 6)
    assert -1.0 <= g["pearson_r"] <= 1.0


def test_shard_balance_recompute(spark):
    """Shard loads equal an independent md5 walk; observed doc CV is
    within an order of magnitude of the multinomial expectation (the
    md5 partitioner is unbiased on this fixture)."""
    from pdf_extractor_spark.analytics.curation import (
        N_SHARDS,
        shard_balance_audit,
    )

    nd = Counter()
    ch = Counter()
    for r in spark.read.parquet(f"{SF}/documents.parquet").collect():
        h = hashlib.md5(f"shard|{r['doc_id']}".encode()).hexdigest()
        s = int(h[:8], 16) % N_SHARDS
        nd[s] += 1
        ch[s] += r["n_chars"]
    S = len(nd)
    N = sum(nd.values())
    mu_d = N / S
    sd_d = math.sqrt(sum(v * v for v in nd.values()) / S - mu_d * mu_d)
    C = sum(ch.values())
    mu_c = C / S
    sd_c = math.sqrt(sum(v * v for v in ch.values()) / S - mu_c * mu_c)
    got = shard_balance_audit(spark, SF).collect()
    assert len(got) == 1
    g = got[0]
    assert g["n_shards"] == S and g["total_docs"] == N
    assert g["cv_docs"] == _fl(sd_d / mu_d, 6)
    assert g["cv_docs_expected"] == _fl(math.sqrt((S - 1) / N), 6)
    assert g["max_over_mean_docs"] == _fl(max(nd.values()) / mu_d, 6)
    assert g["cv_chars"] == _fl(sd_c / mu_c, 6)
    assert g["max_over_mean_chars"] == _fl(max(ch.values()) / mu_c, 6)
    assert g["cv_docs"] < 10 * g["cv_docs_expected"]


def _lengths_by_lang(spark):
    by = defaultdict(list)
    for r in spark.read.parquet(f"{SF}/documents.parquet").collect():
        by[r["lang"]].append(len(re.split(r"\s+", r["text"])))
    return by


def _anova_from_groups(groups):
    k = len(groups)
    n = sum(len(v) for v in groups.values())
    s = sum(sum(v) for v in groups.values())
    m = s / n
    ssw_q = ssb_q = 0
    for v in groups.values():
        ng, sg, ssg = len(v), sum(v), sum(x * x for x in v)
        ssw_q += math.floor((ssg - sg * sg / ng) * 1e6 + 1e-6)
        mg = sg / ng
        ssb_q += math.floor(ng * (mg - m) * (mg - m) * 1e6 + 1e-6)
    ssw, ssb = ssw_q / 1e6, ssb_q / 1e6
    f = (ssb / (k - 1)) / (ssw / (n - k))
    return k, n, ssb, ssw, f


def test_anova_recompute(spark):
    from pdf_extractor_spark.analytics.textstats import anova_length_by_lang

    by = _lengths_by_lang(spark)
    k, n, ssb, ssw, f = _anova_from_groups(by)
    got = anova_length_by_lang(spark, SF).collect()
    assert len(got) == 1
    g = got[0]
    assert g["k_groups"] == k and g["n_total"] == n
    assert g["ss_between"] == _fl(ssb, 4)
    assert g["ss_within"] == _fl(ssw, 4)
    assert g["f_stat"] == _fl(f, 4)
    assert g["eta_sq"] == _fl(ssb / (ssb + ssw), 6)
    assert 0.0 <= g["eta_sq"] <= 1.0


def test_brown_forsythe_recompute(spark):
    from pdf_extractor_spark.analytics.textstats import brown_forsythe_length

    by = _lengths_by_lang(spark)
    devs = {}
    for lang, v in by.items():
        sv = sorted(v)
        med = sv[(len(sv) + 1) // 2 - 1]
        devs[lang] = [abs(x - med) for x in v]
    k, n, _ssb, _ssw, f = _anova_from_groups(devs)
    got = brown_forsythe_length(spark, SF).collect()
    assert len(got) == 1
    g = got[0]
    assert g["k_groups"] == k and g["n_total"] == n
    assert g["f_bf"] == _fl(f, 4)
    assert g["f_bf"] >= 0.0
