"""R4-123..126 units: pure-Python recomputes of the log-normal length
fit, pairwise source-vocabulary overlap, Burrows' Delta, and the
per-language character-class profile."""

import math
import re
import unicodedata
from collections import Counter, defaultdict

SF = "/root/testdata/sf0.001"


def _fl(x, k):
    return math.floor(x * 10**k + 1e-6) / 10**k


def _toks(text):
    # mirror of base.tokens(): split on \s+ INCLUDING empty leading token
    return re.split(r"\s+", text)


def test_lognormal_fit_recompute(spark):
    """mu/sigma equal the grid-quantized moment walk; the implied
    lognormal median/mean are the closed forms; the empirical median
    comes from the exact histogram rule."""
    from pdf_extractor_spark.analytics.textstats import lognormal_length_fit

    lens = [
        len(_toks(r["text"]))
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    ]
    lens = [n for n in lens if n >= 1]
    lq = [math.floor(math.log(n) * 100000 + 1e-6) for n in lens]
    n = len(lq)
    s, ss = sum(lq), sum(x * x for x in lq)
    mu = s / n / 100000.0
    sigma = math.sqrt(ss / n - (s / n) ** 2) / 100000.0
    lens.sort()
    lo = (n + 1) // 2
    emp_median = lens[lo - 1]
    got = lognormal_length_fit(spark, SF).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n_docs"] == n
    assert r["mu_log"] == _fl(mu, 6)
    assert r["sigma_log"] == _fl(sigma, 6)
    assert r["lognorm_median"] == _fl(math.exp(s / n / 100000.0), 4)
    assert r["emp_median"] == emp_median
    assert r["emp_mean"] == _fl(sum(lens) / n, 4)
    # a right-skewed length distribution: mean above median in both
    assert r["lognorm_mean"] >= r["lognorm_median"]


def test_source_vocab_overlap_recompute(spark):
    """Every pair's shared-type count and Jaccard equal independent
    set arithmetic; 20 sources -> 190 pairs."""
    from pdf_extractor_spark.analytics.textstats import source_vocab_overlap

    vocab = defaultdict(set)
    for r in spark.read.parquet(f"{SF}/documents.parquet").collect():
        vocab[r["source"]].update(_toks(r["text"]))
    srcs = sorted(vocab)
    rows = {
        (r["src_a"], r["src_b"]): r
        for r in source_vocab_overlap(spark, SF).collect()
    }
    assert len(rows) == len(srcs) * (len(srcs) - 1) // 2
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            r = rows[(a, b)]
            sh = len(vocab[a] & vocab[b])
            assert r["v_a"] == len(vocab[a])
            assert r["v_b"] == len(vocab[b])
            assert r["shared"] == sh
            assert r["jaccard"] == _fl(
                sh / (len(vocab[a]) + len(vocab[b]) - sh), 6
            )


def test_burrows_delta_recompute(spark):
    """Delta equals the floored-term walk over the top-M marker grid;
    symmetric by construction and zero-variance markers excluded."""
    from pdf_extractor_spark.analytics.textstats import (
        DELTA_TOP_M,
        burrows_delta_sources,
    )

    counts = Counter()
    totals = Counter()
    for r in spark.read.parquet(f"{SF}/documents.parquet").collect():
        for t in _toks(r["text"]):
            counts[(r["source"], t)] += 1
            totals[r["source"]] += 1
    glob = Counter()
    for (s, t), c in counts.items():
        glob[t] += c
    top = sorted(glob.items(), key=lambda kv: (-kv[1], kv[0]))[:DELTA_TOP_M]
    markers = [t for t, _ in top]
    srcs = sorted(totals)
    n_s = len(srcs)
    fq = {
        (s, t): math.floor(
            counts.get((s, t), 0) / totals[s] * 1000000 + 1e-6
        )
        for s in srcs
        for t in markers
    }
    z = {}
    kept = []
    for t in markers:
        vals = [fq[(s, t)] for s in srcs]
        sf_, ssf = sum(vals), sum(v * v for v in vals)
        if n_s * ssf == sf_ * sf_:
            continue
        kept.append(t)
        mu = sf_ / n_s
        sd = math.sqrt(ssf / n_s - mu * mu)
        for s in srcs:
            z[(s, t)] = (fq[(s, t)] - mu) / sd
    rows = {
        (r["src_a"], r["src_b"]): r
        for r in burrows_delta_sources(spark, SF).collect()
    }
    assert len(rows) == n_s * (n_s - 1) // 2 and kept
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            sdq = sum(
                math.floor(abs(z[(a, t)] - z[(b, t)]) * 1e8 + 1e-6)
                for t in kept
            )
            r = rows[(a, b)]
            assert r["n_markers"] == len(kept)
            assert r["delta"] == _fl(sdq / 1e8 / len(kept), 6)
            assert r["delta"] >= 0.0


def test_char_class_profile_recompute(spark):
    """Per-language class counts equal a unicodedata walk (L*, N*,
    ASCII \\s) and the four shares tile to ~1."""
    from pdf_extractor_spark.analytics.textstats import char_class_profile

    agg = defaultdict(lambda: [0, 0, 0, 0, 0])
    ws = set(" \t\n\x0b\f\r")
    for r in spark.read.parquet(f"{SF}/documents.parquet").collect():
        a = agg[r["lang"]]
        a[0] += 1
        for ch in r["text"]:
            a[1] += 1
            cat = unicodedata.category(ch)
            if cat.startswith("L"):
                a[2] += 1
            elif cat.startswith("N"):
                a[3] += 1
            elif ch in ws:
                a[4] += 1
    rows = {r["lang"]: r for r in char_class_profile(spark, SF).collect()}
    assert set(rows) == set(agg)
    for lang, (nd, ch, al, dg, sp) in agg.items():
        r = rows[lang]
        assert r["n_docs"] == nd and r["chars"] == ch
        assert r["alpha_share"] == _fl(al / ch, 6)
        assert r["digit_share"] == _fl(dg / ch, 6)
        assert r["space_share"] == _fl(sp / ch, 6)
        assert r["other_share"] == _fl((ch - al - dg - sp) / ch, 6)
        total = (
            r["alpha_share"]
            + r["digit_share"]
            + r["space_share"]
            + r["other_share"]
        )
        assert 0.99 <= total <= 1.0 + 1e-9
