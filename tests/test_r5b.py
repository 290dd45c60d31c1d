"""R5-10/R5-11 units: the LSH bits→width and SemDeDup K→width
planning curves recomputed in pure Python (numpy hyperplanes /
cosines) over the sf0.001 embeddings."""

import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def _embs():
    df = pd.read_parquet(f"{SF}/embeddings.parquet")
    return list(zip(df.vec_id.astype(int), df.embedding))


def _fl(x, k):
    return math.floor(x * 10**k + 1e-6) / 10**k


def _band_key(emb, bits):
    key = 0
    for r in range(bits):
        j = r  # band 0
        dot = sum(
            float(emb[i]) * math.sin((j + 1) * (i + 1))
            for i in range(len(emb))
        )
        if dot >= 0:
            key += 2**r
    return key


def test_lsh_bits_width_curve_recompute(spark):
    from collections import Counter

    from pdf_extractor_spark.analytics.similarity import (
        LSH_CURVE_BITS,
        lsh_bits_width_curve,
    )

    embs = _embs()
    expect = []
    for bits in LSH_CURVE_BITS:
        widths = Counter(_band_key(e, bits) for _, e in embs)
        n_buckets = len(widths)
        pair_mass = sum(w * (w - 1) // 2 for w in widths.values())
        expect.append(
            (
                bits,
                n_buckets,
                max(widths.values()),
                _fl(len(embs) / n_buckets, 4),
                pair_mass,
            )
        )
    got = [
        (r["n_bits"], r["n_buckets"], r["max_width"], r["mean_width"],
         r["pair_mass"])
        for r in lsh_bits_width_curve(spark, SF).collect()
    ]
    assert got == expect
    # the planning signal itself: more bits, less pair mass
    masses = [m for *_, m in got]
    assert masses[0] > masses[-1]


def test_semdedup_k_width_audit_recompute(spark):
    from collections import Counter

    from pdf_extractor_spark.analytics.similarity import (
        SEMDEDUP_CURVE_K,
        semdedup_k_width_audit,
    )

    embs = _embs()

    def cos(a, b):
        num = sum(float(x) * float(y) for x, y in zip(a, b))
        na = math.sqrt(sum(float(x) ** 2 for x in a))
        nb = math.sqrt(sum(float(y) ** 2 for y in b))
        return num / (na * nb) if na > 0 and nb > 0 else None

    expect = []
    for k in SEMDEDUP_CURVE_K:
        seeds = [(int(v), e) for v, e in embs if v < k]
        widths = Counter()
        for _, e in embs:
            best = max(
                seeds,
                key=lambda s: (
                    cos(e, s[1]) if cos(e, s[1]) is not None else -2.0,
                    -s[0],
                ),
            )
            widths[best[0]] += 1
        n_clusters = len(widths)
        pair_mass = sum(w * (w - 1) // 2 for w in widths.values())
        expect.append(
            (
                k,
                n_clusters,
                max(widths.values()),
                _fl(len(embs) / n_clusters, 4),
                pair_mass,
            )
        )
    got = [
        (r["k_seeds"], r["n_clusters"], r["max_width"], r["mean_width"],
         r["pair_mass"])
        for r in semdedup_k_width_audit(spark, SF).collect()
    ]
    assert got == expect
    assert got[0][4] > got[-1][4]  # more seeds, less pair mass
