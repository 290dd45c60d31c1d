"""R4-175..178 units: MATTR, stylometric richness, spend migration,
price indices — recomputed independently in pure Python at sf0.001."""

import math
import re
from collections import Counter, defaultdict

SF = "/root/testdata/sf0.001"


def _fl(x, k):
    return math.floor(x * 10**k + 1e-6) / 10**k


def _toks(text):
    return [t for t in re.split(r"\s+", text) if t != ""]


def test_mattr_recompute(spark):
    """R4-175: per-doc MATTR equals the direct sliding-window walk;
    MATTR <= 1 and equals TTR exactly when the doc fits one window."""
    from pdf_extractor_spark.analytics.textstats import (
        MATTR_W,
        mattr_lexical_diversity,
    )

    rows = {
        r["doc_id"]: r
        for r in mattr_lexical_diversity(spark, SF).collect()
    }
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    n_checked = 0
    for d in docs:
        if d["text"] is None:
            continue
        toks = _toks(d["text"])
        r = rows[d["doc_id"]]
        assert r["n_tokens"] == len(toks)
        assert r["n_types"] == len(set(toks))
        if len(toks) >= MATTR_W:
            wins = [
                len(set(toks[i:i + MATTR_W]))
                for i in range(len(toks) - MATTR_W + 1)
            ]
            assert r["n_windows"] == len(wins)
            expect = sum(wins) / (len(wins) * MATTR_W)
        else:
            assert r["n_windows"] == 0
            expect = len(set(toks)) / len(toks)
        assert r["mattr"] == _fl(expect, 6)
        assert r["ttr"] == _fl(len(set(toks)) / len(toks), 6)
        assert r["mattr"] <= 1.0 + 1e-9
        n_checked += 1
    assert n_checked == len(rows) and n_checked > 0


def test_stylometric_richness_recompute(spark):
    """R4-176: K/D/R equal the closed forms over an exact Python
    frequency spectrum; Simpson's D stays in [0, 1]."""
    from pdf_extractor_spark.analytics.textstats import (
        stylometric_richness,
    )

    tf = defaultdict(Counter)
    for d in spark.read.parquet(f"{SF}/documents.parquet").collect():
        if d["text"] is None:
            continue
        tf[d["source"]].update(_toks(d["text"]))
    got = {r["source"]: r for r in stylometric_richness(spark, SF).collect()}
    assert set(got) == set(tf)
    for src, c in tf.items():
        n = sum(c.values())
        v = len(c)
        s_m2 = sum(m * m for m in c.values())
        s_rep = sum(m * (m - 1) for m in c.values())
        r = got[src]
        assert r["n_tokens"] == n and r["n_types"] == v
        assert r["yules_k"] == _fl(
            1e4 * float(s_m2 - n) / (float(n) * float(n)), 6
        )
        assert r["simpson_d"] == _fl(
            float(s_rep) / (float(n) * (float(n) - 1.0)), 6
        )
        assert r["guiraud_r"] == _fl(float(v) / math.sqrt(float(n)), 6)
        assert 0.0 <= r["simpson_d"] <= 1.0


def test_spend_migration_recompute(spark):
    """R4-177: the 3x3 matrix equals a direct Python segmentation and
    its cells sum to the customer count."""
    from pdf_extractor_spark.analytics.relational import (
        spend_migration_matrix,
    )

    orders = spark.read.parquet(f"{SF}/orders.parquet").collect()
    custs = [
        r["c_custkey"]
        for r in spark.read.parquet(f"{SF}/customer.parquet").collect()
    ]
    days = [r["o_orderdate"].date() for r in orders]
    d0, d1 = min(days), max(days)
    mid = d0 + (d1 - d0) / 2 if False else None  # computed below exactly
    import datetime

    mid = d0 + datetime.timedelta(days=(d1 - d0).days // 2)
    spend = defaultdict(int)
    for r in orders:
        half = 1 if r["o_orderdate"].date() <= mid else 2
        spend[(r["o_custkey"], half)] += math.floor(
            r["o_totalprice"] * 100 + 1e-6
        )
    tot = defaultdict(lambda: [0, 0])
    for (ck, h), s in spend.items():
        tot[h][0] += s
        tot[h][1] += 1
    seg = {}
    for (ck, h), s in spend.items():
        seg[(ck, h)] = "high" if s * tot[h][1] > tot[h][0] else "low"
    matrix = Counter()
    for ck in custs:
        matrix[
            (seg.get((ck, 1), "absent"), seg.get((ck, 2), "absent"))
        ] += 1
    got = {
        (r["seg_h1"], r["seg_h2"]): (r["n"], r["share"])
        for r in spend_migration_matrix(spark, SF).collect()
    }
    assert set(got) == set(matrix)
    for cell, n in matrix.items():
        assert got[cell] == (n, _fl(n / len(custs), 6))
    assert sum(n for n, _ in got.values()) == len(custs)


def test_price_index_recompute(spark):
    """R4-178: all year-pair indices equal the Python basket sums;
    Fisher is bracketed by min/max of Laspeyres and Paasche."""
    from pdf_extractor_spark.analytics.relational import price_index_pairs

    yp = defaultdict(lambda: [0, 0])  # (y, part) -> [qty, rev_c]
    for r in spark.read.parquet(f"{SF}/lineitem.parquet").collect():
        y = r["l_shipdate"].year
        k = (y, r["l_partkey"])
        yp[k][0] += math.floor(r["l_quantity"] + 1e-6)
        yp[k][1] += math.floor(r["l_extendedprice"] * 100 + 1e-6)
    price = {k: math.floor(v[1] / v[0]) for k, v in yp.items()}
    pairs = defaultdict(lambda: [0, 0, 0, 0, 0])
    for (y, part), (q_b, _) in yp.items():
        if (y + 1, part) not in yp:
            continue
        q_t = yp[(y + 1, part)][0]
        p_b, p_t = price[(y, part)], price[(y + 1, part)]
        acc = pairs[y]
        acc[0] += 1
        acc[1] += p_t * q_b
        acc[2] += p_b * q_b
        acc[3] += p_t * q_t
        acc[4] += p_b * q_t
    got = {r["y_base"]: r for r in price_index_pairs(spark, SF).collect()}
    assert set(got) == set(pairs)
    for y, (nc, s_tb, s_bb, s_tt, s_bt) in pairs.items():
        r = got[y]
        lasp = float(s_tb) / float(s_bb)
        paas = float(s_tt) / float(s_bt)
        assert r["y_next"] == y + 1 and r["n_common_parts"] == nc
        assert r["laspeyres"] == _fl(lasp, 6)
        assert r["paasche"] == _fl(paas, 6)
        assert r["fisher"] == _fl(math.sqrt(lasp * paas), 6)
        assert (
            min(r["laspeyres"], r["paasche"]) - 1e-6
            <= r["fisher"]
            <= max(r["laspeyres"], r["paasche"]) + 1e-6
        )
