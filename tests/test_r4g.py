"""R4-79..82 units: pure-Python recomputes of the EWMA decay score,
the trimmed mean, the bigram-LM cross-entropy, and the per-source
duplication accounting (the DuckDB gate covers full parity; these pin
the semantics against independent walks)."""

import calendar
import hashlib
import math
import re
from collections import defaultdict

SF = "/root/testdata/sf0.001"


def _fl4(x):
    return math.floor(x * 10000 + 1e-6) / 10000


def _us(dt):
    return calendar.timegm(dt.timetuple()) * 1_000_000 + dt.microsecond


def test_ewma_recompute(spark):
    """Decayed sums and decay-weighted means equal an exact-integer
    Python walk (cents x dyadic weights anchored at each user's own
    max timestamp); the anchor event always carries full weight."""
    from pdf_extractor_spark.analytics.relational import (
        EWMA_MAX_HOURS,
        ewma_user_score,
    )

    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    per_user = defaultdict(list)
    for r in rows:
        per_user[r["user_id"]].append(
            (_us(r["ts"]), math.floor(r["value"] * 100 + 1e-6))
        )
    got = {r["user_id"]: r for r in ewma_user_score(spark, SF).collect()}
    assert set(got) == set(per_user)
    scale = 100 * (1 << EWMA_MAX_HOURS)
    for u, evs in per_user.items():
        mx = max(t for t, _ in evs)
        dec = wsum = 0
        for t, vc in evs:
            k = (mx - t) // 3_600_000_000
            w = (1 << (EWMA_MAX_HOURS - k)) if k <= EWMA_MAX_HOURS else 0
            dec += vc * w
            wsum += w
        r = got[u]
        assert r["n_events"] == len(evs)
        assert r["decayed_sum"] == _fl4(dec / scale)
        assert r["ewma_value"] == _fl4(dec / (100.0 * wsum))
        assert wsum >= 1 << EWMA_MAX_HOURS  # anchor at full weight


def test_trimmed_mean_recompute(spark):
    """Per-segment trimmed/raw means equal a sorted-walk recompute on
    integer cents; trimming moves the mean on at least one segment."""
    from pdf_extractor_spark.analytics.relational import (
        TRIM_PCT_DEN,
        TRIM_PCT_NUM,
        trimmed_mean_robust,
    )

    cust = {
        r["c_custkey"]: r["c_mktsegment"]
        for r in spark.read.parquet(f"{SF}/customer.parquet").collect()
    }
    per_seg = defaultdict(list)
    for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
        per_seg[cust[r["o_custkey"]]].append(
            math.floor(r["o_totalprice"] * 100 + 1e-6)
        )
    got = {
        r["c_mktsegment"]: r for r in trimmed_mean_robust(spark, SF).collect()
    }
    assert set(got) == set(per_seg)
    for seg, vals in per_seg.items():
        vals.sort()
        n = len(vals)
        k = n * TRIM_PCT_NUM // TRIM_PCT_DEN
        kept = vals[k : n - k]
        r = got[seg]
        assert r["n_orders"] == n and r["trim_k"] == k
        assert r["trimmed_mean"] == _fl4(sum(kept) / (100.0 * len(kept)))
        assert r["raw_mean"] == _fl4(sum(vals) / (100.0 * n))
    assert any(
        got[s]["trimmed_mean"] != got[s]["raw_mean"] for s in per_seg
    )


def test_bigram_xent_recompute(spark):
    """Cross-entropy and unseen rates equal a full pure-Python replay
    of the add-one bigram LM (train = old wave, eval = new wave) with
    per-term integer-grid flooring."""
    from pdf_extractor_spark.analytics.curation import (
        bigram_lm_crossentropy,
    )

    rows = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    ids = [r["doc_id"] for r in rows]
    midpt = (min(ids) + max(ids)) / 2
    toks = {
        r["doc_id"]: [t for t in re.split(r"\s+", r["text"]) if t]
        for r in rows
    }
    c12 = defaultdict(int)
    vocab = set()
    for did, ts in toks.items():
        if did < midpt:
            vocab.update(ts)
            for a, b in zip(ts, ts[1:]):
                c12[(a, b)] += 1
    c1 = defaultdict(int)
    for (a, _b), c in c12.items():
        c1[a] += c
    v = len(vocab)
    want = {}
    for did, ts in toks.items():
        if did < midpt or len(ts) < 2:
            continue
        s = unseen = nbg = 0
        for a, b in zip(ts, ts[1:]):
            p = (c12.get((a, b), 0) + 1) / (c1.get(a, 0) + v)
            s += math.floor(math.log(p) * 1_000_000 + 1e-6)
            unseen += (a, b) not in c12
            nbg += 1
        want[did] = (
            nbg,
            _fl4(-s / (1_000_000.0 * nbg)),
            _fl4(unseen / nbg),
        )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["cross_entropy"], r["unseen_rate"])
        for r in bigram_lm_crossentropy(spark, SF).collect()
    }
    assert got == want
    # entropy is positive and the unseen mass is non-trivially spread
    assert all(h > 0 for _n, h, _u in got.values())


def test_dup_rate_by_source_recompute(spark):
    """Per-source doc/distinct counts, dup rate and cross-source
    overlap equal a dict recompute over md5 fingerprints."""
    from pdf_extractor_spark.analytics.dedup import dup_rate_by_source

    rows = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("source", "text")
        .collect()
    )
    per_src = defaultdict(list)
    fp_sources = defaultdict(set)
    for r in rows:
        fp = hashlib.md5(r["text"].encode()).hexdigest()
        per_src[r["source"]].append(fp)
        fp_sources[fp].add(r["source"])
    got = {r["source"]: r for r in dup_rate_by_source(spark, SF).collect()}
    assert set(got) == set(per_src)
    for src, fps in per_src.items():
        n, d = len(fps), len(set(fps))
        cross = sum(1 for fp in set(fps) if len(fp_sources[fp]) >= 2)
        r = got[src]
        assert r["n_docs"] == n
        assert r["n_distinct_texts"] == d
        assert r["dup_rate"] == _fl4((n - d) / n)
        assert r["n_cross_source_texts"] == cross
