"""R4-115..118 units: invariants + pure-Python recomputes for the
ANN MAP/MRR audit, the Markov two-step check, the inter-arrival
burstiness profile, and the calendar-gap audit (the DuckDB gate covers
full parity; these pin the semantics independently)."""

import math
from collections import Counter, defaultdict

SF = "/root/testdata/sf0.001"


def _fl(x, k):
    return math.floor(x * 10**k + 1e-6) / 10**k


def test_ann_map_invariants(spark):
    """P@K, MRR, MAP are consistent and saturate at full probe depth:
    AP <= P@K term-by-term, hits are monotone in depth, and at max
    probes the IVF ranking IS the exact ranking (all three = 1)."""
    from pdf_extractor_spark.analytics.similarity import (
        RECALL_MAX_PROBE,
        TOP_K,
        ann_map_audit,
    )

    rows = sorted(
        ann_map_audit(spark, SF).collect(), key=lambda r: r["n_probe"]
    )
    assert [r["n_probe"] for r in rows] == list(
        range(1, RECALL_MAX_PROBE + 1)
    )
    last_hits = -1
    for r in rows:
        assert 0 <= r["hits_at_k"] <= TOP_K
        assert r["p_at_k"] == _fl(r["hits_at_k"] / TOP_K, 6)
        if r["hits_at_k"] > 0:
            assert 1.0 / TOP_K - 1e-9 <= r["mrr"] <= 1.0 + 1e-9
        else:
            assert r["mrr"] == 0.0
        # each AP term i/p_i <= 1 and the divisor is K, so AP <= P@K
        assert r["map_at_k"] <= r["p_at_k"] + 1e-9
        assert r["hits_at_k"] >= last_hits  # deeper probes never hurt
        last_hits = r["hits_at_k"]
    # cross-pin against the independently-graded recall audit: same
    # truth set, same candidate generation => P@K == recall@K (its
    # grid is 1e-4, ours 1e-6)
    from pdf_extractor_spark.analytics.similarity import ann_recall_audit

    recall = {
        r["n_probe"]: r["recall_at_k"]
        for r in ann_recall_audit(spark, SF).collect()
    }
    for r in rows:
        assert _fl(r["p_at_k"], 4) == recall[r["n_probe"]]
    # a hit exists even at depth 1 here (nearest centroid holds at
    # least one true neighbor on this fixture), so MRR/MAP are live
    assert rows[0]["hits_at_k"] > 0


def test_markov_recompute(spark):
    """One-step and two-step counts equal an independent per-user walk;
    rows of P and the chained P^2 each sum to ~1; the chain equals the
    floored-term matrix square."""
    from pdf_extractor_spark.analytics.relational import (
        markov_transition_check,
    )

    ev = defaultdict(list)
    for r in spark.read.parquet(f"{SF}/events.parquet").collect():
        ev[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    c1, c2 = Counter(), Counter()
    for u in ev:
        seq = [t for _, _, t in sorted(ev[u])]
        for i in range(len(seq) - 1):
            c1[(seq[i], seq[i + 1])] += 1
        for i in range(len(seq) - 2):
            c2[(seq[i], seq[i + 2])] += 1
    r1 = Counter()
    for (a, _b), n in c1.items():
        r1[a] += n
    r2 = Counter()
    for (a, _b), n in c2.items():
        r2[a] += n
    types = sorted({t for _, _, t in sum(ev.values(), [])})
    chain_q = Counter()
    for a in types:
        for m in types:
            for b in types:
                if c1[(a, m)] and c1[(m, b)]:
                    chain_q[(a, b)] += math.floor(
                        (c1[(a, m)] / r1[a]) * (c1[(m, b)] / r1[m]) * 1e12
                        + 1e-6
                    )
    rows = {
        (r["from_type"], r["to_type"]): r
        for r in markov_transition_check(spark, SF).collect()
    }
    assert set(rows) == {(a, b) for a in types for b in types}
    for (a, b), r in rows.items():
        assert r["n_1step"] == c1[(a, b)]
        assert r["p_1step"] == _fl(c1[(a, b)] / r1[a], 6)
        assert r["n_2step"] == c2[(a, b)]
        assert r["p_2step_chain"] == _fl(chain_q[(a, b)] / 1e12, 6)
    for a in types:
        srow = sum(rows[(a, b)]["p_1step"] for b in types)
        assert abs(srow - 1.0) < 1e-4
        schain = sum(rows[(a, b)]["p_2step_chain"] for b in types)
        assert abs(schain - 1.0) < 1e-4


def test_interarrival_recompute(spark):
    """Gap statistics equal an independent per-(user, type) walk on
    whole-second epochs; CV and burstiness agree with the closed
    forms, and B sits in (-1, 1)."""
    from pdf_extractor_spark.analytics.relational import (
        interarrival_profile,
    )

    by = defaultdict(list)
    for r in spark.read.parquet(f"{SF}/events.parquet").collect():
        by[(r["user_id"], r["event_type"])].append(
            (r["ts"], r["event_id"])
        )
    gaps = defaultdict(list)
    for (u, t), evs in by.items():
        evs.sort()
        import datetime

        epoch = datetime.datetime(1970, 1, 1)
        secs = [
            math.floor((ts - epoch).total_seconds()) for ts, _ in evs
        ]  # NTZ read as naive; engine session tz is UTC, so naive
        # epoch arithmetic matches cast(ts as timestamp as long)
        for i in range(1, len(secs)):
            gaps[t].append(secs[i] - secs[i - 1])
    rows = {
        r["event_type"]: r for r in interarrival_profile(spark, SF).collect()
    }
    assert set(rows) == {t for t in gaps if gaps[t]}
    for t, g in gaps.items():
        if not g:
            continue
        n, s, ss = len(g), sum(g), sum(x * x for x in g)
        mu = s / n
        sd = math.sqrt(ss / n - mu * mu)
        r = rows[t]
        assert r["n_gaps"] == n
        assert r["mean_gap_s"] == _fl(mu, 4)
        assert r["cv"] == _fl(sd / mu, 6)
        assert r["burstiness"] == _fl((sd - mu) / (sd + mu), 6)
        assert -1.0 < r["burstiness"] < 1.0


def test_calendar_gap_recompute(spark):
    """Missing-day count and the longest dark streak equal an
    independent calendar walk over the observed span."""
    from pdf_extractor_spark.analytics.relational import calendar_gap_audit

    days = {
        r["o_orderdate"].date()
        for r in spark.read.parquet(f"{SF}/orders.parquet").collect()
    }
    d0, d1 = min(days), max(days)
    span = (d1 - d0).days + 1
    missing = [
        d0.toordinal() + i
        for i in range(span)
        if (d0.toordinal() + i) not in {d.toordinal() for d in days}
    ]
    longest, start, cur, cur_start = 0, None, 0, None
    prev = None
    for m in missing:
        if prev is not None and m == prev + 1:
            cur += 1
        else:
            cur, cur_start = 1, m
        if cur > longest:
            longest, start = cur, cur_start
        prev = m
    got = calendar_gap_audit(spark, SF).collect()
    assert len(got) == 1
    r = got[0]
    assert r["span_start"] == d0 and r["span_end"] == d1
    assert r["n_observed_days"] == len(days)
    assert r["n_missing_days"] == len(missing)
    assert r["longest_gap_days"] == longest
    if longest:
        import datetime

        assert r["longest_gap_start"] == datetime.date.fromordinal(start)
    assert r["n_observed_days"] + r["n_missing_days"] == span
