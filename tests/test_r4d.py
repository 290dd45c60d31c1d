"""R4-61/62 units: pure-Python recomputes of the k-core peel and the
burst debounce (the DuckDB gate covers full parity; these pin the
semantics against an independent sequential walk and, for k-core,
prove the fixed round budget reaches the true fixpoint)."""

import math

SF = "/root/testdata/sf0.001"


def test_kcore_peel_reaches_fixpoint(spark):
    """The fixed-round Spark peel equals the UNBOUNDED pure-Python peel
    (iterate to fixpoint) on the fixture graph — i.e. KCORE_ROUNDS is a
    convergence budget, not an approximation knob — and the fixture
    actually peels somebody (non-trivial 2-core)."""
    from pdf_extractor_spark.analytics.graphalgo import (
        KCORE_K,
        KCORE_ROUNDS,
        kcore_peel,
    )

    out = {r["doc_id"]: r["core_degree"]
           for r in kcore_peel(spark, SF).collect()}
    n = spark.read.parquet(f"{SF}/documents.parquet").count()

    edges = set()
    for s in range(n):
        for d in ((7 * s + 1) % n, (s * s + 3) % n, s // 2):
            if d != s:
                edges.add((min(s, d), max(s, d)))
    # peel to fixpoint, counting rounds the Spark loop's way: one
    # degree pass + one endpoint filter per round
    rounds = 0
    while True:
        deg = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {v for v, d in deg.items() if d >= KCORE_K}
        nxt = {(a, b) for a, b in edges if a in keep and b in keep}
        if nxt == edges:
            break
        edges = nxt
        rounds += 1
    assert rounds <= KCORE_ROUNDS, (
        f"fixture needs {rounds} peel rounds; budget {KCORE_ROUNDS}"
    )
    want = {}
    for a, b in edges:
        want[a] = want.get(a, 0) + 1
        want[b] = want.get(b, 0) + 1
    assert out == want
    # every survivor really has core degree >= K, and someone was peeled
    assert all(d >= KCORE_K for d in out.values())
    assert len(out) < n


def test_event_debounce_recompute(spark):
    """Retained counts equal a sequential per-(user, type) walk with
    restart-on-every-event debounce semantics: a chain continues while
    successive raw gaps stay under the threshold, and only the chain
    head survives."""
    from pdf_extractor_spark.analytics.relational import (
        DEBOUNCE_GAP_S,
        event_debounce,
    )

    rows = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id", "event_type", "event_id", "ts")
        .collect()
    )
    streams = {}
    for r in rows:
        key = (r["user_id"], r["event_type"])
        t_us = int(r["ts"].timestamp() * 1_000_000)
        streams.setdefault(key, []).append((t_us, r["event_id"]))
    n_raw = {}
    n_kept = {}
    for (_, etype), evs in streams.items():
        evs.sort()
        prev = None
        for t_us, _ in evs:
            n_raw[etype] = n_raw.get(etype, 0) + 1
            if prev is None or t_us - prev >= DEBOUNCE_GAP_S * 1_000_000:
                n_kept[etype] = n_kept.get(etype, 0) + 1
            prev = t_us
    got = {r["event_type"]: r for r in event_debounce(spark, SF).collect()}
    assert set(got) == set(n_raw)
    for etype, r in got.items():
        assert r["n_raw"] == n_raw[etype]
        assert r["n_retained"] == n_kept[etype], etype
        want = math.floor(n_kept[etype] / n_raw[etype] * 10000 + 1e-6) / 10000
        assert abs(r["retention_ratio"] - want) < 1e-12
    # the fixture contains real bursts (something was actually dropped)
    assert sum(n_kept.values()) < sum(n_raw.values())
