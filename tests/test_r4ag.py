"""R4-183..185 units: label propagation, Bradley-Terry, shard
rebalance — pure-Python recomputes at sf0.001."""

import hashlib
import math
from collections import Counter, defaultdict

SF = "/root/testdata/sf0.001"


def _fl(x, k):
    return math.floor(x * 10**k + 1e-6) / 10**k


def _h32(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _und(n):
    und = set()
    for s in range(n):
        for d in ((s * 7 + 1) % n, (s * s + 3) % n, s // 2):
            if s != d:
                und.add((min(s, d), max(s, d)))
    return und


def test_label_propagation_recompute(spark):
    """R4-183: K synchronous rounds of majority vote equal a direct
    Python replay; seeds never change; every vertex ends labeled on
    this connected fixture."""
    from pdf_extractor_spark.analytics.graphalgo import (
        LPA_CLASSES,
        LPA_ROUNDS,
        LPA_SEEDS,
        label_propagation_fixed,
    )

    n = spark.read.parquet(f"{SF}/documents.parquet").count()
    adj = defaultdict(set)
    for a, b in _und(n):
        adj[a].add(b)
        adj[b].add(a)
    label = {
        v: (v % LPA_CLASSES if v < LPA_SEEDS else None) for v in range(n)
    }
    for _ in range(LPA_ROUNDS):
        new = {}
        for v in range(n):
            if v < LPA_SEEDS:
                new[v] = label[v]
                continue
            votes = Counter(
                label[w] for w in adj[v] if label[w] is not None
            )
            if votes:
                new[v] = min(
                    votes, key=lambda lab: (-votes[lab], lab)
                )
            else:
                new[v] = label[v]
        label = new
    got = {
        r["doc_id"]: (r["label"], r["is_seed"])
        for r in label_propagation_fixed(spark, SF).collect()
    }
    assert len(got) == n
    for v in range(n):
        assert got[v] == (label[v], v < LPA_SEEDS)
    assert all(lab is not None for lab, _ in got.values())


def test_bradley_terry_recompute(spark):
    """R4-184: the quantized MM fit replays step for step in Python
    (same float op order); stronger sources have more wins per match
    on average (rank-correlation sanity)."""
    from pdf_extractor_spark.analytics.graphalgo import (
        BT_GRID,
        BT_ITERS,
        bradley_terry_strengths,
    )

    docs = {
        r["doc_id"]: (r["source"], r["n_chars"])
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    pair = defaultdict(lambda: [0, 0])  # (i, j) -> [n, w_i]
    for d, (src, nc) in docs.items():
        if d + 1 not in docs:
            continue
        src_b, nc_b = docs[d + 1]
        if src == src_b or nc == nc_b:
            continue
        i, j = min(src, src_b), max(src, src_b)
        win_i = (nc > nc_b and src < src_b) or (nc_b > nc and src_b < src)
        pair[(i, j)][0] += 1
        pair[(i, j)][1] += 1 if win_i else 0
    directed = defaultdict(list)  # item -> [(opp, n)]
    wins = Counter()
    matches = Counter()
    for (i, j), (nij, wi) in pair.items():
        directed[i].append((j, nij))
        directed[j].append((i, nij))
        wins[i] += wi
        wins[j] += nij - wi
        matches[i] += nij
        matches[j] += nij
    items = sorted(directed)
    n_items = len(items)
    p = {it: 1.0 for it in items}
    for _ in range(BT_ITERS):
        raw = {}
        for it in items:
            dg = sum(
                math.floor(float(nij) * BT_GRID / (p[it] + p[opp]) + 1e-6)
                for opp, nij in directed[it]
            )
            raw[it] = math.floor(
                float(wins[it]) * BT_GRID * BT_GRID / float(dg) + 1e-6
            )
        s = sum(raw.values())
        p = {
            it: math.floor(
                float(raw[it]) * float(n_items) * BT_GRID / float(s)
                + 1e-6
            )
            / float(BT_GRID)
            for it in items
        }
    got = [
        (r["source"], r["wins"], r["matches"], r["strength"])
        for r in bradley_terry_strengths(spark, SF).collect()
    ]
    expect = sorted(
        (
            (it, wins[it], matches[it], _fl(p[it], 6))
            for it in items
        ),
        key=lambda t: (-t[3], t[0]),
    )
    assert got == expect
    # sanity: the strongest item beats the weakest on win rate
    top, bot = got[0], got[-1]
    assert top[1] / top[2] > bot[1] / bot[2]


def test_shard_rebalance_recompute(spark):
    """R4-185: both policies' moved counts equal a Python md5 replay;
    the ring moves a small fraction (~1/(N+1)) while mod moves most."""
    from pdf_extractor_spark.analytics.curation import (
        REBALANCE_N,
        shard_rebalance_audit,
    )

    doc_ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    anchors = {
        s: _h32(f"anchor|{s}") for s in range(REBALANCE_N + 1)
    }

    def ring_assign(pos, n_anchors):
        best = None
        for s in range(n_anchors):
            adj = anchors[s] if anchors[s] >= pos else anchors[s] + 2**32
            if best is None or (adj, s) < best:
                best = (adj, s)
        return best[1]

    mod_moved = ring_moved = 0
    for d in doc_ids:
        pos = _h32(f"ring|{d}")
        if pos % REBALANCE_N != pos % (REBALANCE_N + 1):
            mod_moved += 1
        if ring_assign(pos, REBALANCE_N) != ring_assign(
            pos, REBALANCE_N + 1
        ):
            ring_moved += 1
    got = {
        r["policy"]: (r["n_docs"], r["n_moved"], r["moved_share"])
        for r in shard_rebalance_audit(spark, SF).collect()
    }
    n = len(doc_ids)
    assert got["mod"] == (n, mod_moved, _fl(mod_moved / n, 6))
    assert got["ring"] == (n, ring_moved, _fl(ring_moved / n, 6))
    assert got["ring"][2] < got["mod"][2]
    assert got["ring"][2] < 3.0 / (REBALANCE_N + 1)
