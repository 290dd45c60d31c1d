"""PageRank recompute test: the DataFrame fixed-iteration plan equals
a dense pure-Python power iteration on the same deterministic graph."""


def test_pagerank_matches_power_iteration(spark):
    import math

    from pdf_extractor_spark.analytics.graphalgo import (
        PR_DAMPING,
        PR_ITERS,
        pagerank_fixed,
    )

    sf_dir = "/root/testdata/sf0.001"
    out = {r["doc_id"]: r["pagerank"]
           for r in pagerank_fixed(spark, sf_dir).collect()}
    n = len(out)
    assert set(out) == set(range(n))

    edges = set()
    for s in range(n):
        edges.add((s, (7 * s + 1) % n))
        edges.add((s, (s * s + 3) % n))
        edges.add((s, s // 2))
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    pr = [1.0 / n] * n
    for _ in range(PR_ITERS):
        nxt = [(1.0 - PR_DAMPING) / n] * n
        for s, d in edges:
            nxt[d] += PR_DAMPING * pr[s] / outdeg[s]
        pr = nxt
    for v in range(n):
        want = math.floor(pr[v] * 1e8 + 1e-6) / 1e8
        assert abs(out[v] - want) < 1e-12, (v, out[v], want)
    # the fixture must actually spread rank (not a regular graph)
    assert max(out.values()) > 3 * min(out.values())


def test_triangle_count_matches_brute_force(spark):
    """Degree-ordered wedge counting equals a brute-force O(n^3)-style
    set intersection on the same undirected graph, per vertex."""
    from pdf_extractor_spark.analytics.graphalgo import (
        TRI_TOP,
        triangle_count,
    )

    sf_dir = "/root/testdata/sf0.001"
    rows = [(r["doc_id"], r["n_triangles"])
            for r in triangle_count(spark, sf_dir).collect()]
    n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    adj = {}
    for s in range(n):
        for d in ((7 * s + 1) % n, (s * s + 3) % n, s // 2):
            if d != s:
                adj.setdefault(s, set()).add(d)
                adj.setdefault(d, set()).add(s)
    per_v = {}
    seen = set()
    for a in adj:
        for b in adj[a]:
            if b <= a:
                continue
            for c in adj[a] & adj[b]:
                if c <= b:
                    continue
                for v in (a, b, c):
                    per_v[v] = per_v.get(v, 0) + 1
                seen.add((a, b, c))
    want = sorted(per_v.items(), key=lambda kv: (-kv[1], kv[0]))[:TRI_TOP]
    assert rows == want
    assert seen  # the fixture graph actually contains triangles


def test_hits_matches_power_iteration(spark):
    """R4-32: HITS authority/hub scores equal a dense pure-Python
    L1-normalized power iteration on the same deterministic graph."""
    import math

    from pdf_extractor_spark.analytics.graphalgo import (
        HITS_ITERS,
        hits_scores,
    )

    sf_dir = "/root/testdata/sf0.001"
    rows = hits_scores(spark, sf_dir).collect()
    out = {r["doc_id"]: (r["authority"], r["hub"]) for r in rows}
    n = len(out)
    assert set(out) == set(range(n))

    edges = set()
    for s in range(n):
        edges.add((s, (7 * s + 1) % n))
        edges.add((s, (s * s + 3) % n))
        edges.add((s, s // 2))
    h = [1.0] * n
    a = [0.0] * n
    for _ in range(HITS_ITERS):
        a = [0.0] * n
        for s, d in edges:
            a[d] += h[s]
        tot = sum(a)
        a = [x / tot for x in a]
        h = [0.0] * n
        for s, d in edges:
            h[s] += a[d]
        tot = sum(h)
        h = [x / tot for x in h]
    for v in range(n):
        wa = math.floor(a[v] * 1e8 + 1e-6) / 1e8
        wh = math.floor(h[v] * 1e8 + 1e-6) / 1e8
        assert abs(out[v][0] - wa) < 1e-12, (v, out[v][0], wa)
        assert abs(out[v][1] - wh) < 1e-12, (v, out[v][1], wh)
    # scores are probability vectors with genuine spread (each floored
    # value loses up to 1e-8, so the L1 sum drifts by up to n*1e-8)
    assert abs(sum(x for x, _ in out.values()) - 1.0) < n * 1.1e-8
    assert abs(sum(y for _, y in out.values()) - 1.0) < n * 1.1e-8
    assert max(x for x, _ in out.values()) > 3 * min(
        x for x, _ in out.values()
    )
