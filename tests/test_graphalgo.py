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
