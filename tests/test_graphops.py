"""Graph analytics (operators/graphops.py): fixed-point PageRank + degrees."""

from ant_spark.operators.graphops import degrees, pagerank


def _py_pagerank(edges, n_iter=3, dp=85, scale=10**9):
    """Pure-python mirror of the exact integer recurrence."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    r0 = scale // n
    base = ((100 - dp) * r0) // 100
    r = {v: r0 for v in nodes}
    for _ in range(n_iter):
        s = {v: 0 for v in nodes}
        for u, v in edges:
            s[v] += r[u] // out[u]
        r = {v: base + (dp * s[v]) // 100 for v in nodes}
    return r


def test_pagerank_matches_exact_recurrence(spark):
    edges = [(1, 2), (1, 3), (2, 1), (3, 1), (3, 2), (4, 1)]  # 4 = dangling-in
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["rank_scaled"] for r in pagerank(df, n_iter=3).collect()}
    assert got == _py_pagerank(edges)
    # hub (1) outranks the dangling leaf (4), as scheduling needs
    assert got[1] > got[4]
    # repartition-independence: integer arithmetic is order-free
    got2 = {
        r["id"]: r["rank_scaled"]
        for r in pagerank(df.repartition(7), n_iter=3).collect()
    }
    assert got2 == got


def test_degrees(spark):
    df = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 1)], "src long, dst long"
    )
    got = {r["id"]: (r["out_degree"], r["in_degree"]) for r in degrees(df).collect()}
    assert got == {1: (2, 1), 2: (1, 1), 3: (0, 1)}


def test_pagerank_empty_edges(spark):
    """No edges: empty (id, rank_scaled, rank) result, no ZeroDivisionError."""
    e = spark.createDataFrame([], "src long, dst long")
    out = pagerank(e, n_iter=3)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["id", "rank_scaled", "rank"]


def test_host_edges_and_weighted_pagerank(spark):
    """URL edges → host rollup (self-loops dropped, counts as weights) →
    weighted fixed-point pagerank; mirrored by a pure-python recurrence."""
    from ant_spark.operators.graphops import host_edges

    urls = [
        ("http://a.test/1", "http://b.test/x"),
        ("http://a.test/2", "http://b.test/y"),   # a→b weight 2
        ("http://a.test/3", "http://a.test/4"),   # self-loop: dropped
        ("http://b.test/1", "http://c.test/x"),   # b→c weight 1
        ("http://c.test/1", "http://b.test/z"),   # c→b weight 1
    ]
    he = host_edges(spark.createDataFrame(urls, "src string, dst string"))
    got = {(r["src_host"], r["dst_host"]): r["weight"] for r in he.collect()}
    assert got == {("a.test", "b.test"): 2, ("b.test", "c.test"): 1,
                   ("c.test", "b.test"): 1}

    ranks = {
        r["id"]: r["rank_scaled"]
        for r in pagerank(
            he, n_iter=3, src_col="src_host", dst_col="dst_host",
            weight_col="weight",
        ).collect()
    }
    # python mirror of the weighted recurrence
    edges = [("a.test", "b.test", 2), ("b.test", "c.test", 1),
             ("c.test", "b.test", 1)]
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    out = {}
    for s, _, w in edges:
        out[s] = out.get(s, 0) + w
    scale, dp = 10**9, 85
    r0 = scale // len(nodes)
    base = ((100 - dp) * r0) // 100
    r = {v: r0 for v in nodes}
    for _ in range(3):
        acc = {v: 0 for v in nodes}
        for s, d, w in edges:
            acc[d] += w * (r[s] // out[s])
        r = {v: base + (dp * acc[v]) // 100 for v in nodes}
    assert ranks == r
    assert ranks["b.test"] > ranks["a.test"]  # the linked-to host wins
