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
