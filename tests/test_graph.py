from __future__ import annotations


def test_pagerank_known_graph(spark):
    from trading_etl_python_spark.operators.graph import pagerank

    # two-node cycle with equal weights -> symmetric scores 0.5/0.5;
    # a dangling sink attached to one node shifts mass but totals ~1
    edges = spark.createDataFrame(
        [(1, 2, 1.0), (2, 1, 1.0), (1, 3, 1.0)], ["src", "dst", "w"]
    )
    out = {r["node"]: r["score"] for r in pagerank(edges, iters=30).collect()}
    assert abs(sum(out.values()) - 1.0) < 1e-3          # stochastic: mass conserved
    assert out[1] > out[3]                               # cycle member beats sink
    # node 3 is dangling: its mass recycles uniformly, nothing lost
    assert all(v > 0 for v in out.values())


def test_pagerank_uniform_on_symmetric_cycle(spark):
    from trading_etl_python_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(i, (i + 1) % 4, 2.0) for i in range(4)], ["src", "dst", "w"]
    )
    out = {r["node"]: r["score"] for r in pagerank(edges, iters=12).collect()}
    assert all(abs(v - 0.25) < 1e-9 for v in out.values())


def test_triangle_counts_known_graph(spark):
    from trading_etl_python_spark.operators.graph import triangle_counts

    # K4 on {1,2,3,4}: every node is in C(3,2)=3 triangles; node 5 hangs
    # off node 1 and is in none
    edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)] + [(1, 5)]
    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    out = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_counts_no_triangles(spark):
    from trading_etl_python_spark.operators.graph import triangle_counts

    df = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["doc_a", "doc_b"])
    assert triangle_counts(df).count() == 0
