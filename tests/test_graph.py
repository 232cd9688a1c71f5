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
