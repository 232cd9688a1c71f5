"""Graph metrics batch (operators/graph.py: hits, kcore_layers,
clustering_coefficient, degree_assortativity)."""

from __future__ import annotations

from trading_etl_python_spark.operators import graph as G


def _pairs(spark, edges):
    return spark.createDataFrame(edges, ["doc_a", "doc_b"])


def test_hits_authority_concentrates_on_sink(spark):
    # star pointing at one sink: 1->0, 2->0, 3->0 plus a weak side edge
    edges = spark.createDataFrame(
        [(1, 0, 5), (2, 0, 5), (3, 0, 5), (3, 2, 1)], ["src", "dst", "w"]
    )
    out = {r.node: r for r in G.hits(edges, iters=5).collect()}
    assert out[0].authority > 0.9  # the sink holds nearly all authority
    assert out[0].hub == 0.0  # no out-edges
    # scores are L1-normalized
    assert abs(sum(r.authority for r in out.values()) - 1.0) < 1e-4
    assert abs(sum(r.hub for r in out.values()) - 1.0) < 1e-4


def test_kcore_triangle_vs_tail(spark):
    # triangle {1,2,3} (2-core) with a pendant chain 3-4-5 (coreness 1);
    # K4 {6,7,8,9} is a 3-core
    tri = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    k4 = [(6, 7), (6, 8), (6, 9), (7, 8), (7, 9), (8, 9)]
    out = {r.node: r.coreness for r in G.kcore_layers(_pairs(spark, tri + k4)).collect()}
    assert out[1] == out[2] == out[3] == 2
    assert out[4] == out[5] == 1
    assert out[6] == out[7] == out[8] == out[9] == 3


def test_clustering_coef_triangle_and_star(spark):
    # triangle: every node has c = 1; star center (4 with 3 leaves): c = 0
    edges = [(1, 2), (2, 3), (1, 3), (4, 5), (4, 6), (4, 7)]
    out = {r.node: r for r in G.clustering_coefficient(_pairs(spark, edges)).collect()}
    assert out[1].clustering_coef == 1.0 and out[1].n_triangles == 1
    assert out[4].clustering_coef == 0.0 and out[4].degree == 3
    assert out[5].clustering_coef is None  # degree 1


def test_assortativity_star_is_negative(spark):
    # star graph: hub degree 4 pairs with leaf degree 1 -> perfectly
    # dissortative (r = -1)
    edges = [(0, i) for i in range(1, 5)]
    out = G.degree_assortativity(_pairs(spark, edges)).collect()[0]
    assert out.n_nodes == 5 and out.n_edges == 4 and out.max_degree == 4
    assert abs(out.mean_degree - 8 / 5) < 1e-12
    assert out.assortativity == -1.0
