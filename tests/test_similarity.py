from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trading_etl_python_spark.functions.vector import cosine, dot
from trading_etl_python_spark.operators import similarity as S
from trading_etl_python_spark.sources.tables import load_table


def test_dot_and_cosine_expressions(spark):
    df = spark.createDataFrame([([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])], "a array<float>, b array<float>")
    row = df.select(dot("a", "b").alias("d"), cosine("a", "a").alias("c")).collect()[0]
    assert row.d == pytest.approx(32.0)
    assert row.c == pytest.approx(1.0)


def test_topk_cosine_self_is_top(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    top = S.topk_cosine(emb, query_vec_id=0, k=5).collect()
    assert top[0].vec_id == 0  # the query vector matches itself first
    assert top[0].cos_sim == pytest.approx(1.0, abs=1e-4)
    sims = [r.cos_sim for r in top]
    assert sims == sorted(sims, reverse=True)


def test_ann_lsh_recall_vs_bruteforce(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    exact = [r.vec_id for r in S.topk_cosine(emb, 0, 10).collect()]
    approx = [r.vec_id for r in S.ann_lsh_topk(emb, 0, 10, n_planes=12, max_hamming=4).collect()]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.3, f"ANN recall@10 = {recall}"
    assert approx[0] == 0  # query always lands in its own bucket


def test_cosine_pairs_blocked_symmetry_free(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = S.cosine_pairs_blocked(emb, threshold=-1.0, block_col="label").limit(1000).collect()
    assert all(r.vec_a < r.vec_b for r in pairs)  # each pair exactly once
