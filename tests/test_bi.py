"""BI concentration/segmentation operators
(operators/relational.py: basket_rules, rfm_segments, pareto_abc,
gini_hhi) — hand-checkable fixtures where the textbook value is known."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from trading_etl_python_spark.operators import relational as REL


def test_basket_rules_counts_and_lift(spark):
    # orders: o1={X,Y}, o2={X,Y}, o3={X}, o4={Y,Z}
    li = spark.createDataFrame(
        [(1, 101), (1, 102), (2, 101), (2, 102), (3, 101), (4, 102), (4, 103),
         (1, 101)],  # duplicate line, same brand -> DISTINCT folds it
        ["l_orderkey", "l_partkey"],
    )
    part = spark.createDataFrame(
        [(101, "X"), (102, "Y"), (103, "Z")], ["p_partkey", "p_brand"]
    )
    out = {(r.brand_a, r.brand_b): r for r in REL.basket_rules(li, part).collect()}
    assert ("X", "Y") in out and len(out) == 1  # YZ pair count 1 < min 2
    r = out[("X", "Y")]
    assert (r.n_pair, r.n_a, r.n_b) == (2, 3, 3)
    assert abs(r.support - 0.5) < 1e-9          # 2/4 orders
    assert abs(r.confidence - round(2 / 3, 6)) < 1e-9
    assert abs(r.lift - round(2 * 4 / 9, 6)) < 1e-9


def test_rfm_grid_partitions_all_customers(spark):
    rows = [
        (c, datetime.datetime(2024, 1, d), 100.0 * c)
        for c in range(1, 11)
        for d in range(1, c + 1)  # customer c has c orders
    ]
    orders = spark.createDataFrame(rows, ["o_custkey", "o_orderdate", "o_totalprice"])
    out = REL.rfm_segments(orders).collect()
    assert sum(r.n_customers for r in out) == 10
    assert sum(r.n_orders for r in out) == sum(range(1, 11))
    for r in out:
        assert 1 <= r.r_score <= 5 and 1 <= r.f_score <= 5 and 1 <= r.m_score <= 5


def test_pareto_abc_classes_and_cum(spark):
    li = spark.createDataFrame(
        [(1, i) for i in range(1, 5)], ["l_orderkey", "l_partkey"]
    ).withColumn(
        "l_extendedprice",
        F.when(F.col("l_partkey") == 1, 700.0)
        .when(F.col("l_partkey") == 2, 200.0)
        .when(F.col("l_partkey") == 3, 60.0)
        .otherwise(40.0),
    )
    part = spark.createDataFrame(
        [(1, "B1"), (2, "B2"), (3, "B3"), (4, "B4")], ["p_partkey", "p_brand"]
    )
    out = {r.p_brand: r for r in REL.pareto_abc(li, part).collect()}
    assert out["B1"].abc_class == "A" and abs(out["B1"].cum_share - 0.7) < 1e-9
    assert out["B2"].abc_class == "B" and abs(out["B2"].cum_share - 0.9) < 1e-9
    # B3 lands exactly on 0.96 > 0.95 -> C; B4 closes at 1.0 -> C
    assert out["B3"].abc_class == "C" and out["B4"].abc_class == "C"


def test_gini_extremes(spark):
    # nation 0: perfectly equal -> gini 0, hhi 1/n
    # nation 1: one customer owns everything -> gini (n-1)/n, hhi ~1
    orders = spark.createDataFrame(
        [(c, 100.0) for c in range(1, 5)]
        + [(10 + c, 100.0 if c == 1 else 0.0) for c in range(1, 5)],
        ["o_custkey", "o_totalprice"],
    ).withColumn("o_orderdate", F.lit(datetime.datetime(2024, 1, 1)))
    cust = spark.createDataFrame(
        [(c, 0) for c in range(1, 5)] + [(10 + c, 1) for c in range(1, 5)],
        ["c_custkey", "c_nationkey"],
    )
    out = {r.nation: r for r in REL.gini_hhi(orders, cust).collect()}
    assert out[0].gini == 0.0 and abs(out[0].hhi - 0.25) < 1e-9
    assert abs(out[1].gini - 0.75) < 1e-9 and out[1].hhi == 1.0
