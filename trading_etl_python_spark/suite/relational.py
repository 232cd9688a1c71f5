"""Relational queries + DuckDB oracles (SURVEY.md §2.2/X7).

All oracles are textbook ANSI SQL; value-hash parity notes:
- SUM of doubles rounded to 4dp (engine aggregation-tree order differs)
- counts/keys are exact integers
- rank ties broken deterministically by key
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import relational as REL
from ..sources.tables import load_events, load_table

QUERIES = {}
ORACLES = {}


def q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


@q(
    "q_join_agg",
    """SELECT n.n_name,
         ROUND(SUM(l.l_extendedprice * (1.0 - l.l_discount)), 4) AS revenue,
         COUNT(*) AS n_rows
       FROM lineitem l
       JOIN orders o   ON l.l_orderkey = o.o_orderkey
       JOIN customer c ON o.o_custkey = c.c_custkey
       JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
       JOIN nation n   ON c.c_nationkey = n.n_nationkey
       JOIN region r   ON n.n_regionkey = r.r_regionkey
       WHERE r.r_name = 'ASIA'
         AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
       GROUP BY n.n_name""",
)
def q_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = {n: load_table(spark, sf_dir, n) for n in
         ("customer", "orders", "lineitem", "supplier", "nation", "region")}
    return REL.revenue_by_nation(
        t["customer"], t["orders"], t["lineitem"], t["supplier"], t["nation"], t["region"]
    )


@q(
    "q_semi_join",
    """SELECT c_mktsegment, COUNT(*) AS n_customers
       FROM customer c
       WHERE EXISTS (SELECT 1 FROM orders o
                     WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
       GROUP BY c_mktsegment""",
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return REL.semi_join_counts(
        load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "orders"), "F"
    )


@q(
    "q_anti_join",
    """SELECT c_mktsegment, COUNT(*) AS n_customers
       FROM customer c
       WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
       GROUP BY c_mktsegment""",
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return REL.anti_join_counts(
        load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "orders")
    )


@q(
    "q_set_ops",
    """SELECT
        (SELECT COUNT(*) FROM (
           SELECT user_id FROM events WHERE event_type = 'click'
           UNION
           SELECT user_id FROM events WHERE event_type = 'purchase') u) AS n_union,
        (SELECT COUNT(*) FROM (
           SELECT user_id FROM events WHERE event_type = 'click'
           INTERSECT
           SELECT user_id FROM events WHERE event_type = 'purchase') i) AS n_intersect,
        (SELECT COUNT(*) FROM (
           SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
           EXCEPT
           SELECT user_id FROM events WHERE event_type = 'purchase') e) AS n_except""",
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    return REL.set_op_counts(load_events(spark, sf_dir), "click", "purchase")


@q(
    "q_window_rank",
    """SELECT c_mktsegment, c_custkey, c_acctbal, rnk FROM (
         SELECT c_mktsegment, c_custkey, c_acctbal,
                CAST(RANK() OVER (PARTITION BY c_mktsegment
                                  ORDER BY c_acctbal DESC, c_custkey) AS INTEGER) AS rnk
         FROM customer) t
       WHERE rnk <= 3""",
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    return REL.top_customers_per_segment(load_table(spark, sf_dir, "customer"), 3)


@q(
    "q_grouping_sets",
    """SELECT l_returnflag, l_linestatus,
         CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf,
         CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls,
         ROUND(SUM(l_quantity), 4) AS sum_qty,
         ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
         COUNT(*) AS n_rows
       FROM lineitem
       GROUP BY ROLLUP(l_returnflag, l_linestatus)""",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return REL.rollup_lineitem(load_table(spark, sf_dir, "lineitem"))


@q(
    "q_top_orders",
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
       ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
)
def q_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return REL.top_orders(load_table(spark, sf_dir, "orders"), 10)
