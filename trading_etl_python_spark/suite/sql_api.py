"""SQL-surface queries: the engine's ``spark.sql`` entry point exercised
with ANSI TPC-H-shaped query TEXT over the registered table views.

The reference has no query language at all (SURVEY.md §2.2 — every
query is hand-written Python); Spark SQL is the capability extension
that closes that gap.  Each query here is ONE SQL string written in the
ANSI subset both engines parse, submitted verbatim to BOTH
``spark.sql`` and DuckDB — so the oracle checks the full parse ->
analyze -> optimize -> execute path, not a DataFrame transliteration.

Scale notes (what Catalyst does with these shapes):
- Q1: map-side partial aggregation on (returnflag, linestatus) — 6
  groups, the shuffle is bytes.  Predicate pushed to the parquet scan.
- Q6: pure scan-filter-agg, no join; pushdown leaves a single stage.
- Q3: orders⋈lineitem shuffle join with both filters pushed below,
  top-10 via TakeOrderedAndProject (per-partition heaps, no sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import register_views

QUERIES = {}
ORACLES = {}


def q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _sql(spark: SparkSession, sf_dir: str, text: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(text)


TPCH_Q1 = """SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 4) AS sum_qty,
       ROUND(SUM(l_extendedprice), 4) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
       ROUND(AVG(l_quantity), 4) AS avg_qty,
       ROUND(AVG(l_extendedprice), 4) AS avg_price,
       ROUND(AVG(l_discount), 4) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus"""

TPCH_Q6 = """SELECT ROUND(SUM(l_extendedprice * l_discount), 4) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24"""

TPCH_Q3 = """SELECT o.o_orderkey,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
       o.o_orderdate
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1997-06-01 00:00:00'
GROUP BY o.o_orderkey, o.o_orderdate
ORDER BY revenue DESC, o.o_orderkey
LIMIT 10"""


@q("q_sql_tpch_q1", TPCH_Q1)
def q_sql_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (pricing summary) as raw SQL through spark.sql."""
    return _sql(spark, sf_dir, TPCH_Q1)


@q("q_sql_tpch_q6", TPCH_Q6)
def q_sql_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecast revenue change) as raw SQL through spark.sql."""
    return _sql(spark, sf_dir, TPCH_Q6)


@q("q_sql_tpch_q3", TPCH_Q3)
def q_sql_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority, top-10) as raw SQL through spark.sql."""
    return _sql(spark, sf_dir, TPCH_Q3)


TPCH_Q5 = """SELECT n.n_name,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n.n_name
ORDER BY revenue DESC, n.n_name"""

TPCH_Q10 = """SELECT c.c_custkey, c.c_name,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
       ROUND(c.c_acctbal, 4) AS c_acctbal, n.n_name
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20"""

TPCH_Q14 = """SELECT ROUND(
         100.00 * SUM(CASE WHEN p.p_type = 'PROMO'
                           THEN l.l_extendedprice * (1 - l.l_discount)
                           ELSE 0 END)
         / SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1997-04-01 00:00:00'"""

TPCH_Q4 = """SELECT o.o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority"""


@q("q_sql_tpch_q5", TPCH_Q5)
def q_sql_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local-supplier revenue, 6-table join): dims
    broadcast, the one big shuffle is orders x lineitem."""
    return _sql(spark, sf_dir, TPCH_Q5)


@q("q_sql_tpch_q10", TPCH_Q10)
def q_sql_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item revenue, top-20 customers)."""
    return _sql(spark, sf_dir, TPCH_Q10)


@q("q_sql_tpch_q14", TPCH_Q14)
def q_sql_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promo revenue share; part is the broadcast dim)."""
    return _sql(spark, sf_dir, TPCH_Q14)


@q("q_sql_tpch_q4", TPCH_Q4)
def q_sql_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (EXISTS -> left-semi join in both engines)."""
    return _sql(spark, sf_dir, TPCH_Q4)
