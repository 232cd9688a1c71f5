from __future__ import annotations

from pyspark.sql import functions as F

from trading_etl_python_spark.operators import relational as REL
from trading_etl_python_spark.sources.tables import load_table


def test_semi_plus_anti_partition_customers(spark, sf_dir):
    """Semi and anti joins partition the customer set exactly."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    semi = customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi").count()
    anti = customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti").count()
    assert semi + anti == customer.count()


def test_rollup_grand_total(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    out = REL.rollup_lineitem(li)
    grand = out.filter((F.col("g_rf") == 1) & (F.col("g_ls") == 1)).collect()
    assert len(grand) == 1
    assert grand[0].n_rows == li.count()


def test_top_orders_uses_take_ordered(spark, sf_dir):
    """ORDER BY + LIMIT must compile to TakeOrderedAndProject (no full sort)."""
    orders = load_table(spark, sf_dir, "orders")
    plan = REL.top_orders(orders, 10)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_join_agg_broadcasts_dims(spark, sf_dir):
    t = {n: load_table(spark, sf_dir, n) for n in
         ("customer", "orders", "lineitem", "supplier", "nation", "region")}
    df = REL.revenue_by_nation(
        t["customer"], t["orders"], t["lineitem"], t["supplier"], t["nation"], t["region"]
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_set_op_counts_consistency(spark, sf_dir):
    from trading_etl_python_spark.sources.tables import load_events

    ev = load_events(spark, sf_dir)
    row = REL.set_op_counts(ev, "click", "purchase").collect()[0]
    # |A ∪ B| = |A \ B| + |A ∩ B| + |B \ A|  =>  union >= intersect, except = union - |B|
    a = ev.filter(F.col("event_type") == "click").select("user_id").distinct().count()
    b = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct().count()
    assert row.n_union == a + b - row.n_intersect
    assert row.n_except == a - row.n_intersect
