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


def test_table_diff_identity_is_all_unchanged(spark, sf_dir):
    from trading_etl_python_spark.operators.relational import table_diff
    from trading_etl_python_spark.sources.tables import load_table

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    out = {r["status"]: r["n_rows"] for r in
           table_diff(c, c, ["c_custkey"], ["c_acctbal", "c_mktsegment"]).collect()}
    assert set(out) == {"unchanged"} and out["unchanged"] == c.count()


def test_table_diff_counts_null_safe(spark):
    from trading_etl_python_spark.operators.relational import table_diff

    a = spark.createDataFrame(
        [(1, None), (2, "x"), (3, "y")], ["k", "v"]
    )
    b = spark.createDataFrame(
        [(1, None), (2, "x2"), (4, "z")], ["k", "v"]
    )
    out = {r["status"]: r["n_rows"] for r in
           table_diff(a, b, ["k"], ["v"]).collect()}
    # NULL == NULL is unchanged; 2 changed; 3 removed; 4 added
    assert out == {"unchanged": 1, "changed": 1, "removed": 1, "added": 1}


def test_merge_upsert_laws(spark):
    from trading_etl_python_spark.operators.relational import merge_upsert

    t = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b")], ["k", "v", "s"]
    )
    empty = spark.createDataFrame([], t.schema)
    # empty update set is the identity
    assert sorted(merge_upsert(t, empty, ["k"]).collect()) == sorted(t.collect())
    # matched rows update, unmatched insert, untouched pass through
    u = spark.createDataFrame([(2, 99.0, "B"), (3, 30.0, "c")], ["k", "v", "s"])
    got = {r["k"]: (r["v"], r["s"]) for r in merge_upsert(t, u, ["k"]).collect()}
    assert got == {1: (10.0, "a"), 2: (99.0, "B"), 3: (30.0, "c")}
    # merging the same updates twice is idempotent
    once = merge_upsert(t, u, ["k"])
    twice = merge_upsert(once, u, ["k"])
    assert sorted(once.collect()) == sorted(twice.collect())
