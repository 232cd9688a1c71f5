from __future__ import annotations

from pyspark.sql import functions as F

from trading_etl_python_spark.operators import skew as SK
from trading_etl_python_spark.sources.tables import load_events


def test_salted_agg_matches_plain_agg(spark, sf_dir):
    ev = load_events(spark, sf_dir)
    plain = {
        (r.user_id,): (r.n, round(r.s, 4))
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("s"))
        .collect()
    }
    salted = {
        (r.user_id,): (r.n, round(r.s, 4))
        for r in SK.salted_agg(
            ev,
            ["user_id"],
            {
                "n": (F.count(F.lit(1)), F.sum("n")),
                "s": (F.sum("value"), F.round(F.sum("s"), 4)),
            },
            salt_col="event_id",
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salted_agg_two_shuffles(spark, sf_dir):
    ev = load_events(spark, sf_dir)
    plan = (
        SK.salted_agg(
            ev, ["user_id"], {"n": (F.count(F.lit(1)), F.sum("n"))}, "event_id", 8
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 2  # partial + merge


def test_salted_join_matches_plain_join(spark, sf_dir):
    ev = load_events(spark, sf_dir).select("event_id", "user_id", "value")
    dim = (
        load_events(spark, sf_dir)
        .select("user_id")
        .distinct()
        .withColumn("grp", F.pmod("user_id", F.lit(5)))
    )
    plain = ev.join(dim, "user_id").groupBy("grp").count()
    salted = SK.salted_join(ev, dim, on="user_id", n_salts=4, salt_col="event_id")
    got = {r.grp: r["count"] for r in salted.groupBy("grp").count().collect()}
    want = {r.grp: r["count"] for r in plain.collect()}
    assert got == want


def test_salted_join_rejects_dim_preserving_types(spark, sf_dir):
    import pytest

    ev = load_events(spark, sf_dir).select("event_id", "user_id")
    dim = ev.select("user_id").distinct()
    with pytest.raises(ValueError, match="salted_join supports"):
        SK.salted_join(ev, dim, on="user_id", how="full")


def test_skew_stats_orders_by_count(spark, sf_dir):
    ev = load_events(spark, sf_dir)
    rows = SK.skew_stats(ev, "event_type", top=5).collect()
    counts = [r.n_rows for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert abs(sum(r.share for r in rows) - 1.0) < 0.01  # 5 types cover all
