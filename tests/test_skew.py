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


def test_aqe_splits_skewed_join_partition(spark, sf_dir):
    """AQE skew-join is the zero-code complement to manual salting: at
    runtime Spark splits a hot shuffle partition into sub-reads. Pin
    that the mechanism actually engages on a hot-keyed join (one key
    carrying ~100x the median) once thresholds are scaled down to the
    test corpus, so the config contract (adaptive + skewJoin enabled in
    session.py) keeps working."""
    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        # force a shuffle join at both plan and AQE-replan time
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

        hot = (
            spark.range(60_000)
            .select(
                F.when(F.col("id") % 100 < 99, F.lit(7)).otherwise(F.col("id")).alias("k"),
                F.concat(F.lit("payload-"), F.col("id")).alias("pad"),
            )
        )
        dim = spark.range(50_000).select(F.col("id").alias("k"), F.lit("d").alias("v"))
        # aggregate over pad too, else column pruning drops it and the
        # hot partition (identical 8-byte keys) compresses below any
        # realistic skew threshold
        joined = hot.join(dim, "k").select(
            F.count(F.lit(1)).alias("n"), F.max("pad").alias("m")
        )
        # execute THIS DataFrame (not a derived count() plan) so its own
        # AdaptiveSparkPlan reaches isFinalPlan=true before inspection
        assert joined.collect()[0].n > 0
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan or "skewed" in plan, plan[:3000]
    finally:
        for k, v in saved.items():
            conf.set(k, v) if v is not None else conf.unset(k)
