from __future__ import annotations

from pyspark.sql import functions as F

from trading_etl_python_spark.operators import transforms as X


def test_tick_widen(spark):
    df = spark.createDataFrame([(1, 99.5)], "id long, price double")
    out = X.tick_widen(df, "price").collect()[0]
    assert out.open == out.high == out.low == out.close == 99.5
    assert out.volume is None


def test_upsert_ignore_first_writer_wins(spark):
    df = spark.createDataFrame(
        [(1, "a", 10), (1, "a", 5), (2, "a", 7)], "k long, sym string, seq long"
    )
    out = X.upsert_ignore(df, ["k", "sym"], "seq").orderBy("k").collect()
    assert [(r.k, r.seq) for r in out] == [(1, 5), (2, 7)]


def test_json_decode_bad_input_isolated(spark):
    """T7 — malformed JSON yields NULL struct, pipeline continues."""
    df = spark.createDataFrame([('{"k": 3}',), ("not json",)], "props string")
    out = X.json_decode(df, "props", "k long").select("_decoded.k").collect()
    assert [r.k for r in out] == [3, None]


def test_null_filter(spark):
    df = spark.createDataFrame([(1, 1.0), (2, None)], "id long, v double")
    assert X.null_filter(df, ["v"]).count() == 1


def test_epoch_roundtrip(spark):
    df = spark.createDataFrame([(1700000000123,)], "ms long")
    out = df.select(X.epoch_ms_to_ts("ms").alias("ts")).select(
        X.ts_to_epoch_ms("ts").alias("ms2")
    )
    assert out.collect()[0].ms2 == 1700000000123


def test_nan_to_null(spark):
    df = spark.createDataFrame([(float("nan"),), (1.5,)], "v double")
    vals = [r.v for r in X.nan_to_null(df).collect()]
    assert vals == [None, 1.5]


def test_dq_report_counts_violations(spark):
    import datetime as dt

    from trading_etl_python_spark.operators.transforms import dq_report

    t = dt.datetime(2024, 1, 1)
    rows = [
        (1, t, 5.0),
        (1, t, 7.0),          # duplicate (user_id, ts)
        (2, None, -3.0),      # null ts + out-of-range
        (3, t, None),         # null value
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = {r.constraint: r for r in dq_report(
        df, not_null=("ts", "value"), unique_key=("user_id", "ts"),
        ranges={"value": (0.0, 1000.0)},
    ).collect()}
    assert out["null:ts"].violations == 1
    assert out["null:value"].violations == 1
    assert out["range:value"].violations == 1  # NULL value is not a range violation
    assert out["unique:user_id,ts"].violations == 1
    assert all(r.n_rows == 4 for r in out.values())


def test_psi_drift_zero_for_identical_and_large_for_shifted(spark):
    from pyspark.sql import functions as F

    from trading_etl_python_spark.operators.transforms import psi_drift

    import random

    random.seed(5)
    rows = [(i, "t", random.uniform(0, 100)) for i in range(2000)]
    df = spark.createDataFrame(rows, ["event_id", "event_type", "value"])

    same = psi_drift(df, df, "value", "event_type").collect()[0]["psi"]
    assert abs(same) < 1e-9                      # identical populations: PSI ~ 0

    shifted = df.withColumn("value", F.col("value") + 60.0)
    drift = psi_drift(df, shifted, "value", "event_type").collect()[0]["psi"]
    assert drift > 0.25                          # standard "drifted" threshold

    # ungrouped variant works too
    glob = psi_drift(df, shifted, "value").collect()[0]["psi"]
    assert glob > 0.25


def test_table_stats_values(spark):
    from trading_etl_python_spark.operators.transforms import table_stats

    df = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (2, None), (3, 30.0)], ["k", "v"]
    )
    out = {r["column"]: r for r in table_stats(df, ["k", "v"]).collect()}
    assert out["k"]["n_rows"] == 4 and out["k"]["n_nulls"] == 0
    assert out["k"]["ndv"] == 3 and out["k"]["min_v"] == 1.0 and out["k"]["max_v"] == 3.0
    assert out["v"]["n_nulls"] == 1 and out["v"]["ndv"] == 3
    assert out["v"]["ndv_sketch_ok"] and out["k"]["ndv_sketch_ok"]
