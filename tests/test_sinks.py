from __future__ import annotations

import os

from pyspark.sql import functions as F

from trading_etl_python_spark.sinks import upsert_ignore, write_indicator_table
from trading_etl_python_spark.sources.tables import bars


def _sample(spark, sf_dir, n=200):
    return bars(spark, sf_dir).orderBy("event_id").limit(n)


def test_write_partitions_by_date(spark, sf_dir, tmp_path):
    path = str(tmp_path / "tbl")
    write_indicator_table(_sample(spark, sf_dir), path)
    parts = [d for d in os.listdir(path) if d.startswith("trade_date=")]
    assert parts, "expected hive-style trade_date= partition dirs"
    back = spark.read.parquet(path)
    assert back.count() == 200
    # partition pruning: a one-day filter must not scan every partition
    one_day = back.select("trade_date").first()[0]
    plan = (
        back.filter(F.col("trade_date") == F.lit(one_day))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "partition filters: [isnotnull(trade_date" in plan.lower() or "PartitionFilters" in plan


def test_upsert_ignore_is_idempotent(spark, sf_dir, tmp_path):
    path = str(tmp_path / "tbl")
    batch = _sample(spark, sf_dir)
    upsert_ignore(batch, path)
    n1 = spark.read.parquet(path).count()
    upsert_ignore(batch, path)  # exact replay: ON CONFLICT DO NOTHING
    assert spark.read.parquet(path).count() == n1 == 200


def test_upsert_ignore_appends_only_new_keys(spark, sf_dir, tmp_path):
    path = str(tmp_path / "tbl")
    all_rows = _sample(spark, sf_dir, 300)
    first, second = all_rows.limit(200), all_rows  # 200-row overlap
    upsert_ignore(first, path)
    upsert_ignore(second, path)
    got = spark.read.parquet(path)
    assert got.count() == 300
    assert got.select("time", "symbol").distinct().count() == 300


def test_upsert_ignore_dedups_within_batch(spark, sf_dir, tmp_path):
    path = str(tmp_path / "tbl")
    batch = _sample(spark, sf_dir, 100)
    upsert_ignore(batch.union(batch), path)  # duplicate keys inside one batch
    assert spark.read.parquet(path).count() == 100
