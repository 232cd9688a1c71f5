from __future__ import annotations

import os

from trading_etl_python_spark.jobs import backfill_job, latest_indicators_job, range_query_job


def test_backfill_job_end_to_end(spark, sf_dir, tmp_path):
    out = str(tmp_path / "indicators")
    written = backfill_job(spark, sf_dir, out, warmup=26)
    assert written > 0
    assert any(d.startswith("trade_date=") for d in os.listdir(out))
    table = spark.read.parquet(out)
    # full 21-column schema + partition column
    assert {"time", "symbol", "close", "sma_20", "ema_10", "macd_line", "vwap"} <= set(table.columns)
    # warmup gate applied end-to-end
    assert table.filter(table.sma_20.isNull()).count() == 0


def test_backfill_job_rerun_writes_nothing(spark, sf_dir, tmp_path):
    out = str(tmp_path / "indicators")
    first = backfill_job(spark, sf_dir, out, warmup=26)
    second = backfill_job(spark, sf_dir, out, warmup=26)
    assert first > 0 and second == 0


def test_latest_and_range_reads(spark, sf_dir, tmp_path):
    out = str(tmp_path / "indicators")
    backfill_job(spark, sf_dir, out, warmup=26)
    latest = latest_indicators_job(spark, out)
    assert latest.count() == latest.select("symbol").distinct().count()  # one row/symbol
    lo, hi = "2024-01-10", "2024-01-15"
    sliced = range_query_job(spark, out, lo, hi)
    dates = [r.trade_date.isoformat() for r in sliced.select("trade_date").distinct().collect()]
    assert dates and all(lo <= d <= hi for d in dates)
