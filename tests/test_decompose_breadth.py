"""Decomposition/breadth batch (operators/analytics.py:
seasonal_decompose, market_breadth, ulcer_index, cmo)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from trading_etl_python_spark.operators import analytics as AN


def _bars(spark, closes_by_symbol, start_day=1):
    rows = []
    for sym, closes in closes_by_symbol.items():
        for i, c in enumerate(closes):
            d = start_day + i
            rows.append((sym, f"2024-{1 + (d - 1) // 28:02d}-{(d - 1) % 28 + 1:02d} 12:00:00", float(c)))
    return (
        spark.createDataFrame(rows, ["symbol", "time", "close"])
        .withColumn("time", F.to_timestamp("time"))
        .withColumn("symbol", F.col("symbol").cast("int"))
    )


def test_decompose_identity_and_trend(spark):
    closes = [100 + i + (3 if i % 7 == 0 else 0) for i in range(21)]
    rows = AN.seasonal_decompose(_bars(spark, {1: closes})).collect()
    assert len(rows) == 21
    for r in rows:
        # incomplete centered windows (first/last 3 days) have no trend
        if r.trend is not None and r.seasonal is not None:
            # additive identity: close == trend + seasonal + residual
            assert abs(r.close6 - (r.trend + r.seasonal + r.residual)) < 1e-9
    # interior of a linear series: trend equals the close where no spike
    mid = [r for r in rows if r.trend is not None]
    assert len(mid) == 15


def test_breadth_counts_and_ad_line(spark):
    # symbol 1 rises daily, symbol 2 falls daily -> each day 1 adv 1 dec
    up = [100.0 * 1.01**i for i in range(6)]
    dn = [100.0 * 0.99**i for i in range(6)]
    rows = AN.market_breadth(_bars(spark, {1: up, 2: dn})).orderBy("day").collect()
    assert len(rows) == 5  # returns start at day 2
    for r in rows:
        assert r.advancers == 1 and r.decliners == 1 and r.net == 0
    assert rows[-1].ad_line == 0


def test_ulcer_index_flat_vs_dipping(spark):
    flat = AN.ulcer_index(
        _bars(spark, {1: [100.0] * 20}), min_days=5
    ).collect()[0]
    assert flat.ulcer_index == 0.0 and flat.martin_ratio is None
    closes = [100.0] * 10 + [80.0] * 10  # 20% drawdown for half the days
    dip = AN.ulcer_index(_bars(spark, {1: closes}), min_days=5).collect()[0]
    expect = math.sqrt(10 * 0.2**2 / 20)
    assert abs(dip.ulcer_index - expect) < 1e-6


def test_cmo_bounds_and_sign(spark):
    # 14 straight up-days after warmup -> CMO = +100
    up = [100.0 * 1.01**i for i in range(20)]
    rows = AN.cmo(_bars(spark, {1: up}), n=14).orderBy("day").collect()
    vals = [r.cmo for r in rows if r.cmo is not None]
    assert vals and all(v == 100.0 for v in vals)
    # alternating equal up/down -> near 0
    alt = [100.0, 110.0] * 12
    rows2 = AN.cmo(_bars(spark, {1: alt}), n=14).collect()
    vals2 = [r.cmo for r in rows2 if r.cmo is not None]
    assert vals2 and all(abs(v) < 1.0 for v in vals2)
