"""Risk-ratio batch (operators/analytics.py: sortino_ratio,
calmar_ratio, info_ratio, omega_ratio)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from trading_etl_python_spark.operators import analytics as AN


def _bars(spark, closes_by_symbol):
    """One bar per (symbol, day): close series indexed from 2024-01-01."""
    rows = []
    for sym, closes in closes_by_symbol.items():
        for i, c in enumerate(closes):
            rows.append((sym, f"2024-01-{i + 1:02d} 12:00:00", float(c)))
    return (
        spark.createDataFrame(rows, ["symbol", "time", "close"])
        .withColumn("time", F.to_timestamp("time"))
        .withColumn("symbol", F.col("symbol").cast("int"))
    )


def test_sortino_matches_hand_calc(spark):
    closes = [100, 110, 99, 108.9, 99.0, 108.9] * 3  # 18 days, 17 returns
    df = _bars(spark, {1: closes})
    out = AN.sortino_ratio(df, min_days=5).collect()[0]
    rs = [
        round(math.log(closes[i + 1] / closes[i]), 6)
        for i in range(len(closes) - 1)
    ]
    rq = [round(r * 1e6) for r in rs]
    mean = sum(rq) / len(rq) / 1e6
    dd = math.sqrt(sum(q * q for q in rq if q < 0) / len(rq)) / 1e6
    assert out.n_days == 17
    assert abs(out.sortino - round(mean / dd * 252**0.5, 4)) < 1e-9


def test_calmar_drawdown_and_sign(spark):
    # monotone rise -> max_drawdown 0 -> NULL calmar
    up = AN.calmar_ratio(
        _bars(spark, {1: [100 + i for i in range(20)]}), min_days=5
    ).collect()[0]
    assert up.max_drawdown == 0.0 and up.calmar is None and up.ann_return > 0
    # 20% dip -> max_drawdown = -0.2
    closes = [100.0] * 5 + [80.0] + [100.0] * 14
    dip = AN.calmar_ratio(_bars(spark, {1: closes}), min_days=5).collect()[0]
    assert abs(dip.max_drawdown + 0.2) < 1e-9
    assert dip.calmar is not None


def test_info_ratio_zero_for_market_clone(spark):
    # two identical symbols: each equals the equal-weight market ->
    # active returns are exactly 0 -> var 0 -> NULL info_ratio
    closes = [100, 105, 98, 103, 99, 104] * 4
    out = AN.info_ratio(
        _bars(spark, {1: closes, 2: closes}), basket_max_symbol=50, min_days=5
    ).collect()
    assert len(out) == 2
    assert all(r.info_ratio is None and r.tracking_error is None for r in out)


def test_omega_gain_loss_partition(spark):
    closes = [100, 120, 100, 120, 100] * 4  # alternating +/- ln(1.2)
    out = AN.omega_ratio(_bars(spark, {1: closes}), min_days=5).collect()[0]
    # gains and losses are equal-magnitude micro sums -> omega ~ 1
    assert abs(out.omega - out.gain_sum / out.loss_sum) < 1e-12
    assert abs(out.omega - 1.0) < 0.01
    # all-up series has zero losses -> NULL omega
    up = AN.omega_ratio(
        _bars(spark, {1: [100 * 1.01**i for i in range(20)]}), min_days=5
    ).collect()[0]
    assert up.omega is None and up.loss_sum == 0.0
