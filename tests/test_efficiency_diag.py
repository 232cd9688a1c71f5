"""Market-efficiency diagnostics (operators/analytics.py:
variance_ratio, hurst_rs, runs_test, underwater_spells)."""

from __future__ import annotations

from pyspark.sql import functions as F

from trading_etl_python_spark.operators import analytics as AN


def _bars(spark, closes_by_symbol):
    rows = []
    for sym, closes in closes_by_symbol.items():
        for i, c in enumerate(closes):
            day, slot = divmod(i, 1)
            rows.append((sym, f"2024-{1 + day // 28:02d}-{day % 28 + 1:02d} 12:00:00", float(c)))
    return (
        spark.createDataFrame(rows, ["symbol", "time", "close"])
        .withColumn("time", F.to_timestamp("time"))
        .withColumn("symbol", F.col("symbol").cast("int"))
    )


def test_vratio_near_one_for_alternating_and_trending(spark):
    # strongly mean-reverting series: alternating +/- returns -> 2-period
    # sums are ~0 -> VR(2) well below 1
    mr = [100.0, 120.0] * 12
    out = AN.variance_ratio(_bars(spark, {1: mr}), min_days=10).collect()[0]
    assert out.vr_2 < 0.3
    # trending series: constant positive return -> zero variance at both
    # horizons -> v1 == 0 -> NULL ratios
    tr = [100.0 * 1.01**i for i in range(24)]
    out2 = AN.variance_ratio(_bars(spark, {1: tr}), min_days=10).collect()[0]
    assert out2.vr_2 is None and out2.vr_5 is None


def test_hurst_mean_reverting_below_trending(spark):
    # alternating series (anti-persistent) vs accelerating trend
    mr = [100.0, 120.0] * 20
    # random-walk-ish with persistent drift plus wiggle
    tr = [100.0 * (1.02 ** i) * (1 + 0.001 * (i % 3)) for i in range(40)]
    h_mr = AN.hurst_rs(_bars(spark, {1: mr})).collect()[0].hurst
    h_tr = AN.hurst_rs(_bars(spark, {1: tr})).collect()[0].hurst
    assert h_mr < h_tr
    assert h_mr < 0.5  # anti-persistent


def test_runs_test_alternation_is_negative_z(spark):
    # perfectly alternating signs -> maximum runs -> large positive z;
    # a long up block then down block -> 2 runs -> negative z
    alt = [100.0, 120.0] * 12
    z_alt = AN.runs_test(_bars(spark, {1: alt}), min_days=10).collect()[0]
    assert z_alt.n_runs == z_alt.n_days and z_alt.runs_z > 2
    block = [100.0 * 1.01**i for i in range(13)] + [
        100.0 * 1.01**13 * 0.99**i for i in range(1, 13)
    ]
    z_blk = AN.runs_test(_bars(spark, {1: block}), min_days=10).collect()[0]
    assert z_blk.n_runs == 2 and z_blk.runs_z < -2


def test_underwater_spell_lengths(spark):
    # peak at 110 (day 2), 3 days underwater, recovery day 6 = new peak,
    # then drop and stay underwater 2 days to series end
    closes = [100, 110, 90, 95, 105, 115, 108, 109]
    out = AN.underwater_spells(_bars(spark, {1: closes})).collect()[0]
    assert out.max_underwater_days == 3
    assert out.open_underwater_days == 2
    # peaks: day1(100), day2(110), day6(115) -> 3 groups
    assert out.n_peaks == 3
