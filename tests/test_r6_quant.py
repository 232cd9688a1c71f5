"""Round-6 quant batch: TRIX / Supertrend recurrences
(operators/recursive.py) and Amihud / Roll-spread / Holt-eval
microstructure analytics (operators/analytics.py)."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from trading_etl_python_spark.operators import analytics as AN
from trading_etl_python_spark.operators import recursive as R


def test_trix_stage_alignment_and_zero_guard():
    c = np.cumsum(np.ones(30)) + 10.0
    out = R.trix_rec(c, 3)
    # stages seed at index 2, 4, 6; first ratio needs two e3 values -> 7
    assert np.isnan(out[:7]).all() and not np.isnan(out[7])
    # e3 of a linear ramp is increasing -> positive momentum
    assert (out[7:] > 0).all()
    z = R.trix_rec(np.zeros(30), 3)
    assert np.isnan(z).all()  # zero denominator guarded, never inf


def test_supertrend_flips_direction_on_breakdown():
    # steady uptrend then a crash through the lower band
    c = np.concatenate([10.0 + np.arange(20), [20.0, 5.0, 4.0, 3.0]])
    h, lo = c + 0.5, c - 0.5
    st, dr = R.supertrend_rec(h, lo, c, 3, 1.0)
    s = 2  # first ATR row
    assert np.isnan(st[:s]).all() and dr[s] == 1.0
    assert (dr[s:20] == 1.0).all()  # uptrend holds
    assert dr[-1] == -1.0  # crash flipped it
    # in uptrend st tracks the lower band (below close); in downtrend above
    assert st[10] < c[10] and st[-1] > c[-1]


def test_supertrend_band_ratchet_monotone():
    # while the trend holds up and closes stay above, flb never decreases
    c = 10.0 + np.arange(30.0)
    h, lo = c + 0.5, c - 0.5
    st, dr = R.supertrend_rec(h, lo, c, 3, 1.0)
    live = st[2:]
    assert (np.diff(live) >= -1e-12).all()


def _bars(spark, rows):
    return spark.createDataFrame(
        [(s, t, e, float(h), float(lo), float(c), int(v)) for s, t, e, h, lo, c, v in rows],
        "symbol long, time string, event_id long, high double, low double,"
        " close double, volume long",
    ).withColumn("time", F.col("time").cast("timestamp"))


def test_amihud_hand_computed(spark):
    # 2 days, one tick each: ret day2 = ln(2), dollar vol day2 = 20*5
    rows = [
        (1, "2024-01-01 10:00:00", 1, 10, 10, 10.0, 5),
        (1, "2024-01-02 10:00:00", 2, 20, 20, 20.0, 5),
    ]
    out = AN.amihud_illiquidity(_bars(spark, rows), min_days=1).collect()
    assert len(out) == 1
    r = out[0]
    expect = math.floor(round(round(math.log(2.0), 6) * 1e6 / 100.0 * 1e6, 0) / 1) / 1e6
    assert r.n_days == 1 and abs(r.amihud_e6 - expect) < 1e-9


def test_roll_spread_sign_cases(spark):
    # alternating +1/-1 deltas -> negative serial covariance -> spread ~ 2*1
    ups = [10.0 + (i % 2) for i in range(40)]
    rows = [(1, f"2024-01-{d+1:02d} 10:00:00", d, v, v, v, 1) for d, v in enumerate(ups[:28])]
    out = AN.roll_spread(_bars(spark, rows), min_days=5).collect()
    assert len(out) == 1 and out[0].roll_spread is not None
    assert abs(out[0].roll_spread - 2.0) < 0.2
    # monotone ramp -> zero covariance of constant deltas -> NULL estimate
    rows2 = [(1, f"2024-01-{d+1:02d} 10:00:00", d, 10.0 + d, 10.0 + d, 10.0 + d, 1)
             for d in range(28)]
    out2 = AN.roll_spread(_bars(spark, rows2), min_days=5).collect()
    assert len(out2) == 1 and out2[0].roll_spread is None


def test_holt_eval_perfect_forecast_on_linear_series(spark):
    # Holt with any alpha/beta tracks an exact linear series perfectly
    # after the seed: level=x_i, trend=slope -> forecast == next close
    rows = [(1, f"2024-01-01 10:{m:02d}:00", m, 10.0 + m, 10.0 + m, 10.0 + m, 1)
            for m in range(40)]
    out = AN.holt_forecast_eval(_bars(spark, rows), min_rows=10).collect()
    assert len(out) == 1
    assert out[0].mae == 0.0 and out[0].bias == 0.0
