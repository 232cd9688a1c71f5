"""Round-6 indicator-parity batch: Williams %R, Chaikin Money Flow,
A/D line, Ultimate Oscillator, Aroon (operators/windows.py) and
Keltner / Holt / Force Index recurrences (operators/recursive.py)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from trading_etl_python_spark.operators import recursive as R
from trading_etl_python_spark.operators import windows as W


def _bars(spark, rows):
    """rows: (symbol, time_str, event_id, high, low, close, volume)"""
    return spark.createDataFrame(
        [(s, t, e, float(h), float(lo), float(c), int(v)) for s, t, e, h, lo, c, v in rows],
        "symbol long, time string, event_id long, high double, low double,"
        " close double, volume long",
    ).withColumn("time", F.col("time").cast("timestamp"))


def test_willr_extremes_and_warmup(spark):
    rows = [(1, f"2024-01-{d:02d}", d, 10.0 + d, d, 5.0 + d, 1) for d in range(1, 6)]
    out = {r.event_id: r.willr_3 for r in W.with_willr(_bars(spark, rows), 3).collect()}
    assert out[1] is None and out[2] is None
    # rows 1..3: hh=13, ll=1, close=8 -> -100*(13-8)/12
    assert out[3] == round(-100.0 * 5.0 / 12.0, 4)
    # close at the window high -> 0; at the low -> -100 (monotone series never hits)
    assert -100.0 <= out[4] <= 0.0


def test_cmf_matches_hand_computation(spark):
    rows = [
        (1, "2024-01-01", 1, 10.0, 8.0, 9.5, 100),   # mfm=.5
        (1, "2024-01-02", 2, 10.0, 8.0, 8.5, 200),   # mfm=-.5
        (1, "2024-01-03", 3, 12.0, 8.0, 12.0, 100),  # mfm=1
    ]
    out = {r.event_id: r.cmf_2 for r in W.with_cmf(_bars(spark, rows), 2).collect()}
    assert out[1] is None
    assert out[2] == round((0.5 * 100 - 0.5 * 200) / 300.0, 4)
    assert out[3] == round((-0.5 * 200 + 1.0 * 100) / 300.0, 4)


def test_ad_line_cumulative_and_flat_bar(spark):
    rows = [
        (1, "2024-01-01", 1, 10.0, 8.0, 9.5, 100),  # +50
        (1, "2024-01-02", 2, 9.0, 9.0, 9.0, 999),   # h==l -> 0 contribution
        (1, "2024-01-03", 3, 10.0, 8.0, 8.5, 200),  # -100
    ]
    out = {r.event_id: r.ad_line for r in W.with_ad_line(_bars(spark, rows)).collect()}
    assert out[1] == 50.0 and out[2] == 50.0 and out[3] == -50.0


def test_ultimate_equal_horizons_collapse(spark):
    # with n1=n2=n3=k the weighted mean collapses to 100 * sum(bp)/sum(tr)
    rows = [
        (1, f"2024-01-{d:02d}", d, 10.0 + d, 5.0 + d, 7.0 + d, 10) for d in range(1, 6)
    ]
    df = _bars(spark, rows)
    out = {r.event_id: r.uo_2_2_2 for r in W.with_ultimate(df, 2, 2, 2).collect()}
    assert out[1] is None and out[2] is None  # row1 has no delta; warmup=2 deltas
    # bp_d = c_d - min(l_d, c_{d-1}) = (7+d) - min(5+d, 6+d) = 2
    # tr_d = max(h_d, c_{d-1}) - min(l_d, c_{d-1}) = (10+d)-(5+d) = 5
    assert out[3] == round(100.0 * (2 + 2) / (5 + 5), 4)


def test_aroon_latest_tie_wins(spark):
    rows = [
        (1, "2024-01-01", 1, 7.0, 1.0, 5.0, 1),
        (1, "2024-01-02", 2, 7.0, 2.0, 5.0, 1),  # tie high -> latest (rn 2)
        (1, "2024-01-03", 3, 6.0, 1.0, 5.0, 1),  # tie low with rn1 -> latest (rn 3)
    ]
    out = {r.event_id: r for r in W.with_aroon(_bars(spark, rows), 3).collect()}
    r3 = out[3]
    # high tie at rn1/rn2 -> latest rn2, 1 bar back: 100*(2-1)/2
    assert r3.aroon_up_3 == 50.0
    # low tie at rn1/rn3 -> latest rn3, 0 back: 100
    assert r3.aroon_dn_3 == 100.0


def test_holt_kernel_matches_reference_loop(spark):
    x = np.array([10.0, 12.0, 11.0, 13.0, 15.0, 14.0])
    lev, tr = R.holt_rec(x, 0.2, 0.1)
    l, b = x[0], x[1] - x[0]
    assert lev[0] == l and tr[0] == b
    for i in range(1, len(x)):
        l_new = 0.2 * x[i] + 0.8 * (l + b)
        b = 0.1 * (l_new - l) + 0.9 * b
        l = l_new
        assert lev[i] == l and tr[i] == b
    # single-row key: level passes through, trend undefined
    lev1, tr1 = R.holt_rec(x[:1])
    assert lev1[0] == 10.0 and np.isnan(tr1[0])


def test_keltner_bands_are_ema_plus_minus_atr(spark):
    rows = [
        (1, f"2024-01-{d:02d}", d, 10.0 + d, 5.0 + d, 7.0 + d, 1) for d in range(1, 9)
    ]
    df = _bars(spark, rows)
    kc = {r.event_id: r for r in R.with_keltner(df, n_ema=3, n_atr=2, mult=2.0).collect()}
    ema = {r.event_id: r.ema_3 for r in R.with_ema(df, (3,)).collect()}
    atr = {r.event_id: r.atr_2 for r in R.with_atr(df, 2).collect()}
    assert kc[1].kc_mid is None and kc[2].kc_mid is None
    for e in range(3, 9):
        assert kc[e].kc_mid == ema[e]
        assert abs(kc[e].kc_upper - (ema[e] + 2 * atr[e])) < 2e-4
        assert abs(kc[e].kc_lower - (ema[e] - 2 * atr[e])) < 2e-4


def test_force_index_first_output_row(spark):
    rows = [
        (1, f"2024-01-{d:02d}", d, 10.0, 5.0, 7.0 + d, 10) for d in range(1, 7)
    ]
    out = {r.event_id: r.efi_3 for r in R.with_force_index(_bars(spark, rows), 3).collect()}
    # deltas of 1.0 * volume 10 from row 2; SMA-3 seed lands at row 4
    assert out[1] is None and out[2] is None and out[3] is None
    assert out[4] == 10.0
    assert out[5] == 10.0  # steady deltas keep the EMA at 10
