"""Round-6 third indicator batch: PSAR / KAMA / TSI recurrences
(operators/recursive.py) and the Vortex window op
(operators/windows.py)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from trading_etl_python_spark.operators import recursive as R


def test_psar_uptrend_tracks_below_and_flips():
    c = np.concatenate([10.0 + np.arange(20) * 0.5, [19.0, 12.0, 11.0, 10.0]])
    h, lo = c + 0.3, c - 0.3
    sar, d = R.psar_rec(h, lo, c)
    assert np.isnan(sar[0]) and np.isnan(d[0])
    assert d[1] == 1.0  # c1 >= c0 seeds an uptrend
    assert (d[2:19] == 1.0).all()
    assert (sar[2:19] < c[2:19]).all()  # SAR stays below price in uptrend
    assert d[-1] == -1.0 and sar[-1] > c[-1]  # crash reversed it


def test_psar_af_acceleration_narrows_gap():
    # monotone uptrend: every bar makes a new EP -> af ratchets 0.02->0.2
    c = 10.0 + np.arange(40) * 1.0
    h, lo = c + 0.2, c - 0.2
    sar, d = R.psar_rec(h, lo, c)
    gap = c[5:] - sar[5:]
    # the RELATIVE gap closes as af accelerates toward its cap
    assert gap[-1] / c[-1] < gap[0] / c[5]
    assert (d[1:] == 1.0).all()


def test_kama_flat_prices_hold_seed():
    c = np.full(30, 50.0)
    out = R.kama_rec(c, 10)
    assert np.isnan(out[:10]).all()
    # ER=0 (flat) -> sc = (2/31)^2 but (c - kama) = 0 -> kama stays 50
    assert np.allclose(out[10:], 50.0)


def test_kama_adapts_faster_on_trends():
    # step change: KAMA approaches the new level; ER=1 on a clean trend
    c = np.concatenate([np.full(15, 10.0), np.full(25, 20.0)])
    out = R.kama_rec(c, 10)
    assert out[14] == 10.0
    assert out[-1] > 19.0  # converged most of the way to 20
    assert np.all(np.diff(out[15:]) >= -1e-12)  # monotone approach


def test_tsi_sign_and_warmup():
    up = 100.0 + np.arange(60) * 1.0
    t = R.tsi_rec(up, 25, 13)
    assert np.isnan(t[:37]).all() and not np.isnan(t[37])
    # constant positive momentum -> TSI == 100 exactly (num == den)
    assert np.allclose(t[37:], 100.0)
    down = 100.0 - np.arange(60) * 0.5
    td = R.tsi_rec(down, 25, 13)
    assert np.allclose(td[37:], -100.0)


def test_vortex_window_counts_and_ratio(spark):
    import datetime

    rows = []
    for i in range(20):
        ts = datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=i)
        px = 100.0 + i
        rows.append((1, ts, i, px + 1.0, px - 1.0, px))
    df = spark.createDataFrame(
        rows, ["symbol", "time", "event_id", "high", "low", "close"]
    )
    from trading_etl_python_spark.operators.windows import with_vortex

    out = with_vortex(df, 14).orderBy("event_id").collect()
    assert all(r.vi_plus is None for r in out[:14])  # needs 14 prior-rows
    r = out[-1]
    # steady +1 ramp, spread 2: |h - pl| = 3, |l - ph| = 1, TR = 2
    assert abs(r.vi_plus - 1.5) < 1e-9 and abs(r.vi_minus - 0.5) < 1e-9
