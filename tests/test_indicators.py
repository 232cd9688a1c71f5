"""Indicator numerics: golden values from the reference's test suite
(FIXTURES.md F4; /root/reference/trading-etl-python/tests/
test_processing_indicators.py:19-39) plus recurrence cross-checks."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest

from trading_etl_python_spark.operators import recursive as R
from trading_etl_python_spark.operators import windows as W
from trading_etl_python_spark.operators.indicators import indicator_table

GOLDEN = [10.0, 12.0, 15.0, 14.0, 13.0, 16.0, 18.0, 17.0, 19.0, 20.0]


def _bars_df(spark, closes, symbol=1):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (symbol, t0 + dt.timedelta(minutes=i), i, c, c + 1.0, c - 1.0, c, 100 + i)
        for i, c in enumerate(closes)
    ]
    return spark.createDataFrame(
        rows, "symbol long, time timestamp_ntz, event_id long, open double, high double, low double, close double, volume long"
    )


def test_sma_golden_values(spark):
    """Reference golden test: SMA(5) over GOLDEN -> NULL idx 0-3, 12.8 @4, 18.0 @9."""
    df = W.with_sma(_bars_df(spark, GOLDEN), 5, out="sma_5")
    vals = [r.sma_5 for r in df.orderBy("event_id").collect()]
    assert vals[:4] == [None] * 4
    assert vals[4] == pytest.approx(12.8)
    assert vals[9] == pytest.approx(18.0)


def test_sma_empty_input(spark):
    df = W.with_sma(_bars_df(spark, []), 5, out="sma_5")
    assert df.count() == 0  # empty in, empty out, no crash


def test_warmup_gate_30_rows_emit_5(spark):
    """The reference's 30-msgs -> 5-inserts scenario
    (tests/test_consumer.py:136-138): gate at 26 rows of history."""
    closes = [150.0 + i for i in range(30)]
    df = W.with_sma(_bars_df(spark, closes), 20)
    gated = W.with_warmup_gate(df, 26, "sma_20")
    assert gated.count() == 5


def test_ema_recurrence_golden():
    """EMA(3) over [1..5]: seed=mean(1,2,3)=2, then 0.5-blend."""
    out = R.ema_rec(np.array([1.0, 2.0, 3.0, 4.0, 5.0]), 3)
    assert np.isnan(out[:2]).all()
    assert out[2] == pytest.approx(2.0)
    assert out[3] == pytest.approx(0.5 * 4 + 0.5 * 2.0)
    assert out[4] == pytest.approx(0.5 * 5 + 0.5 * 3.0)


def test_rsi_all_gains_is_100():
    out = R.rsi_rec(np.arange(1.0, 20.0), 14)
    assert out[14] == pytest.approx(100.0)


def test_atr_constant_range():
    """Constant high-low spread, monotone close -> TR settles at spread."""
    c = np.arange(10.0, 40.0)
    out = R.atr_rec(c + 1.0, c - 1.0, c, 14)
    assert np.isnan(out[:13]).all()
    # TR_0 = 2, TR_i = max(2, |h-pc|=2, |l-pc|=0)=2 for slope 1
    assert out[13] == pytest.approx(2.0)
    assert out[-1] == pytest.approx(2.0)


def test_ema_hof_matches_apply_in_pandas(spark):
    b = _bars_df(spark, GOLDEN + [21.0, 19.5, 18.25])
    nan = float("nan")
    via_pandas = {
        (r.symbol, r.event_id): nan if r.ema_10 is None else r.ema_10
        for r in R.with_ema(b, (10,)).select("symbol", "event_id", "ema_10").collect()
    }
    via_hof = {
        (r.symbol, r.event_id): nan if r.ema_hof is None else r.ema_hof
        for r in R.ema_via_sql_hof(b, 10).collect()
    }
    assert set(via_pandas) == set(via_hof)
    keys = sorted(via_pandas)
    assert np.allclose(
        [via_pandas[k] for k in keys], [via_hof[k] for k in keys], atol=1e-9, equal_nan=True
    )


def test_indicator_table_schema_and_nulls(spark, sf_dir):
    from trading_etl_python_spark.sources.tables import bars

    df = indicator_table(bars(spark, sf_dir), warmup=26)
    assert df.columns == [
        "time", "symbol", "open", "high", "low", "close", "volume",
        "sma_20", "ema_10", "ema_20", "macd_line", "adx_14", "rsi_14",
        "stoch_k_14", "mfi_14", "bb_upper", "bb_lower", "atr_14", "obv", "vwap",
    ]
    rows = df.collect()
    assert len(rows) > 0
    # warmup gate: every emitted row has sma_20 (the reference's condition)
    assert all(r.sma_20 is not None for r in rows)
    # NaN must never leak from the pandas path (NULL is the contract)
    import math

    for r in rows[:50]:
        for c in ("ema_10", "macd_line", "adx_14", "rsi_14"):
            v = r[c]
            assert v is None or not math.isnan(v)


def test_wma_golden(spark):
    """WMA-3 of [1,2,3] = (1*1 + 2*2 + 3*3)/6 = 14/6; NULL before 3 rows."""
    from trading_etl_python_spark.operators.windows import with_wma

    df = spark.createDataFrame(
        [(1, "2024-01-01", 1, 1.0), (1, "2024-01-02", 2, 2.0), (1, "2024-01-03", 3, 3.0)],
        "symbol long, time string, event_id long, close double",
    ).selectExpr("symbol", "CAST(time AS TIMESTAMP) AS time", "event_id", "close")
    got = {r.event_id: r.wma_3 for r in with_wma(df, 3).collect()}
    assert got[1] is None and got[2] is None
    assert got[3] == round(14.0 / 6.0, 4)


def _flat_bars(spark, closes, symbol=1):
    """Bars where high=low=close (degenerate range) for hand-math."""
    import datetime as dt

    rows = [
        (symbol, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i), i, c, c, c)
        for i, c in enumerate(closes)
    ]
    return spark.createDataFrame(
        rows, "symbol long, time timestamp, event_id long, high double, low double, close double"
    )


def test_roc_hand_values(spark):
    from trading_etl_python_spark.operators.windows import with_roc

    df = _flat_bars(spark, [float(i) for i in range(1, 13)])
    out = sorted(with_roc(df, 10).collect(), key=lambda r: r.event_id)
    assert out[9].roc_10 is None  # only 10 rows so far: lag(10) null
    assert out[10].roc_10 == 1000.0  # 100*(11-1)/1
    assert out[11].roc_10 == 500.0  # 100*(12-2)/2


def test_donchian_hand_values(spark):
    from trading_etl_python_spark.operators.windows import with_donchian

    df = _flat_bars(spark, [5.0, 9.0, 1.0, 4.0])
    out = sorted(with_donchian(df, 3).collect(), key=lambda r: r.event_id)
    assert out[1].dc_upper is None  # warmup
    assert (out[2].dc_upper, out[2].dc_lower, out[2].dc_mid) == (9.0, 1.0, 5.0)
    assert (out[3].dc_upper, out[3].dc_lower, out[3].dc_mid) == (9.0, 1.0, 5.0)


def test_cci_hand_values(spark):
    from trading_etl_python_spark.operators.windows import with_cci

    # tp == close; window [1,2,3]: mean 2, mean_dev 2/3, cci = 1/(0.015*2/3)
    df = _flat_bars(spark, [1.0, 2.0, 3.0])
    out = sorted(with_cci(df, 3).collect(), key=lambda r: r.event_id)
    assert out[0].cci_3 is None and out[1].cci_3 is None
    assert out[2].cci_3 == 100.0


def test_cci_constant_window_is_null(spark):
    from trading_etl_python_spark.operators.windows import with_cci

    df = _flat_bars(spark, [2.0, 2.0, 2.0])
    out = sorted(with_cci(df, 3).collect(), key=lambda r: r.event_id)
    assert out[2].cci_3 is None  # zero mean-deviation -> NULL, not inf
