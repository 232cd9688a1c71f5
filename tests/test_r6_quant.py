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


def test_kalman_converges_to_constant():
    from trading_etl_python_spark.operators.recursive import kalman_rec

    z = np.full(200, 42.0)
    xs, ks = kalman_rec(z, 0.01, 1.0)
    assert xs[0] == 42.0 and np.isnan(ks[0])
    assert abs(xs[-1] - 42.0) < 1e-9
    # gain settles to the steady-state Riccati value k* where
    # k = (p+q)/(p+q+r) and p = (1-k)(p+q)
    kss = ks[-1]
    pss = (1.0 - kss) * (kss / (1.0 - kss))  # p+q = k/(1-k) * r with r=1
    assert abs(ks[-1] - ks[-2]) < 1e-9 and 0 < kss < 1 and pss > 0


def test_kalman_tracks_step_change():
    from trading_etl_python_spark.operators.recursive import kalman_rec

    z = np.concatenate([np.zeros(50), np.full(50, 10.0)])
    xs, _ = kalman_rec(z, 0.01, 1.0)
    assert xs[49] < 0.5 and xs[-1] > 9.0  # smooths, then converges


def test_ols_trend_exact_line(spark):
    rows = [(1, f"2024-01-{d+1:02d} 10:00:00", d, 5.0 + 2.0 * d, 5.0 + 2.0 * d,
             5.0 + 2.0 * d, 1) for d in range(20)]
    out = AN.ols_trend(_bars(spark, rows), min_days=10).collect()
    assert len(out) == 1
    r = out[0]
    # y = 3 + 2x on the day index (x starts at 1 -> intercept 5-2=3)
    assert r.slope == 2.0 and r.intercept == 3.0 and r.r2 == 1.0


def test_dow_seasonality_buckets(spark):
    # Mondays up 1%, Tuesdays down: two weeks of alternating moves
    rows = []
    closes = {"2024-01-01": 100.0, "2024-01-02": 99.0, "2024-01-08": 100.0,
              "2024-01-09": 99.0, "2024-01-15": 100.0}
    prev = None
    for i, (d, c) in enumerate(sorted(closes.items())):
        rows.append((1, f"{d} 10:00:00", i, c, c, c, 1))
    out = {r.dow: r for r in AN.dow_seasonality(_bars(spark, rows)).collect()}
    # returns exist for every day after the first: Tue (2) and Mon (1)
    assert out[2].mean_ret < 0 < out[1].mean_ret
    assert out[1].n_obs == 2 and out[2].n_obs == 2


def test_leadlag_detects_shifted_series(spark):
    # symbol 2 repeats symbol 1's daily move one day later -> best_lag=1
    import math
    moves = [1.0, -1.0, 2.0, -2.0, 1.5, -0.5, 1.0, -1.0, 0.5, 1.0,
             -1.5, 1.0, -1.0, 2.0, -1.0, 1.0, -0.5, 0.5, 1.0, -1.0]
    c1, c2 = [100.0], [100.0]
    for i, m in enumerate(moves):
        c1.append(c1[-1] + m)
        c2.append(c2[-1] + (moves[i - 1] if i >= 1 else 0.0))
    rows = []
    for d in range(len(c1)):
        rows.append((1, f"2024-01-{d+1:02d} 10:00:00", 2 * d, c1[d], c1[d], c1[d], 1))
        rows.append((2, f"2024-01-{d+1:02d} 10:00:00", 2 * d + 1, c2[d], c2[d], c2[d], 1))
    out = AN.leadlag_best(_bars(spark, rows), basket_max_symbol=10, max_lag=2,
                          min_days=10).collect()
    assert len(out) == 1
    assert out[0].best_lag == 1 and out[0].best_corr > 0.9


def test_portfolio_nav_single_symbol_compounds(spark):
    import math
    closes = [100.0, 110.0, 99.0, 105.0, 115.0, 108.0, 111.0, 120.0,
              118.0, 125.0, 123.0, 130.0, 128.0, 135.0, 140.0]
    rows = [(1, f"2024-01-{d+1:02d} 10:00:00", d, c, c, c, 1)
            for d, c in enumerate(closes)]
    out = AN.portfolio_nav(_bars(spark, rows), basket_max_symbol=10)\
        .orderBy("day").collect()
    # one symbol -> weight 1.0 (wq = 1e6); portfolio return == symbol return
    r0 = round(math.log(closes[1] / closes[0]), 6)
    assert abs(out[0].port_ret - r0) < 1e-6
    # NAV compounds: final ~ prod(1+r_d) of the 6dp returns
    nav_expect = 1.0
    for i in range(1, len(closes)):
        nav_expect *= 1.0 + round(math.log(closes[i] / closes[i - 1]), 6)
    assert abs(out[-1].nav - nav_expect) < 1e-2
    assert out[0].n_symbols == 1


def test_portfolio_nav_inverse_vol_tilts_weights(spark):
    # symbol 1 low vol, symbol 2 high vol: portfolio return should sit
    # closer to symbol 1's return on a day where they diverge
    rows = []
    c1, c2 = 100.0, 100.0
    for d in range(16):
        m1 = 0.5 if d % 2 == 0 else -0.4
        m2 = 5.0 if d % 2 == 0 else -4.5
        c1 += m1
        c2 += m2
        rows.append((1, f"2024-01-{d+1:02d} 10:00:00", 2 * d, c1, c1, c1, 1))
        rows.append((2, f"2024-01-{d+1:02d} 10:00:00", 2 * d + 1, c2, c2, c2, 1))
    out = AN.portfolio_nav(_bars(spark, rows), basket_max_symbol=10)\
        .orderBy("day").collect()
    # on up-days both rise; the blended return must be far below the
    # midpoint of the two symbol returns (tilted to the low-vol leg)
    up = [r for r in out if r.port_ret and r.port_ret > 0][0]
    assert up.n_symbols == 2
    assert up.port_ret < 0.02  # high-vol leg alone is ~0.05


def test_garch_reduces_to_ewma_at_boundary(spark):
    # omega=0 and alpha+beta=1 with the shock shifted one step is the
    # defining difference from EWMA; sanity: constant returns give
    # constant variance equal to r^2 under both
    import math
    closes = [100.0 * math.exp(0.01 * d) for d in range(10)]
    rows = [(1, f"2024-01-{d+1:02d} 10:00:00", d, c, c, c, 1)
            for d, c in enumerate(closes)]
    out = AN.garch_volatility(_bars(spark, rows), omega=0.0, alpha=0.1, beta=0.9)\
        .orderBy("day").collect()
    # r = 0.01 every day -> v stays 0.0001, vol stays 0.01
    for r in out:
        assert abs(r.garch_vol - 0.01) < 1e-6


def test_candle_patterns_flags(spark):
    from trading_etl_python_spark.operators.windows import with_candle_patterns

    rows = [
        # (symbol,time,eid,open,high,low,close)
        (1, "2024-01-01", 1, 10.0, 10.05, 9.95, 10.0),    # doji (body 0)
        (1, "2024-01-02", 2, 10.0, 10.01, 9.0, 9.97),     # hammer: body .03, lwick .97, uwick .01
        (1, "2024-01-03", 3, 10.0, 10.2, 9.9, 9.95),      # bearish bar
        (1, "2024-01-04", 4, 9.9, 10.6, 9.8, 10.5),       # bull engulfing of prev
    ]
    df = spark.createDataFrame(
        [(s, t, e, float(o), float(h), float(lo), float(c), 1)
         for s, t, e, o, h, lo, c in rows],
        "symbol long, time string, event_id long, open double, high double,"
        " low double, close double, volume long",
    ).withColumn("time", F.col("time").cast("timestamp"))
    out = {r.event_id: r for r in with_candle_patterns(df).collect()}
    assert out[1].is_doji and not out[3].is_doji
    assert out[2].is_hammer and not out[1].is_hammer  # doji needs body>0 to hammer
    assert out[4].bull_engulf and not out[4].bear_engulf
    assert not out[3].bull_engulf


def test_fractals_strict_center_extreme(spark):
    from trading_etl_python_spark.operators.windows import with_fractals

    highs = [1.0, 2.0, 5.0, 2.0, 1.0, 2.0, 5.0, 5.0, 2.0, 1.0]
    rows = [(1, f"2024-01-{d+1:02d} 10:00:00", d, h, 0.0, 1.0, 1)
            for d, h in enumerate(highs)]
    out = {r.event_id: r for r in with_fractals(_bars(spark, rows), 2).collect()}
    assert out[2].swing_high            # strict local max, full window
    assert not out[6].swing_high        # tied with index 7 -> not strict
    assert not out[0].swing_high        # incomplete neighborhood


def test_monthly_growth_pct(spark):
    from trading_etl_python_spark.operators.relational import monthly_growth

    rows = [(i, 1, "O", 100.0, f"2024-{m:02d}-15 00:00:00", "P")
            for i, m in enumerate([1, 1, 2, 3])]  # rev: 200, 100, 100
    orders = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    out = {str(r.month)[:7]: r for r in monthly_growth(orders).collect()}
    assert out["2024-01"].revenue == 200.0 and out["2024-01"].mom_pct is None
    assert out["2024-02"].mom_pct == -0.5   # 200 -> 100
    assert out["2024-03"].mom_pct == 0.0
    assert out["2024-03"].yoy_pct is None   # no 12-back month


def test_benford_digit_extraction(spark):
    from trading_etl_python_spark.operators.relational import benford_audit

    vals = [1.23, 19.99, 100.0, 2.5, 0.05, 900.0]  # digits 1,1,1,2,5,9
    df = spark.createDataFrame([(v,) for v in vals], "l_extendedprice double")
    out = {r.digit: r for r in benford_audit(df).collect()}
    assert out[1].n == 3 and out[2].n == 1 and out[5].n == 1 and out[9].n == 1
    assert abs(out[1].benford - 0.30103) < 1e-5
    assert abs(sum(r.share for r in out.values()) - 1.0) < 1e-5


def test_knn_classify_majority_vote(spark):
    from trading_etl_python_spark.operators.similarity import knn_classify

    # query 0 at e1; 3 label-7 vectors hug e1, 2 label-3 vectors are far
    rows = [(0, [1.0, 0.0], 0)]
    rows += [(i, [0.999, 0.0447], 7) for i in (10, 11, 12)]
    rows += [(i, [0.0, 1.0], 3) for i in (20, 21)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = knn_classify(emb, n_queries=1, k=3).collect()
    assert len(out) == 1
    assert out[0].pred_label == 7 and out[0].n_votes == 3


def test_backtest_ma_cross_uptrend_wins(spark):
    # steady uptrend: fast SMA stays above slow -> long throughout the
    # traded window -> every traded day wins, positive total return
    import math
    closes = [100.0 * math.exp(0.01 * d) for d in range(25)]
    rows = [(1, f"2024-01-{d+1:02d} 10:00:00", d, c, c, c, 1)
            for d, c in enumerate(closes)]
    out = AN.backtest_ma_cross(_bars(spark, rows), 3, 10, min_days=3).collect()
    assert len(out) == 1
    r = out[0]
    assert r.hit_rate == 1.0 and r.total_ret > 0
    # every strategy return is exactly 0.01 -> zero variance -> NULL sharpe
    assert r.sharpe_ann is None


def test_backtest_ma_no_lookahead(spark):
    # signal flips on the crash day; the POSITION only flips the day
    # after (execution lag), so the crash itself is taken long
    import math
    closes = [100.0 + d for d in range(15)] + [50.0, 49.0, 48.0, 47.0, 46.0]
    rows = [(1, f"2024-01-{d+1:02d} 10:00:00", d, c, c, c, 1)
            for d, c in enumerate(closes)]
    out = AN.backtest_ma_cross(_bars(spark, rows), 3, 10, min_days=3).collect()
    r = out[0]
    # the crash day's big negative return hits while still long
    assert r.total_ret < 0 or r.hit_rate < 1.0
