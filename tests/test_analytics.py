from __future__ import annotations

import pytest

import math

from pyspark.sql import functions as F

from trading_etl_python_spark.operators import analytics as AN
from trading_etl_python_spark.operators import relational as REL
from trading_etl_python_spark.sources.tables import load_table


def _bars(spark, rows):
    """rows: (symbol, time_str, event_id, close)"""
    return spark.createDataFrame(
        [(s, t, e, float(c)) for s, t, e, c in rows],
        "symbol long, time string, event_id long, close double",
    ).withColumn("time", F.col("time").cast("timestamp"))


def test_log_return_golden(spark):
    df = _bars(
        spark,
        [(1, "2024-01-01", 1, 100.0), (1, "2024-01-02", 2, 110.0), (1, "2024-01-03", 3, 99.0)],
    )
    out = {r.event_id: r.log_ret for r in AN.with_log_return(df).collect()}
    assert out[1] is None  # no prior close
    assert out[2] == round(math.log(110.0 / 100.0), 6)
    assert out[3] == round(math.log(99.0 / 110.0), 6)


def test_rolling_vol_warmup_null_until_n_returns(spark):
    # 21 bars -> 20 returns; vol_3 needs 3 returns => NULL for rows 1-3
    rows = [(1, f"2024-01-{d:02d}", d, 100 + d) for d in range(1, 8)]
    df = AN.with_rolling_vol(AN.with_log_return(_bars(spark, rows)), n=3)
    got = {r.event_id: r.vol_3 for r in df.collect()}
    assert got[1] is None and got[2] is None and got[3] is None
    assert got[4] is not None and got[4] >= 0.0


def test_max_drawdown_golden(spark):
    # peak 120, trough after peak 90 -> max drawdown = 90/120 - 1 = -0.25
    rows = [(1, f"2024-01-0{i}", i, c) for i, c in enumerate([100, 120, 90, 110], start=1)]
    out = AN.max_drawdown(_bars(spark, rows)).collect()
    assert len(out) == 1
    assert out[0].max_drawdown == -0.25
    assert out[0].peak_close == 120.0
    assert out[0].n_bars == 4


def test_basket_correlation_perfect_and_inverse(spark):
    # symbol 2 = 2x symbol 1 (corr +1); symbol 3 = 500 - symbol 1 (corr -1)
    rows = []
    for d in range(1, 21):
        base = 100.0 + d * (1 if d % 2 else 2)  # non-linear so corr is non-degenerate
        rows += [
            (1, f"2024-01-{d:02d}", d * 10 + 1, base),
            (2, f"2024-01-{d:02d}", d * 10 + 2, 2 * base),
            (3, f"2024-01-{d:02d}", d * 10 + 3, 500.0 - base),
        ]
    out = AN.basket_correlation(_bars(spark, rows), basket_max_symbol=50, min_days=15)
    got = {(r.symbol_a, r.symbol_b): (r.corr_close, r.n_days) for r in out.collect()}
    assert got[(1, 2)] == (1.0, 20)
    assert got[(1, 3)] == (-1.0, 20)
    assert got[(2, 3)] == (-1.0, 20)


def test_basket_correlation_min_days_filter(spark):
    rows = [
        (1, f"2024-01-{d:02d}", d * 10 + 1, 100.0 + d) for d in range(1, 6)
    ] + [(2, f"2024-01-{d:02d}", d * 10 + 2, 200.0 + d) for d in range(1, 6)]
    out = AN.basket_correlation(_bars(spark, rows), basket_max_symbol=50, min_days=15)
    assert out.count() == 0  # only 5 shared days < 15


def test_pivot_row_counts_reconcile(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    wide = REL.pivot_orders_by_priority(orders)
    total = wide.select(
        (
            F.col("n_urgent") + F.col("n_high") + F.col("n_medium")
            + F.col("n_notspec") + F.col("n_low")
        ).alias("t")
    ).agg(F.sum("t")).first()[0]
    assert total == orders.count()
    # missing (year, priority) combos are 0, never NULL
    for c in ("n_urgent", "n_high", "n_medium", "n_notspec", "n_low"):
        assert wide.filter(F.col(c).isNull()).count() == 0


def test_basket_beta_proportional_returns(spark):
    """symbol 2's log returns are exactly 2x symbol 1's -> beta_2 = 2*beta_1,
    and equal-weight betas average to 1 (cov is linear in its first arg)."""
    import math

    rows = []
    for d in range(1, 25):
        x = 0.01 * (d % 5 - 2) * d  # non-monotonic, non-degenerate
        rows.append((1, f"2024-01-{d:02d}", d * 10 + 1, math.exp(x)))
        rows.append((2, f"2024-01-{d:02d}", d * 10 + 2, math.exp(2 * x)))
    df = _bars(spark, rows)
    got = {r.symbol: r.beta for r in AN.basket_beta(df, 50, min_days=15).collect()}
    assert abs(got[1] + got[2] - 2.0) < 1e-3        # betas average to 1
    assert abs(got[2] - 2.0 * got[1]) < 1e-3        # linearity
    assert got[2] > got[1]


def test_winsorize_clips_to_percentiles(spark):
    import datetime as dt

    from trading_etl_python_spark.operators.analytics import winsorize

    rows = [
        (1, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i), i, float(c))
        for i, c in enumerate([1, 2, 3, 4, 100])  # 100 is the outlier
    ]
    df = spark.createDataFrame(rows, "symbol long, time timestamp, event_id long, close double")
    out = {r.event_id: r for r in winsorize(df, lo=0.0, hi=0.75).collect()}
    # p75 (type-7 interpolated) of [1,2,3,4,100] = 4
    assert out[4].p_hi == 4.0
    assert out[4].close_wins == 4.0  # outlier clipped
    assert out[1].close_wins == 2.0  # interior values untouched


def test_spearman_matches_scipy_style_reference(spark, sf_dir):
    """Spearman == Pearson over fractional ranks — checked against a
    numpy recomputation for a handful of pairs, and invariance under a
    monotone transform of one side's closes (the property Pearson
    lacks)."""
    import numpy as np

    from trading_etl_python_spark.operators.analytics import (
        basket_spearman,
        daily_close,
    )
    from trading_etl_python_spark.sources.tables import bars

    b = bars(spark, sf_dir)
    out = {(r.symbol_a, r.symbol_b): r.spearman
           for r in basket_spearman(b, basket_max_symbol=6).collect()}
    assert out

    d = daily_close(b.filter(F.col("symbol") < 6)).collect()
    series: dict[int, dict] = {}
    for r in d:
        series.setdefault(r.symbol, {})[r.day] = r.close_d

    def frac_rank(xs):
        ranks = np.empty(len(xs))
        sx = sorted(xs)
        import bisect

        for i, x in enumerate(xs):
            lo = bisect.bisect_left(sx, x)
            hi = bisect.bisect_right(sx, x)
            ranks[i] = (lo + 1 + hi) / 2.0
        return ranks

    for (sa, sb), got in out.items():
        days = sorted(set(series[sa]) & set(series[sb]))
        xa = [series[sa][t] for t in days]
        xb = [series[sb][t] for t in days]
        ra, rb = frac_rank(xa), frac_rank(xb)
        want = float(np.corrcoef(ra, rb)[0, 1])
        assert got == pytest.approx(want, abs=2e-4), (sa, sb)
