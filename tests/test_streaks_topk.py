"""Streak/regime batch (operators/analytics.py: streak_stats,
month_effect, topk_return_days, relative_strength)."""

from __future__ import annotations

from pyspark.sql import functions as F

from trading_etl_python_spark.operators import analytics as AN


def _bars(spark, closes_by_symbol):
    rows = []
    for sym, closes in closes_by_symbol.items():
        for i, c in enumerate(closes):
            rows.append((sym, f"2024-{1 + i // 28:02d}-{i % 28 + 1:02d} 12:00:00", float(c)))
    return (
        spark.createDataFrame(rows, ["symbol", "time", "close"])
        .withColumn("time", F.to_timestamp("time"))
        .withColumn("symbol", F.col("symbol").cast("int"))
    )


def test_streaks_counts(spark):
    # returns: + + + - - + (3-up, 2-down, 1-up open)
    closes = [100, 101, 102, 103, 102, 101, 102]
    out = AN.streak_stats(_bars(spark, {1: closes})).collect()[0]
    assert out.max_up_streak == 3
    assert out.max_down_streak == 2
    assert out.n_streaks == 3
    assert out.current_streak == 1


def test_month_effect_buckets(spark):
    closes = [100.0 * 1.001**i for i in range(28)]
    rows = {r.phase: r for r in AN.month_effect(_bars(spark, {1: closes})).collect()}
    assert set(rows) == {"early", "mid", "late"}
    # all returns positive -> pos_share 1.0 everywhere
    assert all(r.pos_share == 1.0 for r in rows.values())
    # early bucket: days 2..10 -> 9 returns
    assert rows["early"].n_days == 9


def test_topk_days_rank_order(spark):
    closes = [100, 130, 100, 120, 100, 110, 100]
    out = AN.topk_return_days(_bars(spark, {1: closes}), k=3).collect()
    best = sorted((r for r in out if r.side == "best"), key=lambda r: r.rk)
    worst = sorted((r for r in out if r.side == "worst"), key=lambda r: r.rk)
    assert len(best) == 3 and len(worst) == 3
    assert best[0].r > best[1].r > best[2].r > 0
    assert worst[0].r < worst[1].r < 0


def test_relative_strength_symmetry(spark):
    # two symbols mirror around the market: rel strengths are opposite
    up = [100.0 * 1.02**i for i in range(10)]
    dn = [100.0 * 0.98**i for i in range(10)]
    rows = AN.relative_strength(_bars(spark, {1: up, 2: dn})).collect()
    by = {}
    for r in rows:
        by.setdefault(r.symbol, []).append(r)
    last1 = max(by[1], key=lambda r: r.day).rel_strength
    last2 = max(by[2], key=lambda r: r.day).rel_strength
    assert last1 > 0 > last2
    assert abs(last1 + last2) < 1e-4  # symmetric around the mean
