"""Portfolio/risk analytics over the indicator engine's bar streams —
log returns, rolling volatility, drawdown, cross-symbol correlation.

These extend the reference's per-symbol indicator suite (SURVEY.md §2.1
W1-W11, `trading-etl-python/src/db/backfill.py:12-64`) with the
cross-sectional statistics a trading analytics stack needs next; all are
window/aggregate-native (no UDFs, whole-stage codegen end-to-end).

Scale notes (100 TB posture):

- returns / volatility / drawdown are per-key window expressions: one
  hash(symbol) exchange, frame state O(lookback), same scale envelope as
  the indicator table (PLANS.md §1).
- correlation matrices are inherently quadratic in the number of series,
  so `basket_correlation` correlates a *chosen basket* (deterministic
  key predicate), aligned on calendar day. The daily-aggregated basket
  series is tiny (|basket| x |days|) regardless of tick volume — the
  heavy lineage is the day-level pre-aggregation, which is one
  hash(symbol, day) exchange over the full stream; the pair join runs on
  the reduced table and Catalyst broadcasts it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import windows as W


def with_log_return(df: DataFrame, col: str = "close", out: str = "log_ret") -> DataFrame:
    """ln(close_t / close_{t-1}) per symbol; NULL on each symbol's first
    row and wherever either close is non-positive (a zero tick would be a
    DIVIDE_BY_ZERO under ANSI mode and -inf math otherwise — the guard is
    mirrored verbatim in the oracles)."""
    w = W.by_key()
    prev = F.lag(col, 1).over(w)
    ret = F.when(
        (prev > 0) & (F.col(col) > 0), F.round(F.log(F.col(col) / prev), 6)
    )
    return df.withColumn(out, ret)


def with_rolling_vol(df: DataFrame, n: int = 20, ret_col: str = "log_ret") -> DataFrame:
    """Rolling sample stddev of log returns over the last ``n`` returns;
    NULL until ``n`` non-NULL returns exist (min_periods semantics,
    mirroring the reference's SMA warmup discipline)."""
    w = W.by_key().rowsBetween(-(n - 1), Window.currentRow)
    vol = F.when(
        F.count(ret_col).over(w) >= n, F.round(F.stddev_samp(ret_col).over(w), 6)
    )
    return df.withColumn(f"vol_{n}", vol)


def with_drawdown(df: DataFrame, col: str = "close") -> DataFrame:
    """Running peak and drawdown-from-peak (<= 0) per symbol."""
    w = W.by_key().rowsBetween(Window.unboundedPreceding, Window.currentRow)
    peak = F.max(col).over(w)
    return df.withColumn("peak", F.round(peak, 4)).withColumn(
        "drawdown", F.round(F.col(col) / F.nullif(peak, F.lit(0.0)) - 1.0, 6)
    )


def max_drawdown(df: DataFrame, col: str = "close") -> DataFrame:
    """Per-symbol maximum drawdown (most negative peak-to-trough)."""
    dd = with_drawdown(df, col)
    return dd.groupBy("symbol").agg(
        F.min("drawdown").alias("max_drawdown"),
        F.round(F.max("peak"), 4).alias("peak_close"),
        F.count(F.lit(1)).alias("n_bars"),
    )


def daily_close(df: DataFrame, col: str = "close") -> DataFrame:
    """Mean close per (symbol, calendar day) — the alignment grid for
    cross-symbol statistics. One hash(symbol, day) exchange."""
    return df.groupBy("symbol", F.to_date("time").alias("day")).agg(
        F.avg(col).alias("close_d")
    )


def basket_correlation(
    df: DataFrame, basket_max_symbol: int = 50, min_days: int = 15
) -> DataFrame:
    """Pearson correlation of day-aligned close series for every pair in
    a deterministic basket (symbol < ``basket_max_symbol``). Pairs with
    fewer than ``min_days`` shared days are dropped (corr over a handful
    of points is noise)."""
    d = daily_close(df.filter(F.col("symbol") < basket_max_symbol))
    a, b = d.alias("a"), d.alias("b")
    return (
        a.join(b, (F.col("a.day") == F.col("b.day")) & (F.col("a.symbol") < F.col("b.symbol")))
        .groupBy(
            F.col("a.symbol").alias("symbol_a"),
            F.col("b.symbol").alias("symbol_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.round(F.corr("a.close_d", "b.close_d"), 4).alias("corr_close"),
        )
        .filter(F.col("n_days") >= min_days)
    )


def basket_beta(
    df: DataFrame, basket_max_symbol: int = 50, min_days: int = 15
) -> DataFrame:
    """CAPM beta of each basket symbol against the equal-weight basket
    "market": beta_i = covar_samp(r_i, r_m) / var_samp(r_m) over
    day-aligned daily log returns.

    Same scale shape as ``basket_correlation``: all heavy lineage is the
    one hash(symbol, day) pre-aggregation; returns, the per-day market
    average, and the final per-symbol moments all run on the tiny
    |basket| x |days| grid."""
    d = daily_close(df.filter(F.col("symbol") < basket_max_symbol))
    wd = Window.partitionBy("symbol").orderBy("day")
    prev_d = F.lag("close_d", 1).over(wd)
    r = d.withColumn(
        "r",
        F.when(
            (prev_d > 0) & (F.col("close_d") > 0),
            F.round(F.log(F.col("close_d") / prev_d), 6),
        ),
    ).filter(F.col("r").isNotNull())
    mkt = r.groupBy("day").agg(F.round(F.avg("r"), 6).alias("r_mkt"))
    return (
        r.join(mkt, "day")
        .groupBy("symbol")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.round(
                F.covar_samp("r", "r_mkt") / F.nullif(F.var_samp("r_mkt"), F.lit(0.0)), 4
            ).alias("beta"),
        )
        .filter(F.col("n_days") >= min_days)
    )


def twap(df: DataFrame, col: str = "close") -> DataFrame:
    """Time-weighted average price per (symbol, day): each tick is weighted
    by its holding time — microseconds until the next tick of the same day
    (the last tick carries no weight, TimescaleDB ``time_weight('LOCF')``
    within-bucket semantics).  One window (lead) + one hash aggregate,
    both on the symbol distribution; weights stay integral (micros) so
    only the final division needs rounding."""
    day = F.date_trunc("day", "time").alias("day")
    w = Window.partitionBy("symbol", F.to_date("time")).orderBy("time", "event_id")
    nxt = F.lead(F.col("time").cast("timestamp")).over(w)
    dt_us = F.unix_micros(nxt) - F.unix_micros(F.col("time").cast("timestamp"))
    wsum = df.select("symbol", day, F.col(col).alias("px"), dt_us.alias("dt_us"))
    return wsum.groupBy("symbol", "day").agg(
        F.round(
            F.sum(F.col("px") * F.col("dt_us")) / F.nullif(F.sum("dt_us"), F.lit(0)),
            6,
        ).alias("twap"),
        F.count(F.lit(1)).alias("n_ticks"),
    )


def winsorize(
    df: DataFrame, col: str = "close", lo: float = 0.05, hi: float = 0.95
) -> DataFrame:
    """Per-symbol winsorization: clip ``col`` to its own [p_lo, p_hi]
    interpolated percentiles (outlier taming before risk stats).  The
    percentiles are unbounded-frame window aggregates — one hash exchange
    on symbol, no sort (no ORDER BY in the spec), values computed once
    per partition and broadcast to every row by the window operator."""
    w = Window.partitionBy("symbol")
    plo = F.expr(f"percentile({col}, {lo})").over(w)
    phi = F.expr(f"percentile({col}, {hi})").over(w)
    return (
        df.withColumn("p_lo", F.round(plo, 4))
        .withColumn("p_hi", F.round(phi, 4))
        .withColumn(
            f"{col}_wins",
            F.round(F.least(F.greatest(F.col(col), plo), phi), 4),
        )
    )


def rolling_market_corr(
    df: DataFrame, basket_max_symbol: int = 50, n: int = 10
) -> DataFrame:
    """Rolling n-day Pearson correlation of each basket symbol's daily
    log return against the equal-weight basket return.  All heavy lineage
    is the one hash(symbol, day) pre-aggregation; the windowed corr runs
    on the tiny |basket| x |days| grid (same posture as basket_beta)."""
    d = daily_close(df.filter(F.col("symbol") < basket_max_symbol))
    wd = Window.partitionBy("symbol").orderBy("day")
    prev_d = F.lag("close_d", 1).over(wd)
    r = d.withColumn(
        "r",
        F.when(
            (prev_d > 0) & (F.col("close_d") > 0),
            F.round(F.log(F.col("close_d") / prev_d), 6),
        ),
    ).filter(F.col("r").isNotNull())
    mkt = r.groupBy("day").agg(F.round(F.avg("r"), 6).alias("r_mkt"))
    j = r.join(mkt, "day").select("symbol", "day", "r", "r_mkt")
    w = Window.partitionBy("symbol").orderBy("day").rowsBetween(-(n - 1), 0)
    corr = F.when(F.count(F.lit(1)).over(w) >= n, F.round(F.corr("r", "r_mkt").over(w), 4))
    return j.select(
        "symbol", F.col("day").cast("timestamp").alias("day"), corr.alias(f"corr_{n}")
    )


def mad_outliers(df: DataFrame, col: str = "close", k: float = 3.0) -> DataFrame:
    """Robust outlier detection per symbol: flag ticks whose deviation
    from the symbol's median exceeds ``k`` x MAD (median absolute
    deviation).  Two stacked unbounded-frame window aggregates over the
    SAME hash(symbol) distribution — the median pass and the MAD pass
    share one exchange; no joins.  The deviation ratio is rounded before
    the threshold compare so the flag is engine-portable."""
    w = Window.partitionBy("symbol")
    med = F.expr(f"percentile({col}, 0.5)").over(w)
    step = df.withColumn("_med", med)
    mad = F.expr("percentile(abs(close - _med), 0.5)").over(w)
    step = step.withColumn("_mad", mad)
    ratio = F.round(
        F.abs(F.col(col) - F.col("_med")) / F.nullif(F.col("_mad"), F.lit(0.0)), 6
    )
    return (
        step.withColumn("dev_ratio", ratio)
        .filter(F.col("dev_ratio") > k)
        .select(
            "symbol", "time", "event_id", col,
            F.round("_med", 4).alias("med"),
            F.round("_mad", 4).alias("mad"),
            "dev_ratio",
        )
    )


def basket_spearman(
    df: DataFrame, basket_max_symbol: int = 50, min_days: int = 15
) -> DataFrame:
    """Spearman rank correlation for every basket pair — the robust
    companion to ``basket_correlation``: Pearson over AVERAGE ranks of
    the day-aligned closes (rank + (ties-1)/2, the standard fractional
    rank, expressed identically on both engines), insensitive to
    monotone transformations and far less outlier-driven than raw-price
    Pearson.

    Ranks are computed WITHIN each pair's shared-day sample (the
    classical paired definition — ranking each full series first gives
    a different statistic whenever two symbols' day coverage differs),
    so the rank windows partition by (symbol_a, symbol_b) and ride the
    hash(pair) distribution the corr aggregation needs anyway.

    Scale shape: the windows and aggregation all run on the
    |basket|² x |days| pair table built from the same |basket| x |days|
    pre-aggregate as ``basket_correlation`` — the basket bound keeps
    the square small; corr itself is one map-side-combinable agg.

    Parity note: the rank input is ROUNDED to 6dp (the module parity
    rule, suite/analytics.py:5-7). RANK over a raw float aggregate is
    order-fragile — a 1-ulp difference in AVG accumulation order can
    tie/untie two closes, shift the fractional ranks, and flip the
    4dp-rounded CORR (the r5 driver flake). Rounding before ranking
    makes the tie structure engine- and partition-order-invariant."""
    from pyspark.sql import Window

    d = daily_close(df.filter(F.col("symbol") < basket_max_symbol))
    a, b = d.alias("a"), d.alias("b")
    pairs = a.join(
        b,
        (F.col("a.day") == F.col("b.day"))
        & (F.col("a.symbol") < F.col("b.symbol")),
    ).select(
        F.col("a.symbol").alias("symbol_a"),
        F.col("b.symbol").alias("symbol_b"),
        F.round(F.col("a.close_d"), 6).alias("ca"),
        F.round(F.col("b.close_d"), 6).alias("cb"),
    )
    pw = ["symbol_a", "symbol_b"]
    ra = F.rank().over(Window.partitionBy(*pw).orderBy("ca")) + (
        F.count(F.lit(1)).over(Window.partitionBy(*pw, "ca")) - 1
    ) / 2.0
    rb = F.rank().over(Window.partitionBy(*pw).orderBy("cb")) + (
        F.count(F.lit(1)).over(Window.partitionBy(*pw, "cb")) - 1
    ) / 2.0
    return (
        pairs.withColumn("_ra", ra)
        .withColumn("_rb", rb)
        .groupBy("symbol_a", "symbol_b")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.round(F.corr("_ra", "_rb"), 4).alias("spearman"),
        )
        .filter(F.col("n_days") >= min_days)
    )


def symbol_sharpe(df: DataFrame, min_days: int = 15, periods: int = 252) -> DataFrame:
    """Annualized Sharpe ratio per symbol over day-aligned daily log
    returns: mean(r) / stddev_samp(r) * sqrt(periods) (risk-free rate
    0 — the standard screening form), plus the annualized volatility.
    Symbols with fewer than ``min_days`` returns are dropped (moments
    over a handful of days are noise, same rule as the basket stats).

    Scale shape: identical to ``basket_beta`` minus the market join —
    the one hash(symbol, day) pre-aggregation is the only heavy
    lineage; returns and the per-symbol moments run on the tiny
    |symbols| x |days| grid."""
    d = daily_close(df)
    wd = Window.partitionBy("symbol").orderBy("day")
    prev_d = F.lag("close_d", 1).over(wd)
    r = d.withColumn(
        "r",
        F.when(
            (prev_d > 0) & (F.col("close_d") > 0),
            F.round(F.log(F.col("close_d") / prev_d), 6),
        ),
    ).filter(F.col("r").isNotNull())
    ann = float(periods) ** 0.5
    return (
        r.groupBy("symbol")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.round(
                F.avg("r") / F.nullif(F.stddev_samp("r"), F.lit(0.0)) * ann, 4
            ).alias("sharpe"),
            F.round(F.stddev_samp("r") * ann, 6).alias("ann_vol"),
        )
        .filter(F.col("n_days") >= min_days)
    )
