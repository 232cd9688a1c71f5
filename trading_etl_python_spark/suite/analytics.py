"""Portfolio/risk analytics queries + DuckDB oracles — log returns,
rolling volatility, max drawdown, basket correlation
(operators/analytics.py; extends SURVEY.md §2.1 W1-W11 cross-sectionally).

Parity rules: returns rounded 6dp BEFORE any downstream aggregate (both
engines), vol 6dp, drawdown 6dp, corr 4dp; round/min/max commute
(monotone), so oracles use the simpler nesting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import analytics as AN
from ..sources.tables import bars
from .core import BARS_CTE, KW

QUERIES = {}
ORACLES = {}


def q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


RET = f"ROUND(LN(close / LAG(close) OVER ({KW})), 6)"


@q(
    "q_log_returns",
    f"""WITH {BARS_CTE}
    SELECT symbol, time, event_id, {RET} AS log_ret FROM bars""",
)
def q_log_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    return AN.with_log_return(bars(spark, sf_dir)).select(
        "symbol", "time", "event_id", "log_ret"
    )


@q(
    "q_rolling_vol",
    f"""WITH {BARS_CTE},
    r AS (SELECT symbol, time, event_id, {RET} AS log_ret FROM bars)
    SELECT symbol, time, event_id,
      CASE WHEN COUNT(log_ret) OVER w >= 20
           THEN ROUND(STDDEV_SAMP(log_ret) OVER w, 6) END AS vol_20
    FROM r
    WINDOW w AS ({KW} ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)""",
)
def q_rolling_vol(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = AN.with_rolling_vol(AN.with_log_return(bars(spark, sf_dir)), 20)
    return df.select("symbol", "time", "event_id", "vol_20")


@q(
    "q_drawdown",
    f"""WITH {BARS_CTE},
    d AS (SELECT symbol, close,
            MAX(close) OVER ({KW} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
          FROM bars)
    SELECT symbol,
      ROUND(MIN(close / peak - 1.0), 6) AS max_drawdown,
      ROUND(MAX(peak), 4) AS peak_close,
      COUNT(*) AS n_bars
    FROM d GROUP BY symbol""",
)
def q_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    return AN.max_drawdown(bars(spark, sf_dir))


@q(
    "q_symbol_corr",
    f"""WITH {BARS_CTE},
    d AS (SELECT symbol, CAST(time AS DATE) AS day, AVG(close) AS close_d
          FROM bars WHERE symbol < 50 GROUP BY symbol, CAST(time AS DATE))
    SELECT a.symbol AS symbol_a, b.symbol AS symbol_b,
           COUNT(*) AS n_days,
           ROUND(CORR(a.close_d, b.close_d), 4) AS corr_close
    FROM d a JOIN d b ON a.day = b.day AND a.symbol < b.symbol
    GROUP BY a.symbol, b.symbol
    HAVING COUNT(*) >= 15""",
)
def q_symbol_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    return AN.basket_correlation(bars(spark, sf_dir), basket_max_symbol=50, min_days=15)


@q(
    "q_candles",
    f"""WITH {BARS_CTE}
    SELECT symbol, CAST(CAST(time AS DATE) AS TIMESTAMP) AS bucket_start,
      arg_min(open, time) AS open_px,
      MAX(high) AS high_px,
      MIN(low) AS low_px,
      arg_max(close, time) AS close_px,
      CAST(SUM(volume) AS BIGINT) AS volume,
      COUNT(*) AS n_ticks
    FROM bars GROUP BY symbol, CAST(time AS DATE)""",
)
def q_candles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLCV candles from the tick stream (hypertable rollup)."""
    from ..operators.temporal import candles

    return candles(bars(spark, sf_dir), "1 day")


@q(
    "q_beta",
    f"""WITH {BARS_CTE},
    d AS (SELECT symbol, CAST(time AS DATE) AS day, AVG(close) AS close_d
          FROM bars WHERE symbol < 50 GROUP BY symbol, CAST(time AS DATE)),
    r AS (SELECT symbol, day,
            ROUND(LN(close_d / LAG(close_d) OVER (PARTITION BY symbol ORDER BY day)), 6) AS r
          FROM d QUALIFY r IS NOT NULL),
    mkt AS (SELECT day, ROUND(AVG(r), 6) AS r_mkt FROM r GROUP BY day)
    SELECT r.symbol, COUNT(*) AS n_days,
           ROUND(COVAR_SAMP(r.r, mkt.r_mkt) / NULLIF(VAR_SAMP(mkt.r_mkt), 0.0), 4) AS beta
    FROM r JOIN mkt USING (day)
    GROUP BY r.symbol
    HAVING COUNT(*) >= 15""",
)
def q_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAPM beta vs the equal-weight basket market (covar/var moments)."""
    return AN.basket_beta(bars(spark, sf_dir), basket_max_symbol=50, min_days=15)


@q(
    "q_wma",
    f"""WITH {BARS_CTE},
    l AS (SELECT symbol, time, event_id,
            list(close) OVER ({KW} ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS lst,
            COUNT(close) OVER ({KW} ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS cnt
          FROM bars)
    SELECT symbol, time, event_id,
      CASE WHEN cnt >= 10 THEN ROUND(
        list_reduce(
          list_prepend(CAST(0.0 AS DOUBLE),
            list_transform(range(1, 11), i -> lst[CAST(i AS INT)] * CAST(i AS DOUBLE))),
          (a, b) -> a + b) / 55.0, 4) END AS wma_10
    FROM l""",
)
def q_wma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linearly-weighted moving average via the bounded-list aggregate()
    HOF pattern (operators/windows.with_wma)."""
    from ..operators.windows import with_wma

    return with_wma(bars(spark, sf_dir), 10).select("symbol", "time", "event_id", "wma_10")


@q(
    "q_rolling_median",
    f"""WITH {BARS_CTE}
    SELECT symbol, time, event_id,
      ROUND(median(close) OVER ({KW} ROWS BETWEEN 19 PRECEDING AND CURRENT ROW), 4)
        AS median_20
    FROM bars""",
)
def q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 20-row median (robust smoother): bounded collect_list +
    array_sort + interpolated middle == DuckDB's windowed median over
    DOUBLE (quantile_cont semantics), including partial warmup frames."""
    from ..operators.windows import with_rolling_median

    return with_rolling_median(bars(spark, sf_dir), 20).select(
        "symbol", "time", "event_id", "median_20"
    )
