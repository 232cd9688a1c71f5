"""Table loaders over the driver's parquet testdata.

Replaces the reference's sources (yfinance HTTP download at
``/root/reference/trading-etl-python/src/db/backfill.py:103`` and the Kafka
consumer at ``src/processing/consumer.py:218-224``) with declarative
``spark.read.parquet`` scans so Catalyst gets predicate pushdown + column
pruning for free.

``bars()`` derives a deterministic OHLCV bar table from the ``events``
stream table (TESTDATA.md): ``user_id``->symbol, ``ts``->time,
``value``->close — the same role-mapping FIXTURES.md documents. High/low/
volume are deterministic arithmetic derivations (NOT random) so the DuckDB
oracle can reproduce them bit-for-bit; this mirrors the reference's
tick-widening (consumer.py:153-160) while still giving the range-based
indicators (ATR/ADX/Stochastic/MFI) a non-degenerate high-low spread.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import ensure_session_compat

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table. ``events`` gets its TIMESTAMP(NANOS) ``ts``
    column normalized to microsecond TIMESTAMP_NTZ (sub-microsecond parts in
    the testdata are all zero, so this is lossless)."""
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_session_compat(spark)
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes)["ts"] == "bigint":  # nanosAsLong path
        # integer div: ns values exceed 2^53, float division would round
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for the SQL API."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> OHLCV bar frame (symbol, time, event_id, open, high, low,
    close, volume).  The exact same derivation exists as SQL in
    ``queries_oracle.BARS_CTE`` — keep the two in sync."""
    ev = load_events(spark, sf_dir)
    return ev.select(
        F.col("user_id").alias("symbol"),
        F.col("ts").alias("time"),
        "event_id",
        F.col("value").alias("open"),
        (F.col("value") * F.lit(1.02) + F.lit(0.01)).alias("high"),
        (F.col("value") * F.lit(0.98)).alias("low"),
        F.col("value").alias("close"),
        # `%` (remainder, sign of dividend) matches DuckDB's `%` in BARS_CTE
        # for ALL inputs incl. negative event_ids; pmod would diverge there
        ((F.col("event_id") % F.lit(1000)) + F.lit(1)).cast("long").alias("volume"),
    )
