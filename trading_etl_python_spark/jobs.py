"""End-to-end jobs: the reference's executables re-expressed as single
Spark plans (SURVEY.md §3).

- ``backfill_job``  <- backfill entrypoint (/root/reference/trading-etl-python/
  src/db/backfill.py:175-183): download -> per-symbol indicator loop ->
  one bulk insert.  Here: scan -> one declarative indicator plan over all
  symbols -> date-partitioned upsert-ignore write.  One Spark job,
  parallel over keys, idempotent on re-run.
- ``latest_indicators_job`` <- the planned /latest_price + /indicators
  API reads (roadmap.md:43-47): latest gated row per symbol, and a
  time-range slice that partition-prunes against the written table.
- The consumer (streaming) executable lives in ``streaming.pipeline``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.indicators import indicator_table
from .operators.windows import latest_per_key
from .sinks import upsert_ignore
from .sources.tables import bars


def backfill_job(
    spark: SparkSession, sf_dir: str, out_path: str, warmup: int | None = None
) -> int:
    """Full batch backfill: events -> 21-column indicator table ->
    date-partitioned parquet with ON-CONFLICT-DO-NOTHING semantics.
    Returns rows written this run (0 on exact re-run)."""
    table = indicator_table(bars(spark, sf_dir), warmup=warmup)
    return upsert_ignore(table, out_path, keys=("time", "symbol"))


def latest_indicators_job(spark: SparkSession, table_path: str) -> DataFrame:
    """/latest_price equivalent: most recent indicator row per symbol from
    the stored table (max_by aggregation, no global sort).  Ordered by
    time alone — the table's PK (time, symbol) guarantees uniqueness."""
    return latest_per_key(
        spark.read.parquet(table_path), order_cols=("time",)
    ).drop("trade_date")


def range_query_job(spark: SparkSession, table_path: str, lo: str, hi: str) -> DataFrame:
    """/indicators?from=&to= equivalent: a time-range read that prunes to
    the matching trade_date partitions."""
    return spark.read.parquet(table_path).filter(
        (F.col("trade_date") >= F.to_date(F.lit(lo)))
        & (F.col("trade_date") <= F.to_date(F.lit(hi)))
    )
