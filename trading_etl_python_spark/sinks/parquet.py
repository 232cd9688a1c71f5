"""Batch sinks: the reference's storage layer re-expressed as partitioned
parquet.

Reference semantics being reproduced (citations into /root/reference/):

- Table layout: TimescaleDB hypertable ``stock_indicators`` range-
  partitioned on ``time`` with PK ``(time, symbol)``
  (trading-etl-python/src/db/setup.py:55-98) -> parquet partitioned by
  ``trade_date`` so time-range queries partition-prune (SURVEY.md S6).
- Write path: ``INSERT ... ON CONFLICT (time, symbol) DO NOTHING``
  (src/processing/consumer.py:197-201, src/db/backfill.py:160-166) ->
  ``upsert_ignore``: first-writer-wins key dedup against ONLY the
  partitions the incoming batch touches.

Scale posture (100 TB): the existing-key anti-join never scans the whole
table — incoming partition values prune the read; within a date
partition the key set is bounded by that day's volume.  Plain parquet
append is not atomic across concurrent writers; on a real deployment the
same two calls map 1:1 onto an ACID table format's MERGE (Delta/Iceberg,
not present in this container).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _table_exists(path: str) -> bool:
    # local-fs check is sufficient here; an object-store deployment would
    # consult the table catalog instead
    return os.path.isdir(path) and any(
        name.endswith(".parquet") or name.startswith(("trade_date=", "_SUCCESS"))
        for name in os.listdir(path)
    )


def with_partition_col(
    df: DataFrame, partition_col: str = "trade_date", time_col: str = "time"
) -> DataFrame:
    if partition_col not in df.columns:
        df = df.withColumn(partition_col, F.to_date(F.col(time_col)))
    return df


def write_indicator_table(
    df: DataFrame,
    path: str,
    partition_col: str = "trade_date",
    time_col: str = "time",
    mode: str = "overwrite",
) -> None:
    """DDL + bulk load (setup.py:52-98 + backfill.py:150-166): create/replace
    the date-partitioned indicator table in one parallel write."""
    with_partition_col(df, partition_col, time_col).write.mode(mode).partitionBy(
        partition_col
    ).parquet(path)


def upsert_ignore(
    df: DataFrame,
    path: str,
    keys: tuple[str, ...] = ("time", "symbol"),
    partition_col: str = "trade_date",
    time_col: str = "time",
) -> None:
    """``INSERT ... ON CONFLICT (keys) DO NOTHING`` onto a date-partitioned
    parquet table (consumer.py:188-206).  Idempotent: re-running the same
    batch appends nothing — the at-least-once replay guarantee (SURVEY.md
    T4) holds end-to-end.

    Plan shape: dedup incoming on keys -> read ONLY touched partitions of
    the existing table (partition-pruned by the incoming batch's distinct
    partition values) -> left-anti join -> append."""
    spark = df.sparkSession
    incoming = with_partition_col(df, partition_col, time_col).dropDuplicates(list(keys))
    if _table_exists(path):
        touched = [r[0] for r in incoming.select(partition_col).distinct().collect()]
        existing_keys = (
            spark.read.parquet(path)
            .filter(F.col(partition_col).isin(touched))
            .select(*keys)
        )
        incoming = incoming.join(existing_keys, on=list(keys), how="left_anti")
    incoming.write.mode("append").partitionBy(partition_col).parquet(path)
