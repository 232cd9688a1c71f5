"""Small shared plan-shaping helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, *cols: str) -> DataFrame:
    """Repartition to the session's shuffle-partition count, optionally by
    hash of ``cols``.  Used ahead of Python (Arrow) stages and explode fan-
    outs: pinning the count explicitly keeps AQE's small-stage coalescing
    from serializing the downstream work onto a handful of tasks, and a
    single-file scan (one input partition) gets spread across cores."""
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions") or "200")
    return df.repartition(n, *cols) if cols else df.repartition(n)
