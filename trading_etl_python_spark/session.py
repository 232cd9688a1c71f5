"""SparkSession factory with scale-oriented defaults.

The reference runs a single pandas process (``/root/reference/trading-etl-python/
src/processing/consumer.py``); here every knob is chosen for a real cluster
and merely *happens* to run on local[N]:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing)
- shuffle partitions sized to cores, not the 200 default
- Arrow transfer for the pandas-UDF slow path
- UTC session timezone (the reference enforces UTC end-to-end,
  e.g. backfill.py:131, consumer.py:149)
- ``nanosAsLong`` so parquet TIMESTAMP(NANOS) columns (the driver's
  ``events`` table) are readable; the loader converts to timestamps.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "trading-etl-spark", cpus: str | int | None = None) -> SparkSession:
    cpus = str(cpus or DEFAULT_CPUS)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # keep parallelism for Python (Arrow) stages: the default 1m floor
        # coalesces small shuffles to ~4 partitions, serializing pandas work
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_session_compat(spark: SparkSession) -> SparkSession:
    """Make an externally-created session (e.g. the driver's) able to read
    the testdata: nanosAsLong is runtime-settable, so set it defensively."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # already set at a non-modifiable level, or newer Spark reads NANOS natively
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        # UTC is load-bearing for LTZ<->NTZ casts (the reference enforces
        # UTC end-to-end); if the external session pins another zone at a
        # non-modifiable level, say so instead of silently diverging
        import warnings

        warnings.warn(
            "could not set spark.sql.session.timeZone=UTC; timestamp values "
            f"will follow the session zone {spark.conf.get('spark.sql.session.timeZone', '?')!r}",
            RuntimeWarning,
            stacklevel=2,
        )
    return spark
