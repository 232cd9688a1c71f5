"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``trading_etl_python_spark/``; the query/oracle
registry is ``trading_etl_python_spark.suite`` (one entry per operator in
SURVEY.md §2; as of r4 every registry entry carries a full value-hash
oracle — zero rows-only).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from trading_etl_python_spark.operators.indicators import indicator_table  # noqa: E402
from trading_etl_python_spark.session import ensure_session_compat  # noqa: E402
from trading_etl_python_spark.sources.tables import bars  # noqa: E402
from trading_etl_python_spark.suite import ORACLES, QUERIES  # noqa: E402

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's full 13-indicator table (warmup-gated,
    FIXTURES.md F3 schema) over the sf0.001 events stream — the entire
    consumer+backfill analytical surface as ONE declarative Spark plan."""
    ensure_session_compat(spark)
    return indicator_table(bars(spark, SF0001), warmup=26)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_session_compat(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-checkable query."""
    return dict(ORACLES)
