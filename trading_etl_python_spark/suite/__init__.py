"""Query suite: every implemented operator exposed as a named query
(SURVEY.md §2 inventory) with, where SQL-expressible, a DuckDB oracle
that reproduces the exact semantics (driver contract in
/root/repo/__spark_entry__.py).

Numeric-parity rules shared by builders and oracles (see operators/
windows.py docstring): deterministic (time, event_id) intra-key order,
explicit warmup-count guards, NULLIF'd denominators, floats rounded
(4dp windowed aggregates, 6dp similarity/ratios) to absorb engine
summation-order differences.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import analytics, behavior, core, extensions, relational, sql_api

Builder = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, Builder] = {}
ORACLES: dict[str, str] = {}

for mod in (core, relational, extensions, analytics, behavior, sql_api):
    QUERIES.update(mod.QUERIES)
    ORACLES.update(mod.ORACLES)

__all__ = ["QUERIES", "ORACLES", "Builder"]
