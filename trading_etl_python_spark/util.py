"""Small shared plan-shaping helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def lcg_stream(seed: int, n: int, mod: int = 1 << 30) -> list[int]:
    """Deterministic pseudo-random ints in [0, mod) from a plain LCG
    (glibc constants).  Used wherever a Spark query and its DuckDB oracle
    must share the SAME 'random' constants (MinHash permutations, LSH
    hyperplanes): the values are generated once in Python and inlined as
    literals on both sides, so no engine RNG is ever involved."""
    out, x = [], seed
    for _ in range(n):
        x = (1103515245 * x + 12345) % (1 << 31)
        out.append(x % mod)
    return out


def spread(df: DataFrame, *cols: str) -> DataFrame:
    """Repartition to the session's shuffle-partition count, optionally by
    hash of ``cols``.  Used ahead of Python (Arrow) stages and explode fan-
    outs: pinning the count explicitly keeps AQE's small-stage coalescing
    from serializing the downstream work onto a handful of tasks, and a
    single-file scan (one input partition) gets spread across cores."""
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions") or "200")
    return df.repartition(n, *cols) if cols else df.repartition(n)
