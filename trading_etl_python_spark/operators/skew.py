"""Skew-mitigation utilities for hot keys at scale.

AQE's skew-join handling (enabled in session.py) covers sort-merge joins
at runtime, but two shapes still need explicit salting on a 1000-executor
cluster:

1. **Skewed aggregation** — one hot key (a viral symbol, an empty-string
   token) funnels into a single reducer.  ``salted_agg`` runs the classic
   two-phase plan: partial-aggregate on (key, salt), then final-aggregate
   on key.  Works for any algebraic aggregate (sum/count/min/max —
   anything with a merge function).
2. **Skewed join against a medium dimension** — too big to broadcast,
   too hot to shuffle raw.  ``salted_join`` salts the fact side N ways
   and explodes the dimension side N ways, restoring key co-location
   with bounded per-task input.

Both are deterministic (salt = pmod(hash-free round-robin on a stable
column), so results are exactly reproducible run to run.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[Column, Column]],
    salt_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) -> partial, then
    groupBy(keys) -> merge.  ``aggs`` maps output name to a
    (partial_expr, merge_expr) pair, e.g.::

        {"n_rows": (F.count(F.lit(1)), F.sum("n_rows")),
         "sum_v":  (F.sum("v"),        F.sum("sum_v"))}

    ``salt_col`` must be a stable, roughly-uniform column (an id works);
    the salt is ``pmod(salt_col, n_salts)`` so the plan stays
    deterministic.  The first shuffle spreads each hot key over
    ``n_salts`` reducers; the second shuffle moves only ``n_salts`` rows
    per key."""
    salted = df.withColumn("_salt", F.pmod(F.col(salt_col), F.lit(n_salts)))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[expr.alias(name) for name, (expr, _) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[merge.alias(name) for name, (_, merge) in aggs.items()]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 8,
    salt_col: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the fact side gets a deterministic salt
    in [0, n_salts); the dim side is exploded once per salt value, so
    every (key, salt) bucket still finds its dim row.  Per-task input for
    the hottest key drops by ~n_salts at the cost of replicating the dim
    side n_salts times (use only when dim is too big to broadcast).

    ``salt_col`` defaults to a per-partition monotonic id, which is
    deterministic for a fixed input layout; pass a stable data column for
    layout-independent reproducibility.

    Only fact-preserving join types are salt-safe: with 'right'/'full'
    (or 'left' from the dim side) an unmatched dim key would surface once
    PER SALT COPY instead of once."""
    safe = {"inner", "left", "left_outer", "cross"}
    if how not in safe:
        raise ValueError(
            f"salted_join supports {sorted(safe)}; {how!r} would duplicate "
            "unmatched dim rows once per salt"
        )
    salt = (
        F.pmod(F.col(salt_col), F.lit(n_salts))
        if salt_col
        else F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    )
    f = fact.withColumn("_salt", salt)
    d = dim.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    out = f.join(d, on=[on, "_salt"], how=how)
    return out.drop("_salt")


def skew_stats(df: DataFrame, key: str, top: int = 10) -> DataFrame:
    """Diagnostic: per-key row counts and share of total — run this before
    choosing n_salts (a key holding >1/partitions of the rows is hot)."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("share", F.round(F.col("n_rows") / F.lit(float(total)), 6))
        .orderBy(F.col("n_rows").desc(), F.col(key).asc())
        .limit(top)
    )
