"""Event-stream product analytics over the ``events`` table: funnel
conversion, retention cohorts, and interval (range) joins.

The reference has no multi-event analytics at all (single-symbol tick
maths only — SURVEY.md §2.2); these are capability extensions in the
spirit of the driver's north star (large-scale behavioral pipelines),
built purely from shuffle-on-``user_id`` joins and aggregations so the
same plans hold on a 1000-executor cluster:

- **funnel**: each stage is a keyed min-timestamp aggregation followed
  by an equi-join on ``user_id`` with a strictly-later filter — the
  classic "ordered sequence" funnel without any window or self cross
  join.  3 stages = 3 hash aggregations co-partitioned on the same key
  (one real shuffle; AQE reuses the exchange).
- **retention**: first-seen date per user (one agg) joined back to the
  user's distinct active days — day offsets are bounded by the
  observation window, so the output is tiny regardless of input size.
- **interval join**: equi-join on ``user_id`` PLUS a range predicate on
  time.  Spark executes it as a hash join on the equi-key with the
  range as a post-filter — co-located by user, never a cartesian: the
  scale-safe shape for "events inside windows" joins (the naive
  time-only theta join would be O(N·M)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_counts(
    events: DataFrame,
    stages: tuple[str, str, str] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered 3-stage funnel: users whose first ``stages[0]`` precedes a
    later ``stages[1]`` which precedes a later ``stages[2]``.  Returns one
    row: entered / reached_2 / reached_3 user counts."""
    s1 = (
        events.filter(F.col(type_col) == stages[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t1"))
    )
    s2 = (
        events.filter(F.col(type_col) == stages[1])
        .join(s1, user_col)
        .filter(F.col(ts_col) > F.col("t1"))
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t2"))
    )
    s3 = (
        events.filter(F.col(type_col) == stages[2])
        .join(s2, user_col)
        .filter(F.col(ts_col) > F.col("t2"))
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t3"))
    )
    return (
        s1.agg(F.count(F.lit(1)).alias("entered"))
        .crossJoin(s2.agg(F.count(F.lit(1)).alias("reached_2")))
        .crossJoin(s3.agg(F.count(F.lit(1)).alias("reached_3")))
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Classic retention triangle: cohort = user's first active day;
    count distinct users active at each day offset from their cohort."""
    day = F.to_date(F.col(ts_col))
    first = events.groupBy(user_col).agg(F.min(day).alias("cohort_date"))
    active = events.select(user_col, day.alias("active_date")).distinct()
    return (
        active.join(first, user_col)
        .groupBy(
            "cohort_date",
            F.datediff(F.col("active_date"), F.col("cohort_date")).alias("day_offset"),
        )
        .agg(F.countDistinct(user_col).alias("n_users"))
    )


def events_in_windows(
    events: DataFrame,
    window_type: str = "error",
    probe_types: tuple[str, ...] = ("view", "click"),
    window_minutes: int = 10,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Interval join: per user, count distinct probe events falling
    inside [w.ts, w.ts + window_minutes] of any window-opening event.
    DISTINCT on event_id — overlapping windows must not double-count."""
    wins = events.filter(F.col(type_col) == window_type).select(
        F.col(user_col).alias("_wu"),
        F.col(ts_col).alias("_lo"),
        (F.col(ts_col) + F.expr(f"INTERVAL {window_minutes} MINUTES")).alias("_hi"),
    )
    probes = events.filter(F.col(type_col).isin(list(probe_types)))
    return (
        probes.join(
            wins,
            (F.col(user_col) == F.col("_wu"))
            & (F.col(ts_col) >= F.col("_lo"))
            & (F.col(ts_col) <= F.col("_hi")),
        )
        .groupBy(user_col)
        .agg(F.countDistinct("event_id").alias("n_probe_events"))
    )
