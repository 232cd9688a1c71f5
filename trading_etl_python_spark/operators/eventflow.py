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


def event_runs(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Longest consecutive same-type streak per user — the classic
    gaps-and-islands shape: the difference of two ROW_NUMBERs (overall
    vs per-type, both over the same deterministic (ts, id) order) is
    constant exactly within a consecutive run, so one groupBy collapses
    each island without any self-join or iteration.

    Scale: two window specs and the aggregation all ride ONE
    hash(user) exchange (the per-type window partitions by a superset
    key — no second shuffle); per-user frame state is O(1).  Pick of
    the longest run is a deterministic argmax window
    (run_len DESC, run_start, type).

    Returns (user_id, event_type, run_len, run_start)."""
    from pyspark.sql import Window

    w_all = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    w_typ = Window.partitionBy(user_col, type_col).orderBy(ts_col, id_col)
    runs = (
        events.select(user_col, type_col, ts_col, id_col)
        .withColumn(
            "_grp", F.row_number().over(w_all) - F.row_number().over(w_typ)
        )
        .groupBy(user_col, type_col, "_grp")
        .agg(
            F.count(F.lit(1)).alias("run_len"),
            F.min(ts_col).alias("run_start"),
        )
    )
    w_pick = Window.partitionBy(user_col).orderBy(
        F.col("run_len").desc(), F.col("run_start").asc(), F.col(type_col).asc()
    )
    return (
        runs.withColumn("_rn", F.row_number().over(w_pick))
        .filter(F.col("_rn") == 1)
        .select(user_col, type_col, "run_len", "run_start")
    )


def concurrency_profile(
    events: DataFrame,
    session_minutes: int = 30,
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Peak concurrency per event type: every event opens a half-open
    interval [ts, ts + session_minutes); the maximum number of
    simultaneously-open intervals is the max prefix sum of the +1/-1
    boundary stream — the interval-stabbing answer without any
    interval self-join.

    Ordering at equal timestamps processes closes (-1) BEFORE opens
    (+1) — half-open semantics: an interval ending exactly when
    another starts does not overlap it.  (t, delta, id) is a total
    order, so the running sum is deterministic; all arithmetic is
    integer.

    Scale: 2 rows per event, one hash(type) exchange for the window,
    integer prefix sums in O(1) frame state — the same plan at any
    corpus size.  Returns (event_type, n_events, max_concurrent)."""
    from pyspark.sql import Window

    iv = F.expr(f"INTERVAL {session_minutes} MINUTES")
    opens = events.select(
        F.col(type_col),
        F.col(ts_col).alias("_t"),
        F.lit(1).alias("_d"),
        F.col(id_col).alias("_id"),
    )
    closes = events.select(
        F.col(type_col),
        (F.col(ts_col) + iv).alias("_t"),
        F.lit(-1).alias("_d"),
        F.col(id_col).alias("_id"),
    )
    w = (
        Window.partitionBy(type_col)
        .orderBy("_t", "_d", "_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = opens.unionAll(closes).withColumn("_c", F.sum("_d").over(w))
    return run.groupBy(type_col).agg(
        (F.count(F.lit(1)) / 2).cast("long").alias("n_events"),
        F.max("_c").cast("long").alias("max_concurrent"),
    )


def delta_encode(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-key delta encoding — the columnar-compression / feature-
    engineering primitive: for each key's (ts, id)-ordered stream, emit
    the value delta and the inter-arrival gap in microseconds.  First
    row per key has NULL deltas (nothing to difference against).

    Gap arithmetic is INTEGER microseconds end-to-end (the corpus is
    us-resolution; float subtraction of epoch values would round above
    2^53).  Value deltas are single IEEE subtractions of stored
    doubles — deterministic — rounded 6dp by convention.

    Returns (event_id, user_id, ts, dv, dt_us)."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    prev_v = F.lag(val_col, 1).over(w)
    prev_t = F.lag(ts_col, 1).over(w)
    return events.select(
        id_col,
        key_col,
        ts_col,
        F.round(F.col(val_col) - prev_v, 6).alias("dv"),
        (F.unix_micros(F.col(ts_col).cast("timestamp"))
         - F.unix_micros(prev_t.cast("timestamp"))).alias("dt_us"),
    )
