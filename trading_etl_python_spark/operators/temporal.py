"""Temporal operators Spark lacks as built-ins: as-of join and gap-based
sessionization (capability extensions beyond the reference, SURVEY.md
§2.2 — the reference is single-table and has neither; both are core
trading/clickstream query shapes).

Both are implemented as SINGLE-SHUFFLE window compositions — no join
operator at all — which is the scale-optimal shape: an as-of join via
join would need an inequality (range) condition that Spark executes as a
broadcast-nested-loop or a full sort-merge with range keys; the
union+last_value formulation is one hash exchange on the key plus a
per-partition sort, identical cost to a single window aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str = "time",
    right_time: str = "time",
    value_cols: tuple[str, ...] = ("value",),
    prefix: str = "asof_",
    tolerance: str | None = None,
) -> DataFrame:
    """For every left row, attach the most recent right row of the same
    key with right.time <= left.time (inclusive — DuckDB/pandas
    ``merge_asof`` 'backward' semantics).  LEFT-join behavior: left rows
    with no prior right row get NULLs.

    ``tolerance`` (SQL interval text, e.g. ``"2 HOURS"``) nulls out
    matches older than left.time - tolerance — pandas ``merge_asof``'s
    tolerance semantics — computed from the same window pass (the
    matched right time rides along as one more last() column).

    Plan: tag right=0 / left=1, union, one window
    ``last(value, ignorenulls=True)`` over (key ORDER BY time, tag) with
    an unbounded-preceding frame, keep left rows.  One exchange, one
    sort, no join node.  Right rows are deduplicated per (key, time) by
    greatest ``_seq`` so ties are deterministic."""
    lcols = left.columns
    r = (
        right.select(
            F.col(on),
            F.col(right_time).alias("_t"),
            F.struct(*[F.col(c) for c in value_cols]).alias("_rv"),
        )
        # deterministic tie-break: one right row per (key, time) — max by
        # the value struct (field-lexicographic, matches the oracle's MAX)
        .withColumn(
            "_rn",
            F.row_number().over(Window.partitionBy(on, "_t").orderBy(F.desc("_rv"))),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .withColumn("_src", F.lit(0))
        .withColumn(
            "_lrow",
            F.lit(None).cast(T.StructType([left.schema[c] for c in lcols])),
        )
    )
    l = left.select(
        F.col(on),
        F.col(left_time).alias("_t"),
        F.lit(None).cast(r.schema["_rv"].dataType).alias("_rv"),
        F.lit(1).alias("_src"),
        F.struct(*[F.col(c) for c in lcols]).alias("_lrow"),
    )
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_t").asc(), F.col("_src").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        r.select(on, "_t", "_rv", "_src", "_lrow")
        .unionByName(l)
        .withColumn("_m", F.last("_rv", ignorenulls=True).over(w))
    )
    if tolerance is not None:
        mt = F.last(
            F.when(F.col("_src") == 0, F.col("_t")), ignorenulls=True
        ).over(w)
        matched = matched.withColumn(
            "_m",
            F.when(
                F.col("_t") - mt <= F.expr(f"INTERVAL {tolerance}"), F.col("_m")
            ),
        )
    matched = matched.filter(F.col("_src") == 1)
    out = matched.select(
        *[F.col("_lrow")[c].alias(c) for c in lcols],
        *[F.col("_m")[c].alias(f"{prefix}{c}") for c in value_cols],
    )
    return out


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str = "time",
    right_time: str = "time",
    value_cols: tuple[str, ...] = ("value",),
    prefix: str = "next_",
) -> DataFrame:
    """Forward as-of: for every left row, the EARLIEST right row of the
    same key with right.time >= left.time (inclusive — pandas
    ``merge_asof`` 'forward') — the label-attachment move ("what
    happened next") for event-outcome joins.  Mirror of ``asof_join``:
    tag/union/one window, but ``first(ignorenulls)`` over a
    current-row..unbounded-FOLLOWING frame ordered (time, tag DESC) so
    equal-time right rows are visible to their left row.  Same cost
    profile: one exchange, one sort, no join node."""
    lcols = left.columns
    r = (
        right.select(
            F.col(on),
            F.col(right_time).alias("_t"),
            F.struct(*[F.col(c) for c in value_cols]).alias("_rv"),
        )
        # deterministic tie-break: one right row per (key, time) — MIN by
        # the value struct (mirrors the oracle's MIN for forward)
        .withColumn(
            "_rn",
            F.row_number().over(Window.partitionBy(on, "_t").orderBy(F.asc("_rv"))),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .withColumn("_src", F.lit(0))
        .withColumn(
            "_lrow",
            F.lit(None).cast(T.StructType([left.schema[c] for c in lcols])),
        )
    )
    l = left.select(
        F.col(on),
        F.col(left_time).alias("_t"),
        F.lit(None).cast(r.schema["_rv"].dataType).alias("_rv"),
        F.lit(1).alias("_src"),
        F.struct(*[F.col(c) for c in lcols]).alias("_lrow"),
    )
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_t").asc(), F.col("_src").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    matched = (
        r.select(on, "_t", "_rv", "_src", "_lrow")
        .unionByName(l)
        .withColumn("_m", F.first("_rv", ignorenulls=True).over(w))
        .filter(F.col("_src") == 1)
    )
    return matched.select(
        *[F.col("_lrow")[c].alias(c) for c in lcols],
        *[F.col("_m")[c].alias(f"{prefix}{c}") for c in value_cols],
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str = "time",
    right_time: str = "time",
    value_cols: tuple[str, ...] = ("value",),
    prefix: str = "near_",
) -> DataFrame:
    """Nearest as-of (pandas ``merge_asof`` 'nearest'): the closer of
    the backward and forward matches, ties to the EARLIER right row
    (pandas tie rule).  Composed from the two directional passes — each
    is one exchange on the key, and both ride the same hash(key)
    distribution, so the compose step is a map-side projection."""
    back = asof_join(
        left, right, on, left_time, right_time,
        value_cols=(right_time, *[c for c in value_cols if c != right_time]),
        prefix="_b_",
    )
    fwd = asof_join_forward(
        back, right, on, left_time, right_time,
        value_cols=(right_time, *[c for c in value_cols if c != right_time]),
        prefix="_f_",
    )
    bt, ft = F.col(f"_b_{right_time}"), F.col(f"_f_{right_time}")
    lt = F.col(left_time)
    use_back = ft.isNull() | (
        bt.isNotNull() & ((lt - bt) <= (ft - lt))  # tie -> earlier (backward)
    )
    out_cols = [c for c in left.columns]
    sel = [F.col(c) for c in out_cols]
    for c in dict.fromkeys((right_time, *value_cols)):
        sel.append(
            F.when(use_back, F.col(f"_b_{c}")).otherwise(F.col(f"_f_{c}")).alias(f"{prefix}{c}")
        )
    return fwd.select(*sel)


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    time_col: str = "ts",
    gap_minutes: int = 30,
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the key's previous event exceeds ``gap_minutes``.  Session ids are a
    running count of session starts per key (1-based) — the classic
    lag + conditional cumulative-sum window composition, one exchange."""
    w = Window.partitionBy(key).orderBy(F.col(time_col).asc(), F.col(order_tiebreak).asc())
    # interval arithmetic, not epoch casts: works for TIMESTAMP_NTZ and is
    # independent of the session timezone
    gap = F.expr(f"INTERVAL {int(gap_minutes)} MINUTES")
    prev = F.lag(time_col).over(w)
    is_new = F.when(prev.isNull() | (F.col(time_col) - prev > gap), 1).otherwise(0)
    return events.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )


def session_stats(
    events: DataFrame,
    key: str = "user_id",
    time_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-session rollup: bounds, size, and value sum — the aggregation
    reuses the sessionize() output in the same keyed distribution."""
    s = sessionize(events, key, time_col, gap_minutes)
    return s.groupBy(key, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(time_col).alias("session_start"),
        F.max(time_col).alias("session_end"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


def candles(df: DataFrame, bucket: str = "1 day") -> DataFrame:
    """OHLCV downsample: ticks/bars -> one candle per (symbol, bucket) —
    the hypertable continuous-aggregate / rollup shape (TimescaleDB's
    planned role in the reference, src/db/setup.py:92-98).

    One hash(symbol, bucket) aggregation, fully map-side-combinable:
    min_by/max_by carry (value, key) pairs through partial aggregation,
    so no window sort and no per-bucket row materialization — the
    scale-optimal shape for "resample 100 TB of ticks to daily bars".
    Requires a deterministic intra-key order: ``time`` must be unique
    per symbol (true for the events table; enforce upstream with
    upsert_ignore on (symbol, time))."""
    w = F.window("time", bucket)
    return (
        df.groupBy("symbol", w.alias("w"))
        .agg(
            F.min_by("open", "time").alias("open_px"),
            F.max("high").alias("high_px"),
            F.min("low").alias("low_px"),
            F.max_by("close", "time").alias("close_px"),
            F.sum("volume").alias("volume"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
        .select(
            "symbol",
            F.col("w.start").alias("bucket_start"),
            "open_px", "high_px", "low_px", "close_px", "volume", "n_ticks",
        )
    )


def time_bucket(col: str = "time", hours: int = 6):
    """Fixed-width time bucket (TimescaleDB ``time_bucket``): midnight-anchored
    so the Spark and DuckDB twins agree for any divisor of 24.  Expressed as
    date_trunc + whole-hour interval — stays inside codegen, no UDF."""
    assert 24 % hours == 0, "bucket must divide a day for midnight anchoring"
    return F.expr(
        f"date_trunc('day', {col}) + make_interval(0, 0, 0, 0, "
        f"CAST({hours} * floor(hour({col}) / {hours}) AS INT), 0, 0)"
    )


def gapfill_locf(
    df: DataFrame, bucket_hours: int = 6, value_col: str = "close"
) -> DataFrame:
    """Gap-filled downsample with LOCF + linear interpolation — the
    TimescaleDB ``time_bucket_gapfill(..) + locf(..) + interpolate(..)``
    shape (the hypertable surface the reference provisions in
    src/db/setup.py:92-98 but never implements).

    Plan at scale: the tick->bucket rollup is one map-side-combinable
    hash aggregate (same shape as ``candles``); the dense scaffold is
    generated from the per-symbol [min,max] span — ``sequence()`` on a
    #symbols-sized frame, NOT an explode of the fact table — so scaffold
    cost is O(symbols x buckets), independent of tick count.  The left
    join back and both fill windows share the hash(symbol) distribution;
    AQE broadcasts the scaffold side when small.

    Interpolation uses bucket ordinals, not epochs: buckets are uniform,
    so the fraction (rn - prev_rn)/(next_rn - prev_rn) is integer-exact
    and engine-portable."""
    bucket = time_bucket("time", bucket_hours)
    b = df.groupBy(F.col("symbol"), bucket.alias("bucket_start")).agg(
        F.max_by(value_col, "time").alias("v"),
        F.count(F.lit(1)).alias("n_ticks"),
    )
    spans = b.groupBy("symbol").agg(
        F.min("bucket_start").alias("mn"), F.max("bucket_start").alias("mx")
    )
    dense = spans.select(
        "symbol",
        F.explode(
            F.sequence("mn", "mx", F.expr(f"INTERVAL {int(bucket_hours)} HOURS"))
        ).alias("bucket_start"),
    )
    j = dense.join(b, ["symbol", "bucket_start"], "left")
    w = Window.partitionBy("symbol").orderBy("bucket_start")
    back = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fwd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    rn = F.row_number().over(w)
    v_rn = F.when(F.col("v").isNotNull(), F.col("rn"))
    out = (
        j.withColumn("rn", rn)
        .withColumn("locf", F.last("v", ignorenulls=True).over(back))
        .withColumn("prev_rn", F.last(v_rn, ignorenulls=True).over(back))
        .withColumn("nxt", F.first("v", ignorenulls=True).over(fwd))
        .withColumn("next_rn", F.first(v_rn, ignorenulls=True).over(fwd))
    )
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("nxt").isNull(), F.col("locf"))
        .otherwise(
            F.col("locf")
            + (F.col("nxt") - F.col("locf"))
            * (F.col("rn") - F.col("prev_rn"))
            / (F.col("next_rn") - F.col("prev_rn"))
        )
    )
    return out.select(
        "symbol",
        "bucket_start",
        F.coalesce("n_ticks", F.lit(0)).alias("n_ticks"),
        F.col("v").isNull().alias("is_gap"),
        F.round("locf", 6).alias("close_locf"),
        F.round(interp, 6).alias("close_interp"),
    )


def candles_rollup(candles_df: DataFrame, bucket: str = "1 day") -> DataFrame:
    """Hierarchical candle rollup: coarser OHLCV candles from FINER
    candles, never re-reading the tick stream — the continuous-aggregate
    hierarchy (1m -> 1h -> 1d) every hypertable deployment maintains.
    Correct OHLC composition: open = earliest child's open, close =
    latest child's close, high/low = extrema, volume/n_ticks = sums.
    Exactly the same single map-side-combinable aggregation shape as
    ``candles`` but over the (already tiny) child-candle table, so a full
    resolution pyramid costs one cheap pass per level."""
    w = F.window("bucket_start", bucket)
    return (
        candles_df.groupBy("symbol", w.alias("w"))
        .agg(
            F.min_by("open_px", "bucket_start").alias("open_px"),
            F.max("high_px").alias("high_px"),
            F.min("low_px").alias("low_px"),
            F.max_by("close_px", "bucket_start").alias("close_px"),
            F.sum("volume").alias("volume"),
            F.sum("n_ticks").alias("n_ticks"),
        )
        .select(
            "symbol",
            F.col("w.start").alias("bucket_start"),
            "open_px", "high_px", "low_px", "close_px", "volume", "n_ticks",
        )
    )
