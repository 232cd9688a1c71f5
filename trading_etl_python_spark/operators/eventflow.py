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

from pyspark.sql import DataFrame, Window
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


def attribution(events: DataFrame, conversion: str = "purchase") -> DataFrame:
    """Multi-touch attribution: credit each touch channel (event_type)
    for conversions under first-touch, last-touch, and linear models.

    A user's journey is every non-conversion event strictly before
    their first conversion; one window pass (rank + per-user touch
    count) classifies first/last touches, and the linear model's
    fractional credits are micro-quantized per touch (ROUND(1e6/n)) so
    the per-channel sums are exact integers — the only float is the
    final /1e6.  Two shuffles total (user co-partition, then the tiny
    channel aggregation)."""
    from pyspark.sql import Window

    conv = (
        events.filter(F.col("event_type") == conversion)
        .groupBy("user_id")
        .agg(F.min("ts").alias("conv_ts"))
    )
    touches = (
        events.join(conv, "user_id")
        .filter((F.col("ts") < F.col("conv_ts")) & (F.col("event_type") != conversion))
        .select("user_id", "ts", "event_id", "event_type")
    )
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    wn = Window.partitionBy("user_id")
    t = touches.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    g = t.groupBy("event_type").agg(
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("n_first"),
        F.sum(F.when(F.col("rn") == F.col("n"), 1).otherwise(0)).alias("n_last"),
        F.sum(
            F.round(F.lit(1000000.0) / F.col("n"), 0).cast("long")
        ).alias("_linq"),
        F.count(F.lit(1)).alias("n_touches"),
    )
    return g.select(
        "event_type",
        F.col("n_touches").cast("long").alias("n_touches"),
        F.col("n_first").cast("long").alias("n_first"),
        F.col("n_last").cast("long").alias("n_last"),
        (F.col("_linq").cast("double") / F.lit(1000000.0)).alias("linear_credit"),
    )


def kaplan_meier(events: DataFrame, censor_days: int = 3) -> DataFrame:
    """Kaplan-Meier survival curve over user activity lifetimes:
    duration = days between a user's first and last event; users whose
    last event falls within ``censor_days`` of the corpus end are
    right-censored (still active).

    S(t) = Π_{t_j<=t} (1 − d_j/n_j) assembles as EXP of a cumulative
    sum of per-step LN terms that are ROUNDED TO MICRO-UNITS first, so
    the running product is exact-integer accumulation (the VWAP
    pattern applied in log space); the risk set n_j is a reverse
    cumulative count.  Output is one row per distinct duration — tiny
    regardless of corpus size."""
    from pyspark.sql import Window

    per_user = events.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.max(F.col("ts").cast("date")).alias("d1"),
    )
    gmax = F.max("d1").over(Window.partitionBy())
    base = per_user.select(
        F.datediff("d1", "d0").cast("long").alias("dur"),
        (F.datediff(gmax, F.col("d1")) < censor_days).alias("censored"),
    )
    grid = base.groupBy("dur").agg(
        F.sum(F.when(~F.col("censored"), 1).otherwise(0)).alias("d"),
        F.sum(F.when(F.col("censored"), 1).otherwise(0)).alias("c"),
    )
    w_desc = Window.orderBy(F.col("dur").desc())
    w_asc = Window.orderBy(F.col("dur").asc())
    n_risk = F.sum(F.col("d") + F.col("c")).over(w_desc)
    stepped = grid.withColumn("n_risk", n_risk).withColumn(
        "_lnq",
        F.when(
            (F.col("d") > 0) & (F.col("d") < F.col("n_risk")),
            F.round(
                F.log(
                    F.lit(1.0)
                    - F.col("d").cast("double") / F.col("n_risk").cast("double")
                )
                * F.lit(1000000.0),
                0,
            ).cast("long"),
        ).otherwise(F.lit(0)),
    )
    # a step where everyone at risk dies (d == n_risk) zeroes the curve
    # exactly — ln(0) is -inf, so carry it as a flag, not a log term
    dead = F.max(
        F.when(F.col("d") >= F.col("n_risk"), 1).otherwise(0)
    ).over(w_asc)
    surv = F.when(dead == 1, F.lit(0.0)).otherwise(
        F.round(
            F.exp(F.sum("_lnq").over(w_asc).cast("double") / F.lit(1000000.0)), 6
        )
    )
    return stepped.select(
        "dur",
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("n_events"),
        F.col("c").cast("long").alias("n_censored"),
        surv.alias("survival"),
    )


def ab_proportion_test(events: DataFrame, conversion: str = "purchase") -> DataFrame:
    """Two-proportion z-test: cohort A/B by user-id parity, conversion
    = at least one ``conversion`` event.  Counts are exact; p_a, p_b,
    the pooled proportion, and z are a fixed double chain."""
    per_user = events.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == conversion, 1).otherwise(0)
        ).alias("converted")
    )
    g = per_user.groupBy().agg(
        F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0)).alias("na"),
        F.sum(
            F.when((F.col("user_id") % 2 == 0) & (F.col("converted") == 1), 1).otherwise(0)
        ).alias("ca"),
        F.sum(F.when(F.col("user_id") % 2 == 1, 1).otherwise(0)).alias("nb"),
        F.sum(
            F.when((F.col("user_id") % 2 == 1) & (F.col("converted") == 1), 1).otherwise(0)
        ).alias("cb"),
    )

    def dbl(c):
        return F.col(c).cast("double")

    pa = dbl("ca") / dbl("na")
    pb = dbl("cb") / dbl("nb")
    pp = (dbl("ca") + dbl("cb")) / (dbl("na") + dbl("nb"))
    # degenerate pools (0% or 100% conversion) have zero variance: NULL z
    z = F.when(
        (pp > 0.0) & (pp < 1.0),
        (pa - pb)
        / F.sqrt(
            pp
            * (F.lit(1.0) - pp)
            * (F.lit(1.0) / dbl("na") + F.lit(1.0) / dbl("nb"))
        ),
    )
    return g.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("ca").cast("long").alias("conv_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.col("cb").cast("long").alias("conv_b"),
        F.round(pa, 6).alias("p_a"),
        F.round(pb, 6).alias("p_b"),
        F.round(z, 6).alias("z_stat"),
    )


def markov_transitions(events: DataFrame) -> DataFrame:
    """First-order Markov estimate of the per-user event-type process:
    transition counts over consecutive (ts, event_id)-ordered events
    within each user, conditional probability per source type, and the
    rank of each continuation.  Counts are exact integers; prob =
    ROUND(cnt/total_from, 6) is a small-denominator rational (safe);
    the rank orders by (cnt DESC, to_type) — never by the float.  One
    hash(user) exchange for the lag, then a (|types|^2)-key
    aggregation."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select(
            "user_id",
            "ts",
            "event_id",
            F.col("event_type").alias("to_type"),
            F.lag("event_type").over(w).alias("from_type"),
        )
        .filter(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wt = Window.partitionBy("from_type")
    wr = wt.orderBy(F.col("n").desc(), F.col("to_type").asc())
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(wt).cast("double"), 6
        ).alias("prob"),
        F.row_number().over(wr).cast("long").alias("rk"),
    )


def inter_event_gaps(events: DataFrame, min_gaps: int = 10) -> DataFrame:
    """Inter-arrival gap profile per event type: within each user's
    stream OF THAT TYPE, gaps in exact integer microseconds; per type
    the mean uses the FLOOR pattern and p50/p90 are rank-based order
    statistics (k-th smallest, k = ceil(n*q) — the var_es form, immune
    to quantile-interpolation differences).  Gaps are integers end to
    end; the only float is the FLOOR-mean's final division."""
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev = F.lag(F.col("ts")).over(w)
    g = (
        events.select(
            "event_type",
            (us - F.unix_micros(prev.cast("timestamp"))).alias("gap_us"),
        )
        .filter(F.col("gap_us").isNotNull())
    )
    wt = Window.partitionBy("event_type")
    wr = wt.orderBy(F.col("gap_us").asc())
    s = g.select(
        "event_type",
        "gap_us",
        F.row_number().over(wr).alias("_rn"),
        F.count(F.lit(1)).over(wt).alias("_n"),
    )
    # Float-boundary note (r10): ceil(n*q) in binary floating point can
    # land one above the mathematical rank when n*q is representable
    # only approximately (the _PREFILTER_SLACK class in dedup.py).  Here
    # both engines evaluate the IDENTICAL expression, so the rank — even
    # if off-by-one from the abstract definition — is the same on both
    # sides and the output is still a valid order statistic.  If these
    # ranks ever feed a DECISION (a filter bound, a pair-pruning gate)
    # rather than a parity-matched output, switch to the slackened ceil
    # used by the dedup prefilters.
    k50 = F.ceil(F.col("_n") * F.lit(0.5))
    k90 = F.ceil(F.col("_n") * F.lit(0.9))
    return (
        s.groupBy("event_type")
        .agg(
            F.max("_n").alias("n_gaps"),
            F.floor(
                F.sum("gap_us").cast("double") / F.max("_n").cast("double")
            ).alias("mean_gap_us"),
            F.max(F.when(F.col("_rn") == k50, F.col("gap_us"))).alias("p50_gap_us"),
            F.max(F.when(F.col("_rn") == k90, F.col("gap_us"))).alias("p90_gap_us"),
        )
        .filter(F.col("n_gaps") >= min_gaps)
    )


def cohort_value(events: DataFrame) -> DataFrame:
    """Cohort ARPU grid: users grouped by first-seen day, activity
    bucketed by week offset; per cell the distinct active users, the
    exact total event value in 1e-4 units, and ARPU via the FLOOR
    pattern.  All aggregation state is integers; the cohort key
    surfaces as TIMESTAMP (the q_retention convention)."""
    first = events.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_date")
    )
    j = events.join(first, "user_id").select(
        "user_id",
        "cohort_date",
        F.floor(
            F.datediff(F.to_date("ts"), F.col("cohort_date")) / F.lit(7)
        ).cast("long").alias("week_offset"),
        F.round(F.col("value") * F.lit(10000.0), 0).cast("long").alias("vq"),
    )
    g = j.groupBy("cohort_date", "week_offset").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.sum("vq").alias("sv"),
    )
    return g.select(
        F.col("cohort_date").cast("timestamp").alias("cohort_date"),
        "week_offset",
        "n_users",
        (F.col("sv").cast("double") / F.lit(10000.0)).alias("total_value"),
        (
            F.floor(F.col("sv").cast("double") / F.col("n_users").cast("double"))
            / F.lit(10000.0)
        ).alias("arpu"),
    )


def hourly_profile(events: DataFrame) -> DataFrame:
    """Hour-of-day activity profile per event type: exact counts, share
    of the type's total (small-denominator 6dp rational), and the
    type's peak-hour flag via (count DESC, hour) ranking — integer
    order statistics, never a float comparison."""
    g = events.groupBy(
        "event_type", F.hour("ts").cast("long").alias("hour")
    ).agg(F.count(F.lit(1)).alias("n"))
    wt = Window.partitionBy("event_type")
    wr = wt.orderBy(F.col("n").desc(), F.col("hour").asc())
    return g.select(
        "event_type",
        "hour",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(wt).cast("double"), 6
        ).alias("share"),
        (F.row_number().over(wr) == 1).alias("is_peak_hour"),
    )
