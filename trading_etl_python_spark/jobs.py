"""End-to-end jobs: the reference's executables re-expressed as single
Spark plans (SURVEY.md §3).

- ``backfill_job``  <- backfill entrypoint (/root/reference/trading-etl-python/
  src/db/backfill.py:175-183): download -> per-symbol indicator loop ->
  one bulk insert.  Here: scan -> one declarative indicator plan over all
  symbols -> date-partitioned upsert-ignore write.  One Spark job,
  parallel over keys, idempotent on re-run.
- ``latest_indicators_job`` <- the planned /latest_price + /indicators
  API reads (roadmap.md:43-47): latest gated row per symbol, and a
  time-range slice that partition-prunes against the written table.
- The consumer (streaming) executable lives in ``streaming.pipeline``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.indicators import indicator_table
from .operators.windows import latest_per_key
from .sinks import upsert_ignore
from .sources.tables import bars


def backfill_job(
    spark: SparkSession, sf_dir: str, out_path: str, warmup: int | None = None
) -> int:
    """Full batch backfill: events -> 21-column indicator table ->
    date-partitioned parquet with ON-CONFLICT-DO-NOTHING semantics.
    Returns rows written this run (0 on exact re-run)."""
    table = indicator_table(bars(spark, sf_dir), warmup=warmup)
    return upsert_ignore(table, out_path, keys=("time", "symbol"))


def latest_indicators_job(spark: SparkSession, table_path: str) -> DataFrame:
    """/latest_price equivalent: most recent indicator row per symbol from
    the stored table (max_by aggregation, no global sort).  Ordered by
    time alone — the table's PK (time, symbol) guarantees uniqueness."""
    return latest_per_key(
        spark.read.parquet(table_path), order_cols=("time",)
    ).drop("trade_date")


def range_query_job(spark: SparkSession, table_path: str, lo: str, hi: str) -> DataFrame:
    """/indicators?from=&to= equivalent: a time-range read that prunes to
    the matching trade_date partitions."""
    return spark.read.parquet(table_path).filter(
        (F.col("trade_date") >= F.to_date(F.lit(lo)))
        & (F.col("trade_date") <= F.to_date(F.lit(hi)))
    )


def incremental_backfill_job(
    spark: SparkSession,
    sf_dir: str,
    out_path: str,
    since: str,
    lookback_rows: int = 60,
    context_lo: str | None = None,
) -> int:
    """Incremental indicator maintenance: append indicator rows for ticks
    at/after ``since`` without recomputing history.

    Only affected symbols are touched; per symbol the recompute context
    is the trailing ``lookback_rows`` bars before the cut — the same
    60-row state bound the reference consumer carries per key
    (/root/reference/trading-etl-python/src/processing/consumer.py:33,
    162-163) and our streaming runtime mirrors. Consequences, identical
    to the reference's own incremental semantics:

    - pure window indicators whose frames fit the context (sma/bbands/
      stoch/mfi/wma/roc/donchian/cci: <=20 rows) are EXACTLY equal to a
      full-history recompute;
    - infinite-memory recurrences (ema/rsi/macd/adx/atr/obv/vwap before
      the day anchor) re-seed inside the 60-row buffer — byte-identical
      to what the reference consumer emits for the same buffer.

    At 100 TB the scan is bounded two ways: ``context_lo`` (a timestamp
    safely older than ``lookback_rows`` intervals) partition-prunes the
    history read, and the left-semi join on affected symbols drops idle
    keys before the window shuffle. Returns rows written (0 when the
    increment was already applied — idempotent like the full job).
    """
    cut = F.to_timestamp(F.lit(since))
    ctx = _incremental_context(
        spark, sf_dir, since, lookback_rows, context_lo
    )
    table = indicator_table(ctx, warmup=None).filter(F.col("time") >= cut)
    return upsert_ignore(table, out_path, keys=("time", "symbol"))


def _incremental_context(
    spark: SparkSession,
    sf_dir: str,
    since: str,
    lookback_rows: int = 60,
    context_lo: str | None = None,
) -> DataFrame:
    """The recompute context ``incremental_backfill_job`` feeds to the
    indicator plan: fresh post-cut rows plus each affected symbol's
    trailing ``lookback_rows`` history bars.  Split out so the scale
    posture (broadcast LEFT-SEMI prune of idle symbols BEFORE the
    window shuffle, per-symbol row_number tail) is pinned by
    tests/test_jobs.py against the PRODUCTION plan, not a test-local
    reconstruction."""
    from pyspark.sql import Window

    b = bars(spark, sf_dir)
    cut = F.to_timestamp(F.lit(since))
    fresh = b.filter(F.col("time") >= cut)
    syms = fresh.select("symbol").distinct()

    hist = b.filter(F.col("time") < cut)
    if context_lo is not None:
        hist = hist.filter(F.col("time") >= F.to_timestamp(F.lit(context_lo)))
    hist = hist.join(F.broadcast(syms), "symbol", "left_semi")
    wtail = Window.partitionBy("symbol").orderBy(
        F.col("time").desc(), F.col("event_id").desc()
    )
    tail = (
        hist.withColumn("_rn", F.row_number().over(wtail))
        .filter(F.col("_rn") <= lookback_rows)
        .drop("_rn")
    )
    return tail.unionByName(fresh)


def export_training_data_job(
    spark: SparkSession,
    sf_dir: str,
    out_root: str,
    budget: int = 512,
    n_shards: int = 8,
    tar_export: bool = False,
) -> dict:
    """End-to-end training-data export: curate the corpus (quality ->
    exact + near dedup), assign deterministic splits, pack each
    (lang, split) stream into token-budget sequences, shard packs by
    portable hash, and publish per-split parquet plus a manifest of
    per-split/shard pack counts and catalog stats.

    Writes are one job per split over the shared lazy curation plan.
    Shard assignment is the portable hash of the pack'"'"'s first doc id —
    stable across runs, so a re-export produces identical shard
    membership and a trainer can resume mid-epoch against it.

    ``tar_export=True`` additionally publishes each split's curated
    documents as WebDataset-style tar shards (``write_tar_shards`` —
    key = doc id, payload = text, portable-hash shard membership), the
    archive layout a streaming training loader consumes directly; the
    manifest records per-split member counts."""
    from .operators.curation import curate_corpus, pack_sequences
    from .operators.sampling import hash_bucket, split_assign
    from .operators.transforms import table_stats
    from .sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    curated = split_assign(curate_corpus(docs))
    packed = (
        pack_sequences(
            curated.withColumn("_grp", F.concat_ws("|", "lang", "split")),
            budget=budget,
            group_col="_grp",
        )
        .withColumn("split", F.split("_grp", "\\|")[1])
        .withColumn("shard", hash_bucket("first_id", n_shards))
    )

    manifest: dict = {"splits": {}, "budget": budget, "n_shards": n_shards}
    for split in ("train", "val", "test"):
        part = packed.filter(F.col("split") == split)
        path = f"{out_root}/{split}"
        part.repartition("shard").write.mode("overwrite").partitionBy(
            "shard"
        ).parquet(path)
        written = spark.read.parquet(path)
        counts = {
            int(r["shard"]): r["n"]
            for r in written.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        manifest["splits"][split] = {"packs": sum(counts.values()), "shards": counts}
    if tar_export:
        from .sources.formats import write_tar_shards

        manifest["tar"] = {}
        # curation carries metadata only; re-attach payload text by id
        with_text = curated.select("doc_id", "split").join(
            docs.select("doc_id", "text"), "doc_id"
        )
        for split in ("train", "val", "test"):
            tpath = f"{out_root}/{split}_tar"
            part = with_text.filter(F.col("split") == split).select(
                F.col("doc_id").cast("string").alias("key"),
                F.col("text").cast("binary").alias("payload"),
            )
            shard_counts = write_tar_shards(part, tpath, n_shards=n_shards)
            manifest["tar"][split] = sum(shard_counts.values())
    manifest["stats"] = {
        r["column"]: {"n_rows": r["n_rows"], "ndv": r["ndv"]}
        for r in table_stats(packed, ["first_id", "pack_id"]).collect()
    }
    return manifest
