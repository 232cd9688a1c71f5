"""Structured Streaming pipeline: availableNow replay of the events
table through the stateful indicator operator + idempotent sink."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from trading_etl_python_spark.operators import recursive as R
from trading_etl_python_spark.operators import windows as W
from trading_etl_python_spark.sources.tables import load_events
from trading_etl_python_spark.streaming.pipeline import (
    WARMUP,
    events_file_stream,
    run_replay_pipeline,
    stream_windowed_stats,
)


@pytest.fixture(scope="module")
def replay(spark, sf_dir):
    with tempfile.TemporaryDirectory(prefix="ckpt_") as ckpt:
        yield run_replay_pipeline(spark, sf_dir, ckpt).cache()


def test_replay_emits_gated_rows(replay):
    assert replay.count() > 0
    assert replay.filter(F.col("sma_20").isNull()).count() == 0


def test_replay_matches_batch_warmup_count(spark, sf_dir, replay):
    """Single-batch replay == batch semantics: same gated row count as
    the batch warmup-gate query."""
    ev = load_events(spark, sf_dir)
    bars = ev.select(
        F.col("user_id").alias("symbol"), F.col("ts").alias("time"), "event_id",
        F.col("value").alias("close"),
    )
    batch = W.with_warmup_gate(W.with_sma(bars, 20), WARMUP, "sma_20")
    assert replay.count() == batch.count()


def test_restart_with_same_checkpoint_is_idempotent(spark, sf_dir):
    """Recovery semantics (T4): re-starting the query with the same
    checkpoint and sink must not duplicate rows — the source is already
    fully consumed per the checkpoint, and even a replayed batch would be
    absorbed by the upsert-ignore sink."""
    with tempfile.TemporaryDirectory(prefix="ckpt_") as ckpt:
        # default sink lives with the checkpoint, so a bare restart with
        # only the checkpoint dir must also be idempotent
        first = run_replay_pipeline(spark, sf_dir, ckpt).count()
        assert first > 0
        second = run_replay_pipeline(spark, sf_dir, ckpt).count()
        assert second == first


def test_windowed_stats_with_watermark_match_batch(spark, sf_dir):
    """Append-mode watermarked windows must (a) only contain finalized
    windows and (b) agree exactly with the batch tumbling aggregation on
    every emitted window."""
    with tempfile.TemporaryDirectory(prefix="ckpt_wm_") as ckpt:
        ticks = events_file_stream(spark, sf_dir).select(
            F.col("user_id").alias("symbol"), F.col("ts").alias("time"),
            F.col("value").alias("close"),
        )
        q = (
            stream_windowed_stats(ticks)
            .writeStream.format("memory")
            .queryName("wm_out")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        emitted = {
            (r.win_start, r.symbol): (r.n_ticks, r.avg_close, r.max_close)
            for r in spark.sql("SELECT * FROM wm_out").collect()
        }

    ev = load_events(spark, sf_dir)
    batch_rows = (
        ev.groupBy(F.window(F.col("ts"), "1 hour").alias("w"), F.col("user_id").alias("symbol"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 4).alias("avg_v"),
            F.round(F.max("value"), 4).alias("max_v"),
        )
        .collect()
    )
    batch = {(r.w.start, r.symbol): (r.n, r.avg_v, r.max_v) for r in batch_rows}
    max_ts = ev.agg(F.max("ts")).collect()[0][0]

    assert emitted, "no windows emitted"
    for key, vals in emitted.items():
        assert batch[key] == vals  # exact agreement with batch semantics
    # every window that closed before the final watermark must be present
    import datetime as dt

    final_wm = max_ts - dt.timedelta(minutes=30)
    closed = {
        (ws, sym)
        for (ws, sym) in batch
        if ws + dt.timedelta(hours=1) <= final_wm.replace(tzinfo=None)
    }
    missing = closed - set(emitted)
    assert not missing, f"{len(missing)} finalized windows not emitted"


def test_replay_ema_matches_batch(spark, sf_dir, replay):
    """Streaming EMA values equal the batch applyInPandas EMA on the
    same history (one batch -> no trim effects)."""
    ev = load_events(spark, sf_dir)
    bars = ev.select(
        F.col("user_id").alias("symbol"), F.col("ts").alias("time"), "event_id",
        F.col("value").alias("close"),
    ).withColumn("high", F.col("close")).withColumn("low", F.col("close")).withColumn(
        "open", F.col("close")
    ).withColumn("volume", F.lit(1).cast("long"))
    batch = {
        (r.symbol, r.event_id): r.ema_10
        for r in R.with_ema(bars, (10,)).select("symbol", "event_id", "ema_10").collect()
    }
    stream_rows = replay.select("symbol", "event_id", "ema_10").collect()
    assert len(stream_rows) > 0
    for r in stream_rows:
        assert batch[(r.symbol, r.event_id)] == pytest.approx(r.ema_10, abs=1e-9), (
            r.symbol,
            r.event_id,
        )


def test_transform_with_state_matches_group_state(spark, sf_dir, replay):
    """The transformWithStateInPandas runtime (RocksDB typed state) must
    emit exactly the rows the applyInPandasWithState path emits.

    Spark's transformWithState Python driver worker imports protobuf,
    which this container does not ship -> skipped where unavailable (the
    operator itself is import-clean; see pipeline.stream_indicators_tws).
    """
    import tempfile

    pytest.importorskip("google.protobuf")

    with tempfile.TemporaryDirectory(prefix="ckpt_tws_") as ckpt:
        tws = run_replay_pipeline(
            spark, sf_dir, ckpt, out_table="stream_out_tws", api="transformWithState"
        )
        cols = ["symbol", "event_id", "close", "sma_20", "ema_20", "rsi_14"]
        assert tws.count() == replay.count()
        assert tws.select(*cols).exceptAll(replay.select(*cols)).count() == 0


def test_stream_candles_match_batch(spark, sf_dir):
    """Every candle the stream emits (closed windows only, append mode)
    must equal the batch rollup of the same ticks."""
    with tempfile.TemporaryDirectory(prefix="ckpt_candle_") as ckpt:
        from trading_etl_python_spark.streaming.pipeline import stream_candles

        ticks = events_file_stream(spark, sf_dir).select(
            F.col("user_id").alias("symbol"), F.col("ts").alias("time"),
            F.col("value").alias("close"),
        )
        q = (
            stream_candles(ticks)
            .writeStream.format("memory")
            .queryName("candle_out")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        emitted = {
            (r.symbol, r.bucket_start): (r.open_px, r.high_px, r.low_px, r.close_px, r.n_ticks)
            for r in spark.sql("SELECT * FROM candle_out").collect()
        }
        assert emitted, "stream emitted no closed candles"

        from trading_etl_python_spark.sources.tables import load_events

        ev = load_events(spark, sf_dir)
        batch = (
            ev.groupBy(F.col("user_id").alias("symbol"), F.window("ts", "1 hour").alias("w"))
            .agg(
                F.min_by("value", "ts").alias("open_px"),
                F.max("value").alias("high_px"),
                F.min("value").alias("low_px"),
                F.max_by("value", "ts").alias("close_px"),
                F.count(F.lit(1)).alias("n_ticks"),
            )
            .select("symbol", F.col("w.start").alias("bucket_start"),
                    "open_px", "high_px", "low_px", "close_px", "n_ticks")
        )
        expect = {
            (r.symbol, r.bucket_start): (r.open_px, r.high_px, r.low_px, r.close_px, r.n_ticks)
            for r in batch.collect()
        }
        for k, v in emitted.items():
            assert expect[k] == v, k


def test_stream_stream_join_matches_batch(spark, sf_dir):
    """Watermarked stream-stream interval join emits exactly the pairs
    the batch equi+range join produces (single availableNow replay: all
    data inside the watermark horizon)."""
    from trading_etl_python_spark.streaming.pipeline import stream_stream_join

    with tempfile.TemporaryDirectory(prefix="ckpt_ssj_") as ckpt:
        src = events_file_stream(spark, sf_dir)
        probes = src.filter(F.col("event_type").isin("view", "click")).select(
            "user_id", "event_id", "ts"
        )
        wins = src.filter(F.col("event_type") == "error").select(
            "user_id", "event_id", "ts"
        )
        q = (
            stream_stream_join(probes, wins)
            .writeStream.format("memory")
            .queryName("ssj_out")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            (r.probe_event_id, r.window_event_id)
            for r in spark.sql("SELECT * FROM ssj_out").collect()
        }

    ev = load_events(spark, sf_dir)
    p = ev.filter(F.col("event_type").isin("view", "click")).select(
        "user_id", F.col("event_id").alias("pid"), "ts"
    )
    w = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("wu"), F.col("event_id").alias("wid"),
        F.col("ts").alias("wts"),
    )
    batch = {
        (r.pid, r.wid)
        for r in p.join(
            w,
            (F.col("user_id") == F.col("wu"))
            & (F.col("ts") >= F.col("wts"))
            & (F.col("ts") <= F.col("wts") + F.expr("INTERVAL 10 MINUTES")),
        ).collect()
    }
    assert got == batch and batch, f"stream {len(got)} vs batch {len(batch)}"


def test_stream_dedup_within_watermark(spark, sf_dir):
    """A duplicated tick stream (every row delivered twice, as a replayed
    micro-batch would) must come out unique on (symbol, time)."""
    import os

    from trading_etl_python_spark.streaming.pipeline import (
        stream_dedup_within_watermark,
    )

    with tempfile.TemporaryDirectory(prefix="dd_") as tmp:
        ev = load_events(spark, sf_dir).limit(500).select(
            F.col("user_id").alias("symbol"), F.col("ts").alias("time"),
            F.col("value").alias("close"),
        )
        dup_dir = os.path.join(tmp, "in")
        ev.union(ev).write.parquet(dup_dir)
        ticks = (
            spark.readStream.schema("symbol long, time timestamp, close double")
            .parquet(dup_dir)
        )
        q = (
            stream_dedup_within_watermark(ticks)
            .writeStream.format("memory")
            .queryName("dd_out")
            .outputMode("append")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rows = spark.sql("SELECT symbol, time FROM dd_out").collect()
    keys = [(r.symbol, r.time) for r in rows]
    assert len(keys) == len(set(keys)), "duplicates survived"
    assert len(set(keys)) == ev.count()
