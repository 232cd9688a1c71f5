"""Structured Streaming pipeline: availableNow replay of the events
table through the stateful indicator operator + idempotent sink."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from trading_etl_python_spark.operators import recursive as R
from trading_etl_python_spark.operators import windows as W
from trading_etl_python_spark.sources.tables import load_events
from trading_etl_python_spark.streaming.pipeline import WARMUP, run_replay_pipeline


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
