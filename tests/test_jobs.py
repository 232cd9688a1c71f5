from __future__ import annotations

import os

from pyspark.sql import functions as F

from trading_etl_python_spark.jobs import backfill_job, latest_indicators_job, range_query_job


def test_backfill_job_end_to_end(spark, sf_dir, tmp_path):
    out = str(tmp_path / "indicators")
    written = backfill_job(spark, sf_dir, out, warmup=26)
    assert written > 0
    assert any(d.startswith("trade_date=") for d in os.listdir(out))
    table = spark.read.parquet(out)
    # full 21-column schema + partition column
    assert {"time", "symbol", "close", "sma_20", "ema_10", "macd_line", "vwap"} <= set(table.columns)
    # warmup gate applied end-to-end
    assert table.filter(table.sma_20.isNull()).count() == 0


def test_backfill_job_rerun_writes_nothing(spark, sf_dir, tmp_path):
    out = str(tmp_path / "indicators")
    first = backfill_job(spark, sf_dir, out, warmup=26)
    second = backfill_job(spark, sf_dir, out, warmup=26)
    assert first > 0 and second == 0


def test_latest_and_range_reads(spark, sf_dir, tmp_path):
    out = str(tmp_path / "indicators")
    backfill_job(spark, sf_dir, out, warmup=26)
    latest = latest_indicators_job(spark, out)
    assert latest.count() == latest.select("symbol").distinct().count()  # one row/symbol
    lo, hi = "2024-01-10", "2024-01-15"
    sliced = range_query_job(spark, out, lo, hi)
    dates = [r.trade_date.isoformat() for r in sliced.select("trade_date").distinct().collect()]
    assert dates and all(lo <= d <= hi for d in dates)


def test_incremental_backfill_parity_and_idempotence(spark, sf_dir, tmp_path):
    """Incremental append over a 60-row tail context: window-family
    columns (frames <= 20 rows) must EXACTLY match the full-history
    recompute for the appended rows; re-running the same increment
    appends nothing; and full+incremental covers every post-cut row."""
    from pyspark.sql import functions as F

    from trading_etl_python_spark.jobs import incremental_backfill_job
    from trading_etl_python_spark.operators.indicators import indicator_table
    from trading_etl_python_spark.sources.tables import bars

    cut = "2024-01-24 04:09:15"
    out = str(tmp_path / "tbl")

    b = bars(spark, sf_dir)
    # seed the table with everything before the cut (full batch path)
    from trading_etl_python_spark.sinks import upsert_ignore

    pre = indicator_table(b.filter(F.col("time") < F.lit(cut)), warmup=None)
    upsert_ignore(pre, out, keys=("time", "symbol"))

    written = incremental_backfill_job(spark, sf_dir, out, since=cut)
    assert written > 0
    assert incremental_backfill_job(spark, sf_dir, out, since=cut) == 0  # idempotent

    got = spark.read.parquet(out).filter(F.col("time") >= F.lit(cut))
    want = indicator_table(b, warmup=None).filter(F.col("time") >= F.lit(cut))
    assert got.count() == want.count()

    bounded = ["time", "symbol", "sma_20", "bb_upper", "bb_lower", "stoch_k_14", "mfi_14"]
    g = {(r.time, r.symbol): r for r in got.select(*bounded).collect()}
    w = {(r.time, r.symbol): r for r in want.select(*bounded).collect()}
    assert g.keys() == w.keys()
    for k in w:
        for c in bounded[2:]:
            gv, wv = getattr(g[k], c), getattr(w[k], c)
            assert (gv is None and wv is None) or abs(gv - wv) < 1e-9, (k, c, gv, wv)


def test_export_training_data_job(spark, sf_dir, tmp_path):
    from trading_etl_python_spark.jobs import export_training_data_job

    m = export_training_data_job(spark, sf_dir, str(tmp_path / "out"), budget=256)
    assert set(m["splits"]) == {"train", "val", "test"}
    total = sum(v["packs"] for v in m["splits"].values())
    assert total > 0 and m["stats"]["pack_id"]["n_rows"] == total
    # deterministic re-export: identical manifest
    m2 = export_training_data_job(spark, sf_dir, str(tmp_path / "out2"), budget=256)
    assert m == m2
    # published parquet is shard-partitioned and readable
    t = spark.read.parquet(str(tmp_path / "out" / "train"))
    assert {"_grp", "pack_id", "n_docs", "sum_tokens", "first_id", "last_id",
            "split", "shard"} <= set(t.columns)


def test_export_training_data_job_tar_archives(spark, sf_dir, tmp_path):
    """tar_export publishes loader-ready WebDataset shards per split
    whose member counts equal the curated split sizes."""
    import os

    from trading_etl_python_spark.jobs import export_training_data_job
    from trading_etl_python_spark.operators.curation import curate_corpus
    from trading_etl_python_spark.operators.sampling import split_assign
    from trading_etl_python_spark.sources.formats import read_tar_shards
    from trading_etl_python_spark.sources.tables import load_table

    out = str(tmp_path / "exp")
    m = export_training_data_job(spark, sf_dir, out, n_shards=2, tar_export=True)
    curated = split_assign(curate_corpus(load_table(spark, sf_dir, "documents")))
    sizes = {
        r["split"]: r["n"]
        for r in curated.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    for split in ("train", "val", "test"):
        assert m["tar"][split] == sizes.get(split, 0)
        tdir = f"{out}/{split}_tar"
        assert os.path.isdir(tdir)
        back = read_tar_shards(spark, tdir)
        assert back.count() == sizes.get(split, 0)


def test_incremental_backfill_bounded_context_plan(spark, sf_dir, tmp_path):
    """Scale posture of the incremental recompute context: idle symbols
    drop via a broadcast LEFT-SEMI join before the window shuffle, and
    the history tail is a per-symbol row_number filter (no global
    sort) — the shapes that keep the increment O(affected keys), not
    O(history).  Pins the PRODUCTION context builder the job itself
    calls, not a test-local reconstruction."""
    from trading_etl_python_spark.jobs import _incremental_context

    ctx = _incremental_context(spark, sf_dir, since="2024-01-24 00:00:00")
    plan = ctx._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan and "Broadcast" in plan, plan[:2000]
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan  # the semi join must broadcast
