from __future__ import annotations

import os

from pyspark.sql import functions as F

from trading_etl_python_spark.sinks import upsert_ignore, write_indicator_table
from trading_etl_python_spark.sources.tables import bars


def _sample(spark, sf_dir, n=200):
    return bars(spark, sf_dir).orderBy("event_id").limit(n)


def test_write_partitions_by_date(spark, sf_dir, tmp_path):
    path = str(tmp_path / "tbl")
    write_indicator_table(_sample(spark, sf_dir), path)
    parts = [d for d in os.listdir(path) if d.startswith("trade_date=")]
    assert parts, "expected hive-style trade_date= partition dirs"
    back = spark.read.parquet(path)
    assert back.count() == 200
    # partition pruning: a one-day filter must not scan every partition
    one_day = back.select("trade_date").first()[0]
    plan = (
        back.filter(F.col("trade_date") == F.lit(one_day))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "partition filters: [isnotnull(trade_date" in plan.lower() or "PartitionFilters" in plan


def test_upsert_ignore_is_idempotent(spark, sf_dir, tmp_path):
    path = str(tmp_path / "tbl")
    batch = _sample(spark, sf_dir)
    assert upsert_ignore(batch, path) == 200
    assert upsert_ignore(batch, path) == 0  # exact replay: ON CONFLICT DO NOTHING
    assert spark.read.parquet(path).count() == 200


def test_upsert_ignore_write_is_clustered_by_partition(spark, sf_dir, tmp_path):
    """r13 (guide §6): the append is clustered by an explicit
    repartition on (partition value, PK-hash bucket), so a small batch
    writes ~one file per touched date instead of (write tasks) x
    (dates) tiny files — measured 736 -> 23 files and a 5x faster
    write on the sf0.1 backfill seed.  Bound: no more files than
    touched partitions (the k sub-bucket split only engages above
    SPARK_GRAFT_UPSERT_ROWS_PER_FILE rows per date, and nothing here
    is near it)."""
    import glob

    path = str(tmp_path / "tbl")
    batch = _sample(spark, sf_dir)
    upsert_ignore(batch, path)
    parts = [d for d in os.listdir(path) if d.startswith("trade_date=")]
    files = glob.glob(os.path.join(path, "trade_date=*", "*.parquet"))
    assert len(files) <= len(parts)


def test_upsert_ignore_null_partition_stays_idempotent(spark):
    """NULL time -> NULL trade_date partition; isin() semantics must not
    silently drop it from the existing-keys read (it would re-append the
    same keys on every replay)."""
    import datetime as dt

    batch_rows = [
        (dt.datetime(2024, 1, 1, 12), 1, 10.0),
        (None, 2, 20.0),
    ]
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/tbl"
        spark_df = lambda: spark.createDataFrame(  # noqa: E731
            batch_rows, "time timestamp, symbol long, v double"
        )
        assert upsert_ignore(spark_df(), path) == 2
        assert upsert_ignore(spark_df(), path) == 0
        assert spark.read.parquet(path).count() == 2


def test_touched_partition_collect_is_capped(spark):
    """The driver-side touched-partition list fails fast past the cap
    (r3 VERDICT #7) instead of collecting an unbounded list — the 100x
    posture for a mis-chosen (near-unique) partition column."""
    import pytest

    from trading_etl_python_spark.sinks.parquet import collect_touched_partitions

    df = spark.range(10).select(F.col("id").alias("d"))
    got = collect_touched_partitions(df, "d", max_partitions=10)
    assert sorted(got) == list(range(10))
    with pytest.raises(ValueError, match="distinct 'd' partitions"):
        collect_touched_partitions(df, "d", max_partitions=3)


def test_upsert_ignore_appends_only_new_keys(spark, sf_dir, tmp_path):
    path = str(tmp_path / "tbl")
    all_rows = _sample(spark, sf_dir, 300)
    first, second = all_rows.limit(200), all_rows  # 200-row overlap
    upsert_ignore(first, path)
    upsert_ignore(second, path)
    got = spark.read.parquet(path)
    assert got.count() == 300
    assert got.select("time", "symbol").distinct().count() == 300


def test_upsert_ignore_dedups_within_batch(spark, sf_dir, tmp_path):
    path = str(tmp_path / "tbl")
    batch = _sample(spark, sf_dir, 100)
    upsert_ignore(batch.union(batch), path)  # duplicate keys inside one batch
    assert spark.read.parquet(path).count() == 100


def test_bucketed_join_skips_shuffle(spark, sf_dir):
    """Two tables bucketed on the same key must join with ZERO exchanges
    on the fact sides — the write-time bucketing IS the shuffle."""
    from pyspark.sql import functions as F

    from trading_etl_python_spark.sinks.parquet import write_bucketed
    from trading_etl_python_spark.sources.tables import load_events

    ev = load_events(spark, sf_dir)
    write_bucketed(ev.select("event_id", "user_id", "value"), "ev_bucketed", "user_id", 8)
    write_bucketed(
        ev.select("user_id").distinct().withColumn("grp", F.pmod("user_id", F.lit(3))),
        "users_bucketed", "user_id", 8,
    )
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast
        joined = spark.table("ev_bucketed").join(spark.table("users_bucketed"), "user_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan[:1500]
        assert joined.count() == ev.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS ev_bucketed")
        spark.sql("DROP TABLE IF EXISTS users_bucketed")


def test_upsert_replace_touches_only_present_partitions(spark, tmp_path):
    """Dynamic partition overwrite: a refresh carrying only day-2 data
    must replace day-2 and leave day-1 byte-identical."""
    from trading_etl_python_spark.sinks import upsert_replace

    path = str(tmp_path / "rollup")
    d1 = [(1, "2024-01-01 10:00:00", 10.0), (1, "2024-01-01 11:00:00", 11.0)]
    d2 = [(1, "2024-01-02 10:00:00", 20.0)]
    schema = "symbol long, time timestamp_ntz, v double"
    base = spark.createDataFrame(
        [(s, __import__("datetime").datetime.fromisoformat(t), v) for s, t, v in d1 + d2],
        schema,
    )
    upsert_replace(base, path)
    # refresh: day-2 recomputed with a different value; day-1 absent
    refresh = spark.createDataFrame(
        [(1, __import__("datetime").datetime.fromisoformat("2024-01-02 10:00:00"), 99.0)],
        schema,
    )
    upsert_replace(refresh, path)
    rows = {
        (r.symbol, str(r.time), r.v) for r in spark.read.parquet(path).collect()
    }
    assert rows == {
        (1, "2024-01-01 10:00:00", 10.0),
        (1, "2024-01-01 11:00:00", 11.0),
        (1, "2024-01-02 10:00:00", 99.0),
    }


def test_compact_partitions_reduces_files_preserves_rows(spark, sf_dir, tmp_path):
    import glob

    from trading_etl_python_spark.sinks.parquet import compact_partitions

    df = _sample(spark, sf_dir).repartition(8)  # 8 files per date partition
    path = str(tmp_path / "frag")
    from trading_etl_python_spark.sinks.parquet import with_partition_col

    with_partition_col(df).write.partitionBy("trade_date").parquet(path)
    before = glob.glob(f"{path}/trade_date=*/*.parquet")
    per_part_before = len(before) / len(glob.glob(f"{path}/trade_date=*"))
    assert per_part_before > 1  # genuinely fragmented

    rows_before = sorted(
        tuple(r) for r in spark.read.parquet(path).drop("trade_date").collect()
    )
    compact_partitions(spark, path)
    after = glob.glob(f"{path}/trade_date=*/*.parquet")
    assert len(after) == len(glob.glob(f"{path}/trade_date=*"))  # 1 file each
    rows_after = sorted(
        tuple(r) for r in spark.read.parquet(path).drop("trade_date").collect()
    )
    assert rows_after == rows_before  # lossless


def test_write_sorted_rowgroups_are_ordered(spark, sf_dir, tmp_path):
    import glob

    import pyarrow.parquet as pq

    from trading_etl_python_spark.sinks.parquet import write_sorted

    df = _sample(spark, sf_dir).repartition(4)  # deliberately unordered input
    path = str(tmp_path / "sorted")
    write_sorted(df, path)
    for f in glob.glob(f"{path}/trade_date=*/*.parquet"):
        t = pq.read_table(f, columns=["symbol", "time"]).to_pandas()
        assert list(t.itertuples(index=False)) == sorted(
            t.itertuples(index=False), key=lambda r: (r.symbol, r.time)
        ), f"file {f} not sorted"


def test_zorder_write_bounds_both_columns(spark, sf_dir, tmp_path):
    """Z-order layout: every output file covers a small hypercube of the
    (user_id, value) key space — per-file min/max spread must be well
    under the global range on BOTH columns (a linear sort can only
    achieve this on its leading column), so parquet stats prune files
    for filters on either column."""
    import pyarrow.parquet as pq

    from trading_etl_python_spark.sinks.parquet import write_zordered
    from trading_etl_python_spark.sources.tables import load_events

    ev = load_events(spark, sf_dir).select("event_id", "ts", "user_id", "value")
    out = str(tmp_path / "z")
    write_zordered(ev, out, cols=("user_id", "value"), num_files=8)

    back = spark.read.parquet(out)
    assert back.count() == ev.count()

    import glob

    spans = {"user_id": [], "value": []}
    globals_ = {}
    for c in spans:
        row = ev.agg(F.min(c), F.max(c)).collect()[0]
        globals_[c] = float(row[1]) - float(row[0])
    files = glob.glob(out + "/*.parquet")
    assert len(files) >= 4
    for f in files:
        md = pq.read_metadata(f)
        for c in spans:
            idx = md.schema.names.index(c)
            mn = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
            mx = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
            spans[c].append((float(mx) - float(mn)) / globals_[c])
    for c, fr in spans.items():
        avg = sum(fr) / len(fr)
        assert avg <= 0.6, (c, fr)
