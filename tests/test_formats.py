from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from trading_etl_python_spark.sources import formats as FMT
from trading_etl_python_spark.sources.tables import load_events, load_table


def _same_rows(a, b, key):
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, key


def test_documents_csv_roundtrip(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    with tempfile.TemporaryDirectory(prefix="csv_") as d:
        FMT.write_csv(docs, d)
        back = FMT.read_csv(spark, d, "documents")
        assert back.schema == FMT.CSV_SCHEMAS["documents"]
        _same_rows(docs, back, "documents/csv")


def test_events_jsonl_roundtrip(spark, sf_dir):
    ev = load_events(spark, sf_dir)
    with tempfile.TemporaryDirectory(prefix="jsonl_") as d:
        FMT.write_jsonl(ev, d)
        back = FMT.read_jsonl(spark, d, "events")
        _same_rows(
            ev.select("event_id", "user_id", "event_type", "value", "ts"),
            back.select("event_id", "user_id", "event_type", "value", "ts"),
            "events/jsonl",
        )


def test_csv_reader_does_no_inference_pass(spark, sf_dir):
    """The declared-schema read must not trigger an inference scan: the
    returned schema is exactly the canonical one even on an empty dir."""
    with tempfile.TemporaryDirectory(prefix="csv_empty_") as d:
        df = FMT.read_csv(spark, d, "events")
        assert df.schema == FMT.CSV_SCHEMAS["events"]
        assert df.count() == 0


def test_malformed_jsonl_rows_become_nulls(spark):
    """T7 error isolation: a bad line yields NULL fields, not a crash."""
    import os

    with tempfile.TemporaryDirectory(prefix="jsonl_bad_") as d:
        with open(os.path.join(d, "part.json"), "w") as f:
            f.write('{"event_id": 1, "user_id": 2, "value": 3.5}\n')
            f.write("this is not json\n")
            f.write('{"event_id": 4, "user_id": 5, "value": 6.5}\n')
        back = FMT.read_jsonl(spark, d, "events")
        assert back.count() == 3
        assert back.filter(F.col("event_id").isNull()).count() == 1
        assert back.filter(F.col("event_id").isNotNull()).count() == 2


def test_schema_evolution_merged_read(spark, tmp_path):
    """Old files (no `quality` column) and new files (with it) read as
    one table: mergeSchema surfaces the column, old rows yield NULL."""
    from trading_etl_python_spark.sources.formats import (
        align_union,
        read_merged_schema,
    )

    root = str(tmp_path / "evolving")
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, text string")
    v1.write.parquet(root + "/gen=1")
    v2 = spark.createDataFrame(
        [(3, "c", 0.9)], "doc_id long, text string, quality double"
    )
    v2.write.parquet(root + "/gen=2")

    merged = read_merged_schema(spark, root)
    assert set(merged.columns) == {"doc_id", "text", "quality", "gen"}
    rows = {r.doc_id: r.quality for r in merged.collect()}
    assert rows[1] is None and rows[2] is None and rows[3] == 0.9

    unioned = align_union(v1, v2)
    assert set(unioned.columns) == {"doc_id", "text", "quality"}
    assert unioned.where("quality IS NULL").count() == 2


def test_read_media_files_binary_source(spark, tmp_path):
    """binaryFile ingestion: bytes arrive intact, glob prunes at the
    listing, ids are stable across re-reads, and the result plugs into
    the multimodal decode plumbing."""
    import os

    from trading_etl_python_spark.operators.multimodal import decode_media
    from trading_etl_python_spark.sources.formats import read_media_files

    d = tmp_path / "media"
    os.makedirs(d)
    payloads = {f"img_{i}.png": bytes([i] * (10 + i)) for i in range(5)}
    (d / "notes.txt").write_bytes(b"not media")
    for name, data in payloads.items():
        (d / name).write_bytes(data)

    media = read_media_files(spark, str(d), glob="*.png")
    rows = media.collect()
    assert len(rows) == 5  # the .txt never entered the scan
    by_path = {os.path.basename(r.source_path): r for r in rows}
    for name, data in payloads.items():
        assert bytes(by_path[name].payload) == data
        assert by_path[name].n_bytes == len(data)
        assert by_path[name].meta.format == "png"
    # stable ids across re-ingest
    again = {r.media_id for r in read_media_files(spark, str(d), glob="*.png").collect()}
    assert again == {r.media_id for r in rows}
    # plugs into the decode pipeline (fake codec — no media libs here)
    feats = decode_media(media.select("media_id", "payload", "meta")).collect()
    assert len(feats) == 5 and all(len(f.feat) == 8 for f in feats)


def test_avro_contract_fails_only_on_provider_lookup(spark, tmp_path):
    """Avro is an external built-in: in this jar-less container the
    write must fail at DATA SOURCE LOOKUP (with Spark's deploy guidance),
    never at schema analysis — so shipping the spark-avro jar is the
    only delta for a real deployment."""
    import pytest

    from trading_etl_python_spark.sources.formats import write_avro

    df = spark.range(3).selectExpr("id", "cast(id as string) AS s")
    with pytest.raises(Exception) as ei:
        write_avro(df, str(tmp_path / "a"))
    msg = str(ei.value)
    assert "Failed to find data source: avro" in msg or "avro" in msg.lower()
    assert "AnalysisException" not in type(ei.value).__name__ or "find data source" in msg


def test_tar_shards_roundtrip(spark, tmp_path):
    """WebDataset-style shard write -> read roundtrip: every document
    survives byte-exact, shard assignment is the portable hash (stable
    across runs), and member order inside each tar is deterministic."""
    import hashlib
    import tarfile

    from trading_etl_python_spark.sources.formats import (
        read_tar_shards,
        write_tar_shards,
    )
    from trading_etl_python_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        F.col("doc_id").cast("string").alias("key"),
        F.col("text").cast("binary").alias("payload"),
    )
    out = str(tmp_path / "shards")
    write_tar_shards(docs, out, n_shards=4)

    files = sorted(p.name for p in (tmp_path / "shards").iterdir())
    assert files == [f"shard-{i:05d}.tar" for i in range(4)]

    back = read_tar_shards(spark, out)
    got = {r.key: bytes(r.payload) for r in back.collect()}
    want = {r.key: bytes(r.payload) for r in docs.collect()}
    assert got == want

    # shard membership is the portable hash of the key
    for r in back.collect():
        h = int(hashlib.md5(r.key.encode()).hexdigest()[:8], 16) % 4
        assert r.shard == f"shard-{h:05d}.tar"

    # archives are byte-reproducible (mtime pinned, members sorted)
    with tarfile.open(str(tmp_path / "shards" / files[0])) as tf:
        names = [m.name for m in tf.getmembers()]
        assert names == sorted(names)
        assert all(m.mtime == 0 for m in tf.getmembers())


def test_tar_datasource_matches_mapinpandas_reader(spark, sf_dir, tmp_path):
    """spark.read.format('tar_shards') (Python DataSource API) must
    return exactly what the binaryFile+mapInPandas reader returns, with
    one partition per archive."""
    from pyspark.sql import functions as F

    from trading_etl_python_spark.sources.formats import (
        read_tar_shards,
        write_tar_shards,
    )
    from trading_etl_python_spark.sources.tables import load_table
    from trading_etl_python_spark.sources.tar_datasource import (
        register_tar_datasource,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("key"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    out = str(tmp_path / "shards")
    write_tar_shards(docs, out, n_shards=4)

    register_tar_datasource(spark)
    via_ds = spark.read.format("tar_shards").load(out)
    assert via_ds.rdd.getNumPartitions() == 4  # one per archive
    a = {(r.shard, r.key, bytes(r.payload)) for r in via_ds.collect()}
    b = {
        (r.shard, r.key, bytes(r.payload))
        for r in read_tar_shards(spark, out).collect()
    }
    assert a == b and len(a) > 0


def test_tar_datasource_writer_roundtrip(spark, tmp_path):
    """Write path through the Spark 4 DataSource surface: two-phase
    commit, one archive per partition, overwrite leaves no stale
    shards, bytes survive the roundtrip."""
    import os

    from pyspark.sql import functions as F

    from trading_etl_python_spark.sources.tar_datasource import (
        write_tar_shards_ds,
    )

    df = spark.createDataFrame(
        [(f"doc{i}", bytes(f"payload-{i}", "utf8")) for i in range(20)],
        ["key", "payload"],
    )
    d = str(tmp_path / "shards")
    write_tar_shards_ds(df, d, n_shards=4)
    files = sorted(os.listdir(d))
    assert files and all(f.endswith(".tar") for f in files)
    back = spark.read.format("tar_shards").load(d)
    rows = {(r["key"], bytes(r["payload"])) for r in back.collect()}
    assert rows == {(f"doc{i}", bytes(f"payload-{i}", "utf8")) for i in range(20)}
    # overwrite with a smaller dataset must leave no stale archives
    write_tar_shards_ds(df.limit(5), d, n_shards=2)
    assert spark.read.format("tar_shards").load(d).count() == 5
    assert not [f for f in os.listdir(d) if ".tmp-" in f]
