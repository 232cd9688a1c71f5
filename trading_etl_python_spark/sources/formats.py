"""Alternate source formats — CSV and JSON-lines readers with DECLARED
schemas, plus matching writers for round-trip interchange.

The reference hand-declares its schema at every hop and never infers
(SURVEY.md §1.3; wire parse at consumer.py:146-149, column projection at
backfill.py:137).  These adapters follow the same discipline: every read
takes an explicit ``StructType``, so a malformed file surfaces as NULL
columns (PERMISSIVE, T7 error isolation) rather than a silently-wrong
inferred schema — and, at scale, schema inference's extra full scan of
the data never happens.

Scale notes: CSV/JSONL are row-oriented interchange formats — fine as
ingest edges, wrong as the analytical store.  ``to_parquet_table`` is
the landing step (columnar, partition-pruned, statistics) that every
pipeline should run before heavy queries.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# canonical wire schemas for the tables that commonly arrive as flat files
CSV_SCHEMAS: dict[str, T.StructType] = {
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
}


def read_csv(spark: SparkSession, path: str, table: str) -> DataFrame:
    """CSV scan with the declared schema — no inference pass, malformed
    rows produce NULLs (PERMISSIVE) for the caller's null_filter."""
    schema = CSV_SCHEMAS[table]
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


# default NTZ JSON format truncates to milliseconds; timestamps here are
# microsecond-precision end-to-end (see session docstring), so pin it
_TS_NTZ_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


def read_jsonl(spark: SparkSession, path: str, table: str) -> DataFrame:
    """JSON-lines scan with the declared schema.  Spark's json source is
    schema-first here too: no sampling pass, unknown fields dropped,
    missing fields NULL."""
    schema = CSV_SCHEMAS[table]
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("timestampNTZFormat", _TS_NTZ_FMT)
        .json(path)
    )


def write_csv(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option("header", "true").csv(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option("timestampNTZFormat", _TS_NTZ_FMT).json(path)


def to_parquet_table(df: DataFrame, path: str) -> None:
    """Land an ingest-edge frame as the columnar analytical store."""
    df.write.mode("overwrite").parquet(path)


def write_orc(df: DataFrame, path: str) -> None:
    """ORC writer — Spark's second first-class columnar format (native
    reader/writer, predicate pushdown, column pruning)."""
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan.  Columnar + statistics like parquet; schema travels with
    the file so no declared schema is needed."""
    return spark.read.orc(path)


def read_merged_schema(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan across schema generations: ``mergeSchema`` unions
    the footer schemas of every file, so rows written before a column
    existed surface it as NULL.

    The reference freezes one 21-column DDL forever (setup.py drops and
    recreates the table, SURVEY.md §2.1 S6); a long-lived 100 TB dataset
    instead ACCRETES columns — new files carry them, old files don't.
    Per-file footer merging is metadata-only: no data rewrite, no extra
    scan pass, and column pruning still reaches every file (a file
    lacking a pruned column just yields NULLs without being read).
    """
    return spark.read.option("mergeSchema", "true").parquet(path)


def align_union(older: DataFrame, newer: DataFrame) -> DataFrame:
    """Union two schema generations by COLUMN NAME, filling columns
    missing on either side with NULL (``allowMissingColumns``) — the
    in-plan equivalent of ``read_merged_schema`` for DataFrames that
    did not come from the same parquet root.

    Positional ``UNION ALL`` silently mis-binds when generations
    reordered or inserted columns; by-name alignment is the only safe
    union across schema drift. Pure narrow op — no shuffle.
    """
    return older.unionByName(newer, allowMissingColumns=True)


def read_media_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    media_type: str = "image",
    fmt: str | None = None,
) -> DataFrame:
    """Ingest raw media files with Spark's built-in ``binaryFile``
    source into the multimodal MEDIA shape (operators/multimodal.py):
    (media_id, payload, meta) with the file path carried in meta.source
    — the on-ramp from an object-store prefix of images/audio into the
    opaque-binary-column pipeline.

    Scale posture: binaryFile lists files on executors and each file is
    one row read WHOLE (no splitting), so parallelism = file count and
    per-task memory is bounded by the largest file — right for media
    objects, wrong for large archives (shard those upstream).
    ``pathGlobFilter`` prunes at the LISTING, before any bytes move;
    ``spark.sql.files.maxPartitionBytes`` packs small files per task.
    media_id = xxhash64(path): stable across re-ingests of the same
    layout, so downstream dedup/upserts are idempotent."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(path)
    from pyspark.sql import functions as F

    ext = F.regexp_extract(F.col("path"), r"\.([A-Za-z0-9]+)$", 1)
    return raw.select(
        F.xxhash64("path").alias("media_id"),
        F.col("content").alias("payload"),
        F.struct(
            F.lit(media_type).alias("media_type"),
            (F.lit(fmt) if fmt is not None else F.lower(ext)).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
        F.col("path").alias("source_path"),
        F.col("length").alias("n_bytes"),
    )


def write_avro(df: DataFrame, path: str) -> None:
    """Avro out — the row-oriented wire/archive format.  Spark treats
    avro as an EXTERNAL built-in (`spark-avro` jar, shipped with every
    distro but not the bare PyPI pyspark): in jar-less environments the
    write fails at provider lookup with Spark's deploy-instruction
    error, never at analysis — contract pinned by
    tests/test_formats.py, same posture as the kafka sink."""
    df.write.format("avro").mode("overwrite").save(path)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.format("avro").load(path)


def write_tar_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 4,
    key_col: str = "key",
    payload_col: str = "payload",
    member_suffix: str = ".txt",
) -> dict[int, int]:
    """Write (key, payload-bytes) rows as WebDataset-style tar shards —
    the sharded-archive layout training loaders stream (one tar per
    shard, one member per sample, member name = sample key).  Shard
    assignment is the portable hash of the key (reproducible across
    runs/engines — mid-epoch resume safe, same guarantee as
    ``export_training_data_job``'s parquet shards).

    Scale shape: one hash(shard) exchange, then each task streams ITS
    shard's members through stdlib ``tarfile`` straight to disk via
    ``applyInPandas`` — one tar per task, no driver involvement,
    archive size bounded by shard count choice.  Each archive is
    written to a task-private temp name and atomically ``os.replace``d
    into place (the task-commit protocol: a killed or speculatively
    retried task never leaves a truncated/interleaved tar), and any
    pre-existing ``*.tar`` under ``path`` is removed first so re-export
    with fewer shards (or a shrunk corpus) cannot leave stale members —
    overwrite semantics, same as the parquet writers.  (Local
    filesystem paths here; an object-store deployment points the same
    writer at a fuse mount or writes via a hadoop OutputStream.)

    Returns the shard manifest {shard: member_count} collected from the
    write tasks themselves (no read-back pass)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from ..operators.sampling import hash_bucket

    os.makedirs(path, exist_ok=True)
    for old_tar in os.listdir(path):
        # stale .tmp-<uuid> files are orphans from killed/speculatively
        # retried tasks — readers glob *.tar so they're invisible, but
        # left alone they accumulate without bound
        if old_tar.endswith(".tar") or ".tmp-" in old_tar:
            os.remove(os.path.join(path, old_tar))
    keyed = df.select(
        F.col(key_col).cast("string").alias("k"),
        F.col(payload_col).cast("binary").alias("p"),
        hash_bucket(F.col(key_col), n_shards).alias("_shard"),
    )

    def write_shard(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import io
        import tarfile

        if len(pdf) == 0:
            return pd.DataFrame({"shard": [], "n": []})
        import uuid

        shard = int(pdf["_shard"].iloc[0])
        pdf = pdf.sort_values("k")  # deterministic member order
        out = os.path.join(path, f"shard-{shard:05d}.tar")
        tmp = f"{out}.tmp-{uuid.uuid4().hex}"
        with tarfile.open(tmp, "w") as tf:
            for k, p in zip(pdf["k"], pdf["p"]):
                data = bytes(p)
                info = tarfile.TarInfo(name=f"{k}{member_suffix}")
                info.size = len(data)
                info.mtime = 0  # reproducible archives
                tf.addfile(info, io.BytesIO(data))
        os.replace(tmp, out)  # atomic task commit
        return pd.DataFrame({"shard": [shard], "n": [len(pdf)]})

    rows = (
        keyed.repartition(n_shards, "_shard")
        .groupBy("_shard")
        .applyInPandas(write_shard, "shard int, n long")
        .collect()  # the tiny (shard, count) manifest drives the job
    )
    return {int(r["shard"]): int(r["n"]) for r in rows}


def read_tar_shards(spark: SparkSession, path: str) -> DataFrame:
    """Read WebDataset-style tar shards back into (shard, key, payload)
    rows: ``binaryFile`` lists the archives (one row per tar, listing
    on executors), and ``mapInPandas`` streams each archive's members
    out of stdlib ``tarfile`` — Arrow-batched, no Python per-row loop
    over the hot path, no driver involvement.  Parallelism = shard
    count, the same contract the training loader has."""
    import pandas as pd

    raw = spark.read.format("binaryFile").option(
        "pathGlobFilter", "*.tar"
    ).load(path)

    def explode_members(batches):
        import io
        import os as _os
        import tarfile

        for pdf in batches:
            for p, content in zip(pdf["path"], pdf["content"]):
                shard = _os.path.basename(p)
                with tarfile.open(fileobj=io.BytesIO(bytes(content))) as tf:
                    names, keys, payloads = [], [], []
                    for m in tf.getmembers():
                        if not m.isfile():
                            # directories/symlinks/hardlinks in foreign
                            # archives: extractfile() returns None
                            continue
                        names.append(shard)
                        keys.append(_os.path.splitext(m.name)[0])
                        payloads.append(tf.extractfile(m).read())
                yield pd.DataFrame(
                    {"shard": names, "key": keys, "payload": payloads}
                )

    return raw.select("path", "content").mapInPandas(
        explode_members, "shard string, key string, payload binary"
    )
