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
