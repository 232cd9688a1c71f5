"""Multimodal column plumbing (driver-mandated extension, SURVEY.md §2.3).

Treats image/audio/video payloads as opaque ``binary`` columns with a
typed metadata struct.  The Spark-side machinery — schema, partitioning,
Arrow batch shape, mapInPandas signatures — is real and tested; the
actual codec work is STUBBED (this container has no image/audio libs):
``decode_media`` uses a deterministic fake decoder by default and raises
``NotImplementedError`` if a real codec is requested.

Scale notes: media rows are orders of magnitude wider than text rows, so
(1) metadata lives in its own columns to keep pruned scans narrow —
feature queries never touch the bytes; (2) ``mapInPandas`` streams
batches (never materializes a partition); (3) batch size is capped via
``spark.sql.execution.arrow.maxRecordsPerBatch`` by the caller when rows
are large.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("format", T.StringType()),  # png|wav|mp4|...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feat", T.ArrayType(T.FloatType())),
    ]
)


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Adapter: materialize a media table from the documents corpus so the
    binary plumbing is exercised on real driver testdata — payload is the
    utf-8 text bytes, metadata is synthesized deterministically."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("fake").alias("format"),
            (F.pmod("doc_id", 64) + 1).cast("int").alias("width"),
            (F.pmod("doc_id", 48) + 1).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes, n_feat: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder: bucket byte histogram,
    normalized.  Stable across runs/machines."""
    if payload is None:
        return [0.0] * n_feat
    counts = [0] * n_feat
    for by in payload:
        counts[by % n_feat] += 1
    total = max(1, len(payload))
    return [c / total for c in counts]


def decode_media(df: DataFrame, codec: str = "fake", batch_size_hint: int | None = None) -> DataFrame:
    """Decode/feature-extract over binary payloads with ``mapInPandas``
    (Arrow-batched; never loads a whole partition).  Only the 'fake'
    codec is implemented in this environment."""
    if codec != "fake":
        raise NotImplementedError(
            f"codec {codec!r} requires image/audio libraries not present in this "
            "container; the Spark plumbing (schema/batching/partitioning) is what "
            "this module provides — plug a real decoder into _fake_decode's slot."
        )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(lambda p: 0 if p is None else len(p)),
                    "feat": pdf["payload"].map(_fake_decode),
                }
            )

    return df.mapInPandas(decode, schema=FEATURE_SCHEMA)


def media_metadata_stats(df: DataFrame) -> DataFrame:
    """Metadata-only aggregate — MUST NOT read the payload column (column
    pruning keeps the scan narrow; verified in tests via the read schema)."""
    return df.select("media_id", "meta.*").groupBy("media_type", "format").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.avg(F.col("width") * F.col("height")).alias("avg_pixels"),
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType()),
    ]
)


def frame_sample(
    df: DataFrame, every_n: int = 10, frame_bytes: int = 256, codec: str = "fake"
) -> DataFrame:
    """Video frame sampling over binary payloads: emit every ``every_n``-th
    frame as its own row.  The 'fake' codec treats the payload as a dense
    array of fixed-size frames (``frame_bytes`` each) so the row-explosion
    plumbing — one wide input row fanning out to many frame rows inside a
    streaming Arrow batch — is real and tested; a real container parser
    (mp4/mkv keyframe index) plugs into the slicing step.

    Scale note: output rows >> input rows, so the caller should bound
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` and repartition AFTER
    sampling if a downstream shuffle follows (frames of one video stay in
    the producing task; no shuffle is introduced here)."""
    if codec != "fake":
        raise NotImplementedError(
            f"codec {codec!r} requires a video container parser not present in "
            "this container; only the deterministic fixed-stride 'fake' codec runs."
        )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            frames: list[bytes] = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                n_frames = len(payload) // frame_bytes
                for fi in range(0, n_frames, every_n):
                    ids.append(mid)
                    idxs.append(fi)
                    frames.append(bytes(payload[fi * frame_bytes : (fi + 1) * frame_bytes]))
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(sample, schema=FRAME_SCHEMA)


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize placeholder: passes metadata through with new dims;
    payload transformation requires a codec (NotImplementedError via
    decode_media for non-fake codecs)."""
    return df.withColumn(
        "meta",
        F.struct(
            F.col("meta.media_type"),
            F.col("meta.format"),
            F.lit(width).cast("int").alias("width"),
            F.lit(height).cast("int").alias("height"),
            F.col("meta.duration_ms"),
        ),
    )
