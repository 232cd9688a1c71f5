"""WebDataset tar shards as a first-class Spark DataSource (the Spark 4
Python DataSource API) — ``spark.read.format("tar_shards").load(path)``.

This is the formal-source twin of ``formats.read_tar_shards`` (which
rides ``binaryFile`` + ``mapInPandas``): same (shard, key, payload)
rows, but exposed through the DataSource V2 surface so shard archives
behave like any other table — one ``InputPartition`` PER ARCHIVE, so
parallelism equals shard count exactly (the training-loader contract),
each task streams members out of stdlib ``tarfile`` with no driver
involvement and without first materializing the whole archive as a
binaryFile row.  Parity with the mapInPandas reader is test-pinned.

Listing happens on the driver via glob (bounded: one entry per shard).
An object-store deployment swaps the glob for a Hadoop FS listing; the
per-partition read is already stream-shaped.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)


class TarShardDataSource(DataSource):
    """``format("tar_shards")`` — one row per tar member."""

    @classmethod
    def name(cls) -> str:
        return "tar_shards"

    def schema(self) -> str:
        return "shard string, key string, payload binary"

    def reader(self, schema) -> "TarShardReader":
        return TarShardReader(self.options)


class TarShardReader(DataSourceReader):
    def __init__(self, options) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("tar_shards: .load(path) is required")
        self.path = path

    def partitions(self):
        import glob
        import os

        return [
            InputPartition(p)
            for p in sorted(glob.glob(os.path.join(self.path, "*.tar")))
        ]

    def read(self, partition):
        import os
        import tarfile

        p = partition.value
        shard = os.path.basename(p)
        with tarfile.open(p) as tf:
            for m in tf.getmembers():
                if not m.isfile():
                    # directories/symlinks/hardlinks in foreign archives:
                    # extractfile() returns None
                    continue
                yield (shard, os.path.splitext(m.name)[0], tf.extractfile(m).read())


def register_tar_datasource(spark) -> None:
    """Idempotently register the source on the session."""
    spark.dataSource.register(TarShardDataSource)
