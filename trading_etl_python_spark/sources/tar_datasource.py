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
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)


class TarShardDataSource(DataSource):
    """``format("tar_shards")`` — one row per tar member; write support
    emits one archive per input partition (the caller chooses shard
    count/assignment by repartitioning — see ``write_tar_shards_ds``)."""

    @classmethod
    def name(cls) -> str:
        return "tar_shards"

    def schema(self) -> str:
        return "shard string, key string, payload binary"

    def reader(self, schema) -> "TarShardReader":
        return TarShardReader(self.options)

    def writer(self, schema, overwrite: bool) -> "TarShardWriter":
        return TarShardWriter(self.options, overwrite)


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

        import pyarrow as pa

        p = partition.value
        shard = os.path.basename(p)
        # Arrow batches instead of per-row tuples (r14, guide §4): the
        # row path pickles every (shard, key, payload) triple
        # individually through the Python worker; batching the members
        # into RecordBatches moves the same bytes in a few columnar
        # buffers.  Batches cut at ~32 MB of payload (or 1024 members)
        # to bound worker memory on fat archives.
        keys: list[str] = []
        payloads: list[bytes] = []
        nbytes = 0

        def flush():
            batch = pa.record_batch(
                [
                    pa.array([shard] * len(keys), pa.string()),
                    pa.array(keys, pa.string()),
                    pa.array(payloads, pa.binary()),
                ],
                names=["shard", "key", "payload"],
            )
            keys.clear()
            payloads.clear()
            return batch

        with tarfile.open(p) as tf:
            for m in tf.getmembers():
                if not m.isfile():
                    # directories/symlinks/hardlinks in foreign archives:
                    # extractfile() returns None
                    continue
                keys.append(os.path.splitext(m.name)[0])
                payloads.append(tf.extractfile(m).read())
                nbytes += len(payloads[-1])
                if len(keys) >= 1024 or nbytes >= 32 << 20:
                    yield flush()
                    nbytes = 0
            if keys:
                yield flush()


class TarShardWriter(DataSourceWriter):
    """One tar per input partition, written task-side to a temp name and
    ``os.replace``d at COMMIT time — the two-phase task-commit protocol
    through the DataSource surface: a failed/speculatively-retried task
    leaves only invisible ``.tmp-*`` orphans (readers glob ``*.tar``),
    and the job's effects appear atomically when the driver commits.

    Input rows are (key string, payload binary).  Shard naming uses the
    task's partition id; shard count/assignment is the caller's
    repartition — the same contract as ``formats.write_tar_shards``."""

    def __init__(self, options, overwrite: bool) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("tar_shards: .save(path) is required")
        self.path = path
        self.overwrite = overwrite

    def write(self, iterator) -> WriterCommitMessage:
        import io
        import os
        import tarfile
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        rows = sorted(
            ((r[0], bytes(r[1])) for r in iterator), key=lambda kv: kv[0]
        )
        if not rows:
            return WriterCommitMessage()
        os.makedirs(self.path, exist_ok=True)
        out = os.path.join(self.path, f"shard-{pid:05d}.tar")
        tmp = f"{out}.tmp-{uuid.uuid4().hex}"
        with tarfile.open(tmp, "w") as tf:
            for k, payload in rows:
                info = tarfile.TarInfo(name=f"{k}.bin")
                info.size = len(payload)
                info.mtime = 0  # byte-reproducible archives
                tf.addfile(info, io.BytesIO(payload))
        msg = WriterCommitMessage()
        msg.tmp, msg.final, msg.n = tmp, out, len(rows)
        return msg

    def commit(self, messages) -> None:
        import os

        if self.overwrite and os.path.isdir(self.path):
            for old in os.listdir(self.path):
                if old.endswith(".tar"):
                    os.remove(os.path.join(self.path, old))
        for m in messages:
            if m is not None and getattr(m, "tmp", None):
                os.replace(m.tmp, m.final)

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None and getattr(m, "tmp", None):
                try:
                    os.remove(m.tmp)
                except OSError:
                    pass


def write_tar_shards_ds(
    df,
    path: str,
    n_shards: int = 4,
    key_col: str = "key",
    payload_col: str = "payload",
) -> None:
    """Write (key, payload) rows as tar shards through the DataSource
    surface: portable-hash shard assignment (same bucketing as
    ``formats.write_tar_shards``, so re-exports are reproducible), one
    archive per partition, two-phase commit."""
    from pyspark.sql import functions as F

    from ..operators.sampling import hash_bucket

    register_tar_datasource(df.sparkSession)
    (
        df.select(
            F.col(key_col).cast("string").alias("key"),
            F.col(payload_col).cast("binary").alias("payload"),
            hash_bucket(F.col(key_col), n_shards).alias("_shard"),
        )
        .repartition(n_shards, "_shard")
        .select("key", "payload")
        .write.format("tar_shards")
        .mode("overwrite")
        .option("path", path)
        .save()
    )


def register_tar_datasource(spark) -> None:
    """Idempotently register the source on the session."""
    spark.dataSource.register(TarShardDataSource)
