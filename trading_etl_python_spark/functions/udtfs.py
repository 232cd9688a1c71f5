"""Python user-defined TABLE functions (Spark 4 ``@udtf``) — the
engine's row-to-rows extensibility surface, registered for LATERAL
joins in SQL.

Positioning (SURVEY.md §7.4 discipline): every UDTF here has a pure
JVM-expression twin that IS the production path — the UDTF exists so a
user extending the engine with logic Spark can't express gets the
documented, tested on-ramp (register -> LATERAL -> parity-test against
a batch twin), not because these particular kernels need Python.  The
``useArrow`` flag requests the Arrow-optimized transfer path added in
Spark 4 (per-batch columnar exchange rather than pickled rows).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(
    returnType="chunk_id: bigint, n_tokens: bigint, chunk_text: string",
    useArrow=True,
)
class ChunkUDTF:
    """Overlapping word-window chunking, one row in -> one row per
    chunk: the UDTF twin of ``operators/text.doc_chunks`` (same
    last-start bound: the first chunk reaching the document end is the
    last).  Parity with the JVM path is test-pinned
    (tests/test_text.py::test_chunk_udtf_matches_doc_chunks)."""

    def eval(self, text: str, window: int, stride: int):  # noqa: D102
        if text is None:
            return  # parity: doc_chunks' posexplode drops NULL-text rows
        words = text.split(" ")
        n = len(words)
        st = 0
        cid = 0
        while True:
            yield (
                cid,
                min(window, n - st),
                " ".join(words[st : st + window]),
            )
            if st + window >= n:
                break
            st += stride
            cid += 1


def register_udtfs(spark: SparkSession) -> None:
    """Register all engine UDTFs on the session (idempotent)."""
    spark.udtf.register("chunk_udtf", ChunkUDTF)
