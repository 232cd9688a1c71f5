"""Vector expression helpers over ArrayType(FloatType) embedding columns.

Pure higher-order-function expressions — JVM-evaluated, Catalyst-visible,
no UDF.  The fold in ``dot()`` accumulates left-to-right in doubles, which
is the same order DuckDB's ``list_sum(list_transform(...))`` uses — that
parity is what lets the similarity queries be value-hash oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ a_i*b_i in double precision, sequential fold."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; for unit-normalized embeddings this equals dot."""
    return dot(a, b) / F.nullif(norm(a) * norm(b), F.lit(0.0))
