"""Deterministic scale-up generator for the driver's synthetic testdata.

Usage:
    python tools/gen_scale.py /root/testdata/sf0.1 /root/repo/testdata_sf1 10

Produces a schema-compatible dataset at ``factor``x the source's row
counts, for scaling sweeps (is any query super-linear?) beyond the
largest driver-provided sf.  Strategy per table family:

- region/nation: copied verbatim (TPC-H dimension tables are constant
  across scale factors).
- customer/supplier/part/orders/lineitem/events: ``factor`` key-shifted
  copies; every foreign key is shifted by the SAME per-copy stride as
  its referenced table, so referential integrity and join fan-outs are
  preserved within each copy (the same construction dbgen uses for its
  independent key segments).  Event timestamps keep the source's 30-day
  window — scaling densifies the stream (more users, same wall span),
  which is how real event volume grows.
- documents/embeddings: REGENERATED from the source's empirical
  distributions (vocabulary, length-in-words, lang/source mix, exact-
  duplicate rate; unit-norm float32 vectors with uniform labels) with a
  fixed seed rather than copied — verbatim copies would make every doc
  near-identical to factor-1 others and blow the near-dup pair space
  quadratically, which is a different (and unrepresentative) workload.

Everything is seeded; two runs produce byte-identical tables.
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

COPY_TABLES = ["region", "nation"]
# table -> (primary key, {fk_col: referenced_table}) ; stride = max(pk)+1
SHIFT_TABLES: dict[str, tuple[str, dict[str, str]]] = {
    "customer": ("c_custkey", {}),
    "supplier": ("s_suppkey", {}),
    "part": ("p_partkey", {}),
    "orders": ("o_orderkey", {"o_custkey": "customer"}),
    # l_orderkey is an FK to orders, NOT a lineitem-local key: it must
    # shift by the ORDERS stride, or childless top orders (which exist
    # in the corpus) would desynchronize the two strides and collide
    # copy i's lineitems into copy i-1's order key range
    "lineitem": (
        "l_orderkey",
        {"l_orderkey": "orders", "l_partkey": "part", "l_suppkey": "supplier"},
    ),
    "events": ("event_id", {"user_id": "events_user"}),
}


def _stride(con, src: str, table: str, key: str) -> int:
    if table == "events_user":
        return (
            con.execute(
                f"SELECT max(user_id) + 1 FROM '{src}/events.parquet'"
            ).fetchone()[0]
        )
    return con.execute(
        f"SELECT max({key}) + 1 FROM '{src}/{table}.parquet'"
    ).fetchone()[0]


def scale_relational(con, src: str, out: str, factor: int) -> None:
    strides = {
        t: _stride(con, src, t, k) for t, (k, _) in SHIFT_TABLES.items()
    }
    strides["events_user"] = _stride(con, src, "events_user", "")
    for t in COPY_TABLES:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{out}/{t}.parquet' (FORMAT parquet)"
        )
        print(f"  {t}: copied")
    for t, (pk, fks) in SHIFT_TABLES.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'"
            ).fetchall()
        ]
        selects = []
        for i in range(factor):
            exprs = []
            for c in cols:
                # FK mapping wins over the pk rule (l_orderkey is both
                # lineitem's sort key and an FK into orders)
                if c in fks:
                    exprs.append(f"{c} + {i * strides[fks[c]]} AS {c}")
                elif c == pk:
                    exprs.append(f"{c} + {i * strides[t]} AS {c}")
                else:
                    exprs.append(c)
            selects.append(
                f"SELECT {', '.join(exprs)} FROM '{src}/{t}.parquet'"
            )
        con.execute(
            f"COPY ({' UNION ALL '.join(selects)}) TO '{out}/{t}.parquet' (FORMAT parquet)"
        )
        n = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"  {t}: {n} rows")


def scale_documents(con, src: str, out: str, factor: int, seed: int = 12345) -> None:
    rng = np.random.default_rng(seed)
    rows = con.execute(
        f"SELECT text, lang, source FROM '{src}/documents.parquet'"
    ).fetchall()
    n_src = len(rows)
    # pre-convert to ndarray: rng.choice(list) re-converts per call —
    # identical draws, ~10x faster at the sf10 doc count (500k docs)
    vocab = np.array(sorted({w for r in rows for w in r[0].split()}))
    lens = np.array([len(r[0].split()) for r in rows])
    mix = [(r[1], r[2]) for r in rows]
    n_dups = con.execute(
        f"SELECT count(*) - count(DISTINCT text) FROM '{src}/documents.parquet'"
    ).fetchone()[0]
    n_out = n_src * factor
    texts: list[str] = []
    for _ in range(n_out):
        L = int(lens[rng.integers(0, n_src)])
        texts.append(" ".join(rng.choice(vocab, size=L)))
    # reproduce the source's exact-duplicate rate: overwrite a seeded
    # sample of docs with copies of earlier docs
    for j in rng.choice(np.arange(1, n_out), size=n_dups * factor, replace=False):
        texts[int(j)] = texts[int(rng.integers(0, int(j)))]
    pick = rng.integers(0, n_src, size=n_out)
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n_out), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array([mix[i][0] for i in pick], pa.string()),
            "source": pa.array([mix[i][1] for i in pick], pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, f"{out}/documents.parquet")
    print(f"  documents: {n_out} rows ({len(vocab)}-word vocab, {n_dups * factor} dups)")


def scale_embeddings(con, src: str, out: str, factor: int, seed: int = 54321) -> None:
    rng = np.random.default_rng(seed)
    n_src, dim = con.execute(
        f"SELECT count(*), max(len(embedding)) FROM '{src}/embeddings.parquet'"
    ).fetchone()
    n_out = n_src * factor
    vecs = rng.normal(size=(n_out, dim))
    vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n_out), pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            "label": pa.array(rng.integers(0, 10, size=n_out), pa.int32()),
        }
    )
    pq.write_table(tbl, f"{out}/embeddings.parquet")
    print(f"  embeddings: {n_out} x {dim}")


def main() -> None:
    src, out, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    print(f"scaling {src} -> {out} x{factor}")
    scale_relational(con, src, out, factor)
    scale_documents(con, src, out, factor)
    scale_embeddings(con, src, out, factor)


if __name__ == "__main__":
    main()
