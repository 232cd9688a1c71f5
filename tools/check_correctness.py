"""Local stand-in for the driver's t2 correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB over
the same sf dir, then compare row count + schema + order-insensitive
values (exact, post-rounding).

Usage: python tools/check_correctness.py [--json out.json] [sf_dir] [query ...]

--json (r10 VERDICT #5) writes the run as a machine-readable artifact
in the driver's CORRECTNESS_r{N}.json row shape — per query:
{rows_match, schema_match, hash_match, spark_rows, oracle_rows, err} —
so each round's builder-run full-registry gate is a checked-in JSON the
judge can diff against the driver window, not a prose claim.
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from trading_etl_python_spark.session import get_spark  # noqa: E402
from trading_etl_python_spark.sources.tables import TABLES  # noqa: E402


def dtype_sig(s: pd.Series) -> str:
    """Physical-type CLASS signature the driver's value-hash
    distinguishes — calibrated against r3 driver evidence: int32 vs
    int64 hash-matched (q_retention/q_window_navs), so intN collapses to
    one class, but int vs non-int did NOT (q_sql_tpch_q12: Spark BIGINT
    vs DuckDB HUGEINT, which pandas surfaces as float64/object) — the
    class this checker previously hid by widening ints to float64."""
    d = str(s.dtype)
    if d.startswith("datetime64"):
        return "datetime"
    if d.startswith(("float", "Float")):
        return "float"
    if s.dtype == object:
        return "object"
    if d.lower().lstrip("u").startswith("int"):
        return "int"
    return d.lower()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("float", "Float")):
            df[c] = df[c].astype("float64")
        elif str(df[c].dtype).startswith(("int", "Int", "uint")):
            df[c] = df[c].astype("float64")  # values only; widths checked in compare()
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if len(sdf) != len(odf):
        problems.append(f"row count: spark={len(sdf)} oracle={len(odf)}")
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"columns: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return problems
    if problems:
        return problems
    for c in sorted(sdf.columns):
        ss, os_ = dtype_sig(sdf[c]), dtype_sig(odf[c])
        if ss != os_:
            problems.append(
                f"col {c}: physical dtype width: spark={sdf[c].dtype} oracle={odf[c].dtype}"
                " (driver value-hash distinguishes these; CAST both sides)"
            )
    s, o = canon(sdf), canon(odf)
    for c in s.columns:
        sv, ov = s[c].to_numpy(), o[c].to_numpy()
        if sv.dtype.kind == "f":
            eq = (np.isnan(sv.astype(float)) & np.isnan(ov.astype(float))) | (sv == ov)
        elif sv.dtype.kind == "M":  # datetime64: NaT == NaT counts as equal
            eq = (np.isnat(sv) & np.isnat(ov)) | (sv == ov)
        else:
            eq = sv == ov
        bad = int((~eq).sum())
        if bad:
            i = int(np.argmax(~eq))
            problems.append(
                f"col {c}: {bad}/{len(sv)} mismatched; first at sorted-row {i}: "
                f"spark={sv[i]!r} oracle={ov[i]!r}"
            )
    return problems


def main() -> int:
    args = list(sys.argv[1:])
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failed, passed, rows_only = [], [], []
    records: dict[str, dict] = {}

    def record(name, *, rows=None, orows=None, problems=None, err=None):
        probs = problems or []
        records[name] = {
            "rows_match": err is None and rows == orows,
            "schema_match": err is None
            and not any("columns" in p or "dtype" in p for p in probs),
            "hash_match": err is None and not probs,
            "spark_rows": rows,
            "oracle_rows": orows,
            "err": err,
        }

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failed.append(name)
            record(name, err=f"spark: {type(e).__name__}: {str(e)[:200]}")
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            continue
        if name not in oracles:
            rows_only.append(name)
            records[name] = {
                "rows_match": None, "schema_match": None, "hash_match": None,
                "spark_rows": len(sdf), "oracle_rows": None, "err": None,
            }
            print(f"rows  {name}: {len(sdf)} rows ({time.time()-t0:.1f}s) [no oracle]")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            failed.append(name)
            record(name, rows=len(sdf), err=f"oracle: {type(e).__name__}: {str(e)[:200]}")
            print(f"FAIL  {name}: oracle error: {type(e).__name__}: {str(e)[:300]}")
            continue
        problems = compare(name, sdf, odf)
        record(name, rows=len(sdf), orows=len(odf), problems=problems)
        if problems:
            failed.append(name)
            print(f"FAIL  {name} ({time.time()-t0:.1f}s):")
            for p in problems:
                print(f"      {p}")
        else:
            passed.append(name)
            print(f"ok    {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
    print(f"\n{len(passed)} ok, {len(rows_only)} rows-only, {len(failed)} FAILED")
    if failed:
        print("failed:", " ".join(failed))
    if json_out:
        with open(json_out, "w") as fh:
            json.dump({"sf_dir": sf_dir, "results": records}, fh, indent=1)
        print(f"wrote {json_out}: {len(records)} queries")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
