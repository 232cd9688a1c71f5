"""Driver simulation: run every registry query under a VANILLA
SparkSession — no tuned configs, exactly how the external driver calls
``__spark_entry__`` — and compare FULL VALUES against the DuckDB oracle
(row count + schema + order-insensitive exact values, the same
comparator as check_correctness.py).

Two blind spots this closes vs the old count-only sim (r5 lesson —
q_spearman executed fine under the sim but hash-mismatched at the
driver):

- queries whose VALUES (not just execution) depend on tuned session
  configs or partition counts now fail here, not at the driver;
- the DuckDB side runs at >1 thread (SET threads) so float
  accumulation-order sensitivity in an oracle shakes out locally.

--jitter mode (r6 VERDICT #8 — the flake class BOTH r6 driver reds
belonged to): re-run each query's Spark side under three different
runtime configs (spark.sql.shuffle.partitions x AQE on/off), which
change partition splits and therefore float accumulation order, and
fail on ANY cross-run value disagreement (exact compare, not approx).
A query that is green against the oracle but jitter-unstable WILL
eventually go red at the driver — this catches it locally.

Usage: python tools/driver_sim.py [--jitter] [sf_dir] [first_n] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_correctness import compare  # noqa: E402
from trading_etl_python_spark.sources.tables import TABLES  # noqa: E402

_args = [a for a in sys.argv[1:] if a != "--jitter"]
JITTER = "--jitter" in sys.argv[1:]
SF_DIR = _args[0] if len(_args) > 0 else "/root/testdata/sf0.01"
FIRST_N = int(_args[1]) if len(_args) > 1 else 0  # 0 = all
ONLY = set(_args[2:])

# (shuffle.partitions, AQE enabled, files.maxPartitionBytes): the first
# is the vanilla-driver default; the others force different exchange
# split counts AND different parquet scan splits — both change
# per-partition float accumulation order.
JITTER_CONFIGS = [
    ("200", "true", "134217728"),
    ("7", "false", "134217728"),
    ("32", "true", "65536"),  # tiny scan splits: input-order jitter
]


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as entry

    n = len(entry.entry(spark).collect())
    print(f"entry(): {n} rows")

    con = duckdb.connect()
    con.sql("SET threads TO 8")  # shake accumulation-order sensitivity
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    failures, rows_only, n_run = [], [], 0
    queries, oracles = entry.queries(), entry.oracle_sql()
    for i, (name, fn) in enumerate(queries.items()):
        if FIRST_N and i >= FIRST_N:
            break
        if ONLY and name not in ONLY:
            continue
        n_run += 1
        t0 = time.time()
        try:
            if JITTER:
                sdf, jitter_problem = None, None
                for sp, aqe, mpb in JITTER_CONFIGS:
                    spark.conf.set("spark.sql.shuffle.partitions", sp)
                    spark.conf.set("spark.sql.adaptive.enabled", aqe)
                    spark.conf.set("spark.sql.files.maxPartitionBytes", mpb)
                    run = fn(spark, SF_DIR).toPandas()
                    if sdf is None:
                        sdf = run
                    else:
                        diff = compare(name, sdf, run)
                        if diff:
                            jitter_problem = (sp, aqe, mpb, diff)
                            break
                spark.conf.set("spark.sql.shuffle.partitions", "200")
                spark.conf.set("spark.sql.adaptive.enabled", "true")
                spark.conf.set("spark.sql.files.maxPartitionBytes", "134217728")
                if jitter_problem:
                    sp, aqe, mpb, diff = jitter_problem
                    failures.append(name)
                    print(
                        f"FAIL  {name}: JITTER-UNSTABLE at "
                        f"shuffle.partitions={sp} aqe={aqe} maxPartitionBytes={mpb}:"
                    )
                    for p in diff:
                        print(f"      {p}")
                    continue
            else:
                sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:  # noqa: BLE001 - report and continue
            failures.append(name)
            print(f"FAIL  {name}: spark: {type(e).__name__}: {str(e)[:200]}")
            continue
        if name not in oracles:
            rows_only.append(name)
            print(f"rows  {name}: {len(sdf)} rows ({time.time() - t0:.1f}s)")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: oracle: {type(e).__name__}: {str(e)[:200]}")
            continue
        problems = compare(name, sdf, odf)
        if problems:
            failures.append(name)
            print(f"FAIL  {name} ({time.time() - t0:.1f}s):")
            for p in problems:
                print(f"      {p}")
        else:
            print(f"ok    {name}: {len(sdf)} rows ({time.time() - t0:.1f}s)")
    print(f"\n{n_run} run, {len(rows_only)} rows-only, {len(failures)} failed")
    if failures:
        print("failed:", " ".join(failures))
        sys.exit(1)
    spark.stop()


if __name__ == "__main__":
    main()
