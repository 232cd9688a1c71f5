"""Driver simulation: run every registry query under a VANILLA
SparkSession — no tuned configs, exactly how the external driver calls
``__spark_entry__`` — and report failures.  The tuned-session oracle gate
(check_correctness.py) proves values; this proves none of the queries
silently depend on session defaults the driver doesn't set
(shuffle-partition counts, Arrow flags, broadcast thresholds...).

Usage: python tools/driver_sim.py [sf_dir] [first_n]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
FIRST_N = int(sys.argv[2]) if len(sys.argv) > 2 else 0  # 0 = all


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

    failures = []
    queries = entry.queries()
    for i, (name, fn) in enumerate(queries.items()):
        if FIRST_N and i >= FIRST_N:
            break
        t0 = time.time()
        try:
            cnt = fn(spark, SF_DIR).count()
            print(f"ok    {name}: {cnt} rows ({time.time() - t0:.1f}s)")
        except Exception as e:  # noqa: BLE001 - report and continue
            failures.append(name)
            print(f"FAIL  {name}: {str(e)[:200]}")
    print(f"\n{len(queries) if not FIRST_N else FIRST_N} run, {len(failures)} failed")
    if failures:
        sys.exit(1)
    spark.stop()


if __name__ == "__main__":
    main()
