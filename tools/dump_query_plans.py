"""Dump .explain("formatted") for named registry queries to files.

Usage:
    python tools/dump_query_plans.py OUTDIR SUFFIX QUERY [QUERY...] [--sf SF_DIR]

Writes OUTDIR/<query>_<SUFFIX>.txt for each query.  Run from the repo
root whose code you want the plans of (e.g. a round-N worktree for
"before" plans, the live tree for "after"), with a tiny SF so plan
capture is instant; plans are shape-identical across SFs (AQE final
plans can differ at runtime — these are the static plans, which is
what the plan-diff evidence in OPTIMIZATION_r*.md cites).
"""

from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, ".")

from trading_etl_python_spark.session import get_spark  # noqa: E402


def formatted(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    # strip per-run ids so before/after diffs are meaningful
    text = re.sub(r"plan_id=\d+", "plan_id=*", buf.getvalue())
    text = re.sub(r"#\d+L?", "#*", text)
    return text.strip()


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.001"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        args = args[:i] + args[i + 2 :]
    outdir, suffix, *names = args

    import os

    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("dump_query_plans")
    from trading_etl_python_spark.suite import QUERIES

    for name in names:
        df = QUERIES[name](spark, sf_dir)
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(formatted(df) + "\n")
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
