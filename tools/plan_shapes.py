"""Plan-shape inventory of the full registry — the optimization-round
"capture the plan of every declared query" artifact.

For each registry query at a tiny SF, records counts of the
plan-shape-defining operators from `.explain("formatted")`:
Exchange (minus ReusedExchange), join strategies, Python-boundary
nodes (BatchEvalPython = row-pickled scalar UDFs — the registry-wide
invariant is ZERO), window/sort/aggregate nodes, and whether any
parquet scan carries PushedFilters.  Builders that run eagerly
(streaming replays, backfill jobs) execute at the tiny SF as in the
jitter gate; their returned lazy plan (usually a sink read-back) is
what gets shaped — noted per entry via "eager" heuristics is NOT
attempted, the shape is simply of the declared DataFrame.

Usage: python tools/plan_shapes.py <sf_dir> <out.json>
"""

from __future__ import annotations

import io
import json
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MARKS = [
    ("exchange", r"(?<!Reused)Exchange"),
    ("reused_exchange", r"ReusedExchange"),
    ("sort_merge_join", r"SortMergeJoin"),
    ("broadcast_hash_join", r"BroadcastHashJoin"),
    ("shuffled_hash_join", r"ShuffledHashJoin"),
    ("broadcast_nested_loop", r"BroadcastNestedLoopJoin"),
    ("cartesian", r"CartesianProduct"),
    ("batch_eval_python", r"BatchEvalPython"),
    ("arrow_eval_python", r"ArrowEvalPython"),
    ("map_in_pandas", r"MapInPandas|MapInArrow"),
    ("apply_in_pandas", r"FlatMapGroupsInPandas|FlatMapGroupsInArrow|TransformWithStateInPandas"),
    ("window", r"\bWindow\b"),
    ("window_group_limit", r"WindowGroupLimit"),
    ("sort", r"\bSort\b"),
    ("hash_aggregate", r"HashAggregate"),
    ("sort_aggregate", r"SortAggregate"),
    ("object_hash_aggregate", r"ObjectHashAggregate"),
    ("take_ordered", r"TakeOrderedAndProject"),
    ("union_loop", r"UnionLoop\b"),
    ("scan_parquet", r"Scan parquet"),
]


def main() -> None:
    sf_dir, out_path = sys.argv[1], sys.argv[2]
    from trading_etl_python_spark.session import get_spark
    from trading_etl_python_spark.suite import QUERIES

    spark = get_spark("plan_shapes")
    shapes: dict[str, dict] = {}
    for i, (name, fn) in enumerate(QUERIES.items(), 1):
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            t = buf.getvalue()
            row = {k: len(re.findall(p, t)) for k, p in MARKS}
            row["pushed_filters"] = bool(re.search(r"PushedFilters: \[[^\]]", t))
            shapes[name] = row
        except Exception as e:  # noqa: BLE001 — inventory must finish
            shapes[name] = {"error": str(e)[:200]}
        if i % 25 == 0:
            print(f"[{i}/{len(QUERIES)}]", flush=True)
    n_err = sum(1 for v in shapes.values() if "error" in v)
    n_pickle = sum(v.get("batch_eval_python", 0) for v in shapes.values())
    summary = {
        "sf_dir": sf_dir,
        "n_queries": len(shapes),
        "n_errors": n_err,
        "total_batch_eval_python": n_pickle,
        "shapes": shapes,
    }
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(
        f"wrote {out_path}: {len(shapes)} queries, {n_err} errors, "
        f"BatchEvalPython total = {n_pickle}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
