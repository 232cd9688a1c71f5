"""Spill/partition stage audit of a registry query (or the
indicators_full flagship) at a given sf_dir — r11 VERDICT #2's
"spill/partition audit" made a reusable tool.

Runs the query once end-to-end (noop sink, after a sf0.001 plan-shape
warmup), then dumps per-stage task metrics from the Spark status
store: task count, input/shuffle bytes, and the audit targets —
memory/disk spill plus min/max task durations (stragglers = partition
imbalance).

Usage: python tools/stage_audit.py <query|indicators_full> <sf_dir> <out.json>
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name, sf_dir, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    from trading_etl_python_spark.operators.indicators import indicator_table
    from trading_etl_python_spark.session import get_spark
    from trading_etl_python_spark.sources.tables import bars
    from trading_etl_python_spark.suite import QUERIES

    def build(spark, sf):
        if name == "indicators_full":
            return indicator_table(bars(spark, sf), warmup=26)
        return QUERIES[name](spark, sf)

    spark = get_spark("stage-audit")
    sc = spark.sparkContext
    # warmup at sf0.001 (plan-shape codegen), then the audited run
    tiny = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(tiny):
        tiny = "/root/testdata/sf0.001"
    build(spark, tiny).write.format("noop").mode("overwrite").save()
    warm_stages = {
        int(s.stageId())
        for s in _stage_iter(sc)
    }

    # The audited run gets its own job group so its FULL stage set —
    # including stages Spark SKIPS by reusing warmup shuffle output —
    # is known (r12 ADVICE: skipped stages never reach the completed-
    # stage list, so a per-stage dump alone can silently under-report
    # work the warmup pre-paid).
    sc.setJobGroup("stage-audit", "audited run")
    t0 = time.time()
    build(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = round(time.time() - t0, 3)
    st = sc.statusTracker()
    audited_stage_ids: set[int] = set()
    for j in st.getJobIdsForGroup("stage-audit"):
        ji = st.getJobInfo(j)
        audited_stage_ids.update(ji.stageIds if ji else [])
    sc.setLocalProperty("spark.jobGroup.id", None)

    store = sc._jsc.sc().statusStore()
    stages = []
    for s in _stage_iter(sc):
        if int(s.stageId()) in warm_stages:
            continue
        try:
            tasks_it = store.taskList(s.stageId(), s.attemptId(), 10000).iterator()
            durs = []
            while tasks_it.hasNext():
                t = tasks_it.next()
                d = t.duration()
                if d.isDefined():
                    durs.append(int(str(d.get())))
        except Exception:
            durs = []
        stages.append(
            {
                "stage": int(s.stageId()),
                "name": str(s.name())[:80],
                "tasks": int(s.numCompleteTasks()),
                "input_mb": round(int(s.inputBytes()) / 1e6, 1),
                "shuffle_read_mb": round(int(s.shuffleReadBytes()) / 1e6, 1),
                "shuffle_write_mb": round(int(s.shuffleWriteBytes()) / 1e6, 1),
                "mem_spill_mb": round(int(s.memoryBytesSpilled()) / 1e6, 1),
                "disk_spill_mb": round(int(s.diskBytesSpilled()) / 1e6, 1),
                "task_ms_min": min(durs) if durs else None,
                "task_ms_max": max(durs) if durs else None,
                "task_ms_sum": sum(durs) if durs else None,
            }
        )
    stages.sort(key=lambda r: -(r["task_ms_sum"] or 0))
    seen = {r["stage"] for r in stages}
    reused = sorted(
        s for s in audited_stage_ids if s in warm_stages or s not in seen
    )
    out = {
        "query": name,
        "sf_dir": sf_dir,
        "wall_sec": wall,
        # stages the audited run planned but did not execute (shuffle
        # output reused from the warmup) — their cost is NOT in
        # `stages` and a cold run would pay it (r12 ADVICE)
        "reused_or_skipped_stages": reused,
        "stages": stages,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"wall_sec": wall, "n_stages": len(stages)}))
    spark.stop()


def _stage_iter(sc):
    store = sc._jsc.sc().statusStore()
    # AppStatusStore.stageList(statuses: JList, details: Boolean,
    # taskStatus: Boolean, quantiles: Array[Double], summaries: JList)
    # — Scala default args live in synthetic stageList$default$N
    # methods, which py4j reaches via getattr.  Version guard (r12
    # ADVICE): both the synthetic-method reflection and the py4j Option
    # handling in main() depend on Spark-internal shapes pinned against
    # the bundled pyspark (4.1.x); fail with a named cause instead of a
    # bare py4j stack if an upgrade moves them.
    try:
        it = store.stageList(
            sc._jvm.java.util.ArrayList(),
            getattr(store, "stageList$default$2")(),
            getattr(store, "stageList$default$3")(),
            getattr(store, "stageList$default$4")(),
            getattr(store, "stageList$default$5")(),
        ).iterator()
    except Exception as exc:
        raise SystemExit(
            "stage_audit: AppStatusStore.stageList reflection failed — "
            "Spark-internal API moved (tool pinned against pyspark 4.1.x); "
            f"update _stage_iter. Cause: {exc!r:.200}"
        ) from exc
    while it.hasNext():
        yield it.next()


if __name__ == "__main__":
    main()
