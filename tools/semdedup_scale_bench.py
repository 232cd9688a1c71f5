"""SemDeDup assignment-vs-pair-join balance, measured (r9 VERDICT #6).

The sqrt-rule (``n_cells = max(16, ceil(sqrt(N)))``) is justified
analytically in operators/similarity.py: assignment costs N*K dot
products, the in-cell pair join ~N^2/K, so K = sqrt(N) equalizes the
two at ~2*N^1.5.  The paper-scale claim ("at 100M vectors the rule
lands on the paper's own K~10k") is extrapolation — this script makes
the BALANCE itself empirical at the largest local fixture (testdata_sf1
embeddings, ~20k vectors) using the production trained-centroid path
(``train_ivf_kmeans`` + ``assign_via_join``):

for each K in a grid spanning the derived sqrt value, time
  - KMeans training (driver-submitted Spark ML, reported separately —
    at production scale training runs on a sample, not the corpus),
  - assignment only (``_semdedup_assign`` -> noop write),
  - the full semdedup (assignment + in-cell pair join + audit join),
and report pair-join cost as (full - assign).  The sqrt rule is
validated if assign grows with K while (full - assign) shrinks, with
the total flattest around the derived K.

Per-K CELL STATS are recorded alongside the times: the first run of
this script exposed that the pair join is governed by sum(|c|^2) —
i.e. cell SKEW — not by the balanced-cells N^2/K idealization.
Trained KMeans on the blob-like synthetic embeddings concentrates 12%
of the corpus in one cell (sum_sq 22.1M at K=142 vs 2.85M ~ N^2/K for
the balanced corpus-slice centroids), which is why the trained path
measured ~6x the auto path at the same K.

Quiet protocol: one session, one untimed full-pipeline warmup at the
derived K, then TWO timed passes per measurement (min is the value) —
the first run's single-pass full_s showed 1.5x order/GC variance.

Usage: python tools/semdedup_scale_bench.py [sf_dir] [out.json]
"""
from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "testdata_sf1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "sweeps/r10_semdedup_scale.json"
    from pyspark.sql import SparkSession

    from trading_etl_python_spark.operators import similarity as S

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    emb = emb.localCheckpoint()  # isolate the scan: we time the operator
    n = emb.count()
    k_sqrt = max(S.SEMDEDUP_MIN_CELLS, math.ceil(math.sqrt(n)))
    grid = sorted({16, max(17, k_sqrt // 3), k_sqrt, k_sqrt * 3, k_sqrt * 10})
    res = {"n_vectors": n, "k_derived": k_sqrt, "rows": []}

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def timed_min(build, passes=2):
        best = float("inf")
        for _ in range(passes):
            t0 = time.time()
            noop(build())
            best = min(best, time.time() - t0)
        return best

    # untimed warmup at the derived K (session/JIT/Arrow warmup)
    cents0 = S.train_ivf_kmeans(emb, n_cells=k_sqrt)
    noop(S.semdedup(emb, centroids=cents0, assign_via_join=True))

    from pyspark.sql import functions as F

    for k in grid:
        t0 = time.time()
        cents = S.train_ivf_kmeans(emb, n_cells=k)
        t_train = time.time() - t0
        vecs = emb.select("vec_id", "embedding")
        t_assign = timed_min(lambda: S._semdedup_assign(vecs, cents, True, "vec_id"))
        t_full = timed_min(lambda: S.semdedup(emb, centroids=cents, assign_via_join=True))
        cs = (
            S._semdedup_assign(vecs, cents, True, "vec_id")
            .groupBy("_cell").count()
            .agg(
                F.count(F.lit(1)).alias("nc"),
                F.max("count").alias("mx"),
                F.expr("sum(count*count)").alias("ss"),
            ).collect()[0]
        )
        row = {
            "k": k,
            "train_s": round(t_train, 2),
            "assign_s": round(t_assign, 2),
            "full_s": round(t_full, 2),
            "pair_s_est": round(max(0.0, t_full - t_assign), 2),
            "cells_used": cs.nc,
            "max_cell": cs.mx,
            "sum_cell_sq": int(cs.ss),
        }
        res["rows"].append(row)
        print(row, flush=True)

    # the r10 cap at the derived K: max_cell = mean cell size, so only
    # skew-oversized cells sub-split — the payoff number is full_s
    # approaching the BALANCED pair cost at the same K (the auto
    # corpus-slice path measured 6.76 s in the r9 sweep, sum_sq 2.85M)
    m = math.ceil(n / k_sqrt)
    t_capped = timed_min(
        lambda: S.semdedup(emb, centroids=cents0, assign_via_join=True, max_cell=m)
    )
    res["capped_at_derived_k"] = {
        "k": k_sqrt,
        "max_cell_param": m,
        "full_s": round(t_capped, 2),
    }
    print(res["capped_at_derived_k"], flush=True)

    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
