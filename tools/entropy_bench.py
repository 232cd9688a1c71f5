"""One-off measurement for r8 VERDICT #7: three shapes of the per-doc
character-entropy computation at sf1, timed via noop writes, with a
value cross-check at sf0.01.

A) current: explode(sequence) + substring -> (doc,char) hash agg x2
B) posexplode(split(lower(text), '')) -> same double agg
C) in-row: sorted-distinct-char fold (zero shuffle, O(L*D) per row)

Usage: python tools/entropy_bench.py [sf1_dir] [small_sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def variant_a(df):
    """FROZEN copy of the pre-r9 explode(sequence)+substring shape —
    char_entropy_profile itself was rewritten to variant C, so calling
    it here would measure C twice and silently lose the baseline this
    file exists to document."""
    t = F.lower(F.col("text"))
    chars = df.select(
        F.col("doc_id"),
        F.length(t).alias("_n"),
        F.explode(F.sequence(F.lit(0), F.length(t) - 1)).alias("_i"),
        t.alias("_t"),
    ).select(
        "doc_id", "_n", F.substring("_t", F.col("_i") + 1, F.lit(1)).alias("_c")
    )
    counts = chars.groupBy("doc_id", "_n", "_c").agg(F.count(F.lit(1)).alias("_k"))
    p = F.col("_k") / F.col("_n")
    return (
        counts.groupBy("doc_id", "_n")
        .agg(
            F.round(-F.sum(p * F.log(p)), 6).alias("entropy"),
            F.count(F.lit(1)).alias("n_distinct_chars"),
        )
        .select(
            "doc_id", F.col("_n").cast("long").alias("n_chars"),
            "entropy", "n_distinct_chars",
        )
    )


def variant_b(df):
    t = F.lower(F.col("text"))
    chars = df.select(
        F.col("doc_id"),
        F.length(t).alias("_n"),
        F.explode(F.split(t, "")).alias("_c"),
    )
    counts = chars.groupBy("doc_id", "_n", "_c").agg(F.count(F.lit(1)).alias("_k"))
    p = F.col("_k") / F.col("_n")
    return (
        counts.groupBy("doc_id", "_n")
        .agg(
            F.round(-F.sum(p * F.log(p)), 6).alias("entropy"),
            F.count(F.lit(1)).alias("n_distinct_chars"),
        )
        .select(
            "doc_id", F.col("_n").cast("long").alias("n_chars"),
            "entropy", "n_distinct_chars",
        )
    )


def variant_c(df):
    t = F.lower(F.col("text"))
    arr = F.split(t, "")
    n = F.length(t)
    dis = F.array_sort(F.array_distinct(arr))
    counts = F.transform(
        dis, lambda c: F.size(F.filter(arr, lambda x: x == c))
    )
    ent = -F.aggregate(
        counts,
        F.lit(0.0),
        lambda acc, k: acc
        + (k.cast("double") / n) * F.log(k.cast("double") / n),
    )
    return df.filter(n >= 1).select(
        "doc_id",
        n.cast("long").alias("n_chars"),
        F.round(ent, 6).alias("entropy"),
        F.size(dis).cast("long").alias("n_distinct_chars"),
    )


def main():
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "testdata_sf1"
    small_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    small = spark.read.parquet(os.path.join(small_dir, "documents.parquet"))
    big = spark.read.parquet(os.path.join(sf1, "documents.parquet"))
    fns = {"A_current": variant_a, "B_splitexplode": variant_b, "C_inrow": variant_c}
    # value cross-check at sf0.01 (expect identical rounded values)
    ref = {
        r.doc_id: (r.n_chars, r.entropy, r.n_distinct_chars)
        for r in variant_a(small).collect()
    }
    for name, fn in fns.items():
        got = {
            r.doc_id: (r.n_chars, r.entropy, r.n_distinct_chars)
            for r in fn(small).collect()
        }
        diffs = {
            k for k in ref
            if abs(ref[k][1] - got.get(k, (0, 1e9, 0))[1]) > 2e-6
            or ref[k][0] != got.get(k, (0, 0, 0))[0]
            or ref[k][2] != got.get(k, (0, 0, 0))[2]
        }
        print(f"{name}: sf0.01 rows={len(got)} (ref {len(ref)}), diffs>2e-6: {len(diffs)}")
    # warmup then timed at sf1
    for name, fn in fns.items():
        fn(big).write.format("noop").mode("overwrite").save()  # warmup
        t0 = time.time()
        fn(big).write.format("noop").mode("overwrite").save()
        print(f"{name}: sf1 {time.time() - t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
