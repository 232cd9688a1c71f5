"""Open-vocabulary scale evidence (r7 VERDICT #3's measurement branch).

The registry's superlinear exact-dedup ratios are repeatedly attributed
to the driver testdata's CLOSED ~30k-shingle vocabulary (every doc
shares ~every shingle, so posting lists grow linearly with N and the
inverted-index joins go ~N^2).  This script MEASURES the claim: it
generates a deterministic corpus with a realistic OPEN vocabulary
(md5-hash tokens drawn from a ~1M-token space, zipf-ish head via a
shared 200-token common pool, plus planted near-dup pairs at a fixed
1% rate) at N and 10N docs, runs the exact-pair operators on both, and
prints the 10x runtime ratios.  Linear-family ratios here certify that
the closed-vocab sweep numbers are a testdata artifact, not a plan
defect.

Deterministic: token choice is md5(doc,slot) — two runs are identical.

r10 extension (VERDICT #4): the exact-pair GRAPH family inherits the
closed-vocab 6-30x sweep ratios without an open-vocab measurement of
its own — ``clustering_coef`` times clustering_coefficient over the
ngram_jaccard pair graph here, certifying (or refuting) the artifact
attribution for the graph metrics too.

Usage: python tools/openvocab_bench.py [out.json] [op1,op2,...]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BASE = 5_000
FACTOR = 10
DOC_LEN = 40          # tokens per doc (matches the testdata mean)
COMMON = 200          # shared zipf-head pool size
VOCAB = 1_000_000     # open tail space
DUP_EVERY = 100       # plant one near-dup pair per 100 docs


def build(spark, n_docs: int, path: str):
    from pyspark.sql import functions as F

    if os.path.exists(path):
        return
    base = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    # slot j: 20% zipf-head token from the COMMON pool, else open-tail
    # token unique-ish to (doc, slot); all md5-derived, no RNG
    def tok(j):
        h = F.conv(F.substring(F.md5(F.concat_ws("_", F.col("doc_id").cast("string"), F.lit(str(j)))), 1, 8), 16, 10).cast("long")
        return F.when(h % 5 == 0, F.concat(F.lit("c"), (h % COMMON).cast("string"))).otherwise(
            F.concat(F.lit("w"), (h % VOCAB).cast("string")))
    text = F.concat_ws(" ", *[tok(j) for j in range(DOC_LEN)])
    docs = base.withColumn("text", text)
    # planted near-dups: doc i (i % DUP_EVERY == 1) copies doc i-1's
    # text with the last token changed -> high-Jaccard true pair
    prev = docs.select((F.col("doc_id") + 1).alias("doc_id"), F.col("text").alias("_prev"))
    docs = (
        docs.join(prev, "doc_id", "left")
        .withColumn(
            "text",
            F.when(
                (F.col("doc_id") % DUP_EVERY == 1) & F.col("_prev").isNotNull(),
                F.concat(F.expr("substring(_prev, 1, length(_prev) - instr(reverse(_prev), ' '))"), F.lit(" zz")),
            ).otherwise(F.col("text")),
        )
        .drop("_prev")
    )
    docs.repartition(8).write.mode("overwrite").parquet(path)


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "sweeps/r8_openvocab.json"
    from pyspark.sql import SparkSession

    from pyspark.sql import functions as F

    from trading_etl_python_spark.operators import dedup as D
    from trading_etl_python_spark.operators import graph as G

    def _sym(pairs):
        e = pairs.select(
            F.col("doc_a").alias("src"),
            F.col("doc_b").alias("dst"),
            F.lit(1.0).alias("w"),
        )
        return e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w"))

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ops = {
        "ngram_jaccard": lambda df: D.ngram_jaccard_pairs(df, threshold=0.5),
        "ngram_containment": lambda df: D.ngram_containment_pairs(df, threshold=0.8),
        "minhash_ml_verified": lambda df: D.minhash_lsh_verified_pairs(df, threshold=0.5, num_hash_tables=16),
        "allpairs_prefix": lambda df: D.prefix_jaccard_pairs(df, threshold=0.5),
        "allpairs_prefix_capped": lambda df: D.prefix_jaccard_capped_pairs(df, threshold=0.5),
        "minhash_banded_verified": lambda df: D.minhash_banded_verified_pairs(df, threshold=0.5),
        # r10: the exact-pair-graph family — the pair build is INSIDE
        # the timed region (several of these eagerly localCheckpoint
        # their edge input at construction, so the timer must start
        # before fn(docs); see below)
        "clustering_coef": lambda df: G.clustering_coefficient(
            D.ngram_jaccard_pairs(df, threshold=0.5)
        ),
        # pagerank/hits consume DIRECTED weighted edges: symmetrize the
        # undirected pair graph (each pair -> both directions, w=1)
        "pagerank": lambda df: G.pagerank(_sym(D.ngram_jaccard_pairs(df, threshold=0.5))),
        "hits": lambda df: G.hits(_sym(D.ngram_jaccard_pairs(df, threshold=0.5))),
        "kcore": lambda df: G.kcore_layers(D.ngram_jaccard_pairs(df, threshold=0.5)),
        "triangles": lambda df: G.triangle_counts(D.ngram_jaccard_pairs(df, threshold=0.5)),
        "communities": lambda df: G.label_propagation(D.ngram_jaccard_pairs(df, threshold=0.5)),
        "assortativity": lambda df: G.degree_assortativity(
            D.ngram_jaccard_pairs(df, threshold=0.5)
        ),
    }
    if len(sys.argv) > 2:
        want = set(sys.argv[2].split(","))
        unknown = want - set(ops)
        if unknown:
            raise SystemExit(f"unknown ops: {sorted(unknown)}")
        ops = {k: v for k, v in ops.items() if k in want}
    res = {}
    for tag, n in (("base", N_BASE), ("x10", N_BASE * FACTOR)):
        # cache key carries every generation parameter: editing the
        # constants must never silently measure a stale corpus
        path = f"/tmp/openvocab_{n}_{DOC_LEN}_{COMMON}_{VOCAB}_{DUP_EVERY}"
        build(spark, n, path)
        docs = spark.read.parquet(path)
        if tag == "base":
            # untimed warmup: the first timed operator would otherwise
            # absorb session/JIT warmup into its base time, deflating
            # its 10x ratio (an advisor-flagged artifact — the r8 run
            # reported an implausible 0.81x for the first op)
            for fn in ops.values():
                fn(docs).write.format("noop").mode("overwrite").save()
        for name, fn in ops.items():
            # one execution per measurement: the timed action writes the
            # pairs to parquet; the row count then reads the tiny file.
            # fn(docs) is timed too — ops with eager build-time work
            # (clustering_coef's localCheckpoint) must not escape the
            # window; for the lazy ops this adds only plan construction.
            out = f"/tmp/openvocab_out_{tag}_{name}"
            t0 = time.time()
            q = fn(docs)
            q.write.mode("overwrite").parquet(out)
            dt = time.time() - t0
            n_pairs = spark.read.parquet(out).count()
            res[f"{name}_{tag}"] = {"sec": round(dt, 2), "pairs": n_pairs}
            print(f"{name} @ {n}: {dt:.2f}s, {n_pairs} pairs", flush=True)
    for name in ("ngram_jaccard", "ngram_containment", "minhash_ml_verified", "allpairs_prefix", "allpairs_prefix_capped", "minhash_banded_verified", "clustering_coef", "pagerank", "hits", "kcore", "triangles", "communities", "assortativity"):
        if f"{name}_base" in res:
            r = res[f"{name}_x10"]["sec"] / max(res[f"{name}_base"]["sec"], 0.25)
            res[f"{name}_ratio"] = round(r, 2)
            print(f"{name}: 10x ratio {r:.2f}")
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
