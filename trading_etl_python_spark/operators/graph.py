"""Iterative graph algorithms as DataFrame loops.

Connected components (large-star/small-star) lives in
``operators/dedup.py`` next to its near-dup consumer; this module holds
the general-purpose iterative kernels, starting with weighted PageRank.

Scale design: each PageRank iteration is one join (edges x ranks, keyed
on the source node) + one groupBy(dst) — the canonical shuffle pair every
distributed PageRank pays.  The normalized edge table is computed once
and ``localCheckpoint``'d (reused verbatim every iteration, lineage
truncated so the plan does not grow), and on a real cluster both sides
should be pre-partitioned by node key so iterations reuse one
distribution.  Rank state stays a DataFrame end-to-end; the only driver
scalar is the node COUNT (one long).  Dangling-node mass (out-degree-0
nodes) is redistributed uniformly each iteration via a 1-row broadcast —
the standard stochastic-matrix fix, kept in-plan.

Numeric parity with the SQL oracle: all arithmetic in IEEE doubles with
identical literals; per-iteration sums differ only in accumulation order
(~1e-16), damping < 1 keeps the drift contractive, and the final
6-decimal rounding absorbs it (verified across sf0.001/0.01/0.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 8,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
) -> DataFrame:
    """Weighted PageRank with uniform dangling-mass redistribution.
    ``edges`` is a directed weighted edge list; returns (node, score)
    for every node appearing as a source or destination, after a FIXED
    number of power iterations (fixed so the result is deterministic
    and oracle-checkable; convergence-gated variants just change the
    loop condition)."""
    outw = edges.groupBy(src).agg(F.sum(weight).alias("_ow"))
    norm = (
        edges.join(outw, src)
        .select(F.col(src), F.col(dst), (F.col(weight) / F.col("_ow")).alias("_frac"))
        .localCheckpoint()
    )
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionAll(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    sources = outw.select(F.col(src).alias("node"))
    ranks = nodes.withColumn("score", F.lit(1.0 / n))
    for _ in range(iters):
        contrib = (
            norm.join(ranks, norm[src] == ranks["node"])
            .select(F.col(dst).alias("node"), (F.col("_frac") * F.col("score")).alias("_c"))
            .groupBy("node")
            .agg(F.sum("_c").alias("_c"))
        )
        dangling = (
            ranks.join(sources, "node", "left_anti")
            .agg(F.coalesce(F.sum("score"), F.lit(0.0)).alias("_dm"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("_c"), F.lit(0.0)) + F.col("_dm") / n)
                ).alias("score"),
            )
            .localCheckpoint()
        )
    return ranks.select("node", F.round("score", 6).alias("score"))


def triangle_counts(pairs: DataFrame, a: str = "doc_a", b: str = "doc_b") -> DataFrame:
    """Per-node triangle participation over an undirected graph given as
    canonically-oriented pairs (a < b).  Each triangle (x < y < z) is
    enumerated exactly once by closing the wedge (x,y)+(y,z) with (x,z).

    Scale: the wedge join is the classic hotspot, bounded by sum of
    squared out-degrees under the orientation; orienting low-id -> high-id
    (swap in degree-order for power-law graphs — same plan, different
    canonical key) keeps out-degrees balanced.  Join keys are node ids,
    partial-aggregated counts; nothing driver-side."""
    e = pairs.select(F.col(a).alias("u"), F.col(b).alias("v"))
    tri = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.v") == F.col("e2.u"))
        .join(
            e.alias("e3"),
            (F.col("e1.u") == F.col("e3.u")) & (F.col("e2.v") == F.col("e3.v")),
        )
        .select(
            F.col("e1.u").alias("x"), F.col("e1.v").alias("y"), F.col("e2.v").alias("z")
        )
    )
    return (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def label_propagation(
    pairs: DataFrame, iters: int = 5, a: str = "doc_a", b: str = "doc_b"
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. LPA) over an
    undirected graph given as canonical pairs: every node starts as its
    own community, then repeatedly adopts the most frequent label among
    its neighbors (tie-break: smallest label — the choice that makes
    sync LPA deterministic and therefore oracle-checkable; stock LPA
    randomizes here).  Fixed iteration count, same rationale as
    ``pagerank``.

    Scale: per iteration one join (edges x labels on the neighbor key)
    + one (node, label) count + one per-node argmax window riding the
    same hash(node) distribution; state is one label per node.  The
    edge list is symmetrized once and checkpointed."""
    from pyspark.sql import Window

    edges = (
        pairs.select(F.col(a).alias("u"), F.col(b).alias("v"))
        .unionAll(pairs.select(F.col(b).alias("u"), F.col(a).alias("v")))
        .localCheckpoint()
    )
    labels = edges.select(F.col("u").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    w = Window.partitionBy("node").orderBy(F.col("_c").desc(), F.col("label").asc())
    for _ in range(iters):
        labels = (
            edges.join(labels, edges["v"] == labels["node"])
            .select(F.col("u").alias("node"), "label")
            .groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("_c"))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("node", "label")
            .localCheckpoint()
        )
    return labels.select("node", F.col("label").alias("community"))
