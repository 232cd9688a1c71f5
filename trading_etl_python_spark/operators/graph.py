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
    # materialize the caller's edge-construction plan exactly ONCE: norm
    # and nodes both derive from it, and without this checkpoint each of
    # their own checkpoints re-runs the (typically expensive) upstream
    # plan — measured as ~5 s of a 5.4 s query on the TPC-H trade graph
    edges = edges.localCheckpoint()
    outw = edges.groupBy(src).agg(F.sum(weight).alias("_ow"))
    norm = edges.join(outw, src).select(
        F.col(src), F.col(dst), (F.col(weight) / F.col("_ow")).alias("_frac")
    )
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionAll(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    n = nodes.count()
    # parallelism tracks the GRAPH size, not the (often much larger)
    # edge-construction input: below the threshold the per-iteration
    # state is driver-page-sized and 32-task stages are pure scheduler
    # overhead — one partition runs the whole loop in single-task
    # stages (measured ~0.3 s off the 8-iteration warm floor at sf0.1).
    # Above it, the shuffles keep the session's partitioning and AQE
    # right-sizes each exchange.
    if n <= 100_000:
        norm, nodes = norm.coalesce(1), nodes.coalesce(1)
    norm, nodes = norm.localCheckpoint(), nodes.localCheckpoint()
    # distinct sources come from the CHECKPOINTED norm table, never from
    # outw: outw's lineage contains the caller's whole edge-construction
    # plan, and the per-iteration dangling anti-join would re-run it
    # every round (measured as the dominant cost of the loop)
    sources = norm.select(F.col(src).alias("node")).distinct().localCheckpoint()
    # the dangling-node SET is static across iterations — resolve it
    # once so each round's mass aggregate is a broadcast probe of a
    # precomputed (typically tiny) set, not a fresh anti-join exchange
    dang = nodes.join(sources, "node", "left_anti").localCheckpoint()
    ranks = nodes.withColumn("score", F.lit(1.0 / n))
    for it in range(iters):
        contrib = (
            norm.join(ranks, norm[src] == ranks["node"])
            .select(F.col(dst).alias("node"), (F.col("_frac") * F.col("score")).alias("_c"))
            .groupBy("node")
            .agg(F.sum("_c").alias("_c"))
        )
        dangling = (
            ranks.join(F.broadcast(dang), "node")
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
        )
        # Checkpoint every SECOND iteration, LAZILY: lineage is still
        # truncated at the mark, but materialization folds into the
        # next job that reads ranks instead of paying a dedicated
        # eager job per mark (~0.6 s/round measured at small sizes).
        # The final round is left unmarked for the caller's action.
        if it % 2 == 1 and it != iters - 1:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("node", F.round("score", 6).alias("score"))


def triangle_counts(
    pairs: DataFrame,
    a: str = "doc_a",
    b: str = "doc_b",
    max_degree: int = 64,
) -> DataFrame:
    """Per-node triangle participation over an undirected graph given as
    canonically-oriented pairs (a < b).  Each triangle (x < y < z) is
    enumerated exactly once by closing the wedge (x,y)+(y,z) with (x,z).

    Super-node cut (the standard heavy-hitter bound): nodes whose
    undirected degree exceeds ``max_degree`` are removed before the
    wedge join and AUDITED — each contributes a row with
    ``n_triangles = 0`` and ``wedges_dropped = d*(d-1)/2`` (the wedge
    count it would have centered).  Without the cut the wedge space is
    Σ deg² and one celebrity node at web scale owns almost all of it;
    with it, the wedge space is bounded by N·max_degree² and the drop
    is visible in the output instead of silent.  Triangles counted are
    exactly those of the degree-capped subgraph.

    Scale: the wedge join is bounded by sum of squared out-degrees
    under the orientation (≤ N·max_degree² after the cut); join keys
    are node ids, partial-aggregated counts; nothing driver-side.

    Returns (node, n_triangles, wedges_dropped)."""
    # the edge table participates in the join THREE times (e1/e2/e3);
    # checkpoint so the caller's pair-construction plan runs once
    e0 = pairs.select(F.col(a).alias("u"), F.col(b).alias("v")).localCheckpoint()
    deg = (
        e0.select(F.col("u").alias("node"))
        .unionAll(e0.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("_d"))
    )
    heavy = deg.filter(F.col("_d") > max_degree)
    e = (
        e0.join(F.broadcast(heavy), e0["u"] == heavy["node"], "left_anti")
        .join(F.broadcast(heavy), e0["v"] == heavy["node"], "left_anti")
    )
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
    counted = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
        .withColumn("wedges_dropped", F.lit(0).cast("long"))
    )
    audited = heavy.select(
        "node",
        F.lit(0).cast("long").alias("n_triangles"),
        F.expr("(_d * (_d - 1)) div 2").alias("wedges_dropped"),
    )
    return counted.unionAll(audited)


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

    # materialize the caller's pair-construction plan once BEFORE the
    # symmetrizing union (which references it twice — an un-checkpointed
    # upstream would run twice inside the union's checkpoint)
    p = pairs.select(F.col(a).alias("u"), F.col(b).alias("v")).localCheckpoint()
    # parallelism tracks the graph size, same rationale and threshold as
    # ``pagerank``: below it the loop runs single-task stages
    if p.count() <= 100_000:
        p = p.coalesce(1)
    edges = p.unionAll(
        p.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint()
    labels = edges.select(F.col("u").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    w = Window.partitionBy("node").orderBy(F.col("_c").desc(), F.col("label").asc())
    for it in range(iters):
        labels = (
            edges.join(labels, edges["v"] == labels["node"])
            .select(F.col("u").alias("node"), "label")
            .groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("_c"))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("node", "label")
        )
        # every-2nd-round LAZY checkpoint, same fixed-floor rationale as
        # ``pagerank`` (labels are read once per round, so the lazy
        # round costs one extra round of recompute at most)
        if it % 2 == 1 and it != iters - 1:
            labels = labels.localCheckpoint(eager=False)
    return labels.select("node", F.col("label").alias("community"))
