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

# Small-graph fold gate (r14, the q_ewma_sql lesson generalized): when
# the graph that survives edge aggregation is provably small, the
# iterative DataFrame loop is pure per-level orchestration — each
# iteration pays fixed driver/job/stage latency on microscopic state
# (measured r14: q_textrank 89 stages / 2.0 s task time for 4.4 s wall,
# q_pagerank 123 stages, q_hits 259 stages — the exact cost class the
# r13 ewma fold removed).  Below these bounds the whole power iteration
# runs as ONE higher-order-function fold over a single packed row
# (state O(V+E), per-iteration work O(V+E) via phase-threaded
# accumulators, never nested-recompute); above them the distributed
# loop is the right shape and stands unchanged.  Bounds sized so the
# packed row stays well under Spark's single-row comfort zone
# (~24 B/edge x 2 directions + ~32 B/node ≈ 50 MB at the cap).
_FOLD_MAX_NODES = 65_536
_FOLD_MAX_EDGES = 1_000_000


def _indexed_one_row(
    norm: DataFrame,
    nodes: DataFrame,
    src: str,
    dst: str,
    frac: str,
    out_lists: bool = False,
) -> DataFrame:
    """Pack a (small, pre-counted) weighted digraph into ONE row:
    ``g`` = array over dense node index of
    ``struct(_i, node, _in[, _out])`` where ``_in``/``_out`` are the
    node's inbound/outbound edge lists as ``struct(_j, _f)`` (neighbor
    index, weight), each list sorted by neighbor index so every fold
    accumulates in a deterministic order.  Nodes without edges in a
    direction carry NULL lists (the fold treats them as empty — the
    same semantics as the loop's left-join + coalesce)."""
    from pyspark.sql import Window

    nid = nodes.select("node").withColumn(
        "_i", (F.row_number().over(Window.orderBy("node")) - F.lit(1)).cast("int")
    )
    e = (
        norm.join(
            nid.select(F.col("node").alias("_sn"), F.col("_i").alias("_si")),
            F.col(src) == F.col("_sn"),
        )
        .join(
            nid.select(F.col("node").alias("_dn"), F.col("_i").alias("_di")),
            F.col(dst) == F.col("_dn"),
        )
        .select("_si", "_di", F.col(frac).alias("_f"))
    )
    inb = e.groupBy("_di").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("_si").alias("_j"), F.col("_f")))
        ).alias("_in")
    )
    g = nid.join(inb, nid["_i"] == inb["_di"], "left").select("_i", "node", "_in")
    if out_lists:
        outb = e.groupBy("_si").agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("_di").alias("_j"), F.col("_f")))
            ).alias("_out")
        )
        g = g.join(outb, g["_i"] == outb["_si"], "left").select(
            "_i", "node", "_in", "_out"
        )
    return g.agg(
        F.sort_array(F.collect_list(F.struct(*[F.col(c) for c in g.columns]))).alias(
            "g"
        )
    )


def _explode_scores(one: DataFrame, scores, out_col: str) -> DataFrame:
    """(packed row, scores array) -> (node, ROUND(score, 6)) rows."""
    z = one.select(
        F.explode(
            F.arrays_zip(F.col("g.node").alias("node"), scores.alias("_s"))
        ).alias("z")
    )
    return z.select(
        F.col("z.node").alias("node"), F.round("z._s", 6).alias(out_col)
    )


def _pagerank_fold(
    norm: DataFrame, nodes: DataFrame, n: int, damping: float, iters: int,
    src: str, dst: str,
) -> DataFrame:
    """The small-graph fold twin of ``pagerank``'s loop: identical
    double literals and per-node operations, accumulation order fixed
    (edge lists sorted by source index) where the loop's shuffle order
    was arbitrary — the same <=1e-16 class of float-sum reordering the
    loop already tolerates under the final 6-decimal rounding (module
    docstring).  Two fold phases per iteration so the dangling-mass
    scalar is computed ONCE per iteration (state-threaded), keeping the
    per-iteration cost O(V+E) instead of O(V^2)."""
    one = _indexed_one_row(norm, nodes, src=src, dst=dst, frac="_frac", out_lists=True)
    init = F.struct(
        F.array_repeat(F.lit(1.0 / n), n).alias("sc"), F.lit(0.0).alias("dm")
    )
    base = F.lit((1 - damping) / n)

    def _step(st, i):
        # phase 1 (odd i): dangling mass of the CURRENT scores — the
        # loop's `ranks ⋈ dang |> sum(score)` as an O(V) array scan
        dm = F.aggregate(
            F.col("g"),
            F.lit(0.0),
            lambda a, x: a
            + F.when(
                x["_out"].isNull(), F.element_at(st["sc"], x["_i"] + F.lit(1))
            ).otherwise(F.lit(0.0)),
        )
        # phase 2 (even i): the rank update itself
        def node_score(x):
            c = F.aggregate(
                x["_in"],
                F.lit(0.0),
                lambda acc, e: acc + e["_f"] * F.element_at(st["sc"], e["_j"] + F.lit(1)),
            )
            c = F.when(x["_in"].isNull(), F.lit(0.0)).otherwise(c)
            return base + F.lit(damping) * (c + st["dm"] / F.lit(n))
        return F.when(
            i % F.lit(2) == F.lit(1),
            F.struct(st["sc"].alias("sc"), dm.alias("dm")),
        ).otherwise(
            F.struct(F.transform(F.col("g"), node_score).alias("sc"), st["dm"].alias("dm"))
        )

    folded = F.aggregate(F.sequence(F.lit(1), F.lit(2 * iters)), init, _step)
    return _explode_scores(one, folded["sc"], "score")


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
    # small-graph fast path (r14): the whole power iteration as ONE
    # fold over a packed row — see _FOLD_MAX_NODES.  Counts are cheap
    # here (both sides derive from the checkpointed edge table).
    if n <= _FOLD_MAX_NODES:
        norm = norm.localCheckpoint(eager=False)
        if norm.count() <= _FOLD_MAX_EDGES:
            return _pagerank_fold(norm, nodes, n, damping, iters, src, dst)
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


def _lpa_fold(edges: DataFrame, nodes: DataFrame, iters: int) -> DataFrame:
    """Small-graph fold twin of ``label_propagation``'s loop — exact by
    construction: per node the new label is the mode of its neighbors'
    labels with smallest-label tie-break, computed here by sorting the
    neighbor labels and scanning runs (ascending order makes "strictly
    greater count replaces" pick the smallest label among maxima —
    the same total order as the loop's ``ORDER BY count DESC, label``
    row_number).  Integer counts, no floats: fold == loop exactly."""
    one = _indexed_one_row(
        edges.withColumn("_f", F.lit(1.0)), nodes, src="u", dst="v", frac="_f"
    )
    init = F.col("g.node")  # every node starts as its own community

    def _mode(x, lab):
        nl = F.array_sort(
            F.transform(x["_in"], lambda e: F.element_at(lab, e["_j"] + F.lit(1)))
        )
        z = F.struct(
            F.element_at(nl, 1).alias("best"),
            F.lit(0).cast("long").alias("bc"),
            F.element_at(nl, 1).alias("cur"),
            F.lit(0).cast("long").alias("cc"),
        )

        def scan(s, l):
            cc = F.when(l == s["cur"], s["cc"] + F.lit(1)).otherwise(
                F.lit(1).cast("long")
            )
            return F.struct(
                F.when(cc > s["bc"], l).otherwise(s["best"]).alias("best"),
                F.when(cc > s["bc"], cc).otherwise(s["bc"]).alias("bc"),
                l.alias("cur"),
                cc.alias("cc"),
            )

        return F.aggregate(nl, z, scan, lambda s: s["best"])

    def _step(lab, i):
        return F.transform(
            F.col("g"),
            lambda x: F.when(
                x["_in"].isNull(), F.element_at(lab, x["_i"] + F.lit(1))
            ).otherwise(_mode(x, lab)),
        )

    folded = F.aggregate(F.sequence(F.lit(1), F.lit(iters)), init, _step)
    z = one.select(
        F.explode(
            F.arrays_zip(F.col("g.node").alias("node"), folded.alias("_l"))
        ).alias("z")
    )
    return z.select(F.col("z.node").alias("node"), F.col("z._l").alias("community"))


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
    n_pairs = p.count()
    if n_pairs <= 100_000:
        p = p.coalesce(1)
    edges = p.unionAll(
        p.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint()
    # small-graph fast path (r14): the whole propagation as ONE fold —
    # exact (integer counts, deterministic tie-break), see _FOLD_MAX_NODES
    if 2 * n_pairs <= _FOLD_MAX_EDGES:
        nodes = edges.select(F.col("u").alias("node")).distinct()
        if nodes.count() <= _FOLD_MAX_NODES:
            return _lpa_fold(edges, nodes, iters)
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


def _hits_fold(frac: DataFrame, nodes: DataFrame, n: int, iters: int) -> DataFrame:
    """Small-graph fold twin of ``hits``'s loop — exact by construction:
    every contribution quantizes to integer 1e-12 units before the
    sums (order-irrelevant long arithmetic), and the L1 totals are the
    same long sums (nodes without edges contribute literal 0).  Six
    fold phases per iteration thread the intermediates (quantized
    sums, totals) through the accumulator so each phase is O(V+E) —
    no nested recompute."""
    one = _indexed_one_row(frac, nodes, src="s", dst="d", frac="frac", out_lists=True)
    zl = F.lit(0).cast("long")

    def _qsum(lst, vec):
        s = F.aggregate(
            lst,
            zl,
            lambda acc, e: acc
            + F.round(
                e["_f"] * F.element_at(vec, e["_j"] + F.lit(1)) * F.lit(1e12), 0
            ).cast("long"),
        )
        return F.when(lst.isNull(), zl).otherwise(s)

    init = F.struct(
        F.array_repeat(F.lit(0.0), n).alias("a"),
        F.array_repeat(F.lit(1.0) / F.lit(float(n)), n).alias("h"),
        F.array_repeat(zl, n).alias("q"),
        zl.alias("t"),
    )

    def _step(st, i):
        ph = (i - F.lit(1)) % F.lit(6)
        tot = F.aggregate(st["q"], zl, lambda p, x: p + x)
        ratio = F.transform(st["q"], lambda x: x.cast("double") / st["t"].cast("double"))

        def keep(**over):
            fields = {"a": st["a"], "h": st["h"], "q": st["q"], "t": st["t"], **over}
            return F.struct(*[fields[k].alias(k) for k in ("a", "h", "q", "t")])

        return (
            F.when(ph == F.lit(0), keep(q=F.transform(F.col("g"), lambda x: _qsum(x["_in"], st["h"]))))
            .when(ph == F.lit(1), keep(t=tot))
            .when(ph == F.lit(2), keep(a=ratio))
            .when(ph == F.lit(3), keep(q=F.transform(F.col("g"), lambda x: _qsum(x["_out"], st["a"]))))
            .when(ph == F.lit(4), keep(t=tot))
            .otherwise(keep(h=ratio))
        )

    folded = F.aggregate(F.sequence(F.lit(1), F.lit(6 * iters)), init, _step)
    # stage the fold behind a projection boundary so the interpreted
    # HOF evaluates ONCE (the _cc_fold_labels lesson): referencing
    # folded["a"]/folded["h"] directly would inline two copies
    one = one.select(F.col("g"), folded.alias("_st"))
    z = one.select(
        F.explode(
            F.arrays_zip(
                F.col("g.node").alias("node"),
                F.col("_st.a").alias("_a"),
                F.col("_st.h").alias("_h"),
            )
        ).alias("z")
    )
    return z.select(
        F.col("z.node").alias("node"),
        F.round("z._a", 6).alias("authority"),
        F.round("z._h", 6).alias("hub"),
    )


def hits(
    edges: DataFrame,
    iters: int = 5,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
) -> DataFrame:
    """HITS hub/authority scores over a directed weighted graph, with
    L1 normalization (scores sum to 1 — the Kleinberg L2 variant swaps
    the norm; L1 keeps every step a ratio of exact integers).

    Parity design (the textrank discipline): edge weights normalize
    ONCE against the exact integer total (one bit-identical division);
    every iteration's contributions w_frac*score quantize to integer
    1e-12 units BEFORE the per-node sums, and the L1 norm is then the
    exact integer total of those sums — each authority/hub update is
    integer arithmetic plus one division, order-exact at any fan-in.
    Per-iteration state is 2x node count; the corpus-sized work is the
    caller's edge construction (checkpointed once)."""
    e = edges.select(
        F.col(src).alias("s"), F.col(dst).alias("d"), F.col(weight).cast("long").alias("wl")
    ).localCheckpoint()
    total = e.agg(F.sum("wl")).collect()[0][0]
    frac = e.select(
        "s", "d", (F.col("wl").cast("double") / F.lit(float(total))).alias("frac")
    ).localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("s").alias("node"))
        .unionAll(e.select(F.col("d").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    # small-graph fast path (r14): one fold instead of 5 x 4 jobs —
    # exact (quantized-integer contributions), see _FOLD_MAX_NODES
    if n <= _FOLD_MAX_NODES and e.count() <= _FOLD_MAX_EDGES:
        return _hits_fold(frac, nodes, n, iters)
    hub = nodes.withColumn("h", F.lit(1.0) / F.lit(float(n)))
    auth = None
    for _ in range(iters):
        araw = (
            frac.join(hub, frac["s"] == hub["node"])
            .groupBy("d")
            .agg(
                F.sum(
                    F.round(F.col("frac") * F.col("h") * F.lit(1e12), 0).cast("long")
                ).alias("aq")
            )
        )
        atot = araw.agg(F.sum("aq").alias("_atot"))
        auth = (
            nodes.join(araw, nodes["node"] == araw["d"], "left")
            .crossJoin(F.broadcast(atot))
            .select(
                "node",
                (
                    F.coalesce(F.col("aq"), F.lit(0)).cast("double")
                    / F.col("_atot").cast("double")
                ).alias("a"),
            )
            .localCheckpoint(eager=False)
        )
        hraw = (
            frac.join(auth, frac["d"] == auth["node"])
            .groupBy("s")
            .agg(
                F.sum(
                    F.round(F.col("frac") * F.col("a") * F.lit(1e12), 0).cast("long")
                ).alias("hq")
            )
        )
        htot = hraw.agg(F.sum("hq").alias("_htot"))
        hub = (
            nodes.join(hraw, nodes["node"] == hraw["s"], "left")
            .crossJoin(F.broadcast(htot))
            .select(
                "node",
                (
                    F.coalesce(F.col("hq"), F.lit(0)).cast("double")
                    / F.col("_htot").cast("double")
                ).alias("h"),
            )
            .localCheckpoint(eager=False)
        )
    return (
        auth.join(hub, "node")
        .select(
            "node",
            F.round("a", 6).alias("authority"),
            F.round("h", 6).alias("hub"),
        )
    )


def kcore_layers(
    pairs: DataFrame,
    a: str = "doc_a",
    b: str = "doc_b",
    rounds: int = 6,
) -> DataFrame:
    """Coreness layers 1/2/3 of an undirected graph via iterative
    peeling: for k in (2, 3), repeatedly drop nodes whose degree in the
    surviving subgraph is below k (``rounds`` synchronous rounds — the
    distributed k-core kernel; rounds bounds the peel-chain length, and
    6 converges on every tested graph).  coreness = 3 means "3-core or
    denser".  Degrees are exact integers throughout — no float enters
    the query at all, so it is hash-exact by construction.

    Scale: each round is one degree groupBy + one semi-join filter on
    fixed-width node keys; the edge set only shrinks."""
    # checkpoint the caller's pair construction BEFORE symmetrizing:
    # unionAll(pairs, pairs) would inline the (typically expensive)
    # build twice into one plan and double its cost
    p0 = pairs.select(F.col(a).alias("u"), F.col(b).alias("v")).localCheckpoint()
    # small-graph fast path (r14, the fold family): the peel loop is
    # 2 k-values x `rounds` x (degree agg + 2 joins + every-2nd-round
    # eager checkpoint) on a tiny edge set.  The contract is EXACTLY
    # `rounds` synchronous peels (fixed, not converge-until), and the
    # per-round state is one alive-flag per node with the integer
    # recurrence K_r(x) = (# incident edges with both endpoints alive
    # under K_{r-1}) >= k — so the in-row fold below is exactly the
    # loop, boolean-for-boolean, with no round-bound caveat at all.
    n_pairs = p0.count()
    if 2 * n_pairs <= _FOLD_MAX_EDGES:
        e2 = p0.unionAll(p0.select(F.col("v").alias("u"), F.col("u").alias("v")))
        nodes = e2.select(F.col("u").alias("node")).distinct()
        if nodes.count() <= _FOLD_MAX_NODES:
            one = _indexed_one_row(
                e2.withColumn("_f", F.lit(1.0)), nodes, src="u", dst="v", frac="_f"
            )

            def core_flags(k: int):
                init = F.transform(F.col("g"), lambda x: F.lit(True))

                def step(fl, _r):
                    return F.transform(
                        F.col("g"),
                        lambda x: F.aggregate(
                            x["_in"],
                            F.lit(0),
                            lambda c, e: c
                            + F.when(
                                F.element_at(fl, x["_i"] + F.lit(1))
                                & F.element_at(fl, e["_j"] + F.lit(1)),
                                F.lit(1),
                            ).otherwise(F.lit(0)),
                        )
                        >= F.lit(k),
                    )

                return F.aggregate(F.sequence(F.lit(1), F.lit(rounds)), init, step)

            one = one.select(
                F.col("g"), core_flags(2).alias("_k2"), core_flags(3).alias("_k3")
            )

            def member(flags_col, x):
                return F.element_at(flags_col, x["_i"] + F.lit(1)) & F.exists(
                    x["_in"],
                    lambda e: F.element_at(flags_col, e["_j"] + F.lit(1)),
                )

            corn = F.transform(
                F.col("g"),
                lambda x: (
                    F.lit(1)
                    + member(F.col("_k2"), x).cast("int")
                    + member(F.col("_k3"), x).cast("int")
                ).cast("long"),
            )
            z = one.select(
                F.explode(
                    F.arrays_zip(F.col("g.node").alias("node"), corn.alias("_c"))
                ).alias("z")
            )
            return z.select(
                F.col("z.node").alias("node"), F.col("z._c").alias("coreness")
            )
    # parallelism tracks the GRAPH size (the pagerank rule): the peel
    # loop is 2 x rounds x (degree agg + 2 joins) — on a small edge set
    # 32-task stages are pure scheduler overhead
    if n_pairs <= 100_000:
        p0 = p0.coalesce(1).localCheckpoint()
    e0 = p0.unionAll(p0.select(F.col("v").alias("u"), F.col("u").alias("v")))
    all_nodes = e0.select(F.col("u").alias("node")).distinct().localCheckpoint()

    def core_nodes(k: int) -> DataFrame:
        e = e0
        for i in range(rounds):
            keep = (
                e.groupBy("u")
                .agg(F.count(F.lit(1)).alias("_deg"))
                .filter(F.col("_deg") >= k)
                .select("u")
            )
            e = (
                e.join(keep, "u")
                .join(keep.withColumnRenamed("u", "v"), "v")
                .select("u", "v")
            )
            if i % 2 == 1:
                e = e.localCheckpoint()
        return e.select(F.col("u").alias("node")).distinct()

    c2 = core_nodes(2).withColumn("_c2", F.lit(1))
    c3 = core_nodes(3).withColumn("_c3", F.lit(1))
    return (
        all_nodes.join(c2, "node", "left")
        .join(c3, "node", "left")
        .select(
            "node",
            (
                F.lit(1)
                + F.coalesce(F.col("_c2"), F.lit(0))
                + F.coalesce(F.col("_c3"), F.lit(0))
            ).cast("long").alias("coreness"),
        )
    )


def clustering_coefficient(
    pairs: DataFrame,
    a: str = "doc_a",
    b: str = "doc_b",
    max_degree: int = 64,
) -> DataFrame:
    """Local clustering coefficient c = 2T / (d(d-1)) per node of the
    degree-capped subgraph (same super-node cut as triangle_counts, so
    T and d are CONSISTENT — both measured after removing nodes with
    degree > ``max_degree``).  T and d are exact integers; c is
    ROUND(2T/(d(d-1)), 6) — a small-denominator rational, safe at 6dp.
    Nodes with capped degree < 2 emit NULL coefficient."""
    e0 = pairs.select(F.col(a).alias("u"), F.col(b).alias("v")).localCheckpoint()
    deg0 = (
        e0.select(F.col("u").alias("node"))
        .unionAll(e0.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("_d"))
    )
    heavy = deg0.filter(F.col("_d") > max_degree).select("node")
    e = (
        e0.join(F.broadcast(heavy), e0["u"] == heavy["node"], "left_anti")
        .join(F.broadcast(heavy), e0["v"] == heavy["node"], "left_anti")
        .localCheckpoint()
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
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
        .select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    d = F.col("degree")
    t = F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long")
    return (
        deg.join(tri, "node", "left")
        .select(
            "node",
            "degree",
            t.alias("n_triangles"),
            F.when(
                d >= 2,
                F.round(
                    F.lit(2.0) * t.cast("double")
                    / (d.cast("double") * (d.cast("double") - F.lit(1.0))),
                    6,
                ),
            ).alias("clustering_coef"),
        )
    )


def degree_assortativity(
    pairs: DataFrame, a: str = "doc_a", b: str = "doc_b"
) -> DataFrame:
    """One-row graph summary: node/edge counts, max degree, mean degree
    (emitted as the exact 2m/n division, unrounded — bit-identical),
    and degree assortativity (Pearson r of endpoint degrees over both
    edge orientations) computed from exact integer moments.  Negative r
    = hubs attach to leaves (dissortative, typical of similarity
    graphs).  Integer-moment products stay inside int64 for graphs up
    to ~1e5 edges x 1e4 max degree — a whole-graph scalar diagnostic,
    documented analysis-scale."""
    p0 = pairs.select(F.col(a).alias("u"), F.col(b).alias("v")).localCheckpoint()
    e = p0.unionAll(p0.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = e.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    dx = deg.select(F.col("u").alias("nx"), F.col("d").alias("dx"))
    dy = deg.select(F.col("u").alias("ny"), F.col("d").alias("dy"))
    x = (
        e.join(dx, e["u"] == dx["nx"])
        .join(dy, e["v"] == dy["ny"])
        .select("dx", "dy")
    )
    m = x.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dx").alias("sx"),
        F.sum("dy").alias("sy"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).alias("syy"),
    )
    nodes = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"), F.max("d").alias("max_degree")
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col(
        "sy"
    ).cast("double")
    denx = nd * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col(
        "sx"
    ).cast("double")
    deny = nd * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col(
        "sy"
    ).cast("double")
    return m.crossJoin(nodes).select(
        "n_nodes",
        (F.col("n") / F.lit(2)).cast("long").alias("n_edges"),
        "max_degree",
        (
            F.col("n").cast("double") / F.col("n_nodes").cast("double")
        ).alias("mean_degree"),
        F.when(
            (denx > 0) & (deny > 0),
            F.round(num / F.sqrt(denx * deny), 6),
        ).alias("assortativity"),
    )
