"""Frequent-items (heavy hitters) over token streams: a Misra-Gries
candidate sketch re-verified with exact counts.

Scale design (the 100 TB posture):

- Pass 1 (``misra_gries_candidates``) is SHUFFLE-FREE: one
  ``mapInPandas`` scan keeps a capacity-bounded counter dict per
  partition (Arrow-batched; the summary, not the stream, is the state)
  and emits only the surviving tokens — O(partitions x capacity) rows.
- Pass 2 (``heavy_hitters``) re-verifies ONLY the candidate union:
  the token explode broadcast-semi-joins the candidate set before the
  exact groupBy, so the count shuffle carries candidate tokens only,
  never the full vocabulary.
- The MG guarantee — every token with partition frequency
  > m_p/(capacity+1) survives a capacity-c summary (Misra & Gries 1982;
  Cormode's frequent-items survey) — plus the averaging argument
  (a token with global count > n/k must exceed n_p/k on some partition)
  makes the candidate union a SUPERSET of the true heavy hitters for
  capacity >= k.  The exact re-verification therefore returns exactly
  the tokens with ``cnt * k > n`` — deterministic and
  partitioning-independent even though the sketch itself is neither.

The threshold compare stays in integers (``cnt * k > n``) so the result
admits an exact SQL oracle with no float-boundary ambiguity.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import TOKEN_RE, tokens_col


def _mg_update(counters: dict[str, int], toks: list[str], cap: int) -> None:
    """Classic Misra-Gries step: increment known, admit while < cap,
    else decrement-all (deleting zeros) — the frequency-vote cancel."""
    for t in toks:
        if t in counters:
            counters[t] += 1
        elif len(counters) < cap:
            counters[t] = 1
        else:
            dead = []
            for key in counters:
                counters[key] -= 1
                if counters[key] == 0:
                    dead.append(key)
            for key in dead:
                del counters[key]


def misra_gries_candidates(
    df: DataFrame, k: int, text_col: str = "text", capacity: int | None = None
) -> DataFrame:
    """Per-partition MG summaries -> distinct candidate tokens.  The
    output SET depends on partitioning (any valid superset); callers
    must re-verify (``heavy_hitters``) before treating it as an answer."""
    cap = capacity if capacity is not None else 2 * k
    pat = re.compile(TOKEN_RE)

    def sketch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for text in pdf[text_col]:
                if text is None:
                    continue
                _mg_update(counters, [t for t in pat.split(text.lower()) if t], cap)
        yield pd.DataFrame({"token": list(counters.keys())})

    return df.select(text_col).mapInPandas(sketch, "token string").distinct()


def heavy_hitters(
    df: DataFrame, k: int = 30, text_col: str = "text", capacity: int | None = None
) -> DataFrame:
    """EXACT tokens with corpus frequency > n/k (n = total tokens),
    found sketch-first: MG candidates (superset for capacity >= k),
    then exact counts for candidates only.  Output: token, cnt, share."""
    if capacity is not None and capacity < k:
        raise ValueError(f"capacity {capacity} < k {k} voids the superset guarantee")
    cands = misra_gries_candidates(df, k, text_col, capacity)
    return exact_verify_candidates(df, cands, k, text_col)


def exact_verify_candidates(
    df: DataFrame, cands: DataFrame, k: int = 30, text_col: str = "text"
) -> DataFrame:
    """Exact re-verification of a heavy-hitter CANDIDATE set: count only
    the candidate tokens, keep those with cnt*k > n.  Deterministic
    regardless of how (or where — batch sketch, streaming state) the
    superset was produced; the shared second phase of ``heavy_hitters``
    and the streaming MG twin."""
    total = df.select(F.sum(F.size(tokens_col(text_col))).alias("_n"))
    toks = df.select(F.explode(tokens_col(text_col)).alias("token"))
    return (
        toks.join(F.broadcast(cands), "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * k > F.col("_n"))
        .select(
            "token", "cnt", F.round(F.col("cnt") / F.col("_n"), 6).alias("share")
        )
    )


def cm_sketch(items: DataFrame, item_col: str, depth: int = 4, width: int = 256) -> DataFrame:
    """Count-Min sketch of an item stream (Cormode & Muthukrishnan 2005)
    in coordinate form: ``(d, bucket, cnt)`` with
    bucket = porthash32(item || '#' || d) % width — the portable salted
    hash family, so the sketch is identical on any engine with md5.

    Scale: one map-side explode into ``depth`` rows per item followed by
    a combiner-reduced groupBy whose key space is depth x width —
    CONSTANT regardless of stream length or vocabulary, and two
    sketches of the same shape MERGE by adding counts (the property
    that lets every partition/day/shard sketch independently)."""
    from .dedup import porthash32

    items = items.filter(F.col(item_col).isNotNull())
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(d).alias("d"),
                    (
                        porthash32(
                            F.concat_ws("#", F.col(item_col).cast("string"), F.lit(str(d)))
                        )
                        % width
                    ).alias("bucket"),
                )
                for d in range(depth)
            ]
        )
    )
    return (
        items.select(rows.alias("r"))
        .groupBy(F.col("r.d").alias("d"), F.col("r.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cm_estimate_vs_exact(
    df: DataFrame,
    text_col: str = "text",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Count-Min point queries audited against exact counts for the
    whole token vocabulary: est = min over the ``depth`` rows of the
    item's bucket counts; CM's one-sided guarantee (est >= exact,
    over-estimation bounded by collisions) is emitted as a checkable
    column rather than assumed.

    Plan: exact counts are one groupBy; the estimate joins the
    vocabulary's depth hash rows against the depth x width sketch
    (broadcast-sized by construction) and min-aggregates — no second
    pass over the corpus.

    Returns (token, exact_n, cm_n, is_overestimate) per vocab token."""
    from ..util import spread
    from .dedup import porthash32, tokens_col

    # spread before the tokenize+explode (r9 parallelism-trap class:
    # a narrow documents scan pins both consumers to its width)
    tok = spread(df.select(F.col(text_col))).select(
        F.explode(tokens_col(text_col)).alias("token")
    )
    exact = tok.groupBy("token").agg(F.count(F.lit(1)).alias("exact_n"))
    sk = cm_sketch(tok, "token", depth=depth, width=width)
    probes = exact.select(
        "token",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        (
                            porthash32(F.concat_ws("#", F.col("token"), F.lit(str(d))))
                            % width
                        ).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("p"),
    ).select("token", F.col("p.d").alias("d"), F.col("p.bucket").alias("bucket"))
    est = (
        probes.join(F.broadcast(sk), ["d", "bucket"])
        .groupBy("token")
        .agg(F.min("cnt").alias("cm_n"))
    )
    return exact.join(est, "token").select(
        "token",
        "exact_n",
        "cm_n",
        (F.col("cm_n") >= F.col("exact_n")).alias("is_overestimate"),
    )


def hll_buckets(
    items: DataFrame, item_col: str, group_col: str | None = None, p: int = 8
) -> DataFrame:
    """PORTABLE HyperLogLog registers (Flajolet et al. 2007): bucket =
    top ``p`` bits of the md5-derived 32-bit item hash, register M =
    max over items of (leading zeros of the remaining 32-p bits) + 1.
    Unlike ``approx_count_distinct`` (engine-private HLL++ internals,
    only checkable as a tolerance boolean), every register here is a
    deterministic integer identical on any engine with md5 — the sketch
    itself is value-hash checkable and MERGEABLE by max.

    rho avoids libm entirely: bits_needed(x) = Σ_i [x >= 2^i] over the
    32-p candidate bit positions (pure integer comparisons), rho =
    (32-p) + 1 - bits_needed.  Shuffle key space is groups x 2^p —
    constant in stream length."""
    from .dedup import porthash32

    items = items.filter(F.col(item_col).isNotNull())
    w = 32 - p
    gcols = [group_col] if group_col else []
    hv = porthash32(F.col(item_col).cast("string"))
    rem = hv % F.lit(1 << w).cast("long")
    bits_needed = sum(
        F.when(rem >= F.lit(1 << i).cast("long"), 1).otherwise(0) for i in range(w)
    )
    rho = F.lit(w + 1) - bits_needed
    return (
        items.select(
            *gcols,
            (hv / F.lit(1 << w)).cast("long").alias("bucket"),
            rho.alias("_rho"),
        )
        .groupBy(*gcols, "bucket")
        .agg(F.max("_rho").alias("m_reg"))
    )


def hll_estimate(
    items: DataFrame, item_col: str, group_col: str | None = None, p: int = 8
) -> DataFrame:
    """Distinct-count estimate from the portable registers, with the
    standard small-range (linear-counting) correction.  The harmonic
    sum folds registers in bucket order (plus one unit per EMPTY
    bucket), so both engines accumulate identically; the only libm call
    (ln, in the linear-counting branch) sits under the output rounding.

    Returns (group?, hll_est) — rounded 4dp."""
    gcols = [group_col] if group_col else []
    regs = hll_buckets(items, item_col, group_col, p)
    return hll_estimate_from_regs(regs, gcols, p)


def hll_estimate_from_regs(regs: DataFrame, gcols: list[str], p: int = 8) -> DataFrame:
    """The estimate expression over an already-built register table —
    the entry point for MERGED sketches (shard/cohort registers combined
    by max), kept as the single implementation so sketch-and-merge
    pipelines and direct estimates can never drift apart."""
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    agg = regs.groupBy(*gcols).agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("bucket", "m_reg"))),
            F.lit(0.0),
            lambda acc, r: acc + F.pow(F.lit(2.0), -r["m_reg"]),
        ).alias("_hsum"),
        F.count(F.lit(1)).alias("_nb"),
    )
    zsum = F.col("_hsum") + (F.lit(m) - F.col("_nb")).cast("double")
    raw = F.lit(alpha * m * m) / zsum
    v_empty = (F.lit(m) - F.col("_nb")).cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v_empty > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v_empty),
    ).otherwise(raw)
    return agg.select(*gcols, F.round(est, 4).alias("hll_est"))


def hll_set_algebra(
    items: DataFrame, item_col: str, cohort_col: str = "cohort", p: int = 8
) -> DataFrame:
    """Set algebra on mergeable HLL sketches — the audience-overlap
    primitive: per-cohort registers, a UNION sketch built by register
    MAX (the merge law that lets every shard/day/partition sketch
    independently and combine later), and the intersection via
    inclusion-exclusion |A|+|B|-|A u B| (HLLs cannot intersect
    directly).  Exact counterparts ride the same scan for the accuracy
    audit.

    Expects exactly two cohort values 'a' and 'b'.  Scale: register
    tables are cohorts x 2^p rows — constant in stream length; the
    exact twin is the only distinct-shuffle and exists for the audit,
    not the production path.

    Returns ONE row: est_a/b/union/inter, exact_a/b/union/inter,
    jacc_est (estimated Jaccard, 6dp)."""
    regs = hll_buckets(items, item_col, cohort_col, p)
    union_regs = (
        regs.groupBy("bucket")
        .agg(F.max("m_reg").alias("m_reg"))
        .select(F.lit("union").alias(cohort_col), "bucket", "m_reg")
    )
    est = hll_estimate_from_regs(
        regs.select(cohort_col, "bucket", "m_reg").unionByName(union_regs),
        [cohort_col],
        p,
    )
    pick = lambda c: F.max(F.when(F.col(cohort_col) == c, F.col("hll_est")))
    e = est.agg(
        pick("a").alias("est_a"),
        pick("b").alias("est_b"),
        pick("union").alias("est_union"),
    ).select(
        "est_a",
        "est_b",
        "est_union",
        F.round(
            F.col("est_a") + F.col("est_b") - F.col("est_union"), 4
        ).alias("est_inter"),
    )
    ex = items.agg(
        F.count_distinct(
            F.when(F.col(cohort_col) == "a", F.col(item_col))
        ).alias("exact_a"),
        F.count_distinct(
            F.when(F.col(cohort_col) == "b", F.col(item_col))
        ).alias("exact_b"),
        F.count_distinct(F.col(item_col)).alias("exact_union"),
    ).select(
        "exact_a",
        "exact_b",
        "exact_union",
        (F.col("exact_a") + F.col("exact_b") - F.col("exact_union")).alias(
            "exact_inter"
        ),
    )
    return e.crossJoin(ex).select(
        "est_a",
        "est_b",
        "est_union",
        "est_inter",
        "exact_a",
        "exact_b",
        "exact_union",
        "exact_inter",
        F.round(
            F.col("est_inter") / F.nullif(F.col("est_union"), F.lit(0.0)), 6
        ).alias("jacc_est"),
    )


def _hll_estimate_py(regs: dict[int, int], p: int) -> float:
    """Pure-Python twin of ``hll_estimate``'s expression (same alpha,
    bucket-ordered harmonic fold, linear-counting branch) for sketches
    already collected to the driver — keep the two in lockstep."""
    import math

    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    hsum = sum(2.0 ** -v for _, v in sorted(regs.items())) + (m - len(regs))
    raw = alpha * m * m / hsum
    v_empty = m - len(regs)
    if raw <= 2.5 * m and v_empty > 0:
        return m * math.log(m / v_empty)
    return raw


def hll_set_estimates(
    items_a: DataFrame, items_b: DataFrame, item_col: str, p: int = 8
) -> dict[str, float]:
    """Set-operation estimates from portable HLL registers WITHOUT
    touching raw data again: union registers merge by max (lossless for
    HLL), intersection follows by inclusion-exclusion
    |A∩B| ≈ |A| + |B| - |A∪B|.  The sketch-algebra pattern that lets a
    planner estimate join/overlap sizes from per-partition sketches
    alone.  Returns {'a','b','union','intersection'} estimates (driver-
    side floats; each sketch is 2^p small)."""
    ra = {r.bucket: r.m_reg for r in hll_buckets(items_a, item_col, p=p).collect()}
    rb = {r.bucket: r.m_reg for r in hll_buckets(items_b, item_col, p=p).collect()}
    ru = {b: max(ra.get(b, 0), rb.get(b, 0)) for b in set(ra) | set(rb)}
    ea, eb, eu = (_hll_estimate_py(r, p) for r in (ra, rb, ru))
    return {"a": ea, "b": eb, "union": eu, "intersection": max(0.0, ea + eb - eu)}


# --------------------------------------------------------------- bloom


def _bloom_pos(item_col: str, d: int, m_bits: int):
    """d-th salted bit position of an item — porthash32 of
    ``value#b<d>``, mod m.  Identical integer on any engine with md5
    (the same portable family as cm_sketch/hll_buckets)."""
    from .dedup import porthash32

    return (
        porthash32(
            F.concat_ws("#", F.col(item_col).cast("string"), F.lit(f"b{d}"))
        )
        % m_bits
    )


def _pow2_mask(pos):
    """2^(pos % 32) as a BIGINT — powers of two below 2^32 are exact in
    doubles, so the pow/cast round-trips identically on both engines
    (avoids shiftleft, whose PySpark binding takes only literal shifts)."""
    return F.pow(F.lit(2.0), (pos % 32).cast("double")).cast("long")


def bloom_build(
    items: DataFrame, item_col: str, m_bits: int = 32768, k: int = 4
) -> DataFrame:
    """Bloom filter of a key set in coordinate form: (widx, bits) rows
    over 32-bit words, bits = OR of 2^(pos%32) for each of ``k`` salted
    positions per item.

    Scale shape: one map-side explode into k rows per item, then a
    combiner-reduced groupBy whose key space is m/32 words — CONSTANT
    regardless of input size, and two blooms of the same (m, k) merge
    by bit_or (every partition/shard/day can sketch independently).
    This is the portable, oracle-checkable twin of what Spark's own
    runtime bloom-filter join (spark.sql.optimizer.runtime.bloomFilter)
    injects automatically for selective joins."""
    items = items.filter(F.col(item_col).isNotNull())
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.shiftright(_bloom_pos(item_col, d, m_bits), 5)
                    .cast("int")
                    .alias("widx"),
                    _pow2_mask(_bloom_pos(item_col, d, m_bits)).alias("mask"),
                )
                for d in range(k)
            ]
        )
    )
    return (
        items.select(rows.alias("r"))
        .groupBy(F.col("r.widx").alias("widx"))
        .agg(F.bit_or("r.mask").alias("bits"))
    )


def bloom_collect(words: DataFrame, m_bits: int) -> list[int]:
    """Densify the (widx, bits) rows into a m/32-word Python list —
    bounded driver state (m_bits/32 longs; 1 KiB per 32k bits), the
    same posture as k-means centroids.  Words never set stay 0."""
    arr = [0] * ((m_bits + 31) // 32)
    for r in words.collect():
        arr[int(r["widx"])] = int(r["bits"])
    return arr


def bloom_might_contain(item_col: str, words: list[int], m_bits: int, k: int):
    """In-plan membership test against a collected bloom: k bit probes
    of a literal word array — pure codegen expressions, no join, no
    shuffle.  True for every inserted key (no false negatives); false
    positives at the standard (1 - e^(-kn/m))^k rate."""
    lit_words = F.array(*[F.lit(int(w)).cast("long") for w in words])
    cond = F.lit(True)
    for d in range(k):
        pos = _bloom_pos(item_col, d, m_bits)
        widx = F.shiftright(pos, 5).cast("int")
        mask = _pow2_mask(pos)
        cond = cond & (
            F.element_at(lit_words, widx + 1).bitwiseAND(mask) == mask
        )
    return cond


def bloom_semi_audit(
    build: DataFrame,
    build_col: str,
    probe: DataFrame,
    probe_col: str,
    group_col: str,
    m_bits: int = 32768,
    k: int = 4,
) -> DataFrame:
    """Bloom-pruned semi-join audited against the exact join — the
    shuffle-reduction primitive: build a bloom over the (selective)
    build side's keys, test the probe side MAP-SIDE, and count per
    group how many rows pass the bloom vs truly match.  n_false_pos is
    the price of skipping the shuffle for non-matching rows; zero false
    NEGATIVES is the correctness guarantee (asserted by construction —
    n_pass >= n_true per group always).

    At 100 TB this is the pre-filter in front of a shuffled join: only
    bloom-passing rows enter the exchange, cutting shuffled bytes by
    ~(1 - selectivity) at a fixed fp overhead.  Spark's AQE injects
    the same structure automatically (runtime.bloomFilter); this
    operator is the explicit, portable, oracle-checkable form.

    Returns (group, n_probe, n_pass, n_true, n_false_pos), integers
    only."""
    words_df = bloom_build(build.select(build_col), build_col, m_bits, k)
    words = bloom_collect(words_df, m_bits)
    # exact-truth join in the STRING domain — the same domain the bloom
    # hashes — so the audit is type-agnostic (a long cast here would
    # NULL out string/date keys and report every true match as a false
    # positive)
    keys = (
        build.select(F.col(build_col).cast("string").alias("_k"))
        .distinct()
        .withColumn("_t", F.lit(True))
    )
    # NULL probe keys are never members: concat_ws inside the bloom hash
    # drops NULLs, so without the guard every NULL row would hash as the
    # bare salt string and share one arbitrary pass/fail signature.
    flagged = (
        probe.select(group_col, probe_col)
        .withColumn("_k", F.col(probe_col).cast("string"))
        .withColumn(
            "_p",
            F.when(
                F.col(probe_col).isNotNull(),
                bloom_might_contain(probe_col, words, m_bits, k),
            ).otherwise(F.lit(False)),
        )
        .join(F.broadcast(keys), "_k", "left")
    )
    return (
        flagged.groupBy(F.col(group_col).alias("group"))
        .agg(
            F.count(F.lit(1)).alias("n_probe"),
            F.sum(F.col("_p").cast("long")).alias("n_pass"),
            F.sum(F.coalesce(F.col("_t"), F.lit(False)).cast("long")).alias(
                "n_true"
            ),
            F.sum(
                (F.col("_p") & F.coalesce(~F.col("_t"), F.lit(True)))
                .cast("long")
            ).alias("n_false_pos"),
        )
    )


# --------------------------------------------- histogram quantile sketch


def hist_quantile_audit(
    df: DataFrame,
    value_col: str,
    group_col: str,
    n_buckets: int = 64,
    qs: tuple[float, ...] = (0.5, 0.9),
) -> DataFrame:
    """Quantiles from an equal-width histogram SKETCH, audited against
    the exact interpolated percentile — the mergeable-quantile member
    of the sketch family (MG = top-k, CM = counts, HLL = distinct,
    Bloom = membership, histogram = quantiles): per-group state is
    n_buckets counters, map-side combinable, and two histograms of the
    same (min, max, n_buckets) frame merge by adding counts.

    Estimate: within the first bucket whose cumulative count reaches
    q*n, interpolate linearly by the remaining mass — classic
    histogram quantiles, error bounded by one bucket width (emitted as
    ``err_ratio`` = |est - exact| / width, <= ~1.0 by construction).
    All arithmetic is closed-form doubles mirrored exactly in the SQL
    twin; no sort of the data, only of the n_buckets coordinate rows.

    Scale: one scan for the per-group (min, max, n, exact) frame + one
    scan for bucket counts (both partial-aggregated); the window runs
    over |groups| x n_buckets rows.  Exact percentile rides along ONLY
    as the audit — a production rollup keeps the histogram and drops
    the exact pass.

    Returns (group, q, n, est_q, exact_q, err_ratio)."""
    from pyspark.sql import Window

    v = F.col("v")
    base = df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("g"), F.col(value_col).cast("double").alias("v")
    )
    q_arr = "array(" + ", ".join(repr(float(q)) for q in qs) + ")"
    rng = base.groupBy("g").agg(
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
        F.count(F.lit(1)).alias("n"),
        F.expr(f"percentile(v, {q_arr})").alias("_ex"),
    )
    width = (F.col("mx") - F.col("mn")) / F.lit(float(n_buckets))  # bucket span
    bidx = F.when(F.col("mx") <= F.col("mn"), F.lit(0)).otherwise(
        F.least(
            F.lit(n_buckets - 1),
            F.greatest(
                F.lit(0),
                F.floor((v - F.col("mn")) / (F.col("mx") - F.col("mn")) * n_buckets),
            ),
        )
    ).cast("int")
    hist = (
        base.join(F.broadcast(rng.select("g", "mn", "mx")), "g")
        .groupBy("g", bidx.alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("g").orderBy("b")
    cum = hist.withColumn("cum", F.sum("c").over(w))
    quants = rng.select(
        "g", "mn", "mx", "n", "_ex",
        F.posexplode(F.array(*[F.lit(float(q)) for q in qs])).alias("qi", "q"),
    ).withColumn("target", F.col("q") * F.col("n").cast("double"))
    # first bucket whose cumulative count reaches the target mass
    hit = (
        quants.join(cum, "g")
        .filter(F.col("cum").cast("double") >= F.col("target"))
        .groupBy("g", "qi", "q", "mn", "mx", "n", "_ex", "target")
        .agg(
            F.min_by(
                F.struct("b", "c", "cum"), F.col("b")
            ).alias("_h")
        )
    )
    est = F.when(F.col("mx") <= F.col("mn"), F.col("mn")).otherwise(
        F.col("mn")
        + (
            F.col("_h.b").cast("double")
            + (
                F.col("target")
                - (F.col("_h.cum") - F.col("_h.c")).cast("double")
            )
            / F.col("_h.c").cast("double")
        )
        * width
    )
    exact = F.element_at("_ex", F.col("qi") + 1)
    return hit.select(
        F.col("g").alias("group"),
        F.round("q", 2).alias("q"),
        F.col("n"),
        F.round(est, 4).alias("est_q"),
        F.round(exact, 4).alias("exact_q"),
        F.when(F.col("mx") <= F.col("mn"), F.lit(0.0))
        .otherwise(F.round(F.abs(est - exact) / width, 2))
        .alias("err_ratio"),
    )
