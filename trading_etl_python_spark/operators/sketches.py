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
    from .dedup import porthash32, tokens_col

    tok = df.select(F.explode(tokens_col(text_col)).alias("token"))
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
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    gcols = [group_col] if group_col else []
    regs = hll_buckets(items, item_col, group_col, p)
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
