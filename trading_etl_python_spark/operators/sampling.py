"""Deterministic hash-based sampling and dataset splitting.

Training-data pipelines need samples and train/val/test splits that are
(a) reproducible run-over-run, (b) stable under re-partitioning and
retries, and (c) computable without any coordination — which rules out
``df.sample`` (engine-seeded per-partition RNG: adding one input file
reshuffles every assignment).  The standard trick is to hash a stable
row key and threshold the hash (the same mechanism behind bucketed
A/B assignment).  We reuse the portable md5-derived hash from
operators/dedup.py, so every sample/split here has an exact DuckDB twin
and is identical on ANY engine that can compute md5 — at 100 TB this is
a pure map-side operation, no shuffle, no state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import porthash32


def hash_bucket(key, n_buckets: int = 100) -> Column:
    """Stable bucket in [0, n_buckets) from the row key (cast to string
    so int and string keys hash identically on both engines)."""
    key = F.col(key) if isinstance(key, str) else key
    return porthash32(key.cast("string")) % n_buckets


def deterministic_sample(
    df: DataFrame, rate_pct: int = 10, key_col: str = "doc_id"
) -> DataFrame:
    """Keep ~rate_pct% of rows, chosen by key hash — stable across runs,
    partitionings, and engines."""
    return df.filter(hash_bucket(key_col) < rate_pct)


def split_assign(
    df: DataFrame,
    key_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Add a ``split`` column: train / val / test by hash bucket.  A
    document's split NEVER changes as the corpus grows — the property
    that keeps eval sets uncontaminated across pipeline re-runs."""
    b = hash_bucket(key_col)
    return df.withColumn(
        "split",
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, int],
    stratum_col: str = "lang",
    default_pct: int = 10,
    key_col: str = "doc_id",
) -> DataFrame:
    """Per-stratum deterministic sampling — the corpus-rebalancing move
    (upsample scarce languages / downsample dominant sources) done with
    the same stable hash-threshold as ``deterministic_sample``: rates
    differ per stratum but assignment stays map-side, reproducible, and
    engine-portable.  ``rates`` maps stratum value -> keep percentage;
    unlisted strata use ``default_pct``."""
    b = hash_bucket(key_col)
    rate = F.lit(default_pct)
    for val, pct in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == val, F.lit(pct)).otherwise(rate)
    return df.filter(b < rate)


def mixture_sample(
    df: DataFrame,
    target: dict[str, float],
    stratum_col: str = "source",
    key_col: str = "doc_id",
    resolution: int = 1_000_000,
) -> DataFrame:
    """Downsample to a TARGET MIXTURE (domain-weighting, the
    pretraining-mix move): ``target`` maps stratum value -> desired
    share of the OUTPUT.  Unlike ``stratified_sample`` (caller fixes
    per-stratum keep-rates), the rates here are derived from the corpus
    itself: with counts n_s and target shares w_s, the largest feasible
    mixture-true output is T = min_s(n_s / w_s) rows, giving keep-rate
    w_s * T / n_s per stratum (the binding stratum keeps 100%).  Strata
    absent from ``target`` are dropped.

    Determinism/scale: counts are one tiny groupBy; the rate table
    (|strata| rows) broadcast-joins back, and membership is the same
    portable hash-threshold as ``deterministic_sample`` at 1e-6
    resolution — map-side, reproducible, engine-portable (thresholds
    are FLOOR'd IEEE-double products, bit-identical on any engine).
    """
    from pyspark.sql import Window

    wt = F.lit(None).cast("double")
    for val, w in sorted(target.items()):
        wt = F.when(F.col(stratum_col) == val, F.lit(float(w))).otherwise(wt)
    rates = (
        df.groupBy(stratum_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn("_wt", wt)
        .filter(F.col("_wt").isNotNull())
        .withColumn(
            "_cap", F.min(F.col("_n") / F.col("_wt")).over(Window.partitionBy())
        )
        .withColumn(
            "_thr",
            F.floor(F.col("_wt") * F.col("_cap") / F.col("_n") * resolution),
        )
        .select(stratum_col, "_thr")
    )
    return (
        df.join(F.broadcast(rates), stratum_col)
        .filter(hash_bucket(key_col, resolution) < F.col("_thr"))
        .drop("_thr")
    )


def weighted_sample_topk(
    df: DataFrame,
    k: int = 100,
    weight_col: str = "n_chars",
    key_col: str = "doc_id",
    resolution: int = 1_000_000,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES):
    each row gets key = -ln(u)/w with u a deterministic uniform from the
    row id; the k smallest keys are a weight-proportional sample — the
    training-mix epoch sampler (P(doc) ∝ weight, no duplicates).

    Distributed one-liner: the selection is ORDER BY key LIMIT k, which
    compiles to TakeOrderedAndProject (per-partition heaps, k rows cross
    the wire) — no global sort, no state.  u = (hash_bucket + 0.5)/res
    keeps u in (0,1) exactly and reproducible on any engine with md5."""
    u = (hash_bucket(key_col, resolution).cast("double") + 0.5) / resolution
    key = -F.log(u) / F.col(weight_col).cast("double")
    return (
        df.withColumn("_es_key", key)
        .orderBy(F.col("_es_key").asc(), F.col(key_col).asc())
        .limit(k)
        .withColumn("es_key", F.round("_es_key", 6))
        .drop("_es_key")
    )


def epoch_order(
    df: DataFrame, epoch: int, key_col: str = "doc_id", resolution: int = 1 << 30
) -> DataFrame:
    """Reproducible per-epoch shuffle order: rank every row by the
    portable hash of (key, epoch) — a different deterministic
    permutation each epoch, identical across runs/engines/partitionings
    (the data-ordering audit trail for a training run; pair with
    ``export_training_data_job``'s stable shards to replay any epoch).

    Scale: the rank is a global row_number ONLY in this oracle-exact
    form; the deployed path sorts shards independently by the same hash
    (order within a shard is what a loader consumes), which is a plain
    per-file sort — no global exchange."""
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("_", F.col(key_col).cast("string"), F.lit(str(epoch)))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % resolution
    )
    from pyspark.sql import Window

    w = Window.orderBy(h.asc(), F.col(key_col).asc())
    return df.withColumn("epoch_rank", F.row_number().over(w))


def group_sample_exact(
    df: DataFrame,
    n_per_group: int = 10,
    group_col: str = "source",
    key_col: str = "doc_id",
    resolution: int = 1 << 30,
) -> DataFrame:
    """EXACTLY-n-per-group deterministic sample (the eval-set / debug-
    slice builder): rank rows inside each group by the portable key hash
    and keep the first ``n_per_group``.  Unlike the rate-based samplers
    above, group output size is exact (min(n, |group|)) — and unlike
    ``df.sampleBy``, membership is stable across runs, partitionings,
    and engines.

    Scale: one hash(group) exchange; the rank is a per-group window
    (no global sort).  With heavy groups, the WindowGroupLimit pushdown
    caps each partition's sort at n rows before the final rank."""
    from pyspark.sql import Window

    h = porthash32(F.col(key_col).cast("string")) % resolution
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_group)
        .withColumn("sample_rank", F.col("_rn").cast("long"))
        .drop("_rn")
    )
