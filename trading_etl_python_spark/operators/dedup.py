"""Deduplication operators for large-scale document corpora
(driver-mandated extensions, SURVEY.md §2.3 X1/X2).

Scale design notes (the 100 TB posture):

- **exact**: partition by a 256-bit content hash, never by the raw text —
  the shuffle key is 32 bytes regardless of document size, and skew from
  giant duplicate clusters is bounded by AQE skew handling.
- **n-gram Jaccard (exact pairwise)**: candidate pairs come from an
  equi-join on shared shingles, so cost is driven by posting-list sizes,
  not |docs|^2.  Still quadratic in the worst case -> use MinHash LSH at
  scale; kept because it is exactly SQL-expressible (oracle-checkable).
- **MinHash LSH**: the scale path — O(docs x bands) with banding via
  Spark ML's MinHashLSH; candidate pairs only within colliding buckets.
- **SimHash**: 64-bit signature fully JVM-side (64 aggregate exprs, no
  Python), banded on 16-bit sub-keys for Hamming-distance blocking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..util import spread

TOKEN_RE = "[^a-z0-9]+"


def tokens_col(text_col: str = "text"):
    return F.filter(F.split(F.lower(F.col(text_col)), TOKEN_RE), lambda x: x != F.lit(""))


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """X1 — exact dedup, first-writer-wins by id.  Shuffles on
    sha2(text) (fixed-width key), not the document body."""
    h = F.sha2(F.col(text_col), 256)
    w = Window.partitionBy(h).orderBy(F.col(id_col).asc())
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def shingles(df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Distinct word n-gram shingles per doc: (id_col, shingle).
    Repartitions the (narrow) doc rows first so the explode fans out
    across cores — a single-file corpus scan would otherwise pin the
    whole shingle generation to one task."""
    df = spread(df.select(F.col(id_col), F.col(text_col)), id_col)
    toks = tokens_col(text_col)
    df = df.select(F.col(id_col), toks.alias("_toks")).filter(F.size("_toks") >= n)
    grams = F.transform(
        F.sequence(F.lit(0), F.size("_toks") - n),
        lambda i: F.concat_ws(" ", F.slice("_toks", i + 1, n)),
    )
    return df.select(id_col, F.explode(F.array_distinct(grams)).alias("shingle"))


def ngram_jaccard_pairs(
    df: DataFrame, n: int = 3, threshold: float = 0.5, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """X2 (exact variant) — doc pairs with shingle-set Jaccard >= threshold.
    Join on shared shingles -> count intersections -> |A|+|B|-|A∩B|."""
    # join on the 64-bit shingle hash, not the string: fixed-width shuffle
    # keys; collision odds at 64 bits are negligible for any corpus size
    sh = shingles(df, n, text_col, id_col).select(id_col, F.xxhash64("shingle").alias("h"))
    cnt = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    # NOT force-broadcast: cnt is one row per document (unbounded); let
    # Catalyst broadcast small corpora and shuffle-join large ones
    side = sh.join(cnt, id_col)
    a, b = side.alias("a"), side.alias("b")
    # length-ratio prefilter inside the join condition: jaccard >= t forces
    # min(|A|,|B|) >= t*max(|A|,|B|) — provably output-preserving, and it
    # drops hopeless pairs before they hit the aggregation shuffle
    ratio_ok = (F.col("a.n_sh") >= threshold * F.col("b.n_sh")) & (
        F.col("b.n_sh") >= threshold * F.col("a.n_sh")
    )
    pairs = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            & ratio_ok,
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
    return (
        pairs.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    num_hash_tables: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """X2 (scale variant) — MinHash LSH candidate pairs via Spark ML.
    Banding: only docs colliding in >=1 hash table are compared, so the
    pair space never materializes.  Distance = 1 - approx Jaccard."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    sh = shingles(df, 3, text_col, id_col).groupBy(id_col).agg(
        F.collect_list("shingle").alias("sh")
    )
    tf = HashingTF(inputCol="sh", outputCol="features", numFeatures=1 << 18, binary=True)
    feat = tf.transform(sh).filter(F.expr("size(sh) > 0"))
    mh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=42)
    model = mh.fit(feat)
    pairs = model.approxSimilarityJoin(feat, feat, 1.0 - threshold, distCol="dist")
    return (
        pairs.filter(F.col(f"datasetA.{id_col}") < F.col(f"datasetB.{id_col}"))
        .select(
            F.col(f"datasetA.{id_col}").alias("doc_a"),
            F.col(f"datasetB.{id_col}").alias("doc_b"),
            F.round(F.lit(1.0) - F.col("dist"), 6).alias("approx_jaccard"),
        )
    )


def simhash_signatures(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """X2 (SimHash) — 64-bit signature per doc, entirely JVM-side:
    explode tokens, xxhash64 each, then 64 conditional-sum aggregates
    (one per bit) and recombination.  No Python, one shuffle on id."""
    tok = df.select(id_col, F.explode(tokens_col(text_col)).alias("tok"))
    tok = tok.groupBy(id_col, "tok").agg(F.count(F.lit(1)).cast("long").alias("w"))
    tok = tok.withColumn("h", F.xxhash64("tok"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, F.col("w")).otherwise(
                -F.col("w")
            )
        ).alias(f"b{b}")
        for b in range(64)
    ]
    sums = tok.groupBy(id_col).agg(*bit_sums)
    sig = None
    for b in range(64):
        term = F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        shifted = term * F.lit(1 << b).cast("long") if b < 63 else F.shiftleft(term, 63)
        sig = shifted if sig is None else sig + shifted
    return sums.select(id_col, sig.alias("simhash"))


def simhash_pairs(
    df: DataFrame, max_hamming: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """SimHash near-dup pairs: band the 64-bit signature into 4 x 16-bit
    sub-keys (pigeonhole: hamming<=3 => >=1 identical band), join per
    band, verify with bit_count(xor) — all JVM expressions."""
    sig = simhash_signatures(df, text_col, id_col)
    banded = sig.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(F.col("simhash"), 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("key"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "simhash", "bk.band", "bk.key")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cand.withColumn("hamming", ham.cast("int")).filter(
        F.col("hamming") <= max_hamming
    ).select("doc_a", "doc_b", "hamming")
