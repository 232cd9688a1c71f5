"""Corpus curation pipeline — the composed training-data path the
driver-mandated extension operators exist for (SURVEY.md §2.3):

    quality filter -> exact dedup -> near-dup removal -> curated corpus

Each stage is an already-tested operator (text.quality_score,
dedup.dedup_exact, dedup.ngram_jaccard_pairs); this module only wires
them into ONE lazy plan, so Catalyst sees the whole pipeline: the
quality predicate prunes documents before any shuffle, dedup shuffles
on fixed-width sha2 keys, and the near-dup join runs on the already
twice-reduced survivor set.

Scale: stage order IS the optimization — each stage strictly shrinks
the corpus before the next (filter: free, map-side; exact dedup: one
32-byte-key shuffle; near-dup: the only quadratic-risk stage, fed the
smallest set and bounded by shingle posting lists + length-ratio
pruning).  Keep-first (min doc_id) policies everywhere make the output
deterministic, so replays/retries are idempotent."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import dedup_exact, ngram_jaccard_pairs
from .text import quality_score


def curate_corpus(
    docs: DataFrame,
    min_quality: float = 0.5,
    neardup_threshold: float = 0.8,
) -> DataFrame:
    """documents -> curated (doc_id, lang, source, n_tokens, quality).

    Near-dup policy: for every pair with Jaccard >= threshold the
    higher doc_id is dropped (keep-first), matching the exact-dedup
    survivor rule."""
    scored = quality_score(docs, keep=("text", "lang", "source"))
    kept = scored.filter(F.col("quality") >= min_quality)
    uniq = dedup_exact(kept)
    near = ngram_jaccard_pairs(uniq, n=3, threshold=neardup_threshold)
    losers = near.select(F.col("doc_b").alias("doc_id")).distinct()
    return uniq.join(losers, "doc_id", "left_anti").select(
        "doc_id", "lang", "source", "n_tokens", "quality"
    )
