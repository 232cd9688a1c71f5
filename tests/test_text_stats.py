"""Text-statistics batch (operators/text.py: flesch_scores, zipf_fit,
sentiment_lexicon, textrank_keywords)."""

from __future__ import annotations

from trading_etl_python_spark.operators import text as TX


def test_flesch_counts_and_score(spark):
    df = spark.createDataFrame(
        [(1, "The cat sat. The dog ran!"), (2, "xyzzy 42")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in TX.flesch_scores(df).collect()}
    r = out[1]
    assert r.n_words == 6 and r.n_sentences == 2
    # the/cat/sat/the/dog/ran -> one vowel run each = 6
    assert r.n_syllables == 6
    flesch = 206.835 - 1.015 * 3.0 - 84.6 * 1.0
    assert abs(r.flesch_ease - round(flesch, 4)) < 1e-9
    # doc 2: "xyzzy" has a y-run ("y"+"y"=2 runs), "42" none; 1 sentence floor
    assert out[2].n_sentences == 1 and out[2].n_syllables == 2


def test_zipf_slope_on_exact_power_law(spark):
    # construct counts ~ 100/rank -> slope approx -1
    words = []
    for rank, (w, base) in enumerate(
        [("alpha", 96), ("beta", 48), ("gamma", 32), ("delta", 24), ("eps", 19)],
        start=1,
    ):
        words += [w] * base
    df = spark.createDataFrame([(1, " ".join(words), "s1")], ["doc_id", "text", "source"])
    out = TX.zipf_fit(df).collect()[0]
    assert out.n_vocab == 5
    assert -1.05 < out.zipf_slope < -0.92
    assert out.r2 > 0.99


def test_sentiment_polarity_and_labels(spark):
    df = spark.createDataFrame(
        [
            (1, "fast fast big slow"),   # 3 pos 1 neg -> 0.5
            (2, "slow dup error"),       # 0 pos 3 neg -> -1
            (3, "the query table"),      # no hits -> neutral 0
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in TX.sentiment_lexicon(df).collect()}
    assert out[1].polarity == 0.5 and out[1].label == "pos"
    assert out[2].polarity == -1.0 and out[2].label == "neg"
    assert out[3].polarity == 0.0 and out[3].label == "neutral"


def test_textrank_hub_scores_highest(spark):
    # star graph: 'hub' co-occurs with every spoke; spokes only with hub
    docs = [(i, f"hub spoke{i}") for i in range(1, 6)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r.node: r.score for r in TX.textrank_keywords(df).collect()}
    assert len(out) == 6
    hub = out.pop("hub")
    assert all(hub > s for s in out.values())
    # probability mass is conserved (no dangling nodes)
    assert abs(hub + sum(out.values()) - 1.0) < 1e-3


def test_token_psi_detects_shifted_slice(spark):
    """A slice whose vocabulary diverges from the rest shows a larger
    PSI than an in-distribution slice; PSI >= 0 always."""
    from trading_etl_python_spark.operators.text import token_psi_by_source

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, base, "en", "srcA") for i in range(6)]
    rows += [(10 + i, base, "en", "srcB") for i in range(6)]
    rows += [(20 + i, "zumba welt karneval blitz donner wunder", "de", "srcC")
             for i in range(6)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    out = {r.source: r.psi for r in token_psi_by_source(docs).collect()}
    assert all(v >= 0 for v in out.values())
    assert out["srcC"] > out["srcA"] and out["srcC"] > out["srcB"]


def test_eval_contam_rate_bounds(spark, sf_dir):
    """Rates live in [0,1]; n_hit <= n_shingles; an eval doc cloned
    verbatim into train scores rate 1."""
    from pyspark.sql import functions as F

    from trading_etl_python_spark.operators.dedup import eval_contamination_rate

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(1, text, "eval"), (2, text, "train"),
         (3, "one two three four five six seven eight nine ten", "eval")],
        "doc_id long, text string, source string",
    )
    out = {r.doc_id: r for r in eval_contamination_rate(
        docs, F.col("source") == "eval", n=5).collect()}
    assert out[1].contam_rate == 1.0          # verbatim clone in train
    assert out[3].contam_rate == 0.0          # disjoint vocabulary
    assert all(0 <= r.n_hit <= r.n_shingles for r in out.values())
