"""Round-6 retrieval batch: RAKE keyword extraction, blocked record
linkage (operators/text.py), MMR diversified selection
(operators/similarity.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from trading_etl_python_spark.operators.similarity import mmr_select
from trading_etl_python_spark.operators.text import blocked_linkage, rake_keywords


def test_rake_scores_classic_example(spark):
    # one doc: phrases "deep learning", "learning", boundary stopwords
    docs = spark.createDataFrame(
        [(1, "deep learning is the deep model of learning")],
        "doc_id long, text string",
    )
    out = {r.phrase: r for r in rake_keywords(docs, top_k=10).collect()}
    # phrases: "deep learning" (len2), "deep model" (len2), "learning" (len1)
    # freq: deep=2, learning=2, model=1
    # deg:  deep = 2+2 = 4, learning = 2+1 = 3, model = 2
    # scores: deep=2.0, learning=1.5, model=2.0
    assert out["deep learning"].rake_score == 3.5
    assert out["deep model"].rake_score == 4.0
    assert out["learning"].rake_score == 1.5
    # ranking: deep model(4.0), deep learning(3.5), learning(1.5)
    assert out["deep model"].rk == 1
    assert out["deep learning"].rk == 2 and out["deep learning"].plen == 2
    assert out["learning"].rk == 3 and out["learning"].n_occurrences == 1


def test_rake_duplicate_phrase_collapses(spark):
    docs = spark.createDataFrame(
        [(1, "red fox and red fox")], "doc_id long, text string"
    )
    rows = rake_keywords(docs, top_k=10).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.phrase == "red fox" and r.n_occurrences == 2 and r.plen == 2


def test_blocked_linkage_pairs_and_counts(spark):
    df = spark.createDataFrame(
        [("cold widget",), ("cold widget",), ("bold widget",), ("gold rod",),
         ("cold rod",)],
        "p_name string",
    )
    out = {(r.name_a, r.name_b): r for r in blocked_linkage(df, "p_name", 3).collect()}
    # same block "widget": cold vs bold, dist 1 <= 3
    r = out[("bold widget", "cold widget")]
    assert r.edit_dist == 1 and r.n_a == 1 and r.n_b == 2
    # "cold rod" vs "gold rod": dist 1, separate block from the widgets
    assert out[("cold rod", "gold rod")].edit_dist == 1
    # cross-block pairs never compared
    assert all(a.split()[-1] == b.split()[-1] for a, b in out)


def _unit(*v):
    n = math.sqrt(sum(x * x for x in v))
    return [float(x / n) for x in v]


def test_mmr_prefers_diverse_third_pick(spark):
    # q = e1; 1 and 2 are clones at (0.8, 0.6); 3 mirrors at (0.8, -0.6).
    # Plain top-3 by relevance would take (0, 1, 2); MMR at lam=0.5 must
    # take 3 over the clone: clone score 0.5*0.8-0.5*1.0 = -0.1 vs
    # mirror 0.5*0.8-0.5*0.8 = 0.
    rows = [
        (0, _unit(1.0, 0.0), 0),
        (1, _unit(0.8, 0.6), 1),
        (2, _unit(0.8, 0.6), 1),
        (3, _unit(0.8, -0.6), 2),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = mmr_select(emb, query_vec_id=0, k=3, lam=0.5)
    got = [(r.rank, r.vec_id) for r in out.orderBy("rank").collect()]
    # rank1: the query itself; rank2: 1, 2, 3 all tie at score 0 -> id
    # ascending picks 1; rank3: the mirror beats the clone
    assert got[0] == (1, 0)
    assert got[1] == (2, 1)
    assert got[2] == (3, 3)


def test_wordpiece_greedy_longest_match(spark):
    from trading_etl_python_spark.operators.text import wordpiece_tokenize

    # corpus makes "spark" and "par" frequent full-word vocab entries;
    # "sparkpar" must greedily take "spark" then "par";
    # "parks" takes "par" then chars (no suffix merge exists)
    docs = spark.createDataFrame(
        [(i, "spark par") for i in range(5)] + [(99, "sparkpar parks zz")],
        "doc_id long, text string",
    )
    out = {r.word: r for r in wordpiece_tokenize(docs, top_words=2).collect()}
    assert out["spark"].seg == "spark" and out["spark"].n_pieces == 1
    assert out["sparkpar"].seg == "spark par" and out["sparkpar"].n_pieces == 2
    assert out["parks"].seg == "par k s" and out["parks"].n_pieces == 3
    assert out["zz"].seg == "z z"  # OOV floor: single chars always cover


def test_tfidf_cosine_identical_docs_score_one(spark):
    from trading_etl_python_spark.operators.text import tfidf_cosine_pairs

    docs = spark.createDataFrame(
        [(1, "red fox jumps"), (2, "red fox jumps"), (3, "blue whale sings"),
         (4, "red whale jumps")],
        "doc_id long, text string",
    )
    # max_df 1/1 disables the hot-token cap: full-vector semantics
    out = {(r.doc_a, r.doc_b): r for r in
           tfidf_cosine_pairs(docs, threshold=0.0,
                              max_df_num=1, max_df_den=1).collect()}
    # identical docs: cosine exactly 1 (same integer weight vectors)
    assert out[(1, 2)].cos_sim == 1.0 and out[(1, 2)].n_shared == 3
    assert out[(1, 2)].capped_a == 0 and out[(1, 2)].capped_b == 0
    # disjoint docs never pair (no shared token -> no inverted-index row)
    assert (1, 3) not in out
    # partial overlap scores strictly between 0 and 1
    assert 0.0 < out[(1, 4)].cos_sim < 1.0 and out[(1, 4)].n_shared == 2

    # default cap (df > 1/2 of corpus): red/jumps (df 3 of 4) leave the
    # vector space; fox alone carries pair (1,2), whale alone doc 4's
    # overlap with 1 — which disappears; audit columns count the cuts
    capped = {(r.doc_a, r.doc_b): r for r in
              tfidf_cosine_pairs(docs, threshold=0.0).collect()}
    assert capped[(1, 2)].cos_sim == 1.0 and capped[(1, 2)].n_shared == 1
    assert capped[(1, 2)].capped_a == 2 and capped[(1, 2)].capped_b == 2
    assert (1, 4) not in capped
