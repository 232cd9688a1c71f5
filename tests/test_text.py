from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trading_etl_python_spark.operators import text as TX
from trading_etl_python_spark.sources.tables import load_table


def test_token_stats(spark):
    df = spark.createDataFrame([(1, "Hello, hello world!")], "doc_id long, text string")
    row = TX.token_stats(df).collect()[0]
    assert row.n_tokens == 3
    assert row.n_distinct == 2


def test_quality_bounds(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rows = TX.quality_score(docs).collect()
    assert all(0.0 <= r.quality <= 1.0 + 1e-9 for r in rows if r.quality is not None)


def test_lang_id_emits_known_labels(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    langs = {r.pred_lang for r in TX.lang_id(docs).collect()}
    assert langs <= {"en", "es", "de", "fr"}


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha"), (3, "alpha beta gamma")],
        "doc_id long, text string",
    )
    fp = {r.doc_id: r.fingerprint for r in TX.doc_fingerprint(df).collect()}
    assert fp[1] == fp[3]  # same token stream -> same fingerprint
    assert fp[1] != fp[2]  # permutation -> different fingerprint


def test_token_freq_deterministic_topn(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = [(r.token, r.cnt) for r in TX.token_freq(docs, 10).collect()]
    b = [(r.token, r.cnt) for r in TX.token_freq(docs, 10).collect()]
    assert a == b
    assert len(a) == 10


def test_winnow_shared_substring_guarantee(spark):
    """Winnowing guarantee: two documents sharing a substring of length
    >= k + w - 1 = 8 must share at least one fingerprint hash."""
    from trading_etl_python_spark.operators.text import winnow_fingerprints

    shared = "identicalpassageofsometext"
    docs = spark.createDataFrame(
        [(1, f"first document AAA {shared} BBB"), (2, f"zzz other {shared} qqq end")],
        "doc_id long, text string",
    )
    fp = winnow_fingerprints(docs, k=5, w=4)
    h1 = {r.hash for r in fp.filter("doc_id = 1").collect()}
    h2 = {r.hash for r in fp.filter("doc_id = 2").collect()}
    assert h1 & h2, "no shared fingerprint for a shared 26-char passage"


def test_winnow_disjoint_texts_share_nothing(spark):
    from trading_etl_python_spark.operators.text import winnow_fingerprints

    docs = spark.createDataFrame(
        [(1, "abcdefghijklmnopqrstuvwxyz"), (2, "0123456789012345678901234567")],
        "doc_id long, text string",
    )
    fp = winnow_fingerprints(docs, k=5, w=4)
    h1 = {r.hash for r in fp.filter("doc_id = 1").collect()}
    h2 = {r.hash for r in fp.filter("doc_id = 2").collect()}
    assert h1 and h2 and not (h1 & h2)


def test_curate_corpus_stage_policies(spark):
    """Each curation stage drops exactly what its policy says: low
    quality, exact duplicate (higher id), near duplicate (higher id)."""
    from trading_etl_python_spark.operators.curation import curate_corpus

    base = ("the cat sat of a mat and to in is " * 12).strip()  # high quality, 120 tokens
    near = base + " extra"  # one appended token -> jaccard ~0.9 vs base
    rows = [
        (1, base, "en", "web"),
        (2, base, "en", "web"),          # exact dup of 1 -> dropped
        (3, near, "en", "web"),          # near dup of 1 -> dropped
        (4, "zzz qqq", "en", "web"),     # low quality -> dropped
        (5, "a completely different story about ships and the open sea "
            "told in many plain short words over and over " * 3, "en", "book"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    kept = sorted(r.doc_id for r in curate_corpus(docs).collect())
    assert kept == [1, 5]


def test_normalize_text_canonical_form(spark):
    from trading_etl_python_spark.operators.text import normalize_text

    df = spark.createDataFrame(
        [(1, "  Hello,   WORLD!! The  end.  "), (2, "a b c")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in normalize_text(df).collect()}
    assert out[1].norm_text == "hello world the end"
    assert out[1].content_text == "hello world end"  # 'the' stripped
    assert out[1].n_norm_chars == len("hello world the end")
    assert out[2].content_text == "b c"  # leading stopword 'a' stripped
    # md5 of the normal form is the dedup key
    import hashlib

    assert out[1].norm_hash == hashlib.md5(b"hello world the end").hexdigest()


def test_redact_pii_replaces_and_counts(spark):
    from trading_etl_python_spark.operators.text import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@ex-ample.co.uk or call 415-555-1234 now"),
            (2, "server at 10.0.255.7 logged 2 hits"),
            (3, "clean text, no pii at all"),
            (4, "two mails: a@b.io c@d.org and ip 1.2.3.4"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in redact_pii(df).collect()}
    assert out[1].red_text == "mail <EMAIL> or call <PHONE> now"
    assert (out[1].n_email, out[1].n_phone, out[1].n_ip) == (1, 1, 0)
    assert out[2].red_text == "server at <IP> logged 2 hits"
    assert out[2].n_ip == 1
    assert out[3].red_text == "clean text, no pii at all"
    assert (out[3].n_email, out[3].n_ip, out[3].n_phone) == (0, 0, 0)
    assert out[4].red_text == "two mails: <EMAIL> <EMAIL> and ip <IP>"
    assert (out[4].n_email, out[4].n_ip) == (2, 1)


def test_pack_sequences_budget_boundaries(spark):
    """Packs cut at exclusive-cumsum budget boundaries in doc_id order:
    pack_id changes exactly when the PRIOR docs' tokens reach the budget,
    and a boundary doc may straddle (documented overrun)."""
    from trading_etl_python_spark.operators.curation import pack_sequences

    rows = [(i, "en", n) for i, n in enumerate([60, 60, 60, 30, 100, 10])]
    rows += [(10, "fr", 250)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")
    out = {(r.lang, r.pack_id): r for r in pack_sequences(df, budget=100).collect()}
    # en cumsums before each doc: 0,60,120,180,210,310 -> packs 0,0,1,1,2,3
    assert out[("en", 0)].n_docs == 2 and out[("en", 0)].sum_tokens == 120
    assert out[("en", 1)].n_docs == 2 and out[("en", 1)].first_id == 2
    assert out[("en", 2)].sum_tokens == 100 and out[("en", 2)].first_id == 4
    assert out[("en", 3)].n_docs == 1 and out[("en", 3)].last_id == 5
    # fr is its own stream, packed independently
    assert out[("fr", 0)].n_docs == 1 and out[("fr", 0)].sum_tokens == 250
    # determinism: second run identical
    again = {(r.lang, r.pack_id): r for r in pack_sequences(df, budget=100).collect()}
    assert {k: tuple(v) for k, v in out.items()} == {k: tuple(v) for k, v in again.items()}


def test_unigram_logprob_hand_computed(spark):
    import math

    from trading_etl_python_spark.operators.text import unigram_logprob

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    # corpus: a:2 b:2 c:1, total 5
    out = {r.doc_id: r for r in unigram_logprob(df).collect()}
    assert out[1].n_tokens == 3
    assert out[1].avg_neg_logprob == round(math.log(5 / 2), 4)
    assert out[2].avg_neg_logprob == round((math.log(5 / 2) + math.log(5)) / 2, 4)


def test_heavy_hitters_exact_under_adversarial_capacity(spark):
    from trading_etl_python_spark.operators import sketches as SK

    # skewed corpus: 'hot' appears in every doc many times; 120 singleton
    # tokens force MG eviction churn at capacity 4 (vocab >> capacity)
    rows = [(i, "hot hot hot " + f"rare{i} " + f"only{i}") for i in range(120)]
    df = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(8)
    out = SK.heavy_hitters(df, k=4, capacity=4).collect()
    # n = 120*5 = 600 tokens; threshold n/4 = 150; only 'hot' (360) passes
    assert [(r["token"], r["cnt"]) for r in out] == [("hot", 360)]

    # result identical under a different partitioning (sketch is not,
    # the verified answer is)
    out2 = SK.heavy_hitters(df.repartition(3), k=4, capacity=4).collect()
    assert [(r["token"], r["cnt"]) for r in out2] == [("hot", 360)]


def test_misra_gries_candidates_superset(spark):
    from trading_etl_python_spark.operators import sketches as SK

    rows = [(i, ("alpha " * 9) + f"tail{i}") for i in range(50)]
    df = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(5)
    cands = {r["token"] for r in SK.misra_gries_candidates(df, k=3).collect()}
    assert "alpha" in cands  # the true heavy hitter always survives


def test_heavy_hitters_capacity_below_k_rejected(spark):
    import pytest

    from trading_etl_python_spark.operators import sketches as SK

    df = spark.createDataFrame([(0, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        SK.heavy_hitters(df, k=8, capacity=4)


def test_bm25_ranks_matching_docs(spark):
    from trading_etl_python_spark.operators import text as TX

    rows = [
        (0, "apple banana cherry date fig grape"),
        (1, "apple apple apple banana banana kiwi"),
        (2, "kiwi melon nectarine orange peach plum"),
        (3, "apple kiwi melon nectarine orange peach"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = TX.bm25_topk(df, "apple banana", k=4).collect()
    ids = [r["doc_id"] for r in out]
    assert ids[0] == 1                      # highest tf for both terms
    assert 2 not in ids                     # no query term at all
    assert all(r["bm25"] > 0 for r in out)
    # rare term outweighs common one: 'kiwi' (df=3) vs 'apple' (df=3)...
    # instead check idf ordering directly via two single-term queries
    top_rare = TX.bm25_topk(df, "date", k=1).collect()[0]
    assert top_rare["doc_id"] == 0


def test_bm25_empty_query_terms_yields_empty(spark):
    from trading_etl_python_spark.operators import text as TX

    df = spark.createDataFrame([(0, "alpha beta")], ["doc_id", "text"])
    assert TX.bm25_topk(df, "zzz", k=5).count() == 0


def test_bigram_next_conditional_probs(spark):
    from trading_etl_python_spark.operators import text as TX

    df = spark.createDataFrame(
        [(0, "a b a b a c"), (1, "b c"), (2, "x")], ["doc_id", "text"]
    )
    out = {r["token"]: r for r in TX.bigram_next(df).collect()}
    # 'a' -> b twice, c once => next=b, p=2/3
    assert out["a"]["next_token"] == "b" and abs(out["a"]["cond_p"] - 0.666667) < 1e-6
    # 'b' -> a twice, c once => next=a
    assert out["b"]["next_token"] == "a"
    assert "x" not in out                  # single-token doc yields no pairs
    assert "c" not in out                  # 'c' never has a successor


def test_tier_cutpoints_agree_with_ntile(spark, sf_dir):
    """The sortless cutpoint path must agree with exact NTILE tiers on
    all but boundary-tied docs (>90% of the corpus)."""
    from trading_etl_python_spark.operators.curation import tier_by_cutpoints
    from trading_etl_python_spark.suite import QUERIES

    exact = QUERIES["q_ppl_tiers"](spark, sf_dir).select("doc_id", "tier")
    scored = QUERIES["q_ppl_tiers"](spark, sf_dir).select("doc_id", "avg_neg_logprob")
    fast = tier_by_cutpoints(scored, "avg_neg_logprob").select(
        "doc_id", F.col("tier").alias("tier_fast")
    )
    j = exact.join(fast, "doc_id")
    n = j.count()
    agree = j.filter(F.col("tier") == F.col("tier_fast")).count()
    assert agree / n > 0.9, (agree, n)
    # plan shape: no global sort in the cutpoint path
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" not in plan and plan.count("Sort") == 0


def test_doc_chunks_cover_and_overlap(spark, sf_dir):
    """Chunk invariants: every token is covered (stride-prefix concat of
    chunks rebuilds the doc), neighbors share window-stride tokens, the
    final chunk is the only one allowed to run short, and the plan is
    shuffle-free (chunking must ride the scan)."""
    from trading_etl_python_spark.operators.text import doc_chunks
    from trading_etl_python_spark.sources.tables import load_table

    # deterministic subset (an un-ordered .limit can pick different
    # rows in the two collect() actions below)
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    ch = doc_chunks(docs, window=32, stride=24)
    rows = ch.orderBy("doc_id", "chunk_id").collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert set(by_doc) == set(src)
    for did, chunks in by_doc.items():
        words = src[did].split(" ")
        # stride-prefix concatenation rebuilds the document exactly
        rebuilt: list[str] = []
        for i, c in enumerate(chunks):
            cw = c["chunk_text"].split(" ") if c["chunk_text"] else [""]
            assert len(cw) == c["n_tokens"]
            rebuilt.extend(cw if i == len(chunks) - 1 else cw[:24])
        assert rebuilt == words, did
        # all but the last chunk are full-width
        for c in chunks[:-1]:
            assert c["n_tokens"] == 32
        # neighbors overlap by window - stride tokens
        for a, b in zip(chunks, chunks[1:]):
            aw = a["chunk_text"].split(" ")
            bw = b["chunk_text"].split(" ")
            assert aw[24:] == bw[: len(aw) - 24]
    # plan posture on the unlimited form (the test's own .limit adds a
    # single-partition exchange that isn't the operator's)
    full = doc_chunks(load_table(spark, sf_dir, "documents"), 32, 24)
    plan = full._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_chunk_udtf_matches_doc_chunks(spark, sf_dir):
    """The Python UDTF extensibility twin must agree row-for-row with
    the JVM doc_chunks path via a LATERAL join over the corpus."""
    from trading_etl_python_spark.functions.udtfs import register_udtfs
    from trading_etl_python_spark.operators.text import doc_chunks
    from trading_etl_python_spark.sources.tables import load_table

    register_udtfs(spark)
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("_docs_udtf")
    via_udtf = spark.sql(
        """SELECT d.doc_id, c.chunk_id, c.n_tokens, c.chunk_text
           FROM _docs_udtf d, LATERAL chunk_udtf(d.text, 32, 24) c"""
    )
    jvm = doc_chunks(docs, window=32, stride=24)
    a = {tuple(r) for r in via_udtf.collect()}
    b = {tuple(r) for r in jvm.collect()}
    assert a == b and len(a) > 0


def test_char_entropy_inrow_values(spark):
    from trading_etl_python_spark.operators.text import char_entropy_profile

    import math

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "ab"), (3, ""), (4, "AaBb"), (5, "abcd")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in char_entropy_profile(df).collect()}
    assert 3 not in out  # empty text never emits a row (explode-era contract)
    assert out[1].entropy == 0.0 and out[1].n_distinct_chars == 1
    assert out[2].entropy == round(math.log(2), 6)
    # case-folded: AaBb -> aabb, two symbols at p=1/2
    assert out[4].entropy == round(math.log(2), 6) and out[4].n_chars == 4
    assert out[5].entropy == round(math.log(4), 6) and out[5].n_distinct_chars == 4
