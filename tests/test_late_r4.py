"""Late-r4 operator family: SemDeDup, PCA power iteration, BPE pair
counts, content-defined chunking, exact-n group sampling.  Each test
verifies the SEMANTICS against an independent in-test recomputation
(numpy / pure Python), not just shape — the DuckDB value-hash oracle in
suite/extensions.py is the cross-engine check; these pin the algorithm.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from trading_etl_python_spark.operators import dedup as D
from trading_etl_python_spark.operators import similarity as S
from trading_etl_python_spark.operators import text as TX
from trading_etl_python_spark.operators.sampling import group_sample_exact
from trading_etl_python_spark.sources.tables import load_table


# ------------------------------------------------------------- semdedup


def test_semdedup_drops_exact_duplicate_vector(spark):
    v1 = [1.0, 0.0, 0.0]
    v2 = [0.0, 1.0, 0.0]
    rows = [(0, v1), (1, v2), (2, v1), (3, [0.0, 0.0, 1.0])]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = {r.vec_id: r for r in S.semdedup(emb, n_cells=2, threshold=0.99).collect()}
    assert len(out) == 4  # audit row for EVERY vector
    assert out[0].is_kept and not out[2].is_kept  # first-writer-wins
    assert out[1].is_kept and out[3].is_kept
    assert out[0].cell == out[2].cell  # dup pair shares a cell


def test_semdedup_pairs_only_within_cells(spark, sf_dir):
    """A dropped vector must have a lower-id >=t cell-mate; a kept vector
    must have none — recomputed with numpy over the same assignment."""
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    out = S.semdedup(emb, n_cells=8, threshold=0.8).collect()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.collect()}
    cells: dict[int, list[int]] = {}
    for r in out:
        cells.setdefault(r.cell, []).append(r.vec_id)
    kept = {r.vec_id: r.is_kept for r in out}
    for cell, ids in cells.items():
        for b in ids:
            has_lower_dup = any(
                a < b and float(vecs[a] @ vecs[b]) >= 0.8 for a in ids
            )
            assert kept[b] == (not has_lower_dup), (cell, b)


def test_semdedup_join_assign_matches_inline(spark, sf_dir):
    """assign_via_join (broadcast centroid relation + max_by argmax —
    the production-K path) must produce EXACTLY the literal-inline
    result, audit row for audit row."""
    emb = load_table(spark, sf_dir, "embeddings")
    inline = S.semdedup(emb, n_cells=16, threshold=0.8)
    joined = S.semdedup(emb, n_cells=16, threshold=0.8, assign_via_join=True)
    key = lambda r: (r.vec_id, r.cell, r.is_kept)  # noqa: E731
    assert sorted(map(key, inline.collect())) == sorted(map(key, joined.collect()))


def test_semdedup_forces_join_assign_past_inline_cap(spark):
    """Past IVF_INLINE_MAX_CELLS the literal path would bloat the plan;
    the join path must engage automatically (no flag)."""
    import numpy as np

    rng = np.random.default_rng(7)
    n = S.IVF_INLINE_MAX_CELLS + 8
    rows = [(i, [float(v) for v in rng.normal(size=4)]) for i in range(n + 4)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = S.semdedup(emb, n_cells=n, threshold=1.1)  # threshold>1: no dups
    assert out.count() == n + 4
    # r9: semdedup checkpoints its assignment, hiding the subplan from
    # the final executedPlan — so pin the ROUTING itself on the
    # extracted builder semdedup delegates to: past the cap it must
    # take the join path (max_by aggregate) WITHOUT the explicit flag,
    # and below the cap it must stay literal-inline (no join)
    cents = S.collect_centroids(emb, n)
    assert len(cents) > S.IVF_INLINE_MAX_CELLS
    vecs = emb.select("vec_id", "embedding")
    plan = (
        S._semdedup_assign(vecs, cents, False, "vec_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "max_by" in plan or "BroadcastNestedLoopJoin" in plan, plan
    small = {k: cents[k] for k in list(cents)[:8]}
    plan_small = (
        S._semdedup_assign(vecs, small, False, "vec_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "max_by" not in plan_small and "Join" not in plan_small


# ------------------------------------------------------------ pca_power


def test_pca_power_matches_numpy_eigvector(spark, sf_dir):
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    out = S.pca_power(emb, iters=4).collect()
    v = np.zeros(len(out))
    for r in out:
        v[r.dim] = r.loading
    assert abs(np.linalg.norm(v) - 1.0) < 1e-4
    X = np.array([r.embedding for r in emb.collect()], dtype=np.float64)
    G = np.round(X.T @ X, 6)
    ref = np.ones(G.shape[0])
    for _ in range(4):
        ref = G @ ref
        ref = ref / np.linalg.norm(ref)
    # same iterate (not just same limit): fp-order differences only
    assert np.abs(v - ref).max() < 1e-4
    # and it is a genuine near-eigenvector of G
    lam = float(v @ (G @ v))
    resid = np.linalg.norm(G @ v - lam * v) / lam
    assert resid < 0.35  # 4 iterations: dominant direction, not converged


# ------------------------------------------------------------ bpe pairs


def test_bpe_pair_counts_small_corpus(spark):
    docs = spark.createDataFrame(
        [(1, "aba ab"), (2, "ba!")], "doc_id bigint, text string"
    )
    # words: aba, ab, ba -> pairs: (a,b),(b,a) ; (a,b) ; (b,a)
    out = {(r.left_sym, r.right_sym): r.n_pairs for r in
           TX.bpe_pair_counts(docs, top_k=10).collect()}
    assert out == {("a", "b"): 2, ("b", "a"): 2}


def test_bpe_pair_counts_ordering_and_k(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rows = TX.bpe_pair_counts(docs, top_k=20).collect()
    assert len(rows) == 20
    counts = [r.n_pairs for r in rows]
    assert counts == sorted(counts, reverse=True)
    # deterministic tie-break inside equal counts
    for a, b in zip(rows, rows[1:]):
        if a.n_pairs == b.n_pairs:
            assert (a.left_sym, a.right_sym) < (b.left_sym, b.right_sym)


# ------------------------------------------------------------------ cdc


def _cdc_ref(text: str, w: int = 8, mask_bits: int = 5) -> list[str]:
    """Pure-Python reference chunker."""
    s = "".join(ch for ch in text.lower() if ch.isascii() and ch.isalnum())
    if len(s) < w:
        return []
    cuts = [0]
    for p in range(w, len(s)):  # interior cuts only
        h = 0
        for j in range(p - w, p):
            h = (h * 31 + ord(s[j])) % 1_000_000_007
        if h % (1 << mask_bits) == 0:
            cuts.append(p)
    cuts.append(len(s))
    return [s[a:b] for a, b in zip(cuts, cuts[1:])]


def test_cdc_chunks_match_reference(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(40)
    got: dict[int, list] = {}
    for r in D.cdc_chunks(docs).collect():
        got.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk_len, r.chunk_hash))
    texts = {r.doc_id: r.text for r in docs.collect()}
    n_multi = 0
    for doc_id, text in texts.items():
        ref = _cdc_ref(text)
        have = [h for _, _, h in sorted(got.get(doc_id, []))]
        assert have == [hashlib.md5(c.encode()).hexdigest() for c in ref], doc_id
        lens = [ln for _, ln, _ in sorted(got.get(doc_id, []))]
        assert sum(lens) == sum(len(c) for c in ref)
        n_multi += len(ref) > 1
    assert n_multi > 0  # the corpus actually exercises boundary cuts


def test_cdc_boundaries_shift_invariant(spark):
    """The CDC property: a prefix edit re-chunks only the edit region —
    chunks after the first post-edit boundary are identical."""
    base = "the quick brown fox jumps over the lazy dog " * 8
    edited = "PREFIX-INSERTION " + base
    a, b = _cdc_ref(base), _cdc_ref(edited)
    # common suffix of the chunk sequences survives the edit
    n = 0
    while n < min(len(a), len(b)) and a[-1 - n] == b[-1 - n]:
        n += 1
    assert n >= 1


def test_cdc_dedup_stats_counts(spark):
    dup = "shared content block repeated verbatim " * 6
    docs = spark.createDataFrame(
        [(1, dup + " unique tail one"), (2, dup + " other suffix"), (3, "entirely different text " * 10)],
        "doc_id bigint, text string",
    )
    out = D.cdc_dedup_stats(docs, top_k=5).collect()
    assert out[0].n_occurrences >= 2  # the shared block dominates
    assert out[0].n_docs >= 2
    counts = [r.n_occurrences for r in out]
    assert counts == sorted(counts, reverse=True)


# --------------------------------------------------------- group sample


def test_group_sample_exact_sizes_and_stability(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = group_sample_exact(docs, n_per_group=7, group_col="source")
    sizes = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    totals = {r.source: r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    for src, n in sizes.items():
        assert n == min(7, totals[src])
    # repartitioning must not change membership
    ids1 = {r.doc_id for r in out.collect()}
    ids2 = {
        r.doc_id
        for r in group_sample_exact(
            docs.repartition(13), n_per_group=7, group_col="source"
        ).collect()
    }
    assert ids1 == ids2


def test_group_sample_rank_is_hash_order(spark):
    rows = [(i, "g") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    out = group_sample_exact(df, n_per_group=5, group_col="source").collect()
    picked = sorted((r.sample_rank, r.doc_id) for r in out)

    def h(i: int) -> int:
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % (1 << 30)

    ref = sorted(range(30), key=lambda i: (h(i), i))[:5]
    assert [d for _, d in picked] == ref


# ------------------------------------------------------------ bpe learn


def test_bpe_learn_merges_toy_corpus(spark):
    # words: low(x5) lower(x2) newest(x6) widest(x3)  (hug the classic
    # Sennrich example shape): first merge must be the most frequent
    # adjacent pair across word occurrences
    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    docs = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    out = TX.bpe_learn_merges(docs, n_merges=3).collect()

    # reference implementation
    from collections import Counter

    vocab = Counter(text.split())
    syms = {w: list(w) for w in vocab}
    expect = []
    for rank in range(1, 4):
        pc: Counter = Counter()
        for w, c in vocab.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        (a, b), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        expect.append((rank, a, b, n))
        for w in vocab:
            s, ns = syms[w], []
            for x in s:
                if ns and ns[-1] == a and x == b:
                    ns[-1] = a + b
                else:
                    ns.append(x)
            syms[w] = ns
    got = [(r.merge_rank, r.left_sym, r.right_sym, r.pair_count) for r in out]
    assert sorted(got) == expect


def test_bpe_merge_fold_non_overlapping(spark):
    df = spark.createDataFrame([("aaa",), ("abab",)], "w string")
    out = df.select(
        "w", TX._merge_fold(F.split("w", ""), "a", "a").alias("m")
    ).collect()
    m = {r.w: r.m for r in out}
    assert m["aaa"] == ["aa", "a"]  # greedy L2R, non-overlapping
    assert m["abab"] == ["a", "b", "a", "b"]


# ---------------------------------------------------------- fuzzy vocab


def test_fuzzy_pairs_toy_misspellings(spark):
    docs = spark.createDataFrame(
        [(1, "color colour analyse analyze theory"), (2, "color analyse")],
        "doc_id bigint, text string",
    )
    out = {(r.word_a, r.word_b): (r.dist, r.n_a, r.n_b)
           for r in TX.fuzzy_token_pairs(docs).collect()}
    assert out[("color", "colour")] == (1, 2, 1)
    assert out[("analyse", "analyze")] == (1, 2, 1)
    assert all(a < b for a, b in out)
    assert not any("theory" in p for p in out)


def test_fuzzy_blocking_complete_vs_bruteforce(spark, sf_dir):
    """The SymSpell guarantee: depth-2 deletion blocking must find EVERY
    pair brute-force levenshtein finds at distance <= 2."""
    docs = load_table(spark, sf_dir, "documents")
    got = {(r.word_a, r.word_b) for r in TX.fuzzy_token_pairs(docs).collect()}

    import itertools

    words = sorted(
        r.w
        for r in docs.select(
            F.explode(
                F.filter(
                    F.split(F.lower("text"), "[^a-z0-9]+"), lambda x: x != F.lit("")
                )
            ).alias("w")
        )
        .distinct()
        .collect()
        if len(r.w) >= 3
    )

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    want = {
        (a, b) for a, b in itertools.combinations(words, 2) if lev(a, b) <= 2
    }
    assert got == want and len(want) > 0


# ----------------------------------------------------------- ann recall


def test_ann_recall_bounds_and_self_hit(spark, sf_dir):
    from trading_etl_python_spark.operators.similarity import ann_recall

    emb = load_table(spark, sf_dir, "embeddings")
    rows = ann_recall(emb, n_probes=6, k=10).collect()
    assert len(rows) == 6 and {r.probe_id for r in rows} == set(range(6))
    for r in rows:
        # the probe vector itself is rank-1 on BOTH sides (sim=1, ham=0)
        assert 1 <= r.n_overlap <= 10
        assert r.recall == pytest.approx(r.n_overlap / 10.0)


def test_ann_recall_widening_hamming_never_hurts(spark, sf_dir):
    from trading_etl_python_spark.operators.similarity import ann_recall

    emb = load_table(spark, sf_dir, "embeddings")
    r2 = {r.probe_id: r.n_overlap for r in ann_recall(emb, 4, max_hamming=2).collect()}
    r12 = {r.probe_id: r.n_overlap for r in ann_recall(emb, 4, max_hamming=12).collect()}
    for p in r2:
        assert r12[p] >= r2[p]
        assert r12[p] == 10  # ham<=n_planes admits everything -> exact


# ------------------------------------------------------------- ks drift


def test_ks_drift_disjoint_and_identical(spark):
    from trading_etl_python_spark.operators.transforms import ks_drift

    ref = spark.createDataFrame(
        [("a", float(i)) for i in range(50)] + [("b", float(i)) for i in range(50)],
        "event_type string, value double",
    )
    shifted = spark.createDataFrame(
        [("a", float(i + 1000)) for i in range(50)]  # disjoint support
        + [("b", float(i)) for i in range(50)],      # identical
        "event_type string, value double",
    )
    out = {r.group: r for r in ks_drift(ref, shifted).collect()}
    assert out["a"].ks == pytest.approx(1.0)
    assert out["b"].ks == pytest.approx(0.0)
    assert out["a"].n_ref == out["a"].n_cmp == 50


def test_ks_drift_matches_manual_ecdf(spark, sf_dir):
    from trading_etl_python_spark.operators.transforms import ks_drift
    from trading_etl_python_spark.sources.tables import load_events

    ev = load_events(spark, sf_dir)
    out = {r.group: r.ks for r in ks_drift(
        ev.filter(F.col("event_id") % 2 == 0),
        ev.filter(F.col("event_id") % 2 == 1),
    ).collect()}
    rows = ev.select("event_type", "event_id", "value").collect()
    by_g: dict[str, tuple[list, list]] = {}
    for r in rows:
        by_g.setdefault(r.event_type, ([], []))[r.event_id % 2].append(r.value)
    for g, (a, b) in by_g.items():
        pts = sorted(set(a) | set(b))
        a_s, b_s = sorted(a), sorted(b)
        import bisect

        ks = max(
            abs(bisect.bisect_right(a_s, x) / len(a) - bisect.bisect_right(b_s, x) / len(b))
            for x in pts
        )
        assert out[g] == pytest.approx(ks, abs=1e-6), g


# ------------------------------------------------------------- token pmi


def test_token_pmi_hand_computed(spark):
    # 4 docs: {x y} {x y} {x z} {w}
    docs = spark.createDataFrame(
        [(1, "x y"), (2, "y x"), (3, "x z"), (4, "w")],
        "doc_id bigint, text string",
    )
    out = {(r.token_a, r.token_b): (r.n_ab, r.pmi)
           for r in TX.token_pmi(docs, min_docs=2).collect()}
    # only (x,y) co-occurs >= 2: PMI = ln(2*4/(3*2))
    assert set(out) == {("x", "y")}
    n_ab, pmi = out[("x", "y")]
    assert n_ab == 2 and pmi == pytest.approx(math.log(8 / 6), abs=1e-6)


# --------------------------------------------------------------- zorder


def test_zorder_key_is_bit_interleave(spark):
    from trading_etl_python_spark.operators.transforms import zorder_keys

    # values 0..15 on both axes with bits=4: buckets == values
    rows = [(i * 16 + j, float(i), float(j)) for i in range(16) for j in range(16)]
    df = spark.createDataFrame(rows, "event_id bigint, u double, v double")
    out = zorder_keys(df, "u", "v", bits=4).collect()

    def morton(u: int, v: int) -> int:
        z = 0
        for i in range(4):
            z |= ((u >> i) & 1) << (2 * i + 1)
            z |= ((v >> i) & 1) << (2 * i)
        return z

    for r in out:
        bu, bv = int(r.zb_u), int(r.zb_v)
        assert r.zkey == morton(bu, bv)
        # max value lands in the top bucket, min in bucket 0
    got = {(r.u, r.v): (r.zb_u, r.zb_v) for r in out}
    assert got[(0.0, 0.0)] == (0, 0)
    assert got[(15.0, 15.0)] == (15, 15)


def test_zorder_layout_tightens_per_file_boxes(spark, tmp_path):
    """The data-skipping property: Z-ordered files cover far smaller
    (c1, c2) rectangles than a single-column sort's files, so min-max
    footer stats can prune on BOTH dimensions."""
    import itertools

    from trading_etl_python_spark.operators.transforms import write_zordered
    from trading_etl_python_spark.sources.tables import load_events

    ev = load_events(spark, "/root/testdata/sf0.01").select(
        "event_id", "user_id", "value"
    )
    zpath, lpath = str(tmp_path / "z"), str(tmp_path / "lin")
    write_zordered(ev, zpath, "user_id", "value", bits=8, n_files=16)
    (
        ev.repartitionByRange(16, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    def file_boxes(path: str):
        return (
            spark.read.parquet(path)
            .groupBy(F.input_file_name())
            .agg(
                F.min("value").alias("vmn"),
                F.max("value").alias("vmx"),
                F.min("user_id").alias("umn"),
                F.max("user_id").alias("umx"),
            )
            .collect()
        )

    stats = ev.agg(F.min("value"), F.max("value")).collect()[0]
    vlo, vhi = float(stats[0]), float(stats[1])
    # a 10%-of-range window on value, the NON-leading column of the
    # linear layout: footer min-max stats can only skip a file whose
    # value span misses the window entirely
    qlo = vlo + 0.45 * (vhi - vlo)
    qhi = vlo + 0.55 * (vhi - vlo)

    def files_hit(boxes) -> int:
        return sum(1 for b in boxes if not (b.vmx < qlo or b.vmn > qhi))

    zb, lb = file_boxes(zpath), file_boxes(lpath)
    z_hits, l_hits = files_hit(zb), files_hit(lb)
    # linear-on-user_id files each span ~the full value range: nothing
    # skips.  Z-ordered files cover value sub-ranges: most skip.
    assert l_hits == len(lb)
    assert z_hits <= len(zb) // 2, (z_hits, len(zb))
    # and the z layout still prunes on user_id as well (both dims work)
    ulo_hit = sum(1 for b in zb if b.umn <= 5)
    assert ulo_hit < len(zb)
    # round-trip integrity
    assert spark.read.parquet(zpath).count() == ev.count()


# ---------------------------------------------------------- pruned read


def test_pruned_read_skips_files_and_matches_filter(spark, tmp_path):
    from trading_etl_python_spark.operators.transforms import (
        file_stats_index,
        pruned_read,
        write_zordered,
    )
    from trading_etl_python_spark.sources.tables import load_events

    ev = load_events(spark, "/root/testdata/sf0.01").select(
        "event_id", "user_id", "value"
    )
    path = str(tmp_path / "z")
    write_zordered(ev, path, "user_id", "value", bits=8, n_files=16, quantile=True)

    idx = file_stats_index(spark, path, ["value", "user_id"]).collect()
    assert len(idx) == 16
    assert sum(r.n_rows for r in idx) == ev.count()

    df, n_read, n_total = pruned_read(spark, path, "value", 100.0, 200.0)
    assert n_total == 16 and n_read <= 8, (n_read, n_total)
    got = {r.event_id for r in df.collect()}
    want = {
        r.event_id
        for r in ev.filter((F.col("value") >= 100.0) & (F.col("value") <= 200.0)).collect()
    }
    assert got == want and got  # pruning loses nothing


def test_pruned_read_empty_range(spark, tmp_path):
    from trading_etl_python_spark.operators.transforms import (
        pruned_read,
        write_zordered,
    )
    from trading_etl_python_spark.sources.tables import load_events

    ev = load_events(spark, "/root/testdata/sf0.001").select("event_id", "value")
    path = str(tmp_path / "z2")
    write_zordered(ev, path, "event_id", "value", bits=4, n_files=4)
    df, n_read, n_total = pruned_read(spark, path, "value", 1e9, 2e9)
    assert n_read == 0 and df.count() == 0


# ------------------------------------------------------------ bpe apply


def test_bpe_apply_fertility_toy(spark):
    docs = spark.createDataFrame(
        [(1, "newest newest low"), (2, "lowest")], "doc_id bigint, text string"
    )
    # merges learned elsewhere; apply (e,s) then (es,t): newest -> n e w est
    out = {r.doc_id: (r.n_words, r.n_syms)
           for r in TX.bpe_apply(docs, [("e", "s"), ("es", "t")]).collect()}
    # doc1: newest(4 syms) x2 + low(3) = 11; doc2: lowest -> l o w est = 4
    assert out == {1: (3, 11), 2: (1, 4)}


def test_bpe_apply_monotone_compression(spark, sf_dir):
    """Each additional merge can only shrink (or keep) total symbols,
    and with zero merges n_syms == total characters of the tokens."""
    docs = load_table(spark, sf_dir, "documents").limit(100)
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in TX.bpe_learn_merges(docs, n_merges=3).collect()
    ]
    totals = []
    for k in range(len(merges) + 1):
        agg = TX.bpe_apply(docs, merges[:k]).agg(
            F.sum("n_syms").alias("s"), F.sum("n_words").alias("w")
        ).collect()[0]
        totals.append((agg["s"], agg["w"]))
    syms = [s for s, _ in totals]
    assert all(a >= b for a, b in zip(syms, syms[1:]))  # monotone
    assert syms[0] > syms[-1]  # merges actually compress
    chars = docs.select(
        F.explode(
            F.filter(F.split(F.lower("text"), "[^a-z0-9]+"), lambda x: x != F.lit(""))
        ).alias("w")
    ).agg(F.sum(F.length("w"))).collect()[0][0]
    assert syms[0] == chars


def test_ks_drift_one_sided_group_scores_max_drift(spark):
    """A group present on only one side must score ks=1.0, not raise
    DIVIDE_BY_ZERO (the streaming monitor's partial-batch case)."""
    from trading_etl_python_spark.operators.transforms import ks_drift

    ref = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0)], "event_type string, value double"
    )
    cmp = spark.createDataFrame(
        [("a", 1.0), ("b", 9.0)], "event_type string, value double"
    )
    out = {r.group: r for r in ks_drift(ref, cmp).collect()}
    assert out["b"].ks == pytest.approx(1.0)
    assert out["b"].n_ref == 0 and out["b"].n_cmp == 1
    assert out["a"].ks == pytest.approx(0.5)


def test_ks_drift_ignores_null_values(spark):
    """NULLs carry no ECDF mass and don't count into n_ref/n_cmp —
    engines disagree on NULL sort order (Spark NULLS FIRST, DuckDB
    NULLS LAST), so a null-bearing feed must produce the same statistic
    as the pre-filtered one.  A group that is all-NULL on one side is a
    one-sided group (ks=1.0), not a division by its phantom count."""
    from trading_etl_python_spark.operators.transforms import ks_drift

    ref = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 2.0), ("c", None)],
        "event_type string, value double",
    )
    cmp = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", None), ("c", 5.0)],
        "event_type string, value double",
    )
    out = {r.group: r for r in ks_drift(ref, cmp).collect()}
    assert out["a"].n_ref == 2 and out["a"].n_cmp == 2
    assert out["a"].ks == pytest.approx(0.0)  # identical after NULL drop
    assert out["c"].n_ref == 0 and out["c"].ks == pytest.approx(1.0)


def test_pruned_read_handles_all_null_file_and_uses_index(spark, tmp_path):
    """A file whose pruned column is entirely NULL has a NULL span —
    it cannot match a range predicate and must be skipped, not crash;
    and write_zordered's persisted stats index is what plans the read."""
    import os

    from trading_etl_python_spark.operators.transforms import (
        _stats_path,
        pruned_read,
    )

    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, 5.0)], "id bigint, v double"
    ).write.parquet(path)
    spark.createDataFrame(
        [(2, None)], "id bigint, v double"
    ).write.mode("append").parquet(path)
    df, n_read, n_total = pruned_read(spark, path, "v", 0.0, 10.0)
    assert [r.id for r in df.collect()] == [1]
    assert n_read < n_total  # the all-null file was skipped

    # write_zordered persists the index; pruned_read must accept it
    from trading_etl_python_spark.operators.transforms import write_zordered
    from trading_etl_python_spark.sources.tables import load_events

    zp = str(tmp_path / "z")
    ev = load_events(spark, "/root/testdata/sf0.001").select("event_id", "user_id", "value")
    write_zordered(ev, zp, "user_id", "value", bits=4, n_files=4)
    assert os.path.exists(_stats_path(zp))
    df2, _, n2 = pruned_read(spark, zp, "value", 0.0, 1e9)
    assert n2 == 4 and df2.count() == ev.count()


# ------------------------------------------------- product quantization


def test_pq_encode_matches_numpy_argmin(spark, sf_dir):
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 80)
    cbs = S.pq_codebooks(emb, m=8, k=16)
    enc = {r.vec_id: list(r.pq_codes) for r in S.pq_encode(emb, cbs).collect()}
    vecs = {r.vec_id: np.array(r.embedding, np.float64) for r in emb.collect()}
    C = [np.array(cb, np.float64) for cb in cbs]  # [m][k][ds]
    ds = C[0].shape[1]
    for vid, v in vecs.items():
        for s in range(8):
            sub = v[s * ds : (s + 1) * ds]
            d2 = ((C[s] - sub) ** 2).sum(axis=1)
            assert enc[vid][s] == int(np.argmin(d2)), (vid, s)


def test_pq_error_bounded_and_zero_for_centroids(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 60)
    cbs = S.pq_codebooks(emb, m=8, k=16)
    rows = {r.vec_id: r.err_ppm for r in S.pq_error(emb, cbs).collect()}
    # the codebook vectors reconstruct exactly (their own subvectors)
    for vid in range(16):
        assert rows[vid] == 0, vid
    # and errors are sane for the rest
    assert all(0 <= e < 2_000_000 for e in rows.values())


def test_pq_adc_recall_vs_exact(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    exact = [r.vec_id for r in S.topk_cosine(emb, 0, 10).collect()]
    got = [r.vec_id for r in S.pq_adc_topk(emb, S.pq_codebooks(emb), 0, k=10, rerank=50).collect()]
    assert got[0] == 0  # self-match survives compression
    recall = len(set(exact) & set(got)) / 10
    assert recall >= 0.5, recall


def test_pq_codebooks_rejects_bad_inputs(spark):
    emb = spark.createDataFrame(
        [(i, [float(i)] * 8) for i in (0, 1, 3)],
        "vec_id bigint, embedding array<double>",
    )
    with pytest.raises(ValueError, match="must all be present"):
        S.pq_codebooks(emb, m=2, k=4)
    ok = spark.createDataFrame(
        [(i, [float(i)] * 9) for i in range(4)],
        "vec_id bigint, embedding array<double>",
    )
    with pytest.raises(ValueError, match="not divisible"):
        S.pq_codebooks(ok, m=2, k=4)


def test_ivfpq_recall_and_probe_containment(spark, sf_dir):
    """IVF-PQ results come only from the probed cells, the self-match
    survives, and recall vs the exact scan stays useful."""
    emb = load_table(spark, sf_dir, "embeddings")
    got = S.ann_ivfpq_topk(emb, 0, k=10, n_probe=4).collect()
    assert got[0].vec_id == 0
    ids = [r.vec_id for r in got]
    # containment: every result lies in one of the probed cells
    cents = S.collect_centroids(emb, 16)
    q = [float(v) for v in emb.filter(F.col("vec_id") == 0).collect()[0].embedding]
    # the implementation's own strict fold — a BLAS dot can flip
    # near-tied probe cells through accumulation-order noise
    probe = sorted(cents, key=lambda c: (-S._seq_dot(q, cents[c]), c))[:4]
    asn = {r.vec_id: r._cell for r in S.ivf_assign(emb, cents).collect()}
    assert all(asn[i] in probe for i in ids)
    exact = [r.vec_id for r in S.topk_cosine(emb, 0, 10).collect()]
    recall = len(set(exact) & set(ids)) / 10
    assert recall >= 0.4, recall


# ---------------------------------------------------------- count-min


def test_cm_sketch_one_sided_and_mergeable(spark, sf_dir):
    from trading_etl_python_spark.operators.sketches import (
        cm_estimate_vs_exact,
        cm_sketch,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = cm_estimate_vs_exact(docs).collect()
    assert out and all(r.is_overestimate for r in out)  # CM guarantee
    assert all(r.cm_n >= r.exact_n for r in out)
    # merging two half-sketches equals the whole-corpus sketch
    from trading_etl_python_spark.operators.dedup import tokens_col

    tok = docs.select(F.explode(tokens_col("text")).alias("token"))
    a = tok.filter(F.crc32(F.col("token")) % 2 == 0)
    b = tok.filter(F.crc32(F.col("token")) % 2 == 1)
    merged = (
        cm_sketch(a, "token").union(cm_sketch(b, "token"))
        .groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))
    )
    whole = cm_sketch(tok, "token")
    got = {(r.d, r.bucket): r.cnt for r in merged.collect()}
    want = {(r.d, r.bucket): r.cnt for r in whole.collect()}
    assert got == want


def test_cm_estimate_exact_when_no_collisions(spark):
    from trading_etl_python_spark.operators.sketches import cm_estimate_vs_exact

    docs = spark.createDataFrame(
        [(1, "alpha alpha beta"), (2, "beta gamma")], "doc_id bigint, text string"
    )
    # 3 tokens, width 256, depth 4: collision probability negligible ->
    # estimates equal the exact counts
    out = {r.token: (r.exact_n, r.cm_n) for r in cm_estimate_vs_exact(docs).collect()}
    assert out == {"alpha": (2, 2), "beta": (2, 2), "gamma": (1, 1)}


# -------------------------------------------------------- portable HLL


def test_hll_portable_accuracy_and_merge(spark, sf_dir):
    from trading_etl_python_spark.operators.sketches import (
        hll_buckets,
        hll_estimate,
    )
    from trading_etl_python_spark.sources.tables import load_events

    ev = load_events(spark, sf_dir)
    it = ev.select("event_type", F.col("value").cast("string").alias("item"))
    est = {r.event_type: r.hll_est for r in hll_estimate(it, "item", "event_type").collect()}
    exact = {
        r.event_type: r.n
        for r in it.groupBy("event_type").agg(F.countDistinct("item").alias("n")).collect()
    }
    assert est and set(est) == set(exact)
    for g, e in est.items():
        assert abs(e - exact[g]) / exact[g] <= 0.2, (g, e, exact[g])  # 3 sigma
    # registers merge by MAX: half-streams combined == whole stream
    a = it.filter(F.crc32("item") % 2 == 0)
    b = it.filter(F.crc32("item") % 2 == 1)
    merged = (
        hll_buckets(a, "item", "event_type")
        .union(hll_buckets(b, "item", "event_type"))
        .groupBy("event_type", "bucket")
        .agg(F.max("m_reg").alias("m_reg"))
    )
    whole = hll_buckets(it, "item", "event_type")
    got = {(r.event_type, r.bucket): r.m_reg for r in merged.collect()}
    want = {(r.event_type, r.bucket): r.m_reg for r in whole.collect()}
    assert got == want


def test_hll_small_range_linear_counting(spark):
    from trading_etl_python_spark.operators.sketches import hll_estimate

    df = spark.createDataFrame([(str(i),) for i in range(20)], "item string")
    est = hll_estimate(df, "item", p=8).collect()[0].hll_est
    assert abs(est - 20) / 20 < 0.15, est  # linear counting regime is tight


def test_hll_set_algebra_estimates(spark):
    """Union by register max + inclusion-exclusion intersection track
    the true overlap within sketch error."""
    from trading_etl_python_spark.operators.sketches import hll_set_estimates

    a = spark.createDataFrame([(str(i),) for i in range(0, 3000)], "item string")
    b = spark.createDataFrame([(str(i),) for i in range(2000, 5000)], "item string")
    e = hll_set_estimates(a, b, "item", p=8)
    assert abs(e["a"] - 3000) / 3000 < 0.2
    assert abs(e["union"] - 5000) / 5000 < 0.2
    # intersection (true 1000) is noisier: 3 sketches' errors stack
    assert 300 < e["intersection"] < 1900, e


def test_kmeans_fit_steps_matches_numpy_rounds(spark, sf_dir):
    """Exact-semantics parity: each round assigns by MAX DOT against the
    previous round's 6dp-rounded centroids and re-averages — recompute
    all three rounds in numpy and compare the final coordinate table."""
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    rows = S.kmeans_fit_steps(emb, n_iters=3, n_cells=16).collect()
    got = {(r.cell, r.dim): (r.centroid_val, r.n_members) for r in rows}

    vecs = {r.vec_id: np.array(r.embedding, np.float64) for r in emb.collect()}
    cents = {i: vecs[i].copy() for i in range(16)}
    for _ in range(3):
        members: dict[int, list] = {}
        for vid in sorted(vecs):
            v = vecs[vid]
            best = max(
                sorted(cents), key=lambda c: (_seq_dot_py(v, cents[c]), -c)
            )
            members.setdefault(best, []).append(v)
        nxt = {}
        n_mem = {}
        for c, vs in members.items():
            nxt[c] = np.round(np.mean(vs, axis=0), 6)
            n_mem[c] = len(vs)
        cents = nxt
    want = {
        (c, d): (float(cents[c][d]), n_mem[c])
        for c in cents
        for d in range(64)
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][1] == want[k][1], k  # membership
        assert abs(got[k][0] - want[k][0]) < 1e-6, k


def _seq_dot_py(a, b) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc



def test_cdc_incremental_finds_shared_content(spark, tmp_path):
    from trading_etl_python_spark.operators.dedup import (
        cdc_incremental_stats,
        write_cdc_index,
    )

    shared = "the common boilerplate header repeated across documents " * 5
    corpus = spark.createDataFrame(
        [(1, shared + "original tail one"), (2, shared + "original tail two")],
        "doc_id bigint, text string",
    )
    path = str(tmp_path / "idx")
    write_cdc_index(corpus, path)
    new = spark.createDataFrame(
        [(10, shared + "entirely new suffix content"), (11, "nothing in common here " * 8)],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in cdc_incremental_stats(new, spark, path).collect()}
    assert out[10].n_known >= 1 and out[10].known_bytes_ratio > 0.3
    assert out[11].n_known == 0 and out[11].known_bytes_ratio == 0.0
    assert all(0 <= r.known_bytes_ratio <= 1 for r in out.values())


def test_semdedup_max_cell_splits_oversized_cell(spark):
    """r10 cell-size cap: 60 identical vectors land in ONE cell; with
    max_cell=10 the cell sub-splits into ceil(60/10)=6 portable-hash
    groups and first-writer-wins runs per (cell, sub) group.  The
    expected survivor set is re-derived in pure Python from the same
    md5 formula — exact match, plus the superset law (capped keeps
    every uncapped survivor: fewer pairs compared, never more)."""
    import hashlib
    import math

    n, m = 60, 10
    v = [1.0, 0.0, 0.0]
    emb = spark.createDataFrame(
        [(i, v) for i in range(n)], "vec_id bigint, embedding array<double>"
    )
    cents = {0: v}
    out = {
        r.vec_id: r.is_kept
        for r in S.semdedup(
            emb, centroids=cents, threshold=0.8, max_cell=m
        ).collect()
    }
    assert len(out) == n  # audit contract survives the cap
    nsub = math.ceil(n / m)
    sub = {
        i: int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % nsub
        for i in range(n)
    }
    expect_kept = {min(ids) for s in range(nsub)
                   if (ids := [i for i in range(n) if sub[i] == s])}
    assert {i for i, k in out.items() if k} == expect_kept
    assert 1 < len(expect_kept) <= nsub  # the cap actually split
    # uncapped drops everything but vec 0; capped keeps a superset
    unc = {
        r.vec_id: r.is_kept
        for r in S.semdedup(emb, centroids=cents, threshold=0.8).collect()
    }
    assert {i for i, k in unc.items() if k} == {0}
    assert {i for i, k in unc.items() if k} <= {i for i, k in out.items() if k}
