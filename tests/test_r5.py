"""Round-5 additions: portable Bloom filter family, VARIANT props."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trading_etl_python_spark.operators import sketches as K


def test_bloom_no_false_negatives(spark):
    """Every inserted key must pass might_contain — the bloom
    guarantee; a single false negative makes join pruning unsound."""
    keys = spark.range(0, 500).select(F.col("id").alias("k"))
    words = K.bloom_collect(K.bloom_build(keys, "k", 4096, 4), 4096)
    passed = keys.filter(K.bloom_might_contain("k", words, 4096, 4)).count()
    assert passed == 500


def test_bloom_merge_is_bitwise_or(spark):
    """bloom(A UNION B) == word-wise OR of bloom(A), bloom(B) — the
    mergeability that lets every shard sketch independently."""
    a = spark.range(0, 200).select(F.col("id").alias("k"))
    b = spark.range(150, 400).select(F.col("id").alias("k"))
    w_ab = K.bloom_collect(K.bloom_build(a.union(b), "k", 2048, 3), 2048)
    w_a = K.bloom_collect(K.bloom_build(a, "k", 2048, 3), 2048)
    w_b = K.bloom_collect(K.bloom_build(b, "k", 2048, 3), 2048)
    assert w_ab == [x | y for x, y in zip(w_a, w_b)]


def test_bloom_fp_rate_near_theory(spark):
    """Disjoint probes false-positive near (1 - e^(-kn/m))^k — sanity
    that the k salted positions behave independently."""
    import math

    n, m, k = 400, 8192, 4
    build = spark.range(0, n).select(F.col("id").alias("k"))
    words = K.bloom_collect(K.bloom_build(build, "k", m, k), m)
    probes = spark.range(1_000_000, 1_008_000).select(F.col("id").alias("k"))
    fp = probes.filter(K.bloom_might_contain("k", words, m, k)).count()
    theory = (1 - math.exp(-k * n / m)) ** k
    assert fp / 8000 <= max(5 * theory, 0.005)


def test_bloom_semi_audit_accounts_exactly(spark):
    """n_pass >= n_true in every group (no false negatives), and
    n_false_pos == n_pass - n_true by definition."""
    build = spark.createDataFrame(
        [(i,) for i in range(0, 100, 2)], "bk long"
    )
    probe = spark.createDataFrame(
        [(i, "g%d" % (i % 3)) for i in range(100)], "pk long, g string"
    )
    out = K.bloom_semi_audit(build, "bk", probe, "pk", "g", 1024, 3).collect()
    assert {r["group"] for r in out} == {"g0", "g1", "g2"}
    for r in out:
        assert r.n_pass >= r.n_true
        assert r.n_false_pos == r.n_pass - r.n_true
    assert sum(r.n_true for r in out) == 50


def test_bloom_probe_is_scan_side_only(spark):
    """The membership test must compile to in-plan expressions — no
    join, no exchange introduced by the probe itself."""
    probe = spark.range(0, 1000).select(F.col("id").alias("k"))
    words = K.bloom_collect(
        K.bloom_build(spark.range(0, 50).select(F.col("id").alias("k")), "k", 1024, 3),
        1024,
    )
    plan = (
        probe.filter(K.bloom_might_contain("k", words, 1024, 3))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan and "Exchange" not in plan, plan


def test_json_props_stats_isolates_malformed_payloads(spark):
    """Malformed JSON, missing keys, and mistyped values become NULLs
    counted out of n_valid — never job failures (T7 contract on the
    VARIANT path)."""
    from trading_etl_python_spark.operators.transforms import json_props_stats

    rows = [
        ("a", '{"k": 5}'),
        ("a", '{"k": 7}'),
        ("a", "not json at all"),
        ("a", '{"other": 1}'),
        ("a", '{"k": "strval"}'),
        ("b", '{"k": -3}'),
        ("b", None),
    ]
    df = spark.createDataFrame(rows, "event_type string, props string")
    out = {r["group"]: r for r in json_props_stats(df).collect()}
    assert out["a"].n == 5 and out["a"].n_valid == 2
    assert out["a"].min_k == 5 and out["a"].max_k == 7 and out["a"].sum_k == 12
    assert out["b"].n == 2 and out["b"].n_valid == 1 and out["b"].sum_k == -3


def test_json_props_stats_parses_once_per_row(spark):
    """The plan must carry a single parse_json per row feeding the
    variant_get, not one string re-parse per extracted field."""
    from trading_etl_python_spark.operators.transforms import json_props_stats

    df = spark.createDataFrame([("a", '{"k": 1}')], "event_type string, props string")
    plan = (
        json_props_stats(df)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
        .lower()
    )
    assert plan.count("parse_json") <= 1
    assert "get_json_object" not in plan


def test_hist_quantile_error_bounded_by_bucket_width(spark, sf_dir):
    """Interpolated histogram quantiles must land within ~one bucket
    width of the exact percentile (the sketch's error contract),
    emitted as err_ratio."""
    from trading_etl_python_spark.operators.sketches import hist_quantile_audit
    from trading_etl_python_spark.sources.tables import load_events

    ev = load_events(spark, sf_dir)
    rows = hist_quantile_audit(ev, "value", "event_type", 64, (0.5, 0.9)).collect()
    assert len(rows) == 10  # 5 event types x 2 quantiles
    for r in rows:
        assert r.err_ratio <= 1.05, r
        assert r.est_q is not None and r.exact_q is not None


def test_hist_quantile_constant_column_degenerates_cleanly(spark):
    """mx == mn (constant column): estimate equals the constant, error
    zero — no division by the zero-width bucket."""
    from trading_etl_python_spark.operators.sketches import hist_quantile_audit

    df = spark.createDataFrame([("a", 7.0)] * 5 + [("b", 1.0)], "g string, v double")
    out = {(r["group"], r.q): r for r in
           hist_quantile_audit(df, "v", "g", 16, (0.5,)).collect()}
    assert out[("a", 0.5)].est_q == 7.0 and out[("a", 0.5)].err_ratio == 0.0
    assert out[("b", 0.5)].est_q == 1.0
