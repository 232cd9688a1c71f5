from __future__ import annotations

import datetime as dt

from trading_etl_python_spark.operators import eventflow as EV
from trading_etl_python_spark.operators.sampling import deterministic_sample, split_assign


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m), u, t, None) for i, (m, u, t) in enumerate(rows)],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, value double",
    )


def test_funnel_requires_strict_order(spark):
    # user 1 completes in order; user 2 purchases BEFORE clicking -> stage 3 not reached
    df = _ev(
        spark,
        [
            (0, 1, "view"), (5, 1, "click"), (9, 1, "purchase"),
            (0, 2, "view"), (3, 2, "purchase"), (6, 2, "click"),
        ],
    )
    row = EV.funnel_counts(df).collect()[0]
    assert (row.entered, row.reached_2, row.reached_3) == (2, 2, 1)


def test_funnel_same_timestamp_not_counted(spark):
    # click at exactly t1 is NOT strictly later
    df = _ev(spark, [(0, 1, "view"), (0, 1, "click")])
    row = EV.funnel_counts(df).collect()[0]
    assert (row.entered, row.reached_2, row.reached_3) == (1, 0, 0)


def test_retention_offsets(spark):
    df = _ev(
        spark,
        [
            (0, 1, "view"),            # day 0
            (60 * 24, 1, "click"),     # day 1
            (60 * 48, 1, "view"),      # day 2
            (60 * 24, 2, "view"),      # user 2 first seen day 1
        ],
    )
    got = {
        (str(r.cohort_date)[:10], r.day_offset): r.n_users
        for r in EV.retention_cohorts(df).collect()
    }
    assert got == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 1): 1,
        ("2024-01-01", 2): 1,
        ("2024-01-02", 0): 1,
    }


def test_events_in_windows_no_double_count(spark):
    # two overlapping error windows cover the same view event: count once
    df = _ev(
        spark,
        [
            (0, 1, "error"), (2, 1, "error"), (5, 1, "view"),
            (30, 1, "view"),                      # outside both windows
            (5, 2, "view"),                       # user 2 has no error window
        ],
    )
    got = {r.user_id: r.n_probe_events for r in EV.events_in_windows(df).collect()}
    assert got == {1: 1}


def test_split_assign_stable_and_partitions(spark):
    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    splits = split_assign(df)
    counts = {r.split: r.cnt for r in splits.groupBy("split").count().withColumnRenamed("count", "cnt").collect()}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # determinism: same assignment on recompute
    a = {r.doc_id: r.split for r in splits.collect()}
    b = {r.doc_id: r.split for r in split_assign(df).collect()}
    assert a == b


def test_deterministic_sample_is_subset_invariant(spark):
    full = spark.range(1000).withColumnRenamed("id", "doc_id")
    half = full.filter("doc_id < 500")
    s_full = {r.doc_id for r in deterministic_sample(full, 10).collect()}
    s_half = {r.doc_id for r in deterministic_sample(half, 10).collect()}
    # growing the corpus never changes earlier rows' membership
    assert s_half == {d for d in s_full if d < 500}
    assert 40 <= len(s_full) <= 200


def test_mixture_sample_hits_target_shares(spark, sf_dir):
    from trading_etl_python_spark.operators.sampling import mixture_sample
    from trading_etl_python_spark.sources.tables import load_table

    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    target = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
    out = mixture_sample(docs, target, "source")
    got = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert set(got) <= set(target)
    # uniform 25/source corpus: binding stratum src0 keeps 100%, and
    # achieved shares track the target within Bernoulli noise
    total = sum(got.values())
    n_src = docs.filter(F.col("source") == "src0").count()
    assert got["src0"] == n_src
    for s, w in target.items():
        assert abs(got.get(s, 0) / total - w) < 0.15

    # deterministic: same rows regardless of partitioning
    again = mixture_sample(docs.repartition(7), target, "source")
    assert sorted(r["doc_id"] for r in out.select("doc_id").collect()) == \
           sorted(r["doc_id"] for r in again.select("doc_id").collect())


def test_weighted_sample_biases_toward_weight(spark):
    from pyspark.sql import functions as F

    from trading_etl_python_spark.operators.sampling import weighted_sample_topk

    # two strata: heavy docs weight 1000, light docs weight 10 — a
    # 100-of-2000 sample should be dominated by heavy docs
    rows = [(i, 1000 if i % 2 == 0 else 10) for i in range(2000)]
    df = spark.createDataFrame(rows, ["doc_id", "n_chars"])
    out = weighted_sample_topk(df, k=100)
    heavy = out.filter(F.col("doc_id") % 2 == 0).count()
    assert heavy > 85
    # without replacement + deterministic: re-running yields identical ids
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in weighted_sample_topk(df.repartition(7), k=100).collect())
    assert a == b and len(set(a)) == 100


def test_weighted_sample_take_ordered_plan(spark, sf_dir):
    from trading_etl_python_spark.sources.tables import load_table
    from trading_etl_python_spark.operators.sampling import weighted_sample_topk

    df = weighted_sample_topk(load_table(spark, sf_dir, "documents"), k=50)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_epoch_order_distinct_permutations_per_epoch(spark):
    from trading_etl_python_spark.operators.sampling import epoch_order

    df = spark.createDataFrame([(i,) for i in range(200)], ["doc_id"])
    e1 = [r["doc_id"] for r in epoch_order(df, 1).orderBy("epoch_rank").collect()]
    e2 = [r["doc_id"] for r in epoch_order(df, 2).orderBy("epoch_rank").collect()]
    assert sorted(e1) == sorted(e2) == list(range(200))   # permutations
    assert e1 != e2                                        # different per epoch
    # stable across partitionings
    e1b = [r["doc_id"] for r in
           epoch_order(df.repartition(7), 1).orderBy("epoch_rank").collect()]
    assert e1 == e1b
