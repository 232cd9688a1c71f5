"""Event-profile batch (operators/eventflow.py: markov_transitions,
inter_event_gaps, cohort_value, hourly_profile)."""

from __future__ import annotations

from pyspark.sql import functions as F

from trading_etl_python_spark.operators import eventflow as EV


def _events(spark, rows):
    """rows: (event_id, ts_str, user_id, event_type, value)."""
    return (
        spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type", "value"]
        )
        .withColumn("ts", F.to_timestamp("ts"))
    )


def test_markov_probs_and_rank(spark):
    rows = [
        (1, "2024-01-01 10:00:00", 1, "view", 0.0),
        (2, "2024-01-01 10:01:00", 1, "click", 0.0),
        (3, "2024-01-01 10:02:00", 1, "view", 0.0),
        (4, "2024-01-01 10:03:00", 1, "click", 0.0),
        (5, "2024-01-01 10:04:00", 1, "view", 0.0),
        (6, "2024-01-01 10:05:00", 1, "purchase", 0.0),
    ]
    out = {(r.from_type, r.to_type): r for r in EV.markov_transitions(_events(spark, rows)).collect()}
    # view -> click twice, view -> purchase once
    assert out[("view", "click")].n == 2
    assert out[("view", "click")].prob == round(2 / 3, 6)
    assert out[("view", "click")].rk == 1
    assert out[("view", "purchase")].rk == 2


def test_inter_event_gap_stats(spark):
    # user 1 'view' every 60 s, 21 events -> 20 gaps of 60e6 us
    rows = [
        (i, f"2024-01-01 10:{i:02d}:00", 1, "view", 0.0) for i in range(21)
    ]
    out = EV.inter_event_gaps(_events(spark, rows), min_gaps=10).collect()[0]
    assert out.n_gaps == 20
    assert out.mean_gap_us == 60_000_000
    assert out.p50_gap_us == 60_000_000 and out.p90_gap_us == 60_000_000


def test_cohort_value_grid(spark):
    rows = [
        (1, "2024-01-01 10:00:00", 1, "view", 2.5),
        (2, "2024-01-09 10:00:00", 1, "view", 1.5),  # week 1
        (3, "2024-01-01 11:00:00", 2, "view", 4.0),
    ]
    out = {
        (str(r.cohort_date)[:10], r.week_offset): r
        for r in EV.cohort_value(_events(spark, rows)).collect()
    }
    w0 = out[("2024-01-01", 0)]
    assert w0.n_users == 2 and abs(w0.total_value - 6.5) < 1e-12
    assert w0.arpu == 3.25
    assert out[("2024-01-01", 1)].n_users == 1


def test_hourly_profile_peak_flag(spark):
    rows = [(i, f"2024-01-01 09:{i:02d}:00", 1, "view", 0.0) for i in range(3)]
    rows += [(10, "2024-01-01 14:00:00", 1, "view", 0.0)]
    out = {r.hour: r for r in EV.hourly_profile(_events(spark, rows)).collect()}
    assert out[9].n == 3 and out[9].is_peak_hour
    assert out[14].n == 1 and not out[14].is_peak_hour
    assert out[9].share == 0.75
