from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from trading_etl_python_spark.operators.temporal import asof_join, session_stats, sessionize


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 12, minute)


def test_asof_join_backward_inclusive(spark):
    quotes = spark.createDataFrame(
        [(1, _ts(0), 100.0), (1, _ts(10), 101.0), (2, _ts(5), 50.0)],
        "sym long, time timestamp, px double",
    )
    trades = spark.createDataFrame(
        [(1, _ts(10), "a"), (1, _ts(12), "b"), (1, _ts(3), "c"), (2, _ts(4), "d")],
        "sym long, time timestamp, tid string",
    )
    out = {
        r.tid: r.asof_px
        for r in asof_join(
            trades, quotes, on="sym", value_cols=("px",), prefix="asof_"
        ).collect()
    }
    assert out["a"] == 101.0  # equal timestamps match (inclusive)
    assert out["b"] == 101.0
    assert out["c"] == 100.0
    assert out["d"] is None  # LEFT: no quote at or before 12:04 for sym 2


def test_asof_join_dedups_right_ties(spark):
    quotes = spark.createDataFrame(
        [(1, _ts(0), 1.0), (1, _ts(0), 9.0)], "sym long, time timestamp, px double"
    )
    trades = spark.createDataFrame([(1, _ts(1), "t")], "sym long, time timestamp, tid string")
    rows = asof_join(trades, quotes, on="sym", value_cols=("px",)).collect()
    assert len(rows) == 1
    assert rows[0].asof_px == 9.0  # deterministic max-value tie-break


def test_asof_join_preserves_left_columns_and_count(spark, sf_dir):
    from trading_etl_python_spark.sources.tables import load_events

    ev = load_events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    out = asof_join(purchases, clicks, on="user_id", left_time="ts", right_time="ts", value_cols=("value",))
    assert out.columns == ["event_id", "user_id", "ts", "asof_value"]
    assert out.count() == purchases.count()  # left join: row-preserving


def test_sessionize_gap_boundaries(spark):
    rows = [
        (1, 100, _ts(0), 1.0),
        (1, 101, _ts(29), 1.0),  # 29 min gap -> same session (<= 30)
        (1, 102, _ts(59), 1.0),  # 30 min gap exactly -> same session
        (1, 103, _ts(59) + dt.timedelta(minutes=31), 1.0),  # 31 min -> new
        (2, 104, _ts(0), 1.0),  # separate key -> own session
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp, value double")
    got = {r.event_id: r.session_id for r in sessionize(df, gap_minutes=30).collect()}
    assert got[100] == got[101] == got[102] == 1
    assert got[103] == 2
    assert got[104] == 1


def test_session_stats_aggregates(spark):
    rows = [(1, 1, _ts(0), 2.0), (1, 2, _ts(5), 3.0), (1, 3, _ts(59), 4.0)]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp, value double")
    stats = session_stats(df, gap_minutes=30).collect()
    by_id = {(r.user_id, r.session_id): r for r in stats}
    assert by_id[(1, 1)].n_events == 2 and by_id[(1, 1)].sum_value == 5.0
    assert by_id[(1, 2)].n_events == 1 and by_id[(1, 2)].session_start == _ts(59)


def test_asof_join_single_exchange(spark, sf_dir):
    """The union+last_value plan must shuffle exactly once (hash on the
    key) — the whole point of not using a range join."""
    from trading_etl_python_spark.sources.tables import load_events

    ev = load_events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    plan = (
        asof_join(purchases, clicks, on="user_id", left_time="ts", right_time="ts", value_cols=("value",))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") <= 2  # tie-dedup window + main window share the exchange
    assert "Join" not in plan  # no join operator anywhere


def test_candles_golden(spark):
    from trading_etl_python_spark.operators.temporal import candles

    rows = [
        # symbol 1, one day: open=first by time, close=last, high/low across
        (1, "2024-01-01 09:00:00", 10.0, 12.0, 9.0, 10.5, 100),
        (1, "2024-01-01 15:00:00", 10.6, 13.0, 10.0, 11.0, 200),
        (1, "2024-01-02 09:00:00", 11.0, 11.5, 10.5, 11.2, 50),
    ]
    df = spark.createDataFrame(
        rows, "symbol long, time string, open double, high double, low double, close double, volume long"
    ).selectExpr("symbol", "CAST(time AS TIMESTAMP) AS time", "open", "high", "low", "close", "volume")
    got = {str(r.bucket_start): r for r in candles(df, "1 day").collect()}
    d1 = got["2024-01-01 00:00:00"]
    assert (d1.open_px, d1.high_px, d1.low_px, d1.close_px, d1.volume, d1.n_ticks) == (
        10.0, 13.0, 9.0, 11.0, 300, 2
    )
    d2 = got["2024-01-02 00:00:00"]
    assert (d2.open_px, d2.close_px, d2.n_ticks) == (11.0, 11.2, 1)


def test_gapfill_locf_and_interp(spark):
    from trading_etl_python_spark.operators.temporal import gapfill_locf

    # one symbol, ticks in buckets 00-06 and 18-24 of the same day: two
    # 6h gap buckets (06-12, 12-18) to fill; LOCF carries 10, interp
    # walks 10 -> 22 in thirds.
    h = lambda hh, mm=0: dt.datetime(2024, 1, 2, hh, mm)
    df = spark.createDataFrame(
        [(7, h(1), 1, 9.0), (7, h(2), 2, 10.0), (7, h(19), 3, 22.0)],
        "symbol long, time timestamp, event_id long, close double",
    )
    rows = {r.bucket_start.hour: r for r in gapfill_locf(df, 6).collect()}
    assert sorted(rows) == [0, 6, 12, 18]
    assert rows[0].n_ticks == 2 and not rows[0].is_gap
    assert rows[0].close_locf == 10.0  # last tick of the bucket, not first
    assert rows[6].is_gap and rows[6].n_ticks == 0
    assert rows[6].close_locf == 10.0 and rows[12].close_locf == 10.0
    assert rows[6].close_interp == 14.0  # 10 + (22-10)*1/3
    assert rows[12].close_interp == 18.0
    assert rows[18].close_interp == 22.0 and not rows[18].is_gap


def test_gapfill_trailing_gap_uses_locf(spark):
    from trading_etl_python_spark.operators.temporal import gapfill_locf

    # gap bucket after the last real tick (day 2 bucket 0 real, bucket 6
    # empty, bucket 12 real on another symbol extends nothing): trailing
    # buckets only exist up to each symbol's own max bucket.
    h = lambda d_, hh: dt.datetime(2024, 1, d_, hh)
    df = spark.createDataFrame(
        [(1, h(2, 0), 1, 5.0), (1, h(2, 13), 2, 7.0), (2, h(2, 3), 3, 1.0)],
        "symbol long, time timestamp, event_id long, close double",
    )
    out = gapfill_locf(df, 6).collect()
    sym1 = sorted([r for r in out if r.symbol == 1], key=lambda r: r.bucket_start)
    assert [r.bucket_start.hour for r in sym1] == [0, 6, 12]
    assert [r.close_interp for r in sym1] == [5.0, 6.0, 7.0]
    assert len([r for r in out if r.symbol == 2]) == 1  # span is per-symbol


def test_twap_holding_time_weights(spark):
    from trading_etl_python_spark.operators.analytics import twap

    # weights: 10 at 100s, 20 at 200s, last tick weightless ->
    # (10*100 + 20*200) / 300
    t0 = dt.datetime(2024, 1, 2, 0, 0, 0)
    df = spark.createDataFrame(
        [
            (1, t0, 1, 10.0),
            (1, t0 + dt.timedelta(seconds=100), 2, 20.0),
            (1, t0 + dt.timedelta(seconds=300), 3, 99.0),
        ],
        "symbol long, time timestamp, event_id long, close double",
    )
    r = twap(df).collect()[0]
    assert r.n_ticks == 3
    assert abs(r.twap - (10 * 100 + 20 * 200) / 300) < 1e-6  # operator rounds 6dp


def test_twap_single_tick_is_null(spark):
    from trading_etl_python_spark.operators.analytics import twap

    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 2), 1, 10.0)],
        "symbol long, time timestamp, event_id long, close double",
    )
    r = twap(df).collect()[0]
    assert r.twap is None and r.n_ticks == 1


def test_candles_rollup_equals_direct_daily(spark, sf_dir):
    """Hierarchy consistency: daily candles rolled up from 6h candles must
    be IDENTICAL to daily candles computed directly from ticks."""
    from trading_etl_python_spark.operators.temporal import candles, candles_rollup
    from trading_etl_python_spark.sources.tables import bars

    b = bars(spark, sf_dir)
    direct = {
        (r.symbol, r.bucket_start): r for r in candles(b, "1 day").collect()
    }
    rolled = {
        (r.symbol, r.bucket_start): r
        for r in candles_rollup(candles(b, "6 hours"), "1 day").collect()
    }
    assert set(direct) == set(rolled)
    for k, d in direct.items():
        r = rolled[k]
        assert (d.open_px, d.high_px, d.low_px, d.close_px) == (
            r.open_px, r.high_px, r.low_px, r.close_px
        ), k
        assert d.volume == r.volume and d.n_ticks == r.n_ticks


def test_asof_join_tolerance_nulls_stale_matches(spark):
    quotes = spark.createDataFrame(
        [(1, _ts(0), 100.0)], "sym long, time timestamp, px double"
    )
    trades = spark.createDataFrame(
        [(1, _ts(5), "near"), (1, _ts(40), "far")],
        "sym long, time timestamp, tid string",
    )
    out = {
        r.tid: r.asof_px
        for r in asof_join(
            trades, quotes, on="sym", value_cols=("px",), tolerance="10 MINUTES"
        ).collect()
    }
    assert out["near"] == 100.0
    assert out["far"] is None  # 40 min old: outside tolerance


def test_asof_forward_matches_pandas_merge_asof(spark):
    import pandas as pd

    from trading_etl_python_spark.operators import temporal as TMP

    left = pd.DataFrame(
        {"k": ["a", "a", "b"], "time": pd.to_datetime(["2024-01-01 10:00",
                                                       "2024-01-01 12:00",
                                                       "2024-01-01 11:00"])}
    )
    right = pd.DataFrame(
        {"k": ["a", "a", "b"],
         "time": pd.to_datetime(["2024-01-01 10:30", "2024-01-01 12:00",
                                 "2024-01-01 10:00"]),
         "value": [1.0, 2.0, 3.0]}
    )
    got = (
        TMP.asof_join_forward(
            spark.createDataFrame(left), spark.createDataFrame(right), on="k"
        )
        .toPandas()
        .sort_values(["k", "time"])
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        left.sort_values("time"), right.sort_values("time"),
        on="time", by="k", direction="forward",
    ).sort_values(["k", "time"]).reset_index(drop=True)
    assert list(got["next_value"].fillna(-1)) == list(want["value"].fillna(-1))


def test_asof_nearest_matches_pandas(spark):
    import numpy as np
    import pandas as pd

    from trading_etl_python_spark.operators import temporal as TMP

    rng = np.random.default_rng(11)
    lt = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        rng.integers(0, 10_000, 60), unit="s"
    )
    rt = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        rng.integers(0, 10_000, 40), unit="s"
    )
    left = pd.DataFrame({"k": list("ab") * 30, "time": lt})
    right = pd.DataFrame(
        {"k": list("ab") * 20, "time": rt, "value": rng.uniform(0, 1, 40).round(3)}
    )
    # pandas requires unique (k, time) on the right for a clean compare
    right = right.drop_duplicates(["k", "time"])

    got = (
        TMP.asof_join_nearest(
            spark.createDataFrame(left), spark.createDataFrame(right), on="k"
        )
        .toPandas()
        .sort_values(["k", "time"])
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        left.sort_values("time"),
        right.sort_values("time"),
        on="time",
        by="k",
        direction="nearest",
    ).sort_values(["k", "time"]).reset_index(drop=True)
    assert list(got["near_value"].fillna(-1)) == list(want["value"].fillna(-1))
