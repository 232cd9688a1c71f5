"""Round-6 analytics family: ichimoku, pivot points, VaR/ES, ACF,
EWMA volatility, volume profile, pairs spread, return moments, DSIR
weights (operators/analytics.py, operators/curation.dsir_weights)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from trading_etl_python_spark.operators import analytics as AN
from trading_etl_python_spark.operators.curation import dsir_weights


def _ohlc(spark, rows):
    """rows: (symbol, time_str, event_id, high, low, close)"""
    return spark.createDataFrame(
        [(s, t, e, float(h), float(lo), float(c)) for s, t, e, h, lo, c in rows],
        "symbol long, time string, event_id long, high double, low double, close double",
    ).withColumn("time", F.col("time").cast("timestamp"))


def _daily(spark, rows):
    """rows: (symbol, day_str, close) -> one bar per day."""
    return _ohlc(
        spark,
        [(s, d, i, c, c, c) for i, (s, d, c) in enumerate(rows)],
    ).withColumn("volume", F.lit(1).cast("long"))


def test_ichimoku_midpoints_and_warmup(spark):
    rows = [(1, f"2024-01-{d:02d}", d, 10.0 + d, 5.0 + d, 7.0 + d) for d in range(1, 12)]
    out = {r.event_id: r for r in AN.ichimoku(_ohlc(spark, rows), tenkan=3, kijun=5, senkou=9).collect()}
    assert out[1].tenkan is None and out[2].tenkan is None
    # rows 1..3: max high 13, min low 6 -> tenkan (13+6)/2
    assert out[3].tenkan == (13.0 + 6.0) / 2
    assert out[4].kijun is None and out[4].senkou_a is None
    # rows 1..5: max high 15, min low 6
    assert out[5].kijun == (15.0 + 6.0) / 2
    assert out[5].senkou_a == (out[5].tenkan + out[5].kijun) / 2
    assert out[8].senkou_b is None
    assert out[9].senkou_b == (19.0 + 6.0) / 2


def test_pivot_points_classic_levels(spark):
    rows = [
        (1, "2024-01-01 09:00", 1, 110.0, 90.0, 100.0),
        (1, "2024-01-01 16:00", 2, 105.0, 95.0, 102.0),  # last close day 1
        (1, "2024-01-02 09:00", 3, 120.0, 100.0, 110.0),
    ]
    out = AN.pivot_points(_ohlc(spark, rows)).collect()
    assert len(out) == 1  # day 1 has no prior session
    r = out[0]
    p = (110.0 + 90.0 + 102.0) / 3.0
    assert r.pivot == p
    assert r.r1 == 2.0 * p - 90.0 and r.s1 == 2.0 * p - 110.0
    assert r.r2 == p + 20.0 and r.s2 == p - 20.0


def test_var_es_rank_based_tail(spark):
    # 21 daily closes -> 20 returns, k = ceil(20/20) = 1: VaR = ES = worst return
    closes = [100.0] * 21
    closes[10] = 80.0  # one big drop (and recovery)
    rows = [(1, f"2024-01-{d:02d}", closes[d - 1]) for d in range(1, 22)]
    out = AN.var_es(_daily(spark, rows), tail=20, min_days=15).collect()
    assert len(out) == 1
    worst = round(math.log(80.0 / 100.0), 6)
    assert out[0].var_95 == worst
    assert out[0].es_95 == math.floor(worst * 1e6) / 1e6
    assert out[0].n_days == 20


def test_acf_alternating_series_negative_lag1(spark):
    # closes alternate 100, 110 -> returns alternate +x, -x: acf(1) = -1, acf(2) = +1
    rows = [(1, f"2024-01-{d:02d}", 100.0 if d % 2 else 110.0) for d in range(1, 31)]
    out = {r.lag: r for r in AN.return_acf(_daily(spark, rows), max_lag=2, min_pairs=10).collect()}
    assert out[1].acf == pytest.approx(-1.0, abs=1e-3)
    assert out[2].acf == pytest.approx(1.0, abs=1e-3)


def test_ewma_vol_matches_manual_fold(spark):
    closes = [100.0, 102.0, 99.0, 101.0, 98.0, 103.0]
    rows = [(1, f"2024-01-{d:02d}", closes[d - 1]) for d in range(1, 7)]
    out = sorted(AN.ewma_volatility(_daily(spark, rows), lam=0.94).collect(), key=lambda r: r.day)
    rs = [round(math.log(closes[i + 1] / closes[i]), 6) for i in range(5)]
    v = 0.0
    for i, x in enumerate(rs):
        v = x * x if i == 0 else 0.94 * v + (1.0 - 0.94) * (x * x)
        got = out[i].ewma_vol
        assert got == pytest.approx(math.sqrt(v), abs=1e-6)


def test_volume_profile_shares_sum_to_one(spark):
    rows = [(1, "2024-01-01", 1, 10.0, 10.0, 15.0), (1, "2024-01-01", 2, 10.0, 10.0, 25.0),
            (1, "2024-01-01", 3, 10.0, 10.0, 26.0), (2, "2024-01-01", 4, 10.0, 10.0, 5.0)]
    df = _ohlc(spark, rows).withColumn("volume", F.col("event_id") * 10)
    out = AN.volume_profile(df, bin_width=10.0).collect()
    assert {(r.symbol, r.bin_low) for r in out} == {(1, 10.0), (1, 20.0), (2, 0.0)}
    by_sym = {}
    for r in out:
        by_sym.setdefault(r.symbol, 0.0)
        by_sym[r.symbol] += r.vol_share
    assert all(abs(v - 1.0) < 1e-9 for v in by_sym.values())
    b1 = {r.bin_low: r.bin_volume for r in out if r.symbol == 1}
    assert b1 == {10.0: 10, 20.0: 50}


def test_pairs_spread_constant_ratio_zero_z(spark):
    # symbol 2 = 2x symbol 1 every day -> ratio constant, sd ~ 0, last_z NULL
    rows = []
    for d in range(1, 21):
        rows += [(1, f"2024-01-{d:02d}", 100.0 + d), (2, f"2024-01-{d:02d}", 2 * (100.0 + d))]
    out = AN.pairs_spread(_daily(spark, rows), basket_max_symbol=50, min_days=15).collect()
    assert len(out) == 1
    r = out[0]
    assert r.symbol_a == 1 and r.symbol_b == 2 and r.n_days == 20
    assert r.mean_ratio == pytest.approx(0.5, abs=1e-6)
    assert r.sd_ratio == pytest.approx(0.0, abs=1e-6)
    assert r.last_z is None  # sd == 0 -> NULLIF guard


def test_return_moments_symmetric_zero_skew(spark):
    # symmetric +x/-x return pattern -> skew ~ 0
    closes = [100.0]
    for i in range(20):
        closes.append(closes[-1] * (1.1 if i % 2 == 0 else 1 / 1.1))
    rows = [(1, f"2024-01-{d:02d}", closes[d - 1]) for d in range(1, 22)]
    out = AN.return_moments(_daily(spark, rows), min_days=15).collect()
    assert len(out) == 1
    assert out[0].skew == pytest.approx(0.0, abs=1e-2)


def test_dsir_weights_upweight_target_language(spark):
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat", "en"), (2, "the dog ran to the cat", "en"),
         (3, "el gato y el perro", "es"), (4, "le chat et le chien", "fr")],
        "doc_id long, text string, lang string",
    )
    out = {r.doc_id: r for r in dsir_weights(docs, target_lang="en").collect()}
    assert len(out) == 4 and all(out[i].n_tokens > 0 for i in out)
    en_scores = [out[1].avg_logratio, out[2].avg_logratio]
    other = [out[3].avg_logratio, out[4].avg_logratio]
    assert min(en_scores) > max(other)


def test_ewma_sql_matches_arrow_kernel(spark, sf_dir):
    """q_ewma_sql (r13: the AGGREGATE-fold form) and the grouped Arrow
    kernel (q_ewma_vol) must produce identical tables."""
    from trading_etl_python_spark.suite import QUERIES

    a = {(r.symbol, r.day): r.ewma_vol for r in QUERIES["q_ewma_vol"](spark, sf_dir).collect()}
    b = {(r.symbol, r.day): r.ewma_vol for r in QUERIES["q_ewma_sql"](spark, sf_dir).collect()}
    assert a == b and len(a) > 0


def test_ewma_fold_matches_recursive_cte_verbatim(spark, sf_dir):
    """r13 equivalence pin: the WITH RECURSIVE text (still the DuckDB
    oracle, and still the certification of Spark 4's recursive-CTE
    surface) run verbatim through spark.sql must equal the optimized
    AGGREGATE-fold plan q_ewma_sql executes.  Since r14 the fold's
    multiplier is 0.06D — the double the recursion's DECIMAL-folded
    (1.0 - 0.94) actually casts to — so the equality is genuinely
    bit-for-bit pre-rounding (the r13 (1.0D - 0.94D) form drifted
    ~1e-16/step under the 6-decimal rounding; ADVICE r13)."""
    from trading_etl_python_spark.suite import QUERIES
    from trading_etl_python_spark.suite.sql_api import EWMA_RECURSIVE, _sql

    rec = {(r.symbol, r.day): r.ewma_vol for r in _sql(spark, sf_dir, EWMA_RECURSIVE).collect()}
    fold = {(r.symbol, r.day): r.ewma_vol for r in QUERIES["q_ewma_sql"](spark, sf_dir).collect()}
    assert rec == fold and len(rec) > 0


def test_hll_set_algebra_exact_and_estimates(spark):
    from trading_etl_python_spark.operators.sketches import hll_set_algebra

    rows = [("a", str(i)) for i in range(1, 101)] + [("b", str(i)) for i in range(51, 151)]
    items = spark.createDataFrame(rows, "cohort string, item string")
    r = hll_set_algebra(items, "item", "cohort", p=8).collect()[0]
    assert (r.exact_a, r.exact_b, r.exact_union, r.exact_inter) == (100, 100, 150, 50)
    # p=8 -> sigma ~ 6.5%; allow 3 sigma on each estimate
    assert abs(r.est_a - 100) / 100 < 0.2 and abs(r.est_b - 100) / 100 < 0.2
    assert abs(r.est_union - 150) / 150 < 0.2
    # union sketch merges by max: estimate can never fall below either side
    assert r.est_union >= max(r.est_a, r.est_b) - 1e-9
    assert r.jacc_est == pytest.approx(r.est_inter / r.est_union, abs=1e-6)


def test_logreg_quality_learns_separable_corpus(spark):
    """On a corpus where 'en' docs are stopword-dense and others have
    none, GD must beat the majority-class baseline."""
    from trading_etl_python_spark.operators.curation import logreg_quality

    rows = []
    for i in range(40):
        rows.append((i, "the a of and to in is the of and the is to", "en"))
    for i in range(40, 100):
        rows.append((i, "tabla fila datos consulta flujo lote ventana", "es"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    r = logreg_quality(docs, "en", iters=10, lr=2.0).collect()[0]
    assert r.n_docs == 100
    assert r.n_correct > 60  # majority baseline = 60
    assert r.accuracy == pytest.approx(r.n_correct / 100.0, abs=1e-6)
    assert r.w_stop > 0  # stopword density must carry positive weight


def test_gopher_rules_integer_gates(spark):
    from trading_etl_python_spark.operators.text import gopher_rules

    docs = spark.createDataFrame(
        [
            (1, " ".join(["the word fine is a stop"] * 5)),       # 30 toks, stopworded -> keep
            (2, "the a of and to"),                                # 5 toks -> r_len fails
            (3, " ".join(["supercalifragilistic"] * 25)),          # wlen 20 -> r_wlen fails
            (4, " ".join(["the a"] * 10 + ["1 2 3 4 5 6 7 8 9"] * 4)),  # digits -> r_alpha fails
            (5, " ".join(["data table spark rows cols"] * 5)),     # no stopwords -> r_stop fails
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in gopher_rules(docs).collect()}
    assert out[1].keep
    assert not out[2].r_len and not out[2].keep
    assert not out[3].r_wlen and not out[3].keep
    assert not out[4].r_alpha and not out[4].keep
    assert not out[5].r_stop and not out[5].keep


def test_pit_state_by_day_picks_covering_version(spark):
    from trading_etl_python_spark.operators.relational import pit_state_by_day

    rows = [
        (1, "2024-01-01 09:00:00", 1, "trial"),
        (1, "2024-01-02 10:00:00", 2, "paid"),     # change on day 2
        (1, "2024-01-02 15:00:00", 3, "paid"),     # no change
        (1, "2024-01-04 09:00:00", 4, "churned"),  # change on day 4
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts string, event_id long, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {(r.user_id, str(r.day)[:10]): (r.state, r.version)
           for r in pit_state_by_day(ev).collect()}
    # end of day 1: still trial (v1); end of day 2: paid (v2);
    # end of day 4: churned (v3).  Day 3 has no events -> no probe row.
    assert out[(1, "2024-01-01")] == ("trial", 1)
    assert out[(1, "2024-01-02")] == ("paid", 2)
    assert out[(1, "2024-01-04")] == ("churned", 3)
    assert len(out) == 3


def test_ewma_fold_day_grid_stays_bounded(spark, sf_dir):
    """r14 (r13 VERDICT #7): EWMA_FOLD's running collect_list prefix
    arrays hold O(D^2) doubles per symbol across the window buffer,
    where D = day-grid depth (distinct trading days per symbol).  D is
    SPAN-bound (calendar length of the events window), never SF-bound —
    more data at the same span only widens the per-day average.  Pin
    the corpus far inside the comfort zone: at D=1000 the per-symbol
    prefix state is ~4 MB (tolerable), beyond that q_ewma_vol's Arrow
    kernel is the right shape and the fold should be re-pointed at it."""
    from pyspark.sql import functions as F

    from trading_etl_python_spark.sources.tables import load_events

    ev = load_events(spark, sf_dir)
    d = (
        ev.where("value IS NOT NULL")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
        .groupBy("user_id")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert d <= 64, f"day grid depth {d} outgrew the O(D^2) fold comfort zone"
