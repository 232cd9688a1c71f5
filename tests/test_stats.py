"""Hypothesis-test + model-eval operators (operators/stats.py):
Welch t, Mann-Whitney U, chi-square independence, PR threshold sweep —
each checked against hand-computed / scipy-free closed forms on tiny
frames where the textbook answer is known exactly."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from trading_etl_python_spark.operators import stats as ST


def _df(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def test_welch_ttest_matches_closed_form(spark):
    # group g1: A = [10, 12, 14], R = [20, 20, 26]
    rows = [
        ("g1", "A", 10.0), ("g1", "A", 12.0), ("g1", "A", 14.0),
        ("g1", "R", 20.0), ("g1", "R", 20.0), ("g1", "R", 26.0),
        ("g1", "N", 99.0),  # other flags excluded
    ]
    df = _df(spark, rows, ["grp", "l_returnflag", "l_extendedprice"])
    out = ST.welch_ttest(df, group_col="grp").collect()[0]
    assert (out.n_a, out.n_b) == (3, 3)
    mx, my = 12.0, 22.0
    vx = ((10 - 12) ** 2 + 0 + (14 - 12) ** 2) / 2  # 4
    vy = ((20 - 22) ** 2 + (20 - 22) ** 2 + (26 - 22) ** 2) / 2  # 12
    ux, uy = vx / 3, vy / 3
    t = (mx - my) / math.sqrt(ux + uy)
    dfw = (ux + uy) ** 2 / (ux * ux / 2 + uy * uy / 2)
    assert abs(out.mean_a - mx) < 1e-9 and abs(out.mean_b - my) < 1e-9
    assert abs(out.t_stat - round(t, 6)) < 1e-9
    assert abs(out.df_welch - round(dfw, 6)) < 1e-9


def test_mann_whitney_exact_u_and_ties(spark):
    # A = [1, 2, 2], R = [2, 3]: pooled ranks 1, (2+3+4)/3=3, 5
    # R_A = 1 + 3 + 3 = 7 ; U = 7 - 3*4/2 = 1
    rows = [
        ("g", "A", 1.0), ("g", "A", 2.0), ("g", "A", 2.0),
        ("g", "R", 2.0), ("g", "R", 3.0),
    ]
    df = _df(spark, rows, ["grp", "l_returnflag", "l_quantity"])
    out = ST.mann_whitney(df, group_col="grp").collect()[0]
    assert (out.n_a, out.n_b) == (3, 2)
    assert out.u_stat == 1.0
    assert abs(out.auc - round(1.0 / 6.0, 6)) < 1e-9
    # tie correction: value 2 has t=3 -> Σ(t³−t)=24
    n, na, nb = 5, 3, 2
    sig2 = na * nb / 12.0 * ((n + 1.0) - 24.0 / (n * (n - 1.0)))
    z = (1.0 - na * nb / 2.0) / math.sqrt(sig2)
    assert abs(out.z_stat - round(z, 6)) < 1e-9


def test_chi2_independent_table_is_zero(spark):
    # perfectly proportional table -> chi2 == 0 for every cell
    rows = []
    eid = 0
    for t, base in (("a", 2), ("b", 4)):
        for cohort in (0, 1, 2):
            for _ in range(base):
                rows.append((eid * 3 + cohort, t))  # user_id % 3 == cohort
                eid += 1
    df = _df(spark, rows, ["user_id", "event_type"])
    out = ST.chi2_independence(df).collect()
    assert len(out) == 6
    for r in out:
        assert r.contrib == 0.0 and r.chi2_total == 0.0
        assert r.expected == float(r.n)


def test_pr_curve_confusion_counts(spark):
    # scores 1..10, positives = scores 6..10 (perfectly separable)
    rows = [(float(i), "purchase" if i > 5 else "view") for i in range(1, 11)]
    df = _df(spark, rows, ["value", "event_type"])
    out = {r.i: r for r in ST.pr_curve(df, n_thresholds=20).collect()}
    assert len(out) == 19
    for r in out.values():
        assert r.actual_pos == 5
        assert r.tp <= r.predicted_pos
        if r.predicted_pos:
            assert abs(r.precision - round(r.tp / r.predicted_pos, 6)) < 1e-9
    # threshold grid is monotone and inside [min, max]
    thr = [out[i].threshold for i in sorted(out)]
    assert thr == sorted(thr) and thr[0] >= 1.0 and thr[-1] <= 10.0
    # at the top threshold only positives remain -> precision 1
    assert out[19].precision == 1.0 and out[19].tp == out[19].predicted_pos


def test_approx_stats_percentile_twin_matches_percentile_aggregate(spark):
    """r14: q_approx_stats replaced the single-reducer `percentile`
    aggregate with sketch-guided exact selection (bracket count +
    element_at + Percentile's own `(hi-pos)*vl + (pos-lo)*vh`
    interpolation).  Pin the twin against the original aggregate on
    the real column at sf0.001 (small-n min/max bracket path) and at
    sf0.1 (n≈600k — the sketch-bracket path), at the query's own
    4-decimal rounding."""
    from pyspark.sql import functions as F

    from trading_etl_python_spark.suite import QUERIES

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.1"):
        li = spark.read.parquet(f"{sf}/lineitem.parquet")
        ref = li.agg(
            F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(l_extendedprice, 0.95)"), 4).alias("p95"),
        ).collect()[0]
        got = QUERIES["q_approx_stats"](spark, sf).collect()[0]
        assert got["p50_price"] == ref["p50"], sf
        assert got["p95_price"] == ref["p95"], sf
