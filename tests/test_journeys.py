"""Journey/survival analytics (operators/eventflow.py: attribution,
kaplan_meier, ab_proportion_test) and the CUSUM drift kernel
(operators/recursive.cusum_rec)."""

from __future__ import annotations

import datetime

import numpy as np

from trading_etl_python_spark.operators import eventflow as EV
from trading_etl_python_spark.operators import recursive as R


def _ev(spark, rows):
    return spark.createDataFrame(rows, ["user_id", "ts", "event_id", "event_type"])


def _t(m):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=m)


def test_attribution_first_last_linear(spark):
    rows = [
        # user 1: view -> click -> purchase  (first=view, last=click, 1/2 each)
        (1, _t(0), 1, "view"), (1, _t(1), 2, "click"), (1, _t(2), 3, "purchase"),
        # user 2: click -> purchase          (first=last=click, 1.0)
        (2, _t(0), 4, "click"), (2, _t(1), 5, "purchase"),
        # user 3: never converts -> excluded
        (3, _t(0), 6, "view"),
        # user 4: post-conversion touches excluded
        (4, _t(0), 7, "view"), (4, _t(1), 8, "purchase"), (4, _t(2), 9, "click"),
    ]
    out = {r.event_type: r for r in EV.attribution(_ev(spark, rows)).collect()}
    assert out["view"].n_first == 2 and out["view"].n_last == 1
    assert out["click"].n_first == 1 and out["click"].n_last == 2
    assert abs(out["view"].linear_credit - 1.5) < 1e-6
    assert abs(out["click"].linear_credit - 1.5) < 1e-6
    assert "purchase" not in out


def test_kaplan_meier_textbook_curve(spark):
    # 4 users, durations 0,1,1,2 days; global max day = Jan 10 so all
    # ends are > 3 days before it -> nobody censored
    def u(uid, d0, d1):
        return [
            (uid, datetime.datetime(2024, 1, d0), uid * 10, "view"),
            (uid, datetime.datetime(2024, 1, d1), uid * 10 + 1, "click"),
        ]

    rows = u(1, 1, 1) + u(2, 1, 2) + u(3, 1, 2) + u(4, 1, 3)
    rows += [(9, datetime.datetime(2024, 1, 10), 99, "view")]  # pins gmax, censored
    out = {r.dur: r for r in EV.kaplan_meier(_ev(spark, rows)).collect()}
    # dur 0: risk {1,2,3,4} (+user9 dur0 censored) d=1,c=1 n=5 -> S=0.8
    assert out[0].n_risk == 5 and out[0].n_events == 1 and out[0].n_censored == 1
    assert abs(out[0].survival - 0.8) < 1e-6
    # dur 1: risk {2,3,4} d=2 -> S=0.8*(1-2/3)
    assert out[1].n_risk == 3 and abs(out[1].survival - round(0.8 / 3, 6)) < 1e-4
    # dur 2: last man dies -> exact 0
    assert out[2].survival == 0.0


def test_ab_test_counts_and_z(spark):
    rows = []
    eid = 0
    # cohort A (even ids): 3 users, 2 convert; cohort B: 3 users, 1 converts
    for uid, conv in ((2, 1), (4, 1), (6, 0), (1, 1), (3, 0), (5, 0)):
        rows.append((uid, _t(eid), eid, "view")); eid += 1
        if conv:
            rows.append((uid, _t(eid), eid, "purchase")); eid += 1
    out = EV.ab_proportion_test(_ev(spark, rows)).collect()[0]
    assert (out.n_a, out.conv_a, out.n_b, out.conv_b) == (3, 2, 3, 1)
    pa, pb, pp = 2 / 3, 1 / 3, 0.5
    z = (pa - pb) / np.sqrt(pp * 0.5 * (1 / 3 + 1 / 3))
    assert abs(out.z_stat - round(z, 6)) < 1e-6


def test_cusum_detects_level_shift():
    # flat, then sustained +2% steps: s+ ratchets up and alarms
    c = np.concatenate([np.full(10, 100.0), 100.0 * 1.02 ** np.arange(1, 11)])
    sp, sn, al = R.cusum_rec(c, k=0.05, h=0.5)
    assert (sp[:10] == 0.0).all() and (al[:10] == 0.0).all()
    assert sp[-1] > 0.5 and al[-1] == 1.0
    # symmetric: downward shift trips the negative side
    sp2, sn2, al2 = R.cusum_rec(c[::-1].copy(), k=0.05, h=0.5)
    assert sn2[-1] < -0.5 and al2[-1] == 1.0
