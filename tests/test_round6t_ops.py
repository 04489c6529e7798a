"""Semantic tests for x_kaplan_meier and x_cusum_changepoint (round-6
batch 20). test_oracle.py proves Spark == DuckDB; these replay the
estimators in python and check the defining invariants (KM at-risk
accounting + monotone survival; CUSUM telescoping + argmax).
"""

from __future__ import annotations

import math
from collections import defaultdict

from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.ops.round6t import _KM_WEEK
from googleanalytics_etl_spark.registry import queries


def _km_replay(spark):
    rows = (
        load(spark, SF_SMALL, "orders")
        .select("o_custkey", "o_orderdate")
        .collect()
    )
    by_cust = defaultdict(list)
    dend = max(r["o_orderdate"] for r in rows)
    for r in rows:
        by_cust[r["o_custkey"]].append(r["o_orderdate"])
    usr = []
    for days in by_cust.values():
        d0 = min(days)
        later = [d for d in days if d > d0]
        if later:
            usr.append(((min(later) - d0).days // _KM_WEEK, 1))
        else:
            usr.append(((dend - d0).days // _KM_WEEK, 0))
    return usr


def test_km_at_risk_accounting(spark):
    """n_risk(t) = # subjects with duration >= t, d/m match the
    replay, and n_risk telescopes: n_risk(t_next) = n_risk(t) - m(t)."""
    usr = _km_replay(spark)
    rows = queries()["x_kaplan_meier"](spark, SF_SMALL).collect()
    agg = defaultdict(lambda: [0, 0])
    for dur, ev in usr:
        agg[dur][0] += ev
        agg[dur][1] += 1
    assert [r["duration"] for r in rows] == sorted(agg)
    for r in rows:
        d, m = agg[r["duration"]]
        assert (r["d_event"], r["m_total"]) == (d, m)
        assert r["n_risk"] == sum(
            mm for du, (_, mm) in agg.items() if du >= r["duration"]
        )
    for a, b in zip(rows, rows[1:]):
        assert b["n_risk"] == a["n_risk"] - a["m_total"]


def test_km_log_survival_monotone_and_exact(spark):
    """log S(t) is non-increasing and matches the quantized-ln replay
    to 1e-6; terminal d=n row reports NULL (survival exactly 0)."""
    rows = queries()["x_kaplan_meier"](spark, SF_SMALL).collect()
    prev = 0.0
    acc = 0.0
    for r in rows:
        assert 0.0 < r["hazard"] <= 1.0
        if r["d_event"] == r["n_risk"]:
            assert r["log_surv"] is None
            continue
        term = math.log(1.0 - r["d_event"] / r["n_risk"])
        acc += round(term, 8)
        assert abs(r["log_surv"] - acc) < 2e-6
        assert r["log_surv"] <= prev + 1e-9
        prev = r["log_surv"]


def test_cusum_telescopes_to_zero_and_flags_unique_peak(spark):
    """S*_last = n·Σx − n·Σx = 0 by construction; exactly one row is
    flagged and it attains the max |S*|."""
    rows = queries()["x_cusum_changepoint"](spark, SF_SMALL).collect()
    assert rows[-1]["s_scaled"] == 0
    flagged = [r for r in rows if r["is_cp"] == 1]
    assert len(flagged) == 1
    ma = max(abs(r["s_scaled"]) for r in rows)
    assert abs(flagged[0]["s_scaled"]) == ma
    # earliest argmax convention
    first_attain = next(r for r in rows if abs(r["s_scaled"]) == ma)
    assert first_attain["day"] == flagged[0]["day"]


def test_cusum_replay_exact(spark):
    """Integer replay: s_scaled matches Σ(n·x_i) − t·Σx exactly."""
    ev = (
        load(spark, SF_SMALL, "events")
        .selectExpr(
            "to_date(ts) AS day",
            "CAST(ROUND(value * 100) AS LONG) AS cents",
        )
        .collect()
    )
    daily = defaultdict(int)
    for r in ev:
        daily[r["day"]] += r["cents"]
    days = sorted(daily)
    nd, total = len(days), sum(daily.values())
    s = 0
    expect = {}
    for d in days:
        s += nd * daily[d] - total
        expect[d] = (daily[d], s)
    rows = queries()["x_cusum_changepoint"](spark, SF_SMALL).collect()
    assert len(rows) == nd
    for r in rows:
        c, s_exp = expect[r["day"]]
        assert (r["day_cents"], r["s_scaled"]) == (c, s_exp)
