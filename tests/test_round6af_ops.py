"""Semantic tests for x_growth_accounting and x_outlier_iqr (round-6
batch 32). test_oracle.py proves Spark == DuckDB; these replay in
python and check the defining identities: the growth-accounting
partition (active = new + retained + resurrected; churn balances
week-over-week actives) and the Tukey boxplot rule against a brute
quartile scan.
"""

from __future__ import annotations

from collections import defaultdict
from datetime import timedelta

from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.registry import queries


def _user_weeks(spark):
    rows = (
        load(spark, SF_SMALL, "events").select("user_id", "ts").collect()
    )
    uw = defaultdict(set)
    for r in rows:
        ts = r["ts"]
        week = (ts - timedelta(days=ts.weekday())).replace(
            hour=0, minute=0, second=0, microsecond=0
        )
        uw[r["user_id"]].add(week)
    return uw


def test_growth_accounting_replay(spark):
    uw = _user_weeks(spark)
    status = defaultdict(lambda: defaultdict(int))
    churn = defaultdict(int)
    max_week = max(w for ws in uw.values() for w in ws)
    for weeks in uw.values():
        ordered = sorted(weeks)
        for i, w in enumerate(ordered):
            if i == 0:
                status[w]["new"] += 1
            elif ordered[i - 1] == w - timedelta(days=7):
                status[w]["retained"] += 1
            else:
                status[w]["resurrected"] += 1
            nxt = ordered[i + 1] if i + 1 < len(ordered) else None
            churn_week = w + timedelta(days=7)
            if (nxt is None or nxt > churn_week) and churn_week <= max_week:
                churn[churn_week] += 1
    got = queries()["x_growth_accounting"](spark, SF_SMALL).collect()
    assert len(got) == len(status)
    for g in got:
        w = g["week"]
        s = status[w]
        assert g["n_new"] == s["new"]
        assert g["n_retained"] == s["retained"]
        assert g["n_resurrected"] == s["resurrected"]
        assert g["n_churned"] == churn.get(w, 0)
        # the growth-accounting identity
        assert g["n_active"] == g["n_new"] + g["n_retained"] + g["n_resurrected"]


def test_growth_accounting_balances(spark):
    """active(w) = active(w-1) + new(w) + resurrected(w) - churned(w):
    the week-over-week balance every growth dashboard asserts."""
    got = sorted(
        queries()["x_growth_accounting"](spark, SF_SMALL).collect(),
        key=lambda r: r["week"],
    )
    for prev, cur in zip(got, got[1:]):
        if cur["week"] - prev["week"] != timedelta(days=7):
            continue  # balance only holds across consecutive weeks
        assert (
            cur["n_active"]
            == prev["n_active"]
            + cur["n_new"]
            + cur["n_resurrected"]
            - cur["n_churned"]
        )


def test_outlier_iqr_replay(spark):
    rows = (
        load(spark, SF_SMALL, "events")
        .select("event_type", "event_id", "value")
        .collect()
    )
    by_type = defaultdict(list)
    for r in rows:
        by_type[r["event_type"]].append((r["value"], r["event_id"]))
    got = queries()["x_outlier_iqr"](spark, SF_SMALL).collect()
    assert len(got) == len(by_type)
    import math

    for g in got:
        vals = sorted(by_type[g["event_type"]])
        n = len(vals)
        q1 = vals[math.ceil(0.25 * n) - 1][0]
        q3 = vals[math.ceil(0.75 * n) - 1][0]
        lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
        assert g["n"] == n
        assert g["q1"] == q1
        assert g["q3"] == q3
        assert abs(g["fence_lo"] - round(lo, 6)) < 1e-9
        assert abs(g["fence_hi"] - round(hi, 6)) < 1e-9
        n_below = sum(1 for v, _ in vals if v < lo)
        n_above = sum(1 for v, _ in vals if v > hi)
        assert g["n_below"] == n_below
        assert g["n_above"] == n_above
        assert abs(
            g["outlier_rate"] - round((n_below + n_above) / n, 6)
        ) < 1e-9
        # fences bracket the quartiles
        assert g["fence_lo"] <= g["q1"] <= g["q3"] <= g["fence_hi"]
