"""Semantic tests for x_privacy_kanon and x_churn_label (round-6
batch 15). test_oracle.py proves Spark == DuckDB; these replay the
class census and label rule in pure Python.
"""

from __future__ import annotations

import json
from collections import defaultdict

from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.ops.round6o import _CHURN_DAYS, _KANON_K
from googleanalytics_etl_spark.registry import queries


def _events(spark):
    return (
        load(spark, SF_SMALL, "events")
        .select("user_id", "event_type", "ts", "props")
        .collect()
    )


# ---------------------------------------------------------------------------
# x_privacy_kanon
# ---------------------------------------------------------------------------


def test_kanon_exact_replay(spark):
    rows = {
        r["bucket"]: r
        for r in queries()["x_privacy_kanon"](spark, SF_SMALL).collect()
    }
    classes = defaultdict(lambda: [set(), 0])
    for r in _events(spark):
        k_band = json.loads(r["props"])["k"] // 10
        key = (r["event_type"], r["ts"].date(), k_band)
        classes[key][0].add(r["user_id"])
        classes[key][1] += 1
    buckets = defaultdict(lambda: [0, 0, 0])
    for users, n_rows in classes.values():
        cu = len(users)
        b = 0 if cu == 1 else (1 if cu < _KANON_K else (2 if cu < 10 else 3))
        buckets[b][0] += 1
        buckets[b][1] += cu
        buckets[b][2] += n_rows
    assert set(rows) == set(buckets)
    for b, (nc, nu, nr) in buckets.items():
        r = rows[b]
        assert (r["n_classes"], r["n_users"], r["n_rows"]) == (nc, nu, nr)
        assert r["at_risk"] == (1 if b <= 1 else 0)


def test_kanon_risk_partition(spark):
    rows = queries()["x_privacy_kanon"](spark, SF_SMALL).collect()
    # several size bands exist; risky mass is nonzero (at the tiny test
    # SF every class can be sub-k, so risky == total is legitimate —
    # sf0.01 populates all four bands, checked by the driver oracle)
    assert len(rows) >= 2
    risky = sum(r["n_rows"] for r in rows if r["at_risk"] == 1)
    total = sum(r["n_rows"] for r in rows)
    assert 0 < risky <= total


# ---------------------------------------------------------------------------
# x_churn_label
# ---------------------------------------------------------------------------


def test_churn_label_exact_replay(spark):
    rows = {
        r["user_id"]: r
        for r in queries()["x_churn_label"](spark, SF_SMALL).collect()
    }
    ev = _events(spark)
    horizon = max(r["ts"].date() for r in ev)
    per_user = defaultdict(lambda: [0, 0, set(), None])
    for r in ev:
        d = per_user[r["user_id"]]
        d[0] += 1
        d[1] += r["event_type"] == "purchase"
        day = r["ts"].date()
        d[2].add(day)
        d[3] = day if d[3] is None or day > d[3] else d[3]
    assert set(rows) == set(per_user)
    for u, (n, np_, days, last) in per_user.items():
        r = rows[u]
        rec = (horizon - last).days
        assert r["n_events"] == n
        assert r["n_purchases"] == np_
        assert r["active_days"] == len(days)
        assert r["recency_days"] == rec
        assert r["churned"] == (1 if rec > _CHURN_DAYS else 0)


def test_churn_label_has_both_classes(spark):
    rows = queries()["x_churn_label"](spark, SF_SMALL).collect()
    labels = {r["churned"] for r in rows}
    assert labels == {0, 1}, "label must discriminate"
    for r in rows:
        assert r["recency_days"] >= 0
        assert r["active_days"] <= r["n_events"]
