"""Semantic tests for x_funnel_windowed and x_ts_features (round-6
batch 33). test_oracle.py proves Spark == DuckDB; these replay in
python and check the defining identities: windowed funnel counts match
a brute per-user chain walk and are monotone non-increasing across
stages (and ≤ the order-only funnel); ts features match a brute
calendar-window scan and never leak the current day.
"""

from __future__ import annotations

from collections import defaultdict
from datetime import timedelta
from decimal import Decimal

from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.ops.round6ag import _FW_MIN
from googleanalytics_etl_spark.registry import queries


def test_funnel_windowed_replay(spark):
    rows = (
        load(spark, SF_SMALL, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    streams = defaultdict(list)
    for r in rows:
        streams[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    win = timedelta(minutes=_FW_MIN)
    viewers, clickers, purchasers = set(), set(), set()
    for u, evs in streams.items():
        evs.sort()
        for i, (ts_v, _, et) in enumerate(evs):
            if et != "view":
                continue
            viewers.add(u)
            nc = min(
                (t for t, _, e in evs[i + 1 :] if e == "click"), default=None
            )
            if nc is None or nc > ts_v + win:
                continue
            clickers.add(u)
            # next purchase strictly after the found click
            np_ = min(
                (t for t, _, e in evs if e == "purchase" and t > nc),
                default=None,
            )
            if np_ is not None and np_ <= nc + win:
                purchasers.add(u)
    got = queries()["x_funnel_windowed"](spark, SF_SMALL).collect()[0]
    assert got["n_view_users"] == len(viewers)
    assert got["n_click_users"] == len(clickers)
    assert got["n_purchase_users"] == len(purchasers)
    # funnel monotonicity
    assert (
        got["n_view_users"] >= got["n_click_users"] >= got["n_purchase_users"]
    )


def test_funnel_windowed_tighter_than_ordered(spark):
    """The windowed funnel can only lose users vs the order-only
    funnel (q_funnel counts a click ANY time after a view)."""
    fw = queries()["x_funnel_windowed"](spark, SF_SMALL).collect()[0]
    qf = queries()["q_funnel"](spark, SF_SMALL).collect()[0]
    assert fw["n_view_users"] <= qf["n_view"]
    assert fw["n_click_users"] <= qf["n_click"]
    assert fw["n_purchase_users"] <= qf["n_purchase"]


def test_ts_features_replay(spark):
    rows = (
        load(spark, SF_SMALL, "events").select("user_id", "ts", "value").collect()
    )
    ud = defaultdict(Decimal)
    for r in rows:
        day = r["ts"].replace(hour=0, minute=0, second=0, microsecond=0)
        ud[(r["user_id"], day)] += Decimal(str(r["value"])).quantize(
            Decimal("0.0001")
        )
    got = queries()["x_ts_features"](spark, SF_SMALL).collect()
    assert len(got) == len(ud)
    by_user = defaultdict(dict)
    for (u, d), v in ud.items():
        by_user[u][d] = v
    for g in got:
        u, d = g["user_id"], g["day"]
        days = by_user[u]
        assert abs(g["value"] - float(days[d])) < 1e-9
        lag1 = days.get(d - timedelta(days=1), Decimal(0))
        assert abs(g["lag1"] - float(lag1)) < 1e-9
        trail = [
            days[d - timedelta(days=k)]
            for k in range(1, 8)
            if d - timedelta(days=k) in days
        ]
        assert g["active7"] == len(trail)
        avg7 = float(sum(trail)) / max(len(trail), 1)
        assert abs(g["avg7"] - round(avg7, 6)) < 1e-9
        assert abs(g["delta"] - float(days[d] - lag1)) < 1e-9


def test_ts_features_no_leakage(spark):
    """Trailing features never include the current day: on a user's
    FIRST day lag1 = 0, active7 = 0, avg7 = 0 regardless of value."""
    got = queries()["x_ts_features"](spark, SF_SMALL).collect()
    first = {}
    for g in got:
        u = g["user_id"]
        if u not in first or g["day"] < first[u]["day"]:
            first[u] = g
    for g in first.values():
        assert g["lag1"] == 0.0
        assert g["active7"] == 0
        assert g["avg7"] == 0.0
