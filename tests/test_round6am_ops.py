"""Semantic tests for x_ri_audit and x_scd2_snapshot (round-6 batch
39). test_oracle.py proves Spark == DuckDB; these replay in python and
check the defining identities: RI violation counts match brute set
arithmetic (and the TPC-H fixture is referentially clean on the
fact→parent edges); the snapshot agrees with walking each user's
history to the instant, and features never see post-snapshot data.
"""

from __future__ import annotations

from collections import defaultdict
from datetime import datetime

from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.ops.round6am import _SNAP_TS
from googleanalytics_etl_spark.registry import queries


def test_ri_audit_replay(spark):
    li = load(spark, SF_SMALL, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    ).collect()
    orders = load(spark, SF_SMALL, "orders").select(
        "o_orderkey", "o_custkey"
    ).collect()
    cust = {r["c_custkey"] for r in load(spark, SF_SMALL, "customer").collect()}
    parts = {r["p_partkey"] for r in load(spark, SF_SMALL, "part").collect()}
    supps = {r["s_suppkey"] for r in load(spark, SF_SMALL, "supplier").collect()}
    okeys = {r["o_orderkey"] for r in orders}
    li_orders = {r["l_orderkey"] for r in li}
    custs_with_orders = {r["o_custkey"] for r in orders}
    expect = {
        "lineitem_orphan_order": (
            sum(1 for r in li if r["l_orderkey"] not in okeys),
            len(li),
        ),
        "order_no_lineitems": (
            sum(1 for r in orders if r["o_orderkey"] not in li_orders),
            len(orders),
        ),
        "order_orphan_customer": (
            sum(1 for r in orders if r["o_custkey"] not in cust),
            len(orders),
        ),
        "lineitem_orphan_part": (
            sum(1 for r in li if r["l_partkey"] not in parts),
            len(li),
        ),
        "lineitem_orphan_supplier": (
            sum(1 for r in li if r["l_suppkey"] not in supps),
            len(li),
        ),
        "customer_no_orders": (
            sum(1 for c in cust if c not in custs_with_orders),
            len(cust),
        ),
    }
    got = queries()["x_ri_audit"](spark, SF_SMALL).collect()
    assert len(got) == len(expect)
    for g in got:
        v, n = expect[g["check_name"]]
        assert g["n_violations"] == v
        assert g["n_checked"] == n
    # fixture sanity: fact→parent edges are clean in TPC-H-shaped data
    by = {g["check_name"]: g for g in got}
    assert by["lineitem_orphan_order"]["n_violations"] == 0
    assert by["order_orphan_customer"]["n_violations"] == 0


def test_scd2_snapshot_replay(spark):
    rows = (
        load(spark, SF_SMALL, "events")
        .select("event_id", "ts", "user_id", "event_type")
        .collect()
    )
    t = datetime.fromisoformat(_SNAP_TS)
    streams = defaultdict(list)
    for r in rows:
        streams[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    expect = {}
    for u, evs in streams.items():
        evs.sort()
        # walk runs of equal state; find the run covering t
        version = 0
        state = None
        state_at = None
        version_at = None
        for ts, _, et in evs:
            if state is None or et != state:
                version += 1
                state = et
            if ts <= t:
                state_at, version_at = state, version
        if state_at is None:
            continue  # user's history starts after the snapshot
        later = sum(
            1 for ts, _, et in evs if ts >= t and et == "purchase"
        )
        expect[u] = (version_at, state_at, later)
    got = queries()["x_scd2_snapshot"](spark, SF_SMALL).collect()
    assert len(got) == len(expect)
    for g in got:
        v, s, later = expect[g["user_id"]]
        assert g["version_at"] == v
        assert g["state_at"] == s
        assert g["later_purchases"] == later


def test_scd2_snapshot_no_future_state(spark):
    """Point-in-time correctness: a user's snapshot version never
    exceeds the number of state runs that STARTED at or before the
    snapshot — the current-row-join leak would violate this."""
    hist = queries()["x_scd2"](spark, SF_SMALL).collect()
    t = datetime.fromisoformat(_SNAP_TS)
    max_version_before = defaultdict(int)
    for h in hist:
        if h["valid_from"] <= t:
            max_version_before[h["user_id"]] = max(
                max_version_before[h["user_id"]], h["version"]
            )
    got = queries()["x_scd2_snapshot"](spark, SF_SMALL).collect()
    for g in got:
        assert g["version_at"] <= max_version_before[g["user_id"]]
