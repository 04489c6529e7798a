"""Semantic tests for s_late_data_audit (round-6 batch 4).

test_oracle.py proves Spark == DuckDB for the key; these prove the
watermark-accounting semantics against an independent Python replay of
the chunked arrival order.
"""

from __future__ import annotations

from collections import defaultdict
from datetime import timedelta

import pyspark.sql.functions as F
from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.registry import queries


def _events(spark):
    return (
        load(spark, SF_SMALL, "events")
        .select("event_type", F.col("ts").cast("timestamp").alias("ts"))
        .collect()
    )


def test_late_audit_python_replay(spark):
    rows = {
        r["event_type"]: r
        for r in queries()["s_late_data_audit"](spark, SF_SMALL).collect()
    }
    ev = _events(spark)
    lo = min(r["ts"] for r in ev)
    hi = max(r["ts"] for r in ev)
    replay = [
        r
        for r in ev
        if r["ts"] < lo + timedelta(hours=3)
        or r["ts"] >= hi - timedelta(minutes=30)
    ]
    # the 5 in-order chunks contribute zero late rows (every row >= the
    # prior chunks' max); the replay batch sees watermark hi - 1h
    expect = defaultdict(lambda: [0, 0])
    for r in ev:
        expect[r["event_type"]][0] += 1
    for r in replay:
        expect[r["event_type"]][0] += 1
        if r["ts"] < hi - timedelta(hours=1):
            expect[r["event_type"]][1] += 1
    assert set(rows) == set(expect)
    for et, (n, late) in expect.items():
        assert (rows[et]["n_rows"], rows[et]["n_late"]) == (n, late)
        assert rows[et]["late_share"] == round(late / n, 6)


def test_late_audit_splits_replay_tranches(spark):
    """The old tranche is ENTIRELY late, the fresh tranche entirely
    on-time — the audit's reason to exist is telling them apart."""
    rows = queries()["s_late_data_audit"](spark, SF_SMALL).collect()
    ev = _events(spark)
    lo = min(r["ts"] for r in ev)
    hi = max(r["ts"] for r in ev)
    n_old = sum(1 for r in ev if r["ts"] < lo + timedelta(hours=3))
    n_fresh = sum(
        1 for r in ev if r["ts"] >= hi - timedelta(minutes=30)
    )
    assert n_old > 0 and n_fresh > 0  # both tranches populated
    total_late = sum(r["n_late"] for r in rows)
    assert total_late == n_old  # late == old tranche, nothing more
    total_rows = sum(r["n_rows"] for r in rows)
    assert total_rows == len(ev) + n_old + n_fresh


def test_late_audit_rerun_deterministic(spark):
    a = sorted(
        map(tuple, queries()["s_late_data_audit"](spark, SF_SMALL).collect())
    )
    b = sorted(
        map(tuple, queries()["s_late_data_audit"](spark, SF_SMALL).collect())
    )
    assert a == b
