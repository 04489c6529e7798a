"""Semantic tests for q_fn_regex and q_session_window_tvf (round-6
batch 38). test_oracle.py proves Spark == DuckDB; these replay in
python and check the defining identities: regex outputs match Python's
re on every row; TVF sessions partition the event log, respect the
gap rule, and reconcile with the manual sessionizer everywhere except
the documented exact-boundary case.
"""

from __future__ import annotations

import re
from collections import defaultdict
from datetime import timedelta

from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.registry import queries


def test_fn_regex_replay(spark):
    rows = load(spark, SF_SMALL, "events").select("event_id", "props").collect()
    props = {r["event_id"]: r["props"] for r in rows}
    got = queries()["q_fn_regex"](spark, SF_SMALL).collect()
    assert len(got) == len(rows)
    for g in got:
        p = props[g["event_id"]]
        m = re.search(r"(\d+)", p)
        assert g["k_val"] == int(m.group(1))
        assert g["masked"] == re.sub(r"\d+", "#", p)
        assert g["n_nums"] == len(re.findall(r"\d+", p))
        assert g["wellformed"] == (
            1 if re.search(r'^\{"k": \d+\}$', p) else 0
        )


def test_session_window_tvf_replay(spark):
    rows = (
        load(spark, SF_SMALL, "events")
        .select("user_id", "ts", "event_type")
        .collect()
    )
    streams = defaultdict(list)
    for r in rows:
        streams[r["user_id"]].append((r["ts"], r["event_type"]))
    gap = timedelta(minutes=30)
    sessions = []
    for u, evs in streams.items():
        evs.sort()
        cur = []
        for ts, et in evs:
            # TVF rule: gap of EXACTLY the timeout closes the session
            if cur and ts - cur[-1][0] >= gap:
                sessions.append((u, cur))
                cur = []
            cur.append((ts, et))
        if cur:
            sessions.append((u, cur))
    expect = {
        (u, evs[0][0]): (
            evs[-1][0] + gap,
            len(evs),
            sum(1 for _, et in evs if et == "purchase"),
        )
        for u, evs in sessions
    }
    got = queries()["q_session_window_tvf"](spark, SF_SMALL).collect()
    assert len(got) == len(expect)
    for g in got:
        end, n, conv = expect[(g["user_id"], g["sess_start"])]
        assert g["sess_end"] == end
        assert g["n_events"] == n
        assert g["n_purchases"] == conv
    # sessions partition the log
    assert sum(g["n_events"] for g in got) == len(rows)


def test_session_window_tvf_vs_manual(spark):
    """The TVF and the manual sessionizer agree on session COUNT
    whenever no inter-event gap is exactly 30 minutes (true for the
    random-microsecond fixture) — the documented boundary is the only
    divergence."""
    tvf = queries()["q_session_window_tvf"](spark, SF_SMALL)
    manual = (
        queries()["q_sessionize"](spark, SF_SMALL)
        .select("user_id", "session_id")
        .distinct()
    )
    assert tvf.count() == manual.count()
