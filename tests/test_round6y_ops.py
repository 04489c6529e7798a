"""Semantic tests for x_hits and x_seasonal_profile (round-6 batch
25). test_oracle.py proves Spark == DuckDB; these replay the
computations in python and check the defining identities: HITS shares
match an unnormalized-integer power iteration and sum to 1; the
seasonal profile is a dense 168-cell partition of the event count
whose index averages to 1.
"""

from __future__ import annotations

from collections import Counter, defaultdict

from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.ops.flagship import GAP_MINUTES
from googleanalytics_etl_spark.registry import queries


def _edges(spark):
    """Replay sessionization + transition counting in python."""
    rows = (
        load(spark, SF_SMALL, "events")
        .select("user_id", "event_id", "ts", "event_type")
        .collect()
    )
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append(r)
    edges = Counter()
    nodes = {r["event_type"] for r in rows}
    gap = GAP_MINUTES * 60
    for evs in by_user.values():
        evs.sort(key=lambda r: (r["ts"], r["event_id"]))
        prev_ts, prev_type = None, None
        for r in evs:
            new_sess = (
                prev_ts is None
                or (r["ts"] - prev_ts).total_seconds() > gap
            )
            if not new_sess and prev_type is not None:
                edges[(prev_type, r["event_type"])] += 1
            prev_ts, prev_type = r["ts"], r["event_type"]
    return edges, nodes


def test_hits_replay(spark):
    """in/out weights and final shares match an exact-integer python
    power iteration (a1 -> h1 -> a2 -> h2, normalize once at end)."""
    edges, nodes = _edges(spark)
    a1 = Counter()
    out_w = Counter()
    for (u, v), n in edges.items():
        a1[v] += n
        out_w[u] += n
    h1 = Counter()
    for (u, v), n in edges.items():
        h1[u] += n * a1[v]
    a2 = Counter()
    for (u, v), n in edges.items():
        a2[v] += n * h1[u]
    h2 = Counter()
    for (u, v), n in edges.items():
        h2[u] += n * a2[v]
    ta = sum(a2.values())
    th = sum(h2.values())
    rows = queries()["x_hits"](spark, SF_SMALL).collect()
    assert {r["event_type"] for r in rows} == nodes
    for r in rows:
        k = r["event_type"]
        assert r["in_w"] == a1.get(k, 0)
        assert r["out_w"] == out_w.get(k, 0)
        assert abs(r["auth_share"] - a2.get(k, 0) / ta) < 1e-6
        assert abs(r["hub_share"] - h2.get(k, 0) / th) < 1e-6
    assert abs(sum(r["auth_share"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["hub_share"] for r in rows) - 1.0) < 1e-4


def test_seasonal_profile_replay(spark):
    """168 dense cells; counts partition the events; the seasonal
    index averages exactly 1 over cells when weighted by 1/168."""
    rows = load(spark, SF_SMALL, "events").select("ts").collect()
    cells = Counter()
    for r in rows:
        es = int(r["ts"].timestamp())
        cells[((es // 86400 + 4) % 7, es % 86400 // 3600)] += 1
    n = len(rows)
    got = queries()["x_seasonal_profile"](spark, SF_SMALL).collect()
    assert len(got) == 168
    assert [(r["dow"], r["hod"]) for r in got] == [
        (d, h) for d in range(7) for h in range(24)
    ]
    assert sum(r["n_events"] for r in got) == n
    for r in got:
        assert r["n_events"] == cells.get((r["dow"], r["hod"]), 0)
        assert abs(r["share"] - round(r["n_events"] / n, 6)) < 1e-9
        assert (
            abs(r["seasonal_index"] - round(r["n_events"] * 168.0 / n, 6))
            < 1e-9
        )
        if r["n_events"] == 0:
            assert r["avg_value"] is None
    idx_mean = sum(r["seasonal_index"] for r in got) / 168.0
    assert abs(idx_mean - 1.0) < 1e-4


def test_hits_authority_tracks_inflow(spark):
    """Sanity: the top-authority node is a top-2 in-weight node (one
    iteration of reinforcement cannot invert a dominant inflow on this
    small type graph)."""
    rows = queries()["x_hits"](spark, SF_SMALL).collect()
    top_auth = max(rows, key=lambda r: r["auth_share"])
    by_in = sorted(rows, key=lambda r: -r["in_w"])[:2]
    assert top_auth["event_type"] in {r["event_type"] for r in by_in}
