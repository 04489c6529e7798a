"""Semantic tests for x_sequence_mining and x_graph_2hop (round-6
batch 31). test_oracle.py proves Spark == DuckDB; these replay in
python and check the defining identities: pattern counts equal a
brute-force skip-gram scan of each user's ordered stream; 2-hop reach
equals a brute BFS over the capped adjacency.
"""

from __future__ import annotations

from collections import defaultdict

from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.ops.round6ae import _HOP_CAP, _SEQ_GAP
from googleanalytics_etl_spark.registry import queries


def test_sequence_mining_replay(spark):
    rows = (
        load(spark, SF_SMALL, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    streams = defaultdict(list)
    for r in rows:
        streams[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    occ = defaultdict(int)
    gaps = defaultdict(int)
    users = defaultdict(set)
    for u, evs in streams.items():
        evs.sort()
        types = [t for _, _, t in evs]
        for i, a in enumerate(types):
            for k in range(1, _SEQ_GAP + 1):
                if i + k < len(types):
                    key = (a, types[i + k])
                    occ[key] += 1
                    gaps[key] += k
                    users[key].add(u)
    got = queries()["x_sequence_mining"](spark, SF_SMALL).collect()
    assert len(got) == len(occ)
    for g in got:
        key = (g["antecedent"], g["consequent"])
        assert g["n_occurrences"] == occ[key]
        assert g["n_users"] == len(users[key])
        assert abs(g["mean_gap"] - round(gaps[key] / occ[key], 6)) < 1e-9
        assert 1.0 <= g["mean_gap"] <= _SEQ_GAP


def test_sequence_mining_superset_of_adjacent_transitions(spark):
    """Every adjacent (gap=1) transition is contained in the skip-gram
    counts: n_occurrences >= the pure lead-1 count for that pair."""
    rows = (
        load(spark, SF_SMALL, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    streams = defaultdict(list)
    for r in rows:
        streams[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    adj = defaultdict(int)
    for evs in streams.values():
        evs.sort()
        types = [t for _, _, t in evs]
        for a, b in zip(types, types[1:]):
            adj[(a, b)] += 1
    got = {
        (g["antecedent"], g["consequent"]): g
        for g in queries()["x_sequence_mining"](spark, SF_SMALL).collect()
    }
    for key, n in adj.items():
        assert got[key]["n_occurrences"] >= n


def _capped_adjacency(rows):
    orders = defaultdict(set)
    for r in rows:
        orders[r["l_orderkey"]].add(r["l_partkey"])
    adj = defaultdict(set)
    for parts in orders.values():
        for a in parts:
            for b in parts:
                if a != b:
                    adj[a].add(b)
    return {s: sorted(d)[:_HOP_CAP] for s, d in adj.items()}


def test_graph_2hop_replay(spark):
    rows = (
        load(spark, SF_SMALL, "lineitem")
        .select("l_orderkey", "l_partkey")
        .collect()
    )
    capped = _capped_adjacency(rows)
    got = queries()["x_graph_2hop"](spark, SF_SMALL).collect()
    assert len(got) == len(capped)
    for g in got:
        p = g["part"]
        nbrs = capped[p]
        assert g["n_1hop"] == len(nbrs)
        two = set()
        for m in nbrs:
            two.update(capped.get(m, []))
        two.discard(p)
        two.difference_update(nbrs)
        assert g["n_2hop"] == len(two)
        # reach is bounded by the cap squared
        assert g["n_2hop"] <= _HOP_CAP * _HOP_CAP
