"""Semantic tests for x_transition_entropy and x_modularity (round-6
batch 46). test_oracle.py proves Spark == DuckDB; these replay in
python and check the defining identities: the entropies match the
textbook plug-in estimators with 0 ≤ gain ≤ H(next); modularity
contributions match brute per-community edge arithmetic and sum into
[−1, 1].
"""

from __future__ import annotations

import math
from collections import defaultdict

from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.ops.round6as import _CC_SUPPORT
from googleanalytics_etl_spark.registry import queries


def test_transition_entropy_replay(spark):
    rows = (
        load(spark, SF_SMALL, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    streams = defaultdict(list)
    for r in rows:
        streams[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    pairs = defaultdict(int)
    for evs in streams.values():
        evs.sort()
        types = [t for _, _, t in evs]
        for a, b in zip(types, types[1:]):
            pairs[(a, b)] += 1
    total = sum(pairs.values())
    n_cur = defaultdict(int)
    n_nxt = defaultdict(int)
    for (a, b), n in pairs.items():
        n_cur[a] += n
        n_nxt[b] += n
    h_next = math.log(total) - sum(n * math.log(n) for n in n_nxt.values()) / total
    h_cond = (
        sum(n * math.log(n) for n in n_cur.values())
        - sum(n * math.log(n) for n in pairs.values())
    ) / total
    got = queries()["x_transition_entropy"](spark, SF_SMALL).collect()[0]
    assert got["n_transitions"] == total
    assert abs(got["h_next"] - round(h_next, 6)) < 1e-5
    assert abs(got["h_cond"] - round(h_cond, 6)) < 1e-5
    assert abs(got["info_gain"] - round(h_next - h_cond, 6)) < 1e-5
    # information-theory bounds
    assert -1e-6 <= got["info_gain"] <= got["h_next"] + 1e-6
    assert got["h_cond"] <= got["h_next"] + 1e-6


def test_modularity_replay(spark):
    li = (
        load(spark, SF_SMALL, "lineitem")
        .select("l_orderkey", "l_partkey")
        .collect()
    )
    brand = {
        r["p_partkey"]: r["p_brand"]
        for r in load(spark, SF_SMALL, "part").collect()
    }
    orders = defaultdict(set)
    for r in li:
        orders[r["l_orderkey"]].add(r["l_partkey"])
    w = defaultdict(int)
    for parts in orders.values():
        for a in parts:
            for b in parts:
                if a != b:
                    w[(a, b)] += 1
    edges = [(a, b) for (a, b), c in w.items() if c >= _CC_SUPPORT]
    m_dir = len(edges)
    a_c = defaultdict(int)
    e_in = defaultdict(int)
    for a, b in edges:
        ca, cb = brand[a], brand[b]
        a_c[ca] += 1
        if ca == cb:
            e_in[ca] += 1
    got = queries()["x_modularity"](spark, SF_SMALL).collect()
    assert {g["community"] for g in got} == set(a_c)
    q = 0.0
    for g in got:
        c = g["community"]
        assert g["a_c"] == a_c[c]
        assert g["e_in"] == e_in.get(c, 0)
        expect = e_in.get(c, 0) / m_dir - (a_c[c] / m_dir) ** 2
        assert abs(g["q_contrib"] - round(expect, 6)) < 1e-9
        q += g["q_contrib"]
    # modularity of any partition is in [-1, 1]
    assert -1.0 <= q <= 1.0
    # degree shares partition the edge mass
    assert sum(g["a_c"] for g in got) == m_dir
