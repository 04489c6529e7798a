"""Semantic tests for x_kcore_peel (round-7 batch 6). test_oracle.py
proves Spark == DuckDB; these check the peeling invariants and replay
round 1 in python.
"""

from __future__ import annotations

from collections import defaultdict

from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.registry import queries


def _edges(spark):
    li = (
        load(spark, SF_SMALL, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    by_order = defaultdict(list)
    for r in li:
        by_order[r["l_orderkey"]].append(r["l_partkey"])
    pair_count = defaultdict(int)
    for parts in by_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pair_count[(ps[i], ps[j])] += 1
    return {p for p, c in pair_count.items() if c >= 2}


def test_kcore_shrinks_monotonically(spark):
    rows = sorted(
        queries()["x_kcore_peel"](spark, SF_SMALL).collect(),
        key=lambda r: r["round"],
    )
    assert [r["round"] for r in rows] == [0, 1, 2, 3]
    for a, b in zip(rows, rows[1:]):
        assert b["nodes"] <= a["nodes"]
        assert b["edges"] <= a["edges"]


def test_kcore_round_one_replay(spark):
    rows = {r["round"]: r for r in queries()["x_kcore_peel"](spark, SF_SMALL).collect()}
    e0 = _edges(spark)
    n0 = {x for p in e0 for x in p}
    assert rows[0]["nodes"] == len(n0)
    assert rows[0]["edges"] == len(e0)
    deg = defaultdict(int)
    for p1, p2 in e0:
        deg[p1] += 1
        deg[p2] += 1
    keep = {n for n, d in deg.items() if d >= 3}
    e1 = {(p1, p2) for p1, p2 in e0 if p1 in keep and p2 in keep}
    n1 = {x for p in e1 for x in p}
    assert rows[1]["edges"] == len(e1)
    assert rows[1]["nodes"] == len(n1)
