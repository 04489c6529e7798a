"""Semantic tests for x_clustering_coef and x_assortativity (round-6
batch 45). test_oracle.py proves Spark == DuckDB; these replay in
python and check the defining identities: clustering matches a brute
common-neighbor count per node (and 3·triangle-total equals the corner
credits); assortativity matches the textbook Pearson over edge
endpoint degrees and is symmetric by construction.
"""

from __future__ import annotations

import math
from collections import defaultdict

from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.registry import queries


def _adj(spark, min_support=1):
    rows = (
        load(spark, SF_SMALL, "lineitem")
        .select("l_orderkey", "l_partkey")
        .collect()
    )
    orders = defaultdict(set)
    for r in rows:
        orders[r["l_orderkey"]].add(r["l_partkey"])
    w = defaultdict(int)
    for parts in orders.values():
        for a in parts:
            for b in parts:
                if a != b:
                    w[(a, b)] += 1
    adj = defaultdict(set)
    for (a, b), c in w.items():
        if c >= min_support:
            adj[a].add(b)
    return adj


def test_clustering_coef_replay(spark):
    from googleanalytics_etl_spark.ops.round6as import _CC_SUPPORT

    adj = _adj(spark, min_support=_CC_SUPPORT)
    got = {r["part"]: r for r in
           queries()["x_clustering_coef"](spark, SF_SMALL).collect()}
    assert set(got) == set(adj)
    total_credit = 0
    for v, nbrs in adj.items():
        d = len(nbrs)
        t = 0
        ns = sorted(nbrs)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                if ns[j] in adj[ns[i]]:
                    t += 1
        g = got[v]
        assert g["degree"] == d
        assert g["triangles"] == t
        expect = round(2.0 * t / (d * (d - 1)), 6) if d >= 2 else 0.0
        assert abs(g["clustering"] - expect) < 1e-9
        assert 0.0 <= g["clustering"] <= 1.0
        total_credit += t
    # corner credits sum to 3x the global triangle count
    assert total_credit % 3 == 0


def test_assortativity_replay(spark):
    adj = _adj(spark)
    deg = {v: len(n) for v, n in adj.items()}
    xs, ys = [], []
    for u, nbrs in adj.items():
        for v in nbrs:
            xs.append(deg[u])
            ys.append(deg[v])
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    r = (n * sxy - sx * sy) / (
        math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
    )
    got = queries()["x_assortativity"](spark, SF_SMALL).collect()[0]
    assert got["n_edges"] == n
    assert abs(got["assortativity"] - round(r, 6)) < 1e-6
    assert -1.0 <= got["assortativity"] <= 1.0
    # directed-both-ways edge list makes the estimator exactly
    # symmetric: swapping x and y gives the same sums
    assert sx == sy and sxx == syy
