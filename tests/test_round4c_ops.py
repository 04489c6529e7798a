"""Round-4 batch-3 operators: triangle counting, moving median, MAD
outliers — each checked against an independent Python recount (the
differential harness already proves cross-engine agreement; these prove
the shared construction is the TRUE statistic)."""

from __future__ import annotations

import statistics
from itertools import combinations

import numpy as np
import pytest
from conftest import SF_SMALL

from pyspark.sql import functions as F

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.registry import queries


def test_triangles_match_bruteforce(spark):
    row = queries()["x_graph_triangles"](spark, SF_SMALL).collect()[0]
    li = load(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_partkey").collect()
    by_order: dict[int, set[int]] = {}
    for r in li:
        by_order.setdefault(r["l_orderkey"], set()).add(r["l_partkey"])
    support: dict[tuple[int, int], int] = {}
    for parts in by_order.values():
        for a, b in combinations(sorted(parts), 2):
            support[(a, b)] = support.get((a, b), 0) + 1
    edges = {e for e, c in support.items() if c >= 2}
    nodes = {p for e in edges for p in e}
    adj: dict[int, set[int]] = {p: set() for p in nodes}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    # brute force: count triangles once via sorted triple
    tri = sum(
        1
        for a, b in edges
        for c in (adj[a] & adj[b])
        if b < c  # a < b < c exactly once
    )
    wedges = sum(len(v) * (len(v) - 1) // 2 for v in adj.values())
    assert row["n_nodes"] == len(nodes)
    assert row["n_edges"] == len(edges)
    assert row["n_wedges"] == wedges
    assert row["n_triangles"] == tri
    assert row["clustering_coeff"] == pytest.approx(3 * tri / wedges)


def test_moving_median_matches_python(spark):
    rows = sorted(
        queries()["q_moving_median"](spark, SF_SMALL).collect(),
        key=lambda r: r["day"],
    )
    cents = [round(r["revenue"] * 100) for r in rows]
    for i, r in enumerate(rows):
        frame = cents[max(0, i - 6) : i + 1]
        want = statistics.median(frame) / 100
        assert r["med7"] == pytest.approx(want, abs=1e-9), f"row {i}"


def test_anomaly_mad_matches_numpy(spark):
    got = {r["event_type"]: r for r in queries()["x_anomaly_mad"](spark, SF_SMALL).collect()}
    e = load(spark, SF_SMALL, "events").select("event_type", "value").collect()
    by_type: dict[str, list[float]] = {}
    for r in e:
        by_type.setdefault(r["event_type"], []).append(r["value"])
    assert set(got) == set(by_type)
    for t, vals in by_type.items():
        v = np.array(vals)
        med = float(np.median(v))
        adev = np.abs(v - med)
        mad = float(np.median(adev))
        n_out = int((adev > 3 * 1.4826 * mad).sum())
        assert got[t]["med"] == pytest.approx(med, abs=1e-4)
        assert got[t]["mad"] == pytest.approx(mad, abs=1e-4)
        assert got[t]["n_outliers"] == n_out
        assert got[t]["n_rows"] == len(vals)
    # a heavy-tailed type should flag some outliers somewhere
    assert any(r["n_outliers"] > 0 for r in got.values())
