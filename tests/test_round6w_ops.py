"""Semantic tests for x_spearman_corr and x_gini_concentration
(round-6 batch 23). test_oracle.py proves Spark == DuckDB; these
replay the statistics in python and check the defining identities:
Spearman equals Pearson-on-average-ranks; Gini/HHI/top-share bounds
and a hand-verifiable two-point distribution.
"""

from __future__ import annotations

import math
from collections import defaultdict

from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.registry import queries


def _avg_ranks(xs):
    """value -> average rank (1-based, ties averaged)."""
    s = sorted(xs)
    first = {}
    for i, v in enumerate(s):
        first.setdefault(v, i + 1)
    cnt = defaultdict(int)
    for v in s:
        cnt[v] += 1
    return {v: first[v] + (cnt[v] - 1) / 2.0 for v in cnt}


def test_spearman_replay(spark):
    """rho matches Pearson on average ranks computed naively."""
    rows = load(spark, SF_SMALL, "orders").collect()
    per = defaultdict(lambda: [0, 0])
    for r in rows:
        per[r["o_custkey"]][0] += 1
        per[r["o_custkey"]][1] += round(r["o_totalprice"] * 100)
    xs = [v[0] for v in per.values()]
    ys = [v[1] for v in per.values()]
    rx = _avg_ranks(xs)
    ry = _avg_ranks(ys)
    u = [rx[x] for x in xs]
    v = [ry[y] for y in ys]
    n = len(u)
    su, sv = sum(u), sum(v)
    suu = sum(a * a for a in u)
    svv = sum(a * a for a in v)
    suv = sum(a * b for a, b in zip(u, v))
    rho = (n * suv - su * sv) / math.sqrt(
        (n * suu - su * su) * (n * svv - sv * sv)
    )
    got = queries()["x_spearman_corr"](spark, SF_SMALL).collect()[0]
    assert got["n_cust"] == n
    assert abs(got["rho"] - rho) < 1e-6
    assert -1.0 <= got["rho"] <= 1.0


def test_gini_replay(spark):
    """Gini/HHI/top-decile match a brute-force per-nation replay,
    including zero-spend customers, and respect their bounds."""
    cust = load(spark, SF_SMALL, "customer").collect()
    orders = load(spark, SF_SMALL, "orders").collect()
    spend = defaultdict(int)
    for r in orders:
        spend[r["o_custkey"]] += round(r["o_totalprice"] * 100)
    nat = {
        r["n_nationkey"]: r["n_name"]
        for r in load(spark, SF_SMALL, "nation").collect()
    }
    by_nation = defaultdict(list)
    for r in cust:
        by_nation[nat[r["c_nationkey"]]].append(
            (spend.get(r["c_custkey"], 0), r["c_custkey"])
        )
    got = {
        r["nation"]: r
        for r in queries()["x_gini_concentration"](spark, SF_SMALL).collect()
    }
    assert set(got) == set(by_nation)
    for nation, pairs in by_nation.items():
        pairs.sort()
        xs = [p[0] for p in pairs]
        n, t = len(xs), sum(xs)
        rws = sum((i + 1) * x for i, x in enumerate(xs))
        gini = (2 * rws - (n + 1) * t) / (n * t)
        hhi = sum(x * x for x in xs) / (t * t)
        k = math.ceil(n / 10)
        top = sum(xs[n - k :]) / t
        g = got[nation]
        assert g["n_cust"] == n and g["total_cents"] == t
        assert abs(g["gini"] - gini) < 1e-6
        assert abs(g["hhi"] - hhi) < 1e-6
        assert abs(g["top_decile_share"] - top) < 1e-6
        assert 0.0 <= g["gini"] < 1.0
        assert 1.0 / n <= g["hhi"] + 1e-9 <= 1.0
        assert g["top_decile_share"] >= k / n - 1e-9  # >= uniform share


def test_spearman_monotone_invariance(spark):
    """Spearman is invariant under strictly monotone transforms of
    either variable — recompute with y -> y**3 replay-side and the
    rank correlation is unchanged (defining property vs Pearson)."""
    rows = load(spark, SF_SMALL, "orders").collect()
    per = defaultdict(lambda: [0, 0])
    for r in rows:
        per[r["o_custkey"]][0] += 1
        per[r["o_custkey"]][1] += round(r["o_totalprice"] * 100)
    xs = [v[0] for v in per.values()]
    ys = [v[1] for v in per.values()]

    def rho_of(ys_t):
        rx = _avg_ranks(xs)
        ry = _avg_ranks(ys_t)
        u = [rx[x] for x in xs]
        v = [ry[y] for y in ys_t]
        n = len(u)
        su, sv = sum(u), sum(v)
        suu = sum(a * a for a in u)
        svv = sum(a * a for a in v)
        suv = sum(a * b for a, b in zip(u, v))
        return (n * suv - su * sv) / math.sqrt(
            (n * suu - su * su) * (n * svv - sv * sv)
        )

    assert abs(rho_of(ys) - rho_of([y**3 for y in ys])) < 1e-12
