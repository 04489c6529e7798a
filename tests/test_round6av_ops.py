"""Semantic tests for x_simpsons_slope and x_cohens_d (round-6 batch
48). test_oracle.py proves Spark == DuckDB; these replay in python and
check the defining identities: segment and pooled slopes match
textbook OLS (and a constructed reversal dataset flags), Cohen's d
matches the pooled-SD formula and is null-consistent with the random
split.
"""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict
from decimal import Decimal

from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.registry import queries


def _q4(v):
    return float(Decimal(str(v)).quantize(Decimal("0.0001")))


def test_simpsons_slope_replay(spark):
    rows = (
        load(spark, SF_SMALL, "events")
        .select("event_type", "ts", "value")
        .collect()
    )
    seg = defaultdict(lambda: [0, 0, 0.0, 0, 0.0])  # n, sx, sy, sxx, sxy
    for r in rows:
        x = r["ts"].hour
        y = _q4(r["value"])
        a = seg[r["event_type"]]
        a[0] += 1
        a[1] += x
        a[2] += y
        a[3] += x * x
        a[4] += x * y
    def slope(a):
        n, sx, sy, sxx, sxy = a
        return (n * sxy - sx * sy) / (n * sxx - sx * sx)
    pooled = [sum(a[i] for a in seg.values()) for i in range(5)]
    got = queries()["x_simpsons_slope"](spark, SF_SMALL).collect()
    assert {g["event_type"] for g in got} == set(seg)
    for g in got:
        a = seg[g["event_type"]]
        assert g["n"] == a[0]
        assert abs(g["slope_segment"] - round(slope(a), 6)) < 1e-5
        assert abs(g["slope_pooled"] - round(slope(pooled), 6)) < 1e-5
        expect = 1 if slope(a) * slope(pooled) < 0 else 0
        assert g["sign_reversal"] == expect


def test_simpsons_reversal_property():
    """A constructed dataset where each segment slopes down but the pooled
    slope is up (classic Simpson) — the flag this op exists for
    (pure-python pin of the moment algebra)."""
    # segment 1: x in [0,1], high intercept, slope -1
    # segment 2: x in [10,11], higher values, slope -1 → pooled slope up
    pts = [(0, 10.0), (1, 9.0), (10, 30.0), (11, 29.0)]
    segs = [pts[:2], pts[2:]]
    def slope(p):
        n = len(p)
        sx = sum(x for x, _ in p)
        sy = sum(y for _, y in p)
        sxx = sum(x * x for x, _ in p)
        sxy = sum(x * y for x, y in p)
        return (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert all(slope(s) < 0 for s in segs)
    assert slope(pts) > 0


def test_cohens_d_replay(spark):
    rows = (
        load(spark, SF_SMALL, "events").select("user_id", "value").collect()
    )
    groups = defaultdict(list)
    for r in rows:
        v = (
            "A"
            if hashlib.md5(str(r["user_id"]).encode()).hexdigest()[0] < "8"
            else "B"
        )
        groups[v].append(_q4(r["value"]))
    na, nb = len(groups["A"]), len(groups["B"])
    sa, sb = sum(groups["A"]), sum(groups["B"])
    ssa = sum(v * v for v in groups["A"])
    ssb = sum(v * v for v in groups["B"])
    mean_a, mean_b = sa / na, sb / nb
    pooled_var = ((ssa - sa * sa / na) + (ssb - sb * sb / nb)) / (na + nb - 2)
    d = (mean_a - mean_b) / math.sqrt(pooled_var)
    got = queries()["x_cohens_d"](spark, SF_SMALL).collect()[0]
    assert got["n_a"] == na and got["n_b"] == nb
    assert abs(got["mean_a"] - round(mean_a, 6)) < 1e-5
    assert abs(got["mean_b"] - round(mean_b, 6)) < 1e-5
    assert abs(got["cohens_d"] - round(d, 6)) < 1e-5
    # the md5 split is random vs value: the true effect is ~0
    assert abs(got["cohens_d"]) < 0.5
