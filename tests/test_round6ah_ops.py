"""Semantic tests for x_ab_cuped and x_burst_detect (round-6 batch
34). test_oracle.py proves Spark == DuckDB; these replay in python and
check the defining identities: CUPED matches a brute per-user
adjustment (θ from textbook moments; var_ratio = 1 − ρ²; a zero-effect
split keeps A≈B ordering consistent), and burst flags match a brute
trailing-window scan.
"""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict
from datetime import datetime
from decimal import Decimal

from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.ops.round6ah import (
    _BURST_H,
    _BURST_MIN,
    _BURST_Z,
    _CUPED_SPLIT,
)
from googleanalytics_etl_spark.registry import queries


def _q4(v):
    return Decimal(str(v)).quantize(Decimal("0.0001"))


def test_ab_cuped_replay(spark):
    rows = (
        load(spark, SF_SMALL, "events")
        .select("user_id", "ts", "value")
        .collect()
    )
    split = datetime.fromisoformat(_CUPED_SPLIT)
    x = defaultdict(Decimal)
    y = defaultdict(Decimal)
    for r in rows:
        if r["ts"] < split:
            x[r["user_id"]] += _q4(r["value"])
        else:
            y[r["user_id"]] += _q4(r["value"])
    users = sorted(set(x) | set(y))
    xs = [float(x[u]) for u in users]
    ys = [float(y[u]) for u in users]
    n = len(users)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(v * v for v in xs)
    sxy = sum(a * b for a, b in zip(xs, ys))
    syy = sum(v * v for v in ys)
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    mean_x = sx / n
    var_ratio = 1.0 - (n * sxy - sx * sy) ** 2 / (
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    variants = {
        u: "A"
        if hashlib.md5(str(u).encode()).hexdigest()[0] < "8"
        else "B"
        for u in users
    }
    got = {r["variant"]: r for r in queries()["x_ab_cuped"](spark, SF_SMALL).collect()}
    assert set(got) == set(variants.values())
    for v, g in got.items():
        vu = [u for u in users if variants[u] == v]
        assert g["n_users"] == len(vu)
        mp = sum(float(x[u]) for u in vu) / len(vu)
        mq = sum(float(y[u]) for u in vu) / len(vu)
        assert abs(g["mean_pre"] - round(mp, 6)) < 1e-6
        assert abs(g["mean_post"] - round(mq, 6)) < 1e-6
        assert abs(g["mean_adj"] - round(mq - theta * (mp - mean_x), 6)) < 1e-6
        assert abs(g["theta"] - round(theta, 6)) < 1e-6
        assert abs(g["var_ratio"] - round(var_ratio, 6)) < 1e-6
    # CUPED must actually reduce variance (0 < ratio <= 1) on real data
    ratios = {g["var_ratio"] for g in got.values()}
    assert all(0.0 < r <= 1.0 for r in ratios)


def test_burst_detect_replay(spark):
    rows = (
        load(spark, SF_SMALL, "events").select("event_type", "ts").collect()
    )
    counts = defaultdict(int)
    for r in rows:
        hour = r["ts"].replace(minute=0, second=0, microsecond=0)
        counts[(r["event_type"], hour)] += 1
    epoch = datetime(2024, 1, 1)
    by_type = defaultdict(dict)
    for (et, h), c in counts.items():
        idx = int((h - epoch).total_seconds() // 3600)
        by_type[et][idx] = (h, c)
    got = queries()["x_burst_detect"](spark, SF_SMALL).collect()
    assert len(got) == len(counts)
    n_bursts = 0
    for g in got:
        et = g["event_type"]
        idx = int((g["hour"] - epoch).total_seconds() // 3600)
        assert g["cnt"] == by_type[et][idx][1]
        trail = [
            by_type[et][k][1]
            for k in range(idx - _BURST_H, idx)
            if k in by_type[et]
        ]
        assert g["base_n"] == len(trail)
        if len(trail) < _BURST_MIN:
            assert g["base_mean"] is None
            assert g["base_std"] is None
            assert g["is_burst"] == 0
            continue
        bn = len(trail)
        mean = sum(trail) / bn
        var = max(
            (bn * sum(c * c for c in trail) - sum(trail) ** 2) / (bn * bn),
            0.0,
        )
        std = math.sqrt(var)
        assert abs(g["base_mean"] - round(mean, 6)) < 1e-9
        assert abs(g["base_std"] - round(std, 6)) < 1e-9
        expect = 1 if g["cnt"] > mean + _BURST_Z * std else 0
        assert g["is_burst"] == expect
        n_bursts += expect
    # the screen abstains on cold starts but must score the bulk
    scored = sum(1 for g in got if g["base_mean"] is not None)
    assert scored > len(got) // 2
