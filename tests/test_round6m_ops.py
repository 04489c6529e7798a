"""Semantic tests for x_random_projection and x_time_to_convert
(round-6 batch 13). test_oracle.py proves Spark == DuckDB; these
replay the projection in numpy and the latency in pure Python.
"""

from __future__ import annotations

from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.ops.round6m import _RP_OUT, _rp_signs
from googleanalytics_etl_spark.registry import queries


def _round6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP))


# ---------------------------------------------------------------------------
# x_random_projection
# ---------------------------------------------------------------------------


def test_random_projection_replay(spark):
    rows = {
        r["bucket"]: r
        for r in queries()["x_random_projection"](spark, SF_SMALL).collect()
    }
    em = load(spark, SF_SMALL, "embeddings").collect()
    vecs = {
        r["vec_id"]: np.array([float(x) for x in r["embedding"]]) for r in em
    }
    signs = _rp_signs()

    def project(v):
        # left-to-right accumulation matching the engines' fold order
        ys = []
        for o in range(_RP_OUT):
            acc = 0.0
            for x, s in zip(v, signs[o]):
                acc += x * float(s)
            ys.append(round(acc / (8 ** 0.5), 6))
        return ys

    per_bucket = defaultdict(list)
    for i in sorted(vecs):
        if i + 1 not in vecs:
            continue
        a, b = vecs[i], vecs[i + 1]
        d_orig = round(float(np.sum((a - b) ** 2)), 6)
        if d_orig <= 0:
            continue
        ya, yb = project(a), project(b)
        d_proj = round(sum((p - q) * (p - q) for p, q in zip(ya, yb)), 6)
        ratio = round(d_proj / d_orig, 6)
        per_bucket[min(int(ratio * 2), 5)].append(ratio)
    assert set(rows) == set(per_bucket)
    q8 = lambda v: Decimal(repr(v)).quantize(  # noqa: E731
        Decimal("1e-8"), ROUND_HALF_UP
    )
    for bkt, ratios in per_bucket.items():
        r = rows[bkt]
        assert r["n_pairs"] == len(ratios)
        assert r["mean_ratio"] == _round6(
            float(sum(q8(x) for x in ratios)) / len(ratios)
        )
        assert r["min_ratio"] == _round6(min(ratios))
        assert r["max_ratio"] == _round6(max(ratios))


def test_random_projection_jl_concentration(spark):
    rows = queries()["x_random_projection"](spark, SF_SMALL).collect()
    n = sum(r["n_pairs"] for r in rows)
    # E[ratio] = 1 for a JL sign projection: the pair-weighted mean
    # across buckets should land near 1 (spread √(2/8) ≈ 0.5 per pair,
    # so the mean over hundreds of pairs is tight)
    mean = sum(r["mean_ratio"] * r["n_pairs"] for r in rows) / n
    assert 0.7 < mean < 1.3, mean
    for r in rows:
        assert r["min_ratio"] >= 0
        assert 0 <= r["bucket"] <= 5


def test_rp_signs_deterministic_and_balanced():
    s1, s2 = _rp_signs(), _rp_signs()
    assert s1 == s2
    flat = [x for row in s1 for x in row]
    assert set(flat) == {-1, 1}
    # md5-derived signs: roughly balanced (binomial 5σ on 512 draws)
    assert abs(sum(flat)) < 5 * (512 ** 0.5)


# ---------------------------------------------------------------------------
# x_time_to_convert
# ---------------------------------------------------------------------------


def test_time_to_convert_exact_replay(spark):
    row = queries()["x_time_to_convert"](spark, SF_SMALL).collect()[0]
    ev = (
        load(spark, SF_SMALL, "events")
        .select("user_id", "event_type", "ts")
        .collect()
    )
    first_view = {}
    for r in ev:
        if r["event_type"] == "view":
            us = int(r["ts"].timestamp() * 1_000_000)
            u = r["user_id"]
            if u not in first_view or us < first_view[u]:
                first_view[u] = us
    lat = {}
    for r in ev:
        if r["event_type"] != "purchase":
            continue
        u = r["user_id"]
        if u not in first_view:
            continue
        us = int(r["ts"].timestamp() * 1_000_000)
        if us < first_view[u]:
            continue
        s = (us - first_view[u]) // 1_000_000
        if u not in lat or s < lat[u]:
            lat[u] = s
    vals = sorted(lat.values())
    n = len(vals)
    assert row["n_converters"] == n
    assert row["min_s"] == vals[0]
    assert row["max_s"] == vals[-1]
    # exact rank selection at ceil(q·n); ties ordered by user_id do not
    # change the VALUE at a rank, so the sorted list replays it
    import math

    assert row["p50_s"] == vals[math.ceil(0.5 * n) - 1]
    assert row["p90_s"] == vals[math.ceil(0.9 * n) - 1]


def test_time_to_convert_ordering(spark):
    row = queries()["x_time_to_convert"](spark, SF_SMALL).collect()[0]
    assert (
        row["min_s"] <= row["p50_s"] <= row["p90_s"] <= row["max_s"]
    )
    assert row["n_converters"] > 0
