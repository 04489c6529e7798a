"""Semantic tests for round-7 batch 5 (power/MDE planning, Wilson CIs,
seasonal decomposition, gains table). test_oracle.py proves Spark ==
DuckDB; these check the textbook identities and invariants.
"""

from __future__ import annotations

import math

from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.registry import queries

_Z_A = 1.959963984540054
_Z_B = 0.8416212335729143


def test_power_mde_replay(spark):
    row = queries()["x_ab_power_mde"](spark, SF_SMALL).collect()[0]
    vals = [
        round(r["value"] * 100)
        for r in load(spark, SF_SMALL, "events").select("value").collect()
    ]
    n = len(vals)
    s, ss = sum(vals), sum(v * v for v in vals)
    mean = float(s) / (100.0 * n)
    var = float(n * ss - s * s) / (float(n) * (n - 1) * 10000.0)
    z = _Z_A + _Z_B
    n_arm = math.ceil(2.0 * z * z * var / (0.02 * mean) ** 2)
    mde = z * math.sqrt(var) * math.sqrt(2.0 / 10000.0) / mean
    assert row["n"] == n
    assert row["mean"] == round(mean, 6)
    assert row["n_per_arm"] == n_arm
    assert row["rel_mde_at_fixed_n"] == round(mde, 6)
    # sanity: detecting a SMALLER effect needs MORE samples
    assert row["n_per_arm"] > 0 and row["rel_mde_at_fixed_n"] > 0


def test_wilson_ci_properties(spark):
    rows = queries()["x_wilson_ci"](spark, SF_SMALL).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0.0 <= r["lo"] <= r["p"] <= r["hi"] <= 1.0
        # Wilson replay
        p = r["k"] / r["n"]
        z2 = _Z_A * _Z_A
        center = p + z2 / (2.0 * r["n"])
        half = _Z_A * math.sqrt(
            p * (1 - p) / r["n"] + z2 / (4.0 * r["n"] * r["n"])
        )
        denom = 1.0 + z2 / r["n"]
        assert r["lo"] == round((center - half) / denom, 6)
        assert r["hi"] == round((center + half) / denom, 6)


def test_seasonal_decompose_reconstructs(spark):
    rows = queries()["x_seasonal_decompose"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        # additive identity at the rounding grain
        recon = r["trend"] + r["seasonal"] + r["residual"]
        assert abs(recon - r["revenue"]) < 2e-5, r
    days = {r["day"] for r in rows}
    assert len(days) == len(rows), "one row per day"


def test_gains_table_monotone_and_totals(spark):
    rows = sorted(
        queries()["x_gains_table"](spark, SF_SMALL).collect(),
        key=lambda r: r["decile"],
    )
    assert 1 <= len(rows) <= 10
    ev = load(spark, SF_SMALL, "events")
    total = ev.count()
    pos = ev.where("event_type = 'purchase'").count()
    assert sum(r["n_rows"] for r in rows) == total
    assert sum(r["n_pos"] for r in rows) == pos
    assert rows[-1]["cum_pos"] == pos
    assert abs(rows[-1]["capture"] - 1.0) < 1e-9
    # capture is nondecreasing in decile
    caps = [r["capture"] for r in rows]
    assert caps == sorted(caps)
