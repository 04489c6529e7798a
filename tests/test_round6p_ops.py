"""Semantic tests for x_chi2_independence and x_ab_srm_check (round-6
batch 16). test_oracle.py proves Spark == DuckDB; these replay both
statistics in pure Python.
"""

from __future__ import annotations

import math
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.registry import queries


def _round6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP))


def test_chi2_exact_replay(spark):
    row = queries()["x_chi2_independence"](spark, SF_SMALL).collect()[0]
    ev = load(spark, SF_SMALL, "events").select("event_type", "ts").collect()
    cells = Counter((r["event_type"], r["ts"].date().weekday()) for r in ev)
    row_tot = Counter()
    col_tot = Counter()
    for (t, d), o in cells.items():
        row_tot[t] += o
        col_tot[d] += o
    n = sum(cells.values())
    q8 = lambda v: Decimal(repr(v)).quantize(  # noqa: E731
        Decimal("1e-8"), ROUND_HALF_UP
    )
    chi2 = sum(
        q8((o - row_tot[t] * col_tot[d] / n) ** 2 / (row_tot[t] * col_tot[d] / n))
        for (t, d), o in cells.items()
    )
    assert row["n_cells"] == len(cells)
    assert row["n_events"] == n
    assert row["dof"] == (len(row_tot) - 1) * (len(col_tot) - 1)
    assert abs(row["chi2"] - float(chi2)) < 2e-6


def test_chi2_nonnegative_and_bounded(spark):
    row = queries()["x_chi2_independence"](spark, SF_SMALL).collect()[0]
    assert row["chi2"] >= 0
    # χ² can't exceed N·min(R−1, C−1)
    assert row["chi2"] <= row["n_events"] * 6
    assert row["dof"] >= 1


def test_srm_exact_replay(spark):
    row = queries()["x_ab_srm_check"](spark, SF_SMALL).collect()[0]
    users = {
        r["user_id"]
        for r in load(spark, SF_SMALL, "events").select("user_id").collect()
    }
    n_t = sum(1 for u in users if u % 2 == 1)
    n_c = len(users) - n_t
    n = len(users)
    z = (n_t - n / 2.0) / math.sqrt(n / 4.0)
    assert row["n_treat"] == n_t
    assert row["n_control"] == n_c
    assert row["n_users"] == n
    assert row["treat_share"] == _round6(n_t / n)
    assert row["z_score"] == _round6(z)
    assert row["srm_alarm"] == (1 if abs(z) > 3 else 0)


def test_srm_parity_split_is_healthy(spark):
    """user_id parity over a dense id range is a near-perfect 50/50 —
    the alarm must NOT fire on the fixture."""
    row = queries()["x_ab_srm_check"](spark, SF_SMALL).collect()[0]
    assert row["srm_alarm"] == 0
    assert 0.4 < row["treat_share"] < 0.6
