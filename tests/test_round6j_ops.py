"""Semantic tests for x_adc_scan and x_did_analysis (round-6 batch 10).
test_oracle.py proves Spark == DuckDB; these replay ADC in numpy and
DiD in pure Python.
"""

from __future__ import annotations

from datetime import date
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.registry import queries
from tests.test_round6i_ops import _pq_replay  # noqa: F401  (reuse)


def _round6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP))


# ---------------------------------------------------------------------------
# x_adc_scan
# ---------------------------------------------------------------------------


def test_adc_scan_replay(spark):
    from googleanalytics_etl_spark.ops.round6i import _PQ_SUB, pq_model

    rows = queries()["x_adc_scan"](spark, SF_SMALL).collect()
    assert len(rows) == 10
    e = load(spark, SF_SMALL, "embeddings").select("vec_id", "embedding")
    assigned, books = pq_model(e)
    codes = {
        r["vec_id"]: (r["code_a"], r["code_b"]) for r in assigned.collect()
    }
    vecs = {
        r["vec_id"]: np.array([float(x) for x in r["embedding"]])
        for r in e.collect()
    }
    q = vecs[0]
    luts = []
    for s in range(2):
        qs = q[s * _PQ_SUB : (s + 1) * _PQ_SUB]
        luts.append(
            {
                j: round(float(sum((a - b) * (a - b) for a, b in zip(qs, c))), 6)
                for j, c in books[s].items()
            }
        )
    scored = sorted(
        (round(luts[0][ca] + luts[1][cb], 6), i)
        for i, (ca, cb) in codes.items()
    )[:10]
    for rank, (adc, i) in enumerate(scored, start=1):
        r = rows[rank - 1]
        assert (r["rank"], r["vec_id"]) == (rank, i)
        assert r["adc_dist"] == _round6(adc)
        exact = round(float(np.sum((vecs[i] - q) ** 2)), 6)
        assert r["exact_dist"] == _round6(exact)


def test_adc_scan_query_is_own_nearest(spark):
    rows = queries()["x_adc_scan"](spark, SF_SMALL).collect()
    # vec 0 has exact distance 0 to itself and must appear in the top-k
    # (its ADC distance is the quantization error of its own cell, tiny
    # relative to corpus spread); ranks are 1..10 and ADC is sorted
    by_rank = sorted(rows, key=lambda r: r["rank"])
    assert [r["rank"] for r in by_rank] == list(range(1, 11))
    dists = [r["adc_dist"] for r in by_rank]
    assert dists == sorted(dists)
    zero = [r for r in rows if r["vec_id"] == 0]
    assert zero and zero[0]["exact_dist"] == 0.0


# ---------------------------------------------------------------------------
# x_did_analysis
# ---------------------------------------------------------------------------


def test_did_exact_replay(spark):
    row = queries()["x_did_analysis"](spark, SF_SMALL).collect()[0]
    ev = (
        load(spark, SF_SMALL, "events")
        .where("event_type = 'purchase'")
        .select("user_id", "ts", "value")
        .collect()
    )
    cells = {(t, p): [0, 0] for t in (0, 1) for p in (0, 1)}
    for r in ev:
        t = r["user_id"] % 2
        p = int(r["ts"].date() >= date(2024, 1, 8))
        cells[(t, p)][0] += round(float(r["value"]) * 100)
        cells[(t, p)][1] += 1
    mean = {k: s / n / 100 for k, (s, n) in cells.items()}
    assert row["n_purchases"] == sum(n for _, n in cells.values())
    assert row["treat_pre"] == _round6(mean[(1, 0)])
    assert row["treat_post"] == _round6(mean[(1, 1)])
    assert row["control_pre"] == _round6(mean[(0, 0)])
    assert row["control_post"] == _round6(mean[(0, 1)])
    assert row["did"] == _round6(
        (mean[(1, 1)] - mean[(1, 0)]) - (mean[(0, 1)] - mean[(0, 0)])
    )


def test_did_identity(spark):
    """DiD must equal the recomposition from its own reported cells up
    to the 1e-6 rounding of each term."""
    row = queries()["x_did_analysis"](spark, SF_SMALL).collect()[0]
    recomposed = (row["treat_post"] - row["treat_pre"]) - (
        row["control_post"] - row["control_pre"]
    )
    assert abs(row["did"] - recomposed) < 5e-6
    # with ~even user split, all four cells are populated
    assert row["n_purchases"] > 0
