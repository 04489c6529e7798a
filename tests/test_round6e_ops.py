"""Semantic tests for x_lsh_tuning (round-6 batch 5).

test_oracle.py proves Spark == DuckDB; these prove the S-curve
structure the sweep exists to measure, plus consistency with the
production x_dedup_near pipeline.
"""

from __future__ import annotations

from conftest import SF_SMALL

from googleanalytics_etl_spark.registry import queries


def _rows(spark):
    return {
        (r["n_bands"], r["n_rows"]): r
        for r in queries()["x_lsh_tuning"](spark, SF_SMALL).collect()
    }


def test_lsh_tuning_s_curve_structure(spark):
    rows = _rows(spark)
    assert set(rows) == {(4, 4), (8, 2), (16, 1)}
    # single-row bands admit every shape's candidates: candidate volume
    # is monotone in permissiveness
    assert (
        rows[(16, 1)]["n_candidates"]
        >= rows[(8, 2)]["n_candidates"]
        >= rows[(4, 4)]["n_candidates"]
    )
    # verified yield is monotone the same way (subset candidates ⊆
    # superset candidates, same threshold)
    assert (
        rows[(16, 1)]["n_verified"]
        >= rows[(8, 2)]["n_verified"]
        >= rows[(4, 4)]["n_verified"]
    )
    # recall is measured against the (16, 1) yield: exactly 1 there
    assert rows[(16, 1)]["recall_vs_max"] == 1.0
    for r in rows.values():
        assert 0 < r["precision_at_05"] <= 1
        assert 0 < r["recall_vs_max"] <= 1
        assert r["n_verified"] <= r["n_candidates"]


def test_lsh_tuning_4x4_matches_production_pipeline(spark):
    """The (4, 4) row must equal x_dedup_near's candidate/verified
    counts — same signatures, same banding, same threshold."""
    rows = _rows(spark)
    verified = queries()["x_dedup_near"](spark, SF_SMALL).count()
    assert rows[(4, 4)]["n_verified"] == verified


def test_lsh_tuning_planted_dups_survive_every_shape(spark):
    """The 10 planted exact duplicates (identical shingle sets agree on
    every signature) are candidates and verified under ALL shapes."""
    rows = _rows(spark)
    for r in rows.values():
        assert r["n_verified"] >= 10
