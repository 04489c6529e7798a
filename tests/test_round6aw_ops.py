"""Semantic tests for s_error_budget (round-6 batch 49).
test_oracle.py proves Spark == DuckDB; these replay in python and
check the defining identities: the changelog's final rows reconcile
exactly with the batch x_error_budget, every emission is a valid
running prefix (monotone within a day), and flags follow the exact
integer cross-multiplication.
"""

from __future__ import annotations

from collections import defaultdict

from conftest import SF_SMALL

from googleanalytics_etl_spark.ops.round6aq import _SLO_PCT
from googleanalytics_etl_spark.registry import queries


def test_s_error_budget_final_matches_batch(spark):
    stream = queries()["s_error_budget"](spark, SF_SMALL).collect()
    batch = {
        r["day"].date(): r
        for r in queries()["x_error_budget"](spark, SF_SMALL).collect()
    }
    finals = {r["day"]: r for r in stream if r["is_final"] == 1}
    assert set(finals) == set(batch)
    for day, f in finals.items():
        b = batch[day]
        assert f["n_events"] == b["n_events"]
        assert f["n_errors"] == b["n_errors"]
        assert f["over_slo"] == b["over_slo"]


def test_s_error_budget_changelog_is_monotone_prefixes(spark):
    stream = queries()["s_error_budget"](spark, SF_SMALL).collect()
    by_day = defaultdict(list)
    for r in stream:
        by_day[r["day"]].append(r)
    for day, rows in by_day.items():
        rows.sort(key=lambda r: r["n_events"])
        # strictly increasing running counts; errors monotone too
        for a, b in zip(rows, rows[1:]):
            assert a["n_events"] < b["n_events"]
            assert a["n_errors"] <= b["n_errors"]
        # exactly one final row per day, and it is the largest
        assert sum(r["is_final"] for r in rows) == 1
        assert rows[-1]["is_final"] == 1
        # each day emits between 1 and 5 times (5 micro-batches)
        assert 1 <= len(rows) <= 5
        for r in rows:
            expect = 1 if 100 * r["n_errors"] > _SLO_PCT * r["n_events"] else 0
            assert r["over_slo"] == expect
