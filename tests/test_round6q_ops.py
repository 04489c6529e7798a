"""Semantic tests for q_sql_udf and q_sql_params (round-6 batch 17).
test_oracle.py proves Spark == DuckDB; these replay the banding and
parameter binding in pure Python and check the inlining claim.
"""

from __future__ import annotations

from collections import defaultdict

from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.registry import queries


def test_sql_udf_exact_replay(spark):
    rows = {
        r["band"]: r for r in queries()["q_sql_udf"](spark, SF_SMALL).collect()
    }
    ev = load(spark, SF_SMALL, "events").select("value").collect()
    agg = defaultdict(lambda: [0, 0])
    for r in ev:
        v = float(r["value"])
        band = "micro" if v < 1 else ("small" if v < 50 else "large")
        agg[band][0] += 1
        agg[band][1] += round(v * 100)
    assert set(rows) == set(agg)
    spine = {"micro": 1, "small": 2, "large": 3}
    for band, (n, cents) in agg.items():
        r = rows[band]
        assert r["n"] == n
        assert r["cents"] == cents
        assert r["bucket_id"] == spine[band]


def test_sql_udf_inlines_no_python(spark):
    """SQL UDF bodies must inline — the physical plan has no Python
    eval and no function-call remnant."""
    df = queries()["q_sql_udf"](spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_sql_params_exact_replay(spark):
    rows = {
        r["event_type"]: r
        for r in queries()["q_sql_params"](spark, SF_SMALL).collect()
    }
    ev = (
        load(spark, SF_SMALL, "events")
        .select("event_type", "value")
        .collect()
    )
    agg = defaultdict(lambda: [0, 0, 0])
    for r in ev:
        if r["event_type"] not in ("purchase", "view"):
            continue
        d = agg[r["event_type"]]
        v = float(r["value"])
        d[0] += 1
        d[1] += v > 50.0
        d[2] += round(v * 100)
    assert set(rows) == set(agg) == {"purchase", "view"}
    for t, (n, n_over, cents) in agg.items():
        r = rows[t]
        assert (r["n"], r["n_over"], r["cents"]) == (n, n_over, cents)


def test_sql_params_binding_changes_result(spark):
    """The same query text with a different bound threshold must change
    n_over — proving the value really flows from args, not the text."""
    ev = load(spark, SF_SMALL, "events")
    q = """
        SELECT CAST(SUM(CASE WHEN value > :threshold THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_over
        FROM {events} WHERE event_type = 'purchase'
    """
    lo = spark.sql(q, args={"threshold": 0.0}, events=ev).collect()[0]["n_over"]
    hi = spark.sql(q, args={"threshold": 1e9}, events=ev).collect()[0]["n_over"]
    assert lo > 0 and hi == 0
