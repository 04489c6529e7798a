"""Round-5 driver-visibility keys: the paged-source scan and the
approx-distinct accuracy composite."""

from pyspark.sql import functions as F

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.registry import queries

from conftest import SF_MED, SF_SMALL


def test_scan_paged_equals_plain_scan(spark):
    """The paged DataSource read (chunk planning, page loop, pushdown)
    returns exactly the plain parquet scan's rows."""
    got = queries()["q_scan_paged"](spark, SF_SMALL)
    want = (
        load(spark, SF_SMALL, "events")
        .where((F.col("event_type") == "purchase") & (F.col("value") > 50))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_scan_paged_pushes_filters_into_source(spark):
    """Both predicates leave Spark's plan: the source applied them
    'server-side' (the request-body filter contract)."""
    plan = (
        queries()["q_scan_paged"](spark, SF_SMALL)
        ._jdf.queryExecution()
        .simpleString()
    )
    assert "BatchScan paged_events" in plan
    # only null guards remain in Spark's residual Filter
    assert "= purchase" not in plan and "> 50" not in plan


def test_approx_distinct_bound_in_bound_both_sfs(spark):
    """The exact-twin composite: exact counts match q_count_distinct and
    the 3-sigma in_bound flag holds at both SFs (not fixture luck)."""
    for sf in (SF_SMALL, SF_MED):
        rows = queries()["q_approx_distinct_bound"](spark, sf).collect()
        exact = {
            r["event_type"]: r["n_users"]
            for r in load(spark, sf, "events")
            .groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("n_users"))
            .collect()
        }
        assert {r["event_type"]: r["n_users_exact"] for r in rows} == exact
        assert all(r["in_bound"] == 1 for r in rows)
