"""Bucketed co-located join: the at-scale strategy for repeated
fact-fact joins (SURVEY.md §4 "choosing partitioning/bucketing").

At 100 TB, lineitem ⋈ orders on orderkey shuffles both sides on every
run. Bucketing both tables on the join key at write time pays that
shuffle once; every subsequent join reads co-located buckets and plans
a SortMergeJoin with ZERO exchanges. This test proves the engine's
tables support that contract end-to-end (write bucketed → plan is
exchange-free), which is the claim a plan-reader checks before trusting
the strategy on a 1000-executor cluster.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load


def _simple_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


@pytest.fixture()
def bucketed_tables(spark):
    li = load(spark, SF_SMALL, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = load(spark, SF_SMALL, "orders").select("o_orderkey", "o_totalprice")
    for name in ("li_bucketed", "ord_bucketed"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode(
        "overwrite"
    ).saveAsTable("li_bucketed")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode(
        "overwrite"
    ).saveAsTable("ord_bucketed")
    yield
    for name in ("li_bucketed", "ord_bucketed"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    # forbid broadcast so the test proves co-location, not small-table luck
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.table("li_bucketed")
        o = spark.table("ord_bucketed")
        joined = li.join(o, li.l_orderkey == o.o_orderkey)
        plan = _simple_plan(joined)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, (
            "bucketed join must read co-located buckets shuffle-free:\n" + plan
        )
        # and the result is still correct
        li_raw = load(spark, SF_SMALL, "lineitem")
        o_raw = load(spark, SF_SMALL, "orders")
        expected = li_raw.join(
            o_raw, li_raw.l_orderkey == o_raw.o_orderkey
        ).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
