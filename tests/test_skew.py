"""Equivalence tests for explicit skew mitigation (skew.py)."""

from __future__ import annotations

from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.skew import salted_distinct_count, salted_join


def test_salted_join_equals_plain_join(spark):
    from pyspark.sql import functions as F

    li = load(spark, SF_SMALL, "lineitem").withColumnRenamed(
        "l_partkey", "p_partkey"
    )
    p = load(spark, SF_SMALL, "part")
    plain = li.join(p, "p_partkey").groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n")
    )
    salted = salted_join(li, p, "p_partkey", salt_n=8).groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_distinct_count_exact(spark):
    from pyspark.sql import functions as F

    e = load(spark, SF_SMALL, "events")
    plain = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_distinct")
    )
    salted = salted_distinct_count(e, "event_type", "user_id", salt_n=8)
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_check_unique_finds_planted_duplicate(spark):
    from googleanalytics_etl_spark.validate import check_unique

    e = load(spark, SF_SMALL, "events").select("event_id")
    assert check_unique(e, "event_id").count() == 0
    dup = e.unionByName(e.limit(3))
    rows = {r.event_id: r.n for r in check_unique(dup, "event_id").collect()}
    assert len(rows) == 3 and all(n == 2 for n in rows.values())


def test_sessionize_survives_hot_user(spark):
    """Pathological skew: one bot user owns half the event log. The
    sessionization window must stay correct (streaming per-partition
    evaluation, no per-user materialization blowup)."""
    from pyspark.sql import functions as F

    from googleanalytics_etl_spark.ops.flagship import sessionize

    n = 200_000
    e = (
        spark.range(n)
        .withColumn(
            "user_id",
            F.when(F.col("id") % 2 == 0, 7).otherwise(
                F.pmod(F.xxhash64("id"), F.lit(1000)) + 100
            ),
        )
        .withColumn(
            "ts",
            F.timestamp_micros(
                F.lit(1_700_000_000_000_000) + F.col("id") * 90_000_000
            ).cast("timestamp_ntz"),
        )
        .select(F.col("id").alias("event_id"), "user_id", "ts")
    )
    s = sessionize(e)
    assert s.count() == n
    hot = s.where("user_id = 7")
    # hot user: events every 180s -> gaps never exceed 30 min -> exactly
    # one session spanning all of them
    assert hot.agg({"session_id": "max"}).first()[0] == 1
    assert hot.count() == n // 2
