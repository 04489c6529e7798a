"""Derived report tables — the reference's EP3 (SURVEY.md §3.1).

After syncing the hit log, the reference builds aggregate/report tables
from it (sessions, daily rollups) via post-load SQL/pandas
[REF-UNVERIFIED]. Here each derived table is the already-oracled
operator pipeline materialized to parquet, partitioned for downstream
pruning:

- ``sessions`` — ops/flagship.session_metrics (q_flagship semantics),
- ``daily_metrics`` — the s_tumbling aggregation at day grain.

At 100 TB these become incremental materializations (foreachBatch /
MERGE); the builders take any events DataFrame, so the streaming path
feeds them unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .ops.flagship import session_metrics
from .registry import DEC


def build_sessions(events: DataFrame) -> DataFrame:
    """The ``sessions`` derived fixture of FIXTURES.md."""
    return session_metrics(events)


def build_daily_metrics(events: DataFrame) -> DataFrame:
    """The ``daily_metrics`` derived fixture of FIXTURES.md: per (day,
    event_type) counts, value totals and distinct users."""
    return (
        events.groupBy(
            F.date_trunc("day", "ts").alias("day"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def materialize_reports(
    spark: SparkSession, events: DataFrame, out_dir: str
) -> dict[str, str]:
    """EP3 entry point: build and persist both report tables.

    ``sessions`` is partitioned by user bucket (co-locates a user's
    sessions for later per-user reads without tiny-file explosion);
    ``daily_metrics`` by day (time-pruned report scans).
    """
    paths = {
        "sessions": f"{out_dir}/sessions",
        "daily_metrics": f"{out_dir}/daily_metrics",
    }
    sessions = build_sessions(events).withColumn(
        "user_bucket", F.pmod(F.col("user_id"), F.lit(16))
    )
    sessions.write.mode("overwrite").partitionBy("user_bucket").parquet(
        paths["sessions"]
    )
    daily = build_daily_metrics(events).withColumn(
        "day_str", F.date_format("day", "yyyy-MM-dd")
    )
    daily.write.mode("overwrite").partitionBy("day_str").parquet(
        paths["daily_metrics"]
    )
    return paths


def update_daily_metrics(
    spark: SparkSession, events: DataFrame, path: str
) -> list[str]:
    """Incremental EP3 maintenance: recompute only the days at/after the
    target's high-water mark and dynamically overwrite just those
    partitions.

    The at-scale pattern for derived tables: a day's metrics can change
    while late events for it still arrive (the reference's trailing
    re-extract window), so the last materialized day is recomputed and
    later days appended — via ``partitionOverwriteMode=dynamic``, which
    replaces exactly the partitions present in the written frame and
    leaves the (unboundedly growing) history untouched. A full rebuild
    (`materialize_reports`) reads all history; this reads only the tail.

    Returns the day strings that were (re)written.
    """
    from .sources.sinks import _target_exists

    daily = build_daily_metrics(events).withColumn(
        "day_str", F.date_format("day", "yyyy-MM-dd")
    )
    if _target_exists(spark, path):
        hwm = (
            spark.read.parquet(path)
            .agg(F.max("day_str").alias("hwm"))
            .first()["hwm"]
        )
        if hwm is not None:
            daily = daily.where(F.col("day_str") >= hwm)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        daily.write.mode("overwrite").partitionBy("day_str").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return [r["day_str"] for r in daily.select("day_str").distinct().collect()]
