"""Randomized property tests (SURVEY.md §5.5): sessionization invariants
over generated event logs — gap rule `>` (strict), per-user ordinals,
exhaustive coverage — independent of the driver fixtures.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from googleanalytics_etl_spark.ops.flagship import sessionize


def _random_events(spark, seed: int, n_users: int = 7, n_events: int = 400):
    """Deterministic pseudo-random event log: exponential-ish gaps so
    sessions of several events actually form."""
    return (
        spark.range(n_events)
        .withColumn("user_id", F.pmod(F.xxhash64(F.col("id") + seed), F.lit(n_users)))
        .withColumn(
            "gap_s",
            (
                F.pmod(F.xxhash64(F.col("id") * 31 + seed), F.lit(10_000)) / 2.0
            ).cast("double"),
        )
        .withColumn(
            "offset_s",
            F.sum("gap_s").over(Window.partitionBy("user_id").orderBy("id")),
        )
        .select(
            F.col("id").alias("event_id"),
            "user_id",
            F.timestamp_micros(
                (F.lit(1_700_000_000_000_000) + (F.col("offset_s") * 1e6).cast("long"))
            ).cast("timestamp_ntz").alias("ts"),
        )
    )


@pytest.mark.parametrize("seed", [7, 42, 1337])
def test_sessionize_random_invariants(spark, seed):
    e = _random_events(spark, seed)
    s = sessionize(e).cache()
    try:
        n = e.count()
        assert s.count() == n  # every event in exactly one session

        w_cols = ["user_id", "session_id"]
        # session ids are dense per-user ordinals starting at 1
        per_user = s.groupBy("user_id").agg(
            F.max("session_id").alias("mx"),
            F.countDistinct("session_id").alias("nd"),
            F.min("session_id").alias("mn"),
        )
        bad = per_user.where(
            (F.col("mn") != 1) | (F.col("mx") != F.col("nd"))
        ).count()
        assert bad == 0, "session ids are not dense 1..N per user"

        # gap rule, strict '>': intra ≤ 30min, inter > 30min
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        us = F.unix_micros(F.col("ts").cast("timestamp"))
        flagged = s.withColumn("gap_us", us - F.lag(us).over(w)).withColumn(
            "switch", (F.col("session_id") != F.lag("session_id").over(w))
        )
        lim = 30 * 60 * 1_000_000
        assert flagged.where(~F.col("switch") & (F.col("gap_us") > lim)).count() == 0
        assert flagged.where(F.col("switch") & (F.col("gap_us") <= lim)).count() == 0
    finally:
        s.unpersist()


def test_sessionize_exact_boundary(spark):
    """A gap of exactly 30:00.000000 must NOT break a session (strict >)."""
    rows = [
        (1, 10, "2024-01-01 00:00:00.000000"),
        (2, 10, "2024-01-01 00:30:00.000000"),  # == 30 min: same session
        (3, 10, "2024-01-01 01:00:00.000001"),  # 30:00.000001: new session
    ]
    e = spark.createDataFrame(rows, "event_id long, user_id long, ts string").select(
        "event_id", "user_id", F.col("ts").cast("timestamp_ntz").alias("ts")
    )
    got = {r.event_id: r.session_id for r in sessionize(e).collect()}
    assert got == {1: 1, 2: 1, 3: 2}
