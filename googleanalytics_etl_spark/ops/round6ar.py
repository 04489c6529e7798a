"""Round-6 batch 44: seasonal anomaly baseline + arrival burstiness.

- ``x_seasonal_anomaly`` — anomaly scoring against the SAME
  (day-of-week, hour) slot across weeks: each (type, hour) count is
  z-scored against the other observations of its own weekly slot.
  Completes the anomaly-baseline triad: q_anomaly_zscore (global —
  drift poisons it), x_burst_detect (trailing — seasonal peaks look
  like bursts), and this (seasonal — a Monday-9am spike is only a
  spike if it beats OTHER Monday-9ams). Leave-one-out moments: each
  observation is excluded from its own baseline via the total-minus-
  self identity, the same algebra as x_target_encode.
- ``x_burstiness`` — per-user inter-arrival burstiness
  ``B = (σ − μ)/(σ + μ)`` over microsecond-exact gaps: B ≈ −1 for a
  metronome (bot heartbeat), 0 for Poisson arrivals, → 1 for heavy
  bursts. The behavioral-forensics scalar next to x_session_entropy:
  entropy says WHAT mixes, burstiness says WHEN.

Reference parity: no analogue [REF-UNVERIFIED — /root/reference is
empty]; SURVEY §2.E analytics extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

_SA_Z = 2.0  # seasonal anomaly threshold (|z| > 2 across same-slot peers)

_SA_ORACLE = f"""
WITH h AS (
    SELECT event_type,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM events GROUP BY event_type, date_trunc('hour', ts)
), slotted AS (
    SELECT event_type, hour, cnt,
           -- DuckDB dayofweek: Sunday=0..6; +1 aligns with Spark's 1..7
           CAST(dayofweek(hour) + 1 AS BIGINT) AS dow,
           CAST(hour(hour) AS BIGINT) AS hod,
           COUNT(*) OVER ws AS peer_n,
           SUM(cnt) OVER ws AS peer_sum,
           SUM(cnt * cnt) OVER ws AS peer_sumsq
    FROM h
    WINDOW ws AS (PARTITION BY event_type, dayofweek(hour), hour(hour))
), loo AS (
    SELECT event_type, hour, cnt, dow, hod,
           peer_n - 1 AS n,
           peer_sum - cnt AS s,
           peer_sumsq - cnt * cnt AS ss
    FROM slotted
)
SELECT event_type, hour, cnt, dow, hod,
       CAST(n AS BIGINT) AS base_n,
       CASE WHEN n >= 2
            THEN ROUND(CAST(s AS DOUBLE) / n, 6) END AS base_mean,
       CASE WHEN n >= 2
            THEN ROUND(sqrt(GREATEST(
                     CAST(n * ss - s * s AS DOUBLE)
                     / (CAST(n AS DOUBLE) * n), 0.0)), 6) END AS base_std,
       CASE WHEN n >= 2
             AND sqrt(GREATEST(CAST(n * ss - s * s AS DOUBLE)
                      / (CAST(n AS DOUBLE) * n), 0.0)) > 0
             AND abs(CAST(cnt AS DOUBLE) - CAST(s AS DOUBLE) / n)
                 > {_SA_Z} * sqrt(GREATEST(
                       CAST(n * ss - s * s AS DOUBLE)
                       / (CAST(n AS DOUBLE) * n), 0.0))
            THEN 1 ELSE 0 END AS is_anomaly
FROM loo
"""


@register("x_seasonal_anomaly", oracle=_SA_ORACLE)
def x_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal anomaly screen: each (type, hour) count z-scored
    against the OTHER observations of its own (day-of-week,
    hour-of-day) slot — leave-one-out via the total-minus-self
    identity (one window, no second pass), population σ from the
    integer-exact ``n·Σx² − (Σx)²`` form, abstention when fewer than
    2 peers or σ = 0. A Monday-9am spike is only anomalous if it
    beats other Monday-9ams; the global and trailing baselines both
    misfire on weekly structure.

    Scale shape: one map-side-combinable (type, hour) count over the
    scan, then ONE unordered window over the (type, dow, hod) slot on
    the calendar-domain frame (5 types × 168 slots × weeks — bounded
    by the calendar). All flags are fixed-shape expressions on exact
    integers. Scan-bound at 100 TB.
    """
    e = load(spark, sf_dir, "events")
    h = e.groupBy(
        "event_type",
        F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("hour"),
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    dow = F.dayofweek("hour").cast("long")
    hod = F.hour("hour").cast("long")
    ws = Window.partitionBy("event_type", dow, hod)
    slotted = h.select(
        "event_type",
        "hour",
        "cnt",
        dow.alias("dow"),
        hod.alias("hod"),
        (F.count(F.lit(1)).over(ws) - 1).alias("n"),
        (F.sum("cnt").over(ws) - F.col("cnt")).alias("s"),
        (
            F.sum(F.col("cnt") * F.col("cnt")).over(ws)
            - F.col("cnt") * F.col("cnt")
        ).alias("ss"),
    )
    # ANSI mode: the `ok` gate does NOT short-circuit codegen
    # subexpressions, so the divisor must itself never be zero
    n_safe = F.greatest(F.col("n"), F.lit(1))
    mean = F.col("s").cast("double") / n_safe
    var = F.greatest(
        (F.col("n") * F.col("ss") - F.col("s") * F.col("s")).cast("double")
        / (n_safe.cast("double") * n_safe),
        F.lit(0.0),
    )
    std = F.sqrt(var)
    ok = F.col("n") >= 2
    return slotted.select(
        "event_type",
        "hour",
        "cnt",
        "dow",
        "hod",
        F.col("n").cast("long").alias("base_n"),
        F.when(ok, F.round(mean, 6)).alias("base_mean"),
        F.when(ok, F.round(std, 6)).alias("base_std"),
        F.when(
            ok
            & (std > 0)
            & (
                F.abs(F.col("cnt").cast("double") - mean) > _SA_Z * std
            ),
            1,
        )
        .otherwise(0)
        .alias("is_anomaly"),
    )


_BURST_ORACLE = """
WITH gaps AS (
    SELECT user_id,
           CAST(date_diff('microsecond', LAG(ts) OVER w, ts) AS BIGINT)
               AS gap_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), g AS (
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(gap_us) AS BIGINT) AS s,
           CAST(SUM(CAST(gap_us AS DECIMAL(19,0))
                    * CAST(gap_us AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS ss
    FROM gaps WHERE gap_us IS NOT NULL
    GROUP BY user_id
)
SELECT user_id, n AS n_gaps,
       CAST(s // n AS BIGINT) AS mean_gap_us,
       ROUND(sqrt(GREATEST((CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
                            - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                           / (CAST(n AS DOUBLE) * n), 0.0)) / 1e6, 6)
           AS std_gap_s,
       ROUND((sqrt(GREATEST((CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
                             - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                            / (CAST(n AS DOUBLE) * n), 0.0))
              - CAST(s AS DOUBLE) / n)
             / (sqrt(GREATEST((CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
                               - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                              / (CAST(n AS DOUBLE) * n), 0.0))
                + CAST(s AS DOUBLE) / n), 6) AS burstiness
FROM g WHERE n >= 2
"""


@register("x_burstiness", oracle=_BURST_ORACLE)
def x_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user arrival burstiness ``B = (σ − μ)/(σ + μ)`` over
    microsecond-exact inter-event gaps (users with ≥ 2 gaps): −1 is a
    metronome (the bot-heartbeat signature), 0 is Poisson, positive
    is bursty human behavior. Gap moments accumulate exactly (Σ as
    BIGINT, Σ² in DECIMAL — gap² reaches ~1e24 µs², past int64);
    σ uses the ``n·Σx² − (Σx)²`` form before a single sqrt, and B is
    one fixed-shape expression.

    Scale shape: one lag over the sessionization window, one
    map-side-combinable user-grain moment aggregate — rows carry two
    numbers. Scan-bound at 100 TB.
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gaps = e.select(
        "user_id", (us - F.lag(us).over(w)).cast("long").alias("gap_us")
    ).where(F.col("gap_us").isNotNull())
    g = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("gap_us").cast("long").alias("s"),
        F.sum(
            F.col("gap_us").cast("decimal(19,0)")
            * F.col("gap_us").cast("decimal(19,0)")
        )
        .cast("decimal(38,0)")
        .alias("ss"),
    ).where(F.col("n") >= 2)
    # the n·Σx² − (Σx)² numerator is formed in DOUBLE on both engines:
    # the exact-decimal Σ² (~1e24 µs²) would overflow DECIMAL(38) once
    # multiplied by n, and the two engines widen mixed int×decimal
    # differently — identical double casts of identical exact
    # aggregates give bit-identical results instead
    mean = F.col("s").cast("double") / F.col("n")
    var = F.greatest(
        (
            F.col("n").cast("double") * F.col("ss").cast("double")
            - F.col("s").cast("double") * F.col("s").cast("double")
        )
        / (F.col("n").cast("double") * F.col("n")),
        F.lit(0.0),
    )
    std = F.sqrt(var)
    return g.select(
        "user_id",
        F.col("n").alias("n_gaps"),
        # exact integer floor — ROUND(s/n, 6) can land on a .5e-6 tie
        # that the two engines' double-rounding break differently
        # (observed once at sf0.1); floor division never ties
        F.expr("s div n").cast("long").alias("mean_gap_us"),
        F.round(std / 1e6, 6).alias("std_gap_s"),
        F.round((std - mean) / (std + mean), 6).alias("burstiness"),
    )
