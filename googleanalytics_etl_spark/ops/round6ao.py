"""Round-6 batch 41: weighted quantiles + gaps-and-islands.

- ``x_weighted_percentile`` — weighted p50/p90 of the lineitem
  extended price, weighted by quantity, per return flag: the value at
  which the CUMULATIVE WEIGHT first crosses q·W. The estimator behind
  every "median price per UNIT sold" / weighted-SLA metric — the
  unweighted median (q_percentiles) answers a different question the
  moment weights vary. The crossing test is exact integer
  cross-multiplication (``2·cumw ≥ W`` for p50, ``10·cumw ≥ 9·W`` for
  p90) — no float threshold, so both engines pick the identical row.
- ``x_active_streaks`` — per-user activity streaks via the canonical
  gaps-and-islands construction: ``day_idx − ROW_NUMBER()`` is
  constant exactly on runs of consecutive days, so one window + one
  aggregate finds every streak. Reports per user the active-day
  count, number of streaks, longest streak, and the streak ending at
  their last active day.

Reference parity: no analogue [REF-UNVERIFIED — /root/reference is
empty]; SURVEY §2.D aggregation / §2.E analytics extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

_WP_ORACLE = """
WITH r AS (
    SELECT l_returnflag,
           l_extendedprice AS v,
           CAST(CAST(l_quantity AS DECIMAL(18,4)) AS DECIMAL(18,4)) AS w,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)))
                    OVER (PARTITION BY l_returnflag
                          ORDER BY l_extendedprice, l_orderkey, l_linenumber
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DECIMAL(28,4)) AS cumw,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)))
                    OVER (PARTITION BY l_returnflag)
                AS DECIMAL(28,4)) AS totw
    FROM lineitem
)
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MAX(totw) AS DOUBLE) AS total_w,
       MIN(CASE WHEN 2 * cumw >= totw THEN v END) AS w_p50,
       MIN(CASE WHEN 10 * cumw >= 9 * totw THEN v END) AS w_p90
FROM r GROUP BY l_returnflag
"""


@register("x_weighted_percentile", oracle=_WP_ORACLE)
def x_weighted_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted percentiles: per return flag, the extended price at
    which cumulative QUANTITY first reaches half (p50) and 90% (p90)
    of the group's total quantity — "the median unit sold costs X",
    not "the median line costs X". Weights sum exactly in DECIMAL;
    the crossing predicate cross-multiplies integers-in-decimal
    (``2·cumw ≥ W``), so no float threshold ever decides a row, and
    the (value, orderkey, linenumber) sort gives both engines the
    identical crossing row.

    Scale shape: one cumulative-weight window per group (the same
    sort q_percentiles pays, carrying one extra decimal column) and a
    group-domain aggregate. MIN(CASE WHEN crossed) picks the first
    crossing without a second pass. At 100 TB the same KLL-sketch
    upgrade as x_outlier_iqr applies, feeding weights to the sketch.
    """
    return weighted_percentile_frame(load(spark, sf_dir, "lineitem"))


def weighted_percentile_frame(li: DataFrame) -> DataFrame:
    """Frame-level core of :func:`x_weighted_percentile`
    (stress-testable on synthetic lineitem inputs)."""
    wq = F.col("l_quantity").cast("decimal(18,4)")
    wcum = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = li.select(
        "l_returnflag",
        F.col("l_extendedprice").alias("v"),
        F.sum(wq).over(wcum).cast("decimal(28,4)").alias("cumw"),
        F.sum(wq)
        .over(Window.partitionBy("l_returnflag"))
        .cast("decimal(28,4)")
        .alias("totw"),
    )
    return r.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.max("totw").cast("double").alias("total_w"),
        F.min(
            F.when(2 * F.col("cumw") >= F.col("totw"), F.col("v"))
        ).alias("w_p50"),
        F.min(
            F.when(10 * F.col("cumw") >= 9 * F.col("totw"), F.col("v"))
        ).alias("w_p90"),
    )


_STREAK_ORACLE = """
WITH ud AS (
    SELECT DISTINCT user_id,
           CAST(date_diff('day', TIMESTAMP '2024-01-01',
                          CAST(date_trunc('day', ts) AS TIMESTAMP))
                AS BIGINT) AS day_idx
    FROM events
), isl AS (
    SELECT user_id, day_idx,
           day_idx - ROW_NUMBER() OVER (PARTITION BY user_id
                                        ORDER BY day_idx) AS grp
    FROM ud
), streaks AS (
    SELECT user_id, grp,
           CAST(COUNT(*) AS BIGINT) AS len,
           MAX(day_idx) AS last_day
    FROM isl GROUP BY user_id, grp
)
SELECT user_id,
       CAST(SUM(len) AS BIGINT) AS active_days,
       CAST(COUNT(*) AS BIGINT) AS n_streaks,
       CAST(MAX(len) AS BIGINT) AS longest_streak,
       CAST(MAX(CASE WHEN last_day = mx THEN len END) AS BIGINT)
           AS last_streak
FROM (SELECT *, MAX(last_day) OVER (PARTITION BY user_id) AS mx
      FROM streaks)
GROUP BY user_id
"""


@register("x_active_streaks", oracle=_STREAK_ORACLE)
def x_active_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity streaks via gaps-and-islands: on each user's distinct
    active days, ``day_idx − row_number`` is constant precisely on
    runs of consecutive days — one window turns streak-finding into a
    plain GROUP BY. Reports active days, streak count, longest
    streak, and the streak ending at the user's last active day (the
    "current streak" every habit metric shows).

    Scale shape: one (user, day) distinct, one per-user window, two
    user-grain aggregates — all on the SAME user partitioning, rows
    two longs wide. The islands trick is the whole point: the naive
    recursive/self-join formulation is quadratic in streak length.
    Scan-bound at 100 TB.
    """
    e = load(spark, sf_dir, "events")
    ud = e.select(
        "user_id",
        F.datediff(
            F.date_trunc("day", "ts").cast("timestamp_ntz"),
            F.lit("2024-01-01").cast("date"),
        )
        .cast("long")
        .alias("day_idx"),
    ).distinct()
    isl = ud.select(
        "user_id",
        "day_idx",
        (
            F.col("day_idx")
            - F.row_number().over(
                Window.partitionBy("user_id").orderBy("day_idx")
            )
        ).alias("grp"),
    )
    streaks = isl.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("len"),
        F.max("day_idx").alias("last_day"),
    )
    with_mx = streaks.withColumn(
        "mx", F.max("last_day").over(Window.partitionBy("user_id"))
    )
    return with_mx.groupBy("user_id").agg(
        F.sum("len").cast("long").alias("active_days"),
        F.count(F.lit(1)).cast("long").alias("n_streaks"),
        F.max("len").cast("long").alias("longest_streak"),
        F.max(F.when(F.col("last_day") == F.col("mx"), F.col("len")))
        .cast("long")
        .alias("last_streak"),
    )
