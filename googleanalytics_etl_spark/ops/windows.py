"""§2.E — window functions.

The reference's session logic and running totals live in pandas
(`groupby` + `shift` + `cumsum`) [REF-UNVERIFIED: SURVEY.md §2.E]; here
each is one Catalyst Window — a single hash-partition shuffle on the
partition key, then streaming per-partition evaluation (no per-group
materialization, so a 100 TB event log sessionizes in one pass).

``q_sessionize`` itself lives in ops/flagship.py. Every ORDER BY carries
the unique ``event_id``/key tiebreaker (SURVEY.md §7 (5)); rank-family
outputs are cast BIGINT on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import fscaled, register

_WINDOW_RANK_ORACLE = """
SELECT event_id, event_type, value,
       CAST(ROW_NUMBER() OVER (PARTITION BY event_type
            ORDER BY value DESC, event_id) AS BIGINT) AS rn,
       CAST(RANK() OVER (PARTITION BY event_type
            ORDER BY value DESC) AS BIGINT) AS rnk,
       CAST(DENSE_RANK() OVER (PARTITION BY event_type
            ORDER BY value DESC) AS BIGINT) AS drnk
FROM events
"""


@register("q_window_rank", oracle=_WINDOW_RANK_ORACLE)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank per partition (top pages per day)."""
    e = load(spark, sf_dir, "events")
    w_unique = Window.partitionBy("event_type").orderBy(
        F.col("value").desc(), F.col("event_id")
    )
    w_ties = Window.partitionBy("event_type").orderBy(F.col("value").desc())
    return e.select(
        "event_id",
        "event_type",
        "value",
        F.row_number().over(w_unique).cast("long").alias("rn"),
        F.rank().over(w_ties).cast("long").alias("rnk"),
        F.dense_rank().over(w_ties).cast("long").alias("drnk"),
    )


_WINDOW_LAG_ORACLE = """
SELECT event_id, user_id, ts,
       LAG(CAST(ts AS TIMESTAMP)) OVER w AS prev_ts,
       CAST(epoch_us(CAST(ts AS TIMESTAMP))
            - epoch_us(LAG(CAST(ts AS TIMESTAMP)) OVER w) AS BIGINT) AS gap_us,
       LEAD(event_type) OVER w AS next_event_type
FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
      FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@register("q_window_lag", oracle=_WINDOW_LAG_ORACLE)
def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead per user: previous-hit timestamp + inter-hit gap (µs) —
    the primitive under gap sessionization."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.lag("ts").over(w).alias("prev_ts"),
        (us - F.lag(us).over(w)).cast("long").alias("gap_us"),
        F.lead("event_type").over(w).alias("next_event_type"),
    )


_RUNNING_SUM_ORACLE = """
SELECT event_id, user_id, ts,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS running_value,
       CAST(COUNT(*) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS running_n
FROM events
"""


@register("q_running_sum", oracle=_RUNNING_SUM_ORACLE)
def q_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum/count per user over time (ROWS frame)."""
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        # long-scaled exact running sum (registry.py fast path): immune
        # to frame-evaluation order, 2× cheaper than decimal frames
        (F.sum(fscaled("value")).over(w) / 10_000.0).alias("running_value"),
        F.count(F.lit(1)).over(w).cast("long").alias("running_n"),
    )


_RANGE_FRAME_ORACLE = """
SELECT o_orderkey, o_custkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate
            RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS trailing_7d_total
FROM orders
"""


@register("q_window_range_frame", oracle=_RANGE_FRAME_ORACLE)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame: 7-day trailing spend per customer (moving window by
    VALUE, not row position — peers at equal dates share the frame)."""
    o = load(spark, sf_dir, "orders")
    # Spark RANGE frames need a numeric ordering key: epoch seconds
    # (o_orderdate is day-granular, so the conversion is exact).
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_micros(F.col("o_orderdate").cast("timestamp")) / 1_000_000)
        .rangeBetween(-7 * 86400, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        (F.sum(fscaled("o_totalprice")).over(w) / 10_000.0).alias(
            "trailing_7d_total"
        ),
    )


_FIRST_LAST_ORACLE = """
SELECT DISTINCT user_id,
       FIRST_VALUE(event_type) OVER w AS first_event_type,
       LAST_VALUE(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           AS last_event_type,
       FIRST_VALUE(CAST(ts AS TIMESTAMP)) OVER w AS first_ts
FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type
      FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@register("q_first_last_touch", oracle=_FIRST_LAST_ORACLE)
def q_first_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last-touch attribution per user (first_value/last_value)."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return e.select(
        "user_id",
        F.first("event_type").over(w).alias("first_event_type"),
        F.last("event_type").over(wfull).alias("last_event_type"),
        F.first("ts").over(w).alias("first_ts"),
    ).distinct()


_NTILE_ORACLE = """
WITH totals AS (
    SELECT user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events GROUP BY user_id
)
SELECT user_id, total_value,
       CAST(NTILE(4) OVER (ORDER BY total_value DESC, user_id) AS BIGINT)
           AS quartile
FROM totals
"""


@register("q_ntile", oracle=_NTILE_ORACLE)
def q_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-value quartiles (segmentation): agg then ntile(4).

    Exact NTILE over a total order is inherently a global window; it is
    acceptable here because it runs over the *aggregated* per-user
    relation (|users| ≪ |events|), not the event log. If even the user
    relation outgrows one partition, the scale path is quartile
    thresholds via approx_percentile + a broadcast range join — same
    shape as x_sim_knn_ivf's pruning, different accuracy contract.
    """
    e = load(spark, sf_dir, "events")
    totals = e.groupBy("user_id").agg(
        (F.sum(fscaled("value")) / 10_000.0).alias("total_value")
    )
    w = Window.orderBy(F.col("total_value").desc(), F.col("user_id"))
    return totals.select(
        "user_id",
        "total_value",
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


_PERCENT_RANK_ORACLE = """
SELECT event_id, event_type, value,
       ROUND(PERCENT_RANK() OVER w, 8) AS pct_rank,
       ROUND(CUME_DIST() OVER w, 8) AS cume
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY value)
"""


@register("q_percent_rank", oracle=_PERCENT_RANK_ORACLE)
def q_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-position windows: percent_rank / cume_dist per group
    (both engines compute (rank-1)/(n-1) and rank_hi/n as integer-ratio
    doubles — identical; round 8 is belt-and-braces)."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value")
    return e.select(
        "event_id",
        "event_type",
        "value",
        F.round(F.percent_rank().over(w), 8).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 8).alias("cume"),
    )
