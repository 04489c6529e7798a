"""Round-6 batch 33: time-constrained funnel + time-series features.

- ``x_funnel_windowed`` — the windowed funnel (ClickHouse
  ``windowFunnel`` semantics): users who viewed, then clicked within
  {_FW_MIN} minutes of the view, then purchased within {_FW_MIN}
  minutes of that click. q_funnel only requires ORDER (a purchase
  three weeks later still converts); real conversion windows expire.
  Built join-light: each event's next-click / next-purchase timestamp
  comes from a min-over-following window on the ONE user stream; the
  only join is a compact equi-join fetching the found click's own
  next-purchase.
- ``x_ts_features`` — the per-(user, day) feature build every
  forecasting / churn model trains on: yesterday's spend, trailing
  7-day mean and active-day count, and day-over-day delta — all via
  RANGE frames on the integer day index, so calendar gaps are handled
  exactly (a user inactive for 6 days still gets the right trailing
  window, where ROWS frames would silently look back too far).

Reference parity: no analogue [REF-UNVERIFIED — /root/reference is
empty]; SURVEY §2.E GA analytics extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

_FW_MIN = 1440  # per-step conversion window, minutes (24 h)

_FW_ORACLE = f"""
WITH s AS (
    SELECT user_id, ts, event_id, event_type,
           MIN(CASE WHEN event_type = 'click' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS next_click,
           MIN(CASE WHEN event_type = 'purchase' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS next_purchase
    FROM events
), clicks AS (
    SELECT user_id, ts, MIN(next_purchase) AS np
    FROM s WHERE event_type = 'click'
    GROUP BY user_id, ts
), chains AS (
    SELECT v.user_id,
           v.next_click AS c_ts,
           CASE WHEN v.next_click IS NOT NULL
                 AND v.next_click <= v.ts + INTERVAL {_FW_MIN} MINUTE
                THEN 1 ELSE 0 END AS hit_click,
           CASE WHEN v.next_click IS NOT NULL
                 AND v.next_click <= v.ts + INTERVAL {_FW_MIN} MINUTE
                 AND c.np IS NOT NULL
                 AND c.np <= v.next_click + INTERVAL {_FW_MIN} MINUTE
                THEN 1 ELSE 0 END AS hit_purchase
    FROM s v LEFT JOIN clicks c
      ON c.user_id = v.user_id AND c.ts = v.next_click
    WHERE v.event_type = 'view'
)
SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_view_users,
       CAST(COUNT(DISTINCT CASE WHEN hit_click = 1 THEN user_id END)
            AS BIGINT) AS n_click_users,
       CAST(COUNT(DISTINCT CASE WHEN hit_purchase = 1 THEN user_id END)
            AS BIGINT) AS n_purchase_users
FROM chains
"""


@register("x_funnel_windowed", oracle=_FW_ORACLE)
def x_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed funnel: view → click within {_FW_MIN} min → purchase
    within {_FW_MIN} min of the click, counting distinct users
    completing each prefix. The ordered funnel (q_funnel) never
    expires; this one does — the semantics behind every
    "conversion within the session" report.

    Scale shape: next-click and next-purchase timestamps come from
    min-over-following-frame windows on the single sessionization
    shuffle (no per-user self-join of stage streams, whose product is
    unbounded for hot users). The second hop needs the FOUND click's
    own next-purchase — fetched by one compact equi-join of views
    against the (user, click-ts) grain, which carries two timestamp
    columns and dedupes equal-timestamp clicks with a min. Final
    counts are one distinct-aggregate row. Scan-bound at 100 TB.
    """
    return funnel_windowed_frame(load(spark, sf_dir, "events"))


def funnel_windowed_frame(e: DataFrame) -> DataFrame:
    """Frame-level core of :func:`x_funnel_windowed` (stress-testable
    on synthetic event inputs)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    s = e.select(
        "user_id",
        "ts",
        "event_type",
        F.min(F.when(F.col("event_type") == "click", F.col("ts")))
        .over(w)
        .alias("next_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
        .over(w)
        .alias("next_purchase"),
    )
    clicks = (
        s.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.min("next_purchase").alias("np"))
        .select(
            F.col("user_id").alias("c_uid"), F.col("ts").alias("c_ts"), "np"
        )
    )
    views = s.where(F.col("event_type") == "view")
    win = F.expr(f"INTERVAL {_FW_MIN} MINUTE")
    chains = views.join(
        clicks,
        (views.user_id == clicks.c_uid)
        & (clicks.c_ts == views.next_click),
        "left",
    ).select(
        views.user_id.alias("uid"),
        F.when(
            F.col("next_click").isNotNull()
            & (F.col("next_click") <= views.ts + win),
            1,
        )
        .otherwise(0)
        .alias("hit_click"),
        F.when(
            F.col("next_click").isNotNull()
            & (F.col("next_click") <= views.ts + win)
            & F.col("np").isNotNull()
            & (F.col("np") <= F.col("next_click") + win),
            1,
        )
        .otherwise(0)
        .alias("hit_purchase"),
    )
    return chains.agg(
        F.countDistinct("uid").cast("long").alias("n_view_users"),
        F.countDistinct(F.when(F.col("hit_click") == 1, F.col("uid")))
        .cast("long")
        .alias("n_click_users"),
        F.countDistinct(F.when(F.col("hit_purchase") == 1, F.col("uid")))
        .cast("long")
        .alias("n_purchase_users"),
    )


_TSF_ORACLE = """
WITH ud AS (
    SELECT user_id,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(date_diff('day', TIMESTAMP '2024-01-01',
                          CAST(date_trunc('day', ts) AS TIMESTAMP))
                AS BIGINT) AS day_idx,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(28,4)) AS v
    FROM events
    GROUP BY user_id, date_trunc('day', ts)
)
SELECT user_id, day,
       CAST(v AS DOUBLE) AS value,
       CAST(COALESCE(MAX(v) OVER (PARTITION BY user_id ORDER BY day_idx
                                  RANGE BETWEEN 1 PRECEDING AND 1 PRECEDING),
                     0) AS DOUBLE) AS lag1,
       ROUND(CAST(COALESCE(SUM(v) OVER w7, 0) AS DOUBLE)
             / GREATEST(COUNT(v) OVER w7, 1), 6) AS avg7,
       CAST(COUNT(v) OVER w7 AS BIGINT) AS active7,
       CAST(v - COALESCE(MAX(v) OVER (PARTITION BY user_id ORDER BY day_idx
                                      RANGE BETWEEN 1 PRECEDING
                                                AND 1 PRECEDING),
                         0) AS DOUBLE) AS delta
FROM ud
WINDOW w7 AS (PARTITION BY user_id ORDER BY day_idx
              RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING)
"""


@register("x_ts_features", oracle=_TSF_ORACLE)
def x_ts_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(user, day) time-series feature build: yesterday's spend,
    trailing-7-day mean and active-day count (both EXCLUDING today —
    no target leakage), and day-over-day delta. Frames are RANGE over
    the integer day index, so calendar gaps are exact: after 6 idle
    days the 1-PRECEDING frame is empty (lag1 = 0), where a ROWS
    frame would silently fetch last week's row as "yesterday" — the
    classic leaky-feature bug.

    Scale shape: one map-side-combinable (user, day) aggregate with
    DECIMAL-exact sums, then all four features from two RANGE frames
    over the SAME user window — one shuffle on user_id for the whole
    feature set, rows carrying (day_idx, v) only. Scan-bound at
    100 TB; features append per-day incrementally because every frame
    is trailing-only.
    """
    e = load(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").cast("timestamp_ntz")
    ud = (
        e.groupBy("user_id", day.alias("day"))
        .agg(F.sum(F.col("value").cast("decimal(18,4)")).cast("decimal(28,4)").alias("v"))
        .withColumn(
            "day_idx",
            F.datediff(F.col("day"), F.lit("2024-01-01").cast("date")).cast(
                "long"
            ),
        )
    )
    w1 = (
        Window.partitionBy("user_id")
        .orderBy("day_idx")
        .rangeBetween(-1, -1)
    )
    w7 = (
        Window.partitionBy("user_id")
        .orderBy("day_idx")
        .rangeBetween(-7, -1)
    )
    lag1 = F.coalesce(F.max("v").over(w1), F.lit(0).cast("decimal(28,4)"))
    sum7 = F.coalesce(F.sum("v").over(w7), F.lit(0).cast("decimal(28,4)"))
    cnt7 = F.count("v").over(w7)
    return ud.select(
        "user_id",
        "day",
        F.col("v").cast("double").alias("value"),
        lag1.cast("double").alias("lag1"),
        F.round(
            sum7.cast("double") / F.greatest(cnt7, F.lit(1)), 6
        ).alias("avg7"),
        cnt7.cast("long").alias("active7"),
        (F.col("v") - lag1).cast("double").alias("delta"),
    )
