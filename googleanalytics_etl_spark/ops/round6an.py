"""Round-6 batch 40: funnel-window sensitivity + gap distribution.

- ``x_funnel_window_sweep`` — the windowed funnel (x_funnel_windowed)
  swept across conversion-window widths ({_SWEEP_MINUTES} minutes):
  per width, the distinct users completing view→click and
  view→click→purchase. The sensitivity curve that tells an analyst
  whether a reported conversion rate is an artifact of the window
  choice — computed in ONE pass: the next-stage timestamps are
  width-independent, so every width is a conditional aggregate over
  the same chains frame, not a re-run.
- ``x_gap_histogram`` — the distribution of inter-event gaps per user
  in log2 buckets of seconds, overall and per event type of the
  earlier event. This is the histogram that JUSTIFIES the 30-minute
  sessionization gap: a bimodal gap distribution has its valley where
  the session threshold belongs (and the bucket boundaries bracketing
  1800 s make that visible directly).

Reference parity: no analogue [REF-UNVERIFIED — /root/reference is
empty]; SURVEY §2.E GA analytics extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

_SWEEP_MINUTES = [10, 60, 360, 1440]  # window widths swept

_SWEEP_CASES_SQL = "\n".join(
    f"""       CAST(COUNT(DISTINCT CASE WHEN next_click IS NOT NULL
                 AND next_click <= ts + INTERVAL {m} MINUTE
                THEN user_id END) AS BIGINT) AS click_users_{m}m,
       CAST(COUNT(DISTINCT CASE WHEN next_click IS NOT NULL
                 AND next_click <= ts + INTERVAL {m} MINUTE
                 AND np IS NOT NULL
                 AND np <= next_click + INTERVAL {m} MINUTE
                THEN user_id END) AS BIGINT) AS purchase_users_{m}m,"""
    for m in _SWEEP_MINUTES
)

_SWEEP_ORACLE = f"""
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
    SELECT v.user_id, v.ts, v.next_click, c.np
    FROM s v LEFT JOIN clicks c
      ON c.user_id = v.user_id AND c.ts = v.next_click
    WHERE v.event_type = 'view'
)
SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_view_users,
{_SWEEP_CASES_SQL}
       CAST(COUNT(*) AS BIGINT) AS n_views
FROM chains
"""


@register("x_funnel_window_sweep", oracle=_SWEEP_ORACLE)
def x_funnel_window_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-window sensitivity sweep: the x_funnel_windowed chain
    evaluated at {_SWEEP_MINUTES}-minute widths simultaneously. The
    chain frame (each view's next click, that click's next purchase)
    is width-independent — every width is one conditional
    COUNT(DISTINCT) over it, so sweeping 4 widths costs the same scan
    as measuring one. Monotonicity across widths (wider window ⥸ more
    conversions) is pinned in tests.

    Scale shape: identical to x_funnel_windowed (window passes on the
    one user stream + a compact equi-join) — the sweep adds only
    fixed-shape conditional aggregates; output is ONE row. Scan-bound
    at 100 TB.
    """
    e = load(spark, sf_dir, "events")
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
    chains = views.join(
        clicks,
        (views.user_id == clicks.c_uid) & (clicks.c_ts == views.next_click),
        "left",
    ).select(views.user_id.alias("uid"), views.ts.alias("v_ts"),
             "next_click", "np")
    aggs = [F.countDistinct("uid").cast("long").alias("n_view_users")]
    for m in _SWEEP_MINUTES:
        win = F.expr(f"INTERVAL {m} MINUTE")
        hit_click = F.col("next_click").isNotNull() & (
            F.col("next_click") <= F.col("v_ts") + win
        )
        hit_purchase = (
            hit_click
            & F.col("np").isNotNull()
            & (F.col("np") <= F.col("next_click") + win)
        )
        aggs.append(
            F.countDistinct(F.when(hit_click, F.col("uid")))
            .cast("long")
            .alias(f"click_users_{m}m")
        )
        aggs.append(
            F.countDistinct(F.when(hit_purchase, F.col("uid")))
            .cast("long")
            .alias(f"purchase_users_{m}m")
        )
    aggs.append(F.count(F.lit(1)).cast("long").alias("n_views"))
    return chains.agg(*aggs)


_GAP_ORACLE = """
WITH gaps AS (
    SELECT LAG(event_type) OVER w AS prev_type,
           CAST(date_diff('microsecond', LAG(ts) OVER w, ts) AS BIGINT)
               AS gap_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), b AS (
    SELECT prev_type,
           CAST(length(bin(GREATEST(gap_us // 1000000, 1))) - 1 AS BIGINT)
               AS bucket,
           gap_us
    FROM gaps WHERE gap_us IS NOT NULL
), tot AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM b
)
SELECT b.bucket,
       b.prev_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(b.gap_us) AS BIGINT) AS min_gap_us,
       CAST(MAX(b.gap_us) AS BIGINT) AS max_gap_us,
       ROUND(CAST(COUNT(*) AS DOUBLE) / MAX(tot.n_total), 6) AS share
FROM b CROSS JOIN tot
GROUP BY b.bucket, b.prev_type
"""


@register("x_gap_histogram", oracle=_GAP_ORACLE)
def x_gap_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap distribution in log2-second buckets, split by
    the PRECEDING event's type: bucket = ⌊log2(max(gap_s, 1))⌋
    computed as bit length − 1 (exact integer — the x_graph_degree_dist
    idiom, immune to LN-ratio last-ulp flips at powers of two). Bucket
    10 ≈ 17 min and bucket 11 ≈ 34 min bracket the 30-minute session
    gap — THIS histogram's valley is the empirical justification for
    that threshold.

    Scale shape: one lag over the sessionization window (µs-exact
    integer gaps — float seconds would disagree with the oracle on
    sub-second boundaries), then a (bucket × type)-domain aggregate
    plus a 1-row total broadcast. Scan-bound at 100 TB.
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gaps = e.select(
        F.lag("event_type").over(w).alias("prev_type"),
        (us - F.lag(us).over(w)).cast("long").alias("gap_us"),
    ).where(F.col("gap_us").isNotNull())
    bucket = (
        F.length(
            F.bin(F.greatest(F.expr("gap_us div 1000000"), F.lit(1)))
        )
        - 1
    ).cast("long")
    b = gaps.select(bucket.alias("bucket"), "prev_type", "gap_us")
    tot = b.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    return (
        b.crossJoin(F.broadcast(tot))
        .groupBy("bucket", "prev_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("gap_us").cast("long").alias("min_gap_us"),
            F.max("gap_us").cast("long").alias("max_gap_us"),
            F.round(
                F.count(F.lit(1)).cast("double") / F.max("n_total"), 6
            ).alias("share"),
        )
    )
