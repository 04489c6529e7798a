"""Flagship composed pipelines (SURVEY.md §2 "Flagship query").

``q_sessionize`` / ``q_flagship`` re-express the reference's semantic
heart — grouping a hit log into sessions and computing per-session
metrics. The reference does this between pandas and post-load SQL on the
synced hit table [REF-UNVERIFIED: SURVEY.md §2.E "THE core GA concept"];
here it is a single shuffle: events are hash-partitioned by ``user_id``
once, and the lag-window, the gap flag, the cumulative session id, the
first/last-touch window and the final per-session aggregation all reuse
that partitioning (Catalyst plans one Exchange — asserted in
tests/test_plans.py).

Scale note (100 TB): sessionization shuffles the full event log on
``user_id``. That is the minimum possible data movement for gap
sessionization (state must be co-located per user). Skewed users (bots)
are handled by AQE skew-join/partition splitting; the window itself
streams per partition (no per-user materialization).

Gap rule pinned per SURVEY.md §7 hard-part (3): a new session starts when
``ts - lag(ts) > INTERVAL 30 MINUTES`` — strictly greater, encoded
identically in the DataFrame plan and the oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import dsum, fscaled, fsum, register, sql_dsum

GAP_MINUTES = 30

# Shared CTE prefix: sessionized events (identical window SQL runs in
# DuckDB — verified in SURVEY.md §5 with 946 sessions at sf0.001).
_SESSIONIZED_CTE = f"""
WITH e AS (
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
    FROM events
), flagged AS (
    SELECT *,
           CASE WHEN LAG(ts) OVER w IS NULL
                  OR ts - LAG(ts) OVER w > INTERVAL {GAP_MINUTES} MINUTE
                THEN 1 ELSE 0 END AS is_new
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
    SELECT *,
           CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
    FROM flagged
)
"""


def sessionize(events: DataFrame, gap_minutes: int = GAP_MINUTES) -> DataFrame:
    """Assign a per-user ordinal ``session_id`` to each event.

    New session when the gap to the previous event of the same user is
    strictly greater than ``gap_minutes``. One shuffle on ``user_id``;
    both windows share the (user_id; ts, event_id) sort.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Exact µs gap (casting to long would truncate to seconds and disagree
    # with the oracle's INTERVAL comparison on sub-second boundaries).
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap_us = us - F.lag(us).over(w)
    is_new = (
        F.when(F.lag("ts").over(w).isNull(), 1)
        .when(gap_us > gap_minutes * 60 * 1_000_000, 1)
        .otherwise(0)
    )
    cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn("is_new", is_new).withColumn(
        "session_id", F.sum("is_new").over(cum).cast("long")
    )


_SESSIONIZE_ORACLE = (
    _SESSIONIZED_CTE
    + """
SELECT event_id, ts, user_id, event_type, value, session_id
FROM sess
"""
)


@register("q_sessionize", oracle=_SESSIONIZE_ORACLE)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap sessionization: per-user ordinal session id on the event log."""
    e = load(spark, sf_dir, "events")
    return sessionize(e).select(
        "event_id", "ts", "user_id", "event_type", "value", "session_id"
    )


def session_metrics(events: DataFrame) -> DataFrame:
    """Per-session aggregate: the ``sessions`` derived fixture of FIXTURES.md.

    Composes q_sessionize + q_groupby_agg + q_first_last_touch. The
    first/last-touch windows and the groupBy reuse the sessionize
    partitioning (user_id is a prefix of the grouping key) — no second
    shuffle of the event log.
    """
    s = sessionize(events)
    w = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    s = s.withColumn("first_event_type", F.first("event_type").over(w)).withColumn(
        "last_event_type", F.last("event_type").over(wfull)
    )
    purchase = F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(
        F.lit(0.0)
    )
    return s.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        fsum(purchase, "purchase_value"),  # value is 2-decimal exact
        F.first("first_event_type").alias("first_event_type"),
        F.first("last_event_type").alias("last_event_type"),
    )


_FLAGSHIP_ORACLE = (
    _SESSIONIZED_CTE
    + f"""
, touched AS (
    SELECT *,
           FIRST_VALUE(event_type) OVER (PARTITION BY user_id, session_id
               ORDER BY ts, event_id) AS first_event_type,
           LAST_VALUE(event_type) OVER (PARTITION BY user_id, session_id
               ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS last_event_type
    FROM sess
)
SELECT user_id, session_id,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       COUNT(*) AS n_events,
       {sql_dsum("CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END", "purchase_value")},
       MIN(first_event_type) AS first_event_type,
       MIN(last_event_type) AS last_event_type
FROM touched
GROUP BY user_id, session_id
"""
)


@register("q_flagship", oracle=_FLAGSHIP_ORACLE)
def q_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionize events, then per-session metrics (length/count/value/touch)."""
    return session_metrics(load(spark, sf_dir, "events"))


_FLAGSHIP2_ORACLE = f"""
SELECT r_name, n_name,
       CAST(GROUPING(r_name) AS INT) AS g_region,
       CAST(GROUPING(n_name) AS INT) AS g_nation,
       COUNT(*) AS n_lines,
       {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
GROUP BY ROLLUP (r_name, n_name)
"""


@register("q_flagship2", oracle=_FLAGSHIP2_ORACLE)
def q_flagship2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join (TPC-H-Q5-like): fact × 4 dims, filter, rollup revenue.

    The dimension tables are broadcast (region/nation/customer are tiny at
    every scale factor; AQE would also auto-convert) so the only shuffle
    is the rollup aggregation of the fact table.
    """
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz")
    )
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    # Pre-aggregate per (region, nation) BEFORE the rollup: the Expand
    # operator then triples ~|nations| partial rows instead of the full
    # fact table — at 100 TB the rollup re-aggregates KBs of partials.
    # Exactness holds because the scaled-long sums are associative
    # (2-dec × 2-dec revenue = 4-dec exact; registry.py fast path).
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = joined.groupBy("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("pn"), F.sum(fscaled(revenue)).alias("ps")
    )
    return (
        base.rollup("r_name", "n_name")
        .agg(
            F.grouping("r_name").cast("int").alias("g_region"),
            F.grouping("n_name").cast("int").alias("g_nation"),
            F.sum("pn").alias("n_lines"),
            (F.sum("ps") / 10_000.0).alias("revenue"),
        )
        .select("r_name", "n_name", "g_region", "g_nation", "n_lines", "revenue")
    )


_FUNNEL_ORACLE = """
WITH flagged AS (
    SELECT user_id, ts, event_type,
           MIN(CASE WHEN event_type = 'view' THEN ts END) OVER w AS v
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
clicked AS (
    SELECT user_id, ts, event_type, v,
           MIN(CASE WHEN event_type = 'click' AND v < ts THEN ts END)
               OVER w AS c
    FROM flagged
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_type
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT CAST(COUNT(DISTINCT CASE WHEN event_type = 'view'
                                THEN user_id END) AS BIGINT) AS n_view,
       CAST(COUNT(DISTINCT CASE WHEN event_type = 'click' AND v < ts
                                THEN user_id END) AS BIGINT) AS n_click,
       CAST(COUNT(DISTINCT CASE WHEN event_type = 'purchase' AND c < ts
                                THEN user_id END) AS BIGINT) AS n_purchase
FROM clicked
"""


@register("q_funnel", oracle=_FUNNEL_ORACLE)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis (view → click → purchase, strictly later
    stages): how many users reach each stage IN ORDER — the classic
    GA conversion-funnel report.

    Single window pass per user (the sessionization partitioning):
    a running MIN of view timestamps flags order-respecting clicks, and
    a running MIN over those flags order-respecting purchases — no
    self-joins, no per-stage scans; one user_id shuffle for any funnel
    depth. Strict '<' comparisons make equal-timestamp stages not count
    (deterministic in both engines regardless of frame peers).
    """
    e = load(spark, sf_dir, "events")
    w1 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = e.withColumn(
        "v", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w1)
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_type")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    clicked = flagged.withColumn(
        "c",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("v") < F.col("ts")),
                F.col("ts"),
            )
        ).over(w2),
    )
    return clicked.agg(
        F.countDistinct(
            F.when(F.col("event_type") == "view", F.col("user_id"))
        ).cast("long").alias("n_view"),
        F.countDistinct(
            F.when(
                (F.col("event_type") == "click") & (F.col("v") < F.col("ts")),
                F.col("user_id"),
            )
        ).cast("long").alias("n_click"),
        F.countDistinct(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("c") < F.col("ts")),
                F.col("user_id"),
            )
        ).cast("long").alias("n_purchase"),
    )


_RETENTION_ORACLE = """
WITH d AS (
    SELECT user_id,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           MIN(CAST(date_trunc('day', ts) AS TIMESTAMP))
               OVER (PARTITION BY user_id) AS cohort_day
    FROM events
)
SELECT cohort_day,
       CAST(date_diff('day', cohort_day, day) AS BIGINT) AS day_offset,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
FROM d
GROUP BY cohort_day, day_offset
"""


@register("q_retention", oracle=_RETENTION_ORACLE)
def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity day; how many
    are active again N days later — the GA cohort report.

    The cohort day comes from an unordered per-user window MIN (no sort,
    one user_id shuffle), then a (cohort, offset) distinct-count
    aggregate. At 100 TB the distinct-count is the cost center; the
    documented approximate form swaps in approx_count_distinct.
    """
    e = load(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").cast("timestamp_ntz")
    w = Window.partitionBy("user_id")
    d = e.select("user_id", day.alias("day")).withColumn(
        "cohort_day", F.min("day").over(w)
    )
    return (
        d.withColumn(
            "day_offset", F.datediff("day", "cohort_day").cast("long")
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").cast("long").alias("n_active"))
    )


_ANOMALY_ORACLE = """
WITH daily AS (
    SELECT event_type,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY 1, 2
),
m AS (
    SELECT event_type, day, n,
           CAST(COUNT(*) OVER w AS BIGINT) AS cnt,
           CAST(SUM(n) OVER w AS BIGINT) AS s1,
           CAST(SUM(n * n) OVER w AS BIGINT) AS s2
    FROM daily
    WINDOW w AS (PARTITION BY event_type)
)
SELECT event_type, day, n,
       ROUND((n - s1 / cnt)
             / sqrt((s2 - s1 * s1 / cnt) / NULLIF(cnt - 1, 0)), 6) AS z
FROM m
"""


@register("q_anomaly_zscore", oracle=_ANOMALY_ORACLE)
def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series anomaly scoring: z-score of each day's event count
    against that event type's 30-day distribution — the traffic-spike /
    outage detector a GA-style pipeline runs over its daily rollups.

    Determinism: the moments (count, Σn, Σn²) are **exact integer
    sums** — no float accumulation order anywhere — and the final
    mean/variance/z arithmetic is a fixed-shape IEEE expression, so both
    engines produce bit-identical doubles (same trick as the
    decimal-moment stddev in q_agg_stats). One shuffle for the daily
    aggregate; the per-type window runs over ~30 partial rows per type.
    """
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("timestamp_ntz").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = Window.partitionBy("event_type")
    n = F.col("n")
    cnt = F.count(F.lit(1)).over(w).cast("long")
    s1 = F.sum("n").over(w).cast("long")
    s2 = F.sum(n * n).over(w).cast("long")
    # NULLIF guard: an event type observed on a single day has variance
    # denominator 0 — both engines must yield NULL z, not an error or an
    # engine-specific div-by-zero value
    z = F.round(
        (n - s1 / cnt)
        / F.sqrt((s2 - s1 * s1 / cnt) / F.nullif(cnt - F.lit(1), F.lit(0))),
        6,
    )
    return daily.select("event_type", "day", "n", z.alias("z"))


_ATTRIBUTION_ORACLE = """
WITH conv AS (
    SELECT user_id, ts AS c_ts, value AS c_value
    FROM (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
        FROM events WHERE event_type = 'purchase'
    ) WHERE rn = 1
), touches AS (
    SELECT e.user_id, e.event_type, conv.c_value,
           ROW_NUMBER() OVER (PARTITION BY e.user_id
                              ORDER BY CAST(e.ts AS TIMESTAMP), e.event_id) AS rna,
           ROW_NUMBER() OVER (PARTITION BY e.user_id
                              ORDER BY CAST(e.ts AS TIMESTAMP) DESC,
                                       e.event_id DESC) AS rnd,
           COUNT(*) OVER (PARTITION BY e.user_id) AS n
    FROM events e JOIN conv ON e.user_id = conv.user_id
    WHERE e.event_type IN ('view', 'click')
      AND CAST(e.ts AS TIMESTAMP) < conv.c_ts
), credited AS (
    SELECT event_type, user_id,
           c_value * CASE WHEN n = 1 THEN CAST(1.0 AS DOUBLE)
                          WHEN n = 2 THEN CAST(0.5 AS DOUBLE)
                          WHEN rna = 1 OR rnd = 1 THEN CAST(0.4 AS DOUBLE)
                          ELSE CAST(0.2 AS DOUBLE) / (n - 2) END AS credit
    FROM touches
)
SELECT event_type AS channel,
       CAST(SUM(CAST(credit AS DECIMAL(18,4))) AS DOUBLE) AS attributed_value,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(COUNT(*) AS BIGINT) AS n_touches
FROM credited GROUP BY event_type
"""


@register("q_attribution", oracle=_ATTRIBUTION_ORACLE)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch attribution (U-shaped / position-based): each user's
    first purchase distributes its value across the view/click touches
    that preceded it — 40% to the first touch, 40% to the last, 20%
    split across the middle (100% / 50-50 for 1- and 2-touch paths) —
    then credit rolls up per touch channel. The GA-analytics question
    "which channel earns the conversions" answered without last-click
    bias.

    Scale shape: every step is keyed on ``user_id`` (conversion pick,
    touch join, position windows), so one hash partitioning serves the
    whole pipeline until the final small per-channel rollup; only
    (user_id, ts, type, value) ever shuffles. Determinism: window
    orders carry the (ts, event_id) tiebreak, weights are fixed-shape
    IEEE expressions, and the credit sum crosses engines through the
    exact DECIMAL(18,4) path (registry.dsum).
    """
    e = load(spark, sf_dir, "events")
    wp = Window.partitionBy("user_id").orderBy("ts", "event_id")
    conv = (
        e.where(F.col("event_type") == "purchase")
        .withColumn("rn", F.row_number().over(wp))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("ts").alias("c_ts"),
            F.col("value").alias("c_value"),
        )
    )
    touches = (
        e.where(F.col("event_type").isin("view", "click"))
        .join(conv, "user_id")
        .where(F.col("ts") < F.col("c_ts"))
    )
    wa = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wd = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    wn = Window.partitionBy("user_id")
    positioned = touches.select(
        "user_id",
        "event_type",
        "c_value",
        F.row_number().over(wa).alias("rna"),
        F.row_number().over(wd).alias("rnd"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    n = F.col("n")
    weight = (
        F.when(n == 1, F.lit(1.0))
        .when(n == 2, F.lit(0.5))
        .when((F.col("rna") == 1) | (F.col("rnd") == 1), F.lit(0.4))
        .otherwise(F.lit(0.2) / (n - 2))
    )
    credited = positioned.select(
        "event_type", "user_id", (F.col("c_value") * weight).alias("credit")
    )
    return credited.groupBy(F.col("event_type").alias("channel")).agg(
        dsum("credit", "attributed_value"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.count(F.lit(1)).cast("long").alias("n_touches"),
    )
