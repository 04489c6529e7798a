"""Round-6 batch 36: behavior-flow paths + concurrency sweep-line.

- ``x_session_paths`` — the GA "behavior flow" report: the top
  {_PATH_TOPK} session paths (first {_PATH_LEN} event types joined
  with ``>``), each with session count, conversion rate (any purchase
  in the session), and mean session length. Built on the SAME
  sessionization used by q_sessionize (flagship.sessionize), so path
  counts reconcile against the sessions fixture.
- ``x_peak_concurrency`` — peak concurrent sessions per day by
  sweep-line: every session contributes a +1 at its start and a −1
  at its end (inclusive; at equal timestamps starts sort before ends
  so touching sessions overlap), the running sum over the fully
  tiebroken sweep order is instantaneous concurrency, and each day
  reports its peak and the earliest time it was reached — the
  capacity-planning number (max simultaneous load), which no
  per-hour count can produce when sessions straddle bucket edges.

Reference parity: no analogue [REF-UNVERIFIED — /root/reference is
empty]; SURVEY §2.E GA analytics extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register
from .flagship import _SESSIONIZED_CTE, sessionize

_PATH_LEN = 5  # path prefix length
_PATH_TOPK = 20  # paths reported

_PATHS_ORACLE = (
    _SESSIONIZED_CTE
    + f"""
, ranked AS (
    SELECT user_id, session_id, event_type,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv,
           ROW_NUMBER() OVER (PARTITION BY user_id, session_id
                              ORDER BY ts, event_id) AS rn
    FROM sess
), per_session AS (
    SELECT user_id, session_id,
           string_agg(CASE WHEN rn <= {_PATH_LEN} THEN event_type END,
                      '>' ORDER BY rn) AS path,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MAX(conv) AS converted
    FROM ranked GROUP BY user_id, session_id
), per_path AS (
    SELECT path,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(converted) AS BIGINT) AS n_converted,
           ROUND(CAST(SUM(converted) AS DOUBLE) / COUNT(*), 6) AS conv_rate,
           ROUND(CAST(SUM(n_events) AS DOUBLE) / COUNT(*), 6) AS avg_events
    FROM per_session GROUP BY path
)
SELECT path, n_sessions, n_converted, conv_rate, avg_events
FROM (
    SELECT *, ROW_NUMBER() OVER (ORDER BY n_sessions DESC, path) AS rk
    FROM per_path
) WHERE rk <= {_PATH_TOPK}
"""
)


@register("x_session_paths", oracle=_PATHS_ORACLE)
def x_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavior-flow paths: sessionize (the shared 30-min gap rule),
    take each session's first {_PATH_LEN} event types as a ``>``-joined
    path, and report the top {_PATH_TOPK} paths with session count,
    conversion rate, and mean session length. The report that answers
    "what do converting sessions DO differently?".

    Scale shape: sessionization's one user shuffle, then a
    (user, session)-grain aggregate that reuses the same partitioning
    (user_id is a prefix of the key); the path string is assembled
    from a ≤ {_PATH_LEN}-element conditional collect (collect_list
    drops the NULLs the rn-filter leaves), sorted by the rank struct —
    never an unbounded per-session array. Path-grain aggregation is
    path-domain-sized; only the top-{_PATH_TOPK} window touches the
    final frame. Scan-bound at 100 TB.
    """
    e = load(spark, sf_dir, "events")
    s = sessionize(e)
    rn = F.row_number().over(
        Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    )
    ranked = s.select(
        "user_id",
        "session_id",
        "event_type",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "conv"
        ),
        rn.alias("rn"),
    )
    per_session = ranked.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("rn") <= _PATH_LEN,
                            F.struct("rn", "event_type"),
                        )
                    )
                ),
                lambda st: st.event_type,
            ),
            ">",
        ).alias("path"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.max("conv").alias("converted"),
    )
    per_path = per_session.groupBy("path").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum("converted").cast("long").alias("n_converted"),
        F.round(F.sum("converted").cast("double") / F.count(F.lit(1)), 6)
        .alias("conv_rate"),
        F.round(F.sum("n_events").cast("double") / F.count(F.lit(1)), 6)
        .alias("avg_events"),
    )
    rk = F.row_number().over(
        Window.orderBy(F.col("n_sessions").desc(), "path")
    )
    return (
        per_path.withColumn("rk", rk)
        .where(F.col("rk") <= _PATH_TOPK)
        .drop("rk")
    )


_PEAK_ORACLE = (
    _SESSIONIZED_CTE
    + """
, bounds AS (
    SELECT user_id, session_id,
           MIN(ts) AS s_ts, MAX(ts) AS e_ts
    FROM sess GROUP BY user_id, session_id
), sweep AS (
    SELECT s_ts AS ts, 1 AS delta, user_id, session_id FROM bounds
    UNION ALL
    SELECT e_ts AS ts, -1 AS delta, user_id, session_id FROM bounds
), running AS (
    SELECT ts,
           CAST(SUM(delta) OVER (ORDER BY ts, delta DESC, user_id,
                                 session_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) AS BIGINT)
               AS conc
    FROM sweep
), daily AS (
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, ts, conc,
           MAX(conc) OVER (PARTITION BY date_trunc('day', ts)) AS peak
    FROM running
)
SELECT day,
       CAST(MAX(peak) AS BIGINT) AS peak_concurrency,
       MIN(CASE WHEN conc = peak THEN ts END) AS peak_ts
FROM daily GROUP BY day
"""
)


@register("x_peak_concurrency", oracle=_PEAK_ORACLE)
def x_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day, by sweep-line: +1 at each
    session start, −1 at each end (inclusive intervals — at equal
    timestamps the +1 sorts first, so a session starting exactly when
    another ends counts as overlap), running sum = instantaneous
    concurrency, then per day the peak and the earliest timestamp
    attaining it. Bucketed counts (events per hour) cannot answer
    this — a session spanning bucket edges is double-counted or lost;
    the sweep is exact.

    Scale shape: sessions reduce to 2 sweep rows each (two small
    columns); the running sum is ONE globally ordered window — the
    same range-partitioned global-sort shape as q_running_sum /
    q_global_rank, on a frame 2×sessions ≪ events. The sweep order is
    fully tiebroken (ts, delta desc, user, session) so both engines
    compute identical per-row concurrency. Daily peaks are a
    domain-sized aggregate. At 100 TB, shard the sweep by day first
    (sessions rarely straddle days; those that do contribute boundary
    rows to both shards) — documented upgrade, same output.
    """
    return peak_concurrency_frame(load(spark, sf_dir, "events"))


def peak_concurrency_frame(e: DataFrame) -> DataFrame:
    """Frame-level core of :func:`x_peak_concurrency` (stress-testable
    on synthetic event inputs)."""
    s = sessionize(e)
    bounds = s.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("s_ts"), F.max("ts").alias("e_ts")
    )
    sweep = bounds.select(
        F.col("s_ts").alias("ts"),
        F.lit(1).alias("delta"),
        "user_id",
        "session_id",
    ).unionAll(
        bounds.select(
            F.col("e_ts").alias("ts"),
            F.lit(-1).alias("delta"),
            "user_id",
            "session_id",
        )
    )
    w = Window.orderBy(
        "ts", F.col("delta").desc(), "user_id", "session_id"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    running = sweep.select(
        "ts", F.sum("delta").over(w).cast("long").alias("conc")
    )
    day = F.date_trunc("day", "ts").cast("timestamp_ntz")
    daily = running.select(
        day.alias("day"),
        "ts",
        "conc",
        F.max("conc").over(Window.partitionBy(day)).alias("peak"),
    )
    return daily.groupBy("day").agg(
        F.max("peak").cast("long").alias("peak_concurrency"),
        F.min(
            F.when(F.col("conc") == F.col("peak"), F.col("ts"))
        ).alias("peak_ts"),
    )
