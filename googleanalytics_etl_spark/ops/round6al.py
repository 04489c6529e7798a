"""Round-6 batch 38: SQL-surface completions — regex functions,
native session-window TVF.

- ``q_fn_regex`` — the regular-expression function family
  (extract / replace-all / count / match) over the events property
  blob. Dialect note pinned here: Spark regexes are Java, DuckDB's
  are RE2 — the op sticks to the shared subset (``\\d``, literal
  braces, anchors) and the oracle passes DuckDB's ``'g'`` flag where
  Spark's ``regexp_replace`` is global by default.
- ``q_session_window_tvf`` — sessionization via Spark's NATIVE
  ``session_window`` TVF (the engine-managed merging that also powers
  streaming session state), cross-checked against the manual
  gap-and-cumsum recipe. Semantics differ from q_sessionize at one
  boundary: the TVF closes a session when the gap is ≥ the timeout
  (window end is exclusive), the manual rule splits only when
  STRICTLY greater — the oracle mirrors the TVF.

Reference parity: no analogue [REF-UNVERIFIED — /root/reference is
empty]; SURVEY §2.G scalar functions / §2.E sessionization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

_REGEX_ORACLE = r"""
SELECT event_id,
       CAST(regexp_extract(props, '(\d+)', 1) AS BIGINT) AS k_val,
       regexp_replace(props, '\d+', '#', 'g') AS masked,
       CAST(len(regexp_extract_all(props, '\d+')) AS BIGINT) AS n_nums,
       CASE WHEN regexp_matches(props, '^\{"k": \d+\}$')
            THEN 1 ELSE 0 END AS wellformed
FROM events
"""


@register("q_fn_regex", oracle=_REGEX_ORACLE)
def q_fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex function surface: first-number extraction (cast exact),
    global digit masking, match counting, and full-string validation.
    Patterns stay inside the Java∩RE2 dialect intersection (digit
    classes, escaped braces, anchors); Spark's ``regexp_replace`` is
    global by default where DuckDB needs the ``'g'`` flag — the kind
    of dialect trap this key exists to pin.

    Scale shape: four row-local codegen expressions over one scan —
    no shuffle at all; regex compilation hoists out of the loop in
    whole-stage codegen. Scan-bound at 100 TB.
    """
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.regexp_extract("props", r"(\d+)", 1).cast("long").alias("k_val"),
        F.regexp_replace("props", r"\d+", "#").alias("masked"),
        F.regexp_count("props", F.lit(r"\d+")).cast("long").alias("n_nums"),
        F.when(F.col("props").rlike(r'^\{"k": \d+\}$'), 1)
        .otherwise(0)
        .alias("wellformed"),
    )


_SWT_ORACLE = """
WITH e AS (
    SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
    FROM events
), flagged AS (
    SELECT *,
           CASE WHEN LAG(ts) OVER w IS NULL
                  OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS is_new
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sess AS (
    SELECT *,
           SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
    FROM flagged
)
SELECT user_id,
       MIN(ts) AS sess_start,
       MAX(ts) + INTERVAL 30 MINUTE AS sess_end,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_purchases
FROM sess GROUP BY user_id, sid
"""


@register("q_session_window_tvf", oracle=_SWT_ORACLE)
def q_session_window_tvf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via the native ``session_window`` TVF: the
    engine merges events whose [ts, ts+30 min) windows chain-overlap
    and returns the merged window struct — flattened here to plain
    timestamp columns (the driver hashes no structs). The oracle
    re-derives the identical sessions with the gap-and-cumsum recipe
    under the TVF's boundary rule (a gap of EXACTLY the timeout
    closes the session — window ends are exclusive), documenting the
    one-boundary divergence from q_sessionize's strict-greater rule.

    Scale shape: one shuffle on ``user_id`` + the TVF's sort-merge of
    per-user windows — identical exchange structure to the manual
    recipe, but the merging runs inside the engine's codegen session
    state instead of two window passes. This is also the exact
    batch/streaming-parity surface: the same TVF drives
    s_session/s_session_dynamic. Scan-bound at 100 TB.
    """
    e = load(spark, sf_dir, "events")
    s = e.groupBy(
        "user_id", F.session_window("ts", "30 minutes").alias("w")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("n_purchases"),
    )
    return s.select(
        "user_id",
        F.col("w.start").cast("timestamp_ntz").alias("sess_start"),
        F.col("w.end").cast("timestamp_ntz").alias("sess_end"),
        "n_events",
        "n_purchases",
    )
