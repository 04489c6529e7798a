"""§2.B — projection / filter / derivation operators.

These generalize the reference's per-run column mapping: GA dimension
names → target DB columns with declared dtypes, plus derived columns
(timestamp from dateHourMinute+ms, synthetic hit-id) and null handling
for missing custom dimensions [REF-UNVERIFIED: SURVEY.md §2.B]. All are
pure Catalyst expressions — whole-stage-codegen'd, pushdown-friendly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

_PROJECT_RENAME_ORACLE = """
SELECT event_id AS hit_id,
       CAST(ts AS TIMESTAMP) AS hit_ts,
       user_id AS client_id,
       event_type AS hit_type
FROM events
"""


@register("q_project_rename", oracle=_PROJECT_RENAME_ORACLE)
def q_project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-subset projection with rename (GA name → target name map)."""
    e = load(spark, sf_dir, "events")
    return e.select(
        F.col("event_id").alias("hit_id"),
        F.col("ts").alias("hit_ts"),
        F.col("user_id").alias("client_id"),
        F.col("event_type").alias("hit_type"),
    )


_CAST_TYPES_ORACLE = """
SELECT event_id,
       CAST(event_id AS VARCHAR) AS event_id_str,
       CAST(CAST(value AS DECIMAL(12,2)) AS DOUBLE) AS value_dec,
       CAST(ts AS DATE) AS event_date,
       CAST(props->>'$.k' AS INTEGER) AS k_int
FROM events
"""


@register("q_cast_types", oracle=_CAST_TYPES_ORACLE)
def q_cast_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed casts per a declared target schema (str/decimal/date/int).

    The decimal cast is exercised but the driver-visible column is cast
    back to DOUBLE: a raw DecimalType cell renders with trailing zeros
    (``Decimal('6.50')``) on the Spark side while DuckDB's pandas bridge
    yields ``6.5`` — same value, different hash (CORRECTNESS_r02 lesson;
    same rule the dsum/sql_dsum helpers follow).
    """
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.col("event_id").cast("string").alias("event_id_str"),
        F.col("value").cast("decimal(12,2)").cast("double").alias("value_dec"),
        F.col("ts").cast("date").alias("event_date"),
        F.get_json_object("props", "$.k").cast("int").alias("k_int"),
    )


_FILTER_PRED_ORACLE = """
SELECT event_id, user_id, event_type, value
FROM events
WHERE event_type IN ('view', 'click')
  AND value BETWEEN 10 AND 100
  AND props IS NOT NULL
  AND (user_id % 2 = 0 OR value > 50)
"""


@register("q_filter_pred", oracle=_FILTER_PRED_ORACLE)
def q_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound predicate: IN / BETWEEN / IS NOT NULL / AND-OR."""
    e = load(spark, sf_dir, "events")
    return e.where(
        F.col("event_type").isin("view", "click")
        & F.col("value").between(10, 100)
        & F.col("props").isNotNull()
        & ((F.col("user_id") % 2 == 0) | (F.col("value") > 50))
    ).select("event_id", "user_id", "event_type", "value")


_DERIVE_EXPR_ORACLE = """
SELECT event_id,
       CAST(value * 0.9 AS DOUBLE) AS net_value,
       CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS ts_hour,
       CAST(EXTRACT(hour FROM ts) * 60 + EXTRACT(minute FROM ts) AS INT)
           AS min_of_day
FROM events
"""


@register("q_derive_expr", oracle=_DERIVE_EXPR_ORACLE)
def q_derive_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived scalar columns (the reference's transform step analogue)."""
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        (F.col("value") * 0.9).alias("net_value"),
        F.date_trunc("hour", "ts").alias("ts_hour"),
        (F.hour("ts") * 60 + F.minute("ts")).cast("int").alias("min_of_day"),
    )


_CASE_WHEN_ORACLE = """
SELECT event_id, event_type, value,
       CASE WHEN value < 10 THEN 'low'
            WHEN value < 100 THEN 'mid'
            ELSE 'high' END AS value_tier,
       CASE WHEN event_type IN ('purchase', 'signup') THEN 'conversion'
            WHEN event_type = 'error' THEN 'problem'
            ELSE 'engagement' END AS channel_group
FROM events
"""


@register("q_case_when", oracle=_CASE_WHEN_ORACLE)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing (channel-grouping-style classification)."""
    e = load(spark, sf_dir, "events")
    tier = (
        F.when(F.col("value") < 10, "low")
        .when(F.col("value") < 100, "mid")
        .otherwise("high")
    )
    grp = (
        F.when(F.col("event_type").isin("purchase", "signup"), "conversion")
        .when(F.col("event_type") == "error", "problem")
        .otherwise("engagement")
    )
    return e.select(
        "event_id",
        "event_type",
        "value",
        tier.alias("value_tier"),
        grp.alias("channel_group"),
    )


_NULL_HANDLING_ORACLE = """
SELECT event_id,
       COALESCE(NULLIF(event_type, 'error'), 'unknown') AS et_clean,
       COALESCE(NULLIF(CAST(props->>'$.k' AS INTEGER), 0), -1) AS k_filled,
       CASE WHEN NULLIF(event_type, 'error') IS NULL THEN 1 ELSE 0 END
           AS was_null
FROM events
WHERE value IS NOT NULL
"""


@register("q_null_handling", oracle=_NULL_HANDLING_ORACLE)
def q_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULLIF / COALESCE / IS NULL semantics (missing custom dims)."""
    e = load(spark, sf_dir, "events").where(F.col("value").isNotNull())
    et_nulled = F.nullif(F.col("event_type"), F.lit("error"))
    k = F.get_json_object("props", "$.k").cast("int")
    return e.select(
        "event_id",
        F.coalesce(et_nulled, F.lit("unknown")).alias("et_clean"),
        F.coalesce(F.nullif(k, F.lit(0)), F.lit(-1)).alias("k_filled"),
        F.when(et_nulled.isNull(), 1).otherwise(0).alias("was_null"),
    )
