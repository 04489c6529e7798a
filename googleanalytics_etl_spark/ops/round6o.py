"""Round-6 batch 15: k-anonymity audit and churn label generation.

- ``x_privacy_kanon`` — the k-anonymity audit that gates a data
  release: equivalence classes over the quasi-identifier pair
  (event_type, day), bucketed by how many distinct users each class
  contains. Classes below k are re-identification risks the release
  must suppress or generalize; this table is the evidence either way
  (complements ``x_dp_groupby``'s noise mechanism and
  ``x_pii_scrub``'s redaction).
- ``x_churn_label`` — supervised-label generation from behavior: per
  user, activity features (events, purchases, recency against the
  log's horizon) and the churn label (no activity on the
  log's final day — fixture-scaled horizon). The labeled feature table a training pipeline joins straight
  into ``x_train_val_test``.

Reference parity: no analogue [REF-UNVERIFIED — /root/reference is
empty]; SURVEY §2.J-M curation/privacy extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

_KANON_K = 5

_KANON_ORACLE = f"""
WITH classes AS (
    SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
           CAST(json_extract(props, '$.k') AS INT) // 10 AS k_band,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS class_users,
           CAST(COUNT(*) AS BIGINT) AS class_rows
    FROM events GROUP BY 1, 2, 3
)
SELECT CAST(CASE WHEN class_users = 1 THEN 0
                 WHEN class_users < {_KANON_K} THEN 1
                 WHEN class_users < 10 THEN 2
                 ELSE 3 END AS BIGINT) AS bucket,
       CAST(CASE WHEN class_users < {_KANON_K} THEN 1 ELSE 0 END AS BIGINT)
           AS at_risk,
       CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(SUM(class_users) AS BIGINT) AS n_users,
       CAST(SUM(class_rows) AS BIGINT) AS n_rows
FROM classes
GROUP BY 1, 2
"""


@register("x_privacy_kanon", oracle=_KANON_ORACLE)
def x_privacy_kanon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier triple (event_type,
    day, decile band of the props payload value — the demographic-like
    attribute that makes classes small enough to be dangerous):
    every equivalence class counts its distinct users, classes bucket
    into size bands (singleton / below-k / below-10 / 10+), and
    ``at_risk`` marks the bands a k = {k} release policy would have to
    suppress or generalize. ``n_users`` is the user-slots exposure per
    band (a user active in several classes counts in each — the
    linkage-attack surface, which is the right unit for this audit).

    Scale shape: ONE aggregate at QI grain (count-distinct over
    user_id with map-side partial dedup — the same Expand shape as
    ``x_dataset_card``), then ONE ≤ 8-row aggregate over the class
    frame. Nothing shuffles user lists; the QI key space bounds the
    intermediate.
    """
    e = load(spark, sf_dir, "events")
    k_band = F.floor(
        F.get_json_object("props", "$.k").cast("int") / 10
    ).cast("int")
    classes = e.groupBy(
        "event_type",
        F.col("ts").cast("date").alias("day"),
        k_band.alias("k_band"),
    ).agg(
        F.countDistinct("user_id").cast("long").alias("class_users"),
        F.count(F.lit(1)).cast("long").alias("class_rows"),
    )
    bucket = (
        F.when(F.col("class_users") == 1, 0)
        .when(F.col("class_users") < _KANON_K, 1)
        .when(F.col("class_users") < 10, 2)
        .otherwise(3)
    )
    return classes.groupBy(
        bucket.cast("long").alias("bucket"),
        (F.col("class_users") < _KANON_K).cast("long").alias("at_risk"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum("class_users").cast("long").alias("n_users"),
        F.sum("class_rows").cast("long").alias("n_rows"),
    )


x_privacy_kanon.__doc__ = x_privacy_kanon.__doc__.format(k=_KANON_K)


# ---------------------------------------------------------------------------
# x_churn_label — behavioral features + churn label per user
# ---------------------------------------------------------------------------

_CHURN_DAYS = 0  # fixture-scaled: the log spans ~15 days with near-daily
# activity per user (max recency 2 days at any SF); production would use
# 28. "churned" = no activity on the final day of the log.

_CHURN_ORACLE = f"""
WITH horizon AS (
    SELECT MAX(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS h FROM events
), per_user AS (
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_purchases,
           MAX(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS last_day,
           CAST(COUNT(DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE))
                AS BIGINT) AS active_days
    FROM events GROUP BY user_id
)
SELECT p.user_id, p.n_events, p.n_purchases, p.active_days,
       CAST(datediff('day', p.last_day, h.h) AS BIGINT) AS recency_days,
       CAST(CASE WHEN datediff('day', p.last_day, h.h) > {_CHURN_DAYS}
                 THEN 1 ELSE 0 END AS BIGINT) AS churned
FROM per_user p, horizon h
"""


@register("x_churn_label", oracle=_CHURN_ORACLE)
def x_churn_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn label generation: per user, the behavioral features a
    churn model trains on (event count, purchase count, distinct
    active days, recency in days against the log's horizon) and the
    label itself — churned = recency > {d} days (no activity on the
    log's final day; fixture-scaled — the ~15-day log caps recency at
    2 days, production would use ~28). This
    is the labeled table that feeds ``x_train_val_test``; recency and
    the label derive from the SAME horizon scalar, so labels are
    reproducible from any snapshot of the log.

    Scale shape: ONE user-grain aggregate (all features map-combine on
    the user_id shuffle; the distinct-day count shares it via Expand);
    the horizon is ONE collected scalar folded into codegen as a
    literal (the k-means bounded-metadata contract — a scalar join
    would be a nested-loop plan for no benefit). No window, no
    self-join; output is |users| rows of fixed-width features.
    """
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_type", F.col("ts").cast("date").alias("day")
    )
    per_user = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum((F.col("event_type") == "purchase").cast("long"))
        .cast("long")
        .alias("n_purchases"),
        F.max("day").alias("last_day"),
        F.countDistinct("day").cast("long").alias("active_days"),
    )
    h = e.agg(F.max("day").alias("h")).first()["h"]
    recency = F.datediff(F.lit(h), F.col("last_day")).cast("long")
    return per_user.select(
        "user_id",
        "n_events",
        "n_purchases",
        "active_days",
        recency.alias("recency_days"),
        (recency > _CHURN_DAYS).cast("long").alias("churned"),
    )


x_churn_label.__doc__ = x_churn_label.__doc__.format(d=_CHURN_DAYS)
