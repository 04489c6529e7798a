"""Round-6 batch 32: growth accounting + robust outlier fences.

- ``x_growth_accounting`` — the weekly new/retained/resurrected/
  churned user decomposition (the "growth accounting" identity every
  subscription dashboard runs): a user is *new* in their first active
  week, *retained* if active the immediately preceding week,
  *resurrected* if returning after a gap, and *churned* in week w+1
  if active in w but not w+1. One distinct + one per-user window —
  no week-over-week self-join.
- ``x_outlier_iqr`` — Tukey-fence outlier profile per event type:
  exact discrete quartiles (the q_percentiles rank idiom), the
  1.5×IQR fences, and how many observations fall below/above. The
  fourth member of the robust-screen family next to z-score
  (q_anomaly_zscore), MAD (x_anomaly_mad), and winsorization
  (x_winsorize) — IQR fences are the boxplot rule.

Reference parity: no analogue [REF-UNVERIFIED — /root/reference is
empty]; SURVEY §2.E analytics / §2.J-M curation extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

_GROWTH_ORACLE = """
WITH uw AS (
    SELECT DISTINCT user_id,
           CAST(date_trunc('week', ts) AS TIMESTAMP) AS week
    FROM events
), flagged AS (
    SELECT user_id, week,
           lag(week) OVER w AS prev_week,
           lead(week) OVER w AS next_week
    FROM uw
    WINDOW w AS (PARTITION BY user_id ORDER BY week)
), status AS (
    SELECT week,
           CASE WHEN prev_week IS NULL THEN 'new'
                WHEN prev_week = week - INTERVAL 7 DAY THEN 'retained'
                ELSE 'resurrected' END AS status
    FROM flagged
), churn AS (
    SELECT week + INTERVAL 7 DAY AS week,
           CAST(COUNT(*) AS BIGINT) AS n_churned
    FROM flagged
    WHERE (next_week IS NULL OR next_week > week + INTERVAL 7 DAY)
      AND week + INTERVAL 7 DAY <= (SELECT MAX(week) FROM uw)
    GROUP BY week + INTERVAL 7 DAY
), act AS (
    SELECT week,
           CAST(COUNT(*) AS BIGINT) AS n_active,
           CAST(SUM(CASE WHEN status = 'new' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_new,
           CAST(SUM(CASE WHEN status = 'retained' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_retained,
           CAST(SUM(CASE WHEN status = 'resurrected' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_resurrected
    FROM status GROUP BY week
)
SELECT a.week, a.n_active, a.n_new, a.n_retained, a.n_resurrected,
       COALESCE(c.n_churned, 0) AS n_churned
FROM act a LEFT JOIN churn c ON c.week = a.week
"""


@register("x_growth_accounting", oracle=_GROWTH_ORACLE)
def x_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly growth accounting: per week, how many active users are
    new (first-ever week), retained (also active the week before),
    resurrected (back after a gap), and how many of last week's users
    churned (did not return). Week-over-week status comes from ONE
    lag/lead pair over the per-user activity window — the naive shape
    is a week×week self-join of the activity table. Trailing churn is
    clipped at the corpus's last week so the final week doesn't report
    everyone as churned.

    Scale shape: one (user, week) distinct (hash shuffle on the pair),
    one per-user window on the user-week grain (user-entity shuffle,
    rows are two small columns), then week-domain-sized aggregates.
    The max-week clip is a 1-row broadcast. Identity n_active =
    n_new + n_retained + n_resurrected holds by construction and is
    pinned in tests. Scan-bound at 100 TB.
    """
    e = load(spark, sf_dir, "events")
    uw = e.select(
        "user_id",
        F.date_trunc("week", "ts").cast("timestamp_ntz").alias("week"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("week")
    flagged = uw.select(
        "user_id",
        "week",
        F.lag("week").over(w).alias("prev_week"),
        F.lead("week").over(w).alias("next_week"),
    )
    week_plus_7 = F.col("week") + F.expr("INTERVAL 7 DAY")
    status = flagged.select(
        "week",
        F.when(F.col("prev_week").isNull(), "new")
        .when(
            F.col("prev_week") == F.col("week") - F.expr("INTERVAL 7 DAY"),
            "retained",
        )
        .otherwise("resurrected")
        .alias("status"),
    )
    max_week = uw.agg(F.max("week").alias("max_week"))
    churn = (
        flagged.where(
            F.col("next_week").isNull()
            | (F.col("next_week") > week_plus_7)
        )
        .select(week_plus_7.alias("week"))
        .crossJoin(F.broadcast(max_week))
        .where(F.col("week") <= F.col("max_week"))
        .groupBy("week")
        .agg(F.count(F.lit(1)).cast("long").alias("n_churned"))
    )
    act = status.groupBy("week").agg(
        F.count(F.lit(1)).cast("long").alias("n_active"),
        F.sum(F.when(F.col("status") == "new", 1).otherwise(0))
        .cast("long")
        .alias("n_new"),
        F.sum(F.when(F.col("status") == "retained", 1).otherwise(0))
        .cast("long")
        .alias("n_retained"),
        F.sum(F.when(F.col("status") == "resurrected", 1).otherwise(0))
        .cast("long")
        .alias("n_resurrected"),
    )
    return act.join(churn, "week", "left").select(
        "week",
        "n_active",
        "n_new",
        "n_retained",
        "n_resurrected",
        F.coalesce(F.col("n_churned"), F.lit(0)).cast("long").alias(
            "n_churned"
        ),
    )


_IQR_ORACLE = """
WITH r AS (
    SELECT event_type, value,
           CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY value, event_id)
                AS BIGINT) AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM events
), fences AS (
    SELECT event_type,
           MAX(CASE WHEN rn = CAST(ceil(CAST(0.25 AS DOUBLE) * n) AS BIGINT)
                    THEN value END) AS q1,
           MAX(CASE WHEN rn = CAST(ceil(CAST(0.75 AS DOUBLE) * n) AS BIGINT)
                    THEN value END) AS q3
    FROM r GROUP BY event_type
), f AS (
    SELECT event_type, q1, q3,
           q1 - 1.5 * (q3 - q1) AS lo,
           q3 + 1.5 * (q3 - q1) AS hi
    FROM fences
)
SELECT e.event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       MAX(f.q1) AS q1,
       MAX(f.q3) AS q3,
       ROUND(MAX(f.lo), 6) AS fence_lo,
       ROUND(MAX(f.hi), 6) AS fence_hi,
       CAST(SUM(CASE WHEN e.value < f.lo THEN 1 ELSE 0 END) AS BIGINT)
           AS n_below,
       CAST(SUM(CASE WHEN e.value > f.hi THEN 1 ELSE 0 END) AS BIGINT)
           AS n_above,
       ROUND(CAST(SUM(CASE WHEN e.value < f.lo OR e.value > f.hi
                           THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
           AS outlier_rate
FROM events e JOIN f USING (event_type)
GROUP BY e.event_type
"""


@register("x_outlier_iqr", oracle=_IQR_ORACLE)
def x_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier screen per event type: exact discrete
    quartiles via the rank idiom (q_percentiles — ceil(q·n)-th value
    in (value, event_id) order, so both engines pick the identical
    row), fences at 1.5×IQR, and the below/above counts plus outlier
    rate. Completes the robust-screen family: z-score assumes
    normality, MAD resists it, winsorize clips — IQR fences is the
    boxplot rule reviewers actually ask for.

    Scale shape: the quartile pass shuffles (event_type, value,
    event_id) triples only — never props/payload columns; the count
    pass re-scans with the 5-row fence table broadcast. At 100 TB
    swap exact quartiles for x_sketch_kll_quantiles' mergeable sketch
    and keep the fence/count pass unchanged — documented trade, same
    output schema.
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    r = e.select(
        "event_type",
        "value",
        F.row_number().over(w).cast("long").alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("event_type"))
        .alias("n"),
    )
    q_at = lambda q: F.max(  # noqa: E731 — local rank-pick helper
        F.when(
            F.col("rn")
            == F.ceil(F.lit(q).cast("double") * F.col("n")).cast("long"),
            F.col("value"),
        )
    )
    fences = r.groupBy("event_type").agg(
        q_at(0.25).alias("q1"), q_at(0.75).alias("q3")
    )
    f = fences.select(
        "event_type",
        "q1",
        "q3",
        (F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))).alias("lo"),
        (F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))).alias("hi"),
    )
    return (
        e.join(F.broadcast(f), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.max("q1").alias("q1"),
            F.max("q3").alias("q3"),
            F.round(F.max("lo"), 6).alias("fence_lo"),
            F.round(F.max("hi"), 6).alias("fence_hi"),
            F.sum(F.when(F.col("value") < F.col("lo"), 1).otherwise(0))
            .cast("long")
            .alias("n_below"),
            F.sum(F.when(F.col("value") > F.col("hi"), 1).otherwise(0))
            .cast("long")
            .alias("n_above"),
            F.round(
                F.sum(
                    F.when(
                        (F.col("value") < F.col("lo"))
                        | (F.col("value") > F.col("hi")),
                        1,
                    ).otherwise(0)
                ).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("outlier_rate"),
        )
    )
