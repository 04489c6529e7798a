"""Round-6 batch 20: lifecycle statistics — survival and changepoint.

- ``x_kaplan_meier`` — Kaplan-Meier survival estimate of
  time-to-repeat-purchase (weeks from a customer's first order to
  their next order on a later day; customers with no later order are
  right-censored at the observation end). The product-limit curve is
  emitted in LOG space: per-duration ln-terms are
  DECIMAL(18,8)-quantized before the exact cumulative sum (the
  x_source_kl recipe), so the curve is bit-stable cross-engine
  without trusting EXP to be correctly rounded.
- ``x_cusum_changepoint`` — CUSUM level-shift detection over the
  daily revenue series. The classic S_t = Σ_{i≤t}(x_i − x̄) statistic
  is scaled by n_days so every value is an exact BIGINT
  (S*_t = Σ n·x_i − t·Σx), and the changepoint is the earliest
  argmax of |S*| — zero floating point anywhere.

Reference parity: no analogue [REF-UNVERIFIED — /root/reference is
empty]; SURVEY §2.E lifecycle-analytics extensions (q_retention /
x_churn_label siblings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

_KM_WEEK = 7  # duration grain: weeks since first order

_KM_ORACLE = f"""
WITH first_o AS (
    SELECT o_custkey, MIN(o_orderdate) AS d0
    FROM orders GROUP BY o_custkey
), second_o AS (
    SELECT o.o_custkey, MIN(o.o_orderdate) AS d2
    FROM orders o JOIN first_o f ON o.o_custkey = f.o_custkey
    WHERE o.o_orderdate > f.d0
    GROUP BY o.o_custkey
), obs AS (
    SELECT MAX(o_orderdate) AS dend FROM orders
), usr AS (
    SELECT CAST(FLOOR(date_diff('day', f.d0, COALESCE(s.d2, dend))
                      / {_KM_WEEK}.0) AS BIGINT) AS dur,
           CASE WHEN s.d2 IS NOT NULL THEN 1 ELSE 0 END AS churn
    FROM first_o f
    LEFT JOIN second_o s ON f.o_custkey = s.o_custkey
    CROSS JOIN obs
), dom AS (
    SELECT dur, CAST(SUM(churn) AS BIGINT) AS d,
           CAST(COUNT(*) AS BIGINT) AS m
    FROM usr GROUP BY dur
), risk AS (
    SELECT dur, d, m,
           CAST(SUM(m) OVER (ORDER BY dur DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS n_risk
    FROM dom
), terms AS (
    SELECT dur, d, m, n_risk,
           CASE WHEN d < n_risk
                THEN CAST(LN(1.0 - CAST(d AS DOUBLE) / n_risk)
                          AS DECIMAL(18,8)) END AS lt
    FROM risk
)
SELECT dur AS duration, n_risk, d AS d_event, m AS m_total,
       ROUND(CAST(d AS DOUBLE) / n_risk, 6) AS hazard,
       CASE WHEN d = n_risk THEN NULL
            ELSE ROUND(CAST(SUM(lt) OVER (ORDER BY dur
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS DOUBLE), 6) END AS log_surv
FROM terms
ORDER BY duration
"""


@register("x_kaplan_meier", oracle=_KM_ORACLE)
def x_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier product-limit estimate of time-to-repeat-purchase.
    Duration = whole weeks from a customer's first order to their next
    order on a strictly later day (the repeat event); customers who
    never re-order are right-censored at the corpus observation end
    (censored customers still sit in the at-risk set at their duration
    — the standard convention). Output per observed duration t:
    at-risk count n_t, event count d_t, cohort size m_t, hazard
    d_t/n_t, and log S(t) = Σ_{{t'≤t}} ln(1 − d/n) with each ln
    DECIMAL(18,8)-quantized before the exact sum (terminal d=n row →
    NULL, survival exactly 0).

    Scale shape: first/second-order dates come from two groupBys plus
    one customer-key join — all three shuffle on o_custkey, so AQE
    reuses one exchange layout; the observation end is a broadcast
    1-row scalar. The KM machinery then runs on the DURATION DOMAIN —
    bounded by the calendar span in weeks, not customer count — so the
    two cumulative windows are single-partition over ≤ span-weeks rows.
    """
    o = load(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderdate").alias("day")
    )
    first = o.groupBy("o_custkey").agg(F.min("day").alias("d0"))
    second = (
        o.join(first, "o_custkey")
        .where(F.col("day") > F.col("d0"))
        .groupBy("o_custkey")
        .agg(F.min("day").alias("d2"))
    )
    obs = o.agg(F.max("day").alias("dend"))
    usr = (
        first.join(second, "o_custkey", "left")
        .crossJoin(F.broadcast(obs))
        .select(
            F.floor(
                F.datediff(F.coalesce("d2", "dend"), F.col("d0"))
                / float(_KM_WEEK)
            )
            .cast("long")
            .alias("dur"),
            F.when(F.col("d2").isNotNull(), 1).otherwise(0).alias("churn"),
        )
    )
    dom = usr.groupBy("dur").agg(
        F.sum("churn").cast("long").alias("d"),
        F.count(F.lit(1)).cast("long").alias("m"),
    )
    w_desc = Window.orderBy(F.desc("dur")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = dom.withColumn(
        "n_risk", F.sum("m").over(w_desc).cast("long")
    )
    terms = risk.withColumn(
        "lt",
        F.when(
            F.col("d") < F.col("n_risk"),
            F.log(1.0 - F.col("d").cast("double") / F.col("n_risk")).cast(
                "decimal(18,8)"
            ),
        ),
    )
    w_asc = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        terms.select(
            F.col("dur").alias("duration"),
            "n_risk",
            F.col("d").alias("d_event"),
            F.col("m").alias("m_total"),
            F.round(F.col("d").cast("double") / F.col("n_risk"), 6).alias(
                "hazard"
            ),
            F.when(
                F.col("d") == F.col("n_risk"), F.lit(None).cast("double")
            )
            .otherwise(
                F.round(F.sum("lt").over(w_asc).cast("double"), 6)
            )
            .alias("log_surv"),
        )
        .orderBy("duration")
    )


_CUSUM_ORACLE = """
WITH daily AS (
    SELECT CAST(ts AS DATE) AS day,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM events GROUP BY 1
), tot AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS nd, CAST(SUM(cents) AS BIGINT) AS total
    FROM daily
), cum AS (
    SELECT day, cents,
           CAST(SUM(nd * cents - total) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS s
    FROM daily, tot
), mx AS (
    SELECT day, cents, s, MAX(ABS(s)) OVER () AS ma FROM cum
), cp AS (
    SELECT day, cents, s,
           MIN(CASE WHEN ABS(s) = ma THEN day END) OVER () AS cpd
    FROM mx
)
SELECT day, cents AS day_cents, s AS s_scaled,
       CAST(CASE WHEN day = cpd THEN 1 ELSE 0 END AS BIGINT) AS is_cp
FROM cp
ORDER BY day
"""


@register("x_cusum_changepoint", oracle=_CUSUM_ORACLE)
def x_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM level-shift scan over daily revenue: the cumulative sum of
    deviations from the series mean, scaled by n_days so
    S*_t = Σ_{i≤t}(n·x_i − Σx) stays an exact BIGINT (x in integer
    cents; |S*| < n_days² · max_daily_cents ≪ 2⁶³ for any realistic
    horizon). The flagged row (earliest argmax of |S*|) is the
    most-likely single changepoint under the classic CUSUM decision
    rule — the day the revenue level shifted.

    Scale shape: the n input rows collapse to the DAY domain in one
    map-side-combined groupBy; the cumulative/extremum windows then run
    on ≤ calendar-span rows. The mean enters as a broadcast 1-row
    scalar, not a recomputation per row.
    """
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.to_date("ts").alias("day"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("day")
        .agg(F.sum("cents").cast("long").alias("cents"))
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("long").alias("nd"),
        F.sum("cents").cast("long").alias("total"),
    )
    w_cum = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = (
        daily.crossJoin(F.broadcast(tot))
        .withColumn(
            "s",
            F.sum(
                F.col("nd") * F.col("cents") - F.col("total")
            ).over(w_cum).cast("long"),
        )
        .withColumn("ma", F.max(F.abs(F.col("s"))).over(w_all))
        .withColumn(
            "cpd",
            F.min(
                F.when(F.abs(F.col("s")) == F.col("ma"), F.col("day"))
            ).over(w_all),
        )
    )
    return cum.select(
        "day",
        F.col("cents").alias("day_cents"),
        F.col("s").alias("s_scaled"),
        F.when(F.col("day") == F.col("cpd"), 1)
        .otherwise(0)
        .cast("long")
        .alias("is_cp"),
    ).orderBy("day")
