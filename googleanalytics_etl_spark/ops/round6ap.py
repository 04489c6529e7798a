"""Round-6 batch 42: ratio-metric inference + order-fulfilment lag.

- ``x_ratio_metric_delta`` — delta-method confidence intervals for a
  RATIO metric (revenue per event) per A/B variant. Ratio metrics
  violate the i.i.d.-per-row assumption (the denominator is random
  too, and users contribute correlated rows); the standard fix is the
  delta method over per-USER sums: ``Var(R̂) ≈ Var(X − R·Y) /
  (n·Ȳ²)``. The t-test on per-event values this replaces is the most
  common false-positive machine in experimentation.
- ``x_ship_lag`` — order-to-first-ship lag distribution per order
  priority: integer day lags, exact mean, discrete p50/p90 (the
  shared rank idiom), and the negative-lag share (ships dated before
  their order — in real data a pipeline bug, here a known property
  of the synthetic fixture that the column exists to surface).

Reference parity: no analogue [REF-UNVERIFIED — /root/reference is
empty]; SURVEY §2.E analytics extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

_RMD_ORACLE = """
WITH u AS (
    SELECT user_id,
           CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
                THEN 'A' ELSE 'B' END AS variant,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(28,4)) AS x,
           CAST(COUNT(*) AS BIGINT) AS y
    FROM events GROUP BY user_id
), m AS (
    SELECT variant,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS DECIMAL(32,4)) AS sx,
           CAST(SUM(y) AS BIGINT) AS sy,
           CAST(SUM(CAST(x AS DECIMAL(19,4)) * CAST(x AS DECIMAL(19,4)))
                AS DECIMAL(38,8)) AS sxx,
           CAST(SUM(x * y) AS DECIMAL(38,4)) AS sxy,
           CAST(SUM(y * y) AS BIGINT) AS syy
    FROM u GROUP BY variant
), t AS (
    SELECT variant, n,
           CAST(sx AS DOUBLE) / sy AS r,
           CAST(sy AS DOUBLE) / n AS ybar,
           (CAST(sxx AS DOUBLE)
            - 2 * (CAST(sx AS DOUBLE) / sy) * CAST(sxy AS DOUBLE)
            + (CAST(sx AS DOUBLE) / sy) * (CAST(sx AS DOUBLE) / sy)
              * CAST(syy AS DOUBLE)
            - n * (CAST(sx AS DOUBLE) / n
                   - (CAST(sx AS DOUBLE) / sy) * (CAST(sy AS DOUBLE) / n))
                * (CAST(sx AS DOUBLE) / n
                   - (CAST(sx AS DOUBLE) / sy) * (CAST(sy AS DOUBLE) / n)))
           / (n - 1) AS var_resid
    FROM m
)
SELECT variant, n AS n_users,
       ROUND(r, 6) AS ratio,
       ROUND(sqrt(var_resid / n) / ybar, 6) AS se,
       ROUND(r - 1.96 * sqrt(var_resid / n) / ybar, 6) AS ci_lo,
       ROUND(r + 1.96 * sqrt(var_resid / n) / ybar, 6) AS ci_hi
FROM t
"""


@register("x_ratio_metric_delta", oracle=_RMD_ORACLE)
def x_ratio_metric_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method CI for revenue-per-event, per variant: users are
    the independent unit, so the ratio is ΣX/ΣY over per-user sums
    and its variance is the sample variance of the residual
    ``X − R·Y`` scaled by ``1/(n·Ȳ²)``. Moments (ΣX, ΣY, ΣX², ΣXY,
    ΣY²) accumulate exactly (DECIMAL / integer); R, the residual
    variance, and the CI bounds are one fixed-shape double expression
    — both engines compute identical values.

    Scale shape: one map-side-combinable user-grain aggregate over
    events, then a 2-row variant-grain moment aggregate — the CI costs
    nothing beyond the moments (same algebra-not-passes trade as
    x_ab_cuped). Scan-bound at 100 TB.
    """
    e = load(spark, sf_dir, "events")
    variant = F.when(
        F.substring(
            F.md5(F.col("user_id").cast("string").cast("binary")), 1, 1
        )
        < "8",
        "A",
    ).otherwise("B")
    u = e.groupBy("user_id").agg(
        F.max(variant).alias("variant"),
        F.sum(F.col("value").cast("decimal(18,4)"))
        .cast("decimal(28,4)")
        .alias("x"),
        F.count(F.lit(1)).cast("long").alias("y"),
    )
    m = u.groupBy("variant").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("decimal(32,4)").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(
            F.col("x").cast("decimal(19,4)") * F.col("x").cast("decimal(19,4)")
        )
        .cast("decimal(38,8)")
        .alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("decimal(38,4)").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    r = F.col("sx").cast("double") / F.col("sy")
    ybar = F.col("sy").cast("double") / F.col("n")
    xbar = F.col("sx").cast("double") / F.col("n")
    mean_resid = xbar - r * ybar
    var_resid = (
        F.col("sxx").cast("double")
        - 2 * r * F.col("sxy").cast("double")
        + r * r * F.col("syy").cast("double")
        - F.col("n") * mean_resid * mean_resid
    ) / (F.col("n") - 1)
    se = F.sqrt(var_resid / F.col("n")) / ybar
    return m.select(
        "variant",
        F.col("n").alias("n_users"),
        F.round(r, 6).alias("ratio"),
        F.round(se, 6).alias("se"),
        F.round(r - 1.96 * se, 6).alias("ci_lo"),
        F.round(r + 1.96 * se, 6).alias("ci_hi"),
    )


_SHIP_ORACLE = """
WITH per_order AS (
    SELECT o.o_orderkey, o.o_orderpriority,
           CAST(date_diff('day', o.o_orderdate, MIN(l.l_shipdate))
                AS BIGINT) AS lag_days
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
), r AS (
    SELECT o_orderpriority, lag_days,
           CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                   ORDER BY lag_days, o_orderkey)
                AS BIGINT) AS rn,
           COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
    FROM per_order
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(CAST(SUM(lag_days) AS DOUBLE) / COUNT(*), 6) AS mean_lag,
       MAX(CASE WHEN rn = CAST(ceil(CAST(0.50 AS DOUBLE) * n) AS BIGINT)
                THEN lag_days END) AS p50_lag,
       MAX(CASE WHEN rn = CAST(ceil(CAST(0.90 AS DOUBLE) * n) AS BIGINT)
                THEN lag_days END) AS p90_lag,
       ROUND(CAST(SUM(CASE WHEN lag_days < 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS pct_negative
FROM r GROUP BY o_orderpriority
"""


@register("x_ship_lag", oracle=_SHIP_ORACLE)
def x_ship_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-first-ship lag per priority: integer day lag from
    order date to the order's EARLIEST lineitem ship date, with exact
    mean (integer sums), discrete p50/p90 via the shared rank idiom,
    and the negative-lag share — the data-quality column (a shipment
    dated before its order is a pipeline bug in real data; the
    synthetic fixture's uncorrelated dates make it visibly nonzero,
    which is exactly what a QA gate would catch).

    Scale shape: one orderkey join (the exchange every TPC-H query
    pays) + order-grain min, then a per-priority rank window carrying
    (priority, lag, key) triples only. Priority-domain output.
    Scan-bound at 100 TB.
    """
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    per_order = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderpriority", "o_orderdate")
        .agg(F.min("l_shipdate").alias("first_ship"))
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.datediff(F.col("first_ship"), F.col("o_orderdate"))
            .cast("long")
            .alias("lag_days"),
        )
    )
    w = Window.partitionBy("o_orderpriority").orderBy("lag_days", "o_orderkey")
    r = per_order.select(
        "o_orderpriority",
        "lag_days",
        F.row_number().over(w).cast("long").alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("o_orderpriority"))
        .alias("n"),
    )
    pick = lambda q: F.max(  # noqa: E731 — rank-pick helper
        F.when(
            F.col("rn")
            == F.ceil(F.lit(q).cast("double") * F.col("n")).cast("long"),
            F.col("lag_days"),
        )
    )
    return r.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.round(F.sum("lag_days").cast("double") / F.count(F.lit(1)), 6)
        .alias("mean_lag"),
        pick(0.50).alias("p50_lag"),
        pick(0.90).alias("p90_lag"),
        F.round(
            F.sum(F.when(F.col("lag_days") < 0, 1).otherwise(0)).cast(
                "double"
            )
            / F.count(F.lit(1)),
            6,
        ).alias("pct_negative"),
    )
