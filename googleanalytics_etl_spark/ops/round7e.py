"""Round-7 batch 5: experiment planning, interval estimation, seasonal
decomposition, and the model-gains table.

- ``x_ab_power_mde`` — A/B test SIZING from observed moments: n per
  arm for 80% power at a 2% relative MDE, and the detectable effect at
  a fixed budget — the planning step in front of x_welch_ttest /
  x_ab_srm_check / x_ab_cuped. Variance comes from exact integer-cents
  moments; the z constants are fixed literals; everything after is one
  fixed IEEE expression.
- ``x_wilson_ci`` — Wilson score intervals for each event type's
  user-level reach (the funnel-step error bars q_funnel doesn't
  carry). Exact integer (k, n) per type; the interval is a closed
  form, no normal-approximation-on-small-p pathology.
- ``x_seasonal_decompose`` — additive trend/seasonal/residual split of
  daily revenue: trend = 7-day centered moving average over the exact
  day-grain cents (one integer-ratio division per day), seasonal = the
  day-of-week mean of DECIMAL-quantized detrended deviations (exact
  sum ÷ count — engines never float-fold), residual the remainder.
  The decomposition x_seasonal_profile (profile only) and
  x_seasonal_anomaly (flags only) sit on top of.
- ``x_gains_table`` — decile gains/lift of ``value`` ranking purchase
  events (the business-facing companion to x_pr_auc/x_auc_roc):
  deciles are assigned on the aggregated score DOMAIN by exact integer
  cumulative-count arithmetic (ties share a decile identically in both
  engines — no ntile row-ordering hazard), then cumulative capture and
  lift per decile are rationals of exact counts.

Reference parity: no analogue [REF-UNVERIFIED — /root/reference is
empty]; SURVEY §2.J-M experimentation/evaluation extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

_Z_A = 1.959963984540054   # z_{0.975}
_Z_B = 0.8416212335729143  # z_{0.80}
_REL_MDE = 0.02
_FIXED_N = 10000.0

_POWER_ORACLE = f"""
WITH m AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS DECIMAL(18,0)))
                AS DECIMAL(18,0)) AS s,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS DECIMAL(18,0))
                    * CAST(ROUND(value * 100, 0) AS BIGINT))
                AS DECIMAL(28,0)) AS ss
    FROM events
), f AS (
    SELECT n,
           CAST(s AS DOUBLE) / (100.0 * n) AS mean,
           CAST(n * ss - CAST(s AS DECIMAL(37,0)) * s AS DOUBLE)
               / (CAST(n AS DOUBLE) * (n - 1) * 10000.0) AS var
    FROM m
)
SELECT n, ROUND(mean, 6) AS mean, ROUND(var, 4) AS var,
       CAST(CEIL(2.0 * POW(CAST({_Z_A} AS DOUBLE)
                           + CAST({_Z_B} AS DOUBLE), 2.0) * var
                 / POW({_REL_MDE} * mean, 2.0)) AS BIGINT) AS n_per_arm,
       ROUND((CAST({_Z_A} AS DOUBLE) + CAST({_Z_B} AS DOUBLE))
             * SQRT(var) * SQRT(2.0 / {_FIXED_N}) / mean, 6)
           AS rel_mde_at_fixed_n
FROM f
"""


@register("x_ab_power_mde", oracle=_POWER_ORACLE)
def x_ab_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-arm test sizing from observed moments: with metric variance
    σ² (exact integer-cents accumulation, the x_welch_ttest recipe),
    n/arm = ⌈2(z_α/2+z_β)²σ²/Δ²⌉ for Δ = {mde:.0%} of the mean, and the
    inverse — the relative MDE detectable at n={n:.0f}/arm. The z
    quantiles are fixed literals, so both outputs are single fixed IEEE
    expressions over three exact numbers; bit-stable cross-engine.

    Scale shape: ONE map-side-combinable moments aggregate; constant
    work after. (Power analysis over 100 TB of history is exactly this
    one scan.)
    """
    xc = F.round(F.col("value") * 100, 0)
    m = load(spark, sf_dir, "events").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(xc.cast("decimal(18,0)")).cast("decimal(18,0)").alias("s"),
        F.sum(xc.cast("decimal(18,0)") * xc.cast("long"))
        .cast("decimal(28,0)")
        .alias("ss"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("s").cast("double") / (100.0 * F.col("n"))
    var = (
        F.col("n") * F.col("ss")
        - F.col("s").cast("decimal(37,0)") * F.col("s")
    ).cast("double") / (nd * (F.col("n") - 1) * 10000.0)
    z = _Z_A + _Z_B
    return m.select(
        "n",
        F.round(mean, 6).alias("mean"),
        F.round(var, 4).alias("var"),
        F.ceil(2.0 * (z**2) * var / F.pow(_REL_MDE * mean, 2.0))
        .cast("long")
        .alias("n_per_arm"),
        F.round(
            z * F.sqrt(var) * ((2.0 / _FIXED_N) ** 0.5) / mean, 6
        ).alias("rel_mde_at_fixed_n"),
    )


x_ab_power_mde.__doc__ = x_ab_power_mde.__doc__.format(
    mde=_REL_MDE, n=_FIXED_N
)


_WILSON_ORACLE = f"""
WITH tot AS (
    SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n FROM events
), reach AS (
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS k
    FROM events GROUP BY event_type
)
SELECT r.event_type, r.k, t.n,
       ROUND(CAST(r.k AS DOUBLE) / t.n, 6) AS p,
       ROUND((CAST(r.k AS DOUBLE) / t.n
              + CAST({_Z_A} AS DOUBLE) * {_Z_A} / (2.0 * t.n)
              - CAST({_Z_A} AS DOUBLE)
                * SQRT((CAST(r.k AS DOUBLE) / t.n)
                       * (1.0 - CAST(r.k AS DOUBLE) / t.n) / t.n
                       + CAST({_Z_A} AS DOUBLE) * {_Z_A}
                         / (4.0 * CAST(t.n AS DOUBLE) * t.n)))
             / (1.0 + CAST({_Z_A} AS DOUBLE) * {_Z_A} / t.n), 6) AS lo,
       ROUND((CAST(r.k AS DOUBLE) / t.n
              + CAST({_Z_A} AS DOUBLE) * {_Z_A} / (2.0 * t.n)
              + CAST({_Z_A} AS DOUBLE)
                * SQRT((CAST(r.k AS DOUBLE) / t.n)
                       * (1.0 - CAST(r.k AS DOUBLE) / t.n) / t.n
                       + CAST({_Z_A} AS DOUBLE) * {_Z_A}
                         / (4.0 * CAST(t.n AS DOUBLE) * t.n)))
             / (1.0 + CAST({_Z_A} AS DOUBLE) * {_Z_A} / t.n), 6) AS hi
FROM reach r CROSS JOIN tot t
"""


@register("x_wilson_ci", oracle=_WILSON_ORACLE)
def x_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson 95% score interval for each event type's user reach
    (k distinct users of n total): the funnel-step error bars. Closed
    form over two exact integers per row — no normal-approximation
    blowup near p→0/1, which is why it's the interval production
    dashboards should use. One fixed expression per bound.

    Scale shape: two distinct-count aggregates (map-side combinable),
    then |types| rows of constant math with a 1-row total broadcast.
    """
    ev = load(spark, sf_dir, "events")
    tot = ev.agg(F.countDistinct("user_id").cast("long").alias("n"))
    reach = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("k")
    )
    p = F.col("k").cast("double") / F.col("n")
    z2 = _Z_A * _Z_A
    nd = F.col("n").cast("double")
    center = p + z2 / (2.0 * F.col("n"))
    half = _Z_A * F.sqrt(
        p * (1.0 - p) / F.col("n") + z2 / (4.0 * nd * F.col("n"))
    )
    denom = 1.0 + z2 / F.col("n")
    return reach.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "k",
        "n",
        F.round(p, 6).alias("p"),
        F.round((center - half) / denom, 6).alias("lo"),
        F.round((center + half) / denom, 6).alias("hi"),
    )


_SEASONAL_ORACLE = """
WITH daily AS (
    SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
           CAST(FLOOR(epoch_us(CAST(ts AS TIMESTAMP)) / 86400000000)
                AS BIGINT) % 7 AS dow,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
               AS cents
    FROM events GROUP BY 1, 2
), trend AS (
    SELECT day, dow, cents,
           CAST(SUM(cents) OVER w AS DOUBLE)
               / (100.0 * COUNT(*) OVER w) AS trend
    FROM daily
    WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
), dev AS (
    SELECT day, dow, cents, trend,
           CAST(cents / 100.0 - trend AS DECIMAL(18,6)) AS devq
    FROM trend
), seas AS (
    SELECT dow,
           CAST(SUM(devq) AS DOUBLE) / COUNT(*) AS seasonal
    FROM dev GROUP BY dow
)
SELECT d.day, ROUND(d.cents / 100.0, 2) AS revenue,
       ROUND(d.trend, 6) AS trend,
       ROUND(s.seasonal, 6) AS seasonal,
       ROUND(CAST(d.devq AS DOUBLE) - s.seasonal, 6) AS residual
FROM dev d JOIN seas s USING (dow)
"""


@register("x_seasonal_decompose", oracle=_SEASONAL_ORACLE)
def x_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition of daily revenue: trend is the
    7-day centered moving average (exact cents sum ÷ frame count — one
    IEEE division per day), seasonal is the day-of-week mean of the
    DECIMAL(18,6)-quantized detrended deviations (exact decimal sum ÷
    count, so the per-dow fold is order-free), residual the remainder.
    Day-of-week is epoch-day mod 7 (integer, engine-neutral). Gives
    x_seasonal_profile/x_seasonal_anomaly their missing decomposition.

    Scale shape: one map-side-combinable day aggregate; every window
    and the dow grouping run on the |days| frame (month-grain
    metadata).
    """
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(
            F.col("ts").cast("date").alias("day"),
            (
                F.floor(
                    F.unix_micros(F.col("ts").cast("timestamp"))
                    / 86400000000
                )
                % 7
            )
            .cast("long")
            .alias("dow"),
        )
        .agg(
            F.sum(F.round(F.col("value") * 100, 0).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    w = Window.orderBy("day").rowsBetween(-3, 3)
    trend = daily.select(
        "day",
        "dow",
        "cents",
        (
            F.sum("cents").over(w).cast("double")
            / (100.0 * F.count(F.lit(1)).over(w))
        ).alias("trend"),
    )
    dev = trend.withColumn(
        "devq",
        (F.col("cents") / 100.0 - F.col("trend")).cast("decimal(18,6)"),
    )
    seas = dev.groupBy("dow").agg(
        (F.sum("devq").cast("double") / F.count(F.lit(1))).alias(
            "seasonal"
        )
    )
    return dev.join(F.broadcast(seas), "dow").select(
        "day",
        F.round(F.col("cents") / 100.0, 2).alias("revenue"),
        F.round(F.col("trend"), 6).alias("trend"),
        F.round(F.col("seasonal"), 6).alias("seasonal"),
        F.round(
            F.col("devq").cast("double") - F.col("seasonal"), 6
        ).alias("residual"),
    )


_GAINS_ORACLE = """
WITH sc AS (
    SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
    FROM events
), dom AS (
    SELECT cents, CAST(COUNT(*) AS BIGINT) AS c,
           CAST(SUM(pos) AS BIGINT) AS np
    FROM sc GROUP BY cents
), cum AS (
    SELECT cents, c, np,
           CAST(SUM(c) OVER (ORDER BY cents DESC) AS BIGINT) AS cum_c
    FROM dom
), tot AS (
    SELECT CAST(SUM(c) AS BIGINT) AS n, CAST(SUM(np) AS BIGINT) AS p
    FROM dom
), dec AS (
    SELECT LEAST((10 * (cum_c - c)) // t.n, 9) AS decile,
           c, np
    FROM cum CROSS JOIN tot t
), g AS (
    SELECT decile, CAST(SUM(c) AS BIGINT) AS n_rows,
           CAST(SUM(np) AS BIGINT) AS n_pos
    FROM dec GROUP BY decile
), gc AS (
    SELECT decile, n_rows, n_pos,
           CAST(SUM(n_rows) OVER (ORDER BY decile) AS BIGINT) AS cum_rows,
           CAST(SUM(n_pos) OVER (ORDER BY decile) AS BIGINT) AS cum_pos
    FROM g
)
SELECT gc.decile, gc.n_rows, gc.n_pos, gc.cum_pos,
       ROUND(CAST(gc.cum_pos AS DOUBLE) / t.p, 6) AS capture,
       ROUND((CAST(gc.cum_pos AS DOUBLE) / t.p)
             / (CAST(gc.cum_rows AS DOUBLE) / t.n), 6) AS lift
FROM gc CROSS JOIN tot t
"""


@register("x_gains_table", oracle=_GAINS_ORACLE)
def x_gains_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile gains/lift table of ``value`` ranking purchases — the
    chart behind "the top 10% of scores capture X% of conversions".
    Deciles are assigned on the aggregated score DOMAIN by exact
    cumulative-count arithmetic (every row of a tied score lands in
    the same decile in both engines — ntile over raw rows would split
    ties by physical order), so a decile can be empty under heavy ties
    rather than wrong. Capture and lift per decile are rationals of
    exact counts.

    Scale shape: the x_auc_roc grid property — one map-side-combined
    aggregate to the bounded score domain, two domain-grain windows.
    """
    dom = (
        load(spark, sf_dir, "events")
        .select(
            F.round(F.col("value") * 100).cast("long").alias("cents"),
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("pos"),
        )
        .groupBy("cents")
        .agg(
            F.count(F.lit(1)).cast("long").alias("c"),
            F.sum("pos").cast("long").alias("np"),
        )
    )
    wdesc = Window.orderBy(F.desc("cents")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = dom.select(
        "cents",
        "c",
        "np",
        F.sum("c").over(wdesc).cast("long").alias("cum_c"),
    )
    tot = dom.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum("np").cast("long").alias("p"),
    )
    # integer div (not `/`, which is float in both engines with
    # different int-cast rounding)
    dec = cum.crossJoin(F.broadcast(tot)).select(
        F.least(
            F.expr("(10 * (cum_c - c)) div n"), F.lit(9).cast("long")
        ).alias("decile"),
        "c",
        "np",
    )
    g = dec.groupBy("decile").agg(
        F.sum("c").cast("long").alias("n_rows"),
        F.sum("np").cast("long").alias("n_pos"),
    )
    wasc = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    gc = g.select(
        "decile",
        "n_rows",
        "n_pos",
        F.sum("n_rows").over(wasc).cast("long").alias("cum_rows"),
        F.sum("n_pos").over(wasc).cast("long").alias("cum_pos"),
    )
    return gc.crossJoin(F.broadcast(tot)).select(
        "decile",
        "n_rows",
        "n_pos",
        "cum_pos",
        F.round(F.col("cum_pos").cast("double") / F.col("p"), 6).alias(
            "capture"
        ),
        F.round(
            (F.col("cum_pos").cast("double") / F.col("p"))
            / (F.col("cum_rows").cast("double") / F.col("n")),
            6,
        ).alias("lift"),
    )
