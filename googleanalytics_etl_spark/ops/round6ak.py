"""Round-6 batch 37: robust trend + autocorrelation.

- ``x_theil_sen`` — Theil–Sen robust trend on the daily revenue
  series: the median of all pairwise slopes, next to the OLS slope
  for contrast. One outlier day drags OLS arbitrarily; the pairwise
  median shrugs it off (29.3% breakdown point). The pair space is the
  DAY-domain square — bounded by the calendar, not the data — so the
  "quadratic" step is a constant-size join at any corpus scale.
- ``x_autocorr`` — the autocorrelation function of daily revenue at
  lags 1..{_ACF_MAXLAG}: the seasonality/momentum screen a forecaster
  reads before picking a model (lag-7 spikes = weekly cycle;
  slow decay = trend). Lag products accumulate in exact DECIMAL via a
  band self-join on the day index; the mean corrections are a
  fixed-shape double expression on exact aggregates.

Reference parity: no analogue [REF-UNVERIFIED — /root/reference is
empty]; SURVEY §2.E analytics / statistics extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

_ACF_MAXLAG = 7

_DAILY_CTE = """
WITH d AS (
    SELECT CAST(date_diff('day', TIMESTAMP '2024-01-01',
                          CAST(date_trunc('day', ts) AS TIMESTAMP))
                AS BIGINT) AS idx,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS v
    FROM events GROUP BY date_trunc('day', ts)
)
"""

_TS_ORACLE = (
    _DAILY_CTE
    + """
, pairs AS (
    SELECT a.idx AS i, b.idx AS j,
           CAST(b.v - a.v AS DOUBLE) / (b.idx - a.idx) AS slope
    FROM d a JOIN d b ON b.idx > a.idx
), ranked AS (
    SELECT slope,
           CAST(ROW_NUMBER() OVER (ORDER BY slope, i, j) AS BIGINT) AS rn,
           COUNT(*) OVER () AS np
    FROM pairs
), med AS (
    SELECT MAX(CASE WHEN rn = CAST(ceil(0.5 * np) AS BIGINT)
                    THEN slope END) AS ts_slope,
           CAST(MAX(np) AS BIGINT) AS n_pairs
    FROM ranked
), m AS (
    SELECT CAST(COUNT(*) AS DECIMAL(18,0)) AS n,
           CAST(SUM(idx) AS DECIMAL(28,4)) AS sx,
           CAST(SUM(v) AS DECIMAL(28,4)) AS sy,
           CAST(SUM(idx * idx) AS DECIMAL(38,8)) AS sxx,
           CAST(SUM(idx * v) AS DECIMAL(38,8)) AS sxy
    FROM d
)
SELECT CAST(m.n AS BIGINT) AS n_days,
       med.n_pairs,
       ROUND(med.ts_slope, 6) AS ts_slope,
       ROUND(CAST(m.n * m.sxy - m.sx * m.sy AS DOUBLE)
             / CAST(m.n * m.sxx - m.sx * m.sx AS DOUBLE), 6) AS ols_slope
FROM med CROSS JOIN m
"""
)


@register("x_theil_sen", oracle=_TS_ORACLE)
def x_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen trend of daily revenue: the exact median of all
    pairwise slopes (discrete rank pick, (slope, i, j)-tiebroken so
    both engines select the identical pair), with the OLS slope
    alongside. Each slope is one double division of exact DECIMAL
    operands; the OLS moments accumulate exactly and cast once.

    Scale shape: the day-grain aggregate is the only pass over events
    (map-side combinable); the pairwise join, rank window, and OLS
    moments all run on the CALENDAR-domain frame — ~n_days²/2 rows
    regardless of corpus size (30 days → 435 pairs at any SF). The
    one full-table cost is scan-bound at 100 TB.
    """
    e = load(spark, sf_dir, "events")
    d = e.groupBy(
        F.datediff(
            F.date_trunc("day", "ts").cast("timestamp_ntz"),
            F.lit("2024-01-01").cast("date"),
        )
        .cast("long")
        .alias("idx")
    ).agg(
        F.sum(F.col("value").cast("decimal(18,4)"))
        .cast("decimal(18,4)")
        .alias("v")
    )
    b = d.select(F.col("idx").alias("j"), F.col("v").alias("vj"))
    pairs = d.join(b, F.col("j") > F.col("idx")).select(
        F.col("idx").alias("i"),
        "j",
        (
            (F.col("vj") - F.col("v")).cast("double")
            / (F.col("j") - F.col("idx"))
        ).alias("slope"),
    )
    ranked = pairs.select(
        "slope",
        F.row_number()
        .over(Window.orderBy("slope", "i", "j"))
        .cast("long")
        .alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy(F.lit(1))).alias("np"),
    )
    med = ranked.agg(
        F.max(
            F.when(
                F.col("rn") == F.ceil(0.5 * F.col("np")).cast("long"),
                F.col("slope"),
            )
        ).alias("ts_slope"),
        F.max("np").cast("long").alias("n_pairs"),
    )
    m = d.agg(
        F.count(F.lit(1)).cast("decimal(18,0)").alias("n"),
        F.sum("idx").cast("decimal(28,4)").alias("sx"),
        F.sum("v").cast("decimal(28,4)").alias("sy"),
        F.sum(F.col("idx") * F.col("idx")).cast("decimal(38,8)").alias("sxx"),
        F.sum(F.col("idx") * F.col("v")).cast("decimal(38,8)").alias("sxy"),
    )
    return med.crossJoin(F.broadcast(m)).select(
        F.col("n").cast("long").alias("n_days"),
        "n_pairs",
        F.round("ts_slope", 6).alias("ts_slope"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                "double"
            )
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                "double"
            ),
            6,
        ).alias("ols_slope"),
    )


_ACF_ORACLE = (
    _DAILY_CTE
    + f"""
, g AS (
    -- operands widened to DECIMAL(19,4): DuckDB multiplies same-width
    -- decimals in their own storage class, so 18+18 stays int64 and
    -- overflows at ~1e5 daily totals; 19+19 = 38 takes the HUGEINT path
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(v) AS DECIMAL(28,4)) AS sv,
           CAST(SUM(CAST(v AS DECIMAL(19,4)) * CAST(v AS DECIMAL(19,4)))
                AS DECIMAL(38,8)) AS svv
    FROM d
), lagged AS (
    SELECT b.idx - a.idx AS k,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CAST(a.v AS DECIMAL(19,4)) * CAST(b.v AS DECIMAL(19,4)))
                AS DECIMAL(38,8)) AS ck,
           CAST(SUM(a.v) AS DECIMAL(28,4)) AS s_head,
           CAST(SUM(b.v) AS DECIMAL(28,4)) AS s_tail
    FROM d a JOIN d b ON b.idx - a.idx BETWEEN 1 AND {_ACF_MAXLAG}
    GROUP BY b.idx - a.idx
)
SELECT l.k, l.n_pairs,
       ROUND((CAST(l.ck AS DOUBLE)
              - (CAST(g.sv AS DOUBLE) / g.n)
                * CAST(l.s_head + l.s_tail AS DOUBLE)
              + l.n_pairs * (CAST(g.sv AS DOUBLE) / g.n)
                          * (CAST(g.sv AS DOUBLE) / g.n))
             / (CAST(g.svv AS DOUBLE)
                - g.n * (CAST(g.sv AS DOUBLE) / g.n)
                      * (CAST(g.sv AS DOUBLE) / g.n)), 6) AS acf
FROM lagged l CROSS JOIN g
ORDER BY l.k
"""
)


@register("x_autocorr", oracle=_ACF_ORACLE)
def x_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of daily revenue at lags 1..{_ACF_MAXLAG}:
    ``r(k) = Σ(v_t−m)(v_{{t+k}}−m) / Σ(v_t−m)²`` with the numerator
    expanded so every Σ accumulates in exact DECIMAL (lag products,
    head/tail sums) and the mean corrections apply as one fixed-shape
    double expression — no order-dependent double accumulation in
    either engine. The pre-model screen: a lag-7 spike says weekly
    seasonality (x_seasonal_profile quantifies it), slow decay says
    trend (x_theil_sen measures it).

    Scale shape: the day-grain aggregate is the only pass over events;
    the lag structure is a band self-join on the CALENDAR-domain frame
    (≤ {_ACF_MAXLAG}·n_days rows — bounded by the calendar, not the
    corpus) plus a 1-row moment broadcast. Scan-bound at 100 TB.
    """
    e = load(spark, sf_dir, "events")
    d = e.groupBy(
        F.datediff(
            F.date_trunc("day", "ts").cast("timestamp_ntz"),
            F.lit("2024-01-01").cast("date"),
        )
        .cast("long")
        .alias("idx")
    ).agg(
        F.sum(F.col("value").cast("decimal(18,4)"))
        .cast("decimal(18,4)")
        .alias("v")
    )
    g = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("decimal(28,4)").alias("sv"),
        F.sum(F.col("v") * F.col("v")).cast("decimal(38,8)").alias("svv"),
    )
    b = d.select(F.col("idx").alias("jdx"), F.col("v").alias("vj"))
    lagged = (
        d.join(
            b,
            (F.col("jdx") - F.col("idx") >= 1)
            & (F.col("jdx") - F.col("idx") <= _ACF_MAXLAG),
        )
        .groupBy((F.col("jdx") - F.col("idx")).alias("k"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.col("v") * F.col("vj"))
            .cast("decimal(38,8)")
            .alias("ck"),
            F.sum("v").cast("decimal(28,4)").alias("s_head"),
            F.sum("vj").cast("decimal(28,4)").alias("s_tail"),
        )
    )
    m = F.col("sv").cast("double") / F.col("n")
    denom = F.col("svv").cast("double") - F.col("n") * m * m
    num = (
        F.col("ck").cast("double")
        - m * (F.col("s_head") + F.col("s_tail")).cast("double")
        + F.col("n_pairs") * m * m
    )
    return (
        lagged.crossJoin(F.broadcast(g))
        .select("k", "n_pairs", F.round(num / denom, 6).alias("acf"))
        .orderBy("k")
    )
