"""Round-6 batch 48: aggregation-reversal detection + effect size.

- ``x_simpsons_slope`` — the Simpson's-paradox screen: the OLS slope
  of event value on hour-of-day computed POOLED and within each event
  type, with a reversal flag where the segment slope's sign opposes
  the pooled one. Aggregation reversal is the most common way a
  correct query produces a wrong conclusion — this op makes the check
  mechanical. All OLS moments accumulate exactly per segment; the
  pooled moments are the SUMS of the segment moments (one extra
  aggregate, not a second scan).
- ``x_cohens_d`` — standardized effect size between the md5 A/B
  variants: Cohen's d = (x̄_A − x̄_B)/s_pooled with the pooled SD from
  exact per-variant moments. The companion readout to x_welch_ttest:
  t says "statistically detectable", d says "big enough to matter" —
  at 100 TB sample sizes every trivial difference is significant, so
  d is the number that should gate decisions.

Reference parity: no analogue [REF-UNVERIFIED — /root/reference is
empty]; SURVEY §2.E analytics extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

_SIMPSON_ORACLE = """
WITH q AS (
    SELECT event_type,
           CAST(hour(ts) AS BIGINT) AS x,
           CAST(value AS DECIMAL(18,4)) AS y
    FROM events
), seg AS (
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS BIGINT) AS sx,
           CAST(SUM(y) AS DECIMAL(28,4)) AS sy,
           CAST(SUM(x * x) AS BIGINT) AS sxx,
           CAST(SUM(x * y) AS DECIMAL(38,4)) AS sxy
    FROM q GROUP BY event_type
), pooled AS (
    SELECT CAST(SUM(n) AS BIGINT) AS n,
           CAST(SUM(sx) AS BIGINT) AS sx,
           CAST(SUM(sy) AS DECIMAL(32,4)) AS sy,
           CAST(SUM(sxx) AS BIGINT) AS sxx,
           CAST(SUM(sxy) AS DECIMAL(38,4)) AS sxy
    FROM seg
)
SELECT s.event_type,
       s.n,
       ROUND(CAST(s.n * s.sxy - s.sx * s.sy AS DOUBLE)
             / CAST(s.n * s.sxx - s.sx * s.sx AS DOUBLE), 6)
           AS slope_segment,
       ROUND(CAST(p.n * p.sxy - p.sx * p.sy AS DOUBLE)
             / CAST(p.n * p.sxx - p.sx * p.sx AS DOUBLE), 6)
           AS slope_pooled,
       CASE WHEN (CAST(s.n * s.sxy - s.sx * s.sy AS DOUBLE)
                  / CAST(s.n * s.sxx - s.sx * s.sx AS DOUBLE))
                 * (CAST(p.n * p.sxy - p.sx * p.sy AS DOUBLE)
                    / CAST(p.n * p.sxx - p.sx * p.sx AS DOUBLE)) < 0
            THEN 1 ELSE 0 END AS sign_reversal
FROM seg s CROSS JOIN pooled p
"""


@register("x_simpsons_slope", oracle=_SIMPSON_ORACLE)
def x_simpsons_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox screen: per-segment vs pooled OLS slope of
    value on hour-of-day, with a sign-reversal flag. A flipped sign
    means segment composition — not behavior — drives the pooled
    trend, and any "value rises through the day" conclusion must
    condition on segment. The pooled moments are the exact SUMS of
    the per-segment moments, so the comparison costs one 5-row
    re-aggregation, never a second scan; slopes are the fixed-shape
    ``n·Σxy − Σx·Σy`` ratio on exact operands.

    Scale shape: one map-side-combinable segment-grain moment
    aggregate over the scan; everything else is algebra on the
    segment-domain frame plus a 1-row pooled broadcast. Scan-bound at
    100 TB.
    """
    e = load(spark, sf_dir, "events")
    q = e.select(
        "event_type",
        F.hour("ts").cast("long").alias("x"),
        F.col("value").cast("decimal(18,4)").alias("y"),
    )
    seg = q.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("decimal(28,4)").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("decimal(38,4)").alias("sxy"),
    )
    pooled = seg.agg(
        F.sum("n").cast("long").alias("pn"),
        F.sum("sx").cast("long").alias("psx"),
        F.sum("sy").cast("decimal(32,4)").alias("psy"),
        F.sum("sxx").cast("long").alias("psxx"),
        F.sum("sxy").cast("decimal(38,4)").alias("psxy"),
    )

    def slope(n, sx, sy, sxx, sxy):
        return (
            (F.col(n) * F.col(sxy) - F.col(sx) * F.col(sy)).cast("double")
            / (F.col(n) * F.col(sxx) - F.col(sx) * F.col(sx)).cast("double")
        )

    s_seg = slope("n", "sx", "sy", "sxx", "sxy")
    s_pool = slope("pn", "psx", "psy", "psxx", "psxy")
    return seg.crossJoin(F.broadcast(pooled)).select(
        "event_type",
        "n",
        F.round(s_seg, 6).alias("slope_segment"),
        F.round(s_pool, 6).alias("slope_pooled"),
        F.when(s_seg * s_pool < 0, 1).otherwise(0).alias("sign_reversal"),
    )


_COHEN_ORACLE = """
WITH u AS (
    SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
                THEN 'A' ELSE 'B' END AS variant,
           CAST(value AS DECIMAL(18,4)) AS y
    FROM events
), m AS (
    SELECT variant,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(y) AS DECIMAL(32,4)) AS s,
           CAST(SUM(CAST(y AS DECIMAL(19,4)) * CAST(y AS DECIMAL(19,4)))
                AS DECIMAL(38,8)) AS ss
    FROM u GROUP BY variant
), w AS (
    SELECT MAX(CASE WHEN variant = 'A' THEN n END) AS na,
           MAX(CASE WHEN variant = 'A' THEN CAST(s AS DOUBLE) END) AS sa,
           MAX(CASE WHEN variant = 'A' THEN CAST(ss AS DOUBLE) END) AS ssa,
           MAX(CASE WHEN variant = 'B' THEN n END) AS nb,
           MAX(CASE WHEN variant = 'B' THEN CAST(s AS DOUBLE) END) AS sb,
           MAX(CASE WHEN variant = 'B' THEN CAST(ss AS DOUBLE) END) AS ssb
    FROM m
)
SELECT na AS n_a, nb AS n_b,
       ROUND(sa / na, 6) AS mean_a,
       ROUND(sb / nb, 6) AS mean_b,
       ROUND((sa / na - sb / nb)
             / sqrt(((ssa - sa * sa / na) + (ssb - sb * sb / nb))
                    / (na + nb - 2)), 6) AS cohens_d
FROM w
"""


@register("x_cohens_d", oracle=_COHEN_ORACLE)
def x_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d between the md5 A/B variants on event value:
    ``(x̄_A − x̄_B) / s_pooled`` with the pooled SD from per-variant
    exact moments (``Σ(y−ȳ)² = Σy² − (Σy)²/n`` formed in double from
    exact decimal aggregates, both engines identically). The
    magnitude companion to x_welch_ttest's significance: |d| < 0.2 is
    conventionally "nothing" regardless of p-value — the right gate
    when n is huge.

    Scale shape: one map-side-combinable variant-grain moment
    aggregate (the only pass), pivoted to one row; d is one
    fixed-shape expression. Scan-bound at 100 TB.
    """
    e = load(spark, sf_dir, "events")
    variant = F.when(
        F.substring(
            F.md5(F.col("user_id").cast("string").cast("binary")), 1, 1
        )
        < "8",
        "A",
    ).otherwise("B")
    u = e.select(
        variant.alias("variant"),
        F.col("value").cast("decimal(18,4)").alias("y"),
    )
    m = u.groupBy("variant").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("decimal(32,4)").alias("s"),
        F.sum(
            F.col("y").cast("decimal(19,4)") * F.col("y").cast("decimal(19,4)")
        )
        .cast("decimal(38,8)")
        .alias("ss"),
    )
    pick = lambda v, c, t: F.max(  # noqa: E731 — variant pivot helper
        F.when(F.col("variant") == v, F.col(c).cast(t))
    )
    w = m.agg(
        pick("A", "n", "long").alias("na"),
        pick("A", "s", "double").alias("sa"),
        pick("A", "ss", "double").alias("ssa"),
        pick("B", "n", "long").alias("nb"),
        pick("B", "s", "double").alias("sb"),
        pick("B", "ss", "double").alias("ssb"),
    )
    mean_a = F.col("sa") / F.col("na")
    mean_b = F.col("sb") / F.col("nb")
    pooled_var = (
        (F.col("ssa") - F.col("sa") * F.col("sa") / F.col("na"))
        + (F.col("ssb") - F.col("sb") * F.col("sb") / F.col("nb"))
    ) / (F.col("na") + F.col("nb") - 2)
    return w.select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        F.round(mean_a, 6).alias("mean_a"),
        F.round(mean_b, 6).alias("mean_b"),
        F.round((mean_a - mean_b) / F.sqrt(pooled_var), 6).alias("cohens_d"),
    )
