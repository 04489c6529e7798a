"""Driver-visible surface for the mergeable-sketch library (sketches.py).

Sketch binaries are engine-internal — DuckDB cannot reproduce a
DataSketches HLL/KLL/Theta estimate, so the estimates themselves can
never hash-match a cross-engine oracle. What CAN carry a full hash
oracle is the *accuracy contract*: each key below computes the exact
answer (SQL-expressible on both engines) alongside the sketch estimate,
and emits the exact value plus an ``in_bound`` flag asserting the
estimate landed within the sketch's published error bound. The oracle
computes the same exact answer and hardcodes ``in_bound = 1`` — so a
driver hash-match is simultaneously (a) a full cross-engine check of
the exact computation and (b) external evidence that the sketch path
honored its error bound on this data. Estimates are deterministic for a
given input (sketch aggregation is, per partition-count-independent
merge), so the flag is stable across runs.

Bounds used (generous 3-sigma-plus):

- HLL lgK=12 → RSE ≈ 1.04/√4096 ≈ 1.6%; bound 5%.
- KLL k=200 → rank error ≈ 1.65%; bound 3.5% ON RANK (value-space
  distance is meaningless for quantiles; we check the exact rank of the
  estimated value).
- Theta default lgK=12 nominal entries → RSE < 1%; intersections
  amplify error, so bound 10% on the overlap estimate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import register
from ..sketches import (
    daily_user_sketches,
    daily_value_quantile_sketches,
    rolling_window_estimates,
    segment_user_theta,
)

_HLL_WAU_ORACLE = """
WITH du AS (
    SELECT DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, user_id
    FROM events
), days AS (
    SELECT DISTINCT day FROM du
)
SELECT d.day,
       CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS wau_exact,
       CAST(1 AS BIGINT) AS in_bound
FROM days d
JOIN du u ON u.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
GROUP BY d.day
"""


@register("x_sketch_hll_wau", oracle=_HLL_WAU_ORACLE)
def x_sketch_hll_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL rolling WAU vs exact: per-day HLL user sketches merged over a
    trailing 7-day window in SKETCH SPACE (4 KiB per day, no data
    re-scan — the 100 TB path when even the distinct (day,user) pair set
    is too large), checked day-by-day against the exact rolling
    distinct (q_rolling_wau's plan). Emits (day, wau_exact, in_bound);
    in_bound=1 iff |est − exact| ≤ 5% · exact (HLL lgK=12 RSE≈1.6%, so
    5% is > 3 sigma)."""
    e = load(spark, sf_dir, "events")
    est = rolling_window_estimates(e, days=7)

    du = (
        e.select(
            F.col("ts").cast("timestamp").cast("date").alias("day"), "user_id"
        )
        .distinct()
    )
    d = du.select("day").distinct().select(F.col("day").alias("wday"))
    exact = (
        du.join(
            d,
            (F.col("day") <= F.col("wday"))
            & (F.col("day") >= F.date_sub(F.col("wday"), 6)),
        )
        .groupBy("wday")
        .agg(F.countDistinct("user_id").cast("bigint").alias("wau_exact"))
        .select(F.col("wday").alias("day"), "wau_exact")
    )
    return exact.join(est, "day").select(
        "day",
        "wau_exact",
        (
            F.abs(F.col("wau_est") - F.col("wau_exact"))
            <= 0.05 * F.col("wau_exact")
        )
        .cast("bigint")
        .alias("in_bound"),
    )


_KLL_QUANTILE_ORACLE = """
SELECT CAST(q AS DOUBLE) AS q, CAST(1 AS BIGINT) AS in_bound
FROM (VALUES (0.25), (0.5), (0.75), (0.95)) AS t(q)
ORDER BY q
"""


@register("x_sketch_kll_quantiles", oracle=_KLL_QUANTILE_ORACLE)
def x_sketch_kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL mergeable quantiles vs exact ranks: per-day KLL sketches of
    ``value`` merged across all days in sketch space, queried at four
    quantiles; each estimated value's EXACT rank in the data must land
    within 3.5% of the target quantile (KLL k=200 rank error ≈1.65%).
    Rank — not value distance — is the published KLL guarantee. Emits
    (q, in_bound).

    Scale note: the exact-rank check (one count per quantile) exists for
    the oracle; production keeps only the sketch path — merge a few KB
    per partition, never re-scan."""
    e = load(spark, sf_dir, "events")
    sk = daily_value_quantile_sketches(e)
    qs = [0.25, 0.5, 0.75, 0.95]
    merged = sk.agg(
        *[
            F.kll_sketch_get_quantile_double(
                F.kll_merge_agg_double("ksketch"), F.lit(q)
            ).alias(f"v{i}")
            for i, q in enumerate(qs)
        ]
    )
    vals = e.select(F.col("value").cast("double").alias("v")).where(
        F.col("v").isNotNull()
    )
    n = vals.count()
    est = merged.first()
    rows = []
    for i, q in enumerate(qs):
        v = est[f"v{i}"]
        rank = vals.where(F.col("v") <= F.lit(v)).count() / n
        rows.append((q, int(abs(rank - q) <= 0.035)))
    return spark.createDataFrame(rows, "q double, in_bound bigint").orderBy(
        "q"
    )


_THETA_OVERLAP_ORACLE = """
WITH v AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
     p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS viewers_exact,
       CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS purchasers_exact,
       CAST((SELECT COUNT(*) FROM v JOIN p USING (user_id)) AS BIGINT)
           AS overlap_exact,
       CAST(1 AS BIGINT) AS in_bound
"""


@register("x_sketch_theta_overlap", oracle=_THETA_OVERLAP_ORACLE)
def x_sketch_theta_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta set-algebra vs exact: audience overlap (viewers ∩
    purchasers) computed by INTERSECTING two Theta sketches — the set
    operation HLL cannot do — checked against the exact distinct-join
    overlap. Emits the exact audience sizes plus in_bound=1 iff the
    sketch intersection lands within 10% of the exact overlap
    (intersection amplifies Theta's <1% union RSE; 10% is generous).

    At 100 TB the two sketches are a few KB each and compose with any
    other segment without touching the log again."""
    e = load(spark, sf_dir, "events")
    th = segment_user_theta(
        e.where(F.col("event_type").isin("view", "purchase"))
    )
    est_row = (
        th.coalesce(1)
        .agg(
            F.theta_sketch_estimate(
                F.theta_intersection_agg("tsketch")
            ).alias("est")
        )
        .first()
    )
    est = float(est_row["est"])

    v = e.where(F.col("event_type") == "view").select("user_id").distinct()
    p = (
        e.where(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
    )
    exact = (
        v.agg(F.count(F.lit(1)).cast("bigint").alias("viewers_exact"))
        .crossJoin(
            p.agg(F.count(F.lit(1)).cast("bigint").alias("purchasers_exact"))
        )
        .crossJoin(
            v.join(p, "user_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("overlap_exact"))
        )
    )
    return exact.select(
        "viewers_exact",
        "purchasers_exact",
        "overlap_exact",
        (
            F.abs(F.lit(est) - F.col("overlap_exact"))
            <= 0.10 * F.col("overlap_exact")
        )
        .cast("bigint")
        .alias("in_bound"),
    )
