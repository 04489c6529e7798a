"""Round-6 batch 47: randomness testing + inventory classification.

- ``x_runs_test`` — the Wald–Wolfowitz runs test on daily revenue vs
  its median: too FEW runs of consecutive above/below-median days
  means trend/autocorrelation, too MANY means oscillation — the
  nonparametric "is this series random?" gate run before trusting
  i.i.d.-assuming statistics (x_bootstrap_ci's resampling, Welch).
  The run count, the above/below tallies, and the closed-form
  expectation/variance are all exact integers into one final z.
- ``x_abc_class`` — ABC inventory classification: parts ranked by
  revenue, class A up to {_ABC_A}% cumulative share, B to {_ABC_B}%,
  C after. The classic Pareto cut behind every stocking policy. The
  class boundaries are exact-decimal CROSS-MULTIPLIED comparisons
  (``20·cum ≤ 19·total``) — no float share ever decides a part's
  class, so both engines cut identically.

Reference parity: no analogue [REF-UNVERIFIED — /root/reference is
empty]; SURVEY §2.E analytics extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

_ABC_A = 80  # class-A cumulative revenue share, percent
_ABC_B = 95  # class-B cumulative revenue share, percent

_RUNS_ORACLE = """
WITH d AS (
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS v
    FROM events GROUP BY date_trunc('day', ts)
), med AS (
    SELECT MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN v END)
               AS m
    FROM (SELECT v,
                 CAST(ROW_NUMBER() OVER (ORDER BY v, day) AS BIGINT) AS rn,
                 COUNT(*) OVER () AS n
          FROM d)
), signs AS (
    SELECT d.day, CASE WHEN d.v > med.m THEN 1 ELSE 0 END AS s
    FROM d CROSS JOIN med
    WHERE d.v <> med.m
), runs AS (
    SELECT s,
           CASE WHEN LAG(s) OVER (ORDER BY day) IS NULL
                  OR LAG(s) OVER (ORDER BY day) <> s
                THEN 1 ELSE 0 END AS is_new
    FROM signs
), agg AS (
    SELECT CAST(SUM(is_new) AS BIGINT) AS r,
           CAST(SUM(s) AS BIGINT) AS n1,
           CAST(SUM(1 - s) AS BIGINT) AS n2
    FROM runs
)
SELECT n1 + n2 AS n_days_used, n1 AS n_above, n2 AS n_below, r AS runs,
       ROUND(1.0 + 2.0 * n1 * n2 / (n1 + n2), 6) AS expected_runs,
       ROUND((r - (1.0 + 2.0 * n1 * n2 / (n1 + n2)))
             / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                    / ((CAST(n1 + n2 AS DOUBLE)) * (n1 + n2)
                       * (n1 + n2 - 1))), 6) AS z
FROM agg
"""


@register("x_runs_test", oracle=_RUNS_ORACLE)
def x_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test on daily revenue: days above vs below
    the exact discrete median (median-equal days dropped, the
    textbook convention), run count from one lag flag, and the
    closed-form z against ``E[R] = 1 + 2·n1·n2/n``. |z| > 2 says the
    series is NOT exchangeable — trend or oscillation — and
    i.i.d.-premised inference on it is suspect.

    Scale shape: the day aggregate is the only pass over events;
    median pick, sign sequence, and the run-boundary lag all run on
    the CALENDAR-domain frame (30 rows at any SF). Every count is an
    exact integer; z is one fixed-shape expression. Scan-bound at
    100 TB.
    """
    e = load(spark, sf_dir, "events")
    d = e.groupBy(
        F.date_trunc("day", "ts").cast("timestamp_ntz").alias("day")
    ).agg(
        F.sum(F.col("value").cast("decimal(18,4)"))
        .cast("decimal(18,4)")
        .alias("v")
    )
    ranked = d.select(
        "day",
        "v",
        F.row_number().over(Window.orderBy("v", "day")).cast("long").alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy(F.lit(1))).alias("n"),
    )
    med = ranked.agg(
        F.max(
            F.when(
                F.col("rn") == F.ceil(0.5 * F.col("n")).cast("long"),
                F.col("v"),
            )
        ).alias("m")
    )
    signs = (
        d.crossJoin(F.broadcast(med))
        .where(F.col("v") != F.col("m"))
        .select(
            "day", F.when(F.col("v") > F.col("m"), 1).otherwise(0).alias("s")
        )
    )
    lag_s = F.lag("s").over(Window.orderBy("day"))
    runs = signs.select(
        "s",
        F.when(lag_s.isNull() | (lag_s != F.col("s")), 1)
        .otherwise(0)
        .alias("is_new"),
    )
    agg = runs.agg(
        F.sum("is_new").cast("long").alias("r"),
        F.sum("s").cast("long").alias("n1"),
        F.sum(1 - F.col("s")).cast("long").alias("n2"),
    )
    n1, n2, r = F.col("n1"), F.col("n2"), F.col("r")
    exp_r = 1.0 + 2.0 * n1 * n2 / (n1 + n2)
    var_r = (
        2.0
        * n1
        * n2
        * (2.0 * n1 * n2 - n1 - n2)
        / ((n1 + n2).cast("double") * (n1 + n2) * (n1 + n2 - 1))
    )
    return agg.select(
        (n1 + n2).alias("n_days_used"),
        n1.alias("n_above"),
        n2.alias("n_below"),
        r.alias("runs"),
        F.round(exp_r, 6).alias("expected_runs"),
        F.round((r - exp_r) / F.sqrt(var_r), 6).alias("z"),
    )


_ABC_ORACLE = f"""
WITH pr AS (
    SELECT l_partkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
                AS DECIMAL(28,4)) AS rev
    FROM lineitem GROUP BY l_partkey
), ranked AS (
    SELECT l_partkey, rev,
           CAST(SUM(rev) OVER (ORDER BY rev DESC, l_partkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DECIMAL(32,4)) AS cum,
           CAST(SUM(rev) OVER () AS DECIMAL(32,4)) AS tot
    FROM pr
), classed AS (
    SELECT l_partkey, rev,
           CASE WHEN {100 // 20} * cum <= {_ABC_A // 20} * tot THEN 'A'
                WHEN {100 // 5} * cum <= {_ABC_B // 5} * tot THEN 'B'
                ELSE 'C' END AS abc
    FROM ranked
)
SELECT abc,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(rev) AS DOUBLE) AS revenue,
       ROUND(CAST(SUM(rev) AS DOUBLE)
             / (SELECT CAST(SUM(rev) AS DOUBLE) FROM pr), 6)
           AS revenue_share
FROM classed GROUP BY abc
"""


@register("x_abc_class", oracle=_ABC_ORACLE)
def x_abc_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC classification: parts ranked by revenue, class A while the
    cumulative share stays ≤ {_ABC_A}% (exact test ``5·cum ≤ 4·tot``
    in decimal — cross-multiplication, never a float share), B to
    {_ABC_B}% (``20·cum ≤ 19·tot``), C after; reported per class with
    part counts and revenue shares. The Pareto cut behind cycle-count
    frequencies and service-level tiers — and the classification
    twin of x_gini_concentration's coefficient.

    Scale shape: one map-side-combinable part-grain revenue aggregate
    (the only pass over lineitem), then the cumulative window on the
    PART-domain frame with the q_global_rank range-partitioned recipe
    at 100 TB. Class cuts are exact-decimal comparisons; the 3-row
    output divides once per row.
    """
    li = load(spark, sf_dir, "lineitem")
    pr = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
        .cast("decimal(28,4)")
        .alias("rev")
    )
    wcum = Window.orderBy(F.col("rev").desc(), "l_partkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = pr.select(
        "l_partkey",
        "rev",
        F.sum("rev").over(wcum).cast("decimal(32,4)").alias("cum"),
        F.sum("rev")
        .over(Window.partitionBy(F.lit(1)))
        .cast("decimal(32,4)")
        .alias("tot"),
    )
    classed = ranked.select(
        "rev",
        F.when(5 * F.col("cum") <= 4 * F.col("tot"), "A")
        .when(20 * F.col("cum") <= 19 * F.col("tot"), "B")
        .otherwise("C")
        .alias("abc"),
        "tot",
    )
    return classed.groupBy("abc").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum("rev").cast("double").alias("revenue"),
        F.round(
            F.sum("rev").cast("double") / F.max("tot").cast("double"), 6
        ).alias("revenue_share"),
    )
