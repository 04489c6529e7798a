"""Round-6 batch 23: rank dependence and concentration — Spearman, Gini.

- ``x_spearman_corr`` — Spearman rank correlation between a customer's
  order count and total spend, with textbook average-rank tie
  handling. Ranks are computed on the VALUE DOMAIN (groupBy value →
  cumulative count), not by sorting the data rows, and doubled so tied
  average ranks stay integers; the correlation is then one IEEE
  division of exact DECIMAL moment sums. Complements q_correlation
  (Pearson, moment-scale) with the rank-scale statistic that survives
  monotone transforms and outliers.
- ``x_gini_concentration`` — per-nation spend concentration: exact
  Gini coefficient (sorted-rank formula), Herfindahl-Hirschman index,
  and top-decile share. The whale-curve triple every curation audit
  wants next to x_shard_balance / x_class_balance, computed from
  integer cents with one final division per statistic.

Reference parity: no analogue [REF-UNVERIFIED — /root/reference is
empty]; SURVEY §2.J-M analytics extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

_SPEARMAN_ORACLE = """
WITH pc AS (
    SELECT o_custkey AS cust,
           CAST(COUNT(*) AS BIGINT) AS x,
           CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                AS BIGINT) AS y
    FROM orders GROUP BY o_custkey
), dx AS (
    SELECT x, CAST(COUNT(*) AS BIGINT) AS c FROM pc GROUP BY x
), rx AS (
    SELECT x,
           2 * (CAST(SUM(c) OVER (ORDER BY x) AS BIGINT) - c) + c + 1 AS u
    FROM dx
), dy AS (
    SELECT y, CAST(COUNT(*) AS BIGINT) AS c FROM pc GROUP BY y
), ry AS (
    SELECT y,
           2 * (CAST(SUM(c) OVER (ORDER BY y) AS BIGINT) - c) + c + 1 AS v
    FROM dy
), j AS (
    SELECT CAST(rx.u AS DECIMAL(18,0)) AS u,
           CAST(ry.v AS DECIMAL(18,0)) AS v
    FROM pc JOIN rx ON pc.x = rx.x JOIN ry ON pc.y = ry.y
), m AS (
    SELECT CAST(COUNT(*) AS DECIMAL(18,0)) AS n,
           CAST(SUM(u) AS DECIMAL(28,0)) AS su,
           CAST(SUM(v) AS DECIMAL(28,0)) AS sv,
           CAST(SUM(u * u) AS DECIMAL(38,0)) AS suu,
           CAST(SUM(v * v) AS DECIMAL(38,0)) AS svv,
           CAST(SUM(u * v) AS DECIMAL(38,0)) AS suv
    FROM j
)
SELECT CAST(n AS BIGINT) AS n_cust,
       ROUND(CAST(n * suv - su * sv AS DOUBLE)
             / SQRT(CAST(n * suu - su * su AS DOUBLE)
                    * CAST(n * svv - sv * sv AS DOUBLE)), 6) AS rho
FROM m
"""


@register("x_spearman_corr", oracle=_SPEARMAN_ORACLE)
def x_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between per-customer order count and
    total spend (integer cents), average-rank ties. Tied values get
    rank (first+last)/2; we carry u = 2·rank so ties stay integral,
    which leaves the correlation unchanged (affine invariance). rho is
    the Pearson form n·Σuv − Σu·Σv over the exact DECIMAL moments,
    with one final double division — bit-stable cross-engine.

    Scale shape: ranking happens on the VALUE DOMAIN (groupBy x →
    |distinct x| rows → cumulative window), never by globally sorting
    the n-row frame — for count-like and cent-valued columns the
    domain is orders of magnitude smaller than the data, and the rank
    maps join back broadcast. The moment pass is one
    map-side-combinable aggregate. Headroom: moments of u ≤ 2n keep
    n·Σu² < 4n⁴ inside DECIMAL(38) up to n ≈ 10⁹ rows per scope;
    beyond that, shift to centered accumulation.
    """
    pc = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("cust"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("x"),
            F.sum(
                F.round(F.col("o_totalprice") * 100, 0).cast("long")
            )
            .cast("long")
            .alias("y"),
        )
    )

    def _rank_map(col: str, out: str) -> DataFrame:
        d = pc.groupBy(col).agg(F.count(F.lit(1)).cast("long").alias("c"))
        return d.select(
            col,
            (
                2
                * (
                    F.sum("c").over(Window.orderBy(col)).cast("long")
                    - F.col("c")
                )
                + F.col("c")
                + 1
            ).alias(out),
        )

    rx = _rank_map("x", "u")
    ry = _rank_map("y", "v")
    j = (
        pc.join(F.broadcast(rx), "x")
        .join(F.broadcast(ry), "y")
        .select(
            F.col("u").cast("decimal(18,0)").alias("u"),
            F.col("v").cast("decimal(18,0)").alias("v"),
        )
    )
    m = j.agg(
        F.count(F.lit(1)).cast("decimal(18,0)").alias("n"),
        F.sum("u").cast("decimal(28,0)").alias("su"),
        F.sum("v").cast("decimal(28,0)").alias("sv"),
        F.sum(F.col("u") * F.col("u")).cast("decimal(38,0)").alias("suu"),
        F.sum(F.col("v") * F.col("v")).cast("decimal(38,0)").alias("svv"),
        F.sum(F.col("u") * F.col("v")).cast("decimal(38,0)").alias("suv"),
    )
    return m.select(
        F.col("n").cast("long").alias("n_cust"),
        F.round(
            (F.col("n") * F.col("suv") - F.col("su") * F.col("sv")).cast(
                "double"
            )
            / F.sqrt(
                (
                    F.col("n") * F.col("suu") - F.col("su") * F.col("su")
                ).cast("double")
                * (
                    F.col("n") * F.col("svv") - F.col("sv") * F.col("sv")
                ).cast("double")
            ),
            6,
        ).alias("rho"),
    )


_GINI_ORACLE = """
WITH spend AS (
    SELECT c.c_nationkey AS nk,
           c.c_custkey AS cust,
           CAST(COALESCE(SUM(CAST(ROUND(o.o_totalprice * 100, 0)
                                  AS BIGINT)), 0) AS BIGINT) AS cents
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_nationkey, c.c_custkey
), ranked AS (
    SELECT nk, cust, cents,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY nk ORDER BY cents, cust) AS BIGINT) AS rn,
           CAST(COUNT(*) OVER (PARTITION BY nk) AS BIGINT) AS n
    FROM spend
), agg AS (
    SELECT nk, n,
           CAST(SUM(CAST(cents AS DECIMAL(28,0))) AS DECIMAL(28,0)) AS t,
           CAST(SUM(CAST(rn AS DECIMAL(18,0)) * cents)
                AS DECIMAL(38,0)) AS rws,
           CAST(SUM(CAST(cents AS DECIMAL(19,0)) * cents)
                AS DECIMAL(38,0)) AS sq,
           CAST(SUM(CASE WHEN rn > n - CAST(CEIL(n / 10.0) AS BIGINT)
                         THEN CAST(cents AS DECIMAL(28,0))
                         ELSE CAST(0 AS DECIMAL(28,0)) END)
                AS DECIMAL(28,0)) AS top_t
    FROM ranked
    GROUP BY nk, n
)
SELECT n.n_name AS nation, a.n AS n_cust,
       CAST(a.t AS BIGINT) AS total_cents,
       ROUND(CAST(2 * a.rws - (a.n + 1) * a.t AS DOUBLE)
             / (CAST(a.n AS DOUBLE) * CAST(a.t AS DOUBLE)), 6) AS gini,
       ROUND(CAST(a.sq AS DOUBLE)
             / (CAST(a.t AS DOUBLE) * CAST(a.t AS DOUBLE)), 6) AS hhi,
       ROUND(CAST(a.top_t AS DOUBLE) / CAST(a.t AS DOUBLE), 6)
           AS top_decile_share
FROM agg a JOIN nation n ON n.n_nationkey = a.nk
ORDER BY nation
"""


@register("x_gini_concentration", oracle=_GINI_ORACLE)
def x_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation customer-spend concentration: Gini coefficient via
    the sorted-rank identity G = (2·Σ rᵢxᵢ − (n+1)·Σx)/(n·Σx) with the
    deterministic (cents, custkey) order, Herfindahl index Σ(xᵢ/T)² =
    Σxᵢ²/T², and the spend share of the top ⌈n/10⌉ customers.
    Customers with no orders participate with zero spend (LEFT join) —
    dropping them understates inequality. All accumulation is exact
    integer cents in DECIMAL; each output statistic is one final
    IEEE division.

    Scale shape: the orders aggregate is map-side-combinable on
    custkey; ranking partitions by nation, so the sort is per-group and
    distributed (no global window). One skew caveat at 100 TB: a nation
    holding most customers makes one partition's sort n_g·log n_g — the
    standard mitigation (range-partition by (nk, cents) then
    sortWithinPartitions + per-partition offsets) drops in without
    changing this result. Nation dim joins BROADCAST.
    """
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("xc"),
    )
    per_cust = o.groupBy("o_custkey").agg(
        F.sum("xc").cast("long").alias("cents_o")
    )
    spend = (
        c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left")
        .select(
            F.col("c_nationkey").alias("nk"),
            F.col("c_custkey").alias("cust"),
            F.coalesce(F.col("cents_o"), F.lit(0))
            .cast("long")
            .alias("cents"),
        )
    )
    w = Window.partitionBy("nk").orderBy("cents", "cust")
    ranked = spend.select(
        "nk",
        "cents",
        F.row_number().over(w).cast("long").alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("nk"))
        .cast("long")
        .alias("n"),
    )
    top_k = F.ceil(F.col("n") / 10.0).cast("long")
    agg = ranked.groupBy("nk", "n").agg(
        F.sum(F.col("cents").cast("decimal(28,0)"))
        .cast("decimal(28,0)")
        .alias("t"),
        F.sum(F.col("rn").cast("decimal(18,0)") * F.col("cents"))
        .cast("decimal(38,0)")
        .alias("rws"),
        F.sum(F.col("cents").cast("decimal(19,0)") * F.col("cents"))
        .cast("decimal(38,0)")
        .alias("sq"),
        F.sum(
            F.when(
                F.col("rn") > F.col("n") - top_k,
                F.col("cents").cast("decimal(28,0)"),
            ).otherwise(F.lit(0).cast("decimal(28,0)"))
        )
        .cast("decimal(28,0)")
        .alias("top_t"),
    )
    nat = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        agg.join(F.broadcast(nat), agg.nk == nat.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.col("n").alias("n_cust"),
            F.col("t").cast("long").alias("total_cents"),
            F.round(
                (
                    2 * F.col("rws") - (F.col("n") + 1) * F.col("t")
                ).cast("double")
                / (F.col("n").cast("double") * F.col("t").cast("double")),
                6,
            ).alias("gini"),
            F.round(
                F.col("sq").cast("double")
                / (F.col("t").cast("double") * F.col("t").cast("double")),
                6,
            ).alias("hhi"),
            F.round(
                F.col("top_t").cast("double") / F.col("t").cast("double"),
                6,
            ).alias("top_decile_share"),
        )
        .orderBy("nation")
    )
