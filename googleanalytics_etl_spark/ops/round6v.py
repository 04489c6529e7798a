"""Round-6 batch 22: classical two-sample tests — KS and Welch.

- ``x_ks_test`` — exact two-sample Kolmogorov-Smirnov statistic of each
  document source's length distribution against the pooled rest of the
  corpus. The ECDF sup-difference is computed entirely in integers
  (``|cum_src·n_rest − cum_rest·n_src|``), so D is a single IEEE
  division of an exact BIGINT numerator — no floating ECDFs, no
  cross-engine drift. The nonparametric sibling of x_psi_drift /
  x_source_kl: PSI and KL need binning; KS is binning-free.
- ``x_welch_ttest`` — Welch's unequal-variance t-test of order value by
  order priority (each priority vs the pooled rest). All accumulation
  happens in integer cents (exact DECIMAL); the variance numerator
  n·Σx² − (Σx)² is formed exactly BEFORE any float conversion, so the
  classic catastrophic-cancellation ulp drift (two big doubles
  subtracted) cannot occur — each derived stat is one exact-integer
  cast to double followed by a short fixed IEEE expression.

Reference parity: no analogue [REF-UNVERIFIED — /root/reference is
empty]; SURVEY §2.J-M analytics extensions (drift / experiment family:
x_psi_drift, x_chi2_independence, x_ab_srm_check, x_did_analysis).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

_KS_ORACLE = """
WITH d AS (
    SELECT source, n_chars FROM documents
), cnts AS (
    SELECT source, n_chars, CAST(COUNT(*) AS BIGINT) AS c
    FROM d GROUP BY source, n_chars
), vals AS (
    SELECT n_chars, CAST(COUNT(*) AS BIGINT) AS c_all
    FROM d GROUP BY n_chars
), vcum AS (
    SELECT n_chars, c_all,
           CAST(SUM(c_all) OVER (ORDER BY n_chars) AS BIGINT) AS cum_all
    FROM vals
), srcs AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_src
    FROM d GROUP BY source
), tot AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_all FROM d
), grid AS (
    SELECT s.source, s.n_src, v.n_chars, v.cum_all,
           CAST(COALESCE(c.c, 0) AS BIGINT) AS c
    FROM srcs s
    CROSS JOIN vcum v
    LEFT JOIN cnts c ON c.source = s.source AND c.n_chars = v.n_chars
), cum AS (
    SELECT source, n_src, n_chars, cum_all,
           CAST(SUM(c) OVER (
               PARTITION BY source ORDER BY n_chars) AS BIGINT) AS cum_src
    FROM grid
)
SELECT c.source, c.n_src, (t.n_all - c.n_src) AS n_rest,
       CAST(MAX(ABS(c.cum_src * (t.n_all - c.n_src)
                    - (c.cum_all - c.cum_src) * c.n_src)) AS BIGINT)
           AS d_num,
       ROUND(CAST(MAX(ABS(c.cum_src * (t.n_all - c.n_src)
                          - (c.cum_all - c.cum_src) * c.n_src)) AS DOUBLE)
             / (CAST(c.n_src AS DOUBLE) * (t.n_all - c.n_src)), 6)
           AS d_stat
FROM cum c CROSS JOIN tot t
GROUP BY c.source, c.n_src, t.n_all
ORDER BY c.source
"""


@register("x_ks_test", oracle=_KS_ORACLE)
def x_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov drift check: for every
    document source, D = sup_x |F_src(x) − F_rest(x)| over the length
    (n_chars) distribution, source vs the pooled remainder. At each
    candidate value the ECDF difference is the integer
    ``|cum_src·n_rest − cum_rest·n_src|`` over the common denominator
    n_src·n_rest, so ``d_num`` is an exact BIGINT and ``d_stat`` one
    IEEE division — bit-stable cross-engine with no binning choice
    (contrast x_psi_drift, whose PSI depends on bin edges).

    Scale shape: after the first map-side-combinable (source, value)
    count, everything lives on the |sources| × |value-domain| GRID —
    independent of row count, the defining property that makes the op
    viable at 100 TB (a 20-source × ~10⁴-value grid is metadata). The
    global value-cum window is a single |domain|-row partition by
    construction (domain-sized, not data-sized); the per-source cum
    partitions by source. Source totals broadcast back.
    """
    d = load(spark, sf_dir, "documents").select("source", "n_chars")
    cnts = d.groupBy("source", "n_chars").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    vcum = (
        d.groupBy("n_chars")
        .agg(F.count(F.lit(1)).cast("long").alias("c_all"))
        .withColumn(
            "cum_all",
            F.sum("c_all").over(Window.orderBy("n_chars")).cast("long"),
        )
    )
    srcs = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_src")
    )
    tot = d.agg(F.count(F.lit(1)).cast("long").alias("n_all"))
    grid = (
        srcs.crossJoin(vcum.select("n_chars", "cum_all"))
        .join(F.broadcast(cnts), ["source", "n_chars"], "left")
        .select(
            "source",
            "n_src",
            "n_chars",
            "cum_all",
            F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("c"),
        )
    )
    cum = grid.withColumn(
        "cum_src",
        F.sum("c")
        .over(Window.partitionBy("source").orderBy("n_chars"))
        .cast("long"),
    )
    diff = F.abs(
        F.col("cum_src") * (F.col("n_all") - F.col("n_src"))
        - (F.col("cum_all") - F.col("cum_src")) * F.col("n_src")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("source", "n_src", "n_all")
        .agg(F.max(diff).cast("long").alias("d_num"))
        .select(
            "source",
            "n_src",
            (F.col("n_all") - F.col("n_src")).alias("n_rest"),
            "d_num",
            F.round(
                F.col("d_num").cast("double")
                / (
                    F.col("n_src").cast("double")
                    * (F.col("n_all") - F.col("n_src"))
                ),
                6,
            ).alias("d_stat"),
        )
        .orderBy("source")
    )


_WELCH_ORACLE = """
WITH o AS (
    SELECT o_orderpriority AS grp,
           CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS xc
    FROM orders
), g AS (
    SELECT grp, CAST(COUNT(*) AS DECIMAL(9,0)) AS n,
           CAST(SUM(CAST(xc AS DECIMAL(18,0))) AS DECIMAL(18,0)) AS s,
           CAST(SUM(CAST(xc AS DECIMAL(18,0)) * xc) AS DECIMAL(28,0)) AS ss
    FROM o GROUP BY grp
), t AS (
    SELECT CAST(SUM(n) AS DECIMAL(9,0)) AS n_all,
           CAST(SUM(s) AS DECIMAL(18,0)) AS s_all,
           CAST(SUM(ss) AS DECIMAL(28,0)) AS ss_all
    FROM g
), e AS (
    SELECT g.grp,
           CAST(g.n AS BIGINT) AS n,
           CAST(t.n_all - g.n AS BIGINT) AS n2,
           CAST(g.s AS DOUBLE) / (CAST(g.n AS DOUBLE) * 100.0) AS m1,
           CAST(t.s_all - g.s AS DOUBLE)
               / (CAST(t.n_all - g.n AS DOUBLE) * 100.0) AS m2,
           CAST(g.n * g.ss - CAST(g.s AS DECIMAL(19,0)) * g.s
                AS DOUBLE)
               / (CAST(g.n AS DOUBLE) * CAST(g.n - 1 AS DOUBLE)
                  * 10000.0) AS v1,
           CAST((t.n_all - g.n) * (t.ss_all - g.ss)
                - CAST(t.s_all - g.s AS DECIMAL(19,0)) * (t.s_all - g.s)
                AS DOUBLE)
               / (CAST(t.n_all - g.n AS DOUBLE)
                  * CAST(t.n_all - g.n - 1 AS DOUBLE) * 10000.0) AS v2
    FROM g CROSS JOIN t
)
SELECT grp, n, n2 AS n_rest,
       ROUND(m1, 6) AS mean_grp, ROUND(m2, 6) AS mean_rest,
       ROUND(v1, 4) AS var_grp, ROUND(v2, 4) AS var_rest,
       ROUND((m1 - m2) / SQRT(v1 / n + v2 / n2), 6) AS t_stat,
       ROUND(
           (v1 / n + v2 / n2) * (v1 / n + v2 / n2)
           / ((v1 / n) * (v1 / n) / (n - 1)
              + (v2 / n2) * (v2 / n2) / (n2 - 1)), 6) AS df_welch
FROM e
ORDER BY grp
"""


@register("x_welch_ttest", oracle=_WELCH_ORACLE)
def x_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test of order value, each priority
    class vs the pooled rest: t = (m₁−m₂)/√(v₁/n₁+v₂/n₂) with the
    Welch-Satterthwaite effective df. Group evidence (n, Σx, Σx²) is
    exact DECIMAL; the rest-side moments are derived by subtraction
    from the exact grand totals (one pass, no second scan). Mean,
    variance, t and df are short fixed IEEE expressions over those
    exact operands, written identically in both engines and rounded
    at 6 dp.

    Scale shape: one map-side-combinable groupBy(priority) carrying
    three exact accumulators; the grand total is a 5-row re-aggregate
    and joins back broadcast. Nothing after the first shuffle exceeds
    the |priority| domain. The same shape at 100 TB: the scan
    dominates, the test is free. Determinism: the variance numerator
    n·Σxc² − (Σxc)² stays in exact DECIMAL until one final cast, so no
    two independently-rounded doubles are ever subtracted.
    """
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("xc"),
    )
    g = o.groupBy("grp").agg(
        F.count(F.lit(1)).cast("decimal(9,0)").alias("n"),
        F.sum(F.col("xc").cast("decimal(18,0)"))
        .cast("decimal(18,0)")
        .alias("s"),
        F.sum(F.col("xc").cast("decimal(18,0)") * F.col("xc"))
        .cast("decimal(28,0)")
        .alias("ss"),
    )
    t = g.agg(
        F.sum("n").cast("decimal(9,0)").alias("n_all"),
        F.sum("s").cast("decimal(18,0)").alias("s_all"),
        F.sum("ss").cast("decimal(28,0)").alias("ss_all"),
    )
    m1 = F.col("s").cast("double") / (F.col("n").cast("double") * 100.0)
    m2 = (F.col("s_all") - F.col("s")).cast("double") / (
        (F.col("n_all") - F.col("n")).cast("double") * 100.0
    )
    v1 = (
        F.col("n") * F.col("ss")
        - F.col("s").cast("decimal(19,0)") * F.col("s")
    ).cast("double") / (
        F.col("n").cast("double")
        * (F.col("n") - 1).cast("double")
        * 10000.0
    )
    v2 = (
        (F.col("n_all") - F.col("n")) * (F.col("ss_all") - F.col("ss"))
        - (F.col("s_all") - F.col("s")).cast("decimal(19,0)")
        * (F.col("s_all") - F.col("s"))
    ).cast("double") / (
        (F.col("n_all") - F.col("n")).cast("double")
        * (F.col("n_all") - F.col("n") - 1).cast("double")
        * 10000.0
    )
    e = g.crossJoin(F.broadcast(t)).select(
        "grp",
        F.col("n").cast("long").alias("n"),
        (F.col("n_all") - F.col("n")).cast("long").alias("n2"),
        m1.alias("m1"),
        m2.alias("m2"),
        v1.alias("v1"),
        v2.alias("v2"),
    )
    se2 = F.col("v1") / F.col("n") + F.col("v2") / F.col("n2")
    return e.select(
        "grp",
        "n",
        F.col("n2").alias("n_rest"),
        F.round("m1", 6).alias("mean_grp"),
        F.round("m2", 6).alias("mean_rest"),
        F.round("v1", 4).alias("var_grp"),
        F.round("v2", 4).alias("var_rest"),
        F.round((F.col("m1") - F.col("m2")) / F.sqrt(se2), 6).alias(
            "t_stat"
        ),
        F.round(
            se2
            * se2
            / (
                (F.col("v1") / F.col("n"))
                * (F.col("v1") / F.col("n"))
                / (F.col("n") - 1)
                + (F.col("v2") / F.col("n2"))
                * (F.col("v2") / F.col("n2"))
                / (F.col("n2") - 1)
            ),
            6,
        ).alias("df_welch"),
    ).orderBy("grp")
