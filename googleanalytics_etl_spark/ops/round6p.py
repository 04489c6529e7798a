"""Round-6 batch 16: experimentation-rigor statistics.

- ``x_chi2_independence`` — the chi-squared independence test between
  event type and day-of-week: observed vs expected cell counts and the
  χ² statistic. The seasonality gate: a significant statistic means
  day-of-week must be a stratification key in any event-level sample
  (``x_stratified_sample``) or the sample inherits the weekly cycle.
- ``x_ab_srm_check`` — the sample-ratio-mismatch guardrail for the
  user_id-parity assignment ``x_did_analysis`` consumes: user counts
  per arm, the binomial z-score against the designed 50/50 split, and
  the alarm flag. SRM is the first thing a trustworthy experiment
  platform checks — an imbalanced split invalidates every downstream
  metric before it is computed.

Reference parity: no analogue [REF-UNVERIFIED — /root/reference is
empty]; SURVEY §2.E analytics extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

# χ² terms involve one double division and square per cell; every term
# is quantized to DECIMAL(18,8) before the associative sum (the
# x_psi_drift recipe), so the statistic is bit-identical cross-engine.
def _chi2_oracle() -> str:
    # dof = (R-1)(C-1) computed from the distinct margins
    return """
WITH cells AS (
    SELECT event_type, dayofweek(CAST(ts AS TIMESTAMP)) AS dow,
           CAST(COUNT(*) AS BIGINT) AS o
    FROM events GROUP BY 1, 2
), mar AS (
    SELECT event_type, dow, o,
           SUM(o) OVER (PARTITION BY event_type) AS row_tot,
           SUM(o) OVER (PARTITION BY dow) AS col_tot,
           SUM(o) OVER () AS n
    FROM cells
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(o) AS BIGINT) AS n_events,
       CAST((COUNT(DISTINCT event_type) - 1)
            * (COUNT(DISTINCT dow) - 1) AS BIGINT) AS dof,
       ROUND(CAST(SUM(CAST(
           (o - CAST(row_tot AS DOUBLE) * col_tot / n)
           * (o - CAST(row_tot AS DOUBLE) * col_tot / n)
           / (CAST(row_tot AS DOUBLE) * col_tot / n)
           AS DECIMAL(18,8))) AS DOUBLE), 6) AS chi2
FROM mar
"""


@register("x_chi2_independence", oracle=_chi2_oracle())
def x_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """χ² independence test between event_type and day-of-week: one
    row with the cell count, event total, degrees of freedom
    (R−1)(C−1), and the χ² statistic Σ(O−E)²/E over the contingency
    table. Compared against the χ² critical value for the dof, this
    decides whether day-of-week is a real stratification dimension or
    noise — BEFORE a sampling or mixture design bakes it in.

    Scale shape: ONE map-combined aggregate to the |types × 7|-cell
    contingency table, margin windows over that POST-AGGREGATION frame
    (≤ 35 metadata rows — the single partition is free), one final
    1-row aggregate. Expected counts are one identical double op
    sequence per cell; χ² terms quantize to DECIMAL(18,8) before the
    associative sum.

    NB: Spark numbers dayofweek 1–7, DuckDB 0–6 — safe here because
    the label is only a GROUPING key (the offset is a bijection, so
    cells, margins, dof and χ² are identical) and never reaches the
    output.
    """
    e = load(spark, sf_dir, "events")
    cells = e.groupBy(
        "event_type",
        F.dayofweek(F.col("ts").cast("timestamp")).alias("dow"),
    ).agg(F.count(F.lit(1)).cast("long").alias("o"))
    mar = cells.select(
        "event_type",
        "dow",
        "o",
        F.sum("o").over(Window.partitionBy("event_type")).alias("row_tot"),
        F.sum("o").over(Window.partitionBy("dow")).alias("col_tot"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    exp = F.col("row_tot").cast("double") * F.col("col_tot") / F.col("n")
    term = ((F.col("o") - exp) * (F.col("o") - exp) / exp).cast(
        "decimal(18,8)"
    )
    return mar.agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.sum("o").cast("long").alias("n_events"),
        (
            (F.countDistinct("event_type") - 1)
            * (F.countDistinct("dow") - 1)
        )
        .cast("long")
        .alias("dof"),
        F.round(F.sum(term).cast("double"), 6).alias("chi2"),
    )


# ---------------------------------------------------------------------------
# x_ab_srm_check — sample-ratio mismatch
# ---------------------------------------------------------------------------

# z = (n_t − N/2) / √(N/4) for a designed 50/50 split. √ is an exact
# IEEE operation (no cross-engine ulp drift, unlike log/pow), so the
# z-score is one identical op sequence on both engines.
_SRM_ORACLE = """
WITH arms AS (
    SELECT user_id % 2 AS treated FROM events GROUP BY user_id
), tallies AS (
    SELECT CAST(SUM(CASE WHEN treated = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_treat,
           CAST(SUM(CASE WHEN treated = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_control
    FROM arms
)
SELECT n_treat, n_control,
       CAST(n_treat + n_control AS BIGINT) AS n_users,
       ROUND(CAST(n_treat AS DOUBLE) / (n_treat + n_control), 6)
           AS treat_share,
       ROUND((n_treat - (n_treat + n_control) / 2.0)
             / SQRT((n_treat + n_control) / 4.0), 6) AS z_score,
       CAST(CASE WHEN ABS((n_treat - (n_treat + n_control) / 2.0)
                          / SQRT((n_treat + n_control) / 4.0)) > 3
                 THEN 1 ELSE 0 END AS BIGINT) AS srm_alarm
FROM tallies
"""


@register("x_ab_srm_check", oracle=_SRM_ORACLE)
def x_ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch check for the user-parity assignment: one
    row with per-arm USER counts (assignment is a user property — the
    tally deduplicates users first, never counts events), the treated
    share, the binomial z-score against the designed 50/50 split, and
    the |z| > 3 alarm. A firing alarm means the assignment mechanism
    is broken (filtering, logging loss, redirect bias) and every
    metric downstream — ``x_did_analysis`` included — is invalid.

    Scale shape: one user-grain distinct (map-side partial dedup on
    user_id), one 1-row conditional aggregate. The z-score uses √
    (exactly rounded in IEEE — no cross-engine drift, unlike the
    log/pow family) so no decimal quantization is needed.
    """
    e = load(spark, sf_dir, "events")
    arms = e.select("user_id").distinct().select(
        (F.col("user_id") % 2).alias("treated")
    )
    t = F.sum((F.col("treated") == 1).cast("long"))
    c = F.sum((F.col("treated") == 0).cast("long"))
    n = t + c
    z = (t - n / 2.0) / F.sqrt(n / 4.0)
    return arms.agg(
        t.cast("long").alias("n_treat"),
        c.cast("long").alias("n_control"),
        n.cast("long").alias("n_users"),
        F.round(t.cast("double") / n, 6).alias("treat_share"),
        F.round(z, 6).alias("z_score"),
        (F.abs(z) > 3).cast("long").alias("srm_alarm"),
    )
