"""Round-6 batch 19: model-evaluation statistics over pipeline signals.

- ``x_auc_roc`` — exact Mann-Whitney AUC (tie-corrected) of the
  ``value`` signal as a ranker for purchase events. The standard
  "does this heuristic score actually separate the classes?" check a
  curation pipeline runs before trusting a filter threshold — the
  rank-sum formulation needs no probability calibration and is exact
  in integers.
- ``x_calibration_ece`` — 10-bin reliability table (confidence vs
  empirical accuracy per bin) for a bounded propensity proxy; the
  per-bin |conf − acc| gaps are the terms of expected calibration
  error. Emitting the table (not just the scalar) is deliberate: the
  table is what you plot, and it keeps every value exactly derivable
  from integer sums.

Reference parity: no analogue [REF-UNVERIFIED — /root/reference is
empty]; SURVEY §2.J-M curation-evaluation extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

_AUC_ORACLE = """
WITH sc AS (
    SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
    FROM events
), dom AS (
    SELECT cents, SUM(pos) AS np, SUM(1 - pos) AS nn
    FROM sc GROUP BY cents
), cum AS (
    SELECT np, nn,
           COALESCE(SUM(nn) OVER (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cumneg
    FROM dom
)
SELECT CAST(SUM(np) AS BIGINT) AS n_pos,
       CAST(SUM(nn) AS BIGINT) AS n_neg,
       CAST(SUM(np * (2 * cumneg + nn)) AS BIGINT) AS u2,
       ROUND(CAST(SUM(np * (2 * cumneg + nn)) AS DOUBLE)
             / CAST(2 * SUM(np) * SUM(nn) AS DOUBLE), 6) AS auc
FROM cum
"""


@register("x_auc_roc", oracle=_AUC_ORACLE)
def x_auc_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected Mann-Whitney AUC of ``value`` ranking purchases
    above non-purchases. 2U = Σ_s n⁺(s)·(2·Σ_{s'<s} n⁻(s') + n⁻(s))
    over the aggregated score domain — each tied pair contributes 1 to
    2U, each correctly-ordered pair 2 — so ``u2`` is an exact BIGINT
    and AUC = u2 / (2·n⁺·n⁻) is one IEEE division, bit-identical
    across engines.

    Scale shape: one map-side-combined groupBy collapses the n input
    rows to the score DOMAIN (≤ max_cents distinct values — bounded by
    the value range, NOT by row count), and only that bounded frame
    passes through the single-partition cumulative window. At 100 TB
    the window input is still ≤ ~50k rows; the heavy stage is the
    initial scan + partial agg, which codegens and combines map-side.
    """
    ev = load(spark, sf_dir, "events")
    dom = (
        ev.select(
            F.round(F.col("value") * 100).cast("long").alias("cents"),
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("pos"),
        )
        .groupBy("cents")
        .agg(
            F.sum("pos").alias("np"),
            F.sum(1 - F.col("pos")).alias("nn"),
        )
    )
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, -1)
    cum = dom.withColumn(
        "cumneg", F.coalesce(F.sum("nn").over(w), F.lit(0))
    )
    u2 = F.sum(F.col("np") * (2 * F.col("cumneg") + F.col("nn")))
    return cum.agg(
        F.sum("np").cast("long").alias("n_pos"),
        F.sum("nn").cast("long").alias("n_neg"),
        u2.cast("long").alias("u2"),
        F.round(
            u2.cast("double")
            / (2 * F.sum("np") * F.sum("nn")).cast("double"),
            6,
        ).alias("auc"),
    )


_ECE_BINS = 10
_ECE_SCALE = 10_000  # propensity proxy in basis points: p = cents/10000

_ECE_ORACLE = f"""
WITH sc AS (
    SELECT LEAST(CAST(ROUND(value * 100) AS BIGINT), {_ECE_SCALE})
               AS pcents,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
    FROM events
)
SELECT LEAST(CAST(FLOOR(pcents / {_ECE_SCALE // _ECE_BINS}.0) AS BIGINT),
             {_ECE_BINS - 1}) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(pos) AS BIGINT) AS n_pos,
       CAST(SUM(pcents) AS BIGINT) AS sum_pcents,
       ROUND(CAST(SUM(pcents) AS DOUBLE)
             / (CAST(COUNT(*) AS DOUBLE) * {_ECE_SCALE}), 6) AS conf,
       ROUND(CAST(SUM(pos) AS DOUBLE) / COUNT(*), 6) AS acc,
       ROUND(ABS(CAST(SUM(pcents) AS DOUBLE)
                 / (CAST(COUNT(*) AS DOUBLE) * {_ECE_SCALE})
                 - CAST(SUM(pos) AS DOUBLE) / COUNT(*)), 6) AS gap
FROM sc
GROUP BY 1
ORDER BY bin
"""


@register("x_calibration_ece", oracle=_ECE_ORACLE)
def x_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability table for the bounded propensity proxy
    p = min(value, 100)/100 against the purchase outcome: 10
    equal-width bins, each row carrying exact integer evidence
    (n, n_pos, sum of basis-point confidences) plus the derived
    conf / acc / |gap| terms of ECE. Per-bin divisions are single
    IEEE operations on integer-exact operands, so both engines agree
    bit-for-bit; the scalar ECE is a 10-term weighted sum of ``gap``
    the caller folds (kept out of the output to avoid cross-bin
    float-summation order).

    Scale shape: one groupBy over {_ECE_BINS} bins — fully
    map-side-combinable, no window, no join; the reduce side moves
    {_ECE_BINS} rows regardless of input size.
    """
    step = _ECE_SCALE // _ECE_BINS
    ev = load(spark, sf_dir, "events")
    sc = ev.select(
        F.least(
            F.round(F.col("value") * 100).cast("long"), F.lit(_ECE_SCALE)
        ).alias("pcents"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "pos"
        ),
    )
    n = F.count(F.lit(1))
    conf = F.sum("pcents").cast("double") / (n.cast("double") * _ECE_SCALE)
    acc = F.sum("pos").cast("double") / n
    return (
        sc.groupBy(
            F.least(
                F.floor(F.col("pcents") / float(step)), F.lit(_ECE_BINS - 1)
            ).alias("bin")
        )
        .agg(
            n.cast("long").alias("n"),
            F.sum("pos").cast("long").alias("n_pos"),
            F.sum("pcents").cast("long").alias("sum_pcents"),
            F.round(conf, 6).alias("conf"),
            F.round(acc, 6).alias("acc"),
            F.round(F.abs(conf - acc), 6).alias("gap"),
        )
        .orderBy("bin")
    )
