"""Round-6 batch 29: ML feature/eval primitives — target encoding,
k-fold leave-fold-out statistics.

- ``x_target_encode`` — leave-one-out smoothed target encoding of
  ``event_type`` against ``value``: every event receives the mean
  target of its OWN category computed WITHOUT itself, shrunk toward
  the global mean with ``m = {_TE_M}`` pseudo-observations. The
  standard leakage-free categorical feature for downstream models:
  naive per-category means leak the row's own label; the LOO identity
  ``(Σ_c − y_i) / (n_c − 1)`` removes it with zero extra passes.
- ``x_kfold_stats`` — deterministic {_KF_K}-fold split of events by
  md5(user_id) with per-fold in-fold AND leave-fold-out statistics
  (count / mean / conversion rate). The out-of-fold side costs
  nothing: it is derived from the grand totals by the
  total-minus-fold identity, never a second scan.

Reference parity: no analogue [REF-UNVERIFIED — /root/reference is
empty]; SURVEY §2.J-M pipeline/curation extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

_TE_M = 20  # pseudo-observations shrinking a category toward the prior
_KF_K = 5  # folds

_TE_ORACLE = f"""
WITH q AS (
    SELECT event_id, event_type,
           CAST(value AS DECIMAL(18,4)) AS y
    FROM events
), g AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS gcnt,
           CAST(SUM(y) AS DECIMAL(28,4)) AS gsum
    FROM q
), c AS (
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS ccnt,
           CAST(SUM(y) AS DECIMAL(28,4)) AS csum
    FROM q GROUP BY event_type
)
SELECT q.event_id,
       q.event_type,
       CAST(q.y AS DOUBLE) AS value_q,
       CASE WHEN c.ccnt > 1
            THEN ROUND(CAST(c.csum - q.y AS DOUBLE) / (c.ccnt - 1), 6)
            END AS loo_mean,
       ROUND((CAST(c.csum - q.y AS DOUBLE)
              + {_TE_M} * (CAST(g.gsum AS DOUBLE) / g.gcnt))
             / (c.ccnt - 1 + {_TE_M}), 6) AS encoded
FROM q JOIN c USING (event_type) CROSS JOIN g
"""


@register("x_target_encode", oracle=_TE_ORACLE)
def x_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out smoothed target encoding — the leakage-free
    categorical feature: each event's encoding is the mean ``value``
    of its category computed WITHOUT the event itself, shrunk toward
    the global mean with ``m = {_TE_M}`` pseudo-observations
    (``enc_i = (Σ_c − y_i + m·ȳ) / (n_c − 1 + m)``). Targets are
    DECIMAL(18,4)-quantized so Σ_c and the global sum are exact and
    associative; each row then evaluates one fixed-shape double
    expression — no accumulation-order dependence anywhere.

    Scale shape: one map-side-combinable aggregate per grain (a
    category-domain-sized table and a 1-row grand total), both
    broadcast back onto the fact scan — the events table itself is
    NEVER shuffled; the encode pass is scan-bound at 100 TB. The
    row_number-free LOO identity is what makes this one pass: the
    naive "mean over all other rows" is a per-row window with an
    exclusion frame.
    """
    q = load(spark, sf_dir, "events").select(
        "event_id", "event_type", F.col("value").cast("decimal(18,4)").alias("y")
    )
    g = q.agg(
        F.count(F.lit(1)).cast("long").alias("gcnt"),
        F.sum("y").cast("decimal(28,4)").alias("gsum"),
    )
    c = q.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("ccnt"),
        F.sum("y").cast("decimal(28,4)").alias("csum"),
    )
    loo_num = (F.col("csum") - F.col("y")).cast("double")
    prior = F.col("gsum").cast("double") / F.col("gcnt")
    return (
        q.join(F.broadcast(c), "event_type")
        .crossJoin(F.broadcast(g))
        .select(
            "event_id",
            "event_type",
            F.col("y").cast("double").alias("value_q"),
            F.when(
                F.col("ccnt") > 1,
                F.round(loo_num / (F.col("ccnt") - 1), 6),
            ).alias("loo_mean"),
            F.round(
                (loo_num + _TE_M * prior) / (F.col("ccnt") - 1 + _TE_M), 6
            ).alias("encoded"),
        )
    )


_KF_ORACLE = f"""
WITH q AS (
    SELECT CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 2)
               AS BIGINT) % {_KF_K} AS fold,
           user_id,
           CAST(value AS DECIMAL(18,4)) AS y,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
    FROM events
), f AS (
    SELECT fold,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(COUNT(*) AS BIGINT) AS n_in,
           CAST(SUM(y) AS DECIMAL(28,4)) AS sum_in,
           CAST(SUM(conv) AS BIGINT) AS conv_in
    FROM q GROUP BY fold
), g AS (
    SELECT CAST(SUM(n_in) AS BIGINT) AS gn,
           CAST(SUM(sum_in) AS DECIMAL(32,4)) AS gsum,
           CAST(SUM(conv_in) AS BIGINT) AS gconv
    FROM f
)
SELECT f.fold,
       f.n_users,
       f.n_in,
       ROUND(CAST(f.sum_in AS DOUBLE) / f.n_in, 6) AS mean_in,
       ROUND(CAST(f.conv_in AS DOUBLE) / f.n_in, 6) AS conv_rate_in,
       CAST(g.gn - f.n_in AS BIGINT) AS n_out,
       ROUND(CAST(g.gsum - f.sum_in AS DOUBLE) / (g.gn - f.n_in), 6)
           AS mean_out,
       ROUND(CAST(g.gconv - f.conv_in AS DOUBLE) / (g.gn - f.n_in), 6)
           AS conv_rate_out
FROM f CROSS JOIN g
ORDER BY f.fold
"""


@register("x_kfold_stats", oracle=_KF_ORACLE)
def x_kfold_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{_KF_K}-fold cross-validation accounting: assign every event to
    a fold by md5(user_id) (entity-coherent — a user's events never
    straddle folds, the split that prevents user-level leakage), then
    report per fold the in-fold count/mean/conversion AND the
    leave-fold-out statistics a model trained on the other
    {_KF_K}−1 folds would see. The out-of-fold side is derived from
    grand totals via the total-minus-fold identity — computing it
    directly would cost k scans (or a k-way self-join); here it is
    column arithmetic on a {_KF_K}-row frame.

    Scale shape: one map-side-combinable groupBy(fold) over the scan
    (values DECIMAL-quantized so in-fold and derived out-of-fold sums
    are exact), one {_KF_K}-row total, one broadcast. Scan-bound at
    100 TB; fold count never touches the shuffle width.
    """
    e = load(spark, sf_dir, "events")
    fold = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string").cast("binary")), 1, 2),
            16,
            10,
        ).cast("long")
        % _KF_K
    )
    q = e.select(
        fold.alias("fold"),
        "user_id",
        F.col("value").cast("decimal(18,4)").alias("y"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("conv"),
    )
    f = q.groupBy("fold").agg(
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.count(F.lit(1)).cast("long").alias("n_in"),
        F.sum("y").cast("decimal(28,4)").alias("sum_in"),
        F.sum("conv").cast("long").alias("conv_in"),
    )
    g = f.agg(
        F.sum("n_in").cast("long").alias("gn"),
        F.sum("sum_in").cast("decimal(32,4)").alias("gsum"),
        F.sum("conv_in").cast("long").alias("gconv"),
    )
    return (
        f.crossJoin(F.broadcast(g))
        .select(
            "fold",
            "n_users",
            "n_in",
            F.round(F.col("sum_in").cast("double") / F.col("n_in"), 6).alias(
                "mean_in"
            ),
            F.round(F.col("conv_in").cast("double") / F.col("n_in"), 6).alias(
                "conv_rate_in"
            ),
            (F.col("gn") - F.col("n_in")).cast("long").alias("n_out"),
            F.round(
                (F.col("gsum") - F.col("sum_in")).cast("double")
                / (F.col("gn") - F.col("n_in")),
                6,
            ).alias("mean_out"),
            F.round(
                (F.col("gconv") - F.col("conv_in")).cast("double")
                / (F.col("gn") - F.col("n_in")),
                6,
            ).alias("conv_rate_out"),
        )
        .orderBy("fold")
    )
