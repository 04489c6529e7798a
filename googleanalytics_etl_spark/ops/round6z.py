"""Round-6 batch 26: forecast scoring and distribution alignment.

- ``x_forecast_eval`` — backtest of the seasonal-naive forecast
  (predict today = same weekday last week) on the daily event count
  series: MAE, RMSE, sMAPE and mean bias over every day with a lag-7
  reference. The standard first-baseline every capacity forecast is
  judged against; errors are integer count differences, each summary
  is one IEEE step (or a quantized rational sum for sMAPE).
- ``x_quantile_normalize`` — per-document quantile normalization of
  length onto the pooled corpus distribution: a document at
  within-source CDF quantile q is assigned the smallest global length
  whose pooled CDF reaches q. The batch-effect remover (microarray
  heritage) for mixing heterogeneous sources; the mapping condition
  cum_all·n_src ≥ cum_src·n_all is pure integer arithmetic — no
  float CDFs anywhere.

Reference parity: no analogue [REF-UNVERIFIED — /root/reference is
empty]; SURVEY §2.J-M pipeline/analytics extensions (x_psi_drift,
x_source_kl, x_ks_test family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

_FC_ORACLE = """
WITH daily AS (
    SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS d,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY 1
), paired AS (
    SELECT d, n,
           LAG(n, 7) OVER (ORDER BY d) AS f
    FROM daily
), scored AS (
    SELECT d, n, f, (n - f) AS err
    FROM paired WHERE f IS NOT NULL
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
       ROUND(CAST(SUM(ABS(err)) AS DOUBLE) / COUNT(*), 6) AS mae,
       ROUND(SQRT(CAST(SUM(err * err) AS DOUBLE) / COUNT(*)), 6) AS rmse,
       ROUND(CAST(SUM(CAST(2.0 * ABS(err) / (n + f) AS DECIMAL(18,8)))
                  AS DOUBLE) / COUNT(*), 6) AS smape,
       ROUND(CAST(SUM(err) AS DOUBLE) / COUNT(*), 6) AS bias
FROM scored
"""


@register("x_forecast_eval", oracle=_FC_ORACLE)
def x_forecast_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive (lag-7) backtest on the daily event-count
    series: forecast(day) = count(day − 7 days); report MAE, RMSE,
    sMAPE (2|e|/(actual+forecast), quantized per-term before the
    exact sum) and signed mean bias over all scoreable days. Gaps in
    the calendar are treated as missing (LAG over observed days) —
    the fixture series is dense, and a production run composes
    q_date_spine upstream for explicit zero-fill.

    Scale shape: one map-side-combinable day-count aggregate; the
    lag-7 window runs on the DAY-domain table (365 rows/year — a
    single in-memory partition regardless of event volume) and the
    four metrics are one more metadata-sized aggregate. Scan-bound at
    100 TB.
    """
    daily = (
        load(spark, sf_dir, "events")
        .select(
            F.expr(
                "unix_micros(cast(ts as timestamp)) div 86400000000"
            ).alias("d")
        )
        .groupBy("d")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    paired = daily.withColumn("f", F.lag("n", 7).over(Window.orderBy("d")))
    scored = paired.where(F.col("f").isNotNull()).select(
        "n", "f", (F.col("n") - F.col("f")).alias("err")
    )
    smape_term = (
        2.0 * F.abs(F.col("err")) / (F.col("n") + F.col("f"))
    ).cast("decimal(18,8)")
    return scored.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.round(
            F.sum(F.abs(F.col("err"))).cast("double") / F.count(F.lit(1)),
            6,
        ).alias("mae"),
        F.round(
            F.sqrt(
                F.sum(F.col("err") * F.col("err")).cast("double")
                / F.count(F.lit(1))
            ),
            6,
        ).alias("rmse"),
        F.round(
            F.sum(smape_term).cast("double") / F.count(F.lit(1)), 6
        ).alias("smape"),
        F.round(
            F.sum("err").cast("double") / F.count(F.lit(1)), 6
        ).alias("bias"),
    )


_QNORM_ORACLE = """
WITH d AS (
    SELECT doc_id, source, n_chars FROM documents
), sc AS (
    SELECT source, n_chars, CAST(COUNT(*) AS BIGINT) AS c
    FROM d GROUP BY source, n_chars
), scum AS (
    SELECT source, n_chars,
           CAST(SUM(c) OVER (PARTITION BY source ORDER BY n_chars)
                AS BIGINT) AS cum_src,
           CAST(SUM(c) OVER (PARTITION BY source) AS BIGINT) AS n_src
    FROM sc
), gc AS (
    SELECT n_chars AS gv, CAST(COUNT(*) AS BIGINT) AS c
    FROM d GROUP BY n_chars
), gcum AS (
    SELECT gv,
           CAST(SUM(c) OVER (ORDER BY gv) AS BIGINT) AS cum_all,
           CAST(SUM(c) OVER () AS BIGINT) AS n_all
    FROM gc
), mapped AS (
    SELECT s.source, s.n_chars, s.cum_src, s.n_src,
           MIN(g.gv) AS norm_chars
    FROM scum s JOIN gcum g
      ON g.cum_all * s.n_src >= s.cum_src * g.n_all
    GROUP BY s.source, s.n_chars, s.cum_src, s.n_src
)
SELECT d.doc_id, d.source, d.n_chars, m.norm_chars,
       ROUND(CAST(m.cum_src AS DOUBLE) / m.n_src, 6) AS q
FROM d JOIN mapped m
  ON m.source = d.source AND m.n_chars = d.n_chars
ORDER BY d.doc_id
"""


@register("x_quantile_normalize", oracle=_QNORM_ORACLE)
def x_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-normalize document lengths across sources: a document
    whose length sits at within-source CDF quantile q is mapped to
    the smallest pooled length value whose global CDF reaches q
    (percentile_disc semantics, so the output vocabulary is always
    observed values). The match predicate cum_all·n_src ≥
    cum_src·n_all compares exact integers — the assignment is
    bit-stable by construction. Removes per-source length batch
    effects before mixing (the rank analogue of x_psi_drift's
    detection: this one FIXES the drift).

    Scale shape: both CDFs live on VALUE DOMAINS (groupBy value →
    cumulative window; the per-source window partitions by source,
    the global one is a |domain|-row single partition by
    construction). The quantile match is a domain×domain range join
    (broadcast the global side — it is metadata), reduced by
    map-side-combinable MIN, and the final fan-out back to documents
    is one hash join on (source, value). Row data is never sorted
    globally; at 100 TB the only data-sized stages are the two counts
    and the final join.
    """
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    sc = d.groupBy("source", "n_chars").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    ws = Window.partitionBy("source").orderBy("n_chars")
    scum = sc.select(
        "source",
        "n_chars",
        F.sum("c").over(ws).cast("long").alias("cum_src"),
        F.sum("c")
        .over(Window.partitionBy("source"))
        .cast("long")
        .alias("n_src"),
    )
    gc = d.groupBy(F.col("n_chars").alias("gv")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    gcum = gc.select(
        "gv",
        F.sum("c").over(Window.orderBy("gv")).cast("long").alias("cum_all"),
        F.sum("c")
        .over(Window.partitionBy(F.lit(1)))
        .cast("long")
        .alias("n_all"),
    )
    mapped = (
        scum.join(
            F.broadcast(gcum),
            F.col("cum_all") * F.col("n_src")
            >= F.col("cum_src") * F.col("n_all"),
        )
        .groupBy("source", "n_chars", "cum_src", "n_src")
        .agg(F.min("gv").alias("norm_chars"))
    )
    return (
        d.join(F.broadcast(mapped), ["source", "n_chars"])
        .select(
            "doc_id",
            "source",
            "n_chars",
            "norm_chars",
            F.round(
                F.col("cum_src").cast("double") / F.col("n_src"), 6
            ).alias("q"),
        )
        .orderBy("doc_id")
    )
