"""Round-6 batch 43: SRE error budgets + corpus vocabulary overlap.

- ``x_error_budget`` — SLO error-budget accounting over the event
  log: per day, the error count against a {_SLO_PCT}% error-rate SLO,
  the cumulative budget consumed vs allowed, the burn ratio, and the
  over-SLO flag. The SRE report that turns "errors happened" into
  "we have N days of budget left". The daily flag is exact integer
  cross-multiplication (``100·errors > {_SLO_PCT}·events``) — no
  float threshold decides a day.
- ``x_vocab_overlap`` — pairwise vocabulary Jaccard between sources
  via the inverted term→source index: one term-source distinct, one
  self-join on the TERM key (each term contributes its own source-
  pair square, bounded by the source domain), and the
  inclusion-exclusion union. The corpus-diversity screen that says
  which "different" sources are actually the same crawl twice.

Reference parity: no analogue [REF-UNVERIFIED — /root/reference is
empty]; SURVEY §2.E analytics / §2.J-M text extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

_SLO_PCT = 21  # error-rate SLO, percent (fixture error share ≈ 20%)

_EB_ORACLE = f"""
WITH d AS (
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_errors
    FROM events GROUP BY date_trunc('day', ts)
)
SELECT day, n_events, n_errors,
       CASE WHEN 100 * n_errors > {_SLO_PCT} * n_events
            THEN 1 ELSE 0 END AS over_slo,
       CAST(SUM(n_errors) OVER w AS BIGINT) AS cum_errors,
       CAST(SUM(n_events) OVER w AS BIGINT) AS cum_events,
       ROUND(CAST(100 * SUM(n_errors) OVER w AS DOUBLE)
             / ({_SLO_PCT} * SUM(n_events) OVER w), 6) AS burn_ratio
FROM d
WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW)
"""


@register("x_error_budget", oracle=_EB_ORACLE)
def x_error_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-budget burn-down: per day, events, errors, the exact
    integer over-SLO flag (``100·errors > {_SLO_PCT}·events``), and
    the cumulative burn ratio — consumed budget over allowed budget
    to date; a ratio above 1.0 means the month's budget is already
    spent. The allowed budget never materializes as a float: the
    ratio's numerator and denominator are exact integer window sums,
    divided once.

    Scale shape: one map-side-combinable day aggregate over the scan,
    then cumulative windows over the CALENDAR-domain frame (30 rows
    at any SF; the global ordering is day-domain, not data-domain).
    Scan-bound at 100 TB.
    """
    e = load(spark, sf_dir, "events")
    d = e.groupBy(
        F.date_trunc("day", "ts").cast("timestamp_ntz").alias("day")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long")
        .alias("n_errors"),
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return d.select(
        "day",
        "n_events",
        "n_errors",
        F.when(
            100 * F.col("n_errors") > _SLO_PCT * F.col("n_events"), 1
        )
        .otherwise(0)
        .alias("over_slo"),
        F.sum("n_errors").over(w).cast("long").alias("cum_errors"),
        F.sum("n_events").over(w).cast("long").alias("cum_events"),
        F.round(
            (100 * F.sum("n_errors").over(w)).cast("double")
            / (_SLO_PCT * F.sum("n_events").over(w)),
            6,
        ).alias("burn_ratio"),
    )


_VO_ORACLE = """
WITH ts AS (
    SELECT DISTINCT source, unnest(string_split(text, ' ')) AS tok
    FROM documents
), t AS (
    SELECT source, tok FROM ts WHERE tok <> ''
), sizes AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS vocab FROM t GROUP BY source
), inter AS (
    SELECT a.source AS s1, b.source AS s2,
           CAST(COUNT(*) AS BIGINT) AS n_common
    FROM t a JOIN t b ON a.tok = b.tok AND a.source < b.source
    GROUP BY a.source, b.source
)
SELECT i.s1, i.s2, i.n_common,
       za.vocab AS vocab_1, zb.vocab AS vocab_2,
       ROUND(CAST(i.n_common AS DOUBLE)
             / (za.vocab + zb.vocab - i.n_common), 6) AS jaccard
FROM inter i
JOIN sizes za ON za.source = i.s1
JOIN sizes zb ON zb.source = i.s2
"""


@register("x_vocab_overlap", oracle=_VO_ORACLE)
def x_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-vocabulary Jaccard: distinct (source, term)
    pairs, a self-join on the TERM key counting shared terms per
    source pair, and inclusion-exclusion for the union. High Jaccard
    between supposedly different sources is the cheap tell for a
    duplicated crawl that x_cross_source_dups then confirms at the
    document level.

    Scale shape: the term-source distinct is the only pass over text;
    the self-join fans out per term by that term's SOURCE count —
    bounded by the source domain squared, never by corpus size (the
    same shape as x_source_overlap's doc-level join, one level up).
    Sizes broadcast back onto the pair-domain result. Scan-bound at
    100 TB; a df-cap on ubiquitous terms is unnecessary because the
    fan-out bound is the source domain, not document frequency.
    """
    d = load(spark, sf_dir, "documents")
    t = (
        d.select(
            "source",
            F.explode(
                F.filter(F.split("text", " "), lambda x: x != "")
            ).alias("tok"),
        )
        .distinct()
    )
    sizes = t.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("vocab")
    )
    b = t.select(F.col("source").alias("s2"), F.col("tok").alias("tok2"))
    inter = (
        t.join(b, (t.tok == b.tok2) & (t.source < b.s2))
        .groupBy(F.col("source").alias("s1"), "s2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    za = sizes.select(
        F.col("source").alias("s1"), F.col("vocab").alias("vocab_1")
    )
    zb = sizes.select(
        F.col("source").alias("s2"), F.col("vocab").alias("vocab_2")
    )
    return (
        inter.join(F.broadcast(za), "s1")
        .join(F.broadcast(zb), "s2")
        .select(
            "s1",
            "s2",
            "n_common",
            "vocab_1",
            "vocab_2",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("vocab_1") + F.col("vocab_2") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )
