"""Round-4 operators, second batch: full-outer reconciliation, boolean
aggregates, window-function long tail, OLS regression, and two
LLM-corpus text signals (repetition scoring, feature hashing).

Each fills a hole in an existing SURVEY.md §2 family:

- ``q_join_full`` — §2.C gains the FULL OUTER member (extract
  reconciliation: rows on either side with no partner survive).
- ``q_agg_boolean`` — §2.D gains bool_and/bool_or/count_if (data-quality
  assertions as aggregates).
- ``q_window_misc`` — §2.E gains cume_dist / nth_value / lead-default.
- ``q_regression`` — §2.D gains per-group OLS slope/intercept/R², via
  the same exact-integer-moment construction as ``q_correlation``
  (doubles are never accumulated — see registry docstring).
- ``x_repetition_score`` — Gopher-style repetition/diversity signals
  per document (duplicate-token fraction, top-token fraction, Simpson
  diversity), all exact integer rationals so the hash oracle is exact.
- ``x_feature_hash`` — the hashing trick: tokens md5-bucketed into a
  fixed feature space, counted per language (bag-of-words features for
  downstream ML without a vocabulary broadcast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register


# ---------------------------------------------------------------------------
# §2.C family: FULL OUTER join — extract reconciliation
# ---------------------------------------------------------------------------

_FULL_ORACLE = """
WITH v AS (
    SELECT user_id, CAST(ts AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_views
    FROM events WHERE event_type = 'view' GROUP BY user_id, day
), p AS (
    SELECT user_id, CAST(ts AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_purchases
    FROM events WHERE event_type = 'purchase' GROUP BY user_id, day
)
SELECT user_id, day,
       COALESCE(n_views, 0) AS n_views,
       COALESCE(n_purchases, 0) AS n_purchases,
       CASE WHEN n_views IS NULL THEN 'purchase_only'
            WHEN n_purchases IS NULL THEN 'view_only'
            ELSE 'both' END AS presence
FROM v FULL OUTER JOIN p USING (user_id, day)
"""


@register("q_join_full", oracle=_FULL_ORACLE)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join: reconcile the (user, day) view ledger against
    the (user, day) purchase ledger, keeping rows present on either
    side (the reference's re-extract diffing generalized to both
    directions — a day with views but no purchases survives, and so
    does the reverse).

    Both inputs are pre-aggregated to one row per key BEFORE the join,
    so the shuffled payload is two count tables (not raw events) and
    the full-outer sort-merge join matches at most one row per side —
    the shape that survives a fact-scale reconciliation.
    """
    e = load(spark, sf_dir, "events")
    day = F.to_date("ts").alias("day")
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id", day)
        .agg(F.count(F.lit(1)).alias("n_views"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id", day)
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )
    presence = (
        F.when(F.col("n_views").isNull(), F.lit("purchase_only"))
        .when(F.col("n_purchases").isNull(), F.lit("view_only"))
        .otherwise(F.lit("both"))
    )
    return (
        v.join(p, on=["user_id", "day"], how="full")
        .select(
            "user_id",
            "day",
            F.coalesce("n_views", F.lit(0)).alias("n_views"),
            F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
            presence.alias("presence"),
        )
    )


# ---------------------------------------------------------------------------
# §2.D family: boolean aggregates — data-quality assertions as aggregates
# ---------------------------------------------------------------------------

_BOOL_ORACLE = """
SELECT event_type,
       bool_and(value >= 0)  AS all_nonneg,
       bool_or(value > 450)  AS any_gt450,
       CAST(SUM(CASE WHEN value > 200 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_gt200,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM events
GROUP BY event_type
"""


@register("q_agg_boolean", oracle=_BOOL_ORACLE)
def q_agg_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates: per-type validation verdicts computed IN the
    aggregation (bool_and / bool_or / count_if) — the scalable form of a
    data-quality rule engine (one hash aggregate, no second pass, exact
    short-circuit semantics at any scale).
    """
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.bool_and(F.col("value") >= 0).alias("all_nonneg"),
        F.bool_or(F.col("value") > 450).alias("any_gt450"),
        F.count_if(F.col("value") > 200).alias("n_gt200"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# §2.E family: window long tail — cume_dist, nth_value, lead(default)
# ---------------------------------------------------------------------------

_WMISC_ORACLE = """
SELECT event_id, user_id,
       cume_dist() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS cdist,
       nth_value(event_type, 2) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           AS second_type,
       lead(event_type, 1, 'END') OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS next_type
FROM events
WHERE user_id % 97 = 0
"""


@register("q_window_misc", oracle=_WMISC_ORACLE)
def q_window_misc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function long tail: cume_dist (position as a fraction of
    the partition), nth_value over the full frame (the user's second
    event ever), and lead with an explicit default (next event or a
    terminal sentinel).

    The ORDER BY carries the unique ``event_id`` tiebreaker, so every
    row is its own peer group and ``cume_dist`` is the exact rational
    row_number/n — bit-identical across engines. All three functions
    share ONE window partition ⇒ one shuffle total.
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        e.where(F.col("user_id") % 97 == 0)
        .select(
            "event_id",
            "user_id",
            F.cume_dist().over(w).alias("cdist"),
            F.nth_value("event_type", 2).over(w_full).alias("second_type"),
            F.lead("event_type", 1, "END").over(w).alias("next_type"),
        )
    )


# ---------------------------------------------------------------------------
# §2.D family: per-group OLS regression from exact integer moments
# ---------------------------------------------------------------------------

_REGR_ORACLE = """
WITH m AS (
    SELECT l_returnflag,
           CAST(COUNT(*) AS DOUBLE) AS n,
           CAST(SUM(CAST(CAST(ROUND(l_quantity) AS BIGINT)
                         AS DECIMAL(38,0))) AS DOUBLE) AS sx,
           CAST(SUM(CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                         AS DECIMAL(38,0))) AS DOUBLE) AS sy,
           CAST(SUM(CAST(CAST(ROUND(l_quantity) AS BIGINT)
                         * CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                         AS DECIMAL(38,0))) AS DOUBLE) AS sxy,
           CAST(SUM(CAST(CAST(ROUND(l_quantity) AS BIGINT)
                         * CAST(ROUND(l_quantity) AS BIGINT)
                         AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
           CAST(SUM(CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                         * CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                         AS DECIMAL(38,0))) AS DOUBLE) AS syy
    FROM lineitem
    GROUP BY l_returnflag
)
SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx) / 100, 6)
           AS slope,
       ROUND((sy / 100 - ((n * sxy - sx * sy) / (n * sxx - sx * sx) / 100)
              * sx) / n, 4) AS intercept,
       ROUND(((n * sxy - sx * sy) * (n * sxy - sx * sy))
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
FROM m
"""


@register("q_regression", oracle=_REGR_ORACLE)
def q_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS regression (extended price on quantity): slope,
    intercept, R² — the regr_slope/regr_intercept/regr_r2 family.

    Built like ``q_correlation``: the five moments are exact
    DECIMAL(38,0) sums of integers (quantity is integral, price is
    2-decimal ⇒ ×100), associative and map-side combinable, then one
    fixed-shape IEEE expression per statistic. Note the price rescale:
    slope is in cents per unit ⇒ /100 back to currency; R² is
    scale-invariant so no rescale. Never accumulates a double.
    """
    li = load(spark, sf_dir, "lineitem")
    x = F.round(F.col("l_quantity")).cast("long")
    y = F.round(F.col("l_extendedprice") * 100).cast("long")
    d38 = "decimal(38,0)"
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x.cast(d38)).cast("double").alias("sx"),
        F.sum(y.cast(d38)).cast("double").alias("sy"),
        F.sum((x * y).cast(d38)).cast("double").alias("sxy"),
        F.sum((x * x).cast(d38)).cast("double").alias("sxx"),
        F.sum((y * y).cast(d38)).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    slope_cents = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return m.select(
        "l_returnflag",
        n.cast("bigint").alias("n_rows"),
        F.round(slope_cents / 100, 6).alias("slope"),
        F.round((sy / 100 - (slope_cents / 100) * sx) / n, 4).alias("intercept"),
        F.round(
            ((n * sxy - sx * sy) * (n * sxy - sx * sy))
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("r2"),
    )


# ---------------------------------------------------------------------------
# LLM-corpus signal: repetition / diversity scoring (Gopher-rule family)
# ---------------------------------------------------------------------------

_REP_ORACLE = """
WITH tok AS (
    SELECT doc_id, unnest(str_split(text, ' ')) AS tok
    FROM documents
), cnt AS (
    SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
    FROM tok GROUP BY doc_id, tok
)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       CAST(MAX(c) AS BIGINT) AS top_count,
       CAST(SUM(c) - COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
           AS dup_frac,
       CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top_frac,
       1.0 - CAST(SUM(c * c) AS DOUBLE)
           / (CAST(SUM(c) AS DOUBLE) * CAST(SUM(c) AS DOUBLE))
           AS simpson_diversity
FROM cnt
GROUP BY doc_id
"""


@register("x_repetition_score", oracle=_REP_ORACLE)
def x_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition/diversity quality signals per document — the
    Gopher-rule family of filters used to drop degenerate LM training
    text: duplicate-token fraction, most-frequent-token fraction, and
    Gini–Simpson diversity (1 − Σ(cᵢ/n)², the probability two random
    tokens differ).

    Every statistic is an exact integer rational (counts only — no
    logs, no float accumulation), so the cross-engine hash is exact:
    each final double is ONE IEEE division of identical integers.
    Execution is explode → (doc, token) hash agg → doc hash agg; both
    aggregates are map-side combinable and the token space never
    leaves the executors.
    """
    d = load(spark, sf_dir, "documents")
    cnt = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n = F.sum("c")
    dcount = F.count(F.lit(1))
    scc = F.sum(F.col("c") * F.col("c"))
    return cnt.groupBy("doc_id").agg(
        n.alias("n_tokens"),
        dcount.alias("n_distinct"),
        F.max("c").alias("top_count"),
        ((n - dcount).cast("double") / n.cast("double")).alias("dup_frac"),
        (F.max("c").cast("double") / n.cast("double")).alias("top_frac"),
        (
            F.lit(1.0)
            - scc.cast("double") / (n.cast("double") * n.cast("double"))
        ).alias("simpson_diversity"),
    )


# ---------------------------------------------------------------------------
# LLM-corpus signal: the hashing trick (fixed-width features, no vocab)
# ---------------------------------------------------------------------------

_FHASH_BUCKETS = 64

_FHASH_ORACLE = f"""
WITH tok AS (
    SELECT lang, unnest(str_split(text, ' ')) AS tok
    FROM documents
)
SELECT lang,
       CAST(CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT)
            % {_FHASH_BUCKETS} AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_terms
FROM tok
GROUP BY lang, bucket
"""


@register("x_feature_hash", oracle=_FHASH_ORACLE)
def x_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick: project an unbounded token vocabulary into a
    fixed 64-bucket feature space (bucket = md5(token) mod 64) and
    count token occurrences and distinct terms per (language, bucket)
    — bag-of-words featurization with NO vocabulary table, broadcast,
    or second pass, which is what makes it usable on a 100 TB corpus.

    md5 is the cross-engine-stable hash (registry docstring: DuckDB's
    ``hash()`` ≠ Spark's ``xxhash64``); the first 8 hex chars give a
    32-bit value, exact in both engines' int64. One explode + one hash
    aggregate; output is at most |langs| × 64 rows.
    """
    d = load(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
        % _FHASH_BUCKETS
    )
    return (
        d.select("lang", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("lang", bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.count_distinct(F.col("tok")).alias("n_terms"),
        )
    )
