"""Round-6 batch 28: corpus scaling laws — Zipf slope, Heaps growth.

- ``x_zipf_fit`` — OLS fit of ln(frequency) on ln(rank) over the top
  {_ZIPF_TOP} corpus terms: the Zipf exponent (slope ≈ −1 for natural
  language), intercept, and r². A corpus whose slope drifts far from
  −1 is templated/synthetic — the scaling-law screen next to
  x_token_entropy and x_repetition_score. Both logs are
  DECIMAL(18,8)-quantized; all five OLS moments accumulate exactly in
  DECIMAL and the three regression numerators are formed in exact
  decimal BEFORE the single cast each — no float cancellation.
- ``x_heaps_law`` — Heaps'-law vocabulary growth: walk the corpus in
  doc_id order, and at each decile of documents report cumulative
  documents, tokens, distinct vocabulary, and type-token ratio. Each
  token type is attributed to its FIRST document (min doc_id), the
  decile of that first occurrence is integer arithmetic on the doc
  rank, and all four curves are 10-row cumulative sums — the entire
  law costs two aggregates plus a 10-row window.

Reference parity: no analogue [REF-UNVERIFIED — /root/reference is
empty]; SURVEY §2.J-M text-analysis / LM-statistics extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

_ZIPF_TOP = 200  # fit over the head of the rank-frequency curve

_ZIPF_ORACLE = f"""
WITH toks AS (
    SELECT unnest(string_split(text, ' ')) AS tok FROM documents
), tf AS (
    SELECT tok, CAST(COUNT(*) AS BIGINT) AS f
    FROM toks WHERE tok <> '' GROUP BY tok
), ranked AS (
    SELECT tok, f,
           CAST(ROW_NUMBER() OVER (ORDER BY f DESC, tok) AS BIGINT) AS r
    FROM tf
), pts AS (
    SELECT CAST(LN(CAST(r AS DOUBLE)) AS DECIMAL(18,8)) AS x,
           CAST(LN(CAST(f AS DOUBLE)) AS DECIMAL(18,8)) AS y
    FROM ranked WHERE r <= {_ZIPF_TOP}
), m AS (
    SELECT CAST(COUNT(*) AS DECIMAL(18,0)) AS n,
           CAST(SUM(x) AS DECIMAL(28,8)) AS sx,
           CAST(SUM(y) AS DECIMAL(28,8)) AS sy,
           CAST(SUM(x * x) AS DECIMAL(38,16)) AS sxx,
           CAST(SUM(y * y) AS DECIMAL(38,16)) AS syy,
           CAST(SUM(x * y) AS DECIMAL(38,16)) AS sxy
    FROM pts
)
SELECT CAST(n AS BIGINT) AS n_terms,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope,
       ROUND((CAST(sy AS DOUBLE)
              - CAST(n * sxy - sx * sy AS DOUBLE)
                / CAST(n * sxx - sx * sx AS DOUBLE)
                * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6)
           AS intercept,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             * CAST(n * sxy - sx * sy AS DOUBLE)
             / (CAST(n * sxx - sx * sx AS DOUBLE)
                * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r2
FROM m
"""


@register("x_zipf_fit", oracle=_ZIPF_ORACLE)
def x_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit: rank terms by frequency (deterministic
    (freq desc, term) order), regress ln f on ln r over the top
    {_ZIPF_TOP} ranks. Natural-language corpora land near slope −1
    with r² ≈ 0.9+; far-off slopes flag templated or synthetic text.
    ln terms are quantized to DECIMAL(18,8); the OLS numerators
    n·Σxy − Σx·Σy etc. are computed in exact decimal and cast to
    double once each, so slope/intercept/r² carry no accumulation
    order dependence.

    Scale shape: term frequency is one map-side-combinable count; the
    ranking window runs on the VOCABULARY table (domain-sized, and
    only the ≤ {_ZIPF_TOP}-row head survives); the moment pass is a
    {_ZIPF_TOP}-row aggregate. Scan-bound at 100 TB.
    """
    d = load(spark, sf_dir, "documents")
    tf = (
        d.select(
            F.explode(
                F.filter(F.split("text", " "), lambda t: t != "")
            ).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
    )
    ranked = tf.withColumn(
        "r",
        F.row_number()
        .over(Window.orderBy(F.col("f").desc(), "tok"))
        .cast("long"),
    ).where(F.col("r") <= _ZIPF_TOP)
    pts = ranked.select(
        F.log(F.col("r").cast("double")).cast("decimal(18,8)").alias("x"),
        F.log(F.col("f").cast("double")).cast("decimal(18,8)").alias("y"),
    )
    m = pts.agg(
        F.count(F.lit(1)).cast("decimal(18,0)").alias("n"),
        F.sum("x").cast("decimal(28,8)").alias("sx"),
        F.sum("y").cast("decimal(28,8)").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,16)").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("decimal(38,16)").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("decimal(38,16)").alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    deny = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    return m.select(
        F.col("n").cast("long").alias("n_terms"),
        F.round(num / den, 6).alias("slope"),
        F.round(
            (
                F.col("sy").cast("double")
                - num / den * F.col("sx").cast("double")
            )
            / F.col("n").cast("double"),
            6,
        ).alias("intercept"),
        F.round(num * num / (den * deny), 6).alias("r2"),
    )


_HEAPS_ORACLE = """
WITH docs AS (
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (ORDER BY doc_id) AS BIGINT) AS rnk,
           CAST(COUNT(*) OVER () AS BIGINT) AS nd,
           CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
                AS BIGINT) AS n_toks
    FROM documents
), dd AS (
    SELECT doc_id, rnk, n_toks,
           LEAST((rnk - 1) * 10 // nd + 1, 10) AS decile
    FROM docs
), firsts AS (
    SELECT tok, MIN(doc_id) AS first_doc
    FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents
    ) WHERE tok <> ''
    GROUP BY tok
), new_vocab AS (
    SELECT d.decile, CAST(COUNT(*) AS BIGINT) AS v
    FROM firsts f JOIN dd d ON d.doc_id = f.first_doc
    GROUP BY d.decile
), per_decile AS (
    SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS n_toks
    FROM dd GROUP BY decile
)
SELECT p.decile,
       CAST(SUM(p.n_docs) OVER w AS BIGINT) AS n_docs,
       CAST(SUM(p.n_toks) OVER w AS BIGINT) AS n_tokens,
       CAST(SUM(COALESCE(nv.v, 0)) OVER w AS BIGINT) AS vocab,
       ROUND(CAST(SUM(COALESCE(nv.v, 0)) OVER w AS DOUBLE)
             / CAST(SUM(p.n_toks) OVER w AS DOUBLE), 6) AS ttr
FROM per_decile p LEFT JOIN new_vocab nv ON nv.decile = p.decile
WINDOW w AS (ORDER BY p.decile)
ORDER BY p.decile
"""


@register("x_heaps_law", oracle=_HEAPS_ORACLE)
def x_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth curve: reading the corpus in
    doc_id order, report at each documents-decile the cumulative doc,
    token, and distinct-vocabulary counts plus the type-token ratio.
    Every token type belongs to its FIRST document (min doc_id);
    decile membership is integer arithmetic on the doc rank, so the
    whole curve reduces to per-decile counts + a 10-row cumulative
    window — no checkpoint thresholds, no re-scans.

    Scale shape: one explode + min-aggregate builds the first-
    occurrence table (vocabulary-sized); the doc-rank window shuffles
    only (doc_id, token-count) pairs, never text. At 100 TB replace
    the global rank with cluster_write's range-partitioned layout
    (sources/layout.py) and per-partition offsets — the decile math
    is unchanged. Everything downstream is a 10-row frame.
    """
    d = load(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda t: t != "")
    docs = d.select(
        "doc_id", F.size(toks).cast("long").alias("n_toks")
    ).withColumn(
        "rnk", F.row_number().over(Window.orderBy("doc_id")).cast("long")
    ).withColumn(
        "nd",
        F.count(F.lit(1))
        .over(Window.partitionBy(F.lit(1)))
        .cast("long"),
    )
    dd = docs.select(
        "doc_id",
        "n_toks",
        F.least(
            F.expr("(rnk - 1) * 10 div nd") + 1, F.lit(10)
        )
        .cast("long")
        .alias("decile"),
    )
    firsts = (
        d.select("doc_id", F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    new_vocab = (
        firsts.join(dd, firsts.first_doc == dd.doc_id)
        .groupBy("decile")
        .agg(F.count(F.lit(1)).cast("long").alias("v"))
    )
    per_decile = dd.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_toks").cast("long").alias("n_toks"),
    )
    w = Window.orderBy("decile")
    joined = per_decile.join(new_vocab, "decile", "left").select(
        "decile",
        "n_docs",
        "n_toks",
        F.coalesce(F.col("v"), F.lit(0)).cast("long").alias("v"),
    )
    return joined.select(
        "decile",
        F.sum("n_docs").over(w).cast("long").alias("n_docs"),
        F.sum("n_toks").over(w).cast("long").alias("n_tokens"),
        F.sum("v").over(w).cast("long").alias("vocab"),
        F.round(
            F.sum("v").over(w).cast("double")
            / F.sum("n_toks").over(w).cast("double"),
            6,
        ).alias("ttr"),
    ).orderBy("decile")
