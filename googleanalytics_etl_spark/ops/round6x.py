"""Round-6 batch 24: LM smoothing and forensic digit law — KN, Benford.

- ``x_kneser_ney`` — interpolated Kneser-Ney bigram probabilities
  (absolute discount D = 0.75) for the corpus's most frequent bigrams.
  The production n-gram-LM smoother (KenLM's default): the MLE head is
  discounted and the freed mass is routed to the CONTINUATION unigram
  P_cont(w₂) = N₁₊(·w₂)/N₁₊(··) — "how many contexts does w₂
  complete" — not the raw unigram. Every ingredient is an exact
  integer count; D = 0.75 is binary-exact, so P_KN is a short fixed
  IEEE expression. Completes the LM-statistics family
  (x_bigram_logprob → MLE, x_bigram_heldout → OOV, this → smoothing).
- ``x_benford`` — first-significant-digit distribution of order values
  vs Benford's law, with the χ² goodness-of-fit statistic. The
  classic fraud/anomaly screen for financial columns. The digit is
  extracted from the integer-cents STRING (no log10-floor boundary
  risk); expected probabilities log₁₀(1+1/d) are quantized to
  DECIMAL(18,8) before any arithmetic so libm ulp differences cannot
  surface; χ² terms are decimal-quantized before the exact sum.

Reference parity: no analogue [REF-UNVERIFIED — /root/reference is
empty]; SURVEY §2.J-M text-analysis / quality-audit extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

_KN_TOPK = 30
_KN_D = 0.75  # absolute discount; binary-exact (3/4)

_KN_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, tok, ord
    FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
               generate_subscripts(string_split(text, ' '), 1) AS ord
        FROM documents
    ) WHERE tok <> ''
), bg AS (
    SELECT doc_id, w1, w2
    FROM (
        SELECT doc_id, tok AS w1,
               LEAD(tok) OVER (PARTITION BY doc_id ORDER BY ord) AS w2
        FROM toks
    ) WHERE w2 IS NOT NULL
), c2 AS (
    SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n2 FROM bg GROUP BY w1, w2
), c1 AS (
    SELECT w1, CAST(SUM(n2) AS BIGINT) AS n1,
           CAST(COUNT(*) AS BIGINT) AS n_follow
    FROM c2 GROUP BY w1
), cont AS (
    SELECT w2, CAST(COUNT(*) AS BIGINT) AS n_prec FROM c2 GROUP BY w2
), types AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_types FROM c2
)
SELECT c2.w1, c2.w2, c2.n2 AS c_bigram, c1.n1 AS c_context,
       c1.n_follow, cont.n_prec, t.n_types,
       ROUND(CAST(c2.n2 AS DOUBLE) / c1.n1, 6) AS p_mle,
       ROUND((CAST(c2.n2 AS DOUBLE) - {_KN_D}) / c1.n1
             + ({_KN_D} * c1.n_follow / c1.n1)
               * (CAST(cont.n_prec AS DOUBLE) / t.n_types), 6) AS p_kn
FROM c2
JOIN c1 ON c1.w1 = c2.w1
JOIN cont ON cont.w2 = c2.w2
CROSS JOIN types t
ORDER BY c2.n2 DESC, c2.w1, c2.w2
LIMIT {_KN_TOPK}
"""


@register("x_kneser_ney", oracle=_KN_ORACLE)
def x_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram model over the corpus, reported
    for the {_KN_TOPK} most frequent bigrams (deterministic
    count-desc, then lexicographic tie-break):

        P_KN(w₂|w₁) = (c(w₁w₂) − D)/c(w₁·)
                      + D·N₁₊(w₁·)/c(w₁·) · N₁₊(·w₂)/N₁₊(··)

    with D = 0.75. max(·,0) is unnecessary on this output: every
    emitted bigram has c ≥ 1 > D. Emits the full integer evidence so
    each probability recomputes from its own row.

    Scale shape: bigrams assemble in-array per document (one explode,
    no token window); c(w₁w₂) is one map-side-combinable count, and
    ALL downstream statistics (context totals, follower fan-out
    N₁₊(w₁·), continuation fan-in N₁₊(·w₂), type count) derive from
    that TYPE table — |types| rows, not |tokens| — by further
    map-side-combinable aggregates on it. The final top-k is
    TakeOrdered, never a global sort. At 100 TB the only data-sized
    stage is the first bigram count; everything else is
    vocabulary-sized.
    """
    d = load(spark, sf_dir, "documents")
    ws = F.filter(F.split("text", " "), lambda t: t != "")
    pairs = F.expr(
        "transform(sequence(1, size(ws) - 1),"
        " i -> struct(ws[i - 1] AS w1, ws[i] AS w2))"
    )
    bg = (
        d.select("doc_id", ws.alias("ws"))
        .where(F.size("ws") >= 2)
        .select(F.explode(pairs).alias("p"))
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    c2 = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("n2")
    )
    c1 = c2.groupBy("w1").agg(
        F.sum("n2").cast("long").alias("n1"),
        F.count(F.lit(1)).cast("long").alias("n_follow"),
    )
    cont = c2.groupBy("w2").agg(
        F.count(F.lit(1)).cast("long").alias("n_prec")
    )
    types = c2.agg(F.count(F.lit(1)).cast("long").alias("n_types"))
    return (
        c2.join(c1, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(types))
        .select(
            "w1",
            "w2",
            F.col("n2").alias("c_bigram"),
            F.col("n1").alias("c_context"),
            "n_follow",
            "n_prec",
            "n_types",
            F.round(F.col("n2").cast("double") / F.col("n1"), 6).alias(
                "p_mle"
            ),
            F.round(
                (F.col("n2").cast("double") - F.lit(_KN_D)) / F.col("n1")
                + (F.lit(_KN_D) * F.col("n_follow") / F.col("n1"))
                * (F.col("n_prec").cast("double") / F.col("n_types")),
                6,
            ).alias("p_kn"),
        )
        .orderBy(F.col("c_bigram").desc(), "w1", "w2")
        .limit(_KN_TOPK)
    )


_BENFORD_ORACLE = """
WITH c AS (
    SELECT CAST(SUBSTRING(CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                               AS VARCHAR), 1, 1) AS BIGINT) AS digit
    FROM orders
), obs AS (
    SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs FROM c GROUP BY digit
), tot AS (
    SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM obs
), spine AS (
    SELECT CAST(d AS BIGINT) AS digit,
           CAST(LOG10(1.0 + 1.0 / d) AS DECIMAL(18,8)) AS p_benford
    FROM generate_series(1, 9) AS t(d)
), full_t AS (
    SELECT s.digit, s.p_benford,
           CAST(COALESCE(o.n_obs, 0) AS BIGINT) AS n_obs
    FROM spine s LEFT JOIN obs o ON o.digit = s.digit
), chi AS (
    SELECT CAST(SUM(CAST(
               (n_obs - t.n * CAST(p_benford AS DOUBLE))
               * (n_obs - t.n * CAST(p_benford AS DOUBLE))
               / (t.n * CAST(p_benford AS DOUBLE))
               AS DECIMAL(18,8))) AS DOUBLE) AS chi2_raw
    FROM full_t CROSS JOIN tot t
)
SELECT f.digit, f.n_obs,
       ROUND(CAST(f.n_obs AS DOUBLE) / t.n, 6) AS p_obs,
       CAST(f.p_benford AS DOUBLE) AS p_benford,
       ROUND(CAST(f.n_obs AS DOUBLE) / t.n
             - CAST(f.p_benford AS DOUBLE), 6) AS dev,
       ROUND(c.chi2_raw, 6) AS chi2_total
FROM full_t f CROSS JOIN tot t CROSS JOIN chi c
ORDER BY f.digit
"""


@register("x_benford", oracle=_BENFORD_ORACLE)
def x_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit audit of order values against Benford's
    law P(d) = log₁₀(1+1/d): per-digit observed count/share, expected
    share, deviation, and the χ² = Σ(O−E)²/E statistic repeated on
    each of the 9 rows. Digits extract from the integer-cents string
    (leading digit is scale-invariant under the ×100), never via
    log10+floor, which has an engine-dependent ulp cliff at powers of
    ten. A 1–9 spine guarantees all digits appear even with zero
    observations.

    Scale shape: one map-side-combinable 9-group count; everything
    after is on the fixed 9-row digit domain (spine join broadcast,
    χ² a 9-term quantized sum). The scan dominates at any scale.
    """
    c = load(spark, sf_dir, "orders").select(
        F.substring(
            F.round(F.col("o_totalprice") * 100, 0)
            .cast("long")
            .cast("string"),
            1,
            1,
        )
        .cast("long")
        .alias("digit")
    )
    obs = c.groupBy("digit").agg(
        F.count(F.lit(1)).cast("long").alias("n_obs")
    )
    tot = obs.agg(F.sum("n_obs").cast("long").alias("n"))
    spine = spark.range(1, 10).select(
        F.col("id").alias("digit"),
        F.log10(1.0 + 1.0 / F.col("id"))
        .cast("decimal(18,8)")
        .alias("p_benford"),
    )
    full_t = (
        spine.join(obs, "digit", "left")
        .select(
            "digit",
            "p_benford",
            F.coalesce(F.col("n_obs"), F.lit(0)).cast("long").alias("n_obs"),
        )
    )
    e = F.col("n") * F.col("p_benford").cast("double")
    chi = (
        full_t.crossJoin(F.broadcast(tot))
        .select(
            (
                (F.col("n_obs") - e) * (F.col("n_obs") - e) / e
            ).cast("decimal(18,8)").alias("term")
        )
        .agg(F.sum("term").cast("double").alias("chi2_raw"))
    )
    return (
        full_t.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(chi))
        .select(
            "digit",
            "n_obs",
            F.round(F.col("n_obs").cast("double") / F.col("n"), 6).alias(
                "p_obs"
            ),
            F.col("p_benford").cast("double").alias("p_benford"),
            F.round(
                F.col("n_obs").cast("double") / F.col("n")
                - F.col("p_benford").cast("double"),
                6,
            ).alias("dev"),
            F.round(F.col("chi2_raw"), 6).alias("chi2_total"),
        )
        .orderBy("digit")
    )
