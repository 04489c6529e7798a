"""Round-6 batch 27: collocation strength and behavioral entropy.

- ``x_collocation_llr`` — Dunning's log-likelihood ratio (G²) for
  corpus bigrams: the 2×2 contingency test (bigram vs margins) that
  finds collocations PMI over-ranks when counts are tiny. Reported
  for every bigram with count ≥ {_LLR_MIN}; each O·ln(O/E) term is
  DECIMAL(18,8)-quantized before the exact sum (x_source_kl recipe),
  output ordered by the exact (w1, w2) key — never by the float
  statistic.
- ``x_session_entropy`` — Shannon entropy of each user's event-type
  mix, H = ln(n) − (Σ c·ln c)/n, from exact per-type counts. The
  behavioral-diversity feature next to x_rfm_features: H = 0 is a
  single-action user, ln(|types|) a uniform explorer.

Reference parity: no analogue [REF-UNVERIFIED — /root/reference is
empty]; SURVEY §2.J-M text/GA-analytics extensions (x_cooccur_pmi,
x_token_entropy, x_rfm_features neighbors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

_LLR_MIN = 10  # report bigrams observed at least this often

_LLR_ORACLE = f"""
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
    SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS k11 FROM bg GROUP BY w1, w2
), c1 AS (
    SELECT w1, CAST(SUM(k11) AS BIGINT) AS r1 FROM c2 GROUP BY w1
), cc AS (
    SELECT w2, CAST(SUM(k11) AS BIGINT) AS c1n FROM c2 GROUP BY w2
), tot AS (
    SELECT CAST(SUM(k11) AS BIGINT) AS n FROM c2
), cells AS (
    SELECT c2.w1, c2.w2, c2.k11,
           (c1.r1 - c2.k11) AS k12,
           (cc.c1n - c2.k11) AS k21,
           (t.n - c1.r1 - cc.c1n + c2.k11) AS k22,
           c1.r1, cc.c1n, t.n
    FROM c2
    JOIN c1 ON c1.w1 = c2.w1
    JOIN cc ON cc.w2 = c2.w2
    CROSS JOIN tot t
    WHERE c2.k11 >= {_LLR_MIN}
)
SELECT w1, w2, k11, k12, k21, k22,
       ROUND(CAST(
           2.0 * (
             CAST(CASE WHEN k11 > 0 THEN CAST(k11 * LN(
                 CAST(k11 AS DOUBLE) * n
                 / (CAST(r1 AS DOUBLE) * c1n)) AS DECIMAL(18,8))
                 ELSE CAST(0 AS DECIMAL(18,8)) END AS DOUBLE)
           + CAST(CASE WHEN k12 > 0 THEN CAST(k12 * LN(
                 CAST(k12 AS DOUBLE) * n
                 / (CAST(r1 AS DOUBLE) * (n - c1n))) AS DECIMAL(18,8))
                 ELSE CAST(0 AS DECIMAL(18,8)) END AS DOUBLE)
           + CAST(CASE WHEN k21 > 0 THEN CAST(k21 * LN(
                 CAST(k21 AS DOUBLE) * n
                 / (CAST(n - r1 AS DOUBLE) * c1n)) AS DECIMAL(18,8))
                 ELSE CAST(0 AS DECIMAL(18,8)) END AS DOUBLE)
           + CAST(CASE WHEN k22 > 0 THEN CAST(k22 * LN(
                 CAST(k22 AS DOUBLE) * n
                 / (CAST(n - r1 AS DOUBLE) * (n - c1n))) AS DECIMAL(18,8))
                 ELSE CAST(0 AS DECIMAL(18,8)) END AS DOUBLE)
           ) AS DOUBLE), 6) AS llr
FROM cells
ORDER BY w1, w2
"""


@register("x_collocation_llr", oracle=_LLR_ORACLE)
def x_collocation_llr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunning G² collocation score for every corpus bigram with
    count ≥ {_LLR_MIN}: G² = 2·Σ_cells O·ln(O·N/(row·col)) over the
    2×2 table (k11 = c(w₁w₂), margins from the bigram totals). Zero
    cells contribute zero. The integer contingency is emitted as
    evidence; each log term is quantized to DECIMAL(18,8) before the
    4-term sum, and the output orders by the exact bigram key, so the
    float statistic never drives ordering.

    Scale shape: identical to x_kneser_ney — one in-array bigram
    explode + map-side-combinable count, then margins and the
    contingency all derive from the TYPE table (|types| rows). The
    ≥ {_LLR_MIN} filter keeps output domain-bounded. Scan-bound at
    100 TB.
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
        F.count(F.lit(1)).cast("long").alias("k11")
    )
    c1 = c2.groupBy("w1").agg(F.sum("k11").cast("long").alias("r1"))
    cc = c2.groupBy("w2").agg(F.sum("k11").cast("long").alias("c1n"))
    tot = c2.agg(F.sum("k11").cast("long").alias("n"))
    cells = (
        c2.where(F.col("k11") >= _LLR_MIN)
        .join(c1, "w1")
        .join(cc, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "k11",
            (F.col("r1") - F.col("k11")).alias("k12"),
            (F.col("c1n") - F.col("k11")).alias("k21"),
            (F.col("n") - F.col("r1") - F.col("c1n") + F.col("k11")).alias(
                "k22"
            ),
            "r1",
            "c1n",
            "n",
        )
    )

    def term(obs: str, row_tot, col_tot):
        o = F.col(obs)
        return F.when(
            o > 0,
            (
                o
                * F.log(
                    o.cast("double") * F.col("n") / (row_tot * col_tot)
                )
            ).cast("decimal(18,8)"),
        ).otherwise(F.lit(0).cast("decimal(18,8)"))

    r1d = F.col("r1").cast("double")
    nr1d = (F.col("n") - F.col("r1")).cast("double")
    c1d = F.col("c1n")
    nc1d = F.col("n") - F.col("c1n")
    llr = F.round(
        (
            2.0
            * (
                term("k11", r1d, c1d).cast("double")
                + term("k12", r1d, nc1d).cast("double")
                + term("k21", nr1d, c1d).cast("double")
                + term("k22", nr1d, nc1d).cast("double")
            )
        ).cast("double"),
        6,
    )
    return cells.select(
        "w1", "w2", "k11", "k12", "k21", "k22", llr.alias("llr")
    ).orderBy("w1", "w2")


_SESSION_ENTROPY_ORACLE = """
WITH c AS (
    SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
    FROM events GROUP BY user_id, event_type
), per_user AS (
    SELECT user_id,
           CAST(SUM(c) AS BIGINT) AS n_events,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(CAST(c * LN(CAST(c AS DOUBLE)) AS DECIMAL(18,8)))
                AS DOUBLE) AS clnc
    FROM c GROUP BY user_id
)
SELECT user_id, n_events, n_types,
       ROUND(LN(CAST(n_events AS DOUBLE)) - clnc / n_events, 6)
           AS entropy
FROM per_user
ORDER BY user_id
"""


@register("x_session_entropy", oracle=_SESSION_ENTROPY_ORACLE)
def x_session_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type distribution via the
    count identity H = ln(n) − (Σ c·ln c)/n — only the c·ln c terms
    are inexact and each is DECIMAL(18,8)-quantized before the
    order-free exact sum. H = 0 for single-behavior users, ln(k) for
    a uniform k-type mix; the behavioral-diversity companion feature
    to x_rfm_features.

    Scale shape: two map-side-combinable aggregates ((user, type) →
    user), both shuffling only key+three-numbers. No window, no
    domain assumptions, no skew risk beyond the (user) key itself.
    Scan-bound at 100 TB.
    """
    c = (
        load(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    per_user = c.groupBy("user_id").agg(
        F.sum("c").cast("long").alias("n_events"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(
            (F.col("c") * F.log(F.col("c").cast("double"))).cast(
                "decimal(18,8)"
            )
        )
        .cast("double")
        .alias("clnc"),
    )
    return per_user.select(
        "user_id",
        "n_events",
        "n_types",
        F.round(
            F.log(F.col("n_events").cast("double"))
            - F.col("clnc") / F.col("n_events"),
            6,
        ).alias("entropy"),
    ).orderBy("user_id")
