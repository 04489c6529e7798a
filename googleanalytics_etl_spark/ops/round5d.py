"""Round-5 pre-work, fourth batch: corpus-LM quality scoring,
diversity-aware sampling, and deterministic differential privacy.

- ``x_bigram_logprob`` — per-document average bigram log-probability
  under the corpus's OWN bigram model (the poor man's KenLM filter):
  templated/duplicated text scores high, line-noise scores low. Two
  count aggregates + two hash joins keyed on n-gram — the exact shape
  a real LM-filter scoring pass has at 100 TB.
- ``x_diverse_sample`` — diversity-aware exemplar selection: the 2
  most-central vectors per label cluster (min distance to the exact
  per-label centroid). The "pick representatives per cluster" half of
  coverage-driven data selection; composes with ``x_semdedup`` (which
  removes redundancy) and ``x_kmeans`` (which builds the clusters).
- ``x_dp_groupby`` — ε = 1 Laplace-noised group counts where the noise
  is derived from a SEEDED md5 uniform (inverse-CDF transform), so the
  privatized release is replay-deterministic and cross-engine
  checkable — the reproducible-DP-release pattern (fixed per-release
  seed), not a weakened mechanism.

Determinism: log2/ln terms and squared-distance terms are quantized to
exact decimals before summing (registry.py convention); every rank has
a unique tiebreaker; the noise uniform is (hash + 0.5)/65536 ∈ (0,1) so
the inverse CDF never sees 0 or 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register


# ---------------------------------------------------------------------------
# x_bigram_logprob — self-corpus LM quality score
# ---------------------------------------------------------------------------

_BIGRAM_LP_ORACLE = """
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
    SELECT w1, CAST(COUNT(*) AS BIGINT) AS n1 FROM bg GROUP BY w1
)
SELECT b.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND(CAST(SUM(CAST(LOG2(CAST(n2 AS DOUBLE) / n1) AS DECIMAL(18,4)))
                  AS DOUBLE) / COUNT(*), 6) AS avg_logp
FROM bg b
JOIN c2 USING (w1, w2)
JOIN c1 USING (w1)
GROUP BY b.doc_id
"""


@register("x_bigram_logprob", oracle=_BIGRAM_LP_ORACLE)
def x_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average log2 P(w₂|w₁) per document under the corpus's own bigram
    counts — the LM-perplexity quality filter, minus the external model:
    high scores flag templated/boilerplate text, low scores flag noise.

    Bigram occurrences assemble IN-ARRAY per document (codegen
    ``transform`` over an index sequence — one explode, no token-stream
    window), then two corpus-stat joins: (w1,w2)→count and w1→context
    count. Both are plain hash joins keyed on the n-gram — at 100 TB the
    LM table shards across the cluster exactly like the scoring rows, so
    nothing is broadcast and nothing is collected. Every document bigram
    occurs in the corpus table by construction (it contributes itself),
    so P ∈ (0,1] and the join is lossless. The per-term log2 values are
    decimal-quantized before the order-insensitive exact sum.
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
        .select("doc_id", F.explode(pairs).alias("p"))
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("n2"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).cast("long").alias("n1"))
    term = F.log2(F.col("n2").cast("double") / F.col("n1")).cast("decimal(18,4)")
    return (
        bg.join(c2, ["w1", "w2"])
        .join(c1, ["w1"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(F.sum(term).cast("double") / F.count(F.lit(1)), 6).alias(
                "avg_logp"
            ),
        )
    )


# ---------------------------------------------------------------------------
# x_diverse_sample — most-central exemplars per cluster
# ---------------------------------------------------------------------------

_DIVERSE_ORACLE = """
WITH ex AS (
    SELECT label, vec_id,
           generate_subscripts(embedding, 1) - 1 AS dim,
           CAST(ROUND(unnest(CAST(embedding AS DOUBLE[])) * 10000000)
                AS BIGINT) / 10000000.0 AS v
    FROM embeddings
), cent AS (
    SELECT label, dim,
           ROUND(SUM(CAST(ROUND(v * 10000000) AS BIGINT)) / 10000000.0
                 / COUNT(*), 6) AS c
    FROM ex GROUP BY label, dim
), dist AS (
    SELECT e.label, e.vec_id,
           ROUND(CAST(SUM(CAST((e.v - c.c) * (e.v - c.c) AS DECIMAL(28,10)))
                      AS DOUBLE), 6) AS d2
    FROM ex e JOIN cent c ON c.label = e.label AND c.dim = e.dim
    GROUP BY e.label, e.vec_id
)
SELECT label, vec_id, d2, CAST(rn AS BIGINT) AS pick
FROM (
    SELECT label, vec_id, d2,
           ROW_NUMBER() OVER (PARTITION BY label ORDER BY d2, vec_id) AS rn
    FROM dist
)
WHERE rn <= 2
"""


@register("x_diverse_sample", oracle=_DIVERSE_ORACLE)
def x_diverse_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coverage sampling: the 2 most-central vectors of every label
    cluster (min squared distance to the exact per-label centroid) —
    "one exemplar per region of embedding space", the diversity
    counterpart to the dedup family's redundancy removal.

    Both stages are (label, dim)-grain hash aggregates over a
    posexplode — the shuffle carries scalar triples with map-side
    combine, never whole vectors, and parallelism is label×dim. The
    ~|labels|×dim centroid table is BROADCAST back into the distance
    join. Components live on the 1e7 grid (exact float→double widening
    + integer sums, the x_embed_centroids pattern) and each squared
    term is quantized to DECIMAL(28,10) before the exact sum, so
    distances — and therefore the picks — are bit-identical
    cross-engine. Per-label rank streams (window group limit), no
    global sort.
    """
    e = load(spark, sf_dir, "embeddings")
    grid = (
        F.round(F.col("v").cast("double") * 10_000_000).cast("bigint")
        / 10_000_000.0
    )
    ex = e.select(
        "label", "vec_id", F.posexplode("embedding").alias("dim", "v")
    ).select("label", "vec_id", "dim", grid.alias("v"))
    cent = ex.groupBy("label", "dim").agg(
        F.round(
            F.sum(F.round(F.col("v") * 10_000_000).cast("bigint"))
            / 10_000_000.0
            / F.count(F.lit(1)),
            6,
        ).alias("c")
    )
    term = ((F.col("v") - F.col("c")) * (F.col("v") - F.col("c"))).cast(
        "decimal(28,10)"
    )
    dist = (
        ex.join(F.broadcast(cent), ["label", "dim"])
        .groupBy("label", "vec_id")
        .agg(F.round(F.sum(term).cast("double"), 6).alias("d2"))
    )
    w = Window.partitionBy("label").orderBy("d2", "vec_id")
    return (
        dist.withColumn("pick", F.row_number().over(w).cast("long"))
        .where(F.col("pick") <= 2)
        .select("label", "vec_id", "d2", "pick")
    )


# ---------------------------------------------------------------------------
# x_dp_groupby — deterministic-replay Laplace-noised counts
# ---------------------------------------------------------------------------

_DP_ORACLE = """
WITH counts AS (
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1
), noise AS (
    SELECT event_type, n,
           (CAST('0x' || substr(md5('dp-seed-1|' || event_type), 1, 4)
                 AS BIGINT) + 0.5) / 65536.0 AS u
    FROM counts
)
SELECT event_type,
       ROUND(n + (CASE WHEN u >= 0.5 THEN -1.0 ELSE 1.0 END)
                 * LN(1.0 - 2.0 * ABS(u - 0.5)), 4) AS noisy_count
FROM noise
"""


@register("x_dp_groupby", oracle=_DP_ORACLE)
def x_dp_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private group counts (ε = 1 Laplace mechanism,
    sensitivity 1) with REPRODUCIBLE noise: the uniform draw is the
    md5 of a fixed release seed + group key, pushed through the Laplace
    inverse CDF. Same release seed ⇒ bit-identical privatized output —
    the auditable-release pattern (a new seed per release restores the
    fresh-randomness guarantee; determinism here is a replay property,
    not a weakening of the mechanism's ε accounting).

    One hash aggregate; the noise is pure row-local codegen math on the
    ~|groups| result — nothing extra moves. u = (h₁₆ + 0.5)/65536 stays
    strictly inside (0,1), so LN never sees 0. True counts are NOT
    emitted — only the noised release.
    """
    ev = load(spark, sf_dir, "events")
    counts = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit("dp-seed-1|"), F.col("event_type")).cast(
                        "binary"
                    )
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")
        + 0.5
    ) / 65536.0
    lap = (
        F.when(u >= 0.5, F.lit(-1.0)).otherwise(F.lit(1.0))
        * F.log(F.lit(1.0) - 2.0 * F.abs(u - 0.5))
    )
    return counts.select(
        "event_type", F.round(F.col("n") + lap, 4).alias("noisy_count")
    )
