"""Round-6 batch 50: mixture reweighting + embedding drift.

- ``x_mixture_weights`` — the importance-reweighting table a
  data-mixing job exports: per source, the weight that corrects the
  corpus toward a uniform target mix (``w_s = target/actual``), plus
  the effective sample size the reweighted corpus retains
  (``ESS = (Σw)²/Σw²`` — Kish). Reweighting toward uniform over a
  skewed corpus silently costs data; ESS is the number that makes the
  cost visible before training does. The ESS denominator's per-source
  reciprocals are DECIMAL-quantized before summing (20 doubles summed
  in engine order would drift in the last ulp).
- ``x_embed_drift`` — centroid drift between the two vec_id-parity
  halves of the embedding corpus, per label: cosine between the half
  centroids and their norm ratio. The batch-A-vs-batch-B skew audit
  run before trusting that two embedding snapshots are exchangeable.
  All dot/norm accumulations happen on SCALED-INTEGER sums (the
  x_embed_dim_stats quantization) — the count normalizers cancel in
  the cosine, so floats appear only in two sqrts and one division.

Reference parity: no analogue [REF-UNVERIFIED — /root/reference is
empty]; SURVEY §2.J-M curation / embedding extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

_MW_ORACLE = """
WITH s AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
    GROUP BY source
), g AS (
    SELECT CAST(SUM(n_docs) AS BIGINT) AS total,
           CAST(COUNT(*) AS BIGINT) AS n_sources,
           CAST(SUM(CAST(1.0 / n_docs AS DECIMAL(18,12)))
                AS DECIMAL(28,12)) AS inv_sum
    FROM s
)
SELECT s.source, s.n_docs,
       ROUND(CAST(s.n_docs AS DOUBLE) / g.total, 6) AS actual_share,
       ROUND(CAST(g.total AS DOUBLE)
             / (g.n_sources * s.n_docs), 6) AS weight,
       ROUND(CAST(g.n_sources AS DOUBLE) * g.n_sources
             / CAST(g.inv_sum AS DOUBLE) / g.total, 6) AS ess_fraction
FROM s CROSS JOIN g
"""


@register("x_mixture_weights", oracle=_MW_ORACLE)
def x_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance weights correcting the corpus to a uniform source
    mix: ``w_s = (1/k) / (n_s/N) = N/(k·n_s)``, with the Kish
    effective-sample-size FRACTION the reweighted corpus keeps:
    ``ESS/N = k²/(Σ_s 1/n_s)/N`` (algebra of constant-per-source
    weights — no per-doc pass exists). An ESS fraction near 1 means
    the mix was already uniform; a small one quantifies how much data
    the reweighting effectively throws away. The reciprocal sum is
    quantized to DECIMAL(18,12) per source before summing, so both
    engines add identical exact terms.

    Scale shape: one map-side-combinable source count — the only pass
    over documents — and a 1-row broadcast. Source-domain output.
    Scan-bound at 100 TB.
    """
    d = load(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    g = s.agg(
        F.sum("n_docs").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_sources"),
        F.sum((F.lit(1.0) / F.col("n_docs")).cast("decimal(18,12)"))
        .cast("decimal(28,12)")
        .alias("inv_sum"),
    )
    return s.crossJoin(F.broadcast(g)).select(
        "source",
        "n_docs",
        F.round(F.col("n_docs").cast("double") / F.col("total"), 6).alias(
            "actual_share"
        ),
        F.round(
            F.col("total").cast("double")
            / (F.col("n_sources") * F.col("n_docs")),
            6,
        ).alias("weight"),
        F.round(
            F.col("n_sources").cast("double")
            * F.col("n_sources")
            / F.col("inv_sum").cast("double")
            / F.col("total"),
            6,
        ).alias("ess_fraction"),
    )


_ED_ORACLE = """
WITH flat AS (
    SELECT label,
           vec_id % 2 AS half,
           generate_subscripts(embedding, 1) - 1 AS dim,
           CAST(ROUND(unnest(CAST(embedding AS DOUBLE[])) * 10000000)
                AS BIGINT) AS s
    FROM embeddings
), sums AS (
    SELECT label, dim,
           CAST(SUM(CASE WHEN half = 0 THEN s ELSE 0 END) AS BIGINT) AS sa,
           CAST(SUM(CASE WHEN half = 1 THEN s ELSE 0 END) AS BIGINT) AS sb,
           CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
           CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb
    FROM flat GROUP BY label, dim
), agg AS (
    SELECT label,
           MAX(na) AS n_a, MAX(nb) AS n_b,
           CAST(SUM(CAST(sa AS DECIMAL(19,0)) * CAST(sb AS DECIMAL(19,0)))
                AS DECIMAL(38,0)) AS dot,
           CAST(SUM(CAST(sa AS DECIMAL(19,0)) * CAST(sa AS DECIMAL(19,0)))
                AS DECIMAL(38,0)) AS naa,
           CAST(SUM(CAST(sb AS DECIMAL(19,0)) * CAST(sb AS DECIMAL(19,0)))
                AS DECIMAL(38,0)) AS nbb
    FROM sums GROUP BY label
)
SELECT label, n_a, n_b,
       ROUND(CAST(dot AS DOUBLE)
             / (sqrt(CAST(naa AS DOUBLE)) * sqrt(CAST(nbb AS DOUBLE))),
             6) AS centroid_cosine,
       ROUND((sqrt(CAST(naa AS DOUBLE)) / n_a)
             / (sqrt(CAST(nbb AS DOUBLE)) / n_b), 6) AS norm_ratio
FROM agg
"""


@register("x_embed_drift", oracle=_ED_ORACLE)
def x_embed_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding drift audit: split each label's vectors by vec_id
    parity (the stand-in for batch A vs batch B), and report the
    cosine between the two half-centroids plus their norm ratio.
    Cosine ≈ 1 and ratio ≈ 1 say the halves are exchangeable; drift
    in either says the embedding space moved between batches —
    re-quantize (x_embed_quantize) and re-train the IVF seeds before
    reusing them. Component sums are scaled integers (×1e7, the
    x_embed_dim_stats quantization); the per-label cosine divides the
    exact integer ``Σ sa·sb`` by the sqrt'd exact norms — the count
    normalizers cancel, so both engines compute identical doubles.

    Scale shape: one posexplode (narrow) + one (label, dim) integer
    aggregate + one label-grain fold over the 64-dim frame. No vector
    ever crosses the shuffle unquantized; output is label-domain.
    Scan-bound at 100 TB.
    """
    em = load(spark, sf_dir, "embeddings")
    flat = em.select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim", "v"
        ),
    ).select(
        "label",
        "half",
        "dim",
        F.round(F.col("v") * 10000000).cast("long").alias("s"),
    )
    sums = flat.groupBy("label", "dim").agg(
        F.sum(F.when(F.col("half") == 0, F.col("s")).otherwise(0))
        .cast("long")
        .alias("sa"),
        F.sum(F.when(F.col("half") == 1, F.col("s")).otherwise(0))
        .cast("long")
        .alias("sb"),
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
        .cast("long")
        .alias("na"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
        .cast("long")
        .alias("nb"),
    )
    d19 = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    agg = sums.groupBy("label").agg(
        F.max("na").alias("n_a"),
        F.max("nb").alias("n_b"),
        F.sum(d19("sa") * d19("sb")).cast("decimal(38,0)").alias("dot"),
        F.sum(d19("sa") * d19("sa")).cast("decimal(38,0)").alias("naa"),
        F.sum(d19("sb") * d19("sb")).cast("decimal(38,0)").alias("nbb"),
    )
    return agg.select(
        "label",
        "n_a",
        "n_b",
        F.round(
            F.col("dot").cast("double")
            / (
                F.sqrt(F.col("naa").cast("double"))
                * F.sqrt(F.col("nbb").cast("double"))
            ),
            6,
        ).alias("centroid_cosine"),
        F.round(
            (F.sqrt(F.col("naa").cast("double")) / F.col("n_a"))
            / (F.sqrt(F.col("nbb").cast("double")) / F.col("n_b")),
            6,
        ).alias("norm_ratio"),
    )
