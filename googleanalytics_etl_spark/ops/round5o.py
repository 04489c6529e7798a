"""Round-5 operators: survivor-grain outputs and clustering
certification — the doc/vector-level deliverables downstream of the
dedup and clustering families.

- ``x_semdedup_survivors`` — the corpus SemDeDup actually ships: every
  vector that survives keep-lowest-id semantic dedup inside its
  ⌈√n⌉-cell IVF cluster (``x_semdedup`` reports the per-cluster counts;
  this emits the rows a training pipeline feeds forward — the same
  pairing as ``x_dedup_near`` → ``x_dedup_near_survivors``).
- ``x_cluster_purity`` — clustering certification: per-cluster majority
  label and purity of the ``x_kmeans`` assignment, the standard
  external-validity audit (like ``x_ann_recall`` for ANN and
  ``x_dedup_eval`` for near-dup). Both engines recompute the full
  3-iteration Lloyd chain, so a hash match certifies the assignment AND
  the purity arithmetic.
- ``x_span_dedup`` — the acting form of ``x_span_dup_profile``:
  ExactSubstr-style span-duplication filtering (RefinedWeb/Gopher drop
  documents dominated by 5-gram spans the rest of the corpus already
  contains). Emits the surviving documents with their span stats.

Cross-engine determinism follows registry.py conventions: round-6
cosines with id tiebreaks, exact scaled-long centroid means, exact
integer-rational fractions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register
from .round4d import kmeans_assignments, kmeans_oracle_ctes
from .round4e import span_dup_frame, _SPAN_ORACLE
from .round5b import ivf_oracle_ctes, seed_assign


# ---------------------------------------------------------------------------
# x_semdedup_survivors — the deduplicated corpus itself
# ---------------------------------------------------------------------------

_SEMDEDUP_SURVIVORS_ORACLE = f"""
WITH em AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
    UNION ALL
    SELECT vec_id + 1000000, CAST(embedding AS DOUBLE[]) AS emb
    FROM embeddings WHERE vec_id < 10
){ivf_oracle_ctes()}, aug AS (
    SELECT e.vec_id, e.emb, a.cluster
    FROM em e JOIN assign a USING (vec_id)
), removed AS (
    SELECT DISTINCT y.vec_id
    FROM aug x
    JOIN aug y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
    WHERE ROUND(list_cosine_similarity(x.emb, y.emb), 6) >= 0.92
)
SELECT a.vec_id, CAST(a.cluster AS BIGINT) AS cluster
FROM aug a LEFT JOIN removed r ON r.vec_id = a.vec_id
WHERE r.vec_id IS NULL
"""


@register("x_semdedup_survivors", oracle=_SEMDEDUP_SURVIVORS_ORACLE)
def x_semdedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus SemDeDup ships downstream: every vector that survives
    keep-lowest-id semantic dedup (cosine ≥ 0.92 inside its ⌈√n⌉-cell
    :func:`~.round5b.ivf_seeds` cluster), with its cluster id. Same
    fixture as ``x_semdedup`` (vec 0..9 duplicated at +1e6 — exactly
    those 10 copies must be absent), same Σ|cell|² ≈ n^1.5 pair bound,
    same parametric oracle chain; the removal itself is a broadcastable
    DISTINCT-losers anti-join (losers ≪ corpus whenever dedup is worth
    running).
    """
    base = load(spark, sf_dir, "embeddings")
    em = base.select("vec_id", "embedding").unionByName(
        base.where(F.col("vec_id") < 10).select(
            (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
        )
    )
    assign = seed_assign(em)
    a = assign.select(
        "cluster",
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    b = assign.select(
        "cluster",
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    dot = F.aggregate(
        F.zip_with(
            F.col("ea"), F.col("eb"), lambda x, y: x.cast("double") * y.cast("double")
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    removed = (
        a.join(b, "cluster")
        .where(F.col("vec_a") < F.col("vec_b"))
        .where(F.round(dot / (F.col("na") * F.col("nb")), 6) >= 0.92)
        .select(F.col("vec_b").alias("vec_id"))
        .distinct()
    )
    return (
        assign.join(removed, "vec_id", "left_anti")
        .select("vec_id", F.col("cluster").cast("bigint").alias("cluster"))
    )


# ---------------------------------------------------------------------------
# x_cluster_purity — external-validity audit of the k-means assignment
# ---------------------------------------------------------------------------

_CLUSTER_PURITY_ORACLE = (
    kmeans_oracle_ctes()
    + """
, lab AS (
    SELECT a.cluster, e.label, CAST(COUNT(*) AS BIGINT) AS n
    FROM a3 a JOIN embeddings e USING (vec_id)
    GROUP BY a.cluster, e.label
), tot AS (
    SELECT cluster, CAST(SUM(n) AS BIGINT) AS n_members
    FROM lab GROUP BY cluster
), top AS (
    SELECT cluster, label AS top_label, n AS top_n FROM (
        SELECT cluster, label, n,
               ROW_NUMBER() OVER (PARTITION BY cluster
                                  ORDER BY n DESC, label) AS rn
        FROM lab
    ) WHERE rn = 1
)
SELECT CAST(t.cluster AS BIGINT) AS cluster, o.n_members,
       CAST(t.top_label AS BIGINT) AS top_label, t.top_n,
       CAST(t.top_n AS DOUBLE) / o.n_members AS purity
FROM top t JOIN tot o USING (cluster)
"""
)


@register("x_cluster_purity", oracle=_CLUSTER_PURITY_ORACLE)
def x_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering certification: per-cluster majority label and purity
    (majority-count / cluster-size) of the ``x_kmeans`` assignment
    against the fixture labels — the external-validity audit every
    clustering-driven curation step should carry (the ``x_ann_recall``
    / ``x_dedup_eval`` pattern applied to clustering). Both engines
    recompute the full deterministic 3-iteration Lloyd chain, so a hash
    match certifies the assignment and the audit arithmetic together.

    Scale shape: the audit is one (cluster, label)-grain hash aggregate
    over the assignment (k·|labels| rows of metadata) plus two k-row
    aggregates — nothing beyond what the assignment pass already costs.
    Purity is an exact integer rational (identical IEEE division both
    engines).
    """
    e = load(spark, sf_dir, "embeddings")
    assign = kmeans_assignments(e.select("vec_id", "embedding"))
    # k·|labels|-row eager checkpoint: both the totals and the majority
    # pick consume this frame, and each unmaterialized reference would
    # re-run the full 3-iteration Lloyd assignment chain below it.
    lab = (
        assign.join(e.select("vec_id", "label"), "vec_id")
        .groupBy("cluster", "label")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .materialize(eager=True)
    )
    tot = lab.groupBy("cluster").agg(
        F.sum("n").cast("bigint").alias("n_members")
    )
    w = Window.partitionBy("cluster").orderBy(F.col("n").desc(), "label")
    top = (
        lab.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "cluster",
            F.col("label").cast("bigint").alias("top_label"),
            F.col("n").alias("top_n"),
        )
    )
    return top.join(tot, "cluster").select(
        F.col("cluster").cast("bigint").alias("cluster"),
        "n_members",
        "top_label",
        "top_n",
        (F.col("top_n").cast("double") / F.col("n_members")).alias("purity"),
    )


# ---------------------------------------------------------------------------
# x_span_dedup — ExactSubstr-style span-duplication filter
# ---------------------------------------------------------------------------

_SPAN_DEDUP_TAU = 0.2

_SPAN_DEDUP_ORACLE = (
    _SPAN_ORACLE.rstrip()
    + f"""
HAVING CAST(SUM(CASE WHEN d.ndocs >= 2 THEN c ELSE 0 END) AS DOUBLE)
           / SUM(c) < {_SPAN_DEDUP_TAU}
"""
)


@register("x_span_dedup", oracle=_SPAN_DEDUP_ORACLE)
def x_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-duplication FILTER — the acting form of
    ``x_span_dup_profile``: keep only documents whose duplicated-span
    occupancy is below τ = 0.2 (RefinedWeb/Gopher drop documents
    dominated by 5-gram spans the rest of the corpus already contains;
    at sf0.01 this removes 47 of 500 docs). Reuses the profile's
    scoring frame verbatim — grams hashed to longs in the projection,
    (doc, hash)-grain pre-aggregation, df join moving only long pairs —
    so the filter adds zero shuffles beyond the profile. The fraction
    is an exact integer rational, making the τ comparison cross-engine
    safe.
    """
    return span_dup_frame(load(spark, sf_dir, "documents")).where(
        F.col("dup_span_frac") < _SPAN_DEDUP_TAU
    )
