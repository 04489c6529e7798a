"""Round-4 operators, sixth batch: exact Gram/covariance matrix (the
statistics pass in front of PCA/whitening) and discrete percentiles.

- ``x_gram_matrix`` — the d×d Gram matrix of the embedding corpus from
  EXACT scaled-integer products: the one-pass, shuffle-light statistic
  every linear projection (PCA, whitening, random-projection QA) needs;
  paired with :func:`pca_top_component`, a driver-side power iteration
  over the collected (bounded, d²) matrix.
- ``q_percentile_disc`` — discrete percentiles (an actual data value,
  not an interpolation) per group, built from an explicit rank
  construction that both engines execute identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

_GRAM_SCALE = 10_000_000  # same 1e7 grid as x_embed_centroids / x_kmeans

_GRAM_ORACLE = """
WITH v AS (
    -- DuckDB lambda indexes are 1-based; Spark posexplode is 0-based
    SELECT vec_id,
           s.dim - 1 AS dim,
           CAST(ROUND(CAST(s.val AS DOUBLE) * 10000000) AS BIGINT) AS sv
    FROM (SELECT vec_id,
                 unnest(list_transform(embedding,
                     (x, i) -> {'dim': i, 'val': x})) AS s
          FROM embeddings)
)
SELECT a.dim AS i, b.dim AS j,
       CAST(SUM(CAST(a.sv AS DECIMAL(38,0)) * b.sv) AS DOUBLE)
           / 10000000 / 10000000 AS g
FROM v a JOIN v b ON a.vec_id = b.vec_id AND a.dim <= b.dim
GROUP BY i, j
"""


@register("x_gram_matrix", oracle=_GRAM_ORACLE)
def x_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Gram matrix XᵀX of the embedding corpus (upper triangle,
    d(d+1)/2 = 2080 rows) — the statistics pass in front of PCA,
    whitening, or linear-probe training, reduced to one join + one
    hash aggregate whose output is BOUNDED BY d², not n.

    Exactness: values snap to the 1e7 grid (the corpus quantization
    step every embedding op here shares), products are summed as
    DECIMAL(38,0) — associative, overflow-safe to ~10³⁸ (a 100 TB
    corpus peaks around 10²⁴) — and the only float division is the
    final fixed-shape descale. Both engines produce bit-identical
    doubles, no rounding tricks needed.

    Shape: explode to (vec, dim, val), self-join on vec_id (row-local
    — Spark co-partitions both sides on vec_id in one shuffle), then
    the (i, j) aggregate with map-side partial combine. The d² output
    is what :func:`pca_top_component` collects for the driver-side
    power iteration (bounded metadata, the bloom-bitmap contract).
    """
    em = load(spark, sf_dir, "embeddings")
    v = em.select(
        "vec_id",
        F.posexplode(
            F.transform(
                "embedding",
                lambda x: F.round(x.cast("double") * _GRAM_SCALE).cast("long"),
            )
        ).alias("dim", "sv"),
    )
    a = v.select("vec_id", F.col("dim").alias("i"), F.col("sv").alias("sa"))
    b = v.select("vec_id", F.col("dim").alias("j"), F.col("sv").alias("sb"))
    return (
        a.join(b, "vec_id")
        .where(F.col("i") <= F.col("j"))
        .groupBy("i", "j")
        .agg(
            (
                F.sum(
                    (F.col("sa").cast("decimal(38,0)") * F.col("sb"))
                ).cast("double")
                / _GRAM_SCALE
                / _GRAM_SCALE
            ).alias("g")
        )
    )


def pca_top_component(spark: SparkSession, sf_dir: str, iters: int = 2000):
    """Driver-side power iteration over the collected Gram matrix:
    returns (eigenvalue, unit eigenvector as list[float]).

    The distributed work is :func:`x_gram_matrix` (one pass over the
    corpus); the iteration itself touches only the d×d matrix — doing
    it on the driver is the correct scale decision, not a shortcut
    (d² doubles ≪ one Arrow batch; 2000 matvecs of a 64×64 matrix cost
    microseconds and cover small spectral gaps). Deterministic: fixed
    iteration count, fixed all-ones start vector (no randomness)."""
    import numpy as np

    rows = x_gram_matrix(spark, sf_dir).collect()
    d = max(r["j"] for r in rows) + 1
    G = np.zeros((d, d))
    for r in rows:
        G[r["i"], r["j"]] = r["g"]
        G[r["j"], r["i"]] = r["g"]
    v = np.ones(d) / np.sqrt(d)
    for _ in range(iters):
        w = G @ v
        v = w / np.linalg.norm(w)
    return float(v @ G @ v), [float(x) for x in v]


# ---------------------------------------------------------------------------
# q_percentile_disc — discrete percentiles per group
# ---------------------------------------------------------------------------

_PDISC_ORACLE = """
WITH ranked AS (
    SELECT event_type, value,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY value, event_id) AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM events
)
SELECT event_type,
       MAX(CASE WHEN rn = CAST(CEIL(0.5 * n) AS BIGINT) THEN value END)
           AS p50_disc,
       MAX(CASE WHEN rn = CAST(CEIL(0.9 * n) AS BIGINT) THEN value END)
           AS p90_disc,
       MAX(CASE WHEN rn = CAST(CEIL(0.99 * n) AS BIGINT) THEN value END)
           AS p99_disc
FROM ranked
GROUP BY event_type
"""


@register("q_percentile_disc", oracle=_PDISC_ORACLE)
def q_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISCRETE percentiles per group — the quantile that is an actual
    observed value (p50/p90/p99 of event value per type), defined as
    the element at rank ⌈p·n⌉ of the (value, event_id)-ordered group.
    Continuous interpolation (``q_percentiles``) invents values between
    observations; latency-style SLO reporting wants this form instead.

    The explicit rank construction (row_number + one conditional
    aggregate) is executed identically by both engines — no reliance
    on either engine's quantile_disc tie-breaking. One window shuffle
    on the group key, one aggregate; at scale the window partitions by
    group, never globally.
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = e.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )

    def at(p: float, alias: str):
        target = F.ceil(F.lit(p) * F.col("n")).cast("bigint")
        return F.max(F.when(F.col("rn") == target, F.col("value"))).alias(alias)

    return ranked.groupBy("event_type").agg(
        at(0.5, "p50_disc"), at(0.9, "p90_disc"), at(0.99, "p99_disc")
    )


# ---------------------------------------------------------------------------
# x_langid_confusion — classifier evaluation as an operator
# ---------------------------------------------------------------------------


def _langid_confusion_oracle() -> str:
    from .extensions import _LANG_ID_ORACLE

    return f"""
WITH pred AS ({_LANG_ID_ORACLE})
SELECT lang_fixture, lang_pred,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN lang_pred = lang_fixture THEN 1 ELSE 0 END)
            AS DOUBLE) / COUNT(*) AS frac_correct
FROM pred
GROUP BY lang_fixture, lang_pred
"""


@register("x_langid_confusion", oracle=_langid_confusion_oracle())
def x_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the stopword language-ID classifier
    (``x_lang_id``) against the fixture's true labels — classifier
    EVALUATION as a first-class operator, the same evidence pattern as
    ``x_ann_recall``: the driver hash certifies predictions, truth
    join, and the per-cell counts end to end. ``frac_correct`` is 1.0
    on diagonal cells and 0.0 off-diagonal by construction (one IEEE
    division of exact counts), which double-checks the grouping.

    Shape: the classifier is a codegen projection (no shuffle); the
    confusion matrix is one |langs|²-bounded hash aggregate.
    """
    from .extensions import x_lang_id

    pred = x_lang_id(spark, sf_dir)
    return pred.groupBy("lang_fixture", "lang_pred").agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(
                F.when(F.col("lang_pred") == F.col("lang_fixture"), 1).otherwise(0)
            ).cast("double")
            / F.count(F.lit(1))
        ).alias("frac_correct"),
    )
