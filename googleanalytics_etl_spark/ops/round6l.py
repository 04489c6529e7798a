"""Round-6 batch 12: dup-cluster census, mixture bias, quality×dup.

- ``x_cc_sizes`` — the duplicate-cluster size census: histogram of
  connected-component sizes over the verified near-dup graph. A
  healthy crawl shows pairs and small stars; a heavy tail (one
  500-member component) means boilerplate the pairwise dedup keys
  can't see — this is the chart that catches it.
- ``x_length_bias_audit`` — doc-share vs token-share per source: a
  source contributing 5% of documents but 40% of tokens dominates
  training far beyond its sampling weight; the bias ratio is the
  correction factor a token-budgeted mixture needs.
- ``x_quality_vs_dup`` — the quality × duplication cross-tab: whether
  duplicated content is disproportionately low-quality (usually yes —
  boilerplate), which decides if dedup alone recovers most of the
  quality filter's yield.

Reference parity: no analogue [REF-UNVERIFIED — /root/reference is
empty]; SURVEY §2.J-M dedup/curation extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

# ---------------------------------------------------------------------------
# x_cc_sizes — cluster size histogram
# ---------------------------------------------------------------------------


def _cc_sizes_oracle() -> str:
    from .extensions import _DEDUP_CLUSTERS_ORACLE

    return f"""
SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
       CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM ({_DEDUP_CLUSTERS_ORACLE}) t
GROUP BY cluster_size
"""


@register("x_cc_sizes", oracle=_cc_sizes_oracle())
def x_cc_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster size census: for every component size in the
    transitive near-dup closure (``x_dedup_clusters``'s frame — docs
    that appear in at least one verified pair), the number of clusters
    and docs at that size. Pairs dominate a healthy corpus; the tail
    of this histogram is the boilerplate alarm — a single size-500
    component is 499 deletions ``x_dedup_near_survivors`` will make
    from content a pairwise threshold sweep would never flag as a
    problem.

    Scale shape: everything heavy is the clusters pipeline itself
    (banded LSH pairs, (id, label)-only min-label rounds — see
    x_dedup_clusters); this key adds ONE aggregate at (cluster_size)
    grain whose input is the |clustered docs|-row label frame and whose
    output is ≤ |distinct sizes| metadata rows.
    """
    from .extensions import x_dedup_clusters

    clusters = x_dedup_clusters(spark, sf_dir)
    return clusters.groupBy(F.col("cluster_size").cast("long").alias("cluster_size")).agg(
        F.countDistinct("cluster_id").cast("long").alias("n_clusters"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )


# ---------------------------------------------------------------------------
# x_length_bias_audit — doc share vs token share per source
# ---------------------------------------------------------------------------

_LENGTH_BIAS_ORACLE = """
WITH per_source AS (
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(str_split(text, ' '))) AS BIGINT) AS n_tokens
    FROM documents GROUP BY source
)
SELECT source, n_docs, n_tokens,
       ROUND(CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER (), 6) AS doc_share,
       ROUND(CAST(n_tokens AS DOUBLE) / SUM(n_tokens) OVER (), 6)
           AS token_share,
       ROUND((CAST(n_tokens AS DOUBLE) / SUM(n_tokens) OVER ())
             / (CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER ()), 6)
           AS bias_ratio
FROM per_source
"""


@register("x_length_bias_audit", oracle=_LENGTH_BIAS_ORACLE)
def x_length_bias_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bias audit: per source, its share of DOCUMENTS vs its
    share of TOKENS and the ratio between them. Doc-level sampling
    (``x_stratified_sample``) weights sources by doc share, but
    training cost is token share — a bias_ratio of 3 means the source
    consumes 3× the compute its sampling weight suggests, and the
    token-budget allocator (``x_token_budget``) should cap it.

    Scale shape: one scan with row-local token counts into ONE
    map-combined source-grain aggregate; the share windows run over
    the |sources|-row POST-AGGREGATION frame (metadata scale — the
    single partition holds ~10 rows at any corpus size). Totals and
    counts are exact integers; each share is one identical double
    division on both engines.
    """
    d = load(spark, sf_dir, "documents")
    per_source = (
        d.select("source", F.size(F.split("text", " ")).alias("toks"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("toks").cast("long").alias("n_tokens"),
        )
    )
    w = Window.partitionBy()
    doc_share = F.col("n_docs").cast("double") / F.sum("n_docs").over(w)
    token_share = F.col("n_tokens").cast("double") / F.sum("n_tokens").over(w)
    return per_source.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(doc_share, 6).alias("doc_share"),
        F.round(token_share, 6).alias("token_share"),
        F.round(token_share / doc_share, 6).alias("bias_ratio"),
    )


# ---------------------------------------------------------------------------
# x_quality_vs_dup — quality quartile × duplication cross-tab
# ---------------------------------------------------------------------------

# quality = the x_quality_score blend (length + stopword density),
# duplication = exact-digest multiplicity over the planted corpus
# (doc_id < 10 copied at +10⁶, so the dup column is populated at any
# SF). Buckets are VALUE quartiles (⌊4q⌋ clamped) — no global rank.
_QUALITY_VS_DUP_ORACLE = """
WITH corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, text
    FROM documents WHERE doc_id < 10
), f AS (
    SELECT md5(text) AS digest,
           CAST(len(str_split(text, ' ')) AS BIGINT) AS n_words,
           CAST(len(list_intersect(list_distinct(str_split(text, ' ')),
                ['the','a','of','and','to'])) AS DOUBLE)
               / len(list_distinct(str_split(text, ' '))) AS stop_ratio
    FROM corpus
), q AS (
    SELECT digest,
           ROUND(LEAST(n_words / 200.0, 1.0) * 0.5 + stop_ratio * 0.5, 6)
               AS quality
    FROM f
), d AS (
    SELECT digest, COUNT(*) AS c FROM q GROUP BY digest
)
SELECT CAST(LEAST(CAST(FLOOR(quality * 4) AS INT), 3) AS BIGINT) AS q_bucket,
       CAST(CASE WHEN d.c > 1 THEN 1 ELSE 0 END AS BIGINT) AS is_dup,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(CAST(SUM(CAST(quality AS DECIMAL(18,8))) AS DOUBLE)
             / COUNT(*), 6) AS mean_quality
FROM q JOIN d USING (digest)
GROUP BY 1, 2
"""


@register("x_quality_vs_dup", oracle=_QUALITY_VS_DUP_ORACLE)
def x_quality_vs_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality × duplication cross-tab: docs bucketed by quality-score
    value quartile (the ``x_quality_score`` blend) crossed with whether
    their exact digest is duplicated in the corpus, with per-cell
    counts and mean quality. If the duplicated mass concentrates in the
    low-quality buckets, dedup is doing double duty as a quality filter
    and the pipeline can relax the score threshold (or vice versa) —
    the interaction this table makes visible.

    Scale shape: quality and digest are row-local; duplication needs
    one digest-grain count aggregate and one digest-keyed join back
    (16-byte keys, never text); the cross-tab is a ≤ 8-row aggregate.
    Value-bucket quartiles avoid the global sort a rank-quartile would
    need — the cutpoints are fixed, which also makes the table
    comparable across corpus snapshots.
    """
    from .extensions import _lang_scores

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    dup = d.where(F.col("doc_id") < 10).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    corpus = d.unionByName(dup)
    words = F.split("text", " ")
    uniq = F.array_distinct(words)
    stop_ratio = _lang_scores(uniq)["en"].cast("double") / F.size(uniq)
    quality = F.round(
        F.least(F.size(words).cast("long") / 200.0, F.lit(1.0)) * 0.5
        + stop_ratio * 0.5,
        6,
    )
    q = corpus.select(
        F.md5(F.col("text").cast("binary")).alias("digest"),
        quality.alias("quality"),
    )
    counts = q.groupBy("digest").agg(F.count(F.lit(1)).alias("c"))
    bucket = F.least(F.floor(F.col("quality") * 4).cast("int"), F.lit(3))
    return (
        q.join(counts, "digest")
        .groupBy(
            bucket.cast("long").alias("q_bucket"),
            (F.col("c") > 1).cast("long").alias("is_dup"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(
                F.sum(F.col("quality").cast("decimal(18,8)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_quality"),
        )
    )
