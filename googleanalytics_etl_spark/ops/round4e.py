"""Round-4 operators, fifth batch: ANN recall certification, corpus
span-duplication profiling, multi-aggregate pivot.

- ``x_ann_recall`` — the evidence an ANN index actually needs: recall
  of the IVF probe path against exact brute force, per query, as a
  driver-hash-certified number (both engines compute BOTH paths and
  the overlap — nothing is asserted, everything is recomputed).
- ``x_span_dup_profile`` — RefinedWeb-style duplicated-span profile:
  per document, the fraction of its 5-gram occurrences that appear in
  at least one OTHER document (corpus-wide duplication pressure, the
  signal behind exact-substring dedup policies).
- ``q_multi_pivot`` — pivot with multiple aggregates per cell
  (count + exact revenue), completing ``q_pivot``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register
from .extensions import cosine

_NQ = 5  # ANN recall query set: vec_id 0.._NQ-1
_TOPK = 10
_PROBES = 5

_ANN_RECALL_ORACLE = f"""
WITH q AS (
    SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
    FROM embeddings WHERE vec_id < {_NQ}
), exact AS (
    SELECT qid, vec_id FROM (
        SELECT q.qid, e.vec_id,
               ROW_NUMBER() OVER (
                   PARTITION BY q.qid
                   ORDER BY ROUND(list_cosine_similarity(
                       CAST(e.embedding AS DOUBLE[]), q.qe), 6) DESC,
                       e.vec_id) AS rn
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> q.qid
    ) WHERE rn <= {_TOPK}
), dims AS (
    SELECT label, s.dim AS dim, AVG(CAST(s.val AS DOUBLE)) AS c
    FROM (SELECT label,
                 unnest(list_transform(embedding,
                     (x, i) -> {{'dim': i, 'val': x}})) AS s
          FROM embeddings)
    GROUP BY label, s.dim
), cent AS (
    SELECT label,
           CAST(list(CAST(c AS FLOAT) ORDER BY dim) AS DOUBLE[]) AS centroid
    FROM dims GROUP BY label
), probes AS (
    SELECT qid, label FROM (
        SELECT q.qid, c.label,
               ROW_NUMBER() OVER (
                   PARTITION BY q.qid
                   ORDER BY ROUND(list_cosine_similarity(c.centroid, q.qe), 6)
                            DESC, c.label) AS rn
        FROM cent c CROSS JOIN q
    ) WHERE rn <= {_PROBES}
), ivf AS (
    SELECT qid, vec_id FROM (
        SELECT q.qid, e.vec_id,
               ROW_NUMBER() OVER (
                   PARTITION BY q.qid
                   ORDER BY ROUND(list_cosine_similarity(
                       CAST(e.embedding AS DOUBLE[]), q.qe), 6) DESC,
                       e.vec_id) AS rn
        FROM embeddings e
        JOIN probes p USING (label)
        JOIN q ON q.qid = p.qid
        WHERE e.vec_id <> q.qid
    ) WHERE rn <= {_TOPK}
)
SELECT x.qid,
       CAST(COUNT(*) AS BIGINT) AS n_exact,
       CAST(COUNT(i.vec_id) AS BIGINT) AS n_overlap,
       CAST(COUNT(i.vec_id) AS DOUBLE) / COUNT(*) AS recall,
       CAST(COUNT(i.vec_id) AS DOUBLE) / COUNT(*) >= 0.5 AS in_bound
FROM exact x
LEFT JOIN ivf i ON i.qid = x.qid AND i.vec_id = x.vec_id
GROUP BY x.qid
"""


def ann_rankings(em: DataFrame) -> dict[str, DataFrame]:
    """The shared ANN audit panel: exact and IVF-probed top-``_TOPK``
    rankings for the ``_NQ``-query panel over an (vec_id, embedding,
    label) frame. Returns ``{"exact": df, "ivf": df}``, each with
    ``(qid, vec_id, sim, rn)`` where rn ≤ _TOPK orders by round-6
    cosine DESC with vec_id tiebreak. ONE definition consumed by both
    evaluation operators — ``x_ann_recall`` (set overlap → recall) and
    ``x_ndcg_eval`` (round6.py — rank-discounted gains → NDCG), whose
    docstrings both promise the identical panel/centroid/probe recipe.
    Centroids round to FLOAT before the cosine; cosines round to 6 dp
    before ranking (the cross-engine determinism recipe)."""
    q = em.where(F.col("vec_id") < _NQ).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )

    def ranked(scored: DataFrame) -> DataFrame:
        w = Window.partitionBy("qid").orderBy(F.desc("sim"), "vec_id")
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= _TOPK)
            .select("qid", "vec_id", "sim", "rn")
        )

    exact = ranked(
        em.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.round(cosine(F.col("embedding"), F.col("qe")), 6).alias("sim"),
        )
    )

    dims = em.select("label", F.posexplode("embedding").alias("dim", "val"))
    cent = (
        dims.groupBy("label", "dim")
        .agg(F.avg("val").alias("c"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("pairs"))
        .select(
            "label",
            F.transform("pairs", lambda p: p["c"].cast("float")).alias("centroid"),
        )
    )
    wp = Window.partitionBy("qid").orderBy(F.desc("csim"), "label")
    probes = (
        cent.crossJoin(F.broadcast(q))
        .select(
            "qid",
            "label",
            F.round(cosine(F.col("centroid"), F.col("qe")), 6).alias("csim"),
        )
        .withColumn("rn", F.row_number().over(wp))
        .where(F.col("rn") <= _PROBES)
        .select("qid", "label")
    )
    ivf = ranked(
        em.join(F.broadcast(probes), "label")
        .join(F.broadcast(q), "qid")
        .where(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.round(cosine(F.col("embedding"), F.col("qe")), 6).alias("sim"),
        )
    )
    return {"exact": exact, "ivf": ivf}


@register("x_ann_recall", oracle=_ANN_RECALL_ORACLE)
def x_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality certification: recall@10 of the IVF probe path
    (``x_sim_knn_ivf``'s construction) against exact brute force
    (``x_sim_knn``'s), for a 5-query panel — the number a 100 TB
    vector-search deployment is actually judged on, computed
    end-to-end inside BOTH engines so the driver hash certifies the
    whole pipeline: exact top-10, centroid build, probe selection,
    IVF top-10, and the overlap.

    Pair space: exact side is |panel| × n (5n — a recall AUDIT on a
    sample, not the serving path); IVF side scans only the probed
    cells. Centroids round to FLOAT before the cosine (absorbs
    summation-order ulps); cosines round to 6 dp before ranking with
    vec_id tiebreak — the established cross-engine determinism recipe.
    """
    em = load(spark, sf_dir, "embeddings")
    panel = ann_rankings(em)
    exact = panel["exact"].select("qid", "vec_id")
    ivf_hit = panel["ivf"].select(
        "qid", F.col("vec_id").alias("ivf_id")
    )
    return (
        exact.join(
            ivf_hit,
            (exact.qid == ivf_hit.qid) & (exact.vec_id == ivf_hit.ivf_id),
            "left",
        )
        .groupBy(exact.qid.alias("qid"))
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.count("ivf_id").alias("n_overlap"),
            (F.count("ivf_id").cast("double") / F.count(F.lit(1))).alias(
                "recall"
            ),
            (
                F.count("ivf_id").cast("double") / F.count(F.lit(1)) >= 0.5
            ).alias("in_bound"),
        )
    )


# ---------------------------------------------------------------------------
# x_span_dup_profile — duplicated-span pressure per document
# ---------------------------------------------------------------------------

_SPAN_ORACLE = """
WITH grams AS (
    SELECT doc_id,
           CAST('0x' || substr(md5(unnest(
               CASE WHEN len(str_split(text, ' ')) >= 5 THEN
                   list_transform(range(len(str_split(text, ' ')) - 4),
                       i -> str_split(text, ' ')[i + 1] || ' ' ||
                            str_split(text, ' ')[i + 2] || ' ' ||
                            str_split(text, ' ')[i + 3] || ' ' ||
                            str_split(text, ' ')[i + 4] || ' ' ||
                            str_split(text, ' ')[i + 5])
               ELSE [text] END)), 1, 15) AS BIGINT) AS h
    FROM documents
), dg AS (
    SELECT doc_id, h, CAST(COUNT(*) AS BIGINT) AS c
    FROM grams GROUP BY doc_id, h
), df AS (
    SELECT h, CAST(COUNT(*) AS BIGINT) AS ndocs FROM dg GROUP BY h
)
SELECT dg.doc_id,
       CAST(SUM(c) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN d.ndocs >= 2 THEN c ELSE 0 END) AS BIGINT)
           AS n_shared,
       CAST(SUM(CASE WHEN d.ndocs >= 2 THEN c ELSE 0 END) AS DOUBLE)
           / SUM(c) AS dup_span_frac
FROM dg JOIN df d USING (h)
GROUP BY dg.doc_id
"""


@register("x_span_dup_profile", oracle=_SPAN_ORACLE)
def x_span_dup_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-span pressure per document: the fraction of a doc's
    5-gram OCCURRENCES that also appear in at least one other document
    — the corpus-level signal behind exact-substring dedup policies
    (RefinedWeb/Gopher drop or trim documents dominated by spans the
    rest of the corpus already contains). Distinct from
    ``x_decontaminate`` (which profiles overlap against a held-out
    benchmark set, not the corpus itself).

    Shape: grams are hashed to 64-bit longs IN the projection, so no
    string gram ever enters a shuffle; occurrences are pre-aggregated
    to (doc, gram-hash) grain before the document-frequency join,
    which then moves only long pairs. All ratios are exact integer
    rationals.
    """
    return span_dup_frame(load(spark, sf_dir, "documents"))


def span_dup_frame(d: DataFrame) -> DataFrame:
    """Library form of :func:`x_span_dup_profile` over any (doc_id,
    text) frame — also the scoring stage of ``x_span_dedup``.

    Skew contract: shared-occurrence counting is computed as
    ``n_shared = n_grams − n_unique`` rather than joining the per-hash
    document frequency back onto the (doc, hash) frame. The direct df
    join has an unfixable hot key at corpus scale — a boilerplate 5-gram
    present in most documents lands all its (doc, hash) rows in one
    shuffle partition. Inverting through the UNIQUE grams removes the
    join entirely: a gram with ndocs = 1 has, by definition, exactly one
    (doc, hash) row, so ``min(doc_id)`` / ``sum(c)`` inside the per-hash
    aggregate (all partial-aggregable — a hot hash collapses map-side)
    already carry its owner and count, and the only remaining join is
    doc-grain ↔ doc-grain (≤1 row per key per side — cannot skew).
    ``dup_span_frac`` divides the same two exact integers as before, so
    the IEEE result is bit-identical to the direct formulation."""
    # The gram hash is ENGINE-INTERNAL (only doc-level counts reach the
    # output), so Spark need not build the gram STRING at all: hash each
    # word once, then xxhash64 the 5 word-hash LONGS per gram — a
    # fixed-width 40-byte hash input instead of a ~25-char concat +
    # variable-length rehash, and each word is hashed once instead of
    # once per overlapping gram. The oracle uses an md5 prefix of the
    # gram string; both sides are injective-up-to-collision maps of the
    # same grams (collision odds ~|grams|²/2⁶⁴), so the df counts agree
    # without the hashes ever matching. xxhash64 over multiple columns
    # is position-sensitive, so "a b" and "b a" stay distinct grams.
    # the word-hash array is materialized through a projection boundary
    # BEFORE the gram lambda references it 5× — inlined, Catalyst would
    # re-evaluate the whole transform(words, xxhash64) per element_at
    hashed_words = d.select(
        "doc_id",
        F.transform(F.split("text", " "), lambda w: F.xxhash64(w)).alias(
            "wh"
        ),
        F.xxhash64(F.col("text")).alias("th"),
    )
    wh = F.col("wh")
    gram_hashes = F.when(
        F.size(wh) >= 5,
        F.transform(
            F.sequence(F.lit(0), F.size(wh) - 5),
            lambda i: F.xxhash64(
                F.element_at(wh, i + 1),
                F.element_at(wh, i + 2),
                F.element_at(wh, i + 3),
                F.element_at(wh, i + 4),
                F.element_at(wh, i + 5),
            ),
        ),
    ).otherwise(F.array(F.col("th")))
    dg = (
        hashed_words.select("doc_id", F.explode(gram_hashes).alias("h"))
        .groupBy("doc_id", "h")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # both branches re-shuffle the SAME (doc_id, h) aggregate: Spark's
    # exchange reuse materializes the explode+pre-agg once (verified in
    # the plan: one ReusedExchange, not a second scan)
    totals = dg.groupBy("doc_id").agg(F.sum("c").alias("n_grams"))
    uniq = (
        dg.groupBy("h")
        .agg(
            F.count(F.lit(1)).alias("ndocs"),
            F.min("doc_id").alias("doc_id"),
            F.sum("c").alias("tot_c"),
        )
        .where(F.col("ndocs") == 1)
        .groupBy("doc_id")
        .agg(F.sum("tot_c").alias("uniq_c"))
    )
    n_shared = F.col("n_grams") - F.coalesce(F.col("uniq_c"), F.lit(0))
    return totals.join(uniq, "doc_id", "left").select(
        "doc_id",
        "n_grams",
        n_shared.cast("bigint").alias("n_shared"),
        (n_shared.cast("double") / F.col("n_grams")).alias("dup_span_frac"),
    )


# ---------------------------------------------------------------------------
# q_multi_pivot — pivot with multiple aggregates per cell
# ---------------------------------------------------------------------------

_MPIVOT_ORACLE = """
SELECT lang,
       CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT)
           AS src0_n,
       CAST(SUM(CASE WHEN source = 'src0' THEN n_chars ELSE 0 END) AS BIGINT)
           AS src0_chars,
       CAST(SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT)
           AS src1_n,
       CAST(SUM(CASE WHEN source = 'src1' THEN n_chars ELSE 0 END) AS BIGINT)
           AS src1_chars,
       CAST(SUM(CASE WHEN source = 'src2' THEN 1 ELSE 0 END) AS BIGINT)
           AS src2_n,
       CAST(SUM(CASE WHEN source = 'src2' THEN n_chars ELSE 0 END) AS BIGINT)
           AS src2_chars
FROM documents
WHERE source IN ('src0', 'src1', 'src2')
GROUP BY lang
"""


@register("q_multi_pivot", oracle=_MPIVOT_ORACLE)
def q_multi_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with MULTIPLE aggregates per cell (doc count + total
    chars per (lang, source)) — one wide matrix in one hash aggregate.
    The explicit value list keeps Catalyst from running a distinct
    pre-job and pins column order; Spark names multi-agg pivot columns
    ``{value}_{alias}``, matched exactly by the oracle aliases.
    """
    d = load(spark, sf_dir, "documents").where(
        F.col("source").isin("src0", "src1", "src2")
    )
    return (
        d.groupBy("lang")
        .pivot("source", ["src0", "src1", "src2"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").alias("chars"),
        )
    )
