"""Round-6 batch 6: weighted similarity and boilerplate density.

- ``x_weighted_jaccard`` — inverse-df-weighted Jaccard over the LSH
  candidate pairs: rare shingles dominate the score, so two documents
  that share distinctive content rank above two that merely share
  boilerplate — the weighting every serious near-dup verifier applies
  once a corpus has templates. Weights are exact rationals (1/df,
  DECIMAL(18,8)-quantized), no logarithm in the oracle-visible path.
- ``x_boilerplate_score`` — per-document template density: the share
  of the document's distinct shingles that are corpus-common
  (df ≥ max(2, N/10)) — the C4/Gopher-style page-quality dial that
  flags navigation/footer-dominated pages before near-dedup wastes
  candidates on them.

Reference parity: no analogue [REF-UNVERIFIED — /root/reference is
empty]; extends the dedup/text-quality families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

# ---------------------------------------------------------------------------
# x_weighted_jaccard — inverse-df-weighted verification of LSH candidates
# ---------------------------------------------------------------------------

_WEIGHTED_JACCARD_ORACLE = """
WITH corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, text
    FROM documents WHERE doc_id < 10
), {ctes}, df AS (
    SELECT h, COUNT(*) AS df
    FROM (SELECT doc_id, unnest(hsig) AS h FROM hset)
    GROUP BY h
), pairh AS (
    SELECT c.doc_a, c.doc_b, u.h,
           list_contains(a.hsig, u.h) AND list_contains(b.hsig, u.h)
               AS in_both
    FROM cand c
    JOIN hset a ON a.doc_id = c.doc_a
    JOIN hset b ON b.doc_id = c.doc_b,
    unnest(list_distinct(list_concat(a.hsig, b.hsig))) u(h)
), weighted AS (
    SELECT p.doc_a, p.doc_b,
           SUM(CASE WHEN p.in_both
                    THEN CAST(1.0 / d.df AS DECIMAL(18,8))
                    ELSE CAST(0 AS DECIMAL(18,8)) END) AS w_min,
           SUM(CAST(1.0 / d.df AS DECIMAL(18,8))) AS w_max
    FROM pairh p JOIN df d ON d.h = p.h
    GROUP BY p.doc_a, p.doc_b
)
SELECT w.doc_a, w.doc_b, v.jaccard,
       ROUND(CAST(w.w_min AS DOUBLE) / CAST(w.w_max AS DOUBLE), 6)
           AS wjaccard
FROM weighted w
JOIN verified v ON v.doc_a = w.doc_a AND v.doc_b = w.doc_b
"""


def _weighted_jaccard_oracle() -> str:
    from .extensions import _NEAR_CTES

    return _WEIGHTED_JACCARD_ORACLE.format(ctes=_NEAR_CTES.strip())


@register("x_weighted_jaccard", oracle=_weighted_jaccard_oracle())
def x_weighted_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-df-weighted Jaccard beside the plain one for every LSH
    candidate pair: w(h) = 1/df(h), weighted J = Σ_min w / Σ_union w.
    A pair sharing only corpus-common shingles (templates, navigation)
    scores near the common shingles' tiny weights; a pair sharing RARE
    content scores high even when boilerplate padding drags the
    unweighted Jaccard down — the ranking a template-heavy corpus needs
    before trusting a single threshold.

    Weights avoid logarithms entirely (cross-engine log differs in the
    last ulp): 1/df is one identical IEEE division on both engines,
    DECIMAL(18,8)-quantized per term, summed exactly — the x_psi_drift
    order-independence recipe.

    Scale shape: candidates come from the banded LSH plan (pair space
    bounded by the bands); the per-pair union explode is |pairs| ×
    ~|shingles| scalar rows; the df join keys on the shingle hash with
    occurrence count bounded by 2·|pairs| per hash. The df table is a
    (hash, count) aggregate with map-side partials — the same inverted
    index x_containment and x_ngram_jaccard already build.
    """
    from .extensions import _minhash_parts

    parts = _minhash_parts(spark, sf_dir)
    hsig = parts["hsig"]
    scored = parts["scored"]

    # Weighted-union algebra (guide §2.3, shuffle fewer bytes):
    # Σ_{h∈A∪B} w = W(A) + W(B) − Σ_{h∈A∩B} w EXACTLY — every term is
    # the same DECIMAL(18,8)-quantized w(h) on both sides, and decimal
    # sums are exact — so the per-pair explode shrinks from the UNION
    # (every shingle of both docs, ~650k rows at sf0.1) to the
    # INTERSECTION (near-zero for non-dup candidates), and the per-doc
    # weight totals W(doc) are computed once at DOC grain on the same
    # inverted index the df aggregate already builds.
    e = hsig.select("doc_id", F.explode("hsig").alias("h"))
    w = (F.lit(1.0) / F.col("df")).cast("decimal(18,8)")
    hw = (
        e.groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .select("h", w.alias("w"))
    )
    docw = e.join(hw, "h").groupBy("doc_id").agg(F.sum("w").alias("wsum"))
    sigw = hsig.join(docw, "doc_id")
    s1 = sigw.select(
        F.col("doc_id").alias("doc_a"),
        F.col("hsig").alias("sh_a"),
        F.col("wsum").alias("w_a"),
    )
    s2 = sigw.select(
        F.col("doc_id").alias("doc_b"),
        F.col("hsig").alias("sh_b"),
        F.col("wsum").alias("w_b"),
    )
    zero = F.lit(0).cast("decimal(18,8)")
    inter = (
        scored.join(s1, "doc_a")
        .join(s2, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "jaccard",
            "w_a",
            "w_b",
            # outer: a candidate pair with an EMPTY intersection must
            # still emit its row (w_min = 0), as the union form did
            F.explode_outer(F.array_intersect("sh_a", "sh_b")).alias("h"),
        )
    )
    return (
        inter.join(hw, "h", "left")
        .groupBy("doc_a", "doc_b", "jaccard", "w_a", "w_b")
        .agg(F.sum(F.coalesce(F.col("w"), zero)).alias("w_min"))
        .select(
            "doc_a",
            "doc_b",
            "jaccard",
            F.round(
                F.col("w_min").cast("double")
                / (F.col("w_a") + F.col("w_b") - F.col("w_min")).cast(
                    "double"
                ),
                6,
            ).alias("wjaccard"),
        )
    )


# ---------------------------------------------------------------------------
# x_boilerplate_score — per-document template density
# ---------------------------------------------------------------------------

_BOILERPLATE_ORACLE = """
WITH corpus AS (
    SELECT doc_id, text FROM documents
), sh AS (
    SELECT doc_id,
           list_distinct(CASE WHEN len(str_split(text, ' ')) >= 3 THEN
               list_transform(range(len(str_split(text, ' ')) - 2),
                   i -> str_split(text, ' ')[i + 1] || ' ' ||
                        str_split(text, ' ')[i + 2] || ' ' ||
                        str_split(text, ' ')[i + 3])
               ELSE [text] END) AS shingles
    FROM corpus
), flat AS (
    SELECT doc_id,
           CAST('0x' || substr(md5(unnest(shingles)), 1, 8) AS BIGINT) AS h
    FROM sh
), df AS (
    SELECT h, COUNT(*) AS df FROM flat GROUP BY h
)
SELECT f.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN d.df >= 5 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_common,
       ROUND(CAST(SUM(CASE WHEN d.df >= 5 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS boilerplate_share
FROM flat f JOIN df d ON d.h = f.h
GROUP BY f.doc_id
"""


@register("x_boilerplate_score", oracle=_BOILERPLATE_ORACLE)
def x_boilerplate_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document template density: the share of a document's
    DISTINCT word-3-gram shingles that are corpus-common (df ≥ 5
    documents — the same min_df floor as ``x_freq_prune_vocab``, and a
    band the fixture's df distribution actually exercises: max df ≈ 9).
    Navigation bars, footers and legal boilerplate repeat across a
    crawl source; a page whose shingles are mostly corpus-common
    carries little original content — the C4/Gopher-style quality dial
    applied BEFORE near-dedup so template pages don't flood the
    candidate generator. At production corpus sizes the threshold is a
    config (absolute df or a df/N band); the fixed fixture value keeps
    the oracle engine-exact.

    Scale shape: shingle hashes are row-local (the x_dedup_near
    Kirsch-Mitzenmacher halves, first 32 bits); df is one (hash, count)
    map-combined aggregate; the doc-grain recount joins the flat
    (doc, hash) frame — distinct-shingle grain, bounded — back to df on
    the hash. The threshold compares exact BIGINTs on both engines.
    Same inverted-index shape as x_containment, df-capped by
    construction (the join carries the df VALUE, never a per-hash row
    expansion).
    """
    d = load(spark, sf_dir, "documents")
    from .extensions import word_shingles

    flat = (
        d.select("doc_id", F.split("text", " ").alias("words"))
        .select("doc_id", word_shingles(F.col("words")).alias("shingles"))
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    "shingles",
                    lambda s: F.conv(
                        F.substring(F.md5(s.cast("binary")), 1, 8), 16, 10
                    ).cast("long"),
                )
            ).alias("h"),
        )
    )
    dfreq = flat.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    common = F.col("df") >= 5
    return (
        flat.join(dfreq, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum(F.when(common, 1).otherwise(0))
            .cast("long")
            .alias("n_common"),
            F.round(
                F.sum(F.when(common, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("boilerplate_share"),
        )
    )
