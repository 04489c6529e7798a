"""Round-5 pre-work, twelfth batch: hybrid-retrieval fusion and
hard-negative mining.

- ``x_rrf_fusion`` — reciprocal-rank fusion of a LEXICAL ranking (query
  term frequency) and a VECTOR ranking (cosine to the query embedding):
  RRF(d) = Σ 1/(60 + rank_i(d)) — the standard hybrid-search combiner
  (rank-space, so the two scores need no calibration against each
  other). Lexical rank is pure integer; vector rank is round-6 cosine;
  both carry unique tiebreaks, so the fused ordering is bit-exact
  cross-engine.
- ``x_hard_negatives`` — contrastive-training pair mining: for every
  vector, the most-similar vector with a DIFFERENT label inside its
  coarse cluster (the IVF cell from :func:`seed_assign`). In-batch
  random negatives are mostly easy; the near-but-wrong neighbors are
  what sharpen an embedding model — and restricting the search to the
  cluster keeps the pair space Σ|cell|², the same bound as SemDeDup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register
from .round5b import ivf_oracle_ctes, seed_assign


# ---------------------------------------------------------------------------
# x_rrf_fusion — lexical ⊕ vector hybrid ranking
# ---------------------------------------------------------------------------

_RRF_K = 60
_QUERY_TERMS = ("table", "sort", "value")

_RRF_ORACLE = f"""
WITH lex AS (
    SELECT doc_id,
           CAST(len(list_filter(string_split(text, ' '),
                    t -> t IN ('table', 'sort', 'value'))) AS BIGINT) AS tf
    FROM documents
), lrank AS (
    SELECT doc_id, tf,
           CAST(ROW_NUMBER() OVER (ORDER BY tf DESC, doc_id) AS BIGINT) AS r1
    FROM lex
), q AS (
    SELECT CAST(embedding AS DOUBLE[]) AS qemb FROM embeddings WHERE vec_id = 0
), vrank AS (
    SELECT vec_id AS doc_id,
           CAST(ROW_NUMBER() OVER (
               ORDER BY ROUND(list_cosine_similarity(
                   CAST(embedding AS DOUBLE[]), qemb), 6) DESC, vec_id)
               AS BIGINT) AS r2
    FROM embeddings, q
)
SELECT doc_id, tf, r1, r2,
       ROUND(1.0 / ({_RRF_K} + r1) + 1.0 / ({_RRF_K} + r2), 6) AS rrf
FROM lrank JOIN vrank USING (doc_id)
ORDER BY rrf DESC, doc_id
LIMIT 20
"""


@register("x_rrf_fusion", oracle=_RRF_ORACLE)
def x_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: fuse the lexical ranking (frequency of the
    query terms {table, sort, value}) with the vector ranking (cosine
    to the query embedding, vec 0) by reciprocal-rank fusion with
    k = 60 — the calibration-free combiner hybrid search engines use,
    since ranks (not raw scores) are comparable across scorers.

    Each ranking is a global ROW_NUMBER over a tiny projected frame
    (tf is one in-array count per doc; cosine is one fold per doc
    against the broadcast query vector) — at corpus scale both become
    the :func:`global_rank` range-exchange recipe; the fusion join is
    keyed on doc_id and the top-20 is a TakeOrdered. The doc↔vector id
    identity is the ``x_doc_join`` contract.
    """
    d = load(spark, sf_dir, "documents")
    terms = F.array(*[F.lit(t) for t in _QUERY_TERMS])
    lex = d.select(
        "doc_id",
        F.size(
            F.filter(
                F.split("text", " "), lambda t: F.array_contains(terms, t)
            )
        )
        .cast("long")
        .alias("tf"),
    )
    w1 = Window.orderBy(F.col("tf").desc(), "doc_id")
    lrank = lex.withColumn("r1", F.row_number().over(w1).cast("long"))
    em = load(spark, sf_dir, "embeddings")
    q = em.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qemb")
    )
    from .extensions import cosine

    scored = em.crossJoin(F.broadcast(q)).select(
        F.col("vec_id").alias("doc_id"),
        F.round(cosine(F.col("embedding"), F.col("qemb")), 6).alias("sim"),
    )
    w2 = Window.orderBy(F.col("sim").desc(), "doc_id")
    vrank = scored.withColumn("r2", F.row_number().over(w2).cast("long")).select(
        "doc_id", "r2"
    )
    rrf = F.round(
        1.0 / (_RRF_K + F.col("r1")) + 1.0 / (_RRF_K + F.col("r2")), 6
    )
    return (
        lrank.join(vrank, "doc_id")
        .select("doc_id", "tf", "r1", "r2", rrf.alias("rrf"))
        .orderBy(F.col("rrf").desc(), "doc_id")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# x_hard_negatives — nearest different-label neighbor per cluster
# ---------------------------------------------------------------------------

_HARDNEG_ORACLE = f"""
WITH em AS (
    SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
){ivf_oracle_ctes()}, aug AS (
    SELECT e.vec_id, e.label, e.emb, a.cluster
    FROM em e JOIN assign a USING (vec_id)
), pairs AS (
    SELECT a.vec_id, a.label, b.vec_id AS neg_id, b.label AS neg_label,
           ROUND(list_cosine_similarity(a.emb, b.emb), 6) AS sim,
           ROW_NUMBER() OVER (
               PARTITION BY a.vec_id
               ORDER BY ROUND(list_cosine_similarity(a.emb, b.emb), 6) DESC,
                        b.vec_id) AS rn
    FROM aug a
    JOIN aug b ON a.cluster = b.cluster
              AND a.vec_id <> b.vec_id AND a.label <> b.label
)
SELECT vec_id, label, neg_id, neg_label, sim
FROM pairs WHERE rn = 1
"""


@register("x_hard_negatives", oracle=_HARDNEG_ORACLE)
def x_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: each vector's
    most-similar DIFFERENT-label neighbor within its coarse cluster
    (the :func:`seed_assign` IVF cell) — near-but-wrong examples, the
    ones that actually move an embedding model. Random in-batch
    negatives are mostly trivial; mining replaces them with the top of
    the confusion frontier.

    The candidate space is Σ|cell|² over the **k = ⌈√n⌉** Lloyd-refined
    :func:`ivf_seeds` cells (≈ n^1.5 at any corpus size — like
    SemDeDup, a fixed cell count would degenerate to n²/k); the
    per-anchor election is a window group-limit over the pair frame,
    and the pair cosine costs ONE dot fold thanks to the norms hoisted
    by the shared assignment. Anchors whose cell is label-pure have no
    in-cell negative and are (correctly) absent.
    """
    em = load(spark, sf_dir, "embeddings").select("vec_id", "embedding", "label")
    assign = seed_assign(em)
    a = assign.select(
        "cluster",
        F.col("vec_id").alias("a_id"),
        F.col("label").alias("a_label"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    b = assign.select(
        "cluster",
        F.col("vec_id").alias("neg_id"),
        F.col("label").alias("neg_label"),
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
    pairs = (
        a.join(b, "cluster")
        .where(
            (F.col("a_id") != F.col("neg_id"))
            & (F.col("a_label") != F.col("neg_label"))
        )
        .select(
            F.col("a_id").alias("vec_id"),
            F.col("a_label").alias("label"),
            "neg_id",
            "neg_label",
            F.round(dot / (F.col("na") * F.col("nb")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), "neg_id")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "label", "neg_id", "neg_label", "sim")
    )
