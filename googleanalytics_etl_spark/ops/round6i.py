"""Round-6 batch 9: product quantization and the dataset card.

- ``x_pq_quantize`` — product quantization (PQ): the embedding space
  split into 2 subspaces of 32 dims, each quantized by its own k = 4
  Lloyd codebook (2 iterations, deterministic init), every vector
  mapped to its (code_a, code_b) cell with its total reconstruction
  error. PQ is THE memory layout for 100 TB ANN — 64 floats (256 B)
  compress to 2 code bytes + shared codebooks, and asymmetric distance
  scans run on code lookup tables; this key certifies the codebook
  training and the assignment end-to-end against DuckDB.
- ``x_dataset_card`` — the one-row corpus summary a training-data
  release ships (dataset card): doc/source/lang counts, token totals
  and means, short-doc share, exact-duplicate rate, and the sorted
  language list — one scan, one aggregate.

Reference parity: no analogue [REF-UNVERIFIED — /root/reference is
empty]; SURVEY §2.J-M vectors + curation extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

_PQ_K = 4          # codewords per subspace
_PQ_ITERS = 2      # Lloyd iterations per subspace
_PQ_SUB = 32       # dims per subspace (embedding dim 64 = 2 × 32)


def _pq_subspace_ctes(tag: str, lo: int, hi: int) -> str:
    """The 2-iteration Lloyd chain for one subspace (1-based dims
    (lo, hi]) — the x_kmeans oracle recipe (round4d.py) parameterized
    by dim range and key count. Ends at ``a_{tag}{_PQ_ITERS}``."""
    assign = """
, a_{t}{i} AS (
    SELECT vec_id, cluster, dist_r FROM (
        SELECT v.vec_id, c.cluster,
               ROUND(SUM((v.val - c.cval) * (v.val - c.cval)), 6) AS dist_r,
               ROW_NUMBER() OVER (
                   PARTITION BY v.vec_id
                   ORDER BY ROUND(SUM((v.val - c.cval) * (v.val - c.cval)), 6),
                            c.cluster) AS rn
        FROM v_{t} v JOIN c_{t}{p} c ON v.dim = c.dim
        GROUP BY v.vec_id, c.cluster
    ) WHERE rn = 1
)"""
    update = """
, c_{t}{i} AS (
    SELECT a.cluster, v.dim,
           CAST(SUM(CAST(ROUND(v.val * 10000000) AS BIGINT)) AS DOUBLE)
               / COUNT(*) / 10000000 AS cval
    FROM v_{t} v JOIN a_{t}{i} a ON a.vec_id = v.vec_id
    GROUP BY a.cluster, v.dim
)"""
    sql = f"""
, v_{tag} AS (
    SELECT vec_id, dim, val FROM v WHERE dim > {lo} AND dim <= {hi}
), c_{tag}0 AS (
    SELECT vec_id AS cluster, dim, val AS cval
    FROM v_{tag} WHERE vec_id < {_PQ_K}
)"""
    for i in range(1, _PQ_ITERS + 1):
        sql += assign.format(t=tag, i=i, p=i - 1)
        if i < _PQ_ITERS:
            sql += update.format(t=tag, i=i)
    return sql


def _pq_oracle() -> str:
    return f"""
WITH v AS (
    SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
           CAST(unnest(embedding) AS DOUBLE) AS val
    FROM embeddings
){_pq_subspace_ctes("a", 0, _PQ_SUB)}{_pq_subspace_ctes("b", _PQ_SUB, 2 * _PQ_SUB)}
SELECT CAST(a.cluster AS BIGINT) AS code_a,
       CAST(b.cluster AS BIGINT) AS code_b,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       ROUND(CAST(SUM(CAST(a.dist_r + b.dist_r AS DECIMAL(18,8)))
                  AS DOUBLE) / COUNT(*), 6) AS mean_err
FROM a_a{_PQ_ITERS} a JOIN a_b{_PQ_ITERS} b USING (vec_id)
GROUP BY 1, 2
"""


def pq_model(e: DataFrame) -> tuple[DataFrame, list[dict[int, list[float]]]]:
    """Train the 2-subspace PQ codebooks (k = ``_PQ_K``, ``_PQ_ITERS``
    Lloyd iterations, init = subvectors of vec_id 0..k−1) and return
    (assigned frame, final codebooks). The assigned frame carries
    (vec_id, embedding, code_a, dist_a, code_b, dist_b). Shared by
    ``x_pq_quantize`` (cell report) and ``x_adc_scan`` (ADC top-k)."""
    dbl = lambda c: c.cast("double")  # noqa: E731

    init = e.where(F.col("vec_id") < _PQ_K).orderBy("vec_id").collect()
    books: list[dict[int, list[float]]] = [
        {
            r["vec_id"]: [float(x) for x in r["embedding"]][
                s * _PQ_SUB : (s + 1) * _PQ_SUB
            ]
            for r in init
        }
        for s in range(2)
    ]

    def argmin(sub_col, book: dict[int, list[float]]):
        cands = F.array(
            *[
                F.struct(
                    F.round(
                        F.aggregate(
                            F.zip_with(
                                sub_col,
                                F.array(*[F.lit(x) for x in book[j]]),
                                lambda x, y: (dbl(x) - y) * (dbl(x) - y),
                            ),
                            F.lit(0.0),
                            lambda acc, x: acc + x,
                        ),
                        6,
                    ).alias("dist_r"),
                    F.lit(j).cast("long").alias("code"),
                )
                for j in sorted(book)
            ]
        )
        return F.array_min(cands)

    sub = [
        F.slice("embedding", 1, _PQ_SUB),
        F.slice("embedding", _PQ_SUB + 1, _PQ_SUB),
    ]
    scaled = F.transform(
        "embedding", lambda x: F.round(dbl(x) * 10_000_000).cast("long")
    )
    for it in range(1, _PQ_ITERS + 1):
        best = [argmin(sub[s], books[s]) for s in range(2)]
        assigned = e.select(
            "vec_id",
            "embedding",
            best[0]["code"].alias("code_a"),
            best[0]["dist_r"].alias("dist_a"),
            best[1]["code"].alias("code_b"),
            best[1]["dist_r"].alias("dist_b"),
        )
        if it == _PQ_ITERS:
            return assigned, books
        # update: ONE pass — posexplode the scaled dims, route each dim
        # to its subspace's code, aggregate exact sums (256 rows out)
        sums = (
            assigned.select(
                "code_a", "code_b", F.posexplode(scaled).alias("dim", "sv")
            )
            .select(
                (F.col("dim") >= _PQ_SUB).cast("int").alias("s"),
                F.when(F.col("dim") < _PQ_SUB, F.col("code_a"))
                .otherwise(F.col("code_b"))
                .alias("code"),
                (F.col("dim") % _PQ_SUB).alias("sdim"),
                "sv",
            )
            .groupBy("s", "code", "sdim")
            .agg(F.sum("sv").alias("sum_sv"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new_books: list[dict[int, list[float]]] = [{}, {}]
        for r in sums:
            new_books[r["s"]].setdefault(r["code"], [0.0] * _PQ_SUB)[
                r["sdim"]
            ] = float(r["sum_sv"]) / r["n"] / 10_000_000
        books = new_books
    raise AssertionError("unreachable")


@register("x_pq_quantize", oracle=_pq_oracle())
def x_pq_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization of the embedding corpus: 2 subspaces × 32
    dims, k = 4 codewords each, 2 Lloyd iterations (init = subvectors
    of vec_id 0..3), then every vector's (code_a, code_b) cell with the
    cell population and mean total reconstruction error (sum of the two
    per-subspace squared distances). The 4×4 = 16-cell product codebook
    is the compressed representation an ADC scan probes.

    Scale shape — the x_kmeans contract, doubled: codebooks live on the
    driver as k×(d/2) literal arrays folded into whole-stage codegen,
    so BOTH subspace argmins run in the SAME single pass over the
    vectors (no join between subspaces — codes are row-local); each
    update is one map-combined (subspace, code, dim) aggregate of
    exact scaled-long sums (2·k·d/2 = 256 metadata rows collected).
    The output is ≤ k² cells. Training at 100 TB runs on a hash-sampled
    slice exactly like IVF seeding; assignment stays one codegen scan.

    Cross-engine determinism: the x_kmeans recipe — exact scaled-long
    centroid means, 6-dp-rounded distances BEFORE the argmin with the
    code id as tiebreaker, per-term DECIMAL(18,8) quantization of the
    (already-rounded) error sums.
    """
    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    assigned, _ = pq_model(e)
    err = F.col("dist_a") + F.col("dist_b")
    return (
        assigned.groupBy("code_a", "code_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.round(
                F.sum(err.cast("decimal(18,8)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_err"),
        )
    )


# ---------------------------------------------------------------------------
# x_dataset_card — one-row corpus summary
# ---------------------------------------------------------------------------

_DATASET_CARD_ORACLE = """
WITH base AS (
    SELECT source, lang,
           len(str_split(text, ' ')) AS toks,
           md5(text) AS digest
    FROM documents
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(SUM(toks) AS BIGINT) AS total_tokens,
       ROUND(CAST(SUM(toks) AS DOUBLE) / COUNT(*), 6) AS mean_doc_tokens,
       ROUND(CAST(SUM(CASE WHEN toks < 20 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS pct_short,
       ROUND(1 - CAST(COUNT(DISTINCT digest) AS DOUBLE) / COUNT(*), 6)
           AS exact_dup_rate,
       string_agg(DISTINCT lang, ',' ORDER BY lang) AS langs
FROM base
"""


@register("x_dataset_card", oracle=_DATASET_CARD_ORACLE)
def x_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset card: the one-row summary a corpus release ships —
    document/source/language counts, whitespace-token totals and mean,
    the share of sub-20-token docs (the truncation-risk tail), the
    exact-duplicate rate (1 − distinct digests / docs), and the sorted
    language list. This is the header every downstream consumer reads
    before deciding mixture weights (``x_token_budget``) or dedup
    effort (``x_dup_trend``).

    Scale shape: one scan computing row-local token counts and md5
    digests, then ONE aggregate. The three COUNT(DISTINCT)s expand the
    aggregate 4-way (Spark's Expand operator) but each leg shuffles
    only (16-byte digest | short string) keys with map-side partial
    dedup; output is a single row. langs renders as a sorted CSV
    string (never an array column — the driver's pandas canonicalizer
    rejects list cells).
    """
    d = load(spark, sf_dir, "documents")
    base = d.select(
        "source",
        "lang",
        F.size(F.split("text", " ")).alias("toks"),
        F.md5(F.col("text").cast("binary")).alias("digest"),
    )
    n = F.count(F.lit(1))
    return base.agg(
        n.cast("long").alias("n_docs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.sum("toks").cast("long").alias("total_tokens"),
        F.round(F.sum("toks").cast("double") / n, 6).alias("mean_doc_tokens"),
        F.round(
            F.sum(F.when(F.col("toks") < 20, 1).otherwise(0)).cast("double")
            / n,
            6,
        ).alias("pct_short"),
        F.round(1 - F.countDistinct("digest").cast("double") / n, 6).alias(
            "exact_dup_rate"
        ),
        F.array_join(F.array_sort(F.collect_set("lang")), ",").alias("langs"),
    )
