"""Round-6 batch 8: MinHash estimator certification and crawl dup trend.

- ``x_minhash_accuracy`` — certifies the MinHash ESTIMATOR itself:
  for every LSH candidate pair, the signature-agreement estimate
  (matching components / 16) against the exact hashed-shingle Jaccard,
  aggregated into similarity bands. ``x_dedup_eval`` certifies the
  pipeline's precision/recall and ``x_lsh_tuning`` sweeps banding
  shapes; this key closes the remaining gap — how well the signatures
  a production run actually stores approximate the similarity they
  stand in for (the number that decides whether 16 hashes suffice or
  the corpus needs 64).
- ``x_dup_trend`` — incremental-crawl duplicate trend: with a
  deterministic crawl-day partition, elect each content digest's
  first-seen occurrence and report per-day new/duplicate counts, the
  duplicate rate, and the cumulative distinct-corpus size — the
  day-over-day health chart a crawl pipeline watches to detect a
  stalled frontier (dup_rate → 1) or an exploding one.

Reference parity: no analogue [REF-UNVERIFIED — /root/reference is
empty]; SURVEY §2.J-M dedup-family extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

# ---------------------------------------------------------------------------
# x_minhash_accuracy — signature-agreement estimate vs exact Jaccard
# ---------------------------------------------------------------------------

# Built on the shared _NEAR_CTES chain (extensions.py): `verified` holds
# every LSH candidate pair with its exact hashed-shingle Jaccard
# (ROUND 6 — bit-identical cross-engine), `sigs` the 16 KM signatures.
# est = matches/16 is EXACT in binary (denominator 2⁴), so est, jaccard
# and |est − jaccard| are identical doubles on both engines; the only
# cross-engine hazard is summation order, removed by quantizing each
# term to DECIMAL(18,8) before the associative SUM (the x_psi_drift
# recipe).
_MINHASH_ACCURACY_ORACLE = """
WITH corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, text
    FROM documents WHERE doc_id < 10
), {ctes}, est AS (
    SELECT v.jaccard,
           CAST(len(list_filter(range(16),
                    i -> s1.sig[i + 1] = s2.sig[i + 1])) AS DOUBLE) / 16
               AS est
    FROM verified v
    JOIN sigs s1 ON s1.doc_id = v.doc_a
    JOIN sigs s2 ON s2.doc_id = v.doc_b
)
SELECT CAST(LEAST(CAST(FLOOR(jaccard * 5) AS INT), 4) AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(CAST(SUM(CAST(jaccard AS DECIMAL(18,8))) AS DOUBLE)
             / COUNT(*), 6) AS mean_exact,
       ROUND(CAST(SUM(CAST(est AS DECIMAL(18,8))) AS DOUBLE)
             / COUNT(*), 6) AS mean_est,
       ROUND(CAST(SUM(CAST(ABS(est - jaccard) AS DECIMAL(18,8))) AS DOUBLE)
             / COUNT(*), 6) AS mean_abs_err,
       ROUND(MAX(ABS(est - jaccard)), 6) AS max_abs_err
FROM est
GROUP BY 1
"""


def _minhash_accuracy_oracle() -> str:
    from .extensions import _NEAR_CTES

    return _MINHASH_ACCURACY_ORACLE.format(ctes=_NEAR_CTES.strip())


@register("x_minhash_accuracy", oracle=_minhash_accuracy_oracle())
def x_minhash_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator-error certification, per similarity band.

    For every LSH candidate pair the production pipeline surfaces
    (``_minhash_parts``'s unfiltered ``scored`` frame), compare the
    signature-agreement estimate — matching components of the two
    16-long KM signature vectors, over 16 — against the exact
    hashed-shingle Jaccard the verification join computes anyway, then
    aggregate |est − exact| into five exact-similarity bands
    (⌊5·jaccard⌋, clamped). The planted duplicated tail guarantees the
    top band is populated (identical docs ⇒ est = exact = 1, err = 0);
    candidate pairs from band collisions populate the low bands.

    This is the calibration chart for the signature budget: E|est − j|
    ~ √(j(1−j)/16) ≤ 0.125 for 16 hashes — if the measured band means
    exceed that, the shingle space is too small (collisions) or the
    hash family is biased, and the fix is more signatures, not a lower
    threshold.

    Scale shape: the pair space is LSH-band-bounded (never n²); the
    signature join ships 16 longs per side — the shingle sets stay out
    of this join entirely (exact Jaccard is reused from the already-
    computed ``scored`` frame). Per-term DECIMAL(18,8) quantization
    before the mean sums keeps the band aggregate associative and
    cross-engine exact; the output is ≤ 5 rows of metadata.
    """
    from .extensions import N_MINHASH, _minhash_parts

    parts = _minhash_parts(spark, sf_dir)
    sig = parts["signed"].select(
        "doc_id",
        F.array(*[f"sig{i}" for i in range(N_MINHASH)]).alias("sig"),
    )
    a = sig.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    b = sig.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    matches = F.aggregate(
        F.zip_with(
            "sig_a", "sig_b", lambda x, y: F.when(x == y, 1).otherwise(0)
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    est = matches.cast("double") / F.lit(N_MINHASH)
    scored = (
        parts["scored"]
        .join(a, "doc_a")
        .join(b, "doc_b")
        .select("jaccard", est.alias("est"))
    )
    err = F.abs(F.col("est") - F.col("jaccard"))
    bucket = F.least(
        F.floor(F.col("jaccard") * 5).cast("int"), F.lit(4)
    ).cast("long")
    dec = lambda c: c.cast("decimal(18,8)")  # noqa: E731
    return (
        scored.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.round(
                F.sum(dec(F.col("jaccard"))).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_exact"),
            F.round(
                F.sum(dec(F.col("est"))).cast("double") / F.count(F.lit(1)),
                6,
            ).alias("mean_est"),
            F.round(
                F.sum(dec(err)).cast("double") / F.count(F.lit(1)), 6
            ).alias("mean_abs_err"),
            F.round(F.max(err), 6).alias("max_abs_err"),
        )
    )


# ---------------------------------------------------------------------------
# x_dup_trend — per-crawl-day new vs duplicate content
# ---------------------------------------------------------------------------

# crawl_day = doc_id % 7 is the deterministic stand-in for the crawl
# partition a real pipeline carries (documents.parquet has no date
# column). 10⁶ ≡ 1 (mod 7), so each planted copy (doc_id + 10⁶) lands
# one day AFTER its original's slot — cross-day duplicates exist at
# every SF. First-seen election packs (day, doc_id) into one integer
# (day·10⁷ + doc_id — doc_id < 1 000 010 ≪ 10⁷, no collision) so MIN
# is a plain partial-aggregable integer min on both engines (DuckDB
# min_by cannot order by ROW — registry.py lesson).
_DUP_TREND_ORACLE = """
WITH corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, text
    FROM documents WHERE doc_id < 10
), hashed AS (
    SELECT doc_id, doc_id % 7 AS day, md5(text) AS digest FROM corpus
), firsts AS (
    SELECT digest, MIN(day * 10000000 + doc_id) AS w
    FROM hashed GROUP BY digest
), daily AS (
    SELECT h.day,
           COUNT(*) AS n_docs,
           SUM(CASE WHEN h.doc_id = f.w % 10000000 THEN 1 ELSE 0 END)
               AS n_new
    FROM hashed h JOIN firsts f ON h.digest = f.digest
    GROUP BY h.day
)
SELECT CAST(day AS BIGINT) AS day,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_new AS BIGINT) AS n_new,
       CAST(n_docs - n_new AS BIGINT) AS n_dup,
       ROUND(CAST(n_docs - n_new AS DOUBLE) / n_docs, 6) AS dup_rate,
       CAST(SUM(n_new) OVER (ORDER BY day) AS BIGINT) AS corpus_size
FROM daily
"""


@register("x_dup_trend", oracle=_DUP_TREND_ORACLE)
def x_dup_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-crawl duplicate trend: per crawl day, how many
    documents are NEW content (their digest's first occurrence, ordered
    by (day, doc_id)) vs repeats of already-seen content, the day's
    duplicate rate, and the running distinct-corpus size. A healthy
    crawl shows dup_rate creeping up as the frontier saturates; a
    dup_rate cliff means the scheduler is re-fetching, and a flat
    corpus_size means the crawl has stalled — this one frame is the
    chart that distinguishes the two.

    First-seen election: digests group with a single partial-aggregable
    integer MIN over day·10⁷ + doc_id (the packed key orders exactly
    like (day, doc_id); both factors are bounded well inside long
    range), so the shuffle carries (digest, long) — never text. The
    flag join is digest-keyed at digest grain vs doc grain; the final
    cumulative window runs over |days| POST-AGGREGATION rows (7 here —
    metadata scale, the single-partition window is free because the
    day-grain frame is tiny at any corpus size).
    """
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    dup = d.where(F.col("doc_id") < 10).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    hashed = (
        d.unionByName(dup)
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            (F.col("doc_id") % 7).cast("long").alias("day"),
            F.md5(F.col("text").cast("binary")).alias("digest"),
        )
    )
    firsts = hashed.groupBy("digest").agg(
        F.min(F.col("day") * 10_000_000 + F.col("doc_id")).alias("w")
    )
    daily = (
        hashed.join(firsts, "digest")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(
                F.when(F.col("doc_id") == F.col("w") % 10_000_000, 1)
                .otherwise(0)
            ).cast("long").alias("n_new"),
        )
    )
    cum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "day",
        "n_docs",
        "n_new",
        (F.col("n_docs") - F.col("n_new")).cast("long").alias("n_dup"),
        F.round(
            (F.col("n_docs") - F.col("n_new")).cast("double")
            / F.col("n_docs"),
            6,
        ).alias("dup_rate"),
        F.sum("n_new").over(cum).cast("long").alias("corpus_size"),
    )
