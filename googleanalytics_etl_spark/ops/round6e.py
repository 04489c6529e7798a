"""Round-6 batch 5: LSH design-dial tuning.

``x_lsh_tuning`` — the (bands × rows) sweep that justifies the MinHash
family's production 4×4 shape: the SAME 16 signatures re-banded as
(4 bands × 4 rows), (8 × 2) and (16 × 1), each shape scored by its
candidate volume, verified-pair yield (Jaccard ≥ 0.5), precision, and
recall against the most permissive shape. The S-curve tradeoff
(P[candidate] = 1 − (1 − j^r)^b) is usually quoted from theory; this
operator MEASURES it on the corpus — the evidence behind picking a
banding before a 100 TB dedup run, where a too-permissive shape
explodes the candidate join and a too-strict one silently loses dups.

Reference parity: no analogue [REF-UNVERIFIED — /root/reference is
empty]; extends the dedup-evidence family (x_dedup_eval,
x_dedup_threshold_curve).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register

# (bands, rows) shapes over the 16 shared signatures. A pair matching a
# b-band of r rows matches each of that band's single rows, so the
# (16, 1) candidate set is a SUPERSET of every other shape — its
# verified yield is the recall denominator.
_SHAPES = ((4, 4), (8, 2), (16, 1))


def _config_ctes(b: int, r: int) -> str:
    sig_terms = " || ':' || ".join(
        f"CAST(sig[{r} * band + {i + 1}] AS VARCHAR)" for i in range(r)
    )
    tag = f"{b}_{r}"
    return f"""banded_{tag} AS (
    SELECT doc_id, band, {sig_terms} AS bucket
    FROM sigs, range({b}) t(band)
), cand_{tag} AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM banded_{tag} a
    JOIN banded_{tag} b ON a.band = b.band AND a.bucket = b.bucket
    WHERE a.doc_id < b.doc_id
), stat_{tag} AS (
    SELECT {b} AS n_bands, {r} AS n_rows,
           COUNT(*) AS n_candidates,
           SUM(CASE WHEN ROUND(
                   CAST(len(list_intersect(s1.hsig, s2.hsig)) AS DOUBLE)
                   / len(list_distinct(list_concat(s1.hsig, s2.hsig))), 6)
                   >= 0.5 THEN 1 ELSE 0 END) AS n_verified
    FROM cand_{tag}
    JOIN hset s1 ON s1.doc_id = doc_a
    JOIN hset s2 ON s2.doc_id = doc_b
)"""


def _lsh_tuning_oracle() -> str:
    from .extensions import _SIG_CTES

    cfg = ", ".join(_config_ctes(b, r) for b, r in _SHAPES)
    stats_union = " UNION ALL ".join(
        f"SELECT * FROM stat_{b}_{r}" for b, r in _SHAPES
    )
    return f"""
WITH corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, text
    FROM documents WHERE doc_id < 10
), {_SIG_CTES.strip()}, {cfg}, stats AS (
    {stats_union}
), denom AS (
    SELECT n_verified AS v_total FROM stat_16_1
)
SELECT CAST(s.n_bands AS BIGINT) AS n_bands,
       CAST(s.n_rows AS BIGINT) AS n_rows,
       CAST(s.n_candidates AS BIGINT) AS n_candidates,
       CAST(s.n_verified AS BIGINT) AS n_verified,
       ROUND(CAST(s.n_verified AS DOUBLE) / s.n_candidates, 6)
           AS precision_at_05,
       ROUND(CAST(s.n_verified AS DOUBLE) / d.v_total, 6) AS recall_vs_max
FROM stats s, denom d
"""


@register("x_lsh_tuning", oracle=_lsh_tuning_oracle())
def x_lsh_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH banding sweep: the shared 16-signature frame
    (``_minhash_parts`` — computed ONCE, eagerly checkpointed)
    re-banded at
    {shapes}; per shape, candidate volume, verified-pair yield
    (hash-set Jaccard ≥ 0.5), precision, and recall against the
    (16 × 1) superset shape. Reads as the measured LSH S-curve: more
    rows per band → fewer, cleaner candidates (high precision, lower
    recall); single-row bands → every signature collision becomes a
    candidate (full recall at this threshold, worst candidate bill).

    Scale shape: the signature stage is the exact x_dedup_near plan
    (the materialized (doc_id, arrays) frame feeds all three shapes — the
    shingle/md5 pipeline runs once); each shape's band join carries
    only (band, bucket, doc_id); verification joins the slim hash-set
    frame onto candidates only. The three shapes share every scan. At
    100 TB you run this on a ~0.1% hash-sampled slice — the S-curve is
    a ratio estimate, sample-stable — before committing the full run
    to one banding.
    """
    from .extensions import _minhash_parts

    parts = _minhash_parts(spark, sf_dir)
    signed = parts["signed"]
    hsig = parts["hsig"]
    s1 = hsig.select(
        F.col("doc_id").alias("doc_a"), F.col("hsig").alias("sh_a")
    )
    s2 = hsig.select(
        F.col("doc_id").alias("doc_b"), F.col("hsig").alias("sh_b")
    )
    # one set op per pair (|A∪B| = |A|+|B|−|A∩B|, exact on the distinct
    # hash sets) — the shared _minhash_parts rewrite
    _inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jaccard = F.round(
        _inter / (F.size("sh_a") + F.size("sh_b") - _inter), 6
    )

    def stat(b: int, r: int) -> DataFrame:
        bands = F.array(
            *[
                F.concat_ws(
                    ":",
                    *[
                        F.col(f"sig{band * r + i}").cast("string")
                        for i in range(r)
                    ],
                )
                for band in range(b)
            ]
        )
        buckets = signed.select(
            "doc_id", F.posexplode(bands).alias("band", "bucket")
        )
        # NOT the bucket-aggregate pair generation used elsewhere
        # (probed in round 13: 3.2 s → 6.7 s): the (16 × 1) shape has
        # HOT single-signature buckets (common shingles pull many docs
        # to one min value), and the in-row double explode copies the
        # k-member array per generated row — O(k³) bytes on a hot
        # bucket. The self-join streams the probe side instead, which
        # is the right shape when buckets can be large.
        pa = buckets.select("band", "bucket", F.col("doc_id").alias("doc_a"))
        pb = buckets.select("band", "bucket", F.col("doc_id").alias("doc_b"))
        pairs = (
            pa.join(pb, ["band", "bucket"])
            .where(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
            .dropDuplicates(["doc_a", "doc_b"])
        )
        return (
            pairs.join(s1, "doc_a")
            .join(s2, "doc_b")
            .agg(
                F.lit(b).cast("long").alias("n_bands"),
                F.lit(r).cast("long").alias("n_rows"),
                F.count(F.lit(1)).cast("long").alias("n_candidates"),
                F.sum(F.when(jaccard >= 0.5, 1).otherwise(0))
                .cast("long")
                .alias("n_verified"),
            )
        )

    stats = stat(*_SHAPES[0])
    for shape in _SHAPES[1:]:
        stats = stats.unionByName(stat(*shape))
    # recall denominator = the (16 × 1) superset shape's verified count,
    # read from the 3-row stats frame itself via a whole-frame window —
    # no second stat(16, 1) subtree, no nested-loop join; the single
    # partition holds exactly |shapes| metadata rows.
    v_total = F.max(
        F.when(
            (F.col("n_bands") == 16) & (F.col("n_rows") == 1),
            F.col("n_verified"),
        )
    ).over(Window.partitionBy(F.lit(1)))
    return stats.withColumn("v_total", v_total).select(
        "n_bands",
        "n_rows",
        "n_candidates",
        "n_verified",
        F.round(
            F.col("n_verified").cast("double") / F.col("n_candidates"), 6
        ).alias("precision_at_05"),
        F.round(
            F.col("n_verified").cast("double") / F.col("v_total"), 6
        ).alias("recall_vs_max"),
    )


x_lsh_tuning.__doc__ = x_lsh_tuning.__doc__.format(shapes=_SHAPES)
