"""Round-6 batch 11: bootstrap uncertainty and snapshot diffing.

- ``x_bootstrap_ci`` — Poisson-bootstrap confidence interval for the
  mean purchase value with REPRODUCIBLE resampling: each of 16
  replicates draws every row a Poisson(1) weight from a seeded md5
  uniform (the ``x_dp_groupby`` replay pattern), so both engines build
  bit-identical replicates. The Poisson bootstrap is the ONLY
  bootstrap that works on a distributed corpus — it never materializes
  a resample, just weights each row independently — which is why
  billion-row A/B systems use it.
- ``x_dataset_diff`` — the release-to-release corpus diff: given
  snapshot A (documents) and snapshot B (a deterministic mutation:
  10%-bucket deletions, every-17th edits, 5 additions), report per
  source how many docs were added / removed / changed / unchanged —
  the audit table a data release publishes next to its dataset card.

Reference parity: no analogue [REF-UNVERIFIED — /root/reference is
empty]; SURVEY §2.J-M curation/statistics extensions.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

_B = 16  # bootstrap replicates

# Poisson(1) inverse-CDF thresholds, capped at 5 (P[w>5] < 1e-4).
# Generated ONCE from Python floats and inlined as identical literals
# in both the Spark expression and the SQL oracle — the comparison
# u < threshold is then the same double comparison on both engines.
_POIS_CDF = [
    sum(math.exp(-1.0) / math.factorial(j) for j in range(k + 1))
    for k in range(5)
]


def _bootstrap_oracle() -> str:
    ladder = " ".join(
        f"WHEN u < {repr(t)} THEN {k}" for k, t in enumerate(_POIS_CDF)
    )
    return f"""
WITH p AS (
    SELECT CAST(event_id AS VARCHAR) AS eid,
           CAST(ROUND(value * 100) AS BIGINT) AS cents
    FROM events WHERE event_type = 'purchase'
), reps AS (
    SELECT CAST(b AS INT) AS b FROM range(-1, {_B}) t(b)
), drawn AS (
    SELECT r.b, p.cents,
           (CAST('0x' || substr(md5('boot|' || CAST(r.b AS VARCHAR)
                                 || '|' || p.eid), 1, 4)
                 AS BIGINT) + 0.5) / 65536.0 AS u
    FROM p, reps r
), weighted AS (
    SELECT b, cents,
           CASE WHEN b = -1 THEN 1 {ladder} ELSE 5 END AS w
    FROM drawn
), means AS (
    SELECT b, CAST(SUM(w * cents) AS DOUBLE) / SUM(w) / 100 AS m,
           CAST(SUM(w) AS BIGINT) AS sw
    FROM weighted GROUP BY b
), ranked AS (
    SELECT b, m, sw,
           ROW_NUMBER() OVER (
               PARTITION BY CASE WHEN b >= 0 THEN 1 ELSE 0 END
               ORDER BY m, b) AS rn
    FROM means
)
SELECT CAST(MAX(CASE WHEN b = -1 THEN sw END) AS BIGINT) AS n_purchases,
       ROUND(MAX(CASE WHEN b = -1 THEN m END), 6) AS base_mean,
       ROUND(MIN(CASE WHEN b >= 0 THEN m END), 6) AS boot_lo,
       ROUND(MAX(CASE WHEN b >= 0 AND rn = {_B // 2} THEN m END), 6)
           AS boot_median,
       ROUND(MAX(CASE WHEN b >= 0 THEN m END), 6) AS boot_hi
FROM ranked
"""


@register("x_bootstrap_ci", oracle=_bootstrap_oracle())
def x_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap uncertainty band for the mean purchase value:
    16 replicates, each weighting every purchase row by a Poisson(1)
    draw derived from md5('boot|' + replicate + '|' + event_id) through
    the inverse CDF (capped at 5), plus a pseudo-replicate b = −1 with
    unit weights carrying the point estimate. One row out: n, base
    mean, and the replicate-mean envelope (min / lower-median / max of
    the 16 — with B = 16 the 2.5th/97.5th percentile ranks ARE the
    extremes).

    Determinism: the thresholds are Python-float literals inlined
    identically into both engines' expressions; weights are integers,
    so Σw·cents and Σw are EXACT integer sums (any order) and each
    replicate mean is one identical double division. Seeded hashing
    replays exactly — rerunning the release reproduces the interval.

    Scale shape: the replicate explode is ×17 scalar rows (b, cents,
    w) — no text, no vectors — and the per-replicate aggregate
    map-combines to ≤ 17 partials per task, so the shuffle carries
    17 × |tasks| rows regardless of corpus size. The rank window runs
    over the 17-row means frame. This is the weighted-row bootstrap
    that scales where resample-materialization cannot.
    """
    e = load(spark, sf_dir, "events")
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").cast("string").alias("eid"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    drawn = p.select(
        F.explode(F.array(*[F.lit(b) for b in range(-1, _B)])).alias("b"),
        "eid",
        "cents",
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("boot|"),
                        F.col("b").cast("string"),
                        F.lit("|"),
                        F.col("eid"),
                    ).cast("binary")
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")
        + 0.5
    ) / 65536.0
    w = F.when(F.col("b") == -1, F.lit(1))
    for k, t in enumerate(_POIS_CDF):
        w = w.when(u < F.lit(t), F.lit(k))
    w = w.otherwise(F.lit(5))
    means = (
        drawn.select("b", "cents", w.alias("w"))
        .groupBy("b")
        .agg(
            (
                F.sum(F.col("w") * F.col("cents")).cast("double")
                / F.sum("w")
                / 100
            ).alias("m"),
            F.sum("w").cast("long").alias("sw"),
        )
    )
    rn = F.row_number().over(
        Window.partitionBy((F.col("b") >= 0).cast("int")).orderBy("m", "b")
    )
    ranked = means.select("b", "m", "sw", rn.alias("rn"))
    boot = F.col("b") >= 0
    return ranked.agg(
        F.max(F.when(F.col("b") == -1, F.col("sw")))
        .cast("long")
        .alias("n_purchases"),
        F.round(F.max(F.when(F.col("b") == -1, F.col("m"))), 6).alias(
            "base_mean"
        ),
        F.round(F.min(F.when(boot, F.col("m"))), 6).alias("boot_lo"),
        F.round(
            F.max(F.when(boot & (F.col("rn") == _B // 2), F.col("m"))), 6
        ).alias("boot_median"),
        F.round(F.max(F.when(boot, F.col("m"))), 6).alias("boot_hi"),
    )


# ---------------------------------------------------------------------------
# x_dataset_diff — snapshot-to-snapshot corpus diff
# ---------------------------------------------------------------------------

# Snapshot B is a deterministic mutation of A (documents): docs in the
# doc_id % 10 = 0 bucket are DELETED, docs with doc_id % 17 = 3 are
# EDITED (text + ' v2'), and 5 NEW docs (doc_id + 2·10⁶ copies of
# doc_id < 5) are added — so every diff class is populated at any SF.
_DATASET_DIFF_ORACLE = """
WITH a AS (
    SELECT doc_id, source, md5(text) AS digest FROM documents
), b AS (
    SELECT doc_id, source,
           md5(CASE WHEN doc_id % 17 = 3 THEN text || ' v2'
                    ELSE text END) AS digest
    FROM documents WHERE doc_id % 10 != 0
    UNION ALL
    SELECT doc_id + 2000000 AS doc_id, source, md5(text) AS digest
    FROM documents WHERE doc_id < 5
), joined AS (
    SELECT COALESCE(a.source, b.source) AS source,
           CASE WHEN a.doc_id IS NULL THEN 'added'
                WHEN b.doc_id IS NULL THEN 'removed'
                WHEN a.digest != b.digest THEN 'changed'
                ELSE 'unchanged' END AS status
    FROM a FULL OUTER JOIN b USING (doc_id)
)
SELECT source,
       CAST(SUM(CASE WHEN status = 'added' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_added,
       CAST(SUM(CASE WHEN status = 'removed' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_removed,
       CAST(SUM(CASE WHEN status = 'changed' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_changed,
       CAST(SUM(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_unchanged
FROM joined
GROUP BY source
"""


@register("x_dataset_diff", oracle=_DATASET_DIFF_ORACLE)
def x_dataset_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot diff: per source, how many documents the new
    snapshot added, removed, changed (same doc_id, different content
    digest), or kept unchanged — the audit a dataset release publishes
    so consumers know whether to re-run dedup/decontamination on the
    delta (``x_dedup_incremental``) or the whole corpus.

    Scale shape: both sides reduce to (doc_id, source, 16-byte digest)
    BEFORE the full-outer join — text never enters the shuffle — and
    the diff classes come from one conditional aggregate at source
    grain. The doc_id equi-join co-partitions both snapshots; at 100 TB
    both sides would be bucketed by doc_id on write, making the diff
    exchange-free (the sources/sinks.py upsert layout).
    """
    d = load(spark, sf_dir, "documents")
    a = d.select(
        "doc_id", "source", F.md5(F.col("text").cast("binary")).alias("digest")
    )
    edited = F.when(
        F.col("doc_id") % 17 == 3, F.concat(F.col("text"), F.lit(" v2"))
    ).otherwise(F.col("text"))
    b = (
        d.where(F.col("doc_id") % 10 != 0)
        .select("doc_id", "source", F.md5(edited.cast("binary")).alias("digest"))
        .unionByName(
            d.where(F.col("doc_id") < 5).select(
                (F.col("doc_id") + 2_000_000).alias("doc_id"),
                "source",
                F.md5(F.col("text").cast("binary")).alias("digest"),
            )
        )
    )
    joined = a.withColumnsRenamed(
        {"source": "src_a", "digest": "dig_a"}
    ).join(
        b.withColumnsRenamed({"source": "src_b", "digest": "dig_b"}),
        "doc_id",
        "full_outer",
    )
    status = (
        F.when(F.col("dig_a").isNull(), F.lit("added"))
        .when(F.col("dig_b").isNull(), F.lit("removed"))
        .when(F.col("dig_a") != F.col("dig_b"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    cnt = lambda s: F.sum(  # noqa: E731
        (F.col("status") == s).cast("long")
    ).cast("long")
    return (
        joined.select(
            F.coalesce("src_a", "src_b").alias("source"),
            status.alias("status"),
        )
        .groupBy("source")
        .agg(
            cnt("added").alias("n_added"),
            cnt("removed").alias("n_removed"),
            cnt("changed").alias("n_changed"),
            cnt("unchanged").alias("n_unchanged"),
        )
    )
