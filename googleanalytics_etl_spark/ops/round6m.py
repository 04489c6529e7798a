"""Round-6 batch 13: random projection and time-to-convert.

- ``x_random_projection`` — Johnson-Lindenstrauss dimensionality
  reduction: the 64-dim embeddings projected to 8 dims through a
  deterministic ±1 sign matrix (seeded md5), with the pairwise
  squared-distance DISTORTION certified on the consecutive-id pair
  panel. JL projection is the front door to every 100 TB vector
  pipeline — project first, then shingle/LSH/IVF the short vectors —
  and the distortion histogram is the evidence the shortcut preserves
  geometry.
- ``x_time_to_convert`` — per-user view→purchase latency and its
  exact percentiles per event-type cohort: the "how long does the
  funnel take" report next to ``q_funnel``'s "how many make it".

Reference parity: no analogue [REF-UNVERIFIED — /root/reference is
empty]; SURVEY §2.J-M vectors + §2.E analytics extensions.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

_RP_IN = 64
_RP_OUT = 8


def _rp_signs() -> list[list[int]]:
    """The ±1 projection matrix: sign[o][i] from the parity of the
    first hex digit of md5('rp|o|i') — reproducible everywhere."""
    return [
        [
            1
            if int(hashlib.md5(f"rp|{o}|{i}".encode()).hexdigest()[0], 16) % 2
            else -1
            for i in range(_RP_IN)
        ]
        for o in range(_RP_OUT)
    ]


def _rp_oracle() -> str:
    signs = _rp_signs()
    # y_o = Σ_i sign[o][i]·v_i / √8, written as an explicit signed sum —
    # the SAME left-to-right literal order as the Spark fold, and both
    # engines bury any residual association drift under ROUND 6.
    proj_terms = ",\n           ".join(
        "ROUND(("
        + " ".join(
            ("+ " if s > 0 else "- ") + f"val[{i + 1}]"
            for i, s in enumerate(signs[o])
        ).lstrip("+ ")
        + f") / {repr(8 ** 0.5)}, 6) AS y{o}"
        for o in range(_RP_OUT)
    )
    y_sq = " + ".join(f"(a.y{o} - b.y{o}) * (a.y{o} - b.y{o})" for o in range(_RP_OUT))
    return f"""
WITH v AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS val FROM embeddings
), proj AS (
    SELECT vec_id,
           {proj_terms}
    FROM v
), vd AS (
    SELECT a.vec_id AS ida,
           ROUND((SELECT SUM((x.u - y.u) * (x.u - y.u)) FROM
                  (SELECT generate_subscripts(a.val, 1) AS d, unnest(a.val) AS u) x
                  JOIN
                  (SELECT generate_subscripts(b.val, 1) AS d, unnest(b.val) AS u) y
                  USING (d)), 6) AS d_orig
    FROM v a JOIN v b ON b.vec_id = a.vec_id + 1
), pd AS (
    SELECT a.vec_id AS ida, ROUND({y_sq}, 6) AS d_proj
    FROM proj a JOIN proj b ON b.vec_id = a.vec_id + 1
), ratios AS (
    SELECT ROUND(pd.d_proj / vd.d_orig, 6) AS ratio
    FROM pd JOIN vd USING (ida)
    WHERE vd.d_orig > 0
)
SELECT CAST(LEAST(CAST(FLOOR(ratio * 2) AS INT), 5) AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(CAST(SUM(CAST(ratio AS DECIMAL(18,8))) AS DOUBLE)
             / COUNT(*), 6) AS mean_ratio,
       ROUND(MIN(ratio), 6) AS min_ratio,
       ROUND(MAX(ratio), 6) AS max_ratio
FROM ratios
GROUP BY 1
"""


@register("x_random_projection", oracle=_rp_oracle())
def x_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss projection 64 → 8 dims with a distortion
    certificate: project every embedding through a deterministic ±1
    sign matrix (scaled 1/√8), then on the consecutive-id pair panel
    compare projected vs original squared distances and histogram the
    ratio (bucket = ⌊2·ratio⌋ clamped to 5). JL theory puts the ratio
    near 1 with spread ~√(2/k) ≈ 0.5 at k = 8 — the measured buckets
    are the evidence before trusting 8-dim distances for blocking.

    Scale shape: the projection is ROW-LOCAL — 8 codegen fold
    expressions over the embedding array with the sign matrix inlined
    as literals (no shuffle, no UDF); the distortion panel joins on
    vec_id+1 (equi-join, n pairs, never n²) carrying 8-dim projections
    plus the original vectors once; the histogram is a ≤ 6-row
    aggregate of DECIMAL-quantized ratios. At 100 TB you persist the
    8-dim column next to the vectors and every downstream ANN stage
    reads 8 floats instead of 64.

    Determinism: the sign matrix is Python-generated (seeded md5) and
    inlined as IDENTICAL literals in both engines; each projection and
    distance is ROUND-6'd before the ratio, and the ratio again, so
    the bucket boundaries and sums see identical doubles.
    """
    signs = _rp_signs()
    dbl = lambda c: c.cast("double")  # noqa: E731
    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    proj_cols = [
        F.round(
            F.aggregate(
                F.zip_with(
                    "embedding",
                    F.array(*[F.lit(float(s)) for s in signs[o]]),
                    lambda x, y: dbl(x) * y,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.lit(8 ** 0.5),
            6,
        ).alias(f"y{o}")
        for o in range(_RP_OUT)
    ]
    proj = e.select("vec_id", "embedding", *proj_cols)
    a = proj.select(
        F.col("vec_id").alias("ida"),
        F.col("embedding").alias("va"),
        *[F.col(f"y{o}").alias(f"ya{o}") for o in range(_RP_OUT)],
    )
    b = proj.select(
        (F.col("vec_id") - 1).alias("ida"),
        F.col("embedding").alias("vb"),
        *[F.col(f"y{o}").alias(f"yb{o}") for o in range(_RP_OUT)],
    )
    d_orig = F.round(
        F.aggregate(
            F.zip_with("va", "vb", lambda x, y: (dbl(x) - dbl(y)) * (dbl(x) - dbl(y))),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )
    d_proj = F.round(
        sum(
            (F.col(f"ya{o}") - F.col(f"yb{o}"))
            * (F.col(f"ya{o}") - F.col(f"yb{o}"))
            for o in range(_RP_OUT)
        ),
        6,
    )
    ratios = (
        a.join(b, "ida")
        .select(d_orig.alias("d_orig"), d_proj.alias("d_proj"))
        .where(F.col("d_orig") > 0)
        .select(F.round(F.col("d_proj") / F.col("d_orig"), 6).alias("ratio"))
    )
    bucket = F.least(F.floor(F.col("ratio") * 2).cast("int"), F.lit(5))
    return ratios.groupBy(bucket.cast("long").alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.round(
            F.sum(F.col("ratio").cast("decimal(18,8)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_ratio"),
        F.round(F.min("ratio"), 6).alias("min_ratio"),
        F.round(F.max("ratio"), 6).alias("max_ratio"),
    )


# ---------------------------------------------------------------------------
# x_time_to_convert — view→purchase latency percentiles
# ---------------------------------------------------------------------------

# Per user: first view and the first purchase AFTER it; latency in
# integer seconds. Percentiles by exact rank selection (the
# q_percentiles recipe — interpolation-free, cross-engine exact).
_TTC_ORACLE = """
WITH firsts AS (
    SELECT user_id,
           MIN(CASE WHEN event_type = 'view'
                    THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS first_view
    FROM events GROUP BY user_id
), conv AS (
    SELECT e.user_id,
           (MIN(epoch_us(CAST(e.ts AS TIMESTAMP))) - f.first_view)
               // 1000000 AS lat_s
    FROM events e JOIN firsts f USING (user_id)
    WHERE e.event_type = 'purchase'
      AND f.first_view IS NOT NULL
      AND epoch_us(CAST(e.ts AS TIMESTAMP)) >= f.first_view
    GROUP BY e.user_id, f.first_view
), ranked AS (
    SELECT lat_s,
           ROW_NUMBER() OVER (ORDER BY lat_s, user_id) AS rn,
           COUNT(*) OVER () AS n
    FROM conv
)
SELECT CAST(MAX(n) AS BIGINT) AS n_converters,
       CAST(MAX(CASE WHEN rn = CAST(CEIL(0.5 * n) AS BIGINT)
                     THEN lat_s END) AS BIGINT) AS p50_s,
       CAST(MAX(CASE WHEN rn = CAST(CEIL(0.9 * n) AS BIGINT)
                     THEN lat_s END) AS BIGINT) AS p90_s,
       CAST(MIN(lat_s) AS BIGINT) AS min_s,
       CAST(MAX(lat_s) AS BIGINT) AS max_s
FROM ranked
"""


@register("x_time_to_convert", oracle=_TTC_ORACLE)
def x_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert report: for every user whose first view is
    followed by a purchase, the latency (seconds, integer µs floor-div)
    from first view to FIRST subsequent purchase; one row of exact
    rank-selected percentiles (p50/p90 at ceil(q·n) — the
    ``q_percentiles`` recipe, interpolation-free) plus min/max and the
    converter count. ``q_funnel`` reports how many reach each step;
    this reports how long the step takes — together they are the
    funnel dashboard.

    Scale shape: two user-keyed aggregates (first view, first
    qualifying purchase) — both map-combined MINs on the same user_id
    partitioning, one shuffle reused; latencies are one integer per
    converter; the rank window orders |converters| scalar rows (at
    100 TB the exact-percentile window would swap for the KLL sketch
    path of ``x_sketch_kll_quantiles`` — documented trade, exact here
    because the oracle demands it).
    """
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    firsts = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("us"))).alias(
            "first_view"
        )
    )
    conv = (
        e.where(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .where(
            F.col("first_view").isNotNull()
            & (F.col("us") >= F.col("first_view"))
        )
        .groupBy("user_id", "first_view")
        .agg(
            F.floor(
                (F.min("us") - F.col("first_view")) / 1_000_000
            ).alias("lat_s")
        )
        .select("user_id", "lat_s")
    )
    w = Window.partitionBy().orderBy("lat_s", "user_id")
    ranked = conv.select(
        "lat_s",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    pick = lambda q: F.max(  # noqa: E731
        F.when(
            F.col("rn") == F.ceil(F.lit(q) * F.col("n")).cast("long"),
            F.col("lat_s"),
        )
    ).cast("long")
    return ranked.agg(
        F.max("n").cast("long").alias("n_converters"),
        pick(0.5).alias("p50_s"),
        pick(0.9).alias("p90_s"),
        F.min("lat_s").cast("long").alias("min_s"),
        F.max("lat_s").cast("long").alias("max_s"),
    )
