"""Round-7 batch 4: iterative linear algebra with a full SQL oracle,
and the streaming mergeability certification for the relational HLL.

- ``x_power_iteration`` — top principal direction of the embedding
  Gram matrix by THREE unrolled power-iteration steps, entirely as
  DataFrame ops on the d²-bounded (i, j, G_ij) frame. Unlike
  round4f's ``pca_top_component`` (a driver-side helper on collected
  G), this is the distributed form AND it carries a full cross-engine
  hash oracle: G accumulates exactly (1e7-grid longs, DECIMAL(38,0)
  sums — the x_gram_matrix recipe), every matrix-vector product term
  and every squared-norm term is DECIMAL-quantized before its sum, so
  all three iterations are bit-stable. G is PSD and v₀ is the uniform
  positive vector, so the iterate's sign is pinned — no eigenvector
  sign ambiguity. Emits the per-dimension component, the Rayleigh
  eigenvalue estimate, and its share of trace(G) (explained variance).
- ``s_hll_merge`` — the MERGEABILITY certification of
  ``x_hll_relational``: per micro-batch, compute the batch's HLL
  registers (groupBy-MAX); fold them into running state with MAX
  again; the final estimate must equal the batch sketch of the whole
  log EXACTLY — the defining property (register-max is a semilattice)
  that lets a 100 TB distinct-count roll up per partition / per hour /
  per day without ever re-reading history. Oracle = the batch HLL
  formula, so the streaming fold is hash-certified against it.

Reference parity: no analogue [REF-UNVERIFIED — /root/reference is
empty]; SURVEY §2 H/L/M extensions (the sketch family's certification
discipline, VERDICT r6 item 6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import register
from .round7c import _HLL_ALPHA, _HLL_M, _HLL_ORACLE, _HLL_SUFFIX_BITS

_PI_SCALE = 10_000_000  # the shared 1e7 embedding grid
_PI_ITERS = 3
_PI_Q = "decimal(28,12)"  # per-term quantization for matvec/norm sums


def _pi_oracle() -> str:
    d = 64
    descale = float(_PI_SCALE) * float(_PI_SCALE)
    sql = f"""
WITH e AS (
    SELECT vec_id,
           generate_subscripts(embedding, 1) - 1 AS dim,
           CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * {_PI_SCALE})
                AS BIGINT) AS sv
    FROM embeddings
), g AS (
    SELECT a.dim AS i, b.dim AS j,
           CAST(SUM(CAST(a.sv AS DECIMAL(38,0)) * b.sv) AS DOUBLE)
               / {descale} AS gv
    FROM e a JOIN e b ON a.vec_id = b.vec_id
    GROUP BY a.dim, b.dim
), v0 AS (
    SELECT unnest(range(0, {d})) AS j,
           1.0 / SQRT({d}.0) AS vv
)"""
    prev = "v0"
    for t in range(1, _PI_ITERS + 1):
        sql += f""",
y{t} AS (
    SELECT g.i AS j,
           CAST(SUM(CAST(g.gv * v.vv AS DECIMAL(28,12))) AS DOUBLE) AS yv
    FROM g JOIN {prev} v ON g.j = v.j
    GROUP BY g.i
), n{t} AS (
    SELECT SQRT(CAST(SUM(CAST(yv * yv AS DECIMAL(28,12))) AS DOUBLE))
        AS nrm
    FROM y{t}
), v{t} AS (
    SELECT y.j, y.yv / n.nrm AS vv FROM y{t} y CROSS JOIN n{t} n
)"""
        prev = f"v{t}"
    sql += f""",
lam AS (
    SELECT CAST(SUM(CAST(g.gv * a.vv * b.vv AS DECIMAL(28,12)))
                AS DOUBLE) AS l
    FROM g JOIN {prev} a ON g.i = a.j JOIN {prev} b ON g.j = b.j
), tr AS (
    SELECT CAST(SUM(CAST(gv AS DECIMAL(28,12))) AS DOUBLE) AS t
    FROM g WHERE i = j
)
SELECT v.j AS dim, ROUND(v.vv, 6) AS component,
       ROUND(lam.l, 4) AS eigenvalue,
       ROUND(lam.l / tr.t, 6) AS explained_ratio
FROM {prev} v CROSS JOIN lam CROSS JOIN tr
"""
    return sql


@register("x_power_iteration", oracle=_pi_oracle())
def x_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed power iteration for the top principal direction of
    the embedding Gram matrix ({it} unrolled steps on the d²-bounded
    (i, j, G_ij) frame — d=64, so every stage after the one exact
    G-building aggregate is metadata-scale). Sign is pinned by the
    uniform positive start vector on a PSD matrix; all float
    reductions (matvec terms, squared norms, Rayleigh quotient,
    trace) are DECIMAL-quantized before their exact sums, so the whole
    iteration is bit-stable cross-engine. Output: the unit component
    per dimension plus the Rayleigh eigenvalue and its explained share
    of trace(G).

    Scale shape: G_ij = Σ_n x_ni·x_nj is the single data-scale pass
    (vec_id-local join, map-side-combinable aggregate, output d²); the
    iterations shuffle only d-row and d²-row frames. At 100 TB this is
    one scan plus constant work — the normal-equation pattern for
    "fit PCA on the whole corpus".
    """
    em = load(spark, sf_dir, "embeddings")
    e = em.select(
        "vec_id",
        F.posexplode(
            F.transform(
                "embedding",
                lambda x: F.round(x.cast("double") * _PI_SCALE).cast(
                    "long"
                ),
            )
        ).alias("dim", "sv"),
    )
    a = e.select(
        "vec_id",
        F.col("dim").cast("bigint").alias("i"),
        F.col("sv").alias("sa"),
    )
    b = e.select(
        "vec_id",
        F.col("dim").cast("bigint").alias("j"),
        F.col("sv").alias("sb"),
    )
    descale = float(_PI_SCALE) * float(_PI_SCALE)
    # Multiply in LONG, widen to decimal only for the exact SUM: the
    # per-term product is bounded by (scale·max|x|)² ≈ 3e14 ≪ 2⁶³, so
    # the long multiply is exact and overflow-free at any corpus size —
    # only the cross-row sum can outgrow long, and that is where the
    # decimal goes. A per-term decimal MULTIPLY (the previous form)
    # pays BigDecimal arithmetic on every one of the n·d² product rows:
    # measured 8.3 s → 3.0 s warm for the G stage at sf0.1, identical
    # values (integer grid either way).
    g = (
        a.join(b, "vec_id")
        .groupBy("i", "j")
        .agg(
            (
                F.sum((F.col("sa") * F.col("sb")).cast("decimal(38,0)")).cast(
                    "double"
                )
                / descale
            ).alias("gv")
        )
        # d²-row eager checkpoint, not persist: every iteration scans
        # this frame, and scans of a cached relation re-plan with AQE
        # pinned off (the x_dedup_clusters pathology)
        .materialize(eager=True)
    )
    d = 64
    v = spark.range(d).select(
        F.col("id").cast("bigint").alias("j"),
        F.lit(1.0 / (d**0.5)).alias("vv"),
    )
    for _ in range(_PI_ITERS):
        y = (
            g.join(F.broadcast(v), "j")
            .groupBy("i")
            .agg(
                F.sum((F.col("gv") * F.col("vv")).cast(_PI_Q))
                .cast("double")
                .alias("yv")
            )
        )
        nrm = y.agg(
            F.sqrt(
                F.sum((F.col("yv") * F.col("yv")).cast(_PI_Q)).cast(
                    "double"
                )
            ).alias("nrm")
        )
        # d-row materialization per step: without it the lazy DAG
        # re-executes every earlier iteration once per downstream
        # reference (v feeds y, lam twice, and the output — measured
        # 11.4 s vs ~2 s at sf0.1)
        v = (
            y.crossJoin(F.broadcast(nrm))
            .select(
                F.col("i").alias("j"),
                (F.col("yv") / F.col("nrm")).alias("vv"),
            )
            .materialize(eager=True)
        )
    va = v.select(F.col("j").alias("i"), F.col("vv").alias("va"))
    lam = (
        g.join(F.broadcast(va), "i")
        .join(F.broadcast(v), "j")
        .agg(
            F.sum(
                (F.col("gv") * F.col("va") * F.col("vv")).cast(_PI_Q)
            )
            .cast("double")
            .alias("l")
        )
    )
    tr = g.where(F.col("i") == F.col("j")).agg(
        F.sum(F.col("gv").cast(_PI_Q)).cast("double").alias("t")
    )
    out = (
        v.crossJoin(F.broadcast(lam))
        .crossJoin(F.broadcast(tr))
        .select(
            F.col("j").alias("dim"),
            F.round(F.col("vv"), 6).alias("component"),
            F.round(F.col("l"), 4).alias("eigenvalue"),
            F.round(F.col("l") / F.col("t"), 6).alias("explained_ratio"),
        )
        .materialize(eager=True)
    )
    return out


x_power_iteration.__doc__ = x_power_iteration.__doc__.format(it=_PI_ITERS)


@register("s_hll_merge", oracle=_HLL_ORACLE)
def s_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming mergeable distinct-count: each micro-batch computes
    its OWN HLL registers (groupBy-MAX over the batch's keys) and
    folds them into running state with MAX again; after the stream
    drains, the folded registers feed the same estimator as
    ``x_hll_relational`` — and because register-max is a semilattice
    (commutative, associative, idempotent), the result is EXACTLY the
    batch sketch of the whole log, certified by sharing its full hash
    oracle. This is the property that makes HLL the 100 TB
    distinct-count structure: per-partition/per-hour register states
    merge without ever touching raw history (constant state: m
    registers), and replays/overlaps are free (idempotent).

    State lives in a driver-side dict keyed by register (m=512 ints —
    bounded metadata, the bloom-manifest contract); per batch the
    register aggregate itself is distributed.
    """
    from .streaming import (
        _events_stream,
        _stage_events,
        _sweep_runs,
        bounded_stream_parts,
    )

    stage = _stage_events(spark, sf_dir)
    # checkpoint must be per-RUN, never inside the (content-cached,
    # cross-invocation) stage dir — a reused checkpoint would replay
    # zero batches and fold an empty sketch
    ckpt = _sweep_runs("hll_merge") / "ckpt"
    state: dict[int, int] = {}

    hv = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("hll:"), F.col("user_id").cast("string")
                ).cast("binary")
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")

    def fold_batch(batch_df: DataFrame, epoch_id: int) -> None:
        split = (
            batch_df.select("user_id")
            .distinct()
            .select(hv.alias("hv"))
            .select(
                (F.col("hv") % _HLL_M).alias("reg"),
                F.expr(f"hv div {_HLL_M}").cast("long").alias("w"),
            )
        )
        spine = batch_df.sparkSession.range(0, _HLL_SUFFIX_BITS).select(
            F.col("id").cast("long").alias("b"),
            F.pow(2.0, F.col("id").cast("double")).cast("long").alias("p2"),
        )
        rho = (
            split.join(
                F.broadcast(spine), F.col("p2") <= F.col("w"), "left"
            )
            .groupBy("reg", "w")
            .agg(
                F.when(F.col("w") == 0, F.lit(_HLL_SUFFIX_BITS + 1))
                .otherwise(_HLL_SUFFIX_BITS - F.max("b"))
                .alias("r")
            )
        )
        # ≤ m rows — bounded metadata, never data-scale
        for row in (
            rho.groupBy("reg").agg(F.max("r").alias("m_j")).collect()
        ):
            reg, m_j = int(row["reg"]), int(row["m_j"])
            state[reg] = max(state.get(reg, 0), m_j)

    # The per-batch fold aggregates to bounded metadata (<= sketch-size
    # rows) but runs under the streaming conf, where AQE is disabled and
    # shuffle partitions are taken literally: bound them for the run
    # (state here is sketch-grain, nowhere near core-count partitions).
    with bounded_stream_parts(spark):
        q = (
            _events_stream(spark, stage)
            .writeStream.foreachBatch(fold_batch)
            .option("checkpointLocation", str(ckpt))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    from decimal import Decimal

    md = float(_HLL_M)
    z = sum(
        Decimal(f"{2.0 ** (-state.get(r, 0)):.22f}") for r in range(_HLL_M)
    )
    v0 = sum(1 for r in range(_HLL_M) if state.get(r, 0) == 0)
    raw = _HLL_ALPHA * md * md / float(z)
    if raw <= 2.5 * md and v0 > 0:
        import math

        raw = md * math.log(md / v0)
    ex = load(spark, sf_dir, "events").agg(
        F.countDistinct("user_id").cast("long").alias("n_exact")
    )
    rel = F.abs(F.lit(raw) - F.col("n_exact")) / F.col("n_exact")
    return ex.select(
        F.lit(_HLL_M).cast("long").alias("m"),
        "n_exact",
        F.lit(v0).cast("long").alias("v0"),
        F.round(F.lit(raw), 2).alias("est"),
        F.round(rel, 6).alias("rel_err"),
        F.when(rel <= 3.0 * 1.04 / (md**0.5), 1)
        .otherwise(0)
        .cast("long")
        .alias("in_bound"),
    )
