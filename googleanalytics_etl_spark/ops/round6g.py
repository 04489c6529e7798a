"""Round-6 batch 7: update-mode streaming and embedding feature stats.

- ``s_update_counts`` — the third streaming output mode, closing the
  set: append (``s_watermark``) and complete (``s_topk_complete``)
  already carry oracles; this key runs an UPDATE-mode aggregation
  whose memory sink accumulates one row per (trigger, changed key) —
  the changelog consumers (upsert sinks, cache invalidation) actually
  receive. Deterministic chunking makes both the per-key update COUNT
  and the final value SQL-expressible, so the changelog itself is
  hash-oracled.
- ``x_embed_dim_stats`` — per-dimension mean/variance of the embedding
  corpus (exact scaled-integer moments): the whitening/normalization
  prep that decides whether vectors need centering before quantization
  (``x_embed_quantize``) or IVF training (``ivf_seeds``).

Reference parity: no analogue [REF-UNVERIFIED — /root/reference is
empty]; §2.H / §2.J-M extensions.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

# ---------------------------------------------------------------------------
# s_update_counts — UPDATE-mode changelog, fully oracled
# ---------------------------------------------------------------------------

# The oracle replicates _stage_events' chunking in integer microseconds:
# chunk(ts) = min(4, (us(ts) − us(lo)) · 5 // (us(hi) − us(lo))) — exact
# integer arithmetic on both engines (no interval division). A
# (event_type, day) key is updated once per distinct chunk its rows land
# in, and its final count is the plain batch count.
_UPDATE_COUNTS_ORACLE = """
WITH b AS (
    SELECT MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS lo,
           MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS hi
    FROM events
), keyed AS (
    SELECT event_type,
           CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
           LEAST(4, (epoch_us(CAST(ts AS TIMESTAMP)) - b.lo) * 5
                    // (b.hi - b.lo)) AS chunk
    FROM events, b
)
SELECT event_type, day,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT chunk) AS BIGINT) AS n_updates
FROM keyed
GROUP BY event_type, day
"""


@register("s_update_counts", oracle=_UPDATE_COUNTS_ORACLE)
def s_update_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE-mode streaming aggregation with an oracled CHANGELOG:
    (event_type, day) counts over the 5 deterministic time-span
    micro-batches, update mode, memory sink. Each trigger emits only
    the keys whose aggregate CHANGED, so the sink accumulates the
    changelog a downstream upsert consumer would apply; because chunk
    boundaries are value-derived, the number of emissions per key
    (= distinct chunks its rows land in — days astride a chunk
    boundary update twice) and the final count are both pure functions
    of the data, and the accumulated changelog carries a full
    cross-engine hash oracle (the oracle re-derives the chunk
    assignment in exact integer microseconds).

    Update mode is the state-bounded middle ground: append cannot emit
    running aggregates before the watermark closes them, complete
    re-emits the world each trigger — update emits deltas, which is
    what incremental sinks consume. State = |keys| running counts;
    each trigger's output is bounded by the keys the batch touched.

    The result folds the changelog: ``n`` = the LAST emission per key
    (counts are monotone — MAX) and ``n_updates`` = emission count.
    """
    from .streaming import _events_stream, _run_to_memory, _stage_events

    stage = _stage_events(spark, sf_dir)
    agg = (
        _events_stream(spark, stage)
        .groupBy(
            "event_type", F.col("ts").cast("date").alias("day")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    name = f"upd_{uuid.uuid4().hex[:8]}"
    _run_to_memory(agg, name, "update")
    log = spark.table(name)
    return (
        log.groupBy("event_type", "day")
        .agg(
            F.max("n").cast("long").alias("n"),
            F.count(F.lit(1)).cast("long").alias("n_updates"),
        )
        .materialize(eager=True)
    )


# ---------------------------------------------------------------------------
# x_embed_dim_stats — per-dimension exact moments
# ---------------------------------------------------------------------------

_DIM_STATS_ORACLE = """
WITH flat AS (
    SELECT generate_subscripts(embedding, 1) - 1 AS dim,
           CAST(ROUND(unnest(CAST(embedding AS DOUBLE[])) * 10000000)
                AS BIGINT) AS s
    FROM embeddings
)
SELECT CAST(dim AS BIGINT) AS dim,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(SUM(s) AS DOUBLE) / COUNT(*) / 10000000, 6) AS mean_v,
       ROUND(CAST(SUM(CAST(s AS DECIMAL(38,0)) * s) AS DOUBLE)
                 / COUNT(*) / 1e14
             - (CAST(SUM(s) AS DOUBLE) / COUNT(*) / 10000000)
               * (CAST(SUM(s) AS DOUBLE) / COUNT(*) / 10000000), 6)
           AS var_v
FROM flat
GROUP BY dim
"""


@register("x_embed_dim_stats", oracle=_DIM_STATS_ORACLE)
def x_embed_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension mean and variance of the embedding corpus — the
    normalization audit before anything consumes the vectors: a
    non-centered dimension biases int8 quantization ranges
    (``x_embed_quantize``), and a near-zero-variance dimension wastes a
    quantization bucket and a distance term. Run this, then decide
    whether to center/whiten.

    Exact moments, any summation order: values scale to round(v·10⁷)
    longs (float→double exact, the ``x_kmeans`` centroid recipe); the
    first moment sums longs, the second sums DECIMAL(38,0) squares —
    both associative — and the mean/variance divisions replay the same
    IEEE op sequence on both engines (sum → /n → /scale, then
    E[x²] − mean², ROUND 6).

    Scale shape: posexplode to (dim, scaled) scalar pairs feeds ONE
    map-side-combined aggregate keyed by dim — the shuffle carries
    |dims| × |tasks| partial rows, never vectors. Parallelism is the
    dim count; for 4096-dim embeddings that is 4096-way — fine — and
    the output is d rows of metadata.
    """
    em = load(spark, sf_dir, "embeddings")
    s = F.round(F.col("v").cast("double") * 10_000_000).cast("long")
    flat = em.select(F.posexplode("embedding").alias("dim", "v")).select(
        F.col("dim").cast("long").alias("dim"), s.alias("s")
    )
    mean = F.sum("s").cast("double") / F.count(F.lit(1)) / 10_000_000
    ex2 = (
        F.sum((F.col("s") * F.col("s")).cast("decimal(38,0)")).cast("double")
        / F.count(F.lit(1))
        / F.lit(1e14)
    )
    return flat.groupBy("dim").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(mean, 6).alias("mean_v"),
        F.round(ex2 - mean * mean, 6).alias("var_v"),
    )
