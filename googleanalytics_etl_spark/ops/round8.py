"""Round-8 batch 1: streaming mergeability certifications for the other
two mergeable-sketch families (VERDICT r7 item 7) — the ``s_hll_merge``
pattern (per-batch sketch state folds into running state; the fold must
equal the whole-log batch sketch EXACTLY) applied to quantiles and to
theta-style distinct counting.

- ``s_kll_merge`` — mergeable-QUANTILE certification. The production
  KLL path (sketches.py, Spark's DataSketches ``kll_sketch_agg_double``
  / ``kll_merge_agg_double``) is randomized, so it can't be cross-engine
  hash-oracled (same reason ``q_approx_distinct`` is rows-only); its
  error bound is pytest-certified. This key certifies the identical
  MERGE algebra on the deterministic twin: a fixed-grid equi-width
  histogram (a compactor-free KLL level 0). Per micro-batch the batch's
  bin counts are computed distributed (groupBy-SUM); the driver folds
  them by integer addition (counts form a commutative monoid — the
  property that lets a 100 TB quantile roll up per partition/hour with
  ~B ints of state and no re-scan). The folded histogram answers
  p50/p90/p99 by upper-bin-edge rank search, and each answer carries a
  RANK certification computed from the raw table: the count of values
  strictly below the estimate must reach the target rank — true by
  construction iff the fold equals the whole-log histogram.
- ``s_theta_merge`` — theta-sketch (bottom-k / KMV) distinct-count
  certification. Per micro-batch: 60-bit md5 hashes of the batch's
  event_ids, keep the k smallest (a distributed ORDER BY LIMIT k —
  k rows of bounded metadata per batch). Fold: k-smallest of the union
  of per-batch k-smallest sets, which equals the k-smallest of the
  whole log exactly (bottom-k is a semilattice — the theta sketch's
  defining mergeability, and unlike HLL it supports set INTERSECTION,
  which is why both families exist). Estimate: (k-1)·2^60 / h_(k),
  certified within 3/√(k-2) of the exact distinct count, and
  hash-certified against the identical DuckDB computation.

Both carry FULL DuckDB oracles (the sketches are deterministic given
the hash/grid), closing the mergeable-family certification triangle:
HLL (r7) + KLL-twin + Theta-twin.

Reference parity: no analogue [REF-UNVERIFIED — /root/reference is
empty]; SURVEY §2 H/L sketch-family certification discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

# --- s_kll_merge: fixed-grid histogram (deterministic KLL twin) -------
# events.value spans [0, ~600] across fixtures; domain [0, 1000) with
# W = 4.0 (a power of two: value/W is an exact binary scaling, so FLOOR
# is bit-deterministic cross-engine) and values >= hi clamped into the
# last bin.
_KLL_B = 250
_KLL_W = 4.0
_KLL_QS = (0.5, 0.9, 0.99)

_KLL_ORACLE = f"""
WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events),
hist AS (
    SELECT CAST(LEAST(FLOOR(value / {_KLL_W}), {_KLL_B - 1}) AS BIGINT)
        AS b,
           COUNT(*) AS c
    FROM events GROUP BY 1
), cum AS (
    SELECT b, SUM(c) OVER (ORDER BY b) AS cum FROM hist
), qs AS (
    SELECT unnest([{", ".join(f"CAST({q} AS DOUBLE)" for q in _KLL_QS)}])
        AS q
), tgt AS (
    SELECT q, CAST(CEIL(q * n.n) AS BIGINT) AS target_rank
    FROM qs CROSS JOIN n
), pick AS (
    SELECT t.q, t.target_rank, CAST(MIN(c.b) AS BIGINT) AS bin_idx
    FROM tgt t JOIN cum c ON c.cum >= t.target_rank
    GROUP BY t.q, t.target_rank
), est AS (
    -- CAST: bigint * decimal-literal is DECIMAL(21,1) in DuckDB, but
    -- the Spark side computes a DOUBLE (exact either way — W is a
    -- power of two and bin_idx is small)
    SELECT q, target_rank, bin_idx,
           CAST((bin_idx + 1) * {_KLL_W} AS DOUBLE) AS est
    FROM pick
)
SELECT e.q, e.target_rank, e.bin_idx, e.est,
       CAST(COUNT(ev.value) AS BIGINT) AS cnt_below,
       CAST(CASE WHEN COUNT(ev.value) >= e.target_rank THEN 1 ELSE 0 END
            AS BIGINT) AS in_bound
FROM est e LEFT JOIN events ev ON ev.value < e.est
GROUP BY e.q, e.target_rank, e.bin_idx, e.est
ORDER BY e.q
"""


@register("s_kll_merge", oracle=_KLL_ORACLE)
def s_kll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming mergeable quantiles: per micro-batch, the batch's
    fixed-grid histogram (groupBy-SUM, distributed); driver folds bin
    counts by addition ({b} ints of state — bounded metadata); the
    folded histogram answers p50/p90/p99 by upper-edge rank search and
    each answer is rank-certified against the raw table. Because count
    addition is a commutative monoid, the fold equals the whole-log
    histogram exactly — the property the full DuckDB oracle certifies.

    Scale shape: per-batch state is B bin counts however many rows the
    batch held; the certification join broadcasts 3 rows against one
    event scan. At 100 TB the same fold runs per partition with no
    driver involvement (groupBy(bin) is already the merge).
    """
    from .streaming import _events_stream, _stage_events, _sweep_runs

    stage = _stage_events(spark, sf_dir)
    ckpt = _sweep_runs("kll_merge") / "ckpt"
    state: dict[int, int] = {}

    bin_col = F.least(
        F.floor(F.col("value") / _KLL_W), F.lit(_KLL_B - 1)
    ).cast("long")

    def fold_batch(batch_df: DataFrame, epoch_id: int) -> None:
        # <= B rows — bounded metadata, never data-scale
        for row in (
            batch_df.select(bin_col.alias("b"))
            .groupBy("b")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        ):
            b = int(row["b"])
            state[b] = state.get(b, 0) + int(row["c"])

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

    import math

    n = sum(state.values())
    rows = []
    for quant in _KLL_QS:
        target = int(math.ceil(quant * n))
        cum = 0
        bin_idx = _KLL_B - 1
        for b in sorted(state):
            cum += state[b]
            if cum >= target:
                bin_idx = b
                break
        rows.append((quant, target, bin_idx, (bin_idx + 1) * _KLL_W))

    qdf = spark.createDataFrame(
        rows, "q double, target_rank long, bin_idx long, est double"
    )
    ev = load(spark, sf_dir, "events").select("value")
    return (
        F.broadcast(qdf)
        .join(ev, F.col("value") < F.col("est"), "left")
        .groupBy("q", "target_rank", "bin_idx", "est")
        .agg(F.count(F.col("value")).alias("cnt_below"))
        .select(
            "q",
            "target_rank",
            "bin_idx",
            "est",
            "cnt_below",
            F.when(F.col("cnt_below") >= F.col("target_rank"), 1)
            .otherwise(0)
            .cast("long")
            .alias("in_bound"),
        )
        .orderBy("q")
    )


s_kll_merge.__doc__ = s_kll_merge.__doc__.format(b=_KLL_B)


# --- s_theta_merge: bottom-k (KMV) theta sketch ------------------------
_KMV_K = 256
_KMV_SPACE = float(1 << 60)  # 15 hex chars of md5 = 60-bit hash space

_THETA_ORACLE = f"""
WITH u AS (
    SELECT DISTINCT CAST('0x' ||
        substr(md5('kmv:' || CAST(event_id AS VARCHAR)), 1, 15) AS BIGINT)
        AS hv
    FROM events
), bot AS (
    SELECT hv FROM u ORDER BY hv LIMIT {_KMV_K}
), kk AS (
    SELECT CAST(MAX(hv) AS BIGINT) AS kth_hv,
           CAST(COUNT(*) AS BIGINT) AS seen
    FROM bot
), ex AS (
    SELECT CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_exact FROM events
), est AS (
    SELECT kk.kth_hv, kk.seen, ex.n_exact,
           CASE WHEN kk.seen < {_KMV_K} THEN CAST(kk.seen AS DOUBLE)
                ELSE {_KMV_K - 1}.0 * {_KMV_SPACE!r}
                     / CAST(kk.kth_hv AS DOUBLE) END AS raw
    FROM kk CROSS JOIN ex
)
SELECT CAST({_KMV_K} AS BIGINT) AS k, n_exact, kth_hv,
       ROUND(raw, 2) AS est,
       ROUND(ABS(raw - n_exact) / n_exact, 6) AS rel_err,
       CAST(CASE WHEN ABS(raw - n_exact) / n_exact
                      <= 3.0 / SQRT({_KMV_K - 2}.0)
            THEN 1 ELSE 0 END AS BIGINT) AS in_bound
FROM est
"""


@register("s_theta_merge", oracle=_THETA_ORACLE)
def s_theta_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming theta-sketch (bottom-k/KMV) distinct count: per
    micro-batch the batch's k smallest 60-bit hashes (distributed
    ORDER BY LIMIT k — k rows of bounded metadata); the driver folds by
    keeping the k smallest of the union, which IS the whole-log sketch
    (bottom-k is a semilattice: idempotent, commutative, associative —
    replays and overlapping rollups are free). Estimate
    (k-1)·2^60/h_(k) is certified within 3/sqrt(k-2) of the exact
    distinct count and hash-certified against the identical DuckDB
    computation. Theta's edge over HLL (``s_hll_merge``): bottom-k
    states also intersect, enabling sketch-space audience overlap
    (sketches.py theta_intersection_estimate).
    """
    from .streaming import _events_stream, _stage_events, _sweep_runs

    stage = _stage_events(spark, sf_dir)
    ckpt = _sweep_runs("theta_merge") / "ckpt"
    state: set[int] = set()

    hv = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("kmv:"), F.col("event_id").cast("string")
                ).cast("binary")
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")

    def fold_batch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_bot = (
            batch_df.select(hv.alias("hv"))
            .distinct()
            .orderBy("hv")
            .limit(_KMV_K)
            .collect()
        )  # <= k rows — bounded metadata
        state.update(int(r["hv"]) for r in batch_bot)
        if len(state) > _KMV_K:
            for h in sorted(state)[_KMV_K:]:
                state.discard(h)

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

    bot = sorted(state)[:_KMV_K]
    seen = len(bot)
    kth = bot[-1] if bot else 0
    raw = (
        float(seen)
        if seen < _KMV_K
        else (_KMV_K - 1) * _KMV_SPACE / float(kth)
    )
    ex = load(spark, sf_dir, "events").agg(
        F.countDistinct("event_id").cast("long").alias("n_exact")
    )
    rel = F.abs(F.lit(raw) - F.col("n_exact")) / F.col("n_exact")
    return ex.select(
        F.lit(_KMV_K).cast("long").alias("k"),
        "n_exact",
        F.lit(kth).cast("long").alias("kth_hv"),
        F.round(F.lit(raw), 2).alias("est"),
        F.round(rel, 6).alias("rel_err"),
        F.when(rel <= 3.0 / ((_KMV_K - 2) ** 0.5), 1)
        .otherwise(0)
        .cast("long")
        .alias("in_bound"),
    )


# --- x_kmv_diff: sketch-space set DIFFERENCE --------------------------
# Domain: (user_id, day) activity pairs — "view-days minus purchase-
# days". Cardinality ~ users x days clears k at every fixture SF (the
# raw user_id domain at sf0.01 is 150 < k and would degenerate to the
# exact branch).
_KMVD_K = 256

_KMVD_ORACLE = f"""
WITH pairs AS (
    SELECT user_id, CAST(ts AS DATE) AS day,
           MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS in_a,
           MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS in_b
    FROM events
    WHERE event_type IN ('view', 'purchase')
    GROUP BY user_id, CAST(ts AS DATE)
), hashed AS (
    SELECT CAST('0x' || substr(md5('kmvd:' || CAST(user_id AS VARCHAR)
               || ':' || CAST(day AS VARCHAR)), 1, 15) AS BIGINT) AS hv,
           in_a, in_b
    FROM pairs
), bot AS (
    SELECT hv, in_a, in_b FROM hashed ORDER BY hv LIMIT {_KMVD_K}
), kk AS (
    SELECT CAST(MAX(hv) AS BIGINT) AS kth_hv,
           CAST(COUNT(*) AS BIGINT) AS seen,
           CAST(SUM(CASE WHEN in_a = 1 AND in_b = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS k_diff
    FROM bot
), ex AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_union,
           CAST(SUM(CASE WHEN in_a = 1 AND in_b = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_diff
    FROM pairs
), est AS (
    SELECT kk.kth_hv, kk.seen, kk.k_diff, ex.n_union, ex.n_diff,
           CASE WHEN kk.seen < {_KMVD_K} THEN CAST(kk.seen AS DOUBLE)
                ELSE {_KMVD_K - 1}.0 * {float(1 << 60)!r}
                     / CAST(kk.kth_hv AS DOUBLE) END AS est_union,
           CAST(kk.k_diff AS DOUBLE) / kk.seen AS frac_k,
           CAST(ex.n_diff AS DOUBLE) / ex.n_union AS frac_exact
    FROM kk CROSS JOIN ex
)
SELECT CAST({_KMVD_K} AS BIGINT) AS k, n_union, n_diff, kth_hv,
       ROUND(est_union, 2) AS est_union,
       ROUND(frac_k, 6) AS frac_k,
       ROUND(frac_k * est_union, 2) AS est_diff,
       ROUND(ABS(frac_k - frac_exact), 6) AS frac_err,
       CAST(CASE WHEN ABS(frac_k - frac_exact)
                      <= 3.0 * SQRT(0.25 / {_KMVD_K}.0)
            THEN 1 ELSE 0 END AS BIGINT) AS in_bound
FROM est
"""


@register("x_kmv_diff", oracle=_KMVD_ORACLE)
def x_kmv_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-space set DIFFERENCE — |view-days \\ purchase-days| from
    one bottom-k sketch of the union: the bottom-k hashes are a
    uniform sample of the distinct union, so carrying per-element
    membership flags into the sketch prices ANY set expression
    (difference, intersection, symmetric difference) at k rows of
    state — the operation HLL cannot express at all and exact SQL
    pays a data-scale anti-join for (the theta-sketch trick,
    deterministic here because the hash is md5: full cross-engine
    oracle, like ``s_theta_merge``). Estimate = (fraction of the k
    sample in A\\B) x (KMV union estimate); the sampling-fraction
    error is certified against the exact fraction with the 3-sigma
    Bernoulli bound 3*sqrt(0.25/k).

    Scale shape: one (user, day) hash-aggregate (map-side-combinable
    flags), a distributed TakeOrdered(k) — k rows of metadata to the
    driver, never data — and an exact-count scan for the
    certification columns only; a production caller keeps just the
    k-row sketch per segment/partition and merges by re-taking the
    k smallest (the ``s_theta_merge`` semilattice).
    """
    ev = load(spark, sf_dir, "events").where(
        F.col("event_type").isin("view", "purchase")
    )
    pairs = (
        ev.select(
            "user_id",
            F.col("ts").cast("timestamp").cast("date").alias("day"),
            "event_type",
        )
        .groupBy("user_id", "day")
        .agg(
            F.max(
                F.when(F.col("event_type") == "view", 1).otherwise(0)
            ).alias("in_a"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("in_b"),
        )
    )
    hv = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("kmvd:"),
                    F.col("user_id").cast("string"),
                    F.lit(":"),
                    F.col("day").cast("string"),
                ).cast("binary")
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    hashed = pairs.select(hv.alias("hv"), "in_a", "in_b")
    bot = hashed.orderBy("hv").limit(_KMVD_K)
    kk = bot.agg(
        F.max("hv").cast("long").alias("kth_hv"),
        F.count(F.lit(1)).cast("long").alias("seen"),
        F.sum(
            F.when((F.col("in_a") == 1) & (F.col("in_b") == 0), 1).otherwise(0)
        )
        .cast("long")
        .alias("k_diff"),
    )
    ex = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_union"),
        F.sum(
            F.when((F.col("in_a") == 1) & (F.col("in_b") == 0), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_diff"),
    )
    est_union = F.when(
        F.col("seen") < _KMVD_K, F.col("seen").cast("double")
    ).otherwise(
        F.lit(float(_KMVD_K - 1))
        * F.lit(float(1 << 60))
        / F.col("kth_hv").cast("double")
    )
    frac_k = F.col("k_diff").cast("double") / F.col("seen")
    frac_exact = F.col("n_diff").cast("double") / F.col("n_union")
    return (
        kk.crossJoin(ex)
        .withColumn("eu", est_union)
        .withColumn("fk", frac_k)
        .select(
            F.lit(_KMVD_K).cast("long").alias("k"),
            "n_union",
            "n_diff",
            "kth_hv",
            F.round(F.col("eu"), 2).alias("est_union"),
            F.round(F.col("fk"), 6).alias("frac_k"),
            F.round(F.col("fk") * F.col("eu"), 2).alias("est_diff"),
            F.round(F.abs(F.col("fk") - frac_exact), 6).alias("frac_err"),
            F.when(
                F.abs(F.col("fk") - frac_exact)
                <= 3.0 * (0.25 / _KMVD_K) ** 0.5,
                1,
            )
            .otherwise(0)
            .cast("long")
            .alias("in_bound"),
        )
    )


# --- s_countmin_merge: streaming fold of the Count-Min counter matrix --
def _s_countmin_oracle() -> str:
    from .round7 import _countmin_bound_oracle

    return _countmin_bound_oracle()


@register("s_countmin_merge", oracle=_s_countmin_oracle())
def s_countmin_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming mergeable Count-Min — the last of the four mergeable
    sketch families to get its fold certification (HLL register-MAX
    r7, histogram/theta count-ADD and bottom-k r8): per micro-batch the
    batch's d×w counter increments are computed distributed (the
    x_countmin hash aggregate — ≤ d·w rows of bounded metadata per
    batch however many events it held) and folded into running state by
    integer ADDITION. Counter matrices form a commutative monoid, so
    the fold equals the whole-log sketch EXACTLY — certified by sharing
    x_countmin_bound's full oracle: top-10 heavy-hitter estimates from
    the FOLDED counters must hash-match the batch-sketch computation
    cell-for-cell, and every estimate must satisfy
    ``true ≤ est ≤ true + ⌈(e/w)·N⌉``.

    This is the 100 TB frequency rollup: per-partition/hour CM matrices
    add without re-reading history (constant d×w state), exactly how a
    streaming heavy-hitter monitor ships its counters to a central
    fold.
    """
    from .extensions import _CM_D, _CM_W
    from .streaming import _events_stream, _stage_events, _sweep_runs

    stage = _stage_events(spark, sf_dir)
    ckpt = _sweep_runs("cm_merge") / "ckpt"
    state: dict[tuple[int, int], int] = {}

    i = F.explode(F.array(*[F.lit(k) for k in range(_CM_D)])).alias("i")
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.col("i").cast("string"), F.col("uid")
                    ).cast("binary")
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % _CM_W
    ).alias("bucket")

    def fold_batch(batch_df: DataFrame, epoch_id: int) -> None:
        rows = (
            batch_df.select(F.col("user_id").cast("string").alias("uid"))
            .select("uid", i)
            .select("uid", "i", bucket)
            .groupBy("i", "bucket")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .collect()
        )  # <= d*w rows — bounded metadata, never data-scale
        for r in rows:
            key = (int(r["i"]), int(r["bucket"]))
            state[key] = state.get(key, 0) + int(r["n"])

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

    counters = spark.createDataFrame(
        [(ik, bk, n) for (ik, bk), n in state.items()],
        "i int, bucket long, n long",
    )
    ev = load(spark, sf_dir, "events")
    keyed = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("true_n")
    )
    cand = keyed.orderBy(F.desc("true_n"), "user_id").limit(10)
    probes = (
        cand.select(
            "user_id", "true_n", F.col("user_id").cast("string").alias("uid")
        )
        .select("user_id", "true_n", i)
        .select(
            "user_id",
            "true_n",
            "i",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                ":",
                                F.col("i").cast("string"),
                                F.col("user_id").cast("string"),
                            ).cast("binary")
                        ),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("long")
                % _CM_W
            ).alias("bucket"),
        )
    )
    est = (
        F.broadcast(probes)
        .join(counters, ["i", "bucket"])
        .groupBy("user_id", "true_n")
        .agg(F.min("n").cast("long").alias("est_n"))
    )
    tot = ev.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    slack = F.ceil(
        F.lit(2.718281828459045) * F.col("n_total").cast("double") / F.lit(_CM_W)
    ).cast("long")
    return est.crossJoin(F.broadcast(tot)).select(
        "user_id",
        "true_n",
        "est_n",
        "n_total",
        F.when(
            (F.col("est_n") >= F.col("true_n"))
            & (F.col("est_n") <= F.col("true_n") + slack),
            1,
        )
        .otherwise(0)
        .cast("long")
        .alias("in_bound"),
    )
