"""Round-5 pre-work, second batch: the data-mixing / quality-signal /
tokenizer-training operators a 100 TB curation pipeline runs between
dedup and shipping shards.

- ``x_mixture_sample`` — temperature-scaled source mixing (α = 0.5):
  the "data mixture" step every LLM corpus goes through — upweight
  rare domains, downsample dominant ones — realized as a two-pass
  stats-then-deterministic-hash-sample plan with NO driver collect.
- ``x_token_entropy`` — per-document Shannon entropy of the token
  distribution: the low-entropy (boilerplate/spam) quality filter.
- ``x_winsorize`` — per-group winsorized mean (clip at p05/p95 picked
  by exact discrete rank): the robust-metric aggregation pattern.
- ``x_neighbor_jaccard`` — audience-overlap Jaccard between event
  types from distinct (user, type) sets: the co-occurrence graph
  node-similarity kernel (shared-neighbor / min-wise overlap).
- ``x_bpe_merge`` — BPE first-merge candidates: adjacent symbol-pair
  frequencies over the word-frequency table (the inner loop of
  tokenizer training), aggregated vocab-first so the pair explosion
  runs over |vocab|, not |corpus|.
- ``x_semdedup`` — SemDeDup-style semantic dedup: coarse-quantize
  every vector to its nearest seed centroid (the IVF assignment),
  then intra-cluster cosine pairs ≥ τ pick survivors — pair space is
  Σ|cluster|², never n².

Cross-engine determinism follows registry.py conventions: exact
DECIMAL(18,4) sums for anything order-sensitive, ROUND(…, 6) before
any float threshold, explicit unique tiebreakers on every rank.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register


# ---------------------------------------------------------------------------
# x_mixture_sample — temperature-scaled source mixing
# ---------------------------------------------------------------------------

_MIXTURE_ORACLE = """
WITH counts AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SQRT(CAST(COUNT(*) AS DOUBLE)) AS DECIMAL(18,4)) AS sq
    FROM documents GROUP BY source
), tot AS (
    SELECT CAST(SUM(sq) AS DOUBLE) AS z, SUM(n_docs) AS n_total FROM counts
), rates AS (
    SELECT source, n_docs,
           ROUND(CAST(sq AS DOUBLE) / z, 6) AS weight,
           LEAST(1.0, ROUND(0.5 * n_total * (CAST(sq AS DOUBLE) / z) / n_docs,
                            4)) AS rate
    FROM counts, tot
), thr AS (
    SELECT source, n_docs, weight, rate,
           CAST(FLOOR(rate * 65536) AS BIGINT) AS t
    FROM rates
)
SELECT d.source, r.n_docs, r.weight, r.rate,
       CAST(SUM(CASE WHEN r.rate >= 1.0
                     OR CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4)
                             AS BIGINT) < r.t
                THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
FROM documents d JOIN thr r USING (source)
GROUP BY d.source, r.n_docs, r.weight, r.rate
"""


@register("x_mixture_sample", oracle=_MIXTURE_ORACLE)
def x_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture sampling (α = 0.5, target = 50 % of
    corpus): weight each source ∝ √n so rare domains are upweighted,
    derive a per-source keep-rate, and select rows with a deterministic
    md5-prefix threshold (replay-stable under retries, unlike
    ``df.sample``).

    Plan shape: stats pass (per-source counts — a ~|sources|-row agg),
    weights derived on that TINY frame (cross-join with its 1-row
    total: metadata-scale, broadcast), then the selection pass re-scans
    the fact with the rate table BROADCAST back — two linear scans, one
    shuffle on ``source``, no driver collect. The √n sum is
    order-sensitive in doubles, so each √n is quantized to exact
    DECIMAL(18,4) before the sum (registry convention).
    """
    d = load(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sqrt(F.count(F.lit(1)).cast("double"))
        .cast("decimal(18,4)")
        .alias("sq"),
    )
    tot = counts.agg(
        F.sum("sq").cast("double").alias("z"),
        F.sum("n_docs").alias("n_total"),
    )
    rates = counts.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        F.round(F.col("sq").cast("double") / F.col("z"), 6).alias("weight"),
        F.least(
            F.lit(1.0),
            F.round(
                0.5
                * F.col("n_total")
                * (F.col("sq").cast("double") / F.col("z"))
                / F.col("n_docs"),
                4,
            ),
        ).alias("rate"),
    )
    thr = rates.withColumn(
        "t", F.floor(F.col("rate") * 65536).cast("long")
    )
    hv = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 4),
        16,
        10,
    ).cast("long")
    picked = (
        d.join(F.broadcast(thr), "source")
        .withColumn(
            "keep",
            F.when((F.col("rate") >= 1.0) | (hv < F.col("t")), 1).otherwise(0),
        )
        .groupBy("source", "n_docs", "weight", "rate")
        .agg(F.sum("keep").cast("long").alias("n_sampled"))
    )
    return picked.select("source", "n_docs", "weight", "rate", "n_sampled")


# ---------------------------------------------------------------------------
# x_token_entropy — per-document token-distribution entropy
# ---------------------------------------------------------------------------

_ENTROPY_ORACLE = """
WITH tf AS (
    SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
    FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents
    )
    WHERE tok <> ''
    GROUP BY doc_id, tok
)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       ROUND(LOG2(CAST(SUM(c) AS DOUBLE))
             - CAST(SUM(CAST(c * LOG2(CAST(c AS DOUBLE)) AS DECIMAL(18,4)))
                    AS DOUBLE) / SUM(c),
             6) AS entropy
FROM tf
GROUP BY doc_id
"""


@register("x_token_entropy", oracle=_ENTROPY_ORACLE)
def x_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each document's token distribution — the
    boilerplate/spam signal (low entropy = repetitive text) used as a
    quality gate next to :func:`x_quality_score`.

    Uses the algebraic identity H = log2(n) − (Σ c·log2 c)/n so the
    whole thing is two hash aggregates over exploded tokens — no
    per-doc sort, no window. The Σ c·log2 c partial sums are quantized
    to DECIMAL(18,4) per term so Spark's partial/final aggregation
    order and DuckDB's agree exactly (registry convention: doubles are
    never summed as doubles).
    """
    d = load(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    term = (F.col("c").cast("double") * F.log2(F.col("c").cast("double"))).cast(
        "decimal(18,4)"
    )
    return tf.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.round(
            F.log2(F.sum("c").cast("double"))
            - F.sum(term).cast("double") / F.sum("c"),
            6,
        ).alias("entropy"),
    )


# ---------------------------------------------------------------------------
# x_winsorize — winsorized group means (clip at exact-rank p05/p95)
# ---------------------------------------------------------------------------

_WINSORIZE_ORACLE = """
WITH ranked AS (
    SELECT o_orderpriority, o_totalprice,
           ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice, o_orderkey) AS rn,
           COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
    FROM orders
), bounds AS (
    SELECT o_orderpriority,
           MAX(CASE WHEN rn = CAST(CEIL(0.05 * n) AS BIGINT)
                    THEN o_totalprice END) AS lo,
           MAX(CASE WHEN rn = CAST(CEIL(0.95 * n) AS BIGINT)
                    THEN o_totalprice END) AS hi,
           CAST(MAX(n) AS BIGINT) AS n_orders
    FROM ranked GROUP BY o_orderpriority
)
SELECT o.o_orderpriority, b.n_orders,
       ROUND(b.lo, 2) AS p05, ROUND(b.hi, 2) AS p95,
       ROUND(CAST(SUM(CAST(LEAST(GREATEST(o.o_totalprice, b.lo), b.hi)
                           AS DECIMAL(18,4))) AS DOUBLE)
             / COUNT(*), 4) AS win_avg
FROM orders o JOIN bounds b USING (o_orderpriority)
GROUP BY o.o_orderpriority, b.n_orders, b.lo, b.hi
"""


@register("x_winsorize", oracle=_WINSORIZE_ORACLE)
def x_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean of order value per priority class: clip at the
    exact-rank p05/p95 (discrete picks — actual data values, so the
    bounds are bit-identical cross-engine, unlike interpolated
    percentiles) and average the clipped column with an exact decimal
    sum.

    Two shuffles on the 5-value group key: the rank window (which
    streams — no per-group materialization) and the final agg; the
    bounds frame is ~|groups| rows and is BROADCAST back onto the
    fact scan. This is the outlier-robust aggregation recipe for
    revenue-style heavy-tailed metrics.
    """
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    cw = Window.partitionBy("o_orderpriority")
    ranked = o.select(
        "o_orderpriority",
        "o_totalprice",
        F.row_number().over(w).cast("long").alias("rn"),
        F.count(F.lit(1)).over(cw).cast("long").alias("n"),
    )
    bounds = ranked.groupBy("o_orderpriority").agg(
        F.max(
            F.when(
                F.col("rn") == F.ceil(0.05 * F.col("n")).cast("long"),
                F.col("o_totalprice"),
            )
        ).alias("lo"),
        F.max(
            F.when(
                F.col("rn") == F.ceil(0.95 * F.col("n")).cast("long"),
                F.col("o_totalprice"),
            )
        ).alias("hi"),
        F.max("n").cast("long").alias("n_orders"),
    )
    clipped = F.least(F.greatest(F.col("o_totalprice"), F.col("lo")), F.col("hi"))
    return (
        o.join(F.broadcast(bounds), "o_orderpriority")
        .groupBy("o_orderpriority", "n_orders", "lo", "hi")
        .agg(
            F.round(
                F.sum(clipped.cast("decimal(18,4)")).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("win_avg")
        )
        .select(
            "o_orderpriority",
            "n_orders",
            F.round("lo", 2).alias("p05"),
            F.round("hi", 2).alias("p95"),
            "win_avg",
        )
    )


# ---------------------------------------------------------------------------
# x_neighbor_jaccard — audience-overlap Jaccard between event types
# ---------------------------------------------------------------------------

_NJACCARD_ORACLE = """
WITH pairs AS (
    SELECT DISTINCT user_id, event_type FROM events
), sizes AS (
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM pairs GROUP BY 1
), inter AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(COUNT(*) AS BIGINT) AS n_both
    FROM pairs a JOIN pairs b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY 1, 2
)
SELECT i.type_a, i.type_b, sa.n AS n_a, sb.n AS n_b, i.n_both,
       ROUND(CAST(i.n_both AS DOUBLE) / (sa.n + sb.n - i.n_both), 6)
           AS jaccard
FROM inter i
JOIN sizes sa ON sa.event_type = i.type_a
JOIN sizes sb ON sb.event_type = i.type_b
"""


@register("x_neighbor_jaccard", oracle=_NJACCARD_ORACLE)
def x_neighbor_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard similarity of event-type audiences (distinct-user sets):
    the shared-neighbor node-similarity kernel of co-occurrence graphs
    (users≍documents, types≍shingles — the same shape MinHash
    approximates; here the type cardinality is tiny so it's exact).

    NO self-join: one shuffle on ``user_id`` collapses the fact to a
    sorted per-user type-set array, then both the per-type sizes AND
    the in-row pair expansion (|types per user|² ≤ 25, assembled by a
    codegen ``transform`` lattice inside the row) reuse that frame —
    the pair counting that a naive plan does with a user-keyed
    self-join (a second full exchange of the edge set) happens without
    moving the data again. Sizes are a ~|types|-row agg joined back
    broadcast.
    """
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sort_array(F.collect_set("event_type")).alias("ts")
    )
    sizes = per_user.select(F.explode("ts").alias("event_type")).groupBy(
        "event_type"
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    # in-row ordered pairs: flatten(transform(i, transform(j>i, (ts[i], ts[j]))))
    pair_expr = F.expr(
        "flatten(transform(sequence(1, size(ts) - 1),"
        " i -> transform(sequence(i + 1, size(ts)),"
        " j -> struct(ts[i - 1] AS type_a, ts[j - 1] AS type_b))))"
    )
    inter = (
        per_user.where(F.size("ts") >= 2)
        .select(F.explode(pair_expr).alias("p"))
        .groupBy(
            F.col("p.type_a").alias("type_a"), F.col("p.type_b").alias("type_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    sa = sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_both",
            F.round(
                F.col("n_both").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_both")),
                6,
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# x_bpe_merge — BPE first-merge candidate pairs (vocab-first)
# ---------------------------------------------------------------------------

_BPE_ORACLE = """
WITH vocab AS (
    SELECT tok, CAST(COUNT(*) AS BIGINT) AS wc
    FROM (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    )
    WHERE length(tok) >= 2
    GROUP BY tok
), pairs AS (
    SELECT unnest(list_transform(generate_series(1, length(tok) - 1),
                                 i -> substring(tok, i, 2))) AS pair,
           wc
    FROM vocab
)
SELECT pair, CAST(SUM(wc) AS BIGINT) AS n
FROM pairs
GROUP BY pair
ORDER BY n DESC, pair
LIMIT 30
"""


@register("x_bpe_merge", oracle=_BPE_ORACLE)
def x_bpe_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-30 BPE merge candidates: corpus frequency of every adjacent
    character pair, the inner statistic of byte-pair-encoding tokenizer
    training.

    Scale trick (the reason real BPE trainers are feasible): aggregate
    to the WORD-FREQUENCY table first — pair explosion then runs over
    |vocab| distinct words (≈√corpus by Heaps' law), each weighted by
    its count, instead of every token occurrence. Two hash aggregates
    + in-array pair assembly (JVM codegen ``transform``/``sequence``,
    no UDF), TakeOrdered(30) with a total tiebreak — no global sort.
    """
    d = load(spark, sf_dir, "documents")
    vocab = (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .where(F.length("tok") >= 2)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("wc"))
    )
    pairs = vocab.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(tok) - 1),"
                " i -> substring(tok, i, 2))"
            )
        ).alias("pair"),
        "wc",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wc").cast("long").alias("n"))
        .orderBy(F.col("n").desc(), "pair")
        .limit(30)
    )


# ---------------------------------------------------------------------------
# x_semdedup — centroid-bucketed semantic dedup
# ---------------------------------------------------------------------------

def ivf_oracle_ctes() -> str:
    """DuckDB CTE chain mirroring :func:`ivf_seeds` + the final
    assignment, appended after a CTE named ``em(vec_id, emb, …)``.
    Produces ``assign(vec_id, cluster)``. Every step is the exact
    cross-engine recipe: k = ⌈√n⌉ via CEIL(SQRT(COUNT(*))) (IEEE sqrt
    is correctly rounded in both engines), round-6 cosine argmax with
    seed-id tiebreak, and centroid means from round(val·10⁷) longs."""
    return """, vdim AS (
    SELECT vec_id, generate_subscripts(emb, 1) AS dim, unnest(emb) AS val
    FROM em
), c0 AS (
    SELECT vec_id AS seed_id, emb AS semb FROM em
    WHERE vec_id < (SELECT CAST(CEIL(SQRT(COUNT(*))) AS BIGINT) FROM em)
), a0 AS (
    SELECT vec_id, cluster FROM (
        SELECT v.vec_id, s.seed_id AS cluster,
               ROW_NUMBER() OVER (
                   PARTITION BY v.vec_id
                   ORDER BY ROUND(list_cosine_similarity(v.emb, s.semb), 6)
                            DESC, s.seed_id) AS rn
        FROM em v, c0 s
    ) WHERE rn = 1
), cmean AS (
    SELECT a.cluster AS seed_id, d.dim,
           CAST(SUM(CAST(ROUND(d.val * 10000000) AS BIGINT)) AS DOUBLE)
               / COUNT(*) / 10000000 AS cval
    FROM vdim d JOIN a0 a USING (vec_id)
    GROUP BY a.cluster, d.dim
), seeds AS (
    SELECT seed_id, LIST(cval ORDER BY dim) AS semb
    FROM cmean GROUP BY seed_id
), assign AS (
    SELECT vec_id, cluster FROM (
        SELECT v.vec_id, s.seed_id AS cluster,
               ROW_NUMBER() OVER (
                   PARTITION BY v.vec_id
                   ORDER BY ROUND(list_cosine_similarity(v.emb, s.semb), 6)
                            DESC, s.seed_id) AS rn
        FROM em v, seeds s
    ) WHERE rn = 1
)"""


_SEMDEDUP_ORACLE = f"""
WITH em AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
    UNION ALL
    SELECT vec_id + 1000000, CAST(embedding AS DOUBLE[]) AS emb
    FROM embeddings WHERE vec_id < 10
){ivf_oracle_ctes()}, dup_pairs AS (
    SELECT x.cluster, x.vec_id AS vec_a, y.vec_id AS vec_b
    FROM assign x
    JOIN assign y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
    JOIN em ea ON ea.vec_id = x.vec_id
    JOIN em eb ON eb.vec_id = y.vec_id
    WHERE ROUND(list_cosine_similarity(ea.emb, eb.emb), 6) >= 0.92
)
SELECT a.cluster,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(COALESCE(MAX(p.n_pairs), 0) AS BIGINT) AS n_dup_pairs,
       CAST(COALESCE(MAX(p.n_removed), 0) AS BIGINT) AS n_removed
FROM assign a
LEFT JOIN (
    SELECT cluster, COUNT(*) AS n_pairs,
           COUNT(DISTINCT vec_b) AS n_removed
    FROM dup_pairs GROUP BY cluster
) p ON p.cluster = a.cluster
GROUP BY a.cluster
"""


@register("x_semdedup_ivf", oracle=_SEMDEDUP_ORACLE)
def x_semdedup_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication, HIGH-RECALL variant
    (exact within cell — recall 1.0 for any pair that shares a nearest
    centroid; round-9 note: the registered scale path is now the
    sign-LSH banded ``x_semdedup`` in ops/round9.py, because this
    ⌈√n⌉-cell pair space is the designed n^1.5 — measured exponent 1.61
    on the round-8 scale probe): coarse-quantize every
    embedding to its nearest :func:`ivf_seeds` centroid — **k = ⌈√n⌉**
    Lloyd-refined cells, so the intra-cell pair space is Σ|cell|² ≈
    n^1.5 at ANY corpus size (a fixed k would degenerate to n²/k) —
    then find cosine-≥0.92 pairs ONLY within a cluster and count
    survivors (keep-lowest-id policy, same as the MinHash family).

    A duplicated tail (vec_id < 10 re-inserted at +1e6, identical
    vectors — organic max cosine ≈ 0.48) gives the operator planted
    positives: assignment is a pure function of the embedding given
    the trained seeds, so an identical pair always lands in the same
    cluster and blocking loses none of them. The seed set is k×d
    BROADCAST metadata; the intra-cluster self-join shuffles on the
    cluster id. Output: per-cluster member/dup-pair/removed counts.
    """
    base = load(spark, sf_dir, "embeddings")
    em = base.select("vec_id", "embedding").unionByName(
        base.where(F.col("vec_id") < 10).select(
            (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
        )
    )
    return semdedup_counts(em)


_IVF_SCALE = 10_000_000  # exact centroid means: round(val·10⁷) longs


def _l2(col) -> F.Column:
    """L2 norm of a float-array column (the sqrt half of :func:`cosine`)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sqrt(
        F.aggregate(
            c, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def _dot(a: F.Column, b: F.Column) -> F.Column:
    """Dot product of two float-array columns (the numerator of
    :func:`cosine` — pair with pre-hoisted :func:`_l2` norms so an n×k
    broadcast scan pays one fold per pair instead of three)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def ivf_seeds(em: DataFrame, n_seeds: int | None = None) -> DataFrame:
    """IVF coarse-quantizer training shared by the pair-space operators
    (SemDeDup, hard negatives, blocked k-NN join): k-means centroids
    with **k = ⌈√n⌉ by default** — the cell count that keeps the
    intra-cell pair space Σ|cell|² ≈ n^1.5 instead of n²/k at any fixed
    k. Init = the first k vectors by vec_id (deterministic — randomness
    is banned in derivations), then ONE exact Lloyd refinement:

    - assignment by round-6 cosine with seed-id tiebreak (the proven
      cross-engine argmax recipe);
    - centroid update = per-dim means of round(val·10⁷) longs divided
      back out — bit-identical doubles on both engines regardless of
      summation order (the ``x_kmeans`` construction).

    Returns a ``(seed_id, semb, snrm)`` frame of k×d doubles plus the
    hoisted centroid L2 norm — broadcast metadata (≈16 MB at n = 10⁹,
    d = 64). The refinement itself is one n×k broadcast scan plus a
    k×d-row aggregate; the corpus is never shuffled by cluster. Both
    n×k scans hoist the row/seed norms BELOW the join (one norm fold
    per vector, not per pair), so each candidate pair costs one dot
    fold; ``dot/(nrm·snrm)`` is the identical IEEE arithmetic to
    :func:`cosine` with the sqrt computed earlier, so the round-6
    values — and the DuckDB parity — are unchanged. Eagerly
    checkpointed — callers broadcast it into the final assignment."""
    if n_seeds is None:
        n_seeds = math.ceil(math.sqrt(em.count()))
    # init = the k SMALLEST vec_ids, not a literal `vec_id < k`
    # threshold: on a frame with sparse or offset ids the threshold form
    # silently shrinks the seed set (possibly to empty → empty
    # assignment downstream with no error). The cutoff is found by a
    # TakeOrdered over the SLIM id column (k longs to the driver — never
    # the embeddings, which a direct orderBy().limit() would funnel
    # through one partition), then applied as a pushdown-able filter.
    # On dense 0-based ids — every fixture, and the form the DuckDB
    # oracle CTEs assume — the k smallest ids ARE {0..k-1}, so
    # cross-engine parity holds.
    cut = (
        em.select("vec_id").orderBy("vec_id").limit(n_seeds)
        .agg(F.max("vec_id")).first()[0]
    )
    # hoist L2 norms below the broadcast join: the Project sits under
    # the join node, so each VECTOR pays one norm fold instead of one
    # per (vector, seed) pair; sim = dot/(nrm·snrm) is arithmetic-
    # identical to cosine() (sqrt merely computed earlier)
    emn = em.select("vec_id", "embedding", _l2("embedding").alias("nrm"))
    init = emn.where(F.col("vec_id") <= cut).select(
        F.col("vec_id").alias("seed_id"),
        F.col("embedding").alias("semb"),
        F.col("nrm").alias("snrm"),
    )
    scored0 = emn.crossJoin(F.broadcast(init)).select(
        "vec_id",
        F.round(
            _dot(F.col("embedding"), F.col("semb"))
            / (F.col("nrm") * F.col("snrm")),
            6,
        ).alias("sim"),
        "seed_id",
    )
    # argmax via max(struct): (sim, −seed_id) is unique per vec, so the
    # partial-aggregable max equals ROW_NUMBER(sim DESC, seed_id) = 1
    a0 = (
        scored0.groupBy("vec_id")
        .agg(
            F.max(
                F.struct(F.col("sim"), (-F.col("seed_id")).alias("ns"))
            ).alias("b")
        )
        .select("vec_id", (-F.col("b.ns")).alias("cluster"))
    )
    scaled = F.transform(
        "embedding",
        lambda x: F.round(x.cast("double") * _IVF_SCALE).cast("long"),
    )
    cmean = (
        em.join(a0, "vec_id")
        .select("cluster", F.posexplode(scaled).alias("dim", "sv"))
        .groupBy("cluster", "dim")
        .agg(
            (
                F.sum("sv").cast("double") / F.count(F.lit(1)) / F.lit(_IVF_SCALE)
            ).alias("cval")
        )
    )
    seeds = (
        cmean.groupBy(F.col("cluster").alias("seed_id"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "cval"))),
                lambda p: p["cval"],
            ).alias("semb")
        )
        .select("seed_id", "semb", _l2("semb").alias("snrm"))
    )
    return seeds.materialize(eager=True)


def seed_assign(
    em: DataFrame,
    n_seeds: int | None = None,
    seeds: DataFrame | None = None,
) -> DataFrame:
    """Coarse quantization shared by the SemDeDup, hard-negative and
    blocked-k-NN operators: assign every ``(vec_id, embedding, …)`` row
    to its nearest :func:`ivf_seeds` centroid (k = ⌈√n⌉ refined seeds
    by default; round-6 cosine, seed-id tiebreak), carrying the
    embedding and its hoisted L2 norm. Extra input columns pass
    through. Checkpointed eagerly — every caller reads the assignment
    from several plan branches.

    The argmax is the same partial-aggregable ``max(struct(sim, −seed_id,
    …))`` recipe as :func:`ivf_seeds` — NOT a ``row_number`` window: the
    window form would hash-exchange all n×k broadcast-product rows, each
    dragging the embedding + passthrough payload (an n^1.5-row shuffle at
    production k = ⌈√n⌉). ``max(struct)`` combines map-side — the
    broadcast crossJoin keeps every vec's k candidates inside one input
    partition, so partial aggregation collapses them before the exchange
    and only n rows (each carrying its embedding once) ever shuffle.
    (sim, −seed_id) is unique per vec — seed_id is unique within the
    group — so the lexicographic struct max never compares the trailing
    payload fields and equals ROW_NUMBER(sim DESC, seed_id) = 1 exactly.
    """
    if seeds is None:
        seeds = ivf_seeds(em, n_seeds)
    if "snrm" not in seeds.columns:  # externally-supplied seed frames
        seeds = seeds.select("seed_id", "semb", _l2("semb").alias("snrm"))
    passthrough = [c for c in em.columns if c not in ("vec_id", "embedding")]
    # norms hoisted below the broadcast join (one fold per vector, see
    # ivf_seeds); the row norm rides the argmax struct so the output
    # `nrm` needs no recomputation
    emn = em.select(
        "vec_id", "embedding", *passthrough, _l2("embedding").alias("nrm")
    )
    scored = emn.crossJoin(F.broadcast(seeds)).select(
        "vec_id",
        F.struct(
            F.round(
                _dot(F.col("embedding"), F.col("semb"))
                / (F.col("nrm") * F.col("snrm")),
                6,
            ).alias("sim"),
            (-F.col("seed_id")).alias("ns"),
            F.col("embedding").alias("embedding"),
            *[F.col(c).alias(c) for c in passthrough],
            F.col("nrm").alias("nrm"),
        ).alias("cand"),
    )
    best = scored.groupBy("vec_id").agg(F.max("cand").alias("b"))
    out = (
        best.select(
            "vec_id",
            (-F.col("b.ns")).alias("cluster"),
            F.col("b.embedding").alias("embedding"),
            *[F.col(f"b.{c}").alias(c) for c in passthrough],
            F.col("b.nrm").alias("nrm"),
        )
        .materialize(eager=True)
    )
    _enforce_cell_cap(out, seeds)
    return out


# Tolerated skew multiple of ⌈√n⌉ — the cell size the Σ|cell|² ≈ n^1.5
# pair-space bound every consumer's scale claim rests on. The cap keys
# on √n, NOT on n/seed-count: a degenerate corpus (near-identical
# embeddings) collapses the Lloyd refinement toward ONE surviving
# centroid, so an n/k cap would loosen itself exactly when the pair
# join goes quadratic. The check fails that case loudly at assignment
# time — before the pair join runs — naming the cluster and sizes.
# (Measured fixture skew: max cell ≈ 1.4×√n, so 8× is generous.)
_CELL_CAP_FACTOR = 8
_CELL_CAP_FLOOR = 64  # fixture-scale grace: tiny n has lumpy cells


def _enforce_cell_cap(assign: DataFrame, seeds: DataFrame) -> None:
    """Fail loudly when any IVF cell exceeds ``_CELL_CAP_FACTOR`` ×
    ⌈√n⌉ (with a small-n floor). Two O(n)→O(k) aggregates over the
    already-checkpointed assignment — trivial next to the Σ|cell|²
    pair join the cap protects."""
    import math as _math

    n = assign.count()
    k = max(1, seeds.count())
    cap = max(_CELL_CAP_FLOOR, _CELL_CAP_FACTOR * _math.ceil(_math.sqrt(n)))
    worst = (
        assign.groupBy("cluster")
        .count()
        .orderBy(F.desc("count"), "cluster")
        .first()
    )
    if worst is not None and worst["count"] > cap:
        raise ValueError(
            f"IVF cell {worst['cluster']} holds {worst['count']} of {n} "
            f"vectors (cap {cap} = max({_CELL_CAP_FLOOR}, "
            f"{_CELL_CAP_FACTOR}x ceil(sqrt(n))), {k} live seeds): the "
            "intra-cell pair space is no longer ~n^1.5. Re-seed with "
            "more/better-spread centroids (raise n_seeds) or dedup the "
            "degenerate embeddings before the pair-space operator."
        )


def semdedup_counts(em: DataFrame, n_seeds: int | None = None) -> DataFrame:
    """Library form of :func:`x_semdedup`: coarse-quantize ``(vec_id,
    embedding)`` rows to their nearest :func:`ivf_seeds` centroid
    (k = ⌈√n⌉ by default), count cosine-≥0.92 intra-cluster pairs and
    removed (keep-lowest-id) members per cluster.

    Pair-stage perf: each vector's L2 norm is computed ONCE in the
    assignment stage and carried alongside, so the Σ|cluster|² pair
    filter evaluates a single dot-product fold per pair instead of the
    three folds inside :func:`cosine` — dot/(norm_a·norm_b) is the
    identical double arithmetic (sqrt hoisted, not changed), so the
    round-6 threshold and the oracle are unaffected. The assignment —
    read by the member count and both self-join sides — materializes
    once via eager localCheckpoint.
    """
    assign = seed_assign(em, n_seeds)
    a = assign.select(
        "cluster",
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    b = assign.select(
        "cluster",
        F.col("vec_id").alias("vec_b"),
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
    dup = (
        a.join(b, "cluster")
        .where(F.col("vec_a") < F.col("vec_b"))
        .where(F.round(dot / (F.col("na") * F.col("nb")), 6) >= 0.92)
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_dup_pairs"),
            F.countDistinct("vec_b").cast("long").alias("n_removed"),
        )
    )
    members = assign.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    )
    return (
        members.join(dup, "cluster", "left")
        .select(
            "cluster",
            "n_members",
            F.coalesce("n_dup_pairs", F.lit(0)).cast("long").alias("n_dup_pairs"),
            F.coalesce("n_removed", F.lit(0)).cast("long").alias("n_removed"),
        )
    )
