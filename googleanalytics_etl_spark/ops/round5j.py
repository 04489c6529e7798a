"""Round-5 pre-work, tenth batch: equi-depth histogram statistics and
one BPE merge round.

- ``x_equidepth_hist`` — 10-bucket equi-DEPTH histogram over order
  values (equal row counts per bucket, data-dependent boundaries):
  the statistic cost-based optimizers actually keep (equi-width —
  ``q_histogram`` — lies under skew; equi-depth bounds every bucket's
  selectivity error). Built on the repo's distributed
  :func:`~googleanalytics_etl_spark.ops.setops.global_rank` — NO
  single-partition global window.
- ``x_bpe_apply`` — one full BPE training round: find the top merge
  pair (the ``x_bpe_merge`` statistic), apply it corpus-wide
  (leftmost non-overlapping, the BPE merge rule — both engines'
  ``replace`` semantics), and emit the post-merge pair statistics.
  Demonstrates the iterate step the counting kernel feeds; a real
  trainer loops this until the merge table is full.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import register
from .setops import global_rank


# ---------------------------------------------------------------------------
# x_equidepth_hist — equal-count buckets, data-dependent boundaries
# ---------------------------------------------------------------------------

_N_BUCKETS = 10

_EQUIDEPTH_ORACLE = f"""
WITH ranked AS (
    SELECT o_totalprice,
           ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS rank,
           COUNT(*) OVER () AS n
    FROM orders
)
SELECT CAST(CEIL(rank * {_N_BUCKETS} / CAST(n AS DOUBLE)) AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       ROUND(MIN(o_totalprice), 2) AS lo,
       ROUND(MAX(o_totalprice), 2) AS hi
FROM ranked
GROUP BY 1
"""


@register("x_equidepth_hist", oracle=_EQUIDEPTH_ORACLE)
def x_equidepth_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram of order values: {n} buckets holding equal
    row counts (±1), with observed [lo, hi] boundaries — the CBO
    statistic that stays truthful under skew, where the equi-width
    ``q_histogram`` piles everything into two bars.

    The global order comes from :func:`global_rank` (range exchange →
    per-partition row_number → metadata offsets) — the distributed
    recipe, not the ROW_NUMBER()-over-() single-task trap the oracle
    is allowed (DuckDB, fixture-scale). Bucket id is ⌈rank·B/n⌉ — pure
    arithmetic on the rank, so bucket sizes are exactly ⌊n/B⌋/⌈n/B⌉
    and boundaries are actual data values (cross-engine exact after
    round-2).
    """
    o = load(spark, sf_dir, "orders").select("o_totalprice", "o_orderkey")
    ranked = global_rank(
        o, F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    n = ranked.agg(F.count(F.lit(1)).alias("n"))
    return (
        ranked.crossJoin(F.broadcast(n))
        .select(
            F.ceil(F.col("rank") * _N_BUCKETS / F.col("n").cast("double"))
            .cast("long")
            .alias("bucket"),
            "o_totalprice",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


# ---------------------------------------------------------------------------
# x_bpe_apply — one merge round of BPE training
# ---------------------------------------------------------------------------

_BPE_APPLY_ORACLE = """
WITH vocab AS (
    SELECT tok, CAST(COUNT(*) AS BIGINT) AS wc
    FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    WHERE length(tok) >= 2
    GROUP BY tok
), pairs0 AS (
    SELECT unnest(list_transform(generate_series(1, length(tok) - 1),
                                 i -> substring(tok, i, 2))) AS pair, wc
    FROM vocab
), top1 AS (
    SELECT pair AS merge_pair
    FROM pairs0 GROUP BY pair
    ORDER BY SUM(wc) DESC, pair
    LIMIT 1
), merged AS (
    SELECT replace(tok, merge_pair, chr(164)) AS tok, wc
    FROM vocab, top1
), pairs1 AS (
    SELECT unnest(list_transform(generate_series(1, length(tok) - 1),
                                 i -> substring(tok, i, 2))) AS pair, wc
    FROM merged
    WHERE length(tok) >= 2
)
SELECT pair, CAST(SUM(wc) AS BIGINT) AS n
FROM pairs1
GROUP BY pair
ORDER BY n DESC, pair
LIMIT 10
"""


@register("x_bpe_apply", oracle=_BPE_APPLY_ORACLE)
def x_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE training round end-to-end: elect the top merge pair from
    the corpus pair statistics, rewrite the (weighted) vocabulary with
    that pair fused into a single symbol (leftmost non-overlapping —
    ``replace`` semantics, which IS the BPE merge rule), and return the
    post-merge top-10 pair table the NEXT round would elect from. The
    iterate step that turns ``x_bpe_merge``'s counting kernel into a
    tokenizer trainer; everything stays vocab-grain (Heaps-law ≈
    √corpus) — corpus text is scanned exactly once, then all rounds
    operate on the word-frequency table.

    The merged symbol is ``¤`` (absent from the [a-z0-9] corpus);
    post-merge pairs containing ``¤`` are the new symbol's contexts —
    exactly what a real trainer records. The 1-row merge election is a
    broadcast cross join, not a driver round-trip.
    """
    d = load(spark, sf_dir, "documents")
    vocab = (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .where(F.length("tok") >= 2)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("wc"))
        .materialize(eager=True)
    )
    pair_expr = F.expr(
        "transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))"
    )
    top1 = (
        vocab.select(F.explode(pair_expr).alias("pair"), "wc")
        .groupBy("pair")
        .agg(F.sum("wc").alias("s"))
        .orderBy(F.col("s").desc(), "pair")
        .limit(1)
        .select(F.col("pair").alias("merge_pair"))
    )
    merged = vocab.crossJoin(F.broadcast(top1)).select(
        F.replace(F.col("tok"), F.col("merge_pair"), F.lit("¤")).alias(
            "tok"
        ),
        "wc",
    )
    return (
        merged.where(F.length("tok") >= 2)
        .select(F.explode(pair_expr).alias("pair"), "wc")
        .groupBy("pair")
        .agg(F.sum("wc").cast("long").alias("n"))
        .orderBy(F.col("n").desc(), "pair")
        .limit(10)
    )
