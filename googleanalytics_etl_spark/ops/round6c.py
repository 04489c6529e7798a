"""Round-6 batch 3: cross-source forensics and budget-planning operators.

Three more fully-oracled additions to the §2.J–M families:

- ``x_cross_source_dups`` — the near-dup analogue of
  ``x_source_overlap``: MinHash-verified pairs grouped by the source
  pair they straddle (mirror-site / syndication detection — exact-hash
  overlap misses rewrapped copies; near-dup pairs catch them).
- ``x_context_truncation`` — truncation loss at candidate context
  lengths: per (context length, source), how many documents exceed the
  window and what share of tokens survive ``least(n_tok, L)`` — the
  measurement behind choosing a packing length (``x_pack_sequences``
  consumes the chosen L).
- ``x_exact_stratified`` — exact-n per-stratum sampling (deterministic
  seeded-hash order), the fixed-quota companion to
  ``x_stratified_sample``'s Bernoulli proportions.

Reference parity: no analogue in the reference package
[REF-UNVERIFIED — /root/reference is empty]; round-mandate extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

# ---------------------------------------------------------------------------
# x_cross_source_dups — near-dup pair counts by source pair
# ---------------------------------------------------------------------------

_CROSS_SOURCE_ORACLE = """
WITH corpus AS (
    SELECT doc_id, source, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, source, text
    FROM documents WHERE doc_id < 10
), {ctes}
SELECT LEAST(ca.source, cb.source) AS source_lo,
       GREATEST(ca.source, cb.source) AS source_hi,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(CAST(SUM(CAST(v.jaccard AS DECIMAL(18,8))) AS DOUBLE)
             / COUNT(*), 6) AS mean_jaccard
FROM verified v
JOIN corpus ca ON ca.doc_id = v.doc_a
JOIN corpus cb ON cb.doc_id = v.doc_b
WHERE v.jaccard >= 0.5
GROUP BY 1, 2
"""


def _cross_source_oracle() -> str:
    from .extensions import _NEAR_CTES

    return _CROSS_SOURCE_ORACLE.format(ctes=_NEAR_CTES.strip())


@register("x_cross_source_dups", oracle=_cross_source_oracle())
def x_cross_source_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pair counts by SOURCE pair: every MinHash-verified pair
    (Jaccard ≥ 0.5, the x_dedup_near pipeline on the planted-tail
    corpus) attributed to the ordered (source_lo, source_hi) pair it
    straddles, with the exact mean Jaccard per cell. ``x_source_overlap``
    answers "which sources share IDENTICAL text"; this answers "which
    sources syndicate/mirror near-copies of each other" — the signal
    that decides whether two crawl sources should be deduped jointly or
    are independent. Off-diagonal cells are cross-source leakage;
    diagonal cells are within-source redundancy.

    Scale shape: identical to ``x_split_contamination`` — the pair
    generator is the banded LSH plan (pair space never materialized),
    and the only additions are two joins from pair ids to the
    (doc_id, source) projection and a |sources|²-bounded aggregate.
    Mean Jaccard sums DECIMAL(18,8)-quantized per-pair ratios (each an
    exact int/int division), so the aggregate is order-independent.
    """
    from .extensions import _minhash_pairs

    pairs = _minhash_pairs(spark, sf_dir)
    d = load(spark, sf_dir, "documents")
    src_of = d.select("doc_id", "source").unionByName(
        d.where(F.col("doc_id") < 10).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"), "source"
        )
    )
    sa = src_of.select(
        F.col("doc_id").alias("doc_a"), F.col("source").alias("source_a")
    )
    sb = src_of.select(
        F.col("doc_id").alias("doc_b"), F.col("source").alias("source_b")
    )
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .groupBy(
            F.least("source_a", "source_b").alias("source_lo"),
            F.greatest("source_a", "source_b").alias("source_hi"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.round(
                F.sum(F.col("jaccard").cast("decimal(18,8)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# x_context_truncation — token loss at candidate context lengths
# ---------------------------------------------------------------------------

_CTX_LENS = (8, 16, 32)

_CONTEXT_TRUNCATION_ORACLE = f"""
WITH per_doc AS (
    SELECT source,
           len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                           x -> x <> '')) AS n_tok
    FROM documents
), spined AS (
    SELECT p.source, p.n_tok, t.ctx_len
    FROM per_doc p
    CROSS JOIN (VALUES ({_CTX_LENS[0]}), ({_CTX_LENS[1]}),
                       ({_CTX_LENS[2]})) t(ctx_len)
)
SELECT CAST(ctx_len AS BIGINT) AS ctx_len, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN n_tok > ctx_len THEN 1 ELSE 0 END) AS BIGINT)
           AS n_truncated,
       CAST(SUM(n_tok) AS BIGINT) AS tokens_total,
       CAST(SUM(LEAST(n_tok, ctx_len)) AS BIGINT) AS tokens_kept,
       ROUND(CAST(SUM(LEAST(n_tok, ctx_len)) AS DOUBLE) / SUM(n_tok), 6)
           AS kept_ratio
FROM spined
GROUP BY ctx_len, source
"""


@register("x_context_truncation", oracle=_CONTEXT_TRUNCATION_ORACLE)
def x_context_truncation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncation loss at candidate context lengths: for each
    (context length L, source), the documents exceeding L tokens and
    the share of tokens that survive hard truncation to L — the
    measurement behind choosing a packing/sequence length (too small
    loses tail tokens; too large wastes padding that
    ``x_pack_sequences`` then has to fill). Fixture lengths {lens}
    bracket the corpus median so every cell is informative.

    Scale shape: token counts are computed row-locally (no explode —
    ``size(split(...))``), the 3-value context-length spine explodes a
    LITERAL array per row (row-local, 3× scalar rows, never text), and
    ONE map-side-combined aggregate lands on the (L, source) grain.
    All sums are exact integers; the kept-ratio is one IEEE division of
    identical integers, then ROUND 6.
    """
    d = load(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z]+"), lambda t: t != ""
    )
    per_doc = d.select(
        "source", F.size(toks).cast("long").alias("n_tok")
    )
    spined = per_doc.select(
        "source",
        "n_tok",
        F.explode(F.array(*[F.lit(c) for c in _CTX_LENS])).alias("ctx_len"),
    )
    kept = F.least(F.col("n_tok"), F.col("ctx_len"))
    return (
        spined.groupBy(
            F.col("ctx_len").cast("long").alias("ctx_len"), "source"
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(
                F.when(F.col("n_tok") > F.col("ctx_len"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_truncated"),
            F.sum("n_tok").cast("long").alias("tokens_total"),
            F.sum(kept).cast("long").alias("tokens_kept"),
            F.round(
                F.sum(kept).cast("double") / F.sum("n_tok"), 6
            ).alias("kept_ratio"),
        )
    )


x_context_truncation.__doc__ = x_context_truncation.__doc__.format(
    lens=_CTX_LENS
)


# ---------------------------------------------------------------------------
# x_exact_stratified — exact-n per-stratum deterministic sample
# ---------------------------------------------------------------------------

_STRATUM_N = 40

_EXACT_STRATIFIED_ORACLE = f"""
WITH ranked AS (
    SELECT lang, doc_id,
           ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5('xs-seed-1|' || CAST(doc_id AS VARCHAR)), doc_id
           ) AS rk
    FROM documents
)
SELECT lang, CAST(doc_id AS BIGINT) AS doc_id, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= {_STRATUM_N}
"""


@register("x_exact_stratified", oracle=_EXACT_STRATIFIED_ORACLE)
def x_exact_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-n per-stratum sampling: EXACTLY {n} documents per language
    (or the whole stratum when smaller), picked by seeded-hash order —
    the fixed-quota companion to ``x_stratified_sample``'s Bernoulli
    draw. Quotas matter when the downstream consumer needs a guaranteed
    per-cell size (eval panels, annotation batches, per-language probes)
    rather than a proportional expectation.

    Scale shape: ``row_number`` over (stratum, hash-order) compiles to
    Spark's WindowGroupLimit: the rank ≤ {n} predicate is pushed into
    the shuffle so each map task keeps only its local top-{n} per
    stratum — the exchange carries O(strata × n × tasks) rows, not the
    corpus — and no stratum is ever fully sorted. The hash order makes
    the quota a uniform random sample (replay-deterministic, seed in
    the hash preimage) rather than a biased head-of-table pick.
    """
    d = load(spark, sf_dir, "documents")
    h = F.md5(
        F.concat(F.lit("xs-seed-1|"), F.col("doc_id").cast("string")).cast(
            "binary"
        )
    )
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        d.select("lang", "doc_id", F.row_number().over(w).alias("rk"))
        .where(F.col("rk") <= _STRATUM_N)
        .select("lang", F.col("doc_id").cast("long").alias("doc_id"),
                F.col("rk").cast("long").alias("rk"))
    )


x_exact_stratified.__doc__ = x_exact_stratified.__doc__.format(n=_STRATUM_N)
