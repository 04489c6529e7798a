"""Round-6 batch 14: perplexity-band filtering and the sampling table.

- ``x_ppl_filter`` — the LM-perplexity curation filter: per-doc
  average bigram log-probability (``x_bigram_logprob``'s frame)
  bucketed into fixed bands — too-surprising (noise), the keep band,
  too-predictable (templates/boilerplate) — with per-band counts and
  means. The standard "middle of the perplexity distribution" recipe
  used to clean web corpora.
- ``x_neg_sampling_table`` — the unigram^0.75 negative-sampling
  distribution (word2vec / contrastive training): top-50 vocabulary
  with raw and smoothed sampling probabilities and the boost ratio
  the 3/4 power gives rare words.

Reference parity: no analogue [REF-UNVERIFIED — /root/reference is
empty]; SURVEY §2.J-M text/LM extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

# band edges on avg log2 P(w2|w1): below LO = noise, above HI =
# templated; the keep band is the middle. Fixed literals so bands are
# comparable across corpus snapshots — set to straddle the fixture
# corpus's tight score range (quartiles ≈ −4.92/−4.86 at every SF;
# real web corpora spread far wider and would use wider edges).
_PPL_LO = -4.95
_PPL_HI = -4.85


def _ppl_filter_oracle() -> str:
    from .round5d import _BIGRAM_LP_ORACLE

    return f"""
WITH scored AS ({_BIGRAM_LP_ORACLE})
SELECT CAST(CASE WHEN avg_logp < {_PPL_LO} THEN 0
                 WHEN avg_logp < {_PPL_HI} THEN 1
                 ELSE 2 END AS BIGINT) AS band,
       CAST(CASE WHEN avg_logp >= {_PPL_LO} AND avg_logp < {_PPL_HI}
                 THEN 1 ELSE 0 END AS BIGINT) AS keep,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_bigrams) AS BIGINT) AS n_bigrams,
       ROUND(CAST(SUM(CAST(avg_logp AS DECIMAL(18,8))) AS DOUBLE)
             / COUNT(*), 6) AS mean_logp
FROM scored
GROUP BY 1, 2
"""


@register("x_ppl_filter", oracle=_ppl_filter_oracle())
def x_ppl_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-band curation filter: every document's average bigram
    log2-probability under the corpus's own LM (``x_bigram_logprob``)
    falls into one of three fixed bands — band 0 (the surprising tail:
    noise / OOV-heavy), band 1 (the keep band), band 2 (the predictable
    tail: templated / boilerplate). One row per band with doc and bigram counts and the
    mean score; ``keep`` marks the survivors' band. Dropping both tails
    of the perplexity distribution is the classic web-corpus cleaning
    step — this key makes the cut auditable before it is applied.

    Scale shape: everything heavy is the shared bigram-LM chain (one
    explode, two n-gram-keyed hash joins — nothing broadcast, nothing
    collected); this key adds ONE ≤ 3-row aggregate on the doc-grain
    scored frame. Fixed band edges on the ROUND-6'd score keep the
    bucketing bit-deterministic cross-engine, and per-term
    DECIMAL(18,8) quantization keeps the band means exact.
    """
    from .round5d import x_bigram_logprob

    scored = x_bigram_logprob(spark, sf_dir)
    band = (
        F.when(F.col("avg_logp") < _PPL_LO, 0)
        .when(F.col("avg_logp") < _PPL_HI, 1)
        .otherwise(2)
    )
    keep = (
        (F.col("avg_logp") >= _PPL_LO) & (F.col("avg_logp") < _PPL_HI)
    ).cast("long")
    return scored.groupBy(
        band.cast("long").alias("band"), keep.alias("keep")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_bigrams").cast("long").alias("n_bigrams"),
        F.round(
            F.sum(F.col("avg_logp").cast("decimal(18,8)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_logp"),
    )


# ---------------------------------------------------------------------------
# x_neg_sampling_table — unigram^0.75 distribution
# ---------------------------------------------------------------------------

_NS_TOPK = 50

# POWER(c, 0.75) may differ in the last ulp across engines (the
# log/exp family lesson in registry.py) — every smoothed term is
# quantized to DECIMAL(18,8) BEFORE the Z sum and the output rounds to
# 6 dp, burying the drift (the x_source_kl recipe).
_NS_ORACLE = f"""
WITH toks AS (
    SELECT unnest(string_split(text, ' ')) AS tok FROM documents
), counts AS (
    SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
    FROM toks WHERE tok <> '' GROUP BY tok
), top AS (
    SELECT tok, c FROM counts
    ORDER BY c DESC, tok LIMIT {_NS_TOPK}
), smoothed AS (
    SELECT tok, c,
           CAST(POWER(CAST(c AS DOUBLE), 0.75) AS DECIMAL(18,8)) AS cs,
           SUM(c) OVER () AS tot,
           SUM(CAST(POWER(CAST(c AS DOUBLE), 0.75) AS DECIMAL(18,8)))
               OVER () AS z
    FROM top
)
SELECT tok, c,
       ROUND(CAST(c AS DOUBLE) / tot, 6) AS p_unigram,
       ROUND(CAST(cs AS DOUBLE) / CAST(z AS DOUBLE), 6) AS p_smoothed,
       ROUND((CAST(cs AS DOUBLE) / CAST(z AS DOUBLE))
             / (CAST(c AS DOUBLE) / tot), 6) AS boost
FROM smoothed
"""


@register("x_neg_sampling_table", oracle=_NS_ORACLE)
def x_neg_sampling_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The negative-sampling distribution over the top-{k} vocabulary:
    raw unigram probability, the unigram^0.75 smoothed probability
    (word2vec's noise distribution — contrastive objectives sample
    negatives from it), and the boost factor the 3/4 power hands each
    word (< 1 for heads, > 1 for tails). Restricting to the top-{k}
    keeps the published table bounded; production builds the full-vocab
    table with the identical plan (the aggregate is already
    vocab-grain).

    Scale shape: one explode into a map-combined (tok) count aggregate;
    top-k via TakeOrdered (count desc, token asc tiebreak — no global
    sort); the normalization windows run over the {k}-row post-limit
    frame. POWER terms quantize to DECIMAL(18,8) before the associative
    Z sum (cross-engine pow drifts in the last ulp; the decimal grid
    absorbs it).
    """
    d = load(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    top = counts.orderBy(F.col("c").desc(), "tok").limit(_NS_TOPK)
    cs = F.pow(F.col("c").cast("double"), 0.75).cast("decimal(18,8)")
    w = Window.partitionBy()
    sm = top.select(
        "tok",
        "c",
        cs.alias("cs"),
        F.sum("c").over(w).alias("tot"),
        F.sum(cs).over(w).alias("z"),
    )
    p_uni = F.col("c").cast("double") / F.col("tot")
    p_s = F.col("cs").cast("double") / F.col("z").cast("double")
    return sm.select(
        "tok",
        "c",
        F.round(p_uni, 6).alias("p_unigram"),
        F.round(p_s, 6).alias("p_smoothed"),
        F.round(p_s / p_uni, 6).alias("boost"),
    )


x_neg_sampling_table.__doc__ = x_neg_sampling_table.__doc__.format(k=_NS_TOPK)
