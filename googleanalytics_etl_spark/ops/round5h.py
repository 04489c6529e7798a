"""Round-5 pre-work, eighth batch: held-out LM scoring and shard-balance
auditing.

- ``x_bigram_heldout`` — the train/held-out form of
  :func:`x_bigram_logprob`: an add-one-smoothed bigram model is built
  from the training slice (every source except ``src19``) and scores
  the HELD-OUT slice, so unseen transitions (the OOV path the
  in-corpus variant can never hit) are exercised and counted. This is
  the actual quality-filter deployment shape: the model is frozen, the
  scored data is new.
- ``x_shard_balance`` — the balance audit over the deterministic
  corpus sharding (``x_corpus_shard``): per-shard doc and token loads
  plus a single-row skew summary (max/min load ratio). Writing shards
  is half the job; PROVING the hash spread the load is the other half
  — a skewed shard is the straggler at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import register


# ---------------------------------------------------------------------------
# x_bigram_heldout — frozen-model scoring with add-1 smoothing
# ---------------------------------------------------------------------------

_HELDOUT_ORACLE = """
WITH toks AS (
    SELECT doc_id, source, tok, ord
    FROM (
        SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok,
               generate_subscripts(string_split(text, ' '), 1) AS ord
        FROM documents
    ) WHERE tok <> ''
), bg AS (
    SELECT doc_id, source, w1, w2
    FROM (
        SELECT doc_id, source, tok AS w1,
               LEAD(tok) OVER (PARTITION BY doc_id ORDER BY ord) AS w2
        FROM toks
    ) WHERE w2 IS NOT NULL
), train2 AS (
    SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n2
    FROM bg WHERE source <> 'src19' GROUP BY w1, w2
), train1 AS (
    SELECT w1, CAST(COUNT(*) AS BIGINT) AS n1
    FROM bg WHERE source <> 'src19' GROUP BY w1
), vocab AS (
    SELECT CAST(COUNT(DISTINCT w2) AS BIGINT) AS v
    FROM bg WHERE source <> 'src19'
), scored AS (
    SELECT h.doc_id,
           CASE WHEN t2.n2 IS NULL THEN 1 ELSE 0 END AS oov,
           CAST(LOG2((COALESCE(t2.n2, 0) + 1.0)
                     / (COALESCE(t1.n1, 0) + v)) AS DECIMAL(18,4)) AS lp
    FROM bg h
    LEFT JOIN train2 t2 USING (w1, w2)
    LEFT JOIN train1 t1 USING (w1)
    CROSS JOIN vocab
    WHERE h.source = 'src19'
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(oov) AS BIGINT) AS n_unseen,
       ROUND(CAST(SUM(lp) AS DOUBLE) / COUNT(*), 6) AS avg_logp
FROM scored
GROUP BY doc_id
"""


@register("x_bigram_heldout", oracle=_HELDOUT_ORACLE)
def x_bigram_heldout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score the held-out slice (``src19``) under an add-one-smoothed
    bigram model frozen on everything else: P(w₂|w₁) = (c(w₁,w₂)+1) /
    (c(w₁)+V). Unseen transitions get the smoothed floor and are
    counted (``n_unseen``) — the OOV path that decides whether a
    quality filter generalizes past its training corpus.

    Plan shape mirrors deployment: the model (two count tables) builds
    from the training slice, the held-out rows LEFT-join it on the
    n-gram keys (absent rows = OOV, handled by COALESCE — no inner-join
    row loss), and the vocabulary size arrives as a broadcast 1-row
    aggregate. All log terms decimal-quantized before the exact sum.
    """
    d = load(spark, sf_dir, "documents")
    ws = F.filter(F.split("text", " "), lambda t: t != "")
    pairs = F.expr(
        "transform(sequence(1, size(ws) - 1),"
        " i -> struct(ws[i - 1] AS w1, ws[i] AS w2))"
    )
    bg = (
        d.select("doc_id", "source", ws.alias("ws"))
        .where(F.size("ws") >= 2)
        .select("doc_id", "source", F.explode(pairs).alias("p"))
        .select(
            "doc_id",
            "source",
            F.col("p.w1").alias("w1"),
            F.col("p.w2").alias("w2"),
        )
    )
    train = bg.where(F.col("source") != "src19")
    t2 = train.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("n2")
    )
    t1 = train.groupBy("w1").agg(F.count(F.lit(1)).cast("long").alias("n1"))
    vocab = train.agg(F.countDistinct("w2").cast("long").alias("v"))
    held = bg.where(F.col("source") == "src19")
    lp = F.log2(
        (F.coalesce(F.col("n2"), F.lit(0)) + 1.0)
        / (F.coalesce(F.col("n1"), F.lit(0)) + F.col("v"))
    ).cast("decimal(18,4)")
    return (
        held.join(t2, ["w1", "w2"], "left")
        .join(t1, ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.when(F.col("n2").isNull(), 1).otherwise(0).alias("oov"),
            lp.alias("lp"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("oov").cast("long").alias("n_unseen"),
            F.round(F.sum("lp").cast("double") / F.count(F.lit(1)), 6).alias(
                "avg_logp"
            ),
        )
    )


# ---------------------------------------------------------------------------
# x_shard_balance — load audit over the deterministic sharding
# ---------------------------------------------------------------------------

from .pipeline import _N_SHARDS, _SQL_HEXVAL, _sql_key_hash  # noqa: E402


_SHARD_BALANCE_ORACLE = f"""
WITH sharded AS (
    SELECT doc_id,
           CAST(({_SQL_HEXVAL.format(c="substr(h, 1, 1)")} * 16
                 + {_SQL_HEXVAL.format(c="substr(h, 2, 1)")})
                % {_N_SHARDS} AS INT) AS shard,
           len(list_filter(str_split(text, ' '), t -> t <> '')) AS n_tok
    FROM (SELECT doc_id, text, {_sql_key_hash("doc_id")} AS h FROM documents)
), per AS (
    SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens
    FROM sharded GROUP BY shard
)
SELECT shard, n_docs, n_tokens,
       ROUND(CAST(MAX(n_tokens) OVER () AS DOUBLE)
             / MIN(n_tokens) OVER (), 6) AS skew_ratio
FROM per
"""


@register("x_shard_balance", oracle=_SHARD_BALANCE_ORACLE)
def x_shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balance audit for the md5 corpus sharding: per-shard doc/token
    loads plus the global max/min token-load ratio on every row. The
    audit that turns "we sharded it" into "the shards are even" — at
    100 TB an uneven shard IS the job's critical path, and the fix
    (re-hash, re-split) is cheap only if detected before training
    starts.

    One hash aggregate on the shard id (8 groups); the skew ratio is a
    window over those 8 rows — metadata-scale. Shard assignment is the
    exact :func:`x_corpus_shard` hash, so this audits the real layout,
    not a reimplementation.
    """
    d = load(spark, sf_dir, "documents")
    from .pipeline import _hexval, key_hash

    h = key_hash(F.col("doc_id"))
    shard = (
        (_hexval(F.substring(h, 1, 1)) * 16 + _hexval(F.substring(h, 2, 1)))
        % _N_SHARDS
    ).cast("int")
    toks = F.filter(F.split("text", " "), lambda t: t != "")
    per = (
        d.select(shard.alias("shard"), F.size(toks).alias("n_tok"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy()
    return per.select(
        "shard",
        "n_docs",
        "n_tokens",
        F.round(
            F.max("n_tokens").over(w).cast("double") / F.min("n_tokens").over(w),
            6,
        ).alias("skew_ratio"),
    )
