"""Round-6 batch 18: maximal-marginal-relevance diversification.

``x_mmr_rerank`` — MMR re-ranking of the brute-force top-10 retrieval
panel: 5 selection rounds, each picking the candidate maximizing
λ·sim(query, c) − (1−λ)·max_{s∈S} sim(c, s) over the not-yet-selected
pool. The standard diversification step between retrieval and a
context window — near-duplicate hits waste prompt tokens, and MMR is
the greedy trade between relevance and novelty. Each pick is a
TakeOrdered(1) frame feeding the next round's joins (selection stays
in-engine — no driver-side argmax), eagerly materialized so round t's
plan does not re-expand every earlier round's subtree; the oracle
unrolls the identical recursion into chained CTEs.

Reference parity: no analogue [REF-UNVERIFIED — /root/reference is
empty]; SURVEY §2.J-M similarity-search extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

_MMR_POOL = 10
_MMR_K = 5
_MMR_LAMBDA = 0.7  # relevance weight; 1-λ = novelty weight


def _mmr_oracle() -> str:
    pool, lam = _MMR_POOL, _MMR_LAMBDA
    sql = f"""
WITH q AS (
    SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0
), cands AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
           ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]), qe), 6)
               AS simq
    FROM embeddings, q WHERE vec_id != 0
    ORDER BY simq DESC, vec_id LIMIT {pool}
), pair AS (
    SELECT a.vec_id AS ida, b.vec_id AS idb,
           ROUND(list_cosine_similarity(a.emb, b.emb), 6) AS sim
    FROM cands a, cands b WHERE a.vec_id != b.vec_id
), s1 AS (
    SELECT vec_id, ROUND({lam!r} * simq, 6) AS score
    FROM cands ORDER BY simq DESC, vec_id LIMIT 1
)"""
    sel_union = "SELECT vec_id FROM s1"
    for t in range(2, _MMR_K + 1):
        sql += f""", sc{t} AS (
    SELECT c.vec_id,
           ROUND({lam!r} * c.simq - {1 - lam!r} * MAX(p.sim), 6) AS score
    FROM cands c
    JOIN pair p ON p.ida = c.vec_id
    WHERE p.idb IN ({sel_union})
      AND c.vec_id NOT IN ({sel_union})
    GROUP BY c.vec_id, c.simq
), s{t} AS (
    SELECT vec_id, score FROM sc{t} ORDER BY score DESC, vec_id LIMIT 1
)"""
        sel_union += f" UNION ALL SELECT vec_id FROM s{t}"
    finals = " UNION ALL ".join(
        f"SELECT CAST({t} AS BIGINT) AS rank, vec_id, score FROM s{t}"
        for t in range(1, _MMR_K + 1)
    )
    return sql + "\n" + finals


@register("x_mmr_rerank", oracle=_mmr_oracle())
def x_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversification of the top-{pool} cosine retrieval panel
    (query = vec 0's embedding): {k} greedy rounds, round t picking the
    unselected candidate maximizing λ·sim(q,c) − (1−λ)·max sim(c, S)
    with λ = {lam}. Returns (rank, vec_id, score) — the panel a
    context-window assembler consumes instead of the raw top-k, which
    near-duplicates can dominate.

    Scale shape: the corpus-wide stage is exactly ``x_sim_knn``
    (broadcast 1-row query, one scan, TakeOrdered — no global sort);
    everything after operates on the {pool}-row candidate frame
    (eagerly materialized — it feeds both pair sides and every round):
    the
    {pool}×{pool} pair-sim construction and each round's joins are
    bounded-metadata broadcasts, and the {k} rounds build ONE lazy DAG
    of TakeOrdered(1) frames — no driver-side selection loop, no
    collect. At 100 TB only the first stage sees the data.

    Determinism: all similarities ROUND-6'd (the x_sim_knn contract —
    DuckDB's list_cosine_similarity and the Catalyst fold agree on the
    grid), scores ROUND-6'd, every pick tie-broken by vec_id.
    """
    em = load(spark, sf_dir, "embeddings")
    from .extensions import cosine

    q = em.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe")
    )
    cands = (
        em.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "embedding",
            F.round(cosine(F.col("embedding"), F.col("qe")), 6).alias("simq"),
        )
        .orderBy(F.col("simq").desc(), "vec_id")
        .limit(_MMR_POOL)
        .materialize(eager=True)
    )
    a = cands.select(F.col("vec_id").alias("ida"), F.col("embedding").alias("ea"))
    b = cands.select(F.col("vec_id").alias("idb"), F.col("embedding").alias("eb"))
    # Eager {pool}²-row materialization: pair feeds every selection
    # round, and each unmaterialized reference re-plans the whole
    # corpus-scan subtree below it (see the picks note).
    pair = (
        a.crossJoin(F.broadcast(b))
        .where(F.col("ida") != F.col("idb"))
        .select(
            "ida",
            "idb",
            F.round(cosine(F.col("ea"), F.col("eb")), 6).alias("sim"),
        )
        .materialize(eager=True)
    )
    lam = _MMR_LAMBDA
    # Each pick is a 1-row frame; eager-checkpoint it. Round t's plan
    # references every earlier pick (the selected-set union) twice, so
    # the unmaterialized recursion multiplies subtrees ~3^t-fold — the
    # audited before-plan reached 40 exchanges / 161 broadcast
    # relations for a 10-row pool (12.7 s at sf0.1, almost all
    # planning). With pool/pair/picks materialized the DAG is k tiny
    # TakeOrdered jobs over checkpointed metadata frames.
    s1 = (
        cands.orderBy(F.col("simq").desc(), "vec_id")
        .limit(1)
        .select(
            F.lit(1).cast("long").alias("rank"),
            "vec_id",
            F.round(F.lit(lam) * F.col("simq"), 6).alias("score"),
        )
        .materialize(eager=True)
    )
    picks = [s1]
    for t in range(2, _MMR_K + 1):
        sel_ids = picks[0].select("vec_id")
        for p in picks[1:]:
            sel_ids = sel_ids.unionByName(p.select("vec_id"))
        novelty = (
            pair.join(sel_ids.withColumnRenamed("vec_id", "idb"), "idb")
            .groupBy("ida")
            .agg(F.max("sim").alias("msel"))
        )
        step = (
            cands.join(sel_ids, "vec_id", "left_anti")
            .join(novelty, cands["vec_id"] == novelty["ida"])
            .select(
                "vec_id",
                F.round(
                    F.lit(lam) * F.col("simq") - F.lit(1 - lam) * F.col("msel"),
                    6,
                ).alias("score"),
            )
            .orderBy(F.col("score").desc(), "vec_id")
            .limit(1)
            .select(F.lit(t).cast("long").alias("rank"), "vec_id", "score")
            .materialize(eager=True)
        )
        picks.append(step)
    out = picks[0]
    for p in picks[1:]:
        out = out.unionByName(p)
    return out


x_mmr_rerank.__doc__ = x_mmr_rerank.__doc__.format(
    pool=_MMR_POOL, k=_MMR_K, lam=_MMR_LAMBDA
)
