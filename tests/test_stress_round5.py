"""Scale-up stress checks for the round-5 pre-work operators — same
contract as test_stress_scale.py: synthesize ~4-10× inputs in memory,
assert exact construction-predicted results and invariant plan shape."""

from __future__ import annotations

import pyspark.sql.functions as F
from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.ops.round5b import semdedup_counts
from googleanalytics_etl_spark.registry import queries

SF_BENCH = "/root/testdata/sf0.1"


def _n_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange")


def _union(parts):
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    return big


def test_interval_merge_8x_disjoint_users(spark):
    """Disjoint user copies: per-user merge structure is identical, so
    rows multiply exactly and every copied user reproduces its base
    row; exchange count is invariant (one user_id exchange regardless
    of size)."""
    from googleanalytics_etl_spark.ops.round5c import q_interval_merge

    base_df = q_interval_merge(spark, SF_BENCH)
    base = {r["user_id"]: (r["n_intervals"], r["covered_us"]) for r in base_df.collect()}

    ev = load(spark, SF_BENCH, "events")
    copies = 8
    stride = 10_000_000
    big = _union(
        [
            ev.select(
                (F.col("event_id") + F.lit(i).cast("long") * 1_000_000_000).alias("event_id"),
                "ts",
                (F.col("user_id") + F.lit(i).cast("long") * stride).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
            for i in range(copies)
        ]
    )

    # rebuild the op body over the synthetic frame via the library sweep
    from pyspark.sql import Window

    iv = big.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("s"),
        (F.unix_micros(F.col("ts").cast("timestamp")) + F.lit(1800) * 1_000_000).alias("e"),
    )
    w = Window.partitionBy("user_id").orderBy("s", "event_id")
    swept = iv.withColumn(
        "prev_max_e", F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    )
    flagged = swept.withColumn(
        "is_new",
        F.when(F.col("prev_max_e").isNull() | (F.col("prev_max_e") < F.col("s")), 1).otherwise(0),
    )
    grp_w = Window.partitionBy("user_id").orderBy("s", "e").rowsBetween(
        Window.unboundedPreceding, 0
    )
    merged = (
        flagged.withColumn("grp", F.sum("is_new").over(grp_w))
        .groupBy("user_id", "grp")
        .agg(F.min("s").alias("ms"), F.max("e").alias("me"))
    )
    out = merged.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
        F.sum(F.col("me") - F.col("ms")).cast("long").alias("covered_us"),
    )
    got = {r["user_id"]: (r["n_intervals"], r["covered_us"]) for r in out.collect()}
    assert len(got) == copies * len(base)
    for uid, v in base.items():
        for i in range(copies):
            assert got[uid + i * stride] == v


def test_approx_topk_8x_identical_copies(spark):
    """8 identical corpus copies: every count AND the total scale by 8,
    so the heavy-hitter set is invariant and counts multiply exactly —
    the integer threshold count·(k+1) > n is scale-free. MG summaries
    see different partition interleavings at 8×; the verified output
    must not care."""
    base = {r["tok"]: r["n"] for r in queries()["x_approx_topk"](spark, SF_BENCH).collect()}

    d = load(spark, SF_BENCH, "documents")
    copies = 8
    big = _union(
        [
            d.select(
                (F.col("doc_id") + F.lit(i).cast("long") * 10_000_000).alias("doc_id"),
                "text",
            )
            for i in range(copies)
        ]
    )
    from googleanalytics_etl_spark.ops.round5c import _MG_CAPACITY, _mg_partition

    toks = big.select(F.explode(F.split("text", " ")).alias("tok")).where(F.col("tok") != "")
    cands = toks.mapInPandas(_mg_partition, "tok string").distinct()
    total = toks.agg(F.count(F.lit(1)).alias("total"))
    exact = (
        toks.join(F.broadcast(cands), "tok", "left_semi")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    out = (
        exact.crossJoin(F.broadcast(total))
        .where(F.col("n") * (_MG_CAPACITY + 1) > F.col("total"))
        .select("tok", "n")
    )
    got = {r["tok"]: r["n"] for r in out.collect()}
    assert got == {t: copies * n for t, n in base.items()}


def test_semdedup_planted_recall_at_sf01(spark):
    """x_semdedup (banded, round-9) at the 10× corpus: the 10 planted
    identical copies are still found exactly (identical vectors share
    every sign-LSH band, so banding loses none) and no organic false
    positives appear (organic max cosine ≈ 0.48 < 0.92)."""
    big = queries()["x_semdedup"](spark, SF_BENCH)
    rows = big.collect()
    assert sum(r["n_removed"] for r in rows) == 10
    assert sum(r["n_dup_pairs"] for r in rows) == 10
    assert sum(r["n_members"] for r in rows) == load(
        spark, SF_BENCH, "embeddings"
    ).count() + 10
    # NOTE: no exchange-count compare vs sf0.001 — at the small SF the
    # intra-cluster join broadcasts (fewer Exchanges); at 10× AQE
    # correctly promotes it to a shuffle join. Size-adaptive strategy
    # IS the contract; the disjoint-copy test below pins the semantics.


def test_semdedup_4x_disjoint_seed_spaces(spark):
    """4 copies with per-copy seed sets (vec_id strides keep copy 0's
    ids, other copies offset by stride but seeds re-created per copy by
    construction below): identical vectors re-inserted once per copy ⇒
    each copy contributes the same dup structure against the SHARED
    8-seed quantizer, so pair counts scale by C(4,2)+4 choose-2 growth
    of identical groups: with g copies of each vector, pairs per vector
    = g·(g−1)/2 and removed = g−1."""
    e = load(spark, SF_SMALL, "embeddings").select("vec_id", "embedding")
    g = 3
    stride = 1_000_000
    em = _union(
        [
            e.select((F.col("vec_id") + F.lit(i).cast("long") * stride).alias("vec_id"), "embedding")
            for i in range(g)
        ]
    )
    rows = semdedup_counts(em).collect()
    n_vecs = e.count()
    assert sum(r["n_members"] for r in rows) == g * n_vecs
    # every vector now exists g times: pairs = n_vecs * g(g-1)/2,
    # removed = n_vecs * (g-1)
    assert sum(r["n_dup_pairs"] for r in rows) == n_vecs * g * (g - 1) // 2
    assert sum(r["n_removed"] for r in rows) == n_vecs * (g - 1)


def test_bigram_logprob_invariant_under_corpus_replication(spark):
    """Replicating the corpus k× multiplies every bigram count and every
    context count by k, so P(w₂|w₁) — and therefore every document's
    score — is EXACTLY invariant: the quality signal depends on the
    distribution, not the corpus size."""
    base = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logp"])
        for r in queries()["x_bigram_logprob"](spark, SF_SMALL).collect()
    }
    d = load(spark, SF_SMALL, "documents")
    copies = 4
    big = _union(
        [
            d.select(
                (F.col("doc_id") + F.lit(i).cast("long") * 10_000_000).alias("doc_id"),
                "text",
            )
            for i in range(copies)
        ]
    )
    from pyspark.sql import DataFrame

    ws = F.filter(F.split("text", " "), lambda t: t != "")
    pairs = F.expr(
        "transform(sequence(1, size(ws) - 1),"
        " i -> struct(ws[i - 1] AS w1, ws[i] AS w2))"
    )
    bg = (
        big.select("doc_id", ws.alias("ws"))
        .where(F.size("ws") >= 2)
        .select("doc_id", F.explode(pairs).alias("p"))
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("n2"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).cast("long").alias("n1"))
    term = F.log2(F.col("n2").cast("double") / F.col("n1")).cast("decimal(18,4)")
    out = (
        bg.join(c2, ["w1", "w2"])
        .join(c1, ["w1"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(F.sum(term).cast("double") / F.count(F.lit(1)), 6).alias("avg_logp"),
        )
    )
    got = {r["doc_id"]: (r["n_bigrams"], r["avg_logp"]) for r in out.collect()}
    for doc_id, v in base.items():
        for i in range(copies):
            assert got[doc_id + i * 10_000_000] == v


def test_mixture_sample_rates_invariant_under_replication(spark):
    """k× corpus with fresh doc_ids: per-source weights and keep-rates
    are scale-free (√(kn)/Σ√(kn) = √n/Σ√n), and the realized sample
    fraction tracks the rate within binomial tolerance."""
    base = {r["source"]: r for r in queries()["x_mixture_sample"](spark, SF_SMALL).collect()}
    got = {r["source"]: r for r in queries()["x_mixture_sample"](spark, SF_BENCH).collect()}
    assert set(got) == set(base)
    for s, b in base.items():
        r = got[s]
        # sf0.1 has 10× docs per source (same generator): weights equal
        assert abs(r["weight"] - b["weight"]) < 0.02
        frac = r["n_sampled"] / r["n_docs"]
        # binomial σ ≈ √(r(1−r)/n) ≈ 0.022 at n = 500 per source: allow 4σ
        assert abs(frac - r["rate"]) < 0.09


def test_dedup_incremental_4x_batch(spark):
    """4× the incoming batch (disjoint new-doc ids, same planted
    copies): per-day work scales with the batch, the corpus side is
    untouched, and every planted copy in every replica still matches
    its original at Jaccard 1.0."""
    from googleanalytics_etl_spark.ops.round5e import _km_sigs

    d = load(spark, SF_SMALL, "documents")
    corpus = d.where(F.col("source") != "src19").select(
        "doc_id", "text", F.lit("c").alias("side")
    )
    reps = 4
    parts = []
    for i in range(reps):
        parts.append(
            d.where(F.col("source") == "src19").select(
                (F.col("doc_id") + F.lit(i).cast("long") * 20_000_000).alias("doc_id"),
                "text",
            )
        )
        parts.append(
            d.where(F.col("doc_id") < 5).select(
                (F.col("doc_id") + F.lit(3_000_000 + i * 20_000_000).cast("long")).alias("doc_id"),
                "text",
            )
        )
    newb = _union(parts).select("doc_id", "text", F.lit("n").alias("side"))
    banded, hset = _km_sigs(corpus.unionByName(newb))
    bn = banded.where(F.col("side") == "n").select(
        F.col("doc_id").alias("new_id"), "band", "bucket"
    )
    bo = banded.select(
        F.col("doc_id").alias("old_id"), F.col("side").alias("oside"), "band", "bucket"
    )
    cand = (
        bn.join(bo, ["band", "bucket"])
        .where(
            (F.col("oside") == "c")
            | ((F.col("oside") == "n") & (F.col("old_id") < F.col("new_id")))
        )
        .select("new_id", "old_id")
        .distinct()
    )
    s1 = hset.select(F.col("doc_id").alias("new_id"), F.col("hsig").alias("h_new"))
    s2 = hset.select(F.col("doc_id").alias("old_id"), F.col("hsig").alias("h_old"))
    inter = F.size(F.array_intersect("h_new", "h_old"))
    union = F.size(F.array_distinct(F.concat("h_new", "h_old")))
    verified = (
        cand.join(s1, "new_id")
        .join(s2, "old_id")
        .select("new_id", "old_id", (inter.cast("double") / union).alias("j"))
        .where(F.col("j") >= 0.5)
    )
    # every planted replica found a partner at jaccard 1.0
    planted = verified.where(
        (F.col("new_id") % 20_000_000 >= 3_000_000)
        & (F.col("new_id") % 20_000_000 < 3_000_005)
    )
    perfect = planted.where(F.col("j") >= 0.999).select("new_id").distinct().count()
    assert perfect == 5 * reps


def test_curation_e2e_funnel_at_sf01(spark):
    """The curation funnel at the 10× corpus: stage monotonicity holds,
    planted dups are dropped, and the per-lang cap binds (n_sampled ≤
    100 per lang with at least one lang saturated)."""
    rows = queries()["x_curation_e2e"](spark, SF_BENCH).collect()
    assert sum(r["n_raw"] for r in rows) == load(
        spark, SF_BENCH, "documents"
    ).count() + 10
    for r in rows:
        assert (
            r["n_raw"] >= r["n_quality"] >= r["n_unique"] >= r["n_clean"] >= r["n_sampled"]
        )
        assert r["n_sampled"] <= 100
    assert any(r["n_sampled"] == 100 for r in rows)
