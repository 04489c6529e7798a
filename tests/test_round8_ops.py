"""Semantic tests for round-8 batch 1 (streaming mergeable quantile
histogram, streaming theta/KMV distinct). test_oracle.py proves
Spark == DuckDB; these check the merge algebra directly — the fold
result must equal the whole-log sketch computed in one batch — plus
the estimator bounds and determinism across re-runs.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.ops.round8 import (
    _KLL_B,
    _KLL_QS,
    _KLL_W,
    _KMV_K,
    _KMV_SPACE,
)
from googleanalytics_etl_spark.registry import queries


def test_kll_merge_rank_certified_and_deterministic(spark):
    rows = queries()["s_kll_merge"](spark, SF_SMALL).collect()
    assert [r["q"] for r in rows] == sorted(_KLL_QS)
    n = load(spark, SF_SMALL, "events").count()
    for r in rows:
        # rank certification held on every quantile
        assert r["in_bound"] == 1
        assert r["target_rank"] == math.ceil(r["q"] * n)
        assert 0 <= r["bin_idx"] < _KLL_B
        assert r["est"] == (r["bin_idx"] + 1) * _KLL_W
        # the estimate brackets the true quantile within one bin: at
        # least target_rank values below the upper edge, and fewer than
        # target_rank strictly below the lower edge
        assert r["cnt_below"] >= r["target_rank"]
    # deterministic across re-runs (fresh checkpoint, same fold)
    again = queries()["s_kll_merge"](spark, SF_SMALL).collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in rows]


def test_kll_merge_fold_equals_whole_log_histogram(spark):
    # replay the fold's defining property: summing per-chunk histograms
    # equals the whole-log histogram (count addition is a monoid)
    ev = load(spark, SF_SMALL, "events").select(
        F.least(F.floor(F.col("value") / _KLL_W), F.lit(_KLL_B - 1))
        .cast("long")
        .alias("b")
    )
    whole = {
        r["b"]: r["c"]
        for r in ev.groupBy("b").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    halves = ev.randomSplit([0.5, 0.5], seed=8)
    folded: dict[int, int] = {}
    for h in halves:
        for r in h.groupBy("b").agg(F.count(F.lit(1)).alias("c")).collect():
            folded[r["b"]] = folded.get(r["b"], 0) + r["c"]
    assert folded == whole


def test_theta_merge_bound_and_semilattice(spark):
    row = queries()["s_theta_merge"](spark, SF_SMALL).collect()[0]
    assert row["k"] == _KMV_K
    assert row["in_bound"] == 1
    assert 0 < row["kth_hv"] < int(_KMV_SPACE)
    assert math.isfinite(row["rel_err"])

    # semilattice replay: bottom-k of the union of per-half bottom-ks
    # equals the whole-log bottom-k
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
    ev = load(spark, SF_SMALL, "events").select(hv.alias("hv")).distinct()
    whole = [r["hv"] for r in ev.orderBy("hv").limit(_KMV_K).collect()]
    folded: set[int] = set()
    for h in ev.randomSplit([0.5, 0.5], seed=8):
        folded.update(
            r["hv"] for r in h.orderBy("hv").limit(_KMV_K).collect()
        )
    assert sorted(folded)[:_KMV_K] == whole

    # the estimate the key reports is the KMV formula on that state
    n_seen = len(whole)
    if n_seen >= _KMV_K:
        expect = (_KMV_K - 1) * _KMV_SPACE / float(whole[-1])
    else:
        expect = float(n_seen)
    assert row["est"] == round(expect, 2)

    again = queries()["s_theta_merge"](spark, SF_SMALL).collect()[0]
    assert tuple(again) == tuple(row)


def test_kmv_diff_flags_and_bound(spark):
    row = queries()["x_kmv_diff"](spark, SF_SMALL).collect()[0]
    assert row["k"] == 256
    assert row["in_bound"] == 1
    assert 0 <= row["frac_k"] <= 1
    assert row["n_diff"] <= row["n_union"]
    # difference can never exceed the union estimate
    assert row["est_diff"] <= row["est_union"] + 1e-9
    # deterministic across re-runs (pure batch op)
    again = queries()["x_kmv_diff"](spark, SF_SMALL).collect()[0]
    assert tuple(again) == tuple(row)
    # the sampled fraction tracks the exact one within the 3-sigma
    # Bernoulli bound the key itself certifies
    assert row["frac_err"] <= 3.0 * (0.25 / 256) ** 0.5


def test_countmin_merge_equals_batch_sketch(spark):
    # the monoid property: streaming counter fold == the batch sketch,
    # so the estimates must equal x_countmin_bound's row-for-row
    merged = {
        r["user_id"]: tuple(r)
        for r in queries()["s_countmin_merge"](spark, SF_SMALL).collect()
    }
    batch = {
        r["user_id"]: tuple(r)
        for r in queries()["x_countmin_bound"](spark, SF_SMALL).collect()
    }
    assert merged == batch
    assert all(r[-1] == 1 for r in merged.values())  # every in_bound


def test_s_semdedup_matches_batch_rule_and_drops_planted(spark):
    from pyspark.sql import functions as F

    surv = queries()["s_semdedup"](spark, SF_SMALL)
    ids = {r["vec_id"] for r in surv.collect()}
    em = load(spark, SF_SMALL, "embeddings")
    n = em.count()
    # every organic vector survives (fixture vectors are near-orthogonal,
    # max organic cosine ~0.48 < 0.9)...
    assert set(range(n)) <= ids
    # ...and every planted identical tail copy (vec_id+1e6, arriving
    # after its original is indexed) is dropped
    assert not any(v >= 1_000_000 for v in ids)
    assert len(ids) == n
    # deterministic across re-runs (fresh checkpoint, same fold)
    again = {r["vec_id"] for r in queries()["s_semdedup"](spark, SF_SMALL).collect()}
    assert again == ids
