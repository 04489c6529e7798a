"""Round-4 batch-2 operators: full-outer reconciliation, boolean
aggregates, window long tail, OLS regression, repetition scoring,
feature hashing.

Cross-engine value correctness is the differential harness's job (all
six keys carry full oracles); these tests pin semantics the oracle
construction shares with the implementation and therefore cannot
falsify — full-outer actually preserves both unmatched sides, the
regression matches numpy's closed form, repetition stats satisfy their
algebraic invariants, and the feature-hash bucketing is a total
partition of the token space."""

from __future__ import annotations

import numpy as np
import pytest
from conftest import SF_SMALL

from pyspark.sql import functions as F

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.registry import queries


def test_join_full_keeps_both_unmatched_sides(spark):
    rows = queries()["q_join_full"](spark, SF_SMALL).collect()
    presence = {r["presence"] for r in rows}
    # fixture has view-only users AND purchase-only users at every SF
    assert {"both", "view_only", "purchase_only"} <= presence
    # union of keys == union of the two input key sets, exactly once each
    assert len({(r["user_id"], r["day"]) for r in rows}) == len(rows)
    e = load(spark, SF_SMALL, "events")
    want = (
        e.where(F.col("event_type").isin("view", "purchase"))
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
        .count()
    )
    assert len(rows) == want
    for r in rows:
        if r["presence"] == "view_only":
            assert r["n_purchases"] == 0 and r["n_views"] > 0
        elif r["presence"] == "purchase_only":
            assert r["n_views"] == 0 and r["n_purchases"] > 0
        else:
            assert r["n_views"] > 0 and r["n_purchases"] > 0


def test_agg_boolean_matches_recount(spark):
    rows = {r["event_type"]: r for r in queries()["q_agg_boolean"](spark, SF_SMALL).collect()}
    e = load(spark, SF_SMALL, "events").collect()
    by_type: dict[str, list[float]] = {}
    for r in e:
        by_type.setdefault(r["event_type"], []).append(r["value"])
    assert set(rows) == set(by_type)
    for t, vals in by_type.items():
        assert rows[t]["all_nonneg"] == all(v >= 0 for v in vals)
        assert rows[t]["any_gt450"] == any(v > 450 for v in vals)
        assert rows[t]["n_gt200"] == sum(1 for v in vals if v > 200)
        assert rows[t]["n_rows"] == len(vals)


def test_window_misc_invariants(spark):
    rows = queries()["q_window_misc"](spark, SF_SMALL).collect()
    assert rows
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for uid, grp in by_user.items():
        grp.sort(key=lambda r: r["cdist"])
        n = len(grp)
        # cume_dist over a unique ordering is exactly k/n
        for k, r in enumerate(grp, start=1):
            assert r["cdist"] == pytest.approx(k / n, abs=0)
        # exactly one terminal row per user
        assert sum(1 for r in grp if r["next_type"] == "END") == 1
        # second_type constant across the partition; None iff n < 2
        seconds = {r["second_type"] for r in grp}
        assert len(seconds) == 1
        assert (None in seconds) == (n < 2)


def test_regression_matches_numpy(spark):
    got = {r["l_returnflag"]: r for r in queries()["q_regression"](spark, SF_SMALL).collect()}
    li = load(spark, SF_SMALL, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    ).collect()
    groups: dict[str, list] = {}
    for r in li:
        groups.setdefault(r["l_returnflag"], []).append(
            (r["l_quantity"], r["l_extendedprice"])
        )
    for flag, pts in groups.items():
        x = np.array([p[0] for p in pts])
        y = np.array([p[1] for p in pts])
        slope, intercept = np.polyfit(x, y, 1)
        r2 = np.corrcoef(x, y)[0, 1] ** 2
        # outputs are ROUND()ed (6dp slope/r2, 4dp intercept) — compare
        # with absolute tolerances just past the rounding quantum
        assert got[flag]["slope"] == pytest.approx(slope, abs=1e-5)
        assert got[flag]["intercept"] == pytest.approx(intercept, abs=1e-3)
        assert got[flag]["r2"] == pytest.approx(r2, abs=1e-5)
        assert got[flag]["n_rows"] == len(pts)


def test_repetition_score_invariants(spark):
    rows = queries()["x_repetition_score"](spark, SF_SMALL).collect()
    n_docs = load(spark, SF_SMALL, "documents").count()
    assert len(rows) == n_docs
    for r in rows:
        assert 1 <= r["n_distinct"] <= r["n_tokens"]
        assert 1 <= r["top_count"] <= r["n_tokens"]
        assert 0.0 <= r["dup_frac"] < 1.0
        assert 0.0 < r["top_frac"] <= 1.0
        assert 0.0 <= r["simpson_diversity"] < 1.0
        # all tokens identical  <=>  zero diversity
        if r["n_distinct"] == 1:
            assert r["simpson_diversity"] == 0.0
        # algebraic identity: dup_frac == 0 iff every token unique
        assert (r["dup_frac"] == 0.0) == (r["n_distinct"] == r["n_tokens"])
    # word-soup fixture text must show real repetition somewhere
    assert any(r["dup_frac"] > 0.3 for r in rows)


def test_feature_hash_partitions_token_space(spark):
    from googleanalytics_etl_spark.ops.round4b import _FHASH_BUCKETS

    rows = queries()["x_feature_hash"](spark, SF_SMALL).collect()
    assert all(0 <= r["bucket"] < _FHASH_BUCKETS for r in rows)
    d = load(spark, SF_SMALL, "documents")
    tok = d.select("lang", F.explode(F.split("text", " ")).alias("tok"))
    # bucket counts sum back to the exact token count per lang (totality)
    want = {r["lang"]: r["n"] for r in tok.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    got: dict[str, int] = {}
    for r in rows:
        got[r["lang"]] = got.get(r["lang"], 0) + r["n_tokens"]
    assert got == want
    # distinct terms spread across many buckets (hash actually
    # disperses) — the fixture vocabulary is small, so the bar is
    # relative to it: used buckets ≥ half the ideal occupancy
    vocab = tok.select("tok").distinct().count()
    ideal = min(vocab, _FHASH_BUCKETS)
    used_global = len({r["bucket"] for r in rows})
    assert used_global >= ideal // 2
