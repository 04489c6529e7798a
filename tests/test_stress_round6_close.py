"""Scale-up stress checks for the closing round-6 ops (batches 33-49):
replication constructions predict the outputs exactly — pinning that
the moment algebra, crossing predicates, and funnel chains behave at
multiples of the fixture the oracles never see.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.ops.round6ag import funnel_windowed_frame
from googleanalytics_etl_spark.ops.round6ah import ab_cuped_frame
from googleanalytics_etl_spark.ops.round6ao import weighted_percentile_frame

USER_STRIDE = 10_000_000


def _events_copies(spark, copies: int):
    e = load(spark, SF_SMALL, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    parts = [
        e.select(
            (F.col("user_id") + F.lit(i).cast("long") * USER_STRIDE).alias(
                "user_id"
            ),
            "ts",
            (F.col("event_id") + F.lit(i).cast("long") * 1_000_000_000).alias(
                "event_id"
            ),
            "event_type",
            "value",
        )
        for i in range(copies)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return e, out


def test_funnel_windowed_disjoint_users_5x(spark):
    """5 disjoint user populations with identical event streams: every
    stage count scales exactly 5× — per-user chains never couple
    across users, so replication is pure multiplication."""
    base_df, big = _events_copies(spark, 5)
    base = funnel_windowed_frame(base_df).collect()[0]
    got = funnel_windowed_frame(big).collect()[0]
    assert got["n_view_users"] == 5 * base["n_view_users"]
    assert got["n_click_users"] == 5 * base["n_click_users"]
    assert got["n_purchase_users"] == 5 * base["n_purchase_users"]


def test_ab_cuped_invariant_under_replication_5x(spark):
    """5 disjoint copies of the SAME user population (md5 strides keep
    copies split differently, so compare the pooled statistics that
    replication provably preserves): theta and the variance-reduction
    ratio are ratios of moment combinations that all scale by the
    copy count — both must be EXACTLY invariant; per-variant means
    stay within the original population's range."""
    base_df, big = _events_copies(spark, 5)
    base = {r["variant"]: r for r in ab_cuped_frame(base_df).collect()}
    got = {r["variant"]: r for r in ab_cuped_frame(big).collect()}
    # theta/var_ratio are POOLED statistics over the user (x, y)
    # multiset, which replication copies exactly (strides change ids,
    # not values): every moment combination (n·Σxy − Σx·Σy, …) scales
    # by 5² and the ratios are EXACTLY preserved. Variant assignment
    # follows the id, so per-variant means move — the pooled
    # statistics are the invariance contract.
    assert abs(got["A"]["theta"] - base["A"]["theta"]) < 1e-9
    assert abs(got["A"]["var_ratio"] - base["A"]["var_ratio"]) < 1e-9
    assert 0.0 < got["A"]["var_ratio"] <= 1.0
    n_base = sum(r["n_users"] for r in base.values())
    n_got = sum(r["n_users"] for r in got.values())
    assert n_got == 5 * n_base


def test_weighted_percentile_replication_4x(spark):
    """Replicating lineitem 4× (same keys — a pure multiset scale-up):
    total weight quadruples while every crossing lands on the same
    VALUE (cumulative shares are invariant under uniform replication
    when ties group together in the sort), so w_p50/w_p90 move by at
    most one tie-group and the fixture (unique prices) keeps them
    EXACTLY equal."""
    li = load(spark, SF_SMALL, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity",
        "l_orderkey", "l_linenumber",
    )
    big = li
    for _ in range(3):
        big = big.unionByName(li)
    base = {r["l_returnflag"]: r for r in
            weighted_percentile_frame(li).collect()}
    got = {r["l_returnflag"]: r for r in
           weighted_percentile_frame(big).collect()}
    assert set(got) == set(base)
    for flag, g in got.items():
        b = base[flag]
        assert g["n"] == 4 * b["n"]
        assert abs(g["total_w"] - 4 * b["total_w"]) < 1e-6
        assert g["w_p50"] == b["w_p50"]
        assert g["w_p90"] == b["w_p90"]
