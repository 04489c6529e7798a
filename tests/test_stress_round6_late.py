"""Scale-up stress checks for the late round-6 ops (batches 31–36):
disjoint-copy constructions predict the outputs exactly, so these pin
both the scale behavior (pair spaces stay bounded, windows stay
entity-local) and a correctness invariant no fixture-sized oracle
covers.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.ops.round6ae import (
    graph_2hop_frame,
    sequence_mining_frame,
)
from googleanalytics_etl_spark.ops.round6ai import item_cf_frame
from googleanalytics_etl_spark.ops.round6aj import peak_concurrency_frame

USER_STRIDE = 10_000_000


def _events_copies(spark, copies: int, cols):
    e = load(spark, SF_SMALL, "events").select(*cols)
    parts = []
    for i in range(copies):
        p = e
        if "event_id" in cols:
            p = p.withColumn(
                "event_id",
                F.col("event_id") + F.lit(i).cast("long") * 1_000_000_000,
            )
        p = p.withColumn(
            "user_id", F.col("user_id") + F.lit(i).cast("long") * USER_STRIDE
        )
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return e, out


def test_item_cf_disjoint_users_6x(spark):
    """6 disjoint user populations over the SAME item catalog: every
    dot product and co-user count scales exactly 6×, cosines are
    IDENTICAL (numerator and both norms scale together), so the
    neighbor lists don't move. Pair space stays item-domain bounded —
    more users never widen the output."""
    base_df, big = _events_copies(spark, 6, ["user_id", "props"])
    base = {
        (r["item"], r["neighbor"]): r
        for r in item_cf_frame(base_df).collect()
    }
    got = {
        (r["item"], r["neighbor"]): r for r in item_cf_frame(big).collect()
    }
    # sqrt(6a)·sqrt(6b) ≠ 6·sqrt(a)·sqrt(b) in the last ulp, so EXACT
    # sim ties can swap which neighbor makes the top-k cut under the
    # ×6 construction (within one run the op is fully deterministic:
    # both engines divide identical integers). The ulp-robust
    # invariants: per-item top-k sim PROFILES are identical, and every
    # pair present in both runs scales exactly.
    from collections import defaultdict

    prof_base, prof_got = defaultdict(list), defaultdict(list)
    for (i, _), r in base.items():
        prof_base[i].append(r["sim"])
    for (i, _), r in got.items():
        prof_got[i].append(r["sim"])
    assert set(prof_got) == set(prof_base)
    for i in prof_base:
        assert sorted(prof_got[i]) == sorted(prof_base[i])
    shared = set(got) & set(base)
    assert len(shared) >= len(base) * 9 // 10  # only exact ties may swap
    for k in shared:
        b, g = base[k], got[k]
        assert g["dot"] == 6 * b["dot"]
        assert g["n_users"] == 6 * b["n_users"]
        assert abs(g["sim"] - b["sim"]) < 1e-9


def test_sequence_mining_disjoint_users_8x(spark):
    """8 disjoint user populations: occurrence and user support scale
    exactly 8×; the mean gap is invariant. The lead-window shape means
    output stays event-type-domain sized at any multiple."""
    base_df, big = _events_copies(
        spark, 8, ["user_id", "ts", "event_id", "event_type"]
    )
    base = {
        (r["antecedent"], r["consequent"]): r
        for r in sequence_mining_frame(base_df).collect()
    }
    got = {
        (r["antecedent"], r["consequent"]): r
        for r in sequence_mining_frame(big).collect()
    }
    assert set(got) == set(base)
    for k, g in got.items():
        b = base[k]
        assert g["n_occurrences"] == 8 * b["n_occurrences"]
        assert g["n_users"] == 8 * b["n_users"]
        assert abs(g["mean_gap"] - b["mean_gap"]) < 1e-9


def test_peak_concurrency_disjoint_users_6x(spark):
    """6 disjoint user populations with identical timestamps: the
    concurrency step function is 6× the base curve pointwise, so each
    day's peak scales exactly 6× and is attained at the same earliest
    instant."""
    base_df, big = _events_copies(
        spark, 6, ["user_id", "ts", "event_id", "event_type"]
    )
    base = {r["day"]: r for r in peak_concurrency_frame(base_df).collect()}
    got = {r["day"]: r for r in peak_concurrency_frame(big).collect()}
    assert set(got) == set(base)
    for day, g in got.items():
        b = base[day]
        assert g["peak_concurrency"] == 6 * b["peak_concurrency"]
        assert g["peak_ts"] == b["peak_ts"]


def test_graph_2hop_disjoint_copies_6x(spark):
    """6 disjoint co-purchase graphs (orders AND parts remapped): each
    copy reproduces the base reach table exactly, so the output is 6
    interleaved copies — counts 6×, per-part values unchanged. The
    capped join cannot couple copies because no key crosses them."""
    li = load(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_partkey")
    parts = [
        li.select(
            (F.col("l_orderkey") + F.lit(i).cast("long") * 1_000_000_000)
            .alias("l_orderkey"),
            (F.col("l_partkey") + F.lit(i).cast("long") * 10_000_000)
            .alias("l_partkey"),
        )
        for i in range(6)
    ]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    base = {r["part"]: r for r in graph_2hop_frame(li).collect()}
    got = {r["part"]: r for r in graph_2hop_frame(big).collect()}
    assert len(got) == 6 * len(base)
    for part, g in got.items():
        b = base[part % 10_000_000]
        assert g["n_1hop"] == b["n_1hop"]
        assert g["n_2hop"] == b["n_2hop"]


def test_graph_stats_disjoint_copies_4x(spark):
    """4 disjoint co-purchase graphs: per-part degree/triangles/
    clustering are unchanged in every copy, and assortativity — a
    GLOBAL correlation — is exactly invariant because each copy
    contributes identical moment blocks."""
    from googleanalytics_etl_spark.ops.round6ae import copurchase_edges
    from googleanalytics_etl_spark.registry import queries

    li_base = load(spark, SF_SMALL, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    base_deg = {
        r["v"]: r["d"]
        for r in copurchase_edges(li_base)
        .groupBy(F.col("src").alias("v"))
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
        .collect()
    }
    base_as = queries()["x_assortativity"](spark, SF_SMALL).collect()[0]
    li = load(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_partkey")
    parts = [
        li.select(
            (F.col("l_orderkey") + F.lit(i).cast("long") * 1_000_000_000)
            .alias("l_orderkey"),
            (F.col("l_partkey") + F.lit(i).cast("long") * 10_000_000)
            .alias("l_partkey"),
        )
        for i in range(4)
    ]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)

    # rebuild the same pipelines inline over the scaled edge list
    edges = copurchase_edges(big)
    deg = edges.groupBy(F.col("src").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    got_deg = {r["v"]: r["d"] for r in deg.collect()}
    assert len(got_deg) == 4 * len(base_deg)
    for v, d in got_deg.items():
        assert d == base_deg[v % 10_000_000]
    # global assortativity invariant under disjoint replication
    du = deg.select(F.col("v").alias("src"), F.col("d").alias("x"))
    dv = deg.select(F.col("v").alias("dst"), F.col("d").alias("y"))
    pairs = edges.join(F.broadcast(du), "src").join(F.broadcast(dv), "dst")
    m = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    ).collect()[0]
    import math

    r = (m["n"] * m["sxy"] - m["sx"] * m["sy"]) / (
        math.sqrt(m["n"] * m["sxx"] - m["sx"] * m["sx"])
        * math.sqrt(m["n"] * m["syy"] - m["sy"] * m["sy"])
    )
    assert m["n"] == 4 * base_as["n_edges"]
    assert abs(round(r, 6) - base_as["assortativity"]) < 2e-6
