"""Convergence tests for the library fixpoint variants (VERDICT r7
item 5): kcore(k) peeling to convergence beside the fixed-depth
x_kcore_peel, and top_eigvec(tol) beside the 3-step x_power_iteration —
certified the same way graph.py's connected_components_star is (exact
fixpoint conditions plus agreement with independent computations).
"""

from __future__ import annotations

import math

import numpy as np

from conftest import SF_SMALL

from googleanalytics_etl_spark.graph import kcore, top_eigvec
from googleanalytics_etl_spark.io import load

from pyspark.sql import functions as F


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "a long, b long")


def test_kcore_dissolves_long_chain_beyond_fixed_depth(spark):
    # an 8-node pendant chain hanging off a 4-clique, k=2: only the
    # chain's free END is below k each round, so the chain dissolves
    # ONE leaf per round — ~9 rounds, beyond any fixed 3-round
    # unroll (this is precisely what the library fixpoint form is for);
    # the clique (all degrees >= 3) is the exact 2-core left standing
    clique = [(100, 101), (100, 102), (100, 103), (101, 102), (101, 103), (102, 103)]
    chain = [(i, i + 1) for i in range(8)] + [(7, 100)]
    core, rounds = kcore(_edges(spark, clique + chain), k=2)
    got = sorted((r["a"], r["b"]) for r in core.collect())
    assert got == sorted(clique)
    assert rounds > 3  # fixed-depth unrolling would NOT have reached it

    # fixpoint property: every node in the core has degree >= k
    deg = (
        core.select(F.col("a").alias("v"))
        .unionAll(core.select(F.col("b").alias("v")))
        .groupBy("v")
        .count()
    )
    assert deg.agg(F.min("count")).first()[0] >= 2


def test_kcore_empty_and_already_core_inputs(spark):
    # a pure chain has an EMPTY 2-core... (no cycle)
    chain = [(i, i + 1) for i in range(10)]
    core, _ = kcore(_edges(spark, chain), k=2)
    assert core.count() == 0
    # ...and a triangle IS its own 2-core: one round observes the
    # fixpoint and returns the input unchanged
    tri = [(1, 2), (2, 3), (1, 3)]
    core, rounds = kcore(_edges(spark, tri), k=2)
    assert sorted((r["a"], r["b"]) for r in core.collect()) == sorted(tri)
    assert rounds == 1


def test_kcore_matches_registered_peel_profile(spark):
    # on the same support->=2 co-purchase graph the registered
    # x_kcore_peel profiles, the converged core must be a subgraph of
    # every unrolled round's survivor set and satisfy min-degree >= k
    li = (
        load(spark, SF_SMALL, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("a"), F.col("b.l_partkey").alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("s"))
        .where(F.col("s") >= 2)
        .select("a", "b")
    )
    core, rounds = kcore(edges, k=3)
    assert rounds >= 1
    n_core = core.count()
    if n_core:  # tiny fixtures may have an empty 3-core — both valid
        deg = (
            core.select(F.col("a").alias("v"))
            .unionAll(core.select(F.col("b").alias("v")))
            .groupBy("v")
            .count()
        )
        assert deg.agg(F.min("count")).first()[0] >= 3
    # subgraph of the original edge set
    assert core.exceptAll(edges.select("a", "b")).count() == 0


def test_top_eigvec_converges_to_numpy(spark):
    # Gram matrix of the sf0.001 embeddings, built once (the
    # x_power_iteration input shape), then iterated to 1e-10
    X = np.array(
        [
            np.asarray(r["embedding"], dtype=np.float64)
            for r in load(spark, SF_SMALL, "embeddings")
            .select("embedding")
            .collect()
        ]
    )
    G = X.T @ X
    d = G.shape[0]
    rows = [
        (int(i), int(j), float(G[i, j])) for i in range(d) for j in range(d)
    ]
    gdf = spark.createDataFrame(rows, "i long, j long, gv double")

    v, lam, iters = top_eigvec(gdf, d, tol=1e-10)
    assert iters >= 1
    w, V = np.linalg.eigh(G)
    v_np = V[:, -1]
    if v_np.sum() < 0:  # numpy's sign is arbitrary; ours is pinned
        v_np = -v_np
    assert np.allclose(np.array(v), v_np, atol=1e-6)
    assert math.isclose(lam, w[-1], rel_tol=1e-8)
    # unit norm
    assert math.isclose(sum(x * x for x in v), 1.0, rel_tol=1e-9)


def test_top_eigvec_tolerance_controls_iteration_count(spark):
    # a matrix with a small spectral gap needs MORE iterations at a
    # tighter tolerance — the knob the fixed 3-step key cannot offer
    G = np.diag([1.0, 0.9, 0.5])
    rows = [(i, j, float(G[i, j])) for i in range(3) for j in range(3)]
    gdf = spark.createDataFrame(rows, "i long, j long, gv double")
    _, lam_loose, it_loose = top_eigvec(gdf, 3, tol=1e-2)
    v, lam_tight, it_tight = top_eigvec(gdf, 3, tol=1e-8)
    assert it_tight > it_loose
    assert abs(lam_tight - 1.0) < 1e-6
    assert abs(v[0]) > 0.999  # converged onto e1
