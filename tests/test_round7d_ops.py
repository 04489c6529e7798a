"""Semantic tests for round-7 batch 4 (distributed power iteration,
streaming mergeable HLL). test_oracle.py proves Spark == DuckDB; these
check convergence against numpy and the semilattice merge property.
"""

from __future__ import annotations

import math

import numpy as np

from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.registry import queries


def test_power_iteration_converges_to_numpy_eig(spark):
    rows = queries()["x_power_iteration"](spark, SF_SMALL).collect()
    assert len(rows) == 64
    v = np.zeros(64)
    for r in rows:
        v[r["dim"]] = r["component"]
    # unit norm (rounded components: loose tolerance)
    assert abs(np.linalg.norm(v) - 1.0) < 1e-3
    lam = rows[0]["eigenvalue"]
    ratio = rows[0]["explained_ratio"]
    assert all(r["eigenvalue"] == lam for r in rows)
    assert 0.0 < ratio <= 1.0

    # exact replay of the same three quantized iterations
    from decimal import Decimal

    def q(x: float) -> Decimal:
        return Decimal(f"{x:.12f}")  # the op's DECIMAL(28,12) grid

    X = np.array(
        [
            np.round(np.asarray(r["embedding"], dtype=np.float64) * 1e7)
            for r in load(spark, SF_SMALL, "embeddings")
            .select("embedding")
            .collect()
        ]
    )
    Gq = (X.T @ X) / 1e14  # exact: integer sums descaled once
    vk = np.full(64, 1.0 / math.sqrt(64.0))
    for _ in range(3):
        y = np.array(
            [
                float(sum(q(Gq[i, j] * vk[j]) for j in range(64)))
                for i in range(64)
            ]
        )
        nrm = math.sqrt(float(sum(q(y[i] * y[i]) for i in range(64))))
        vk = y / nrm
    assert np.allclose(v, np.round(vk, 6), atol=2e-6)
    lam_replay = float(
        sum(
            q(Gq[i, j] * vk[i] * vk[j])
            for i in range(64)
            for j in range(64)
        )
    )
    assert lam == round(lam_replay, 4)
    # variational bounds: trace/d ≤ Rayleigh ≤ λ₁ (power iteration on a
    # PSD matrix increases the quotient from the uniform start)
    w, _ = np.linalg.eigh(Gq)
    assert lam <= w[-1] * 1.0001
    assert lam >= np.trace(Gq) / 64 - 1e-6


def test_hll_merge_equals_batch_sketch(spark):
    merged = queries()["s_hll_merge"](spark, SF_SMALL).collect()[0]
    batch = queries()["x_hll_relational"](spark, SF_SMALL).collect()[0]
    # the semilattice property: streaming register fold == batch sketch
    assert merged["est"] == batch["est"]
    assert merged["v0"] == batch["v0"]
    assert merged["n_exact"] == batch["n_exact"]
    assert merged["in_bound"] == 1
    # a re-run (fresh checkpoint) converges to the same state
    again = queries()["s_hll_merge"](spark, SF_SMALL).collect()[0]
    assert again["est"] == merged["est"]
    assert math.isfinite(merged["rel_err"])
