"""Round-4 batch-6: Gram matrix + PCA power iteration, discrete
percentiles — numpy/Python parity checks."""

from __future__ import annotations

import math

import numpy as np
import pytest
from conftest import SF_SMALL

from pyspark.sql import functions as F

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.registry import queries


def _corpus(spark):
    rows = load(spark, SF_SMALL, "embeddings").select("vec_id", "embedding").collect()
    X = np.array([[float(x) for x in r["embedding"]] for r in rows])
    return np.round(X * 10_000_000).astype(np.int64)  # the 1e7 grid


def test_gram_matrix_matches_numpy(spark):
    got = {(r["i"], r["j"]): r["g"] for r in queries()["x_gram_matrix"](spark, SF_SMALL).collect()}
    S = _corpus(spark)
    G = (S.astype(object).T @ S.astype(object))  # exact int arithmetic
    d = S.shape[1]
    assert len(got) == d * (d + 1) // 2
    for i in range(d):
        for j in range(i, d):
            want = float(G[i, j]) / 1e7 / 1e7
            assert got[(i, j)] == pytest.approx(want, rel=1e-12), (i, j)


def test_pca_power_iteration_matches_eigh(spark):
    from googleanalytics_etl_spark.ops.round4f import pca_top_component

    lam, v = pca_top_component(spark, SF_SMALL)
    S = _corpus(spark).astype(float) / 1e7
    G = S.T @ S
    w, V = np.linalg.eigh(G)
    top = w[-1]
    top_v = V[:, -1]
    assert lam == pytest.approx(top, rel=1e-6)
    # eigenvector defined up to sign
    cos = abs(float(np.dot(v, top_v)))
    assert cos == pytest.approx(1.0, abs=1e-6)
    assert math.isclose(float(np.linalg.norm(v)), 1.0, rel_tol=1e-9)


def test_percentile_disc_recount(spark):
    rows = {r["event_type"]: r for r in queries()["q_percentile_disc"](spark, SF_SMALL).collect()}
    e = load(spark, SF_SMALL, "events").select("event_type", "value", "event_id").collect()
    groups: dict = {}
    for r in e:
        groups.setdefault(r["event_type"], []).append((r["value"], r["event_id"]))
    for t, vals in groups.items():
        vals.sort()
        n = len(vals)
        for p, col in ((0.5, "p50_disc"), (0.9, "p90_disc"), (0.99, "p99_disc")):
            want = vals[math.ceil(p * n) - 1][0]
            assert rows[t][col] == want, (t, col)
            # discrete percentile IS an observed value
            assert any(v == rows[t][col] for v, _ in vals)


def test_dedup_eval_identities_and_quality(spark):
    """Counting identities hold and the 4x4-band LSH recalls ≥0.9 of
    blocked ground truth on the planted corpus (precision is the band
    join's candidate yield — low by design; that's what verification
    is for)."""
    row = queries()["x_dedup_eval"](spark, SF_SMALL).collect()[0]
    assert 0 < row["n_positive"] <= row["n_candidates"]
    assert row["n_hit"] <= min(row["n_positive"], row["n_truth"])
    assert row["precision_cand"] == pytest.approx(
        row["n_positive"] / row["n_candidates"]
    )
    assert row["recall"] == pytest.approx(row["n_hit"] / row["n_truth"])
    assert row["recall"] >= 0.9
    # planted 10-doc duplicated tail guarantees at least 10 truth pairs
    assert row["n_truth"] >= 10
