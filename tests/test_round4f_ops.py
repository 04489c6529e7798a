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


def test_asof_tolerance_bounds_staleness(spark):
    """Every non-null match is within the 2h tolerance; every nulled
    purchase either has no prior view or one older than 2h (checked
    against a Python replay of the backward as-of)."""
    rows = queries()["q_join_asof_tolerance"](spark, SF_SMALL).collect()
    assert rows
    e = load(spark, SF_SMALL, "events").select(
        "event_id", "user_id", "ts", "event_type"
    ).collect()
    by_user: dict = {}
    for r in sorted(e, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
        by_user.setdefault(r["user_id"], []).append(r)
    got = {r["event_id"]: r for r in rows}
    n_fresh = 0
    for uid, seq in by_user.items():
        last_view = None
        for r in seq:
            if r["event_type"] == "view":
                last_view = r["ts"]
            elif r["event_type"] == "purchase":
                g = got[r["event_id"]]
                fresh = (
                    last_view is not None
                    and (r["ts"] - last_view).total_seconds() <= 7200
                )
                assert g["has_fresh_view"] == int(fresh), r["event_id"]
                assert g["recent_view_ts"] == (last_view if fresh else None)
                n_fresh += int(fresh)
    assert 0 < n_fresh < len(got)  # tolerance actually separates cases


def test_top_movers_recount(spark):
    import datetime as dt

    rows = queries()["x_top_movers"](spark, SF_SMALL).collect()
    assert 0 < len(rows) <= 20
    e = load(spark, SF_SMALL, "events").select(
        "user_id", "ts", "event_type", "value"
    ).collect()
    hi = max(r["ts"] for r in e)
    cur: dict = {}
    prev: dict = {}
    for r in e:
        if r["event_type"] != "purchase":
            continue
        cents = round(r["value"] * 100)
        if r["ts"] > hi - dt.timedelta(days=7):
            cur[r["user_id"]] = cur.get(r["user_id"], 0) + cents
        elif r["ts"] > hi - dt.timedelta(days=14):
            prev[r["user_id"]] = prev.get(r["user_id"], 0) + cents
    deltas = {
        u: cur.get(u, 0) - prev.get(u, 0) for u in set(cur) | set(prev)
    }
    order = sorted(deltas, key=lambda u: (-abs(deltas[u]), u))[: len(rows)]
    assert [r["user_id"] for r in rows] == order
    for r in rows:
        assert r["delta"] == pytest.approx(deltas[r["user_id"]] / 100)


def test_ngram_novelty_invariants(spark):
    rows = sorted(
        queries()["x_ngram_novelty"](spark, SF_SMALL).collect(),
        key=lambda r: r["day"],
    )
    assert rows
    # day 0 (first ingest day present) has novelty 1.0 by construction
    assert rows[0]["novelty_frac"] == 1.0
    for r in rows:
        assert 0 <= r["n_first_seen"] <= r["n_grams"]
        assert r["novelty_frac"] == pytest.approx(r["n_first_seen"] / r["n_grams"])
    # novelty decays: later days repeat earlier grams somewhere
    assert any(r["novelty_frac"] < 1.0 for r in rows[1:])


def test_null_safe_join_keeps_error_events(spark):
    """eqNullSafe matches the NULL dim member: every error event lands
    on weight -1; a plain equi-join would drop all of them."""
    rows = queries()["q_join_null_safe"](spark, SF_SMALL).collect()
    e = load(spark, SF_SMALL, "events").collect()
    n_err = sum(1 for r in e if r["event_type"] == "error")
    assert len(rows) == len(e)  # every event matched exactly once
    assert sum(1 for r in rows if r["weight"] == -1) == n_err > 0
    assert all((r["etype"] is None) == (r["weight"] == -1) for r in rows)


def test_time_weighted_avg_matches_python(spark):
    rows = {r["user_id"]: r for r in queries()["q_time_weighted_avg"](spark, SF_SMALL).collect()}
    e = load(spark, SF_SMALL, "events").select(
        "user_id", "ts", "event_id", "value"
    ).collect()
    by_user: dict = {}
    for r in sorted(e, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
        by_user.setdefault(r["user_id"], []).append(r)
    for uid, seq in by_user.items():
        if len(seq) < 2:
            assert uid not in rows
            continue
        num = 0
        den = 0
        for a, b in zip(seq, seq[1:]):
            dt = round((b["ts"] - a["ts"]).total_seconds() * 1e6)
            num += round(a["value"] * 100) * dt
            den += dt
        assert rows[uid]["n_segments"] == len(seq) - 1
        assert rows[uid]["twa_value"] == pytest.approx(num / den / 100)
        # TWA lies inside the observed value range
        vals = [r["value"] for r in seq[:-1]]
        assert min(vals) - 1e-9 <= rows[uid]["twa_value"] <= max(vals) + 1e-9


def test_scaled_long_multiply_stays_in_long_range(spark):
    """The x_gram_matrix / x_power_iteration / x_embed_dim_stats rewrite
    multiplies scaled embedding values in LONG before the decimal widen
    ((sa*sb).cast(decimal)). That is exact only while max|sv|² < 2⁶³ —
    in non-ANSI Spark a long overflow WRAPS SILENTLY, so a fixture or
    quantization change that grew the grid would corrupt results with no
    error. Pin the bound (round-12 advice item): assert the worst-case
    per-term product keeps a 16× safety margin below 2⁶³."""
    from pyspark.sql import functions as F

    from googleanalytics_etl_spark.io import load

    em = load(spark, SF_SMALL, "embeddings")
    sv = F.round(F.col("v").cast("double") * 10_000_000).cast("long")
    mx = (
        em.select(F.posexplode("embedding").alias("dim", "v"))
        .select(F.abs(sv).alias("a"))
        .agg(F.max("a").alias("m"))
        .collect()[0]["m"]
    )
    assert mx * mx < 2**63 / 16, f"max|sv|={mx} leaves <16x headroom"
