"""Semantic tests for x_mmr_rerank (round-6 batch 18). test_oracle.py
proves Spark == DuckDB; these replay the greedy MMR recursion in numpy
and check the diversification property.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import numpy as np
from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.ops.round6r import _MMR_K, _MMR_LAMBDA, _MMR_POOL
from googleanalytics_etl_spark.registry import queries


def _round6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP))


def _cos(a, b):
    return float(np.dot(a, b) / (np.sqrt(np.dot(a, a)) * np.sqrt(np.dot(b, b))))


def _mmr_replay(spark):
    em = load(spark, SF_SMALL, "embeddings").collect()
    vecs = {
        r["vec_id"]: np.array([float(x) for x in r["embedding"]]) for r in em
    }
    q = vecs[0]
    simq = {
        i: round(_cos(v, q), 6) for i, v in vecs.items() if i != 0
    }
    pool = sorted(simq, key=lambda i: (-simq[i], i))[:_MMR_POOL]
    pair = {
        (a, b): round(_cos(vecs[a], vecs[b]), 6)
        for a in pool
        for b in pool
        if a != b
    }
    lam = _MMR_LAMBDA
    sel, out = [], []
    first = min(pool, key=lambda i: (-simq[i], i))
    sel.append(first)
    out.append((1, first, round(lam * simq[first], 6)))
    for t in range(2, _MMR_K + 1):
        best = None
        for c in pool:
            if c in sel:
                continue
            msel = max(pair[(c, s)] for s in sel)
            score = round(lam * simq[c] - (1 - lam) * msel, 6)
            key = (-score, c)
            if best is None or key < best[0]:
                best = (key, c, score)
        sel.append(best[1])
        out.append((t, best[1], best[2]))
    return out, simq, pool


def test_mmr_exact_replay(spark):
    rows = sorted(
        queries()["x_mmr_rerank"](spark, SF_SMALL).collect(),
        key=lambda r: r["rank"],
    )
    want, _, _ = _mmr_replay(spark)
    assert len(rows) == _MMR_K
    for r, (rank, vid, score) in zip(rows, want):
        assert r["rank"] == rank
        assert r["vec_id"] == vid
        assert abs(r["score"] - score) < 2e-6


def test_mmr_diversifies_vs_pure_topk(spark):
    """MMR's first pick IS the top-1 by relevance; later picks may
    deviate from the pure top-k order, and every pick is unique and
    from the candidate pool."""
    rows = sorted(
        queries()["x_mmr_rerank"](spark, SF_SMALL).collect(),
        key=lambda r: r["rank"],
    )
    _, simq, pool = _mmr_replay(spark)
    top_by_rel = sorted(pool, key=lambda i: (-simq[i], i))
    assert rows[0]["vec_id"] == top_by_rel[0]
    ids = [r["vec_id"] for r in rows]
    assert len(set(ids)) == _MMR_K
    assert set(ids) <= set(pool)
    # greedy-objective envelope: msel ∈ [−1, 1] (cosines go negative —
    # an anti-correlated selected set RAISES the score), so
    # λ·simq − (1−λ) ≤ score ≤ λ·simq + (1−λ)
    for r in rows:
        rel = _MMR_LAMBDA * simq[r["vec_id"]]
        assert rel - (1 - _MMR_LAMBDA) - 1e-9 <= r["score"]
        assert r["score"] <= rel + (1 - _MMR_LAMBDA) + 1e-9
