"""Semantic tests for x_pq_quantize and x_dataset_card (round-6
batch 9). test_oracle.py proves Spark == DuckDB; these replay PQ
training in numpy and the card counts in pure Python.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.ops.round6i import _PQ_ITERS, _PQ_K, _PQ_SUB
from googleanalytics_etl_spark.registry import queries


def _round6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP))


# ---------------------------------------------------------------------------
# x_pq_quantize
# ---------------------------------------------------------------------------


def _pq_replay(vecs: dict[int, np.ndarray], lo: int):
    """Replay one subspace's Lloyd chain exactly (rounded distances,
    code-id tiebreak, scaled-long means). Returns vec_id → (code, dist)."""
    sub = {i: v[lo : lo + _PQ_SUB] for i, v in vecs.items()}
    book = {j: sub[j].copy() for j in range(_PQ_K)}
    for it in range(1, _PQ_ITERS + 1):
        assign = {}
        for i, v in sub.items():
            best = min(
                (round(float(np.sum((v - book[j]) ** 2)), 6), j)
                for j in book
            )
            assign[i] = best
        if it == _PQ_ITERS:
            return {i: (j, d) for i, (d, j) in assign.items()}
        sums = defaultdict(lambda: [np.zeros(_PQ_SUB, dtype=object), 0])
        for i, v in sub.items():
            j = assign[i][1]
            sums[j][0] = sums[j][0] + np.array(
                [round(float(x) * 10_000_000) for x in v], dtype=object
            )
            sums[j][1] += 1
        book = {
            j: np.array([float(s) / n / 10_000_000 for s in vec])
            for j, (vec, n) in sums.items()
        }
    raise AssertionError("unreachable")


def test_pq_quantize_exact_replay(spark):
    rows = {
        (r["code_a"], r["code_b"]): r
        for r in queries()["x_pq_quantize"](spark, SF_SMALL).collect()
    }
    em = load(spark, SF_SMALL, "embeddings").collect()
    vecs = {
        r["vec_id"]: np.array([float(x) for x in r["embedding"]]) for r in em
    }
    a = _pq_replay(vecs, 0)
    b = _pq_replay(vecs, _PQ_SUB)
    cells = defaultdict(list)
    for i in vecs:
        cells[(a[i][0], b[i][0])].append(a[i][1] + b[i][1])
    assert set(rows) == set(cells)
    q8 = lambda v: Decimal(repr(v)).quantize(  # noqa: E731
        Decimal("1e-8"), ROUND_HALF_UP
    )
    for cell, errs in cells.items():
        r = rows[cell]
        assert r["n_vecs"] == len(errs)
        assert r["mean_err"] == _round6(
            float(sum(q8(e) for e in errs)) / len(errs)
        )


def test_pq_quantize_structure(spark):
    rows = queries()["x_pq_quantize"](spark, SF_SMALL).collect()
    n_total = load(spark, SF_SMALL, "embeddings").count()
    # every vector lands in exactly one cell; codes stay in range
    assert sum(r["n_vecs"] for r in rows) == n_total
    for r in rows:
        assert 0 <= r["code_a"] < _PQ_K and 0 <= r["code_b"] < _PQ_K
        assert r["mean_err"] >= 0
    # quantization must discriminate: more than one cell in use
    assert len(rows) > 1


def test_pq_beats_single_codebook_on_seeds(spark):
    """The 4 init vectors quantize to themselves in BOTH subspaces at
    iteration 1; after refinement their error stays bounded by the
    corpus mean (sanity that training didn't diverge)."""
    rows = queries()["x_pq_quantize"](spark, SF_SMALL).collect()
    total = sum(r["n_vecs"] for r in rows)
    mean_err = sum(r["mean_err"] * r["n_vecs"] for r in rows) / total
    assert mean_err > 0
    # 16 cells over 64 dims of roughly unit-scale data: the mean
    # squared error per cell can't exceed the trivial bound ~4·d
    assert mean_err < 4 * 2 * _PQ_SUB


# ---------------------------------------------------------------------------
# x_dataset_card
# ---------------------------------------------------------------------------


def test_dataset_card_exact_replay(spark):
    row = queries()["x_dataset_card"](spark, SF_SMALL).collect()[0]
    docs = load(spark, SF_SMALL, "documents").collect()
    toks = [len(r["text"].split(" ")) for r in docs]
    digests = {hashlib.md5(r["text"].encode()).hexdigest() for r in docs}
    n = len(docs)
    assert row["n_docs"] == n
    assert row["n_sources"] == len({r["source"] for r in docs})
    assert row["n_langs"] == len({r["lang"] for r in docs})
    assert row["total_tokens"] == sum(toks)
    assert row["mean_doc_tokens"] == _round6(sum(toks) / n)
    assert row["pct_short"] == _round6(sum(t < 20 for t in toks) / n)
    assert row["exact_dup_rate"] == _round6(1 - len(digests) / n)
    assert row["langs"] == ",".join(sorted({r["lang"] for r in docs}))


def test_dataset_card_single_row_no_lists(spark):
    df = queries()["x_dataset_card"](spark, SF_SMALL)
    assert df.count() == 1
    # driver contract: no array/map/decimal columns in the output
    for f in df.schema.fields:
        assert f.dataType.typeName() not in ("array", "map", "decimal"), f
