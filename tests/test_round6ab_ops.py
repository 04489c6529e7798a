"""Semantic tests for x_zipf_fit and x_heaps_law (round-6 batch 28).
test_oracle.py proves Spark == DuckDB; these replay in python and
check the defining identities: the Zipf OLS matches a numpy-free
textbook fit with negative slope and r² in [0,1]; the Heaps curve is
monotone, ends at the full corpus totals, and each decile's vocab
counts exactly the first-occurrence tokens.
"""

from __future__ import annotations

import math
from collections import Counter

from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.ops.round6ab import _ZIPF_TOP
from googleanalytics_etl_spark.registry import queries


def test_zipf_fit_replay(spark):
    docs = load(spark, SF_SMALL, "documents").select("text").collect()
    tf = Counter()
    for r in docs:
        for t in r["text"].split(" "):
            if t:
                tf[t] += 1
    ranked = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))
    pts = [
        (math.log(i + 1), math.log(f))
        for i, (_, f) in enumerate(ranked[:_ZIPF_TOP])
    ]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    syy = sum(y * y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    r2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    got = queries()["x_zipf_fit"](spark, SF_SMALL).collect()[0]
    assert got["n_terms"] == n
    assert abs(got["slope"] - slope) < 1e-5
    assert abs(got["intercept"] - intercept) < 1e-5
    assert abs(got["r2"] - r2) < 1e-5
    assert got["slope"] < 0  # frequency decreases with rank
    assert 0.0 <= got["r2"] <= 1.0


def test_heaps_law_replay(spark):
    docs = (
        load(spark, SF_SMALL, "documents")
        .select("doc_id", "text")
        .collect()
    )
    docs.sort(key=lambda r: r["doc_id"])
    nd = len(docs)
    seen = set()
    curve = []
    n_toks_cum = 0
    vocab_cum = 0
    # decile of the i-th doc (1-based rank)
    by_decile = {}
    for i, r in enumerate(docs):
        toks = [t for t in r["text"].split(" ") if t]
        n_toks_cum += len(toks)
        for t in toks:
            if t not in seen:
                seen.add(t)
                vocab_cum += 1
        dec = min((i * 10) // nd + 1, 10)
        by_decile[dec] = (i + 1, n_toks_cum, vocab_cum)
    got = queries()["x_heaps_law"](spark, SF_SMALL).collect()
    assert [r["decile"] for r in got] == list(range(1, 11))
    for r in got:
        n_docs, n_tokens, vocab = by_decile[r["decile"]]
        assert r["n_docs"] == n_docs
        assert r["n_tokens"] == n_tokens
        assert r["vocab"] == vocab
        assert abs(r["ttr"] - round(vocab / n_tokens, 6)) < 1e-9
    # monotone growth, full-corpus endpoint
    for a, b in zip(got, got[1:]):
        assert b["n_docs"] > a["n_docs"]
        assert b["vocab"] >= a["vocab"]
        assert b["ttr"] <= a["ttr"] + 1e-9  # TTR decays as corpus grows
    assert got[-1]["n_docs"] == nd
    assert got[-1]["vocab"] == len(seen)
