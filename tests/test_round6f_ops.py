"""Semantic tests for x_weighted_jaccard and x_boilerplate_score
(round-6 batch 6). test_oracle.py proves Spark == DuckDB; these prove
the weighting/threshold semantics with Python replays and planted
structure.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

import pyspark.sql.functions as F
from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.registry import queries


def _shingles(text: str) -> set[int]:
    words = text.split(" ")
    grams = (
        [" ".join(words[i : i + 3]) for i in range(len(words) - 2)]
        if len(words) >= 3
        else [text]
    )
    return {
        int(hashlib.md5(g.encode()).hexdigest()[:8], 16) for g in grams
    }


def _corpus(spark):
    docs = {
        r["doc_id"]: r["text"]
        for r in load(spark, SF_SMALL, "documents")
        .select("doc_id", "text")
        .collect()
    }
    for did in list(docs):
        if did < 10:
            docs[did + 1_000_000] = docs[did]
    return docs


# ---------------------------------------------------------------------------
# x_weighted_jaccard
# ---------------------------------------------------------------------------


def test_weighted_jaccard_python_replay(spark):
    from decimal import ROUND_HALF_UP, Decimal

    rows = queries()["x_weighted_jaccard"](spark, SF_SMALL).collect()
    assert rows, "LSH candidates must exist (planted dups)"
    docs = _corpus(spark)
    sets = {d: _shingles(t) for d, t in docs.items()}
    df = defaultdict(int)
    for s in sets.values():
        for h in s:
            df[h] += 1
    q8 = Decimal("1e-8")
    for r in rows:
        a, b = sets[r["doc_a"]], sets[r["doc_b"]]
        w_min = sum(
            (
                Decimal(repr(1.0 / df[h])).quantize(q8, ROUND_HALF_UP)
                for h in a & b
            ),
            Decimal(0),
        )
        w_max = sum(
            (
                Decimal(repr(1.0 / df[h])).quantize(q8, ROUND_HALF_UP)
                for h in a | b
            ),
            Decimal(0),
        )
        mean = Decimal(repr(float(w_min) / float(w_max))).quantize(
            Decimal("1e-6"), ROUND_HALF_UP
        )
        assert r["wjaccard"] == float(mean), (r, w_min, w_max)


def test_weighted_jaccard_planted_exact_dups_score_1(spark):
    """An exact duplicate shares EVERY shingle: both plain and weighted
    Jaccard are exactly 1 for the planted +1e6 pairs."""
    rows = {
        (r["doc_a"], r["doc_b"]): r
        for r in queries()["x_weighted_jaccard"](spark, SF_SMALL).collect()
    }
    planted = [(d, d + 1_000_000) for d in range(10)]
    found = [p for p in planted if p in rows]
    assert len(found) == 10
    for p in found:
        assert rows[p]["jaccard"] == 1.0
        assert rows[p]["wjaccard"] == 1.0


def test_weighted_jaccard_bounds(spark):
    for r in queries()["x_weighted_jaccard"](spark, SF_SMALL).collect():
        assert 0 <= r["wjaccard"] <= 1
        assert 0 <= r["jaccard"] <= 1


# ---------------------------------------------------------------------------
# x_boilerplate_score
# ---------------------------------------------------------------------------


def test_boilerplate_score_python_replay(spark):
    rows = {
        r["doc_id"]: r
        for r in queries()["x_boilerplate_score"](spark, SF_SMALL).collect()
    }
    docs = {
        r["doc_id"]: r["text"]
        for r in load(spark, SF_SMALL, "documents")
        .select("doc_id", "text")
        .collect()
    }
    sets = {d: _shingles(t) for d, t in docs.items()}
    df = defaultdict(int)
    for s in sets.values():
        for h in s:
            df[h] += 1
    thr = 5
    assert set(rows) == set(docs)
    for did, s in sets.items():
        n_common = sum(1 for h in s if df[h] >= thr)
        r = rows[did]
        assert (r["n_shingles"], r["n_common"]) == (len(s), n_common)
        assert r["boilerplate_share"] == round(n_common / len(s), 6)


def test_boilerplate_score_spans_the_range(spark):
    """The fixture's small word pool makes some shingles corpus-common
    and leaves others rare: shares must not be degenerate (all 0 or
    all 1) for the dial to mean anything."""
    shares = [
        r["boilerplate_share"]
        for r in queries()["x_boilerplate_score"](spark, SF_SMALL).collect()
    ]
    assert any(s > 0 for s in shares)
    assert any(s < 1 for s in shares)
