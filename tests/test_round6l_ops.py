"""Semantic tests for x_cc_sizes, x_length_bias_audit and
x_quality_vs_dup (round-6 batch 12). test_oracle.py proves Spark ==
DuckDB; these check structural invariants and replay independently.
"""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.registry import queries


def _round6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP))


# ---------------------------------------------------------------------------
# x_cc_sizes
# ---------------------------------------------------------------------------


def test_cc_sizes_consistency_with_clusters(spark):
    rows = {
        r["cluster_size"]: r
        for r in queries()["x_cc_sizes"](spark, SF_SMALL).collect()
    }
    clusters = queries()["x_dedup_clusters"](spark, SF_SMALL).collect()
    by_cluster = Counter(r["cluster_id"] for r in clusters)
    hist = Counter(by_cluster.values())
    assert set(rows) == set(hist)
    for size, n_clusters in hist.items():
        assert rows[size]["n_clusters"] == n_clusters
        assert rows[size]["n_docs"] == size * n_clusters
    # the planted pairs guarantee size-2 components exist
    assert 2 in rows and rows[2]["n_clusters"] >= 1


# ---------------------------------------------------------------------------
# x_length_bias_audit
# ---------------------------------------------------------------------------


def test_length_bias_exact_replay(spark):
    rows = {
        r["source"]: r
        for r in queries()["x_length_bias_audit"](spark, SF_SMALL).collect()
    }
    docs = load(spark, SF_SMALL, "documents").collect()
    agg = defaultdict(lambda: [0, 0])
    for r in docs:
        agg[r["source"]][0] += 1
        agg[r["source"]][1] += len(r["text"].split(" "))
    td, tt = sum(a[0] for a in agg.values()), sum(a[1] for a in agg.values())
    assert set(rows) == set(agg)
    for src, (nd, nt) in agg.items():
        r = rows[src]
        assert (r["n_docs"], r["n_tokens"]) == (nd, nt)
        assert r["doc_share"] == _round6(nd / td)
        assert r["token_share"] == _round6(nt / tt)
        assert r["bias_ratio"] == _round6((nt / tt) / (nd / td))


def test_length_bias_shares_sum_to_one(spark):
    rows = queries()["x_length_bias_audit"](spark, SF_SMALL).collect()
    assert abs(sum(r["doc_share"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["token_share"] for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert r["bias_ratio"] > 0


# ---------------------------------------------------------------------------
# x_quality_vs_dup
# ---------------------------------------------------------------------------


def test_quality_vs_dup_counts(spark):
    rows = queries()["x_quality_vs_dup"](spark, SF_SMALL).collect()
    docs = load(spark, SF_SMALL, "documents").collect()
    n_corpus = len(docs) + 10  # planted tail
    assert sum(r["n_docs"] for r in rows) == n_corpus
    # the 10 planted copies + their originals are all dup rows
    n_dup = sum(r["n_docs"] for r in rows if r["is_dup"] == 1)
    assert n_dup >= 20
    for r in rows:
        assert r["is_dup"] in (0, 1)
        assert 0 <= r["q_bucket"] <= 3
        # mean quality must sit inside its value bucket (quartile edges)
        if r["q_bucket"] < 3:
            assert r["q_bucket"] / 4 <= r["mean_quality"] < (r["q_bucket"] + 1) / 4


def test_quality_vs_dup_dup_flag_replay(spark):
    rows = queries()["x_quality_vs_dup"](spark, SF_SMALL).collect()
    docs = load(spark, SF_SMALL, "documents").collect()
    texts = [r["text"] for r in docs] + [
        r["text"] for r in docs if r["doc_id"] < 10
    ]
    c = Counter(hashlib.md5(t.encode()).hexdigest() for t in texts)
    n_dup_expected = sum(v for v in c.values() if v > 1)
    assert sum(r["n_docs"] for r in rows if r["is_dup"] == 1) == n_dup_expected
