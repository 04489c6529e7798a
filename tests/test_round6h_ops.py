"""Semantic tests for x_minhash_accuracy and x_dup_trend (round-6
batch 8). test_oracle.py proves Spark == DuckDB; these replay the
MinHash estimator and first-seen election independently in Python
(hashlib md5 — neither engine involved).
"""

from __future__ import annotations

import hashlib
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.registry import queries


def _round6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP))


def _corpus(spark):
    """documents + the planted duplicated tail (doc_id < 10 → +10⁶)."""
    docs = {
        r["doc_id"]: r["text"]
        for r in load(spark, SF_SMALL, "documents")
        .select("doc_id", "text")
        .collect()
    }
    for i in list(docs):
        if i < 10:
            docs[i + 1_000_000] = docs[i]
    return docs


def _km_parts(text: str):
    """Shingles → (h1, h2) KM halves → 16 sigs + distinct h1 set."""
    words = text.split(" ")
    if len(words) >= 3:
        sh = list(dict.fromkeys(
            " ".join(words[i : i + 3]) for i in range(len(words) - 2)
        ))
    else:
        sh = [text]
    h1 = [int(hashlib.md5(s.encode()).hexdigest()[:8], 16) for s in sh]
    h2 = [int(hashlib.md5(s.encode()).hexdigest()[8:16], 16) for s in sh]
    sig = [min(a + i * b for a, b in zip(h1, h2)) for i in range(16)]
    return sig, set(h1)


# ---------------------------------------------------------------------------
# x_minhash_accuracy
# ---------------------------------------------------------------------------


def test_minhash_accuracy_exact_replay(spark):
    rows = {
        r["bucket"]: r
        for r in queries()["x_minhash_accuracy"](spark, SF_SMALL).collect()
    }
    docs = _corpus(spark)
    parts = {i: _km_parts(t) for i, t in docs.items()}
    # LSH candidates: any shared 4-row band bucket
    buckets = defaultdict(set)
    for i, (sig, _) in parts.items():
        for b in range(4):
            key = (b, ":".join(str(s) for s in sig[4 * b : 4 * b + 4]))
            buckets[key].add(i)
    pairs = set()
    for members in buckets.values():
        ms = sorted(members)
        pairs.update((a, b) for ai, a in enumerate(ms) for b in ms[ai + 1 :])
    assert pairs, "fixture must produce candidate pairs"
    per_bucket = defaultdict(list)
    for a, b in pairs:
        sa, ha = parts[a]
        sb, hb = parts[b]
        j = _round6(len(ha & hb) / len(ha | hb))
        est = sum(x == y for x, y in zip(sa, sb)) / 16
        per_bucket[min(int(j * 5), 4)].append((j, est))
    assert set(rows) == set(per_bucket)
    q8 = lambda v: Decimal(repr(v)).quantize(  # noqa: E731
        Decimal("1e-8"), ROUND_HALF_UP
    )
    for bkt, vals in per_bucket.items():
        r = rows[bkt]
        n = len(vals)
        assert r["n_pairs"] == n
        assert r["mean_exact"] == _round6(
            float(sum(q8(j) for j, _ in vals)) / n
        )
        assert r["mean_est"] == _round6(
            float(sum(q8(e) for _, e in vals)) / n
        )
        assert r["mean_abs_err"] == _round6(
            float(sum(q8(abs(e - j)) for j, e in vals)) / n
        )
        assert r["max_abs_err"] == _round6(
            max(abs(e - j) for j, e in vals)
        )


def test_minhash_accuracy_planted_dups_are_perfect(spark):
    """Identical docs ⇒ identical signatures and shingle sets: the top
    band must exist and estimator error there must be small (the
    planted pairs contribute exact zeros)."""
    rows = {
        r["bucket"]: r
        for r in queries()["x_minhash_accuracy"](spark, SF_SMALL).collect()
    }
    assert 4 in rows
    top = rows[4]
    assert top["n_pairs"] >= 10  # the ten planted copies
    assert top["mean_exact"] > 0.9
    # 16-hash estimator: E|err| ≤ √(j(1−j)/16) ≤ 0.125; planted zeros
    # pull the top-band mean well under that
    assert top["mean_abs_err"] <= 0.125
    # agreement fraction and error are fractions; a SINGLE pair's error
    # can approach 1 (a shared shingle that happens to be the minimum of
    # every KM function makes est = 1 while exact Jaccard ≈ 1/|union| —
    # the tiny-set variance this key exists to surface), so only the
    # [0, 1] envelope is a true invariant for the max
    for r in rows.values():
        assert 0.0 <= r["mean_est"] <= 1.0
        assert 0.0 <= r["max_abs_err"] <= 1.0


# ---------------------------------------------------------------------------
# x_dup_trend
# ---------------------------------------------------------------------------


def test_dup_trend_exact_replay(spark):
    rows = {
        r["day"]: r for r in queries()["x_dup_trend"](spark, SF_SMALL).collect()
    }
    docs = _corpus(spark)
    first = {}
    for i in sorted(docs, key=lambda i: (i % 7, i)):
        first.setdefault(hashlib.md5(docs[i].encode()).hexdigest(), i)
    firsts = set(first.values())
    daily = defaultdict(lambda: [0, 0])
    for i in docs:
        daily[i % 7][0] += 1
        daily[i % 7][1] += i in firsts
    assert set(rows) == set(daily)
    cum = 0
    for day in sorted(daily):
        n_docs, n_new = daily[day]
        cum += n_new
        r = rows[day]
        assert r["n_docs"] == n_docs
        assert r["n_new"] == n_new
        assert r["n_dup"] == n_docs - n_new
        assert r["dup_rate"] == _round6((n_docs - n_new) / n_docs)
        assert r["corpus_size"] == cum


def test_dup_trend_invariants(spark):
    rows = sorted(
        queries()["x_dup_trend"](spark, SF_SMALL).collect(),
        key=lambda r: r["day"],
    )
    # corpus_size is the running sum of n_new and strictly monotone here
    cum = 0
    for r in rows:
        cum += r["n_new"]
        assert r["corpus_size"] == cum
        assert r["n_docs"] == r["n_new"] + r["n_dup"]
    # the ten planted copies guarantee at least ten duplicate events
    assert sum(r["n_dup"] for r in rows) >= 10
    # every doc lands exactly once
    n_docs_total = sum(r["n_docs"] for r in rows)
    base = load(spark, SF_SMALL, "documents").count()
    assert n_docs_total == base + 10
