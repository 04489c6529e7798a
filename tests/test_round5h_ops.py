"""Round-5 batch-8: held-out LM scoring and shard-balance audit."""

from __future__ import annotations

from collections import Counter

import pytest
from conftest import SF_SMALL

from pyspark.sql import functions as F

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.registry import queries


def test_bigram_heldout_exercises_oov_path(spark):
    rows = queries()["x_bigram_heldout"](spark, SF_SMALL).collect()
    d = load(spark, SF_SMALL, "documents")
    n_held = d.where(F.col("source") == "src19").count()
    assert len(rows) == n_held
    # held-out text genuinely contains transitions the model never saw
    assert sum(r["n_unseen"] for r in rows) > 0
    for r in rows:
        assert 0 <= r["n_unseen"] <= r["n_bigrams"]
        # smoothed probabilities are < 1 ⇒ log-probs strictly negative
        assert r["avg_logp"] < 0


def test_bigram_heldout_recount(spark):
    docs = load(spark, SF_SMALL, "documents").select(
        "doc_id", "source", "text"
    ).collect()
    t2: Counter = Counter()
    t1: Counter = Counter()
    vocab = set()
    held = {}
    for d in docs:
        ws = [t for t in d["text"].split(" ") if t]
        bgs = list(zip(ws, ws[1:]))
        if d["source"] != "src19":
            for a, b in bgs:
                t2[(a, b)] += 1
                t1[a] += 1
                vocab.add(b)
        else:
            held[d["doc_id"]] = bgs
    v = len(vocab)
    got = {r["doc_id"]: r for r in queries()["x_bigram_heldout"](spark, SF_SMALL).collect()}
    for doc_id, bgs in held.items():
        r = got[doc_id]
        assert r["n_bigrams"] == len(bgs)
        assert r["n_unseen"] == sum(1 for bg in bgs if bg not in t2)


def test_shard_balance_totals_and_skew(spark):
    rows = queries()["x_shard_balance"](spark, SF_SMALL).collect()
    d = load(spark, SF_SMALL, "documents")
    assert len(rows) == 8
    assert sum(r["n_docs"] for r in rows) == d.count()
    loads = [r["n_tokens"] for r in rows]
    want_ratio = round(max(loads) / min(loads), 6)
    for r in rows:
        assert r["skew_ratio"] == pytest.approx(want_ratio, abs=1e-9)
    # the md5 shard hash must actually balance: no shard more than 2x
    # the mean at 500 docs over 8 shards
    assert want_ratio < 2.0


def test_shard_balance_matches_corpus_shard_assignment(spark):
    # the audit's shard ids reproduce x_corpus_shard's exactly
    shard_rows = queries()["x_corpus_shard"](spark, SF_SMALL).collect()
    per = Counter(r["shard"] for r in shard_rows)
    audit = {r["shard"]: r["n_docs"] for r in queries()["x_shard_balance"](spark, SF_SMALL).collect()}
    assert audit == dict(per)
