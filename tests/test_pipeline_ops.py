"""Property tests for the training-data pipeline ops (ops/pipeline.py).

The differential suite (test_oracle.py) already hash-checks each op
against DuckDB; these tests pin the *semantic invariants* that a hash
match alone would not explain to a maintainer — chunk coverage, packing
conservation, sample determinism, shard completeness.
"""

from __future__ import annotations

from conftest import SF_SMALL

from googleanalytics_etl_spark.ops.pipeline import (
    _CHUNK_SIZE,
    _CHUNK_STRIDE,
    _N_SHARDS,
    _PACK_BUDGET,
    x_chunk_docs,
    x_corpus_shard,
    x_pack_sequences,
    x_sample_hash,
    x_stratified_sample,
)
from googleanalytics_etl_spark.io import load


def test_chunks_cover_and_overlap(spark):
    docs = {
        r["doc_id"]: r["text"]
        for r in load(spark, SF_SMALL, "documents").collect()
    }
    chunks = x_chunk_docs(spark, SF_SMALL).collect()
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, rows in by_doc.items():
        text = docs[doc_id]
        rows.sort(key=lambda r: r["chunk_idx"])
        # every chunk is the exact substring at its stride offset
        for r in rows:
            start = r["chunk_idx"] * _CHUNK_STRIDE
            assert r["chunk"] == text[start : start + _CHUNK_SIZE]
        # chunks jointly cover the full text: last chunk reaches the end
        last = rows[-1]
        assert last["chunk_idx"] * _CHUNK_STRIDE + last["chunk_len"] == len(text)
        # consecutive chunks overlap by size - stride
        for a, b in zip(rows, rows[1:]):
            assert b["chunk_idx"] == a["chunk_idx"] + 1
            if a["chunk_len"] == _CHUNK_SIZE:
                overlap = a["chunk"][_CHUNK_STRIDE:]
                assert b["chunk"].startswith(overlap)


def test_packing_conserves_docs_and_tokens(spark):
    d = load(spark, SF_SMALL, "documents")
    n_docs = d.count()
    total_tokens = sum(
        len(r["text"].split(" ")) for r in d.select("text").collect()
    )
    packs = x_pack_sequences(spark, SF_SMALL).collect()
    # conservation: every doc in exactly one pack, every token counted
    assert sum(r["n_docs"] for r in packs) == n_docs
    assert sum(r["pack_tokens"] for r in packs) == total_tokens
    # pack ids are dense from 0 within each source
    by_src: dict[str, list] = {}
    for r in packs:
        by_src.setdefault(r["source"], []).append(r["pack_id"])
    for src, ids in by_src.items():
        assert sorted(ids) == list(range(len(ids))), src
    # a pack overflows the budget by at most one document's tokens:
    # cum_before of its first doc is < (pack_id+1)*budget by definition
    max_doc = max(
        len(r["text"].split(" ")) for r in d.select("text").collect()
    )
    for r in packs:
        assert r["pack_tokens"] <= _PACK_BUDGET + max_doc


def test_hash_sample_deterministic_and_unbiased(spark):
    a = sorted(r["doc_id"] for r in x_sample_hash(spark, SF_SMALL).collect())
    b = sorted(r["doc_id"] for r in x_sample_hash(spark, SF_SMALL).collect())
    assert a == b  # reproducible across runs (no rand())
    n_total = load(spark, SF_SMALL, "documents").count()
    # 26/256 expected rate; loose 3-sigma-ish band for the small fixture
    assert 0 < len(a) < n_total
    # disjointness with the complementary range == partition property
    rate = len(a) / n_total
    assert 0.01 < rate < 0.35


def test_stratified_sample_per_stratum_cap(spark):
    rows = x_stratified_sample(spark, SF_SMALL).collect()
    per_lang: dict[str, int] = {}
    for r in rows:
        per_lang[r["lang"]] = per_lang.get(r["lang"], 0) + 1
        assert 1 <= r["strat_rank"] <= 20
    assert all(v <= 20 for v in per_lang.values())


def test_corpus_shard_is_a_permutation(spark):
    rows = x_corpus_shard(spark, SF_SMALL).collect()
    n = load(spark, SF_SMALL, "documents").count()
    assert len(rows) == n
    assert len({r["doc_id"] for r in rows}) == n
    # positions are dense 1..k within each shard
    by_shard: dict[int, list] = {}
    for r in rows:
        assert 0 <= r["shard"] < _N_SHARDS
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), shard


def test_chunk_array_empty_text_yields_no_chunks(spark):
    """Spark's sequence(0, -1) counts DOWN — the empty-doc case must be
    guarded to agree with SQL range(0) = [] (code-review regression)."""
    from pyspark.sql import functions as F

    from googleanalytics_etl_spark.ops.pipeline import chunk_array

    df = spark.createDataFrame(
        [("", 0), ("x" * 151, 151)], "text string, n int"
    ).select(F.size(chunk_array(F.col("n"))).alias("k"))
    assert [r["k"] for r in df.collect()] == [0, 2]
