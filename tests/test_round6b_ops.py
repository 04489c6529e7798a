"""Semantic tests for the round-6 batch-2 corpus-forensics operators.

The differential harness (test_oracle.py) proves Spark == DuckDB for
each key; these tests prove the SEMANTICS — Python replays, planted
expectations, and by-construction invariants.
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import pyspark.sql.functions as F
from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.registry import queries


def _toks(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z]+", text.lower()) if t != ""]


def _docs(spark):
    return load(spark, SF_SMALL, "documents").select(
        "doc_id", "text", "lang", "source"
    ).collect()


# ---------------------------------------------------------------------------
# x_prefix_dedup
# ---------------------------------------------------------------------------


def test_prefix_dedup_full_python_replay(spark):
    rows = queries()["x_prefix_dedup"](spark, SF_SMALL).collect()
    groups = defaultdict(list)
    for r in _docs(spark):
        t = _toks(r["text"])
        if len(t) >= 8:
            groups[" ".join(t[:8])].append((r["doc_id"], r["source"]))
    expect = {
        min(d for d, _ in v): (len(v), len({s for _, s in v}))
        for v in groups.values()
        if len(v) >= 2
    }
    got = {r["survivor"]: (r["n_docs"], r["n_sources"]) for r in rows}
    assert got == expect
    # every emitted group is a genuine duplicate group
    assert all(r["n_docs"] >= 2 for r in rows)


def test_prefix_dedup_short_docs_excluded(spark):
    # docs with < 8 tokens never appear in any group: the survivor of
    # every group has >= 8 tokens
    texts = {r["doc_id"]: r["text"] for r in _docs(spark)}
    for r in queries()["x_prefix_dedup"](spark, SF_SMALL).collect():
        assert len(_toks(texts[r["survivor"]])) >= 8


# ---------------------------------------------------------------------------
# x_tokenizer_fertility
# ---------------------------------------------------------------------------


def test_tokenizer_fertility_exact_replay(spark):
    rows = {
        r["lang"]: r
        for r in queries()["x_tokenizer_fertility"](spark, SF_SMALL).collect()
    }
    agg = defaultdict(lambda: [0, 0, 0, 0])  # docs, toks, chars, bytes
    for r in _docs(spark):
        a = agg[r["lang"]]
        a[0] += 1
        a[1] += len(_toks(r["text"]))
        a[2] += len(r["text"])
        a[3] += len(r["text"].encode("utf-8"))
    assert set(rows) == set(agg)
    for lang, (nd, nt, nc, nb) in agg.items():
        r = rows[lang]
        assert (r["n_docs"], r["n_tokens"], r["n_chars"], r["n_bytes"]) == (
            nd,
            nt,
            nc,
            nb,
        )
        assert r["chars_per_token"] == round(nc / nt, 6)
        assert r["bytes_per_token"] == round(nb / nt, 6)
        assert r["tokens_per_doc"] == round(nt / nd, 6)


# ---------------------------------------------------------------------------
# x_freq_prune_vocab
# ---------------------------------------------------------------------------


def test_freq_prune_vocab_exact_replay(spark):
    rows = {
        r["lang"]: r
        for r in queries()["x_freq_prune_vocab"](spark, SF_SMALL).collect()
    }
    df = defaultdict(set)  # (lang, tok) -> docs
    occ = Counter()  # (lang, tok) -> occurrences
    ndocs = Counter()  # lang -> docs
    for r in _docs(spark):
        ndocs[r["lang"]] += 1
        for t in _toks(r["text"]):
            df[(r["lang"], t)].add(r["doc_id"])
            occ[(r["lang"], t)] += 1
    per_lang = defaultdict(lambda: [0, 0, 0, 0])  # vt, vk, ot, ok
    for (lang, tok), docs in df.items():
        d, o = len(docs), occ[(lang, tok)]
        kept = d >= 5 and 2 * d <= ndocs[lang]
        a = per_lang[lang]
        a[0] += 1
        a[2] += o
        if kept:
            a[1] += 1
            a[3] += o
    assert set(rows) == set(per_lang)
    for lang, (vt, vk, ot, ok) in per_lang.items():
        r = rows[lang]
        assert (
            r["vocab_total"],
            r["vocab_kept"],
            r["occ_total"],
            r["occ_kept"],
        ) == (vt, vk, ot, ok)
        assert r["coverage"] == round(ok / ot, 6)
        # the max_df half-the-docs rule always prunes the fixture's
        # pool words (every pool word is stopword-dense here; at the
        # smallest SF some languages keep NOTHING — the band can be
        # empty, never full)
        assert r["vocab_kept"] < r["vocab_total"]


# ---------------------------------------------------------------------------
# x_embed_outliers
# ---------------------------------------------------------------------------


def test_embed_outliers_numpy_replay(spark):
    import numpy as np

    rows = {
        r["label"]: r
        for r in queries()["x_embed_outliers"](spark, SF_SMALL).collect()
    }
    em = load(spark, SF_SMALL, "embeddings").collect()
    by_label = defaultdict(list)
    for r in em:
        by_label[r["label"]].append(np.array(r["embedding"], dtype=np.float64))
    assert set(rows) == set(by_label)
    for lab, vecs in by_label.items():
        vs = np.stack(vecs)
        # exact centroid: scaled-long means, like the operator
        cen = (
            np.round(vs * 10_000_000).sum(axis=0) / len(vs) / 10_000_000
        )
        d2 = np.array(
            [
                sum(round(float((v - c) ** 2), 8) for v, c in zip(row, cen))
                for row in vs
            ]
        )
        mean = d2.sum() / len(d2)
        r = rows[lab]
        assert r["n_vecs"] == len(vs)
        # quantization in the operator is decimal-cast, the replay uses
        # python round — identical except at exact .5e-8 ties, which the
        # comparison tolerance absorbs
        assert abs(r["mean_d2"] - round(mean, 6)) <= 1e-6
        assert r["n_outliers"] == int((d2 > 2 * mean).sum())


def test_embed_outliers_bounds(spark):
    rows = queries()["x_embed_outliers"](spark, SF_SMALL).collect()
    total = sum(r["n_vecs"] for r in rows)
    em_n = load(spark, SF_SMALL, "embeddings").count()
    assert total == em_n
    for r in rows:
        # Markov: P(d2 > 2*mean) < 1/2 — strictly less than half the
        # label can be outliers; mean squared distance is positive
        assert 0 <= r["n_outliers"] < r["n_vecs"] / 2
        assert r["mean_d2"] > 0
