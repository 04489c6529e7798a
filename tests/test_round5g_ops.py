"""x_curation_e2e: funnel monotonicity, stage discrimination, and a
Python replay of the full composition."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.registry import queries


def _rows(spark):
    return {r["lang"]: r for r in queries()["x_curation_e2e"](spark, SF_SMALL).collect()}


def test_curation_funnel_monotone_and_discriminating(spark):
    rows = _rows(spark)
    for r in rows.values():
        assert (
            r["n_raw"] >= r["n_quality"] >= r["n_unique"] >= r["n_clean"] >= r["n_sampled"]
        )
        assert r["tokens_sampled"] >= 20 * r["n_sampled"]  # quality floor
    # every stage drops something somewhere (non-vacuous on the fixture):
    assert sum(r["n_raw"] - r["n_quality"] for r in rows.values()) > 0
    assert sum(r["n_quality"] - r["n_unique"] for r in rows.values()) > 0
    assert sum(r["n_unique"] - r["n_clean"] for r in rows.values()) > 0
    assert sum(r["n_clean"] - r["n_sampled"] for r in rows.values()) > 0


def test_curation_replay_python(spark):
    docs = load(spark, SF_SMALL, "documents").select(
        "doc_id", "lang", "source", "text"
    ).collect()
    corpus = [(d["doc_id"], d["lang"], d["source"], d["text"]) for d in docs]
    corpus += [
        (d["doc_id"] + 1_000_000, d["lang"], d["source"], d["text"])
        for d in docs
        if d["doc_id"] < 10
    ]

    def shingles(text):
        ws = text.split(" ")
        if len(ws) >= 3:
            return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}
        return {text}

    bench = set()
    for _id, _lang, src, text in corpus:
        if src == "src0":
            bench |= shingles(text)

    quality, unique, clean = {}, {}, {}
    by_digest = defaultdict(list)
    for did, lang, src, text in corpus:
        toks = [t for t in text.split(" ") if t]
        ok_q = 20 <= len(toks) <= 1000 and len(set(toks)) / len(toks) >= 0.3
        quality[did] = ok_q
        if ok_q:
            by_digest[hashlib.md5(text.encode()).hexdigest()].append(did)
    for dids in by_digest.values():
        for did in dids:
            unique[did] = did == min(dids)
    for did, lang, src, text in corpus:
        if not unique.get(did, False):
            clean[did] = False
            continue
        sh = shingles(text)
        frac = len(sh & bench) / len(sh)
        clean[did] = src == "src0" or frac <= 0.5
    by_lang_clean = defaultdict(list)
    for did, lang, src, text in corpus:
        if clean.get(did, False):
            by_lang_clean[lang].append(
                (hashlib.md5(str(did).encode()).hexdigest(), did)
            )
    sampled = set()
    for lang, lst in by_lang_clean.items():
        lst.sort()
        sampled |= {did for _h, did in lst[:100]}

    want = defaultdict(lambda: [0, 0, 0, 0, 0, 0])
    for did, lang, src, text in corpus:
        w = want[lang]
        w[0] += 1
        w[1] += quality[did]
        w[2] += unique.get(did, False)
        w[3] += clean.get(did, False)
        if did in sampled:
            w[4] += 1
            w[5] += len([t for t in text.split(" ") if t])

    rows = _rows(spark)
    assert set(rows) == set(want)
    for lang, w in want.items():
        r = rows[lang]
        got = [r["n_raw"], r["n_quality"], r["n_unique"], r["n_clean"], r["n_sampled"], r["tokens_sampled"]]
        assert got == w, lang


def test_curation_planted_dups_are_dropped_at_dedup_stage(spark):
    rows = _rows(spark)
    # the 10 planted copies appear in n_raw but (when their original
    # passed quality) never in n_unique: total raw = 510
    assert sum(r["n_raw"] for r in rows.values()) == 510
    assert sum(r["n_unique"] for r in rows.values()) <= 500
