"""Round-10 tests: exact-substring dedup (Lee et al. 2021).

Semantic pins:

- exact plain-Python replay of the whole pass (gram counts, keep-first
  canonical policy, interval merge) on the real fixture;
- planted data: a >= L-token verbatim repeat is removed from exactly
  the non-canonical occurrence(s); a (L-1)-token repeat is NOT
  touched; a within-document repeat loses its second copy;
- clean/spans consistency: per-doc dup_tokens equals the summed span
  lengths, and clean_text is exactly the kept tokens in order;
- the streaming (SUM, MIN) monoid fold reproduces the batch spans
  EXACTLY;
- the packed-key overflow guard fails loudly.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.ops.round10 import (
    _SPAN_L,
    _dup_starts,
    _dup_starts_one_pass,
    _gram_stats,
    _merged_spans,
    _occ,
    x_exact_substring_clean,
    x_exact_substring_dedup,
)

SF_SMALL = "/root/testdata/sf0.01"


def _py_spans(docs: dict[int, str]) -> set[tuple[int, int, int, int]]:
    """Plain-Python replay: (doc_id, span_start, span_end, span_len)."""
    occ: dict[str, list[tuple[int, int]]] = defaultdict(list)
    for d, text in docs.items():
        t = text.split(" ")
        for s in range(len(t) - _SPAN_L + 1):
            g = " ".join(t[s : s + _SPAN_L])
            h = hashlib.md5(g.encode()).hexdigest()[:15]
            occ[h].append((d, s))
    dup: dict[int, list[int]] = defaultdict(list)
    for h, places in occ.items():
        if len(places) < 2:
            continue
        first = min(places)
        for d, s in places:
            if (d, s) != first:
                dup[d].append(s)
    out = set()
    for d, starts in dup.items():
        starts.sort()
        cur_s, cur_e = starts[0], starts[0] + _SPAN_L - 1
        for s in starts[1:]:
            if s > cur_e + 1:
                out.add((d, cur_s, cur_e, cur_e - cur_s + 1))
                cur_s = s
            cur_e = max(cur_e, s + _SPAN_L - 1)
        out.add((d, cur_s, cur_e, cur_e - cur_s + 1))
    return out


def test_exact_substring_python_replay(spark):
    docs = {
        r["doc_id"]: r["text"]
        for r in load(spark, SF_SMALL, "documents").collect()
    }
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_len"])
        for r in x_exact_substring_dedup(spark, SF_SMALL).collect()
    }
    assert got == _py_spans(docs)
    assert got, "fixture must yield duplicated spans (probed ~1000 dup 8-grams)"


def _spans_for(spark, docs: dict[int, str]):
    """Planted-data spans via BOTH flag forms (the registered one-pass
    window and the streaming join form) — they must agree exactly."""
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    occ = _occ(df)
    one_pass = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in _merged_spans(_dup_starts_one_pass(occ)).collect()
    }
    joined = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in _merged_spans(_dup_starts(occ, _gram_stats(occ))).collect()
    }
    assert one_pass == joined
    return one_pass


def test_planted_cross_doc_span(spark):
    """A 12-token verbatim repeat: canonical (smallest doc_id, pos)
    copy survives; the other doc loses exactly tokens [2, 13]."""
    shared = " ".join(f"s{i}" for i in range(12))
    docs = {
        1: f"a1 a2 {shared} a3 a4",
        2: f"b1 b2 {shared} b3 b4 b5",
        3: "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10",
    }
    spans = _spans_for(spark, docs)
    assert spans == {(2, 2, 13)}


def test_planted_below_threshold_untouched(spark):
    """An (L-1)-token repeat must produce NO duplicated L-gram."""
    shared = " ".join(f"s{i}" for i in range(_SPAN_L - 1))
    docs = {
        1: f"a1 a2 a3 {shared} a4 a5",
        2: f"b1 {shared} b2 b3 b4 b5 b6",
    }
    assert _spans_for(spark, docs) == set()


def test_planted_within_doc_repeat(spark):
    """The second copy of an 8-token run inside ONE document is
    removed; the first (canonical) copy stays."""
    run = " ".join(f"r{i}" for i in range(_SPAN_L))
    docs = {7: f"{run} x1 x2 x3 {run} x4"}
    # tokens 0..7 canonical; repeat starts at token 11
    assert _spans_for(spark, docs) == {(7, 11, 11 + _SPAN_L - 1)}


def test_clean_consistent_with_spans(spark):
    span_rows = x_exact_substring_dedup(spark, SF_SMALL).collect()
    span_len = defaultdict(int)
    removed_pos: dict[int, set[int]] = defaultdict(set)
    for r in span_rows:
        span_len[r["doc_id"]] += r["span_len"]
        removed_pos[r["doc_id"]].update(
            range(r["span_start"], r["span_end"] + 1)
        )
    docs = {
        r["doc_id"]: r["text"]
        for r in load(spark, SF_SMALL, "documents").collect()
    }
    rows = x_exact_substring_clean(spark, SF_SMALL).collect()
    assert len(rows) == len(docs)  # every doc appears, short ones too
    for r in rows:
        d = r["doc_id"]
        toks = docs[d].split(" ")
        assert r["n_tokens"] == len(toks)
        assert r["dup_tokens"] == span_len.get(d, 0)
        kept = len(r["clean_text"].split(" ")) if r["clean_text"] else 0
        assert kept == r["n_tokens"] - r["dup_tokens"]
        expect = " ".join(
            t for i, t in enumerate(toks) if i not in removed_pos.get(d, set())
        )
        assert r["clean_text"] == expect


def test_streaming_fold_equals_batch(spark):
    from googleanalytics_etl_spark.ops.round10 import s_exact_substring_dedup

    batch = sorted(
        tuple(r) for r in x_exact_substring_dedup(spark, SF_SMALL).collect()
    )
    folded = sorted(
        tuple(r) for r in s_exact_substring_dedup(spark, SF_SMALL).collect()
    )
    assert folded == batch


def test_packed_key_overflow_fails_loudly(spark, monkeypatch):
    import pytest

    from googleanalytics_etl_spark.ops import round10

    monkeypatch.setattr(round10, "_POS_BITS", 4)
    bad = spark.createDataFrame(
        [(2, " ".join(f"t{i}" for i in range(30)))],  # 23 grams > 2^4
        "doc_id long, text string",
    )
    with pytest.raises(Exception, match="packed-key bounds"):
        round10._occ(bad).collect()


def test_packed_key_overflow_survives_fk_pruning(spark, monkeypatch):
    """The guard gates h as well as fk, so a plan that prunes fk —
    x_decontaminate_spans' benchmark side does .select('h').distinct()
    — still fails loudly on an oversized document (ADVICE round 10)."""
    import pytest

    from googleanalytics_etl_spark.ops import round10

    monkeypatch.setattr(round10, "_POS_BITS", 4)
    bad = spark.createDataFrame(
        [(2, " ".join(f"t{i}" for i in range(30)))],
        "doc_id long, text string",
    )
    with pytest.raises(Exception, match="packed-key bounds"):
        round10._occ(bad).select("h").distinct().collect()


def test_registry_doc_has_no_unformatted_placeholder():
    """Query.doc is captured AT registration; the {L} placeholder must
    be formatted before register() runs (ADVICE round 10)."""
    from googleanalytics_etl_spark.registry import REGISTRY, _populate

    _populate()
    doc = REGISTRY["x_exact_substring_clean"].doc
    assert "{L}" not in doc
    assert f"{_SPAN_L}-row" in doc


def test_decontaminate_spans_python_replay(spark):
    """Exact replay: train-doc positions whose 8-gram appears anywhere
    in the src0 benchmark, merged into maximal spans."""
    from googleanalytics_etl_spark.ops.round10 import x_decontaminate_spans

    rows = load(spark, SF_SMALL, "documents").collect()
    bench_h = set()
    for r in rows:
        if r["source"] != "src0":
            continue
        t = r["text"].split(" ")
        for s in range(len(t) - _SPAN_L + 1):
            g = " ".join(t[s : s + _SPAN_L])
            bench_h.add(hashlib.md5(g.encode()).hexdigest()[:15])
    expected = set()
    for r in rows:
        if r["source"] == "src0":
            continue
        t = r["text"].split(" ")
        starts = [
            s
            for s in range(len(t) - _SPAN_L + 1)
            if hashlib.md5(
                " ".join(t[s : s + _SPAN_L]).encode()
            ).hexdigest()[:15]
            in bench_h
        ]
        if not starts:
            continue
        cur_s, cur_e = starts[0], starts[0] + _SPAN_L - 1
        for s in starts[1:]:
            if s > cur_e + 1:
                expected.add((r["doc_id"], cur_s, cur_e))
                cur_s = s
            cur_e = max(cur_e, s + _SPAN_L - 1)
        expected.add((r["doc_id"], cur_s, cur_e))
    got = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in x_decontaminate_spans(spark, SF_SMALL).collect()
    }
    assert got == expected
    assert got, "fixture must yield contaminated spans (probed: 102 starts)"


def test_decontaminate_spans_benchmark_never_flagged(spark):
    """The benchmark side is canonical by definition: no src0 doc may
    appear in the removal list, even though src0 docs share grams with
    train docs (and with each other)."""
    from googleanalytics_etl_spark.ops.round10 import x_decontaminate_spans

    bench_ids = {
        r["doc_id"]
        for r in load(spark, SF_SMALL, "documents")
        .where("source = 'src0'")
        .collect()
    }
    flagged = {
        r["doc_id"] for r in x_decontaminate_spans(spark, SF_SMALL).collect()
    }
    assert not (flagged & bench_ids)


def test_exact_substring_fuzz_vs_replay(spark):
    """Property fuzz: random tiny-vocabulary corpora (forced gram
    collisions) must match the plain-Python replay exactly — stresses
    the interval-merge edges (adjacent spans, whole-doc removal,
    within-doc repeats, tie-broken canonical picks) on inputs nobody
    hand-picked. Hypothesis drives the corpus shape; each generated
    corpus is deterministic, so failures replay exactly."""
    import os

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    fuzz_x = max(1, int(os.environ.get("SPARK_GRAFT_FUZZ_X", "1")))

    corpus = st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c"]), min_size=1, max_size=30
        ).map(" ".join),
        min_size=1,
        max_size=6,
    )

    @settings(
        max_examples=15 * fuzz_x,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(texts=corpus)
    def run(texts):
        docs = {i: t for i, t in enumerate(texts)}
        df = spark.createDataFrame(
            list(docs.items()), "doc_id long, text string"
        )
        got = {
            (r["doc_id"], r["span_start"], r["span_end"], r["span_len"])
            for r in _merged_spans(_dup_starts_one_pass(_occ(df))).collect()
        }
        assert got == _py_spans(docs), docs

    run()
