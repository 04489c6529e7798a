"""Round-9 batch-3 tests: winnowing fingerprints.

Semantic pins:

- exact plain-Python replay of the winnowing selection (min hash per
  sliding window, rightmost tie-break, dedup) on the real fixture;
- the WINNOWING GUARANTEE on planted data: two documents sharing a
  substring of w + k − 1 = 8 tokens must share at least one selected
  fingerprint hash (and therefore appear in the match candidate list
  when they share two such spans);
- density bounds: every full window selects something, one selection
  covers at most w windows, so n_windows/w ≤ n_fp ≤ n_windows.
"""

from __future__ import annotations

import hashlib

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.ops.round9c import (
    _WIN_K,
    _WIN_W,
    _fingerprints,
    x_winnow_fingerprint,
    x_winnow_matches,
)

SF_SMALL = "/root/testdata/sf0.01"


def _h(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16)


def _py_winnow(text: str) -> set[tuple[int, int]]:
    t = text.split(" ")
    if len(t) < _WIN_K:
        return set()
    hs = [_h(" ".join(t[i : i + _WIN_K])) for i in range(len(t) - _WIN_K + 1)]
    out: set[tuple[int, int]] = set()
    for s in range(len(hs) - _WIN_W + 1):
        win = hs[s : s + _WIN_W]
        m = min(win)
        # rightmost minimal position
        pos = s + max(i for i, v in enumerate(win) if v == m)
        out.add((m, pos))
    return out


def test_winnow_matches_python_replay(spark):
    docs = {
        r["doc_id"]: r["text"]
        for r in load(spark, SF_SMALL, "documents").collect()
    }
    expected = {
        (d, h, p) for d, text in docs.items() for (h, p) in _py_winnow(text)
    }
    got = {
        (r["doc_id"], r["gram_hash"], r["pos"])
        for r in x_winnow_fingerprint(spark, SF_SMALL).collect()
    }
    assert got == expected


def test_winnow_density_bounds(spark):
    docs = {
        r["doc_id"]: len(r["text"].split(" "))
        for r in load(spark, SF_SMALL, "documents").collect()
    }
    from collections import Counter

    per_doc = Counter(
        r["doc_id"] for r in x_winnow_fingerprint(spark, SF_SMALL).collect()
    )
    for d, n_tok in docs.items():
        n_windows = n_tok - _WIN_K + 1 - _WIN_W + 1
        if n_windows <= 0:
            assert d not in per_doc
            continue
        assert per_doc[d] <= n_windows
        assert per_doc[d] * _WIN_W >= n_windows, (d, per_doc[d], n_windows)


def test_winnowing_guarantee_planted(spark):
    """Two docs sharing >= w+k-1 = 8 consecutive tokens MUST share a
    fingerprint hash; with two disjoint shared spans they must appear
    in the >= 2-shared match logic."""
    shared1 = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    shared2 = "one two three four five six seven eight"  # 8 tokens
    a = f"{shared1} filler1 filler2 filler3 {shared2}"
    b = f"pre1 pre2 {shared1} mid1 mid2 mid3 mid4 {shared2} post1"
    c = "totally different words nothing in common here at all folks"
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id long, text string"
    )
    fp = _fingerprints(df)
    rows = fp.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], set()).add(r["gram_hash"])
    shared_ab = by_doc[1] & by_doc[2]
    assert len(shared_ab) >= 2, "two 8-token shared spans -> >=2 shared hashes"
    assert not (by_doc[1] & by_doc.get(3, set()))
    assert not (by_doc[2] & by_doc.get(3, set()))


def test_winnow_matches_on_fixture(spark):
    """Every emitted pair must actually share >= 2 fingerprint hashes,
    cross-checked from the fingerprint table."""
    fps = {}
    for r in x_winnow_fingerprint(spark, SF_SMALL).collect():
        fps.setdefault(r["doc_id"], set()).add(r["gram_hash"])
    got = {
        (r["doc_a"], r["doc_b"]): r["n_shared"]
        for r in x_winnow_matches(spark, SF_SMALL).collect()
    }
    # recompute the full candidate list from the fingerprint sets
    expected = {}
    docs = sorted(fps)
    from collections import defaultdict

    byhash = defaultdict(list)
    for d in docs:
        for h in fps[d]:
            byhash[h].append(d)
    pair_count = defaultdict(set)
    for h, ds in byhash.items():
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                pair_count[(min(ds[i], ds[j]), max(ds[i], ds[j]))].add(h)
    expected = {
        p: len(hs) for p, hs in pair_count.items() if len(hs) >= 2
    }
    assert got == expected


def test_s_winnow_matches_fold_equals_batch(spark):
    """The incremental index loop must reproduce the batch match list
    EXACTLY: fingerprints are deterministic per doc and the a<b pair
    space is covered exactly once by index-vs-batch + within-batch."""
    from googleanalytics_etl_spark.ops.round9c import s_winnow_matches

    batch = sorted(tuple(r) for r in x_winnow_matches(spark, SF_SMALL).collect())
    folded = sorted(tuple(r) for r in s_winnow_matches(spark, SF_SMALL).collect())
    assert folded == batch


def test_winnow_pos_overflow_fails_loudly(spark, monkeypatch):
    """A document whose gram count exceeds the packed-key position field
    must raise, not fingerprint incorrectly. _POS_BITS is patched down
    so the guard is exercised without a 2^20-token fixture."""
    import pytest

    from googleanalytics_etl_spark.ops import round9c

    monkeypatch.setattr(round9c, "_POS_BITS", 4)
    ok = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(15)))],  # 11 grams < 2^4
        "doc_id long, text string",
    )
    assert round9c._fingerprints(ok).count() > 0
    bad = spark.createDataFrame(
        [(2, " ".join(f"t{i}" for i in range(25)))],  # 21 grams > 2^4
        "doc_id long, text string",
    )
    with pytest.raises(Exception, match="argmin position field"):
        round9c._fingerprints(bad).collect()
