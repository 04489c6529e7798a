"""Round-5 batch-10: equi-depth histogram and the BPE merge round."""

from __future__ import annotations

import math
from collections import Counter

from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.registry import queries


def test_equidepth_bucket_sizes_and_boundaries(spark):
    rows = sorted(
        queries()["x_equidepth_hist"](spark, SF_SMALL).collect(),
        key=lambda r: r["bucket"],
    )
    n = load(spark, SF_SMALL, "orders").count()
    assert [r["bucket"] for r in rows] == list(range(1, 11))
    assert sum(r["n_rows"] for r in rows) == n
    # equal depth: every bucket holds ⌊n/10⌋ or ⌈n/10⌉ rows
    for r in rows:
        assert r["n_rows"] in (n // 10, math.ceil(n / 10))
    # boundaries are monotone and non-overlapping across buckets
    for a, b in zip(rows, rows[1:]):
        assert a["lo"] <= a["hi"] <= b["lo"] <= b["hi"]


def test_equidepth_recount(spark):
    rows = {r["bucket"]: r for r in queries()["x_equidepth_hist"](spark, SF_SMALL).collect()}
    orders = load(spark, SF_SMALL, "orders").select(
        "o_totalprice", "o_orderkey"
    ).collect()
    vals = sorted((o["o_totalprice"], o["o_orderkey"]) for o in orders)
    n = len(vals)
    per = {}
    for i, (p, _k) in enumerate(vals, start=1):
        b = math.ceil(i * 10 / n)
        per.setdefault(b, []).append(p)
    for b, ps in per.items():
        r = rows[b]
        assert r["n_rows"] == len(ps)
        assert r["lo"] == round(min(ps), 2)
        assert r["hi"] == round(max(ps), 2)


def _vocab(spark):
    wc: Counter = Counter()
    for d in load(spark, SF_SMALL, "documents").select("text").collect():
        for t in d["text"].split(" "):
            if len(t) >= 2:
                wc[t] += 1
    return wc


def test_bpe_apply_replay(spark):
    wc = _vocab(spark)
    pairs0: Counter = Counter()
    for w, c in wc.items():
        for i in range(len(w) - 1):
            pairs0[w[i : i + 2]] += c
    merge = min(pairs0.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    pairs1: Counter = Counter()
    for w, c in wc.items():
        m = w.replace(merge, "¤")
        if len(m) >= 2:
            for i in range(len(m) - 1):
                pairs1[m[i : i + 2]] += c
    want = sorted(pairs1.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    rows = [(r["pair"], r["n"]) for r in queries()["x_bpe_apply"](spark, SF_SMALL).collect()]
    assert rows == want


def test_bpe_apply_merge_changes_statistics(spark):
    # after fusing the top pair, its 2-char string no longer dominates:
    # the new top-10 must differ from the pre-merge top-10
    pre = [r["pair"] for r in queries()["x_bpe_merge"](spark, SF_SMALL).collect()][:10]
    post = [r["pair"] for r in queries()["x_bpe_apply"](spark, SF_SMALL).collect()]
    assert pre != post
    # merged-symbol contexts exist in the full post-merge statistic
    # (they need not crack the top-10 — the fused pair's mass spreads
    # over many ¤x / x¤ contexts)
    wc = _vocab(spark)
    pairs0: Counter = Counter()
    for w, c in wc.items():
        for i in range(len(w) - 1):
            pairs0[w[i : i + 2]] += c
    merge = min(pairs0.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    ctx = Counter()
    for w, c in wc.items():
        m = w.replace(merge, "¤")
        for i in range(len(m) - 1):
            if "¤" in m[i : i + 2]:
                ctx[m[i : i + 2]] += c
    assert ctx  # the new symbol really has contexts
    # and the elected pair itself vanished from the post-merge stats
    assert merge not in post


def test_dpp_join_injects_dynamic_pruning(spark):
    """The Tuesday dim filter must reach the partitioned fact scan as a
    dynamicpruning subquery (runtime partition pruning), and the result
    must cover exactly the month's 5 Tuesdays."""
    import contextlib
    import io

    df = queries()["x_dpp_join"](spark, SF_SMALL)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "dynamicpruning" in plan.lower()
    days = sorted(r["event_date"].isoformat() for r in df.select("event_date").distinct().collect())
    assert days == [
        "2024-01-02",
        "2024-01-09",
        "2024-01-16",
        "2024-01-23",
        "2024-01-30",
    ]
