"""Semantic tests for the round-6 batch-3 operators.

test_oracle.py proves Spark == DuckDB; these prove the semantics —
planted expectations, Python replays, and consistency with the sibling
operators each key extends.
"""

from __future__ import annotations

import hashlib
import re
from collections import defaultdict

import pyspark.sql.functions as F
from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.registry import queries


# ---------------------------------------------------------------------------
# x_cross_source_dups
# ---------------------------------------------------------------------------


def test_cross_source_dups_consistent_with_pair_set(spark):
    rows = queries()["x_cross_source_dups"](spark, SF_SMALL).collect()
    pairs = queries()["x_dedup_near"](spark, SF_SMALL).collect()
    src = {
        r["doc_id"]: r["source"]
        for r in load(spark, SF_SMALL, "documents")
        .select("doc_id", "source")
        .collect()
    }
    from decimal import ROUND_HALF_UP, Decimal

    q8 = Decimal("1e-8")
    expect = defaultdict(lambda: [0, Decimal(0)])
    for p in pairs:
        sa = src[p["doc_a"] % 1_000_000]
        sb = src[p["doc_b"] % 1_000_000]
        cell = (min(sa, sb), max(sa, sb))
        expect[cell][0] += 1
        # mirror the engine exactly: per-pair DECIMAL(18,8) half-up
        # quantization, exact sum, ONE double division at the end
        expect[cell][1] += Decimal(repr(p["jaccard"])).quantize(
            q8, ROUND_HALF_UP
        )
    got = {
        (r["source_lo"], r["source_hi"]): (r["n_pairs"], r["mean_jaccard"])
        for r in rows
    }
    assert set(got) == set(expect)
    q6 = Decimal("1e-6")
    for cell, (n, jsum) in expect.items():
        assert got[cell][0] == n
        # engines ROUND the quotient double on its shortest decimal repr
        # with ties half-up; Python's round() is half-even — replicate
        # via Decimal(repr(x)) (the cross-engine recount convention)
        mean = Decimal(repr(float(jsum) / n)).quantize(q6, ROUND_HALF_UP)
        assert got[cell][1] == float(mean)
    # the planted tail duplicates (doc_id < 10 re-inserted) are exact
    # dups WITHIN their own source: every planted pair lands on the
    # diagonal, so at least one diagonal cell exists
    assert any(r["source_lo"] == r["source_hi"] for r in rows)


# ---------------------------------------------------------------------------
# x_context_truncation
# ---------------------------------------------------------------------------


def _tok_counts(spark):
    out = {}
    for r in load(spark, SF_SMALL, "documents").select(
        "doc_id", "text", "source"
    ).collect():
        out[r["doc_id"]] = (
            r["source"],
            len([t for t in re.split(r"[^a-z]+", r["text"].lower()) if t]),
        )
    return out


def test_context_truncation_exact_replay(spark):
    rows = queries()["x_context_truncation"](spark, SF_SMALL).collect()
    counts = _tok_counts(spark)
    for L in (8, 16, 32):
        agg = defaultdict(lambda: [0, 0, 0, 0])
        for src, n in counts.values():
            a = agg[src]
            a[0] += 1
            a[1] += int(n > L)
            a[2] += n
            a[3] += min(n, L)
        for r in (x for x in rows if x["ctx_len"] == L):
            nd, nt, tt, tk = agg[r["source"]]
            assert (
                r["n_docs"],
                r["n_truncated"],
                r["tokens_total"],
                r["tokens_kept"],
            ) == (nd, nt, tt, tk)
            assert r["kept_ratio"] == round(tk / tt, 6)


def test_context_truncation_monotone_in_length(spark):
    rows = queries()["x_context_truncation"](spark, SF_SMALL).collect()
    by_src = defaultdict(dict)
    for r in rows:
        by_src[r["source"]][r["ctx_len"]] = r
    for cells in by_src.values():
        assert set(cells) == {8, 16, 32}
        # longer context keeps more tokens and truncates fewer docs
        assert (
            cells[8]["tokens_kept"]
            <= cells[16]["tokens_kept"]
            <= cells[32]["tokens_kept"]
        )
        assert (
            cells[8]["n_truncated"]
            >= cells[16]["n_truncated"]
            >= cells[32]["n_truncated"]
        )
        assert cells[32]["tokens_kept"] <= cells[32]["tokens_total"]


# ---------------------------------------------------------------------------
# x_exact_stratified
# ---------------------------------------------------------------------------


def test_exact_stratified_quota_and_replay(spark):
    rows = queries()["x_exact_stratified"](spark, SF_SMALL).collect()
    docs = load(spark, SF_SMALL, "documents").select("lang", "doc_id").collect()
    by_lang = defaultdict(list)
    for r in docs:
        h = hashlib.md5(f"xs-seed-1|{r['doc_id']}".encode()).hexdigest()
        by_lang[r["lang"]].append((h, r["doc_id"]))
    got = defaultdict(dict)
    for r in rows:
        got[r["lang"]][r["rk"]] = r["doc_id"]
    assert set(got) == set(by_lang)
    for lang, pool in by_lang.items():
        quota = min(40, len(pool))
        expect = [d for _, d in sorted(pool)[:quota]]
        assert [got[lang][i] for i in range(1, quota + 1)] == expect


def test_exact_stratified_is_window_group_limited(spark):
    df = queries()["x_exact_stratified"](spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the rank predicate must push a Partial WindowGroupLimit below the
    # exchange — each map task keeps its local top-n per stratum
    assert "WindowGroupLimit" in plan
    assert plan.count("WindowGroupLimit") >= 2  # Partial + Final
