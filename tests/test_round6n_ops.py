"""Semantic tests for x_ppl_filter and x_neg_sampling_table (round-6
batch 14). test_oracle.py proves Spark == DuckDB; these check
consistency with the bigram-LM frame and replay the sampling table.
"""

from __future__ import annotations

from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.ops.round6n import _NS_TOPK, _PPL_HI, _PPL_LO
from googleanalytics_etl_spark.registry import queries


def _round6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP))


# ---------------------------------------------------------------------------
# x_ppl_filter
# ---------------------------------------------------------------------------


def test_ppl_filter_consistent_with_logprob_frame(spark):
    rows = {
        r["band"]: r for r in queries()["x_ppl_filter"](spark, SF_SMALL).collect()
    }
    scored = queries()["x_bigram_logprob"](spark, SF_SMALL).collect()
    per_band = {}
    for r in scored:
        lp = r["avg_logp"]
        band = 0 if lp < _PPL_LO else (1 if lp < _PPL_HI else 2)
        d = per_band.setdefault(band, [0, 0, []])
        d[0] += 1
        d[1] += r["n_bigrams"]
        d[2].append(lp)
    assert set(rows) == set(per_band)
    q8 = lambda v: Decimal(repr(v)).quantize(  # noqa: E731
        Decimal("1e-8"), ROUND_HALF_UP
    )
    for band, (n, nb, lps) in per_band.items():
        r = rows[band]
        assert r["n_docs"] == n
        assert r["n_bigrams"] == nb
        assert r["keep"] == (1 if band == 1 else 0)
        assert r["mean_logp"] == _round6(float(sum(q8(x) for x in lps)) / n)


def test_ppl_filter_band_order_and_coverage(spark):
    rows = sorted(
        queries()["x_ppl_filter"](spark, SF_SMALL).collect(),
        key=lambda r: r["band"],
    )
    n_docs = queries()["x_bigram_logprob"](spark, SF_SMALL).count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    # band means must be ordered with the bands
    means = [r["mean_logp"] for r in rows]
    assert means == sorted(means)


# ---------------------------------------------------------------------------
# x_neg_sampling_table
# ---------------------------------------------------------------------------


def test_neg_sampling_exact_replay(spark):
    rows = {
        r["tok"]: r
        for r in queries()["x_neg_sampling_table"](spark, SF_SMALL).collect()
    }
    docs = load(spark, SF_SMALL, "documents").collect()
    c = Counter(t for r in docs for t in r["text"].split(" ") if t != "")
    top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:_NS_TOPK]
    assert set(rows) == {t for t, _ in top}
    q8 = lambda v: Decimal(repr(v)).quantize(  # noqa: E731
        Decimal("1e-8"), ROUND_HALF_UP
    )
    tot = sum(n for _, n in top)
    z = sum(q8(float(n) ** 0.75) for _, n in top)
    for tok, n in top:
        r = rows[tok]
        assert r["c"] == n
        assert r["p_unigram"] == _round6(n / tot)
        p_s = float(q8(float(n) ** 0.75)) / float(z)
        assert abs(r["p_smoothed"] - p_s) < 2e-6
        assert abs(r["boost"] - p_s / (n / tot)) < 1e-4


def test_neg_sampling_smoothing_properties(spark):
    rows = queries()["x_neg_sampling_table"](spark, SF_SMALL).collect()
    # both distributions sum to ~1 over the table
    assert abs(sum(r["p_unigram"] for r in rows) - 1.0) < 1e-3
    assert abs(sum(r["p_smoothed"] for r in rows) - 1.0) < 1e-3
    # the 3/4 power flattens: the most frequent token is down-boosted,
    # the least frequent is up-boosted
    by_c = sorted(rows, key=lambda r: r["c"])
    assert by_c[-1]["boost"] < 1.0
    assert by_c[0]["boost"] > 1.0
