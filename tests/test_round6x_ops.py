"""Semantic tests for x_kneser_ney and x_benford (round-6 batch 24).
test_oracle.py proves Spark == DuckDB; these replay the statistics in
python and check the defining identities: KN probabilities recompute
from their own row's integer evidence and sum to 1 over the
vocabulary for a fixed context; Benford rows carry a consistent χ²
and the digit shares sum to 1.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.ops.round6x import _KN_D, _KN_TOPK
from googleanalytics_etl_spark.registry import queries


def _bigrams(spark):
    docs = load(spark, SF_SMALL, "documents").select("text").collect()
    bg = Counter()
    for r in docs:
        toks = [t for t in r["text"].split(" ") if t]
        for a, b in zip(toks, toks[1:]):
            bg[(a, b)] += 1
    return bg


def test_kneser_ney_replay(spark):
    """Evidence matches a brute-force count replay; p_kn recomputes
    from the row's own integers; discounted head < p_mle always."""
    bg = _bigrams(spark)
    c1 = Counter()
    n_follow = Counter()
    n_prec = Counter()
    for (a, b), c in bg.items():
        c1[a] += c
        n_follow[a] += 1
        n_prec[b] += 1
    n_types = len(bg)
    top = sorted(bg.items(), key=lambda kv: (-kv[1], kv[0]))[:_KN_TOPK]
    rows = queries()["x_kneser_ney"](spark, SF_SMALL).collect()
    assert len(rows) == _KN_TOPK
    assert {(r["w1"], r["w2"]) for r in rows} == {k for k, _ in top}
    for r in rows:
        k = (r["w1"], r["w2"])
        assert r["c_bigram"] == bg[k]
        assert r["c_context"] == c1[r["w1"]]
        assert r["n_follow"] == n_follow[r["w1"]]
        assert r["n_prec"] == n_prec[r["w2"]]
        assert r["n_types"] == n_types
        pkn = (r["c_bigram"] - _KN_D) / r["c_context"] + (
            _KN_D * r["n_follow"] / r["c_context"]
        ) * (r["n_prec"] / n_types)
        assert abs(r["p_kn"] - pkn) < 1e-6
        assert 0.0 < r["p_kn"] <= 1.0
        # the interpolated estimate never exceeds MLE + full back-off mass
        assert r["p_kn"] <= r["p_mle"] + _KN_D * r["n_follow"] / r["c_context"]


def test_kneser_ney_sums_to_one(spark):
    """Σ_w2 P_KN(w2|w1) = 1 for any observed context — the property
    that makes KN a probability model (checked replay-side for the
    three highest-count contexts)."""
    bg = _bigrams(spark)
    c1 = Counter()
    n_follow = Counter()
    n_prec = Counter()
    for (a, b), c in bg.items():
        c1[a] += c
        n_follow[a] += 1
        n_prec[b] += 1
    n_types = len(bg)
    vocab_prec_total = sum(n_prec.values())
    assert vocab_prec_total == n_types  # each type contributes once
    for w1 in [w for w, _ in c1.most_common(3)]:
        s = 0.0
        for w2 in n_prec:  # full continuation vocabulary
            c = bg.get((w1, w2), 0)
            s += max(c - _KN_D, 0.0) / c1[w1] + (
                _KN_D * n_follow[w1] / c1[w1]
            ) * (n_prec[w2] / n_types)
        assert abs(s - 1.0) < 1e-9


def test_benford_replay(spark):
    """Digit counts match a replay; shares sum to 1; chi2 identical on
    every row and consistent with the quantized-term definition."""
    orders = load(spark, SF_SMALL, "orders").collect()
    digits = Counter(
        int(str(round(r["o_totalprice"] * 100))[0]) for r in orders
    )
    n = sum(digits.values())
    rows = queries()["x_benford"](spark, SF_SMALL).collect()
    assert [r["digit"] for r in rows] == list(range(1, 10))
    assert sum(r["n_obs"] for r in rows) == n
    chi_expect = 0.0
    for r in rows:
        assert r["n_obs"] == digits.get(r["digit"], 0)
        pb = math.log10(1 + 1 / r["digit"])
        assert abs(r["p_benford"] - pb) < 1e-8
        assert abs(r["dev"] - round(r["n_obs"] / n - r["p_benford"], 6)) < 1e-9
        e = n * r["p_benford"]
        chi_expect += (r["n_obs"] - e) ** 2 / e
    chis = {r["chi2_total"] for r in rows}
    assert len(chis) == 1
    assert abs(chis.pop() - chi_expect) < 1e-3
    assert abs(sum(r["p_obs"] for r in rows) - 1.0) < 1e-4
