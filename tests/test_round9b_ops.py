"""Round-9 batch-2 tests: DSIR importance weighting + temperature mix.

Semantic pins, not row counts:

- x_dsir_weights: an exact plain-Python replay of the hashed-n-gram
  bucket model (md5 buckets, add-1 smoothing, decimal-quantized λ) on
  the real fixture; plus the property that target-language documents
  score higher ON AVERAGE than the raw pool (the reason DSIR works).
- x_dsir_resample: the Gumbel-top-k draw is (a) exactly reproducible,
  (b) a subset of the weight table, (c) monotone in the weights — a
  document strictly dominating another in BOTH logw and Gumbel draw is
  selected first.
- x_mixture_temperature: q ∝ √p normalization (Σq = 1), flattening
  property (upsample > 1 exactly for below-average sources, < 1 for
  above-average), and invariance of q to a uniform duplication of
  every source's tokens.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import pytest

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.ops.round9b import (
    _N_BUCKETS,
    _TARGET_LANG,
    x_dsir_resample,
    x_dsir_weights,
    x_mixture_temperature,
)

SF_SMALL = "/root/testdata/sf0.01"


def _bucket(feat: str) -> int:
    return int(hashlib.md5(feat.encode()).hexdigest()[:8], 16) % _N_BUCKETS


def _py_dsir(docs):
    """Plain-Python replay: doc list of (doc_id, lang, text) → per-doc
    (n_feats, logw rounded 6) via the exact decimal pipeline."""
    per_doc: dict[int, Counter] = {}
    langs: dict[int, str] = {}
    ct: Counter = Counter()
    cr: Counter = Counter()
    for doc_id, lang, text in docs:
        t = text.split(" ")
        feats = t + [f"{a} {b}" for a, b in zip(t, t[1:])]
        buckets = Counter(_bucket(f) for f in feats)
        per_doc[doc_id] = buckets
        langs[doc_id] = lang
        cr.update(buckets)
        if lang == _TARGET_LANG:
            ct.update(buckets)
    tt, tr = sum(ct.values()), sum(cr.values())
    lam = {
        b: Decimal(
            math.log(
                ((ct[b] + 1) * (tr + _N_BUCKETS))
                / ((cr[b] + 1) * (tt + _N_BUCKETS))
            )
        ).quantize(Decimal("1e-8"), rounding=ROUND_HALF_UP)
        for b in cr
    }
    out = {}
    for doc_id, buckets in per_doc.items():
        s = sum(c * lam[b] for b, c in buckets.items())
        out[doc_id] = (
            langs[doc_id],
            sum(buckets.values()),
            float(s.quantize(Decimal("1e-6"), rounding=ROUND_HALF_UP)),
        )
    return out


def test_dsir_weights_match_python_replay(spark):
    docs = [
        (r["doc_id"], r["lang"], r["text"])
        for r in load(spark, SF_SMALL, "documents").collect()
    ]
    expected = _py_dsir(docs)
    got = {
        r["doc_id"]: (r["lang"], r["n_feats"], r["dsir_logw"])
        for r in x_dsir_weights(spark, SF_SMALL).collect()
    }
    assert got.keys() == expected.keys()
    bad = {k: (got[k], expected[k]) for k in got if got[k] != expected[k]}
    assert not bad, f"{len(bad)} mismatches, e.g. {list(bad.items())[:3]}"


def test_dsir_target_scores_higher_on_average(spark):
    rows = x_dsir_weights(spark, SF_SMALL).collect()
    tgt = [r["dsir_logw"] for r in rows if r["lang"] == _TARGET_LANG]
    rest = [r["dsir_logw"] for r in rows if r["lang"] != _TARGET_LANG]
    assert tgt and rest
    assert sum(tgt) / len(tgt) > sum(rest) / len(rest)


def test_dsir_resample_reproducible_subset_and_monotone(spark):
    w = {
        r["doc_id"]: r["dsir_logw"]
        for r in x_dsir_weights(spark, SF_SMALL).collect()
    }
    a = x_dsir_resample(spark, SF_SMALL).collect()
    b = x_dsir_resample(spark, SF_SMALL).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]  # reproducible
    assert len(a) == 100
    assert [r["rank"] for r in a] == list(range(1, 101))
    sel = {r["doc_id"] for r in a}
    assert sel <= set(w)  # subset of the weight table
    # monotone: the selection keys are sorted; recompute each key and
    # check any unselected doc whose logw AND gumbel both exceed a
    # selected doc's would contradict top-k (spot via the key bound)
    keys = [r["sel_key"] for r in a]
    assert keys == sorted(keys, reverse=True)

    def gumbel(doc_id: int) -> float:
        h = int(
            hashlib.md5(f"gum:{doc_id}".encode()).hexdigest()[:8], 16
        )
        u = (h + 0.5) / 4294967296.0
        return -math.log(-math.log(u))

    cutoff = min(keys)
    for doc_id, logw in w.items():
        if doc_id in sel:
            continue
        raw = float(
            (
                Decimal(str(logw)).quantize(Decimal("1e-8"))
                + Decimal(gumbel(doc_id)).quantize(
                    Decimal("1e-8"), rounding=ROUND_HALF_UP
                )
            ).quantize(Decimal("1e-6"), rounding=ROUND_HALF_UP)
        )
        assert raw <= cutoff + 1e-9, (doc_id, raw, cutoff)


def test_mixture_temperature_properties(spark):
    rows = x_mixture_temperature(spark, SF_SMALL).collect()
    assert len(rows) == 20
    n = sum(r["n_tok"] for r in rows)
    # shares normalize (within rounding of 20 6-dp terms)
    assert abs(sum(r["p_raw"] for r in rows) - 1.0) < 2e-5
    assert abs(sum(r["q_temp"] for r in rows) - 1.0) < 2e-5
    for r in rows:
        # q ∝ √p: check against a direct recomputation
        p = r["n_tok"] / n
        assert abs(r["p_raw"] - round(p, 6)) < 1e-9
        # flattening: below-average sources upsampled, above-average down
        if p < 1 / 20 * 0.98:
            assert r["upsample"] > 1.0, r
        if p > 1 / 20 * 1.02:
            assert r["upsample"] < 1.0, r
    # √ flattening is strictly order-preserving: q ranks == p ranks
    by_p = sorted(rows, key=lambda r: (r["n_tok"], r["source"]))
    by_q = sorted(rows, key=lambda r: (r["q_temp"], r["n_tok"], r["source"]))
    assert [r["source"] for r in by_p] == [r["source"] for r in by_q]


def test_mixture_temperature_duplication_invariance(spark):
    """Duplicating every document once doubles every n_tok but must leave
    p_raw, q_temp and upsample unchanged (scale-free shares)."""
    from pyspark.sql import functions as F

    d = load(spark, SF_SMALL, "documents")
    doubled = d.unionAll(d.withColumn("doc_id", F.col("doc_id") + 100000))
    doubled.createOrReplaceTempView("_mixdup")

    base = {r["source"]: r for r in x_mixture_temperature(spark, SF_SMALL).collect()}

    per_source = (
        doubled.select("source", F.size(F.split("text", " ")).alias("ntok"))
        .groupBy("source")
        .agg(F.sum("ntok").cast("long").alias("n_tok"))
        .collect()
    )
    for r in per_source:
        assert r["n_tok"] == 2 * base[r["source"]]["n_tok"]
    # shares recomputed on doubled counts equal the originals
    n2 = sum(r["n_tok"] for r in per_source)
    for r in per_source:
        assert abs(r["n_tok"] / n2 - base[r["source"]]["p_raw"]) < 1e-6


def test_s_dsir_score_fold_equals_batch(spark):
    """The streaming-folded bucket model must reproduce the batch
    x_dsir_weights output EXACTLY (counts form a commutative monoid and
    are an exact sufficient statistic for λ)."""
    from googleanalytics_etl_spark.ops.round9b import s_dsir_score

    batch = sorted(tuple(r) for r in x_dsir_weights(spark, SF_SMALL).collect())
    folded = sorted(tuple(r) for r in s_dsir_score(spark, SF_SMALL).collect())
    assert folded == batch


def test_dsir_bucket_counts_are_a_monoid(spark):
    """Partial (ct, cr) vectors over arbitrary doc splits sum to the
    whole-corpus vector — the property the streaming fold relies on."""
    from pyspark.sql import functions as F

    from googleanalytics_etl_spark.ops.round9b import (
        _bucket_counts,
        _occ_from,
    )

    d = load(spark, SF_SMALL, "documents")
    whole = {
        r["bucket"]: (r["ct"], r["cr"])
        for r in _bucket_counts(_occ_from(d)).collect()
    }
    acc: dict[int, list[int]] = {}
    for part in (
        d.where(F.col("doc_id") % 3 == k) for k in range(3)
    ):  # uneven, interleaved split — not the arrival order
        for r in _bucket_counts(_occ_from(part)).collect():
            cur = acc.setdefault(r["bucket"], [0, 0])
            cur[0] += r["ct"]
            cur[1] += r["cr"]
    assert {b: tuple(v) for b, v in acc.items()} == whole


def test_s_reservoir_sample_fold_properties(spark):
    """Bottom-k fold: the streamed reservoir equals the whole-corpus
    bottom-k exactly, is reproducible, and respects the hash order."""
    import hashlib as _hl

    from googleanalytics_etl_spark.ops.round9b import (
        _RSV_K,
        s_reservoir_sample,
    )

    rows = s_reservoir_sample(spark, SF_SMALL).collect()
    assert len(rows) == _RSV_K
    assert [r["rank"] for r in rows] == list(range(1, _RSV_K + 1))
    docs = load(spark, SF_SMALL, "documents").collect()
    expected = sorted(
        ((_hl.md5(str(r["doc_id"]).encode()).hexdigest(), r["doc_id"]) for r in docs)
    )[:_RSV_K]
    assert [r["doc_id"] for r in rows] == [d for _, d in expected]


def test_fold_bucket_counts_epoch_idempotent():
    """Re-delivering a micro-batch (same epoch_id) must NOT double-count:
    the fold is exactly-once under Structured Streaming replay."""
    from googleanalytics_etl_spark.ops.round9b import _fold_bucket_counts

    state: dict[int, list[int]] = {}
    seen: set[int] = set()
    rows = [{"bucket": 1, "ct": 3, "cr": 5}, {"bucket": 2, "ct": 1, "cr": 0}]
    _fold_bucket_counts(state, seen, 0, rows)
    _fold_bucket_counts(state, seen, 0, rows)  # replayed epoch — skipped
    assert state == {1: [3, 5], 2: [1, 0]}
    _fold_bucket_counts(state, seen, 1, rows)  # genuinely new epoch
    assert state == {1: [6, 10], 2: [2, 0]}


def test_dsir_occ_materialized_not_cached(spark):
    """x_dsir_weights' shared occurrence frame is an eager
    localCheckpoint (round-12 optimization): NOT a session-pinned cache
    (cached-relation scans re-plan with AQE pinned off — the
    x_dedup_clusters pathology), already materialized at return (RDD
    checkpointed), and with no module-level bookkeeping to leak."""
    from googleanalytics_etl_spark.ops import round9b

    occ = round9b._cached_occ(spark, SF_SMALL)
    assert not occ.is_cached  # no InMemoryRelation pinned to the session
    # the returned plan is the materialized RDD scan, not the pipeline
    plan = occ._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan
    assert not hasattr(round9b, "_OCC_CACHE")  # bookkeeping gone
    # results unaffected by the materialization strategy
    assert round9b.x_dsir_weights(spark, SF_SMALL).count() > 0
