"""Round-5 batch-4 operators: bigram log-probability, diverse sampling,
deterministic DP — Python/numpy recounts and mechanism checks."""

from __future__ import annotations

import hashlib
import math
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pytest
from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.registry import queries


def _dec(x: float, q: str) -> Decimal:
    return Decimal(x).quantize(Decimal(q), rounding=ROUND_HALF_UP)


def test_bigram_logprob_recount(spark):
    got = {r["doc_id"]: r for r in queries()["x_bigram_logprob"](spark, SF_SMALL).collect()}
    docs = load(spark, SF_SMALL, "documents").select("doc_id", "text").collect()
    c2: Counter = Counter()
    c1: Counter = Counter()
    doc_bgs = {}
    for d in docs:
        ws = [t for t in d["text"].split(" ") if t]
        bgs = list(zip(ws, ws[1:]))
        doc_bgs[d["doc_id"]] = bgs
        for bg in bgs:
            c2[bg] += 1
            c1[bg[0]] += 1
    for doc_id, bgs in doc_bgs.items():
        if not bgs:
            assert doc_id not in got
            continue
        # both engines evaluate log2 as log(x)/log(2) (JVM Math.log /
        # C std log), which differs from Python's correctly-rounded
        # math.log2 in the last ulp — enough to flip a 1e-4 quantization
        lg2 = lambda x: math.log(x) / math.log(2.0)  # noqa: E731
        s = float(
            sum(_dec(lg2(c2[bg] / c1[bg[0]]), "0.0001") for bg in bgs)
        )
        # engines ROUND the double's SHORTEST decimal repr half-up (JVM
        # BigDecimal.valueOf goes through Double.toString), so a quotient
        # landing on ...5 at the 7th digit is a true tie rounded away from
        # zero; Decimal(float) would see the exact binary expansion and
        # miss the tie — round the repr, not the bits
        want = float(
            Decimal(repr(s / len(bgs))).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )
        r = got[doc_id]
        assert r["n_bigrams"] == len(bgs)
        assert r["avg_logp"] == pytest.approx(want, abs=1e-9)
        # probabilities ≤ 1 ⇒ average log-prob ≤ 0
        assert r["avg_logp"] <= 1e-9


def test_bigram_logprob_ranks_repetitive_text_higher(spark):
    # a doc whose bigrams are all corpus-frequent scores above one made
    # of rare transitions; sanity: scores vary across the corpus
    vals = [r["avg_logp"] for r in queries()["x_bigram_logprob"](spark, SF_SMALL).collect()]
    assert max(vals) - min(vals) > 0.5


def test_diverse_sample_matches_numpy(spark):
    rows = queries()["x_diverse_sample"](spark, SF_SMALL).collect()
    em = load(spark, SF_SMALL, "embeddings").select(
        "label", "vec_id", "embedding"
    ).collect()
    by_label: dict = {}
    for r in em:
        g = np.round(np.array([float(x) for x in r["embedding"]]) * 1e7) / 1e7
        by_label.setdefault(r["label"], []).append((r["vec_id"], g))
    want = {}
    for lbl, vecs in by_label.items():
        grid = np.array([np.round(v * 1e7).astype(np.int64) for _, v in vecs])
        cent = np.array(
            [round(float(grid[:, d].sum()) / 1e7 / len(vecs), 6) for d in range(grid.shape[1])]
        )
        scored = []
        for vid, v in vecs:
            d2 = float(
                sum(_dec((x - c) * (x - c), "0.0000000001") for x, c in zip(v, cent))
            )
            scored.append((round(d2, 6), vid))
        scored.sort()
        want[lbl] = scored[:2]
    assert len(rows) == 2 * len(by_label)
    for r in rows:
        d2, vid = want[r["label"]][r["pick"] - 1]
        assert r["vec_id"] == vid
        assert r["d2"] == pytest.approx(d2, abs=1e-9)


def test_dp_groupby_mechanism(spark):
    rows = {r["event_type"]: r["noisy_count"] for r in queries()["x_dp_groupby"](spark, SF_SMALL).collect()}
    ev = load(spark, SF_SMALL, "events").groupBy("event_type").count().collect()
    true = {r["event_type"]: r["count"] for r in ev}
    assert set(rows) == set(true)
    for t, n in true.items():
        u = (int(hashlib.md5(f"dp-seed-1|{t}".encode()).hexdigest()[:4], 16) + 0.5) / 65536.0
        lap = (-1.0 if u >= 0.5 else 1.0) * math.log(1.0 - 2.0 * abs(u - 0.5))
        assert rows[t] == pytest.approx(round(n + lap, 4), abs=1e-9)
        # Laplace(b=1) noise: |noise| beyond ~11.1 has probability < 2^-16,
        # impossible from a 16-bit uniform grid
        assert abs(rows[t] - n) < 12


def test_dp_groupby_does_not_leak_exact_counts(spark):
    cols = queries()["x_dp_groupby"](spark, SF_SMALL).columns
    assert cols == ["event_type", "noisy_count"]
