"""Round-5 batch-2 operators: mixture sampling, token entropy,
winsorization, neighbor Jaccard, BPE merges, semantic dedup —
independent Python recounts + invariant checks (the cross-engine hash
oracle runs in test_oracle.py / the driver)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pytest
from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.registry import queries


def _dec4(x: float) -> Decimal:
    """Spark/DuckDB CAST(double AS DECIMAL(18,4)): exact decimal value of
    the double, rounded half-up at scale 4 (NOT float round(x*1e4)/1e4,
    whose pre-multiply can cross the .5 boundary differently). Returns
    Decimal so sums stay EXACT — re-summing as floats reintroduces the
    order-dependent error the engines' decimal aggregation avoids."""
    return Decimal(x).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP)


def _docs(spark):
    return load(spark, SF_SMALL, "documents").select(
        "doc_id", "text", "source"
    ).collect()


def test_mixture_sample_recount(spark):
    got = {r["source"]: r for r in queries()["x_mixture_sample"](spark, SF_SMALL).collect()}
    docs = _docs(spark)
    n_s = Counter(d["source"] for d in docs)
    z = sum(_dec4(math.sqrt(n)) for n in n_s.values())
    n_total = sum(n_s.values())
    for s, n in n_s.items():
        r = got[s]
        assert r["n_docs"] == n
        w = float(_dec4(math.sqrt(n)) / z)
        assert r["weight"] == pytest.approx(round(w, 6), abs=1e-9)
        rate = min(1.0, round(0.5 * n_total * w / n, 4))
        assert r["rate"] == pytest.approx(rate, abs=1e-9)
        thr = math.floor(rate * 65536)
        picked = sum(
            1
            for d in docs
            if d["source"] == s
            and (
                rate >= 1.0
                or int(hashlib.md5(str(d["doc_id"]).encode()).hexdigest()[:4], 16)
                < thr
            )
        )
        assert r["n_sampled"] == picked


def test_mixture_sample_upweights_rare_sources(spark):
    rows = queries()["x_mixture_sample"](spark, SF_SMALL).collect()
    # temperature scaling: keep-rate ordering is inverse to size ordering
    by_size = sorted(rows, key=lambda r: r["n_docs"])
    if by_size[0]["n_docs"] < by_size[-1]["n_docs"]:
        assert by_size[0]["rate"] >= by_size[-1]["rate"]
    # expected sample mass is near the 50 % target (within cap effects)
    tot = sum(r["n_docs"] for r in rows)
    expect = sum(r["n_docs"] * r["rate"] for r in rows)
    assert 0.35 * tot <= expect <= 0.65 * tot


def test_token_entropy_recount(spark):
    got = {r["doc_id"]: r for r in queries()["x_token_entropy"](spark, SF_SMALL).collect()}
    for d in _docs(spark):
        toks = [t for t in d["text"].split(" ") if t]
        tf = Counter(toks)
        n = sum(tf.values())
        splg = float(sum(_dec4(c * math.log2(c)) for c in tf.values()))
        want = round(math.log2(n) - splg / n, 6)
        r = got[d["doc_id"]]
        assert r["n_tokens"] == n
        assert r["n_types"] == len(tf)
        assert r["entropy"] == pytest.approx(want, abs=1e-9)


def test_token_entropy_bounds(spark):
    for r in queries()["x_token_entropy"](spark, SF_SMALL).collect():
        # 0 ≤ H ≤ log2(n_types), with float-quantization slack
        assert -1e-6 <= r["entropy"] <= math.log2(r["n_types"]) + 1e-6


def test_winsorize_recount(spark):
    got = {r["o_orderpriority"]: r for r in queries()["x_winsorize"](spark, SF_SMALL).collect()}
    orders = load(spark, SF_SMALL, "orders").select(
        "o_orderpriority", "o_totalprice", "o_orderkey"
    ).collect()
    groups = defaultdict(list)
    for o in orders:
        groups[o["o_orderpriority"]].append((o["o_totalprice"], o["o_orderkey"]))
    for pri, vals in groups.items():
        vals.sort()
        n = len(vals)
        lo = vals[math.ceil(0.05 * n) - 1][0]
        hi = vals[math.ceil(0.95 * n) - 1][0]
        r = got[pri]
        assert r["n_orders"] == n
        assert r["p05"] == pytest.approx(round(lo, 2), abs=1e-9)
        assert r["p95"] == pytest.approx(round(hi, 2), abs=1e-9)
        clipped = [min(max(v, lo), hi) for v, _ in vals]
        want = round(float(sum(_dec4(c) for c in clipped)) / n, 4)
        assert r["win_avg"] == pytest.approx(want, abs=1e-6)
        # winsorized mean lies within the clip bounds
        assert lo - 1e-9 <= r["win_avg"] <= hi + 1e-9


def test_neighbor_jaccard_recount(spark):
    rows = queries()["x_neighbor_jaccard"](spark, SF_SMALL).collect()
    ev = load(spark, SF_SMALL, "events").select("user_id", "event_type").collect()
    audiences = defaultdict(set)
    for e in ev:
        audiences[e["event_type"]].add(e["user_id"])
    types = sorted(audiences)
    assert len(rows) == len(types) * (len(types) - 1) // 2
    for r in rows:
        a, b = audiences[r["type_a"]], audiences[r["type_b"]]
        assert r["type_a"] < r["type_b"]
        assert r["n_a"] == len(a) and r["n_b"] == len(b)
        inter = len(a & b)
        assert r["n_both"] == inter
        assert r["jaccard"] == pytest.approx(round(inter / len(a | b), 6), abs=1e-9)


def test_bpe_merge_recount(spark):
    rows = queries()["x_bpe_merge"](spark, SF_SMALL).collect()
    wc = Counter()
    for d in _docs(spark):
        for t in d["text"].split(" "):
            if len(t) >= 2:
                wc[t] += 1
    pairs = Counter()
    for w, c in wc.items():
        for i in range(len(w) - 1):
            pairs[w[i : i + 2]] += c
    want = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
    assert [(r["pair"], r["n"]) for r in rows] == want


def test_semdedup_finds_planted_duplicates(spark):
    import math

    rows = queries()["x_semdedup_ivf"](spark, SF_SMALL).collect()
    # k = ceil(sqrt(510)) IVF cells; every output row is a non-empty cell
    assert 2 <= len(rows) <= math.ceil(math.sqrt(510))
    # 510 vectors assigned (500 + 10 planted dups)
    assert sum(r["n_members"] for r in rows) == 510
    # every planted identical copy is found and removed exactly once:
    # vec 0..9 duplicated; each pair is intra-cluster by construction
    assert sum(r["n_removed"] for r in rows) == 10
    # the 8 seed clusters each contain their own seed
    for r in rows:
        assert r["n_members"] >= 1
        assert r["n_dup_pairs"] >= r["n_removed"] > 0 or r["n_dup_pairs"] == 0


def test_semdedup_no_organic_false_positives(spark):
    # pairs beyond the 10 planted ones would mean organic cosine ≥ 0.92,
    # which the near-orthogonal fixture excludes (max ≈ 0.48)
    rows = queries()["x_semdedup_ivf"](spark, SF_SMALL).collect()
    assert sum(r["n_dup_pairs"] for r in rows) == 10


def test_ivf_seeds_and_assign_survive_sparse_offset_ids(spark):
    """Regression for the `vec_id < k` init-threshold assumption: on a
    frame whose ids are sparse and offset (id → id*7 + 1000), a literal
    threshold would silently shrink the seed set to empty and every
    downstream assignment with it. The k-smallest-ids init must train
    the same NUMBER of seeds and assign every vector exactly once; and
    because id order is preserved by the monotone remap, the cluster
    MEMBERSHIP partition must be identical to the dense-id run's."""
    import pyspark.sql.functions as F

    from googleanalytics_etl_spark.ops.round5b import seed_assign

    em = load(spark, SF_SMALL, "embeddings").select("vec_id", "embedding")
    n = em.count()
    dense = seed_assign(em)
    sparse = seed_assign(
        em.select(
            (F.col("vec_id") * 7 + 1000).alias("vec_id"), "embedding"
        )
    )
    assert sparse.count() == dense.count() == n
    assert sparse.select("vec_id").distinct().count() == n
    # monotone id remap + identical embeddings ⇒ identical partition of
    # vectors into clusters (cluster LABELS differ: they are seed ids)
    def groups(df, unmap):
        out = defaultdict(set)
        for r in df.collect():
            out[r["cluster"]].add(unmap(r["vec_id"]))
        return sorted(out.values(), key=lambda s: min(s))

    assert groups(dense, lambda v: v) == groups(
        sparse, lambda v: (v - 1000) // 7
    )
