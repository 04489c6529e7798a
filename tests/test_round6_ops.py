"""Semantic tests for the round-6 corpus-health/planning operators.

The differential harness (test_oracle.py) already proves Spark == DuckDB
for each key; these tests prove the SEMANTICS are right — planted
expectations, Python replays of the hash draws, and the invariants each
metric must satisfy by construction.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pyspark.sql.functions as F
from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.registry import queries


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


# ---------------------------------------------------------------------------
# x_class_balance
# ---------------------------------------------------------------------------


def test_class_balance_probabilities_and_replay(spark):
    rows = {r["label"]: r for r in queries()["x_class_balance"](spark, SF_SMALL).collect()}
    min_n = min(r["n_orig"] for r in rows.values())
    for lab, r in rows.items():
        assert 0 <= r["n_kept"] <= r["n_orig"]
        assert r["keep_p"] == round(min_n / r["n_orig"], 6)
    # the minority class keeps everything: p = 1 and u < 1 always holds
    minority = next(lab for lab, r in rows.items() if r["n_orig"] == min_n)
    assert rows[minority]["n_kept"] == rows[minority]["n_orig"]
    # exact Python replay of the seeded Bernoulli for every label
    em = load(spark, SF_SMALL, "embeddings").select("vec_id", "label").collect()
    by_label = Counter(r["label"] for r in em)
    kept = Counter()
    for r in em:
        u = (int(_md5(f"cb-seed-1|{r['vec_id']}")[:8], 16) + 0.5) / 2**32
        if u < min_n / by_label[r["label"]]:
            kept[r["label"]] += 1
    assert {lab: r["n_kept"] for lab, r in rows.items()} == dict(kept)


def test_class_balance_lands_near_minority_size(spark):
    rows = queries()["x_class_balance"](spark, SF_SMALL).collect()
    min_n = min(r["n_orig"] for r in rows)
    for r in rows:
        # E[n_kept] = min_n; 5-sigma binomial slack keeps this stable
        sigma = math.sqrt(min_n) + 1
        assert abs(r["n_kept"] - min_n) <= 5 * sigma, (r, min_n)


# ---------------------------------------------------------------------------
# x_survivor_policy
# ---------------------------------------------------------------------------


def test_survivor_policy_planted_mutants_disagree(spark):
    rows = queries()["x_survivor_policy"](spark, SF_SMALL).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in load(spark, SF_SMALL, "documents")
        .where(F.col("doc_id") < 10)
        .select("doc_id", "text")
        .collect()
    }
    for d in docs:
        # each planted pair {d, d+4e6} forms a group; the group's
        # keep_first is min over possibly-larger organic groups, but for
        # the group containing d the mutant rules are exact whenever the
        # group is exactly the pair
        grp = next((r for r in rows if r["keep_first"] == d), None)
        assert grp is not None, f"no dup group for doc {d}"
        if grp["group_n"] == 2:
            # mutant is 4 chars longer ('  !!') → keep_longest = mutant;
            # fixture text is pure [a-z ], mutant adds '!!' → cleanest =
            # original; policies must disagree
            assert grp["keep_longest"] == d + 4_000_000
            assert grp["keep_cleanest"] == d
            assert grp["all_agree"] == 0
    # keep_first is always the group minimum and a member of the group
    for r in rows:
        assert r["group_n"] >= 2
        assert r["all_agree"] in (0, 1)


# ---------------------------------------------------------------------------
# x_source_kl
# ---------------------------------------------------------------------------


def test_source_kl_nonnegative_and_recount(spark):
    rows = {r["source"]: r for r in queries()["x_source_kl"](spark, SF_SMALL).collect()}
    docs = load(spark, SF_SMALL, "documents").select("source", "text").collect()
    corpus = Counter()
    per_src = defaultdict(Counter)
    for r in docs:
        for w in r["text"].split(" "):
            corpus[w] += 1
            per_src[r["source"]][w] += 1
    vocab = sorted(corpus.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    nv = len(vocab)
    assert all(r["n_vocab"] == nv for r in rows.values())
    # Gibbs: KL ≥ 0 up to the DECIMAL(18,8) per-term quantization —
    # holds because smoothing denominators use the ACTUAL vocab size,
    # so p and q are true distributions over the grid
    assert all(r["kl"] >= -1e-6 for r in rows.values())
    # Python recount for every source (loose tolerance: engine LN vs
    # Python math.log differ in last ulps, and terms are quantized)
    tc = sum(c for _, c in vocab)
    for src, got in rows.items():
        ts = sum(per_src[src][w] for w, _ in vocab)
        kl = 0.0
        for w, cw in vocab:
            p = (per_src[src][w] + 0.5) / (ts + nv * 0.5)
            q = (cw + 0.5) / (tc + nv * 0.5)
            kl += p * math.log(p / q)
        assert abs(got["kl"] - kl) < 1e-4, (src, got["kl"], kl)


# ---------------------------------------------------------------------------
# x_token_budget
# ---------------------------------------------------------------------------


def test_token_budget_exact_replay(spark):
    rows = {r["source"]: r for r in queries()["x_token_budget"](spark, SF_SMALL).collect()}
    docs = load(spark, SF_SMALL, "documents").select("source", "text").collect()
    avail = Counter()
    for r in docs:
        avail[r["source"]] += len(r["text"].split(" "))
    assert {s: r["avail"] for s, r in rows.items()} == dict(avail)
    budget = math.floor(sum(avail.values()) * 0.4)
    share = math.floor(sum(avail.values()) * 0.4 / len(avail))
    alloc0 = {s: min(a, share) for s, a in avail.items()}
    leftover = budget - sum(alloc0.values())
    cap_tot = sum(a - alloc0[s] for s, a in avail.items())
    for s, r in rows.items():
        extra = (
            math.floor(leftover * float(avail[s] - alloc0[s]) / cap_tot)
            if cap_tot > 0
            else 0
        )
        assert r["alloc"] == alloc0[s] + extra, (s, r["alloc"])
        assert r["alloc"] <= r["avail"]
        assert r["fill_ratio"] == round(r["alloc"] / r["avail"], 6)
    # allocation never exceeds the budget (floors only shave)
    assert sum(r["alloc"] for r in rows.values()) <= budget


# ---------------------------------------------------------------------------
# x_split_contamination
# ---------------------------------------------------------------------------


def test_split_contamination_planted_pairs_accounted(spark):
    rows = queries()["x_split_contamination"](spark, SF_SMALL).collect()
    total = sum(r["n_pairs"] for r in rows)
    leaked = sum(r["n_leaked"] for r in rows)
    # the 10 planted identical pairs (d, d+1e6) are always found
    assert total >= 10
    # leaked pairs only ever appear on off-diagonal split combinations
    for r in rows:
        assert r["split_lo"] <= r["split_hi"]
        if r["split_lo"] == r["split_hi"]:
            assert r["n_leaked"] == 0
        else:
            assert r["n_leaked"] == r["n_pairs"]

    # replay the planted pairs' split assignment: each (d, d+1e6) pair
    # contributes to exactly one (split_lo, split_hi) cell
    def split_of(doc_id: int) -> str:
        h2 = _md5(str(doc_id))[:2]
        return "train" if h2 < "cc" else ("val" if h2 < "e6" else "test")

    planted_leaks = sum(
        1 for d in range(10) if split_of(d) != split_of(d + 1_000_000)
    )
    assert leaked >= planted_leaks


# ---------------------------------------------------------------------------
# x_dup_inflation
# ---------------------------------------------------------------------------


def test_dup_inflation_recount_and_bounds(spark):
    rows = {r["source"]: r for r in queries()["x_dup_inflation"](spark, SF_SMALL).collect()}
    docs = load(spark, SF_SMALL, "documents").select(
        "doc_id", "source", "text"
    ).collect()
    # replicate the corpus construction + normalization in Python
    import re

    def nkey(text: str) -> str:
        s = re.sub(r"[^a-z0-9 ]", "", text.lower())
        s = re.sub(r" +", " ", s).strip()
        return _md5(s)

    corpus = [(r["doc_id"], r["source"], r["text"]) for r in docs]
    corpus += [
        (d + 4_000_000, s, t[0].upper() + t[1:] + "  !!")
        for d, s, t in corpus[:]
        if d < 10
    ]
    groups = defaultdict(list)
    for d, s, t in corpus:
        groups[(s, nkey(t))].append((d, len(t.split(" "))))
    per_src = defaultdict(lambda: [0, 0, 0, 0])  # docs, uniq, toks, utoks
    for (s, _), members in groups.items():
        members.sort()
        per_src[s][0] += len(members)
        per_src[s][1] += 1
        per_src[s][2] += sum(t for _, t in members)
        per_src[s][3] += members[0][1]
    for s, r in rows.items():
        nd, nu, tk, ut = per_src[s]
        assert (r["n_docs"], r["n_unique"], r["tokens"], r["unique_tokens"]) == (
            nd, nu, tk, ut
        ), s
        assert r["inflation"] == round(tk / ut, 6)
        assert r["inflation"] >= 1.0
    # sources hosting the planted mutants must show inflation
    mutated_sources = {s for d, s, _ in corpus if d >= 4_000_000}
    assert all(rows[s]["inflation"] > 1.0 for s in mutated_sources)


# ---------------------------------------------------------------------------
# s_dedup_near
# ---------------------------------------------------------------------------


def test_s_dedup_near_equals_batch_survivors(spark):
    """The streaming incremental dedup must land on EXACTLY the batch
    x_dedup_near_survivors set: arrival follows doc_id order and every
    candidate join keeps old_id < new_id, so 'dropped on arrival'
    coincides with 'has a verified smaller-id partner'."""
    got = sorted(
        tuple(r)
        for r in queries()["s_dedup_near"](spark, SF_SMALL).collect()
    )
    want = sorted(
        tuple(r)
        for r in queries()["x_dedup_near_survivors"](spark, SF_SMALL).collect()
    )
    assert got == want


def test_s_dedup_near_drops_planted_tail_and_reruns_stable(spark):
    a = queries()["s_dedup_near"](spark, SF_SMALL)
    ids = {r["doc_id"] for r in a.select("doc_id").collect()}
    # the +1e6 tail arrives in the LAST micro-batch, after its originals
    # are indexed — every planted copy must be dropped
    assert not any(i >= 1_000_000 for i in ids)
    # and the originals survive (nothing smaller matches them)
    assert all(i in ids for i in range(10))
    b = queries()["s_dedup_near"](spark, SF_SMALL)
    assert {r["doc_id"] for r in b.select("doc_id").collect()} == ids


# ---------------------------------------------------------------------------
# x_ndcg_eval / x_compaction_plan / x_join_skew_diagnose
# ---------------------------------------------------------------------------


def test_ndcg_bounds_and_recall_consistency(spark):
    """NDCG is in (0, 1]; a query with recall 1.0 has ndcg 1.0 (the
    probed cells contained the whole ideal top-10 in the same order by
    construction — both lists rank by true cosine)."""
    ndcg = {r["qid"]: r for r in queries()["x_ndcg_eval"](spark, SF_SMALL).collect()}
    recall = {
        r["qid"]: r["recall"]
        for r in queries()["x_ann_recall"](spark, SF_SMALL).collect()
    }
    assert set(ndcg) == set(recall)
    for qid, r in ndcg.items():
        assert 0 < r["ndcg"] <= 1.0 + 1e-9
        assert 0 < r["dcg"] <= r["idcg"] + 1e-9
        if recall[qid] == 1.0:
            assert r["ndcg"] == 1.0
        if recall[qid] < 1.0:
            assert r["ndcg"] < 1.0
        # graded metric dominates the binary one: dropping only
        # low-gain tail items hurts NDCG less than recall
        assert r["ndcg"] >= recall[qid] - 1e-9


def test_compaction_plan_replay(spark):
    """Python replay of the first-fit cumsum packer at sf0.01 and both
    invariants: bins are contiguous per source, and no bin except
    possibly the last of a source stays under target while a successor
    exists (the rule only opens a bin when the previous multiples are
    filled)."""
    from conftest import SF_MED

    rows = {
        (r["source"], r["bin"]): (r["n_files"], r["bytes_total"], r["compacts"])
        for r in queries()["x_compaction_plan"](spark, SF_MED).collect()
    }
    docs = load(spark, SF_MED, "documents").select(
        "doc_id", "source", "n_chars"
    ).collect()
    files = defaultdict(int)
    for r in docs:
        files[(r["source"], r["doc_id"] // 50)] += r["n_chars"]
    plan = defaultdict(lambda: [0, 0])
    for src in {s for s, _ in files}:
        cum = 0
        for fid in sorted(f for s, f in files if s == src):
            b = cum // 16_384
            plan[(src, b)][0] += 1
            plan[(src, b)][1] += files[(src, fid)]
            cum += files[(src, fid)]
    want = {
        k: (n, byt, 1 if n > 1 else 0) for k, (n, byt) in plan.items()
    }
    assert rows == want
    # contiguity: bins per source are 0..max with no gaps
    for src in {s for s, _ in rows}:
        bins = sorted(b for s, b in rows if s == src)
        assert bins == list(range(len(bins)))


def test_join_skew_diagnose_recount(spark):
    rows = queries()["x_join_skew_diagnose"](spark, SF_SMALL).collect()
    ev = load(spark, SF_SMALL, "events").select("user_id").collect()
    cnt = Counter(r["user_id"] for r in ev)
    total = sum(cnt.values())
    n_keys = len(cnt)
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = sorted(rows, key=lambda r: r["rank"])
    assert [(r["user_id"], r["cnt"]) for r in got] == want
    for r in got:
        assert r["share"] == round(r["cnt"] / total, 6)
        assert r["skew_factor"] == round(r["cnt"] * n_keys / total, 6)
    # ranks are 1..10 and counts are non-increasing
    assert [r["rank"] for r in got] == list(range(1, len(got) + 1))
    assert all(a["cnt"] >= b["cnt"] for a, b in zip(got, got[1:]))


# ---------------------------------------------------------------------------
# s_psi_monitor
# ---------------------------------------------------------------------------


def test_s_psi_monitor_equals_batch_drift(spark):
    """The incrementally-accumulated PSI must equal the batch
    x_psi_drift scan exactly (counts are associative, the formula runs
    on the summed state) — the metric twin of s_incremental_sync."""
    got = sorted(
        tuple(r) for r in queries()["s_psi_monitor"](spark, SF_SMALL).collect()
    )
    want = sorted(
        tuple(r) for r in queries()["x_psi_drift"](spark, SF_SMALL).collect()
    )
    assert got == want
