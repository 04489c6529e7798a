"""Round-5 batch-13: forward as-of, filter attribution, degree dist."""

from __future__ import annotations

from collections import Counter, defaultdict

from conftest import SF_SMALL

from pyspark.sql import functions as F

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.registry import queries


def test_asof_forward_recount(spark):
    rows = {r["event_id"]: r for r in queries()["q_join_asof_forward"](spark, SF_SMALL).collect()}
    ev = load(spark, SF_SMALL, "events").selectExpr(
        "event_id", "user_id", "cast(ts as timestamp) as ts", "event_type"
    ).collect()
    per_user = defaultdict(list)
    for e in ev:
        per_user[e["user_id"]].append(e)
    n_purchases = 0
    for uid, evs in per_user.items():
        evs.sort(key=lambda e: (e["ts"], e["event_id"]))
        for i, e in enumerate(evs):
            if e["event_type"] != "purchase":
                continue
            n_purchases += 1
            nxt = min(
                (x["ts"] for x in evs[i + 1 :] if x["event_type"] == "view"),
                default=None,
            )
            r = rows[e["event_id"]]
            assert r["next_view_ts"] == nxt
            if nxt is not None:
                from datetime import timedelta

                # exact integer µs — float total_seconds() loses precision
                assert r["us_to_next"] == (nxt - e["ts"]) // timedelta(
                    microseconds=1
                )
                assert r["us_to_next"] > 0
            else:
                assert r["us_to_next"] is None
    assert len(rows) == n_purchases


def test_filter_attribution_funnel(spark):
    rows = {r["rule"]: r for r in queries()["x_filter_attribution"](spark, SF_SMALL).collect()}
    n = load(spark, SF_SMALL, "documents").count()
    assert set(rows) == {"short", "long", "repetitive", "longwords"}
    order = ["short", "long", "repetitive", "longwords"]
    prev = 0
    for name in order:
        r = rows[name]
        assert r["cumulative_kills"] >= prev  # funnel is monotone
        assert r["cumulative_kills"] + r["survivors"] == n
        assert 0 <= r["solo_kills"] <= r["cumulative_kills"] or r["solo_kills"] >= 0
        prev = r["cumulative_kills"]
    # the ruleset actually bites on the fixture
    assert rows["longwords"]["cumulative_kills"] > 0


def test_degree_dist_totals(spark):
    rows = queries()["x_graph_degree_dist"](spark, SF_SMALL).collect()
    li = load(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_partkey").distinct()
    n_nodes = li.select("l_partkey").distinct().count()
    n_edges = li.count()
    assert sum(r["n_nodes"] for r in rows) == n_nodes
    assert sum(r["edges_covered"] for r in rows) == n_edges
    for r in rows:
        lo, hi = 2 ** r["bucket"], 2 ** (r["bucket"] + 1) - 1
        assert lo <= r["d_min"] <= r["d_max"] <= hi


def test_dedup_normalized_collapses_mutants(spark):
    rows = {r["doc_id"]: r for r in queries()["x_dedup_normalized"](spark, SF_SMALL).collect()}
    # each mutated doc (case flip + doubled spaces + punctuation) joins
    # its original's group; the original survives
    for i in range(10):
        m = rows[i + 4_000_000]
        o = rows[i]
        assert m["nkey"] == o["nkey"]
        assert m["survivor"] == i and o["survivor"] == i
        assert m["group_size"] >= 2
    # no accidental cross-doc collapses: group sizes are 1 outside the
    # planted pairs (fixture texts are distinct after normalization)
    big = [r for r in rows.values() if r["group_size"] > 2]
    assert not big


def test_pack_audit_consistent_with_pack_sequences(spark):
    audit = {r["source"]: r for r in queries()["x_pack_audit"](spark, SF_SMALL).collect()}
    packs = queries()["x_pack_sequences"](spark, SF_SMALL).collect()
    per = defaultdict(list)
    for p in packs:
        per[p["source"]].append(p["pack_tokens"])
    for src, toks in per.items():
        a = audit[src]
        assert a["n_packs"] == len(toks)
        assert a["total_tokens"] == sum(toks)
        assert a["min_pack"] == min(toks)
        assert a["max_pack"] == max(toks)
        assert 0 < a["utilization"]
        # greedy cursor never leaves a pack (except the last) below budget
        # minus one max doc; sanity: overall utilization is substantial
        assert a["utilization"] > 0.5


def test_union_evolving_nullfills_by_name(spark):
    rows = queries()["q_union_evolving"](spark, SF_SMALL).collect()
    o = load(spark, SF_SMALL, "orders")
    cut = F.lit("1998-01-01").cast("timestamp_ntz")
    pre = o.where(F.col("o_orderdate") < cut).count()
    post = o.where(F.col("o_orderdate") >= cut).count()
    assert sum(r["n"] for r in rows) == pre + post
    # each side's exclusive column is non-null exactly on its rows
    assert sum(r["with_priority"] for r in rows) == pre
    assert sum(r["with_custkey"] for r in rows) == post
    assert pre > 0 and post > 0


def test_source_overlap_recount(spark):
    rows = queries()["x_source_overlap"](spark, SF_SMALL).collect()
    docs = load(spark, SF_SMALL, "documents").where(
        F.col("source").isin(["src0", "src1", "src2", "src3", "src4"])
    ).select("source", "text").collect()
    per = defaultdict(set)
    for d in docs:
        ws = d["text"].split(" ")
        sh = (
            {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}
            if len(ws) >= 3
            else {d["text"]}
        )
        per[d["source"]] |= sh
    assert len(rows) == 10  # C(5,2) pairs
    for r in rows:
        a, b = per[r["src_a"]], per[r["src_b"]]
        assert r["n_a"] == len(a) and r["n_b"] == len(b)
        assert r["n_common"] == len(a & b)
        want = round(len(a & b) / min(len(a), len(b)), 6)
        assert abs(r["overlap"] - want) < 1e-9


def test_session_dynamic_purchase_extends_sessions(spark):
    """Dynamic-gap sessions: the 60-min purchase gap must MERGE some
    event pairs a fixed 30-min gap would split — strictly fewer (or
    equal) sessions than the fixed-gap count, and strictly fewer on
    this fixture."""
    dyn = queries()["s_session_dynamic"](spark, SF_SMALL)
    n_dyn = dyn.count()
    fixed = queries()["s_session"](spark, SF_SMALL)
    n_fixed = fixed.count()
    assert n_dyn < n_fixed
    # session invariants: end > start, events >= 1
    for r in dyn.collect():
        assert r["session_end"] > r["session_start"]
        assert r["n_events"] >= 1


def test_session_dynamic_streaming_equivalence(spark):
    """The same dynamic-gap query under readStream (5 real micro-batches,
    watermarked) converges to the batch result — the built-in stateful
    operator's streaming path, not just its batch twin."""
    import uuid

    from googleanalytics_etl_spark.ops.streaming import (
        _events_stream,
        _run_to_memory,
        _stage_events,
    )

    stage = _stage_events(spark, SF_SMALL)
    gap = F.expr(
        "make_interval(0, 0, 0, 0, 0,"
        " CASE WHEN event_type = 'purchase' THEN 60 ELSE 30 END, 0)"
    )
    agg = (
        _events_stream(spark, stage)
        .withWatermark("ts", "10 hours")
        .groupBy("user_id", F.session_window(F.col("ts"), gap))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("cents"),
        )
        .select(
            "user_id",
            F.col("session_window.start").cast("timestamp_ntz").alias("session_start"),
            F.col("session_window.end").cast("timestamp_ntz").alias("session_end"),
            "n_events",
            "cents",
        )
    )
    name = f"sdyn_{uuid.uuid4().hex[:8]}"
    _run_to_memory(agg, name, "complete")
    got = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"], r["cents"])
        for r in spark.table(name).collect()
    }
    want = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"], r["cents"])
        for r in queries()["s_session_dynamic"](spark, SF_SMALL).collect()
    }
    assert got == want


def test_timezone_shift_is_exact(spark):
    rows = {r["local_hour"]: r["n"] for r in queries()["q_fn_timezone"](spark, SF_SMALL).collect()}
    utc = {
        r["h"]: r["n"]
        for r in load(spark, SF_SMALL, "events")
        .selectExpr("hour(cast(ts as timestamp)) as h")
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # January ⇒ EST (UTC-5) everywhere: the histogram is a pure rotation
    assert sum(rows.values()) == sum(utc.values())
    for h, n in utc.items():
        assert rows[(h - 5) % 24] == n


def test_vocab_coverage_curve(spark):
    rows = {r["k"]: r for r in queries()["x_vocab_coverage"](spark, SF_SMALL).collect()}
    assert set(rows) == {10, 100, 1000}
    # coverage is monotone in k, ends ≤ 1, and the head dominates
    # (Zipfian fixture: top-10 already covers a large share)
    assert rows[10]["coverage"] <= rows[100]["coverage"] <= rows[1000]["coverage"] <= 1.0
    assert rows[10]["coverage"] > 0.2
    tot = rows[10]["total_tokens"]
    assert rows[100]["total_tokens"] == tot and rows[1000]["total_tokens"] == tot


def test_train_val_test_split_proportions_and_disjointness(spark):
    rows = queries()["x_train_val_test"](spark, SF_SMALL).collect()
    tot = sum(r["n"] for r in rows)
    assert tot == load(spark, SF_SMALL, "documents").count()
    by_split = defaultdict(int)
    for r in rows:
        by_split[r["split"]] += r["n"]
    assert set(by_split) == {"train", "val", "test"}
    # expected 204/26/26 of 256 ≈ 79.7/10.2/10.2 %, binomial tolerance
    assert abs(by_split["train"] / tot - 204 / 256) < 0.06
    assert abs(by_split["val"] / tot - 26 / 256) < 0.05
    assert abs(by_split["test"] / tot - 26 / 256) < 0.05
    # replay: assignment is a pure function of doc_id
    import hashlib

    docs = load(spark, SF_SMALL, "documents").select("doc_id", "lang").collect()
    want = defaultdict(int)
    for d in docs:
        h2 = hashlib.md5(str(d["doc_id"]).encode()).hexdigest()[:2]
        s = "train" if h2 < "cc" else ("val" if h2 < "e6" else "test")
        want[(s, d["lang"])] += 1
    got = {(r["split"], r["lang"]): r["n"] for r in rows}
    assert got == dict(want)


def test_rfm_features_recount(spark):
    got = {r["user_id"]: r for r in queries()["x_rfm_features"](spark, SF_SMALL).collect()}
    ev = load(spark, SF_SMALL, "events").selectExpr(
        "user_id", "cast(ts as timestamp) as ts", "event_type", "value"
    ).collect()
    horizon = max(e["ts"] for e in ev).date()
    per = defaultdict(list)
    for e in ev:
        per[e["user_id"]].append(e)
    assert set(got) == set(per)
    for uid, evs in per.items():
        r = got[uid]
        assert r["recency_days"] == (horizon - max(e["ts"] for e in evs).date()).days
        assert r["frequency"] == len(evs)
        assert r["monetary_cents"] == sum(
            round(e["value"] * 100) for e in evs if e["event_type"] == "purchase"
        )
        assert r["active_days"] == len({e["ts"].date() for e in evs})
        assert r["n_purchases"] == sum(1 for e in evs if e["event_type"] == "purchase")


def test_cross_operator_token_accounting(spark):
    """Consistency web: three independent operators must agree on the
    corpus's total token-occurrence count — the coverage curve's
    denominator, the heavy-hitter threshold base, and a direct count."""
    cov = queries()["x_vocab_coverage"](spark, SF_SMALL).collect()[0]
    direct = (
        load(spark, SF_SMALL, "documents")
        .select(F.explode(F.split("text", " ")).alias("t"))
        .where(F.col("t") != "")
        .count()
    )
    assert cov["total_tokens"] == direct
    # heavy hitters: every reported count obeys the n/(k+1) threshold
    # against the SAME total
    hh = queries()["x_approx_topk"](spark, SF_SMALL).collect()
    for r in hh:
        assert r["n"] * 51 > direct


def test_psi_drift_recount(spark):
    import math

    got = {r["event_type"]: r for r in queries()["x_psi_drift"](spark, SF_SMALL).collect()}
    ev = load(spark, SF_SMALL, "events").selectExpr(
        "cast(ts as timestamp) as ts", "event_type", "value"
    ).collect()
    from decimal import ROUND_HALF_UP, Decimal

    cells = defaultdict(lambda: [0, 0])
    for e in ev:
        if e["value"] is None:
            continue
        period = 0 if e["ts"].isoformat() < "2024-01-16" else 1
        b = min(int(e["value"] // 20), 4)
        cells[(e["event_type"], b)][period] += 1
    types = {t for t, _b in cells}
    for t in types:
        te = sum(v[0] for (tt, _b), v in cells.items() if tt == t)
        tl = sum(v[1] for (tt, _b), v in cells.items() if tt == t)
        s = Decimal(0)
        nb = 0
        for (tt, _b), (ne, nl) in cells.items():
            if tt != t:
                continue
            nb += 1
            pe = (ne + 0.5) / (te + 2.5)
            pl = (nl + 0.5) / (tl + 2.5)
            s += Decimal((pe - pl) * math.log(pe / pl)).quantize(
                Decimal("0.00000001"), rounding=ROUND_HALF_UP
            )
        r = got[t]
        assert r["n_buckets"] == nb
        assert abs(r["psi"] - float(s)) < 1e-6
        assert r["psi"] >= 0  # PSI is a (smoothed) f-divergence


def test_user_coherent_sample_is_all_or_none(spark):
    r = queries()["x_user_coherent_sample"](spark, SF_SMALL).collect()[0]
    import hashlib

    ev = load(spark, SF_SMALL, "events").select("user_id", "event_type").collect()
    per_user = defaultdict(lambda: [0, 0])
    for e in ev:
        per_user[e["user_id"]][0] += 1
        per_user[e["user_id"]][1] += e["event_type"] == "purchase"
    kept = {
        u for u in per_user
        if hashlib.md5(str(u).encode()).hexdigest()[:2] < "1a"
    }
    assert r["n_users"] == len(kept)
    assert r["n_events"] == sum(per_user[u][0] for u in kept)
    assert r["n_purchases"] == sum(per_user[u][1] for u in kept)
    # coherence: sampled users contribute EVERY event (counts match the
    # full per-user totals, no partial users possible by construction)
    assert 0 < r["n_users"] < len(per_user)


def test_dedup_threshold_curve_is_monotone_and_consistent(spark):
    rows = {r["threshold"]: r["n_pairs"] for r in queries()["x_dedup_threshold_curve"](spark, SF_SMALL).collect()}
    assert sorted(rows) == [0.5, 0.6, 0.7, 0.8, 0.9]
    # survival is monotone non-increasing in the threshold
    vals = [rows[t] for t in sorted(rows)]
    assert vals == sorted(vals, reverse=True)
    # consistency with x_dedup_near (threshold 0.5 = its pair count)
    near = queries()["x_dedup_near"](spark, SF_SMALL).count()
    assert rows[0.5] == near
    # the planted identical pairs survive every threshold
    assert rows[0.9] >= 10


def test_time_decay_recount(spark):
    import math
    from decimal import ROUND_HALF_UP, Decimal

    got = {r["event_type"]: r for r in queries()["x_time_decay"](spark, SF_SMALL).collect()}
    ev = load(spark, SF_SMALL, "events").selectExpr(
        "cast(ts as timestamp) as ts", "event_type", "value"
    ).collect()
    horizon = max(e["ts"] for e in ev).date()
    sums = defaultdict(lambda: [0, Decimal(0)])
    for e in ev:
        if e["value"] is None:
            continue
        age = (horizon - e["ts"].date()).days
        t = Decimal(e["value"] * math.exp(-0.1 * age)).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP
        )
        sums[e["event_type"]][0] += 1
        sums[e["event_type"]][1] += t
    for typ, (n, s) in sums.items():
        r = got[typ]
        assert r["n"] == n
        # Python's exp differs from the JVM/C exp in the last ulp, which
        # can flip the 1e-6 per-term quantization either way — allow the
        # accumulated slack (the ENGINES agree exactly; this recount is
        # an independent approximation, cf. the log2 lesson in
        # test_round5d_ops)
        assert abs(r["decayed_value"] - float(s)) < 1e-3
        # decayed value is bounded by the undecayed sum
        undecayed = sum(
            e["value"] for e in ev if e["event_type"] == typ and e["value"] is not None
        )
        assert r["decayed_value"] <= undecayed + 1e-9
