"""Semantic tests for x_collocation_llr and x_session_entropy
(round-6 batch 27). test_oracle.py proves Spark == DuckDB; these
replay in python and check the defining identities: the 2×2
contingency is consistent (cells sum to N, margins recompute), G²
matches the textbook formula and is non-negative; entropy is bounded
by [0, ln(n_types)] and matches a direct -Σ p·ln p replay.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.ops.round6aa import _LLR_MIN
from googleanalytics_etl_spark.registry import queries


def test_collocation_llr_replay(spark):
    docs = load(spark, SF_SMALL, "documents").select("text").collect()
    bg = Counter()
    for r in docs:
        toks = [t for t in r["text"].split(" ") if t]
        for a, b in zip(toks, toks[1:]):
            bg[(a, b)] += 1
    r1 = Counter()
    c1 = Counter()
    for (a, b), c in bg.items():
        r1[a] += c
        c1[b] += c
    n = sum(bg.values())
    rows = queries()["x_collocation_llr"](spark, SF_SMALL).collect()
    expect_keys = {k for k, c in bg.items() if c >= _LLR_MIN}
    assert {(r["w1"], r["w2"]) for r in rows} == expect_keys
    for r in rows:
        k11 = bg[(r["w1"], r["w2"])]
        assert r["k11"] == k11
        assert r["k12"] == r1[r["w1"]] - k11
        assert r["k21"] == c1[r["w2"]] - k11
        assert r["k22"] == n - r1[r["w1"]] - c1[r["w2"]] + k11
        assert r["k11"] + r["k12"] + r["k21"] + r["k22"] == n
        # textbook G2
        rr = r1[r["w1"]]
        cc = c1[r["w2"]]
        g2 = 0.0
        for o, rt, ct in [
            (r["k11"], rr, cc),
            (r["k12"], rr, n - cc),
            (r["k21"], n - rr, cc),
            (r["k22"], n - rr, n - cc),
        ]:
            if o > 0:
                g2 += o * math.log(o * n / (rt * ct))
        g2 *= 2.0
        assert abs(r["llr"] - g2) < 1e-4
        assert r["llr"] >= -1e-6  # G2 is non-negative


def test_session_entropy_replay(spark):
    events = (
        load(spark, SF_SMALL, "events")
        .select("user_id", "event_type")
        .collect()
    )
    per = defaultdict(Counter)
    for r in events:
        per[r["user_id"]][r["event_type"]] += 1
    got = {
        r["user_id"]: r
        for r in queries()["x_session_entropy"](spark, SF_SMALL).collect()
    }
    assert set(got) == set(per)
    for uid, cnt in per.items():
        n = sum(cnt.values())
        h = -sum((c / n) * math.log(c / n) for c in cnt.values())
        g = got[uid]
        assert g["n_events"] == n
        assert g["n_types"] == len(cnt)
        assert abs(g["entropy"] - h) < 1e-5
        assert -1e-9 <= g["entropy"] <= math.log(len(cnt)) + 1e-9
        if len(cnt) == 1:
            assert abs(g["entropy"]) < 1e-9
