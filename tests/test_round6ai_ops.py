"""Semantic tests for x_mix_shift and x_item_cf (round-6 batch 35).
test_oracle.py proves Spark == DuckDB; these replay in python and check
the defining identities: the three decomposition effects sum exactly to
each segment's total contribution (and across segments to the overall
metric change); item-CF cosines match a brute capped co-visitation
scan and respect the cap bound.
"""

from __future__ import annotations

import json
import math
from collections import defaultdict
from datetime import datetime
from decimal import Decimal

from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.ops.round6ai import (
    _CF_CAP,
    _CF_TOPK,
    _MIX_SPLIT,
)
from googleanalytics_etl_spark.registry import queries


def test_mix_shift_replay(spark):
    rows = (
        load(spark, SF_SMALL, "events")
        .select("event_type", "ts", "value")
        .collect()
    )
    split = datetime.fromisoformat(_MIX_SPLIT)
    n = defaultdict(int)
    s = defaultdict(Decimal)
    for r in rows:
        p = 1 if r["ts"] < split else 2
        n[(r["event_type"], p)] += 1
        s[(r["event_type"], p)] += Decimal(str(r["value"])).quantize(
            Decimal("0.0001")
        )
    nt = {p: sum(v for (et, q), v in n.items() if q == p) for p in (1, 2)}
    got = queries()["x_mix_shift"](spark, SF_SMALL).collect()
    types = {et for (et, _) in n}
    assert {g["event_type"] for g in got} == types
    total_delta = 0.0
    sum_contrib = 0.0
    for g in got:
        et = g["event_type"]
        w1 = n[(et, 1)] / nt[1]
        w2 = n[(et, 2)] / nt[2]
        r1 = float(s[(et, 1)]) / n[(et, 1)]
        r2 = float(s[(et, 2)]) / n[(et, 2)]
        assert abs(g["w1"] - round(w1, 6)) < 1e-9
        assert abs(g["w2"] - round(w2, 6)) < 1e-9
        assert abs(g["r1"] - round(r1, 6)) < 1e-9
        assert abs(g["r2"] - round(r2, 6)) < 1e-9
        assert abs(g["rate_effect"] - round(w1 * (r2 - r1), 6)) < 1e-9
        assert abs(g["mix_effect"] - round((w2 - w1) * r1, 6)) < 1e-9
        assert abs(g["interaction"] - round((w2 - w1) * (r2 - r1), 6)) < 1e-9
        # the decomposition identity, per segment
        assert (
            abs(
                g["rate_effect"]
                + g["mix_effect"]
                + g["interaction"]
                - g["total_contrib"]
            )
            < 5e-6
        )
        total_delta += w2 * r2 - w1 * r1
        sum_contrib += g["total_contrib"]
    # across segments: contributions sum to the overall metric change
    assert abs(sum_contrib - total_delta) < 5e-5
    # weights partition each period
    assert abs(sum(g["w1"] for g in got) - 1.0) < 5e-6
    assert abs(sum(g["w2"] for g in got) - 1.0) < 5e-6


def test_item_cf_replay(spark):
    rows = (
        load(spark, SF_SMALL, "events").select("user_id", "props").collect()
    )
    ui = defaultdict(int)
    for r in rows:
        item = int(json.loads(r["props"])["k"])
        ui[(r["user_id"], item)] += 1
    by_user = defaultdict(list)
    for (u, i), c in ui.items():
        by_user[u].append((i, c))
    capped = {}
    for u, items in by_user.items():
        items.sort(key=lambda ic: (-ic[1], ic[0]))
        capped[u] = dict(items[:_CF_CAP])
    sq = defaultdict(int)
    dot = defaultdict(int)
    nu = defaultdict(int)
    for u, items in capped.items():
        for i, c in items.items():
            sq[i] += c * c
        keys = sorted(items)
        for a in range(len(keys)):
            for b in range(a + 1, len(keys)):
                i, j = keys[a], keys[b]
                dot[(i, j)] += items[i] * items[j]
                nu[(i, j)] += 1
    sims = defaultdict(list)
    for (i, j), d in dot.items():
        s = d / (math.sqrt(sq[i]) * math.sqrt(sq[j]))
        sims[i].append((s, j, d, nu[(i, j)]))
    expect = {}
    for i, lst in sims.items():
        lst.sort(key=lambda t: (-t[0], t[1]))
        for rank, (s, j, d, k) in enumerate(lst[:_CF_TOPK], 1):
            expect[(i, j)] = (d, k, round(s, 6))
    got = queries()["x_item_cf"](spark, SF_SMALL).collect()
    assert len(got) == len(expect)
    for g in got:
        d, k, s = expect[(g["item"], g["neighbor"])]
        assert g["dot"] == d
        assert g["n_users"] == k
        assert abs(g["sim"] - s) < 1e-9
        assert 0.0 < g["sim"] <= 1.0
    # top-k bound per item
    per_item = defaultdict(int)
    for g in got:
        per_item[g["item"]] += 1
    assert all(v <= _CF_TOPK for v in per_item.values())
