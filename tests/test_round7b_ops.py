"""Semantic tests for the round-7 batch 2 stats keys. test_oracle.py
proves Spark == DuckDB; these replay the definitions in python on the
collected fixture and check the textbook identities.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.registry import queries


def test_kruskal_wallis_replay_exact(spark):
    row = queries()["x_kruskal_wallis"](spark, SF_SMALL).collect()[0]
    data = [
        (r["event_type"], round(r["value"] * 100))
        for r in load(spark, SF_SMALL, "events")
        .select("event_type", "value")
        .collect()
    ]
    c_all = Counter(x for _, x in data)
    by_grp: dict[str, Counter] = defaultdict(Counter)
    for g, x in data:
        by_grp[g][x] += 1
    # 2×-unit tie-averaged rank sums per group
    cum = 0
    rank2 = {}
    for v in sorted(c_all):
        c = c_all[v]
        cum += c
        rank2[v] = 2 * cum - c + 1
    n = len(data)
    t_cum = 0.0
    for g in sorted(by_grp):  # the op's ordered fold
        r2x = sum(cg * rank2[v] for v, cg in by_grp[g].items())
        t_cum += float(r2x * r2x) / (4.0 * sum(by_grp[g].values()))
    tie3 = sum(c**3 - c for c in c_all.values())
    h = (12.0 * t_cum / (float(n) * (n + 1)) - 3.0 * (n + 1)) / (
        1.0 - float(tie3) / (float(n) * n * n - n)
    )
    assert row["k"] == len(by_grp)
    assert row["n"] == n
    assert row["tie3"] == tie3
    assert row["h_stat"] == round(h, 6)
    assert h >= 0


def test_pr_auc_replay_and_range(spark):
    row = queries()["x_pr_auc"](spark, SF_SMALL).collect()[0]
    data = [
        (round(r["value"] * 100), 1 if r["event_type"] == "purchase" else 0)
        for r in load(spark, SF_SMALL, "events")
        .select("value", "event_type")
        .collect()
    ]
    from decimal import Decimal

    dom: dict[int, list[int]] = defaultdict(lambda: [0, 0])
    for cents, pos in data:
        dom[cents][pos] += 1
    tp = fp = 0
    ap_sum = Decimal(0)
    for cents in sorted(dom, reverse=True):
        nn, np_ = dom[cents]
        tp += np_
        fp += nn
        term = float(np_) * tp / (tp + fp)
        ap_sum += Decimal(f"{term:.8f}")  # DECIMAL(18,8) quantization
    ap = float(ap_sum) / tp
    assert (row["n_pos"], row["n_neg"]) == (tp, fp)
    assert row["avg_precision"] == round(ap, 6)
    base_rate = tp / (tp + fp)
    assert base_rate * 0.2 < row["avg_precision"] <= 1.0


def test_cramers_v_range_and_marginals(spark):
    row = queries()["x_cramers_v"](spark, SF_SMALL).collect()[0]
    n = load(spark, SF_SMALL, "events").count()
    assert row["n"] == n
    assert row["nrows"] == 5 and 1 <= row["ncols"] <= 7
    assert 0.0 <= row["cramers_v"] <= 1.0
    assert row["chi2"] >= 0.0
    # V and chi2 satisfy the defining relation at 6dp
    v = math.sqrt(
        row["chi2"] / (n * min(row["nrows"] - 1, row["ncols"] - 1))
    )
    assert abs(row["cramers_v"] - v) < 1e-4


def test_js_divergence_bounded_and_symmetric_floor(spark):
    rows = queries()["x_js_divergence"](spark, SF_SMALL).collect()
    assert rows, "at least one source"
    for r in rows:
        assert 0.0 <= r["js"] <= math.log(2) + 1e-9, r
        assert r["n_vocab"] >= 1


def test_page_hinkley_is_nonneg_reset_process(spark):
    rows = sorted(
        queries()["x_page_hinkley"](spark, SF_SMALL).collect(),
        key=lambda r: r["day"],
    )
    assert rows
    for r in rows:
        assert r["ph"] >= -1e-9, "PH is U_t minus its running min — ≥ 0"
        assert r["alarm"] in (0, 1)
        assert r["alarm"] == (1 if r["ph"] > 5.0 else 0)
    # the first day's PH is exactly 0 (U_1 is its own running min)
    assert rows[0]["ph"] == 0.0
