"""Semantic tests for x_basket_lift and x_mutual_info (round-6 batch
21). test_oracle.py proves Spark == DuckDB; these replay the statistics
in python and check the defining identities (support/confidence/lift
consistency; MI bounds and independence-limit behavior).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.ops.round6u import _BASKET_MIN_PAIRS
from googleanalytics_etl_spark.registry import queries


def _baskets(spark):
    li = (
        load(spark, SF_SMALL, "lineitem")
        .select("l_orderkey", "l_partkey")
        .collect()
    )
    brand = {
        r["p_partkey"]: r["p_brand"]
        for r in load(spark, SF_SMALL, "part")
        .select("p_partkey", "p_brand")
        .collect()
    }
    b = defaultdict(set)
    for r in li:
        b[r["l_orderkey"]].add(brand[r["l_partkey"]])
    return b


def test_basket_lift_replay(spark):
    """Pair/item/basket counts match a brute-force replay, and every
    derived ratio recomputes from its own row's integer evidence."""
    baskets = _baskets(spark)
    n = len(baskets)
    item_cnt = Counter()
    pair_cnt = Counter()
    for items in baskets.values():
        for it in items:
            item_cnt[it] += 1
        s = sorted(items)
        for i, a in enumerate(s):
            for b in s[i + 1 :]:
                pair_cnt[(a, b)] += 1
    expect = {
        k: v for k, v in pair_cnt.items() if v >= _BASKET_MIN_PAIRS
    }
    rows = queries()["x_basket_lift"](spark, SF_SMALL).collect()
    assert {(r["item_a"], r["item_b"]) for r in rows} == set(expect)
    for r in rows:
        k = (r["item_a"], r["item_b"])
        assert r["cnt_ab"] == expect[k]
        assert r["cnt_a"] == item_cnt[r["item_a"]]
        assert r["cnt_b"] == item_cnt[r["item_b"]]
        assert r["n_baskets"] == n
        assert abs(r["support"] - r["cnt_ab"] / n) < 1e-6
        assert abs(r["confidence"] - r["cnt_ab"] / r["cnt_a"]) < 1e-6
        assert (
            abs(r["lift"] - r["cnt_ab"] * n / (r["cnt_a"] * r["cnt_b"]))
            < 1e-6
        )
        assert r["confidence"] <= 1.0 and r["support"] <= 1.0


def test_basket_pairs_canonical_and_bounded(spark):
    """Pairs are emitted once in (a < b) canonical order, and the pair
    space is bounded by the brand-domain square."""
    rows = queries()["x_basket_lift"](spark, SF_SMALL).collect()
    assert all(r["item_a"] < r["item_b"] for r in rows)
    brands = {r["item_a"] for r in rows} | {r["item_b"] for r in rows}
    assert len(rows) <= len(brands) * (len(brands) - 1) // 2


def test_mutual_info_replay_and_bounds(spark):
    """MI and entropies match a quantized-term replay; MI is
    non-negative and bounded by both marginal entropies."""
    base = (
        load(spark, SF_SMALL, "customer")
        .select("c_mktsegment", "c_nationkey")
        .collect()
    )
    nat = {
        r["n_nationkey"]: r["n_name"]
        for r in load(spark, SF_SMALL, "nation").collect()
    }
    cells = Counter(
        (r["c_mktsegment"], nat[r["c_nationkey"]]) for r in base
    )
    n = sum(cells.values())
    nx = Counter()
    ny = Counter()
    for (s, t), c in cells.items():
        nx[s] += c
        ny[t] += c
    mi = sum(
        round((c / n) * math.log(c * n / (nx[s] * ny[t])), 8)
        for (s, t), c in cells.items()
    )
    hx = sum(round(-(v / n) * math.log(v / n), 8) for v in nx.values())
    hy = sum(round(-(v / n) * math.log(v / n), 8) for v in ny.values())
    row = queries()["x_mutual_info"](spark, SF_SMALL).collect()[0]
    assert row["n"] == n and row["n_cells"] == len(cells)
    assert abs(row["mi_nats"] - mi) < 2e-6
    assert abs(row["h_seg"] - hx) < 2e-6
    assert abs(row["h_nat"] - hy) < 2e-6
    # information-theoretic bounds (small slack for quantization)
    assert row["mi_nats"] >= -1e-6
    assert row["mi_nats"] <= min(row["h_seg"], row["h_nat"]) + 1e-6
