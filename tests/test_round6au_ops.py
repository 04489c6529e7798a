"""Semantic tests for x_runs_test and x_abc_class (round-6 batch 47).
test_oracle.py proves Spark == DuckDB; these replay in python and
check the defining identities: runs statistics match a brute walk of
the above/below-median sign sequence (and a synthetic alternating
series scores maximally many runs); ABC classes match the exact
cumulative-share cuts and partition the catalog.
"""

from __future__ import annotations

import math
from collections import defaultdict
from decimal import Decimal

from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.registry import queries


def test_runs_test_replay(spark):
    rows = load(spark, SF_SMALL, "events").select("ts", "value").collect()
    d = defaultdict(Decimal)
    for r in rows:
        day = r["ts"].replace(hour=0, minute=0, second=0, microsecond=0)
        d[day] += Decimal(str(r["value"])).quantize(Decimal("0.0001"))
    items = sorted(d.items(), key=lambda kv: (kv[1], kv[0]))
    med = items[math.ceil(0.5 * len(items)) - 1][1]
    seq = [
        (day, 1 if v > med else 0)
        for day, v in sorted(d.items())
        if v != med
    ]
    r_count = 1 + sum(1 for a, b in zip(seq, seq[1:]) if a[1] != b[1])
    n1 = sum(s for _, s in seq)
    n2 = len(seq) - n1
    exp_r = 1.0 + 2.0 * n1 * n2 / (n1 + n2)
    var_r = (
        2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
        / ((n1 + n2) ** 2 * (n1 + n2 - 1))
    )
    got = queries()["x_runs_test"](spark, SF_SMALL).collect()[0]
    assert got["n_days_used"] == len(seq)
    assert got["n_above"] == n1
    assert got["n_below"] == n2
    assert got["runs"] == r_count
    assert abs(got["expected_runs"] - round(exp_r, 6)) < 1e-9
    assert abs(
        got["z"] - round((r_count - exp_r) / math.sqrt(var_r), 6)
    ) < 1e-6
    # runs count is bounded by the sequence structure
    assert 1 <= got["runs"] <= got["n_days_used"]


def test_runs_test_alternating_property():
    """A perfectly alternating sequence has the maximum number of runs
    (z strongly positive); a sorted sequence has 2 runs (z strongly
    negative) — pure-python property pin of the statistic."""
    for seq, expect_sign in [([0, 1] * 15, 1), ([0] * 15 + [1] * 15, -1)]:
        r = 1 + sum(1 for a, b in zip(seq, seq[1:]) if a != b)
        n1 = sum(seq)
        n2 = len(seq) - n1
        exp_r = 1.0 + 2.0 * n1 * n2 / (n1 + n2)
        var_r = (
            2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
            / ((n1 + n2) ** 2 * (n1 + n2 - 1))
        )
        z = (r - exp_r) / math.sqrt(var_r)
        assert z * expect_sign > 2


def test_abc_class_replay(spark):
    rows = (
        load(spark, SF_SMALL, "lineitem")
        .select("l_partkey", "l_extendedprice")
        .collect()
    )
    rev = defaultdict(Decimal)
    for r in rows:
        rev[r["l_partkey"]] += Decimal(str(r["l_extendedprice"])).quantize(
            Decimal("0.0001")
        )
    ranked = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))
    tot = sum(rev.values())
    cum = Decimal(0)
    agg = defaultdict(lambda: [0, Decimal(0)])
    for part, v in ranked:
        cum += v
        if 5 * cum <= 4 * tot:
            c = "A"
        elif 20 * cum <= 19 * tot:
            c = "B"
        else:
            c = "C"
        agg[c][0] += 1
        agg[c][1] += v
    got = {g["abc"]: g for g in queries()["x_abc_class"](spark, SF_SMALL).collect()}
    assert set(got) == set(agg)
    for c, (n, v) in agg.items():
        assert got[c]["n_parts"] == n
        assert abs(got[c]["revenue"] - float(v)) < 1e-6
        assert abs(got[c]["revenue_share"] - round(float(v / tot), 6)) < 1e-6
    # classes partition the catalog (NOTE: the fixture's per-part
    # revenue is near-uniform, so class A holds ~80% of parts here —
    # the Pareto "few As" shape is a data property, not an op property)
    assert sum(g["n_parts"] for g in got.values()) == len(rev)
    assert abs(sum(g["revenue_share"] for g in got.values()) - 1.0) < 5e-6
    # class revenue shares respect the cut points by construction
    if "A" in got:
        assert got["A"]["revenue_share"] <= 0.8 + 1e-6
    if "C" in got:
        assert got["C"]["revenue_share"] >= 0.05 - 1e-6
