"""Semantic tests for round-7 batch 3 (relational Bloom FPR, relational
HLL, closed-form multi-feature OLS). test_oracle.py proves Spark ==
DuckDB; these check the structural guarantees and replay the math.
"""

from __future__ import annotations

import hashlib
import math

from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.registry import queries


def test_bloom_fpr_guarantees(spark):
    row = queries()["x_bloom_fpr"](spark, SF_SMALL).collect()[0]
    assert row["no_false_neg"] == 1, "a Bloom filter never misses a member"
    assert row["in_bound"] == 1
    assert 0 <= row["measured_fpr"] <= 1
    assert 0 < row["theoretical_fpr"] < 1
    assert 0 < row["bits_set"] <= 16384
    # fill consistency: bits_set ≤ k·n_hist (dedup only reduces)
    assert row["bits_set"] <= 4 * row["n_hist"]


def test_hll_relational_replay(spark):
    row = queries()["x_hll_relational"](spark, SF_SMALL).collect()[0]
    users = [
        r["user_id"]
        for r in load(spark, SF_SMALL, "events")
        .select("user_id")
        .distinct()
        .collect()
    ]
    m = 512
    regs = [0] * m
    for u in sorted(users):
        hv = int(hashlib.md5(f"hll:{u}".encode()).hexdigest()[:15], 16)
        reg, w = hv % m, hv // m
        if w == 0:
            r = 52
        else:
            r = 51 - w.bit_length() + 1  # 51 - msb_index
        regs[reg] = max(regs[reg], r)
    from decimal import Decimal

    z = sum(Decimal(f"{2.0 ** (-mj):.22f}") for mj in regs)
    v0 = sum(1 for mj in regs if mj == 0)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = alpha * m * m / float(z)
    if raw <= 2.5 * m and v0 > 0:
        raw = m * math.log(m / v0)
    assert row["m"] == m
    assert row["n_exact"] == len(users)
    assert row["v0"] == v0
    assert row["est"] == round(raw, 2)
    assert row["in_bound"] == 1
    assert row["rel_err"] <= 3.0 * 1.04 / math.sqrt(m)


def test_ols_multi_replay_and_fit(spark):
    row = queries()["x_ols_multi"](spark, SF_SMALL).collect()[0]
    data = [
        (
            int(r["l_quantity"]),
            round(r["l_discount"] * 100),
            round(r["l_extendedprice"] * 100),
        )
        for r in load(spark, SF_SMALL, "lineitem")
        .select("l_quantity", "l_discount", "l_extendedprice")
        .collect()
    ]
    n = len(data)
    s1 = float(sum(x1 for x1, _, _ in data))
    s2 = float(sum(x2 for _, x2, _ in data))
    sy = float(sum(y for _, _, y in data))
    s11 = float(sum(x1 * x1 for x1, _, _ in data))
    s12 = float(sum(x1 * x2 for x1, x2, _ in data))
    s22 = float(sum(x2 * x2 for _, x2, _ in data))
    s1y = float(sum(x1 * y for x1, _, y in data))
    s2y = float(sum(x2 * y for _, x2, y in data))
    syy = float(sum(y * y for _, _, y in data))
    nn = float(n)
    dd = (
        nn * (s11 * s22 - s12 * s12)
        - s1 * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s12 - s11 * s2)
    )
    b0 = (
        sy * (s11 * s22 - s12 * s12)
        - s1 * (s1y * s22 - s12 * s2y)
        + s2 * (s1y * s12 - s11 * s2y)
    ) / dd
    b1 = (
        nn * (s1y * s22 - s12 * s2y)
        - sy * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s2y - s1y * s2)
    ) / dd
    b2 = (
        nn * (s11 * s2y - s1y * s12)
        - s1 * (s1 * s2y - s1y * s2)
        + sy * (s1 * s12 - s11 * s2)
    ) / dd
    sse = syy - b0 * sy - b1 * s1y - b2 * s2y
    sst = syy - sy * sy / nn
    assert row["n_rows"] == n
    assert row["b0"] == round(b0 / 100.0, 6)
    assert row["b1"] == round(b1 / 100.0, 6)
    assert row["b2"] == round(b2 / 10000.0, 6)
    assert row["r2"] == round(1.0 - sse / sst, 6)
    # structural invariants (the synthetic fixture draws price
    # independently of quantity, so the fit is weak by construction —
    # the exact replay above is the real check)
    assert 0.0 <= row["r2"] <= 1.0
    assert math.isfinite(row["b0"]) and math.isfinite(row["b1"])
