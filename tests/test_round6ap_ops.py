"""Semantic tests for x_ratio_metric_delta and x_ship_lag (round-6
batch 42). test_oracle.py proves Spark == DuckDB; these replay in
python and check the defining identities: the delta-method SE matches
the textbook residual-variance formula (and the CI brackets the
ratio); ship lags match a brute per-order walk and the quantile picks
are the exact discrete ranks.
"""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict
from decimal import Decimal

from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.registry import queries


def test_ratio_metric_delta_replay(spark):
    rows = (
        load(spark, SF_SMALL, "events").select("user_id", "value").collect()
    )
    x = defaultdict(Decimal)
    y = defaultdict(int)
    for r in rows:
        x[r["user_id"]] += Decimal(str(r["value"])).quantize(
            Decimal("0.0001")
        )
        y[r["user_id"]] += 1
    by_variant = defaultdict(list)
    for u in x:
        v = "A" if hashlib.md5(str(u).encode()).hexdigest()[0] < "8" else "B"
        by_variant[v].append((float(x[u]), y[u]))
    got = {r["variant"]: r for r in
           queries()["x_ratio_metric_delta"](spark, SF_SMALL).collect()}
    assert set(got) == set(by_variant)
    for v, pairs in by_variant.items():
        n = len(pairs)
        sx = sum(a for a, _ in pairs)
        sy = sum(b for _, b in pairs)
        r = sx / sy
        resid = [a - r * b for a, b in pairs]
        mean_resid = sum(resid) / n
        var_resid = sum((e - mean_resid) ** 2 for e in resid) / (n - 1)
        ybar = sy / n
        se = math.sqrt(var_resid / n) / ybar
        g = got[v]
        assert g["n_users"] == n
        assert abs(g["ratio"] - round(r, 6)) < 1e-6
        assert abs(g["se"] - round(se, 6)) < 1e-6
        assert abs(g["ci_lo"] - round(r - 1.96 * se, 6)) < 1e-6
        assert abs(g["ci_hi"] - round(r + 1.96 * se, 6)) < 1e-6
        assert g["ci_lo"] < g["ratio"] < g["ci_hi"]
        assert g["se"] > 0


def test_ship_lag_replay(spark):
    orders = (
        load(spark, SF_SMALL, "orders")
        .select("o_orderkey", "o_orderpriority", "o_orderdate")
        .collect()
    )
    li = (
        load(spark, SF_SMALL, "lineitem")
        .select("l_orderkey", "l_shipdate")
        .collect()
    )
    first_ship = {}
    for r in li:
        k = r["l_orderkey"]
        if k not in first_ship or r["l_shipdate"] < first_ship[k]:
            first_ship[k] = r["l_shipdate"]
    by_prio = defaultdict(list)
    for o in orders:
        if o["o_orderkey"] not in first_ship:
            continue
        lag = (
            first_ship[o["o_orderkey"]].date() - o["o_orderdate"].date()
        ).days
        by_prio[o["o_orderpriority"]].append((lag, o["o_orderkey"]))
    got = {r["o_orderpriority"]: r for r in
           queries()["x_ship_lag"](spark, SF_SMALL).collect()}
    assert set(got) == set(by_prio)
    for prio, lags in by_prio.items():
        lags.sort()
        n = len(lags)
        g = got[prio]
        assert g["n_orders"] == n
        assert abs(
            g["mean_lag"] - round(sum(v for v, _ in lags) / n, 6)
        ) < 1e-9
        assert g["p50_lag"] == lags[math.ceil(0.5 * n) - 1][0]
        assert g["p90_lag"] == lags[math.ceil(0.9 * n) - 1][0]
        neg = sum(1 for v, _ in lags if v < 0)
        assert abs(g["pct_negative"] - round(neg / n, 6)) < 1e-9
        assert g["p50_lag"] <= g["p90_lag"]
