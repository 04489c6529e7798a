"""Semantic tests for x_theil_sen and x_autocorr (round-6 batch 37).
test_oracle.py proves Spark == DuckDB; these replay in python and
check the defining identities: the Theil–Sen slope is the exact
discrete median of all pairwise slopes (and survives an injected
outlier better than OLS); the ACF matches the textbook estimator and
r(0) would be 1 by construction.
"""

from __future__ import annotations

import math
from collections import defaultdict
from datetime import datetime
from decimal import Decimal

from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.ops.round6ak import _ACF_MAXLAG
from googleanalytics_etl_spark.registry import queries


def _daily(spark):
    rows = load(spark, SF_SMALL, "events").select("ts", "value").collect()
    d = defaultdict(Decimal)
    epoch = datetime(2024, 1, 1)
    for r in rows:
        day = r["ts"].replace(hour=0, minute=0, second=0, microsecond=0)
        idx = (day - epoch).days
        d[idx] += Decimal(str(r["value"])).quantize(Decimal("0.0001"))
    return dict(sorted(d.items()))


def test_theil_sen_replay(spark):
    d = _daily(spark)
    idxs = sorted(d)
    slopes = []
    for a in range(len(idxs)):
        for b in range(a + 1, len(idxs)):
            i, j = idxs[a], idxs[b]
            slopes.append((float(d[j] - d[i]) / (j - i), i, j))
    slopes.sort()
    med = slopes[math.ceil(0.5 * len(slopes)) - 1][0]
    n = len(idxs)
    sx = sum(idxs)
    sy = sum(float(v) for v in d.values())
    sxx = sum(i * i for i in idxs)
    sxy = sum(i * float(d[i]) for i in idxs)
    ols = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    got = queries()["x_theil_sen"](spark, SF_SMALL).collect()[0]
    assert got["n_days"] == n
    assert got["n_pairs"] == len(slopes)
    assert abs(got["ts_slope"] - round(med, 6)) < 1e-6
    assert abs(got["ols_slope"] - round(ols, 6)) < 1e-6


def test_theil_sen_robustness_property():
    """On a clean linear series with ONE corrupted point, the pairwise
    median stays near the true slope while OLS is dragged — the reason
    this estimator exists (pure-python property check)."""
    n = 30
    ys = [2.0 * i for i in range(n)]
    ys[29] = 1000.0  # one high-leverage outlier at the series end
    slopes = []
    for a in range(n):
        for b in range(a + 1, n):
            slopes.append((ys[b] - ys[a]) / (b - a))
    slopes.sort()
    med = slopes[math.ceil(0.5 * len(slopes)) - 1]
    sx = sum(range(n))
    sy = sum(ys)
    sxx = sum(i * i for i in range(n))
    sxy = sum(i * y for i, y in enumerate(ys))
    ols = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert abs(med - 2.0) < 0.2
    assert abs(ols - 2.0) > 1.0


def test_autocorr_replay(spark):
    d = _daily(spark)
    idxs = sorted(d)
    vs = {i: float(v) for i, v in d.items()}
    n = len(idxs)
    m = sum(vs.values()) / n
    denom = sum((v - m) ** 2 for v in vs.values())
    got = queries()["x_autocorr"](spark, SF_SMALL).collect()
    assert [r["k"] for r in got] == list(range(1, _ACF_MAXLAG + 1))
    for g in got:
        k = g["k"]
        pairs = [(i, i + k) for i in idxs if i + k in vs]
        assert g["n_pairs"] == len(pairs)
        num = sum((vs[i] - m) * (vs[j] - m) for i, j in pairs)
        assert abs(g["acf"] - round(num / denom, 6)) < 1e-6
        assert -1.0 <= g["acf"] <= 1.0
