"""Semantic tests for x_forecast_eval and x_quantile_normalize
(round-6 batch 26). test_oracle.py proves Spark == DuckDB; these
replay in python and check the defining identities: forecast metrics
recompute from the daily series (RMSE >= MAE always); quantile
normalization preserves within-source rank order and is idempotent on
the pooled distribution.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.registry import queries


def test_forecast_eval_replay(spark):
    """MAE/RMSE/sMAPE/bias match a lag-7 python replay; RMSE >= MAE."""
    rows = load(spark, SF_SMALL, "events").select("ts").collect()
    daily = Counter()
    for r in rows:
        daily[int(r["ts"].timestamp()) // 86400] += 1
    days = sorted(daily)
    errs = []
    for i, d in enumerate(days):
        if i >= 7:
            a, f = daily[d], daily[days[i - 7]]
            errs.append((a, f, a - f))
    got = queries()["x_forecast_eval"](spark, SF_SMALL).collect()[0]
    n = len(errs)
    assert got["n_days"] == n
    mae = sum(abs(e) for _, _, e in errs) / n
    rmse = math.sqrt(sum(e * e for _, _, e in errs) / n)
    smape = sum(2.0 * abs(e) / (a + f) for a, f, e in errs) / n
    bias = sum(e for _, _, e in errs) / n
    assert abs(got["mae"] - mae) < 1e-6
    assert abs(got["rmse"] - rmse) < 1e-6
    assert abs(got["smape"] - smape) < 1e-6
    assert abs(got["bias"] - bias) < 1e-6
    assert got["rmse"] >= got["mae"] - 1e-9  # Jensen
    assert 0.0 <= got["smape"] <= 2.0


def test_quantile_normalize_replay(spark):
    """Every document's mapping matches the percentile_disc replay;
    the map is monotone within source; a single-source corpus maps to
    itself (identity on the pooled distribution)."""
    docs = (
        load(spark, SF_SMALL, "documents")
        .select("doc_id", "source", "n_chars")
        .collect()
    )
    by_src = defaultdict(list)
    for r in docs:
        by_src[r["source"]].append(r["n_chars"])
    pooled = sorted(r["n_chars"] for r in docs)
    n_all = len(pooled)

    def global_at(q):
        # smallest pooled value whose CDF >= q
        import bisect

        k = math.ceil(q * n_all)
        return pooled[max(k - 1, 0)]

    got = {r["doc_id"]: r for r in
           queries()["x_quantile_normalize"](spark, SF_SMALL).collect()}
    assert len(got) == len(docs)
    for r in docs:
        xs = sorted(by_src[r["source"]])
        n_src = len(xs)
        cum = sum(1 for x in xs if x <= r["n_chars"])
        q = cum / n_src
        g = got[r["doc_id"]]
        assert g["n_chars"] == r["n_chars"]
        assert g["q"] == round(q, 6)
        assert g["norm_chars"] == global_at(q)
    # monotonicity within each source
    for src in by_src:
        pairs = sorted(
            (g["n_chars"], g["norm_chars"])
            for g in got.values()
            if g["source"] == src
        )
        for (x1, y1), (x2, y2) in zip(pairs, pairs[1:]):
            assert y1 <= y2
    # identity property: the pooled corpus seen as ONE source maps
    # every value to itself (replayed, not via the operator)
    for v in {r["n_chars"] for r in docs}:
        cum = sum(1 for x in pooled if x <= v)
        assert global_at(cum / n_all) == v
