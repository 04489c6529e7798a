"""Semantic tests for x_weighted_percentile and x_active_streaks
(round-6 batch 41). test_oracle.py proves Spark == DuckDB; these
replay in python and check the defining identities: the weighted
quantile is the first cumulative-weight crossing (and equals the
unweighted quantile when all weights are equal, checked as a pure
property); streaks match a brute consecutive-day walk.
"""

from __future__ import annotations

from collections import defaultdict
from decimal import Decimal

from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.registry import queries


def test_weighted_percentile_replay(spark):
    rows = (
        load(spark, SF_SMALL, "lineitem")
        .select(
            "l_returnflag",
            "l_extendedprice",
            "l_quantity",
            "l_orderkey",
            "l_linenumber",
        )
        .collect()
    )
    groups = defaultdict(list)
    for r in rows:
        groups[r["l_returnflag"]].append(
            (
                r["l_extendedprice"],
                r["l_orderkey"],
                r["l_linenumber"],
                Decimal(str(r["l_quantity"])).quantize(Decimal("0.0001")),
            )
        )
    got = {r["l_returnflag"]: r for r in
           queries()["x_weighted_percentile"](spark, SF_SMALL).collect()}
    assert set(got) == set(groups)
    for flag, items in groups.items():
        items.sort(key=lambda t: (t[0], t[1], t[2]))
        tot = sum(w for *_, w in items)
        cum = Decimal(0)
        p50 = p90 = None
        for v, _, _, w in items:
            cum += w
            if p50 is None and 2 * cum >= tot:
                p50 = v
            if p90 is None and 10 * cum >= 9 * tot:
                p90 = v
        g = got[flag]
        assert g["n"] == len(items)
        assert abs(g["total_w"] - float(tot)) < 1e-6
        assert g["w_p50"] == p50
        assert g["w_p90"] == p90
        assert g["w_p50"] <= g["w_p90"]


def test_weighted_percentile_equal_weights_property():
    """With all weights equal, the weighted median reduces to the
    ordinary discrete median — the sanity identity (pure python)."""
    vals = [3.0, 1.0, 5.0, 9.0, 7.0]
    items = sorted((v, i) for i, v in enumerate(vals))
    tot = len(items)
    cum = 0
    for v, _ in items:
        cum += 1
        if 2 * cum >= tot:
            assert v == 5.0  # median of {1,3,5,7,9}
            break


def test_active_streaks_replay(spark):
    rows = load(spark, SF_SMALL, "events").select("user_id", "ts").collect()
    days = defaultdict(set)
    for r in rows:
        days[r["user_id"]].add(
            (r["ts"].date() - __import__("datetime").date(2024, 1, 1)).days
        )
    got = {r["user_id"]: r for r in
           queries()["x_active_streaks"](spark, SF_SMALL).collect()}
    assert set(got) == set(days)
    for u, ds in days.items():
        ordered = sorted(ds)
        streaks = []
        cur = 1
        for a, b in zip(ordered, ordered[1:]):
            if b == a + 1:
                cur += 1
            else:
                streaks.append(cur)
                cur = 1
        streaks.append(cur)
        g = got[u]
        assert g["active_days"] == len(ds)
        assert g["n_streaks"] == len(streaks)
        assert g["longest_streak"] == max(streaks)
        assert g["last_streak"] == streaks[-1]
        # identities
        assert g["longest_streak"] <= g["active_days"]
        assert g["last_streak"] <= g["longest_streak"]
        assert sum(streaks) == g["active_days"]
