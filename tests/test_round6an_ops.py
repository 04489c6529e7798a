"""Semantic tests for x_funnel_window_sweep and x_gap_histogram
(round-6 batch 40). test_oracle.py proves Spark == DuckDB; these
replay in python and check the defining identities: sweep counts are
monotone in the window width and the 24h column reproduces
x_funnel_windowed; gap buckets match a brute log2 walk and shares sum
to one.
"""

from __future__ import annotations

from collections import defaultdict
from datetime import timedelta

from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.ops.round6an import _SWEEP_MINUTES
from googleanalytics_etl_spark.registry import queries


def _streams(spark):
    rows = (
        load(spark, SF_SMALL, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    streams = defaultdict(list)
    for r in rows:
        streams[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    for evs in streams.values():
        evs.sort()
    return streams


def test_funnel_window_sweep_replay(spark):
    streams = _streams(spark)
    got = queries()["x_funnel_window_sweep"](spark, SF_SMALL).collect()[0]
    for m in _SWEEP_MINUTES:
        win = timedelta(minutes=m)
        clickers, purchasers = set(), set()
        for u, evs in streams.items():
            for i, (ts_v, _, et) in enumerate(evs):
                if et != "view":
                    continue
                nc = min(
                    (t for t, _, e in evs[i + 1 :] if e == "click"),
                    default=None,
                )
                if nc is None or nc > ts_v + win:
                    continue
                clickers.add(u)
                np_ = min(
                    (t for t, _, e in evs if e == "purchase" and t > nc),
                    default=None,
                )
                if np_ is not None and np_ <= nc + win:
                    purchasers.add(u)
        assert got[f"click_users_{m}m"] == len(clickers)
        assert got[f"purchase_users_{m}m"] == len(purchasers)
    # monotone in window width
    for a, b in zip(_SWEEP_MINUTES, _SWEEP_MINUTES[1:]):
        assert got[f"click_users_{a}m"] <= got[f"click_users_{b}m"]
        assert got[f"purchase_users_{a}m"] <= got[f"purchase_users_{b}m"]


def test_funnel_window_sweep_24h_matches_windowed_funnel(spark):
    sweep = queries()["x_funnel_window_sweep"](spark, SF_SMALL).collect()[0]
    fixed = queries()["x_funnel_windowed"](spark, SF_SMALL).collect()[0]
    assert sweep["n_view_users"] == fixed["n_view_users"]
    assert sweep["click_users_1440m"] == fixed["n_click_users"]
    assert sweep["purchase_users_1440m"] == fixed["n_purchase_users"]


def test_gap_histogram_replay(spark):
    streams = _streams(spark)
    agg = defaultdict(lambda: [0, None, None])
    total = 0
    for evs in streams.values():
        for (ts0, _, et0), (ts1, _, _) in zip(evs, evs[1:]):
            gap_us = int((ts1 - ts0).total_seconds() * 1_000_000)
            # recompute exactly in integer microseconds
            gap_us = (ts1 - ts0) // timedelta(microseconds=1)
            bucket = max(gap_us // 1_000_000, 1).bit_length() - 1
            a = agg[(bucket, et0)]
            a[0] += 1
            a[1] = gap_us if a[1] is None else min(a[1], gap_us)
            a[2] = gap_us if a[2] is None else max(a[2], gap_us)
            total += 1
    got = queries()["x_gap_histogram"](spark, SF_SMALL).collect()
    assert len(got) == len(agg)
    share_sum = 0.0
    for g in got:
        n, lo, hi = agg[(g["bucket"], g["prev_type"])]
        assert g["n"] == n
        assert g["min_gap_us"] == lo
        assert g["max_gap_us"] == hi
        assert abs(g["share"] - round(n / total, 6)) < 1e-9
        share_sum += g["share"]
        # bucket brackets its own gaps (in whole seconds)
        assert (max(lo // 1_000_000, 1)).bit_length() - 1 == g["bucket"]
        assert (max(hi // 1_000_000, 1)).bit_length() - 1 == g["bucket"]
    assert abs(share_sum - 1.0) < 1e-4
