"""Semantic tests for x_seasonal_anomaly and x_burstiness (round-6
batch 44). test_oracle.py proves Spark == DuckDB; these replay in
python and check the defining identities: the seasonal baseline is a
leave-one-out over the same weekly slot; burstiness matches the
textbook (σ−μ)/(σ+μ) and classifies a synthetic metronome as −1.
"""

from __future__ import annotations

import math
from collections import defaultdict

from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.ops.round6ar import _SA_Z
from googleanalytics_etl_spark.registry import queries


def test_seasonal_anomaly_replay(spark):
    rows = (
        load(spark, SF_SMALL, "events").select("event_type", "ts").collect()
    )
    counts = defaultdict(int)
    for r in rows:
        hour = r["ts"].replace(minute=0, second=0, microsecond=0)
        counts[(r["event_type"], hour)] += 1
    slots = defaultdict(list)
    for (et, h), c in counts.items():
        # DuckDB/Spark dayofweek: Sunday=1..Saturday=7
        dow = (h.weekday() + 1) % 7 + 1
        slots[(et, dow, h.hour)].append(((et, h), c))
    got = queries()["x_seasonal_anomaly"](spark, SF_SMALL).collect()
    assert len(got) == len(counts)
    n_anom = 0
    for g in got:
        key = (g["event_type"], g["hour"])
        assert g["cnt"] == counts[key]
        peers = [
            c for k, c in slots[(g["event_type"], g["dow"], g["hod"])]
            if k != key
        ]
        # total-minus-self: peers of the same slot excluding this row
        assert g["base_n"] == len(peers)
        if len(peers) < 2:
            assert g["base_mean"] is None
            assert g["is_anomaly"] == 0
            continue
        n = len(peers)
        mean = sum(peers) / n
        var = max((n * sum(c * c for c in peers) - sum(peers) ** 2) / (n * n), 0.0)
        std = math.sqrt(var)
        assert abs(g["base_mean"] - round(mean, 6)) < 1e-9
        assert abs(g["base_std"] - round(std, 6)) < 1e-9
        expect = 1 if std > 0 and abs(g["cnt"] - mean) > _SA_Z * std else 0
        assert g["is_anomaly"] == expect
        n_anom += expect
    # the screen must score a meaningful share of slots (the sf0.001
    # fixture is sparse — most (type, hour) cells have < 2 same-slot
    # peers; at sf0.01+ the scored share rises with density)
    scored = sum(1 for g in got if g["base_mean"] is not None)
    assert scored > len(got) // 10


def test_burstiness_replay(spark):
    rows = (
        load(spark, SF_SMALL, "events")
        .select("user_id", "ts", "event_id")
        .collect()
    )
    streams = defaultdict(list)
    for r in rows:
        streams[r["user_id"]].append((r["ts"], r["event_id"]))
    got = {r["user_id"]: r for r in
           queries()["x_burstiness"](spark, SF_SMALL).collect()}
    from datetime import timedelta

    for u, evs in streams.items():
        evs.sort()
        gaps = [
            (b - a) // timedelta(microseconds=1)
            for (a, _), (b, _) in zip(evs, evs[1:])
        ]
        if len(gaps) < 2:
            assert u not in got
            continue
        n = len(gaps)
        mean = sum(gaps) / n
        var = max((n * sum(g * g for g in gaps) - sum(gaps) ** 2) / (n * n), 0.0)
        std = math.sqrt(var)
        g = got[u]
        assert g["n_gaps"] == n
        assert g["mean_gap_us"] == sum(gaps) // n
        assert abs(g["std_gap_s"] - round(std / 1e6, 6)) < 1e-6
        assert abs(
            g["burstiness"] - round((std - mean) / (std + mean), 6)
        ) < 1e-6
        assert -1.0 <= g["burstiness"] <= 1.0


def test_burstiness_metronome_property():
    """A perfectly regular arrival process has B = -1; a single huge
    burst drives B toward +1 (pure-python property check)."""
    metronome = [60] * 50
    n = len(metronome)
    mean = sum(metronome) / n
    var = (n * sum(g * g for g in metronome) - sum(metronome) ** 2) / (n * n)
    std = math.sqrt(max(var, 0.0))
    assert (std - mean) / (std + mean) == -1.0
    bursty = [1] * 50 + [100000]
    n = len(bursty)
    mean = sum(bursty) / n
    var = (n * sum(g * g for g in bursty) - sum(bursty) ** 2) / (n * n)
    std = math.sqrt(var)
    assert (std - mean) / (std + mean) > 0.7
