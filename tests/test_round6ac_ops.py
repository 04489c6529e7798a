"""Semantic tests for x_target_encode and x_kfold_stats (round-6 batch
29). test_oracle.py proves Spark == DuckDB; these replay in python and
check the defining identities: the LOO encoding excludes the row's own
target and shrinks toward the global mean; the k-fold out-of-fold
stats obey the total-minus-fold identity exactly.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict
from decimal import Decimal

from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.ops.round6ac import _KF_K, _TE_M
from googleanalytics_etl_spark.registry import queries


def _q4(v: float) -> Decimal:
    return Decimal(str(v)).quantize(Decimal("0.0001"))


def test_target_encode_replay(spark):
    rows = (
        load(spark, SF_SMALL, "events")
        .select("event_id", "event_type", "value")
        .collect()
    )
    ys = {r["event_id"]: _q4(r["value"]) for r in rows}
    csum, ccnt = defaultdict(Decimal), defaultdict(int)
    for r in rows:
        csum[r["event_type"]] += ys[r["event_id"]]
        ccnt[r["event_type"]] += 1
    gsum = sum(csum.values())
    gcnt = len(rows)
    prior = float(gsum) / gcnt
    got = queries()["x_target_encode"](spark, SF_SMALL).collect()
    assert len(got) == len(rows)
    by_id = {r["event_id"]: r for r in rows}
    for g in got:
        et = by_id[g["event_id"]]["event_type"]
        y = ys[g["event_id"]]
        assert g["event_type"] == et
        assert abs(g["value_q"] - float(y)) < 1e-9
        loo = float(csum[et] - y) / (ccnt[et] - 1)
        enc = (float(csum[et] - y) + _TE_M * prior) / (ccnt[et] - 1 + _TE_M)
        assert abs(g["loo_mean"] - round(loo, 6)) < 1e-9
        assert abs(g["encoded"] - round(enc, 6)) < 1e-9
        # the encoding sits between the LOO mean and the global prior
        lo, hi = sorted((loo, prior))
        assert lo - 1e-6 <= g["encoded"] <= hi + 1e-6


def test_target_encode_excludes_own_row(spark):
    """A category's rows with different targets get DIFFERENT encodings
    — the proof the row's own label was excluded (a leaky mean would be
    constant per category)."""
    got = queries()["x_target_encode"](spark, SF_SMALL).collect()
    per_cat = defaultdict(set)
    for g in got:
        per_cat[g["event_type"]].add(g["encoded"])
    assert any(len(v) > 1 for v in per_cat.values())


def _fold(user_id: int) -> int:
    h = hashlib.md5(str(user_id).encode()).hexdigest()
    return int(h[:2], 16) % _KF_K


def test_kfold_stats_replay(spark):
    rows = (
        load(spark, SF_SMALL, "events")
        .select("user_id", "event_type", "value")
        .collect()
    )
    n = defaultdict(int)
    s = defaultdict(Decimal)
    conv = defaultdict(int)
    users = defaultdict(set)
    for r in rows:
        f = _fold(r["user_id"])
        n[f] += 1
        s[f] += _q4(r["value"])
        conv[f] += 1 if r["event_type"] == "purchase" else 0
        users[f].add(r["user_id"])
    gn, gsum, gconv = sum(n.values()), sum(s.values()), sum(conv.values())
    got = queries()["x_kfold_stats"](spark, SF_SMALL).collect()
    assert [r["fold"] for r in got] == sorted(n.keys())
    for r in got:
        f = r["fold"]
        assert r["n_users"] == len(users[f])
        assert r["n_in"] == n[f]
        assert abs(r["mean_in"] - round(float(s[f]) / n[f], 6)) < 1e-9
        assert abs(r["conv_rate_in"] - round(conv[f] / n[f], 6)) < 1e-9
        # total-minus-fold identity
        assert r["n_out"] == gn - n[f]
        assert (
            abs(r["mean_out"] - round(float(gsum - s[f]) / (gn - n[f]), 6))
            < 1e-9
        )
        assert (
            abs(r["conv_rate_out"] - round((gconv - conv[f]) / (gn - n[f]), 6))
            < 1e-9
        )
    # folds partition the events exactly
    assert sum(r["n_in"] for r in got) == len(rows)


def test_kfold_entity_coherent(spark):
    """Every user lands in exactly one fold (the leakage guarantee)."""
    got = queries()["x_kfold_stats"](spark, SF_SMALL).collect()
    e = load(spark, SF_SMALL, "events").select("user_id").distinct().collect()
    assert sum(r["n_users"] for r in got) == len(e)
