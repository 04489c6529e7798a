"""Semantic tests for x_auc_roc and x_calibration_ece (round-6 batch
19). test_oracle.py proves Spark == DuckDB; these replay the statistics
in numpy/python and check the defining properties (pair-counting
identity for AUC, integer-evidence consistency for the reliability
table).
"""

from __future__ import annotations

from collections import defaultdict

from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.ops.round6s import _ECE_BINS, _ECE_SCALE
from googleanalytics_etl_spark.registry import queries


def _events(spark):
    return [
        (int(round(r["value"] * 100)), r["event_type"] == "purchase")
        for r in load(spark, SF_SMALL, "events")
        .select("value", "event_type")
        .collect()
    ]


def test_auc_pair_counting_identity(spark):
    """u2 equals the brute-force pair count: 2 per correctly ordered
    (pos > neg) pair, 1 per tie — the Mann-Whitney definition."""
    ev = _events(spark)
    pos = sorted(c for c, p in ev if p)
    neg = sorted(c for c, p in ev if not p)
    import bisect

    u2 = 0
    for c in pos:
        lt = bisect.bisect_left(neg, c)
        eq = bisect.bisect_right(neg, c) - lt
        u2 += 2 * lt + eq
    row = queries()["x_auc_roc"](spark, SF_SMALL).collect()[0]
    assert row["n_pos"] == len(pos) and row["n_neg"] == len(neg)
    assert row["u2"] == u2
    assert 0.0 <= row["auc"] <= 1.0
    # value barely separates purchases in the fixture: AUC near chance
    assert abs(row["auc"] - 0.5) < 0.1


def test_auc_perfect_ranker_is_one(spark):
    """Sanity on the formula itself: if every positive outranks every
    negative, u2 = 2·n⁺·n⁻ → AUC exactly 1."""
    n_pos, n_neg = 7, 13
    u2 = 2 * n_pos * n_neg
    assert u2 / (2 * n_pos * n_neg) == 1.0


def test_calibration_table_integer_evidence(spark):
    """Each bin's integer evidence matches a python replay, and the
    derived conf/acc/gap agree with single-division recomputation."""
    ev = _events(spark)
    agg = defaultdict(lambda: [0, 0, 0])  # n, n_pos, sum_pcents
    step = _ECE_SCALE // _ECE_BINS
    for cents, is_pos in ev:
        pc = min(cents, _ECE_SCALE)
        b = min(int(pc // step), _ECE_BINS - 1)
        agg[b][0] += 1
        agg[b][1] += int(is_pos)
        agg[b][2] += pc
    rows = queries()["x_calibration_ece"](spark, SF_SMALL).collect()
    assert [r["bin"] for r in rows] == sorted(agg)
    for r in rows:
        n, npos, spc = agg[r["bin"]]
        assert (r["n"], r["n_pos"], r["sum_pcents"]) == (n, npos, spc)
        conf = spc / (n * _ECE_SCALE)
        acc = npos / n
        assert abs(r["conf"] - conf) < 1e-6
        assert abs(r["acc"] - acc) < 1e-6
        assert abs(r["gap"] - abs(conf - acc)) < 1e-6
        assert 0.0 <= r["conf"] <= 1.0 and 0.0 <= r["acc"] <= 1.0


def test_calibration_bins_partition_events(spark):
    """The 10 bins partition the event set — no row lost or doubled."""
    rows = queries()["x_calibration_ece"](spark, SF_SMALL).collect()
    total = sum(r["n"] for r in rows)
    assert total == load(spark, SF_SMALL, "events").count()
