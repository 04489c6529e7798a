"""Semantic tests for x_bootstrap_ci and x_dataset_diff (round-6
batch 11). test_oracle.py proves Spark == DuckDB; these replay the
Poisson draws and the snapshot diff in pure Python (hashlib md5).
"""

from __future__ import annotations

import hashlib
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.ops.round6k import _B, _POIS_CDF
from googleanalytics_etl_spark.registry import queries


def _round6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP))


# ---------------------------------------------------------------------------
# x_bootstrap_ci
# ---------------------------------------------------------------------------


def _pois_w(b: int, eid: str) -> int:
    h = hashlib.md5(f"boot|{b}|{eid}".encode()).hexdigest()
    u = (int(h[:4], 16) + 0.5) / 65536.0
    for k, t in enumerate(_POIS_CDF):
        if u < t:
            return k
    return 5


def test_bootstrap_ci_exact_replay(spark):
    row = queries()["x_bootstrap_ci"](spark, SF_SMALL).collect()[0]
    ev = (
        load(spark, SF_SMALL, "events")
        .where("event_type = 'purchase'")
        .select("event_id", "value")
        .collect()
    )
    cents = [(str(r["event_id"]), round(float(r["value"]) * 100)) for r in ev]
    base = sum(c for _, c in cents) / len(cents) / 100
    means = []
    for b in range(_B):
        sw = swc = 0
        for eid, c in cents:
            w = _pois_w(b, eid)
            sw += w
            swc += w * c
        means.append(swc / sw / 100)
    means.sort()
    assert row["n_purchases"] == len(cents)
    assert row["base_mean"] == _round6(base)
    assert row["boot_lo"] == _round6(means[0])
    assert row["boot_median"] == _round6(means[_B // 2 - 1])
    assert row["boot_hi"] == _round6(means[-1])


def test_bootstrap_ci_envelope_sane(spark):
    row = queries()["x_bootstrap_ci"](spark, SF_SMALL).collect()[0]
    assert row["boot_lo"] <= row["boot_median"] <= row["boot_hi"]
    # the point estimate sits inside the bootstrap envelope and the
    # envelope is non-degenerate (weights actually vary)
    assert row["boot_lo"] <= row["base_mean"] <= row["boot_hi"]
    assert row["boot_hi"] > row["boot_lo"]


def test_poisson_thresholds_are_cdf():
    # ladder sanity: strictly increasing, CDF of Poisson(1)
    assert all(a < b for a, b in zip(_POIS_CDF, _POIS_CDF[1:]))
    assert abs(_POIS_CDF[0] - 0.36787944117144233) < 1e-15
    assert _POIS_CDF[-1] > 0.996


# ---------------------------------------------------------------------------
# x_dataset_diff
# ---------------------------------------------------------------------------


def test_dataset_diff_exact_replay(spark):
    rows = {
        r["source"]: r
        for r in queries()["x_dataset_diff"](spark, SF_SMALL).collect()
    }
    docs = load(spark, SF_SMALL, "documents").collect()
    a = {r["doc_id"]: (r["source"], r["text"]) for r in docs}
    b = {}
    for r in docs:
        if r["doc_id"] % 10 != 0:
            t = r["text"] + " v2" if r["doc_id"] % 17 == 3 else r["text"]
            b[r["doc_id"]] = (r["source"], t)
        if r["doc_id"] < 5:
            b[r["doc_id"] + 2_000_000] = (r["source"], r["text"])
    tally = defaultdict(lambda: [0, 0, 0, 0])  # add, rm, chg, same
    for i in set(a) | set(b):
        if i not in a:
            tally[b[i][0]][0] += 1
        elif i not in b:
            tally[a[i][0]][1] += 1
        elif a[i][1] != b[i][1]:
            tally[a[i][0]][2] += 1
        else:
            tally[a[i][0]][3] += 1
    assert set(rows) == set(tally)
    for src, (n_add, n_rm, n_chg, n_same) in tally.items():
        r = rows[src]
        assert (
            r["n_added"],
            r["n_removed"],
            r["n_changed"],
            r["n_unchanged"],
        ) == (n_add, n_rm, n_chg, n_same)


def test_dataset_diff_all_classes_and_conservation(spark):
    rows = queries()["x_dataset_diff"](spark, SF_SMALL).collect()
    tot = {
        k: sum(r[k] for r in rows)
        for k in ("n_added", "n_removed", "n_changed", "n_unchanged")
    }
    n_a = load(spark, SF_SMALL, "documents").count()
    # every diff class is populated by construction
    assert all(v > 0 for v in tot.values()), tot
    # A-side conservation: removed + changed + unchanged = |A|
    assert tot["n_removed"] + tot["n_changed"] + tot["n_unchanged"] == n_a
    assert tot["n_added"] == 5
