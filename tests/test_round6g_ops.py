"""Semantic tests for s_update_counts and x_embed_dim_stats (round-6
batch 7). test_oracle.py proves Spark == DuckDB; these replay the
chunk-assignment and moment arithmetic independently.
"""

from __future__ import annotations

from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pyspark.sql.functions as F
from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.registry import queries


def _round6(x: float) -> float:
    # engines round doubles on the shortest repr, ties half-up
    return float(Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP))


# ---------------------------------------------------------------------------
# s_update_counts
# ---------------------------------------------------------------------------


def test_update_counts_changelog_replay(spark):
    rows = {
        (r["event_type"], r["day"]): r
        for r in queries()["s_update_counts"](spark, SF_SMALL).collect()
    }
    ev = (
        load(spark, SF_SMALL, "events")
        .select("event_type", F.col("ts").cast("timestamp").alias("ts"))
        .collect()
    )
    us = [int(r["ts"].timestamp() * 1_000_000) for r in ev]
    lo, hi = min(us), max(us)
    expect = defaultdict(lambda: [0, set()])
    for r, u in zip(ev, us):
        chunk = min(4, (u - lo) * 5 // (hi - lo))
        key = (r["event_type"], r["ts"].date())
        expect[key][0] += 1
        expect[key][1].add(chunk)
    assert set(rows) == set(expect)
    for key, (n, chunks) in expect.items():
        assert rows[key]["n"] == n
        assert rows[key]["n_updates"] == len(chunks)


def test_update_counts_boundary_days_update_twice(spark):
    """~3-day chunks over ~15 days: most (type, day) keys land in one
    chunk, days astride a boundary update twice — both behaviors must
    occur or the changelog is degenerate."""
    rows = queries()["s_update_counts"](spark, SF_SMALL).collect()
    ups = {r["n_updates"] for r in rows}
    assert 1 in ups and 2 in ups, ups
    # an update count can never exceed the 5 triggers
    assert max(ups) <= 5


# ---------------------------------------------------------------------------
# x_embed_dim_stats
# ---------------------------------------------------------------------------


def test_embed_dim_stats_exact_replay(spark):
    rows = {
        r["dim"]: r
        for r in queries()["x_embed_dim_stats"](spark, SF_SMALL).collect()
    }
    em = load(spark, SF_SMALL, "embeddings").select("embedding").collect()
    d = len(em[0]["embedding"])
    assert set(rows) == set(range(d))
    by_dim = defaultdict(list)
    for r in em:
        for i, v in enumerate(r["embedding"]):
            by_dim[i].append(round(float(v) * 10_000_000))
    for i, scaled in by_dim.items():
        n = len(scaled)
        mean = sum(scaled) / n / 10_000_000
        ex2 = sum(s * s for s in scaled) / n / 1e14
        r = rows[i]
        assert r["n"] == n
        assert r["mean_v"] == _round6(mean)
        assert r["var_v"] == _round6(ex2 - mean * mean)


def test_embed_dim_stats_variance_nonnegative_and_centered(spark):
    rows = queries()["x_embed_dim_stats"](spark, SF_SMALL).collect()
    for r in rows:
        assert r["var_v"] >= 0
        # random-projection-style embeddings: every dim roughly centered
        assert abs(r["mean_v"]) < 0.2
