"""Semantic tests for x_ks_test and x_welch_ttest (round-6 batch 22).
test_oracle.py proves Spark == DuckDB; these replay the statistics in
python (scipy-free, brute-force ECDF / textbook Welch) and check the
defining identities: KS bounds and the exact-integer numerator; Welch
t sign/symmetry and the df bracketing min(n1,n2)-1 ≤ df ≤ n1+n2-2.
"""

from __future__ import annotations

import math
from collections import defaultdict

from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.registry import queries


def test_ks_replay(spark):
    """d_num / d_stat match a brute-force two-sample ECDF sweep for
    every source, and 0 <= D <= 1."""
    rows = (
        load(spark, SF_SMALL, "documents")
        .select("source", "n_chars")
        .collect()
    )
    by_src = defaultdict(list)
    for r in rows:
        by_src[r["source"]].append(r["n_chars"])
    allv = sorted({r["n_chars"] for r in rows})
    n_all = len(rows)
    got = {r["source"]: r for r in queries()["x_ks_test"](spark, SF_SMALL).collect()}
    assert set(got) == set(by_src)
    for src, xs in by_src.items():
        n1 = len(xs)
        n2 = n_all - n1
        rest = [r["n_chars"] for r in rows if r["source"] != src]
        best = 0
        for v in allv:
            c1 = sum(1 for x in xs if x <= v)
            c2 = sum(1 for x in rest if x <= v)
            best = max(best, abs(c1 * n2 - c2 * n1))
        g = got[src]
        assert g["n_src"] == n1 and g["n_rest"] == n2
        assert g["d_num"] == best
        assert g["d_stat"] == round(best / (n1 * n2), 6)
        assert 0.0 <= g["d_stat"] <= 1.0


def test_welch_replay(spark):
    """Means/variances match a cents-exact textbook replay; t has the
    sign of the mean difference; Welch df is bracketed by the classic
    bounds min(n1,n2)-1 <= df <= n1+n2-2."""
    rows = (
        load(spark, SF_SMALL, "orders")
        .select("o_orderpriority", "o_totalprice")
        .collect()
    )
    cents = defaultdict(list)
    for r in rows:
        cents[r["o_orderpriority"]].append(round(r["o_totalprice"] * 100))
    n_all = sum(len(v) for v in cents.values())
    s_all = sum(sum(v) for v in cents.values())
    ss_all = sum(sum(x * x for x in v) for v in cents.values())
    got = {
        r["grp"]: r
        for r in queries()["x_welch_ttest"](spark, SF_SMALL).collect()
    }
    assert set(got) == set(cents)
    for grp, xs in cents.items():
        n1, n2 = len(xs), n_all - len(xs)
        s1, ss1 = sum(xs), sum(x * x for x in xs)
        s2, ss2 = s_all - s1, ss_all - ss1
        m1 = s1 / (n1 * 100.0)
        m2 = s2 / (n2 * 100.0)
        v1 = (n1 * ss1 - s1 * s1) / (n1 * (n1 - 1) * 10000.0)
        v2 = (n2 * ss2 - s2 * s2) / (n2 * (n2 - 1) * 10000.0)
        g = got[grp]
        assert g["n"] == n1 and g["n_rest"] == n2
        assert g["mean_grp"] == round(m1, 6)
        assert g["mean_rest"] == round(m2, 6)
        assert abs(g["var_grp"] - v1) <= 1e-4 + 1e-9 * abs(v1)
        assert abs(g["var_rest"] - v2) <= 1e-4 + 1e-9 * abs(v2)
        se2 = v1 / n1 + v2 / n2
        t = (m1 - m2) / math.sqrt(se2)
        assert abs(g["t_stat"] - t) < 1e-5
        assert (g["t_stat"] >= 0) == (m1 >= m2)
        df = se2 * se2 / (
            (v1 / n1) ** 2 / (n1 - 1) + (v2 / n2) ** 2 / (n2 - 1)
        )
        assert abs(g["df_welch"] - df) < max(1e-4, 1e-9 * df)
        assert min(n1, n2) - 1 <= g["df_welch"] <= n1 + n2 - 2


def test_ks_identical_sample_is_zero(spark):
    """KS of a sample against itself is exactly zero — build a frame
    where one 'source' IS the pooled rest (two copies), D must be 0."""
    import pyspark.sql.functions as F

    d = load(spark, SF_SMALL, "documents").select("n_chars")
    two = d.withColumn("source", F.lit("a")).unionByName(
        d.withColumn("source", F.lit("b"))
    )
    two.createOrReplaceTempView("_ks_two")
    # replicate the operator's core on the synthetic frame
    from pyspark.sql import Window

    cnts = two.groupBy("source", "n_chars").count()
    vcum = (
        two.groupBy("n_chars")
        .agg(F.count(F.lit(1)).alias("c_all"))
        .withColumn(
            "cum_all", F.sum("c_all").over(Window.orderBy("n_chars"))
        )
    )
    srcs = two.groupBy("source").agg(F.count(F.lit(1)).alias("n_src"))
    n_all = two.count()
    grid = (
        srcs.crossJoin(vcum.select("n_chars", "cum_all"))
        .join(cnts, ["source", "n_chars"], "left")
        .fillna(0, ["count"])
        .withColumn(
            "cum_src",
            F.sum("count").over(
                Window.partitionBy("source").orderBy("n_chars")
            ),
        )
    )
    mx = (
        grid.select(
            F.abs(
                F.col("cum_src") * (F.lit(n_all) - F.col("n_src"))
                - (F.col("cum_all") - F.col("cum_src")) * F.col("n_src")
            ).alias("d")
        )
        .agg(F.max("d"))
        .collect()[0][0]
    )
    assert mx == 0
