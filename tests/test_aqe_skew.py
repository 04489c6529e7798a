"""AQE skew-join: Spark's RUNTIME answer to hot keys (skew.py's salting
is the planner-level answer for known-pathological keys). A synthetic
hot-key join is forced onto the sort-merge path with tiny skew
thresholds; AQE must split the oversized partition (``skew=true`` reads
in the final adaptive plan) without changing a single output row."""

from __future__ import annotations

import pyspark.sql.functions as F


def _final_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_aqe_splits_skewed_join_partition(spark):
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        # a downstream agg keyed on the JOIN key would inherit the
        # join's partitioning, and AQE refuses a split that invalidates
        # a reused partitioning unless forced
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # hot key 0 carries 200k rows with fat payload; 99 uniform keys
        hot = spark.range(200_000).select(
            F.lit(0).alias("k"),
            F.col("id").alias("v"),
            F.repeat(F.lit("x"), 200).alias("pad"),
        )
        cold = spark.range(20_000).select(
            (F.col("id") % 99 + 1).alias("k"),
            F.col("id").alias("v"),
            F.repeat(F.lit("x"), 200).alias("pad"),
        )
        fact = hot.unionByName(cold)
        dim = spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("w")
        )
        # aggregate on a key DERIVED from the probe row (not the join
        # key): the post-join exchange re-hashes anyway, so the skew
        # split costs nothing extra — the shape where AQE's split is
        # purely a win
        joined = fact.join(dim, "k").groupBy((F.col("v") % 7).alias("g")).agg(
            F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw")
        )
        rows = {r["g"]: (r["n"], r["sw"]) for r in joined.collect()}
        plan = _final_plan(joined)
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    # correctness: every joined row lands in exactly one g bucket
    assert sum(n for n, _sw in rows.values()) == 220_000
    # hot-key mass: key 0 contributes w=0; cold keys contribute k*10 per
    # row — total Σw is invariant under the split
    total_sw = sum(sw for _n, sw in rows.values())
    cold_per_key = {k: 0 for k in range(1, 100)}
    for i in range(20_000):
        cold_per_key[i % 99 + 1] += 1
    assert total_sw == sum(n * k * 10 for k, n in cold_per_key.items())
    # the final adaptive plan actually split the skewed partition
    assert "skew=true" in plan, plan[:2000]


def test_skew_split_preserves_aggregate_totals(spark):
    # same join WITHOUT the forcing configs (AQE defaults): totals match
    hot = spark.range(200_000).select(F.lit(0).alias("k"), F.col("id").alias("v"))
    cold = spark.range(20_000).select((F.col("id") % 99 + 1).alias("k"), F.col("id").alias("v"))
    fact = hot.unionByName(cold)
    dim = spark.range(100).select(F.col("id").alias("k"), (F.col("id") * 10).alias("w"))
    total = fact.join(dim, "k").count()
    assert total == 220_000
