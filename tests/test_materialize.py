"""Cluster-safe materialization switch (SPARK_GRAFT_RELIABLE_CKPT).

Both materialization paths — block-manager localCheckpoint (default) and
reliable checkpoint() (cluster mode) — must produce identical results.
Pinned on one looped key (x_cc_sizes: iterative label propagation whose
every round is materialized) and one unrolled-recursion key
(x_mmr_rerank: per-pick materialization), per the round-12 verdict."""

from __future__ import annotations

import os

import pytest
from conftest import SF_SMALL

from googleanalytics_etl_spark.registry import queries


def _rows(spark, key):
    df = queries()[key](spark, SF_SMALL)
    cols = sorted(df.columns)
    return sorted(
        tuple(str(r[c]) for c in cols) for r in df.collect()
    )


@pytest.mark.parametrize("key", ["x_cc_sizes", "x_mmr_rerank"])
def test_reliable_ckpt_path_matches_default(spark, key):
    assert os.environ.get("SPARK_GRAFT_RELIABLE_CKPT", "0") != "1"
    base = _rows(spark, key)
    os.environ["SPARK_GRAFT_RELIABLE_CKPT"] = "1"
    try:
        reliable = _rows(spark, key)
    finally:
        del os.environ["SPARK_GRAFT_RELIABLE_CKPT"]
    assert reliable == base


def test_materialize_method_installed(spark):
    from pyspark.sql import DataFrame

    assert hasattr(DataFrame, "materialize")
    df = spark.range(3).materialize(eager=True)
    assert df.count() == 3
