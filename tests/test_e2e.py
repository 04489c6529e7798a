"""End-to-end reference workflow: paged extract → config-driven sync →
derived report tables — the full EP1'+EP3' path through one pipeline."""

from __future__ import annotations

import shutil
from pathlib import Path

import pytest
from conftest import SF_SMALL

from googleanalytics_etl_spark.etl import EXAMPLE_CONFIG, SyncPipeline
from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.reports import materialize_reports
from googleanalytics_etl_spark.sources import read_paged

SCRATCH = Path(__file__).resolve().parents[1] / ".scratch" / "test_e2e"


@pytest.fixture(autouse=True, scope="module")
def _clean():
    shutil.rmtree(SCRATCH, ignore_errors=True)
    SCRATCH.mkdir(parents=True, exist_ok=True)
    yield


def test_full_reference_workflow(spark):
    from pyspark.sql import functions as F

    # EP1': extract through the paged API source, sync incrementally
    extracted = read_paged(spark, SF_SMALL, chunks=4)
    pipe = SyncPipeline(spark, EXAMPLE_CONFIG, str(SCRATCH / "hits"))
    n = pipe.sync(extracted)
    assert n == extracted.count()
    assert pipe.sync(extracted) == 0  # idempotent re-extract

    # EP3': derived report tables from the synced target
    target = pipe.target().select(
        F.col("source_event_id").alias("event_id"),
        F.col("hit_ts").alias("ts"),
        F.col("client_id").alias("user_id"),
        F.col("hit_type").alias("event_type"),
        F.col("metric_value").alias("value"),
    )
    paths = materialize_reports(spark, target, str(SCRATCH / "reports"))

    sessions = spark.read.parquet(paths["sessions"])
    events = load(spark, SF_SMALL, "events")
    # session count matches the flagship computation on the raw fixture
    from googleanalytics_etl_spark.registry import queries

    assert sessions.count() == queries()["q_flagship"](spark, SF_SMALL).count()
    daily = spark.read.parquet(paths["daily_metrics"])
    assert daily.agg(F.sum("n")).first()[0] == events.count()
