"""JdbcSyncPipeline against the embedded Derby driver: the reference's
config-driven sync loop with its REAL sink type (SQL table over JDBC).
"""

from __future__ import annotations

import uuid

from conftest import SF_SMALL

from googleanalytics_etl_spark.etl import EXAMPLE_CONFIG, JdbcSyncPipeline
from googleanalytics_etl_spark.io import load


def _pipe(spark):
    url = f"jdbc:derby:memory:etl_{uuid.uuid4().hex[:10]};create=true"
    return JdbcSyncPipeline(
        spark=spark, config=EXAMPLE_CONFIG, target_path=url, table="hits"
    )


def test_jdbc_sync_is_incremental_and_idempotent(spark):
    pipe = _pipe(spark)
    ev = load(spark, SF_SMALL, "events")
    early = ev.where("ts < timestamp'2024-01-15 00:00:00'")

    n1 = pipe.sync(early)
    assert n1 == early.count()
    assert pipe.high_water_mark() is not None

    # full log: only the tail (plus overlap re-extract, deduped) appends
    n2 = pipe.sync(ev)
    assert n2 == ev.count() - early.count()
    assert pipe.target().count() == ev.count()

    # pure replay appends zero
    assert pipe.sync(ev) == 0
    assert pipe.target().count() == ev.count()

    # key column unique end-to-end
    tgt = pipe.target()
    assert tgt.select("hit_id").distinct().count() == ev.count()


def test_jdbc_backfill_overwrites(spark):
    pipe = _pipe(spark)
    ev = load(spark, SF_SMALL, "events")
    pipe.sync(ev.where("ts < timestamp'2024-01-10 00:00:00'"))
    n = pipe.backfill(ev)
    assert n == ev.count()
    assert pipe.target().count() == ev.count()


def test_exists_distinguishes_absent_table_from_broken_connection(spark):
    # absent table on a live DB → False (the sync-from-scratch path)
    pipe = _pipe(spark)
    assert pipe._exists() is False

    # a connection-level failure must RAISE, never read as "absent":
    # treating it as absence would disable both the HWM filter and the
    # anti-join dedup and duplicate the whole load on a transient outage
    import pytest

    broken = JdbcSyncPipeline(
        spark=spark,
        config=EXAMPLE_CONFIG,
        # no ;create=true and no such on-disk DB → connection error
        target_path="jdbc:derby:/nonexistent/dir/nope_db",
        table="hits",
    )
    with pytest.raises(Exception) as exc:
        broken._exists()
    assert "does not exist" not in str(exc.value).lower() or "database" in str(exc.value).lower()
