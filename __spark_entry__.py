"""Driver contract for the spark-graft builder (PySpark target).

Thin views over :mod:`googleanalytics_etl_spark.registry` — every
operator from SURVEY.md §2 registers its DataFrame builder and DuckDB
oracle SQL there, so this file never changes as coverage grows.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from googleanalytics_etl_spark import registry as _registry  # noqa: E402
from googleanalytics_etl_spark.ops.flagship import q_flagship  # noqa: E402

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Sessionize the event log (30-min gap, per user) and compute
    per-session metrics — the reference's hit-log → sessions → metrics
    pipeline (SURVEY.md §2 "Flagship query").
    """
    return q_flagship(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per key (omitted → rows-only check)."""
    return _registry.oracle_sql()
