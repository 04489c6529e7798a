"""JSON / CSV ingestion (SURVEY.md §2.A "JSON/CSV ingest").

The reference flattens semi-structured API JSON into typed rows
[REF-UNVERIFIED]; the Spark form is a schema-declared ``spark.read`` —
never ``inferSchema`` in production (a full extra pass over 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

EVENTS_JSON_SCHEMA = (
    "event_id bigint, ts timestamp_ntz, user_id bigint, "
    "event_type string, value double, props string"
)


def read_json(spark: SparkSession, path: str, schema: str = EVENTS_JSON_SCHEMA) -> DataFrame:
    """Schema-declared JSON-lines ingest (no inference pass)."""
    return spark.read.schema(schema).json(path)


def read_csv(
    spark: SparkSession, path: str, schema: str = EVENTS_JSON_SCHEMA, header: bool = True
) -> DataFrame:
    """Schema-declared CSV ingest."""
    return spark.read.schema(schema).option("header", str(header).lower()).csv(path)
