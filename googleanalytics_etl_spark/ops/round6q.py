"""Round-6 batch 17: the Spark 4 SQL-language API surface.

- ``q_sql_udf`` — SQL-defined functions (CREATE TEMPORARY FUNCTION …
  RETURN): a scalar UDF (value banding + exact cents) and a TABLE
  function (an inline sequence generator) used in one query. SQL UDFs
  are the zero-Python extension path: the body inlines into the
  Catalyst plan at resolution time, so they codegen exactly like
  hand-written expressions — the preferred way to share business
  logic (the reference ships it as Python helpers [REF-UNVERIFIED]).
- ``q_sql_params`` — parameterized ``spark.sql`` (named ``:param``
  markers + DataFrame template args): the injection-safe query API a
  config-driven pipeline calls instead of f-string SQL.

Reference parity: EP1'/EP2' config-driven shaping [REF-UNVERIFIED —
/root/reference is empty]; SURVEY §2.G/§2.I surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (parity with siblings)

from ..io import load
from ..registry import register

_SQL_UDF_ORACLE = """
WITH banded AS (
    SELECT CASE WHEN value < 1 THEN 'micro'
                WHEN value < 50 THEN 'small'
                ELSE 'large' END AS band,
           CAST(ROUND(value * 100) AS BIGINT) AS cents
    FROM events
), spine AS (
    SELECT unnest(range(1, 4)) AS bucket_id
)
SELECT s.bucket_id, b.band,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(b.cents) AS BIGINT) AS cents
FROM banded b
JOIN spine s
  ON s.bucket_id = CASE b.band WHEN 'micro' THEN 1
                               WHEN 'small' THEN 2 ELSE 3 END
GROUP BY s.bucket_id, b.band
"""


@register("q_sql_udf", oracle=_SQL_UDF_ORACLE)
def q_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined functions end-to-end: a scalar ``value_band`` UDF
    (CASE banding), a scalar ``exact_cents`` UDF (the engine's exact
    integer-cents convention), and a TABLE function ``band_spine``
    generating the bucket spine — all declared in SQL, all used in one
    aggregation query joining the spine to the banded events.

    Scale shape: SQL UDF bodies INLINE into the plan at analysis time —
    the executed plan is identical to writing the CASE/ROUND
    expressions by hand (whole-stage codegen, no function-call
    overhead, no Python). The table function materializes 3 rows. This
    is the extension mechanism that keeps shared business logic out of
    Python UDFs at 100 TB.
    """
    load(spark, sf_dir, "events").createOrReplaceTempView("ev_sqludf")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION value_band(v DOUBLE) "
        "RETURNS STRING RETURN CASE WHEN v < 1 THEN 'micro' "
        "WHEN v < 50 THEN 'small' ELSE 'large' END"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION exact_cents(v DOUBLE) "
        "RETURNS BIGINT RETURN CAST(ROUND(v * 100) AS BIGINT)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION band_spine() "
        "RETURNS TABLE (bucket_id BIGINT) "
        "RETURN SELECT explode(sequence(1, 3))"
    )
    return spark.sql(
        """
        SELECT s.bucket_id, b.band,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(b.cents) AS BIGINT) AS cents
        FROM (SELECT value_band(value) AS band,
                     exact_cents(value) AS cents
              FROM ev_sqludf) b
        JOIN band_spine() s
          ON s.bucket_id = CASE b.band WHEN 'micro' THEN 1
                                       WHEN 'small' THEN 2 ELSE 3 END
        GROUP BY s.bucket_id, b.band
        """
    )


_SQL_PARAMS_THRESH = 50.0
_SQL_PARAMS_TYPES = ("purchase", "view")

_SQL_PARAMS_ORACLE = f"""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN value > {_SQL_PARAMS_THRESH!r} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_over,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
FROM events
WHERE event_type IN {_SQL_PARAMS_TYPES!r}
GROUP BY event_type
"""


@register("q_sql_params", oracle=_SQL_PARAMS_ORACLE)
def q_sql_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL: the query text carries named ``:threshold`` /
    ``:types`` markers and a ``{{events}}`` DataFrame template; values
    bind through ``spark.sql(..., args=...)`` — never string
    interpolation. This is the injection-safe call signature a
    config-driven pipeline (etl.py SyncPipeline) uses when thresholds
    and type lists come from user config.

    Scale shape: parameters bind as literals BEFORE optimization, so
    predicate pushdown and partition pruning see them exactly as if
    hand-inlined — the parameterization is free at execution time.
    """
    ev = load(spark, sf_dir, "events")
    return spark.sql(
        """
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN value > :threshold THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_over,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM {events}
        WHERE event_type IN (:t1, :t2)
        GROUP BY event_type
        """,
        args={
            "threshold": _SQL_PARAMS_THRESH,
            "t1": _SQL_PARAMS_TYPES[0],
            "t2": _SQL_PARAMS_TYPES[1],
        },
        events=ev,
    )
