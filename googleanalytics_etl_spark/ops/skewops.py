"""Driver-visible skew-mitigation operators (skew.py exercised end-to-end).

The helpers in ``googleanalytics_etl_spark.skew`` are the engine's
explicit answer to hot keys at 100 TB (SURVEY.md §4; SCALE.md §3/§4):
AQE's runtime skew-join split is the first line, these are the
pre-planned second line. Salting is **result-invariant** — the salt only
changes which reducer sees which rows — so both operators carry the
plain (unsalted) SQL as their cross-engine oracle: the driver proves the
mitigation does not change a single output value.

Reference parity: GoogleAnalytics-ETL processes per-user hit logs where
bot/monitor users concentrate traffic [REF-UNVERIFIED: SURVEY.md §2.C —
/root/reference was empty at survey time]; hot-user skew is the
motivating distribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import dsum, register, sql_dsum
from ..skew import salted_distinct_count, salted_join

_SKEW_DISTINCT_ORACLE = """
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct
FROM events
GROUP BY event_type
"""


@register("q_skew_distinct", oracle=_SKEW_DISTINCT_ORACLE)
def q_skew_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per event type, hot-group-safe.

    ``skew.salted_distinct_count``: phase 1 groups by (event_type,
    salt-of-user) so a hot event type's distinct-set state is split over
    16 reducers; phase 2 sums the per-bucket exact counts. A value
    always lands in the same bucket (salt is a pure function of the
    value), so no cross-bucket double count — the oracle is the plain
    COUNT(DISTINCT): identical output, different (safe) physical plan.
    At 100 TB this is the exact-count fallback when q_approx_distinct's
    HLL error is not acceptable.
    """
    e = load(spark, sf_dir, "events")
    return salted_distinct_count(e, "event_type", "user_id", salt_n=16)


_SKEW_JOIN_ORACLE = f"""
SELECT p.p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       {sql_dsum('l.l_extendedprice', 'revenue')}
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
"""


@register("q_skew_join", oracle=_SKEW_JOIN_ORACLE)
def q_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact↔dimension join, then brand-level revenue rollup.

    ``skew.salted_join`` with salt_n=8: the fact side's shuffle key
    becomes (p_partkey, salt) — a pathologically hot part spreads over 8
    reducers — and the dimension side is replicated 8×. Replication cost
    is 8× |part|, the knob for dims too big to broadcast but small
    enough to copy; unmatched-row duplication is impossible for the
    supported join types (inner/left/semi/anti — guarded in skew.py).
    The oracle is the plain join: salting must not change any value.
    """
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("p_partkey"), "l_extendedprice"
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    joined = salted_join(li, p, "p_partkey", salt_n=8)
    return joined.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        dsum("l_extendedprice", "revenue"),
    )
