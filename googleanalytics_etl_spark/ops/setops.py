"""§2.F — global sort / limit / top-k / set operations.

The reference concatenates date-chunked extractions (union), diffs
re-extracts against loaded data (except) and orders report output
[REF-UNVERIFIED: SURVEY.md §2.F]. Scale notes: global ORDER BY + LIMIT
plans as TakeOrderedAndProject (per-partition top-N, then driver merge —
no global sort); grouped top-k is a single window shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

_ORDERBY_LIMIT_ORACLE = """
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
"""


@register("q_orderby_limit", oracle=_ORDERBY_LIMIT_ORACLE)
def q_orderby_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-N (TakeOrderedAndProject; unique tiebreaker pinned)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
        .select("o_orderkey", "o_totalprice")
    )


_TOPK_PER_GROUP_ORACLE = """
SELECT p_brand, p_partkey, p_retailprice, rn
FROM (
    SELECT p_brand, p_partkey, p_retailprice,
           CAST(ROW_NUMBER() OVER (PARTITION BY p_brand
                ORDER BY p_retailprice DESC, p_partkey) AS BIGINT) AS rn
    FROM part
)
WHERE rn <= 3
"""


@register("q_topk_per_group", oracle=_TOPK_PER_GROUP_ORACLE)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts by price per brand (rank-filter; one shuffle)."""
    p = load(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return (
        p.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice", "rn")
    )


_UNION_ALL_ORACLE = """
SELECT event_id, user_id, event_type, value FROM events
WHERE ts < TIMESTAMP '2024-01-10 00:00:00'
UNION ALL
SELECT event_id, user_id, event_type, value FROM events
WHERE value > 200
"""


@register("q_union_all", oracle=_UNION_ALL_ORACLE)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two (overlapping) extraction chunks — duplicate-
    preserving concat, the chunked-extraction append."""
    e = load(spark, sf_dir, "events")
    cols = ["event_id", "user_id", "event_type", "value"]
    a = e.where(F.col("ts") < F.lit("2024-01-10").cast("timestamp_ntz")).select(cols)
    b = e.where(F.col("value") > 200).select(cols)
    return a.unionByName(b)


_EXCEPT_ORACLE = """
SELECT user_id, event_type FROM events
WHERE ts < TIMESTAMP '2024-01-15 00:00:00'
EXCEPT ALL
SELECT user_id, event_type FROM events
WHERE event_type = 'purchase'
"""


@register("q_except", oracle=_EXCEPT_ORACLE)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — multiset difference (re-extract change detection)."""
    e = load(spark, sf_dir, "events")
    a = e.where(F.col("ts") < F.lit("2024-01-15").cast("timestamp_ntz")).select(
        "user_id", "event_type"
    )
    b = e.where(F.col("event_type") == "purchase").select("user_id", "event_type")
    return a.exceptAll(b)


_INTERSECT_ORACLE = """
SELECT user_id, event_type FROM events
WHERE ts < TIMESTAMP '2024-01-15 00:00:00'
INTERSECT ALL
SELECT user_id, event_type FROM events
WHERE value > 50
"""


@register("q_intersect", oracle=_INTERSECT_ORACLE)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — multiset overlap of two extracts."""
    e = load(spark, sf_dir, "events")
    a = e.where(F.col("ts") < F.lit("2024-01-15").cast("timestamp_ntz")).select(
        "user_id", "event_type"
    )
    b = e.where(F.col("value") > 50).select("user_id", "event_type")
    return a.intersectAll(b)


_UNPIVOT_ORACLE = """
SELECT l_orderkey, l_linenumber, 'qty' AS metric, l_quantity AS val
FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'price' AS metric, l_extendedprice AS val
FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'disc' AS metric, l_discount AS val
FROM lineitem
"""


@register("q_unpivot", oracle=_UNPIVOT_ORACLE)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide → long): metric columns to (metric, val) rows via
    ``stack`` — the inverse of q_pivot, pure Expand (no shuffle)."""
    li = load(spark, sf_dir, "lineitem")
    return li.selectExpr(
        "l_orderkey",
        "l_linenumber",
        "stack(3, 'qty', l_quantity, 'price', l_extendedprice, "
        "'disc', l_discount) AS (metric, val)",
    )


_DATE_SPINE_ORACLE = """
WITH b AS (
    SELECT CAST(date_trunc('day', MIN(CAST(ts AS TIMESTAMP))) AS TIMESTAMP) AS lo,
           CAST(date_trunc('day', MAX(CAST(ts AS TIMESTAMP))) AS TIMESTAMP) AS hi
    FROM events
), s AS (
    SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM b
), d AS (
    SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
           COUNT(*) AS n
    FROM events GROUP BY 1
)
SELECT s.day AS day, CAST(COALESCE(d.n, 0) AS BIGINT) AS n_events
FROM s LEFT JOIN d USING (day)
"""


@register("q_date_spine", oracle=_DATE_SPINE_ORACLE)
def q_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar spine: zero-filled daily counts (report tables must show
    empty days — the classic reporting gap-fill). The spine is generated
    with ``sequence`` from the observed bounds (one tiny aggregate, then
    a broadcast-sized explode), left-joined to the daily aggregate."""
    e = load(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts")
    bounds = e.agg(
        F.min(day).alias("lo"), F.max(day).alias("hi")
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    daily = e.groupBy(day.alias("day")).agg(F.count(F.lit(1)).alias("n"))
    return spine.join(daily, "day", "left").select(
        "day", F.coalesce("n", F.lit(0)).cast("long").alias("n_events")
    )


_GLOBAL_RANK_ORACLE = """
SELECT o_orderkey, o_totalprice,
       CAST(ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey)
            AS BIGINT) AS rank
FROM orders
"""


@register("q_global_rank", oracle=_GLOBAL_RANK_ORACLE)
def q_global_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global row numbering WITHOUT a single-partition window.

    ``ROW_NUMBER() OVER (ORDER BY ...)`` with no PARTITION BY is the
    classic scale trap: Spark executes it as one task holding the whole
    table. The distributed recipe (this operator):

    1. ``repartitionByRange`` on the sort key — the range exchange is
       the only data-scale shuffle, and partition p holds keys strictly
       before partition p+1.
    2. Per-partition ``row_number`` keyed by ``spark_partition_id()``.
    3. Per-partition counts (a ≤#partitions-row aggregate) → running
       offsets via a window over those FEW rows — driver-scale metadata,
       explicitly not data — broadcast back and added.

    Rank values depend only on the total order (the unique tiebreaker),
    never on where range boundaries fall, so the result is deterministic
    and equals the single-window oracle bit-for-bit.
    """
    out = global_rank(
        load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice"),
        F.col("o_totalprice").desc(),
        F.col("o_orderkey"),
    )
    return out.select("o_orderkey", "o_totalprice", "rank")


def global_rank(df: DataFrame, *order_cols) -> DataFrame:
    """Distributed ROW_NUMBER over ``order_cols`` (must include a unique
    tiebreaker): range-exchange → per-partition row_number → metadata
    offsets. Adds a ``rank`` column; see ``q_global_rank`` for why."""
    spark = df.sparkSession
    n = max(2, spark.sparkContext.defaultParallelism)
    # localCheckpoint (not persist): both the rank branch and the offsets
    # branch read the pid assignment, and they must see the SAME range
    # boundaries — two independent executions of the range exchange would
    # re-sample them. Eager checkpoint freezes the blocks; unlike a
    # persist (which pins cache for the session — every driver/bench
    # invocation would leak blocks), checkpoint RDDs are released by the
    # ContextCleaner as soon as this DataFrame goes out of scope.
    o = (
        df.repartitionByRange(n, *order_cols)
        .withColumn("pid", F.spark_partition_id())
        .materialize(eager=True)
    )
    in_part = Window.partitionBy("pid").orderBy(*order_cols)
    ranked = o.withColumn("pr", F.row_number().over(in_part).cast("bigint"))

    few = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        o.groupBy("pid")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("offset", F.coalesce(F.sum("cnt").over(few), F.lit(0)))
        .select("pid", "offset")
    )
    return ranked.join(F.broadcast(offsets), "pid").withColumn(
        "rank", (F.col("pr") + F.col("offset")).cast("bigint")
    )
