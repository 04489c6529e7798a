"""§2.D — aggregation operators.

The reference computes daily/page metric totals and unique-client counts
in pandas after extraction [REF-UNVERIFIED: SURVEY.md §2.D]; here every
aggregate is Spark's partial+final hash aggregation (map-side combine is
automatic — at 100 TB the shuffle carries per-group partials, not rows).

Double determinism follows the registry convention: exact DECIMAL sums
cast back to DOUBLE; AVG is exact-sum / count; stddev is an explicit
IEEE-identical formula over exact decimal moments. ``q_approx_distinct``
has no SQL oracle (HLL sketches differ across engines) — rows-only check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import DEC, favg, fscaled, fsum, register, sql_davg, sql_dsum

_GROUPBY_AGG_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum("l_quantity", "sum_qty")},
       {sql_dsum("l_extendedprice", "sum_base_price")},
       {sql_dsum("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
       {sql_davg("l_quantity", "avg_qty")},
       {sql_davg("l_discount", "avg_disc")},
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("q_groupby_agg", oracle=_GROUPBY_AGG_ORACLE)
def q_groupby_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash aggregate (TPC-H-Q1-like): multi-agg groupBy on the fact table."""
    li = load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp_ntz")
    )
    # fsum/favg: the metrics are ≤4-decimal exact (registry.py fast path)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        fsum("l_quantity", "sum_qty"),
        fsum("l_extendedprice", "sum_base_price"),
        fsum(disc_price, "sum_disc_price"),
        favg("l_quantity", "avg_qty"),
        favg("l_discount", "avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


_COUNT_DISTINCT_ORACLE = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
FROM events GROUP BY event_type
"""


@register("q_count_distinct", oracle=_COUNT_DISTINCT_ORACLE)
def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per group (expands + re-aggregates; see
    q_approx_distinct for the 100 TB-friendly sketch version)."""
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register("q_approx_distinct", oracle=None)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct — the scale path for distinct counts:
    constant memory per group, no expansion shuffle. No SQL oracle (HLL
    implementations differ across engines) → rows-only check; the pytest
    suite bounds its error against the exact count instead."""
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("n_users_approx")
    )


# KNOWN FRAGILITY (deliberate): `in_bound = 1` is a hardcoded claim that
# Spark's HLL++ estimate lands within 3 sigma of the exact count on this
# fixture. A regenerated fixture, a new scale factor, or a Spark-version
# change to approx_count_distinct internals would surface here as a
# correctness hash-miss rather than an accuracy regression — by design:
# this key exists to make the sketch's error contract DRIVER-VISIBLE,
# and a trip means "re-validate the bound", not "the engine is wrong".
# The margin is 3x the configured rsd (P(miss) ~ 2.7e-3 per group, 5
# groups), and tests/test_round5n_keys.py re-asserts the same bound at
# two scale factors, so a trip localizes immediately.
_APPROX_DISTINCT_BOUND_ORACLE = """
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users_exact,
       CAST(1 AS BIGINT) AS in_bound
FROM events GROUP BY event_type
"""


@register("q_approx_distinct_bound", oracle=_APPROX_DISTINCT_BOUND_ORACLE)
def q_approx_distinct_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible accuracy contract for ``q_approx_distinct`` — the
    exact-twin + hardcoded-bound construction from sketch_ops.py: the
    exact distinct count (full SQL oracle on both engines) alongside an
    ``in_bound`` flag asserting the HLL++ estimate (rsd = 2%) landed
    within 6% (3 sigma) of it. The oracle hardcodes ``in_bound = 1``,
    so a driver hash-match certifies BOTH the exact computation and the
    sketch's error bound on this data. Estimates are deterministic for
    a given input (HLL merge is partition-order-independent), so the
    flag is stable across runs."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").cast("bigint").alias("n_users_exact"),
            F.approx_count_distinct("user_id", 0.02).alias("_est"),
        )
        .select(
            "event_type",
            "n_users_exact",
            (
                F.abs(F.col("_est") - F.col("n_users_exact"))
                <= 0.06 * F.col("n_users_exact")
            )
            .cast("bigint")
            .alias("in_bound"),
        )
    )


_DISTINCT_ROWS_ORACLE = """
SELECT DISTINCT user_id, event_type FROM events
"""


@register("q_distinct_rows", oracle=_DISTINCT_ROWS_ORACLE)
def q_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT on selected columns (exact dedup of re-extracted rows)."""
    e = load(spark, sf_dir, "events")
    return e.select("user_id", "event_type").distinct()


_ROLLUP_ORACLE = f"""
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
       COUNT(*) AS n_orders,
       {sql_dsum("o_totalprice", "total_price")}
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


@register("q_rollup", oracle=_ROLLUP_ORACLE)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: hierarchical subtotals status → priority → grand total."""
    o = load(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.count(F.lit(1)).alias("n_orders"),
            fsum("o_totalprice", "total_price"),
        )
        .select(
            "o_orderstatus",
            "o_orderpriority",
            "g_status",
            "g_priority",
            "n_orders",
            "total_price",
        )
    )


_CUBE_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INT) AS g_status,
       COUNT(*) AS n_lines,
       {sql_dsum("l_quantity", "sum_qty")}
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@register("q_cube", oracle=_CUBE_ORACLE)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: every grouping combination (cross-tab reports)."""
    li = load(spark, sf_dir, "lineitem")
    # pre-aggregate before Expand (see q_flagship2): cube re-aggregates
    # |flag×status| partials, not the fact table
    base = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("pn"), F.sum(fscaled("l_quantity")).alias("ps")
    )
    return (
        base.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.sum("pn").alias("n_lines"),
            (F.sum("ps") / 10_000.0).alias("sum_qty"),
        )
        .select(
            "l_returnflag", "l_linestatus", "g_flag", "g_status", "n_lines", "sum_qty"
        )
    )


_GROUPING_SETS_ORACLE = f"""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       {sql_dsum("o_totalprice", "total_price")}
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


@register("q_grouping_sets", oracle=_GROUPING_SETS_ORACLE)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the SQL entry point (SURVEY.md §3.3) —
    same Catalyst Expand plan as rollup/cube."""
    o = load(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__gs_orders")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               {sql_dsum("o_totalprice", "total_price")}
        FROM __gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

_PIVOT_ORACLE = """
SELECT user_id,
       COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
       COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
       COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
       COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
       COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
FROM events GROUP BY user_id
"""


@register("q_pivot", oracle=_PIVOT_ORACLE)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event_type → count columns (explicit value list pins column
    order and skips the extra distinct-values job — SURVEY.md §7 (4))."""
    e = load(spark, sf_dir, "events")
    df = e.groupBy("user_id").pivot("event_type", EVENT_TYPES).agg(
        F.count(F.lit(1))
    )
    # pivot-count yields NULL for absent combos; the CASE-WHEN oracle
    # yields 0 — align.
    return df.select(
        "user_id", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in EVENT_TYPES]
    )


_AGG_FILTERED_ORACLE = f"""
SELECT user_id,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_purchases,
       {sql_dsum("CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END",
                 "purchase_value")},
       COUNT(*) AS n_events
FROM events GROUP BY user_id
"""


@register("q_agg_filtered", oracle=_AGG_FILTERED_ORACLE)
def q_agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered aggregation (conversion counting): count/sum under CASE."""
    e = load(spark, sf_dir, "events")
    is_purchase = F.col("event_type") == "purchase"
    purchase = F.when(is_purchase, F.col("value")).otherwise(F.lit(0.0))
    return e.groupBy("user_id").agg(
        F.sum(F.when(is_purchase, 1).otherwise(0)).cast("long").alias("n_purchases"),
        fsum(purchase, "purchase_value"),
        F.count(F.lit(1)).alias("n_events"),
    )


# stddev from exact decimal moments: both engines then evaluate the SAME
# IEEE double expression sqrt((sq - s*s/n) / (n-1)) — bit-identical.
_AGG_STATS_ORACLE = """
WITH m AS (
    SELECT event_type,
           COUNT(value) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS s,
           CAST(SUM(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4)))
                AS DOUBLE) AS sq,
           CAST(MIN(value) AS DOUBLE) AS min_value,
           CAST(MAX(value) AS DOUBLE) AS max_value,
           ROUND(MEDIAN(value), 4) AS median_value
    FROM events GROUP BY event_type
)
SELECT event_type, n, min_value, max_value, median_value,
       ROUND(SQRT((sq - s * s / n) / (n - 1)), 6) AS stddev_value
FROM m
"""


@register("q_agg_stats", oracle=_AGG_STATS_ORACLE)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: min/max/median/stddev of the metric."""
    e = load(spark, sf_dir, "events")
    vdec = F.col("value").cast(DEC)
    m = e.groupBy("event_type").agg(
        F.count("value").alias("n"),
        F.sum(vdec).cast("double").alias("s"),
        F.sum(vdec * vdec).cast("double").alias("sq"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.round(F.median("value"), 4).alias("median_value"),
    )
    stddev = F.round(
        F.sqrt((F.col("sq") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - 1)),
        6,
    )
    return m.select(
        "event_type",
        "n",
        "min_value",
        "max_value",
        "median_value",
        stddev.alias("stddev_value"),
    )


_COLLECT_SORTED_ORACLE = """
SELECT user_id,
       array_to_string(list_sort(list(DISTINCT event_type)), ',') AS event_types,
       CAST(len(list(DISTINCT event_type)) AS INT) AS n_types
FROM events GROUP BY user_id
"""


@register("q_collect_sorted", oracle=_COLLECT_SORTED_ORACLE)
def q_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: distinct values collected per group, sorted
    for cross-engine determinism (collect_set order is undefined —
    array_sort pins it), then joined to one string per group — the
    driver's pandas canonicalizer cannot hash raw list cells, and a
    delimited string carries the identical information."""
    e = load(spark, sf_dir, "events")
    types = F.array_join(F.array_sort(F.collect_set("event_type")), ",")
    return e.groupBy("user_id").agg(
        types.alias("event_types"),
        F.size(F.collect_set("event_type")).cast("int").alias("n_types"),
    )


_MINMAX_BY_ORACLE = """
SELECT o_custkey,
       min_by(o_orderkey, o_totalprice) AS cheapest_order,
       max_by(o_orderkey, o_totalprice) AS priciest_order,
       min_by(o_orderpriority, o_orderkey) AS first_priority
FROM orders
GROUP BY o_custkey
"""


@register("q_agg_minmax_by", oracle=_MINMAX_BY_ORACLE)
def q_agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmin/argmax aggregation: the row attribute AT the group extreme
    (min_by / max_by) — "which order was the cheapest", without a
    self-join back onto the group minimum.

    One hash aggregate (partial+final, like any agg) versus the naive
    groupBy-min + equi-join-back plan, which costs a second shuffle and
    breaks on ties. Determinism note: min_by picks an arbitrary row on
    ordering ties; `o_totalprice` is tie-free per customer in the
    fixtures at every SF (verified), and `o_orderkey` is globally
    unique, so both engines must agree. For tie-prone production
    orderings, compose a unique sort key first.
    """
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.min_by("o_orderkey", "o_totalprice").alias("cheapest_order"),
        F.max_by("o_orderkey", "o_totalprice").alias("priciest_order"),
        F.min_by("o_orderpriority", "o_orderkey").alias("first_priority"),
    )


_PERCENTILES_ORACLE = """
WITH r AS (
    SELECT o_orderpriority, o_totalprice,
           CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                   ORDER BY o_totalprice, o_orderkey)
                AS BIGINT) AS rn,
           COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
    FROM orders
)
SELECT o_orderpriority,
       MAX(CASE WHEN rn = CAST(ceil(CAST(0.25 AS DOUBLE) * n) AS BIGINT)
                THEN o_totalprice END) AS p25,
       MAX(CASE WHEN rn = CAST(ceil(CAST(0.50 AS DOUBLE) * n) AS BIGINT)
                THEN o_totalprice END) AS p50,
       MAX(CASE WHEN rn = CAST(ceil(CAST(0.75 AS DOUBLE) * n) AS BIGINT)
                THEN o_totalprice END) AS p75,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM r GROUP BY o_orderpriority
"""


@register("q_percentiles", oracle=_PERCENTILES_ORACLE)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group percentiles via deterministic rank selection.

    The value at rank ceil(q·n) in (value, unique-key) order — the
    discrete percentile definition, chosen over interpolating
    percentile_cont because rank selection compares EXACT fixture
    doubles cross-engine, whereas the two engines' interpolation
    formulas can differ in the last ulp. One window pass (a single
    shuffle on the group key) + a hash aggregate; at 100 TB scale the
    same question is usually answered with the approx_percentile sketch
    (see q_approx_distinct for the sketch-vs-exact contract) — this is
    the exact form and the oracle for validating sketches offline.
    """
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wn = Window.partitionBy("o_orderpriority")
    r = o.select(
        "o_orderpriority",
        "o_totalprice",
        F.row_number().over(w).cast("long").alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )

    def pick(q: float, name: str):
        tgt = F.ceil(F.lit(q) * F.col("n")).cast("long")
        return F.max(
            F.when(F.col("rn") == tgt, F.col("o_totalprice"))
        ).alias(name)

    return r.groupBy("o_orderpriority").agg(
        pick(0.25, "p25"),
        pick(0.50, "p50"),
        pick(0.75, "p75"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )
