"""TPC-H-style decision-support suite over the fixture star schema.

The fixtures are TPC-H-shaped (TESTDATA.md); this module implements all
22 classic queries — the canonical proof that a relational engine
composes scans, selective filters, star joins, aggregation, subqueries,
and top-k correctly AND with the right physical plan. Queries whose
official text needs columns the fixtures lack (partsupp, shipmode,
commit/receipt dates, phone, container) run as ADAPTED variants: the
structural signature — join graph shape, subquery form (EXISTS /
NOT EXISTS / IN / correlated MIN / scalar AVG), aggregate pattern — is
preserved exactly, with fixture-available columns substituted for the
missing ones. Each adapted query documents its substitution inline.
Exact: Q1 Q3 Q5 Q6 Q7 Q8 Q10 Q13 Q14 Q15 Q17 Q18 (Q3 drops
o_shippriority). Adapted: Q2 Q4 Q9 Q11 Q12 Q16 Q19 Q20 Q21 Q22.

Physical-plan posture (the 100 TB story):

- **Broadcast hints ONLY on nation/region** — the two relations that are
  constant-size at every scale factor. customer/orders/part/supplier
  GROW with SF (at 100 TB none of them broadcast), so their joins carry
  no hint: AQE broadcasts them at fixture scale (runtime sizes) and
  falls back to shuffle joins on a real cluster — the decision belongs
  to the optimizer, not the query author.
- every revenue aggregate uses exact DECIMAL sums (registry.py
  conventions) so doubles hash-match DuckDB bit-for-bit;
- global top-k (Q3, Q10) compiles to TakeOrderedAndProject — with a
  unique key tiebreaker so the row set at the limit boundary is
  deterministic cross-engine;
- Q18 reduces lineitem to qualifying order ids FIRST (aggregate before
  join — the partial-before-join discipline of q_flagship2).

Reference parity: the reference tool computes none of these (it is an
API-sync ETL [REF-UNVERIFIED]); this suite covers the generic-OLAP
half of SURVEY.md §2.C/D/F at benchmark-recognizable query shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import register, sql_dsum

_REV = "l_extendedprice * (1 - l_discount)"


def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _dsum_rev(alias: str):
    return F.sum(_rev().cast("decimal(18,4)")).cast("double").alias(alias)


# ---------------------------------------------------------------------------
# Q3 — shipping priority (top 10 open orders by revenue)
# ---------------------------------------------------------------------------

_Q3_ORACLE = f"""
SELECT l_orderkey,
       {sql_dsum(_REV, "revenue")},
       o_orderdate
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1997-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("q_tpch_q3", oracle=_Q3_ORACLE)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: revenue of not-yet-shipped BUILDING-segment orders,
    top 10. Segment/date filters push to the scans; the join order
    (selective customer → orders → lineitem) and join strategies are
    AQE's call; top-10 is TakeOrdered with l_orderkey tiebreaker.
    """
    cut = F.lit("1997-03-15 00:00:00").cast("timestamp_ntz")
    c = (
        load(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") < cut)
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate") > cut)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        li.join(o.join(c, F.col("o_custkey") == F.col("c_custkey")),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(_dsum_rev("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q5 — local supplier volume
# ---------------------------------------------------------------------------

_Q5_ORACLE = f"""
SELECT n_name, {sql_dsum(_REV, "revenue")}
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


@register("q_tpch_q5", oracle=_Q5_ORACLE)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: revenue by nation where the customer and the line's
    supplier share a nation, one region, one year. nation⋈region
    broadcast (fixed-size); the c_nationkey = s_nationkey condition
    rides the supplier join as an equi-key.
    """
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = (
        load(spark, sf_dir, "nation")
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    s = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = (
        load(spark, sf_dir, "orders")
        .where((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .select("o_orderkey", "o_custkey")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    oc = o.join(c, F.col("o_custkey") == F.col("c_custkey")).select(
        "o_orderkey", "c_nationkey"
    )
    return (
        li.join(oc, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(_dsum_rev("revenue"))
    )


# ---------------------------------------------------------------------------
# Q6 — forecasting revenue change (pure scan + filter + sum)
# ---------------------------------------------------------------------------

_Q6_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4)))
            AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


@register("q_tpch_q6", oracle=_Q6_ORACLE)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: revenue from discounted small-quantity lines — the
    purest pushdown test: every predicate reaches the parquet scan
    (min/max row-group skipping when layout clusters by shipdate — see
    sources/layout.py), then one global exact-decimal sum.
    """
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= lo)
        & (F.col("l_shipdate") < hi)
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,4)"))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations, by year
# ---------------------------------------------------------------------------

_Q7_ORACLE = f"""
SELECT supp_nation, cust_nation, l_year, {sql_dsum("volume", "revenue")}
FROM (
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
           {_REV} AS volume
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_0' AND n2.n_name = 'NATION_1')
        OR (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_0'))
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


@register("q_tpch_q7", oracle=_Q7_ORACLE)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume between two nations per ship
    year. The nation filter prunes supplier/customer BEFORE their fact
    joins (predicate transitivity done by hand: the pair predicate only
    needs rows whose nation is one of the two); one lineitem aggregate.
    """
    nat = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    two = nat.where(F.col("n_name").isin("NATION_0", "NATION_1"))
    s = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(two), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        load(spark, sf_dir, "customer")
        .join(F.broadcast(two), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    oc = o.join(c, F.col("o_custkey") == F.col("c_custkey")).select(
        "o_orderkey", "cust_nation"
    )
    pair = (
        (F.col("supp_nation") == "NATION_0") & (F.col("cust_nation") == "NATION_1")
    ) | (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_0")
    )
    return (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(oc, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(_dsum_rev("revenue"))
    )


# ---------------------------------------------------------------------------
# Q8 — market share of one nation within a region's part-type market
# ---------------------------------------------------------------------------

_Q8_ORACLE = f"""
SELECT o_year,
       ROUND(CAST(SUM(CASE WHEN nation = 'NATION_2' THEN
                      CAST(volume AS DECIMAL(18,4)) ELSE 0 END) AS DOUBLE)
             / CAST(SUM(CAST(volume AS DECIMAL(18,4))) AS DOUBLE), 6)
           AS mkt_share
FROM (
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
           {_REV} AS volume,
           n2.n_name AS nation
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region   ON n1.n_regionkey = r_regionkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE r_name = 'AMERICA' AND p_type = 'STANDARD'
) all_nations
GROUP BY o_year
"""


@register("q_tpch_q8", oracle=_Q8_ORACLE)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of a region's market for one part
    type, per order year — the deepest star join in the suite (7 of the
    8 fixture relations). Numerator and denominator are conditional /
    total exact-decimal sums in ONE aggregate pass; share is a
    fixed-shape double divide rounded to 6.
    """
    p = (
        load(spark, sf_dir, "part")
        .where(F.col("p_type") == "STANDARD")
        .select("p_partkey")
    )
    nat = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    n1 = nat.join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("cn_key"))
    c = (
        load(spark, sf_dir, "customer")
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("cn_key"))
        .select("c_custkey")
    )
    n2 = nat.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
    )
    s = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("sn_key"))
        .select("s_suppkey", "nation")
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    oc = o.join(c, F.col("o_custkey") == F.col("c_custkey")).select(
        "o_orderkey", "o_orderdate"
    )
    vol = _rev().cast("decimal(18,4)")
    national = F.when(F.col("nation") == "NATION_2", vol).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(oc, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(national).cast("double") / F.sum(vol).cast("double"), 6
            ).alias("mkt_share")
        )
    )


# ---------------------------------------------------------------------------
# Q10 — returned-item reporting (top 20 customers by lost revenue)
# ---------------------------------------------------------------------------

_Q10_ORACLE = f"""
SELECT c_custkey, c_name, {sql_dsum(_REV, "revenue")}, c_acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("q_tpch_q10", oracle=_Q10_ORACLE)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: customers who returned the most revenue in a quarter,
    top 20 — selective fact filters pushed down, nation broadcast, top-k
    TakeOrdered with c_custkey tiebreaker.
    """
    lo = F.lit("1996-10-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    c = (
        load(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_name", "c_acctbal", "n_name")
    )
    o = (
        load(spark, sf_dir, "orders")
        .where((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .select("o_orderkey", "o_custkey")
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_dsum_rev("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q14 — promotion effect
# ---------------------------------------------------------------------------

_Q14_ORACLE = f"""
SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN
                    CAST({_REV} AS DECIMAL(18,4)) ELSE 0 END) AS DOUBLE)
             / CAST(SUM(CAST({_REV} AS DECIMAL(18,4))) AS DOUBLE), 6)
           AS promo_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
"""


@register("q_tpch_q14", oracle=_Q14_ORACLE)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: share of one month's revenue from PROMO parts —
    conditional/total decimal sums in one aggregate pass.
    """
    lo = F.lit("1996-09-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1996-10-01 00:00:00").cast("timestamp_ntz")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = (
        load(spark, sf_dir, "lineitem")
        .where((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .select("l_partkey", "l_extendedprice", "l_discount")
    )
    vol = _rev().cast("decimal(18,4)")
    promo = F.when(F.col("p_type") == "PROMO", vol).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return li.join(p, F.col("l_partkey") == F.col("p_partkey")).agg(
        F.round(
            F.lit(100.0) * F.sum(promo).cast("double") / F.sum(vol).cast("double"),
            6,
        ).alias("promo_revenue")
    )


# ---------------------------------------------------------------------------
# Q18 — large-volume customers
# ---------------------------------------------------------------------------

_Q18_QTY = 150

_Q18_ORACLE = f"""
WITH big AS (
    SELECT l_orderkey,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
    FROM lineitem
    GROUP BY l_orderkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > {_Q18_QTY}
)
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM big
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
"""


@register("q_tpch_q18", oracle=_Q18_ORACLE)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds a threshold, with
    their customers. lineitem is reduced to qualifying (orderkey, qty)
    rows FIRST (hash aggregate with map-side partials + HAVING), and
    only that reduced set joins orders/customer — at 100 TB the joins
    move thousands of rows, not the fact table. Join strategy is AQE's
    runtime-size call.
    """
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    qty = F.col("l_quantity").cast("decimal(18,4)")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qty).alias("tq"))
        .where(F.col("tq") > _Q18_QTY)
        .select("l_orderkey", F.col("tq").cast("double").alias("total_qty"))
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "total_qty",
        )
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution (outer-join histogram)
# ---------------------------------------------------------------------------

_Q13_ORACLE = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
    SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
) c_orders
GROUP BY c_count
"""


@register("q_tpch_q13", oracle=_Q13_ORACLE)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of customers by order count — the LEFT
    OUTER join is the point (customers with zero orders must survive
    into the c_count = 0 bucket; an inner join silently loses them).
    Two hash aggregates; the second runs over |distinct counts| rows.
    """
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("long").alias("custdist")
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier (aggregate, then argmax against its own max)
# ---------------------------------------------------------------------------

_Q15_ORACLE = f"""
WITH rev AS (
    SELECT l_suppkey AS supplier_no,
           {sql_dsum(_REV, "total_revenue")}
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier
JOIN rev ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
"""


@register("q_tpch_q15", oracle=_Q15_ORACLE)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the quarter's maximum revenue.

    The scalar max comes from a 1-row aggregate of the (already reduced)
    per-supplier revenue, broadcast into an equality join — never a
    single-partition window over all suppliers (at 100 TB the supplier
    aggregate has millions of rows; the 1-row broadcast is free either
    way). Revenue equality is safe cross-engine because both sides carry
    the identical exact-decimal-derived double.
    """
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1996-04-01 00:00:00").cast("timestamp_ntz")
    li = (
        load(spark, sf_dir, "lineitem")
        .where((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .select("l_suppkey", "l_extendedprice", "l_discount")
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _dsum_rev("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(s, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (per-part average threshold)
# ---------------------------------------------------------------------------

_Q17_ORACLE = """
WITH part_avg AS (
    SELECT l_partkey AS a_partkey,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
               / COUNT(*) AS avg_qty
    FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0
           AS avg_yearly
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN part_avg ON a_partkey = l_partkey
WHERE p_brand = 'Brand#1' AND l_quantity < 0.2 * avg_qty
"""


@register("q_tpch_q17", oracle=_Q17_ORACLE)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue lost to small-quantity orders of one brand's
    parts. The classic correlated AVG subquery decorrelates into a
    per-part aggregate joined back on l_partkey — both sides of that
    join are partitioned on the same key (one co-located exchange pair,
    AQE-planned). The threshold comparison is deterministic because
    avg_qty is an exact-decimal sum over a count (identical doubles both
    engines). The brand filter prunes through the part join.
    """
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    part_avg = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_qty")
    )
    p = (
        load(spark, sf_dir, "part")
        .where(F.col("p_brand") == "Brand#1")
        .select("p_partkey")
    )
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(part_avg, F.col("a_partkey") == F.col("l_partkey"))
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("double")
                / F.lit(7.0)
            ).alias("avg_yearly")
        )
    )


# ---------------------------------------------------------------------------
# Q1 — pricing summary report (exact: every needed column exists)
# ---------------------------------------------------------------------------

_Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
           AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
            AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                     AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
           AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
           AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
           AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1997-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("q_tpch_q1", oracle=_Q1_ORACLE)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: the pricing summary report — one scan, one hash
    aggregate over a handful of groups, eight aggregates per group.
    Map-side partial aggregation reduces each partition to ≤6 rows
    before the (tiny) shuffle; the whole query is a single
    WholeStageCodegen span over the scan.

    Determinism: every money sum is an exact DECIMAL accumulation cast
    back to double; ``sum_charge`` multiplies three 2-decimal factors so
    its product is a 6-decimal value — it accumulates as DECIMAL(18,6)
    (a 4-decimal cast could land on an exact .5 tie and round differently
    per engine). Averages divide the exact-decimal-derived double by the
    group count: identical IEEE division both engines.
    """
    li = load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1997-09-02 00:00:00").cast("timestamp_ntz")
    )
    qty = F.col("l_quantity").cast("decimal(18,4)")
    price = F.col("l_extendedprice").cast("decimal(18,4)")
    disc_price = _rev().cast("decimal(18,4)")
    charge = (_rev() * (1 + F.col("l_tax"))).cast("decimal(18,6)")
    disc = F.col("l_discount").cast("decimal(18,4)")
    n = F.count(F.lit(1))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(qty).cast("double") / n).alias("avg_qty"),
            (F.sum(price).cast("double") / n).alias("avg_price"),
            (F.sum(disc).cast("double") / n).alias("avg_disc"),
            n.cast("long").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Q2 — minimum-cost supplier (adapted: no partsupp; supply relationships
# come from observed lineitem (part, supplier) pairs and "cost" is the
# supplier's account balance. The structural signature — a correlated
# MIN subquery over a multi-way join, decorrelated — is preserved.)
# ---------------------------------------------------------------------------

_Q2_ORACLE = """
WITH supplies AS (
    SELECT DISTINCT l_partkey, l_suppkey
    FROM lineitem
),
cand AS (
    SELECT p_partkey, s_suppkey, s_name, s_acctbal, n_name
    FROM supplies
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE p_size = 15 AND p_type = 'SMALL' AND r_name = 'EUROPE'
)
SELECT s_acctbal, s_name, n_name, p_partkey, s_suppkey
FROM cand c
WHERE s_acctbal = (SELECT MIN(s_acctbal) FROM cand m
                   WHERE m.p_partkey = c.p_partkey)
ORDER BY s_acctbal DESC, p_partkey, s_suppkey
LIMIT 100
"""


@register("q_tpch_q2", oracle=_Q2_ORACLE)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (adapted — fixtures lack partsupp): per qualifying part,
    the European supplier(s) with the minimum account balance among
    suppliers observed shipping that part.

    The correlated ``MIN`` subquery decorrelates into a per-part
    aggregate equality-joined back — both sides share the p_partkey
    partitioning, so the join-back reuses one exchange (AQE-planned).
    The (part, supplier) relationship is reduced to DISTINCT pairs
    BEFORE any dimension join: at 100 TB that collapses billions of
    line rows to the far smaller supply-pair set first. nation/region
    broadcast (fixed-size); the balance equality is exact (untouched
    double column, no arithmetic).
    """
    pairs = (
        load(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    p = (
        load(spark, sf_dir, "part")
        .where((F.col("p_size") == 15) & (F.col("p_type") == "SMALL"))
        .select("p_partkey")
    )
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    n = (
        load(spark, sf_dir, "nation")
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    s = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cand = (
        pairs.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("p_partkey", "s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    mn = cand.groupBy(F.col("p_partkey").alias("m_partkey")).agg(
        F.min("s_acctbal").alias("min_bal")
    )
    return (
        cand.join(
            mn,
            (F.col("p_partkey") == F.col("m_partkey"))
            & (F.col("s_acctbal") == F.col("min_bal")),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "s_suppkey")
        .orderBy(F.desc("s_acctbal"), "p_partkey", "s_suppkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q4 — order-priority checking (adapted: the EXISTS predicate is "has a
# returned line" instead of commit<receipt, which the fixtures lack; the
# structural signature — EXISTS rewritten to a semi join feeding a
# count-by-priority aggregate — is preserved.)
# ---------------------------------------------------------------------------

_Q4_ORACLE = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
"""


@register("q_tpch_q4", oracle=_Q4_ORACLE)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (adapted EXISTS predicate): one quarter's orders having
    at least one returned line, counted by priority. EXISTS compiles to
    a LEFT SEMI hash join — no duplication of the probe side however
    many matching lines an order has — and the returnflag filter prunes
    the build side before the shuffle.
    """
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp_ntz"))
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("order_count"))
    )


# ---------------------------------------------------------------------------
# Q9 — product-type profit (adapted: no partsupp supply cost, so profit
# is discounted revenue; the signature — LIKE-filtered part driving a
# 5-relation join aggregated by supplier nation × order year — holds.)
# ---------------------------------------------------------------------------

_Q9_ORACLE = f"""
SELECT nation, o_year, {sql_dsum("volume", "sum_profit")}
FROM (
    SELECT n_name AS nation,
           CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
           {_REV} AS volume
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
"""


@register("q_tpch_q9", oracle=_Q9_ORACLE)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (adapted profit metric): revenue from parts whose name
    contains a color token, by supplier nation and order year. The LIKE
    filter reduces part FIRST (it cannot push to a parquet row-group
    but it prunes before the fact join); nation broadcasts; the orders
    join carries only (o_orderkey, o_orderdate).
    """
    p = (
        load(spark, sf_dir, "part")
        .where(F.col("p_name").like("%red%"))
        .select("p_partkey")
    )
    nat = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    s = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("nation", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(_dsum_rev("sum_profit"))
    )


# ---------------------------------------------------------------------------
# Q11 — important stock identification (adapted: "value" is per-part
# discounted revenue from one nation's suppliers instead of
# supplycost×availqty; the signature — grouped value vs a global scalar
# threshold subquery — is preserved.)
# ---------------------------------------------------------------------------

_Q11_ORACLE = f"""
WITH v AS (
    SELECT l_partkey, SUM(CAST({_REV} AS DECIMAL(18,4))) AS dval
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3'
    GROUP BY l_partkey
),
t AS (SELECT CAST(SUM(dval) AS DOUBLE) AS total FROM v)
SELECT l_partkey, CAST(dval AS DOUBLE) AS value
FROM v, t
WHERE CAST(dval AS DOUBLE) > 0.001 * total
"""


@register("q_tpch_q11", oracle=_Q11_ORACLE)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (adapted value metric): parts whose revenue through one
    nation's suppliers exceeds a fraction of that nation's total.

    The global scalar threshold is a 1-row re-aggregate of the SAME
    per-part partials (not a second fact scan), broadcast into the
    filter — the fact table is read and shuffled exactly once. Exact
    decimal partials keep the threshold comparison bit-identical
    cross-engine; both compare doubles derived from the same decimals.
    """
    nat = (
        load(spark, sf_dir, "nation")
        .where(F.col("n_name") == "NATION_3")
        .select("n_nationkey")
    )
    s = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    v = (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_rev().cast("decimal(18,4)")).alias("dval"))
    )
    t = v.agg(F.sum("dval").cast("double").alias("total"))
    return (
        v.join(F.broadcast(t))
        .where(F.col("dval").cast("double") > 0.001 * F.col("total"))
        .select("l_partkey", F.col("dval").cast("double").alias("value"))
    )


# ---------------------------------------------------------------------------
# Q12 — shipping-priority classification (adapted: l_linestatus stands in
# for the missing l_shipmode and the date window uses l_shipdate; the
# signature — join + per-class conditional priority counts — holds.)
# ---------------------------------------------------------------------------

_Q12_ORACLE = """
SELECT l_linestatus AS ship_class,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_returnflag = 'N'
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_linestatus
"""


@register("q_tpch_q12", oracle=_Q12_ORACLE)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (adapted grouping column): lines shipped in one year,
    classified by line status, counting high- vs low-priority orders
    per class in ONE conditional aggregate pass. Only (o_orderkey,
    o_orderpriority) crosses the join; the date/returnflag filters push
    to the lineitem scan.
    """
    hi_pri = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = (
        load(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_returnflag") == "N")
            & (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        )
        .select("l_orderkey", "l_linestatus")
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("l_linestatus").alias("ship_class"))
        .agg(
            F.sum(F.when(hi_pri, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~hi_pri, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q16 — supplier-count by part attributes (adapted: supply relationships
# from lineitem pairs; the excluded-supplier subquery keys on negative
# account balance instead of the missing comment field. Signature —
# COUNT(DISTINCT) over an exclusion NOT-IN subquery — preserved.)
# ---------------------------------------------------------------------------

_Q16_ORACLE = """
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


@register("q_tpch_q16", oracle=_Q16_ORACLE)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (adapted exclusion predicate): how many distinct
    suppliers ship each qualifying (brand, type, size). The NOT IN
    subquery becomes a LEFT ANTI join against the (tiny, broadcast)
    excluded-supplier set — s_suppkey is non-null so anti-join and
    NOT IN agree. The (partkey, suppkey) projection is deduplicated
    before the part join: the distinct-count aggregate then works on
    supply pairs, not raw line rows.
    """
    bad = (
        load(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    p = (
        load(spark, sf_dir, "part")
        .where(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    pairs = (
        load(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
    )
    return (
        pairs.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q19 — discounted revenue under disjunctive predicates (adapted: the
# brand/size/quantity disjunction survives; container and shipmode
# conjuncts are dropped with the columns. The signature — an OR of AND
# blocks spanning both join sides, with a common extractable equi-key —
# is exactly the Q19 planner test.)
# ---------------------------------------------------------------------------

_Q19_ORACLE = f"""
SELECT {sql_dsum(_REV, "revenue")}, CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


@register("q_tpch_q19", oracle=_Q19_ORACLE)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (adapted: container/shipmode conjuncts dropped): revenue
    matching any of three brand/size/quantity bands. The planner test:
    the disjunction spans both relations, but the p_partkey = l_partkey
    equi-key is common to every branch — Catalyst extracts it, so this
    is a hash join with the OR as a post-join filter, NEVER a nested-loop
    cartesian. Single-side conjuncts (size, quantity bands) additionally
    push below the join by branch-OR factoring.
    """
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    band = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .where(band)
        .agg(
            _dsum_rev("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q20 — potential part promotion (adapted: "supplied a significant share"
# becomes a shipped-quantity threshold, availqty being unavailable; the
# signature — nested IN subqueries reduced to aggregates feeding semi
# joins — is preserved.)
# ---------------------------------------------------------------------------

_Q20_ORACLE = """
SELECT s_name, s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_9'
  AND s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE '%red%'
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_suppkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 200
  )
"""


@register("q_tpch_q20", oracle=_Q20_ORACLE)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (adapted threshold semantics): suppliers of one nation
    who shipped more than a threshold quantity of color-named parts in
    one year. The inner IN-subquery is computed as an aggregate over the
    (part-filtered, date-pruned) fact table FIRST — at 100 TB the semi
    join probes with thousands of supplier ids, never the fact table.
    The HAVING comparison is decimal-vs-integer: exact on both engines.
    """
    p = (
        load(spark, sf_dir, "part")
        .where(F.col("p_name").like("%red%"))
        .select("p_partkey")
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        )
        .select("l_partkey", "l_suppkey", "l_quantity")
    )
    qualified = (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("tq"))
        .where(F.col("tq") > 200)
        .select("l_suppkey")
    )
    nat = (
        load(spark, sf_dir, "nation")
        .where(F.col("n_name") == "NATION_9")
        .select("n_nationkey")
    )
    s = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal")
    )
    return s.join(
        qualified, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
    ).select("s_name", "s_acctbal")


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (adapted: "late" is a returned
# line, the fixtures lacking receipt/commit dates; the signature —
# EXISTS(other supplier) AND NOT EXISTS(other failing supplier) over a
# self-referencing fact — is preserved, decorrelated Spark-side.)
# ---------------------------------------------------------------------------

_Q21_ORACLE = """
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders     ON o_orderkey = l1.l_orderkey
JOIN nation     ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND n_name = 'NATION_5'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


@register("q_tpch_q21", oracle=_Q21_ORACLE)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (adapted failure predicate): suppliers who were the
    SOLE returning supplier on finalized multi-supplier orders, top 20.

    The correlated EXISTS / NOT EXISTS pair decorrelates into ONE
    per-order aggregate — n_suppliers = COUNT(DISTINCT suppkey) and
    r_suppliers = COUNT(DISTINCT suppkey) FILTER (returnflag = 'R') —
    joined back to the candidate lines: EXISTS(other supplier) ⇔
    n_suppliers ≥ 2, NOT EXISTS(other returning supplier) ⇔
    r_suppliers = 1 (the candidate line itself is returning). One fact
    aggregate + one fact join instead of three correlated fact scans;
    the oracle keeps the EXISTS form, proving the rewrite. Top-20 is
    TakeOrdered with the unique s_name as tiebreaker.
    """
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    # two chained hash aggregates instead of countDistinct×2: a double
    # distinct-agg compiles to an Expand that doubles every fact row
    # before the shuffle; pre-deduping to (order, supplier) pairs moves
    # each pair once and the second aggregate runs on pair-level rows
    per_pair = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias(
            "has_r"
        )
    )
    per_order = per_pair.groupBy(F.col("l_orderkey").alias("g_orderkey")).agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum("has_r").alias("r_suppliers"),
    )
    o = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    nat = (
        load(spark, sf_dir, "nation")
        .where(F.col("n_name") == "NATION_5")
        .select("n_nationkey")
    )
    s = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    return (
        li.where(F.col("l_returnflag") == "R")
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            per_order,
            (F.col("l_orderkey") == F.col("g_orderkey"))
            & (F.col("n_suppliers") >= 2)
            & (F.col("r_suppliers") == 1),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q22 — global sales opportunity (adapted: nationkey stands in for the
# missing phone country code, and "no orders" is scoped to recent
# orders so the fixture's fully-active customers still yield rows; the
# signature — scalar AVG subquery + NOT EXISTS anti join + aggregate —
# is preserved.)
# ---------------------------------------------------------------------------

_Q22_ORACLE = """
WITH picked AS (
    SELECT CAST(c_nationkey AS BIGINT) AS cntrycode, c_custkey, c_acctbal
    FROM customer
    WHERE c_nationkey IN (0, 1, 2, 3, 4, 5, 6)
),
thresh AS (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
               AS avg_bal
    FROM picked WHERE c_acctbal > 0.0
)
SELECT cntrycode,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
FROM picked, thresh
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY cntrycode
"""


@register("q_tpch_q22", oracle=_Q22_ORACLE)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (adapted country code + recency-scoped inactivity):
    well-funded customers from selected nations with no recent orders,
    summarized per nation. The scalar AVG threshold is a 1-row
    broadcast (exact-decimal sum / count — identical IEEE divide both
    engines); NOT EXISTS is a LEFT ANTI join against the date-pruned
    orders projection. Customer is scanned once for both the threshold
    and the candidate set at fixture scale; at 100 TB the threshold
    branch reads one column of one nation-pruned scan.
    """
    picked = (
        load(spark, sf_dir, "customer")
        .where(F.col("c_nationkey").isin(0, 1, 2, 3, 4, 5, 6))
        .select(
            F.col("c_nationkey").cast("long").alias("cntrycode"),
            "c_custkey",
            "c_acctbal",
        )
    )
    thresh = picked.where(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    recent = (
        load(spark, sf_dir, "orders")
        .where(
            F.col("o_orderdate")
            >= F.lit("2000-01-01 00:00:00").cast("timestamp_ntz")
        )
        .select("o_custkey")
    )
    return (
        picked.join(F.broadcast(thresh))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,4)"))
            .cast("double")
            .alias("totacctbal"),
        )
    )
