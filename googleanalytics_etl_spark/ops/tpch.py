"""TPC-H-style decision-support suite over the fixture star schema.

The fixtures are TPC-H-shaped (TESTDATA.md); this module implements the
classic queries the schema supports — the canonical proof that a
relational engine composes scans, selective filters, star joins,
aggregation, and top-k correctly AND with the right physical plan.
(Queries needing columns the fixtures lack — partsupp, shipmode,
commitdate — are omitted; Q3 drops o_shippriority.)

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
