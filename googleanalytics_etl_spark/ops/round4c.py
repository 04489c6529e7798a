"""Round-4 operators, third batch: degree-oriented triangle counting,
exact moving median, MAD-based robust anomaly detection.

- ``x_graph_triangles`` — graph analytics over the part co-purchase
  graph with the degree-ordered orientation that makes triangle
  enumeration tractable at scale (wedges come only from low-degree
  endpoints, bounding the join fan-out by O(√m) per node instead of
  the max degree).
- ``q_moving_median`` — exact trailing-7-row moving median of the
  daily revenue series (the robust counterpart of the trailing mean in
  ``q_window_range_frame``).
- ``x_anomaly_mad`` — median / MAD robust outlier detection per event
  type (the heavy-tail-safe counterpart of ``q_anomaly_zscore``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register


# ---------------------------------------------------------------------------
# x_graph_triangles — degree-oriented triangle counting
# ---------------------------------------------------------------------------

_TRI_ORACLE = """
WITH op AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), edges AS (
    SELECT a.l_partkey AS p1, b.l_partkey AS p2
    FROM op a
    JOIN op b ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
    GROUP BY p1, p2
    HAVING COUNT(*) >= 2
), deg AS (
    SELECT p, CAST(COUNT(*) AS BIGINT) AS d FROM (
        SELECT p1 AS p FROM edges UNION ALL SELECT p2 FROM edges
    ) GROUP BY p
), oriented AS (
    SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND e.p1 < e.p2)
                THEN e.p1 ELSE e.p2 END AS src,
           CASE WHEN da.d < db.d OR (da.d = db.d AND e.p1 < e.p2)
                THEN e.p2 ELSE e.p1 END AS dst
    FROM edges e
    JOIN deg da ON da.p = e.p1
    JOIN deg db ON db.p = e.p2
), tri AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM oriented o1
    JOIN oriented o2 ON o1.src = o2.src AND o1.dst < o2.dst
    JOIN edges e ON e.p1 = o1.dst AND e.p2 = o2.dst
), stats AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(SUM(d * (d - 1) / 2) AS BIGINT) AS n_wedges
    FROM deg
)
SELECT s.n_nodes,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM edges) AS n_edges,
       s.n_wedges,
       t.n_triangles,
       CAST(3 * t.n_triangles AS DOUBLE) / CAST(s.n_wedges AS DOUBLE)
           AS clustering_coeff
FROM stats s, tri t
"""


@register("x_graph_triangles", oracle=_TRI_ORACLE)
def x_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting on the part co-purchase graph (parts joined by
    co-appearing in ≥ 2 orders — the association-mining support
    threshold that prunes the singleton-pair hairball; without it the
    co-purchase graph is quadratically dense noise), using the
    degree-ordered orientation:
    each undirected edge points from its lower-(degree, id) endpoint to
    the higher one, giving a DAG where every triangle has exactly ONE
    node with out-edges to the other two — so the wedge join counts
    each triangle exactly once, and a node's wedge fan-out is its
    OUT-degree, which orientation bounds by O(√m). This is the
    standard distributed triangle algorithm (the reason 100 TB graph
    jobs don't enumerate Σd² wedges from hub nodes).

    Output is the one-row graph profile: nodes, edges, oriented wedge
    count, triangles, and the global clustering coefficient 3T/W (one
    IEEE division of exact integers — hash-stable).

    Execution: edge build is a self-join of lineitem on l_orderkey
    projected to part pairs + DISTINCT; degrees are one hash agg; the
    triangle join is (oriented ⋈ oriented on src) closed against the
    id-canonical edge set. Everything is equi-joins and hash
    aggregates — no windows, no Python. ``edges`` feeds five subtrees
    and ``oriented`` two, so both are materialized ONCE via eager
    localCheckpoint (the q_global_rank discipline — no leaked persist);
    without it the fact-table self-join would re-execute per subtree.
    """
    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()  # support counts DISTINCT orders, not lineitem rows
    )
    return triangle_stats(li)


def triangle_stats(li: DataFrame) -> DataFrame:
    """Core of :func:`x_graph_triangles` over any (l_orderkey,
    l_partkey) incidence frame (stress tests feed scaled copies)."""
    # Edge build via per-order baskets + in-row pairing (the
    # copurchase_edges recipe, guide §2.3): ONE orderkey shuffle
    # instead of both exchanges of the fact self-join; TPC-H baskets
    # are ≤ 7 lines, so the in-row pair fan-out is bounded. Each
    # (order, p1 < p2) pair appears exactly once either way, so the
    # support counts are identical.
    baskets = li.groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("parts")
    )
    edges = (
        baskets.select(F.explode("parts").alias("p1"), "parts")
        .select("p1", F.explode("parts").alias("p2"))
        .where(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= 2)
        .select("p1", "p2")
        .materialize(eager=True)
    )
    deg = (
        edges.select(F.col("p1").alias("p"))
        .unionAll(edges.select(F.col("p2").alias("p")))
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("p").alias("p1"), F.col("d").alias("da"))
    db = deg.select(F.col("p").alias("p2"), F.col("d").alias("db"))
    forward = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("p1") < F.col("p2"))
    )
    oriented = (
        edges.join(da, "p1")
        .join(db, "p2")
        .select(
            F.when(forward, F.col("p1")).otherwise(F.col("p2")).alias("src"),
            F.when(forward, F.col("p2")).otherwise(F.col("p1")).alias("dst"),
        )
        .materialize(eager=True)
    )
    # Wedge generation from per-src OUT-neighbor arrays (bounded O(√m)
    # by the orientation) instead of the oriented ⋈ oriented self-join:
    # one src shuffle, pairs generated inside the row — the same
    # (src, x < y) multiset the self-join produced.
    adj = oriented.groupBy("src").agg(F.collect_list("dst").alias("ds"))
    wedge_pairs = (
        adj.select(F.explode("ds").alias("x"), "ds")
        .select("x", F.explode("ds").alias("y"))
        .where(F.col("x") < F.col("y"))
    )
    tri = wedge_pairs.join(
        edges,
        (F.col("x") == F.col("p1")) & (F.col("y") == F.col("p2")),
        "left_semi",
    ).agg(F.count(F.lit(1)).alias("n_triangles"))
    stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum((F.col("d") * (F.col("d") - 1) / 2).cast("long")).alias("n_wedges"),
    )
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        stats.crossJoin(n_edges)
        .crossJoin(tri)
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            (
                (F.col("n_triangles") * 3).cast("double")
                / F.col("n_wedges").cast("double")
            ).alias("clustering_coeff"),
        )
    )


# ---------------------------------------------------------------------------
# q_moving_median — exact trailing moving median of the daily series
# ---------------------------------------------------------------------------

_MOVMED_ORACLE = """
WITH daily AS (
    SELECT CAST(ts AS DATE) AS day,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM events GROUP BY day
)
SELECT day,
       CAST(cents AS DOUBLE) / 100 AS revenue,
       CAST(median(cents) OVER (ORDER BY day
            ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) / 100
           AS med7
FROM daily
"""


@register("q_moving_median", oracle=_MOVMED_ORACLE)
def q_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trailing-7-row moving median of daily revenue — the
    robust trend line (one outlier day cannot drag it, unlike the
    trailing mean of ``q_window_range_frame``).

    Spark has no exact median window function, so the frame is
    materialized per row with ``collect_list`` over ROWS BETWEEN 6
    PRECEDING AND CURRENT ROW, sorted in-array, and the median read
    out in closed form (odd → middle; even → mean of the two middles,
    matching DuckDB's continuous interpolation). The frame is ≤7
    values of an already-aggregated DAY-grain series, so the array
    never exceeds 7 elements no matter the fact-table size — the
    aggregation did the data-scale work; the window is metadata-scale.
    Revenue is summed as exact cents; the only division is the final
    /100 on identical integers.
    """
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents")
    )
    w = Window.orderBy("day").rowsBetween(-6, 0)
    arr = F.array_sort(F.collect_list("cents").over(w))
    k = F.size(arr)
    odd_mid = F.element_at(arr, ((k + 1) / 2).cast("int"))
    even_lo = F.element_at(arr, (k / 2).cast("int"))
    even_hi = F.element_at(arr, (k / 2 + 1).cast("int"))
    med_cents = F.when(k % 2 == 1, odd_mid.cast("double")).otherwise(
        (even_lo + even_hi).cast("double") / 2
    )
    return daily.select(
        "day",
        (F.col("cents").cast("double") / 100).alias("revenue"),
        (med_cents / 100).alias("med7"),
    )


# ---------------------------------------------------------------------------
# x_anomaly_mad — median/MAD robust outlier detection
# ---------------------------------------------------------------------------

_MAD_ORACLE = """
WITH med AS (
    SELECT event_type, median(value) AS med
    FROM events GROUP BY event_type
), dev AS (
    SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS adev
    FROM events e JOIN med m USING (event_type)
), mad AS (
    SELECT event_type, median(adev) AS mad FROM dev GROUP BY event_type
)
SELECT d.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       ROUND(MAX(d.med), 4) AS med,
       ROUND(MAX(m.mad), 4) AS mad,
       CAST(SUM(CASE WHEN d.adev > 3 * 1.4826 * m.mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM dev d JOIN mad m USING (event_type)
GROUP BY d.event_type
"""


@register("x_anomaly_mad", oracle=_MAD_ORACLE)
def x_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per event type: flag values whose
    absolute deviation from the median exceeds 3 scaled MADs (the
    1.4826 factor makes MAD a consistent σ estimator under normality).
    Unlike ``q_anomaly_zscore``, a burst of extreme values cannot
    inflate the threshold and hide itself — median and MAD have a 50 %
    breakdown point.

    Two exact-median aggregates (value, then |value − med|) with the
    tiny per-type medians broadcast back between them, then one
    counting pass — three hash aggregates, two broadcast joins, no
    window over the fact table. Medians are exact (both engines
    interpolate the middle pair identically on identical doubles);
    the outlier predicate compares the same IEEE products.
    """
    e = load(spark, sf_dir, "events").select("event_type", "value")
    med = e.groupBy("event_type").agg(F.median("value").alias("med"))
    dev = e.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(F.median("adev").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.max("med"), 4).alias("med"),
            F.round(F.max("mad"), 4).alias("mad"),
            F.sum(
                F.when(
                    F.col("adev") > 3 * 1.4826 * F.col("mad"), 1
                ).otherwise(0)
            ).cast("bigint").alias("n_outliers"),
        )
    )
