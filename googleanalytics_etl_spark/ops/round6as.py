"""Round-6 batch 45: graph statistics — clustering coefficient,
degree assortativity.

- ``x_clustering_coef`` — per-node local clustering coefficient on
  the SUPPORT-FILTERED co-purchase part graph (edges need ≥ 2 shared
  orders — one-off co-occurrences are noise, and at sf0.1 they are
  ~99.7% of the raw edges): ``c_v = 2·T_v / (d_v·(d_v − 1))``.
  Triangles are enumerated ONCE each by degree orientation (the
  x_graph_triangles discipline: wedges only open from each node to
  its two HIGHER-ranked neighbors, bounding the join by Σ d_out² ≈
  m^1.5 instead of Σ d² — the hub defense), then credited to all
  three corners.
- ``x_assortativity`` — the degree-assortativity coefficient: the
  Pearson correlation of endpoint degrees across all directed edges.
  Positive = hubs link hubs (social), negative = hubs link leaves
  (hub-and-spoke). All moments are exact integers (degrees × edge
  count), so the single correlation expression is bit-identical in
  both engines.

Reference parity: no analogue [REF-UNVERIFIED — /root/reference is
empty]; SURVEY §2.J-M graph extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import register
from .round6ae import copurchase_edges

_EDGES_CTE = """
WITH li AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), edges AS (
    SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
    FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
    WHERE a.l_partkey <> b.l_partkey
)
"""

_CC_SUPPORT = 2  # min shared orders for a clustering edge

_CC_EDGES_CTE = f"""
WITH li AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), edges AS (
    -- support-filtered co-purchase graph: an edge needs >= {_CC_SUPPORT}
    -- shared orders. One-off co-occurrences are noise (at sf0.1 they
    -- inflate the raw graph to ~2.4M directed edges / avg degree 120);
    -- repeated co-purchase is the signal every market-basket analysis
    -- thresholds on, and it keeps the triangle mass data-bounded.
    SELECT a.l_partkey AS src, b.l_partkey AS dst
    FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
    WHERE a.l_partkey <> b.l_partkey
    GROUP BY a.l_partkey, b.l_partkey
    HAVING COUNT(*) >= {_CC_SUPPORT}
)
"""

_CC_ORACLE = (
    _CC_EDGES_CTE
    + """
, deg AS (
    SELECT src AS v, CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY src
), oriented AS (
    -- orient each undirected edge from the lower (d, id) rank to the
    -- higher: every triangle becomes exactly one oriented wedge + one
    -- closing check
    SELECT e.src AS u, e.dst AS v
    FROM edges e
    JOIN deg du ON du.v = e.src
    JOIN deg dv ON dv.v = e.dst
    WHERE (du.d, e.src) < (dv.d, e.dst)
), tri AS (
    SELECT w1.u AS a, w1.v AS b, w2.v AS c
    FROM oriented w1
    JOIN oriented w2 ON w2.u = w1.v
    JOIN oriented w3 ON w3.u = w1.u AND w3.v = w2.v
), credit AS (
    SELECT a AS v FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri
), tcount AS (
    SELECT v, CAST(COUNT(*) AS BIGINT) AS t FROM credit GROUP BY v
)
SELECT deg.v AS part, deg.d AS degree,
       COALESCE(t.t, 0) AS triangles,
       CASE WHEN deg.d >= 2
            THEN ROUND(2.0 * COALESCE(t.t, 0) / (deg.d * (deg.d - 1)), 6)
            ELSE 0.0 END AS clustering
FROM deg LEFT JOIN tcount t ON t.v = deg.v
"""
)


def _support_edges(li_raw: DataFrame) -> DataFrame:
    """Directed co-purchase edges with ≥ {_CC_SUPPORT} shared orders
    (the same per-order collect_set build as copurchase_edges, plus
    the support cut on the pair count)."""
    baskets = (
        li_raw.select("l_orderkey", "l_partkey")
        .distinct()
        .groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("parts"))
    )
    # Eager checkpoint (support-filtered list is ~7k rows at sf0.1):
    # consumers read it from 2+ branches and would otherwise re-run
    # the basket build per reference.
    return (
        baskets.select(F.explode("parts").alias("src"), "parts")
        .select("src", F.explode("parts").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
        .where(F.col("w") >= _CC_SUPPORT)
        .select("src", "dst")
        .materialize(eager=True)
    )


@register("x_clustering_coef", oracle=_CC_ORACLE)
def x_clustering_coef(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per part on the SUPPORT-FILTERED
    co-purchase graph (edges need ≥ {_CC_SUPPORT} shared orders): how
    many of each node's neighbor pairs are themselves connected.
    Thresholding is both the semantics and the scale defense — one-off
    co-occurrences are noise (the raw graph at sf0.1 has ~2.4M
    directed edges, avg degree 120, and 83M oriented wedges; the
    support-2 graph has ~7k edges of actual repeat-co-purchase
    signal), exactly the support cut every market-basket analysis
    applies before graph metrics. Triangle enumeration is then
    degree-ORIENTED — each undirected edge points from its lower
    (degree, id) endpoint, every triangle found once, wedge join
    bounded by Σ d_out² ≲ m^1.5 on the FILTERED m (the
    x_graph_triangles discipline) — and credited to all 3 corners.

    Scale shape: one orderkey shuffle builds weighted pairs, the
    HAVING cut is map-side-combinable, degrees/orientation are
    broadcast-size joins, the 3-corner credit a narrow union + count.
    Output is filtered-node-domain sized. Scan-bound at 100 TB.
    """
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = _support_edges(li)
    deg = edges.groupBy(F.col("src").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    du = deg.select(F.col("v").alias("src"), F.col("d").alias("d_src"))
    dv = deg.select(F.col("v").alias("dst"), F.col("d").alias("d_dst"))
    oriented = (
        edges.join(F.broadcast(du), "src")
        .join(F.broadcast(dv), "dst")
        .where(
            (F.col("d_src") < F.col("d_dst"))
            | (
                (F.col("d_src") == F.col("d_dst"))
                & (F.col("src") < F.col("dst"))
            )
        )
        .select(F.col("src").alias("u"), F.col("dst").alias("v"))
        # three wedge-join branches read this — materialize once
        .materialize(eager=True)
    )
    w2 = oriented.select(F.col("u").alias("u2"), F.col("v").alias("v2"))
    w3 = oriented.select(F.col("u").alias("u3"), F.col("v").alias("v3"))
    tri = (
        oriented.join(w2, oriented.v == w2.u2)
        .join(w3, (F.col("u") == F.col("u3")) & (F.col("v2") == F.col("v3")))
        .select("u", "v", "v2")
    )
    credit = (
        tri.select(F.col("u").alias("cv"))
        .unionAll(tri.select(F.col("v").alias("cv")))
        .unionAll(tri.select(F.col("v2").alias("cv")))
    )
    tcount = credit.groupBy(F.col("cv").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("t")
    )
    return deg.join(tcount, "v", "left").select(
        F.col("v").alias("part"),
        F.col("d").alias("degree"),
        F.coalesce(F.col("t"), F.lit(0)).cast("long").alias("triangles"),
        F.when(
            F.col("d") >= 2,
            F.round(
                2.0
                * F.coalesce(F.col("t"), F.lit(0))
                / (F.col("d") * (F.col("d") - 1)),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("clustering"),
    )


_ASSORT_ORACLE = (
    _EDGES_CTE
    + """
, deg AS (
    SELECT src AS v, CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY src
), pairs AS (
    SELECT du.d AS x, dv.d AS y
    FROM edges e
    JOIN deg du ON du.v = e.src
    JOIN deg dv ON dv.v = e.dst
), m AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS BIGINT) AS sx,
           CAST(SUM(y) AS BIGINT) AS sy,
           CAST(SUM(x * x) AS BIGINT) AS sxx,
           CAST(SUM(y * y) AS BIGINT) AS syy,
           CAST(SUM(x * y) AS BIGINT) AS sxy
    FROM pairs
)
SELECT n AS n_edges,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
           AS assortativity
FROM m
"""
)


@register("x_assortativity", oracle=_ASSORT_ORACLE)
def x_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the co-purchase graph: Pearson
    correlation of endpoint degrees over all directed edges (the
    directed list already contains each undirected edge both ways, so
    the estimator is symmetric by construction). Every moment is an
    exact integer — the correlation is one division of identical
    operands in both engines.

    Scale shape: degrees are one aggregate; the two degree
    annotations broadcast (node-domain); the moment pass is map-side
    combinable over the edge list. One row out. Scan-bound at 100 TB.
    """
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = copurchase_edges(li)
    deg = edges.groupBy(F.col("src").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    du = deg.select(F.col("v").alias("src"), F.col("d").alias("x"))
    dv = deg.select(F.col("v").alias("dst"), F.col("d").alias("y"))
    pairs = edges.join(F.broadcast(du), "src").join(F.broadcast(dv), "dst")
    m = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    dx = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    )
    dy = F.sqrt(
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return m.select(
        F.col("n").alias("n_edges"),
        F.round(num / (dx * dy), 6).alias("assortativity"),
    )
