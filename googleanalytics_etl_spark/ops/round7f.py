"""Round-7 batch 6: bounded-iteration k-core decomposition.

- ``x_kcore_peel`` — three unrolled peeling rounds toward the k=3 core
  of the part co-purchase graph (the x_graph_triangles support-≥2
  edge set): each round recomputes degrees over the surviving edges,
  drops nodes below k, and restricts edges to surviving endpoints.
  Emits the (round, nodes, edges) shrink profile — the denoising curve
  community detection and spam-graph triage read. Fixed-depth
  unrolling keeps the full SQL oracle (true fixpoint iteration is not
  SQL-expressible; 3 rounds removes the overwhelming majority of the
  periphery on real graphs, and the profile shows the marginal round
  shrink so a caller can size the depth).

Reference parity: no analogue [REF-UNVERIFIED — /root/reference is
empty]; SURVEY §2 graph-ops extension beside x_graph_triangles /
x_cc_sizes / x_clustering_coef.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

_KCORE_K = 3
_KCORE_ROUNDS = 3

# every CTE is AS MATERIALIZED (DuckDB-only syntax; the oracle runs in
# DuckDB only): each e_r is referenced by d_{r+1} (twice via the
# degree UNION ALL), e_{r+1}, and two stat subqueries — default
# inlining re-expands the chain multiplicatively (observed: the sf0.1
# oracle spilled the disk), materialization evaluates each round once
_EDGES_CTE = """
li AS MATERIALIZED (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), e0 AS MATERIALIZED (
    SELECT p1, p2 FROM (
        SELECT a.l_partkey AS p1, b.l_partkey AS p2
        FROM li a JOIN li b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ) GROUP BY p1, p2 HAVING COUNT(*) >= 2
)"""


def _kcore_oracle() -> str:
    k, rounds = _KCORE_K, _KCORE_ROUNDS
    sql = "WITH " + _EDGES_CTE
    stats = [
        "SELECT CAST(0 AS BIGINT) AS round, "
        "CAST((SELECT COUNT(*) FROM (SELECT p1 FROM e0 UNION "
        "SELECT p2 FROM e0)) AS BIGINT) AS nodes, "
        "CAST((SELECT COUNT(*) FROM e0) AS BIGINT) AS edges"
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        sql += f""",
d{r} AS MATERIALIZED (
    SELECT node, COUNT(*) AS deg FROM (
        SELECT p1 AS node FROM e{p}
        UNION ALL SELECT p2 FROM e{p}
    ) GROUP BY node
), k{r} AS MATERIALIZED (SELECT node FROM d{r} WHERE deg >= {k}),
e{r} AS MATERIALIZED (
    SELECT e.p1, e.p2 FROM e{p} e
    JOIN k{r} a ON e.p1 = a.node
    JOIN k{r} b ON e.p2 = b.node
)"""
        stats.append(
            f"SELECT CAST({r} AS BIGINT) AS round, "
            f"CAST((SELECT COUNT(*) FROM (SELECT p1 FROM e{r} UNION "
            f"SELECT p2 FROM e{r})) AS BIGINT) AS nodes, "
            f"CAST((SELECT COUNT(*) FROM e{r}) AS BIGINT) AS edges"
        )
    return sql + "\n" + "\nUNION ALL ".join(stats)


@register("x_kcore_peel", oracle=_kcore_oracle())
def x_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core peeling ({r} rounds toward the k={k} core) of the part
    co-purchase graph: per round, degree-filter nodes (< k gone) and
    restrict edges to survivors; emit (round, nodes, edges) including
    the round-0 baseline. Fixed-depth unrolling (not a fixpoint loop)
    keeps the full cross-engine oracle; the emitted shrink profile is
    how a caller decides whether more rounds would still move anything.

    Scale shape: the edge build is the one data-scale stage (order-key
    self-join + support aggregate — the x_graph_triangles shape); each
    peel round is a degree hash-aggregate over current edges plus two
    semi-join-shaped hash joins, all edge-grain. Surviving edge frames
    are localCheckpointed per round (d-row truncation — the
    x_power_iteration lineage discipline), so round r never re-executes
    rounds < r.
    """
    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("p1"),
            F.col("b.l_partkey").alias("p2"),
        )
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= 2)
        .select("p1", "p2")
        .materialize(eager=True)
    )

    def stats(e: DataFrame) -> tuple[int, int]:
        # ONE aggregate job per census: explode each edge into its two
        # endpoints, then edges = rows/2 and nodes = distinct endpoints
        # in the same pass (was two separate actions per round — a
        # union+distinct+count plus a count — pure job-count overhead
        # on a loop whose frames are edge-grain).
        row = (
            e.select(F.explode(F.array("p1", "p2")).alias("node"))
            .agg(
                (F.count(F.lit(1)) / 2).cast("long").alias("edges"),
                F.countDistinct("node").alias("nodes"),
            )
            .first()
        )
        return int(row["nodes"]), int(row["edges"])

    census = [(0, *stats(edges))]
    e = edges
    for r in range(1, _KCORE_ROUNDS + 1):
        deg = (
            e.select(F.col("p1").alias("node"))
            .unionAll(e.select(F.col("p2").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.where(F.col("deg") >= _KCORE_K).select("node")
        e = (
            e.join(keep.withColumnRenamed("node", "p1"), "p1")
            .join(keep.withColumnRenamed("node", "p2"), "p2")
            .select("p1", "p2")
            .materialize(eager=True)
        )
        census.append((r, *stats(e)))
    return spark.createDataFrame(
        [(r, n, m) for r, n, m in census],
        "round bigint, nodes bigint, edges bigint",
    )


x_kcore_peel.__doc__ = x_kcore_peel.__doc__.format(
    r=_KCORE_ROUNDS, k=_KCORE_K
)
