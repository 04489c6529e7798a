"""Round-6 batch 31: sequential patterns + bounded graph expansion.

- ``x_sequence_mining`` — frequent ordered event-type patterns: for
  every (antecedent, consequent) pair occurring within ≤ {_SEQ_GAP}
  steps in a user's event stream, the occurrence count, the number of
  distinct users exhibiting it, and the mean step gap. The skip-gram
  generalization of q_path_transitions (which only sees ADJACENT
  transitions) — and it is built join-free: {_SEQ_GAP} ``lead``
  columns over the one sessionization window, not a per-user
  self-join.
- ``x_graph_2hop`` — friends-of-friends reach on the co-purchase part
  graph with a per-node degree cap of {_HOP_CAP}: for every part, the
  capped 1-hop degree and the count of distinct 2-hop parts reachable
  through the capped adjacency (excluding itself and its direct
  neighbors). The cap is the point: an uncapped 2-hop expansion is
  Σ d(mid)² — one hub part detonates it at 100×; capping bounds every
  node's contribution at {_HOP_CAP}² rows.

Reference parity: no analogue [REF-UNVERIFIED — /root/reference is
empty]; SURVEY §2.E/§2.J-M analytics + graph extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

_SEQ_GAP = 3  # max steps between antecedent and consequent
_HOP_CAP = 10  # per-node adjacency cap (deterministic: smallest part ids)

_SEQ_ORACLE = f"""
WITH leads AS (
    SELECT event_type AS a,
           user_id,
           lead(event_type, 1) OVER w AS b1,
           lead(event_type, 2) OVER w AS b2,
           lead(event_type, 3) OVER w AS b3
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), pairs AS (
    SELECT a, user_id, b1 AS b, 1 AS gap FROM leads WHERE b1 IS NOT NULL
    UNION ALL
    SELECT a, user_id, b2 AS b, 2 AS gap FROM leads WHERE b2 IS NOT NULL
    UNION ALL
    SELECT a, user_id, b3 AS b, 3 AS gap FROM leads WHERE b3 IS NOT NULL
)
SELECT a AS antecedent, b AS consequent,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       ROUND(CAST(SUM(gap) AS DOUBLE) / COUNT(*), 6) AS mean_gap
FROM pairs
GROUP BY a, b
"""


@register("x_sequence_mining", oracle=_SEQ_ORACLE)
def x_sequence_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential pattern counts: every ordered (antecedent,
    consequent) event-type pair occurring within ≤ {_SEQ_GAP} steps of
    a user's stream, with occurrence count, distinct-user support, and
    mean gap. q_path_transitions sees only ADJACENT steps; this is the
    skip-gram version a behavioral model actually consumes ("purchase
    follows view within 3 actions").

    Scale shape: the naive formulation is a per-user self-join with
    band predicate (seq_j − seq_i ≤ {_SEQ_GAP}) — a range join per
    user. Here it is {_SEQ_GAP} ``lead`` columns over ONE user window
    (the sessionization shuffle, reused), unioned narrowly and
    aggregated map-side into an event-type-domain-sized result
    (≤ 25 pattern rows). Gap sums are exact integers; the single
    division per output row is the only float. Scan-bound at 100 TB.
    """
    return sequence_mining_frame(load(spark, sf_dir, "events"))


def sequence_mining_frame(e: DataFrame) -> DataFrame:
    """Frame-level core of :func:`x_sequence_mining` (stress-testable
    on synthetic inputs)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    leads = e.select(
        F.col("event_type").alias("a"),
        "user_id",
        *[
            F.lead("event_type", k).over(w).alias(f"b{k}")
            for k in range(1, _SEQ_GAP + 1)
        ],
    )
    pairs = None
    for k in range(1, _SEQ_GAP + 1):
        part = leads.where(F.col(f"b{k}").isNotNull()).select(
            "a",
            "user_id",
            F.col(f"b{k}").alias("b"),
            F.lit(k).alias("gap"),
        )
        pairs = part if pairs is None else pairs.unionAll(part)
    return pairs.groupBy(
        F.col("a").alias("antecedent"), F.col("b").alias("consequent")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.round(F.sum("gap").cast("double") / F.count(F.lit(1)), 6).alias(
            "mean_gap"
        ),
    )


_HOP_ORACLE = f"""
WITH li AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), edges AS (
    SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
    FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
    WHERE a.l_partkey <> b.l_partkey
), capped AS (
    SELECT src, dst FROM (
        SELECT src, dst,
               ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) AS rn
        FROM edges
    ) WHERE rn <= {_HOP_CAP}
), two_hop AS (
    SELECT DISTINCT h1.src, h2.dst
    FROM capped h1 JOIN capped h2 ON h1.dst = h2.src
    WHERE h2.dst <> h1.src
), reach AS (
    SELECT t.src, CAST(COUNT(*) AS BIGINT) AS n_2hop
    FROM two_hop t
    LEFT JOIN capped c ON c.src = t.src AND c.dst = t.dst
    WHERE c.dst IS NULL
    GROUP BY t.src
)
SELECT c.src AS part, CAST(COUNT(*) AS BIGINT) AS n_1hop,
       COALESCE(MAX(r.n_2hop), 0) AS n_2hop
FROM capped c LEFT JOIN reach r ON r.src = c.src
GROUP BY c.src
"""


@register("x_graph_2hop", oracle=_HOP_ORACLE)
def x_graph_2hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-hop reach on the co-purchase part graph, degree-capped: each
    part keeps its {_HOP_CAP} smallest-id neighbors (deterministic
    cap), and reports that capped 1-hop degree plus how many DISTINCT
    parts are reachable in exactly two hops through the capped
    adjacency (self and direct neighbors excluded) — the
    friends-of-follows expansion behind every "customers also bought"
    candidate generator.

    Scale shape: basket pair-explosion is bounded by per-order item
    counts (TPC-H ≤ 7 lines/order → ≤ 42 directed pairs); the 2-hop
    join through the CAPPED adjacency is the defense that matters —
    uncapped it is Σ d(mid)², which one hub part detonates at 100×,
    capped every mid node contributes ≤ {_HOP_CAP}² rows. Exclusion of
    direct neighbors is a bounded left anti join on the same capped
    table. All shuffles hash on part keys; no row carries text or
    arrays.
    """
    return graph_2hop_frame(
        load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    )


def copurchase_edges(li_raw: DataFrame) -> DataFrame:
    """Directed co-purchase edge list (src, dst), both directions, via
    per-order collect_set + row-local double explode — one orderkey
    shuffle; baskets are TPC-H-small so in-row pairing is free. Shared
    by x_graph_2hop and the round6as graph statistics."""
    baskets = (
        li_raw.select("l_orderkey", "l_partkey")
        .distinct()
        .groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("parts"))
    )
    # Eager checkpoint: every consumer reads the edge list from at
    # least two plan branches (degrees + annotation joins, wedge
    # self-joins), and each unmaterialized reference re-runs the
    # basket build from the fact scan. Slim (src, dst) longs.
    return (
        baskets.select(F.explode("parts").alias("src"), "parts")
        .select("src", F.explode("parts").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .materialize(eager=True)
    )


def graph_2hop_frame(li_raw: DataFrame) -> DataFrame:
    """Frame-level core of :func:`x_graph_2hop` (stress-testable on
    synthetic (l_orderkey, l_partkey) edges).

    Edge build: per-order ``collect_set`` + row-local double explode,
    NOT a self-join on the orderkey — baskets are small (TPC-H ≤ 7
    lines), so pairing inside the row costs nothing, and the whole
    edge list needs ONE orderkey shuffle where the self-join paid the
    distinct's shuffle AND the join's (measured 1.7× at sf0.1).
    """
    edges = copurchase_edges(li_raw)
    rn = F.row_number().over(Window.partitionBy("src").orderBy("dst"))
    # Capped ADJACENCY LISTS, not capped edge rows (guide §2.3/§3.3):
    # the cap window already groups by src, so fold each node's <= CAP
    # neighbors into one array row on the same exchange. The 2-hop
    # expansion then joins edge rows against node-grain rows (CAP× fewer
    # probe-side rows than the old edge ⋈ edge self-join) and explodes
    # AFTER the join; the distinct-and-exclude step becomes a per-src
    # array fold (array_distinct minus self and direct neighbors) on ONE
    # groupBy — replacing the pair-grain distinct, the left-anti join,
    # the degree aggregate and the final outer join. Per-src state is
    # bounded by CAP² elements, the same bound the old pair space had.
    adj = (
        edges.withColumn("rn", rn)
        .where(F.col("rn") <= _HOP_CAP)
        .groupBy("src")
        .agg(F.collect_list("dst").alias("nbrs"))
        .materialize(eager=True)
    )
    mid_adj = adj.select(
        F.col("src").alias("mid"), F.col("nbrs").alias("nbrs2")
    )
    hop1 = adj.select("src", "nbrs", F.explode("nbrs").alias("mid"))
    per_src = (
        hop1.join(mid_adj, "mid")
        .groupBy("src")
        .agg(
            F.first("nbrs").alias("nbrs"),
            F.array_distinct(F.flatten(F.collect_list("nbrs2"))).alias("two"),
        )
    )
    n_2hop = F.size(
        F.array_except(
            F.col("two"), F.array_union("nbrs", F.array(F.col("src")))
        )
    )
    # every capped node has >= 1 neighbor, and every neighbor is itself
    # an edge source (the edge list holds both directions), so the inner
    # mid join never drops a src — per_src covers exactly adj's nodes.
    return per_src.select(
        F.col("src").alias("part"),
        F.size("nbrs").cast("long").alias("n_1hop"),
        n_2hop.cast("long").alias("n_2hop"),
    )
