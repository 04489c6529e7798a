"""Distributed connected components: alternating large-star / small-star.

The per-round min-label propagation in ``ops.extensions.x_dedup_clusters``
converges in diameter(G) rounds — fine for dedup graphs (tiny stars), but
a long-chain component needs as many shuffles as its length. This module
implements the alternating large-star/small-star algorithm (Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC'14 — public
algorithm), which converges in O(log n) rounds on ANY topology while
keeping the identical per-round plan shape: one groupBy-per-node shuffle
carrying (node, neighbor) longs only.

    large-star: every node u links its LARGER neighbors to the minimum
                of its neighborhood (incl. itself)
    small-star: every node u links its smaller-or-equal neighbors and
                itself to that minimum

Both halves strictly shrink the potential function Σ depth while keeping
component membership invariant; alternation reaches the fixpoint — every
component a star centered at its minimum id — in O(log n) alternations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon(edges: DataFrame) -> DataFrame:
    """Undirected edge set as canonical (lo, hi) pairs, self-loops out."""
    lo = F.least("a", "b").alias("a")
    hi = F.greatest("a", "b").alias("b")
    return edges.select(lo, hi).where(F.col("a") != F.col("b")).distinct()


def _large_star(edges: DataFrame) -> DataFrame:
    """(v, m) for every neighbor v > u, where m = min(N(u) ∪ {u})."""
    sym = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    grouped = sym.groupBy("a").agg(
        F.least(F.min("b"), F.first("a")).alias("m"),
        F.collect_list("b").alias("nbrs"),
    )
    return (
        grouped.select(
            "m", F.explode(F.filter("nbrs", lambda v: v > F.col("a"))).alias("v")
        )
        .select(F.col("v").alias("a"), F.col("m").alias("b"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """(v, m) for every neighbor v ≤ u plus u itself, m = their minimum."""
    # orient every edge toward the larger endpoint: (u = hi, nbr = lo)
    oriented = _canon(edges).select(
        F.col("b").alias("u"), F.col("a").alias("nbr")
    )
    grouped = oriented.groupBy("u").agg(
        F.min("nbr").alias("m"), F.collect_list("nbr").alias("nbrs")
    )
    linked = grouped.select(
        "m",
        F.explode(
            F.array_append(
                F.filter("nbrs", lambda v: v != F.col("m")), F.col("u")
            )
        ).alias("v"),
    ).select(F.col("v").alias("a"), F.col("m").alias("b"))
    return linked


def connected_components_star(
    edges: DataFrame, max_rounds: int = 30
) -> tuple[DataFrame, int]:
    """Component labels for an undirected edge list via large/small-star.

    Returns ``(labels, rounds)`` — labels is (id, label) with label = the
    component's minimum node id; rounds counts the alternations used.
    Convergence test: the canonical edge set is stable (count + both
    endpoint sums unchanged) — one tiny aggregate per round, no
    data-scale subtract. At trillion-edge scale each round is exactly two
    keyed shuffles of (long, long) pairs; nothing data-scale ever sits on
    the driver.
    """
    # localCheckpoint each round, not persist: persist caches DATA but
    # the logical plan still grows by one union+groupBy+explode+distinct
    # layer per round — after O(log n) rounds on a long chain the
    # accumulated lineage OOMs the driver during analysis (found by the
    # 4096-node chain stress test). Checkpointing truncates lineage so
    # every round plans against a flat scan — the same reason GraphX and
    # ALS checkpoint periodically; blocks are freed by the
    # ContextCleaner as `cur` is rebound each round.
    cur = _canon(edges).localCheckpoint(eager=True)
    prev_sig = None
    rounds = 0
    converged = False
    for _ in range(max_rounds):
        rounds += 1
        nxt = _canon(_small_star(_large_star(cur))).localCheckpoint(eager=True)
        sig = tuple(
            nxt.agg(
                F.count(F.lit(1)), F.sum("a"), F.sum("b")
            ).first()
        )
        cur = nxt
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    # The (count, Σa, Σb) signature is necessary, not sufficient — a
    # collision between two distinct edge sets (or max_rounds running
    # out) would silently yield wrong labels. Verify the star-forest
    # fixpoint ONCE: large-star must be the identity on a star forest.
    post = _canon(_large_star(cur))
    stable = post.exceptAll(cur).isEmpty() and cur.exceptAll(post).isEmpty()
    if not stable:
        raise RuntimeError(
            "connected_components_star: not at fixpoint after "
            f"{rounds} rounds"
            + ("" if converged else " (max_rounds exhausted)")
        )
    # fixpoint: every component is a star centered at its min id
    centers = cur.select(F.col("a").alias("id"), F.col("a").alias("label"))
    leaves = cur.select(F.col("b").alias("id"), F.col("a").alias("label"))
    labels = (
        centers.unionByName(leaves)
        .groupBy("id")
        .agg(F.min("label").alias("label"))
    )
    return labels, rounds
