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
    cur = _canon(edges).materialize(eager=True)
    prev_sig = None
    rounds = 0
    converged = False
    for _ in range(max_rounds):
        rounds += 1
        nxt = _canon(_small_star(_large_star(cur))).materialize(eager=True)
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


def kcore(edges: DataFrame, k: int, max_rounds: int = 200) -> tuple[DataFrame, int]:
    """The k-core of an undirected edge list, peeled to CONVERGENCE.

    The registered ``x_kcore_peel`` (ops/round7f.py) unrolls a fixed 3
    rounds so it can carry a full cross-engine SQL oracle; this is the
    library form for callers that need the true core — e.g. a pendant
    chain of length L takes ~L/2 rounds to dissolve, which no fixed
    depth covers. Per round: one degree hash-aggregate over current
    edges plus two semi joins restricting edges to surviving endpoints,
    all edge-grain (the x_kcore_peel plan shape), localCheckpointed so
    round r never re-executes rounds < r (the connected_components_star
    lineage discipline).

    Convergence is EXACT, not a signature: each round's edge set is a
    subset of the previous one, so an unchanged count means an
    identical set — and an unchanged set means no node fell below k,
    i.e. every remaining degree is ≥ k (the k-core fixpoint).

    Returns ``(core_edges, rounds)`` — canonical (a, b) pairs of the
    k-core (possibly empty), and the number of peel rounds executed
    including the one that observed the fixpoint.
    """
    cur = _canon(edges).materialize(eager=True)
    n_cur = cur.count()
    rounds = 0
    for _ in range(max_rounds):
        if n_cur == 0:
            return cur, rounds
        deg = (
            cur.select(F.col("a").alias("v"))
            .unionAll(cur.select(F.col("b").alias("v")))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.where(F.col("deg") >= k).select("v")
        nxt = (
            cur.join(keep.select(F.col("v").alias("a")), "a", "left_semi")
            .join(keep.select(F.col("v").alias("b")), "b", "left_semi")
            .select("a", "b")
            .materialize(eager=True)
        )
        rounds += 1
        n_nxt = nxt.count()
        if n_nxt == n_cur:
            return nxt, rounds
        cur, n_cur = nxt, n_nxt
    raise RuntimeError(f"kcore: no fixpoint after {max_rounds} rounds")


def top_eigvec(
    gram: DataFrame,
    d: int,
    tol: float = 1e-9,
    max_iters: int = 500,
) -> tuple[list[float], float, int]:
    """Dominant eigenvector of a symmetric PSD d×d matrix given as
    (i, j, gv) rows, by power iteration to TOLERANCE.

    The registered ``x_power_iteration`` (ops/round7d.py) unrolls a
    fixed 3 steps so every term can be DECIMAL-quantized into a full
    cross-engine hash oracle; this is the library form for callers that
    need convergence. Per step one distributed matvec (gram joined
    against the broadcast d-row iterate, groupBy(i) sum); the iterate
    itself is bounded metadata (d doubles on the driver — the
    bloom-manifest collect contract), so the driver-side normalize +
    delta test costs nothing at any data scale. The Gram frame is the
    only data-derived input and is built ONCE by the caller (one
    data-scale aggregate); iteration never touches raw data again.

    PSD matrix + strictly positive start vector pin the sign (no
    eigenvector sign ambiguity). Convergence: max_j |v_{t+1} - v_t|
    ≤ tol. Returns ``(v, eigenvalue, iters)`` with the Rayleigh
    quotient as the eigenvalue estimate.
    """
    spark = gram.sparkSession
    g = gram.select("i", "j", "gv").persist()
    try:
        v = [1.0 / d**0.5] * d
        iters = 0
        for _ in range(max_iters):
            vdf = spark.createDataFrame(
                [(j, x) for j, x in enumerate(v)], "j long, vv double"
            )
            y = {
                int(r["i"]): float(r["yv"])
                for r in g.join(F.broadcast(vdf), "j")
                .groupBy("i")
                .agg(F.sum(F.col("gv") * F.col("vv")).alias("yv"))
                .collect()
            }
            yv = [y.get(i, 0.0) for i in range(d)]
            nrm = sum(x * x for x in yv) ** 0.5
            if nrm == 0.0:
                raise ValueError("top_eigvec: zero matvec (null matrix?)")
            nxt = [x / nrm for x in yv]
            iters += 1
            if max(abs(a - b) for a, b in zip(nxt, v)) <= tol:
                v = nxt
                break
            v = nxt
        else:
            raise RuntimeError(
                f"top_eigvec: no convergence to {tol} in {max_iters} iters"
            )
        # Rayleigh quotient λ = vᵀGv (v already unit-norm)
        vdf = spark.createDataFrame(
            [(j, x) for j, x in enumerate(v)], "j long, vv double"
        )
        va = vdf.select(F.col("j").alias("i"), F.col("vv").alias("va"))
        lam = float(
            g.join(F.broadcast(va), "i")
            .join(F.broadcast(vdf), "j")
            .agg(F.sum(F.col("gv") * F.col("va") * F.col("vv")).alias("l"))
            .first()["l"]
        )
        return v, lam, iters
    finally:
        g.unpersist()
