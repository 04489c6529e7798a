"""Round-6 batch 25: link analysis and seasonality — HITS, dow×hour.

- ``x_hits`` — Kleinberg's HITS (hubs & authorities) over the
  within-session event-type transition graph, two full unrolled
  mutual-reinforcement iterations. Unlike the textbook formulation
  (normalize each step), the iterates here stay UNNORMALIZED exact
  integers — a₁ = in-weight, h₁ = Σ n·a₁, a₂ = Σ n·h₁, h₂ = Σ n·a₂ —
  in DECIMAL(38,0), and only the final shares divide. L1-normalizing
  at the end is algebraically identical to normalizing every step
  (the iteration is linear), so this buys bit-exact cross-engine
  parity for free. Complements x_pagerank (random-walk centrality)
  with the bipartite navigation-hub/content-authority split.
- ``x_seasonal_profile`` — the 168-cell day-of-week × hour-of-day
  traffic profile: event count, share, seasonal index (share × 168,
  1.0 = flat), and mean event value per cell, on a dense spine so
  silent cells still appear. Day/hour derive from epoch arithmetic
  ((day+4) mod 7, Thursday anchor), never from engine-local calendar
  functions whose week conventions differ.

Reference parity: no analogue [REF-UNVERIFIED — /root/reference is
empty]; SURVEY §2.E/J-M GA-analytics extensions (x_pagerank,
q_sessionize, x_time_decay family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register
from .flagship import _SESSIONIZED_CTE

_HITS_ORACLE = _SESSIONIZED_CTE + """
, hops AS (
    SELECT u, v FROM (
        SELECT LAG(event_type) OVER (PARTITION BY user_id, session_id
                                     ORDER BY ts, event_id) AS u,
               event_type AS v
        FROM sess
    ) WHERE u IS NOT NULL
), edges AS (
    SELECT u, v, CAST(COUNT(*) AS DECIMAL(18,0)) AS n
    FROM hops GROUP BY u, v
), nodes AS (
    SELECT DISTINCT event_type AS node FROM events
), a1 AS (
    SELECT node, COALESCE(s, CAST(0 AS DECIMAL(18,0))) AS a1 FROM nodes
    LEFT JOIN (SELECT v, CAST(SUM(n) AS DECIMAL(18,0)) AS s
               FROM edges GROUP BY v) t ON t.v = node
), h1 AS (
    SELECT node, COALESCE(s, CAST(0 AS DECIMAL(38,0))) AS h1 FROM nodes
    LEFT JOIN (SELECT e.u, CAST(SUM(e.n * a.a1) AS DECIMAL(38,0)) AS s
               FROM edges e JOIN a1 a ON a.node = e.v GROUP BY e.u) t
        ON t.u = node
), a2 AS (
    SELECT node, COALESCE(s, CAST(0 AS DECIMAL(38,0))) AS a2 FROM nodes
    LEFT JOIN (SELECT e.v, CAST(SUM(e.n * h.h1) AS DECIMAL(38,0)) AS s
               FROM edges e JOIN h1 h ON h.node = e.u GROUP BY e.v) t
        ON t.v = node
), h2 AS (
    SELECT node, COALESCE(s, CAST(0 AS DECIMAL(38,0))) AS h2 FROM nodes
    LEFT JOIN (SELECT e.u, CAST(SUM(e.n * a.a2) AS DECIMAL(38,0)) AS s
               FROM edges e JOIN a2 a ON a.node = e.v GROUP BY e.u) t
        ON t.u = node
), tots AS (
    SELECT (SELECT SUM(a2) FROM a2) AS ta, (SELECT SUM(h2) FROM h2) AS th
)
SELECT n.node AS event_type,
       CAST(a1.a1 AS BIGINT) AS in_w,
       CAST(COALESCE(ow.s, 0) AS BIGINT) AS out_w,
       ROUND(CAST(a2.a2 AS DOUBLE) / CAST(t.ta AS DOUBLE), 6)
           AS auth_share,
       ROUND(CAST(h2.h2 AS DOUBLE) / CAST(t.th AS DOUBLE), 6)
           AS hub_share
FROM nodes n
JOIN a1 ON a1.node = n.node
JOIN a2 ON a2.node = n.node
JOIN h2 ON h2.node = n.node
LEFT JOIN (SELECT u, CAST(SUM(n) AS DECIMAL(18,0)) AS s
           FROM edges GROUP BY u) ow ON ow.u = n.node
CROSS JOIN tots t
ORDER BY n.node
"""


@register("x_hits", oracle=_HITS_ORACLE)
def x_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities on the session transition graph, two
    unrolled iterations kept in exact integer arithmetic (the linear
    iteration commutes with the final L1 normalization, so shares are
    identical to the per-step-normalized classic). Emits in/out
    transition weight as integer evidence plus the final
    authority/hub shares.

    Scale shape: the event log is touched once (the sessionize
    shuffle); every iteration is one hash join + map-side-combinable
    aggregate on the reduced EDGE table (|types|² here, page-graph
    sized in general) — the same loop ships billion-edge graphs, with
    ``localCheckpoint`` every ~10 iterations for lineage. No window,
    no collect; the node table stays distributed. DECIMAL(38,0)
    headroom: h₂ ≤ (Σn)⁴ keeps exact to Σn ≈ 10⁹ transitions per
    type-graph; page-level graphs normalize once mid-way.
    """
    from .flagship import sessionize

    e = load(spark, sf_dir, "events")
    s = sessionize(e)
    wlag = Window.partitionBy("user_id", "session_id").orderBy(
        "ts", "event_id"
    )
    hops = s.select(
        F.lag("event_type").over(wlag).alias("u"),
        F.col("event_type").alias("v"),
    ).where(F.col("u").isNotNull())
    # |types|²-bounded edge table, materialized ONCE: it feeds FIVE plan
    # branches (in_w, out_w, three _step iterations) and each
    # unmaterialized reference re-ran the events-scale sessionize window
    # behind it; nodes likewise feeds every iteration's outer join.
    edges = hops.groupBy("u", "v").agg(
        F.count(F.lit(1)).cast("decimal(18,0)").alias("n")
    ).materialize(eager=True)
    nodes = e.select(F.col("event_type").alias("node")).distinct().materialize(
        eager=True
    )

    def _step(prev: DataFrame, val: str, src: str, dst: str, out: str
              ) -> DataFrame:
        """One half-iteration: out(dst) = Σ_edges n · prev(src)."""
        agg = (
            edges.join(prev, prev.node == F.col(src))
            .groupBy(F.col(dst).alias("k"))
            .agg(F.sum(F.col("n") * F.col(val)).cast("decimal(38,0)").alias("s"))
        )
        return nodes.join(agg, nodes.node == F.col("k"), "left").select(
            "node",
            F.coalesce(F.col("s"), F.lit(0).cast("decimal(38,0)")).alias(out),
        )

    in_w = (
        edges.groupBy(F.col("v").alias("k"))
        .agg(F.sum("n").cast("decimal(18,0)").alias("s"))
    )
    a1 = nodes.join(in_w, nodes.node == F.col("k"), "left").select(
        "node",
        F.coalesce(F.col("s"), F.lit(0).cast("decimal(18,0)")).alias("a1"),
    )
    h1 = _step(a1, "a1", "v", "u", "h1")
    a2 = _step(h1, "h1", "u", "v", "a2")
    h2 = _step(a2, "a2", "v", "u", "h2")
    out_w = (
        edges.groupBy(F.col("u").alias("k"))
        .agg(F.sum("n").cast("decimal(18,0)").alias("so"))
    )
    ta = a2.agg(F.sum("a2").alias("ta"))
    th = h2.agg(F.sum("h2").alias("th"))
    return (
        nodes.join(a1, "node")
        .join(a2, "node")
        .join(h2, "node")
        .join(out_w, nodes.node == F.col("k"), "left")
        .crossJoin(F.broadcast(ta))
        .crossJoin(F.broadcast(th))
        .select(
            F.col("node").alias("event_type"),
            F.col("a1").cast("long").alias("in_w"),
            F.coalesce(F.col("so"), F.lit(0)).cast("long").alias("out_w"),
            F.round(
                F.col("a2").cast("double") / F.col("ta").cast("double"), 6
            ).alias("auth_share"),
            F.round(
                F.col("h2").cast("double") / F.col("th").cast("double"), 6
            ).alias("hub_share"),
        )
        .orderBy("event_type")
    )


_SEASONAL_ORACLE = """
WITH e AS (
    SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS es,
           CAST(value AS DECIMAL(18,4)) AS val
    FROM events
), cells AS (
    SELECT ((es // 86400) + 4) % 7 AS dow,
           (es % 86400) // 3600 AS hod,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(val) AS DECIMAL(38,4)) AS sv
    FROM e GROUP BY 1, 2
), tot AS (
    SELECT CAST(SUM(n) AS BIGINT) AS t FROM cells
), spine AS (
    SELECT CAST(d AS BIGINT) AS dow, CAST(h AS BIGINT) AS hod
    FROM generate_series(0, 6) AS sd(d), generate_series(0, 23) AS sh(h)
)
SELECT s.dow, s.hod,
       CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events,
       ROUND(CAST(COALESCE(c.n, 0) AS DOUBLE) / t.t, 6) AS share,
       ROUND(CAST(COALESCE(c.n, 0) AS DOUBLE) * 168.0 / t.t, 6)
           AS seasonal_index,
       ROUND(CAST(c.sv AS DOUBLE) / c.n, 6) AS avg_value
FROM spine s
LEFT JOIN cells c ON c.dow = s.dow AND c.hod = s.hod
CROSS JOIN tot t
ORDER BY s.dow, s.hod
"""


@register("x_seasonal_profile", oracle=_SEASONAL_ORACLE)
def x_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour-of-day traffic profile on a dense 168-cell
    spine: count, share, seasonal index (share × 168 — 1.0 means a
    perfectly flat week), and mean event value. Empty cells appear
    with zero count and NULL mean. dow/hod derive from pure epoch
    arithmetic ((epoch_day+4) mod 7 anchors Thursday=4, Sunday=0) —
    engine calendar functions disagree on week start and are never
    consulted. Value sums follow the DECIMAL(18,4) exact-sum
    convention.

    Scale shape: one map-side-combinable 168-group aggregate over the
    scan; the spine join, total, and every derived column live on the
    fixed 168-row domain. At 100 TB this is scan-bound — the profile
    itself is free. The 168-cell result is the input the
    capacity-planning and anomaly baselines (x_ewma, x_anomaly_zscore)
    consume.
    """
    e = load(spark, sf_dir, "events").select(
        F.expr("unix_micros(cast(ts as timestamp)) div 1000000").alias("es"),
        F.col("value").cast("decimal(18,4)").alias("val"),
    )
    cells = (
        e.select(
            F.expr("((es div 86400) + 4) % 7").cast("long").alias("dow"),
            F.expr("(es % 86400) div 3600").cast("long").alias("hod"),
            "val",
        )
        .groupBy("dow", "hod")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("val").cast("decimal(38,4)").alias("sv"),
        )
    )
    tot = cells.agg(F.sum("n").cast("long").alias("t"))
    spine = (
        spark.range(0, 7)
        .select(F.col("id").alias("dow"))
        .crossJoin(spark.range(0, 24).select(F.col("id").alias("hod")))
    )
    return (
        spine.join(cells, ["dow", "hod"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "dow",
            "hod",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
            F.round(
                F.coalesce(F.col("n"), F.lit(0)).cast("double") / F.col("t"),
                6,
            ).alias("share"),
            F.round(
                F.coalesce(F.col("n"), F.lit(0)).cast("double")
                * 168.0
                / F.col("t"),
                6,
            ).alias("seasonal_index"),
            F.round(F.col("sv").cast("double") / F.col("n"), 6).alias(
                "avg_value"
            ),
        )
        .orderBy("dow", "hod")
    )
