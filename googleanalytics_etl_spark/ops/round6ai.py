"""Round-6 batch 35: metric decomposition + item-item similarity.

- ``x_mix_shift`` — rate/mix decomposition of a period-over-period
  metric change (the Oaxaca–Blinder / "metrics tree" decomposition):
  the change in overall mean value between the two fixture
  half-months splits per segment into a *rate* effect (segments got
  better/worse), a *mix* effect (traffic shifted between segments),
  and the interaction residual. Answers the postmortem question "did the
  metric drop because conversion fell, or because traffic mix
  shifted?" — and the three effects sum EXACTLY to the total change.
- ``x_item_cf`` — item-item collaborative filtering on the events
  item key (``props.k``): cosine similarity between items from
  per-user interaction counts, with each user's item set capped at
  their top-{_CF_CAP} items so the per-user pair explosion is
  bounded at {_CF_CAP}² — the classic defense that keeps a crawler
  account or bot from detonating the co-visitation join.

Reference parity: no analogue [REF-UNVERIFIED — /root/reference is
empty]; SURVEY §2.E analytics / §2.J-M similarity extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

_MIX_SPLIT = "2024-01-16"  # period boundary (first/second half-month)
_CF_CAP = 20  # per-user item cap
_CF_TOPK = 5  # neighbors kept per item

_MIX_ORACLE = f"""
WITH seg AS (
    SELECT event_type,
           CASE WHEN ts < TIMESTAMP '{_MIX_SPLIT}' THEN 1 ELSE 2 END AS p,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(28,4)) AS s
    FROM events GROUP BY 1, 2
), tot AS (
    SELECT p, CAST(SUM(n) AS BIGINT) AS nt FROM seg GROUP BY p
), m AS (
    SELECT seg.event_type,
           MAX(CASE WHEN seg.p = 1
                    THEN CAST(seg.n AS DOUBLE) / tot.nt END) AS w1,
           MAX(CASE WHEN seg.p = 2
                    THEN CAST(seg.n AS DOUBLE) / tot.nt END) AS w2,
           MAX(CASE WHEN seg.p = 1
                    THEN CAST(seg.s AS DOUBLE) / seg.n END) AS r1,
           MAX(CASE WHEN seg.p = 2
                    THEN CAST(seg.s AS DOUBLE) / seg.n END) AS r2
    FROM seg JOIN tot ON tot.p = seg.p
    GROUP BY seg.event_type
)
SELECT event_type,
       ROUND(w1, 6) AS w1, ROUND(w2, 6) AS w2,
       ROUND(r1, 6) AS r1, ROUND(r2, 6) AS r2,
       ROUND(w1 * (r2 - r1), 6) AS rate_effect,
       ROUND((w2 - w1) * r1, 6) AS mix_effect,
       ROUND((w2 - w1) * (r2 - r1), 6) AS interaction,
       ROUND(w2 * r2 - w1 * r1, 6) AS total_contrib
FROM m
"""


@register("x_mix_shift", oracle=_MIX_ORACLE)
def x_mix_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate/mix decomposition of the period-over-period change in mean
    event value, per segment (event type): ``Δ contribution =
    w1·Δr (rate) + Δw·r1 (mix) + Δw·Δr (interaction)``, which sums
    exactly to ``w2·r2 − w1·r1`` — the identity every metrics-tree
    tool guarantees and tests here pin. Weights are segment shares of
    events; rates are mean value per segment; both periods come from
    the fixture's two half-months.

    Scale shape: ONE map-side-combinable (segment, period) aggregate
    over the scan (counts + DECIMAL-exact sums), a 2-row period-total
    aggregate broadcast back, then pure column algebra on the
    segment-domain frame. Every effect is a fixed-shape double
    expression on exact operands — identical in both engines.
    Scan-bound at 100 TB.
    """
    e = load(spark, sf_dir, "events")
    p = F.when(
        F.col("ts") < F.lit(_MIX_SPLIT).cast("timestamp_ntz"), 1
    ).otherwise(2)
    seg = e.groupBy("event_type", p.alias("p")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("value").cast("decimal(18,4)"))
        .cast("decimal(28,4)")
        .alias("s"),
    )
    tot = seg.groupBy("p").agg(F.sum("n").cast("long").alias("nt"))
    m = (
        seg.join(F.broadcast(tot), "p")
        .groupBy("event_type")
        .agg(
            F.max(
                F.when(
                    F.col("p") == 1,
                    F.col("n").cast("double") / F.col("nt"),
                )
            ).alias("w1"),
            F.max(
                F.when(
                    F.col("p") == 2,
                    F.col("n").cast("double") / F.col("nt"),
                )
            ).alias("w2"),
            F.max(
                F.when(
                    F.col("p") == 1,
                    F.col("s").cast("double") / F.col("n"),
                )
            ).alias("r1"),
            F.max(
                F.when(
                    F.col("p") == 2,
                    F.col("s").cast("double") / F.col("n"),
                )
            ).alias("r2"),
        )
    )
    dw = F.col("w2") - F.col("w1")
    dr = F.col("r2") - F.col("r1")
    return m.select(
        "event_type",
        F.round("w1", 6).alias("w1"),
        F.round("w2", 6).alias("w2"),
        F.round("r1", 6).alias("r1"),
        F.round("r2", 6).alias("r2"),
        F.round(F.col("w1") * dr, 6).alias("rate_effect"),
        F.round(dw * F.col("r1"), 6).alias("mix_effect"),
        F.round(dw * dr, 6).alias("interaction"),
        F.round(
            F.col("w2") * F.col("r2") - F.col("w1") * F.col("r1"), 6
        ).alias("total_contrib"),
    )


_CF_ORACLE = f"""
WITH ui AS (
    SELECT user_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS item,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM events GROUP BY 1, 2
), capped AS (
    SELECT user_id, item, c FROM (
        SELECT user_id, item, c,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY c DESC, item) AS rn
        FROM ui
    ) WHERE rn <= {_CF_CAP}
), norms AS (
    SELECT item, CAST(SUM(c * c) AS BIGINT) AS sq
    FROM capped GROUP BY item
), dots AS (
    SELECT a.item AS i, b.item AS j,
           CAST(SUM(a.c * b.c) AS BIGINT) AS dot,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM capped a JOIN capped b
      ON a.user_id = b.user_id AND a.item < b.item
    GROUP BY a.item, b.item
), sims AS (
    SELECT i, j, dot, n_users,
           dot / (sqrt(CAST(ni.sq AS DOUBLE)) * sqrt(CAST(nj.sq AS DOUBLE)))
               AS sim
    FROM dots JOIN norms ni ON ni.item = dots.i
              JOIN norms nj ON nj.item = dots.j
)
SELECT i AS item, j AS neighbor, dot, n_users, ROUND(sim, 6) AS sim
FROM (
    SELECT i, j, dot, n_users, sim,
           ROW_NUMBER() OVER (PARTITION BY i ORDER BY sim DESC, j) AS rn
    FROM sims
) WHERE rn <= {_CF_TOPK}
"""


@register("x_item_cf", oracle=_CF_ORACLE)
def x_item_cf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering ("customers also viewed"):
    cosine similarity between event item keys from per-user
    interaction counts, top-{_CF_TOPK} neighbors per item. Each user
    contributes at most their top-{_CF_CAP} items (ties broken by
    item id), so the per-user pair space is ≤ {_CF_CAP}·({_CF_CAP}−1)/2
    regardless of activity — the cap that stops one bot account from
    detonating the co-visitation self-join, the same defense family
    as x_cooccur_pmi's df cap. Dot products and norms are exact
    integers; the single cosine division per pair is bit-identical in
    both engines.

    Scale shape: (user, item) aggregate → per-user cap window (both on
    the user shuffle), then the pair join keys on user_id with bounded
    fan-out and aggregates map-side onto the item-pair domain. The
    top-k window runs on the ITEM-PAIR table (item-domain² at most,
    independent of event count). Scan-bound at 100 TB.
    """
    return item_cf_frame(load(spark, sf_dir, "events"))


def item_cf_frame(e: DataFrame) -> DataFrame:
    """Frame-level core of :func:`x_item_cf` (stress-testable on
    synthetic (user_id, props) inputs)."""
    ui = e.groupBy(
        "user_id",
        F.get_json_object("props", "$.k").cast("long").alias("item"),
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    rn = F.row_number().over(
        Window.partitionBy("user_id").orderBy(F.col("c").desc(), "item")
    )
    capped = ui.withColumn("rn", rn).where(F.col("rn") <= _CF_CAP).drop("rn")
    norms = capped.groupBy("item").agg(
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sq")
    )
    b = capped.select(
        F.col("user_id").alias("uid"),
        F.col("item").alias("j"),
        F.col("c").alias("cj"),
    )
    dots = (
        capped.join(b, (capped.user_id == b.uid) & (capped.item < b.j))
        .groupBy(F.col("item").alias("i"), "j")
        .agg(
            F.sum(F.col("c") * F.col("cj")).cast("long").alias("dot"),
            F.count(F.lit(1)).cast("long").alias("n_users"),
        )
    )
    ni = norms.select(F.col("item").alias("i"), F.col("sq").alias("sqi"))
    nj = norms.select(F.col("item").alias("j"), F.col("sq").alias("sqj"))
    sims = (
        dots.join(F.broadcast(ni), "i")
        .join(F.broadcast(nj), "j")
        .select(
            "i",
            "j",
            "dot",
            "n_users",
            (
                F.col("dot")
                / (
                    F.sqrt(F.col("sqi").cast("double"))
                    * F.sqrt(F.col("sqj").cast("double"))
                )
            ).alias("sim"),
        )
    )
    topk = F.row_number().over(
        Window.partitionBy("i").orderBy(F.col("sim").desc(), "j")
    )
    return (
        sims.withColumn("rn", topk)
        .where(F.col("rn") <= _CF_TOPK)
        .select(
            F.col("i").alias("item"),
            F.col("j").alias("neighbor"),
            "dot",
            "n_users",
            F.round("sim", 6).alias("sim"),
        )
    )
