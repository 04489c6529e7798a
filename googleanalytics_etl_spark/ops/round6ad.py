"""Round-6 batch 30: IR index construction + empirical-Bayes rates.

- ``x_posting_lists`` — inverted-index build: for every (term, doc)
  pair the term frequency and the ordered in-document position list
  (1-based, comma-joined — the driver hashes strings, never arrays),
  plus the term's document frequency. The artifact behind x_tfidf /
  x_bm25's *scores*: those rank, this MATERIALIZES the searchable
  index a retrieval system ships.
- ``x_eb_shrinkage`` — empirical-Bayes shrinkage of per-user
  conversion rates toward the global rate with ``m = {_EB_M}``
  pseudo-events: ``(s_u + m·p̄) / (n_u + m)``. Low-activity users with
  flukey 100% rates collapse toward the prior while high-activity
  users keep their evidence; the raw-vs-shrunk rank columns expose
  exactly which leaderboard entries were small-sample noise.

Reference parity: no analogue [REF-UNVERIFIED — /root/reference is
empty]; SURVEY §2.J-M text-analysis / curation extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

_EB_M = 50  # pseudo-events pulling a user's rate toward the global rate

_POSTING_ORACLE = """
WITH toks AS (
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS tok,
           generate_subscripts(string_split(text, ' '), 1) AS pos
    FROM documents
), t AS (
    SELECT doc_id, tok, pos FROM toks WHERE tok <> ''
), posting AS (
    SELECT tok, doc_id,
           CAST(COUNT(*) AS BIGINT) AS tf,
           string_agg(pos, ',' ORDER BY pos) AS positions
    FROM t GROUP BY tok, doc_id
)
SELECT tok, doc_id, tf, positions,
       CAST(COUNT(*) OVER (PARTITION BY tok) AS BIGINT) AS df
FROM posting
"""


@register("x_posting_lists", oracle=_POSTING_ORACLE)
def x_posting_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction: explode each document into
    (position, term) pairs, aggregate to (term, doc) postings carrying
    the term frequency and the ordered position list (what a phrase /
    proximity query consumes), and annotate each posting with the
    term's document frequency. Positions are 1-based; the list is
    sorted then comma-joined so the output is a plain string column
    (driver-hashable) identical across engines regardless of
    aggregation order.

    Scale shape: one posexplode (narrow), one (term, doc) hash
    aggregate, then the df annotation as a count window over ``tok`` —
    the SAME key the aggregate just shuffled on, so AQE reuses the
    partitioning instead of exchanging again. Output is corpus-token
    bounded; at 100 TB the postings shard naturally by term — the
    layout every search engine distributes on. No per-term hot spot
    materializes more than its own postings row-set.
    """
    d = load(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos0", "tok"),
    ).where(F.col("tok") != "")
    posting = (
        t.groupBy("tok", "doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("tf"),
            F.array_join(
                F.array_sort(F.collect_list(F.col("pos0") + 1)), ","
            ).alias("positions"),
        )
    )
    return posting.select(
        "tok",
        "doc_id",
        "tf",
        "positions",
        F.count(F.lit(1))
        .over(Window.partitionBy("tok"))
        .cast("long")
        .alias("df"),
    )


_EB_ORACLE = f"""
WITH u AS (
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_purchases
    FROM events GROUP BY user_id
), g AS (
    SELECT CAST(SUM(n_events) AS BIGINT) AS gn,
           CAST(SUM(n_purchases) AS BIGINT) AS gs
    FROM u
), rates AS (
    SELECT u.user_id, u.n_events, u.n_purchases,
           ROUND(CAST(u.n_purchases AS DOUBLE) / u.n_events, 6) AS raw_rate,
           ROUND(CAST(u.n_purchases * g.gn + {_EB_M} * g.gs AS DOUBLE)
                 / (CAST(u.n_events + {_EB_M} AS BIGINT) * g.gn), 6)
               AS shrunk_rate
    FROM u CROSS JOIN g
)
SELECT user_id, n_events, n_purchases, raw_rate, shrunk_rate,
       CAST(ROW_NUMBER() OVER (ORDER BY raw_rate DESC, user_id)
            AS BIGINT) AS rank_raw,
       CAST(ROW_NUMBER() OVER (ORDER BY shrunk_rate DESC, user_id)
            AS BIGINT) AS rank_shrunk
FROM rates
"""


@register("x_eb_shrinkage", oracle=_EB_ORACLE)
def x_eb_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes rate shrinkage: each user's purchase rate is
    pulled toward the global rate with ``m = {_EB_M}`` pseudo-events —
    ``(s_u + m·gs/gn) / (n_u + m)``, formed as the all-integer ratio
    ``(s_u·gn + m·gs) / ((n_u + m)·gn)`` so both engines divide the
    SAME exact integers once (no intermediate float prior). The
    raw-vs-shrunk rank pair shows which top-of-leaderboard users were
    small-sample flukes — the fix for every "best converting segment"
    report that surfaces n=3 users.

    Scale shape: one map-side-combinable groupBy(user_id) over the
    fact scan, a 1-row grand total broadcast back, then the two rank
    windows run on the USER-grain aggregate (entity-domain-sized,
    like q_global_rank) — never on events. At 100 TB swap the global
    row_number for the range-partitioned global-rank recipe
    (ops/setops.py q_global_rank) unchanged.
    """
    e = load(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("n_purchases"),
    )
    g = u.agg(
        F.sum("n_events").cast("long").alias("gn"),
        F.sum("n_purchases").cast("long").alias("gs"),
    )
    rates = u.crossJoin(F.broadcast(g)).select(
        "user_id",
        "n_events",
        "n_purchases",
        F.round(F.col("n_purchases").cast("double") / F.col("n_events"), 6)
        .alias("raw_rate"),
        F.round(
            (F.col("n_purchases") * F.col("gn") + _EB_M * F.col("gs")).cast(
                "double"
            )
            / ((F.col("n_events") + _EB_M) * F.col("gn")),
            6,
        ).alias("shrunk_rate"),
    )
    return rates.select(
        "user_id",
        "n_events",
        "n_purchases",
        "raw_rate",
        "shrunk_rate",
        F.row_number()
        .over(Window.orderBy(F.col("raw_rate").desc(), "user_id"))
        .cast("long")
        .alias("rank_raw"),
        F.row_number()
        .over(Window.orderBy(F.col("shrunk_rate").desc(), "user_id"))
        .cast("long")
        .alias("rank_shrunk"),
    )
