"""Round-5 pre-work, thirteenth batch: forward as-of join, filter-rule
attribution, and graph degree distribution.

- ``q_join_asof_forward`` — the FORWARD direction completing the as-of
  family (backward ``q_join_asof``, nearest ``q_join_asof_nearest``,
  tolerance ``q_join_asof_tolerance``): each purchase looks at the
  NEXT view — the time-to-next-engagement metric. Same single-window
  recipe, with the frame reversed (MIN over following rows).
- ``x_filter_attribution`` — which quality rule kills how much data:
  per rule, its SOLO kill count (docs only that rule drops) and the
  cumulative funnel when rules apply in order. The audit that stops
  teams from shipping a rule that silently deletes a language.
- ``x_graph_degree_dist`` — degree distribution of the co-purchase
  graph (log2-bucketed): the first statistic anyone computes on a
  graph, and the input to the triangle/CC cost models in graph.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register


# ---------------------------------------------------------------------------
# q_join_asof_forward — next-event lookup (single window pass)
# ---------------------------------------------------------------------------

_ASOF_FWD_ORACLE = """
SELECT event_id, user_id, ts, next_view_ts,
       CASE WHEN next_view_ts IS NOT NULL
            THEN CAST(epoch_us(next_view_ts) - epoch_us(ts) AS BIGINT)
       END AS us_to_next
FROM (
    SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
           MIN(CASE WHEN event_type = 'view' THEN CAST(ts AS TIMESTAMP) END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS next_view_ts
    FROM events
)
WHERE event_type = 'purchase'
"""


@register("q_join_asof_forward", oracle=_ASOF_FWD_ORACLE)
def q_join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: for every purchase, the user's NEXT view and the
    exact microsecond gap to it (time-to-next-engagement — does buying
    keep people around?). Completes the as-of matrix: backward /
    nearest / tolerance / forward, all as ONE window pass over the
    user_id partitioning — a running MIN over FOLLOWING rows here — no
    self-join, no per-row probe, the only shuffle is the user co-location
    every sessionization query already pays.
    """
    e = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "event_type",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    nxt = F.min(
        F.when(F.col("event_type") == "view", F.col("ts"))
    ).over(w)
    gap = F.when(
        nxt.isNotNull(),
        (F.unix_micros(nxt) - F.unix_micros(F.col("ts"))).cast("long"),
    )
    return (
        e.withColumn("next_view_ts", nxt)
        .withColumn("us_to_next", gap)
        .where(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "next_view_ts", "us_to_next")
    )


# ---------------------------------------------------------------------------
# x_filter_attribution — per-rule kill accounting
# ---------------------------------------------------------------------------

_FILTER_ATTR_ORACLE = """
WITH base AS (
    SELECT doc_id,
           len(list_filter(str_split(text, ' '), t -> t <> '')) AS n_tok,
           len(list_distinct(list_filter(str_split(text, ' '),
                                         t -> t <> ''))) AS n_typ,
           length(text) AS n_chars
    FROM documents
), flags AS (
    SELECT doc_id,
           (n_tok < 25) AS f_short,
           (n_tok > 900) AS f_long,
           (CAST(n_typ AS DOUBLE) / n_tok < 0.35) AS f_repetitive,
           (CAST(n_chars AS DOUBLE) / n_tok > 9.0) AS f_longwords
    FROM base
)
SELECT rule, solo_kills, cumulative_kills, survivors
FROM (
    SELECT 1 AS ord, 'short' AS rule,
           CAST(SUM(CASE WHEN f_short AND NOT f_long AND NOT f_repetitive
                          AND NOT f_longwords THEN 1 ELSE 0 END) AS BIGINT)
               AS solo_kills,
           CAST(SUM(CASE WHEN f_short THEN 1 ELSE 0 END) AS BIGINT)
               AS cumulative_kills,
           CAST(SUM(CASE WHEN NOT f_short THEN 1 ELSE 0 END) AS BIGINT)
               AS survivors
    FROM flags
    UNION ALL
    SELECT 2, 'long',
           CAST(SUM(CASE WHEN f_long AND NOT f_short AND NOT f_repetitive
                          AND NOT f_longwords THEN 1 ELSE 0 END) AS BIGINT),
           CAST(SUM(CASE WHEN f_short OR f_long THEN 1 ELSE 0 END) AS BIGINT),
           CAST(SUM(CASE WHEN NOT f_short AND NOT f_long THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM flags
    UNION ALL
    SELECT 3, 'repetitive',
           CAST(SUM(CASE WHEN f_repetitive AND NOT f_short AND NOT f_long
                          AND NOT f_longwords THEN 1 ELSE 0 END) AS BIGINT),
           CAST(SUM(CASE WHEN f_short OR f_long OR f_repetitive
                    THEN 1 ELSE 0 END) AS BIGINT),
           CAST(SUM(CASE WHEN NOT f_short AND NOT f_long AND NOT f_repetitive
                    THEN 1 ELSE 0 END) AS BIGINT)
    FROM flags
    UNION ALL
    SELECT 4, 'longwords',
           CAST(SUM(CASE WHEN f_longwords AND NOT f_short AND NOT f_long
                          AND NOT f_repetitive THEN 1 ELSE 0 END) AS BIGINT),
           CAST(SUM(CASE WHEN f_short OR f_long OR f_repetitive
                          OR f_longwords THEN 1 ELSE 0 END) AS BIGINT),
           CAST(SUM(CASE WHEN NOT f_short AND NOT f_long AND NOT f_repetitive
                          AND NOT f_longwords THEN 1 ELSE 0 END) AS BIGINT)
    FROM flags
) ORDER BY ord
"""


@register("x_filter_attribution", oracle=_FILTER_ATTR_ORACLE)
def x_filter_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule attribution for a 4-rule quality filter (too-short,
    too-long, repetitive, long-words): per rule, the SOLO kill count
    (docs ONLY that rule flags — its unique contribution) and the
    CUMULATIVE kill/survivor funnel in rule order. Marginal-vs-solo is
    the report that catches a redundant rule (solo ≈ 0) or a runaway
    one before a corpus ships.

    All four flags compute in ONE row-local pass (no shuffle); the
    report is four conditional aggregates over the flag frame —
    Catalyst shares the scan across the UNION branches via exchange
    reuse at fixture scale and a real pipeline would pre-aggregate the
    16-cell flag cube (2⁴) first.
    """
    d = load(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda t: t != "")
    base = d.select(
        "doc_id",
        F.size(toks).alias("n_tok"),
        F.size(F.array_distinct(toks)).alias("n_typ"),
        F.length("text").alias("n_chars"),
    )
    flags = base.select(
        "doc_id",
        (F.col("n_tok") < 25).alias("f_short"),
        (F.col("n_tok") > 900).alias("f_long"),
        (F.col("n_typ").cast("double") / F.col("n_tok") < 0.35).alias(
            "f_repetitive"
        ),
        (F.col("n_chars").cast("double") / F.col("n_tok") > 9.0).alias(
            "f_longwords"
        ),
    ).materialize(eager=True)

    rules = ["f_short", "f_long", "f_repetitive", "f_longwords"]
    names = {"f_short": "short", "f_long": "long", "f_repetitive": "repetitive",
             "f_longwords": "longwords"}
    parts = []
    for i, r in enumerate(rules):
        others = [o for o in rules if o != r]
        solo = F.sum(
            F.when(
                F.col(r)
                & ~F.col(others[0])
                & ~F.col(others[1])
                & ~F.col(others[2]),
                1,
            ).otherwise(0)
        ).cast("long")
        upto = rules[: i + 1]
        cum_pred = F.col(upto[0])
        for o in upto[1:]:
            cum_pred = cum_pred | F.col(o)
        cum = F.sum(F.when(cum_pred, 1).otherwise(0)).cast("long")
        surv = F.sum(F.when(~cum_pred, 1).otherwise(0)).cast("long")
        parts.append(
            flags.agg(
                F.lit(i + 1).alias("ord"),
                F.lit(names[r]).alias("rule"),
                solo.alias("solo_kills"),
                cum.alias("cumulative_kills"),
                surv.alias("survivors"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("ord").select(
        "rule", "solo_kills", "cumulative_kills", "survivors"
    )


# ---------------------------------------------------------------------------
# x_graph_degree_dist — log2-bucketed degree distribution
# ---------------------------------------------------------------------------

_DEGREE_ORACLE = """
WITH edges AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), deg AS (
    SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS d
    FROM edges GROUP BY l_partkey
)
SELECT CAST(length(bin(d)) - 1 AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(MIN(d) AS BIGINT) AS d_min,
       CAST(MAX(d) AS BIGINT) AS d_max,
       CAST(SUM(d) AS BIGINT) AS edges_covered
FROM deg
GROUP BY 1
"""


@register("x_graph_degree_dist", oracle=_DEGREE_ORACLE)
def x_graph_degree_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the co-purchase graph's part side,
    log2-bucketed — the heavy-tail profile that decides every
    downstream graph plan: it is what makes the triangle counter's
    degree orientation (ops/round4c.py) and the CC large-star bound
    (graph.py) work, and at 100 TB it is the statistic that predicts
    which keys need skew handling BEFORE a join runs.

    Two hash aggregates (edge dedup, degree count) + one ~log-range
    bucket aggregate; ⌊log2 d⌋ computed as binary-string length − 1 —
    exact integer arithmetic, immune to the LN/LN(2) last-ulp flip at
    powers of two.
    """
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    deg = li.groupBy("l_partkey").agg(F.count(F.lit(1)).cast("long").alias("d"))
    # ⌊log2 d⌋ as bit length - 1: pure integer, no last-ulp FLOOR flips
    # at powers of two (LN(8)/LN(2) can land either side of 3.0)
    bucket = (F.length(F.bin("d")) - 1).cast("long")
    return deg.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.min("d").cast("long").alias("d_min"),
        F.max("d").cast("long").alias("d_max"),
        F.sum("d").cast("long").alias("edges_covered"),
    )


# ---------------------------------------------------------------------------
# x_dedup_normalized — normalization-exact dedup (the pre-MinHash stage)
# ---------------------------------------------------------------------------

_NORM_DEDUP_ORACLE = """
WITH corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    -- mutated tail: case flips, doubled spaces, trailing punctuation —
    -- byte-level distinct, normalization-identical
    SELECT doc_id + 4000000,
           upper(substring(text, 1, 1)) || substring(text, 2) || '  !!'
    FROM documents WHERE doc_id < 10
), norm AS (
    SELECT doc_id,
           md5(trim(regexp_replace(
                   regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                   ' +', ' ', 'g'))) AS nkey
    FROM corpus
)
SELECT doc_id, nkey,
       CAST(MIN(doc_id) OVER (PARTITION BY nkey) AS BIGINT) AS survivor,
       CAST(COUNT(*) OVER (PARTITION BY nkey) AS BIGINT) AS group_size
FROM norm
"""


# Canonical-form key shared by the normalization-dedup FAMILY
# (x_dedup_normalized here; x_survivor_policy / x_dup_inflation in
# round6.py): lowercase → strip non-alphanumerics → collapse whitespace
# → trim → md5. The SQL twin must stay byte-identical to this recipe —
# exporting both from ONE place makes that structural.
NORM_KEY_SQL = """md5(trim(regexp_replace(
    regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')))"""


def norm_key(text: str | Column = "text") -> Column:
    """Spark twin of :data:`NORM_KEY_SQL` over a text column."""
    return F.md5(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.lower(text), "[^a-z0-9 ]", ""), " +", " "
            )
        ).cast("binary")
    )


def mutated_tail(d: DataFrame, *extra_cols: str) -> DataFrame:
    """The planted normalization-mutant tail shared by the family:
    docs 0-9 re-inserted at doc_id+4e6 with a case flip and a doubled-
    space '!!' suffix — byte-distinct, normalization-identical.
    ``extra_cols`` pass through unchanged (e.g. ``source``)."""
    return d.where(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 4_000_000).alias("doc_id"),
        *extra_cols,
        F.concat(
            F.upper(F.substring("text", 1, 1)),
            F.expr("substring(text, 2)"),
            F.lit("  !!"),
        ).alias("text"),
    )


@register("x_dedup_normalized", oracle=_NORM_DEDUP_ORACLE)
def x_dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-exact dedup: lowercase, strip non-alphanumerics,
    collapse whitespace, THEN hash — the cheap canonicalization stage
    every curation pipeline runs between byte-exact dedup (misses case
    and punctuation variants) and MinHash (overkill for them). The
    planted tail mutates docs 0-9 with case flips, doubled spaces and
    trailing punctuation: byte-distinct, normalization-identical — each
    must collapse into its original's group with the original as
    survivor (min doc_id).

    One row-local normalize+md5 projection (lower → strip → collapse →
    TRIM — the trim matters: stripped trailing punctuation leaves a
    dangling space that would split otherwise-identical texts); the only
    shuffle is the 16-byte digest window — text never moves, same as
    x_dedup_exact.
    """
    d = load(spark, sf_dir, "documents")
    corpus = d.select("doc_id", "text").unionByName(mutated_tail(d))
    w = Window.partitionBy("nkey")
    return (
        corpus.select("doc_id", norm_key().alias("nkey"))
        .withColumn("survivor", F.min("doc_id").over(w).cast("long"))
        .withColumn("group_size", F.count(F.lit(1)).over(w).cast("long"))
    )


# ---------------------------------------------------------------------------
# x_pack_audit — packing-efficiency report over x_pack_sequences
# ---------------------------------------------------------------------------

_PACK_AUDIT_ORACLE = """
WITH packs AS (
    SELECT source,
           CAST(FLOOR(cum_before / 512) AS BIGINT) AS pack_id,
           CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
    FROM (
        SELECT source, n_tokens,
               COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum_before
        FROM (
            SELECT source, doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
            FROM documents
        )
    )
    GROUP BY source, pack_id
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_packs,
       CAST(SUM(pack_tokens) AS BIGINT) AS total_tokens,
       CAST(MIN(pack_tokens) AS BIGINT) AS min_pack,
       CAST(MAX(pack_tokens) AS BIGINT) AS max_pack,
       ROUND(CAST(SUM(pack_tokens) AS DOUBLE) / (COUNT(*) * 512), 6)
           AS utilization
FROM packs
GROUP BY source
"""


@register("x_pack_audit", oracle=_PACK_AUDIT_ORACLE)
def x_pack_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency audit over the ``x_pack_sequences`` layout:
    per source, pack count, exact token totals, min/max pack fill, and
    utilization vs the 512-token budget. Packing buys throughput only
    if the bins are actually full — this is the report that says so
    (utilization ≪ 1 means the greedy cursor is leaving capacity on
    the table and a length-aware order would pay for itself).

    Reuses the pack op's exact cum-sum grouping (same window, same
    budget), then two tiny aggregates — pack grain, then source grain.
    """
    from .pipeline import _PACK_BUDGET

    d = load(spark, sf_dir, "documents")
    toks = F.size(F.split("text", " ")).cast("long")
    cum = (
        F.coalesce(
            F.sum("n_tokens").over(
                Window.partitionBy("source")
                .orderBy("doc_id")
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        )
    )
    packs = (
        d.select("source", "doc_id", toks.alias("n_tokens"))
        .withColumn("pack_id", F.floor(cum / _PACK_BUDGET).cast("long"))
        .groupBy("source", "pack_id")
        .agg(F.sum("n_tokens").cast("long").alias("pack_tokens"))
    )
    return packs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_packs"),
        F.sum("pack_tokens").cast("long").alias("total_tokens"),
        F.min("pack_tokens").cast("long").alias("min_pack"),
        F.max("pack_tokens").cast("long").alias("max_pack"),
        F.round(
            F.sum("pack_tokens").cast("double")
            / (F.count(F.lit(1)) * _PACK_BUDGET),
            6,
        ).alias("utilization"),
    )


# ---------------------------------------------------------------------------
# q_union_evolving — schema-drift union (allowMissingColumns)
# ---------------------------------------------------------------------------

_UNION_EVOLVE_ORACLE = """
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(o_orderpriority) AS BIGINT) AS with_priority,
       CAST(COUNT(o_custkey) AS BIGINT) AS with_custkey
FROM (
    SELECT o_orderstatus, o_orderpriority, NULL AS o_custkey
    FROM orders WHERE o_orderdate <  TIMESTAMP '1998-01-01'
    UNION ALL
    SELECT o_orderstatus, NULL, o_custkey
    FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
)
GROUP BY o_orderstatus
"""


@register("q_union_evolving", oracle=_UNION_EVOLVE_ORACLE)
def q_union_evolving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift UNION: two extracts with different column sets
    (the early feed carries priority, the late feed custkey) combined
    with ``unionByName(allowMissingColumns=True)`` — each side's
    missing columns NULL-fill, BY NAME, never by position. The API
    counterpart of ``q_scan_evolving``'s storage-level mergeSchema:
    positional ``union`` silently mis-aligns drifted feeds (the classic
    corrupted-append); by-name union is the safe default this engine
    standardizes on (every composite here uses unionByName).
    """
    o = load(spark, sf_dir, "orders")
    cut = F.lit("1998-01-01").cast("timestamp_ntz")
    early = o.where(F.col("o_orderdate") < cut).select(
        "o_orderstatus", "o_orderpriority"
    )
    late = o.where(F.col("o_orderdate") >= cut).select(
        "o_orderstatus", "o_custkey"
    )
    u = early.unionByName(late, allowMissingColumns=True)
    return u.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count("o_orderpriority").cast("long").alias("with_priority"),
        F.count("o_custkey").cast("long").alias("with_custkey"),
    )


# ---------------------------------------------------------------------------
# x_source_overlap — inter-source shingle containment matrix
# ---------------------------------------------------------------------------

_SOURCE_OVERLAP_ORACLE = """
WITH sh AS (
    SELECT DISTINCT source,
           CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) AS h
    FROM (
        SELECT source,
               unnest(list_distinct(
                   CASE WHEN len(str_split(text, ' ')) >= 3 THEN
                       list_transform(range(len(str_split(text, ' ')) - 2),
                           i -> str_split(text, ' ')[i + 1] || ' ' ||
                                str_split(text, ' ')[i + 2] || ' ' ||
                                str_split(text, ' ')[i + 3])
                   ELSE [text] END)) AS shingle
        FROM documents WHERE source IN ('src0','src1','src2','src3','src4')
    )
), sizes AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sh GROUP BY source
), inter AS (
    SELECT a.source AS src_a, b.source AS src_b,
           CAST(COUNT(*) AS BIGINT) AS n_common
    FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
    GROUP BY 1, 2
)
SELECT i.src_a, i.src_b, i.n_common, sa.n_sh AS n_a, sb.n_sh AS n_b,
       ROUND(CAST(i.n_common AS DOUBLE) / LEAST(sa.n_sh, sb.n_sh), 6)
           AS overlap
FROM inter i
JOIN sizes sa ON sa.source = i.src_a
JOIN sizes sb ON sb.source = i.src_b
"""


@register("x_source_overlap", oracle=_SOURCE_OVERLAP_ORACLE)
def x_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-source duplication matrix: for every pair of the first 5
    sources, the shared distinct-3-gram count and the containment
    overlap (shared / smaller side) — the dataset-level audit behind
    "are these two crawls the same corpus?" and the source-level
    upstream of doc-grain decontamination (``x_decontaminate``).

    Shingles hash to 60-bit longs and dedup to (source, h) grain FIRST
    — the pair join runs on the per-source distinct sets keyed by hash,
    so its width is the true overlap, never doc × doc. |sources|² pairs
    of set intersections at the hash grain is the Theta-sketch shape
    (sketches.py) computed exactly; at 100 sources × 100 TB the sketch
    path replaces the exact join, same report schema.
    """
    srcs = ["src0", "src1", "src2", "src3", "src4"]
    d = load(spark, sf_dir, "documents").where(F.col("source").isin(srcs))
    from .extensions import word_shingles

    h = F.conv(
        F.substring(F.md5(F.col("shingle").cast("binary")), 1, 15), 16, 10
    ).cast("long")
    # words projected ONCE before the shingle lambdas (the
    # x_curation_e2e lesson: an inlined split re-evaluates per
    # element_at inside the array transform, O(words) splits per doc)
    sh = (
        d.select("source", F.split("text", " ").alias("words"))
        .select(
            "source", F.explode(word_shingles(F.col("words"))).alias("shingle")
        )
        .select("source", h.alias("h"))
        .distinct()
        .materialize(eager=True)
    )
    sizes = sh.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n_sh"))
    a = sh.select(F.col("source").alias("src_a"), "h")
    b = sh.select(F.col("source").alias("src_b"), "h")
    inter = (
        a.join(b, "h")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    sa = sizes.select(F.col("source").alias("src_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("source").alias("src_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_common",
            "n_a",
            "n_b",
            F.round(
                F.col("n_common").cast("double")
                / F.least(F.col("n_a"), F.col("n_b")),
                6,
            ).alias("overlap"),
        )
    )


# ---------------------------------------------------------------------------
# s_session_dynamic — session windows with a PER-EVENT gap expression
# ---------------------------------------------------------------------------

_SESSION_DYN_ORACLE = """
WITH e AS (
    SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
           epoch_us(CAST(ts AS TIMESTAMP)) AS s,
           epoch_us(CAST(ts AS TIMESTAMP))
             + CASE WHEN event_type = 'purchase' THEN 3600 ELSE 1800 END
               * CAST(1000000 AS BIGINT) AS en
    FROM events
), swept AS (
    SELECT *,
           MAX(en) OVER (PARTITION BY user_id ORDER BY s, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max_en
    FROM e
), grouped AS (
    SELECT *,
           SUM(CASE WHEN prev_max_en IS NULL OR prev_max_en < s
                    THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY s, event_id
                     ROWS UNBOUNDED PRECEDING) AS grp
    FROM swept
)
SELECT user_id,
       MIN(ts) AS session_start,
       CAST(make_timestamp(MAX(en)) AS TIMESTAMP) AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
FROM grouped
GROUP BY user_id, grp
"""


@register("s_session_dynamic", oracle=_SESSION_DYN_ORACLE)
def s_session_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a DYNAMIC, per-event gap — purchases hold a
    session open for 60 minutes, everything else 30 (``session_window``
    with an expression gap, the Spark feature fixed-gap sessionizers
    can't emulate): post-purchase browsing belongs to the buying
    session even after a long pause.

    The oracle is the interval-union sweep (``q_interval_merge``) with
    per-event interval ends — the exact batch semantics of dynamic
    session merging (a session's end is the MAX of its members'
    ``ts + gap(event)``; a new session starts when the running max ends
    strictly before the next event). Cross-checking Spark's built-in
    stateful operator against that independent window construction is
    the point of the oracle. Streaming path: identical query under
    ``readStream`` + watermark, per the s_session/batch-equivalence
    pattern (tests assert the built-in and the sweep agree row-for-row).
    """
    e = load(spark, sf_dir, "events")
    # session_window's gap expression must be CalendarIntervalType —
    # INTERVAL literals parse as DayTimeIntervalType, so build the gap
    # with make_interval (mins is its 6th argument)
    gap = F.expr(
        "make_interval(0, 0, 0, 0, 0,"
        " CASE WHEN event_type = 'purchase' THEN 60 ELSE 30 END, 0)"
    )
    return (
        e.groupBy(
            "user_id",
            F.session_window(F.col("ts").cast("timestamp"), gap),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
        )
        .select(
            "user_id",
            F.col("session_window.start").cast("timestamp_ntz").alias(
                "session_start"
            ),
            F.col("session_window.end").cast("timestamp_ntz").alias(
                "session_end"
            ),
            "n_events",
            "cents",
        )
    )


# ---------------------------------------------------------------------------
# q_fn_timezone — civil-time conversion (UTC event log → local reporting)
# ---------------------------------------------------------------------------

_TZ_ORACLE = """
SELECT local_hour, CAST(COUNT(*) AS BIGINT) AS n
FROM (
    SELECT EXTRACT(hour FROM CAST(ts AS TIMESTAMP) AT TIME ZONE 'UTC'
                   AT TIME ZONE 'America/New_York') AS local_hour
    FROM events
)
GROUP BY local_hour
"""


@register("q_fn_timezone", oracle=_TZ_ORACLE)
def q_fn_timezone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Civil-time conversion: the UTC event log bucketed by
    America/New_York local hour (`from_utc_timestamp` ↔ DuckDB's
    double `AT TIME ZONE`) — the "what hour do users actually browse"
    report every UTC-normalized warehouse eventually needs. Both
    engines resolve the IANA zone database, so the oracle also pins
    tzdata agreement; the fixture's January window sits entirely in
    EST (DST transitions would shift two hours of the histogram — the
    reason civil-time reports must NEVER be computed with a fixed
    offset).
    """
    e = load(spark, sf_dir, "events")
    local = F.from_utc_timestamp(
        F.col("ts").cast("timestamp"), "America/New_York"
    )
    return (
        e.select(F.hour(local).cast("long").alias("local_hour"))
        .groupBy("local_hour")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


# ---------------------------------------------------------------------------
# x_vocab_coverage — tokenizer-sizing coverage curve
# ---------------------------------------------------------------------------

_VOCAB_COVERAGE_ORACLE = """
WITH tf AS (
    SELECT tok, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    WHERE tok <> ''
    GROUP BY tok
), ranked AS (
    SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS r,
           SUM(n) OVER (ORDER BY n DESC, tok
                        ROWS UNBOUNDED PRECEDING) AS cum,
           SUM(n) OVER () AS total
    FROM tf
)
SELECT k, vocab_tokens, total_tokens,
       ROUND(CAST(vocab_tokens AS DOUBLE) / total_tokens, 6) AS coverage
FROM (
    SELECT CAST(k AS BIGINT) AS k,
           CAST(MAX(CASE WHEN r <= k THEN cum END) AS BIGINT) AS vocab_tokens,
           CAST(MAX(total) AS BIGINT) AS total_tokens
    FROM ranked, (SELECT unnest([10, 100, 1000]) AS k)
    GROUP BY k
)
"""


@register("x_vocab_coverage", oracle=_VOCAB_COVERAGE_ORACLE)
def x_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: what fraction of all token
    OCCURRENCES the top-k most frequent types cover, at k = 10 / 100 /
    1000 — the Zipf statistic that sizes a tokenizer's vocab budget
    (and the denominator of every OOV-rate projection). One corpus
    count aggregate; the curve itself is a window over the ~|vocab|-row
    frequency table (at web scale: the x_approx_topk sketch feeds the
    head and the tail is bounded analytically).
    """
    d = load(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    from pyspark.sql import Window as W

    ow = W.orderBy(F.col("n").desc(), "tok")
    ranked = tf.select(
        "n",
        F.row_number().over(ow).alias("r"),
        F.sum("n").over(ow.rowsBetween(W.unboundedPreceding, 0)).alias("cum"),
        F.sum("n").over(W.partitionBy()).alias("total"),
    )
    ks = spark.range(1).select(
        F.explode(F.array(F.lit(10), F.lit(100), F.lit(1000))).alias("k")
    )
    return (
        ranked.crossJoin(F.broadcast(ks))
        .groupBy(F.col("k").cast("long").alias("k"))
        .agg(
            F.max(F.when(F.col("r") <= F.col("k"), F.col("cum")))
            .cast("long")
            .alias("vocab_tokens"),
            F.max("total").cast("long").alias("total_tokens"),
        )
        .select(
            "k",
            "vocab_tokens",
            "total_tokens",
            F.round(
                F.col("vocab_tokens").cast("double") / F.col("total_tokens"), 6
            ).alias("coverage"),
        )
    )


# ---------------------------------------------------------------------------
# x_train_val_test — deterministic 3-way split with per-stratum accounting
# ---------------------------------------------------------------------------

_SPLIT_ORACLE = """
WITH assigned AS (
    SELECT lang,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'
                THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                THEN 'val'
                ELSE 'test' END AS split
    FROM documents
)
SELECT split, lang, CAST(COUNT(*) AS BIGINT) AS n
FROM assigned
GROUP BY split, lang
"""


@register("x_train_val_test", oracle=_SPLIT_ORACLE)
def x_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~80/10/10 train/val/test split by md5-prefix
    ranges ('00'-'cb' / 'cc'-'e5' / 'e6'-'ff' ≈ 204/26/26 of 256) with
    per-(split, lang) accounting. The properties ``df.randomSplit``
    cannot give: replay-stable under retries and repartitioning,
    DISJOINT by construction (prefix ranges cannot overlap), and
    membership computable row-locally forever after — a doc's split is
    a pure function of its id, so later pipeline stages never need a
    membership join. Same hash-prefix discipline as ``x_sample_hash``.
    """
    d = load(spark, sf_dir, "documents")
    from .pipeline import key_hash

    h2 = key_hash(F.col("doc_id")).substr(1, 2)
    split = (
        F.when(h2 < "cc", "train").when(h2 < "e6", "val").otherwise("test")
    )
    return (
        d.select(split.alias("split"), "lang")
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


# ---------------------------------------------------------------------------
# x_rfm_features — per-user feature assembly (the feature-store shape)
# ---------------------------------------------------------------------------

_RFM_ORACLE = """
WITH horizon AS (
    SELECT MAX(CAST(ts AS TIMESTAMP)) AS h FROM events
)
SELECT user_id,
       CAST(date_diff('day',
                      CAST(MAX(CAST(ts AS TIMESTAMP)) AS DATE),
                      CAST(h AS DATE)) AS BIGINT) AS recency_days,
       CAST(COUNT(*) AS BIGINT) AS frequency,
       CAST(SUM(CASE WHEN event_type = 'purchase'
                     THEN CAST(ROUND(value * 100) AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS monetary_cents,
       CAST(COUNT(DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS BIGINT)
           AS active_days,
       CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT)
           AS n_purchases
FROM events, horizon
GROUP BY user_id, h
"""


@register("x_rfm_features", oracle=_RFM_ORACLE)
def x_rfm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user RFM feature assembly — recency (days since last event,
    against the corpus horizon), frequency, monetary value (exact
    purchase cents), active-day count, purchase count: the canonical
    churn/LTV feature block, computed as ONE hash aggregate over the
    event log (the distinct-day count rides the same shuffle). The
    horizon is a broadcast 1-row aggregate, so the whole feature build
    is a single pass — the shape a feature store materializes nightly
    at 100 TB, incrementally via ``q_incremental_agg``'s partial-merge
    contract (every column here is partial-mergeable: max, sum, count,
    distinct-day via per-day partials).
    """
    e = load(spark, sf_dir, "events")
    ts = F.col("ts").cast("timestamp")
    horizon = e.agg(F.max(ts).alias("h"))
    return (
        e.crossJoin(F.broadcast(horizon))
        .groupBy("user_id", "h")
        .agg(
            F.datediff(
                F.col("h").cast("date"), F.max(ts).cast("date")
            )
            .cast("long")
            .alias("recency_days"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100).cast("long"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("monetary_cents"),
            F.countDistinct(ts.cast("date")).cast("long").alias("active_days"),
            F.count(F.when(F.col("event_type") == "purchase", 1))
            .cast("long")
            .alias("n_purchases"),
        )
        .drop("h")
    )


# ---------------------------------------------------------------------------
# x_psi_drift — population stability index between time periods
# ---------------------------------------------------------------------------

_PSI_ORACLE = """
WITH labeled AS (
    SELECT CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16'
                THEN 'early' ELSE 'late' END AS period,
           event_type,
           LEAST(CAST(FLOOR(value / 20.0) AS BIGINT), 4) AS bucket
    FROM events WHERE value IS NOT NULL
), counts AS (
    SELECT event_type, bucket,
           CAST(SUM(CASE WHEN period = 'early' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_early,
           CAST(SUM(CASE WHEN period = 'late' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_late
    FROM labeled GROUP BY event_type, bucket
), tot AS (
    SELECT event_type, SUM(n_early) AS te, SUM(n_late) AS tl
    FROM counts GROUP BY event_type
)
SELECT c.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_buckets,
       ROUND(CAST(SUM(CAST(
           ((n_early + 0.5) / (te + 2.5) - (n_late + 0.5) / (tl + 2.5))
           * LN(((n_early + 0.5) / (te + 2.5))
                / ((n_late + 0.5) / (tl + 2.5)))
           AS DECIMAL(18,8))) AS DOUBLE), 6) AS psi
FROM counts c JOIN tot USING (event_type)
GROUP BY c.event_type
"""


@register("x_psi_drift", oracle=_PSI_ORACLE)
def x_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the month's first and second
    half, per event type over 5 fixed value buckets — THE production
    drift alarm for model inputs (rule of thumb: psi > 0.25 ⇒
    retrain). Laplace-smoothed shares (+0.5 per bucket) keep empty
    buckets finite; per-term products are DECIMAL(18,8)-quantized
    before the exact sum so the index is bit-stable cross-engine.

    One labeled scan → (type, bucket) hash aggregate carrying BOTH
    period counts (no self-join of the two periods) → a ~|types·buckets|
    row reduction. At 100 TB the nightly drift check costs one pass.
    """
    e = load(spark, sf_dir, "events").where(F.col("value").isNotNull())
    cut = F.lit("2024-01-16").cast("timestamp_ntz")
    labeled = e.select(
        F.when(F.col("ts").cast("timestamp_ntz") < cut, "early")
        .otherwise("late")
        .alias("period"),
        "event_type",
        F.least(F.floor(F.col("value") / 20.0).cast("long"), F.lit(4)).alias(
            "bucket"
        ),
    )
    counts = labeled.groupBy("event_type", "bucket").agg(
        F.sum(F.when(F.col("period") == "early", 1).otherwise(0))
        .cast("long")
        .alias("n_early"),
        F.sum(F.when(F.col("period") == "late", 1).otherwise(0))
        .cast("long")
        .alias("n_late"),
    )
    return psi_from_counts(counts)


def psi_from_counts(counts: DataFrame) -> DataFrame:
    """PSI report from an ``(event_type, bucket, n_early, n_late)``
    count frame — the Laplace smoothing (+0.5 over 5 buckets), the
    DECIMAL(18,8)-quantized terms and the final per-type aggregate.
    ONE definition shared by :func:`x_psi_drift` (batch scan) and
    ``s_psi_monitor`` (round6.py — streaming state accumulation), so
    their streaming == batch metric equality is structural, not two
    hand-copies of the same constants."""
    tot = counts.groupBy("event_type").agg(
        F.sum("n_early").alias("te"), F.sum("n_late").alias("tl")
    )
    pe = (F.col("n_early") + 0.5) / (F.col("te") + 2.5)
    pl = (F.col("n_late") + 0.5) / (F.col("tl") + 2.5)
    term = ((pe - pl) * F.log(pe / pl)).cast("decimal(18,8)")
    return (
        counts.join(F.broadcast(tot), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_buckets"),
            F.round(F.sum(term).cast("double"), 6).alias("psi"),
        )
    )


# ---------------------------------------------------------------------------
# x_user_coherent_sample — all-or-none per-entity sampling
# ---------------------------------------------------------------------------

_COHERENT_ORACLE = """
WITH sampled AS (
    SELECT user_id, event_id, event_type
    FROM events
    WHERE substr(md5(CAST(user_id AS VARCHAR)), 1, 2) < '1a'
)
SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT)
           AS n_purchases
FROM sampled
"""


@register("x_user_coherent_sample", oracle=_COHERENT_ORACLE)
def x_user_coherent_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENTITY-coherent sampling: hash the USER, not the event — a
    sampled user keeps every event, an unsampled user contributes none.
    Row-level sampling (``x_sample_hash``) silently destroys every
    session/funnel/retention metric computed downstream (half a user's
    events ⇒ broken gaps, phantom bounces); the coherent form preserves
    all within-user structure exactly, at the price of coarser sample-
    size control (user-count granularity). Same md5-prefix determinism,
    row-local predicate, no shuffle, composable into disjoint cohorts.
    """
    e = load(spark, sf_dir, "events")
    from .pipeline import key_hash

    keep = key_hash(F.col("user_id")).substr(1, 2) < "1a"
    s = e.where(keep)
    return s.agg(
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.count(F.when(F.col("event_type") == "purchase", 1))
        .cast("long")
        .alias("n_purchases"),
    )


# ---------------------------------------------------------------------------
# x_dedup_threshold_curve — pairs-vs-threshold tuning curve
# ---------------------------------------------------------------------------

_DEDUP_CURVE_ORACLE = """
WITH corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, text
    FROM documents WHERE doc_id < 10
), sh AS (
    SELECT doc_id,
           list_distinct(CASE WHEN len(str_split(text, ' ')) >= 3 THEN
               list_transform(range(len(str_split(text, ' ')) - 2),
                   i -> str_split(text, ' ')[i + 1] || ' ' ||
                        str_split(text, ' ')[i + 2] || ' ' ||
                        str_split(text, ' ')[i + 3])
               ELSE [text] END) AS shingles
    FROM corpus
), hs AS (
    SELECT doc_id,
           list_transform(shingles,
               s -> CAST('0x' || substr(md5(s), 1, 8) AS BIGINT)) AS h1s,
           list_transform(shingles,
               s -> CAST('0x' || substr(md5(s), 9, 8) AS BIGINT)) AS h2s
    FROM sh
), sigs AS (
    SELECT doc_id,
           list_transform(range(16), i ->
               list_min(list_transform(range(len(h1s)),
                   j -> h1s[j + 1] + i * h2s[j + 1]))) AS sig
    FROM hs
), banded AS (
    SELECT doc_id, band,
           CAST(sig[4 * band + 1] AS VARCHAR) || ':' ||
           CAST(sig[4 * band + 2] AS VARCHAR) || ':' ||
           CAST(sig[4 * band + 3] AS VARCHAR) || ':' ||
           CAST(sig[4 * band + 4] AS VARCHAR) AS bucket
    FROM sigs, range(4) t(band)
), cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM banded a JOIN banded b ON a.band = b.band AND a.bucket = b.bucket
    WHERE a.doc_id < b.doc_id
), hset AS (
    SELECT doc_id, list_distinct(h1s) AS hsig FROM hs
), verified AS (
    SELECT ROUND(CAST(len(list_intersect(s1.hsig, s2.hsig)) AS DOUBLE)
                 / len(list_distinct(list_concat(s1.hsig, s2.hsig))), 6)
               AS jaccard
    FROM cand
    JOIN hset s1 ON s1.doc_id = doc_a
    JOIN hset s2 ON s2.doc_id = doc_b
)
SELECT CAST(t AS DOUBLE) AS threshold,
       CAST(SUM(CASE WHEN jaccard >= t THEN 1 ELSE 0 END) AS BIGINT)
           AS n_pairs
FROM verified, (SELECT unnest([0.5, 0.6, 0.7, 0.8, 0.9]) AS t)
GROUP BY t
"""


@register("x_dedup_threshold_curve", oracle=_DEDUP_CURVE_ORACLE)
def x_dedup_threshold_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-threshold tuning curve: how many verified candidate pairs
    survive at Jaccard ≥ 0.5 / 0.6 / 0.7 / 0.8 / 0.9 — the report that
    picks a production threshold (too low eats legitimate near-misses,
    too high leaks templated spam) BEFORE committing a corpus-wide
    delete. One extra ~5-row spine join over the already-verified
    candidate scores (``x_dedup_near``'s machinery, shared stage cache)
    — the expensive signatures are computed once, the curve is free.
    """
    from .extensions import _minhash_parts

    scored = _minhash_parts(spark, sf_dir)["scored"]
    ts = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(t) for t in (0.5, 0.6, 0.7, 0.8, 0.9)])
        ).alias("threshold")
    )
    return (
        scored.crossJoin(F.broadcast(ts))
        .groupBy("threshold")
        .agg(
            F.sum(
                F.when(F.col("jaccard") >= F.col("threshold"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_pairs")
        )
    )


# ---------------------------------------------------------------------------
# x_time_decay — exponential recency-weighted aggregates
# ---------------------------------------------------------------------------

_TIME_DECAY_ORACLE = """
WITH horizon AS (
    SELECT MAX(CAST(ts AS TIMESTAMP)) AS h FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(SUM(CAST(
           value * EXP(-0.1 * date_diff('day',
                                        CAST(CAST(ts AS TIMESTAMP) AS DATE),
                                        CAST(h AS DATE)))
           AS DECIMAL(18,6))) AS DOUBLE), 4) AS decayed_value
FROM events, horizon
WHERE value IS NOT NULL
GROUP BY event_type
"""


@register("x_time_decay", oracle=_TIME_DECAY_ORACLE)
def x_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential time-decay aggregation: Σ value·e^(−λ·age_days)
    with λ = 0.1 against the corpus horizon — the recency weighting
    under trending-content ranks, decayed LTV, and freshness-biased
    sampling. Unlike ``q_ewma`` (an ORDERED fold, one value per step)
    this is an unordered weighted SUM, so it stays one commutative
    hash aggregate — each term decimal-quantized (day-grain ages make
    e^(−λ·age) one of ~30 doubles, bit-identical cross-engine) and
    summed exactly.
    """
    e = load(spark, sf_dir, "events").where(F.col("value").isNotNull())
    ts = F.col("ts").cast("timestamp")
    horizon = e.agg(F.max(ts).alias("h"))
    age = F.datediff(F.col("h").cast("date"), ts.cast("date"))
    term = (F.col("value") * F.exp(-0.1 * age)).cast("decimal(18,6)")
    return (
        e.crossJoin(F.broadcast(horizon))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum(term).cast("double"), 4).alias("decayed_value"),
        )
    )
