"""GA-style report composites + pipeline maintenance operators.

The reference's end product is a set of web-analytics report tables
(sessions, landing pages, funnels) maintained incrementally over the
synced hit log [REF-UNVERIFIED: SURVEY.md §2.E/§3 — the checkout at
/root/reference was empty, semantics reconstructed from public knowledge
of avibrazil/GoogleAnalytics-ETL]. This module adds the classic GA
reports the round-1 flagship family did not yet cover — bounce rate,
entry/exit pages, path transitions, gap-filled time series — plus two
engine-discipline operators (incremental aggregate maintenance,
benchmark decontamination) that matter at 100 TB.

Scale posture shared by every op here: the event log is shuffled at most
once (on ``user_id`` for the session-based reports — the same single
Exchange q_sessionize is plan-asserted on), all post-session aggregates
operate on session-level or day-level cardinality (thousands of rows per
billion events), and no global sort appears anywhere. Cross-engine
determinism follows registry.py's conventions: exact decimal/integer
moments, fixed-shape IEEE float expressions, round(·, 6) surfaces,
identical aliases both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import dsum, register, sql_dsum
from .flagship import _SESSIONIZED_CTE, session_metrics

# ---------------------------------------------------------------------------
# q_bounce_rate — the GA "bounce rate by landing page" report
# ---------------------------------------------------------------------------

_BOUNCE_ORACLE = (
    _SESSIONIZED_CTE
    + """
, touched AS (
    SELECT user_id, session_id,
           FIRST_VALUE(event_type) OVER (PARTITION BY user_id, session_id
               ORDER BY ts, event_id) AS landing
    FROM sess
), per_session AS (
    SELECT user_id, session_id, MIN(landing) AS landing,
           COUNT(*) AS n_events
    FROM touched GROUP BY user_id, session_id
)
SELECT landing,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_bounces,
       ROUND(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
             / COUNT(*), 6) AS bounce_rate
FROM per_session
GROUP BY landing
"""
)


@register("q_bounce_rate", oracle=_BOUNCE_ORACLE)
def q_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounce rate per landing event type: share of single-event sessions.

    Reuses the single-shuffle sessionization (``session_metrics``); the
    final aggregate groups session-level rows (orders of magnitude
    smaller than the event log) by landing type — at 100 TB the second
    exchange moves per-session tuples, never raw events. The rate is a
    BIGINT/BIGINT divide (both engines produce the same IEEE double),
    rounded to 6.
    """
    s = session_metrics(load(spark, sf_dir, "events"))
    bounce = F.when(F.col("n_events") == 1, 1).otherwise(0)
    n_sessions = F.count(F.lit(1)).cast("long")
    n_bounces = F.sum(bounce).cast("long")
    return (
        s.withColumnRenamed("first_event_type", "landing")
        .groupBy("landing")
        .agg(
            n_sessions.alias("n_sessions"),
            n_bounces.alias("n_bounces"),
            F.round(n_bounces.cast("double") / n_sessions, 6).alias("bounce_rate"),
        )
    )


# ---------------------------------------------------------------------------
# q_entry_exit — entry/exit page matrix
# ---------------------------------------------------------------------------

_ENTRY_EXIT_ORACLE = (
    _SESSIONIZED_CTE
    + """
, touched AS (
    SELECT user_id, session_id,
           FIRST_VALUE(event_type) OVER (PARTITION BY user_id, session_id
               ORDER BY ts, event_id) AS entry_type,
           LAST_VALUE(event_type) OVER (PARTITION BY user_id, session_id
               ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS exit_type
    FROM sess
), per_session AS (
    SELECT user_id, session_id,
           MIN(entry_type) AS entry_type, MIN(exit_type) AS exit_type
    FROM touched GROUP BY user_id, session_id
)
SELECT entry_type, exit_type, CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM per_session
GROUP BY entry_type, exit_type
"""
)


@register("q_entry_exit", oracle=_ENTRY_EXIT_ORACLE)
def q_entry_exit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entry→exit matrix: how sessions start vs how they end (the GA
    landing/exit pages report collapsed to one contingency table).

    Session-level input (single event-log shuffle via session_metrics);
    the matrix aggregate is |event_types|² rows — broadcast-scale output
    regardless of input size.
    """
    s = session_metrics(load(spark, sf_dir, "events"))
    return (
        s.select(
            F.col("first_event_type").alias("entry_type"),
            F.col("last_event_type").alias("exit_type"),
        )
        .groupBy("entry_type", "exit_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
    )


# ---------------------------------------------------------------------------
# q_path_transitions — within-session Markov transition matrix
# ---------------------------------------------------------------------------

_TRANSITIONS_ORACLE = (
    _SESSIONIZED_CTE
    + """
, hops AS (
    SELECT LAG(event_type) OVER (PARTITION BY user_id, session_id
               ORDER BY ts, event_id) AS prev_type,
           event_type AS next_type
    FROM sess
), pairs AS (
    SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM hops WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
)
SELECT prev_type, next_type, n,
       ROUND(n / SUM(n) OVER (PARTITION BY prev_type), 6) AS p
FROM pairs
"""
)


@register("q_path_transitions", oracle=_TRANSITIONS_ORACLE)
def q_path_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition probabilities within sessions — the Markov
    matrix behind GA path analysis / data-driven attribution.

    The lag window reuses the sessionize (user_id; ts, event_id) sort —
    still one event-log shuffle; the probability window runs over the
    |types|² aggregate, not the log. p is n/Σn on BIGINTs (same IEEE
    divide both engines), rounded to 6.
    """
    from .flagship import sessionize

    e = load(spark, sf_dir, "events")
    s = sessionize(e)
    w = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    hops = s.select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).where(F.col("prev_type").isNotNull())
    pairs = hops.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    wp = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(wp), 6).alias("p"),
    )


# ---------------------------------------------------------------------------
# q_gap_fill — calendar spine + forward fill (time-series repair)
# ---------------------------------------------------------------------------

_GAP_FILL_ORACLE = """
WITH daily AS (
    SELECT event_type,
           CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
           {dsum}
    FROM events GROUP BY 1, 2
), bounds AS (
    SELECT event_type, MIN(day) AS lo, MAX(day) AS hi FROM daily GROUP BY 1
), spine AS (
    SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
    FROM bounds
), joined AS (
    SELECT s.event_type, s.day, d.v
    FROM spine s LEFT JOIN daily d
      ON s.event_type = d.event_type AND s.day = d.day
)
SELECT event_type, day,
       CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END AS observed,
       LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
FROM joined
""".format(dsum=sql_dsum("value", "v"))


@register("q_gap_fill", oracle=_GAP_FILL_ORACLE)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type daily value series with missing days forward-filled
    (LOCF) over a per-type calendar spine — the time-series repair step
    every daily report pipeline needs before charting/joining.

    The spine is generated from each type's [min, max] day (a tiny
    aggregate + ``sequence`` explode — spine size is days×types, never
    event-scale); the forward fill is ``last(v, ignorenulls)`` over the
    spine, i.e. a window over day-level rows only. Daily sums are exact
    decimal (`dsum`), so the filled doubles match DuckDB bit-for-bit.
    """
    e = load(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").cast("timestamp_ntz")
    daily = e.groupBy("event_type", day.alias("day")).agg(dsum("value", "v"))
    bounds = daily.groupBy("event_type").agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    spine = bounds.select(
        "event_type",
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day"),
    )
    joined = spine.join(daily, ["event_type", "day"], "left")
    wfill = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "event_type",
        "day",
        F.when(F.col("v").isNotNull(), 1).otherwise(0).alias("observed"),
        F.last("v", ignorenulls=True).over(wfill).alias("v_filled"),
    )


# ---------------------------------------------------------------------------
# q_histogram — fixed-width distribution binning
# ---------------------------------------------------------------------------

_HIST_WIDTH = 25_000

_HISTOGRAM_ORACLE = f"""
WITH b AS (
    SELECT CAST(floor(o_totalprice / {_HIST_WIDTH}) AS BIGINT) AS bucket
    FROM orders
), h AS (
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n FROM b GROUP BY bucket
)
SELECT bucket,
       CAST(bucket * {_HIST_WIDTH} AS DOUBLE) AS bucket_lo,
       n,
       ROUND(n / SUM(n) OVER (), 6) AS share
FROM h
"""


@register("q_histogram", oracle=_HISTOGRAM_ORACLE)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals with each bucket's share —
    the distribution profile report (and the skew diagnostic an engine
    runs before choosing a partitioning).

    One map-side-combined aggregate over the scan; the share window runs
    over the ~20-bucket output. floor(x/width) on doubles is the same
    IEEE operation in both engines.
    """
    o = load(spark, sf_dir, "orders")
    b = o.select(
        F.floor(F.col("o_totalprice") / _HIST_WIDTH).cast("long").alias("bucket")
    )
    h = b.groupBy("bucket").agg(F.count(F.lit(1)).cast("long").alias("n"))
    return h.select(
        "bucket",
        (F.col("bucket") * _HIST_WIDTH).cast("double").alias("bucket_lo"),
        "n",
        F.round(F.col("n") / F.sum("n").over(Window.partitionBy()), 6).alias(
            "share"
        ),
    )


# ---------------------------------------------------------------------------
# q_correlation — exact-moment Pearson correlation
# ---------------------------------------------------------------------------

_CORR_ORACLE = """
WITH m AS (
    SELECT l_returnflag,
           CAST(COUNT(*) AS DOUBLE) AS n,
           CAST(SUM(CAST(CAST(ROUND(l_quantity) AS BIGINT)
                         AS DECIMAL(38,0))) AS DOUBLE) AS sx,
           CAST(SUM(CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                         AS DECIMAL(38,0))) AS DOUBLE) AS sy,
           CAST(SUM(CAST(CAST(ROUND(l_quantity) AS BIGINT)
                         * CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                         AS DECIMAL(38,0))) AS DOUBLE) AS sxy,
           CAST(SUM(CAST(CAST(ROUND(l_quantity) AS BIGINT)
                         * CAST(ROUND(l_quantity) AS BIGINT)
                         AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
           CAST(SUM(CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                         * CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                         AS DECIMAL(38,0))) AS DOUBLE) AS syy
    FROM lineitem
    GROUP BY l_returnflag
)
SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
       ROUND((n * sxy - sx * sy)
             / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
           AS corr_qty_price
FROM m
"""


@register("q_correlation", oracle=_CORR_ORACLE)
def q_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation (quantity vs extended price) per return flag
    — metric-covariance profiling, computed from EXACT integer moments.

    Naive ``corr()`` accumulates doubles and is partial-order dependent
    (Spark's partial/final merge vs DuckDB's scan order ⇒ last-ulp
    drift). Instead the five moments are summed as DECIMAL(38,0) over
    exact integers (quantity is integral; price has 2 decimals → ×100):
    associative, overflow-safe past 10³⁶, map-side combinable. The final
    corr is one fixed-shape IEEE expression on the moment doubles —
    bit-identical across engines, rounded to 6. One aggregate, one tiny
    window-free projection; scales like any hash aggregate.
    """
    li = load(spark, sf_dir, "lineitem")
    x = F.round(F.col("l_quantity")).cast("long")
    y = F.round(F.col("l_extendedprice") * 100).cast("long")
    d38 = "decimal(38,0)"
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x.cast(d38)).cast("double").alias("sx"),
        F.sum(y.cast(d38)).cast("double").alias("sy"),
        F.sum((x * y).cast(d38)).cast("double").alias("sxy"),
        F.sum((x * x).cast(d38)).cast("double").alias("sxx"),
        F.sum((y * y).cast(d38)).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    corr = F.round(
        (n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6
    )
    return m.select(
        "l_returnflag",
        n.cast("long").alias("n_rows"),
        corr.alias("corr_qty_price"),
    )


# ---------------------------------------------------------------------------
# q_incremental_agg — partial-aggregate maintenance (merge = recompute)
# ---------------------------------------------------------------------------

_INCR_CUTOVER = "1998-01-01 00:00:00"

_INCREMENTAL_ORACLE = f"""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       {sql_dsum("o_totalprice", "total")}
FROM orders
GROUP BY o_orderpriority
"""


@register("q_incremental_agg", oracle=_INCREMENTAL_ORACLE)
def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: a historical partial aggregate
    merged with a fresh-delta partial aggregate equals the full
    recompute — the pattern that lets a 100 TB daily report update by
    scanning ONLY the new partition (the reference's whole reason to
    exist is this incremental sync [REF-UNVERIFIED]).

    Both halves pre-aggregate to (priority, count, exact decimal sum)
    partials; the merge re-aggregates partials (sum of counts, sum of
    decimal sums — associative by construction, so partial∘partial ≡
    full). The oracle is the FULL recompute: the hash match *proves* the
    incremental identity cross-engine. The decimal→double cast happens
    only after the merge.
    """
    o = load(spark, sf_dir, "orders")
    cut = F.lit(_INCR_CUTOVER).cast("timestamp_ntz")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).cast("long").alias("pn"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("psum"),
        )

    hist = partial(o.where(F.col("o_orderdate") < cut))
    delta = partial(o.where(F.col("o_orderdate") >= cut))
    return (
        hist.unionByName(delta)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("pn").cast("long").alias("n_orders"),
            F.sum("psum").cast("double").alias("total"),
        )
    )


# ---------------------------------------------------------------------------
# x_decontaminate — benchmark n-gram contamination scan
# ---------------------------------------------------------------------------

_DECON_ORACLE = """
WITH bench AS (
    SELECT DISTINCT
        CAST('0x' || substr(md5(unnest(list_distinct(
            CASE WHEN len(str_split(text, ' ')) >= 3 THEN
                list_transform(range(len(str_split(text, ' ')) - 2),
                    i -> str_split(text, ' ')[i + 1] || ' ' ||
                         str_split(text, ' ')[i + 2] || ' ' ||
                         str_split(text, ' ')[i + 3])
            ELSE [text] END))), 1, 15) AS BIGINT) AS h
    FROM documents WHERE source = 'src0'
), train AS (
    SELECT doc_id,
           unnest(list_distinct(
               CASE WHEN len(str_split(text, ' ')) >= 3 THEN
                   list_transform(range(len(str_split(text, ' ')) - 2),
                       i -> str_split(text, ' ')[i + 1] || ' ' ||
                            str_split(text, ' ')[i + 2] || ' ' ||
                            str_split(text, ' ')[i + 3])
               ELSE [text] END)) AS shingle
    FROM documents WHERE source <> 'src0'
), hashed AS (
    SELECT doc_id, CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) AS h
    FROM train
)
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(COUNT(b.h) AS BIGINT) AS n_hit,
       ROUND(COUNT(b.h) / COUNT(*), 6) AS contamination
FROM hashed t LEFT JOIN bench b USING (h)
GROUP BY t.doc_id
"""


@register("x_decontaminate", oracle=_DECON_ORACLE)
def x_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: per training document, the fraction of
    its distinct word 3-grams that also appear in a held-out benchmark
    corpus (here: ``source = 'src0'``) — the overlap scan run before any
    corpus ships to training.

    Shingles are md5-hashed to 60-bit longs on BOTH sides, so the join
    shuffles (doc_id, hash) longs — never text. The benchmark side is
    distinct-deduped first (benchmark ≪ corpus; at scale Spark broadcasts
    it — at fixture scale AQE decides). Contamination is hit/total on
    per-doc distinct shingles, rounded to 6. Linear in corpus size; the
    only quadratic-risk step (the hash join) is keyed on rare 3-grams.
    """
    from .extensions import word_shingles

    d = load(spark, sf_dir, "documents")
    # materialize the split once — word_shingles over an inline split()
    # re-evaluates it per lambda element (O(words²) per doc)
    sh = d.select(
        "doc_id", "source", F.split("text", " ").alias("words")
    ).select("doc_id", "source", word_shingles(F.col("words")).alias("shingles"))
    h = F.conv(
        F.substring(F.md5(F.col("shingle").cast("binary")), 1, 15), 16, 10
    ).cast("long")
    bench = (
        sh.where(F.col("source") == "src0")
        .select(F.explode("shingles").alias("shingle"))
        .select(h.alias("h"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    train = (
        sh.where(F.col("source") != "src0")
        .select("doc_id", F.explode("shingles").alias("shingle"))
        .select("doc_id", h.alias("h"))
    )
    joined = train.join(bench, "h", "left")
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_shingles"),
        F.count("hit").cast("long").alias("n_hit"),
        F.round(F.count("hit") / F.count(F.lit(1)), 6).alias("contamination"),
    )


# ---------------------------------------------------------------------------
# q_ewma — exponentially-weighted moving average (ordered fold)
# ---------------------------------------------------------------------------

_EWMA_ORACLE = """
WITH daily AS (
    SELECT event_type,
           CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
           {dsum}
    FROM events GROUP BY 1, 2
), arr AS (
    SELECT event_type, list(v ORDER BY day) AS vs,
           CAST(COUNT(*) AS BIGINT) AS n_days
    FROM daily GROUP BY event_type
)
SELECT event_type, n_days,
       ROUND(list_reduce(vs, (acc, x) -> 0.25 * x + 0.75 * acc), 6) AS ewma
FROM arr
""".format(dsum=sql_dsum("value", "v"))


@register("q_ewma", oracle=_EWMA_ORACLE)
def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA of each event type's daily value series (α = 0.25) — the
    recursive smoother (y_t = α·x_t + (1−α)·y_{t−1}) that plain window
    frames cannot express, computed as an ORDERED FOLD with the built-in
    higher-order ``aggregate`` — JVM-side, no UDF.

    Scale shape: the event log collapses to day-level rows in one hash
    aggregate; only then does ``collect_list`` build per-type arrays
    (years of days ≈ thousands of elements — driver-safe and
    executor-local). Determinism: daily values are exact-decimal sums
    (identical doubles both engines); the fold seeds with the first
    day's value and applies the same IEEE expression in the same
    day-order (array_sort on unique struct keys ⇔ DuckDB's
    ``list(v ORDER BY day)``), with α = 0.25 exactly representable in
    binary. DuckDB's ``list_reduce`` seeds from the first element — the
    Spark side folds ``slice(vs, 2, …)`` over ``element_at(vs, 1)`` to
    match.
    """
    e = load(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").cast("timestamp_ntz")
    daily = e.groupBy("event_type", day.alias("day")).agg(dsum("value", "v"))
    arr = daily.groupBy("event_type").agg(
        F.expr("array_sort(collect_list(struct(day, v)))").alias("s"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )
    return arr.select(
        "event_type",
        "n_days",
        F.expr(
            "round(aggregate(slice(transform(s, r -> r.v), 2, size(s) - 1), "
            "element_at(transform(s, r -> r.v), 1), "
            "(acc, x) -> 0.25D * x + 0.75D * acc), 6)"
        ).alias("ewma"),
    )


# ---------------------------------------------------------------------------
# x_pagerank — iterative PageRank on the session-transition graph
# ---------------------------------------------------------------------------

_PR_ITERS = 5

def _pr_iter_cte(k: int) -> str:
    prev = f"r{k - 1}"
    return f"""
r{k} AS (
    SELECT n0.v,
           ROUND(0.15 / (SELECT n FROM nn)
                 + 0.85 * COALESCE(c.s, 0.0), 12) AS r
    FROM nodes n0 LEFT JOIN (
        SELECT w.v AS v,
               CAST(SUM(CAST(ROUND(p.r * w.w, 12) AS DECIMAL(38,12)))
                    AS DOUBLE) AS s
        FROM w JOIN {prev} p ON w.u = p.v
        GROUP BY w.v) c ON n0.v = c.v
)"""


_PAGERANK_ORACLE = (
    _SESSIONIZED_CTE
    + """
, hops AS (
    SELECT LAG(event_type) OVER (PARTITION BY user_id, session_id
               ORDER BY ts, event_id) AS u,
           event_type AS v
    FROM sess
), edges AS (
    SELECT u, v, CAST(COUNT(*) AS BIGINT) AS n
    FROM hops WHERE u IS NOT NULL GROUP BY u, v
), outdeg AS (
    SELECT u, CAST(SUM(n) AS BIGINT) AS nu FROM edges GROUP BY u
), w AS (
    SELECT e.u, e.v, e.n / o.nu AS w FROM edges e JOIN outdeg o USING (u)
), nodes AS (
    SELECT DISTINCT event_type AS v FROM events
), nn AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes
), r0 AS (
    SELECT v, 1.0 / (SELECT n FROM nn) AS r FROM nodes
),"""
    + ",".join(_pr_iter_cte(k) for k in range(1, _PR_ITERS + 1))
    + f"""
SELECT v AS event_type, r AS pagerank FROM r{_PR_ITERS}
"""
)


@register("x_pagerank", oracle=_PAGERANK_ORACLE)
def x_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the within-session event-type transition graph
    ({iters} fixed iterations, damping 0.85, no dangling redistribution)
    — the iterative-join pattern (contribution join → re-aggregate →
    re-join) that SQL cannot express without unrolling, driven from
    plain DataFrame ops in a Python loop.

    Scale shape: the 100 TB event log is touched ONCE (the sessionize
    shuffle that builds transition counts); every iteration then runs on
    the reduced graph — |types|² edges here, page-graph-sized in
    general, where each iteration is one shuffle join + one aggregate.
    The same loop handles billion-edge graphs; for long chains insert
    ``localCheckpoint()`` every ~10 iterations to cut lineage.

    Cross-engine determinism (the oracle unrolls the recursion into
    {iters} chained CTEs): edge weights are BIGINT/BIGINT divides;
    each contribution is round(r·w, 12) then summed EXACTLY as
    DECIMAL(38,12) — associative, order-free — and each new rank is
    re-rounded to 12, so no float accumulation ever depends on
    partitioning.
    """
    from .flagship import sessionize

    e = load(spark, sf_dir, "events")
    s = sessionize(e)
    wlag = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    hops = s.select(
        F.lag("event_type").over(wlag).alias("u"),
        F.col("event_type").alias("v"),
    ).where(F.col("u").isNotNull())
    edges = hops.groupBy("u", "v").agg(F.count(F.lit(1)).cast("long").alias("n"))
    outdeg = edges.groupBy("u").agg(F.sum("n").cast("long").alias("nu"))
    w = (
        edges.join(outdeg, "u")
        .select("u", "v", (F.col("n") / F.col("nu")).alias("w"))
        .persist()
    )
    nodes = e.select(F.col("event_type").alias("v")).distinct().persist()
    n_nodes = nodes.count()  # node count: a scalar both engines agree on
    r = nodes.select("v", (F.lit(1.0) / F.lit(n_nodes)).alias("r"))
    for _ in range(_PR_ITERS):
        contrib = (
            w.join(r.withColumnRenamed("v", "pv"), F.col("u") == F.col("pv"))
            .groupBy(F.col("v").alias("cv"))
            .agg(
                F.sum(
                    F.round(F.col("r") * F.col("w"), 12).cast("decimal(38,12)")
                )
                .cast("double")
                .alias("s")
            )
        )
        r = nodes.join(contrib, nodes.v == F.col("cv"), "left").select(
            nodes.v.alias("v"),
            F.round(
                F.lit(0.15) / n_nodes + 0.85 * F.coalesce(F.col("s"), F.lit(0.0)),
                12,
            ).alias("r"),
        )
    return r.select(F.col("v").alias("event_type"), F.col("r").alias("pagerank"))


x_pagerank.__doc__ = x_pagerank.__doc__.format(iters=_PR_ITERS)


# ---------------------------------------------------------------------------
# x_scd2 — type-2 slowly-changing-dimension history from a change log
# ---------------------------------------------------------------------------

_SCD2_ORACLE = """
WITH e AS (
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type
    FROM events
), flagged AS (
    SELECT *,
           CASE WHEN LAG(event_type) OVER w IS NULL
                  OR LAG(event_type) OVER w <> event_type
                THEN 1 ELSE 0 END AS is_chg
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), runs AS (
    SELECT *,
           CAST(SUM(is_chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS version
    FROM flagged
), per_run AS (
    SELECT user_id, version, MIN(event_type) AS state,
           MIN(ts) AS valid_from, CAST(COUNT(*) AS BIGINT) AS n_events
    FROM runs GROUP BY user_id, version
)
SELECT user_id, version, state, valid_from,
       LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY version)
           AS valid_to,
       LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY version) IS NULL
           AS is_current,
       n_events
FROM per_run
"""


@register("x_scd2", oracle=_SCD2_ORACLE)
def x_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 SCD history: compress a change log into validity intervals.

    The classic incremental-ETL dimension-maintenance op the reference's
    sync loop feeds [REF-UNVERIFIED: SURVEY.md §3 — user-state history
    from the hit log; checkout was empty]: per user, consecutive events
    with the same state collapse into one version row carrying
    ``[valid_from, valid_to)`` and ``is_current`` (open interval).

    Scale: ONE shuffle on user_id serves the whole op — the change-flag
    window, the run groupBy (its (user_id, version) clustering is
    satisfied by the user_id hash partitioning), and the lead() window
    all reuse the same Exchange (plan-asserted). Output cardinality is
    |state changes|, typically orders of magnitude below |events|, so a
    100 TB log compresses before anything downstream touches it.
    """
    e = load(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    runs = e.withColumn(
        "is_chg",
        F.when(prev.isNull() | (prev != F.col("event_type")), 1).otherwise(0),
    ).withColumn(
        "version",
        F.sum("is_chg")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long"),
    )
    per_run = runs.groupBy("user_id", "version").agg(
        F.min("event_type").alias("state"),
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    w2 = Window.partitionBy("user_id").orderBy("version")
    nxt = F.lead("valid_from").over(w2)
    return per_run.select(
        "user_id",
        "version",
        "state",
        "valid_from",
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
        "n_events",
    )


_ROLLING_WAU_ORACLE = """
WITH du AS (
    SELECT DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, user_id
    FROM events
), days AS (
    SELECT DISTINCT day FROM du
)
SELECT d.day,
       CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS wau
FROM days d
JOIN du u ON u.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
GROUP BY d.day
"""


@register("q_rolling_wau", oracle=_ROLLING_WAU_ORACLE)
def q_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling distinct users per day (WAU) — the windowed
    COUNT(DISTINCT) no window frame can express (frames aggregate rows,
    they cannot re-distinct across them).

    Classic decomposition: dedup to (day, user) pairs FIRST — the only
    data-scale shuffle, and it shrinks the input to at most
    days×users — then a range join of the small distinct-pair set
    against the day spine re-buckets each pair into the ≤7 windows it
    serves, and a count-distinct per window day finishes. At 100 TB the
    event scan never joins anything; everything after the first dedup
    is proportional to |days|×|active users|, not to events. (The exact
    sliding-distinct problem has no partial-merge shortcut — HLL union
    is the approximate alternative when even the pair set is too big.)
    """
    e = load(spark, sf_dir, "events")
    du = (
        e.select(
            F.col("ts").cast("timestamp").cast("date").alias("day"), "user_id"
        )
        .distinct()
    )
    days = du.select("day").distinct()
    d = days.select(F.col("day").alias("wday"))
    return (
        du.join(
            d,
            (F.col("day") <= F.col("wday"))
            & (F.col("day") >= F.date_sub(F.col("wday"), 6)),
        )
        .groupBy("wday")
        .agg(F.countDistinct("user_id").cast("bigint").alias("wau"))
        .select(F.col("wday").alias("day"), "wau")
    )


_RECURSIVE_REACH_ORACLE = """
WITH RECURSIVE ordered AS (
    SELECT user_id, event_type, ts, event_id,
           LEAD(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS next_type
    FROM events
), edges AS (
    SELECT DISTINCT event_type AS src, next_type AS dst
    FROM ordered
    WHERE next_type IS NOT NULL AND event_type <> next_type
), reach(node, depth) AS (
    SELECT 'signup', 0
    UNION ALL
    SELECT e.dst, r.depth + 1
    FROM reach r JOIN edges e ON e.src = r.node
    WHERE r.depth < 4
)
SELECT node AS event_type, CAST(MIN(depth) AS BIGINT) AS min_hops
FROM reach GROUP BY node
"""


@register("q_recursive_cte", oracle=_RECURSIVE_REACH_ORACLE)
def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 ``WITH RECURSIVE``): transitive
    reachability over the event-type transition graph — min hops from
    'signup' to every reachable event type.

    The graph is session-reduced FIRST (distinct consecutive-type pairs
    — at most |types|² edges regardless of event volume), so the
    recursion runs on a handful of rows; the data-scale work is the one
    lag window. This is the declarative face of what graph.py does
    imperatively: Catalyst unrolls the fixpoint, and the depth guard
    bounds it exactly like the iteration cap there. Identical SQL runs
    on DuckDB for the full hash oracle.
    """
    e = load(spark, sf_dir, "events")
    e.createOrReplaceTempView("__rec_events")
    return spark.sql(
        _RECURSIVE_REACH_ORACLE.replace("FROM events", "FROM __rec_events")
        .replace("'signup', 0", "'signup', CAST(0 AS INT)")
    )
