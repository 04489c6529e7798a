"""§2.C — join operators.

The reference enriches hits with lookup metadata via in-memory dict/pandas
merges and dedups re-extracted hits against already-loaded ids — an
anti-join [REF-UNVERIFIED: SURVEY.md §2.C]. Here every variant is a
Catalyst join with an explicit distribution strategy:

- dimension joins broadcast (``q_join_broadcast`` pins it; AQE converts
  the others at runtime when the build side is small),
- the fact-fact range join keeps an equi-key so it planable as a hash
  join with a residual range filter (never a BNL cross product at scale),
- the as-of join is a single window pass (no self-join blowup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

_JOIN_INNER_ORACLE = """
SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
FROM orders JOIN customer ON o_custkey = c_custkey
"""


@register("q_join_inner", oracle=_JOIN_INNER_ORACLE)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join: facts × dimension on key."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


_JOIN_LEFT_ORACLE = """
SELECT c_custkey, c_name, o_orderkey, o_totalprice
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
"""


@register("q_join_left", oracle=_JOIN_LEFT_ORACLE)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join: keep dimension rows with no matching facts."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


_JOIN_BROADCAST_ORACLE = """
SELECT l_orderkey, l_linenumber, l_partkey, p_name, p_brand
FROM lineitem JOIN part ON l_partkey = p_partkey
"""


@register("q_join_broadcast", oracle=_JOIN_BROADCAST_ORACLE)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast hash join: small dim ships to every task, zero shuffle
    of the fact table. Plan shape asserted in tests/test_plans.py."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    return li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "l_orderkey", "l_linenumber", "l_partkey", "p_name", "p_brand"
    )


_JOIN_SEMI_ORACLE = """
SELECT c_custkey, c_name
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


@register("q_join_semi", oracle=_JOIN_SEMI_ORACLE)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join (EXISTS): customers having at least one order."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


_JOIN_ANTI_ORACLE = """
WITH loaded AS (
    SELECT event_id FROM events WHERE ts < TIMESTAMP '2024-01-15 00:00:00'
)
SELECT event_id, user_id, event_type, value
FROM events
WHERE NOT EXISTS (SELECT 1 FROM loaded WHERE loaded.event_id = events.event_id)
"""


@register("q_join_anti", oracle=_JOIN_ANTI_ORACLE)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join (NOT EXISTS) — the reference's incremental dedup:
    a re-extract keeps only hits whose id is absent from the
    already-loaded set before appending (SURVEY.md §2.C q_join_anti)."""
    e = load(spark, sf_dir, "events")
    loaded = e.where(
        F.col("ts") < F.lit("2024-01-15").cast("timestamp_ntz")
    ).select("event_id")
    return e.join(loaded, "event_id", "left_anti").select(
        "event_id", "user_id", "event_type", "value"
    )


_JOIN_RANGE_ORACLE = """
SELECT l_orderkey, l_linenumber, l_shipdate, o_orderdate
FROM lineitem JOIN orders
  ON l_orderkey = o_orderkey
 AND l_shipdate BETWEEN o_orderdate AND o_orderdate + INTERVAL 90 DAY
"""


@register("q_join_range", oracle=_JOIN_RANGE_ORACLE)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/interval join: ship date within 90 days of the order date.

    Keeps the equi-key in the condition so Catalyst plans a hash/sort-merge
    join with the BETWEEN as a residual filter — a pure theta join would be
    a broadcast-nested-loop and die at 100 TB. For equi-key-free range
    joins at scale, bucket the time axis first (see SURVEY.md §4).
    """
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    cond = (
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate <= o.o_orderdate + F.expr("INTERVAL 90 DAY"))
    )
    return li.join(o, cond).select(
        "l_orderkey", "l_linenumber", "l_shipdate", "o_orderdate"
    )


_JOIN_ASOF_ORACLE = """
SELECT event_id, user_id, ts, last_view_ts
FROM (
    SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
           MAX(CASE WHEN event_type = 'view' THEN CAST(ts AS TIMESTAMP) END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_view_ts
    FROM events
)
WHERE event_type = 'purchase'
"""


@register("q_join_asof", oracle=_JOIN_ASOF_ORACLE)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (backward) join: each purchase matched to the latest strictly
    earlier 'view' of the same user — last-touch attribution.

    Implemented as ONE window pass over the union of both sides (a running
    MAX of view timestamps), not a self-join: O(n log n) per user partition
    and a single shuffle, where the naive join+filter+rank plan would
    shuffle twice and blow up on skewed users.
    """
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_view = F.max(
        F.when(F.col("event_type") == "view", F.col("ts"))
    ).over(w)
    return (
        e.withColumn("last_view_ts", last_view)
        .where(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "last_view_ts")
    )


_SUBQUERY_CORR_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice,
       (SELECT COUNT(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
           AS cust_orders
FROM orders o
"""


@register("q_subquery_correlated", oracle=_SUBQUERY_CORR_ORACLE)
def q_subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery through the SQL entry point — Catalyst
    decorrelates it to an aggregate + join (RewriteCorrelatedScalarSubquery,
    SURVEY.md §4), so the executed plan is shuffle-equivalent to the
    manual groupBy+join a user would hand-write."""
    o = load(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__corr_orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice,
               (SELECT COUNT(*) FROM __corr_orders o2
                WHERE o2.o_custkey = o.o_custkey) AS cust_orders
        FROM __corr_orders o
        """
    )


_SUBQUERY_EXISTS_ORACLE = """
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_totalprice > 300000)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderstatus = 'F'
                    AND o.o_totalprice < 50000)
"""


@register("q_subquery_exists", oracle=_SUBQUERY_EXISTS_ORACLE)
def q_subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS through the SQL entry point.

    Catalyst rewrites the pair to a left-semi plus a left-anti join
    (RewritePredicateSubquery) — exactly the `q_join_semi`/`q_join_anti`
    physical shapes, proving the SQL surface and the DataFrame surface
    converge on the same plans.
    """
    load(spark, sf_dir, "customer").createOrReplaceTempView("__ex_customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("__ex_orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM __ex_customer c
        WHERE EXISTS (SELECT 1 FROM __ex_orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000)
          AND NOT EXISTS (SELECT 1 FROM __ex_orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderstatus = 'F'
                            AND o.o_totalprice < 50000)
        """
    )


_BLOOM_SEMI_ORACLE = """
SELECT l.l_orderkey, l.l_partkey, l.l_quantity, l.l_extendedprice
FROM lineitem l
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_orderkey = l.l_orderkey
                AND o.o_totalprice > 400000)
"""

# Bloom geometry: m bits as longs. 2^16 bits / 64 = 1024 longs = 8 KiB —
# broadcast-literal scale even with millions of build keys (saturation
# just raises the false-positive rate, never breaks correctness because
# an exact semi-join follows).
_BLOOM_BITS = 1 << 16
_BLOOM_WORDS = _BLOOM_BITS // 64
_BLOOM_K = 4


def _bloom_positions(key: F.Column) -> list:
    """k Kirsch-Mitzenmacher probe positions for ``key``.

    One 64-bit xxhash64 yields two independent 31-bit halves h1/h2; probe
    i hits ``(h1 + i*h2) mod m`` — k probes for the price of one hash,
    the same derivation the MinHash family uses (ops/extensions.py).
    """
    h = F.xxhash64(key)
    h1 = F.pmod(h, F.lit(1 << 31))
    h2 = F.pmod(F.shiftrightunsigned(h, 31), F.lit(1 << 31))
    return [
        F.pmod(h1 + F.lit(i) * h2, F.lit(_BLOOM_BITS)).cast("int")
        for i in range(_BLOOM_K)
    ]


@register("x_bloom_semi", oracle=_BLOOM_SEMI_ORACLE)
def x_bloom_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter-pruned semi join (runtime-filter pattern, explicit).

    Catalyst's own InjectRuntimeFilter does exactly this for large scans
    (build a bloom from the selective side, pre-filter the probe side
    before its shuffle) but only above
    ``runtime.bloomFilter.applicationSideScanSizeThreshold`` (10 GB), so
    at 100 TB it fires and in a correctness fixture it never would. This
    operator builds the same structure explicitly so the plan shape is
    testable at any scale:

    1. Build side: the k=4 probe positions of every selective orders key
       are OR-folded into a 2^16-bit bitmap with ONE ``bit_or`` hash
       aggregate (map-side partials, 8 KiB result) — the only driver
       materialization is that bitmap, never key data.
    2. Probe side: a lineitem row survives iff all k probed bits are set
       — pure codegen bit arithmetic against the 1024-long literal
       array, zero shuffle, zero Python-per-row.
    3. An exact left-semi join removes bloom false positives, so the
       result equals the plain semi join (the oracle) bit-for-bit; the
       bloom's only job is shrinking the probe side's shuffle, which is
       the 100 TB win.

    tests/test_plans.py asserts the probe filter sits under the scan
    stage (no extra exchange) and tests/test_joins.py asserts the
    pre-filter passes strictly fewer rows than the full table.
    """
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    sel = orders.where(F.col("o_totalprice") > 400000).select("o_orderkey")

    # 1. bitmap build: per-key word/bit coords -> bit_or per word index.
    pos = F.explode(F.array(*_bloom_positions(F.col("o_orderkey")))).alias("p")
    words = (
        sel.select(pos)
        .select(
            (F.col("p") / 64).cast("int").alias("w"),
            # Python-API shiftleft wants a literal shift; SQL takes a column
            F.expr("shiftleft(CAST(1 AS BIGINT), p % 64)").alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("word"))
        .collect()
    )
    bitmap = [0] * _BLOOM_WORDS
    for r in words:
        bitmap[r["w"]] = r["word"]

    # 2. probe: all k bits set -> candidate. element_at is 1-indexed.
    lit_map = F.lit(bitmap)

    def bit_set(p: F.Column) -> F.Column:
        word = F.element_at(lit_map, (p / 64).cast("int") + 1)
        # SQL shiftrightunsigned accepts a column shift; Python API doesn't
        return (
            F.call_function(
                "shiftrightunsigned", word, F.pmod(p, F.lit(64)).cast("int")
            ).bitwiseAND(F.lit(1))
            == 1
        )

    probes = [bit_set(p) for p in _bloom_positions(F.col("l_orderkey"))]
    cond = probes[0]
    for p in probes[1:]:
        cond = cond & p
    candidates = li.where(cond)

    # 3. exact semi join (false positives out; bloom is perf-only).
    return candidates.join(
        sel, candidates.l_orderkey == sel.o_orderkey, "left_semi"
    ).select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")


_BAND_BROADCAST_ORACLE = """
WITH tiers(tier, lo, hi) AS (
    VALUES ('micro', 0.0, 10.0), ('small', 10.0, 50.0),
           ('mid', 50.0, 200.0), ('large', 200.0, 1000.0),
           ('whale', 1000.0, 1e12)
)
SELECT e.event_id, e.value, t.tier
FROM events e JOIN tiers t ON e.value >= t.lo AND e.value < t.hi
"""


@register("q_join_band_broadcast", oracle=_BAND_BROADCAST_ORACLE)
def q_join_band_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure non-equi band join against a broadcast tier table —
    BroadcastNestedLoopJoin as the CORRECT plan, not an accident.

    Unlike q_join_range (equi-key + residual range), a tier/band lookup
    has no equi key at all. The only scalable physical strategies are
    (a) broadcast the tiny band table and nested-loop it per row — the
    fact side never shuffles, cost = rows × |bands| comparisons, all
    codegen — or (b) interval-bucket both sides when the band table is
    itself large. Spark picks (a) exactly when the band side fits the
    broadcast threshold; the plan test asserts BroadcastNestedLoopJoin
    and the absence of any fact-side exchange. A shuffle implementation
    of this join would be a cartesian — the thing the plan lint bans.
    """
    tiers = spark.createDataFrame(
        [
            ("micro", 0.0, 10.0),
            ("small", 10.0, 50.0),
            ("mid", 50.0, 200.0),
            ("large", 200.0, 1000.0),
            ("whale", 1000.0, 1e12),
        ],
        "tier string, lo double, hi double",
    )
    e = load(spark, sf_dir, "events")
    return (
        e.join(
            F.broadcast(tiers),
            (e.value >= tiers.lo) & (e.value < tiers.hi),
        )
        .select("event_id", "value", "tier")
    )
