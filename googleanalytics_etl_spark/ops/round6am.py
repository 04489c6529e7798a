"""Round-6 batch 39: ETL quality gates — referential integrity,
point-in-time reconstruction.

- ``x_ri_audit`` — the referential-integrity audit every warehouse
  load gate runs: orphan facts (lineitems without their order, orders
  without their customer, lineitems referencing missing parts /
  suppliers) and childless parents (orders with no lineitems), one
  row per check with violation and population counts. All checks are
  anti-join counts — the join-key shuffles are the SAME exchanges the
  real queries pay, so a green audit also certifies the join keys the
  engine's plans rely on.
- ``x_scd2_snapshot`` — point-in-time reconstruction over the SCD2
  history (x_scd2's user-state dimension): each user's state AS OF
  {_SNAP_TS}, joined leak-free to their POST-snapshot purchase
  behavior. This is the feature-store primitive: training features
  must come from the dimension as it stood at prediction time, not
  the current row — the timestamp filter on [valid_from, valid_to) is
  the whole point-in-time-correctness contract.

Reference parity: no analogue [REF-UNVERIFIED — /root/reference is
empty]; SURVEY §2.J-M pipeline/curation extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

_SNAP_TS = "2024-01-15"  # snapshot instant for the point-in-time join

_RI_ORACLE = """
SELECT 'lineitem_orphan_order' AS check_name,
       CAST((SELECT COUNT(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey))
            AS BIGINT) AS n_violations,
       CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS n_checked
UNION ALL
SELECT 'order_no_lineitems',
       CAST((SELECT COUNT(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                               WHERE l.l_orderkey = o.o_orderkey))
            AS BIGINT),
       CAST((SELECT COUNT(*) FROM orders) AS BIGINT)
UNION ALL
SELECT 'order_orphan_customer',
       CAST((SELECT COUNT(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey))
            AS BIGINT),
       CAST((SELECT COUNT(*) FROM orders) AS BIGINT)
UNION ALL
SELECT 'lineitem_orphan_part',
       CAST((SELECT COUNT(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM part p
                               WHERE p.p_partkey = l.l_partkey))
            AS BIGINT),
       CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT)
UNION ALL
SELECT 'lineitem_orphan_supplier',
       CAST((SELECT COUNT(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM supplier s
                               WHERE s.s_suppkey = l.l_suppkey))
            AS BIGINT),
       CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT)
UNION ALL
SELECT 'customer_no_orders',
       CAST((SELECT COUNT(*) FROM customer c
             WHERE NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_custkey = c.c_custkey))
            AS BIGINT),
       CAST((SELECT COUNT(*) FROM customer) AS BIGINT)
"""


@register("x_ri_audit", oracle=_RI_ORACLE)
def x_ri_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over the TPC-H star: six anti-join
    checks (orphan facts in both fact tables, childless parents),
    each reported as (check, violations, population). A load gate
    runs this BEFORE publishing a batch; a nonzero row points at the
    extraction step that dropped or duplicated keys.

    Scale shape: each check is one left-anti join counted — dimension
    sides (part, supplier, customer) broadcast; the two fact↔orders
    checks shuffle on the orderkey both real workloads already hash
    on. Counts are map-side-combinable; the result is 6 rows. At
    100 TB the checks share scans with the load itself via
    DataFrame reuse (documented; here each stays independent so the
    oracle is table-local).
    """
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    p = load(spark, sf_dir, "part")
    s = load(spark, sf_dir, "supplier")

    def check(name: str, left: DataFrame, lk: str, right: DataFrame, rk: str,
              bcast: bool) -> DataFrame:
        rhs = F.broadcast(right.select(rk)) if bcast else right.select(rk)
        viol = left.select(lk).join(
            rhs, left[lk] == rhs[rk], "left_anti"
        )
        return (
            viol.agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
            .crossJoin(
                left.agg(F.count(F.lit(1)).cast("long").alias("n_checked"))
            )
            .select(
                F.lit(name).alias("check_name"),
                "n_violations",
                "n_checked",
            )
        )

    out = check("lineitem_orphan_order", li, "l_orderkey", o, "o_orderkey", False)
    for args in [
        ("order_no_lineitems", o, "o_orderkey", li, "l_orderkey", False),
        ("order_orphan_customer", o, "o_custkey", c, "c_custkey", True),
        ("lineitem_orphan_part", li, "l_partkey", p, "p_partkey", True),
        ("lineitem_orphan_supplier", li, "l_suppkey", s, "s_suppkey", True),
        ("customer_no_orders", c, "c_custkey", o, "o_custkey", False),
    ]:
        out = out.unionAll(check(*args))
    return out


_SNAP_ORACLE = f"""
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
           MIN(ts) AS valid_from
    FROM runs GROUP BY user_id, version
), hist AS (
    SELECT user_id, version, state, valid_from,
           LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY version)
               AS valid_to
    FROM per_run
), snap AS (
    SELECT user_id, version AS version_at, state AS state_at
    FROM hist
    WHERE valid_from <= TIMESTAMP '{_SNAP_TS}'
      AND (valid_to IS NULL OR valid_to > TIMESTAMP '{_SNAP_TS}')
), future AS (
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS later_purchases
    FROM e WHERE ts >= TIMESTAMP '{_SNAP_TS}'
    GROUP BY user_id
)
SELECT s.user_id, s.version_at, s.state_at,
       COALESCE(f.later_purchases, 0) AS later_purchases
FROM snap s LEFT JOIN future f ON f.user_id = s.user_id
"""


@register("x_scd2_snapshot", oracle=_SNAP_ORACLE)
def x_scd2_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time SCD2 snapshot: rebuild each user's state row AS
    OF {_SNAP_TS} from the type-2 history (the x_scd2 construction)
    via the ``valid_from ≤ T < valid_to`` filter, then join their
    POST-snapshot purchase counts. The feature-store contract in one
    op: features (state_at) strictly pre-date the label window
    (later_purchases) — joining the CURRENT dimension row here is the
    classic silent leak this key exists to regression-pin.

    Scale shape: the history build is the x_scd2 shape (one user
    shuffle, run-length windows); the snapshot filter selects ≤ 1 row
    per user; the label join is user-grain ↔ user-grain. At 100 TB
    the snapshot filter is a partition-prunable predicate when the
    history is stored partitioned by valid_from range. Scan-bound.
    """
    e = load(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    is_chg = F.when(
        F.lag("event_type").over(w).isNull()
        | (F.lag("event_type").over(w) != F.col("event_type")),
        1,
    ).otherwise(0)
    runs = e.withColumn("is_chg", is_chg).withColumn(
        "version",
        F.sum("is_chg")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    per_run = runs.groupBy("user_id", "version").agg(
        F.min("event_type").alias("state"),
        F.min("ts").alias("valid_from"),
    )
    hist = per_run.withColumn(
        "valid_to",
        F.lead("valid_from").over(
            Window.partitionBy("user_id").orderBy("version")
        ),
    )
    t = F.lit(_SNAP_TS).cast("timestamp_ntz")
    snap = hist.where(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    ).select(
        "user_id",
        F.col("version").alias("version_at"),
        F.col("state").alias("state_at"),
    )
    future = (
        e.where(F.col("ts") >= t)
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("long")
            .alias("later_purchases")
        )
    )
    return snap.join(future, "user_id", "left").select(
        "user_id",
        "version_at",
        "state_at",
        F.coalesce(F.col("later_purchases"), F.lit(0))
        .cast("long")
        .alias("later_purchases"),
    )
