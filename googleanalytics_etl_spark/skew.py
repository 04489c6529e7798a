"""Skew mitigation utilities (SURVEY.md §4; the 100 TB mandate).

First-line defense is AQE (``spark.sql.adaptive.skewJoin.enabled`` — on
in our session builder): it splits oversized shuffle partitions at
runtime. These helpers cover the cases AQE cannot fix:

- a *known* pathological key distribution (bot users in an event log)
  where you want deterministic pre-planning rather than runtime repair,
- aggregations whose per-key state is itself huge (``collect_list``,
  exact ``count_distinct``) — partial aggregation doesn't shrink those,
  so the hot key must be physically split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_n: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with hot-key salting.

    The big side gets a uniform random-ish salt derived from a unique
    row expression (hash of all columns — deterministic, no ``rand()``
    so the plan stays reproducible); the small side is replicated
    ``salt_n`` times. The shuffle key becomes (key, salt), spreading a
    hot key over ``salt_n`` reducers. Memory cost: small side ×
    ``salt_n`` — use only when the small side is modest but above the
    broadcast threshold.

    Only join types where unmatched *small*-side rows are never emitted
    are supported: a right/full outer join would emit each unmatched
    replicated row ``salt_n`` times.
    """
    if how not in {"inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti", "cross"}:
        raise ValueError(
            f"salted_join does not support how={how!r}: the replicated "
            "small side would duplicate unmatched rows in right/full "
            "outer joins"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_n))
    big_s = big.withColumn("__salt", salt)
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1)))
    ).withColumn("__salt", F.col("__salt").cast("long"))
    out = big_s.join(small_s, [key, "__salt"], how)
    return out.drop("__salt")


def salted_distinct_count(
    df: DataFrame, group_key: str, distinct_col: str, salt_n: int = 16
) -> DataFrame:
    """Exact COUNT(DISTINCT x) per group, hot-group-safe.

    Two-phase: (group, salt-of-x) partial distinct, then merge. The
    expansion shuffle of a naive count_distinct concentrates a hot
    group on one reducer; salting on the *distinct value* splits it
    while keeping exactness (a value always lands in the same salt
    bucket, so cross-bucket double counting is impossible).
    """
    salt = F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(salt_n))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(group_key, "__salt")
        .agg(F.countDistinct(distinct_col).alias("__n"))
    )
    return partial.groupBy(group_key).agg(
        F.sum("__n").cast("long").alias("n_distinct")
    )
