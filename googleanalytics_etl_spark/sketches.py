"""Mergeable distinct-count sketches (HyperLogLog, Apache DataSketches).

The exact rolling-distinct operator (``ops.analytics.q_rolling_wau``)
scales with |days|×|active users|; when even the distinct pair set is too
large — or when per-segment distinct counts must compose without
re-scanning — the warehouse answer is mergeable sketches: build one HLL
per partition/day ONCE, store the few-KB binaries, and answer any union
(7-day window, month, arbitrary segment set) by merging sketches instead
of touching data. Spark 3.5+ ships the DataSketches HLL family as
built-in aggregates (``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate``) — JVM-side, no UDF.

No registry entry: sketch binaries are engine-internal (DuckDB's
approx_count_distinct is a different sketch — same reason
``q_approx_distinct`` is rows-only), so the contract here is property
tests (tests/test_round3_ops.py): union-of-daily == whole-log estimate
exactly (HLL union at equal lgK is lossless), and the estimate lands
within the configured error bound of the exact count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# lgK = 12 → 4 KiB registers, ~1.6% relative standard error. One sketch
# per day costs ~4 KiB however many billions of events the day held.
LG_K = 12


def daily_user_sketches(events: DataFrame) -> DataFrame:
    """One HLL sketch of distinct user_ids per event day: (day, sketch)."""
    return (
        events.select(
            F.col("ts").cast("timestamp").cast("date").alias("day"), "user_id"
        )
        .groupBy("day")
        .agg(F.hll_sketch_agg("user_id", F.lit(LG_K)).alias("sketch"))
    )


def merged_distinct_estimate(sketches: DataFrame) -> int:
    """Distinct-user estimate for the UNION of the given sketch rows.

    Merging is the whole point: any day subset composes in sketch space
    — a 4 KiB-per-day scan, never a data scan.
    """
    row = sketches.agg(
        F.hll_sketch_estimate(
            F.hll_union_agg("sketch", F.lit(True))
        ).alias("estimate")
    ).first()
    return int(row["estimate"])


def rolling_window_estimates(events: DataFrame, days: int = 7) -> DataFrame:
    """Approximate q_rolling_wau: per-day sketches, merged over a
    trailing window in sketch space. Returns (day, wau_est)."""
    sk = daily_user_sketches(events)
    spine = sk.select(F.col("day").alias("wday"))
    return (
        sk.join(
            spine,
            (F.col("day") <= F.col("wday"))
            & (F.col("day") >= F.date_sub(F.col("wday"), days - 1)),
        )
        .groupBy("wday")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sketch", F.lit(True)))
            .cast("bigint")
            .alias("wau_est")
        )
        .select(F.col("wday").alias("day"), "wau_est")
    )


def daily_value_quantile_sketches(events: DataFrame) -> DataFrame:
    """One KLL sketch of ``value`` per event day: (day, ksketch).

    KLL is the mergeable-quantile counterpart to HLL's mergeable
    distinct: store a few-KB sketch per partition and answer any
    window/segment quantile by merging — no re-scan, no exact global
    sort. (Exact engine-checked percentiles live in q_percentiles; this
    is the at-scale approximate path.)
    """
    return (
        events.select(
            F.col("ts").cast("timestamp").cast("date").alias("day"),
            F.col("value").cast("double").alias("v"),
        )
        .groupBy("day")
        .agg(F.kll_sketch_agg_double("v").alias("ksketch"))
    )


def merged_quantile_estimate(sketches: DataFrame, q: float) -> float:
    """q-quantile of the UNION of the given daily sketches (merge in
    sketch space, then query)."""
    row = sketches.agg(
        F.kll_sketch_get_quantile_double(
            F.kll_merge_agg_double("ksketch"), F.lit(q)
        ).alias("est")
    ).first()
    return float(row["est"])


def segment_user_theta(events: DataFrame) -> DataFrame:
    """One Theta sketch of distinct user_ids per event_type.

    Theta sketches close distinct counting under SET ALGEBRA: union,
    intersection, and difference of segment audiences compose in sketch
    space — 'users who viewed AND purchased' without ever joining the
    raw log. HLL can only union; this is why both live in the module.
    """
    return events.groupBy("event_type").agg(
        F.theta_sketch_agg("user_id").alias("tsketch")
    )


def theta_union_estimate(sketches: DataFrame) -> int:
    """Distinct-user estimate of the union of all segment sketches."""
    row = sketches.agg(
        F.theta_sketch_estimate(F.theta_union_agg("tsketch")).alias("est")
    ).first()
    return int(row["est"])


def theta_intersection_estimate(sketches: DataFrame) -> int:
    """Distinct-user estimate of the intersection of the segment
    sketches (audience overlap).

    coalesce(1): theta_intersection_agg's partial state on an EMPTY
    partition would be the infinite set (DataSketches raises rather than
    fake it), so the few-row sketch frame must aggregate in one task —
    fine, since inputs here are one sketch per segment, never data-scale.
    """
    row = (
        sketches.coalesce(1)
        .agg(
            F.theta_sketch_estimate(
                F.theta_intersection_agg("tsketch")
            ).alias("est")
        )
        .first()
    )
    return int(row["est"])


def theta_difference_estimate(
    sketches: DataFrame, a: str, b: str
) -> int:
    """Distinct-user estimate of segment A MINUS segment B (users who
    did ``a`` but never ``b``) — the third set operation Theta closes
    that HLL cannot express at all (union-only) and exact SQL needs a
    data-scale anti-join for. ``theta_difference`` is a two-argument
    scalar over the two segments' sketches: a self-join of the few-row
    sketch frame on event_type, never a data scan.
    """
    sa = sketches.where(F.col("event_type") == a).select(
        F.col("tsketch").alias("ta")
    )
    sb = sketches.where(F.col("event_type") == b).select(
        F.col("tsketch").alias("tb")
    )
    row = sa.crossJoin(sb).select(
        F.theta_sketch_estimate(
            F.theta_difference("ta", "tb")
        ).alias("est")
    ).first()
    return int(row["est"])
