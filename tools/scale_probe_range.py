"""Scaling probe for the banded range join (q_join_range_banded).

Replicates orders ×factor with BOTH a key offset and a TIME offset —
each replica's dates shift by rep · 40 000 days, far beyond the ±3-day
window, so replicas never pair with each other and per-band density
stays constant: the workload is "the same arrival rate, f× longer
history", the axis a real event table grows on. Under that invariant a
linear plan shows exponent ≈ 1; the BNLJ form this key replaces would
show ≈ 2 (every probe row × every build row).

Protocol per the round-cadence discipline: interleaved reps, median of
3 per (factor), exponent from the two largest factors.

Usage: python tools/scale_probe_range.py [factors...]  (default 1 16 64)
Appends one JSON line per measurement to tools/scale_probe_r12.jsonl.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from googleanalytics_etl_spark import get_spark
from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.ops.round12 import (
    _RANGE_BAND_W,
    _RANGE_RADIUS,
    _band_expand,
)

BASE = "/root/testdata/sf0.1"
OUT = Path(__file__).resolve().parent / "scale_probe_r12.jsonl"
_DAY_STRIDE = 40_000  # days between replicas: >> radius, no cross pairs


def scaled_orders(spark, factor: int):
    o = load(spark, BASE, "orders").select(
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")).alias("day"),
    )
    n = o.count()
    parts = [
        o.select(
            (F.col("o_orderkey") + F.lit(rep * n).cast("long")).alias(
                "o_orderkey"
            ),
            (F.col("day") + F.lit(rep * _DAY_STRIDE).cast("long")).alias(
                "day"
            ),
        )
        for rep in range(factor)
    ]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    return big


def banded_count(o):
    probe = o.withColumn("band", F.floor(F.col("day") / _RANGE_BAND_W))
    build = _band_expand(
        o.select(
            F.col("o_orderkey").alias("b_orderkey"),
            F.col("day").alias("b_day"),
        ),
        "b_day",
    )
    pairs = probe.join(build, "band").where(
        (F.abs(F.col("day") - F.col("b_day")) <= _RANGE_RADIUS)
        & (F.col("o_orderkey") != F.col("b_orderkey"))
    )
    return pairs.groupBy("o_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_near")
    )


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 16, 64]
    spark = get_spark("range-scale-probe")
    staged = {}
    for f in factors:
        df = scaled_orders(spark, f).localCheckpoint(eager=True)
        staged[f] = df
    # warm once at the smallest factor
    banded_count(staged[factors[0]]).write.mode("overwrite").format(
        "noop"
    ).save()
    times: dict[int, list[float]] = {f: [] for f in factors}
    for rep in range(3):  # interleaved: phase drift hits factors evenly
        for f in factors:
            t0 = time.perf_counter()
            banded_count(staged[f]).write.mode("overwrite").format(
                "noop"
            ).save()
            dt = round(time.perf_counter() - t0, 3)
            times[f].append(dt)
            rec = {"key": "q_join_range_banded", "factor": f, "rep": rep,
                   "sec": dt}
            print(json.dumps(rec))
            with open(OUT, "a") as fh:
                fh.write(json.dumps(rec) + "\n")
    med = {f: sorted(v)[1] for f, v in times.items()}
    f_lo, f_hi = factors[-2], factors[-1]
    exp = math.log(med[f_hi] / med[f_lo]) / math.log(f_hi / f_lo)
    summary = {"key": "q_join_range_banded", "medians": med,
               "exponent_hi": round(exp, 3)}
    print(json.dumps(summary))
    with open(OUT, "a") as fh:
        fh.write(json.dumps(summary) + "\n")


if __name__ == "__main__":
    main()
