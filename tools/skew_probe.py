"""Hot-gram skew A/B: one-pass window form vs groupBy+join forms.

The round-10 cliff fix chose the one-pass window form
(ops/round10.py::_dup_starts_one_pass) for the batch exact-substring
keys by measurement — but its documented trade (no map-side combine, so
a pathological boilerplate gram concentrates every occurrence in one
window task) was ARGUED, not measured. This tool measures it, per the
round-10 verdict's ask #4:

- **planted30**: the ×64 replicated corpus (320k docs, ~15M grams) with
  one fixed 8-token phrase prepended to 30 % of docs → ONE hot gram,
  df ≈ 96k (≈ 1.7× the mean shuffle-partition row count at 256
  partitions).
- **planted3x**: the same phrase prepended 3× to EVERY doc → 8 hot
  grams (the phrase's rotations), each df ≈ 0.96M (≈ 16× the mean
  partition) — proportionally FAR beyond the df ~10⁹-in-10¹³ boilerplate
  case the docstring worries about.
- **control**: the unplanted ×64 fixture.

Forms, identical downstream sweep (_merged_spans):
  C window      — _dup_starts_one_pass(occ)           (shipped batch shape)
  A join        — _dup_starts(occ, _gram_stats(occ))  (streaming shape, no hint)
  B join_hash   — same with a shuffle_hash hint on the stats side

Usage: python tools/skew_probe.py [reps]   (default 3; median reported)
Prints one JSON line per (fixture, form, rep) plus a summary.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from googleanalytics_etl_spark import get_spark
from googleanalytics_etl_spark.ops.round10 import (
    _SPAN_L,
    _dup_starts,
    _dup_starts_one_pass,
    _gram_stats,
    _merged_spans,
    _occ,
)

X64 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scratch", "scaleprobe", "x64", "documents.parquet",
)
SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scratch", "skewprobe",
)

HOT = " ".join(f"hotboiler{i}" for i in range(_SPAN_L))


def build(spark, name: str, copies: int, frac_mod: int) -> str:
    """Prepend `copies` copies of the hot phrase to docs with
    doc_id % 10 < frac_mod; write parquet; return path."""
    out = os.path.join(SCRATCH, name)
    done = os.path.join(out, "_SUCCESS")
    if os.path.exists(done):
        return out
    d = spark.read.parquet(X64)
    planted = d.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 10 < frac_mod,
            F.concat(F.lit((HOT + " ") * copies), F.col("text")),
        ).otherwise(F.col("text")),
    )
    planted.write.mode("overwrite").parquet(out)
    return out


FORMS = {
    "C_window": lambda occ: _merged_spans(_dup_starts_one_pass(occ)),
    "A_join": lambda occ: _merged_spans(_dup_starts(occ, _gram_stats(occ))),
    # identical to A except the hinted stats side — reuse _dup_starts so
    # the A/B comparison can never desynchronize from the shipped flag
    "B_join_hash": lambda occ: _merged_spans(
        _dup_starts(occ, _gram_stats(occ).hint("shuffle_hash"))
    ),
}


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("skew-probe")
    fixtures = {
        "control": X64,
        "planted30": build(spark, "planted30", copies=1, frac_mod=3),
        "planted3x": build(spark, "planted3x", copies=3, frac_mod=10),
    }
    docs = {
        n: spark.read.parquet(p).select("doc_id", "text")
        for n, p in fixtures.items()
    }
    # warm codegen on the control fixture once per form
    for fn in FORMS.values():
        fn(_occ(docs["control"])).write.mode("overwrite").format("noop").save()

    res: dict[tuple[str, str], list[float]] = {}
    for rep in range(reps):
        for fix, d in docs.items():  # interleaved: host drift spreads evenly
            for form, fn in FORMS.items():
                t0 = time.perf_counter()
                fn(_occ(d)).write.mode("overwrite").format("noop").save()
                sec = round(time.perf_counter() - t0, 3)
                res.setdefault((fix, form), []).append(sec)
                print(
                    json.dumps(
                        {"fixture": fix, "form": form, "rep": rep, "sec": sec}
                    ),
                    flush=True,
                )

    summary = {
        f"{fix}/{form}": round(statistics.median(v), 3)
        for (fix, form), v in res.items()
    }
    # skew penalty = planted median / control median, per form
    penalty = {
        form: {
            fix: round(summary[f"{fix}/{form}"] / summary[f"control/{form}"], 3)
            for fix in ("planted30", "planted3x")
        }
        for form in FORMS
    }
    print(json.dumps({"medians": summary, "skew_penalty": penalty}))


if __name__ == "__main__":
    main()
