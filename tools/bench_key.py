"""Per-key micro-bench: bench.py's exact methodology for a key subset.

Usage: python tools/bench_key.py KEY [KEY ...]

Same protocol as bench.py (fresh engine session, sf0.001 warmup per key,
noop-sink timing at $SPARK_GRAFT_SF_DIR), but only for the named keys and
with median-of-$SPARK_GRAFT_BENCH_REPS (default 3) so a single-key
optimization can be measured in seconds instead of re-running the whole
HEADLINE list. Prints one JSON line per key and a total line.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from googleanalytics_etl_spark import get_spark  # noqa: E402
from googleanalytics_etl_spark.registry import queries  # noqa: E402

from bench import run_query, scrub_session  # noqa: E402


def main() -> None:
    keys = sys.argv[1:]
    if not keys:
        print("usage: bench_key.py KEY [KEY ...]", file=sys.stderr)
        sys.exit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    warm_dir = "/root/testdata/sf0.001"
    warm = Path(warm_dir).exists()
    q = queries()
    spark = get_spark("gae-spark-bench-key")
    out: dict[str, float] = {}
    for key in keys:
        if key not in q:
            print(json.dumps({"key": key, "err": "unknown key"}))
            continue
        spark.sparkContext.setJobDescription(f"bench_key warm {key}")
        if warm:
            run_query(spark, q[key], warm_dir)
            scrub_session(spark)
        samples = []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"bench_key {key} rep{i}")
            samples.append(run_query(spark, q[key], sf_dir))
            scrub_session(spark)
        samples.sort()
        out[key] = round(samples[len(samples) // 2], 3)
        print(json.dumps({"key": key, "median_s": out[key], "reps": reps,
                          "samples": [round(s, 3) for s in samples]}))
    print(json.dumps({"metric": "bench_key_total", "value": round(sum(out.values()), 3),
                      "unit": "sec", "queries": out,
                      "sf": Path(sf_dir).name, "reps": reps}))


if __name__ == "__main__":
    main()
