"""Single-node throughput: this engine vs a pandas re-implementation.

The reference executes in pandas on one core [REF-UNVERIFIED: SURVEY.md
§3.1 "single Python thread/process"]. This tool times the flagship
sessionization + per-session metrics both ways on the same fixture —
the honest apples-to-apples for "matches-or-beats the reference's
single-node throughput" (its real ceiling was the GA API quota, which
no local benchmark can represent).

Usage: python tools/compare_pandas.py [sf_dir]  → one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GAP_US = 30 * 60 * 1_000_000


def pandas_flagship(path: str) -> pd.DataFrame:
    """Faithful pandas form of q_flagship (groupby/shift/cumsum/agg)."""
    df = pd.read_parquet(path)
    df["ts"] = df["ts"].astype("datetime64[us]")
    df = df.sort_values(["user_id", "ts", "event_id"])
    us = df["ts"].astype("int64")
    gap = us - us.groupby(df["user_id"]).shift()
    is_new = gap.isna() | (gap > GAP_US)
    df["session_id"] = is_new.groupby(df["user_id"]).cumsum()
    df["purchase_value"] = df["value"].where(df["event_type"] == "purchase", 0.0)
    g = df.groupby(["user_id", "session_id"])
    return g.agg(
        session_start=("ts", "min"),
        session_end=("ts", "max"),
        n_events=("event_id", "size"),
        purchase_value=("purchase_value", "sum"),
        first_event_type=("event_type", "first"),
        last_event_type=("event_type", "last"),
    ).reset_index()


def scaled_copy(sf_dir: str, factor: int) -> str:
    """Materialize a ×factor event log (disjoint user/event id ranges per
    replica — same session structure, factor× the data) in .scratch."""
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch",
        f"events_x{factor}",
    )
    out = os.path.join(out_dir, "events.parquet")
    if not os.path.exists(out):
        os.makedirs(out_dir, exist_ok=True)
        base = pd.read_parquet(f"{sf_dir}/events.parquet")
        n_users = int(base["user_id"].max()) + 1
        reps = []
        for i in range(factor):
            r = base.copy()
            r["event_id"] = r["event_id"] + i * len(base)
            r["user_id"] = r["user_id"] + i * n_users
            reps.append(r)
        pd.concat(reps, ignore_index=True).to_parquet(out, index=False)
    return out_dir


def main() -> None:
    factor = int(os.environ.get("COMPARE_SCALE", "1"))
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    if factor > 1:
        sf_dir = scaled_copy(sf_dir, factor)
    events = f"{sf_dir}/events.parquet"

    t0 = time.perf_counter()
    pdf = pandas_flagship(events)
    t_pandas = time.perf_counter() - t0

    from googleanalytics_etl_spark import get_spark
    from googleanalytics_etl_spark.registry import queries

    spark = get_spark("pandas-compare")
    q = queries()["q_flagship"]
    q(spark, "/root/testdata/sf0.001").write.mode("overwrite").format(
        "noop"
    ).save()  # warm
    t0 = time.perf_counter()
    df = q(spark, sf_dir)
    df.write.mode("overwrite").format("noop").save()
    t_spark = time.perf_counter() - t0
    n_spark = q(spark, sf_dir).count()

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "pandas_sessions": int(len(pdf)),
                "spark_sessions": int(n_spark),
                "pandas_sec": round(t_pandas, 3),
                "spark_sec": round(t_spark, 3),
                "speedup": round(t_pandas / t_spark, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
