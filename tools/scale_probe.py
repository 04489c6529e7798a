"""Empirical scaling evidence for the heaviest LLM-pipeline keys.

SCALE.md argues analytically that each heavy operator's plan is ~linear
(or a documented n^1.5); this tool MEASURES it: replicate the relevant
fixture table ×factor with per-replica transformations that keep the
WITHIN-replica structure byte-identical while guaranteeing replicas
never collide (so candidate/pair density stays constant and the data
truly is "the same workload, f× bigger"):

- documents: doc_id offset by rep·N (ids stay contiguous from 0, the
  s_dedup_near staging invariant); every WORD gets a ``_r{rep}`` suffix
  for rep > 0 — an injective per-replica token remap, so shingle sets
  within a replica are isomorphic to the original while NO shingle
  matches across replicas (a plain text prefix would leave the tail
  shingles identical and make every doc an f-way near-duplicate).
- embeddings: vec_id offset by rep·N; a deterministic Rademacher ±1
  sign flip per (rep, dim) for rep > 0 — cosines within a replica are
  EXACTLY preserved (signs cancel), cross-replica dot products become
  pseudo-random sign sums ≈ 0, far below every similarity threshold.
- lineitem: l_orderkey / l_partkey offsets by rep·(max+1) — disjoint
  isomorphic co-purchase graphs.

Keys probed (the 5 heaviest by BASELINE.md):
  s_dedup_near (documents), x_semdedup (embeddings),
  x_weighted_jaccard (documents), x_cc_sizes (documents),
  x_clustering_coef (lineitem).

Usage: python tools/scale_probe.py [factors...]   (default 1 16 64)
Prints one JSON line per (key, factor) plus a final exponent summary:
exponent = log(t_hi / t_lo) / log(f_hi / f_lo) over the two largest
factors (the smallest is dominated by fixed job-setup constants).
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from googleanalytics_etl_spark import get_spark
from googleanalytics_etl_spark.registry import queries

BASE = "/root/testdata/sf0.1"
SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scratch",
    "scaleprobe",
)
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
KEYS = {
    "s_dedup_near": "documents",
    "x_semdedup": "embeddings",
    "x_weighted_jaccard": "documents",
    "x_cc_sizes": "documents",
    "x_clustering_coef": "lineitem",
    # round-9 data-selection batch: the per-replica token remap keeps the
    # feature count per doc constant while making replica vocabularies
    # disjoint — the bucket model stays 1024 rows at every factor, so the
    # designed shape is linear in occurrences
    "x_dsir_weights": "documents",
    # winnowing: the per-replica token remap keeps gram vocabularies
    # disjoint, so fingerprint df (hence the match join's Σ df² fan-out)
    # stays constant across factors — the designed shape is linear
    "x_winnow_matches": "documents",
    # round-10 exact-substring dedup: the token remap keeps replica gram
    # vocabularies disjoint, so the duplicated-gram density (hence the
    # flag-join fan-out and span count per replica) is constant across
    # factors — the designed shape is linear in gram occurrences
    "x_exact_substring_dedup": "documents",
    # corpus rewrite stage: shares x_exact_substring_dedup's one-pass
    # window shape (the ×128 cliff was about exactly this shape) plus a
    # token-grain rebuild — probed to ×128 per the round-10 verdict
    "x_exact_substring_clean": "documents",
    # span-level decontamination: each replica's src0 docs carry that
    # replica's token remap, so benchmark and train sides grow together
    # with constant per-replica contamination density — the asymmetric
    # broadcast-flag shape should be linear
    "x_decontaminate_spans": "documents",
}

# Optional subset: SCALE_PROBE_KEYS=key1,key2 probes only those keys
# (the fixtures are content-cached, so a single-key rerun is cheap).
_env_keys = os.environ.get("SCALE_PROBE_KEYS")
if _env_keys:
    KEYS = {k: v for k, v in KEYS.items() if k in _env_keys.split(",")}


def _signs(rep: int, d: int) -> list[float]:
    """Deterministic Rademacher ±1 pattern (identity for rep 0).

    Uses a real hash bit per (rep, dim): the earlier
    ``(rep*ODD + dim*ODD) % 2`` recipe degenerated to ``(rep+dim) % 2``
    (two patterns total — same-parity replicas became exact cosine
    duplicates, inflating cross-replica candidate density and
    contaminating the measured scaling exponents; ADVICE.md round 8).
    md5 gives ~independent patterns, so cross-replica dot products stay
    ≈0 and pair density is genuinely constant across factors.
    """
    if rep == 0:
        return [1.0] * d
    return [
        1.0
        if hashlib.md5(f"{rep}:{dim}".encode()).digest()[0] & 1 == 0
        else -1.0
        for dim in range(d)
    ]


def build(spark, factor: int) -> str:
    out = os.path.join(SCRATCH, f"x{factor}")
    done = os.path.join(out, "_BUILT")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    rep = spark.range(factor).select(F.col("id").cast("long").alias("rep"))

    d = spark.read.parquet(f"{BASE}/documents.parquet")
    n_docs = d.count()
    docs = d.crossJoin(rep).select(
        (F.col("doc_id") + F.col("rep") * n_docs).alias("doc_id"),
        F.when(F.col("rep") == 0, F.col("text"))
        .otherwise(
            F.array_join(
                F.transform(
                    F.split("text", " "),
                    lambda w: F.concat(
                        w, F.lit("_r"), F.col("rep").cast("string")
                    ),
                ),
                " ",
            )
        )
        .alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    docs.write.mode("overwrite").parquet(f"{out}/documents.parquet")

    e = spark.read.parquet(f"{BASE}/embeddings.parquet")
    n_vec = e.count()
    dim = len(e.select("embedding").first()["embedding"])
    signs = spark.createDataFrame(
        [(r, _signs(r, dim)) for r in range(factor)],
        "rep long, signs array<float>",
    )
    vecs = e.crossJoin(F.broadcast(signs)).select(
        (F.col("vec_id") + F.col("rep") * n_vec).alias("vec_id"),
        F.zip_with(
            "embedding", "signs", lambda x, s: (x * s).cast("float")
        ).alias("embedding"),
        "label",
    )
    vecs.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")

    li = spark.read.parquet(f"{BASE}/lineitem.parquet")
    mo, mp = li.agg(F.max("l_orderkey"), F.max("l_partkey")).first()
    lines = li.crossJoin(rep).select(
        (F.col("l_orderkey") + F.col("rep") * (mo + 1)).alias("l_orderkey"),
        (F.col("l_partkey") + F.col("rep") * (mp + 1)).alias("l_partkey"),
        "l_suppkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate",
    )
    lines.write.mode("overwrite").parquet(f"{out}/lineitem.parquet")

    for t in TABLES:
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{BASE}/{t}.parquet", dst)
    open(done, "w").close()
    return out


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 16, 64]
    spark = get_spark("scale-probe")
    q = queries()
    dirs = {f: build(spark, f) for f in factors}
    rows_at = {
        (t, f): spark.read.parquet(f"{dirs[f]}/{t}.parquet").count()
        for t in {"documents", "embeddings", "lineitem"}
        for f in factors
    }
    # warm once at the smallest fixture (codegen, not data)
    for key in KEYS:
        q[key](spark, "/root/testdata/sf0.001").write.mode(
            "overwrite"
        ).format("noop").save()

    results: dict[str, dict[int, float]] = {k: {} for k in KEYS}
    for f in factors:
        for key, table in KEYS.items():
            t0 = time.perf_counter()
            q[key](spark, dirs[f]).write.mode("overwrite").format(
                "noop"
            ).save()
            sec = round(time.perf_counter() - t0, 3)
            results[key][f] = sec
            print(
                json.dumps(
                    {
                        "key": key,
                        "factor": f,
                        "rows": rows_at[(table, f)],
                        "sec": sec,
                    }
                ),
                flush=True,
            )

    import math

    lo, hi = factors[-2], factors[-1]
    summary = {
        key: round(
            math.log(results[key][hi] / results[key][lo])
            / math.log(hi / lo),
            3,
        )
        for key in KEYS
    }
    print(json.dumps({"exponent_between": [lo, hi], "exponents": summary}))


if __name__ == "__main__":
    main()
