"""Python DataSource writer (jsonl_audit): two-phase commit, lossless
payload, manifest accounting, and the observe() metrics surface."""

from __future__ import annotations

import json
from pathlib import Path

from conftest import SF_SMALL

from pyspark.sql import Observation
from pyspark.sql import functions as F

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.sources.jsonl_sink import register_jsonl_sink


def test_jsonl_sink_roundtrip_and_manifest(spark, tmp_path):
    register_jsonl_sink(spark)
    target = str(tmp_path / "audit")
    src = (
        load(spark, SF_SMALL, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .repartition(4)
    )
    src.write.format("jsonl_audit").option("path", target).mode("append").save()

    manifest = json.loads((Path(target) / "_MANIFEST.json").read_text())
    files = [e["file"] for e in manifest["files"]]
    assert manifest["total_rows"] == src.count()
    assert len(files) == 4  # one published file per partition
    # no unpublished stages remain
    assert not [p for p in Path(target).iterdir() if p.name.startswith(".")]
    # payload roundtrip: every record re-parses to the source rows
    got = []
    for f in files:
        for line in (Path(target) / f).read_text().splitlines():
            got.append(json.loads(line))
    want = [
        {"n_nationkey": r["n_nationkey"], "n_name": r["n_name"], "n_regionkey": r["n_regionkey"]}
        for r in src.collect()
    ]
    key = lambda d: d["n_nationkey"]  # noqa: E731
    assert sorted(got, key=key) == sorted(want, key=key)
    # manifest per-file counts sum exactly
    assert sum(e["n_rows"] for e in manifest["files"]) == len(want)


def test_jsonl_sink_second_write_republishes_atomically(spark, tmp_path):
    register_jsonl_sink(spark)
    target = str(tmp_path / "audit2")
    df = load(spark, SF_SMALL, "region").select("r_regionkey", "r_name")
    df.write.format("jsonl_audit").option("path", target).mode("append").save()
    m1 = json.loads((Path(target) / "_MANIFEST.json").read_text())
    df.write.format("jsonl_audit").option("path", target).mode("append").save()
    m2 = json.loads((Path(target) / "_MANIFEST.json").read_text())
    # the manifest is the commit point: it lists only the LATEST commit's
    # acknowledged files (append model: readers union manifests per
    # commit id in production; here the newest wins)
    assert m2["total_rows"] == df.count()
    assert all((Path(target) / e["file"]).exists() for e in m2["files"])
    assert m1["total_rows"] == df.count()


def test_observe_metrics_on_batch_pipeline(spark):
    """df.observe(): execution-time accumulators on a real pipeline —
    row counts and null audits collected WITHOUT a second scan (the
    instrumentation surface streaming listeners build on)."""
    obs = Observation("audit")
    e = load(spark, SF_SMALL, "events").observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum(F.when(F.col("props").isNull(), 1).otherwise(0)).alias("null_props"),
    )
    out = e.groupBy("event_type").count()
    n_types = out.count()
    assert n_types == 5
    got = obs.get
    want_rows = load(spark, SF_SMALL, "events").count()
    want_nulls = (
        load(spark, SF_SMALL, "events").where(F.col("props").isNull()).count()
    )
    assert got["rows_seen"] == want_rows
    assert got["null_props"] == want_nulls
