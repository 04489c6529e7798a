"""High-level config-driven ETL facade — the reference's user-facing API,
re-expressed (SURVEY.md §3.2 EP1').

The reference is driven by a YAML config mapping GA dimensions/metrics to
target columns and dtypes; ``GoogleAnalyticsETL.sync()`` reads the target
high-water mark, extracts the tail, renames/casts/derives, drops
already-loaded hit ids, and appends [REF-UNVERIFIED: SURVEY.md §3.1].

:class:`SyncPipeline` is that surface on Spark: a declarative config
(plain dict — YAML-loadable) builds one Catalyst plan
``scan → project/cast → derive → anti-join(target) → append``. The same
config drives the batch path here and the streaming path in
ops/streaming.py — identical semantics, per the §1.2 contract.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .sources.sinks import upsert_append

# Example config: the fixture event log with reference-style derivations
# (rename map, declared dtypes, derived hit id + day bucket).
EXAMPLE_CONFIG: dict = {
    "source_table": "events",
    "key": "hit_id",
    "watermark_col": "hit_ts",
    "columns": {  # source → (target name, cast)
        "event_id": ("source_event_id", "bigint"),
        "ts": ("hit_ts", "timestamp_ntz"),
        "user_id": ("client_id", "bigint"),
        "event_type": ("hit_type", "string"),
        "value": ("metric_value", "double"),
    },
    "derived": {  # target name → SQL expression over *renamed* columns
        "hit_id": "sha2(concat_ws('|', client_id, unix_micros(cast(hit_ts as timestamp))), 256)",
        "hit_day": "cast(date_trunc('day', hit_ts) as date)",
    },
}


@dataclass
class SyncPipeline:
    """Config-driven incremental sync: the reference's ``.sync()``.

    ``config`` follows :data:`EXAMPLE_CONFIG`. The target is a parquet
    path (production: a lakehouse table; same plan with MERGE INTO).
    """

    spark: SparkSession
    config: dict
    target_path: str
    _runs: list[int] = field(default_factory=list)

    # -- the transform surface (EP1' steps 3-4) --------------------------

    def project(self, source: DataFrame) -> DataFrame:
        """Rename + cast per the declared column map, then derive."""
        cols: list[Column] = [
            F.col(src).cast(dtype).alias(tgt)
            for src, (tgt, dtype) in self.config["columns"].items()
        ]
        df = source.select(*cols)
        for name, expr in self.config.get("derived", {}).items():
            df = df.withColumn(name, F.expr(expr))
        return df

    # -- the sync loop (EP1' steps 1-5) ----------------------------------

    def high_water_mark(self):
        """Read max(watermark_col) from the target (None if no target).

        Uses an explicit existence check — a read error on an existing
        target must raise, not silently restart the sync from zero.
        """
        from .sources.sinks import _target_exists

        if not _target_exists(self.spark, self.target_path):
            return None
        t = self.spark.read.parquet(self.target_path)
        row = t.agg(F.max(self.config["watermark_col"]).alias("hwm")).first()
        return row["hwm"]

    def sync(self, source: DataFrame, reextract_overlap: str = "1 hour") -> int:
        """Incremental sync: extract the tail since HWM (minus a trailing
        re-extract overlap for late data — the reference's anti-late-hit
        window), transform, drop already-loaded keys, append.

        Returns appended row count. Idempotent: re-running appends 0.
        """
        staged = self.project(source)
        hwm = self.high_water_mark()
        if hwm is not None:
            cutoff = F.lit(hwm).cast("timestamp_ntz") - F.expr(
                f"INTERVAL {reextract_overlap}"
            )
            staged = staged.where(F.col(self.config["watermark_col"]) > cutoff)
        n = upsert_append(self.spark, staged, self.target_path, self.config["key"])
        self._runs.append(n)
        return n

    def backfill(self, source: DataFrame) -> int:
        """EP2': full reload — overwrite the target from scratch."""
        staged = self.project(source)
        staged.write.mode("overwrite").parquet(self.target_path)
        return staged.count()

    def target(self) -> DataFrame:
        # drop the sink's internal hash-bucket partition column (no-op
        # for flat/backfilled targets)
        return self.spark.read.parquet(self.target_path).drop("bucket")
