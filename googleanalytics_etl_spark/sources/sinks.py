"""Sinks (SURVEY.md §2.A): JDBC append, idempotent upsert, partitioned
parquet.

The reference appends typed rows to a SQL table via SQLAlchemy
``to_sql(append)`` after dropping already-loaded hit ids
[REF-UNVERIFIED]. The Spark forms:

- :func:`append_jdbc` — ``df.write.jdbc(mode='append')``; needs a JDBC
  driver jar on the classpath (none in this container → the call is
  import-gated and unit-tested for its error contract only).
- :func:`upsert_append` — insert-if-absent on a key: anti-join against
  the current target, then append. This is the batch form the streaming
  sync loop (ops/streaming.s_incremental_sync) reuses; on a lakehouse
  table it becomes ``MERGE INTO`` (Delta/Iceberg jars are also not in
  this container — documented upgrade path, same plan shape).
- :func:`write_partitioned` — hive-style partitioned layout, the scan
  side of partition pruning at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Default hash-bucket count for upsert targets. Mirrors the CDC MERGE
# state layout (ops/streaming._CDC_BUCKETS): at warehouse scale pick
# target_bytes / desired_file_size; 32 keeps sf0.1 files sensible.
SINK_BUCKETS = 32


def append_jdbc(df: DataFrame, url: str, table: str, **options: str) -> None:
    """Append rows to a JDBC table (SQLAlchemy ``to_sql`` analogue)."""
    writer = df.write.mode("append")
    for k, v in options.items():
        writer = writer.option(k, v)
    try:
        writer.jdbc(url, table)
    except Exception as e:  # no JDBC driver in this environment
        raise RuntimeError(
            "JDBC append failed — a driver jar (e.g. postgresql) must be on "
            "spark.jars; none ships in this container"
        ) from e


def _target_exists(spark: SparkSession, path: str) -> bool:
    """Existence check via Hadoop FS (works for any supported scheme).

    Deliberately NOT try/except around the read: a transient read error
    on an existing target must propagate, never be mistaken for
    "first load" — that confusion would overwrite accumulated history.
    """
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    return fs.exists(hpath)


def _is_bucketed(spark: SparkSession, path: str) -> bool:
    """True if the target uses the hive ``bucket=K`` layout."""
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    for st in fs.listStatus(hpath):
        if st.getPath().getName().startswith("bucket="):
            return True
    return False


def upsert_append(
    spark: SparkSession,
    incoming: DataFrame,
    target_path: str,
    key: str,
    n_buckets: int = SINK_BUCKETS,
) -> int:
    """Idempotent insert-if-absent on ``key`` into a parquet target.

    Returns the number of appended rows. Safe to re-run with overlapping
    extracts — the anti-join makes the append exactly-once per key. A
    read failure on an existing target raises (it is never treated as an
    empty target).

    Layout: the target is hash-bucketed on ``key`` into hive
    ``bucket=K`` directories (K = xxhash64(key) mod ``n_buckets``), the
    same pruned shape as the CDC MERGE state. The anti-join then reads
    ONLY the buckets the incoming batch's keys hash into (hive partition
    pruning — ``PartitionFilters`` on the scan), and the append writes
    files only under those buckets; a re-run with no fresh keys touches
    ZERO buckets. At 100 TB this bounds each sync's IO by the incoming
    key spread instead of the accumulated history size. Targets created
    before bucketing (no ``bucket=`` dirs) fall back to the flat
    full-scan anti-join.
    """
    bucket = F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int")
    if not _target_exists(spark, target_path):
        (
            incoming.withColumn("bucket", bucket)
            .repartition(n_buckets, "bucket")
            .write.partitionBy("bucket")
            .parquet(target_path)
        )
        # count the rows actually written, not a re-evaluation of the
        # incoming plan (which could differ if it is nondeterministic)
        return spark.read.parquet(target_path).count()

    if not _is_bucketed(spark, target_path):  # legacy flat target
        loaded = spark.read.parquet(target_path).select(key)
        fresh = incoming.join(loaded, key, "left_anti").persist()
        try:
            n = fresh.count()
            if n:
                fresh.write.mode("append").parquet(target_path)
        finally:
            fresh.unpersist()
        return n

    # persist: the touched-bucket set, the count, and the append must all
    # observe the SAME rows even if `incoming` is nondeterministic
    inc = incoming.withColumn("bucket", bucket).persist()
    try:
        # ≤ n_buckets rows — bounded metadata, never data-scale
        touched = [
            r["bucket"] for r in inc.select("bucket").distinct().collect()
        ]
        if not touched:
            return 0
        loaded = (
            spark.read.parquet(target_path)
            .where(F.col("bucket").isin(touched))  # dir-pruned scan
            .select(key)
        )
        fresh = inc.join(loaded, key, "left_anti").persist()
        try:
            n = fresh.count()
            if n:
                (
                    fresh.repartition(len(touched), "bucket")
                    .write.mode("append")
                    .partitionBy("bucket")
                    .parquet(target_path)
                )
        finally:
            fresh.unpersist()
        return n
    finally:
        inc.unpersist()


def write_partitioned(df: DataFrame, path: str, *partition_cols: str) -> None:
    """Partitioned parquet write (partition-pruned scans downstream)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
