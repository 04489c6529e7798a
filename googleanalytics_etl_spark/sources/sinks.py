"""Sinks (SURVEY.md §2.A): JDBC append, idempotent upsert, partitioned
parquet.

The reference appends typed rows to a SQL table via SQLAlchemy
``to_sql(append)`` after dropping already-loaded hit ids
[REF-UNVERIFIED]. The Spark forms:

- :func:`append_jdbc` — ``df.write.jdbc(mode='append')``; needs a JDBC
  driver jar on the classpath. Round-7 discovery: pyspark SHIPS Derby's
  embedded driver (for the Hive metastore), so the real write path is
  exercised end-to-end by ``q_jdbc_roundtrip`` / ``s_jdbc_sync``
  (ops/round7.py, full hash oracles); server drivers (postgres, mysql)
  are still absent and keep the tested error contract.
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
    n = BucketedUpsertSink(target_path, key, n_buckets).upsert(
        incoming, count_appended=True
    )
    assert n is not None
    return n


class BucketedUpsertSink:
    """Reusable upsert sink: caches target metadata across micro-batches.

    A ``foreachBatch`` sync loop calls :func:`upsert_append` once per
    micro-batch; the stateless form re-probes the target every time —
    two Hadoop-FS round-trips (exists? bucketed?) plus a parquet
    schema-inference footer read — even though those facts only change
    when THIS sink appends. A run-scoped instance probes once, caches
    the target schema after first contact, and (for callers that do not
    need the appended-row count, like the streaming loop whose
    idempotency is already guaranteed by the anti-join) offers
    ``count_appended=False``: the fresh-rows plan is evaluated exactly
    once by the write itself instead of persist → count → write,
    dropping one full Spark job per micro-batch. All of this is
    job-setup constant, not data IO — the touched-buckets-only pruning
    contract is byte-identical to :func:`upsert_append` and covered by
    the same tests (tests/test_streaming.py asserts appended files land
    only under incoming-key buckets when driven through this sink).

    PRECONDITION — single writer: the cached state/schema are valid only
    while this instance is the path's sole writer for the run. If the
    target is created, replaced, or schema-evolved by anything else
    between calls (a second sink on the same path, a concurrent
    stateless ``upsert_append``), the stale "empty" probe would skip the
    anti-join and duplicate rows. Callers that share a path must create
    a fresh instance (or call :meth:`invalidate`) after any external
    write; the registered streaming keys each own a run-scoped scratch
    path, so they satisfy this by construction.
    """

    def __init__(
        self,
        target_path: str,
        key: str,
        n_buckets: int = SINK_BUCKETS,
    ) -> None:
        self.target_path = target_path
        self.key = key
        self.n_buckets = n_buckets
        self._state: str | None = None  # None → unprobed; "empty"/"flat"/"bucketed"
        self._schema = None  # target schema once known (incl. bucket partition col)

    def invalidate(self) -> None:
        """Drop the cached probe/schema — call after any OTHER writer
        touches the target path, so the next upsert re-probes."""
        self._state = None
        self._schema = None

    def _probe(self, spark: SparkSession) -> str:
        if self._state is None:
            if not _target_exists(spark, self.target_path):
                self._state = "empty"
            elif _is_bucketed(spark, self.target_path):
                self._state = "bucketed"
            else:
                self._state = "flat"
        return self._state

    def _read_target(self, spark: SparkSession) -> DataFrame:
        reader = spark.read
        if self._schema is not None:
            # cached schema skips the per-batch footer-inference pass;
            # partition discovery (bucket=K dirs) still prunes as usual
            reader = reader.schema(self._schema)
        df = reader.parquet(self.target_path)
        if self._schema is None:
            self._schema = df.schema
        return df

    def upsert(
        self, incoming: DataFrame, count_appended: bool = True
    ) -> int | None:
        """Insert-if-absent ``incoming`` rows; same contract as
        :func:`upsert_append`. With ``count_appended=False`` the
        appended count is not computed (returns None) and the fresh-row
        plan runs once, inside the write."""
        spark = incoming.sparkSession
        state = self._probe(spark)
        bucket = F.pmod(
            F.xxhash64(F.col(self.key)), F.lit(self.n_buckets)
        ).cast("int")

        if state == "empty":
            (
                incoming.withColumn("bucket", bucket)
                .repartition(self.n_buckets, "bucket")
                .write.partitionBy("bucket")
                .parquet(self.target_path)
            )
            self._state = "bucketed"
            if count_appended:
                return self._read_target(spark).count()
            return None

        if state == "flat":  # legacy flat target — full-scan anti-join
            loaded = self._read_target(spark).select(self.key)
            fresh = incoming.join(loaded, self.key, "left_anti").persist()
            try:
                n = fresh.count()
                if n:
                    fresh.write.mode("append").parquet(self.target_path)
            finally:
                fresh.unpersist()
            return n if count_appended else None

        # bucketed: persist so the touched-bucket set, the anti-join and
        # the append all observe the SAME rows even if `incoming` is
        # nondeterministic
        inc = incoming.withColumn("bucket", bucket).persist()
        try:
            # ≤ n_buckets rows — bounded metadata, never data-scale
            touched = [
                r["bucket"]
                for r in inc.select("bucket").distinct().collect()
            ]
            if not touched:
                return 0 if count_appended else None
            loaded = (
                self._read_target(spark)
                .where(F.col("bucket").isin(touched))  # dir-pruned scan
                .select(self.key)
            )
            fresh = inc.join(loaded, self.key, "left_anti")

            def _write(df: DataFrame) -> None:
                # one shuffle partition per touched bucket → exactly one
                # file appended per bucket per sync, bounding small-file
                # growth at any scale (measured: beats an AQE-coalesced
                # column repartition at fixture scale too)
                (
                    df.repartition(len(touched), "bucket")
                    .write.mode("append")
                    .partitionBy("bucket")
                    .parquet(self.target_path)
                )

            if not count_appended:
                # single evaluation of the anti-join, inside the write
                _write(fresh)
                return None
            fresh = fresh.persist()
            try:
                n = fresh.count()
                if n:
                    _write(fresh)
            finally:
                fresh.unpersist()
            return n
        finally:
            inc.unpersist()


def write_partitioned(df: DataFrame, path: str, *partition_cols: str) -> None:
    """Partitioned parquet write (partition-pruned scans downstream)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
