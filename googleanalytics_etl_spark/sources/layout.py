"""Data-layout management: clustered writes and small-file compaction.

At 100 TB the difference between a table that answers a selective query
in seconds and one that scans everything is *layout*, not compute:

- **Clustered writes** (``cluster_write``): range-partition on the
  cluster keys and sort within each partition before writing. Every
  parquet row group then covers a narrow min/max span of the keys, so
  engines (Spark, DuckDB, Trino, ...) skip row groups on selective
  predicates — the open-format equivalent of Delta OPTIMIZE ZORDER for
  the single-key/prefix case. The reference's post-load store keeps hits
  ordered by date for the same reason [REF-UNVERIFIED: SURVEY.md §1].
- **Compaction** (``compact_parquet``): streaming/incremental appends
  (sources/sinks.upsert_append, the foreachBatch sync) accumulate many
  small files; metadata pressure and per-file open cost dominate reads
  long before data volume does. Compaction rewrites to ~target-sized
  files with a shuffle-free ``coalesce``.

Both utilities are size-driven (Hadoop FileSystem API — works the same
on file://, hdfs://, s3a://), never row-count-driven: row counts need a
scan, sizes are metadata.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def _tree_bytes(spark: SparkSession, path: str) -> int:
    """Total bytes under ``path`` via the Hadoop FS (no data scan)."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(hconf)
    return fs.getContentSummary(hpath).getLength()


def cluster_write(
    df: DataFrame, path: str, cols: list[str], n_files: int
) -> None:
    """Write ``df`` as parquet range-clustered on ``cols``.

    ``repartitionByRange`` samples the key distribution (one pass over a
    sample, not the data) and assigns contiguous key ranges to the
    ``n_files`` output tasks; ``sortWithinPartitions`` orders rows inside
    each file so every row group's min/max key span is narrow. A later
    ``WHERE key = ...`` scan reads the one file (and the one row group)
    whose span contains the key — verified by row-group statistics in
    tests/test_layout.py. This is the write-side half of predicate
    pushdown: pushdown can only *skip* what layout has *separated*.
    """
    (
        df.repartitionByRange(n_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_mb: int = 128,
) -> int:
    """Rewrite a fragmented parquet directory into ~``target_mb`` files.

    Returns the number of output files. Sizing uses filesystem metadata
    only; the rewrite is ``coalesce`` (narrow — merges input splits into
    fewer tasks, no shuffle). Compaction preserves rows, not order —
    callers that need clustering compose with :func:`cluster_write`.
    """
    total = _tree_bytes(spark, src_path)
    n = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(src_path)
    df.coalesce(n).write.mode("overwrite").parquet(dst_path)
    return n


def read_json_tolerant(
    spark: SparkSession, path: str, schema: str
) -> tuple[DataFrame, DataFrame]:
    """PERMISSIVE JSON ingest split into (good, quarantine) frames.

    Real feeds contain malformed records; failing the whole 100 TB job
    on one bad line (FAILFAST) or silently dropping (DROPMALFORMED) are
    both wrong for an audited pipeline. PERMISSIVE mode nulls the
    unparseable row and captures its raw text in ``_corrupt_record``;
    we route those rows to a quarantine frame the caller persists for
    replay. Spark requires the corrupt column declared in the schema and
    a cache/checkpoint barrier before filtering on it (SPARK-21610: the
    column is only populated when the row actually fails to parse during
    that scan) — the cache here is of the *raw parse output*, sized by
    the feed batch, not the table.
    """
    full_schema = schema + ", _corrupt_record string"
    raw = (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        .cache()
    )
    good = raw.where(raw["_corrupt_record"].isNull()).drop("_corrupt_record")
    bad = raw.where(raw["_corrupt_record"].isNotNull()).select("_corrupt_record")
    return good, bad


def morton32(x, y):
    """32-bit Morton (Z-order) code of two 16-bit values, pure Catalyst.

    Classic mask-ladder bit spreading (public-domain bit twiddling):
    each input's 16 bits spread to even positions, y shifted up one —
    interleaved bits make lexicographic order on z a space-filling curve
    over the (x, y) grid, so range predicates on EITHER dimension touch
    few contiguous z-runs. All shifts are literal, so the whole code is
    whole-stage-codegen'd; the identical ladder is expressible in ANSI
    SQL for the oracle.
    """
    from pyspark.sql import functions as F

    def spread(v):
        v = v.bitwiseAND(F.lit(0xFFFF))
        v = (v.bitwiseOR(F.shiftleft(v, 8))).bitwiseAND(F.lit(0x00FF00FF))
        v = (v.bitwiseOR(F.shiftleft(v, 4))).bitwiseAND(F.lit(0x0F0F0F0F))
        v = (v.bitwiseOR(F.shiftleft(v, 2))).bitwiseAND(F.lit(0x33333333))
        v = (v.bitwiseOR(F.shiftleft(v, 1))).bitwiseAND(F.lit(0x55555555))
        return v

    return spread(x).bitwiseOR(F.shiftleft(spread(y), 1))
