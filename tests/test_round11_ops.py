"""Round-11 tests: exact-substring reporting keys + the durable fold.

Semantic pins:

- x_dup_rate_by_source is CONSISTENT with x_exact_substring_clean's
  independent accounting (window-flag token counts vs span-length
  sums — two different computations of the same quantity);
- x_decon_report aggregates x_decontaminate_spans exactly (per-source
  token/span/doc counts) and never reports the benchmark source;
- s_exact_substring_durable's bucketed-parquet fold reproduces the
  batch span finder EXACTLY (the same certification as the in-memory
  streaming twin), its store is laid out as epoch=*/bucket=* parquet,
  and the dynamic epoch-partition overwrite is idempotent (a replayed
  epoch overwrites itself, never double-appends).
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.ops.round10 import (
    x_decontaminate_spans,
    x_exact_substring_clean,
    x_exact_substring_dedup,
)
from googleanalytics_etl_spark.ops.round11 import (
    x_decon_report,
    x_dup_rate_by_source,
)

SF_SMALL = "/root/testdata/sf0.01"


def test_dup_rate_matches_clean_accounting(spark):
    """dup_tokens per source from the span-length rollup must equal the
    independent window-flag accounting in x_exact_substring_clean."""
    src = {
        r["doc_id"]: r["source"]
        for r in load(spark, SF_SMALL, "documents")
        .select("doc_id", "source")
        .collect()
    }
    by_src_clean: dict[str, list[int]] = defaultdict(lambda: [0, 0, 0])
    for r in x_exact_substring_clean(spark, SF_SMALL).collect():
        acc = by_src_clean[src[r["doc_id"]]]
        acc[0] += 1
        acc[1] += r["n_tokens"]
        acc[2] += r["dup_tokens"]

    got = {
        r["source"]: r for r in x_dup_rate_by_source(spark, SF_SMALL).collect()
    }
    assert set(got) == set(by_src_clean)
    for s, (n_docs, total, dup) in by_src_clean.items():
        row = got[s]
        assert row["n_docs"] == n_docs
        assert row["total_tokens"] == total
        assert row["dup_tokens"] == dup
        assert abs(row["dup_rate"] - dup / total) < 1e-12
    # at least one source in the fixture actually carries duplication
    assert any(r["dup_tokens"] > 0 for r in got.values())


def test_decon_report_aggregates_spans_exactly(spark):
    src = {
        r["doc_id"]: r["source"]
        for r in load(spark, SF_SMALL, "documents")
        .select("doc_id", "source")
        .collect()
    }
    per_src: dict[str, list] = defaultdict(lambda: [set(), 0, 0])
    for r in x_decontaminate_spans(spark, SF_SMALL).collect():
        acc = per_src[src[r["doc_id"]]]
        acc[0].add(r["doc_id"])
        acc[1] += 1
        acc[2] += r["span_len"]

    got = {r["source"]: r for r in x_decon_report(spark, SF_SMALL).collect()}
    assert "src0" not in got  # the benchmark is never a reported row
    for s, row in got.items():
        docs, n_spans, contam = per_src.get(s, [set(), 0, 0])
        assert row["docs_contaminated"] == len(docs)
        assert row["n_spans"] == n_spans
        assert row["contaminated_tokens"] == contam
    # every contaminated source appears in the report
    assert set(per_src) <= set(got)


def test_decontaminate_flag_join_is_declared_broadcast(spark):
    """The benchmark gram set broadcasts BY DECLARATION: the round-11
    ×128 probe caught the planner's static estimate flipping the flag
    join to a SortMergeJoin that shuffles+sorts the corpus occurrence
    frame (exponent 1.21; 0.73 after the hint). The contract — the
    corpus never shuffles for the flag — must hold at any scale, so
    the plan may not contain a SortMergeJoin."""
    import contextlib
    import io

    df = x_decontaminate_spans(spark, SF_SMALL)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_decon_gate_equals_batch(spark):
    """Per-batch gating against the static benchmark set unions to the
    whole-corpus decontamination answer (batches are independent — no
    cross-batch statistic exists for a fixed benchmark)."""
    from googleanalytics_etl_spark.ops.round11 import s_decon_gate

    batch = sorted(
        tuple(r) for r in x_decontaminate_spans(spark, SF_SMALL).collect()
    )
    gated = sorted(tuple(r) for r in s_decon_gate(spark, SF_SMALL).collect())
    assert gated == batch


def test_durable_fold_equals_batch(spark):
    from googleanalytics_etl_spark.ops.round11 import (
        s_exact_substring_durable,
    )

    batch = sorted(
        tuple(r) for r in x_exact_substring_dedup(spark, SF_SMALL).collect()
    )
    durable = sorted(
        tuple(r) for r in s_exact_substring_durable(spark, SF_SMALL).collect()
    )
    assert durable == batch


def test_durable_fold_empty_corpus_matches_twin(spark, tmp_path):
    """A corpus where no document reaches L tokens produces zero grams:
    the durable store holds only _SUCCESS markers, and the final read
    must return the same EMPTY spans frame the in-memory twin returns
    (explicit read schemas — inference would crash on the empty store)."""
    from googleanalytics_etl_spark.ops.round10 import (
        s_exact_substring_dedup,
    )
    from googleanalytics_etl_spark.ops.round11 import (
        s_exact_substring_durable,
    )

    sf_dir = str(tmp_path / "shortsf")
    spark.createDataFrame(
        [(i, "a b c", "en", "src1", 5) for i in range(8)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")

    durable = s_exact_substring_durable(spark, sf_dir)
    assert durable.count() == 0
    assert [f.name for f in durable.schema.fields] == [
        "doc_id", "span_start", "span_end", "span_len",
    ]
    assert s_exact_substring_dedup(spark, sf_dir).count() == 0


def test_durable_store_layout_and_partition_pruning(spark, tmp_path):
    """The durable store is epoch=*/bucket=* hive dirs, and a bucket
    filter reaches the scan as a PartitionFilter (the per-bucket merge
    reads one directory pair, not the whole store)."""
    df = spark.range(100).select(
        F.col("id").alias("h"),
        (F.col("id") % 8).cast("int").alias("bucket"),
        F.lit(0).alias("epoch"),
    )
    out = str(tmp_path / "store")
    df.write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("epoch", "bucket").parquet(out)
    plan = (
        spark.read.parquet(out)
        .where(F.col("bucket") == 3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "bucket" in plan


def test_dynamic_epoch_overwrite_is_idempotent(spark, tmp_path):
    """A replayed epoch overwrites its own partition directories —
    the exactly-once contract the durable fold relies on under
    foreachBatch's at-least-once delivery."""
    out = str(tmp_path / "occ")

    def write_epoch(epoch: int, n: int) -> None:
        (
            spark.range(n)
            .select(
                F.col("id").alias("h"),
                (F.col("id") % 4).cast("int").alias("bucket"),
            )
            .withColumn("epoch", F.lit(epoch))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch", "bucket")
            .parquet(out)
        )

    write_epoch(0, 40)
    write_epoch(1, 60)
    write_epoch(0, 40)  # replay epoch 0: must overwrite, not append
    got = spark.read.parquet(out)
    assert got.count() == 100
    assert got.where(F.col("epoch") == 0).count() == 40
    # and epoch 1 was untouched by the epoch-0 replay (dynamic mode)
    assert got.where(F.col("epoch") == 1).count() == 60
