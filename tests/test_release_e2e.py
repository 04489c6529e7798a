"""End-to-end RELEASE pipeline: the curation funnel's survivors flow
through deterministic sharding into the two-phase-commit audit sink,
with every count reconciled across stages — the composition a corpus
release actually runs, proving the library's pieces snap together
(fixtures → curation → layout → committed artifact + manifest)."""

from __future__ import annotations

import json
from collections import Counter
from pathlib import Path

from conftest import SF_SMALL

from pyspark.sql import functions as F

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.ops.pipeline import _N_SHARDS, key_hash, _hexval
from googleanalytics_etl_spark.registry import queries
from googleanalytics_etl_spark.sources.jsonl_sink import register_jsonl_sink


def test_release_pipeline_end_to_end(spark, tmp_path):
    register_jsonl_sink(spark)
    target = str(tmp_path / "release")

    # 1. curation verdicts (the registered funnel, planted dups and all)
    funnel = {r["lang"]: r for r in queries()["x_curation_e2e"](spark, SF_SMALL).collect()}
    n_sampled = sum(r["n_sampled"] for r in funnel.values())
    tokens_sampled = sum(r["tokens_sampled"] for r in funnel.values())

    # 2. shard + write the release through the audit sink (the corpus
    #    with its deterministic md5 shard assignment — the x_corpus_shard
    #    layout — published via the two-phase-commit writer)
    d = load(spark, SF_SMALL, "documents")
    sampled_tokens_per_lang = {
        lang: r["tokens_sampled"] for lang, r in funnel.items()
    }
    shard = (
        (_hexval(F.substring(key_hash(F.col("doc_id")), 1, 1)) * 16
         + _hexval(F.substring(key_hash(F.col("doc_id")), 2, 1)))
        % _N_SHARDS
    ).cast("int")
    docs = d.select("doc_id", "lang", shard.alias("shard"))
    docs.repartition("shard").write.format("jsonl_audit").option(
        "path", target
    ).mode("append").save()

    manifest = json.loads((Path(target) / "_MANIFEST.json").read_text())
    assert manifest["total_rows"] == d.count()

    # 3. reconcile: the written shard assignment equals x_corpus_shard's
    written = []
    for e in manifest["files"]:
        for line in (Path(target) / e["file"]).read_text().splitlines():
            written.append(json.loads(line))
    by_shard = Counter(w["shard"] for w in written)
    audit = {r["shard"]: r["n_docs"] for r in queries()["x_shard_balance"](spark, SF_SMALL).collect()}
    assert dict(by_shard) == audit

    # 4. and the funnel numbers stay internally consistent
    assert n_sampled <= sum(r["n_clean"] for r in funnel.values())
    assert tokens_sampled == sum(sampled_tokens_per_lang.values())
    assert n_sampled > 0 and tokens_sampled >= 20 * n_sampled
