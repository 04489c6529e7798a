"""Round-5 batch-9: weighted sampling (A-ES) and dynamic pivot."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

from conftest import SF_SMALL

from pyspark.sql import functions as F

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.registry import queries


def _key(doc_id: int, w: float) -> float:
    h = int(hashlib.md5(f"ws-seed-1|{doc_id}".encode()).hexdigest()[:8], 16)
    u = (h + 0.5) / 4294967296.0
    return round(-math.log(u) / w, 10)


def test_weighted_sample_replay(spark):
    rows = [r["doc_id"] for r in queries()["x_weighted_sample"](spark, SF_SMALL).collect()]
    docs = load(spark, SF_SMALL, "documents").select("doc_id", "n_chars").collect()
    keyed = sorted((( _key(d["doc_id"], float(d["n_chars"])), d["doc_id"])) for d in docs)
    want = [did for _k, did in keyed[:50]]
    assert sorted(rows) == sorted(want)
    assert len(rows) == 50


def test_weighted_sample_prefers_heavy_docs(spark):
    # inclusion probability follows the weights: the sampled docs'
    # mean length must exceed the corpus mean (A-ES guarantee at the
    # aggregate level, deterministic under the fixed seed)
    sampled = queries()["x_weighted_sample"](spark, SF_SMALL).agg(
        F.avg("n_chars")
    ).collect()[0][0]
    overall = load(spark, SF_SMALL, "documents").agg(F.avg("n_chars")).collect()[0][0]
    assert sampled > overall


def test_pivot_dynamic_counts(spark):
    rows = {r["lang"]: r for r in queries()["q_pivot_dynamic"](spark, SF_SMALL).collect()}
    docs = load(spark, SF_SMALL, "documents").select("lang", "source").collect()
    want = Counter((d["lang"], d["source"]) for d in docs)
    srcs = {d["source"] for d in docs}
    assert len(srcs) == 20
    for (lang, src), n in want.items():
        assert rows[lang][src] == n
    # dense zero-fill: every (lang, source) cell exists
    for lang, r in rows.items():
        for src in srcs:
            assert r[src] == want.get((lang, src), 0)


def test_pivot_dynamic_discovers_columns_at_runtime(spark):
    cols = queries()["q_pivot_dynamic"](spark, SF_SMALL).columns
    assert cols[0] == "lang"
    assert set(cols[1:]) == {f"src{i}" for i in range(20)}
