"""Round-5 batch-12: RRF hybrid fusion and hard-negative mining."""

from __future__ import annotations

import numpy as np
import pytest
from conftest import SF_SMALL

from pyspark.sql import functions as F

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.registry import queries


def test_rrf_fusion_recount(spark):
    rows = queries()["x_rrf_fusion"](spark, SF_SMALL).collect()
    docs = load(spark, SF_SMALL, "documents").select("doc_id", "text").collect()
    terms = {"table", "sort", "value"}
    tf = {d["doc_id"]: sum(1 for t in d["text"].split(" ") if t in terms) for d in docs}
    l_order = sorted(tf, key=lambda i: (-tf[i], i))
    r1 = {d: i + 1 for i, d in enumerate(l_order)}
    em = load(spark, SF_SMALL, "embeddings").select("vec_id", "embedding").collect()
    vecs = {r["vec_id"]: np.array([float(x) for x in r["embedding"]]) for r in em}
    q = vecs[0]
    sims = {
        v: round(float(np.dot(x, q) / (np.linalg.norm(x) * np.linalg.norm(q))), 6)
        for v, x in vecs.items()
    }
    v_order = sorted(sims, key=lambda i: (-sims[i], i))
    r2 = {d: i + 1 for i, d in enumerate(v_order)}
    fused = {
        d: round(1 / (60 + r1[d]) + 1 / (60 + r2[d]), 6) for d in r1 if d in r2
    }
    want = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [(r["doc_id"], r["rrf"]) for r in rows]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=2e-6)
    # both modalities contribute: the top-20 is NOT just the lexical top-20
    assert {d for d, _ in got} != set(l_order[:20])


def test_hard_negatives_properties(spark):
    rows = queries()["x_hard_negatives"](spark, SF_SMALL).collect()
    em = load(spark, SF_SMALL, "embeddings").select("vec_id", "label").collect()
    labels = {r["vec_id"]: r["label"] for r in em}
    seen = set()
    for r in rows:
        assert r["vec_id"] not in seen  # one negative per anchor
        seen.add(r["vec_id"])
        assert labels[r["vec_id"]] == r["label"]
        assert labels[r["neg_id"]] == r["neg_label"]
        assert r["label"] != r["neg_label"]  # negatives cross labels
        assert r["vec_id"] != r["neg_id"]
    # near-total coverage: with 10 labels over 8 cells, label-pure cells
    # are rare — most anchors find an in-cell negative
    assert len(rows) >= 0.9 * len(em)


def test_hard_negatives_are_the_hardest_in_cell(spark):
    # spot-check 10 anchors against a numpy recount of their cell
    import numpy as np

    from googleanalytics_etl_spark.ops.round5b import seed_assign

    em_df = load(spark, SF_SMALL, "embeddings").select("vec_id", "embedding", "label")
    assign = {
        r["vec_id"]: r["cluster"] for r in seed_assign(em_df).collect()
    }
    em = load(spark, SF_SMALL, "embeddings").collect()
    vecs = {r["vec_id"]: np.array([float(x) for x in r["embedding"]]) for r in em}
    labels = {r["vec_id"]: r["label"] for r in em}
    got = {r["vec_id"]: r for r in queries()["x_hard_negatives"](spark, SF_SMALL).collect()}
    for anchor in list(got)[:10]:
        cell = assign[anchor]
        cands = [
            v
            for v in vecs
            if assign[v] == cell and v != anchor and labels[v] != labels[anchor]
        ]
        a = vecs[anchor]
        best = max(
            cands,
            key=lambda v: (
                round(float(np.dot(a, vecs[v]) / (np.linalg.norm(a) * np.linalg.norm(vecs[v]))), 6),
                -v,
            ),
        )
        assert got[anchor]["neg_id"] == best


def test_arrow_map_boundary(spark):
    """mapInArrow roundtrip: exact cents and string lengths survive the
    Arrow boundary; NULL values are filtered batch-side."""
    rows = queries()["q_arrow_map"](spark, SF_SMALL).collect()
    ev = load(spark, SF_SMALL, "events").select(
        "event_id", "value", "event_type"
    ).collect()
    want = {
        e["event_id"]: (round(e["value"] * 100), len(e["event_type"]))
        for e in ev
        if e["value"] is not None
    }
    assert len(rows) == len(want)
    for r in rows:
        assert (r["cents"], r["type_len"]) == want[r["event_id"]]
