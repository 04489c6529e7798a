"""Round-4 operators: nearest as-of, zone-map skipping, n-grams,
interpolation, blocked k-NN join, sketch accuracy composites.

Cross-engine value correctness is enforced by the differential harness
(all keys carry full oracles); these tests pin the properties the
oracle can't see — the zone map actually skips files, the k-NN ranking
matches brute force, the interpolation reconstructs plausible values,
and the sketch composites stay within their error bounds at BOTH
fixture scales (the driver only runs sf0.01)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from conftest import SF_SMALL

from pyspark.sql import functions as F

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.registry import queries

SF_MID = "/root/testdata/sf0.01"


def test_zonemap_skips_majority_of_files(spark):
    from googleanalytics_etl_spark.ops.round4 import (
        _zonemap_stage,
        zonemap_pruned_scan,
        _ZONE_LO,
        _ZONE_HI,
    )

    stage = _zonemap_stage(spark, SF_MID)
    pruned, hit, total = zonemap_pruned_scan(
        spark, str(stage), "o_totalprice", _ZONE_LO, _ZONE_HI
    )
    assert total >= 8
    assert hit < total / 2, f"zone map read {hit}/{total} files"
    # pruning is sound: the pruned scan + exact filter equals full scan
    want = (
        load(spark, SF_MID, "orders")
        .where(F.col("o_totalprice").between(_ZONE_LO, _ZONE_HI))
        .count()
    )
    got = pruned.where(
        F.col("o_totalprice").between(_ZONE_LO, _ZONE_HI)
    ).count()
    assert got == want > 0


def test_asof_nearest_brute_force(spark):
    got = {
        r["event_id"]: r["nearest_view_ts"]
        for r in queries()["q_join_asof_nearest"](spark, SF_SMALL).collect()
    }
    ev = (
        load(spark, SF_SMALL, "events")
        .select("event_id", "user_id", "ts", "event_type")
        .toPandas()
    )
    ev = ev.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    for uid, grp in ev.groupby("user_id"):
        rows = grp.reset_index(drop=True)
        for i, r in rows.iterrows():
            if r["event_type"] != "purchase":
                continue
            prevs = rows.iloc[:i]
            nxts = rows.iloc[i + 1:]
            pv = prevs[prevs.event_type == "view"]["ts"].max()
            nv = nxts[nxts.event_type == "view"]["ts"].min()
            if pd.isna(pv) and pd.isna(nv):
                want = None
            elif pd.isna(pv):
                want = nv
            elif pd.isna(nv):
                want = pv
            else:
                want = pv if (r["ts"] - pv) <= (nv - r["ts"]) else nv
            have = got[r["event_id"]]
            if want is None:
                assert have is None
            else:
                assert pd.Timestamp(have) == want, (uid, r["event_id"])


def test_ngram_counts_match_python(spark):
    import re
    from collections import Counter

    got = {
        r["bigram"]: r["n"]
        for r in queries()["x_ngram_counts"](spark, SF_SMALL).collect()
    }
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    c: Counter = Counter()
    for text in docs["text"]:
        toks = [t for t in re.split(r"[^a-z]+", text.lower()) if t]
        c.update(
            f"{a} {b}" for a, b in zip(toks, toks[1:])
        )
    want = {k: v for k, v in c.items() if v >= 5}
    assert got == want and len(got) > 0


def test_interpolate_fills_every_gap_between_neighbors(spark):
    rows = queries()["q_interpolate"](spark, SF_SMALL).orderBy("day").collect()
    assert any(r["was_gap"] == 1 for r in rows)
    vals = [(r["day"], r["v_filled"], r["was_gap"]) for r in rows]
    for i, (day, v, gap) in enumerate(vals):
        assert v is not None
        if gap:
            # neighbors that are observed bound the interpolated value
            prev = next(
                (vals[j][1] for j in range(i - 1, -1, -1) if not vals[j][2]),
                None,
            )
            nxt = next(
                (vals[j][1] for j in range(i + 1, len(vals)) if not vals[j][2]),
                None,
            )
            bounds = [x for x in (prev, nxt) if x is not None]
            assert min(bounds) - 1e-9 <= v <= max(bounds) + 1e-9


def test_knn_join_matches_numpy_brute_force(spark):
    got = (
        queries()["x_knn_join_blocked"](spark, SF_SMALL)
        .orderBy("a_id", "rank")
        .collect()
    )
    from googleanalytics_etl_spark.io import load
    from googleanalytics_etl_spark.ops.round5b import seed_assign

    em_df = load(spark, SF_SMALL, "embeddings").select(
        "vec_id", "embedding", "label"
    )
    cell = {r["vec_id"]: r["cluster"] for r in seed_assign(em_df).collect()}
    emb = pd.read_parquet(f"{SF_SMALL}/embeddings.parquet")
    emb["block"] = emb.apply(
        lambda r: (r["label"], cell[r["vec_id"]]), axis=1
    )
    by_label = {
        lab: grp.reset_index(drop=True) for lab, grp in emb.groupby("block")
    }
    neighbors = {}
    for lab, grp in by_label.items():
        vecs = np.stack(grp["embedding"].to_numpy()).astype(np.float64)
        ids = grp["vec_id"].to_numpy()
        norms = np.sqrt((vecs * vecs).sum(axis=1))
        cos = (vecs @ vecs.T) / np.outer(norms, norms)
        for i, a in enumerate(ids):
            scored = [
                (round(cos[i, j], 6), int(ids[j]))
                for j in range(len(ids))
                if j != i
            ]
            scored.sort(key=lambda t: (-t[0], t[1]))
            neighbors[int(a)] = [b for _, b in scored[:3]]
    # anchors alone in their (label, cell) block have no candidates
    neighbors = {a: v for a, v in neighbors.items() if v}
    per_a: dict[int, list[int]] = {}
    for r in got:
        per_a.setdefault(r["a_id"], []).append(r["b_id"])
        assert 1 <= r["rank"] <= 3
    assert per_a == neighbors


@pytest.mark.parametrize("sf", [SF_SMALL, SF_MID])
def test_sketch_composites_in_bound_at_both_sfs(spark, sf):
    """The driver checks sf0.01 only; the accuracy flags must also hold
    at sf0.001 so the contract isn't fixture-luck."""
    q = queries()
    wau = q["x_sketch_hll_wau"](spark, sf)
    assert wau.where(F.col("in_bound") == 0).count() == 0
    kll = q["x_sketch_kll_quantiles"](spark, sf)
    assert kll.where(F.col("in_bound") == 0).count() == 0
    theta = q["x_sketch_theta_overlap"](spark, sf).first()
    assert theta["in_bound"] == 1
    assert theta["overlap_exact"] > 0


def test_lateral_decorrelates_to_window_group_limit(spark):
    """The LATERAL correlated subquery must compile to the scalable
    top-k-per-group plan (WindowGroupLimit + one join) — never a
    per-customer re-execution or a cartesian product."""
    import contextlib
    import io

    df = queries()["q_lateral_topk"](spark, SF_SMALL)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan
    # every customer contributes at most 2 rows
    from pyspark.sql import functions as F

    mx = (
        df.groupBy("c_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n"))
        .first()[0]
    )
    assert mx <= 2


def test_pmi_formula_spot_check(spark):
    import math
    import re
    from collections import Counter

    rows = queries()["x_cooccur_pmi"](spark, SF_SMALL).collect()
    assert rows, "no co-occurring frequent pairs found"
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    n_docs = docs["doc_id"].nunique()
    doc_terms = [
        set(t for t in re.split(r"[^a-z]+", text.lower()) if t)
        for text in docs["text"]
    ]
    df_counts: Counter = Counter()
    for terms in doc_terms:
        df_counts.update(terms)
    # spot-check the 5 highest-PMI pairs against a direct recount
    for r in sorted(rows, key=lambda r: -r["pmi"])[:5]:
        t1, t2 = r["t1"], r["t2"]
        n_ab = sum(1 for s in doc_terms if t1 in s and t2 in s)
        assert n_ab == r["n_ab"]
        want = round(
            math.log(n_ab * n_docs / (df_counts[t1] * df_counts[t2])), 6
        )
        assert abs(want - r["pmi"]) <= 1e-6


def test_bm25_spot_check_one_doc(spark):
    import math
    import re
    from collections import Counter

    scored = {
        r["doc_id"]: r["bm25"]
        for r in queries()["x_bm25"](spark, SF_SMALL).collect()
    }
    assert scored
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    toks = {
        int(r["doc_id"]): [
            t for t in re.split(r"[^a-z]+", r["text"].lower()) if t
        ]
        for _, r in docs.iterrows()
    }
    freq: Counter = Counter()
    for ts in toks.values():
        freq.update(ts)
    qterms = [t for t, _ in sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:3]]
    n_docs = len(toks)
    avg_len = sum(len(t) for t in toks.values()) / n_docs
    df_t = {
        t: sum(1 for ts in toks.values() if t in ts) for t in qterms
    }
    doc_id = next(iter(scored))
    ts = toks[doc_id]
    want = 0.0
    for t in qterms:
        tf = ts.count(t)
        if not tf:
            continue
        idf = math.log((n_docs - df_t[t] + 0.5) / (df_t[t] + 0.5) + 1.0)
        want += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(ts) / avg_len))
    assert abs(round(want, 6) - scored[doc_id]) <= 2e-6


def test_quantization_error_bounded_by_half_step(spark):
    """int8 scalar quantization error can never exceed half a step of
    the widest dimension range (plus float slack)."""
    emb = pd.read_parquet(f"{SF_SMALL}/embeddings.parquet")
    vecs = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    widest = (vecs.max(axis=0) - vecs.min(axis=0)).max()
    bound = widest / 255 / 2 + 1e-9
    rows = queries()["x_embed_quantize"](spark, SF_SMALL).collect()
    assert len(rows) == len(emb)
    assert all(r["max_err"] <= bound for r in rows)
