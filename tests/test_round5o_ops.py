"""Round-5 survivor/certification operators (ops/round5o.py)."""

from pyspark.sql import functions as F

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.registry import queries

from conftest import SF_SMALL


def test_semdedup_survivors_drop_exactly_the_planted_copies(spark):
    """The 10 planted +1e6 copies (identical vectors, higher ids) are
    exactly what keep-lowest-id dedup removes; every organic vector
    survives (max organic cosine ≈ 0.48 < 0.92)."""
    rows = queries()["x_semdedup_survivors"](spark, SF_SMALL).collect()
    base_ids = {
        r["vec_id"]
        for r in load(spark, SF_SMALL, "embeddings").select("vec_id").collect()
    }
    got = {r["vec_id"] for r in rows}
    assert got == base_ids  # all organics survive, no copy survives
    assert len(rows) == len(got)  # one row per survivor


def test_semdedup_survivors_consistent_with_counts(spark):
    """survivors + removed = members, cluster by cluster, against the
    x_semdedup_ivf count report."""
    counts = {
        r["cluster"]: r
        for r in queries()["x_semdedup_ivf"](spark, SF_SMALL).collect()
    }
    surv = queries()["x_semdedup_survivors"](spark, SF_SMALL).collect()
    per_cluster: dict[int, int] = {}
    for r in surv:
        per_cluster[r["cluster"]] = per_cluster.get(r["cluster"], 0) + 1
    for c, row in counts.items():
        assert per_cluster.get(c, 0) == row["n_members"] - row["n_removed"]


def test_cluster_purity_arithmetic_and_coverage(spark):
    from googleanalytics_etl_spark.ops.round4d import kmeans_assignments

    rows = queries()["x_cluster_purity"](spark, SF_SMALL).collect()
    e = load(spark, SF_SMALL, "embeddings")
    n = e.count()
    assert sum(r["n_members"] for r in rows) == n
    labels = {r["vec_id"]: r["label"] for r in e.select("vec_id", "label").collect()}
    assign = kmeans_assignments(e.select("vec_id", "embedding")).collect()
    from collections import Counter

    per = {}
    for a in assign:
        per.setdefault(a["cluster"], Counter())[labels[a["vec_id"]]] += 1
    for r in rows:
        cnt = per[r["cluster"]]
        best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
        assert (r["top_label"], r["top_n"]) == best
        assert r["purity"] == r["top_n"] / r["n_members"]
        assert 0 < r["purity"] <= 1


def test_span_dedup_is_the_profile_filtered(spark):
    prof = {
        r["doc_id"]: r["dup_span_frac"]
        for r in queries()["x_span_dup_profile"](spark, SF_SMALL).collect()
    }
    surv = queries()["x_span_dedup"](spark, SF_SMALL).collect()
    got = {r["doc_id"] for r in surv}
    want = {d for d, f in prof.items() if f < 0.2}
    assert got == want
    assert 0 < len(got) < len(prof)  # the filter actually discriminates
    for r in surv:
        assert r["dup_span_frac"] == prof[r["doc_id"]] < 0.2
