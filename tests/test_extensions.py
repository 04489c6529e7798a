"""Property tests for the §2.J extension operators (SURVEY.md §5.5).

The rows-only-checked operators (MinHash, SimHash, IVF, HLL) get their
correctness pinned here: planted duplicates must surface, ANN recall must
clear a floor, sketches must land within their error bound, and the
sessionization invariants must hold on the real fixture.
"""

from __future__ import annotations

from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.registry import queries


def test_minhash_finds_planted_duplicates(spark):
    rows = queries()["x_dedup_near"](spark, SF_SMALL).collect()
    planted = {(r.doc_a, r.doc_b): r.jaccard for r in rows if r.doc_b >= 1_000_000}
    # all 10 planted exact duplicates (doc_id d duplicated as d+1e6)
    for d in range(10):
        assert (d, d + 1_000_000) in planted, f"planted dup {d} not found"
        assert planted[(d, d + 1_000_000)] == 1.0


def test_simhash_finds_planted_duplicates(spark):
    rows = queries()["x_dedup_simhash"](spark, SF_SMALL).collect()
    planted = {(r.doc_a, r.doc_b): r.hamming for r in rows if r.doc_b >= 1_000_000}
    for d in range(10):
        assert planted.get((d, d + 1_000_000)) == 0, f"planted dup {d} missing"


def test_embed_dedup_finds_planted_vectors(spark):
    rows = queries()["x_embed_cosine_dedup"](spark, SF_SMALL).collect()
    pairs = {(r.vec_a, r.vec_b): r.cos_sim for r in rows}
    for v in range(10):
        assert pairs.get((v, v + 1_000_000)) == 1.0, f"planted vector {v} missing"


def test_ivf_recall_against_brute_force(spark):
    brute = {r.vec_id for r in queries()["x_sim_knn"](spark, SF_SMALL).collect()}
    ivf = {r.vec_id for r in queries()["x_sim_knn_ivf"](spark, SF_SMALL).collect()}
    assert len(brute) == 10 and len(ivf) == 10
    # 3-of-10 probed partitions over near-uniform random vectors: recall
    # floor is modest by design; the property is "sane overlap, not junk"
    assert len(brute & ivf) >= 3, f"IVF recall too low: {brute & ivf}"


def test_approx_distinct_error_bound(spark):
    exact = {
        r.event_type: r.n_users
        for r in queries()["q_count_distinct"](spark, SF_SMALL).collect()
    }
    approx = {
        r.event_type: r.n_users_approx
        for r in queries()["q_approx_distinct"](spark, SF_SMALL).collect()
    }
    for et, n in exact.items():
        assert abs(approx[et] - n) <= max(2, 0.1 * n), (
            f"{et}: approx {approx[et]} vs exact {n}"
        )


def test_sessionize_invariants(spark):
    """Every event in exactly one session; intra-session gap ≤ 30 min;
    consecutive sessions separated by > 30 min (SURVEY.md §5.5)."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    e = load(spark, SF_SMALL, "events")
    s = queries()["q_sessionize"](spark, SF_SMALL)
    assert s.count() == e.count()
    assert s.select("event_id").distinct().count() == e.count()

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts").cast("timestamp")) - F.lag(
        F.unix_micros(F.col("ts").cast("timestamp"))
    ).over(w)
    flagged = s.withColumn("gap_us", gap).withColumn(
        "new_sess",
        (F.col("session_id") != F.lag("session_id").over(w)).cast("int"),
    )
    bad_intra = flagged.where(
        (F.col("new_sess") == 0) & (F.col("gap_us") > 30 * 60 * 1_000_000)
    ).count()
    bad_inter = flagged.where(
        (F.col("new_sess") == 1) & (F.col("gap_us") <= 30 * 60 * 1_000_000)
    ).count()
    assert bad_intra == 0, f"{bad_intra} intra-session gaps exceed 30 min"
    assert bad_inter == 0, f"{bad_inter} session breaks under 30 min"


def test_session_window_agrees_with_sessionize(spark):
    """The two independent session implementations (window-cumsum vs
    built-in session_window) must produce identical session sets."""
    from pyspark.sql import functions as F

    a = (
        queries()["q_flagship"](spark, SF_SMALL)
        .select("user_id", "session_start", F.col("n_events"))
        .collect()
    )
    b = (
        queries()["s_session"](spark, SF_SMALL)
        .select("user_id", "session_start", F.col("n_events"))
        .collect()
    )
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_near_dup_survivors_drop_planted_duplicates(spark):
    from googleanalytics_etl_spark.ops.extensions import (
        x_dedup_near,
        x_dedup_near_survivors,
    )

    survivors = {r["doc_id"] for r in x_dedup_near_survivors(spark, SF_SMALL).collect()}
    originals = {
        r["doc_id"]
        for r in load(spark, SF_SMALL, "documents").select("doc_id").collect()
    }
    planted = {min(originals) + i + 1_000_000 for i in range(10)}
    # every planted duplicate (higher id than its original) is dropped
    assert survivors.isdisjoint(planted)
    # nothing outside the incoming id space survives, and each pair's
    # min-id side is retained
    pairs = x_dedup_near(spark, SF_SMALL).collect()
    dropped = {p["doc_b"] for p in pairs}
    assert survivors == (originals | planted) - dropped


def test_lsh_knn_recall_and_determinism(spark):
    """Sign-LSH ANN: deterministic (fixed hyperplanes, seed 42) and a
    sane-overlap recall floor vs brute force. The fixture embeddings are
    near-uniform random (no tight clusters), which is LSH's worst case —
    top-10 'neighbors' sit at ~60deg, where a 4x4-bit banding passes only
    ~half of them while scanning ~23% of the corpus. On clustered
    production data (near-dups at cosine > 0.9) band-match probability
    approaches 1; multi-probe is the standard recall lever."""
    brute = [r.vec_id for r in queries()["x_sim_knn"](spark, SF_SMALL).collect()]
    a = [r.vec_id for r in queries()["x_sim_knn_lsh"](spark, SF_SMALL).collect()]
    b = [r.vec_id for r in queries()["x_sim_knn_lsh"](spark, SF_SMALL).collect()]
    assert a == b, "LSH must be deterministic"
    assert len(a) == 10
    assert len(set(brute) & set(a)) >= 2, f"LSH recall collapsed: {set(brute) & set(a)}"


def test_dedup_clusters_contain_planted_pairs_and_are_consistent(spark):
    rows = queries()["x_dedup_clusters"](spark, SF_SMALL).collect()
    cluster = {r.doc_id: r.cluster_id for r in rows}
    sizes = {r.doc_id: r.cluster_size for r in rows}
    # every planted duplicate shares a cluster with its original, and the
    # cluster is labeled by its minimum member id
    for d in range(10):
        assert cluster.get(d) == cluster.get(d + 1_000_000), f"doc {d} split"
        assert cluster[d] <= d
    # label consistency: the labeling doc is in the cluster it names, and
    # cluster_size is the member count of that label
    from collections import Counter

    counts = Counter(cluster.values())
    for doc_id, label in cluster.items():
        assert cluster[label] == label, f"label {label} not a fixpoint"
        assert sizes[doc_id] == counts[label]


def test_dedup_clusters_transitive_closure(spark):
    """A~B and B~C must land A, B, C in ONE cluster even though A~C is
    never a direct candidate pair (the property the survivors one-pass
    rule does not guarantee)."""
    import googleanalytics_etl_spark.ops.extensions as ext
    from pyspark.sql import functions as F

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9)], "doc_a long, doc_b long"
    )
    orig = ext._minhash_pairs
    ext._minhash_pairs = lambda s, d: pairs.withColumn("jaccard", F.lit(1.0))
    try:
        rows = ext.x_dedup_clusters(spark, SF_SMALL).collect()
    finally:
        ext._minhash_pairs = orig
    got = {r.doc_id: (r.cluster_id, r.cluster_size) for r in rows}
    assert got == {
        1: (1, 3),
        2: (1, 3),
        3: (1, 3),
        7: (7, 2),
        9: (7, 2),
    }


def test_attribution_u_shaped_credits(spark):
    """Position-based credit math on a hand-computable path set."""
    from datetime import datetime

    import googleanalytics_etl_spark.ops.flagship as fl

    rows = []

    def ev(eid, uid, minute, typ, val=0.0):
        rows.append((eid, datetime(2024, 1, 1, 0, minute), uid, typ, val, None))

    # user 100: view,click,view,click then purchase(10); later view ignored
    ev(1, 100, 1, "view"); ev(2, 100, 2, "click")
    ev(3, 100, 3, "view"); ev(4, 100, 4, "click")
    ev(5, 100, 5, "purchase", 10.0); ev(6, 100, 6, "view")
    # user 200: single touch takes 100%
    ev(7, 200, 1, "click"); ev(8, 200, 2, "purchase", 8.0)
    # user 300: two touches split 50/50
    ev(9, 300, 1, "view"); ev(10, 300, 2, "view"); ev(11, 300, 3, "purchase", 6.0)
    # user 400: no conversion -> no credit
    ev(12, 400, 1, "view")
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    orig = fl.load
    fl.load = lambda s, d, t: df
    try:
        out = {r.channel: r for r in fl.q_attribution(spark, SF_SMALL).collect()}
    finally:
        fl.load = orig
    # view: 4.0 (first of u100) + 1.0 (middle of u100) + 3.0 + 3.0 (u300)
    assert out["view"].attributed_value == 11.0
    # click: 1.0 (middle of u100) + 4.0 (last of u100) + 8.0 (u200 single)
    assert out["click"].attributed_value == 13.0
    assert out["view"].n_users == 2 and out["click"].n_users == 2
    assert out["view"].n_touches == 4 and out["click"].n_touches == 3


def test_countmin_overestimates_within_bound(spark):
    """CM guarantee: est >= true always; est - true <= (e/w)*N with
    probability 1 - (1/e)^d — at fixture scale (N ~ thousands, w=1024,
    d=4) the slack bound is generous enough to assert outright."""
    rows = queries()["x_countmin"](spark, SF_SMALL).collect()
    assert len(rows) == 10
    n_total = load(spark, SF_SMALL, "events").count()
    bound = (2.718281828 / 1024) * n_total * 4  # slack ×4 over the w.h.p. bound
    for r in rows:
        assert r.est_n >= r.true_n
        assert r.est_n - r.true_n <= bound
