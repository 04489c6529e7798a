"""Semantic tests for x_error_budget and x_vocab_overlap (round-6
batch 43). test_oracle.py proves Spark == DuckDB; these replay in
python and check the defining identities: budget accounting matches a
brute daily walk (flags by exact integer cross-multiplication); the
vocabulary Jaccards match brute set arithmetic and inclusion-exclusion
holds.
"""

from __future__ import annotations

from collections import defaultdict

from conftest import SF_SMALL

from googleanalytics_etl_spark.io import load
from googleanalytics_etl_spark.ops.round6aq import _SLO_PCT
from googleanalytics_etl_spark.registry import queries


def test_error_budget_replay(spark):
    rows = (
        load(spark, SF_SMALL, "events").select("ts", "event_type").collect()
    )
    days = defaultdict(lambda: [0, 0])
    for r in rows:
        d = r["ts"].replace(hour=0, minute=0, second=0, microsecond=0)
        days[d][0] += 1
        days[d][1] += 1 if r["event_type"] == "error" else 0
    got = sorted(
        queries()["x_error_budget"](spark, SF_SMALL).collect(),
        key=lambda r: r["day"],
    )
    assert len(got) == len(days)
    cum_e = cum_n = 0
    for g in got:
        n, err = days[g["day"]]
        cum_n += n
        cum_e += err
        assert g["n_events"] == n
        assert g["n_errors"] == err
        assert g["over_slo"] == (1 if 100 * err > _SLO_PCT * n else 0)
        assert g["cum_errors"] == cum_e
        assert g["cum_events"] == cum_n
        assert abs(
            g["burn_ratio"] - round(100 * cum_e / (_SLO_PCT * cum_n), 6)
        ) < 1e-9
    # the fixture's ~20% uniform error mix must land under a 21% SLO
    # over the full month, with some individual days over
    assert got[-1]["burn_ratio"] < 1.0
    assert any(g["over_slo"] == 1 for g in got)


def test_vocab_overlap_replay(spark):
    rows = load(spark, SF_SMALL, "documents").select("source", "text").collect()
    vocab = defaultdict(set)
    for r in rows:
        for t in r["text"].split(" "):
            if t:
                vocab[r["source"]].add(t)
    got = queries()["x_vocab_overlap"](spark, SF_SMALL).collect()
    sources = sorted(vocab)
    expect_pairs = {
        (a, b)
        for i, a in enumerate(sources)
        for b in sources[i + 1 :]
        if vocab[a] & vocab[b]
    }
    assert {(g["s1"], g["s2"]) for g in got} == expect_pairs
    for g in got:
        a, b = vocab[g["s1"]], vocab[g["s2"]]
        inter = len(a & b)
        assert g["n_common"] == inter
        assert g["vocab_1"] == len(a)
        assert g["vocab_2"] == len(b)
        union = len(a) + len(b) - inter
        assert union == len(a | b)  # inclusion-exclusion sanity
        assert abs(g["jaccard"] - round(inter / union, 6)) < 1e-9
        assert 0.0 < g["jaccard"] <= 1.0
