"""Differential fuzz over ARRAY-LAMBDA pipelines — the higher-order
construct half the round-4/5 operators lean on (in-array bigrams,
shingles, BPE pairs, pair lattices). Random compositions of
filter/transform/distinct/sort/slice with scalar terminals run on BOTH
engines; counts and checksums must agree.

Each grammar production is a PAIR of templates (Spark SQL, DuckDB SQL)
because the dialects name the list functions differently; the fuzz
checks the semantic mapping between them, which is exactly what the
hand-written oracles rely on.

FOUND BY THIS FUZZ (first run): DuckDB ``list_distinct`` does NOT
preserve element order (['c','a','c','b','a'] → ['b','a','c']) while
Spark ``array_distinct`` keeps first-occurrence order — so distinct is
only multiset-equivalent cross-engine, and any ORDER-SENSITIVE consumer
(slice, element_at) after a distinct diverges. The registry's oracles
use list_distinct exclusively in order-insensitive positions (set
counts, unnest-to-set, full-set hashes) — that discipline is now pinned
here: the slice production sorts first, and the grammar documents
distinct as order-unstable."""

from __future__ import annotations

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# soak multiplier: SPARK_GRAFT_FUZZ_X=10 runs 10x the examples —
# used by per-round fuzz soak sessions hunting cross-engine edges
_FUZZ_X = max(1, int(os.environ.get("SPARK_GRAFT_FUZZ_X", "1")))

from conftest import SF_SMALL

# unary array → array productions: (spark_template, duck_template)
UNARY = [
    ("array_distinct({a})", "list_distinct({a})"),
    ("array_sort({a})", "list_sort({a})"),
    ("reverse({a})", "list_reverse({a})"),
    (
        "filter({a}, t -> length(t) >= 3)",
        "list_filter({a}, t -> length(t) >= 3)",
    ),
    (
        "transform({a}, t -> substring(t, 1, 2))",
        "list_transform({a}, t -> substring(t, 1, 2))",
    ),
    # slice is ORDER-SENSITIVE: sort first so upstream order-unstable
    # productions (DuckDB list_distinct) cannot leak divergent prefixes
    (
        "slice(array_sort({a}), 1, 5)",
        "(list_sort({a}))[1:LEAST(5, len({a}))]",
    ),
]

# terminal array → scalar productions
TERMINAL = [
    ("size({a})", "len({a})"),
    (
        "size(filter({a}, t -> t >= 'm'))",
        "len(list_filter({a}, t -> t >= 'm'))",
    ),
    # FOUND BY THIS FUZZ (round 6): on an EMPTY array Spark concat_ws
    # returns '' (length 0) while DuckDB string_agg returns NULL — the
    # faithful mapping is concat_ws ≡ COALESCE(string_agg, ''). The
    # registry's one string_agg oracle (x_containment) feeds it
    # str_split output, which is never an empty list, so no oracle was
    # affected; the mapping is pinned here.
    (
        "length(concat_ws(' ', {a}))",
        "length(COALESCE(list_aggregate({a}, 'string_agg', ' '), ''))",
    ),
]

BASE_S = "filter(split(text, ' '), t -> t <> '')"
BASE_D = "list_filter(string_split(text, ' '), t -> t <> '')"


@st.composite
def pipeline(draw):
    chain = draw(st.lists(st.sampled_from(range(len(UNARY))), max_size=3))
    term = draw(st.sampled_from(range(len(TERMINAL))))
    s, d = BASE_S, BASE_D
    for i in chain:
        s = UNARY[i][0].format(a=s)
        d = UNARY[i][1].format(a=d)
    return TERMINAL[term][0].format(a=s), TERMINAL[term][1].format(a=d)


@settings(
    max_examples=30 * _FUZZ_X,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pipe=pipeline())
def test_array_lambda_pipelines_agree(spark, duck_small, pipe):
    s_expr, d_expr = pipe
    sq = (
        f"SELECT CAST(SUM(CAST(({s_expr}) AS BIGINT)) AS BIGINT) AS total, "
        f"COUNT(*) AS n FROM __fuzz_docs"
    )
    dq = (
        f"SELECT CAST(SUM(CAST(({d_expr}) AS BIGINT)) AS BIGINT) AS total, "
        f"COUNT(*) AS n FROM documents"
    )
    spark.read.parquet(f"{SF_SMALL}/documents.parquet").createOrReplaceTempView(
        "__fuzz_docs"
    )
    s = spark.sql(sq).first()
    d = duck_small.execute(dq).fetchone()
    assert (s["total"], s["n"]) == (d[0], d[1]), (s_expr, d_expr)
