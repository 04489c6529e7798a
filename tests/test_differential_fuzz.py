"""Hypothesis-driven differential fuzzing: random predicates/projections
over the events fixture, executed by BOTH engines.

The registry's differential harness checks 155 hand-written oracles; this
layer checks the ENGINE MAPPING itself on inputs nobody hand-picked —
random conjunctions of comparisons, IN-lists, null guards, and arithmetic
derivations. Any divergence (count or checksum) is a cross-engine
semantics bug of exactly the kind CORRECTNESS_r02 caught once in
q_cast_types (decimal rendering) — cheaper to find here than in a driver
round.

Determinism note: hypothesis drives the QUERY SHAPE; each generated query
is itself deterministic on the fixed fixture, so failures replay exactly.
"""

from __future__ import annotations

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# soak multiplier: SPARK_GRAFT_FUZZ_X=10 runs 10x the examples —
# used by per-round fuzz soak sessions hunting cross-engine edges
_FUZZ_X = max(1, int(os.environ.get("SPARK_GRAFT_FUZZ_X", "1")))

from conftest import SF_SMALL

NUM_COLS = ["event_id", "user_id", "value"]
STR_COLS = ["event_type"]
TYPES = ["view", "click", "purchase", "signup", "error"]

comparison = st.one_of(
    st.tuples(
        st.sampled_from(NUM_COLS),
        st.sampled_from([">", ">=", "<", "<=", "=", "<>"]),
        st.integers(min_value=-5, max_value=120),
    ).map(lambda t: f"{t[0]} {t[1]} {t[2]}"),
    st.lists(st.sampled_from(TYPES), min_size=1, max_size=3, unique=True).map(
        lambda vs: "event_type IN ({})".format(
            ", ".join(f"'{v}'" for v in vs)
        )
    ),
    st.sampled_from(
        ["props IS NOT NULL", "props IS NULL", "value IS NOT NULL"]
    ),
    st.tuples(
        st.sampled_from(["user_id", "event_id"]),
        st.integers(min_value=2, max_value=7),
        st.integers(min_value=0, max_value=6),
    ).map(lambda t: f"{t[0]} % {t[1]} = {min(t[2], t[1] - 1)}"),
)

predicate = st.lists(comparison, min_size=1, max_size=4).map(
    lambda cs: " AND ".join(f"({c})" for c in cs)
)


@settings(
    max_examples=25 * _FUZZ_X,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pred=predicate)
def test_random_predicates_agree(spark, duck_small, pred):
    """COUNT plus an order-independent integer checksum must agree for
    any generated predicate."""
    q = (
        "SELECT COUNT(*) AS n, "
        "COALESCE(SUM(CAST(event_id AS BIGINT) * 2654435761 % 1000000007), 0)"
        " AS checksum "
        f"FROM events WHERE {pred}"
    )
    spark.read.parquet(f"{SF_SMALL}/events.parquet").createOrReplaceTempView(
        "__fuzz_events"
    )
    s = spark.sql(q.replace("FROM events", "FROM __fuzz_events")).first()
    d = duck_small.execute(q).fetchone()
    assert (s["n"], s["checksum"]) == (d[0], d[1]), pred


@settings(
    max_examples=15 * _FUZZ_X,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pred=predicate,
    # Derivations must be engine-agnostic by CONSTRUCTION: a raw
    # CAST(double AS BIGINT) truncates toward zero on Spark but ROUNDS
    # on DuckDB (found by this very test) — the same class of divergence
    # as the q_cast_types decimal-rendering miss. FLOOR pins the
    # semantics on both engines; integer-only arithmetic needs nothing.
    expr=st.sampled_from(
        [
            "CAST(FLOOR(value * 3) AS BIGINT)",
            "CAST(FLOOR(value) AS BIGINT) + user_id",
            "LENGTH(event_type)",
            "CAST(user_id % 10 AS BIGINT)",
            "ABS(CAST(FLOOR(value) AS BIGINT) - 50)",
        ]
    ),
)
def test_random_derivations_agree(spark, duck_small, pred, expr):
    """Grouped integer aggregations of derived expressions must agree."""
    q = (
        f"SELECT event_type, COUNT(*) AS n, "
        f"COALESCE(SUM({expr}), 0) AS s "
        f"FROM events WHERE {pred} GROUP BY event_type"
    )
    spark.read.parquet(f"{SF_SMALL}/events.parquet").createOrReplaceTempView(
        "__fuzz_events"
    )
    s = {
        (r["event_type"], r["n"], r["s"])
        for r in spark.sql(q.replace("FROM events", "FROM __fuzz_events")).collect()
    }
    d = set(map(tuple, duck_small.execute(q).fetchall()))
    assert s == d, (pred, expr)


JOIN_SPECS = [
    ("orders", "customer", "o_custkey", "c_custkey", "o_orderkey"),
    ("lineitem", "orders", "l_orderkey", "o_orderkey", "l_linenumber"),
    ("lineitem", "part", "l_partkey", "p_partkey", "l_suppkey"),
    ("customer", "nation", "c_nationkey", "n_nationkey", "c_custkey"),
    ("supplier", "nation", "s_nationkey", "n_nationkey", "s_suppkey"),
]


@settings(
    max_examples=12 * _FUZZ_X,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    spec=st.sampled_from(JOIN_SPECS),
    jt=st.sampled_from(["INNER", "LEFT", "LEFT SEMI", "LEFT ANTI"]),
    mod=st.integers(min_value=2, max_value=9),
    rem=st.integers(min_value=0, max_value=8),
)
def test_random_joins_agree(spark, duck_small, spec, jt, mod, rem):
    """Random (join type × table pair × filtered build side): row count
    and key checksum must agree across engines."""
    left, right, lk, rk, chk = spec
    rem = min(rem, mod - 1)
    if jt in ("LEFT SEMI", "LEFT ANTI"):
        duck_jt = "SEMI" if jt == "LEFT SEMI" else "ANTI"
        q = (
            f"SELECT COUNT(*) AS n, "
            f"COALESCE(SUM({left}.{chk} % 1000003), 0) AS c "
            f"FROM {left} {duck_jt} JOIN "
            f"(SELECT * FROM {right} WHERE {rk} % {mod} = {rem}) r "
            f"ON {left}.{lk} = r.{rk}"
        )
        sq = (
            f"SELECT COUNT(*) AS n, "
            f"COALESCE(SUM({left}.{chk} % 1000003), 0) AS c "
            f"FROM {left} {jt} JOIN "
            f"(SELECT * FROM {right} WHERE {rk} % {mod} = {rem}) r "
            f"ON {left}.{lk} = r.{rk}"
        )
    else:
        q = sq = (
            f"SELECT COUNT(*) AS n, "
            f"COALESCE(SUM({left}.{chk} % 1000003), 0) AS c "
            f"FROM {left} {jt} JOIN "
            f"(SELECT * FROM {right} WHERE {rk} % {mod} = {rem}) r "
            f"ON {left}.{lk} = r.{rk}"
        )
    for t in {left, right}:
        spark.read.parquet(f"{SF_SMALL}/{t}.parquet").createOrReplaceTempView(t)
    s = spark.sql(sq).first()
    d = duck_small.execute(q).fetchone()
    assert (s["n"], s["c"]) == (d[0], d[1]), (spec, jt, mod, rem)


@settings(
    max_examples=12 * _FUZZ_X,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    fn=st.sampled_from(
        [
            "ROW_NUMBER()",
            "RANK()",
            "DENSE_RANK()",
            "LAG(event_id, 1, -1)",
            "LEAD(event_id, 1, -1)",
            "COUNT(*)",
        ]
    ),
    part=st.sampled_from(["user_id", "event_type", "user_id % 5"]),
    direction=st.sampled_from(["ASC", "DESC"]),
    pred=predicate,
)
def test_random_window_functions_agree(spark, duck_small, fn, part, direction, pred):
    """Random window function × partitioning × direction over a random
    predicate; ORDER BY always carries the unique event_id tiebreaker so
    both engines' results are well-defined."""
    q = (
        f"SELECT event_id, CAST({fn} OVER (PARTITION BY {part} "
        f"ORDER BY value {direction}, event_id) AS BIGINT) AS w "
        f"FROM events WHERE {pred}"
    )
    spark.read.parquet(f"{SF_SMALL}/events.parquet").createOrReplaceTempView(
        "__fuzz_events"
    )
    s = {
        (r["event_id"], r["w"])
        for r in spark.sql(q.replace("FROM events", "FROM __fuzz_events")).collect()
    }
    d = set(map(tuple, duck_small.execute(q).fetchall()))
    assert s == d, (fn, part, direction, pred)


@settings(
    max_examples=10 * _FUZZ_X,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    op=st.sampled_from(["UNION", "UNION ALL", "EXCEPT", "INTERSECT"]),
    p1=predicate,
    p2=predicate,
)
def test_random_set_operations_agree(spark, duck_small, op, p1, p2):
    """Random set operation between two filtered projections of events:
    full result-set equality across engines (bag semantics for UNION ALL
    via sorted multiset compare)."""
    q = (
        f"SELECT event_id, user_id FROM events WHERE {p1} "
        f"{op} "
        f"SELECT event_id, user_id FROM events WHERE {p2}"
    )
    spark.read.parquet(f"{SF_SMALL}/events.parquet").createOrReplaceTempView(
        "__fuzz_events"
    )
    s = sorted(
        (r["event_id"], r["user_id"])
        for r in spark.sql(q.replace("FROM events", "FROM __fuzz_events")).collect()
    )
    d = sorted(map(tuple, duck_small.execute(q).fetchall()))
    assert s == d, (op, p1, p2)
