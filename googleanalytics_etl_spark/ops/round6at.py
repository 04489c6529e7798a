"""Round-6 batch 46: sequence information + community quality.

- ``x_transition_entropy`` — the Markov screen: marginal entropy of
  the next event H(next) vs conditional entropy H(next | current)
  over all user-stream transitions, and their difference (the mutual
  information of consecutive events). Zero gain means event order
  carries no signal and a bag-of-events model suffices; a large gain
  justifies sequence features (x_sequence_mining's patterns). Both
  entropies reduce to the count identity ``Σ n·ln n`` — exact integer
  counts, quantized log terms, one division at the end.
- ``x_modularity`` — Newman modularity of the BRAND partition on the
  support-filtered co-purchase graph: ``Q = Σ_c (e_c/m − (a_c/2m)²)``.
  Answers "do parts of the same brand actually get bought together?"
  — the community-quality score that turns a catalog attribute into a
  testable graph hypothesis. Every term is an exact integer ratio.

Reference parity: no analogue [REF-UNVERIFIED — /root/reference is
empty]; SURVEY §2.E/§2.J-M analytics + graph extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register
from .round6as import _CC_SUPPORT, _support_edges

_TE_ORACLE = """
WITH t AS (
    SELECT event_type AS cur,
           LEAD(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS nxt
    FROM events
), pairs AS (
    SELECT cur, nxt FROM t WHERE nxt IS NOT NULL
), pc AS (
    SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS n
    FROM pairs GROUP BY cur, nxt
), m AS (
    SELECT CAST(SUM(n) AS BIGINT) AS total,
           CAST(SUM(n * CAST(ln(CAST(n AS DOUBLE)) AS DECIMAL(18,8)))
                AS DECIMAL(38,8)) AS s_pair
    FROM pc
), mc AS (
    SELECT CAST(SUM(cn * CAST(ln(CAST(cn AS DOUBLE)) AS DECIMAL(18,8)))
                AS DECIMAL(38,8)) AS s_cur
    FROM (SELECT cur, CAST(SUM(n) AS BIGINT) AS cn FROM pc GROUP BY cur)
), mn AS (
    SELECT CAST(SUM(nn * CAST(ln(CAST(nn AS DOUBLE)) AS DECIMAL(18,8)))
                AS DECIMAL(38,8)) AS s_nxt
    FROM (SELECT nxt, CAST(SUM(n) AS BIGINT) AS nn FROM pc GROUP BY nxt)
)
SELECT m.total AS n_transitions,
       ROUND(ln(CAST(m.total AS DOUBLE))
             - CAST(mn.s_nxt AS DOUBLE) / m.total, 6) AS h_next,
       ROUND((CAST(mc.s_cur AS DOUBLE) - CAST(m.s_pair AS DOUBLE))
             / m.total, 6) AS h_cond,
       ROUND(ln(CAST(m.total AS DOUBLE))
             - CAST(mn.s_nxt AS DOUBLE) / m.total
             - (CAST(mc.s_cur AS DOUBLE) - CAST(m.s_pair AS DOUBLE))
               / m.total, 6) AS info_gain
FROM m CROSS JOIN mc CROSS JOIN mn
"""


@register("x_transition_entropy", oracle=_TE_ORACLE)
def x_transition_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov information gain: H(next) − H(next | current) over all
    consecutive event pairs. Via the count identities ``H(next) =
    ln N − Σ n_next·ln n_next / N`` and ``H(next|cur) = (Σ n_cur·ln
    n_cur − Σ n_pair·ln n_pair) / N``, everything aggregates as exact
    integer counts with DECIMAL-quantized log terms (the
    x_session_entropy discipline) — the floats appear only in the
    final fixed-shape expression. Gain ≈ 0 ⇒ the event stream is
    order-free and bag-of-events features suffice; the tests pin
    0 ≤ gain ≤ H(next).

    Scale shape: one lead over the sessionization window, one
    map-side-combinable (cur, next) count — a ≤ 25-row frame for all
    downstream algebra; margins are re-aggregations of that frame,
    never the scan. Scan-bound at 100 TB.
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = e.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).where(F.col("nxt").isNotNull())
    pc = pairs.groupBy("cur", "nxt").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    nlogn = lambda c: (  # noqa: E731 — quantized n·ln n term
        F.col(c) * F.log(F.col(c).cast("double")).cast("decimal(18,8)")
    )
    m = pc.agg(
        F.sum("n").cast("long").alias("total"),
        F.sum(nlogn("n")).cast("decimal(38,8)").alias("s_pair"),
    )
    mc = (
        pc.groupBy("cur")
        .agg(F.sum("n").cast("long").alias("cn"))
        .agg(F.sum(nlogn("cn")).cast("decimal(38,8)").alias("s_cur"))
    )
    mn = (
        pc.groupBy("nxt")
        .agg(F.sum("n").cast("long").alias("nn"))
        .agg(F.sum(nlogn("nn")).cast("decimal(38,8)").alias("s_nxt"))
    )
    joined = m.crossJoin(F.broadcast(mc)).crossJoin(F.broadcast(mn))
    h_next = (
        F.log(F.col("total").cast("double"))
        - F.col("s_nxt").cast("double") / F.col("total")
    )
    h_cond = (
        F.col("s_cur").cast("double") - F.col("s_pair").cast("double")
    ) / F.col("total")
    return joined.select(
        F.col("total").alias("n_transitions"),
        F.round(h_next, 6).alias("h_next"),
        F.round(h_cond, 6).alias("h_cond"),
        F.round(h_next - h_cond, 6).alias("info_gain"),
    )


_MOD_ORACLE = f"""
WITH li AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), edges AS (
    SELECT a.l_partkey AS src, b.l_partkey AS dst
    FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
    WHERE a.l_partkey <> b.l_partkey
    GROUP BY a.l_partkey, b.l_partkey
    HAVING COUNT(*) >= {_CC_SUPPORT}
), lab AS (
    SELECT e.src, e.dst, ps.p_brand AS c_src, pd.p_brand AS c_dst
    FROM edges e
    JOIN part ps ON ps.p_partkey = e.src
    JOIN part pd ON pd.p_partkey = e.dst
), m AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS m_dir FROM lab
), per_c AS (
    SELECT c_src AS community,
           CAST(COUNT(*) AS BIGINT) AS a_c,
           CAST(SUM(CASE WHEN c_src = c_dst THEN 1 ELSE 0 END) AS BIGINT)
               AS e_in
    FROM lab GROUP BY c_src
)
SELECT community, a_c, e_in,
       ROUND(CAST(e_in AS DOUBLE) / m.m_dir
             - (CAST(a_c AS DOUBLE) / m.m_dir)
               * (CAST(a_c AS DOUBLE) / m.m_dir), 6) AS q_contrib
FROM per_c CROSS JOIN m
"""


@register("x_modularity", oracle=_MOD_ORACLE)
def x_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the brand partition on the support-≥
    {_CC_SUPPORT} co-purchase graph, reported per community:
    ``q_c = e_c/2m − (a_c/2m)²`` (directed both-ways list, so the
    directed edge count IS 2m and within-community directed edges are
    2e_c — the ratios come out identical). Σ q_c is the partition's
    modularity; positive contributions mark brands whose parts really
    co-sell, ≈0 means the attribute does not community-structure the
    graph. Every ratio is exact-integer over exact-integer.

    Scale shape: the support-filtered edge build (shared
    _support_edges), two broadcast joins against the part dimension
    for labels, one 1-row total, one brand-domain aggregate.
    Scan-bound at 100 TB.
    """
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = _support_edges(li)
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ps = p.select(
        F.col("p_partkey").alias("src"), F.col("p_brand").alias("c_src")
    )
    pd_ = p.select(
        F.col("p_partkey").alias("dst"), F.col("p_brand").alias("c_dst")
    )
    lab = edges.join(F.broadcast(ps), "src").join(F.broadcast(pd_), "dst")
    m = lab.agg(F.count(F.lit(1)).cast("long").alias("m_dir"))
    per_c = lab.groupBy(F.col("c_src").alias("community")).agg(
        F.count(F.lit(1)).cast("long").alias("a_c"),
        F.sum(F.when(F.col("c_src") == F.col("c_dst"), 1).otherwise(0))
        .cast("long")
        .alias("e_in"),
    )
    frac_a = F.col("a_c").cast("double") / F.col("m_dir")
    return per_c.crossJoin(F.broadcast(m)).select(
        "community",
        "a_c",
        "e_in",
        F.round(
            F.col("e_in").cast("double") / F.col("m_dir") - frac_a * frac_a,
            6,
        ).alias("q_contrib"),
    )
