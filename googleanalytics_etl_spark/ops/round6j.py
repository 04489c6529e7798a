"""Round-6 batch 10: PQ asymmetric-distance search and DiD analysis.

- ``x_adc_scan`` — the query side of product quantization: a query
  vector scanned against the PQ-coded corpus by asymmetric distance
  computation (ADC — per-subspace lookup tables of query-to-codeword
  distances, summed by code), top-10 by ADC distance with the TRUE
  squared distance alongside. Together with ``x_pq_quantize`` this is
  the full PQ retrieval loop: train codebooks → code the corpus →
  answer queries from 2 table lookups per vector instead of a 64-dim
  scan.
- ``x_did_analysis`` — difference-in-differences: the 2×2
  (treatment × period) mean-outcome table and the DiD estimate, exact
  cents all the way.

Reference parity: no analogue [REF-UNVERIFIED — /root/reference is
empty]; SURVEY §2.J-M vectors + §2.E analytics extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register
from .round6i import _PQ_ITERS, _PQ_SUB, _pq_subspace_ctes

_ADC_TOPK = 10


def _adc_oracle() -> str:
    final = _PQ_ITERS
    lut = """
, lut_{t} AS (
    SELECT c.cluster, ROUND(SUM((q.val - c.cval) * (q.val - c.cval)), 6) AS d
    FROM c_{t}{p} c JOIN q ON q.dim = c.dim
    GROUP BY c.cluster
)"""
    return f"""
WITH v AS (
    SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
           CAST(unnest(embedding) AS DOUBLE) AS val
    FROM embeddings
){_pq_subspace_ctes("a", 0, _PQ_SUB)}{_pq_subspace_ctes("b", _PQ_SUB, 2 * _PQ_SUB)}
, q AS (
    SELECT dim, val FROM v WHERE vec_id = 0
){lut.format(t="a", p=final - 1)}{lut.format(t="b", p=final - 1)}
, adc AS (
    SELECT a.vec_id, a.cluster AS code_a, b.cluster AS code_b,
           ROUND(la.d + lb.d, 6) AS adc_dist
    FROM a_a{final} a
    JOIN a_b{final} b USING (vec_id)
    JOIN lut_a la ON la.cluster = a.cluster
    JOIN lut_b lb ON lb.cluster = b.cluster
), exact AS (
    SELECT v.vec_id,
           ROUND(SUM((v.val - q.val) * (v.val - q.val)), 6) AS exact_dist
    FROM v JOIN q USING (dim)
    GROUP BY v.vec_id
)
SELECT CAST(rank AS BIGINT) AS rank, vec_id,
       CAST(code_a AS BIGINT) AS code_a, CAST(code_b AS BIGINT) AS code_b,
       adc_dist, exact_dist
FROM (
    SELECT a.vec_id, a.code_a, a.code_b, a.adc_dist, e.exact_dist,
           ROW_NUMBER() OVER (ORDER BY a.adc_dist, a.vec_id) AS rank
    FROM adc a JOIN exact e USING (vec_id)
) WHERE rank <= {_ADC_TOPK}
"""


@register("x_adc_scan", oracle=_adc_oracle())
def x_adc_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance top-k: the query (vec_id 0's embedding)
    against every coded vector, where the approximate distance is two
    LOOKUPS — lut_s[code_s] = ‖q_sub − codebook_s[code]‖², summed over
    the 2 subspaces — instead of a 64-dim scan per vector. Returns the
    top-10 by (ADC distance, vec_id) with the true squared distance
    alongside, so the frame itself shows the ADC↔exact agreement a
    recall audit would compute.

    Scale shape: the lookup tables are 2×k rounded doubles built
    DRIVER-side from the collected codebooks (bounded metadata, the
    x_kmeans contract) and folded into codegen as literal arrays —
    the per-vector cost is two element_at calls on codes the
    assignment scan already produced, no join and no shuffle; top-k is
    TakeOrdered (no global sort), and the rank window runs over the 10
    surviving rows. At 100 TB with k = 256 and 8 subspaces this is the
    memory-bandwidth-bound ADC loop every PQ system runs; the exact
    column stays cheap here (one fold per vector) and in production is
    computed only for the top-k re-rank.

    Determinism: lut entries and exact distances are 6-dp-rounded sums
    (the kmeans recipe — rounding buries summation-order ulps); the
    ADC sum re-rounds the two-term total; ties break on vec_id.
    """
    from .round6i import pq_model

    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    assigned, books = pq_model(e)
    q = [
        float(x)
        for x in e.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    ]
    luts = []
    for s in range(2):
        qs = q[s * _PQ_SUB : (s + 1) * _PQ_SUB]
        luts.append(
            {
                j: round(sum((a - b) * (a - b) for a, b in zip(qs, c)), 6)
                for j, c in books[s].items()
            }
        )
    lut_col = [
        F.array(*[F.lit(luts[s][j]) for j in sorted(luts[s])])
        for s in range(2)
    ]
    adc = F.round(
        F.element_at(lut_col[0], F.col("code_a").cast("int") + 1)
        + F.element_at(lut_col[1], F.col("code_b").cast("int") + 1),
        6,
    )
    dbl = lambda c: c.cast("double")  # noqa: E731
    exact = F.round(
        F.aggregate(
            F.zip_with(
                "embedding",
                F.array(*[F.lit(x) for x in q]),
                lambda x, y: (dbl(x) - y) * (dbl(x) - y),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )
    top = (
        assigned.select(
            "vec_id",
            "code_a",
            "code_b",
            adc.alias("adc_dist"),
            exact.alias("exact_dist"),
        )
        .orderBy("adc_dist", "vec_id")
        .limit(_ADC_TOPK)
    )
    rank = F.row_number().over(Window.orderBy("adc_dist", "vec_id"))
    return top.select(
        rank.cast("long").alias("rank"),
        "vec_id",
        "code_a",
        "code_b",
        "adc_dist",
        "exact_dist",
    )


# ---------------------------------------------------------------------------
# x_did_analysis — difference-in-differences
# ---------------------------------------------------------------------------

# treatment = odd user_id (the deterministic stand-in for an assignment
# column), post = events on/after 2024-01-08 (mid-fixture boundary).
# Outcome = purchase value. Means are exact-cents sums divided out in
# the same IEEE op sequence both engines run.
_DID_ORACLE = """
WITH p AS (
    SELECT user_id % 2 AS treated,
           CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-08'
                THEN 1 ELSE 0 END AS post,
           CAST(ROUND(value * 100) AS BIGINT) AS cents
    FROM events WHERE event_type = 'purchase'
), cells AS (
    SELECT treated, post,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS DOUBLE) / COUNT(*) / 100 AS mean_value
    FROM p GROUP BY treated, post
)
SELECT CAST(t_post.n + t_pre.n + c_post.n + c_pre.n AS BIGINT)
           AS n_purchases,
       ROUND(t_pre.mean_value, 6) AS treat_pre,
       ROUND(t_post.mean_value, 6) AS treat_post,
       ROUND(c_pre.mean_value, 6) AS control_pre,
       ROUND(c_post.mean_value, 6) AS control_post,
       ROUND((t_post.mean_value - t_pre.mean_value)
             - (c_post.mean_value - c_pre.mean_value), 6) AS did
FROM (SELECT * FROM cells WHERE treated = 1 AND post = 1) t_post,
     (SELECT * FROM cells WHERE treated = 1 AND post = 0) t_pre,
     (SELECT * FROM cells WHERE treated = 0 AND post = 1) c_post,
     (SELECT * FROM cells WHERE treated = 0 AND post = 0) c_pre
"""


@register("x_did_analysis", oracle=_DID_ORACLE)
def x_did_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences over purchase values: treatment = odd
    user_id, post-period = on/after 2024-01-08, outcome = purchase
    value. One row: the four (treatment × period) cell means and
    did = (treat_post − treat_pre) − (control_post − control_pre) —
    the standard parallel-trends estimate of a launch's effect when
    randomized assignment isn't available.

    Scale shape: one filtered scan, ONE conditional aggregate producing
    the four cells as conditional sums (no self-joins, no second pass),
    a single output row. Means are exact integer-cents sums divided
    back out — identical IEEE op order both engines — and the DiD
    subtraction runs on those unrounded doubles before one final
    ROUND 6.
    """
    e = load(spark, sf_dir, "events")
    p = e.where(F.col("event_type") == "purchase").select(
        (F.col("user_id") % 2).alias("treated"),
        (F.col("ts").cast("date") >= F.lit("2024-01-08").cast("date"))
        .cast("int")
        .alias("post"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )

    def cell(t: int, po: int):
        cond = (F.col("treated") == t) & (F.col("post") == po)
        n = F.sum(cond.cast("long"))
        return (
            F.sum(F.when(cond, F.col("cents"))).cast("double") / n / 100,
            n,
        )

    tp, n_tp = cell(1, 1)
    tr, n_tr = cell(1, 0)
    cp, n_cp = cell(0, 1)
    cr, n_cr = cell(0, 0)
    return p.agg(
        (n_tp + n_tr + n_cp + n_cr).cast("long").alias("n_purchases"),
        F.round(tr, 6).alias("treat_pre"),
        F.round(tp, 6).alias("treat_post"),
        F.round(cr, 6).alias("control_pre"),
        F.round(cp, 6).alias("control_post"),
        F.round((tp - tr) - (cp - cr), 6).alias("did"),
    )
