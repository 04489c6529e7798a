"""Round-5 pre-work, ninth batch: weighted sampling and dynamic pivot.

- ``x_weighted_sample`` — weighted sampling WITHOUT replacement via
  the exponential-keys method (Efraimidis-Spirakis A-ES): key =
  -ln(u)/w per row, take the k smallest keys — a distributed
  one-pass top-k, no sequential scan, no rejection loop. The uniform
  is a seeded md5 hash, so the draw is replay-deterministic and
  cross-engine checkable (the same reproducible-release pattern as
  ``x_dp_groupby``). The curation use: sample docs ∝ quality weight.
- ``q_pivot_dynamic`` — pivot with RUNTIME-discovered columns: pass 1
  collects the distinct pivot values (a bounded, documented driver
  materialization — |values| rows, metadata-scale), pass 2 pivots on
  that explicit list. The contrast with ``q_pivot``/``q_multi_pivot``
  (hard-coded values) is the point: this is how reporting layers
  pivot columns they cannot know at build time, and the value-list
  collect is the ONLY driver materialization — bounded by the
  domain, never by the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import register


# ---------------------------------------------------------------------------
# x_weighted_sample — Efraimidis-Spirakis exponential keys
# ---------------------------------------------------------------------------

_WEIGHTED_ORACLE = """
WITH weighted AS (
    SELECT doc_id, lang, n_chars,
           CAST(n_chars AS DOUBLE) AS w,
           (CAST('0x' || substr(md5('ws-seed-1|' || CAST(doc_id AS VARCHAR)),
                                1, 8) AS BIGINT) + 0.5) / 4294967296.0 AS u
    FROM documents
), keyed AS (
    SELECT doc_id, lang, n_chars,
           ROUND(-LN(u) / w, 10) AS k
    FROM weighted
)
SELECT doc_id, lang, n_chars
FROM (
    SELECT doc_id, lang, n_chars,
           ROW_NUMBER() OVER (ORDER BY k, doc_id) AS rn
    FROM keyed
)
WHERE rn <= 50
"""


@register("x_weighted_sample", oracle=_WEIGHTED_ORACLE)
def x_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """50 documents drawn ∝ length (the quality-weight stand-in) without
    replacement, via Efraimidis-Spirakis exponential keys: key_i =
    −ln(u_i)/w_i, keep the k smallest. One pass, fully distributed
    (TakeOrdered — per-partition top-k then a k-row merge; no global
    sort, no sequential weighted walk), and the textbook guarantee
    that inclusion probability follows the weights.

    The uniform is a seeded md5 of the row key — replay-deterministic,
    mirrored in the oracle; u = (h₃₂ + 0.5)/2³² stays strictly inside
    (0,1) so LN is finite. Keys are rounded to 10 decimals before
    ranking (with the doc_id tiebreak) so the cross-engine order is
    exact. At 100 TB this pattern also drives weighted SHARD sampling
    (w = shard token count) and temperature mixing with k fixed.
    """
    d = load(spark, sf_dir, "documents")
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("ws-seed-1|"), F.col("doc_id").cast("string")
                    ).cast("binary")
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        + 0.5
    ) / 4294967296.0
    k = F.round(-F.log(u) / F.col("n_chars").cast("double"), 10)
    return (
        d.select("doc_id", "lang", "n_chars", k.alias("k"))
        .orderBy("k", "doc_id")
        .limit(50)
        .select("doc_id", "lang", "n_chars")
    )


# ---------------------------------------------------------------------------
# q_pivot_dynamic — runtime-discovered pivot columns
# ---------------------------------------------------------------------------

_PIVOT_DYN_ORACLE = f"""
SELECT lang,
       {", ".join(
           f'''CAST(SUM(CASE WHEN source = 'src{i}' THEN 1 ELSE 0 END)
                    AS BIGINT) AS "src{i}"'''
           for i in range(0, 20)
       )}
FROM documents
GROUP BY lang
"""


@register("q_pivot_dynamic", oracle=_PIVOT_DYN_ORACLE)
def q_pivot_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot whose columns are discovered AT RUNTIME: lang × source doc
    counts where the source list comes from a first distinct pass, not
    from code. The two-pass recipe is the production answer to "pivot
    on whatever values exist today" — and the distinct-collect is the
    only driver materialization, bounded by |domain| (20 sources), not
    by data size. Passing the explicit list into ``pivot()`` also
    spares Spark its own hidden collect (an unbounded one, capped by
    ``spark.sql.pivotMaxValues``) and keeps the agg single-shuffle.

    Column order is sorted for schema determinism; missing cells
    zero-filled so the wide row is dense.
    """
    d = load(spark, sf_dir, "documents")
    values = sorted(
        r["source"] for r in d.select("source").distinct().collect()
    )
    wide = (
        d.groupBy("lang")
        .pivot("source", values)
        .agg(F.count(F.lit(1)).cast("long"))
    )
    return wide.select(
        "lang", *[F.coalesce(F.col(v), F.lit(0)).cast("long").alias(v) for v in values]
    )
