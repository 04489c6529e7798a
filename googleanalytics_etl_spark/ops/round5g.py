"""Round-5 pre-work, seventh batch: the end-to-end curation composite.

``x_curation_e2e`` chains the pipeline every LLM corpus actually runs —
quality filter → exact dedup → benchmark decontamination → stratified
cap — as ONE dataflow, and reports per-language survival counts at
every stage. The point of registering the COMPOSITE (the stages all
exist as first-class operators) is that stage interaction is where
pipelines break: a dedup that reorders before sampling, a filter that
runs after the cap, a decontamination pass that sees already-dropped
docs. The hash oracle pins the whole composition, not just the parts.

Stage semantics (all deterministic, all cross-engine):
1. quality — 20 ≤ tokens ≤ 1000 AND type/token ratio ≥ 0.3
   (the x_quality_score thresholds, inlined);
2. exact dedup — survivor = min doc_id per md5(text) (x_dedup_exact);
3. decontamination — drop docs with > 50 % distinct word-3-gram
   overlap against the src0 benchmark slice (x_decontaminate shape);
4. stratified cap — ≤ 100 docs per lang, md5-hash order
   (x_stratified_sample shape).

One scan feeds stage flags computed as columns where possible; the
dedup and contamination stages are the only shuffles (md5 digest and
60-bit shingle-hash keys — never text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register
from .extensions import word_shingles


_CURATION_ORACLE = """
WITH corpus AS (
    SELECT doc_id, lang, source, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000, lang, source, text
    FROM documents WHERE doc_id < 10
), base AS (
    SELECT doc_id, lang, source, text,
           len(list_filter(str_split(text, ' '), t -> t <> '')) AS n_tok,
           len(list_distinct(list_filter(str_split(text, ' '),
                                         t -> t <> ''))) AS n_typ
    FROM corpus
), q AS (
    SELECT *, (n_tok BETWEEN 20 AND 1000
               AND CAST(n_typ AS DOUBLE) / n_tok >= 0.3) AS ok_quality
    FROM base
), d AS (
    SELECT *, (ok_quality AND doc_id = MIN(CASE WHEN ok_quality THEN doc_id END)
                   OVER (PARTITION BY md5(text))) AS ok_unique
    FROM q
), shing AS (
    SELECT doc_id,
           unnest(list_distinct(
               CASE WHEN len(str_split(text, ' ')) >= 3 THEN
                   list_transform(range(len(str_split(text, ' ')) - 2),
                       i -> str_split(text, ' ')[i + 1] || ' ' ||
                            str_split(text, ' ')[i + 2] || ' ' ||
                            str_split(text, ' ')[i + 3])
               ELSE [text] END)) AS shingle
    FROM corpus
), hashed AS (
    SELECT doc_id, CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) AS h
    FROM shing
), bench AS (
    SELECT DISTINCT h FROM hashed
    JOIN corpus USING (doc_id) WHERE source = 'src0'
), contam AS (
    SELECT t.doc_id,
           CAST(COUNT(b.h) AS DOUBLE) / COUNT(*) AS frac
    FROM hashed t LEFT JOIN bench b USING (h)
    GROUP BY t.doc_id
), c AS (
    SELECT d.*, (ok_unique AND (source = 'src0' OR frac <= 0.5)) AS ok_clean
    FROM d JOIN contam USING (doc_id)
), s AS (
    SELECT *, (ok_clean AND rn <= 100) AS ok_sampled
    FROM (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY lang, ok_clean
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM c
    )
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_raw,
       CAST(SUM(CASE WHEN ok_quality THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
       CAST(SUM(CASE WHEN ok_unique THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
       CAST(SUM(CASE WHEN ok_clean THEN 1 ELSE 0 END) AS BIGINT) AS n_clean,
       CAST(SUM(CASE WHEN ok_sampled THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       CAST(SUM(CASE WHEN ok_sampled THEN n_tok ELSE 0 END) AS BIGINT)
           AS tokens_sampled
FROM s
GROUP BY lang
"""


@register("x_curation_e2e", oracle=_CURATION_ORACLE)
def x_curation_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation funnel: per language, how many documents
    survive quality → exact-dedup → decontamination → stratified-cap,
    plus the token budget of the final sample. The composite the judge
    of any curation pipeline actually asks for ("how much data is left,
    and why"), with every stage's drop accounted.

    Stage flags are cumulative booleans computed in ONE pass where the
    stage is row-local (quality), and via the minimum-id window over
    md5(text) digests (dedup) / a 60-bit shingle-hash left join
    (decontamination — the benchmark side is the distinct src0 hash
    set, broadcast at fixture scale) / a (lang, survivor)-keyed rank
    (cap) where cross-row state is required. Nothing moves text except
    the initial scan: digests, hashes, and flags shuffle. The final
    report is one |langs|-row aggregate.
    """
    raw = load(spark, sf_dir, "documents")
    # planted exact-dup tail (doc_id < 10 at +1e6, the x_dedup_exact
    # fixture convention) so the dedup stage is non-vacuous at every sf
    d = raw.select("doc_id", "lang", "source", "text").unionByName(
        raw.where(F.col("doc_id") < 10).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            "lang",
            "source",
            "text",
        )
    )
    toks = F.filter(F.split("text", " "), lambda t: t != "")
    base = d.select(
        "doc_id",
        "lang",
        "source",
        "text",
        F.size(toks).alias("n_tok"),
        F.size(F.array_distinct(toks)).alias("n_typ"),
    )
    q = base.withColumn(
        "ok_quality",
        F.col("n_tok").between(20, 1000)
        & (F.col("n_typ").cast("double") / F.col("n_tok") >= 0.3),
    )
    dig_w = Window.partitionBy(F.md5(F.col("text").cast("binary")))
    dd = q.withColumn(
        "ok_unique",
        F.col("ok_quality")
        & (
            F.col("doc_id")
            == F.min(F.when(F.col("ok_quality"), F.col("doc_id"))).over(dig_w)
        ),
    )
    # words projected ONCE before the shingle lambdas: passing the split
    # expression into word_shingles inlines it at every element_at site
    # inside the array transform (CSE is not guaranteed across array
    # lambdas), re-splitting the text O(words) times per document —
    # measured 3.4–5.7 s → 0.6 s on this stage at sf0.1.
    sh = (
        d.select("doc_id", "source", F.split("text", " ").alias("words"))
        # Rebalance BEFORE the shingle+md5 explode (the _occ pitfall:
        # 1-2 input splits would serialize the featurization)
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .select(
            "doc_id",
            "source",
            F.explode(word_shingles(F.col("words"))).alias("shingle"),
        )
    )
    h = F.conv(
        F.substring(F.md5(F.col("shingle").cast("binary")), 1, 15), 16, 10
    ).cast("long")
    # NOT checkpointed (tried in round 12, measured neutral-to-worse):
    # the second consumer is the src0-filtered benchmark branch, whose
    # predicate pushes to the scan — re-running ~1/|sources| of the
    # shingle pipeline costs less than materializing the full
    # corpus-gram frame.
    hashed = sh.select("doc_id", "source", h.alias("h"))
    bench = (
        hashed.where(F.col("source") == "src0")
        .select("h")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    contam = (
        hashed.join(F.broadcast(bench), "h", "left")
        .groupBy("doc_id")
        .agg(
            (F.count("hit").cast("double") / F.count(F.lit(1))).alias("frac")
        )
    )
    c = dd.join(contam, "doc_id").withColumn(
        "ok_clean",
        F.col("ok_unique")
        & ((F.col("source") == "src0") | (F.col("frac") <= 0.5)),
    )
    cap_w = Window.partitionBy("lang", "ok_clean").orderBy(
        F.md5(F.col("doc_id").cast("string").cast("binary")), "doc_id"
    )
    s = c.withColumn(
        "ok_sampled",
        F.col("ok_clean") & (F.row_number().over(cap_w) <= 100),
    )
    z = F.lit(0).cast("long")
    return s.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_raw"),
        F.sum(F.when(F.col("ok_quality"), 1).otherwise(0)).cast("long").alias("n_quality"),
        F.sum(F.when(F.col("ok_unique"), 1).otherwise(0)).cast("long").alias("n_unique"),
        F.sum(F.when(F.col("ok_clean"), 1).otherwise(0)).cast("long").alias("n_clean"),
        F.sum(F.when(F.col("ok_sampled"), 1).otherwise(0)).cast("long").alias("n_sampled"),
        F.coalesce(
            F.sum(F.when(F.col("ok_sampled"), F.col("n_tok"))), z
        ).cast("long").alias("tokens_sampled"),
    )
