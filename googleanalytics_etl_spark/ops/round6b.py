"""Round-6 batch 2: corpus-forensics operators for LLM data curation.

Four more first-class additions to the §2.J–M families, each a full
cross-engine hash oracle over the standard fixtures:

- ``x_prefix_dedup`` — boilerplate-prefix duplicate detection: docs
  sharing an identical first-8-token prefix (the crawl-boilerplate
  signature MinHash under-weights because it is a small fraction of a
  long page) grouped by a row-local prefix digest.
- ``x_tokenizer_fertility`` — per-language tokens/chars/bytes and the
  fertility ratios (chars-per-token, bytes-per-token, tokens-per-doc)
  that size a tokenizer's vocabulary budget per language.
- ``x_freq_prune_vocab`` — document-frequency band pruning of the
  per-language vocabulary (df ≥ 5 and df ≤ N/2) with occurrence
  coverage of the kept band — the min_df/max_df step ahead of any
  TF-IDF / hashing featurizer.
- ``x_embed_outliers`` — per-label embedding outlier counts: squared
  L2 distance to the exact per-label centroid, flagged beyond 2× the
  label's mean — the mislabeled/garbage-vector screen before
  contrastive training.

Reference parity: the reference package has no analogue for any of
these [REF-UNVERIFIED — /root/reference is empty]; they extend the
§2.J-M families per the round mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

# ---------------------------------------------------------------------------
# x_prefix_dedup — first-k-token boilerplate prefix groups
# ---------------------------------------------------------------------------

_PREFIX_K = 8

_PREFIX_DEDUP_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, source,
           list_filter(string_split_regex(lower(text), '[^a-z]+'),
                       x -> x <> '') AS t
    FROM documents
), keyed AS (
    SELECT doc_id, source,
           md5(array_to_string(list_slice(t, 1, {_PREFIX_K}), ' '))
               AS prefix_key
    FROM toks WHERE len(t) >= {_PREFIX_K}
)
SELECT prefix_key,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS survivor,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
FROM keyed
GROUP BY prefix_key
HAVING COUNT(*) >= 2
"""


@register("x_prefix_dedup", oracle=_PREFIX_DEDUP_ORACLE)
def x_prefix_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate-prefix duplicate groups: documents whose first
    {k}-token prefix is identical, keyed by a row-local md5 of the
    prefix. Crawl boilerplate ("subscribe to our newsletter …") repeats
    verbatim at document HEADS while the tails differ, so whole-doc
    MinHash similarity stays low — prefix grouping is the standard
    complementary screen.

    Scale shape: the prefix digest is computed row-locally (lowercase
    split → ``slice`` → ``concat_ws`` → md5, all codegen builtins), so
    the ONLY shuffle carries (digest, doc_id, source) — never text —
    with map-side combine on the count. Groups are emitted only when
    n_docs ≥ 2, so the output is bounded by the duplicate population.
    Survivor policy is keep-lowest-id, same as the MinHash family
    (``x_survivor_policy`` documents the alternatives).
    """
    d = load(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z]+"), lambda t: t != ""
    )
    prefix = F.concat_ws(" ", F.slice(F.col("t"), 1, _PREFIX_K))
    return (
        d.select("doc_id", "source", toks.alias("t"))
        .where(F.size("t") >= _PREFIX_K)
        .select(
            "doc_id",
            "source",
            F.md5(prefix.cast("binary")).alias("prefix_key"),
        )
        .groupBy("prefix_key")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("survivor"),
            F.countDistinct("source").cast("long").alias("n_sources"),
        )
        .where(F.col("n_docs") >= 2)
    )


x_prefix_dedup.__doc__ = x_prefix_dedup.__doc__.format(k=_PREFIX_K)


# ---------------------------------------------------------------------------
# x_tokenizer_fertility — per-language tokenizer sizing statistics
# ---------------------------------------------------------------------------

_FERTILITY_ORACLE = """
WITH per_doc AS (
    SELECT lang,
           len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                           x -> x <> '')) AS n_tok,
           length(text) AS n_chr,
           strlen(text) AS n_byte
    FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       CAST(SUM(n_chr) AS BIGINT) AS n_chars,
       CAST(SUM(n_byte) AS BIGINT) AS n_bytes,
       ROUND(CAST(SUM(n_chr) AS DOUBLE) / SUM(n_tok), 6) AS chars_per_token,
       ROUND(CAST(SUM(n_byte) AS DOUBLE) / SUM(n_tok), 6) AS bytes_per_token,
       ROUND(CAST(SUM(n_tok) AS DOUBLE) / COUNT(*), 6) AS tokens_per_doc
FROM per_doc
GROUP BY lang
"""


@register("x_tokenizer_fertility", oracle=_FERTILITY_ORACLE)
def x_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenizer fertility: token / character / byte
    totals and their ratios (chars-per-token ≈ how much a
    whitespace-ish tokenizer compresses the language; bytes-per-token
    is the number a byte-fallback BPE budget is sized against). The
    standard per-language dial when allocating a shared vocabulary —
    languages with high fertility need more merges to reach the same
    sequence-length budget (``x_token_budget`` consumes exactly this
    kind of table).

    Scale shape: one projection computes the three per-doc integers
    row-locally (no explode — ``size(split(...))`` counts tokens inside
    the row), then ONE map-side-combined aggregate on the low-
    cardinality language key. All integer sums (exact); the ratios are
    single IEEE divisions of identical integers on both engines, then
    ROUND 6.
    """
    d = load(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z]+"), lambda t: t != ""
    )
    per_doc = d.select(
        "lang",
        F.size(toks).cast("long").alias("n_tok"),
        F.length("text").cast("long").alias("n_chr"),
        F.octet_length("text").cast("long").alias("n_byte"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
        F.sum("n_chr").cast("long").alias("n_chars"),
        F.sum("n_byte").cast("long").alias("n_bytes"),
        F.round(
            F.sum("n_chr").cast("double") / F.sum("n_tok"), 6
        ).alias("chars_per_token"),
        F.round(
            F.sum("n_byte").cast("double") / F.sum("n_tok"), 6
        ).alias("bytes_per_token"),
        F.round(
            F.sum("n_tok").cast("double") / F.count(F.lit(1)), 6
        ).alias("tokens_per_doc"),
    )


# ---------------------------------------------------------------------------
# x_freq_prune_vocab — df-band vocabulary pruning per language
# ---------------------------------------------------------------------------

_MIN_DF = 5

_FREQ_PRUNE_ORACLE = f"""
WITH toks AS (
    SELECT lang, doc_id,
           unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                              x -> x <> '')) AS tok
    FROM documents
), per_doc AS (
    SELECT lang, tok, doc_id, COUNT(*) AS n
    FROM toks GROUP BY lang, tok, doc_id
), vocab AS (
    SELECT lang, tok, COUNT(*) AS df, SUM(n) AS occ
    FROM per_doc GROUP BY lang, tok
), langs AS (
    SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang
), flagged AS (
    SELECT v.lang, v.df, v.occ,
           CASE WHEN v.df >= {_MIN_DF} AND 2 * v.df <= l.n_docs
                THEN 1 ELSE 0 END AS kept
    FROM vocab v JOIN langs l ON v.lang = l.lang
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS vocab_total,
       CAST(SUM(kept) AS BIGINT) AS vocab_kept,
       CAST(SUM(occ) AS BIGINT) AS occ_total,
       CAST(SUM(CASE WHEN kept = 1 THEN occ ELSE 0 END) AS BIGINT)
           AS occ_kept,
       ROUND(CAST(SUM(CASE WHEN kept = 1 THEN occ ELSE 0 END) AS DOUBLE)
             / SUM(occ), 6) AS coverage
FROM flagged
GROUP BY lang
"""


@register("x_freq_prune_vocab", oracle=_FREQ_PRUNE_ORACLE)
def x_freq_prune_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-frequency band pruning of the per-language vocabulary:
    keep tokens seen in ≥ {min_df} documents (too-rare = typos, hashes,
    OOV noise) but ≤ half the language's documents (too-common =
    stopwords, markup) — the min_df/max_df gate every count-based
    featurizer (TF-IDF, hashing, n-gram LM) applies first. Output per
    language: vocabulary sizes before/after the band and the occurrence
    coverage the kept band retains.

    Scale shape: explode → two STACKED hash aggregates, each map-side
    combined — (lang, tok, doc_id) collapses the within-doc repeats
    (bounding the second shuffle by the distinct grain), then
    (lang, tok) yields df + occurrence counts. The per-language doc
    count joins as BROADCAST metadata. The keep rule is integer-only
    (``2·df ≤ n_docs`` instead of ``df ≤ 0.5·n_docs``) so both engines
    compare exact integers — no float threshold at the band edge.
    """
    d = load(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z]+"), lambda t: t != ""
    )
    per_doc = (
        d.select("lang", "doc_id", F.explode(toks).alias("tok"))
        .groupBy("lang", "tok", "doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    vocab = per_doc.groupBy("lang", "tok").agg(
        F.count(F.lit(1)).alias("df"), F.sum("n").alias("occ")
    )
    langs = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    kept = (
        (F.col("df") >= _MIN_DF) & (2 * F.col("df") <= F.col("n_docs"))
    ).cast("int")
    return (
        vocab.join(F.broadcast(langs), "lang")
        .select("lang", "df", "occ", kept.alias("kept"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("vocab_total"),
            F.sum("kept").cast("long").alias("vocab_kept"),
            F.sum("occ").cast("long").alias("occ_total"),
            F.sum(F.when(F.col("kept") == 1, F.col("occ")).otherwise(0))
            .cast("long")
            .alias("occ_kept"),
            F.round(
                F.sum(
                    F.when(F.col("kept") == 1, F.col("occ")).otherwise(0)
                ).cast("double")
                / F.sum("occ"),
                6,
            ).alias("coverage"),
        )
    )


x_freq_prune_vocab.__doc__ = x_freq_prune_vocab.__doc__.format(min_df=_MIN_DF)


# ---------------------------------------------------------------------------
# x_embed_outliers — per-label centroid-distance outlier screen
# ---------------------------------------------------------------------------

_EMBED_OUTLIERS_ORACLE = """
WITH flat AS (
    SELECT vec_id, label, generate_subscripts(embedding, 1) AS dim,
           unnest(CAST(embedding AS DOUBLE[])) AS v
    FROM embeddings
), cen AS (
    SELECT label, dim,
           CAST(SUM(CAST(ROUND(v * 10000000) AS BIGINT)) AS DOUBLE)
               / COUNT(*) / 10000000 AS cval
    FROM flat GROUP BY label, dim
), d2 AS (
    SELECT f.vec_id, f.label,
           SUM(CAST((f.v - c.cval) * (f.v - c.cval)
                    AS DECIMAL(18,8))) AS d2
    FROM flat f JOIN cen c ON f.label = c.label AND f.dim = c.dim
    GROUP BY f.vec_id, f.label
), stats AS (
    SELECT label, COUNT(*) AS n_vecs,
           CAST(SUM(d2) AS DOUBLE) / COUNT(*) AS mean_d2
    FROM d2 GROUP BY label
)
SELECT s.label,
       CAST(s.n_vecs AS BIGINT) AS n_vecs,
       CAST(COALESCE(o.n_out, 0) AS BIGINT) AS n_outliers,
       ROUND(s.mean_d2, 6) AS mean_d2
FROM stats s
LEFT JOIN (
    SELECT d.label, COUNT(*) AS n_out
    FROM d2 d JOIN stats st ON d.label = st.label
    WHERE CAST(d.d2 AS DOUBLE) > 2 * st.mean_d2
    GROUP BY d.label
) o ON o.label = s.label
"""

_DEC8 = "decimal(18,8)"


@register("x_embed_outliers", oracle=_EMBED_OUTLIERS_ORACLE)
def x_embed_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding outlier screen: squared L2 distance of every
    vector to its label's exact centroid, flagged when beyond 2× the
    label's mean squared distance — the cheap mislabeled/garbage-vector
    detector run before any contrastive or classifier training round
    (vectors far from their own class centroid are either label noise
    or genuinely hard examples; both deserve a look).

    Scale shape: the centroid build is the ``x_embed_centroids``
    posexplode aggregate (shuffles scalar (label, dim, partial)
    triples), after which the k×d centroid frame is reassembled into
    per-label ordered ARRAYS — bounded metadata — and BROADCAST, so
    the distance pass computes d² row-locally with one ``zip_with``
    fold per vector (the ``_dot`` pattern from the IVF family): no
    n×d explode ever shuffles, and the only remaining exchanges are
    the label-grain stat/outlier aggregates of scalar rows.

    Cross-engine determinism (each piece the proven recipe):
    - centroid means are EXACT per-dim sums of round(val·10⁷) longs
      divided back out (the ``x_kmeans`` construction) — identical
      doubles on both engines regardless of summation order;
    - per-dim squared deviations quantize to DECIMAL(18,8) BEFORE the
      sum (the ``x_psi_drift`` recipe), so the fold (Spark, in array
      order) and the flat SUM (DuckDB, any order) are the same exact
      decimal;
    - the outlier predicate compares identical doubles (d² cast from
      the exact decimal; threshold 2·mean from one exact-sum division).
    """
    em = load(spark, sf_dir, "embeddings")
    flat = em.select(
        "vec_id", "label", F.posexplode("embedding").alias("dim", "v")
    ).select(
        "vec_id", "label", "dim", F.col("v").cast("double").alias("v")
    )
    cen = flat.groupBy("label", "dim").agg(
        (
            F.sum(F.round(F.col("v") * 10_000_000).cast("long")).cast(
                "double"
            )
            / F.count(F.lit(1))
            / 10_000_000
        ).alias("cval")
    )
    cen_arr = cen.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "cval"))),
            lambda s: s["cval"],
        ).alias("cen")
    )
    zero = F.lit("0").cast(_DEC8)
    d2_col = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("cen"),
            lambda x, y: (
                (x.cast("double") - y) * (x.cast("double") - y)
            ).cast(_DEC8),
        ),
        zero,
        lambda acc, t: (acc + t).cast(_DEC8),
    )
    d2 = (
        em.join(F.broadcast(cen_arr), "label")
        .select("vec_id", "label", d2_col.alias("d2"))
        .localCheckpoint(eager=False)
    )
    stats = d2.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        (F.sum("d2").cast("double") / F.count(F.lit(1))).alias("mean_d2"),
    )
    out = (
        d2.join(F.broadcast(stats), "label")
        .where(F.col("d2").cast("double") > 2 * F.col("mean_d2"))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_out"))
    )
    return (
        stats.join(out, "label", "left")
        .select(
            "label",
            F.col("n_vecs").cast("long").alias("n_vecs"),
            F.coalesce(F.col("n_out"), F.lit(0))
            .cast("long")
            .alias("n_outliers"),
            F.round(F.col("mean_d2"), 6).alias("mean_d2"),
        )
    )
