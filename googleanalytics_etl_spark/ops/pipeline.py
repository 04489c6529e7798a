"""Training-data pipeline operators (north star, BASELINE.json:6).

The operations a large-scale LLM-corpus pipeline needs beyond dedup and
similarity (those live in ``extensions.py``): deterministic sampling,
stratified sampling, document chunking, sequence packing, PII scrubbing,
and corpus sharding/shuffling. All over the ``documents`` fixture; every
one carries a full DuckDB hash oracle.

Scale design:

- **Sampling is hash-based, never ``rand()``** — ``md5(key)`` prefix
  thresholding gives a deterministic, reproducible, cluster-independent
  sample that needs no shuffle and survives re-runs/retries (a ``rand()``
  sample changes under task retry at 100 TB; a hash sample cannot).
- **Chunking/scrubbing are narrow** (per-row generate/map) — no shuffle,
  whole-stage codegen, scale linearly with executors.
- **Packing and sharding are partition-parallel**: the only windows run
  per ``source`` / per ``shard``, so no global single-partition sort
  bottleneck exists at scale (the classic distributed-packing
  compromise: greedy-within-partition, not global-greedy).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------


def key_hash(col: Column) -> Column:
    """Deterministic per-row hash usable cross-engine: md5 of the key's
    decimal string. Lowercase hex in both Spark and DuckDB, so string
    comparisons and prefix thresholds agree bit-for-bit."""
    return F.md5(col.cast("string").cast("binary"))


def _sql_key_hash(expr: str) -> str:
    return f"md5(CAST({expr} AS VARCHAR))"


def _hexval(c: Column) -> Column:
    """Value of one lowercase hex digit char (portable: ascii + CASE)."""
    a = F.ascii(c)
    return a - F.when(a >= 97, F.lit(87)).otherwise(F.lit(48))


_SQL_HEXVAL = "(ascii({c}) - CASE WHEN ascii({c}) >= 97 THEN 87 ELSE 48 END)"


# ---------------------------------------------------------------------------
# deterministic sampling
# ---------------------------------------------------------------------------

_SAMPLE_HASH_ORACLE = """
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a'
"""


@register("x_sample_hash", oracle=_SAMPLE_HASH_ORACLE)
def x_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% Bernoulli sample via md5-prefix thresholding.

    ``md5(doc_id) < '1a'`` keeps 26/256 ≈ 10.2% of rows. Unlike
    ``df.sample()`` (rand()-seeded per task, unstable under retries and
    repartitioning), the hash sample is a pure row-local predicate:
    reproducible anywhere, no shuffle, pushes past column pruning, and
    composable (disjoint prefix ranges give disjoint train/val/test
    splits of exact expected proportions).
    """
    d = load(spark, sf_dir, "documents")
    return d.where(key_hash(F.col("doc_id")).substr(1, 2) < "1a").select(
        "doc_id", "lang", "source", "n_chars"
    )


_STRATIFIED_ORACLE = f"""
SELECT doc_id, lang, CAST(rn AS BIGINT) AS strat_rank
FROM (
    SELECT doc_id, lang,
           ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY {_sql_key_hash("doc_id")}, doc_id) AS rn
    FROM documents
)
WHERE rn <= 20
"""


@register("x_stratified_sample", oracle=_STRATIFIED_ORACLE)
def x_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sample: exactly 20 docs per ``lang`` stratum,
    hash-ordered so the pick is deterministic and unbiased.

    One shuffle on the stratum key; rank-within-stratum over the md5
    order is equivalent to a seeded uniform draw without replacement.
    At 100 TB the stratum cardinality (languages) is tiny, so the
    shuffle is cheap; skewed strata (en ≫ zh) cost only rank truncation,
    not memory — row_number streams, never materializes the stratum.
    """
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(key_hash(F.col("doc_id")), "doc_id")
    return (
        d.select("doc_id", "lang")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 20)
        .select("doc_id", "lang", F.col("rn").cast("long").alias("strat_rank"))
    )


# ---------------------------------------------------------------------------
# chunking / packing
# ---------------------------------------------------------------------------

_CHUNK_SIZE = 200
_CHUNK_STRIDE = 150  # 50-char overlap between consecutive chunks


def chunk_array(len_col: Column) -> Column:
    """Array of chunk substrings of ``text`` for a doc of length
    ``len_col`` — the one shared chunking expression (stride/size
    semantics live here only).

    Empty docs chunk to an empty array: Spark's two-arg ``sequence(0,
    -1)`` counts *down* (yielding [0, -1], not []), so the n_chunks=0
    case must be guarded explicitly to agree with SQL ``range(0)``.
    """
    n_chunks = F.ceil(len_col / float(_CHUNK_STRIDE)).cast("int")
    grams = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.col("text").substr(i * _CHUNK_STRIDE + 1, F.lit(_CHUNK_SIZE)),
    )
    return F.when(n_chunks > 0, grams).otherwise(
        F.array().cast("array<string>")
    )

_CHUNK_ORACLE = f"""
SELECT doc_id,
       CAST(i AS INT) AS chunk_idx,
       substr(text, CAST(i * {_CHUNK_STRIDE} + 1 AS BIGINT), {_CHUNK_SIZE})
           AS chunk,
       CAST(length(substr(text, CAST(i * {_CHUNK_STRIDE} + 1 AS BIGINT),
                          {_CHUNK_SIZE})) AS BIGINT) AS chunk_len
FROM documents,
     LATERAL (SELECT unnest(range(CAST(ceil(n_chars / {_CHUNK_STRIDE}.0)
                                       AS BIGINT))) AS i)
"""


@register("x_chunk_docs", oracle=_CHUNK_ORACLE)
def x_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking: 200-char windows, stride 150.

    The context-window preparation shape: one doc → ceil(n_chars/150)
    overlapping chunks. Pure generate (sequence → transform → posexplode)
    — array lambdas stay JVM-side, no shuffle, no Python. ``n_chars ==
    length(text)`` exactly (FIXTURES.md, verified), so the chunk count
    derives from the metadata column without touching the payload until
    the substring executes.
    """
    d = load(spark, sf_dir, "documents")
    # n_chars == length(text) exactly (FIXTURES.md) — chunk count derives
    # from metadata without touching the payload
    chunks = chunk_array(F.col("n_chars"))
    return d.select(
        "doc_id", F.posexplode(chunks).alias("chunk_idx", "chunk")
    ).select(
        "doc_id",
        "chunk_idx",
        "chunk",
        F.length("chunk").cast("long").alias("chunk_len"),
    )


_PACK_BUDGET = 512  # tokens per packed sequence

_PACK_ORACLE = f"""
SELECT source,
       CAST(FLOOR(cum_before / {_PACK_BUDGET}) AS BIGINT) AS pack_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
FROM (
    SELECT source, n_tokens,
           COALESCE(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
    FROM (
        SELECT source, doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    )
)
GROUP BY source, pack_id
"""


@register("x_pack_sequences", oracle=_PACK_ORACLE)
def x_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: concatenate docs (in doc_id order, per source)
    into ~512-token training sequences; report per-pack stats.

    ``pack_id = floor(running_tokens_before / budget)`` — the standard
    deterministic first-fit-in-order packing. Partitioned by ``source``
    so the running sum never needs a global single-partition window:
    each partition packs independently (exactly how a 1000-executor
    packing job must run — global greedy packing is inherently serial).
    """
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = toks.withColumn(
        "cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    ).withColumn(
        "pack_id",
        F.floor(F.col("cum_before") / _PACK_BUDGET).cast("long"),
    )
    return packed.groupBy("source", "pack_id").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("pack_tokens"),
    )


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
_PHONE_RE = "[0-9]{3}-[0-9]{4,}"

# The fixture texts are digit-free synthetic words (verified), so both
# sides first PLANT deterministic PII derived from doc_id, then scrub it
# — making the oracle a real differential test of the regex pipeline.
_PII_ORACLE = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(planted, '{_EMAIL_RE}')) AS BIGINT)
           AS n_emails,
       CAST(length(scrubbed) AS BIGINT) AS scrubbed_len,
       md5(scrubbed) AS scrubbed_hash
FROM (
    SELECT doc_id, planted,
           regexp_replace(
               regexp_replace(planted, '{_EMAIL_RE}', '<EMAIL>', 'g'),
               '{_PHONE_RE}', '<PHONE>', 'g') AS scrubbed
    FROM (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@mail.example call 555-01'
                    || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
                   AS planted
        FROM documents
    )
)
"""


@register("x_pii_scrub", oracle=_PII_ORACLE)
def x_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: redact emails and phone-shaped tokens via
    ``regexp_replace``; count redactions.

    Pure per-row map — JVM regex inside whole-stage codegen, no UDF, no
    shuffle; at 100 TB this runs at scan speed. (DuckDB's
    ``regexp_replace`` is first-match-only by default — the oracle passes
    the ``'g'`` flag to match Spark's replace-all semantics.)
    """
    d = load(spark, sf_dir, "documents")
    planted = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example call 555-01"),
            F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
        ).alias("planted"),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("planted"), _EMAIL_RE, "<EMAIL>"),
        _PHONE_RE,
        "<PHONE>",
    )
    return planted.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("planted"), F.lit(_EMAIL_RE), 0))
        .cast("long")
        .alias("n_emails"),
        F.length(scrubbed).cast("long").alias("scrubbed_len"),
        F.md5(scrubbed.cast("binary")).alias("scrubbed_hash"),
    )


# ---------------------------------------------------------------------------
# corpus sharding (deterministic global shuffle)
# ---------------------------------------------------------------------------

_N_SHARDS = 8

_SHARD_ORACLE = f"""
SELECT doc_id, shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, doc_id)
            AS BIGINT) AS pos
FROM (
    SELECT doc_id, h,
           CAST(({_SQL_HEXVAL.format(c="substr(h, 1, 1)")} * 16
                 + {_SQL_HEXVAL.format(c="substr(h, 2, 1)")})
                % {_N_SHARDS} AS INT) AS shard
    FROM (SELECT doc_id, {_sql_key_hash("doc_id")} AS h FROM documents)
)
"""


@register("x_corpus_shard", oracle=_SHARD_ORACLE)
def x_corpus_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus shuffle + sharding: every doc gets a shard
    (md5 byte % 8) and a position within its shard (md5 order).

    The pre-training global-shuffle shape, done scale-correctly: there
    is NO global row_number (a single-partition sort at 100 TB) — docs
    hash into shards, and ordering is established only within each
    shard, so the plan is one shuffle on ``shard`` with a per-partition
    sort. Shard count scales with the cluster (8 here; thousands in
    production), and the md5 ordering makes the "shuffle" reproducible
    across runs and engines.
    """
    d = load(spark, sf_dir, "documents")
    h = key_hash(F.col("doc_id"))
    with_shard = d.select("doc_id", h.alias("h")).withColumn(
        "shard",
        (
            (_hexval(F.substring("h", 1, 1)) * 16 + _hexval(F.substring("h", 2, 1)))
            % _N_SHARDS
        ).cast("int"),
    )
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return with_shard.select(
        "doc_id",
        "shard",
        F.row_number().over(w).cast("long").alias("pos"),
    )


# ---------------------------------------------------------------------------
# composed corpus-prep flagship
# ---------------------------------------------------------------------------

_PREP_QUALITY_MIN = 0.12  # keeps ~75% of fixture docs (median quality ~0.17)

_CORPUS_PREP_ORACLE = f"""
WITH incoming AS (
    SELECT doc_id, source, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000, source, text
    FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 20)
),
scored AS (
    SELECT doc_id, source, text,
           ROUND(LEAST(CAST(len(str_split(text, ' ')) AS BIGINT) / 200.0, 1.0)
                     * 0.5
                 + CAST(len(list_intersect(list_distinct(str_split(text, ' ')),
                            ['the','a','of','and','to'])) AS DOUBLE)
                     / len(list_distinct(str_split(text, ' '))) * 0.5,
                 6) AS quality
    FROM incoming
),
kept AS (
    SELECT * FROM scored WHERE quality >= {_PREP_QUALITY_MIN}
),
dedup AS (
    SELECT doc_id, source, text
    FROM (SELECT *,
                 ROW_NUMBER() OVER (PARTITION BY md5(LOWER(TRIM(text)))
                                    ORDER BY doc_id) AS rn
          FROM kept)
    WHERE rn = 1
),
chunks AS (
    SELECT source,
           length(substr(text, CAST(i * {_CHUNK_STRIDE} + 1 AS BIGINT),
                         {_CHUNK_SIZE})) AS chunk_len
    FROM dedup,
         LATERAL (SELECT unnest(range(CAST(ceil(length(text)
                      / {_CHUNK_STRIDE}.0) AS BIGINT))) AS i)
)
SELECT source,
       CAST((SELECT COUNT(*) FROM dedup d WHERE d.source = chunks.source)
            AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(chunk_len) AS BIGINT) AS chunk_chars
FROM chunks
GROUP BY source
"""


@register("x_corpus_prep", oracle=_CORPUS_PREP_ORACLE)
def x_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed corpus-prep flagship: quality filter → exact dedup →
    chunking → per-source summary — the training-data counterpart of
    q_flagship, exercising the whole pipeline family in ONE Catalyst DAG.

    Plan shape at scale: the score+filter is narrow (runs inside the
    scan stage), dedup is one digest-keyed hash aggregate (min_by — the
    only shuffle of the heavy path), chunking explodes the survivors
    without shuffling, and the final rollup is a partial+final hash
    aggregate on the tiny source key space.

    A duplicated 20-doc tail is unioned in first (exact duplicates do
    not exist below sf0.1 — FIXTURES.md), so the dedup stage is
    differentially exercised with real duplicate groups at the oracle's
    sf0.01, not just on duplicate-free input.
    """
    base = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    d = base.unionByName(
        base.orderBy("doc_id")
        .limit(20)
        .withColumn("doc_id", F.col("doc_id") + 1_000_000)
    )
    words = F.split(F.col("text"), " ")
    uniq = F.array_distinct(words)
    stop_ratio = (
        F.size(
            F.array_intersect(uniq, F.array(*[F.lit(w) for w in
                                              ("the", "a", "of", "and", "to")]))
        ).cast("double")
        / F.size(uniq)
    )
    quality = F.round(
        F.least(F.size(words).cast("long") / 200.0, F.lit(1.0)) * 0.5
        + stop_ratio * 0.5,
        6,
    )
    kept = d.select("doc_id", "source", "text", quality.alias("quality")).where(
        F.col("quality") >= _PREP_QUALITY_MIN
    )
    survivors = (
        kept.select(
            F.md5(F.lower(F.trim(F.col("text"))).cast("binary")).alias("digest"),
            "doc_id",
            "source",
            "text",
        )
        .groupBy("digest")
        .agg(F.min_by(F.struct("doc_id", "source", "text"), F.col("doc_id")).alias("r"))
        .select("r.source", "r.text")
    )
    chunk_lens = F.transform(chunk_array(F.length("text")), F.length)
    per_doc = survivors.select(
        "source",
        F.size(chunk_lens).cast("long").alias("doc_chunks"),
        F.aggregate(
            chunk_lens, F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("doc_chunk_chars"),
    )
    return per_doc.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("doc_chunks").cast("long").alias("n_chunks"),
        F.sum("doc_chunk_chars").cast("long").alias("chunk_chars"),
    )
