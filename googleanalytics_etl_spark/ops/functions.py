"""§2.G — scalar function families (string / date / math / hash / JSON /
array / map).

The reference's transform step parses page paths and UTM params, derives
timestamps from ``ga:dateHourMinute`` + a milliseconds custom dimension,
hashes a synthetic hit id, and unpacks custom-dimension payloads
[REF-UNVERIFIED: SURVEY.md §2.G]. Each family below is one registered
query exercising the representative functions, all JVM-side builtins
(whole-stage codegen; zero Python in the row path).

Cross-engine notes baked in from SURVEY.md §7 (6): DuckDB EXTRACT returns
BIGINT (cast both sides), ceil(double) stays DOUBLE in DuckDB vs BIGINT
in Spark (cast), ``ln`` may differ in the last ulp across libm
implementations (round 8), day-of-week numbering differs (use dayname
strings instead), and only md5/sha256 are cross-engine hashes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

_FN_STRING_ORACLE = """
SELECT c_custkey,
       LOWER(c_name) AS name_lower,
       UPPER(c_mktsegment) AS seg_upper,
       SUBSTRING(c_name, 1, 8) AS name_prefix,
       regexp_extract(c_name, '([0-9]+)', 1) AS cust_digits,
       str_split(c_name, '#')[2] AS name_after_hash,
       concat_ws('|', c_mktsegment, c_name) AS seg_name,
       CAST(LENGTH(c_name) AS INT) AS name_len,
       c_mktsegment LIKE 'FURN%' AS is_furniture,
       TRIM(CONCAT('  ', c_name, '  ')) AS name_trimmed,
       REPLACE(c_name, 'Customer', 'Client') AS name_replaced
FROM customer
"""


@register("q_fn_string", oracle=_FN_STRING_ORACLE)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: case/trim/substring/regexp/split/concat/like/replace
    (pagePath & UTM parsing surface)."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("name_lower"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("cust_digits"),
        F.element_at(F.split("c_name", "#"), 2).alias("name_after_hash"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("seg_name"),
        F.length("c_name").cast("int").alias("name_len"),
        F.col("c_mktsegment").like("FURN%").alias("is_furniture"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias(
            "name_trimmed"
        ),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Client")).alias(
            "name_replaced"
        ),
    )


_FN_DATE_ORACLE = """
SELECT event_id,
       CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day_ts,
       CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS hour_ts,
       CAST(EXTRACT(hour FROM ts) AS INT) AS hr,
       CAST(EXTRACT(day FROM ts) AS INT) AS dom,
       CAST(EXTRACT(month FROM ts) AS INT) AS mon,
       CAST(EXTRACT(year FROM ts) AS INT) AS yr,
       dayname(CAST(ts AS TIMESTAMP)) AS day_name,
       CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INT)
           AS days_since_start,
       CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS BIGINT) AS unix_sec,
       CAST(ts AS TIMESTAMP) + INTERVAL 1 DAY AS ts_plus_day,
       strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_str
FROM events
"""


@register("q_fn_date", oracle=_FN_DATE_ORACLE)
def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: trunc/extract/dayname/diff/epoch/arithmetic/format
    (the ga:dateHourMinute → timestamp derivation surface)."""
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.date_trunc("day", "ts").alias("day_ts"),
        F.date_trunc("hour", "ts").alias("hour_ts"),
        F.hour("ts").cast("int").alias("hr"),
        F.dayofmonth("ts").cast("int").alias("dom"),
        F.month("ts").cast("int").alias("mon"),
        F.year("ts").cast("int").alias("yr"),
        F.date_format("ts", "EEEE").alias("day_name"),
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("int")
        .alias("days_since_start"),
        F.expr("unix_micros(cast(ts as timestamp)) div 1000000")
        .cast("long")
        .alias("unix_sec"),
        (F.col("ts") + F.expr("INTERVAL 1 DAY")).alias("ts_plus_day"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
    )


_FN_MATH_ORACLE = """
SELECT l_orderkey, l_linenumber,
       ROUND(l_extendedprice, 1) AS price_rounded,
       ABS(l_discount - 0.05) AS disc_dev,
       CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil,
       CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
       ROUND(LN(l_extendedprice), 8) AS price_ln,
       POW(l_quantity, 2) AS qty_sq,
       SQRT(l_extendedprice) AS price_sqrt,
       CASE WHEN l_discount = 0 THEN NULL
            ELSE l_extendedprice / l_discount END AS price_per_disc,
       l_orderkey % 7 AS key_mod
FROM lineitem
"""


@register("q_fn_math", oracle=_FN_MATH_ORACLE)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family: round/abs/ceil/floor/ln/pow/sqrt/safe-divide/mod."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_rounded"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_quantity").cast("long").alias("qty_ceil"),
        F.floor("l_quantity").cast("long").alias("qty_floor"),
        F.round(F.log("l_extendedprice"), 8).alias("price_ln"),
        F.pow("l_quantity", F.lit(2)).alias("qty_sq"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        F.try_divide("l_extendedprice", F.nullif(F.col("l_discount"), F.lit(0.0)))
        .alias("price_per_disc"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
    )


_FN_HASH_ORACLE = """
SELECT event_id,
       sha256(concat_ws('|', CAST(user_id AS VARCHAR), event_type))
           AS hit_id_sha,
       md5(concat_ws('|', CAST(user_id AS VARCHAR), event_type)) AS hit_id_md5,
       CAST(LENGTH(sha256(event_type)) AS INT) AS sha_len
FROM events
"""


@register("q_fn_hash", oracle=_FN_HASH_ORACLE)
def q_fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash family: the synthetic hit-id derivation (sha256/md5 are the
    cross-engine-stable hashes; xxhash64 is Spark-internal — used in
    x_dedup_near where no oracle is needed)."""
    e = load(spark, sf_dir, "events")
    keyed = F.concat_ws("|", F.col("user_id").cast("string"), F.col("event_type"))
    return e.select(
        "event_id",
        F.sha2(keyed, 256).alias("hit_id_sha"),
        F.md5(keyed).alias("hit_id_md5"),
        F.length(F.sha2(F.col("event_type"), 256)).cast("int").alias("sha_len"),
    )


_FN_JSON_ORACLE = """
SELECT event_id,
       CAST(props->>'$.k' AS INTEGER) AS k,
       props->>'$.k' AS k_str,
       CAST(props->>'$.k' AS INTEGER) IS NOT NULL AS has_k,
       CAST(props->>'$.k' AS INTEGER) % 10 AS k_bucket
FROM events
"""


@register("q_fn_json", oracle=_FN_JSON_ORACLE)
def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family: custom-dimension payload unpacking (get_json_object)."""
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.select(
        "event_id",
        k.alias("k"),
        F.get_json_object("props", "$.k").alias("k_str"),
        k.isNotNull().alias("has_k"),
        (k % 10).alias("k_bucket"),
    )


_FN_ARRAY_ORACLE = """
SELECT vec_id,
       CAST(len(embedding) AS INT) AS dim,
       embedding[1] AS e1,
       ROUND(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS norm_sq,
       CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos
FROM embeddings
"""


@register("q_fn_array", oracle=_FN_ARRAY_ORACLE)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family: size / element / lambda transform-filter-aggregate
    over the embedding column (the similarity-search primitive)."""
    em = load(spark, sf_dir, "embeddings")
    norm_sq = F.aggregate(
        F.transform(
            "embedding", lambda x: x.cast("double") * x.cast("double")
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return em.select(
        "vec_id",
        F.size("embedding").cast("int").alias("dim"),
        F.element_at("embedding", 1).alias("e1"),
        F.round(norm_sq, 4).alias("norm_sq"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("int").alias("n_pos"),
    )


_FN_MAP_ORACLE = """
SELECT event_id, 'k' AS key, CAST(props->>'$.k' AS INTEGER) AS val
FROM events
"""


@register("q_fn_map", oracle=_FN_MAP_ORACLE)
def q_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family: parse JSON payload to MAP<STRING,INT> and explode to
    key/value rows (the custom-dimension key-value model). The oracle SQL
    is specialized to the fixture's single-key payload shape."""
    e = load(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return e.select("event_id", F.explode(m).alias("key", "val"))


_FN_VARIANT_ORACLE = """
SELECT event_id,
       CAST(props->>'$.k' AS INTEGER) AS k,
       CAST(props->>'$.k' AS INTEGER) * 2 AS k2
FROM events
"""


@register("q_fn_variant", oracle=_FN_VARIANT_ORACLE)
def q_fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT path for semi-structured payloads: ``parse_json``
    once, then typed ``variant_get`` extraction — the shredded-at-scale
    alternative to per-field ``get_json_object`` string re-parsing."""
    e = load(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.try_variant_get(v, "$.k", "int")
    return e.select("event_id", k.alias("k"), (k * 2).alias("k2"))


# A deterministic synthetic page URL per event (the fixture has no URL
# column; the reference's pagePath + UTM parsing is exercised on it).
_URL_EXPR = (
    "concat('https://shop.example.com/', event_type, '/p', "
    "CAST(user_id AS {str_t}), '?utm_source=src', "
    "CAST(user_id % 5 AS {str_t}), '&utm_medium=cpc&k=', "
    "CAST(event_id % 97 AS {str_t}))"
)

_FN_URL_ORACLE = f"""
WITH u AS (
    SELECT event_id,
           {_URL_EXPR.format(str_t="VARCHAR")} AS url
    FROM events
)
SELECT event_id, url,
       regexp_extract(url, '^https?://([^/]+)', 1) AS host,
       regexp_extract(url, '^https?://[^/]+(/[^?]*)', 1) AS path,
       regexp_extract(url, '[?&]utm_source=([^&]*)', 1) AS utm_source,
       regexp_extract(url, '[?&]utm_medium=([^&]*)', 1) AS utm_medium,
       CAST(regexp_extract(url, '[?&]k=([^&]*)', 1) AS INTEGER) AS k_param
FROM u
"""


@register("q_fn_url", oracle=_FN_URL_ORACLE)
def q_fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL family — THE reference transform: pagePath and UTM-parameter
    extraction from page URLs [REF-UNVERIFIED: SURVEY.md §2.G "pagePath
    & UTM parsing"]. Identical regexp semantics on both engines (Spark
    ``parse_url`` has no DuckDB twin, so the portable form is regexes;
    parse_url remains available for Spark-only pipelines)."""
    e = load(spark, sf_dir, "events")
    url = F.expr(_URL_EXPR.format(str_t="STRING"))
    out = e.select("event_id", url.alias("url"))
    return out.select(
        "event_id",
        "url",
        F.regexp_extract("url", "^https?://([^/]+)", 1).alias("host"),
        F.regexp_extract("url", "^https?://[^/]+(/[^?]*)", 1).alias("path"),
        F.regexp_extract("url", "[?&]utm_source=([^&]*)", 1).alias("utm_source"),
        F.regexp_extract("url", "[?&]utm_medium=([^&]*)", 1).alias("utm_medium"),
        F.regexp_extract("url", "[?&]k=([^&]*)", 1).cast("int").alias("k_param"),
    )


_FN_BITWISE_ORACLE = """
SELECT event_id,
       CAST(flags & 240 AS BIGINT) AS masked,
       CAST(flags | 15 AS BIGINT) AS set_low,
       CAST(xor(flags, 170) AS BIGINT) AS toggled,
       CAST(bit_count(flags) AS INT) AS popcnt,
       CAST(flags << 2 AS BIGINT) AS shl,
       CAST(flags >> 3 AS BIGINT) AS shr
FROM (SELECT event_id, event_id % 256 AS flags FROM events)
"""


@register("q_fn_bitwise", oracle=_FN_BITWISE_ORACLE)
def q_fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise function family (flag fields, feature masks): AND/OR/XOR,
    popcount, shifts — all codegen'd JVM expressions."""
    e = load(spark, sf_dir, "events")
    flags = (F.col("event_id") % 256).alias("flags")
    f = F.col("flags")
    return e.select("event_id", flags).select(
        "event_id",
        f.bitwiseAND(F.lit(240)).cast("long").alias("masked"),
        f.bitwiseOR(F.lit(15)).cast("long").alias("set_low"),
        f.bitwiseXOR(F.lit(170)).cast("long").alias("toggled"),
        F.bit_count(f).cast("int").alias("popcnt"),
        F.shiftleft(f, 2).cast("long").alias("shl"),
        F.shiftright(f, 3).cast("long").alias("shr"),
    )
