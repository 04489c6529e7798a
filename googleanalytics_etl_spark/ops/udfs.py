"""§2.I — UDF / UDAF / UDTF surface.

The reference applies arbitrary pandas column transforms after flattening
the API response [REF-UNVERIFIED: SURVEY.md §2.I]. Policy (§7): builtins
> pandas_udf > row-at-a-time UDF. The three registered ops deliberately
compute SQL-expressible semantics so even the Python path is
hash-checked against DuckDB — the interesting part is the execution
plumbing (Arrow batches, grouped-map schema contract), not the math.

Scale note: ``q_udf_scalar`` is the ~100× slow path (per-row pickle
round-trip) and exists for parity; production transforms use the
Arrow-vectorized forms or plain Catalyst expressions.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..io import load
from ..registry import register

_UDF_SCALAR_ORACLE = """
SELECT event_id,
       LOWER(event_type) || ':' || CAST(user_id % 100 AS VARCHAR) AS norm_key
FROM events
"""


@register("q_udf_scalar", oracle=_UDF_SCALAR_ORACLE)
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (parity surface; see module docstring)."""

    @F.udf(T.StringType())
    def normalize(event_type, user_id):
        return f"{event_type.lower()}:{user_id % 100}"

    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id", normalize("event_type", "user_id").alias("norm_key")
    )


_UDF_PANDAS_ORACLE = """
SELECT event_id, ROUND(LN(1.0 + value) * 2.0, 8) AS score
FROM events
"""


@register("q_udf_pandas", oracle=_UDF_PANDAS_ORACLE)
def q_udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized pandas UDF (Series→Series, ~10-100× the scalar
    UDF): whole Arrow batches cross the JVM↔Python boundary."""
    import numpy as np

    @F.pandas_udf(T.DoubleType())
    def score(v: pd.Series) -> pd.Series:
        return np.round(np.log(1.0 + v) * 2.0, 8)

    e = load(spark, sf_dir, "events")
    return e.select("event_id", score("value").alias("score"))


_UDAF_PANDAS_ORACLE = """
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(props->>'$.k' AS INTEGER)) AS BIGINT) AS k_sum,
       CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
       MAX(value) AS max_value
FROM events GROUP BY user_id
"""


@register("q_udaf_pandas", oracle=_UDAF_PANDAS_ORACLE)
def q_udaf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map "UDAF": per-user pandas DataFrame in / one-row out
    (``applyInPandas``). Aggregates chosen exact-in-any-order (integer
    sums, counts, max) so the result hash-matches SQL regardless of the
    arbitrary row order the shuffle delivers per group."""

    def user_stats(pdf: pd.DataFrame) -> pd.DataFrame:
        # NULL/keyless payloads are skipped (dropna) to mirror SQL SUM's
        # null semantics instead of crashing the executor
        k = pdf["props"].str.extract(r'"k":\s*(-?\d+)')[0].dropna().astype("int64")
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "k_sum": [int(k.sum()) if len(k) else None],
                "n_types": [pdf["event_type"].nunique()],
                "max_value": [pdf["value"].max()],
            }
        )

    e = load(spark, sf_dir, "events")
    return e.groupBy("user_id").applyInPandas(
        user_stats,
        schema=(
            "user_id bigint, n_events bigint, k_sum bigint, "
            "n_types bigint, max_value double"
        ),
    )


_UDTF_EXPLODE_ORACLE = """
SELECT doc_id, word, COUNT(*) AS n
FROM (SELECT doc_id, unnest(str_split(text, ' ')) AS word FROM documents)
GROUP BY doc_id, word
"""


@register("q_udtf_explode", oracle=_UDTF_EXPLODE_ORACLE)
def q_udtf_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row→many-rows via ``mapInPandas`` (UDTF-style response-row
    flattening): each document yields one row per distinct word with its
    in-doc frequency — hash-checked against the explode+group SQL."""

    def explode_words(batches):
        for pdf in batches:
            words = pdf["text"].str.split(" ")
            out = pdf[["doc_id"]].join(words.rename("word")).explode("word")
            counts = (
                out.groupby(["doc_id", "word"], sort=False)
                .size()
                .reset_index(name="n")
            )
            yield counts

    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", "text").mapInPandas(
        explode_words, schema="doc_id bigint, word string, n bigint"
    )


_UDTF_PAIRS_ORACLE = """
SELECT event_id, 'k' AS key, CAST(props->>'$.k' AS INTEGER) AS val,
       CAST(props->>'$.k' AS INTEGER) * CAST(props->>'$.k' AS INTEGER) AS val_sq
FROM events
"""


@register("q_udtf_pairs", oracle=_UDTF_PAIRS_ORACLE)
def q_udtf_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True Spark 4 Python UDTF (``@udtf`` + LATERAL join): one payload
    row → one row per JSON key. The oracle is specialized to the
    fixture's single-key payload shape (as q_fn_map)."""
    import json

    from pyspark.sql.functions import udtf

    @udtf(returnType="key string, val int, val_sq int")
    class ExplodeProps:
        def eval(self, props: str):
            if props:
                for k, v in json.loads(props).items():
                    yield k, int(v), int(v) * int(v)

    spark.udtf.register("gae_explode_props", ExplodeProps)
    view = f"__udtf_events_{abs(hash(sf_dir)) % 10**8}"
    load(spark, sf_dir, "events").createOrReplaceTempView(view)
    return spark.sql(
        f"SELECT event_id, t.key, t.val, t.val_sq "
        f"FROM {view}, LATERAL gae_explode_props(props) t"
    )


_COGROUP_ORACLE = """
WITH v AS (
    SELECT user_id, COUNT(*) AS n_views,
           MAX(CAST(ts AS TIMESTAMP)) AS last_view
    FROM events WHERE event_type = 'view' GROUP BY user_id
), p AS (
    SELECT user_id, COUNT(*) AS n_purchases,
           MAX(CAST(ts AS TIMESTAMP)) AS last_purchase
    FROM events WHERE event_type = 'purchase' GROUP BY user_id
)
SELECT COALESCE(v.user_id, p.user_id) AS user_id,
       CAST(COALESCE(v.n_views, 0) AS BIGINT) AS n_views,
       CAST(COALESCE(p.n_purchases, 0) AS BIGINT) AS n_purchases,
       CASE WHEN v.last_view IS NOT NULL AND p.last_purchase IS NOT NULL
                 AND p.last_purchase >= v.last_view
            THEN 'converted_after_view'
            WHEN p.last_purchase IS NOT NULL THEN 'purchase_only_or_stale'
            ELSE 'view_only' END AS funnel_state
FROM v FULL OUTER JOIN p ON v.user_id = p.user_id
"""


@register("q_cogroup_pandas", oracle=_COGROUP_ORACLE)
def q_cogroup_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-grouped map (``groupBy().cogroup().applyInPandas``) — the §2.I
    surface beyond grouped-map: BOTH sides of a key-aligned pair of
    tables arrive as pandas frames per key, for merge logic no SQL join
    expresses naturally (custom per-user reconciliation here: view
    stats × purchase stats → a funnel state).

    Arrow-batched per key group; the logic is deliberately
    SQL-reexpressible so the full-outer-join oracle hash-checks the
    Python path end-to-end (the same honesty contract as q_udf_scalar:
    the API surface is the point, not the arithmetic). At scale cogroup
    shuffles both inputs once on the key — identical movement to the
    equivalent join — and the per-key pandas frames bound memory by the
    key's row count.
    """
    import pandas as pd

    e = load(spark, sf_dir, "events").select(
        "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts")
    )
    views = e.where(F.col("event_type") == "view")
    buys = e.where(F.col("event_type") == "purchase")

    def reconcile(key, v: pd.DataFrame, p: pd.DataFrame) -> pd.DataFrame:
        n_views = len(v)
        n_buys = len(p)
        last_view = v["ts"].max() if n_views else None
        last_buy = p["ts"].max() if n_buys else None
        if last_view is not None and last_buy is not None and last_buy >= last_view:
            state = "converted_after_view"
        elif last_buy is not None:
            state = "purchase_only_or_stale"
        else:
            state = "view_only"
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_views": [n_views],
                "n_purchases": [n_buys],
                "funnel_state": [state],
            }
        )

    return (
        views.groupBy("user_id")
        .cogroup(buys.groupBy("user_id"))
        .applyInPandas(
            reconcile,
            "user_id bigint, n_views bigint, n_purchases bigint, "
            "funnel_state string",
        )
    )


_ARROW_MAP_ORACLE = """
SELECT event_id,
       CAST(ROUND(value * 100) AS BIGINT) AS cents,
       length(event_type) AS type_len
FROM events
WHERE value IS NOT NULL
"""


@register("q_arrow_map", oracle=_ARROW_MAP_ORACLE)
def q_arrow_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow``: the lowest-overhead Python boundary — raw
    ``pyarrow.RecordBatch`` in/out, no pandas materialization at all
    (no index building, no object-dtype boxing for strings). Completes
    the Python-surface matrix: scalar UDF, pandas UDF, grouped /
    co-grouped map, mapInPandas, UDTF, and now Arrow-native batches.
    The transform is deliberately trivial (exact cents + a string
    length via ``pyarrow.compute``) so the oracle pins the BOUNDARY —
    types crossing Arrow unharmed — rather than the math.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def per_batch(batches):
        for batch in batches:
            value = batch.column("value")
            keep = pc.is_valid(value)
            cents = pc.cast(pc.round(pc.multiply(value, 100.0)), pa.int64())
            out = pa.RecordBatch.from_arrays(
                [
                    batch.column("event_id"),
                    cents,
                    pc.cast(
                        pc.utf8_length(batch.column("event_type")), pa.int64()
                    ),
                ],
                ["event_id", "cents", "type_len"],
            )
            yield out.filter(keep)

    e = load(spark, sf_dir, "events").select("event_id", "value", "event_type")
    return e.mapInArrow(
        per_batch, "event_id bigint, cents bigint, type_len bigint"
    )
