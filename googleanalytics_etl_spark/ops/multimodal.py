"""Multimodal columns (north star, BASELINE.json:6).

Media (image/audio/video) is modeled as an opaque ``BINARY`` column plus
typed metadata — the pattern that scales: payload bytes never pass
through Python except inside Arrow batches, metadata stays in Catalyst.

The container has no image/audio codecs, so the actual decode is STUBBED
(``decode_media`` raises ``NotImplementedError``; the registered query
uses a deterministic byte-level feature extractor instead). Everything
Spark-side is real and tested: the binary schema, the ``mapInPandas``
batch contract (iterator of pandas DataFrames, Arrow-transferred), the
frame-sampling row expansion, and the partitioning story.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import register


def decode_media(payload: bytes, media_type: str):
    """Decode a media payload to (width, height, mode) / sample stats.

    Import-gated, not hard-stubbed: if a real codec is importable the
    decode actually runs (images via PIL, audio via soundfile), so a
    deployment that ships codecs gets real decode with no code change —
    tests/test_env_gates.py probes this and un-skips automatically. In
    this sandbox neither library exists, so the call raises the
    documented ``NotImplementedError`` contract. The Spark-side plumbing
    around this call (binary column, Arrow batches, schema contract) is
    real either way.
    """
    if media_type.startswith("image/"):
        try:
            from PIL import Image  # noqa: PLC0415
        except ImportError:
            raise NotImplementedError(
                f"no codec available for {media_type!r} in this environment"
            ) from None
        import io

        with Image.open(io.BytesIO(payload)) as img:
            return (img.width, img.height, img.mode)
    if media_type.startswith("audio/"):
        try:
            import soundfile  # noqa: PLC0415
        except ImportError:
            raise NotImplementedError(
                f"no codec available for {media_type!r} in this environment"
            ) from None
        import io

        data, rate = soundfile.read(io.BytesIO(payload))
        return (int(data.shape[0]), rate)
    raise NotImplementedError(
        f"no codec available for {media_type!r} in this environment"
    )


def media_table(documents: DataFrame) -> DataFrame:
    """Model ``documents`` as a media table: opaque binary + metadata.

    (The fixture has no true binaries, so text bytes stand in — the
    schema and plan shape are what matter: BINARY payload, STRING type
    tag, BIGINT size, all prunable without touching the payload.)
    """
    media = F.encode(F.col("text"), "UTF-8")
    return documents.select(
        "doc_id",
        media.alias("media"),
        F.lit("text/plain").alias("media_type"),
        # length() on BINARY counts bytes (≠ chars for non-ASCII text)
        F.length(media).cast("long").alias("n_bytes"),
        F.struct(
            F.col("lang").alias("lang"), F.col("source").alias("source")
        ).alias("meta"),
    )


_MULTIMODAL_ORACLE = """
SELECT doc_id,
       'text/plain' AS media_type,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CASE WHEN LENGTH(text) > 0 THEN ascii(text) END AS first_byte,
       CAST(NULL AS INTEGER) AS decoded_width
FROM documents
"""


@register("x_multimodal", oracle=_MULTIMODAL_ORACLE)
def x_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level feature extraction over binary media via ``mapInPandas``.

    Batches of (doc_id, media) cross to Python as Arrow; features are
    computed on raw bytes (size, first byte). ``decoded_width`` is NULL —
    the decode stage is the documented stub. The oracle recomputes the
    byte features in SQL (the fixture payloads are ASCII text).
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            media = pdf["media"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": media.map(len).astype("int64"),
                    # nullable Int32: astype("int32") on an object series
                    # holding None raises for empty payloads
                    "first_byte": pd.array(
                        [b[0] if len(b) else None for b in media],
                        dtype="Int32",
                    ),
                    "decoded_width": pd.array(
                        [None] * len(pdf), dtype="Int32"  # decode stub
                    ),
                }
            )

    m = media_table(load(spark, sf_dir, "documents"))
    return m.mapInPandas(
        extract,
        schema=(
            "doc_id bigint, media_type string, n_bytes bigint, "
            "first_byte int, decoded_width int"
        ),
    )


_MEDIA_FRAMES_ORACLE = """
SELECT doc_id,
       CAST(i AS INT) AS frame_idx,
       CAST(LEAST(100, LENGTH(text) - i * 100) AS INT) AS frame_len
FROM documents,
     LATERAL (SELECT unnest(range(CAST(ceil(LENGTH(text) / 100.0) AS BIGINT)))
              AS i)
"""


@register("x_media_frames", oracle=_MEDIA_FRAMES_ORACLE)
def x_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: one media row → N fixed-size chunk rows (the video
    frame-extraction shape), via mapInPandas row expansion."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunk = 100
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "frame_len": []}
            for doc_id, media in zip(pdf["doc_id"], pdf["media"]):
                n = len(media)
                for i in range((n + chunk - 1) // chunk):
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["frame_len"].append(min(chunk, n - i * chunk))
            yield pd.DataFrame(rows)

    m = media_table(load(spark, sf_dir, "documents"))
    return m.select("doc_id", "media").mapInPandas(
        frames, schema="doc_id bigint, frame_idx int, frame_len int"
    )
