"""Multimodal (image/audio/video) column plumbing (SURVEY.md §7 M5).

Media is carried as an opaque ``binary`` column plus typed metadata —
the parquet-native pattern that scales: bytes stay columnar, predicates
prune on metadata without touching payloads.

Decoding real media needs codec libraries that are NOT in this
environment, so the decode step is STUBBED: ``decode_stub=True`` (default)
derives deterministic fake features from the bytes; ``decode_stub=False``
raises NotImplementedError where a Pillow/ffmpeg call would go. Everything
Spark-side — schema, Arrow batch shape, mapInPandas signature,
partitioning — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("content", BinaryType()),
        StructField("source_uri", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_len", LongType()),
        StructField("content_sha", StringType()),
        StructField("width", IntegerType()),   # NULL for audio
        StructField("height", IntegerType()),  # NULL for audio
        StructField("duration_ms", LongType()),  # NULL for image
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter for the driver tables: wrap documents.text bytes as fake
    media rows so the binary pipeline is exercised on real data."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.encode("text", "UTF-8").alias("content"),
        F.concat(F.lit("synthetic://documents/"), F.col("doc_id")).alias("source_uri"),
    )


def _fake_decode(media_type: str, content: bytes) -> tuple[int | None, int | None, int | None]:
    """Deterministic stand-in for the codec call: width/height/duration
    derived from the content digest."""
    digest = hashlib.sha256(content).digest()
    if media_type == "image":
        return 64 + digest[0] % 192, 64 + digest[1] % 192, None
    if media_type == "audio":
        return None, None, 1000 + int.from_bytes(digest[2:4], "big") % 60_000
    return 64 + digest[0] % 192, 64 + digest[1] % 192, 1000 + int.from_bytes(digest[2:4], "big") % 60_000


def extract_media_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary content (mapInPandas).

    Python IS required here (codec calls); mapInPandas keeps it vectorized
    per Arrow batch and preserves the input partitioning — no shuffle.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": pdf["content"].map(len).astype("int64"),
                    "content_sha": pdf["content"].map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                }
            )
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode needs Pillow/ffmpeg, absent in this "
                    "environment — run with decode_stub=True"
                )
            dims = [
                _fake_decode(t, bytes(c))
                for t, c in zip(pdf["media_type"], pdf["content"])
            ]
            out["width"] = pd.array([d[0] for d in dims], dtype="Int32")
            out["height"] = pd.array([d[1] for d in dims], dtype="Int32")
            out["duration_ms"] = pd.array([d[2] for d in dims], dtype="Int64")
            yield out

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)
