"""Multimodal binary-column plumbing (operators/multimodal.py): schema,
mapInPandas batch shape, stub gating."""

import hashlib

import pytest

from app_insights_generator_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    documents_as_media,
    extract_media_features,
)
from app_insights_generator_spark.sources import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return documents_as_media(load_table(spark, sf_dir, "documents")).cache()


def test_media_schema_and_types(media):
    rows = media.limit(5).collect()
    assert {r.media_type for r in media.select("media_type").distinct().collect()} == {
        "image",
        "audio",
        "video",
    }
    assert all(isinstance(r.content, (bytes, bytearray)) for r in rows)


def test_feature_extraction(spark, media):
    feats = extract_media_features(media)
    assert feats.schema == FEATURE_SCHEMA
    rows = feats.collect()
    assert len(rows) == media.count()
    by_id = {r.media_id: r for r in rows}
    src = {r.media_id: bytes(r.content) for r in media.collect()}
    for mid, r in list(by_id.items())[:20]:
        assert r.byte_len == len(src[mid])
        assert r.content_sha == hashlib.sha256(src[mid]).hexdigest()
        if r.media_type == "image":
            assert r.width is not None and r.duration_ms is None
        elif r.media_type == "audio":
            assert r.width is None and r.duration_ms is not None
        else:
            assert r.width is not None and r.duration_ms is not None


def test_stub_gate_raises(spark, media):
    import pyspark.errors

    with pytest.raises(pyspark.errors.PySparkException):
        extract_media_features(media, decode_stub=False).collect()
