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


def test_resize_preserves_aspect_and_caps_long_side(media):
    from app_insights_generator_spark.operators.multimodal import resize_images

    rows = resize_images(media, max_dim=128).collect()
    for r in rows:
        if r.media_type == "audio":
            assert r.width is None and r.height is None and r.content is None
        else:
            assert max(r.width, r.height) == 128
            assert min(r.width, r.height) >= 1
            assert isinstance(r.content, (bytes, bytearray)) and len(r.content) > 0


def test_resize_is_deterministic(media):
    from app_insights_generator_spark.operators.multimodal import resize_images

    a = {r.media_id: bytes(r.content) for r in resize_images(media, 64).collect() if r.content}
    b = {r.media_id: bytes(r.content) for r in resize_images(media, 64).collect() if r.content}
    assert a == b


def test_frame_sample_counts_match_duration(media):
    import hashlib as hl

    from app_insights_generator_spark.operators.multimodal import (
        _fake_decode,
        sample_frames,
    )

    frames = sample_frames(media, every_ms=10_000, max_frames=32).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r.media_id, []).append(r)
    src = {r.media_id: bytes(r.content) for r in media.collect() if r.media_type == "video"}
    assert set(by_media) == set(src)  # only video rows explode
    for mid, fs in by_media.items():
        _, _, dur = _fake_decode("video", src[mid])
        assert len(fs) == min(dur // 10_000 + 1, 32)
        idxs = sorted(f.frame_idx for f in fs)
        assert idxs == list(range(len(fs)))
        f0 = min(fs, key=lambda f: f.frame_idx)
        assert f0.frame_sha == hl.sha256(src[mid] + (0).to_bytes(4, "big")).hexdigest()


def test_frame_sample_stub_gate_raises(media):
    import pytest as _pytest

    from app_insights_generator_spark.operators.multimodal import sample_frames

    with _pytest.raises(NotImplementedError):
        sample_frames(media, decode_stub=False)


def test_dhash_planted_pairs_and_brightness_invariance(spark):
    """Every odd id is a 1-pixel perturbation of its even sibling: the
    banded hamming join must recover ALL 25 planted pairs. dHash must
    also be invariant to a global brightness shift (gradient SIGNS do
    not change when every pixel moves together without wrapping)."""
    import numpy as np

    from app_insights_generator_spark.operators.codecs import decode_bmp, encode_bmp
    from app_insights_generator_spark.operators.dedup import hamming_band_pairs
    from app_insights_generator_spark.operators.multimodal import (
        image_dhash,
        synthesize_dhash_images,
    )

    from pyspark.sql import functions as F

    ids = spark.range(50).select(F.col("id").alias("media_id"))
    media = synthesize_dhash_images(ids, "media_id")
    hashes = image_dhash(media)
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in hamming_band_pairs(hashes, "media_id", "dhash", 3).collect()
    }
    for k in range(25):
        assert (2 * k, 2 * k + 1) in pairs
        assert pairs[(2 * k, 2 * k + 1)] <= 1

    # brightness shift: add +10 to every pixel of image 0 WITHOUT wrap
    # (clip-free region) -> identical dhash
    content = {r.media_id: bytes(r.content) for r in media.collect()}
    px = decode_bmp(content[0]).astype(np.int32)
    shifted = np.where(px <= 245, px + 10, px).astype("u1")
    two = spark.createDataFrame(
        [(0, "image", content[0]), (1, "image", encode_bmp(shifted))],
        "media_id long, media_type string, content binary",
    )
    h0, h1 = {r.media_id: r.dhash for r in image_dhash(two).collect()}.values()
    # only pixels that hit the 245 clip boundary can flip a bit; on the
    # wrap-gradient fixture most do not — hamming stays tiny vs 64
    assert bin((h0 ^ h1) & ((1 << 64) - 1)).count("1") <= 8


def test_audio_window_profile_exact(spark):
    """Windowed sum-of-squares/peak over a constructed PCM signal with a
    silent window and a clipping window — the curation predicates."""
    import numpy as np

    from app_insights_generator_spark.operators.codecs import encode_wav
    from app_insights_generator_spark.operators.multimodal import audio_window_profile

    s = np.zeros(500, dtype=np.int64)
    s[200:400] = 32767  # clipping in window 1
    s[450:500] = 5  # trailing partial window -> dropped
    wav = encode_wav(s.astype("<i2"))
    media = spark.createDataFrame(
        [(7, "audio", wav)], "media_id long, media_type string, content binary"
    )
    rows = {r.w_idx: r for r in audio_window_profile(media, window=200).collect()}
    assert set(rows) == {0, 1}  # 500 // 200 = 2 full windows
    assert rows[0].ssq == 0 and rows[0].peak == 0  # silence
    assert rows[1].ssq == 200 * 32767 * 32767 and rows[1].peak == 32767


def test_scene_change_energy_flags_exactly_the_planted_cut(spark):
    """Each synthesized video must flag exactly one high-energy frame,
    at the planted cut index 3 + id % 3."""
    from pyspark.sql import functions as F

    from app_insights_generator_spark.operators.multimodal import (
        scene_change_energy,
        synthesize_scene_mp4,
    )

    ids = spark.range(6).select(F.col("id").alias("media_id"))
    rows = scene_change_energy(synthesize_scene_mp4(ids)).collect()
    cuts = {}
    for r in rows:
        if r.energy >= 5000:
            cuts.setdefault(r.media_id, []).append(r.frame_idx)
        else:
            assert r.energy < 2000, r  # within-scene drift stays tiny
    assert cuts == {m: [3 + m % 3] for m in range(6)}
