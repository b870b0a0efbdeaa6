"""Pure-numpy WAV/BMP codecs: byte-exact round-trips, padding, and
malformed-input rejection (the real decode path under the multimodal
operators)."""

from __future__ import annotations

import numpy as np
import pytest

from app_insights_generator_spark.operators.codecs import (
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
)


def test_wav_roundtrip_exact():
    rng = np.random.default_rng(7)
    samples = rng.integers(-32768, 32767, size=4096).astype("<i2")
    out, rate = decode_wav(encode_wav(samples, rate=16000))
    assert rate == 16000
    assert (out == samples).all()


def test_wav_chunk_walker_skips_foreign_chunks():
    """A LIST chunk between fmt and data (common in real encoders) must be
    skipped by the chunk walker, not break parsing."""
    samples = np.arange(-100, 100, dtype="<i2")
    raw = bytearray(encode_wav(samples, rate=8000))
    # splice a LIST chunk right after the fmt chunk (offset 12 + 8 + 16)
    insert_at = 12 + 8 + 16
    foreign = b"LIST" + (4).to_bytes(4, "little") + b"INFO"
    raw[insert_at:insert_at] = foreign
    # fix RIFF size
    raw[4:8] = (len(raw) - 8).to_bytes(4, "little")
    out, rate = decode_wav(bytes(raw))
    assert rate == 8000 and (out == samples).all()


@pytest.mark.parametrize("w,h", [(1, 1), (3, 2), (5, 7), (28, 20)])
def test_bmp_roundtrip_with_row_padding(w, h):
    """Widths that need 4-byte row padding (w*3 % 4 != 0) are the classic
    BMP bug; every shape must round-trip byte-exact."""
    rng = np.random.default_rng(w * 100 + h)
    px = rng.integers(0, 256, size=(h, w, 3)).astype("u1")
    assert (decode_bmp(encode_bmp(px)) == px).all()


def test_malformed_inputs_rejected():
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxNOPE")
    with pytest.raises(ValueError):
        decode_wav(b"")
    with pytest.raises(ValueError):
        decode_bmp(b"PNG\x00" + b"\x00" * 60)
    # 8-bit BMP (unsupported depth) must be rejected, not misparsed
    px = np.zeros((2, 2, 3), dtype="u1")
    raw = bytearray(encode_bmp(px))
    raw[28] = 8  # bpp field
    with pytest.raises(ValueError):
        decode_bmp(bytes(raw))


def test_resize_real_images_nearest_neighbor(spark):
    """End-to-end real resize on Spark: generated BMPs are decoded,
    downsampled, re-encoded; re-decoding the output must equal an
    independent numpy nearest-neighbor reference exactly."""
    from app_insights_generator_spark.operators.multimodal import (
        resize_real_images,
        synthesize_real_media,
    )

    ids = spark.range(0, 20, 2).withColumnRenamed("id", "media_id")  # even -> images
    media = synthesize_real_media(ids, "media_id")
    resized = {r.media_id: r for r in resize_real_images(media, max_dim=8).collect()}
    src = {r.media_id: bytes(r.content) for r in media.collect()}

    for mid, row in resized.items():
        px = decode_bmp(src[mid])
        h, w, _ = px.shape
        scale = 8 / max(w, h)
        nw, nh = max(1, round(w * scale)), max(1, round(h * scale))
        ys = (np.arange(nh) * h) // nh
        xs = (np.arange(nw) * w) // nw
        expect = px[ys][:, xs]
        got = decode_bmp(bytes(row.content))
        assert (row.width, row.height) == (nw, nh)
        assert (got == expect).all(), f"media {mid} resize mismatch"


def test_map_in_arrow_equals_map_in_pandas(spark):
    """The arrow-native feature extractor must produce exactly the pandas
    variant's rows — same decode, no conversion-layer drift."""
    from app_insights_generator_spark.operators.multimodal import (
        extract_real_media_features,
        extract_real_media_features_arrow,
        synthesize_real_media,
    )

    ids = spark.range(0, 30).withColumnRenamed("id", "media_id")
    media = synthesize_real_media(ids, "media_id")
    a = {tuple(r) for r in extract_real_media_features(media).collect()}
    b = {tuple(r) for r in extract_real_media_features_arrow(media).collect()}
    assert a == b and len(a) == 30


def test_png_roundtrip_all_filters_and_colors():
    import numpy as np

    from app_insights_generator_spark.operators.codecs import decode_png, encode_png

    rng = np.random.default_rng(7)
    for shape in ((13, 17), (9, 5, 3), (6, 4, 4), (1, 1, 3)):
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        for ft in range(5):
            back = decode_png(encode_png(img, filter_type=ft))
            assert back.shape == img.shape and (back == img).all(), (shape, ft)


def test_png_malformed_rejected():
    import numpy as np
    import pytest

    from app_insights_generator_spark.operators.codecs import decode_png, encode_png

    good = encode_png(np.zeros((4, 4, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"BM" + good[2:])
    with pytest.raises(ValueError, match="CRC"):
        bad = bytearray(good)
        bad[good.index(b"IDAT") + 6] ^= 0xFF  # corrupt an IDAT body byte
        decode_png(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        decode_png(good[:-8])


def test_png_media_arrow_twin_matches_pandas(spark):
    from app_insights_generator_spark.operators.multimodal import (
        extract_real_media_features,
        extract_real_media_features_arrow,
        synthesize_png_media,
    )

    ids = spark.range(0, 40).withColumnRenamed("id", "media_id")
    media = synthesize_png_media(ids, "media_id").persist()
    a = {tuple(r) for r in extract_real_media_features(media).collect()}
    b = {tuple(r) for r in extract_real_media_features_arrow(media).collect()}
    media.unpersist()
    assert a == b and len(a) == 40
