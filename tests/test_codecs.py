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


def test_jpeg_constant_blocks_exact_roundtrip():
    import numpy as np

    from app_insights_generator_spark.operators.codecs import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(5)
    for _ in range(6):
        bh, bw = int(rng.integers(1, 5)), int(rng.integers(1, 6))
        vals = rng.integers(0, 256, (bh, bw), dtype=np.uint8)
        img = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
        back = decode_jpeg(encode_jpeg(img))
        assert back.shape == img.shape and (back == img).all()


def test_jpeg_decode_matches_quantization_prediction():
    """The entropy layer is lossless: decode must equal the independently
    computed DCT -> quantize -> dequantize -> IDCT reconstruction, bit for
    bit, under both the flat and a realistic quantization table."""
    import numpy as np

    from app_insights_generator_spark.operators.codecs import (
        decode_jpeg,
        encode_jpeg,
    )

    # ITU T.81 Annex K.1 luminance table (public spec constants)
    std_lum = np.array([
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ], dtype=np.uint8)

    n = np.arange(8)
    T = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16) / 2
    T[0, :] *= 1 / np.sqrt(2)

    def predict(img, q):
        h, w = img.shape
        out = np.zeros_like(img)
        for by in range(h // 8):
            for bx in range(w // 8):
                b = img[by*8:by*8+8, bx*8:bx*8+8].astype(np.float64) - 128.0
                qc = np.round((T @ b @ T.T) / q)
                rec = T.T @ (qc * q) @ T
                out[by*8:by*8+8, bx*8:bx*8+8] = np.clip(
                    np.round(rec + 128.0), 0, 255
                ).astype(np.uint8)
        return out

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (32, 48), dtype=np.uint8)
    for q in (np.ones((8, 8), dtype=np.uint8), std_lum):
        back = decode_jpeg(encode_jpeg(img, quant=q))
        assert (back == predict(img, q.astype(np.int64))).all()


def test_jpeg_edge_padding_roundtrip():
    import numpy as np

    from app_insights_generator_spark.operators.codecs import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(2)
    for shape in ((13, 21), (1, 1), (8, 9), (17, 8)):
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        assert decode_jpeg(encode_jpeg(img)).shape == shape


def test_jpeg_malformed_rejected():
    import numpy as np
    import pytest

    from app_insights_generator_spark.operators.codecs import (
        decode_jpeg,
        encode_jpeg,
    )

    good = encode_jpeg(np.full((16, 16), 77, dtype=np.uint8))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"PK" + good[2:])
    with pytest.raises(ValueError, match="EOI"):
        decode_jpeg(good[:-2])  # strip the EOI marker
    with pytest.raises(ValueError, match="SOF0"):
        # flip SOF0 -> SOF2 (progressive) — must be rejected, not misparsed
        bad = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
        decode_jpeg(bad)
    with pytest.raises(ValueError, match="truncated|Huffman|marker"):
        # remove most of the entropy-coded scan but keep the EOI marker:
        # the block loop must run out of bits and raise, not emit a
        # partial image. (Bit-flips inside the scan are NOT reliably
        # detectable — JPEG carries no checksum — so that is not tested.)
        sos = good.index(b"\xff\xda")
        scan_start = sos + 2 + int.from_bytes(good[sos + 2 : sos + 4], "big")
        decode_jpeg(good[: scan_start + 1] + b"\xff\xd9")


def test_jpeg_media_arrow_twin_matches_pandas(spark):
    from app_insights_generator_spark.operators.multimodal import (
        extract_real_media_features,
        extract_real_media_features_arrow,
        synthesize_jpeg_media,
    )

    ids = spark.range(0, 40).withColumnRenamed("id", "media_id")
    media = synthesize_jpeg_media(ids, "media_id").persist()
    a = {tuple(r) for r in extract_real_media_features(media).collect()}
    b = {tuple(r) for r in extract_real_media_features_arrow(media).collect()}
    media.unpersist()
    assert a == b and len(a) == 40


# --- MP4 / ISO BMFF ----------------------------------------------------------


def test_mp4_roundtrip_exact():
    from app_insights_generator_spark.operators.codecs import decode_mp4, encode_mp4

    rng = np.random.default_rng(11)
    for n, h, w in [(1, 1, 1), (3, 5, 7), (6, 8, 12)]:
        frames = rng.integers(0, 256, size=(n, h, w, 3)).astype("u1")
        out, dur_ms = decode_mp4(encode_mp4(frames, fps=10))
        assert (out == frames).all()
        assert dur_ms == n * 100


def test_mp4_multi_chunk_and_co64_decode():
    """The decoder must be MORE general than the encoder: reconstruct
    samples split across two chunks (2-run stsc) addressed via 64-bit
    co64 offsets, with the chunks stored in non-contiguous mdat spots."""
    import struct

    from app_insights_generator_spark.operators.codecs import _box, _full, decode_mp4, encode_mp4

    rng = np.random.default_rng(12)
    frames = rng.integers(0, 256, size=(5, 2, 3, 3)).astype("u1")
    n, h, w = 5, 2, 3
    fb = h * w * 3
    base = encode_mp4(frames, fps=10)

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2")
    # mdat: 3 samples, 4 bytes of junk, then 2 samples
    payload = frames[:3].tobytes() + b"\xde\xad\xbe\xef" + frames[3:].tobytes()
    mdat = _box(b"mdat", payload)
    off1 = len(ftyp) + 8
    off2 = off1 + 3 * fb + 4

    moov_start = base.index(b"moov") - 4
    moov = bytearray(base[moov_start:])
    # surgically replace stsc (1 run -> 2 runs) and stco -> co64
    old_stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    new_stsc = _full(
        b"stsc", 0, 0, struct.pack(">I", 2) + struct.pack(">III", 1, 3, 1) + struct.pack(">III", 2, 2, 1)
    )
    old_stco = _full(b"stco", 0, 0, struct.pack(">II", 1, off1))
    new_co64 = _full(b"co64", 0, 0, struct.pack(">IQQ", 2, off1, off2))
    assert bytes(old_stsc) in moov and bytes(old_stco) in moov
    moov = moov.replace(old_stsc, new_stsc).replace(old_stco, new_co64)

    # fix every enclosing box size on the moov->stbl path (all grew)
    grow = (len(new_stsc) - len(old_stsc)) + (len(new_co64) - len(old_stco))
    for tag in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
        at = moov.index(tag) - 4
        (size,) = struct.unpack_from(">I", moov, at)
        struct.pack_into(">I", moov, at, size + grow)

    out, dur_ms = decode_mp4(ftyp + mdat + bytes(moov))
    assert (out == frames).all() and dur_ms == 500


def test_mp4_malformed_rejected():
    import struct

    from app_insights_generator_spark.operators.codecs import decode_mp4, encode_mp4

    frames = np.zeros((2, 4, 4, 3), dtype="u1")
    good = encode_mp4(frames, fps=10)

    with pytest.raises(ValueError):
        decode_mp4(b"")
    with pytest.raises(ValueError):
        decode_mp4(b"\x00\x00\x00\x08mdat")  # no ftyp first
    with pytest.raises(ValueError):
        decode_mp4(good[:-9])  # truncated final box
    # trailing garbage that is not a valid box
    with pytest.raises(ValueError):
        decode_mp4(good + b"\xff\xff")
    # box size overrunning the file
    bad = bytearray(good)
    struct.pack_into(">I", bad, 0, len(good) + 64)
    with pytest.raises(ValueError):
        decode_mp4(bytes(bad))
    # compressed codec fourcc must be rejected, not misparsed
    bad = bytearray(good)
    at = bad.index(b"raw ")
    bad[at : at + 4] = b"avc1"
    with pytest.raises(ValueError) as ei:
        decode_mp4(bytes(bad))
    assert "avc1" in str(ei.value)
    # sample escaping mdat: point the chunk offset past the payload
    bad = bytearray(good)
    at = bad.index(b"stco")
    struct.pack_into(">I", bad, at + 12, len(good) - 4)
    with pytest.raises(ValueError):
        decode_mp4(bytes(bad))
    # depth != 24
    bad = bytearray(good)
    at = bad.index(b"raw ") + 4 + 74
    struct.pack_into(">H", bad, at, 32)
    with pytest.raises(ValueError):
        decode_mp4(bytes(bad))


def test_map_in_arrow_equals_map_in_pandas_mp4(spark):
    """Same equivalence for the MP4 branch added round 5."""
    from app_insights_generator_spark.operators.multimodal import (
        extract_real_media_features,
        extract_real_media_features_arrow,
        synthesize_mp4_media,
    )

    ids = spark.range(0, 20).withColumnRenamed("id", "media_id")
    media = synthesize_mp4_media(ids, "media_id")
    a = {tuple(r) for r in extract_real_media_features(media).collect()}
    b = {tuple(r) for r in extract_real_media_features_arrow(media).collect()}
    assert a == b and len(a) == 20


def test_mp4_mdhd_v1_version_flip_raises():
    """A v0 mdhd (24-byte body) whose version byte is corrupted to 1 must
    RAISE — the v1 layout needs a 32-byte body, and reading past the box
    end would return the next box's header bytes as timescale/duration
    (a silently wrong duration_ms, violating the malformed-bytes-raise
    contract)."""
    import struct

    from app_insights_generator_spark.operators.codecs import decode_mp4, encode_mp4

    good = encode_mp4(np.zeros((2, 4, 4, 3), dtype="u1"), fps=10)
    bad = bytearray(good)
    at = bad.index(b"mdhd")
    assert bad[at + 4] == 0  # encoder writes v0
    bad[at + 4] = 1
    with pytest.raises(ValueError, match="mdhd v1"):
        decode_mp4(bytes(bad))


def test_mp4_multi_track_selects_video():
    """An audio trak listed BEFORE the video trak must be skipped, not
    inspected as 'the' track (a tag-keyed dict kept only the last trak,
    so ordering silently controlled which track was parsed)."""
    import struct

    from app_insights_generator_spark.operators.codecs import (
        _box,
        _full,
        decode_mp4,
        encode_mp4,
    )

    rng = np.random.default_rng(13)
    frames = rng.integers(0, 256, size=(3, 4, 5, 3)).astype("u1")
    base = encode_mp4(frames, fps=10)

    mdhd_a = _full(
        b"mdhd", 0, 0, struct.pack(">IIII", 0, 0, 1000, 0) + struct.pack(">HH", 0, 0)
    )
    hdlr_a = _full(
        b"hdlr", 0, 0, struct.pack(">I", 0) + b"soun" + b"\0" * 12 + b"Sound\0"
    )
    trak_a = _box(b"trak", _box(b"mdia", mdhd_a + hdlr_a))

    moov_start = base.index(b"moov") - 4
    moov = bytearray(base[moov_start:])
    ins = moov.index(b"trak") - 4  # audio trak FIRST, before the video trak
    moov[ins:ins] = trak_a
    (size,) = struct.unpack_from(">I", moov, 0)
    struct.pack_into(">I", moov, 0, size + len(trak_a))

    out, dur_ms = decode_mp4(base[:moov_start] + bytes(moov))
    assert (out == frames).all() and dur_ms == 300


def test_codec_fuzz_corruption_raises_cleanly():
    """Contract hardening: flipping any byte of a valid file must either
    still decode (corruption hit pixel/sample payload or an ignored
    region) or raise ValueError — never struct.error, IndexError,
    KeyError, zlib.error, or a numpy reshape crash. Deterministic sweep
    over seeded positions so failures reproduce."""
    from app_insights_generator_spark.operators.codecs import (
        decode_bmp,
        decode_gif,
        decode_jpeg,
        decode_mp4,
        decode_png,
        decode_wav,
        encode_bmp,
        encode_gif,
        encode_jpeg,
        encode_mp4,
        encode_png,
        encode_wav,
    )

    rng = np.random.default_rng(99)
    pal = np.arange(256, dtype=np.int64)
    pal = np.stack([pal, (2 * pal) % 256, (3 * pal) % 256], 1).astype("u1")
    samples = [
        (decode_wav, encode_wav(rng.integers(-1000, 1000, 256).astype("<i2"))),
        (decode_bmp, encode_bmp(rng.integers(0, 256, (6, 5, 3)).astype("u1"))),
        (decode_png, encode_png(rng.integers(0, 256, (7, 4, 3)).astype("u1"), 3)),
        (decode_jpeg, encode_jpeg(rng.integers(0, 256, (16, 16)).astype("u1"))),
        (decode_mp4, encode_mp4(rng.integers(0, 256, (3, 4, 5, 3)).astype("u1"))),
        (decode_gif, encode_gif(rng.integers(0, 256, (2, 6, 9)).astype("u1"), pal)),
    ]
    for decode, good in samples:
        n = len(good)
        positions = sorted(set(int(p) for p in rng.integers(0, n, 90)))
        for pos in positions:
            for delta in (1, 0x80):
                bad = bytearray(good)
                bad[pos] = (bad[pos] + delta) % 256
                try:
                    decode(bytes(bad))
                except ValueError:
                    pass
                except Exception as e:  # noqa: BLE001
                    raise AssertionError(
                        f"{decode.__name__} leaked {type(e).__name__} at "
                        f"byte {pos} (+{delta:#x}): {e}"
                    ) from e


# --- GIF / LZW ---------------------------------------------------------------


def test_gif_roundtrip_exact_and_duration():
    from app_insights_generator_spark.operators.codecs import decode_gif, encode_gif

    rng = np.random.default_rng(21)
    pal = np.arange(256, dtype=np.int64)
    pal = np.stack([pal, (2 * pal) % 256, (3 * pal) % 256], 1).astype("u1")
    for n, h, w in [(1, 1, 1), (3, 5, 7), (2, 16, 23)]:
        idx = rng.integers(0, 256, size=(n, h, w)).astype("u1")
        out, dur_ms = decode_gif(encode_gif(idx, pal, delay_cs=7))
        assert (out == pal[idx]).all()
        assert dur_ms == n * 70


def test_gif_lzw_dictionary_reset_on_long_runs():
    """A highly repetitive frame forces the LZW dictionary past 4096
    entries, exercising the mid-stream CLEAR + rebuild path on both
    encode and decode."""
    from app_insights_generator_spark.operators.codecs import decode_gif, encode_gif

    pal = np.arange(256, dtype=np.int64)
    pal = np.stack([pal, pal, pal], 1).astype("u1")
    idx = np.zeros((1, 80, 400), dtype="u1")
    idx[0, :, ::3] = 17
    idx[0, ::5, :] = 203
    out, _ = decode_gif(encode_gif(idx, pal))
    assert (out == pal[idx]).all()


def test_gif_malformed_rejected():
    import struct

    from app_insights_generator_spark.operators.codecs import decode_gif, encode_gif

    pal = np.zeros((256, 3), dtype="u1")
    good = encode_gif(np.zeros((2, 4, 6), dtype="u1"), pal)

    with pytest.raises(ValueError):
        decode_gif(b"")
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF" + good[7:])
    with pytest.raises(ValueError):
        decode_gif(good[:-1])  # missing trailer
    # interlace flag must be rejected, not misparsed
    bad = bytearray(good)
    at = bad.index(b"\x2c")
    bad[at + 9] |= 0x40
    with pytest.raises(ValueError, match="interlace"):
        decode_gif(bytes(bad))
    # truncated image sub-block
    bad = bytearray(good[: len(good) // 2])
    with pytest.raises(ValueError):
        decode_gif(bytes(bad))


def test_gif_media_arrow_twin_matches_pandas(spark):
    from app_insights_generator_spark.operators.multimodal import (
        extract_real_media_features,
        extract_real_media_features_arrow,
        synthesize_gif_media,
    )

    ids = spark.range(0, 25).withColumnRenamed("id", "media_id")
    media = synthesize_gif_media(ids, "media_id").persist()
    a = {tuple(r) for r in extract_real_media_features(media).collect()}
    b = {tuple(r) for r in extract_real_media_features_arrow(media).collect()}
    media.unpersist()
    assert a == b and len(a) == 25
