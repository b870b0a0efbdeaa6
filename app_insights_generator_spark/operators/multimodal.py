"""Multimodal (image/audio/video) column plumbing (SURVEY.md §7 M5).

Media is carried as an opaque ``binary`` column plus typed metadata —
the parquet-native pattern that scales: bytes stay columnar, predicates
prune on metadata without touching payloads.

WAV, BMP, PNG, baseline JPEG, animated GIF, and MP4 (ISO BMFF container
with uncompressed 'raw ' RGB24 video samples) decode for REAL via the
pure-numpy codecs in operators/codecs.py (synthesize_*/extract_real_*
below). The one remaining stub is MOTION-COMPRESSED video payloads
(H.264 etc.) — those need codec libraries that are NOT in this
environment, so that decode step is STUBBED: ``decode_stub=True``
(default) derives deterministic fake features from the bytes;
``decode_stub=False`` raises NotImplementedError where the ffmpeg call
would go. Everything Spark-side — schema, Arrow batch shape,
mapInPandas signature, partitioning — is real and tested either way.
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


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("content", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def resize_images(media: DataFrame, max_dim: int = 128, decode_stub: bool = True) -> DataFrame:
    """Resize every image/video-still so max(width, height) == max_dim,
    preserving aspect ratio. Arrow-batched mapInPandas, 1:1 rows, no
    shuffle — audio rows pass through with NULL dimensions.

    Stubbed codec: the "resized" payload is a deterministic function of
    (content digest, target dims) so tests can assert exact bytes; a real
    build swaps _fake_decode/_fake_encode for Pillow with no change to the
    Spark-side schema or batch shape.
    """

    def _resize(media_type: str, content: bytes) -> tuple[bytes | None, int | None, int | None]:
        w, h, _ = _fake_decode(media_type, content)
        if w is None or h is None:
            return None, None, None
        scale = max_dim / max(w, h)
        nw, nh = max(1, round(w * scale)), max(1, round(h * scale))
        if not decode_stub:
            raise NotImplementedError(
                "real image resize needs Pillow, absent in this environment"
            )
        fake = hashlib.sha256(content + f":{nw}x{nh}".encode()).digest()
        return fake * (1 + nw * nh // len(fake)), nw, nh

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            resized = [
                _resize(t, bytes(c)) for t, c in zip(pdf["media_type"], pdf["content"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "content": [r[0] for r in resized],
                    "width": pd.array([r[1] for r in resized], dtype="Int32"),
                    "height": pd.array([r[2] for r in resized], dtype="Int32"),
                }
            )

    return media.mapInPandas(batches, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_ts_ms", LongType()),
        StructField("frame_sha", StringType()),
    ]
)


def sample_frames(
    media: DataFrame, every_ms: int = 10_000, max_frames: int = 32, decode_stub: bool = True
) -> DataFrame:
    """Sample frames from video rows every ``every_ms`` — a one-to-many
    mapInPandas (output rows > input rows), the shape a real frame
    extractor has. Non-video rows produce no output. The frame payload is
    stubbed as a digest; duration comes from the (stubbed) decode, so the
    sampling arithmetic — frame count = min(duration // every_ms + 1,
    max_frames) — is real and tested.

    Scale note: frame explosion multiplies rows ~10-100x; downstream
    repartitioning is the CALLER's choice (this op preserves partitioning
    so media already spread by media_id stays spread).
    """
    if not decode_stub:
        raise NotImplementedError(
            "real frame sampling needs ffmpeg, absent in this environment"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, tss, shas = [], [], [], []
            for mid, mtype, content in zip(
                pdf["media_id"], pdf["media_type"], pdf["content"]
            ):
                if mtype != "video":
                    continue
                raw = bytes(content)
                _, _, dur = _fake_decode(mtype, raw)
                n = min(int(dur) // every_ms + 1, max_frames)
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i)
                    tss.append(i * every_ms)
                    shas.append(hashlib.sha256(raw + i.to_bytes(4, "big")).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="int64"),
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "frame_ts_ms": pd.array(tss, dtype="int64"),
                    "frame_sha": shas,
                }
            )

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)


# --- REAL codecs (WAV/BMP, pure numpy — operators/codecs.py) -----------------

REAL_MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image (BMP) | audio (WAV)
        StructField("content", BinaryType()),
    ]
)

REAL_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", IntegerType()),        # NULL for audio
        StructField("height", IntegerType()),       # NULL for audio
        StructField("duration_ms", LongType()),     # NULL for image
        StructField("payload_sum", LongType()),     # R-channel sum / sum|samples|
    ]
)


def synthesize_real_media(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Generate REAL media payloads (actual BMP and WAV files, not digests)
    deterministically from an id column: even ids become 24-bit BMP
    gradients, odd ids become PCM-16 WAV sawtooths. All parameters are
    closed-form functions of the id, so an external oracle can predict
    every decoded feature without running the codec."""
    import numpy as np

    from app_insights_generator_spark.operators.codecs import encode_bmp, encode_wav

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid in pdf[id_col]:
                mid = int(mid)
                if mid % 2 == 0:
                    w, h = 4 * (2 + mid % 6), 4 * (1 + mid % 5)
                    xy = np.add.outer(np.arange(h), np.arange(w)) % 256
                    px = np.repeat(xy[:, :, None], 3, axis=2).astype("u1")
                    rows.append((mid, "image", encode_bmp(px)))
                else:
                    n = 256 * (4 + mid % 8)
                    i = np.arange(n)
                    samples = ((i % 256) - 128) * 64
                    rows.append((mid, "audio", encode_wav(samples, rate=8000)))
            yield pd.DataFrame(rows, columns=["media_id", "media_type", "content"])

    return ids.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        batches, schema=REAL_MEDIA_SCHEMA
    )


def synthesize_png_media(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Generate REAL compressed payloads: 8-bit RGB PNGs (zlib DEFLATE —
    the first genuinely compressed format in the codec set), one per id,
    using scanline filter ``id % 5`` so the distributed decode path
    exercises every PNG filter type. Pixels are the closed-form gradient
    px[y, x, c] = (3y + 7x + id + 11c) % 256, so an external oracle can
    predict width, height, and the R-channel sum without any codec."""
    import numpy as np

    from app_insights_generator_spark.operators.codecs import encode_png

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid in pdf[id_col]:
                mid = int(mid)
                w, h = 4 * (2 + mid % 6), 3 * (1 + mid % 5)
                y, x = np.mgrid[0:h, 0:w]
                base = (3 * y + 7 * x + mid) % 256
                px = np.stack([(base + 11 * c) % 256 for c in range(3)], axis=2)
                rows.append(
                    (mid, "image_png", encode_png(px.astype("u1"), filter_type=mid % 5))
                )
            yield pd.DataFrame(rows, columns=["media_id", "media_type", "content"])

    return ids.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        batches, schema=REAL_MEDIA_SCHEMA
    )


def synthesize_jpeg_media(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Generate REAL baseline JPEGs (Huffman + DCT, operators/codecs.py),
    one grayscale image per id, built from constant 8x8 blocks
    v(bx, by) = (7*bx + 13*by + id) % 256 under the flat quantization
    table — constant blocks survive DCT -> quantize -> IDCT exactly (only
    the DC coefficient is nonzero and quantizes losslessly), so an
    external oracle can predict the decoded pixel sum in closed form
    while the payload still exercises real DPCM/Huffman entropy coding."""
    import numpy as np

    from app_insights_generator_spark.operators.codecs import encode_jpeg

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid in pdf[id_col]:
                mid = int(mid)
                bw, bh = 2 + mid % 5, 1 + mid % 4
                bx, by = np.meshgrid(np.arange(bw), np.arange(bh))
                vals = ((7 * bx + 13 * by + mid) % 256).astype(np.uint8)
                img = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
                rows.append((mid, "image_jpeg", encode_jpeg(img)))
            yield pd.DataFrame(rows, columns=["media_id", "media_type", "content"])

    return ids.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        batches, schema=REAL_MEDIA_SCHEMA
    )


def synthesize_gif_media(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Generate REAL animated GIF89a payloads (variable-width LZW,
    operators/codecs.py encode_gif), one per id: n = 1 + id%3 frames of
    w = 3*(2 + id%5) x h = 2*(2 + id%4) palette indices
    px[f, y, x] = (3y + 7x + 5f + id) % 256 at 7 cs/frame, with the
    identity-R palette pal[i] = (i, 2i%256, 3i%256) — so an external
    oracle predicts width, height, duration (n*70 ms) and the decoded
    R-channel sum (= the index sum) in closed form while the payload
    still exercises real LZW entropy coding + sub-block framing."""
    import numpy as np

    from app_insights_generator_spark.operators.codecs import encode_gif

    i = np.arange(256, dtype=np.int64)
    palette = np.stack([i, (2 * i) % 256, (3 * i) % 256], axis=1).astype(np.uint8)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid in pdf[id_col]:
                mid = int(mid)
                n, w, h = 1 + mid % 3, 3 * (2 + mid % 5), 2 * (2 + mid % 4)
                f, y, x = np.mgrid[0:n, 0:h, 0:w]
                idx = ((3 * y + 7 * x + 5 * f + mid) % 256).astype("u1")
                rows.append((mid, "image_gif", encode_gif(idx, palette, delay_cs=7)))
            yield pd.DataFrame(rows, columns=["media_id", "media_type", "content"])

    return ids.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        batches, schema=REAL_MEDIA_SCHEMA
    )


def synthesize_mp4_media(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Generate REAL MP4 files (ISO BMFF: ftyp + mdat + moov with full
    stts/stsc/stsz/stco sample tables, operators/codecs.py encode_mp4),
    one uncompressed-RGB video per id: n = 2 + id%4 frames of
    w = 4*(2+id%4) by h = 4*(1+id%3) at 10 fps, pixels
    px[f, y, x, c] = (5y + 3x + 17f + id + 11c) % 256 — all closed-form
    in the id, so an external oracle predicts every decoded feature
    (dims, duration, R-channel sum across frames) without a parser."""
    import numpy as np

    from app_insights_generator_spark.operators.codecs import encode_mp4

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid in pdf[id_col]:
                mid = int(mid)
                n, w, h = 2 + mid % 4, 4 * (2 + mid % 4), 4 * (1 + mid % 3)
                f, y, x = np.mgrid[0:n, 0:h, 0:w]
                base = (5 * y + 3 * x + 17 * f + mid) % 256
                frames = np.stack(
                    [(base + 11 * c) % 256 for c in range(3)], axis=3
                ).astype("u1")
                rows.append((mid, "video_mp4", encode_mp4(frames, fps=10)))
            yield pd.DataFrame(rows, columns=["media_id", "media_type", "content"])

    return ids.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        batches, schema=REAL_MEDIA_SCHEMA
    )


def sample_frames_real(media: DataFrame, every_k: int = 2) -> DataFrame:
    """REAL frame sampling: parse the MP4 container (box tree + sample
    tables), materialize frames, keep every ``every_k``-th one, and emit
    (media_id, frame_idx, frame_ts_ms, frame_sum) — the same one-to-many
    mapInPandas shape as the stubbed sample_frames, with frame_sum the
    R-channel pixel sum of the REAL decoded frame (closed-form oracle-
    checkable). Non-video rows produce no output; malformed bytes raise."""
    import numpy as np

    from app_insights_generator_spark.operators.codecs import decode_mp4

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame_ts_ms", LongType()),
            StructField("frame_sum", LongType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, mtype, content in zip(
                pdf["media_id"], pdf["media_type"], pdf["content"]
            ):
                if mtype != "video_mp4":
                    continue
                frames, dur_ms = decode_mp4(bytes(content))
                n = frames.shape[0]
                for i in range(0, n, every_k):
                    out.append(
                        (
                            int(mid),
                            i,
                            i * dur_ms // n,
                            int(frames[i, :, :, 0].astype("i8").sum()),
                        )
                    )
            yield pd.DataFrame(
                out, columns=["media_id", "frame_idx", "frame_ts_ms", "frame_sum"]
            ).astype({"frame_idx": "int32"})

    return media.mapInPandas(batches, schema=schema)


def extract_real_media_features(media: DataFrame) -> DataFrame:
    """REAL decode path (no stub): parses actual BMP headers/pixels and WAV
    chunk lists/PCM samples with the pure-numpy codecs. Same Arrow-batched
    mapInPandas shape as the stubbed extract_media_features — swap-in
    proof that the Spark-side plumbing is codec-agnostic. Malformed bytes
    raise (fail loudly, never emit garbage features)."""
    import numpy as np

    from app_insights_generator_spark.operators.codecs import (
        decode_bmp,
        decode_gif,
        decode_jpeg,
        decode_mp4,
        decode_png,
        decode_wav,
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, mtype, content in zip(
                pdf["media_id"], pdf["media_type"], pdf["content"]
            ):
                raw = bytes(content)
                if mtype == "image":
                    px = decode_bmp(raw)
                    h, w, _ = px.shape
                    out.append(
                        (int(mid), mtype, w, h, None, int(px[:, :, 0].astype("i8").sum()))
                    )
                elif mtype == "image_png":
                    px = decode_png(raw)
                    h, w, _ = px.shape
                    out.append(
                        (int(mid), mtype, w, h, None, int(px[:, :, 0].astype("i8").sum()))
                    )
                elif mtype == "image_jpeg":
                    px = decode_jpeg(raw)  # grayscale (h, w)
                    h, w = px.shape
                    out.append(
                        (int(mid), mtype, w, h, None, int(px.astype("i8").sum()))
                    )
                elif mtype == "video_mp4":
                    frames, dur_ms = decode_mp4(raw)
                    _, h, w, _ = frames.shape
                    out.append(
                        (
                            int(mid),
                            mtype,
                            w,
                            h,
                            int(dur_ms),
                            int(frames[:, :, :, 0].astype("i8").sum()),
                        )
                    )
                elif mtype == "image_gif":
                    frames, dur_ms = decode_gif(raw)
                    _, h, w, _ = frames.shape
                    out.append(
                        (
                            int(mid),
                            mtype,
                            w,
                            h,
                            int(dur_ms),
                            int(frames[:, :, :, 0].astype("i8").sum()),
                        )
                    )
                elif mtype == "audio":
                    samples, rate = decode_wav(raw)
                    out.append(
                        (
                            int(mid),
                            mtype,
                            None,
                            None,
                            len(samples) * 1000 // rate,
                            int(np.abs(samples.astype("i8")).sum()),
                        )
                    )
                else:
                    raise ValueError(f"unsupported real-codec media type: {mtype}")
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "media_type",
                    "width",
                    "height",
                    "duration_ms",
                    "payload_sum",
                ],
            ).astype(
                {
                    "width": "Int32",
                    "height": "Int32",
                    "duration_ms": "Int64",
                    "payload_sum": "int64",
                }
            )

    return media.mapInPandas(batches, schema=REAL_FEATURE_SCHEMA)


def resize_real_images(media: DataFrame, max_dim: int = 16) -> DataFrame:
    """REAL image resize for BMP payloads: decode with the pure-numpy codec,
    nearest-neighbor downsample so max(w, h) == max_dim (aspect preserved),
    re-encode as BMP. Audio rows pass through with NULL dims. Same
    mapInPandas shape and RESIZED_SCHEMA as the stubbed resize_images —
    the codec is the only moving part.

    Nearest-neighbor index mapping: src_idx = floor(dst_idx * src / dst) —
    deterministic integer arithmetic, so tests can recompute expected
    pixels independently."""
    import numpy as np

    from app_insights_generator_spark.operators.codecs import decode_bmp, encode_bmp

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, mtype, content in zip(
                pdf["media_id"], pdf["media_type"], pdf["content"]
            ):
                raw = bytes(content)
                if mtype != "image":
                    out.append((int(mid), mtype, raw, None, None))
                    continue
                px = decode_bmp(raw)
                h, w, _ = px.shape
                scale = max_dim / max(w, h)
                nw, nh = max(1, round(w * scale)), max(1, round(h * scale))
                ys = (np.arange(nh) * h) // nh
                xs = (np.arange(nw) * w) // nw
                small = px[ys][:, xs]
                out.append((int(mid), mtype, encode_bmp(small), nw, nh))
            yield pd.DataFrame(
                out, columns=["media_id", "media_type", "content", "width", "height"]
            ).astype({"width": "Int32", "height": "Int32"})

    return media.mapInPandas(batches, schema=RESIZED_SCHEMA)


def extract_real_media_features_arrow(media: DataFrame) -> DataFrame:
    """mapInArrow twin of extract_real_media_features: consumes/produces
    raw ``pyarrow.RecordBatch``es, skipping the Arrow<->pandas conversion
    mapInPandas pays per batch. For binary-heavy pipelines that
    conversion copies every payload into Python objects — at 100 TB of
    media bytes the arrow-native path is the cheaper decode loop. Output
    is asserted identical to the pandas variant in tests."""
    import numpy as np
    import pyarrow as pa

    from app_insights_generator_spark.operators.codecs import (
        decode_bmp,
        decode_gif,
        decode_jpeg,
        decode_mp4,
        decode_png,
        decode_wav,
    )

    def batches(it):
        for rb in it:
            mids = rb.column("media_id").to_pylist()
            mtypes = rb.column("media_type").to_pylist()
            contents = rb.column("content").to_pylist()
            width, height, dur, psum = [], [], [], []
            for mtype, content in zip(mtypes, contents):
                raw = bytes(content)
                if mtype in ("image", "image_png", "image_jpeg"):
                    if mtype == "image":
                        px = decode_bmp(raw)[:, :, 0]
                    elif mtype == "image_png":
                        px = decode_png(raw)[:, :, 0]
                    else:
                        px = decode_jpeg(raw)  # grayscale (h, w)
                    h, w = px.shape
                    width.append(w)
                    height.append(h)
                    dur.append(None)
                    psum.append(int(px.astype("i8").sum()))
                elif mtype in ("video_mp4", "image_gif"):
                    decode = decode_mp4 if mtype == "video_mp4" else decode_gif
                    frames, dur_ms = decode(raw)
                    _, h, w, _ = frames.shape
                    width.append(w)
                    height.append(h)
                    dur.append(int(dur_ms))
                    psum.append(int(frames[:, :, :, 0].astype("i8").sum()))
                elif mtype == "audio":
                    samples, rate = decode_wav(raw)
                    width.append(None)
                    height.append(None)
                    dur.append(len(samples) * 1000 // rate)
                    psum.append(int(np.abs(samples.astype("i8")).sum()))
                else:
                    raise ValueError(f"unsupported real-codec media type: {mtype}")
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(mids, pa.int64()),
                    pa.array(mtypes, pa.string()),
                    pa.array(width, pa.int32()),
                    pa.array(height, pa.int32()),
                    pa.array(dur, pa.int64()),
                    pa.array(psum, pa.int64()),
                ],
                schema=pa.schema(
                    [
                        ("media_id", pa.int64()),
                        ("media_type", pa.string()),
                        ("width", pa.int32()),
                        ("height", pa.int32()),
                        ("duration_ms", pa.int64()),
                        ("payload_sum", pa.int64()),
                    ]
                ),
            )

    return media.mapInArrow(batches, schema=REAL_FEATURE_SCHEMA)


# --- Perceptual image hashing (dHash) ----------------------------------------

#: dHash sampling grid over a 16x16 source: 8 rows x 9 cols, nearest-
#: neighbor index map src = (dst * src_dim) // dst_dim — the same
#: convention as resize_real_images, so the oracle can enumerate it.
DHASH_ROWMAP = tuple((i * 16) // 8 for i in range(8))
DHASH_COLMAP = tuple((j * 16) // 9 for j in range(9))

DHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("dhash", LongType()),
    ]
)


def synthesize_dhash_images(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """16x16 grayscale BMPs whose pixels are the closed-form wrap-around
    gradient px[y, x] = (a*x + b*y) % 256 with id-derived coefficients
    a = 37 + 11*(base % 13), b = 5*(base % 5 + 1), base = id - id % 2 —
    the multiplier is large enough that a*x wraps several times across a
    row, so horizontal gradient SIGNS (what dHash encodes) vary per
    image instead of being monotonically positive. Odd ids replicate the
    even sibling's image with pixel (0, 0) shifted by +128 (mod 256):
    a planted near-duplicate whose dHash differs in at most the one bit
    that samples pixel (0, 0)."""
    import numpy as np

    from app_insights_generator_spark.operators.codecs import encode_bmp

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid in pdf[id_col]:
                mid = int(mid)
                base = mid - (mid % 2)
                a, b = 37 + 11 * (base % 13), 5 * (base % 5 + 1)
                y, x = np.mgrid[0:16, 0:16]
                px = (a * x + b * y) % 256
                if mid % 2 == 1:
                    px[0, 0] = (px[0, 0] + 128) % 256
                rgb = np.repeat(px[:, :, None], 3, axis=2).astype("u1")
                rows.append((mid, "image", encode_bmp(rgb)))
            yield pd.DataFrame(rows, columns=["media_id", "media_type", "content"])

    return ids.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        batches, schema=REAL_MEDIA_SCHEMA
    )


def image_dhash(media: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Perceptual difference hash over REAL decoded pixels -> [media_id,
    dhash(bigint)]: decode the BMP payload, sample the 8x9 grid
    (DHASH_ROWMAP x DHASH_COLMAP) from the R channel, set bit i*8+j iff
    g[i, j+1] > g[i, j] (horizontal gradient sign — invariant to global
    brightness/contrast shifts, which is the point of dHash for image
    near-dup detection). The 64 bits pack into one signed bigint (bit 63
    carries weight -2^63, the same two's-complement packing as SimHash
    signatures), so the downstream banded hamming join is shared code.

    Arrow-batched mapInPandas: decode cost is per-image and embarrassingly
    parallel; output is one 16-byte row per image, so the subsequent
    near-dup join never touches pixels again."""
    import numpy as np

    from app_insights_generator_spark.operators.codecs import decode_bmp

    rowmap, colmap = np.array(DHASH_ROWMAP), np.array(DHASH_COLMAP)
    weights = (1 << np.arange(64, dtype=np.uint64)).astype(np.uint64)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, content in zip(pdf[id_col], pdf["content"]):
                px = decode_bmp(bytes(content))
                gray = px[:, :, 0].astype(np.int64)
                g = gray[np.ix_(rowmap, colmap)]
                bits = (g[:, 1:] > g[:, :-1]).flatten()
                h = int(np.sum(weights[bits], dtype=np.uint64))
                if h >= 1 << 63:
                    h -= 1 << 64
                out.append((int(mid), h))
            yield pd.DataFrame(out, columns=["media_id", "dhash"])

    return media.mapInPandas(batches, schema=DHASH_SCHEMA)


# --- Audio loudness profile (windowed sum-of-squares over real PCM) ----------

AUDIO_WINDOW_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("w_idx", LongType()),
        StructField("ssq", LongType()),
        StructField("peak", LongType()),
    ]
)


def audio_window_profile(
    media: DataFrame, id_col: str = "media_id", window: int = 200
) -> DataFrame:
    """Windowed loudness profile over REAL decoded PCM -> [media_id,
    w_idx, ssq, peak]: decode the WAV payload and emit, per full window
    of ``window`` samples, the exact integer sum of squares (RMS^2 *
    window — the loudness statistic, kept as an integer so the oracle
    matches bit-for-bit; RMS itself is sqrt(ssq/window) at read time,
    the same derive-ratios-late rule as the rollup cascade) and the peak
    absolute sample. The trailing partial window is dropped (count is
    pinned by the window arithmetic, so membership is deterministic).

    This is the audio twin of image feature extraction for curation:
    silence/clipping detection is a pure filter on (ssq, peak)."""
    import numpy as np

    from app_insights_generator_spark.operators.codecs import decode_wav

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, content in zip(pdf[id_col], pdf["content"]):
                samples, _rate = decode_wav(bytes(content))
                s = samples.astype(np.int64)
                n_full = len(s) // window
                for k in range(n_full):
                    win = s[k * window : (k + 1) * window]
                    out.append(
                        (
                            int(mid),
                            k,
                            int(np.sum(win * win)),
                            int(np.max(np.abs(win))),
                        )
                    )
            yield pd.DataFrame(out, columns=["media_id", "w_idx", "ssq", "peak"])

    return media.mapInPandas(batches, schema=AUDIO_WINDOW_SCHEMA)


# --- Video scene-change detection (motion energy over real frames) -----------

SCENE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("energy", LongType()),
    ]
)


def synthesize_scene_mp4(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """REAL MP4s with a PLANTED scene cut: 8 frames of 8x8 RGB where
    pixels drift by +2/frame inside a scene and jump by +97 at frame
    cut = 3 + id % 3 — px[f,y,x,c] = (3x + 5y + 11c + 2f +
    97*(f >= cut) + id) % 256. All closed-form in the id, so the oracle
    can enumerate every pixel of every frame without a parser."""
    import numpy as np

    from app_insights_generator_spark.operators.codecs import encode_mp4

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid in pdf[id_col]:
                mid = int(mid)
                cut = 3 + mid % 3
                f, y, x, c = np.mgrid[0:8, 0:8, 0:8, 0:3]
                px = (
                    3 * x + 5 * y + 11 * c + 2 * f + 97 * (f >= cut) + mid
                ) % 256
                rows.append((mid, "video_mp4", encode_mp4(px.astype("u1"), fps=10)))
            yield pd.DataFrame(rows, columns=["media_id", "media_type", "content"])

    return ids.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        batches, schema=REAL_MEDIA_SCHEMA
    )


def scene_change_energy(media: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Adjacent-frame MOTION ENERGY over REAL decoded MP4 frames ->
    [media_id, frame_idx, energy]: energy(f) = sum over pixels/channels
    of |frame_f - frame_{f-1}| as exact integers. The per-pixel absolute
    sum is the statistic that survives wrap-around arithmetic — a
    difference of frame SUMS telescopes to ~0 under mod-256 for any
    uniform shift (measured: a +97 whole-frame jump moves the sum by
    ~-64 but the energy by ~23,000), which is why naive brightness-sum
    deltas miss hard cuts. Scene-change detection = thresholding this
    energy series; the planted-cut fixture makes the threshold exact.

    Arrow-batched mapInPandas; frames are decoded once per video and
    never shuffled — only the (video, frame) energy rows leave the
    executor."""
    import numpy as np

    from app_insights_generator_spark.operators.codecs import decode_mp4

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, content in zip(pdf[id_col], pdf["content"]):
                frames_u8, _duration_ms = decode_mp4(bytes(content))
                frames = frames_u8.astype(np.int64)
                for f in range(1, frames.shape[0]):
                    energy = int(np.abs(frames[f] - frames[f - 1]).sum())
                    out.append((int(mid), f, energy))
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "energy"])

    return media.mapInPandas(batches, schema=SCENE_SCHEMA)


# --- Image patch extraction (ViT-style patchify) -----------------------------

PATCH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("py", IntegerType()),
        StructField("px", IntegerType()),
        StructField("r_sum", LongType()),
        StructField("r_min", LongType()),
        StructField("r_max", LongType()),
    ]
)


def image_patchify(
    media: DataFrame, id_col: str = "media_id", patch: int = 4
) -> DataFrame:
    """ViT-style patch grid over REAL decoded pixels -> one row per
    (image, patch_row, patch_col) with exact integer R-channel
    sum/min/max per patch — the patchify step every vision-transformer
    data pipeline runs before embedding, expressed as decode + numpy
    reshape inside Arrow-batched mapInPandas. Images whose dimensions
    are not multiples of ``patch`` raise (patchify contracts are exact;
    silent cropping is how training sets drift from their specs).

    Scale: decode + reshape are per-image; the output is patch-grid
    metadata (bytes per patch, not pixels), which is what downstream
    shuffles touch."""
    import numpy as np

    from app_insights_generator_spark.operators.codecs import decode_bmp

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, content in zip(pdf[id_col], pdf["content"]):
                pxl = decode_bmp(bytes(content))
                h, w, _ = pxl.shape
                if h % patch or w % patch:
                    raise ValueError(
                        f"image {mid}: {h}x{w} not a multiple of patch {patch}"
                    )
                r = pxl[:, :, 0].astype(np.int64)
                grid = r.reshape(h // patch, patch, w // patch, patch)
                sums = grid.sum(axis=(1, 3))
                mins = grid.min(axis=(1, 3))
                maxs = grid.max(axis=(1, 3))
                for py in range(h // patch):
                    for px_ in range(w // patch):
                        out.append(
                            (
                                int(mid),
                                py,
                                px_,
                                int(sums[py, px_]),
                                int(mins[py, px_]),
                                int(maxs[py, px_]),
                            )
                        )
            yield pd.DataFrame(
                out, columns=["media_id", "py", "px", "r_sum", "r_min", "r_max"]
            )

    return media.mapInPandas(batches, schema=PATCH_SCHEMA)


def audio_decimate(
    media: DataFrame, id_col: str = "media_id", factor: int = 4
) -> DataFrame:
    """Integer-factor audio downsampling over REAL codec round trips:
    decode WAV -> keep every ``factor``-th sample -> RE-ENCODE at the
    reduced rate -> decode AGAIN and profile the result (count, exact
    sum of squares, peak). The double decode is the point: the gate
    covers the re-encoder's headers/chunk arithmetic at the new rate,
    not just the numpy stride. Plain decimation (no anti-alias filter)
    is stated, not hidden — the filtered variant changes sample values
    and belongs behind the same schema with a filter kernel argument."""
    import numpy as np

    from app_insights_generator_spark.operators.codecs import decode_wav, encode_wav

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("rate_out", IntegerType()),
            StructField("n_samples", LongType()),
            StructField("ssq", LongType()),
            StructField("peak", LongType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, content in zip(pdf[id_col], pdf["content"]):
                samples, rate = decode_wav(bytes(content))
                dec = samples[::factor]
                rate_out = rate // factor
                round_trip, rate_rt = decode_wav(encode_wav(dec, rate=rate_out))
                assert rate_rt == rate_out
                s = round_trip.astype(np.int64)
                out.append(
                    (
                        int(mid),
                        rate_out,
                        len(s),
                        int(np.sum(s * s)),
                        int(np.max(np.abs(s))) if len(s) else 0,
                    )
                )
            yield pd.DataFrame(
                out, columns=["media_id", "rate_out", "n_samples", "ssq", "peak"]
            )

    return media.mapInPandas(batches, schema=schema)
