"""Real media codecs in pure numpy/stdlib: WAV (PCM 16-bit mono) and BMP
(24-bit uncompressed).

These two formats are fully specified by fixed-layout headers + raw sample
/pixel payloads, so they decode with struct arithmetic alone — no Pillow,
no ffmpeg. They upgrade the multimodal path from "stubbed codec" to a REAL
decode for the uncompressed formats; compressed formats (JPEG/MP4/MP3)
remain stubbed behind ``decode_stub`` in operators/multimodal.py because
their codecs genuinely are not in this environment.

Everything here is bytes-in/bytes-out and deterministic, which is what the
Spark layer needs: the functions run inside Arrow-batched ``mapInPandas``
workers (operators/multimodal.py extract_real_media_features), one call
per row, no state.
"""

from __future__ import annotations

import struct

import numpy as np


# --- WAV (RIFF, PCM 16-bit little-endian, mono) ------------------------------

def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Minimal canonical RIFF/WAVE file: fmt chunk + data chunk."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Parse a RIFF/WAVE byte string -> (int16 sample array, sample rate).

    Walks the chunk list properly (fmt/data may be preceded by LIST or
    fact chunks in files from other writers); raises ValueError on
    anything that is not PCM-16 mono."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, pcm = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        # Truncated chunk: slicing short would silently yield a shortened
        # sample array (or an opaque numpy error on an odd remainder) —
        # the contract is malformed bytes RAISE, never emit garbage.
        if pos + 8 + size > len(data):
            raise ValueError(
                f"truncated {cid!r} chunk: declares {size} bytes, "
                f"{len(data) - pos - 8} remain"
            )
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body
            )
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError("only PCM-16 mono supported")
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or pcm is None:
        raise ValueError("missing fmt or data chunk")
    if len(pcm) % 2:
        raise ValueError(f"odd PCM-16 data chunk length {len(pcm)}")
    return np.frombuffer(pcm, dtype="<i2"), rate


# --- BMP (BITMAPINFOHEADER, 24-bit BGR, bottom-up) ---------------------------

def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit uncompressed BMP."""
    h, w, _ = pixels.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    # bottom-up rows, RGB -> BGR
    body = b"".join(
        pixels[y, :, ::-1].astype("u1").tobytes() + b"\x00" * pad
        for y in range(h - 1, -1, -1)
    )
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40)
    return header + dib + body


def decode_bmp(data: bytes) -> np.ndarray:
    """Parse a 24-bit uncompressed BMP -> (h, w, 3) uint8 RGB array."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP file")
    (offset,) = struct.unpack_from("<I", data, 10)
    hdr_size, w, h, _planes, bpp, compression = struct.unpack_from(
        "<IiiHHI", data, 14
    )
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError("only 24-bit uncompressed BMP supported")
    if h <= 0:
        raise ValueError("top-down BMP not supported")
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    out = np.empty((h, w, 3), dtype="u1")
    for y in range(h):
        row = np.frombuffer(data, dtype="u1", count=row_bytes, offset=offset + y * stride)
        out[h - 1 - y] = row.reshape(w, 3)[:, ::-1]  # BGR -> RGB, bottom-up
    return out
