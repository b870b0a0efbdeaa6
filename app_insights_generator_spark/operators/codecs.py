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


# --- PNG (RFC 2083: zlib-deflated, per-row filtered scanlines) ---------------
#
# PNG is the first REAL compressed format in the codec set: the payload is
# zlib-DEFLATE (Python stdlib — always available, no Pillow needed) over
# per-row filtered scanlines. The decoder implements the full baseline
# spec surface for 8-bit images: all five filter types (None/Sub/Up/
# Average/Paeth), greyscale / RGB / RGBA color types, CRC validation, and
# multi-IDAT streams. The encoder emits filter-0 rows by default but can
# be told a filter per image to exercise every decoder path in tests.

import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_COLOR_CHANNELS = {0: 1, 2: 3, 6: 4}  # grey, RGB, RGBA


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode an (h, w) uint8 greyscale, (h, w, 3) RGB, or (h, w, 4) RGBA
    array as an 8-bit PNG. ``filter_type`` applies one filter to every
    scanline (0..4) — non-zero values exist to exercise decoder paths."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    color = {1: 0, 3: 2, 4: 6}[ch]
    raw = bytearray()
    prev = np.zeros((w, ch), dtype=np.int16)
    for y in range(h):
        row = px[y].astype(np.int16)
        if filter_type == 0:
            filt = row
        elif filter_type == 1:  # Sub
            left = np.vstack([np.zeros((1, ch), np.int16), row[:-1]])
            filt = row - left
        elif filter_type == 2:  # Up
            filt = row - prev
        elif filter_type == 3:  # Average
            left = np.vstack([np.zeros((1, ch), np.int16), row[:-1]])
            filt = row - (left + prev) // 2
        elif filter_type == 4:  # Paeth
            left = np.vstack([np.zeros((1, ch), np.int16), row[:-1]])
            upleft = np.vstack([np.zeros((1, ch), np.int16), prev[:-1]])
            filt = row - _paeth(left, prev, upleft)
        else:
            raise ValueError(f"unknown filter {filter_type}")
        raw.append(filter_type)
        raw.extend((filt % 256).astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Per-element Paeth predictor over int16 arrays."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced greyscale/RGB/RGBA PNG into an
    (h, w[, ch]) uint8 array. Validates the signature, every chunk CRC,
    and the scanline stream length; malformed bytes raise ValueError."""
    if len(data) < 8 or data[:8] != _PNG_SIG:
        raise ValueError("not a PNG file")
    pos, ihdr, idat, saw_iend = 8, None, bytearray(), False
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        if pos + 12 + length > len(data):
            raise ValueError(f"truncated {tag!r} chunk")
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            saw_iend = True
            break
        pos += 12 + length
    if not saw_iend:
        # The walk ran off the end of the buffer (or stopped at a partial
        # trailing chunk header) without ever reaching IEND: the stream is
        # truncated even if IHDR/IDAT were fully collected.
        raise ValueError("truncated PNG: no IEND chunk")
    if ihdr is None or not idat:
        raise ValueError("missing IHDR or IDAT chunk")
    w, h, depth, color, comp, filt_m, interlace = ihdr
    if depth != 8 or color not in _COLOR_CHANNELS or comp != 0 or interlace != 0:
        raise ValueError("only 8-bit non-interlaced grey/RGB/RGBA supported")
    ch = _COLOR_CHANNELS[color]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (1 + stride):
        raise ValueError(
            f"scanline stream is {len(raw)} bytes, expected {h * (1 + stride)}"
        )
    out = np.zeros((h, w, ch), dtype=np.uint8)
    prev = np.zeros((w, ch), dtype=np.int16)
    for y in range(h):
        ft = raw[y * (1 + stride)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (1 + stride) + 1
        ).reshape(w, ch).astype(np.int16)
        if ft == 0:
            row = line
        elif ft == 2:  # Up
            row = (line + prev) % 256
        elif ft in (1, 3, 4):  # Sub / Average / Paeth need left -> sequential
            row = np.zeros((w, ch), dtype=np.int16)
            for x in range(w):
                left = row[x - 1] if x else np.zeros(ch, np.int16)
                if ft == 1:
                    row[x] = (line[x] + left) % 256
                elif ft == 3:
                    row[x] = (line[x] + (left + prev[x]) // 2) % 256
                else:
                    upleft = prev[x - 1] if x else np.zeros(ch, np.int16)
                    row[x] = (line[x] + _paeth(left, prev[x], upleft)) % 256
        else:
            raise ValueError(f"unknown scanline filter {ft}")
        out[y] = row.astype(np.uint8)
        prev = row
    return out[:, :, 0] if ch == 1 else out
