"""Real media codecs in pure numpy/stdlib: WAV (PCM 16-bit mono), BMP
(24-bit uncompressed), PNG (zlib DEFLATE + all five scanline filters),
baseline-sequential JPEG (Huffman + DCT, grayscale), and animated GIF89a
(variable-width LZW).

WAV/BMP are fixed-layout headers + raw payloads; PNG and JPEG are REAL
compressed formats implemented against their public specs (RFC 2083 /
ITU T.81) with stdlib zlib and numpy only — no Pillow, no ffmpeg. MP4 is
a REAL ISO BMFF container implementation (ISO/IEC 14496-12 box tree +
full stts/stsc/stsz/stco sample-table reconstruction) carrying
uncompressed 'raw ' RGB24 video samples; of the whole codec set only
MOTION-COMPRESSED video payloads (H.264 etc. inside the container)
remain stubbed behind ``decode_stub`` in operators/multimodal.py — that
decode stack genuinely isn't reproducible here.

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


# --- JPEG (baseline sequential DCT, 8-bit grayscale, ITU T.81) ---------------
#
# A REAL compressed image codec in pure numpy/stdlib: forward/inverse 8x8
# DCT, quantization, zigzag, DPCM DC, run-length AC, canonical Huffman
# entropy coding with the public Annex K example tables, JFIF markers and
# 0xFF byte stuffing. Scope is baseline grayscale (one component, no
# chroma subsampling) — the full luma path every JPEG shares; color adds
# YCbCr conversion + interleaved MCUs, not new entropy-coding machinery.
# Reference stub this replaces: operators/multimodal.py decode_stub for
# image_jpeg (the reference repo has no codecs at all).

# ITU T.81 Annex K.3.1 typical luminance tables (public spec constants).
JPEG_DC_BITS = [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
JPEG_DC_VALS = list(range(12))
JPEG_AC_BITS = [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
JPEG_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

#: flat quantization table: lossless for any constant 8x8 block and the
#: exactness anchor for the SQL-oracled query (see synthesize_jpeg_media)
JPEG_QUANT_FLAT = np.ones((8, 8), dtype=np.uint8)

_ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

_DCT_N = np.arange(8)
_DCT_T = np.cos((2 * _DCT_N[None, :] + 1) * _DCT_N[:, None] * np.pi / 16) / 2
_DCT_T[0, :] *= 1 / np.sqrt(2)


def _huff_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: value -> (code, length)."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """Canonical Huffman: (length, code) -> value."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:  # pad with 1-bits per T.81 F.1.2.3
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        return bytes(self.buf)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def encode_jpeg(img: np.ndarray, quant: np.ndarray | None = None) -> bytes:
    """Encode an (h, w) uint8 grayscale image as a baseline sequential
    JFIF JPEG (one component, Annex K Huffman tables, caller-supplied
    8x8 quantization table; default flat 1s)."""
    img = np.asarray(img)
    if img.ndim != 2 or img.dtype != np.uint8:
        raise ValueError("encode_jpeg wants an (h, w) uint8 array")
    q = np.asarray(quant if quant is not None else JPEG_QUANT_FLAT, dtype=np.int64)
    if q.shape != (8, 8) or q.min() < 1 or q.max() > 255:
        raise ValueError("quant table must be 8x8 with entries in [1, 255]")
    h, w = img.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    bh, bw = -(-h // 8), -(-w // 8)
    padded = np.pad(img, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
    dc_tab = _huff_encode_table(JPEG_DC_BITS, JPEG_DC_VALS)
    ac_tab = _huff_encode_table(JPEG_AC_BITS, JPEG_AC_VALS)
    bits = _BitWriter()
    prev_dc = 0
    for by in range(bh):
        for bx in range(bw):
            block = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].astype(
                np.float64
            ) - 128.0
            coef = _DCT_T @ block @ _DCT_T.T
            qc = np.round(coef / q).astype(np.int64).ravel()[_ZIGZAG]
            diff = int(qc[0]) - prev_dc
            prev_dc = int(qc[0])
            cat = _category(diff)
            code, length = dc_tab[cat]
            bits.write(code, length)
            if cat:
                bits.write(diff if diff > 0 else diff + (1 << cat) - 1, cat)
            run = 0
            nz = np.nonzero(qc[1:])[0]
            last = nz[-1] + 1 if len(nz) else 0
            for i in range(1, last + 1):
                v = int(qc[i])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = ac_tab[0xF0]  # ZRL
                    bits.write(code, length)
                    run -= 16
                cat = _category(v)
                code, length = ac_tab[(run << 4) | cat]
                bits.write(code, length)
                bits.write(v if v > 0 else v + (1 << cat) - 1, cat)
                run = 0
            if last < 63:
                code, length = ac_tab[0x00]  # EOB
                bits.write(code, length)
    scan = bits.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    dqt = seg(0xFFDB, b"\x00" + q.astype(np.uint8).ravel()[_ZIGZAG].tobytes())
    sof = seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    dht = seg(
        0xFFC4,
        b"\x00" + bytes(JPEG_DC_BITS[1:]) + bytes(JPEG_DC_VALS)
        + b"\x10" + bytes(JPEG_AC_BITS[1:]) + bytes(JPEG_AC_VALS),
    )
    sos = seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return b"\xff\xd8" + dqt + sof + dht + sos + scan + b"\xff\xd9"


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy-coded data")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                    raise ValueError("unexpected marker inside JPEG scan")
                self.pos += 1  # skip stuffed 0x00
            self.acc = byte
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _huff_read(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | reader.read_bit()
        length += 1
        if (length, code) in table:
            return table[(length, code)]
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, cat: int) -> int:
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline sequential grayscale JPEG produced by any
    conforming encoder (single component, 8-bit, one DC + one AC Huffman
    table pair, no restart markers) into an (h, w) uint8 array. Validates
    markers, table slots, and the entropy stream; malformed bytes raise
    ValueError — never garbage pixels."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG file (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    h = w = None
    dc_slot = ac_slot = 0
    scan_start = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = struct.unpack_from(">H", data, pos)[0]
        if marker == 0xFFD9:
            break
        (seg_len,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + seg_len]
        if len(body) != seg_len - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xFFDB:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise ValueError("only 8-bit quant tables supported")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[_ZIGZAG] = np.frombuffer(body[i + 1 : i + 65], dtype=np.uint8)
                quant[tq] = tbl.reshape(8, 8)
                i += 65
        elif marker == 0xFFC4:
            i = 0
            while i < len(body):
                if i + 17 > len(body):
                    raise ValueError("truncated DHT segment header")
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = [0] + list(body[i + 1 : i + 17])
                n = sum(bits)
                if i + 17 + n > len(body):
                    raise ValueError(
                        f"truncated DHT segment: declares {n} values, "
                        f"{len(body) - i - 17} remain"
                    )
                vals = list(body[i + 17 : i + 17 + n])
                tab = _huff_decode_table(bits, vals)
                (huff_ac if tc else huff_dc)[th] = tab
                i += 17 + n
        elif marker == 0xFFC0:
            precision, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if precision != 8 or ncomp != 1:
                raise ValueError("only 8-bit single-component baseline supported")
            # component spec follows the 6-byte frame header: (id, HxV, Tq)
            if body[7] != 0x11:
                raise ValueError("subsampling unsupported for grayscale")
            q_slot = body[8]
        elif marker in (0xFFC1, 0xFFC2, 0xFFC3, 0xFFC5, 0xFFC6, 0xFFC7,
                        0xFFC9, 0xFFCA, 0xFFCB, 0xFFCD, 0xFFCE, 0xFFCF):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif marker == 0xFFDD:
            raise ValueError("restart intervals unsupported")
        elif marker == 0xFFDA:
            if body[0] != 1:
                raise ValueError("scan must cover exactly one component")
            dc_slot, ac_slot = body[2] >> 4, body[2] & 0x0F
            scan_start = pos + 2 + seg_len
            break
        pos += 2 + seg_len
    if scan_start is None or h is None:
        raise ValueError("missing SOS or SOF0 segment")
    if q_slot not in quant or dc_slot not in huff_dc or ac_slot not in huff_ac:
        raise ValueError("scan references undefined quant/Huffman table")
    end = data.rfind(b"\xff\xd9")
    if end < scan_start:
        raise ValueError("truncated JPEG: no EOI marker")
    reader = _BitReader(data[scan_start:end])
    q = quant[q_slot]
    dct, act = huff_dc[dc_slot], huff_ac[ac_slot]
    bh, bw = -(-h // 8), -(-w // 8)
    out = np.zeros((bh * 8, bw * 8), dtype=np.uint8)
    prev_dc = 0
    for by in range(bh):
        for bx in range(bw):
            qc = np.zeros(64, dtype=np.int64)
            cat = _huff_read(reader, dct)
            diff = _extend(reader.read_bits(cat), cat) if cat else 0
            prev_dc += diff
            qc[0] = prev_dc
            i = 1
            while i < 64:
                rs = _huff_read(reader, act)
                if rs == 0x00:  # EOB
                    break
                if rs == 0xF0:  # ZRL
                    i += 16
                    continue
                run, cat = rs >> 4, rs & 0x0F
                i += run
                if i > 63:
                    raise ValueError("JPEG AC run overflows block")
                qc[i] = _extend(reader.read_bits(cat), cat)
                i += 1
            coef = np.zeros(64, dtype=np.float64)
            coef[_ZIGZAG] = qc * q.ravel()[_ZIGZAG]
            block = _DCT_T.T @ coef.reshape(8, 8) @ _DCT_T
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                np.round(block + 128.0), 0, 255
            ).astype(np.uint8)
    return out[:h, :w]


# --- MP4 / ISO BMFF (ISO/IEC 14496-12): uncompressed 'raw ' video track ------
#
# Real container format, real sample tables: ftyp + mdat + moov with a
# single video track whose stsd carries the 'raw ' uncompressed RGB24
# VisualSampleEntry (the QuickTime/BMFF registered fourcc for raw video,
# analogous to BMP-inside-a-container). The box walker, sample-table
# reconstruction (stts/stsc/stsz/stco|co64), and bounds validation are
# fully general per the public spec; only MOTION-compressed payloads
# (H.264 etc.) remain out of scope in this environment.


def _box(tag: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + tag + body


def _full(tag: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(tag, struct.pack(">I", (version << 24) | flags) + body)


_MATRIX_UNITY = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)


def encode_mp4(frames: np.ndarray, fps: int = 10) -> bytes:
    """Minimal conformant ISO BMFF file: ``frames`` is (n, h, w, 3) uint8
    RGB; one sample per frame, one chunk, constant sample size, timescale
    = fps with delta-1 samples. Layout: ftyp, mdat, moov (so the stco
    chunk offset is known when moov is written)."""
    frames = np.asarray(frames, dtype="u1")
    if frames.ndim != 4 or frames.shape[3] != 3 or frames.shape[0] == 0:
        raise ValueError("frames must be (n, h, w, 3) uint8 with n >= 1")
    n, h, w, _ = frames.shape
    frame_bytes = h * w * 3

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2")
    mdat_payload = frames.tobytes()
    mdat = _box(b"mdat", mdat_payload)
    chunk_offset = len(ftyp) + 8  # absolute file offset of first sample

    # VisualSampleEntry 'raw ': 8 (reserved+dri) + 16 (pre_defined) +
    # dims + resolutions + frame_count + compressorname + depth.
    entry = (
        b"\0" * 6
        + struct.pack(">H", 1)          # data_reference_index
        + b"\0" * 16
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)          # frame_count per sample
        + bytes([7]) + b"rawrgb1" + b"\0" * 24  # compressorname (pascal)
        + struct.pack(">Hh", 24, -1)    # depth, pre_defined
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + _box(b"raw ", entry))
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, 1))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", frame_bytes, n))
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, chunk_offset))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)

    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)
    minf = _box(b"minf", vmhd + dinf + stbl)

    mdhd = _full(
        b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, fps, n, 0x55C4, 0)
    )  # language 'und'
    hdlr = _full(
        b"hdlr", 0, 0, struct.pack(">I", 0) + b"vide" + b"\0" * 12 + b"VideoHandler\0"
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)

    tkhd = _full(
        b"tkhd",
        0,
        3,  # enabled | in_movie
        struct.pack(">IIIII", 0, 0, 1, 0, n)
        + b"\0" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + _MATRIX_UNITY
        + struct.pack(">II", w << 16, h << 16),
    )
    trak = _box(b"trak", tkhd + mdia)

    mvhd = _full(
        b"mvhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, fps, n)
        + struct.pack(">iH", 0x00010000, 0x0100)
        + b"\0" * 10
        + _MATRIX_UNITY
        + b"\0" * 24
        + struct.pack(">I", 2),
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _walk_boxes(data: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for each box in [start, end);
    handles 64-bit largesize and size-0 (to-end) boxes; RAISES on any
    header truncation or size overrun — malformed bytes never yield a
    short or silently-dropped box (same contract as the WAV/PNG walkers)."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError("truncated MP4 box header")
        (size,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated MP4 largesize header")
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError(f"MP4 box {tag!r} size {size} overruns container")
        yield tag, pos + hdr, pos + size
        pos += size


def _boxes_dict(data: bytes, start: int, end: int) -> dict[bytes, tuple[int, int]]:
    return {tag: (s, e) for tag, s, e in _walk_boxes(data, start, end)}


def _need(boxes: dict[bytes, tuple[int, int]], tag: bytes, ctx: str) -> tuple[int, int]:
    if tag not in boxes:
        raise ValueError(f"{ctx} missing required {tag!r} box")
    return boxes[tag]


def decode_mp4(data: bytes) -> tuple[np.ndarray, int]:
    """Parse an ISO BMFF byte string -> ((n, h, w, 3) uint8 frames,
    duration_ms). Fully general sample-table reconstruction: multi-run
    stsc, per-sample stsz tables, stco or co64 chunk offsets, and
    foreign/`free` boxes are all handled; every sample extent is bounds-
    checked against the mdat payload. Frame timestamps derive uniformly
    from the mdhd duration (delta-1 samples, what encode_mp4 writes) —
    variable stts deltas would affect timing only, never offsets.
    Raises ValueError on non-BMFF
    bytes, truncation, a non-'raw ' codec (compressed video is the one
    documented out-of-scope payload), depth != 24, or any sample that
    does not match width*height*3."""
    top = list(_walk_boxes(data, 0, len(data)))
    if not top or top[0][0] != b"ftyp":
        raise ValueError("not an ISO BMFF file: first box must be ftyp")
    boxes = {tag: (s, e) for tag, s, e in top}
    mdats = [(s, e) for tag, s, e in top if tag == b"mdat"]
    if b"moov" not in boxes or not mdats:
        raise ValueError("MP4 missing moov or mdat box")
    # First mdat wins: dict-style last-wins would silently retarget every
    # chunk offset in a multi-mdat file to the wrong payload.
    mdat_start, mdat_end = mdats[0]

    moov_children = list(_walk_boxes(data, *boxes[b"moov"]))
    moov = {tag: (s, e) for tag, s, e in moov_children}
    traks = [(s, e) for tag, s, e in moov_children if tag == b"trak"]
    if b"mvhd" not in moov or not traks:
        raise ValueError("moov missing mvhd or trak")
    # Walk ALL trak boxes and select the first video ('vide' handler)
    # track — a dict keyed by tag keeps only the last trak, so a
    # video-then-audio file would wrongly inspect the audio track.
    mdia = None
    for trak_s, trak_e in traks:
        trak = _boxes_dict(data, trak_s, trak_e)
        cand = _boxes_dict(data, *_need(trak, b"mdia", "trak"))
        hdlr_s, hdlr_e = _need(cand, b"hdlr", "mdia")
        if hdlr_e - hdlr_s >= 12 and data[hdlr_s + 8 : hdlr_s + 12] == b"vide":
            mdia = cand
            break
    if mdia is None:
        raise ValueError("no video ('vide' handler) track found")
    mdhd_s, mdhd_e = _need(mdia, b"mdhd", "mdia")
    if mdhd_e - mdhd_s < 20:
        raise ValueError(f"mdhd box too short: {mdhd_e - mdhd_s} bytes")
    version = data[mdhd_s]
    if version == 0:
        timescale, duration = struct.unpack_from(">II", data, mdhd_s + 12)
    elif version == 1:
        # v1 body is 32 bytes (4 version/flags + 8+8 times + 4 timescale
        # + 8 duration); bound the read by the BOX END, not the buffer —
        # a v0 box with a corrupted version byte must raise, not read the
        # next box's header as timescale/duration.
        if mdhd_e - mdhd_s < 32:
            raise ValueError(
                f"mdhd v1 box too short: {mdhd_e - mdhd_s} bytes, want >= 32"
            )
        timescale, duration = struct.unpack_from(">IQ", data, mdhd_s + 20)
    else:
        raise ValueError(f"unsupported mdhd version {version}")
    if timescale == 0:
        raise ValueError("mdhd timescale is zero")
    minf = _boxes_dict(data, *_need(mdia, b"minf", "mdia"))
    stbl = _boxes_dict(data, *_need(minf, b"stbl", "minf"))
    for need in (b"stsd", b"stsc", b"stsz"):
        if need not in stbl:
            raise ValueError(f"stbl missing {need!r}")

    # stsd -> require the uncompressed 'raw ' RGB24 sample entry
    stsd_s, stsd_e = stbl[b"stsd"]
    if stsd_e - stsd_s < 8:
        raise ValueError(f"stsd box too short: {stsd_e - stsd_s} bytes")
    (entry_count,) = struct.unpack_from(">I", data, stsd_s + 4)
    if entry_count != 1:
        raise ValueError(f"expected 1 stsd entry, found {entry_count}")
    entries = list(_walk_boxes(data, stsd_s + 8, stsd_e))
    fourcc, ent_s, ent_e = entries[0]
    if ent_e - ent_s < 78:
        raise ValueError(
            f"VisualSampleEntry too short: {ent_e - ent_s} bytes, want >= 78"
        )
    if fourcc != b"raw ":
        raise ValueError(
            f"unsupported video codec {fourcc!r}: only uncompressed 'raw ' "
            "RGB is decodable here (motion-compressed payloads are the "
            "documented out-of-scope case)"
        )
    w, h = struct.unpack_from(">HH", data, ent_s + 24)
    (depth,) = struct.unpack_from(">H", data, ent_s + 74)
    if depth != 24:
        raise ValueError(f"unsupported raw-video depth {depth} (want RGB24)")
    if w == 0 or h == 0:
        raise ValueError("zero-dimension video track")
    frame_bytes = w * h * 3

    # stsz: constant size or per-sample table
    stsz_s, stsz_e = stbl[b"stsz"]
    const_size, n_samples = struct.unpack_from(">II", data, stsz_s + 4)
    if n_samples == 0:
        raise ValueError("video track has zero samples")
    if const_size:
        sizes = [const_size] * n_samples
    else:
        if stsz_s + 12 + 4 * n_samples > stsz_e:
            raise ValueError("truncated stsz sample-size table")
        sizes = list(struct.unpack_from(f">{n_samples}I", data, stsz_s + 12))

    # chunk offsets: stco (u32) or co64 (u64)
    if b"stco" in stbl:
        co_s, co_e = stbl[b"stco"]
        (n_chunks,) = struct.unpack_from(">I", data, co_s + 4)
        if co_s + 8 + 4 * n_chunks > co_e:
            raise ValueError("truncated stco chunk-offset table")
        offsets = list(struct.unpack_from(f">{n_chunks}I", data, co_s + 8))
    elif b"co64" in stbl:
        co_s, co_e = stbl[b"co64"]
        (n_chunks,) = struct.unpack_from(">I", data, co_s + 4)
        if co_s + 8 + 8 * n_chunks > co_e:
            raise ValueError("truncated co64 chunk-offset table")
        offsets = list(struct.unpack_from(f">{n_chunks}Q", data, co_s + 8))
    else:
        raise ValueError("stbl missing stco/co64")

    # stsc runs -> samples per chunk
    stsc_s, stsc_e = stbl[b"stsc"]
    (n_runs,) = struct.unpack_from(">I", data, stsc_s + 4)
    if stsc_s + 8 + 12 * n_runs > stsc_e:
        raise ValueError("truncated stsc table")
    runs = [
        struct.unpack_from(">III", data, stsc_s + 8 + 12 * i) for i in range(n_runs)
    ]
    if not runs or runs[0][0] != 1:
        raise ValueError("stsc must start at chunk 1")

    # Reconstruct per-sample absolute offsets chunk by chunk.
    sample_offsets: list[int] = []
    si = 0
    for ci in range(len(offsets)):
        per_chunk = next(
            spc for first, spc, _ in reversed(runs) if first <= ci + 1
        )
        pos = offsets[ci]
        for _ in range(per_chunk):
            if si >= n_samples:
                break
            sample_offsets.append(pos)
            pos += sizes[si]
            si += 1
    if si != n_samples:
        raise ValueError(
            f"sample tables inconsistent: placed {si} of {n_samples} samples"
        )

    frames = np.empty((n_samples, h, w, 3), dtype="u1")
    for i, (off, size) in enumerate(zip(sample_offsets, sizes)):
        if size != frame_bytes:
            raise ValueError(
                f"sample {i} size {size} != width*height*3 = {frame_bytes}"
            )
        if off < mdat_start or off + size > mdat_end:
            raise ValueError(f"sample {i} extent [{off}, {off + size}) escapes mdat")
        frames[i] = np.frombuffer(data, dtype="u1", count=size, offset=off).reshape(
            h, w, 3
        )
    return frames, duration * 1000 // timescale


# --- GIF89a (variable-width LZW, animated) -----------------------------------
#
# Written against the public GIF89a specification (CompuServe, 1990) and
# the standard GIF-LZW description: variable code width starting at
# min_code_size+1, LSB-first bit packing, CLEAR/EOI codes, dictionary
# reset at 4096 entries, data carried in <=255-byte sub-blocks.
# Supported subset (encoder writes exactly this; decoder RAISES on
# anything else rather than guessing): global 256-color table, no
# interlace, no local color tables, no transparency; animation via one
# Graphic Control Extension per frame with centisecond delays.


def _lzw_encode(indices: bytes, min_code_size: int = 8) -> bytes:
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    out_bits: list[tuple[int, int]] = [(clear, width)]

    s = b""
    for ch in indices:
        cand = s + bytes([ch])
        if cand in table:
            s = cand
            continue
        out_bits.append((table[s], width))
        if next_code < 4096:
            table[cand] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            out_bits.append((clear, width))
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        s = bytes([ch])
    if s:
        out_bits.append((table[s], width))
    out_bits.append((eoi, width))

    acc = n_acc = 0
    data = bytearray()
    for code, w in out_bits:
        acc |= code << n_acc
        n_acc += w
        while n_acc >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            n_acc -= 8
    if n_acc:
        data.append(acc & 0xFF)
    return bytes(data)


def _lzw_decode(data: bytes, n_expected: int, min_code_size: int = 8) -> bytes:
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = n_acc = pos = 0
    prev: bytes | None = None
    while True:
        while n_acc < width:
            if pos >= len(data):
                raise ValueError("GIF LZW stream truncated before EOI")
            acc |= data[pos] << n_acc
            pos += 1
            n_acc += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        n_acc -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError(f"GIF LZW first code {code} not in table")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"GIF LZW code {code} beyond table {len(table)}")
        out += entry
        # Width grows when the NEXT append would need it (table size hits
        # the current width's capacity), capped at 12 bits per the spec.
        if len(table) == (1 << width) and width < 12:
            width += 1
        prev = entry
        if len(out) > n_expected:
            raise ValueError(
                f"GIF LZW output overruns frame: {len(out)} > {n_expected}"
            )
    if len(out) != n_expected:
        raise ValueError(f"GIF frame decoded {len(out)} of {n_expected} pixels")
    return bytes(out)


def encode_gif(
    frames: np.ndarray, palette: np.ndarray, delay_cs: int = 10
) -> bytes:
    """(n, h, w) uint8 palette indices + (256, 3) uint8 palette ->
    animated GIF89a bytes, ``delay_cs`` centiseconds per frame."""
    if frames.ndim != 3 or frames.dtype != np.uint8:
        raise ValueError("frames must be (n, h, w) uint8 palette indices")
    if palette.shape != (256, 3) or palette.dtype != np.uint8:
        raise ValueError("palette must be (256, 3) uint8")
    n, h, w = frames.shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0xF7, 0, 0])  # global table, 8-bit, bg 0, square pixels
    out += palette.tobytes()
    for f in range(n):
        out += bytes([0x21, 0xF9, 4, 0x00])  # GCE: disposal none, no transp
        out += struct.pack("<H", delay_cs)
        out += bytes([0, 0])  # transparent idx (unused), terminator
        out += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, w, h) + bytes([0])
        out += bytes([8])  # LZW min code size
        lzw = _lzw_encode(frames[f].tobytes())
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += bytes([0])  # block terminator
    out += bytes([0x3B])
    return bytes(out)


def decode_gif(data: bytes) -> tuple[np.ndarray, int]:
    """GIF89a bytes -> ((n, h, w, 3) uint8 RGB frames, duration_ms).
    Raises ValueError on non-GIF bytes, truncation, interlace, local
    color tables, transparency, or any LZW inconsistency."""
    if len(data) < 13 or data[:6] not in (b"GIF89a", b"GIF87a"):
        raise ValueError("not a GIF file")
    w, h = struct.unpack_from("<HH", data, 6)
    packed, _bg, _aspect = data[10], data[11], data[12]
    if not packed & 0x80:
        raise ValueError("GIF without a global color table is unsupported")
    gct_size = 2 << (packed & 0x07)
    pos = 13
    if pos + 3 * gct_size > len(data):
        raise ValueError("GIF global color table truncated")
    palette = np.frombuffer(data, dtype="u1", count=3 * gct_size, offset=pos)
    palette = palette.reshape(gct_size, 3)
    pos += 3 * gct_size

    frames: list[np.ndarray] = []
    total_cs = 0
    pending_delay = 0
    while True:
        if pos >= len(data):
            raise ValueError("GIF truncated before trailer")
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos + 1 > len(data):
                raise ValueError("GIF extension truncated")
            label = data[pos]
            pos += 1
            if label == 0xF9:
                if pos + 6 > len(data) or data[pos] != 4:
                    raise ValueError("GIF graphic control extension malformed")
                gce_packed = data[pos + 1]
                if gce_packed & 0x01:
                    raise ValueError("GIF transparency is unsupported")
                (pending_delay,) = struct.unpack_from("<H", data, pos + 2)
                pos += 5
                if data[pos] != 0:
                    raise ValueError("GIF GCE missing terminator")
                pos += 1
            else:  # skip other extensions block-wise
                while True:
                    if pos >= len(data):
                        raise ValueError("GIF extension sub-blocks truncated")
                    sz = data[pos]
                    pos += 1
                    if sz == 0:
                        break
                    pos += sz
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        if pos + 9 > len(data):
            raise ValueError("GIF image descriptor truncated")
        left, top, fw, fh = struct.unpack_from("<HHHH", data, pos)
        ipacked = data[pos + 8]
        pos += 9
        if (left, top, fw, fh) != (0, 0, w, h):
            raise ValueError("GIF partial-canvas frames are unsupported")
        if ipacked & 0x80:
            raise ValueError("GIF local color tables are unsupported")
        if ipacked & 0x40:
            raise ValueError("GIF interlace is unsupported")
        if pos >= len(data):
            raise ValueError("GIF LZW header truncated")
        min_code = data[pos]
        pos += 1
        if min_code != 8:
            raise ValueError(f"GIF min code size {min_code} != 8 unsupported")
        lzw = bytearray()
        while True:
            if pos >= len(data):
                raise ValueError("GIF image sub-blocks truncated")
            sz = data[pos]
            pos += 1
            if sz == 0:
                break
            if pos + sz > len(data):
                raise ValueError("GIF image sub-block overruns file")
            lzw += data[pos : pos + sz]
            pos += sz
        idx = np.frombuffer(
            _lzw_decode(bytes(lzw), fw * fh), dtype="u1"
        ).reshape(fh, fw)
        frames.append(palette[idx])
        total_cs += pending_delay
        pending_delay = 0
    if not frames:
        raise ValueError("GIF contains no image data")
    return np.stack(frames), total_cs * 10
