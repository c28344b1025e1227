"""Multimodal column handling: opaque binary payloads with typed metadata.

Design (the standard lakehouse pattern for image/audio/video at scale):
media lives in a ``binary`` column (or object-store URI) next to typed
metadata; decode / feature-extraction run as Arrow-batched Pandas
functions over ``mapInPandas`` so bytes never round-trip through Python
row objects.

Decode is REAL for every format a pure-numpy/pure-Python codec can
cover: binary PPM/PGM (P6/P5) and uncompressed BMP (24/32-bit BI_RGB)
images, PNG (stdlib ``zlib`` inflate + per-row unfilter — all five
filter types, gray/RGB/palette/alpha at bit depth 8), baseline
sequential JPEG (SOF0: Huffman entropy decode, dequantize, float64
matrix IDCT, chroma upsample, JFIF YCbCr→RGB — plus the matching
encoder) (``decode_media`` / ``resize_images``), PCM WAV audio
(``audio_features``), and YUV4MPEG2 uncompressed video
(``frame_sample``).  Codecs with no public-spec pure-Python path at
reasonable effort (progressive/arithmetic JPEG, mp4/mkv) raise a
clearly-marked NotImplementedError from the same code paths a real
codec (PIL/pyav) would slot into.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata carried next to every payload
MEDIA_META = T.StructType(
    [
        T.StructField("mime_type", T.StringType(), False),
        T.StructField("byte_len", T.LongType(), False),
        T.StructField("sha256", T.StringType(), False),
    ]
)

FEATURE_BINS = 16

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), False),
    ]
)


def attach_payload(docs: DataFrame, text_col: str = "text", mime: str = "text/plain") -> DataFrame:
    """Wrap a source column as an opaque binary payload + typed metadata —
    the ingest shape for any media type (for images/audio, the bytes come
    from the object store instead of ``encode``)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit(mime).alias("mime_type"),
            F.octet_length(payload).cast("long").alias("byte_len"),
            F.sha2(payload, 256).alias("sha256"),
        ).alias("media_meta"),
    )


# --- vendored pure-numpy image codecs (PPM/PGM + uncompressed BMP) ----------
# ~60 lines replacing PIL for the formats whose bytes ARE the pixels; the
# executor-side work is np.frombuffer + reshape — zero Python per pixel.


def _decode_pnm(raw: bytes) -> tuple[int, int, int, np.ndarray]:
    """Binary PPM (P6, RGB) / PGM (P5, gray), maxval ≤ 255.  Returns
    (height, width, channels, uint8 array of shape h×w×c)."""
    toks: list[bytes] = []
    pos = 0
    while len(toks) < 4:
        while pos < len(raw) and raw[pos : pos + 1].isspace():
            pos += 1
        if raw[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(raw) and raw[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(raw) and not raw[pos : pos + 1].isspace():
            pos += 1
        toks.append(raw[start:pos])
    pos += 1  # exactly one whitespace byte separates maxval from raster
    magic, w, h, maxval = toks[0], int(toks[1]), int(toks[2]), int(toks[3])
    if maxval > 255:
        raise NotImplementedError("16-bit PNM not supported")
    c = 3 if magic == b"P6" else 1
    px = np.frombuffer(raw, np.uint8, h * w * c, pos).reshape(h, w, c)
    return h, w, c, px


def _decode_bmp(raw: bytes) -> tuple[int, int, int, np.ndarray]:
    """Uncompressed (BI_RGB) 24/32-bit BMP.  Returns (h, w, 3, RGB array)
    — rows un-flipped from the file's bottom-up layout, alpha dropped."""
    data_off = struct.unpack_from("<I", raw, 10)[0]
    w, h_signed = struct.unpack_from("<ii", raw, 18)
    bpp = struct.unpack_from("<H", raw, 28)[0]
    comp = struct.unpack_from("<I", raw, 30)[0]
    if comp != 0 or bpp not in (24, 32):
        raise NotImplementedError(f"BMP compression={comp} bpp={bpp} not supported")
    h = abs(h_signed)
    nbytes = bpp // 8
    stride = (nbytes * w + 3) // 4 * 4  # rows pad to 4-byte boundaries
    rows = np.frombuffer(raw, np.uint8, stride * h, data_off).reshape(h, stride)
    px = rows[:, : w * nbytes].reshape(h, w, nbytes)
    if h_signed > 0:  # positive height = bottom-up storage
        px = px[::-1]
    return h, w, 3, np.ascontiguousarray(px[..., 2::-1])  # BGR(A) → RGB


# --- PNG: stdlib zlib inflate + per-row unfilter -----------------------------
# No PIL needed: PNG's only compression is DEFLATE (stdlib zlib) and its
# filters are defined byte arithmetic.  Supported honestly: bit depth 8,
# color types 0/2/3/4/6, interlace 0 — i.e. every PNG a data pipeline
# writes; exotic variants (16-bit, Adam7) raise clearly.

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

#: samples per pixel by PNG color type (3=palette indexes into PLTE)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_unfilter(data: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG row filters (None/Sub/Up/Average/Paeth) → (h, stride)
    uint8.  Sub and Up are fully vectorized (per-lane cumsum / row add);
    Average and Paeth carry a true left-to-right data dependence, walked
    per pixel with the ``bpp`` lanes vectorized."""
    out = np.empty((h, stride), np.int64)
    pos = 0
    prev = np.zeros(stride, np.int64)
    for y in range(h):
        ft = data[pos]
        row = np.frombuffer(data, np.uint8, stride, pos + 1).astype(np.int64)
        pos += 1 + stride
        if ft == 0:
            cur = row
        elif ft == 1:  # Sub: recon[x] = raw[x] + recon[x-bpp] → lane cumsum
            cur = np.cumsum(row.reshape(-1, bpp), axis=0).reshape(-1) & 0xFF
        elif ft == 2:  # Up
            cur = (row + prev) & 0xFF
        elif ft == 3:  # Average
            cur = np.empty(stride, np.int64)
            left = np.zeros(bpp, np.int64)
            for x in range(0, stride, bpp):
                left = (row[x : x + bpp] + ((left + prev[x : x + bpp]) >> 1)) & 0xFF
                cur[x : x + bpp] = left
        elif ft == 4:  # Paeth
            cur = np.empty(stride, np.int64)
            left = np.zeros(bpp, np.int64)
            upleft = np.zeros(bpp, np.int64)
            for x in range(0, stride, bpp):
                up = prev[x : x + bpp]
                p = left + up - upleft
                pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft)
                )
                left = (row[x : x + bpp] + pred) & 0xFF
                cur[x : x + bpp] = left
                upleft = up
        else:
            raise NotImplementedError(f"PNG filter type {ft}")
        out[y] = cur
        prev = cur
    return out.astype(np.uint8)


def _decode_png(raw: bytes) -> tuple[int, int, int, np.ndarray]:
    """PNG at bit depth 8, non-interlaced.  Returns (h, w, c, uint8
    h×w×c) with palette expanded to RGB and alpha dropped — the same
    output convention as the PNM/BMP decoders."""
    pos = 8
    ihdr = plte = None
    idat: list[bytes] = []
    while pos + 8 <= len(raw):
        ln = int.from_bytes(raw[pos : pos + 4], "big")
        typ = raw[pos + 4 : pos + 8]
        body = raw[pos + 8 : pos + 8 + ln]
        if typ == b"IHDR":
            ihdr = body
        elif typ == b"PLTE":
            plte = body
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"IEND":
            break
        pos += 12 + ln  # length + type + data + CRC
    if ihdr is None or not idat:
        raise NotImplementedError("PNG missing IHDR/IDAT")
    w, h = struct.unpack(">II", ihdr[:8])
    depth, ctype, comp, filt, interlace = ihdr[8:13]
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise NotImplementedError(
            f"PNG depth={depth} interlace={interlace} not supported "
            "(bit depth 8, non-interlaced only)"
        )
    if ctype not in _PNG_CHANNELS:
        raise NotImplementedError(f"PNG color type {ctype}")
    spp = _PNG_CHANNELS[ctype]
    data = zlib.decompress(b"".join(idat))
    px = _png_unfilter(data, h, w * spp, spp).reshape(h, w, spp)
    if ctype == 3:
        if plte is None:
            raise NotImplementedError("palette PNG missing PLTE")
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        return h, w, 3, np.ascontiguousarray(pal[px[..., 0]])
    if ctype == 4:  # gray+alpha → gray
        px = px[..., :1]
    elif ctype == 6:  # RGBA → RGB (alpha dropped, like 32-bit BMP)
        px = px[..., :3]
    return h, w, px.shape[2], np.ascontiguousarray(px)


def encode_png(arr: np.ndarray) -> bytes:
    """Minimal PNG encoder for h×w×c uint8 (c=1 gray, c=3 RGB) — row
    filter cycles y % 5 so a round-trip exercises every filter type.
    The writer half of the codec: lets payload-out operators emit a
    compressed standard format instead of raw PPM."""
    arr = np.ascontiguousarray(arr.astype(np.uint8))
    h, w, c = arr.shape
    ctype = {1: 0, 3: 2}[c]
    flat = arr.reshape(h, w * c).astype(np.int64)
    parts = []
    prev = np.zeros(w * c, np.int64)
    for y in range(h):
        ft = y % 5
        cur = flat[y]
        left = np.concatenate([np.zeros(c, np.int64), cur[:-c]])
        upleft = np.concatenate([np.zeros(c, np.int64), prev[:-c]])
        if ft == 0:
            enc = cur
        elif ft == 1:
            enc = cur - left
        elif ft == 2:
            enc = cur - prev
        elif ft == 3:
            enc = cur - ((left + prev) >> 1)
        else:
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            enc = cur - pred
        parts.append(bytes([ft]) + (enc & 0xFF).astype(np.uint8).tobytes())
        prev = cur

    def chunk(typ: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + typ
            + body
            + struct.pack(">I", zlib.crc32(typ + body))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(parts)))
        + chunk(b"IEND", b"")
    )


# --- JPEG: baseline sequential (SOF0) decode + encode ------------------------
# Pure numpy + stdlib, from the public spec (ITU-T T.81 / JFIF): Huffman
# entropy decode (tables read from the file's own DHT segments), dequantize,
# 8×8 IDCT as two float64 matrix products, nearest-neighbor chroma upsample,
# JFIF YCbCr→RGB.  Supported honestly: 8-bit baseline, 1 or 3 components,
# sampling factors 1-2 (4:4:4 / 4:2:2 / 4:4:0 / 4:2:0), restart intervals.
# Progressive (SOF2) / arithmetic coding / 12-bit raise clearly.

#: orthonormal 8×8 DCT-II basis: A[u, x] = C(u)/2 · cos((2x+1)uπ/16);
#: forward F = A f Aᵀ, inverse f = Aᵀ F A (T.81 A.3.3)
_DCT_A = np.array(
    [
        [
            (np.sqrt(0.125) if u == 0 else 0.5) * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)

#: zig-zag scan order: _ZIGZAG[k] = flat index (8u+v) of the k-th coefficient
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

# standard Huffman tables (T.81 Annex K.3): (bits[1..16], values)
_STD_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_STD_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

#: Annex K.1 luminance quantization table (quality scaling per IJG)
_STD_QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ]
).reshape(8, 8)
_STD_QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ]
).reshape(8, 8)


def _huff_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman assignment (T.81 C.2): symbol -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


#: Huffman peek tables are pure functions of the DHT bytes — cache across
#: images so per-image decode cost is lookups, not table builds
_HUFF_CACHE: dict[tuple[bytes, bytes], np.ndarray] = {}


def _huff_lookup(bits: list[int], values: list[int]) -> np.ndarray:
    """16-bit-window peek table: tab[next16bits] = (symbol << 5) | code
    length (0 = invalid code) — one array read decodes a whole symbol,
    replacing bit-at-a-time tree walking (the standard fast-JPEG trick;
    16 is the max code length, T.81 C.2)."""
    key = (bytes(bits), bytes(values))
    hit = _HUFF_CACHE.get(key)
    if hit is not None:
        return hit
    tab = np.zeros(1 << 16, np.int32)
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            base = code << (16 - ln)
            tab[base : base + (1 << (16 - ln))] = (values[k] << 5) | ln
            code += 1
            k += 1
        code <<= 1
    _HUFF_CACHE[key] = tab
    return tab


class _BitReader:
    """MSB-first bit reader over an entropy-coded segment (already
    de-stuffed: 0xFF00 -> 0xFF)."""

    def __init__(self, data: bytes):
        # pad so peek16 never indexes past the end (1-bits = no valid
        # code can be formed from pure padding; the MCU loop stops first)
        self.data = data + b"\xff\xff\xff"
        self.pos = 0  # bit position

    def peek16(self) -> int:
        p = self.pos >> 3
        v = int.from_bytes(self.data[p : p + 3], "big")
        return (v >> (8 - (self.pos & 7))) & 0xFFFF

    def bits(self, n: int) -> int:
        v = self.peek16() >> (16 - n)
        self.pos += n
        return v


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the `size`-bit raw value to its signed
    coefficient (values with MSB 0 are negative)."""
    return v if size == 0 or v >= (1 << (size - 1)) else v - (1 << size) + 1


def _decode_jpeg(raw: bytes) -> tuple[int, int, int, np.ndarray]:
    """Baseline sequential JPEG (SOF0).  Returns (h, w, c, uint8 h×w×c)
    — grayscale stays 1 channel, color converts JFIF YCbCr→RGB; the same
    output convention as the PNM/BMP/PNG decoders."""
    pos = 2  # past SOI
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    scan = None
    while pos + 4 <= len(raw):
        if raw[pos] != 0xFF:
            raise NotImplementedError(f"bad JPEG marker alignment at {pos}")
        marker = raw[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seg_len = int.from_bytes(raw[pos + 2 : pos + 4], "big")
        body = raw[pos + 4 : pos + 2 + seg_len]
        pos += 2 + seg_len
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            p = 0
            while p < len(body):
                prec, tid = body[p] >> 4, body[p] & 15
                if prec != 0:
                    raise NotImplementedError("16-bit quant tables not supported")
                quant[tid] = np.frombuffer(
                    body, np.uint8, 64, p + 1
                ).astype(np.int64)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                cls, tid = body[p] >> 4, body[p] & 15
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                vals = list(body[p + 17 : p + 17 + n])
                (huff_dc if cls == 0 else huff_ac)[tid] = _huff_lookup(bits, vals)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            depth = body[0]
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            nc = body[5]
            if depth != 8:
                raise NotImplementedError(f"JPEG sample precision {depth}")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"only baseline sequential JPEG (SOF0) is supported; got SOF{marker & 15}"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[:2], "big")
        elif marker == 0xDA:  # SOS — entropy-coded data follows the header
            ns = body[0]
            scan_comps = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i : 3 + 2 * i]
                scan_comps.append({"id": cs, "td": tt >> 4, "ta": tt & 15})
            scan = (scan_comps, pos)
            break
        # APPn/COM/others: skipped by the generic seg_len advance
    if frame is None or scan is None:
        raise NotImplementedError("JPEG missing SOF0/SOS")
    h, w, comps = frame
    scan_comps, data_start = scan
    by_id = {c["id"]: c for c in comps}
    for sc in scan_comps:
        by_id[sc["id"]].update(td=sc["td"], ta=sc["ta"])

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2:
        raise NotImplementedError("sampling factors above 2 not supported")
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    for c in comps:
        c["bw"] = mcus_x * c["h"]  # blocks per row incl. MCU padding
        c["bh"] = mcus_y * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), np.int64)

    # entropy-coded segments: de-stuff 0xFF00, split at RST markers
    end = len(raw)
    i = data_start
    segments: list[bytes] = []
    seg_start = i
    while i + 1 < end:
        if raw[i] == 0xFF and raw[i + 1] not in (0x00,):
            m = raw[i + 1]
            if 0xD0 <= m <= 0xD7:  # RSTn
                segments.append(raw[seg_start:i])
                i += 2
                seg_start = i
                continue
            segments.append(raw[seg_start:i])  # EOI or next marker
            break
        i += 2 if raw[i] == 0xFF else 1
    else:
        segments.append(raw[seg_start:end])
    segments = [s.replace(b"\xff\x00", b"\xff") for s in segments]

    n_mcus = mcus_x * mcus_y
    mcu_idx = 0
    for seg in segments:
        rd = _BitReader(seg)
        pred = {c["id"]: 0 for c in comps}
        seg_mcus = restart_interval or (n_mcus - mcu_idx)
        for _ in range(min(seg_mcus, n_mcus - mcu_idx)):
            my, mx = divmod(mcu_idx, mcus_x)
            for c in comps:
                dc_tab = huff_dc[c["td"]]
                ac_tab = huff_ac[c["ta"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = np.zeros(64, np.int64)
                        # DC: one peek-table read + extend bits
                        e = int(dc_tab[rd.peek16()])
                        if e == 0:
                            raise NotImplementedError("invalid DC Huffman code")
                        rd.pos += e & 31
                        size = e >> 5
                        diff = _extend(rd.bits(size), size)
                        pred[c["id"]] += diff
                        blk[0] = pred[c["id"]]
                        # AC: (run, size) run-length symbols
                        k = 1
                        while k < 64:
                            e = int(ac_tab[rd.peek16()])
                            if e == 0:
                                raise NotImplementedError("invalid AC Huffman code")
                            rd.pos += e & 31
                            sym = e >> 5
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 15
                            if size == 0:
                                if run != 15:
                                    raise NotImplementedError(f"AC symbol {sym:#x}")
                                k += 16  # ZRL
                                continue
                            k += run
                            if k > 63:
                                raise NotImplementedError("AC run past block end")
                            blk[k] = _extend(rd.bits(size), size)
                            k += 1
                        row = my * c["v"] + by
                        col = mx * c["h"] + bx
                        c["coef"][row * c["bw"] + col] = blk
            mcu_idx += 1
    if mcu_idx != n_mcus:
        raise NotImplementedError(
            f"JPEG truncated: decoded {mcu_idx} of {n_mcus} MCUs"
        )

    planes = []
    for c in comps:
        q = quant[c["tq"]]
        spec = np.zeros((c["bh"] * c["bw"], 64), np.float64)
        spec[:, _ZIGZAG] = c["coef"] * q  # dequantize + de-zigzag
        spec = spec.reshape(-1, 8, 8)
        # f = Aᵀ F A for every block at once (batched BLAS matmul)
        px = np.matmul(np.matmul(_DCT_A.T, spec), _DCT_A)
        px = np.clip(np.round(px + 128.0), 0, 255)
        # reassemble blocks -> component plane, then crop MCU padding
        plane = (
            px.reshape(c["bh"], c["bw"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c["bh"] * 8, c["bw"] * 8)
        )
        # nearest-neighbor upsample to full resolution
        plane = np.repeat(np.repeat(plane, vmax // c["v"], 0), hmax // c["h"], 1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return h, w, 1, planes[0].astype(np.uint8)[..., None]
    if len(planes) != 3:
        raise NotImplementedError(f"{len(planes)}-component JPEG")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return h, w, 3, np.clip(np.round(rgb), 0, 255).astype(np.uint8)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s


def _quant_tables(quality: int | None) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex K tables; quality=None -> all-ones
    tables (numerically lossless for DC-only spectra — the oracle path)."""
    if quality is None:
        return np.ones((8, 8), np.int64), np.ones((8, 8), np.int64)
    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for tbl in (_STD_QUANT_LUMA, _STD_QUANT_CHROMA):
        t = (tbl.astype(np.int64) * scale + 50) // 100
        out.append(np.clip(t, 1, 255))
    return out[0], out[1]


def _encode_block(
    wr: _BitWriter,
    zz: np.ndarray,
    pred: int,
    dc_codes: dict,
    ac_codes: dict,
) -> int:
    """Huffman-encode one zig-zag-ordered quantized block; returns its DC."""
    diff = int(zz[0]) - pred
    size = int(abs(diff)).bit_length()
    code, ln = dc_codes[size]
    wr.write(code, ln)
    if size:
        wr.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last_nz = int(nz[-1]) + 1 if len(nz) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if k > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            wr.write(code, ln)
            run -= 16
        size = int(abs(v)).bit_length()
        code, ln = ac_codes[(run << 4) | size]
        wr.write(code, ln)
        wr.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        wr.write(code, ln)
    return int(zz[0])


def _fdct_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """plane (H, W) float64 (level-shifted) -> (n_blocks, 64) quantized
    zig-zag coefficients; blocks row-major."""
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = (
        plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )
    spec = np.matmul(np.matmul(_DCT_A, blocks), _DCT_A.T)
    # zig-zag: zz[k] = quantized flat[(8u+v) = _ZIGZAG[k]] — the exact
    # inverse of the decoder's spec[:, _ZIGZAG] = coef scatter
    zz = np.round(spec / q).astype(np.int64).reshape(-1, 64)[:, _ZIGZAG]
    return zz


def encode_jpeg(
    arr: np.ndarray,
    quality: int | None = None,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Baseline sequential JPEG encoder for h×w×c uint8 (c=1 gray, c=3
    RGB).  ``quality=None`` writes all-ones quant tables (maximal
    fidelity — DC-only spectra round-trip bit-exactly, the oracle path);
    ``subsample=True`` encodes color as 4:2:0 (2×2 chroma average).
    Dimensions must be multiples of the MCU size (8, or 16 with
    subsampling) — media pipelines pad before encode."""
    arr = np.ascontiguousarray(arr)
    h, w, c = arr.shape
    mcu = 16 if (subsample and c == 3) else 8
    if h % mcu or w % mcu:
        raise ValueError(f"dimensions must be multiples of {mcu}")
    ql, qc = _quant_tables(quality)
    if c == 1:
        planes = [arr[..., 0].astype(np.float64) - 128.0]
        samp = [(1, 1)]
        qmap = [0]
    elif c == 3:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        y, cb, cr = (np.round(p) for p in (y, cb, cr))
        if subsample:
            cb = (cb.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))).round()
            cr = (cr.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))).round()
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y - 128.0, cb - 128.0, cr - 128.0]
        qmap = [0, 1, 1]
    else:
        raise NotImplementedError(f"{c}-channel JPEG encode")

    zz = [
        _fdct_blocks(p, (ql if qm == 0 else qc).astype(np.float64))
        for p, qm in zip(planes, qmap)
    ]

    dc_l = _huff_codes(*_STD_DC_LUMA)
    ac_l = _huff_codes(*_STD_AC_LUMA)
    dc_c = _huff_codes(*_STD_DC_CHROMA)
    ac_c = _huff_codes(*_STD_AC_CHROMA)

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x, mcus_y = w // (8 * hmax), h // (8 * vmax)
    bw = [mcus_x * s[0] for s in samp]

    body = bytearray()
    wr = _BitWriter()
    pred = [0] * len(planes)
    rst = 0
    for m in range(mcus_x * mcus_y):
        if restart_interval and m and m % restart_interval == 0:
            wr.flush()
            body += wr.out + bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            wr = _BitWriter()
            pred = [0] * len(planes)
        my, mx = divmod(m, mcus_x)
        for ci, (sh, sv) in enumerate(samp):
            dc, ac = (dc_l, ac_l) if qmap[ci] == 0 else (dc_c, ac_c)
            for by in range(sv):
                for bx in range(sh):
                    bi = (my * sv + by) * bw[ci] + (mx * sh + bx)
                    pred[ci] = _encode_block(wr, zz[ci][bi], pred[ci], dc, ac)
    wr.flush()
    body += wr.out

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    out = bytearray(b"\xff\xd8")  # SOI
    zz_order = _ZIGZAG
    out += seg(0xDB, bytes([0]) + bytes(ql.reshape(-1)[zz_order].astype(np.uint8)))
    if c == 3:
        out += seg(0xDB, bytes([1]) + bytes(qc.reshape(-1)[zz_order].astype(np.uint8)))
    sof = bytearray([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([len(planes)])
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes([ci + 1, (sh << 4) | sv, qmap[ci]])
    out += seg(0xC0, bytes(sof))

    def dht(cls: int, tid: int, tbl: tuple[list[int], list[int]]) -> bytes:
        bits, vals = tbl
        return seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    out += dht(0, 0, _STD_DC_LUMA) + dht(1, 0, _STD_AC_LUMA)
    if c == 3:
        out += dht(0, 1, _STD_DC_CHROMA) + dht(1, 1, _STD_AC_CHROMA)
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytearray([len(planes)])
    for ci in range(len(planes)):
        sos += bytes([ci + 1, (qmap[ci] << 4) | qmap[ci]])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, bytes(sos)) + body + b"\xff\xd9"  # EOI
    return bytes(out)


def _decode_image_bytes(raw: bytes) -> tuple[int, int, int, np.ndarray]:
    if raw[:2] in (b"P6", b"P5"):
        return _decode_pnm(raw)
    if raw[:2] == b"BM":
        return _decode_bmp(raw)
    if raw[:8] == _PNG_MAGIC:
        return _decode_png(raw)
    if raw[:2] == b"\xff\xd8":
        return _decode_jpeg(raw)
    if raw[:4] == b"GIF8":
        return _decode_gif(raw)
    raise NotImplementedError(
        "only PPM/PGM, uncompressed BMP, PNG, baseline JPEG, and GIF "
        f"decode without PIL/pyav; got magic {raw[:2]!r}"
    )


#: decode output: one row per image, pixels flattened row-major (h×w×c)
#: decoded values per emitted output frame (~16 MB of int32 per flush;
#: bounds worker memory independent of Arrow input batch size and of
#: the data-dependent decoded image width)
_DECODE_FLUSH_VALUES = 4_000_000

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("channels", T.IntegerType(), False),
        T.StructField("pixels", T.ArrayType(T.IntegerType()), False),
    ]
)


def decode_media(payload_df: DataFrame) -> DataFrame:
    """Decode binary image payloads into pixel arrays via the vendored
    PPM/PGM/BMP codecs — Arrow-batched mapInPandas, the same plumbing a
    PIL-backed decoder would use (swap ``_decode_image_bytes`` for
    ``PIL.Image.open``; the Spark side doesn't change).  Unsupported
    formats (JPEG/PNG/...) raise NotImplementedError.

    Output is flushed every ``_DECODE_FLUSH_VALUES`` decoded values
    rather than once per INPUT Arrow batch, and pixel cells stay int32
    ndarrays (a Python-int list costs ~28 bytes per value) — the r11
    sf10 lesson: at 500k docs × 36,864 px the per-input-batch
    accumulation put ~3.7 GB in EVERY worker (32 × that = OS OOM-killed
    JVM).  The decoded width is data-dependent, so worker memory must
    be bounded by a VALUE budget, not a row count."""

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, ws, hs, cs, px = [], [], [], [], []
        n_vals = 0

        def frame() -> pd.DataFrame:
            return pd.DataFrame(
                {"doc_id": ids, "width": ws, "height": hs, "channels": cs, "pixels": px}
            )

        for pdf in batches:
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                h, w, c, arr = _decode_image_bytes(bytes(raw))
                ids.append(doc_id)
                ws.append(w)
                hs.append(h)
                cs.append(c)
                flat = arr.reshape(-1).astype("int32")
                px.append(flat)
                n_vals += flat.size
                if n_vals >= _DECODE_FLUSH_VALUES:
                    yield frame()
                    ids, ws, hs, cs, px = [], [], [], [], []
                    n_vals = 0
        if ids:
            yield frame()

    return payload_df.select("doc_id", "payload").mapInPandas(per_batch, DECODED_SCHEMA)


#: decode_media_stats output: the three integer pixel reductions the
#: *_decode_stats queries need — 4 longs per image instead of h·w·c
#: int32 pixels
DECODED_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_px", T.LongType(), False),
        T.StructField("px_sum", T.LongType(), False),
        T.StructField("px_wsum", T.LongType(), False),
    ]
)


def decode_media_stats(payload_df: DataFrame, weighting: str = "position") -> DataFrame:
    """Decode image payloads and reduce each to integer pixel stats
    (count / sum / weighted sum) INSIDE the Arrow kernel — the r13 fusion
    of ``decode_media`` + the JVM array-aggregate fold the
    ``*_decode_stats`` queries ran on its output.

    Why fuse (optimization guide §4.1/§8): the decode-then-fold shape
    ships every decoded pixel across the Python→JVM Arrow boundary
    (jpeg_decode_stats: 36,864 int32 per image — ~1.2 GB at sf0.1, ~densely
    125 GB at sf10) only for a codegen'd ``aggregate``/``zip_with`` to
    collapse them to 3 longs per row, allocating two more h·w·c arrays
    (sequence + zip_with) per image on the way.  The stats are pure
    integer reductions, so computing them with one vectorized int64 dot
    in the same kernel that already holds the ndarray is value-identical
    and sends 4 longs per image instead.  ``decode_media`` remains for
    consumers that need the pixels themselves.

    ``weighting`` selects the position weight of ``px_wsum``:
      * ``"position"`` — 1-based flattened pixel index (the PNG/GIF stats
        convention: ``zip_with(pixels, sequence(1, n), x·i)``);
      * ``"block8"``   — 1-based row-major 8×8-tile index of the pixel
        (the JPEG stats convention, constant per block so it survives the
        codec exactly): ``(y÷8)·(w÷8) + (x÷8) + 1`` per pixel.
    Both folds are exact int64 arithmetic (max sum ≈ 255·n·max_weight ≪
    2⁶³ for any image the vendored codecs emit), so results are
    bit-identical to the JVM fold they replace.
    """
    if weighting not in ("position", "block8"):
        raise ValueError(f"unknown weighting {weighting!r}")

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # weight vectors depend only on the decoded shape — build once per
        # (h, w, c) per task, amortized over every image in the partition
        wcache: dict[tuple[int, int, int], np.ndarray] = {}

        def weights(h: int, w: int, c: int) -> np.ndarray:
            key = (h, w, c)
            hit = wcache.get(key)
            if hit is None:
                if weighting == "position":
                    hit = np.arange(1, h * w * c + 1, dtype=np.int64)
                else:
                    px = np.arange(h * w * c, dtype=np.int64) // c
                    hit = (px // (8 * w)) * (w // 8) + ((px % w) // 8) + 1
                wcache[key] = hit
            return hit

        for pdf in batches:
            ids: list[int] = []
            ns: list[int] = []
            sums: list[int] = []
            wsums: list[int] = []
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                h, w, c, arr = _decode_image_bytes(bytes(raw))
                flat = arr.reshape(-1).astype(np.int64)
                ids.append(doc_id)
                ns.append(flat.size)
                sums.append(int(flat.sum()))
                wsums.append(int(flat @ weights(h, w, c)) if flat.size else 0)
            yield pd.DataFrame(
                {"doc_id": ids, "n_px": ns, "px_sum": sums, "px_wsum": wsums}
            )

    return payload_df.select("doc_id", "payload").mapInPandas(
        per_batch, DECODED_STATS_SCHEMA
    )


def extract_features(payload_df: DataFrame, bins: int = FEATURE_BINS) -> DataFrame:
    """Deterministic stand-in feature extractor: normalized byte histogram
    (``bins`` buckets) per payload, via Arrow-batched mapInPandas.

    This is the REAL distributed plumbing a decoder would use: payloads
    arrive as pandas batches (zero-copy via Arrow), the loop is
    per-partition not per-row, and output is a typed array column.  A
    production image pipeline swaps the histogram body for
    PIL.Image.open + resize + tensorize; the Spark side doesn't change.
    """

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for raw in pdf["payload"]:
                # byte histogram fully vectorized: frombuffer is zero-copy,
                # bincount is one C pass — never iterate payload bytes in
                # Python (this body is the template real decoders copy)
                arr = np.frombuffer(raw, dtype=np.uint8)
                counts = np.bincount(arr % bins, minlength=bins)
                total = max(1, len(arr))
                feats.append([round(c / total, 6) for c in counts.tolist()])
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return payload_df.select("doc_id", "payload").mapInPandas(per_batch, FEATURE_SCHEMA)


# --- audio: PCM WAV (RIFF) decode + features --------------------------------


def _decode_wav(raw: bytes) -> tuple[int, int, np.ndarray]:
    """Uncompressed PCM WAV (8/16-bit).  Returns (sample_rate, channels,
    float64 samples of shape n×channels, normalized to [−1, 1])."""
    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise NotImplementedError(
            f"only RIFF/WAVE audio decodes without soundfile; got {raw[:4]!r}"
        )
    fmt = data = None
    pos = 12
    while pos + 8 <= len(raw):
        cid = raw[pos : pos + 4]
        size = struct.unpack_from("<I", raw, pos + 4)[0]
        body = raw[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
    if fmt is None or data is None:
        raise NotImplementedError("WAV missing fmt/data chunk")
    audio_fmt, nch, rate = struct.unpack_from("<HHI", fmt, 0)
    bits = struct.unpack_from("<H", fmt, 14)[0]
    if audio_fmt != 1 or bits not in (8, 16) or nch < 1:
        raise NotImplementedError(f"WAV format={audio_fmt} bits={bits} not supported")
    if bits == 16:
        x = np.frombuffer(data, "<i2").astype("float64") / 32768.0
    else:  # 8-bit WAV is unsigned, midpoint 128
        x = (np.frombuffer(data, "u1").astype("float64") - 128.0) / 128.0
    n = len(x) // nch
    return rate, nch, x[: n * nch].reshape(n, nch)


#: integer-exact PCM stats: the oracle-parity reduction of a decode
#: (float features like RMS stay in audio_features; these columns are
#: exact ints so a DuckDB oracle recomputes them straight from bytes)
AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_samples", T.LongType(), False),
        T.StructField("sq_sum", T.LongType(), False),
        T.StructField("zero_crossings", T.LongType(), False),
        T.StructField("peak_abs", T.LongType(), False),
    ]
)


def audio_pcm_stats(payload_df: DataFrame) -> DataFrame:
    """Integer-exact per-payload PCM stats THROUGH the decoder: payloads
    decode via ``_decode_wav`` (RIFF chunk walk + normalization), the
    normalized floats are mapped back to centered integer samples
    (exact: 8-bit normalization divides by 128, a power of two), and the
    stats — sample count, Σs², sign changes, max|s| — are integers a SQL
    oracle can recompute straight from the raw bytes.  A value match
    therefore proves the RIFF parse and PCM normalization byte-exact on
    real data (the audio twin of png/jpeg_decode_stats)."""

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in AUDIO_STATS_SCHEMA.fields}
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                _rate, nch, x = _decode_wav(bytes(raw))
                mono = x[:, 0] if nch == 1 else x.mean(axis=1)
                s = np.round(mono * 128.0).astype(np.int64)  # exact for 8-bit
                neg = s < 0
                out["doc_id"].append(doc_id)
                out["n_samples"].append(len(s))
                out["sq_sum"].append(int((s * s).sum()))
                out["zero_crossings"].append(
                    int((neg[1:] != neg[:-1]).sum()) if len(s) > 1 else 0
                )
                out["peak_abs"].append(int(np.abs(s).max()) if len(s) else 0)
            yield pd.DataFrame(out)

    return payload_df.select("doc_id", "payload").mapInPandas(
        per_batch, AUDIO_STATS_SCHEMA
    )


def wav_header_pcm8(n_samples: int, rate: int = 8000) -> bytes:
    """Canonical 44-byte RIFF/WAVE header for 8-bit mono PCM — constant
    for a fixed payload size, so queries can build WAV payloads fully
    JVM-side (lit(header) ++ body bytes)."""
    return (
        b"RIFF"
        + (36 + n_samples).to_bytes(4, "little")
        + b"WAVE"
        + b"fmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")  # PCM
        + (1).to_bytes(2, "little")  # mono
        + rate.to_bytes(4, "little")
        + rate.to_bytes(4, "little")  # byte rate (1 B/sample)
        + (1).to_bytes(2, "little")  # block align
        + (8).to_bytes(2, "little")  # bits
        + b"data"
        + n_samples.to_bytes(4, "little")
    )


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("channels", T.IntegerType(), False),
        T.StructField("duration_s", T.DoubleType(), False),
        T.StructField("rms", T.DoubleType(), False),
        T.StructField("zero_crossing_rate", T.DoubleType(), False),
        T.StructField("peak", T.DoubleType(), False),
    ]
)


def audio_features(payload_df: DataFrame) -> DataFrame:
    """Per-payload audio features from the vendored PCM WAV decoder:
    duration, RMS energy, zero-crossing rate (crossings per sample on the
    mono mix), and peak amplitude — the standard cheap filters a speech/
    music curation pipeline gates on before expensive model scoring.  Same
    Arrow-batched mapInPandas shape as image decode; a soundfile-backed
    decoder swaps in without touching the Spark side."""

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in AUDIO_FEATURE_SCHEMA.fields}
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                rate, nch, x = _decode_wav(bytes(raw))
                mono = x.mean(axis=1)
                n = len(mono)
                zc = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if n > 1 else 0.0
                out["doc_id"].append(doc_id)
                out["sample_rate"].append(rate)
                out["channels"].append(nch)
                out["duration_s"].append(round(n / rate, 6))
                out["rms"].append(round(float(np.sqrt(np.mean(mono**2))) if n else 0.0, 6))
                out["zero_crossing_rate"].append(round(zc, 6))
                out["peak"].append(round(float(np.abs(mono).max()) if n else 0.0, 6))
            yield pd.DataFrame(out)

    return payload_df.select("doc_id", "payload").mapInPandas(
        per_batch, AUDIO_FEATURE_SCHEMA
    )


#: bytes per pixel numerator/denominator for y4m colorspaces
_Y4M_SUBSAMPLING = {"420": (3, 2), "422": (2, 1), "444": (3, 1), "mono": (1, 1)}

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ]
)


def _demux_y4m(raw: bytes, step: int = 1):
    """Yield (frame_idx, width, height, frame_bytes) for every ``step``-th
    frame of a YUV4MPEG2 stream — the standard UNCOMPRESSED video
    container (mjpegtools / ffmpeg `-f yuv4mpeg`): an ASCII stream
    header, then `FRAME\\n` + fixed-size planar YUV per frame.  Pure
    offset arithmetic: unsampled frames are skipped without copying
    their bytes.  Compressed containers (mp4/mkv) would need pyav."""
    if not raw.startswith(b"YUV4MPEG2"):
        raise NotImplementedError(
            f"only YUV4MPEG2 demuxes without pyav; got {raw[:9]!r}"
        )
    nl = raw.index(b"\n")
    w = h = None
    cs = "420"
    for tok in raw[9:nl].split():
        t = tok.decode("ascii", "replace")
        if t.startswith("W"):
            w = int(t[1:])
        elif t.startswith("H"):
            h = int(t[1:])
        elif t.startswith("C"):
            # C420 / C420jpeg / C420mpeg2 / C420paldv / C422 / C444 / Cmono
            cs = next((k for k in _Y4M_SUBSAMPLING if t[1:].startswith(k)), t[1:])
    if w is None or h is None or cs not in _Y4M_SUBSAMPLING:
        raise NotImplementedError(f"unsupported y4m header {raw[:nl]!r}")
    num, den = _Y4M_SUBSAMPLING[cs]
    frame_bytes = w * h * num // den
    pos, idx = nl + 1, 0
    while pos < len(raw):
        eol = raw.index(b"\n", pos)
        if raw[pos : pos + 5] != b"FRAME":
            raise NotImplementedError(f"bad frame marker at byte {pos}")
        if eol + 1 + frame_bytes > len(raw):
            break  # truncated tail frame
        if idx % step == 0:
            yield idx, w, h, raw[eol + 1 : eol + 1 + frame_bytes]
        pos = eol + 1 + frame_bytes
        idx += 1


def frame_sample(payload_df: DataFrame, every_n: int = 30) -> DataFrame:
    """Sample every Nth frame from y4m (YUV4MPEG2) video payloads.

    flatMap shape: mapInPandas yields one row per SAMPLED frame —
    (doc_id, frame_idx, width, height, frame bytes) — output row count
    free to differ from input, no intermediate list of all frames (the
    generator walks the byte stream and skips unsampled frames by
    offset arithmetic, so a 10k-frame payload with every_n=30 touches
    ~330 frames' bytes).  Compressed containers swap in pyav with the
    same Spark plumbing."""
    if every_n <= 0:
        raise ValueError("every_n must be positive")

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in FRAME_SCHEMA.fields}
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                for idx, w, h, data in _demux_y4m(bytes(raw), every_n):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["frame"].append(data)
            yield pd.DataFrame(out)

    return payload_df.select("doc_id", "payload").mapInPandas(per_batch, FRAME_SCHEMA)


#: resize output: payload in / payload out with refreshed metadata
RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("media_meta", MEDIA_META, False),
    ]
)


def resize_images(payload_df: DataFrame, width: int, height: int) -> DataFrame:
    """Nearest-neighbor resize: decode (vendored PPM/PGM/BMP codecs),
    index-select rows/columns in numpy, re-encode as binary PPM (P6) and
    refresh the metadata struct.  Payload column in / payload column out
    — the canonical media-transform shape; a production pipeline swaps
    the codec + interpolation body for PIL, the Spark side is final."""
    if width <= 0 or height <= 0:
        raise ValueError("width/height must be positive")

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads, metas = [], [], []
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                h, w, c, arr = _decode_image_bytes(bytes(raw))
                if c == 1:  # promote grayscale so output is uniformly RGB
                    arr = np.repeat(arr, 3, axis=2)
                ys = np.minimum((np.arange(height) * h) // height, h - 1)
                xs = np.minimum((np.arange(width) * w) // width, w - 1)
                out = np.ascontiguousarray(arr[ys][:, xs])
                data = b"P6\n%d %d\n255\n" % (width, height) + out.tobytes()
                ids.append(doc_id)
                payloads.append(data)
                metas.append(
                    {
                        "mime_type": "image/x-portable-pixmap",
                        "byte_len": len(data),
                        "sha256": hashlib.sha256(data).hexdigest(),
                    }
                )
            yield pd.DataFrame(
                {"doc_id": ids, "payload": payloads, "media_meta": metas}
            )

    return payload_df.select("doc_id", "payload").mapInPandas(per_batch, RESIZED_SCHEMA)


# --- perceptual hashing (aHash) + hamming dup pairs --------------------------

AHASH_SIDE = 8  # aHash grid: 8×8 → 64-bit signature

AHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("ahash", T.LongType(), False),
    ]
)


def _ahash_of(arr: np.ndarray) -> int:
    """64-bit average hash of one decoded image (h×w×c uint8): grayscale
    by channel SUM (scale-invariant vs the usual channel mean — the
    threshold compare is homogeneous), nearest-neighbor downsample to
    8×8 (same index-select as resize_images), threshold above the 8×8
    mean as the EXACT integer predicate ``64·g[i] > Σg`` (no float
    accumulation anywhere, so any engine — numpy, pure Python, SQL —
    computes the identical bits), pack row-major MSB-first into a
    signed 64-bit int."""
    h, w, _c = arr.shape
    gray3 = arr.astype(np.int64).sum(axis=2)
    ys = np.minimum((np.arange(AHASH_SIDE) * h) // AHASH_SIDE, h - 1)
    xs = np.minimum((np.arange(AHASH_SIDE) * w) // AHASH_SIDE, w - 1)
    small = gray3[ys][:, xs]
    bits = (AHASH_SIDE * AHASH_SIDE * small > small.sum()).reshape(-1)
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return val - (1 << 64) if val >= (1 << 63) else val


def image_ahash(payload_df: DataFrame) -> DataFrame:
    """Perceptual average-hash per image payload → (doc_id, ahash int64).

    Decode runs through the same vendored codecs as decode_media
    (PIL slots in at _decode_image_bytes); hashing is numpy-only inside
    Arrow-batched mapInPandas — no Python per pixel.  aHash is the
    canonical cheap perceptual signature: near-identical images (small
    crops, noise, re-encodes) land within a few bits, so image-level
    near-dup detection becomes the SAME banded hamming self-join used
    for SimHash text dedup."""

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hs = [], []
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                h, w, c, arr = _decode_image_bytes(bytes(raw))
                if c == 1:
                    arr = np.repeat(arr, 3, axis=2)
                ids.append(doc_id)
                hs.append(_ahash_of(arr))
            yield pd.DataFrame({"doc_id": ids, "ahash": pd.array(hs, dtype="int64")})

    return payload_df.select("doc_id", "payload").mapInPandas(per_batch, AHASH_SCHEMA)


def ahash_dup_pairs(hashes: DataFrame, max_hamming: int = 2) -> DataFrame:
    """Image near-dup pairs: hamming(ahash_a, ahash_b) ≤ ``max_hamming``
    via pigeonhole banding — the signature splits into
    ``max_hamming + 1`` bands, so any qualifying pair agrees exactly on
    at least one whole band and the candidate set of the (band_idx,
    band_val) equi-join is a superset of the answer; bit_count(xor)
    verifies exactly.  Identical economics to the SimHash banded join:
    keyed shuffles only, no all-pairs anywhere.

    Returns (a_id, b_id, hamming) with a_id < b_id."""
    n_bands = max_hamming + 1
    width = 64 // n_bands
    widths = [width + (1 if i < 64 % n_bands else 0) for i in range(n_bands)]
    shifts, s = [], 0
    for wd in widths:
        shifts.append(s)
        s += wd
    bands = None
    for i, (sh, wd) in enumerate(zip(shifts, widths)):
        mask = (1 << wd) - 1
        piece = hashes.select(
            "doc_id",
            "ahash",
            F.lit(i).alias("band_idx"),
            F.shiftrightunsigned(F.col("ahash"), sh)
            .bitwiseAND(F.lit(mask))
            .alias("band_val"),
        )
        bands = piece if bands is None else bands.unionByName(piece)
    a = bands.select(
        F.col("doc_id").alias("a_id"),
        F.col("ahash").alias("ha"),
        "band_idx",
        "band_val",
    )
    b = bands.select(
        F.col("doc_id").alias("b_id"),
        F.col("ahash").alias("hb"),
        "band_idx",
        "band_val",
    )
    cand = (
        a.join(b, ["band_idx", "band_val"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "ha", "hb")
        .distinct()
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        cand.select("a_id", "b_id", ham.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


# --- GIF (LZW) codec ------------------------------------------------------------
#
# GIF87a/89a: logical screen + palette + LZW-compressed index stream
# (GIF flavor: variable-width codes 3..12 bits, LSB-first bit packing,
# CLEAR/EOI codes, dictionary reset at 4096).  Pure stdlib/numpy, same
# vendored-codec contract as the PNG/JPEG pair: `encode_gif` emits a
# real compressed stream, `_decode_gif` parses any baseline GIF
# (global/local palettes, interlace, 89a extension blocks), and the
# gif_decode_stats oracle proves the LZW round-trip byte-exact on real
# data every driver run.


def _lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """GIF-flavor LZW: returns the palette-index stream."""
    clear = 1 << min_code_size
    eoi = clear + 1
    code_size = min_code_size + 1
    table: list[list[int]] = [[i] for i in range(clear)] + [[], []]
    out: list[int] = []
    prev: list[int] | None = None
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < code_size:
            if pos >= n:
                return out  # truncated stream: emit what we have
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = [[i] for i in range(clear)] + [[], []]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return out
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        else:  # KwKwK case
            entry = prev + [prev[0]]
        out.extend(entry)
        if prev is not None:
            table.append(prev + [entry[0]])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    return out


def _lzw_encode(indices: "np.ndarray", min_code_size: int) -> bytes:
    """GIF-flavor LZW compressor: real dictionary build, variable-width
    LSB-first packing, CLEAR emitted at start and on dictionary
    overflow (4096 entries), EOI at end."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    code_size = min_code_size + 1
    table: dict[tuple[int, int], int] = {}
    next_code = eoi + 1
    emit(clear, code_size)
    prev = -1
    for k in indices.tolist():
        if prev < 0:
            prev = k
            continue
        hit = table.get((prev, k))
        if hit is not None:
            prev = hit
            continue
        emit(prev, code_size)
        table[(prev, k)] = next_code
        next_code += 1
        if next_code - 1 == (1 << code_size) and code_size < 12:
            code_size += 1
        if next_code > 4095:
            emit(clear, code_size)
            table.clear()
            code_size = min_code_size + 1
            next_code = eoi + 1
        prev = k
    if prev >= 0:
        emit(prev, code_size)
    emit(eoi, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _decode_gif(raw: bytes) -> tuple[int, int, int, np.ndarray]:
    """Baseline GIF decode: first image frame, palette expanded to RGB
    (the PNG palette convention).  Handles 87a/89a, global and local
    color tables, 89a extension blocks, and interlaced frames."""
    if raw[:4] != b"GIF8" or raw[4:6] not in (b"7a", b"9a"):
        raise NotImplementedError(f"not a GIF87a/89a stream: {raw[:6]!r}")
    pos = 6
    flags = raw[pos + 4]
    pos += 7  # logical screen descriptor
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(raw, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    while pos < len(raw):
        b = raw[pos]
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while raw[pos] != 0:
                pos += 1 + raw[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            w = int.from_bytes(raw[pos + 5 : pos + 7], "little")
            h = int.from_bytes(raw[pos + 7 : pos + 9], "little")
            iflags = raw[pos + 9]
            pos += 10
            ct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                ct = np.frombuffer(raw, np.uint8, 3 * n, pos).reshape(n, 3)
                pos += 3 * n
            if ct is None:
                raise NotImplementedError("GIF frame without a color table")
            min_code = raw[pos]
            pos += 1
            chunks = []
            while raw[pos] != 0:
                ln = raw[pos]
                chunks.append(raw[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            idx = np.array(
                _lzw_decode(b"".join(chunks), min_code)[: w * h], np.int64
            ).reshape(h, w)
            if iflags & 0x40:  # interlaced: rows arrive in 4 passes
                order = [
                    y
                    for start, step in _GIF_INTERLACE_PASSES
                    for y in range(start, h, step)
                ]
                de = np.empty_like(idx)
                de[order] = idx
                idx = de
            return h, w, 3, ct[idx].astype(np.uint8)
        elif b == 0x3B:  # trailer
            break
        else:
            raise NotImplementedError(f"unknown GIF block 0x{b:02x}")
    raise NotImplementedError("GIF stream carries no image frame")


def encode_gif(arr: np.ndarray) -> bytes:
    """Encode an (h, w, 3) or (h, w) uint8 array as a real GIF89a
    stream (exact palette = the distinct colors in lexicographic RGB
    order; LZW-compressed).  Images with more than 256 distinct colors
    need quantization — out of scope for the vendored codec, raises."""
    a = np.asarray(arr, np.uint8)
    if a.ndim == 2:
        a = np.repeat(a[:, :, None], 3, axis=2)
    h, w, _ = a.shape
    flat = a.reshape(-1, 3)
    # np.unique's lexicographic palette order is total on RGB triples,
    # so the emitted stream is deterministic
    palette, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise NotImplementedError(
            f"GIF encode needs <= 256 distinct colors, got {len(palette)}"
        )
    pal_bits = max(1, (len(palette) - 1).bit_length())
    pal_n = 1 << pal_bits
    pal = np.zeros((pal_n, 3), np.uint8)
    pal[: len(palette)] = palette
    min_code = max(2, pal_bits)
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out.append(0x80 | (pal_bits - 1))  # GCT present, 2^pal_bits entries
    out += b"\x00\x00"  # background, aspect
    out += pal.tobytes()
    out += b"\x2c" + b"\x00\x00\x00\x00"  # image descriptor at (0,0)
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out.append(0x00)  # no local table, not interlaced
    out.append(min_code)
    comp = _lzw_encode(idx.astype(np.int64), min_code)
    for i in range(0, len(comp), 255):
        chunk = comp[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


# --- IMA ADPCM (DVI4) audio codec -------------------------------------------------
#
# The compressed-AUDIO slot of the media matrix (images carry
# DEFLATE/LZW/Huffman+DCT; WAV covered uncompressed PCM): IMA ADPCM
# compresses int16 PCM 4:1 into 4-bit nibbles through a pure-integer
# predictor/step state machine — fully deterministic, so the DECODED
# waveform is an exact function of the input and the oracle can replay
# the whole state machine in SQL (recursive CTE) from the raw source
# bytes.  Tables and update rules are the public IMA/DVI specification.

_ADPCM_STEPS = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)
_ADPCM_INDEX = (-1, -1, -1, -1, 2, 4, 6, 8)


def _adpcm_step(pred: int, idx: int, sample: int) -> tuple[int, int, int]:
    """One encoder step: quantize (sample − pred) to a 4-bit code and
    advance (pred, idx) exactly as the decoder will — returns
    (code, new_pred, new_idx)."""
    step = _ADPCM_STEPS[idx]
    delta = sample - pred
    sign = 8 if delta < 0 else 0
    mag = -delta if delta < 0 else delta
    b4 = 1 if mag >= step else 0
    m2 = mag - b4 * step
    b2 = 1 if m2 >= step >> 1 else 0
    m1 = m2 - b2 * (step >> 1)
    b1 = 1 if m1 >= step >> 2 else 0
    nib = b4 * 4 + b2 * 2 + b1
    diff = (step >> 3) + b4 * step + b2 * (step >> 1) + b1 * (step >> 2)
    pred = pred - diff if sign else pred + diff
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + _ADPCM_INDEX[nib]))
    return sign | nib, pred, idx


def adpcm_encode(samples: "np.ndarray") -> bytes:
    """int16 samples → packed 4-bit IMA ADPCM codes (low nibble first),
    initial state (pred=0, index=0)."""
    pred, idx = 0, 0
    codes = []
    for s in np.asarray(samples, np.int64).tolist():
        code, pred, idx = _adpcm_step(pred, idx, int(s))
        codes.append(code)
    if len(codes) % 2:
        codes.append(0)
    out = bytearray()
    for lo, hi in zip(codes[0::2], codes[1::2]):
        out.append(lo | (hi << 4))
    return bytes(out)


def adpcm_decode(raw: bytes, n: int) -> "np.ndarray":
    """Packed IMA ADPCM codes → reconstructed int16 samples (length n),
    initial state (pred=0, index=0) — the exact mirror of the encoder's
    internal predictor sequence."""
    pred, idx = 0, 0
    out = np.empty(n, np.int64)
    for i in range(n):
        byte = raw[i >> 1]
        code = (byte >> 4) if i & 1 else (byte & 0x0F)
        nib = code & 7
        step = _ADPCM_STEPS[idx]
        diff = (step >> 3)
        if nib & 4:
            diff += step
        if nib & 2:
            diff += step >> 1
        if nib & 1:
            diff += step >> 2
        pred = pred - diff if code & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + _ADPCM_INDEX[nib]))
        out[i] = pred
    return out


#: adpcm_recon_stats output — the same four integers the r13 query
#: folded in the JVM over the shipped sample array
ADPCM_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_samples", T.LongType(), False),
        T.StructField("recon_sum", T.LongType(), False),
        T.StructField("recon_sq_sum", T.LongType(), False),
        T.StructField("recon_max_abs", T.LongType(), False),
    ]
)


def adpcm_recon_stats(payload_df: DataFrame, n_samples: int) -> DataFrame:
    """Fused ADPCM decode → integer stats, the audio twin of
    :func:`decode_media_stats` (r14, guide §4: pass only what the
    decision needs): the r13 plan shipped every reconstructed sample as
    an ``array<long>`` across Python→JVM Arrow (192 longs ≈ 1.5 KB/doc)
    purely so three JVM ``aggregate`` folds could collapse them to
    longs; this kernel computes the identical int64 reductions —
    Σs, Σs², max|s| over the reconstructed waveform — beside the
    decoder that already holds the ndarray, so 4 longs per payload
    cross the boundary instead.  Exact integer arithmetic (samples are
    int16, 192·32767² < 2⁶³), so results are bit-identical to the JVM
    fold."""

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in ADPCM_STATS_SCHEMA.fields}
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                x = adpcm_decode(bytes(raw), n_samples)
                out["doc_id"].append(doc_id)
                out["n_samples"].append(len(x))
                out["recon_sum"].append(int(x.sum()))
                out["recon_sq_sum"].append(int((x * x).sum()))
                out["recon_max_abs"].append(
                    int(np.abs(x).max()) if len(x) else 0
                )
            yield pd.DataFrame(out)

    return payload_df.select("doc_id", "payload").mapInPandas(
        per_batch, ADPCM_STATS_SCHEMA
    )
