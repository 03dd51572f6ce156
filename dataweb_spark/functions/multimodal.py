"""Multimodal (image/audio/video) column plumbing (beyond-reference).

Media are opaque ``binary`` columns + a typed metadata struct; all transforms
run as Arrow-batched ``mapInPandas`` / pandas UDFs so bytes never cross the
JVM↔Python boundary row-at-a-time. Formats whose spec needs nothing beyond
numpy + the stdlib decode for REAL — BMP/PPM rasters, PNG (zlib inflate +
all five scanline filters), baseline JPEG (ITU-T T.81 sequential DCT:
Huffman entropy decode, dequantize, IDCT, chroma upsample — encoder too),
RIFF/WAVE PCM-16 audio, RIFF/AVI video (uncompressed DIB and Motion-JPEG),
and ISO BMFF MP4 (full box grammar + stsd/stts/stsc/stsz/stco sample
tables, Motion-JPEG track) — so the encode→decode→feature paths are fully
verifiable; codecs that genuinely require external libraries (mp3 —
its polyphase window is tabulated, not derivable; H.264/HEVC video
essence) are NOT in this container, so those kernels stay stubbed:
``decode_fake``-style byte
statistics keep schema, partitioning, batch shape and UDF signatures real
and testable, and ``decode_real`` raises ``NotImplementedError`` until a
codec library is installed.

Scale notes: media rows are large — transforms use ``mapInPandas`` (per
batch, streaming) rather than collect; ``maxRecordsPerBatch`` bounds Arrow
batch memory; repartition by a size-aware key upstream if blobs are skewed.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, DoubleType, IntegerType, LongType, StringType, StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),        # image | audio | video
    StructField("content", BinaryType()),     # opaque encoded bytes
    StructField("meta", StructType([
        StructField("format", StringType()),  # png/jpg/wav/mp4/...
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_s", DoubleType()),
    ])),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("n_bytes", LongType()),
    StructField("byte_mean", DoubleType()),
    StructField("byte_entropy", DoubleType()),
    StructField("phash64", LongType()),
])


def _synth_range(spark, n: int):
    """``spark.range(n)`` sized to the work: ``min(n, defaultParallelism)``
    partitions. A bare ``range(n)`` always splits into defaultParallelism
    partitions, so a small synthesis (n ≪ cores) scheduled mostly EMPTY
    tasks — and every task of the ``mapInPandas`` synthesizers pays a
    Python-worker round-trip whether or not it holds a row (the
    mixed-corpus catalog unions 8 such legs: ~9×32 tasks for 65 blobs).
    For n ≥ cores this is byte-identical to ``spark.range(n)``; the rows
    themselves never change (r15, guide §2.2 — fewer, non-empty tasks)."""
    return spark.range(
        n, numPartitions=max(1, min(int(n),
                                    spark.sparkContext.defaultParallelism)))


def synthesize_media(spark, n: int = 64, kind: str = "image") -> DataFrame:
    """Deterministic fake media table (content = seeded pseudo-bytes).

    Stands in for a real binary source so the pipeline is runnable in tests;
    generation is distributed (spark.range, no driver loop).
    """
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.lit(kind).alias("kind"),
        # unhex of repeated sha2 → 64 deterministic bytes per row
        F.unhex(F.sha2(F.col("id").cast("string"), 512)).alias("content"),
        F.struct(
            F.lit("fake").alias("format"),
            (F.pmod(F.col("id"), F.lit(64)) + 32).cast("int").alias("width"),
            (F.pmod(F.col("id"), F.lit(48)) + 32).cast("int").alias("height"),
            F.lit(None).cast("double").alias("duration_s"),
        ).alias("meta"))
    return df


def decode_real(content: bytes, fmt: str):
    """Decode a media blob to pixels. BMP and PPM rasters decode in pure
    numpy; PNG decodes via stdlib zlib + the pure-numpy unfilter below;
    baseline JPEG decodes via the pure-numpy Huffman+IDCT decoder — all
    REAL codecs, fully verifiable. Formats that require external
    libraries (mp3/mp4) raise until one is installed."""
    fmt = (fmt or "").lower()
    if fmt == "bmp":
        return decode_bmp(content)
    if fmt in ("ppm", "pnm"):
        return decode_ppm(content)
    if fmt == "png":
        return decode_png(content)
    if fmt in ("jpg", "jpeg"):
        return decode_jpeg(content)
    raise NotImplementedError(
        f"decode of {fmt!r} requires PIL/av/soundfile; install a codec "
        f"library and extend decode_real")


# ---------------------------------------------------------------------------
# Real raster codecs (pure numpy — no external library)
# ---------------------------------------------------------------------------

def encode_bmp(pixels) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as an uncompressed 24-bit BMP
    (BITMAPINFOHEADER, BI_RGB): 14-byte file header + 40-byte info header,
    rows bottom-up in BGR order, each padded to a 4-byte boundary."""
    import struct

    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = arr.shape
    img_size = (w * 3 + ((-w * 3) % 4)) * h
    header = (b"BM"
              + struct.pack("<IHHI", 54 + img_size, 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                            img_size, 2835, 2835, 0, 0))
    # rows bottom-up in BGR, 4-byte padded — the shared DIB layout
    return header + _dib_body(arr)


def decode_bmp(data: bytes):
    """Decode an uncompressed 24-bit BMP into an (H, W, 3) uint8 RGB array."""
    import struct

    import numpy as np

    if data[:2] != b"BM":
        raise ValueError("not a BMP stream")
    (offset,) = struct.unpack_from("<I", data, 10)
    (hdr_size, w, h, _planes, bpp, compression) = struct.unpack_from(
        "<IiiHHI", data, 14)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (got bpp={bpp}, "
            f"compression={compression})")
    flip = h > 0
    h = abs(h)
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    rows = np.frombuffer(data, dtype=np.uint8,
                         count=stride * h, offset=offset)
    rows = rows.reshape(h, stride)[:, :row_bytes].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]
    return rgb[::-1] if flip else rgb


def encode_ppm(pixels) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as binary PPM (P6)."""
    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = arr.shape
    return f"P6\n{w} {h}\n255\n".encode("ascii") + arr.tobytes()


def decode_ppm(data: bytes):
    """Decode a binary PPM (P6) into an (H, W, 3) uint8 RGB array."""
    import numpy as np

    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM stream")
    # header: magic, width, height, maxval — whitespace/comment separated
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos:pos + 1].isspace():
            pos += 1
        if data[pos:pos + 1] == b"#":
            while pos < len(data) and data[pos:pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise NotImplementedError("only 8-bit PPM supported")
    arr = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=pos)
    return arr.reshape(h, w, 3)


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import struct
    import zlib
    return (struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(pixels, filter_type: int = 0) -> bytes:
    """Encode a uint8 array as a real, spec-compliant PNG (stdlib zlib —
    no external codec). Shapes: ``(H, W)`` → greyscale (color type 0),
    ``(H, W, 3)`` → truecolor (2), ``(H, W, 4)`` → truecolor+alpha (6);
    8-bit, non-interlaced. ``filter_type`` (0-4) applies that scanline
    filter (None/Sub/Up/Average/Paeth) to every row, so round-trip tests
    can exercise each unfilter path."""
    import struct
    import zlib

    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color_type = {1: 0, 3: 2, 4: 6}[ch]
    if filter_type not in range(5):
        raise ValueError(f"bad PNG filter type {filter_type}")
    raw = arr.astype(np.int16)
    prior = np.zeros((w, ch), dtype=np.int16)
    lines = []
    for y in range(h):
        cur = raw[y]
        left = np.vstack([np.zeros((1, ch), np.int16), cur[:-1]])
        if filter_type == 0:
            out = cur
        elif filter_type == 1:
            out = cur - left
        elif filter_type == 2:
            out = cur - prior
        elif filter_type == 3:
            out = cur - (left + prior) // 2
        else:  # Paeth
            ul = np.vstack([np.zeros((1, ch), np.int16), prior[:-1]])
            out = cur - _paeth(left, prior, ul)
        lines.append(bytes([filter_type]) + (out % 256).astype(np.uint8)
                     .tobytes())
        prior = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    idat = zlib.compress(b"".join(lines))
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", idat) + _png_chunk(b"IEND", b""))


def _paeth(a, b, c):
    """PNG Paeth predictor, vectorized over a scanline (int16 arrays)."""
    import numpy as np
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def decode_png(data: bytes):
    """Decode an 8-bit non-interlaced PNG (color types 0/2/6) into an
    ``(H, W, 3)`` uint8 RGB array: chunk walk, zlib inflate, then
    sequential per-scanline unfilter (all five filter types). Greyscale is
    replicated across channels; alpha is dropped."""
    import struct
    import zlib

    import numpy as np

    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG stream")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(data):
        (size,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + size]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + size  # len + type + body + crc
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    w, h, depth, color_type, _comp, _filt, interlace = ihdr
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
    if depth != 8 or channels is None or interlace != 0:
        raise NotImplementedError(
            f"only 8-bit non-interlaced PNG color types 0/2/4/6 supported "
            f"(depth={depth}, color={color_type}, interlace={interlace})")
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload has wrong length")
    flat = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    recon = np.zeros((h, w, channels), dtype=np.int16)
    prior = np.zeros((w, channels), dtype=np.int16)
    for y in range(h):
        ftype = int(flat[y, 0])
        line = flat[y, 1:].reshape(w, channels).astype(np.int16)
        if ftype == 0:
            cur = line
        elif ftype == 2:
            cur = (line + prior) % 256
        elif ftype in (1, 3, 4):
            # left-dependent recurrence — sequential over pixels
            cur = np.zeros((w, channels), dtype=np.int16)
            for x in range(w):
                left = cur[x - 1] if x else np.zeros(channels, np.int16)
                up = prior[x]
                ul = prior[x - 1] if x else np.zeros(channels, np.int16)
                if ftype == 1:
                    pred = left
                elif ftype == 3:
                    pred = (left + up) // 2
                else:
                    pred = _paeth(left, up, ul)
                cur[x] = (line[x] + pred) % 256
        else:
            raise ValueError(f"bad PNG filter byte {ftype}")
        recon[y] = cur
        prior = cur
    px = recon.astype(np.uint8)
    if channels == 1:
        return np.repeat(px, 3, axis=2)
    if channels == 2:  # grey + alpha
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3]


# ---------------------------------------------------------------------------
# Baseline JPEG (ITU-T T.81) — pure numpy/stdlib encoder + decoder
# ---------------------------------------------------------------------------
# Sequential baseline DCT with Huffman coding, the profile every camera
# and library emits by default. Tables are the public Annex K defaults.
# The encoder writes 4:4:4 (or single-component greyscale); the decoder
# handles any sampling factors (4:2:0/4:2:2/4:4:4), restart intervals,
# and multi-table scans — enough to decode typical third-party baselines,
# not just our own output. Progressive (SOF2) and arithmetic coding are
# rejected loudly.

_JPEG_QY = [16, 11, 10, 16, 24, 40, 51, 61,
            12, 12, 14, 19, 26, 58, 60, 55,
            14, 13, 16, 24, 40, 57, 69, 56,
            14, 17, 22, 29, 51, 87, 80, 62,
            18, 22, 37, 56, 68, 109, 103, 77,
            24, 35, 55, 64, 81, 104, 113, 92,
            49, 64, 78, 87, 103, 121, 120, 101,
            72, 92, 95, 98, 112, 100, 103, 99]
_JPEG_QC = [17, 18, 24, 47, 99, 99, 99, 99,
            18, 21, 26, 66, 99, 99, 99, 99,
            24, 26, 56, 99, 99, 99, 99, 99,
            47, 66, 99, 99, 99, 99, 99, 99,
            99, 99, 99, 99, 99, 99, 99, 99,
            99, 99, 99, 99, 99, 99, 99, 99,
            99, 99, 99, 99, 99, 99, 99, 99,
            99, 99, 99, 99, 99, 99, 99, 99]
_ZIGZAG = [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
           12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
           35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
           58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63]
# Annex K default Huffman specs: (BITS counts per code length 1..16, VALS)
_HUFF_DC_Y = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
              list(range(12)))
_HUFF_DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_HUFF_AC_Y = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_HUFF_AC_C = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _dct_matrix():
    import numpy as np
    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    a = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    a[0, :] = 0.5 / np.sqrt(2.0)
    return a


def _jpeg_scaled_table(base, quality: int):
    """IJG quality scaling: 1–100 → per-entry divisor in 1..255."""
    import numpy as np
    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    t = (np.array(base, dtype=np.int64) * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int32)


def _huff_encode_table(bits, vals):
    """(BITS, VALS) → {symbol: (code, length)} via canonical assignment."""
    out, code = {}, 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_table(bits, vals):
    """(BITS, VALS) → {(length, code): symbol}."""
    out, code = {}, 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.out.append(b)
            if b == 0xFF:          # byte stuffing
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)   # pad with 1-bits per T.81
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """DPCM/AC magnitude coding: value → (category, extra-bits value)."""
    s = abs(v).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def encode_jpeg(pixels, quality: int = 75, subsampling: str = "444",
                restart_interval: int = 0) -> bytes:
    """Encode an (H, W) greyscale or (H, W, 3) RGB uint8 array as a
    baseline JFIF JPEG (SOF0, Annex-K Huffman tables).

    ``subsampling='444'`` (default) keeps full-resolution chroma;
    ``'420'`` box-averages chroma 2×2 (the common camera layout: MCUs
    interleave 4 Y blocks + Cb + Cr). ``restart_interval=N`` emits a DRI
    segment and an RSTn marker every N MCUs (byte-aligned, DC predictors
    reset) — both options exist chiefly so the decoder's subsampling and
    restart paths are proven by our own round-trips, not just claimed."""
    import struct

    import numpy as np

    arr = np.asarray(pixels, dtype=np.float64)
    grey = arr.ndim == 2
    h, w = arr.shape[:2]
    if grey:
        comps = [arr]
    else:
        r, g, b = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
        comps = [0.299 * r + 0.587 * g + 0.114 * b,
                 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
                 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b]
    sub420 = (subsampling == "420") and not grey
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    # per-component (h, v) sampling factors
    factors = [(1, 1)] if grey else \
        ([(2, 2), (1, 1), (1, 1)] if sub420 else [(1, 1), (1, 1), (1, 1)])
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    qy = _jpeg_scaled_table(_JPEG_QY, quality)
    qc = _jpeg_scaled_table(_JPEG_QC, quality)
    qtabs = [qy] if grey else [qy, qc]
    A = _dct_matrix()
    zz = np.array(_ZIGZAG)

    enc_dc = [_huff_encode_table(*_HUFF_DC_Y),
              _huff_encode_table(*_HUFF_DC_C)]
    enc_ac = [_huff_encode_table(*_HUFF_AC_Y),
              _huff_encode_table(*_HUFF_AC_C)]

    def pad_to(plane, ph, pw):
        sh, sw = plane.shape
        p = np.empty((ph, pw))
        p[:sh, :sw] = plane
        if ph > sh:
            p[sh:, :sw] = plane[sh - 1:sh, :]   # edge-replicate padding
        if pw > sw:
            p[:, sw:] = p[:, sw - 1:sw]
        return p

    padded = []
    for (fh, fv), plane in zip(factors, comps):
        if (fh, fv) != (hmax, vmax):            # chroma downsample (420)
            ry, rx = vmax // fv, hmax // fh
            full = pad_to(plane, -(-h // ry) * ry, -(-w // rx) * rx)
            plane = full.reshape(full.shape[0] // ry, ry,
                                 full.shape[1] // rx, rx).mean(axis=(1, 3))
        padded.append(pad_to(plane, mcuy * 8 * fv, mcux * 8 * fh) - 128.0)

    bw = _BitWriter()
    pred = [0] * len(comps)

    def put_block(ci, yb, xb):
        ti = 0 if ci == 0 else 1
        q = qtabs[min(ti, len(qtabs) - 1)]
        block = padded[ci][yb * 8:yb * 8 + 8, xb * 8:xb * 8 + 8]
        coeff = A @ block @ A.T
        quant = np.round(coeff.flatten() / q.astype(np.float64))
        quant = quant.astype(np.int64)[zz]
        diff = int(quant[0]) - pred[ci]
        pred[ci] = int(quant[0])
        s, extra = _magnitude(diff)
        code, ln = enc_dc[ti][s]
        bw.put(code, ln)
        if s:
            bw.put(extra, s)
        run = 0
        for v in quant[1:]:
            v = int(v)
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = enc_ac[ti][0xF0]   # ZRL
                bw.put(code, ln)
                run -= 16
            s, extra = _magnitude(v)
            code, ln = enc_ac[ti][(run << 4) | s]
            bw.put(code, ln)
            bw.put(extra, s)
            run = 0
        if run:
            code, ln = enc_ac[ti][0x00]       # EOB
            bw.put(code, ln)

    done = rst = 0
    n_mcus = mcux * mcuy
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (fh, fv) in enumerate(factors):
                for v in range(fv):
                    for hh in range(fh):
                        put_block(ci, my * fv + v, mx * fh + hh)
            done += 1
            if restart_interval and done % restart_interval == 0 \
                    and done < n_mcus:
                # byte-align (1-bit pad), emit RSTn, reset DC prediction
                bw.flush()
                bw.out.append(0xFF)
                bw.out.append(0xD0 + rst % 8)
                rst += 1
                pred[:] = [0] * len(comps)
    scan = bw.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def dqt(tid, table):
        return seg(0xDB, bytes([tid]) +
                   bytes(int(table.flatten()[z]) for z in _ZIGZAG))

    def dht(cls, tid, spec):
        bits, vals = spec
        return seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) +
                   bytes(vals))

    ncomp = 1 if grey else 3
    sof_comps = b"".join(
        bytes([i + 1, (factors[i][0] << 4) | factors[i][1],
               0 if i == 0 else 1]) for i in range(ncomp))
    sos_comps = b"".join(
        bytes([i + 1, 0x00 if i == 0 else 0x11]) for i in range(ncomp))
    out = (b"\xFF\xD8" +
           seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00") +
           dqt(0, qy) + (b"" if grey else dqt(1, qc)) +
           seg(0xC0, struct.pack(">BHHB", 8, h, w, ncomp) +
               sof_comps) +
           dht(0, 0, _HUFF_DC_Y) + dht(1, 0, _HUFF_AC_Y) +
           (b"" if grey else dht(0, 1, _HUFF_DC_C) +
            dht(1, 1, _HUFF_AC_C)) +
           (seg(0xDD, struct.pack(">H", restart_interval))
            if restart_interval else b"") +
           seg(0xDA, bytes([ncomp]) + sos_comps + b"\x00\x3F\x00") +
           scan + b"\xFF\xD9")
    return out


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; RSTn markers are surfaced via ``restart()``."""

    def __init__(self, data: bytes, pos: int):
        self.data, self.pos = data, pos
        self.acc, self.nbits = 0, 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d) - 1:
            raise ValueError("truncated JPEG scan")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise ValueError(f"marker 0x{nxt:02x} inside scan")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if not self.nbits:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> None:
        """Consume an RSTn marker at the current (byte-aligned) position."""
        self.acc, self.nbits = 0, 0
        d = self.data
        if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
            self.pos += 2
        else:
            raise ValueError("expected restart marker")


class _RestartMarker(Exception):
    def __init__(self, marker):
        self.marker = marker


def _decode_huff(br: _BitReader, table) -> int:
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | br.bit()
        ln += 1
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in scan")


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def decode_jpeg(data: bytes):
    """Decode a baseline sequential JPEG (SOF0) into an (H, W, 3) uint8
    RGB array (greyscale replicated across channels). Handles arbitrary
    sampling factors, restart intervals, and multiple quant/Huffman
    tables; progressive/arithmetic/hierarchical JPEGs raise
    NotImplementedError. Corrupt streams raise ValueError — the kernels
    run inside executors, so parse failures must be classifiable, not
    arbitrary exception types."""
    import struct
    try:
        return _decode_jpeg(data)
    except (IndexError, KeyError, struct.error) as e:
        raise ValueError(f"corrupt JPEG stream: {type(e).__name__}: {e}") \
            from None


def decode_jpeg_dc_thumbnail(data: bytes):
    """1/8-scale thumbnail from DC coefficients ONLY — the 100-TB media
    path: the scan is Huffman-parsed (unavoidable: AC symbols must be
    consumed to advance the bitstream) but per-block IDCT, full-res plane
    assembly, and full-res color conversion are all skipped; each 8×8
    block contributes exactly its mean (DC/8). Signatures/aHash computed
    from this thumbnail match full-decode signatures wherever their grid
    aligns with JPEG blocks — the standard trick for image-dedup sweeps
    over petabyte JPEG corpora. Returns (H/8, W/8, 3) uint8 (ceil)."""
    import struct
    try:
        return _decode_jpeg(data, dc_only=True)
    except (IndexError, KeyError, struct.error) as e:
        raise ValueError(f"corrupt JPEG stream: {type(e).__name__}: {e}") \
            from None


def jpeg_meta(data: bytes) -> dict:
    """Header-only probe: width/height/components/sampling from the SOF
    marker — no scan decode, no Huffman, O(header) bytes touched. The
    catalog-scan primitive for bulk media inventory (dims + layout for
    billions of blobs without decoding one pixel)."""
    import struct

    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG stream (no SOI)")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("expected marker")
        marker = data[pos + 1]
        if marker == 0xD9 or marker == 0xDA:
            break
        (size,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4:pos + 2 + size]
        pos += 2 + size
        if marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9,
                      0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            prec, ih, iw, nc = struct.unpack_from(">BHHB", body, 0)
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i:9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            if nc == 3 and (hmax, vmax) == (2, 2):
                sampling = "420"
            elif nc == 3 and (hmax, vmax) == (2, 1):
                sampling = "422"
            elif nc == 3:
                sampling = "444"
            else:
                sampling = "grey"
            return {"width": iw, "height": ih, "n_components": nc,
                    "sampling": sampling, "precision": prec,
                    "baseline": marker in (0xC0, 0xC1)}
    raise ValueError("no SOF marker before scan/EOI")


def _decode_jpeg(data: bytes, dc_only: bool = False):
    import struct

    import numpy as np

    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG stream (no SOI)")
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    sof = None
    restart_interval = 0
    pos = 2
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("expected marker")
        marker = data[pos + 1]
        if marker == 0xD9:          # EOI
            break
        (size,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4:pos + 2 + size]
        pos += 2 + size
        if marker == 0xDB:          # DQT
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0x0F
                n = 64 * (2 if pq else 1)
                raw = body[off + 1:off + 1 + n]
                vals = (np.frombuffer(raw, dtype=">u2") if pq
                        else np.frombuffer(raw, dtype=np.uint8))
                t = np.zeros(64, dtype=np.int32)
                t[np.array(_ZIGZAG)] = vals
                qtabs[tq] = t.reshape(8, 8)
                off += 1 + n
        elif marker == 0xC4:        # DHT
            off = 0
            while off < len(body):
                cls, tid = body[off] >> 4, body[off] & 0x0F
                bits = list(body[off + 1:off + 17])
                nv = sum(bits)
                vals = list(body[off + 17:off + 17 + nv])
                htabs[(cls, tid)] = _huff_decode_table(bits, vals)
                off += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:   # SOF0/1 (baseline/ext seq)
            prec, ih, iw, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            sof = (ih, iw, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0x{marker:02x})")
        elif marker == 0xDD:        # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:        # SOS — entropy-coded data follows
            if sof is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan_comps = []
            by_id = {c["id"]: c for c in sof[2]}
            for i in range(ns):
                cs, tabs = body[1 + 2 * i], body[2 + 2 * i]
                c = by_id[cs]
                scan_comps.append((c, tabs >> 4, tabs & 0x0F))
            ih, iw, comps = sof
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = -(-iw // (8 * hmax))
            mcuy = -(-ih // (8 * vmax))
            A = _dct_matrix()
            bs = 1 if dc_only else 8     # per-block plane resolution
            planes = {}
            for c in comps:
                planes[c["id"]] = np.zeros(
                    (mcuy * bs * c["v"], mcux * bs * c["h"]))
            if ns == 1:
                c, _, _ = scan_comps[0]
                # non-interleaved: MCU is a single block of that component
                bw_ = -(-(iw * c["h"]) // (hmax * 8))
                bh_ = -(-(ih * c["v"]) // (vmax * 8))
                order = [(c, tdc, tac, x, y)
                         for (c, tdc, tac) in scan_comps
                         for y in range(bh_) for x in range(bw_)]
                per_mcu = 1
                mcus = bw_ * bh_
            else:
                order = None
                per_mcu = sum(c["h"] * c["v"] for c, _, _ in scan_comps)
                mcus = mcux * mcuy
            br = _BitReader(data, pos)
            pred = {c["id"]: 0 for c, _, _ in scan_comps}
            zz = np.array(_ZIGZAG)

            def decode_block(c, tdc, tac, bx_, by_):
                dc_t = htabs.get((0, tdc))
                ac_t = htabs.get((1, tac))
                q = qtabs.get(c["tq"])
                if dc_t is None or ac_t is None or q is None:
                    raise ValueError("scan references missing table")
                s = _decode_huff(br, dc_t)
                diff = _extend(br.bits(s), s) if s else 0
                pred[c["id"]] += diff
                coef = np.zeros(64)
                coef[0] = pred[c["id"]]
                k = 1
                while k < 64:
                    rs = _decode_huff(br, ac_t)
                    r, s = rs >> 4, rs & 0x0F
                    if rs == 0x00:      # EOB
                        break
                    if rs == 0xF0:      # ZRL
                        k += 16
                        continue
                    k += r
                    if k > 63:
                        raise ValueError("AC run past end of block")
                    coef[k] = _extend(br.bits(s), s)
                    k += 1
                pl = planes[c["id"]]
                if dc_only:
                    # mean(IDCT(C)) == C[0,0]/8 for the orthonormal DCT:
                    # one multiply replaces two 8x8 matmuls per block
                    pl[by_, bx_] = pred[c["id"]] * float(q[0, 0]) / 8.0 \
                        + 128.0
                    return
                dq = np.zeros(64)
                dq[zz] = coef
                block = A.T @ (dq.reshape(8, 8) * q) @ A + 128.0
                pl[by_ * 8:by_ * 8 + 8, bx_ * 8:bx_ * 8 + 8] = block

            done = 0
            try:
                if ns == 1:
                    for (c, tdc, tac, x, y) in order:
                        try:
                            decode_block(c, tdc, tac, x, y)
                        except _RestartMarker:
                            raise ValueError("unexpected restart") from None
                        done += 1
                        if restart_interval and done % restart_interval == 0 \
                                and done < mcus:
                            br.restart()
                            pred = {k: 0 for k in pred}
                else:
                    for my in range(mcuy):
                        for mx in range(mcux):
                            for (c, tdc, tac) in scan_comps:
                                for v in range(c["v"]):
                                    for hh in range(c["h"]):
                                        decode_block(
                                            c, tdc, tac,
                                            mx * c["h"] + hh,
                                            my * c["v"] + v)
                            done += 1
                            if restart_interval and \
                                    done % restart_interval == 0 and \
                                    done < mcus:
                                br.restart()
                                pred = {k: 0 for k in pred}
            except _RestartMarker as e:
                raise ValueError(
                    f"restart marker 0x{e.marker:02x} without DRI") from None

            th, tw = (-(-ih // 8), -(-iw // 8)) if dc_only else (ih, iw)
            out_planes = []
            for c in comps:
                pl = planes[c["id"]]
                ry, rx = vmax // c["v"], hmax // c["h"]
                if ry > 1 or rx > 1:     # nearest-neighbour upsample
                    pl = np.repeat(np.repeat(pl, ry, axis=0), rx, axis=1)
                out_planes.append(pl[:th, :tw])
            if len(out_planes) == 1:
                y = np.clip(np.round(out_planes[0]), 0, 255) \
                      .astype(np.uint8)
                return np.repeat(y[:, :, None], 3, axis=2)
            y, cb, cr = out_planes[0], out_planes[1] - 128, \
                out_planes[2] - 128
            rgb = np.stack([y + 1.402 * cr,
                            y - 0.344136 * cb - 0.714136 * cr,
                            y + 1.772 * cb], axis=2)
            return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
        elif marker in (0xD8,):
            raise ValueError("unexpected SOI")
        # APPn/COM/others: skipped
    raise ValueError("no SOS scan in JPEG stream")


def _riff_chunk(cid: bytes, body: bytes) -> bytes:
    import struct
    pad = b"\x00" if len(body) % 2 else b""
    return cid + struct.pack("<I", len(body)) + body + pad


def _dib_body(frame) -> bytes:
    """Bottom-up BGR 4-byte-padded pixel rows — the shared raster layout of
    BMP files and AVI '00db' (uncompressed DIB) frames."""
    import numpy as np
    h, w, _ = frame.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    rows = frame[::-1, :, ::-1].reshape(h, row_bytes)
    if pad:
        rows = np.concatenate(
            [rows, np.zeros((h, pad), dtype=np.uint8)], axis=1)
    return rows.tobytes()


def _dib_frames(payloads: list[bytes], w: int, h: int):
    import numpy as np
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    out = np.empty((len(payloads), h, w, 3), dtype=np.uint8)
    for i, body in enumerate(payloads):
        rows = np.frombuffer(body, dtype=np.uint8, count=stride * h)
        out[i] = rows.reshape(h, stride)[:, :row_bytes] \
                     .reshape(h, w, 3)[::-1, :, ::-1]
    return out


_MJPG_FOURCC = 0x47504A4D  # 'MJPG' little-endian


def encode_avi(frames, fps: int = 10, codec: str = "DIB ",
               quality: int = 90) -> bytes:
    """Encode an (N, H, W, 3) uint8 RGB frame stack as a real AVI
    (RIFF 'AVI ': hdrl{avih, strl{strh 'vids', strf BITMAPINFOHEADER}},
    movi{frames}, idx1) — the video sibling of the WAV/BMP codecs, pure
    struct+numpy. ``codec='DIB '`` writes uncompressed bottom-up DIB
    frames ('00db'); ``codec='MJPG'`` writes Motion-JPEG — each frame an
    independent baseline JPEG from :func:`encode_jpeg` ('00dc', tables
    included in every frame, so any standard MJPEG reader decodes it)."""
    import struct

    import numpy as np

    arr = np.asarray(frames, dtype=np.uint8)
    n, h, w, _ = arr.shape
    mjpg = codec.upper().startswith("MJPG")
    if mjpg:
        bodies = [encode_jpeg(f, quality=quality) for f in arr]
        fourcc, chunk_id, compression = b"MJPG", b"00dc", _MJPG_FOURCC
    else:
        bodies = [_dib_body(f) for f in arr]
        fourcc, chunk_id, compression = b"DIB ", b"00db", 0
    frame_size = max((len(b) for b in bodies), default=0)
    avih = struct.pack("<14I", 1_000_000 // fps, frame_size * fps, 0,
                       0x10, n, 0, 1, frame_size, w, h, 0, 0, 0, 0)
    strh = (b"vids" + fourcc + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0,
                                           1, fps, 0, n, frame_size,
                                           0xFFFFFFFF, 0)
            + struct.pack("<4h", 0, 0, w, h))
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, compression,
                       frame_size, 2835, 2835, 0, 0)
    strl = _riff_chunk(b"LIST", b"strl" + _riff_chunk(b"strh", strh)
                       + _riff_chunk(b"strf", strf))
    hdrl = _riff_chunk(b"LIST", b"hdrl" + _riff_chunk(b"avih", avih) + strl)
    movi_items = [_riff_chunk(chunk_id, b) for b in bodies]
    movi = _riff_chunk(b"LIST", b"movi" + b"".join(movi_items))
    idx, off = [], 4  # offsets relative to the 'movi' fourcc
    for b in bodies:
        idx.append(struct.pack("<4sIII", chunk_id, 0x10, off, len(b)))
        off += 8 + len(b) + (len(b) % 2)
    idx1 = _riff_chunk(b"idx1", b"".join(idx))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(data: bytes):
    """Decode an AVI into ``(fps, frames[N,H,W,3])`` — uncompressed
    24-bit DIB streams and Motion-JPEG ('MJPG') streams, whose frames
    decode through the baseline JPEG decoder. Walks the RIFF chunk tree
    (unknown chunks skipped, so files from other writers with extra
    headers decode too)."""
    import struct

    import numpy as np

    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    dims = {}
    payloads: list[bytes] = []

    def walk(buf: bytes) -> None:
        pos = 0
        while pos + 8 <= len(buf):
            cid = buf[pos:pos + 4]
            (size,) = struct.unpack_from("<I", buf, pos + 4)
            body = buf[pos + 8:pos + 8 + size]
            if cid == b"LIST":
                walk(body[4:])
            elif cid == b"avih":
                vals = struct.unpack_from("<14I", body, 0)
                dims["n"], dims["w"], dims["h"] = vals[4], vals[8], vals[9]
            elif cid == b"strh" and body[:4] == b"vids":
                scale, rate = struct.unpack_from("<II", body, 20)
                dims["fps"] = rate // max(scale, 1)
            elif cid == b"strf":
                _sz, _w, _h, _pl, bpp, comp = struct.unpack_from(
                    "<IiiHHI", body, 0)
                if comp == _MJPG_FOURCC:
                    dims["mjpg"] = True
                elif bpp != 24 or comp != 0:
                    raise NotImplementedError(
                        f"only uncompressed 24-bit or MJPG AVI supported "
                        f"(bpp={bpp}, compression={comp})")
            elif cid in (b"00db", b"00dc"):
                payloads.append(body)
            pos += 8 + size + (size % 2)

    walk(data[12:])
    if "w" not in dims or not payloads:
        raise ValueError("missing avih header or frame data")
    if dims.get("mjpg"):
        frames = np.stack([decode_jpeg(p) for p in payloads])
        return dims.get("fps", 0), frames
    return dims.get("fps", 0), _dib_frames(payloads, dims["w"], dims["h"])


# ---------------------------------------------------------------------------
# MP4 / ISO BMFF container codec (pure struct+numpy — no external library)
#
# The reference treats video blobs as opaque bytes plus typed metadata
# (SURVEY.md §2 multimodal columns); here the container itself is a real
# codec: a Motion-JPEG video track in an ISO base-media file (ISO/IEC
# 14496-12 box grammar, QuickTime-compatible 'jpeg' VisualSampleEntry —
# every sample an independent baseline JPEG from encode_jpeg, so any
# standard player decodes our files and we decode standard MJPEG-in-MP4).
# ---------------------------------------------------------------------------

def _box(btype: bytes, body: bytes) -> bytes:
    import struct
    return struct.pack(">I", 8 + len(body)) + btype + body


def _full_box(btype: bytes, version: int, flags: int, body: bytes) -> bytes:
    import struct
    return _box(btype, struct.pack(">B3s", version,
                                   flags.to_bytes(3, "big")) + body)


_MP4_MATRIX = (b"\x00\x01\x00\x00" + b"\x00" * 4 * 3
               + b"\x00\x01\x00\x00" + b"\x00" * 4 * 3
               + b"\x40\x00\x00\x00")  # unity 3x3 fixed-point matrix


def encode_mp4(frames, fps: int = 10, quality: int = 75,
               samples_per_chunk: int = 4, faststart: bool = False) -> bytes:
    """Encode an (N, H, W, 3) uint8 RGB frame stack as a real ISO BMFF
    MP4 with one Motion-JPEG video track: ``ftyp`` + ``mdat`` (each
    sample an independent baseline JPEG) + ``moov`` with the full sample
    table — ``stsd`` ('jpeg' visual sample entry), ``stts`` (constant
    delta), ``stsc`` (samples grouped ``samples_per_chunk`` per chunk so
    the chunk-offset machinery is exercised, not degenerate), ``stsz``
    (per-sample sizes), ``stco`` (absolute chunk offsets). ``mdat``
    precedes ``moov`` by default; ``faststart=True`` writes ``moov``
    first (the web/streaming layout — a catalog probe then reads the
    whole sample table from the first few KB without seeking past the
    media payload; the moov size is offset-independent, so chunk
    offsets are computed after sizing it)."""
    import struct

    import numpy as np

    arr = np.asarray(frames, dtype=np.uint8)
    n, h, w, _ = arr.shape
    bodies = [encode_jpeg(f, quality=quality) for f in arr]
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isommp41")
    mdat = _box(b"mdat", b"".join(bodies))
    k = max(1, samples_per_chunk)

    # chunk layout: full chunks of k samples + one partial tail chunk
    sizes = [len(b) for b in bodies]

    def chunk_offsets_from(base: int) -> list:
        offs, off = [], base
        for c0 in range(0, n, k):
            offs.append(off)
            off += sum(sizes[c0:c0 + k])
        return offs

    chunk_offsets = chunk_offsets_from(len(ftyp) + 8)

    mvhd = _full_box(b"mvhd", 0, 0, struct.pack(
        ">IIII", 0, 0, fps, n) + struct.pack(">i", 0x00010000)
        + struct.pack(">h", 0x0100) + b"\x00" * 10 + _MP4_MATRIX
        + b"\x00" * 24 + struct.pack(">I", 2))
    tkhd = _full_box(b"tkhd", 0, 7, struct.pack(
        ">IIIII", 0, 0, 1, 0, n) + b"\x00" * 8
        + struct.pack(">hhhh", 0, 0, 0, 0) + _MP4_MATRIX
        + struct.pack(">II", w << 16, h << 16))
    mdhd = _full_box(b"mdhd", 0, 0, struct.pack(
        ">IIIIHH", 0, 0, fps, n, 0x55C4, 0))  # language 'und'
    hdlr = _full_box(b"hdlr", 0, 0, b"\x00" * 4 + b"vide" + b"\x00" * 12
                     + b"VideoHandler\x00")
    name = b"Motion-JPEG"
    entry = _box(b"jpeg", b"\x00" * 6 + struct.pack(">H", 1)
                 + b"\x00" * 16 + struct.pack(">HH", w, h)
                 + struct.pack(">II", 0x00480000, 0x00480000)
                 + b"\x00" * 4 + struct.pack(">H", 1)
                 + bytes([len(name)]) + name + b"\x00" * (31 - len(name))
                 + struct.pack(">Hh", 24, -1))
    stsd = _full_box(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stts = _full_box(b"stts", 0, 0, struct.pack(">III", 1, n, 1))
    stsc_entries = [(1, min(k, n), 1)]
    if n > k and n % k:
        stsc_entries.append((n // k + 1, n % k, 1))
    stsc = _full_box(b"stsc", 0, 0, struct.pack(
        ">I", len(stsc_entries)) + b"".join(
        struct.pack(">III", *e) for e in stsc_entries))
    stsz = _full_box(b"stsz", 0, 0, struct.pack(">II", 0, n)
                     + b"".join(struct.pack(">I", s) for s in sizes))

    def build_moov(offsets: list) -> bytes:
        stco = _full_box(b"stco", 0, 0, struct.pack(
            ">I", len(offsets)) + b"".join(
            struct.pack(">I", o) for o in offsets))
        stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
        vmhd = _full_box(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
        dref = _full_box(b"dref", 0, 0, struct.pack(">I", 1)
                         + _full_box(b"url ", 0, 1, b""))
        minf = _box(b"minf", vmhd + _box(b"dinf", dref) + stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        trak = _box(b"trak", tkhd + mdia)
        return _box(b"moov", mvhd + trak)

    if faststart:
        # moov size is independent of the offset VALUES (fixed-width
        # fields), so size it once, then rewrite with real offsets
        moov_size = len(build_moov(chunk_offsets))
        moov = build_moov(chunk_offsets_from(len(ftyp) + moov_size + 8))
        return ftyp + moov + mdat
    return ftyp + mdat + build_moov(chunk_offsets)


def _walk_boxes(buf: bytes, pos: int, end: int):
    """Yield ``(fourcc, body_start, body_end)`` for each box in
    ``buf[pos:end]``; handles 64-bit largesize (size==1) and
    to-end-of-file (size==0) boxes; truncation raises ValueError."""
    import struct
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", buf, pos)
        btype = buf[pos + 4:pos + 8]
        hdr = 8
        if size == 1:
            (size,) = struct.unpack_from(">Q", buf, pos + 8)
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError(f"truncated/overlong box {btype!r}")
        yield btype, pos + hdr, pos + size
        pos += size


def _find_box(buf: bytes, pos: int, end: int, path: tuple) -> tuple:
    """Return ``(body_start, body_end)`` of the first box at ``path``
    (a tuple of fourccs) or raise ValueError."""
    for btype, s, e in _walk_boxes(buf, pos, end):
        if btype == path[0]:
            if len(path) == 1:
                return s, e
            return _find_box(buf, s, e, path[1:])
    raise ValueError(f"missing {b'/'.join(path)!r} box")


def _classify_parse_errors(fn):
    """Corrupt-stream hardening: fixed-offset header reads on attacker
    bytes can raise struct.error/IndexError; decode kernels classify
    per-row failures by (ValueError, NotImplementedError), so convert."""
    import functools
    import struct

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except (struct.error, IndexError) as exc:
            raise ValueError(f"truncated/corrupt stream: {exc}") from exc
    return wrapped


@_classify_parse_errors
def decode_mp4(data: bytes):
    """Decode an ISO BMFF MP4 into ``(fps, frames[N,H,W,3])``. Walks the
    box tree to the first video track's sample table, reconstructs every
    sample's file offset from stsc/stco(co64)/stsz, and decodes each
    Motion-JPEG sample through the baseline JPEG decoder. Non-MJPEG
    codecs (avc1/hvc1/mp4v...) raise NotImplementedError — H.264-class
    entropy decoding needs an external library; the container layer
    itself is fully real. Unknown sibling boxes (free/udta/skip, other
    tracks) are skipped, so files from other writers parse."""
    import struct

    import numpy as np

    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO BMFF stream (missing ftyp)")
    moov = _find_box(data, 0, len(data), (b"moov",))

    video_stbl = None
    fourcc = None
    timescale = fps = None
    for btype, s, e in _walk_boxes(data, *moov):
        if btype != b"trak":
            continue
        try:
            mdia = _find_box(data, s, e, (b"mdia",))
            hs, he = _find_box(data, *mdia, (b"hdlr",))
            if data[hs + 8:hs + 12] != b"vide":
                continue
            ms, _me = _find_box(data, *mdia, (b"mdhd",))
            ver = data[ms]
            timescale = struct.unpack_from(
                ">I", data, ms + (20 if ver == 1 else 12))[0]
            video_stbl = _find_box(data, *mdia, (b"minf", b"stbl"))
        except ValueError:
            continue
        break
    if video_stbl is None:
        raise ValueError("no video track found")

    boxes = {btype: (s, e)
             for btype, s, e in _walk_boxes(data, *video_stbl)}
    for req in (b"stsd", b"stsz", b"stsc"):
        if req not in boxes:
            raise ValueError(f"missing {req!r} box")
    if b"stco" not in boxes and b"co64" not in boxes:
        raise ValueError("missing stco/co64 box")

    s, e = boxes[b"stsd"]
    for btype, es, ee in _walk_boxes(data, s + 8, e):
        fourcc = btype
        break
    if fourcc is None:
        raise ValueError("empty stsd box")
    if fourcc not in (b"jpeg", b"mjpa"):
        raise NotImplementedError(
            f"only Motion-JPEG ('jpeg') MP4 tracks supported, got "
            f"{fourcc!r}; H.264/HEVC/MPEG-4 Part 2 need an external codec")

    s, _e = boxes[b"stsz"]
    sample_size, n = struct.unpack_from(">II", data, s + 4)
    sizes = ([sample_size] * n if sample_size
             else list(struct.unpack_from(f">{n}I", data, s + 12)))

    s, _e = boxes[b"stsc"]
    (n_stsc,) = struct.unpack_from(">I", data, s + 4)
    stsc = [struct.unpack_from(">III", data, s + 8 + 12 * i)
            for i in range(n_stsc)]

    if b"stco" in boxes:
        s, _e = boxes[b"stco"]
        (n_chunks,) = struct.unpack_from(">I", data, s + 4)
        offsets = struct.unpack_from(f">{n_chunks}I", data, s + 8)
    else:
        s, _e = boxes[b"co64"]
        (n_chunks,) = struct.unpack_from(">I", data, s + 4)
        offsets = struct.unpack_from(f">{n_chunks}Q", data, s + 8)

    # expand stsc runs -> samples-per-chunk for every chunk
    per_chunk = []
    for i, (first, spc, _sdi) in enumerate(stsc):
        last = (stsc[i + 1][0] - 1) if i + 1 < len(stsc) else n_chunks
        per_chunk.extend([spc] * (last - first + 1))
    if len(per_chunk) != n_chunks:
        raise ValueError("stsc chunk map inconsistent with stco")

    payloads = []
    si = 0
    for chunk_off, spc in zip(offsets, per_chunk):
        off = chunk_off
        for _ in range(spc):
            if si >= n:
                break
            payloads.append(data[off:off + sizes[si]])
            off += sizes[si]
            si += 1
    if si != n:
        raise ValueError("sample table covers fewer samples than stsz")

    # fps: constant-delta stts if present, else timescale alone
    if b"stts" in boxes and timescale:
        s, _e = boxes[b"stts"]
        (n_stts,) = struct.unpack_from(">I", data, s + 4)
        if n_stts >= 1:
            _cnt, delta = struct.unpack_from(">II", data, s + 8)
            fps = timescale // max(delta, 1)
    frames = np.stack([decode_jpeg(p) for p in payloads])
    return fps or 0, frames


def _sniff_video(data: bytes) -> str:
    """Container detection by magic: RIFF/AVI vs ISO BMFF ftyp."""
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return "avi"
    if len(data) >= 12 and data[4:8] == b"ftyp":
        return "mp4"
    raise ValueError("unrecognized video container")


def decode_video(data: bytes):
    """Decode any supported video container into ``(fps, frames)`` —
    RIFF/AVI (DIB or MJPG) and ISO BMFF MP4 (Motion-JPEG track),
    dispatched by magic bytes so callers never carry format flags."""
    return (decode_avi if _sniff_video(data) == "avi"
            else decode_mp4)(data)


def encode_wav(samples, sample_rate: int = 8000) -> bytes:
    """Encode an int16 sample array — shape (n,) mono or (n, channels) —
    as a canonical RIFF/WAVE PCM file (fmt chunk + data chunk,
    little-endian 16-bit)."""
    import struct

    import numpy as np

    arr = np.asarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr.reshape(-1, 1)
    n, channels = arr.shape
    block_align = channels * 2
    byte_rate = sample_rate * block_align
    data = arr.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate,
                      block_align, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes):
    """Decode a RIFF/WAVE PCM-16 stream into
    ``(sample_rate, samples[n, channels] int16)``. Walks the chunk list
    (extra chunks like LIST/INFO are skipped), so well-formed files from
    other writers decode too."""
    import struct

    import numpy as np

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    payload = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            payload = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt is None or payload is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, sample_rate, _br, _ba, bits = fmt
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            f"only PCM-16 WAV supported (format={audio_format}, "
            f"bits={bits})")
    arr = np.frombuffer(payload, dtype="<i2")
    return sample_rate, arr.reshape(-1, channels)


# ---------------------------------------------------------------------------
# FLAC codec (pure stdlib+numpy — no external library)
#
# Real COMPRESSED audio, losslessly round-trippable: unlike mp3 (whose
# polyphase synthesis window is tabulated in the spec, not derivable),
# every constant in FLAC is computable — the CRC-8/CRC-16 polynomials,
# the four fixed-predictor difference filters, rice/zigzag coding, and
# the UTF-8-style frame-number coding are all closed-form. The encoder
# writes a spec-conformant subset (16-bit PCM, independent channels,
# fixed predictors, 4-bit rice, partition order 0); the decoder reads
# the general fixed-predictor surface: any blocksize/partition order,
# rice method 0/1 with escape partitions, wasted bits, CONSTANT /
# VERBATIM / FIXED subframes, and the left-side / right-side / mid-side
# stereo decorrelations, with CRC-8, CRC-16 and STREAMINFO-MD5 verified.
# ---------------------------------------------------------------------------

def _crc8_flac(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 \
                else (crc << 1) & 0xFF
    return crc


def _crc16_flac(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


def _flac_utf8_number(v: int) -> bytes:
    """FLAC frame/sample numbers use the UTF-8 length-prefix scheme
    extended to 36-bit values. An encoding with ``n`` continuation bytes
    carries ``(6 - n) + 6n = 6 + 5n`` payload bits (lead byte keeps
    ``6 - n`` free bits, each continuation 6), so the minimal byte count
    is the smallest ``n`` with ``v < 2^(6+5n)`` — strict decoders reject
    overlong forms."""
    if v < 0x80:
        return bytes([v])
    out = []
    n_bytes = 1
    while v >= (1 << (6 + 5 * n_bytes)) and n_bytes < 6:
        n_bytes += 1
    for _ in range(n_bytes):
        out.append(0x80 | (v & 0x3F))
        v >>= 6
    lead = (0xFF << (7 - n_bytes)) & 0xFF | v
    return bytes([lead] + out[::-1])


class _FlacBitWriter:
    """MSB-first bit writer, zero-padded to byte alignment on ``bytes()``
    (no byte stuffing — that's a JPEG entropy-layer concern)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.out.append((self.acc >> (self.nbits - 8)) & 0xFF)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def bytes(self) -> bytes:
        if self.nbits:
            self.write(0, 8 - self.nbits)
        return bytes(self.out)


def _read_rice_residuals(br, bs: int, order: int) -> list:
    """Read one subframe's rice-coded residual section (methods 0/1,
    any partition order, escaped raw-bit partitions) — shared by the
    FIXED and LPC subframe decoders."""
    method = br.read(2)
    if method > 1:
        raise ValueError("reserved residual coding method")
    p_order = br.read(4)
    plen = bs >> p_order
    res = []
    for pi in range(1 << p_order):
        cnt = plen - order if pi == 0 else plen
        pbits = 5 if method else 4
        param = br.read(pbits)
        if param == (1 << pbits) - 1:     # escape: raw bits
            raw = br.read(5)
            res.extend(br.read_signed(raw) if raw else 0
                       for _ in range(cnt))
        else:
            for _ in range(cnt):
                q = br.read_unary()
                u = (q << param) | (br.read(param) if param else 0)
                res.append((u >> 1) ^ -(u & 1))
    return res


class _FlacBitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos          # byte position
        self.bit = 0            # bit position within byte (MSB first)

    def read(self, n: int) -> int:
        v = 0
        while n:
            if self.pos >= len(self.data):
                raise ValueError("truncated FLAC stream")
            avail = 8 - self.bit
            take = min(n, avail)
            byte = self.data[self.pos]
            v = (v << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
            n -= take
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


def _fixed_residual(x, order: int):
    import numpy as np
    r = np.asarray(x, dtype=np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _fixed_restore(warmup, residual, order: int):
    """Invert ``order`` rounds of np.diff: at each level k the full
    ``diff^(k-1)(x)`` sequence is the running sum of ``diff^k(x)`` seeded
    by its first element, which only the warmup samples determine."""
    import numpy as np
    cur = np.asarray(residual, dtype=np.int64)
    if order == 0:
        return cur
    w = np.asarray(warmup, dtype=np.int64)
    for k in range(order, 0, -1):
        first = w if k == 1 else _fixed_residual(w, k - 1)
        prev = np.empty(len(cur) + 1, dtype=np.int64)
        prev[0] = first[0]
        np.cumsum(cur, out=prev[1:])
        prev[1:] += prev[0]
        cur = prev
    return cur


def _flac_best_fixed(x, bs: int):
    """(order, residual) with the smallest absolute-residual mass."""
    import numpy as np
    best_order, best_res, best_cost = 0, x, None
    for order in range(min(5, bs)):
        res = _fixed_residual(x, order)
        cost = int(np.abs(res).sum()) if res.size else 0
        if best_cost is None or cost < best_cost:
            best_order, best_res, best_cost = order, res, cost
    return best_order, best_res


def _flac_rice_plan(res):
    """(param, zigzag array, total bits) for one residual block."""
    import numpy as np
    mean = (2 * int(np.abs(res).sum()) // max(len(res), 1)) or 1
    param = min(max(mean.bit_length() - 1, 0), 14)
    zz = ((res << 1) ^ (res >> 63)).astype(np.uint64)
    bits = int((zz >> np.uint64(param)).sum()) + len(res) * (1 + param)
    return param, zz, bits


def _flac_subframe_bits(x, cbps: int, bs: int) -> int:
    """Estimated encoded size of one subframe — drives the stereo-
    decorrelation choice without encoding every candidate."""
    if bs and (x == x[0]).all():
        return 8 + cbps
    order, res = _flac_best_fixed(x, bs)
    _p, _zz, rice_bits = _flac_rice_plan(res)
    return 8 + min(order * cbps + 6 + rice_bits, bs * cbps)


def _flac_write_subframe(body, x, cbps: int, bs: int) -> None:
    """CONSTANT / FIXED+rice / VERBATIM subframe at ``cbps`` bits
    (17 for a stereo side channel)."""
    mask = (1 << cbps) - 1
    if bs and (x == x[0]).all():
        body.write(0, 1)
        body.write(0b000000, 6)   # CONSTANT
        body.write(0, 1)
        body.write(int(x[0]) & mask, cbps)
        return
    best_order, res = _flac_best_fixed(x, bs)
    param, zz, rice_bits = _flac_rice_plan(res)
    if rice_bits > (cbps + 1) * bs:       # rice would expand: VERBATIM
        body.write(0, 1)
        body.write(0b000001, 6)
        body.write(0, 1)
        for v in x:
            body.write(int(v) & mask, cbps)
        return
    body.write(0, 1)
    body.write(0b001000 | best_order, 6)   # FIXED subframe
    body.write(0, 1)                       # no wasted bits
    for v in x[:best_order]:
        body.write(int(v) & mask, cbps)    # warmup
    body.write(0, 2)                       # rice method 0
    body.write(0, 4)                       # partition order 0
    body.write(param, 4)
    for u in zz:
        q = int(u) >> param
        for _ in range(q):
            body.write(0, 1)
        body.write(1, 1)
        if param:
            body.write(int(u) & ((1 << param) - 1), param)


def encode_flac(samples, sample_rate: int = 8000,
                block_size: int = 4096, stereo: str = "auto") -> bytes:
    """Encode int16 PCM — shape (n,) mono or (n, channels) — as a real
    FLAC stream: fLaC marker + STREAMINFO (with audio MD5) + fixed-
    blocksize frames of FIXED-predictor subframes (best order 0–4 by
    absolute-residual sum, VERBATIM fallback when rice would expand),
    residuals rice-coded at the per-subframe optimal parameter,
    partition order 0, CRC-8/CRC-16 sealed. Two-channel frames pick the
    cheapest of the four spec channel assignments per frame —
    independent, left/side, right/side, mid/side (17-bit side channel) —
    by estimated subframe bits, the decorrelation that makes correlated
    stereo (the normal case) compress toward the mono cost
    (``stereo='indep'`` disables the search)."""
    import hashlib
    import struct

    import numpy as np

    arr = np.asarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr.reshape(-1, 1)
    n, channels = arr.shape
    if not 1 <= channels <= 8:
        raise ValueError("1..8 channels supported")
    md5 = hashlib.md5(arr.astype("<i2").tobytes()).digest()

    # ---- STREAMINFO (the only mandatory metadata block) ----
    bw = _FlacBitWriter()
    bw.write(1, 1)              # last metadata block
    bw.write(0, 7)              # type 0 = STREAMINFO
    bw.write(34, 24)            # length
    bw.write(block_size, 16)    # min blocksize
    bw.write(block_size, 16)    # max blocksize
    bw.write(0, 24)             # min framesize unknown
    bw.write(0, 24)             # max framesize unknown
    bw.write(sample_rate, 20)
    bw.write(channels - 1, 3)
    bw.write(15, 5)             # bits per sample - 1
    bw.write(0, 4)              # total samples: 36 bits
    bw.write(n, 32)
    out = [b"fLaC", bw.bytes() + md5]

    for frame_no, start in enumerate(range(0, n, block_size)):
        blk = arr[start:start + block_size].astype(np.int64)
        bs = blk.shape[0]

        hdr = _FlacBitWriter()
        hdr.write(0b11111111111110, 14)   # sync
        hdr.write(0, 1)                   # reserved
        hdr.write(0, 1)                   # fixed-blocksize stream
        # blocksize code: prefer exact power/standard codes, else 16-bit
        bs_code, bs_tail = None, None
        for code, size in [(0b0001, 192), (0b0010, 576), (0b0011, 1152),
                           (0b0100, 2304), (0b0101, 4608), (0b1000, 256),
                           (0b1001, 512), (0b1010, 1024), (0b1011, 2048),
                           (0b1100, 4096), (0b1101, 8192),
                           (0b1110, 16384), (0b1111, 32768)]:
            if bs == size:
                bs_code = code
                break
        if bs_code is None:
            bs_code, bs_tail = 0b0111, bs - 1   # 16-bit blocksize-1 field
        hdr.write(bs_code, 4)
        hdr.write(0, 4)                   # sample rate: from STREAMINFO

        # channel assignment: for stereo, pick the cheapest of the four
        # spec modes by estimated subframe bits (side channels get 17)
        subframes = [(blk[:, ch], 16) for ch in range(channels)]
        ch_code = channels - 1
        if channels == 2 and stereo == "auto" and bs:
            left, right = blk[:, 0], blk[:, 1]
            side = left - right
            mid = (left + right) >> 1
            options = [
                (channels - 1, [(left, 16), (right, 16)]),
                (8, [(left, 16), (side, 17)]),      # left/side
                (9, [(side, 17), (right, 16)]),     # right/side
                (10, [(mid, 16), (side, 17)]),      # mid/side
            ]
            ch_code, subframes = min(
                options,
                key=lambda o: sum(_flac_subframe_bits(x, c, bs)
                                  for x, c in o[1]))

        hdr.write(ch_code, 4)
        hdr.write(0b100, 3)               # 16 bits per sample
        hdr.write(0, 1)                   # reserved
        for byte in _flac_utf8_number(frame_no):
            hdr.write(byte, 8)
        if bs_tail is not None:
            hdr.write(bs_tail, 16)
        hbytes = hdr.bytes()
        hbytes += bytes([_crc8_flac(hbytes)])

        body = _FlacBitWriter()
        for byte in hbytes:
            body.write(byte, 8)
        for x, cbps in subframes:
            _flac_write_subframe(body, x, cbps, bs)
        fbytes = body.bytes()                      # aligns trailing bits
        out.append(fbytes + struct.pack(">H", _crc16_flac(fbytes)))
    return b"".join(out)


@_classify_parse_errors
def decode_flac(data: bytes, verify_md5: bool = True):
    """Decode a FLAC stream into ``(sample_rate, samples[n, ch] int16)``.
    Reads the full 16-bit surface of the format: CONSTANT/VERBATIM/
    FIXED *and* LPC subframes (any order; coefficients, precision and
    quantization shift come from the stream — nothing tabulated), rice
    methods 0/1 incl. escaped (raw) partitions, any partition order,
    wasted bits, and the left-side/right-side/mid-side stereo modes;
    CRC-8, CRC-16 and the STREAMINFO MD5 are all verified (corrupt
    streams raise ValueError)."""
    import hashlib
    import struct

    import numpy as np

    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("truncated metadata")
        last = data[pos] >> 7
        btype = data[pos] & 0x7F
        (length,) = struct.unpack(">I", b"\x00" + data[pos + 1:pos + 4])
        body = data[pos + 4:pos + 4 + length]
        if btype == 0:
            br = _FlacBitReader(body)
            _minb = br.read(16)
            _maxb = br.read(16)
            br.read(24), br.read(24)
            sample_rate = br.read(20)
            channels = br.read(3) + 1
            bps = br.read(5) + 1
            total = br.read(36)
            md5 = body[18:34]
            info = (sample_rate, channels, bps, total, md5)
        pos += 4 + length
        if last:
            break
    if info is None:
        raise ValueError("missing STREAMINFO")
    sample_rate, channels, bps, total, md5 = info
    if bps != 16:
        raise NotImplementedError(f"only 16-bit FLAC supported (bps={bps})")

    chans_out = [[] for _ in range(channels)]
    got = 0
    while got < total:
        frame_start = pos
        br = _FlacBitReader(data, pos)
        if br.read(14) != 0b11111111111110:
            raise ValueError("lost frame sync")
        br.read(1)
        variable = br.read(1)
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        br.read(1)
        # UTF-8-coded frame/sample number
        lead = br.read(8)
        extra = 0
        while lead & (0x80 >> extra) and extra < 7:
            extra += 1
        if extra:
            extra -= 1
        for _ in range(extra):
            br.read(8)
        if bs_code == 0b0110:
            bs = br.read(8) + 1
        elif bs_code == 0b0111:
            bs = br.read(16) + 1
        elif bs_code == 0b0001:
            bs = 192
        elif bs_code <= 0b0101:
            bs = 576 << (bs_code - 2)
        else:
            bs = 256 << (bs_code - 8)
        if sr_code == 0b1100:
            br.read(8)
        elif sr_code in (0b1101, 0b1110):
            br.read(16)
        br.align()
        crc8_end = br.pos
        if crc8_end >= len(data):
            raise ValueError("truncated FLAC frame header")
        if _crc8_flac(data[frame_start:crc8_end]) != data[crc8_end]:
            raise ValueError("frame header CRC-8 mismatch")
        br.read(8)              # consume the crc byte

        if ch_code < 8:
            n_sub, assign = ch_code + 1, "indep"
        elif ch_code == 8:
            n_sub, assign = 2, "left_side"
        elif ch_code == 9:
            n_sub, assign = 2, "right_side"
        elif ch_code == 10:
            n_sub, assign = 2, "mid_side"
        else:
            raise ValueError(f"reserved channel assignment {ch_code}")

        sub = []
        for ci in range(n_sub):
            cbps = bps
            if (assign == "left_side" and ci == 1) \
                    or (assign == "right_side" and ci == 0) \
                    or (assign == "mid_side" and ci == 1):
                cbps += 1       # side channel carries one extra bit
            if br.read(1):
                raise ValueError("subframe padding bit set")
            stype = br.read(6)
            wasted = 0
            if br.read(1):
                wasted = 1 + br.read_unary()
                cbps -= wasted
            if stype == 0b000000:
                v = br.read_signed(cbps)
                x = np.full(bs, v, dtype=np.int64)
            elif stype == 0b000001:
                x = np.array([br.read_signed(cbps) for _ in range(bs)],
                             dtype=np.int64)
            elif 0b001000 <= stype <= 0b001100:
                order = stype & 0x07
                warm = [br.read_signed(cbps) for _ in range(order)]
                res = _read_rice_residuals(br, bs, order)
                x = _fixed_restore(warm, res, order)
            elif stype >= 0b100000:
                # LPC subframe: what real encoders emit by default —
                # order, coefficient precision, quantization shift and
                # the coefficients themselves are all in the stream
                # (nothing tabulated), then the same rice residuals
                order = (stype & 0x1F) + 1
                warm = [br.read_signed(cbps) for _ in range(order)]
                prec = br.read(4) + 1
                if prec == 16:
                    raise ValueError("invalid LPC precision escape")
                shift = br.read(5)
                if shift >= 16:
                    shift -= 32          # 5-bit signed per spec
                coefs = [br.read_signed(prec) for _ in range(order)]
                res = _read_rice_residuals(br, bs, order)
                x = np.empty(bs, dtype=np.int64)
                x[:order] = warm
                if shift >= 0:
                    for i in range(order, bs):
                        acc = 0
                        for j, c in enumerate(coefs):
                            acc += c * x[i - 1 - j]
                        x[i] = res[i - order] + (acc >> shift)
                else:
                    for i in range(order, bs):
                        acc = 0
                        for j, c in enumerate(coefs):
                            acc += c * x[i - 1 - j]
                        x[i] = res[i - order] + (acc << -shift)
            else:
                raise ValueError(f"reserved subframe type {stype:#08b}")
            if wasted:
                x = x << wasted
            sub.append(x)
        br.align()
        if br.pos + 2 > len(data):
            raise ValueError("truncated FLAC frame (missing CRC-16)")
        (crc16,) = struct.unpack_from(">H", data, br.pos)
        if _crc16_flac(data[frame_start:br.pos]) != crc16:
            raise ValueError("frame CRC-16 mismatch")
        pos = br.pos + 2

        if assign == "indep":
            chans = sub
        elif assign == "left_side":
            chans = [sub[0], sub[0] - sub[1]]
        elif assign == "right_side":
            chans = [sub[1] + sub[0], sub[1]]
        else:                   # mid_side
            mid2 = (sub[0] << 1) | (sub[1] & 1)
            chans = [(mid2 + sub[1]) >> 1, (mid2 - sub[1]) >> 1]
        for ci, x in enumerate(chans):
            chans_out[ci].append(x)
        got += bs

    arr = np.stack([np.concatenate(c) if c
                    else np.zeros(0, dtype=np.int64)
                    for c in chans_out], axis=1)
    arr = arr[:total].astype(np.int16)
    if verify_md5 and md5 != b"\x00" * 16:
        if hashlib.md5(arr.astype("<i2").tobytes()).digest() != md5:
            raise ValueError("decoded audio MD5 mismatch")
    return sample_rate, arr


def decode_audio(data: bytes):
    """Decode any supported audio container into
    ``(sample_rate, samples[n, ch] int16)`` — RIFF/WAVE PCM-16 or FLAC,
    dispatched by magic bytes."""
    if data[:4] == b"fLaC":
        return decode_flac(data)
    return decode_wav(data)


def synthesize_wav_media(spark, n: int = 64,
                         sample_rate: int = 8000) -> DataFrame:
    """Deterministic REAL-WAV media table: clip ``m`` is mono PCM-16 with
    ``900 + (m % 4)·150`` samples following the closed form
    ``((17·i + 29·m) mod 256 − 128) · 128`` — analytically aggregatable by
    an external oracle, so encode→decode→feature is hash-checkable (the
    audio sibling of ``synthesize_bmp_media``). Distributed generation."""
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for m in pdf["id"]:
                m = int(m)
                cnt = 900 + (m % 4) * 150
                i = np.arange(cnt)
                samples = (((17 * i + 29 * m) % 256 - 128) * 128) \
                    .astype(np.int16)
                rows.append((m, "audio", encode_wav(samples, sample_rate),
                             {"format": "wav", "width": None, "height": None,
                              "duration_s": cnt / sample_rate}))
            yield pd.DataFrame(rows,
                               columns=["media_id", "kind", "content",
                                        "meta"])

    return _synth_range(spark, n).mapInPandas(gen, schema=MEDIA_SCHEMA)


AUDIO_FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("sample_rate", IntegerType()),
    StructField("n_samples", LongType()),
    StructField("duration_s", DoubleType()),
    StructField("peak_abs", IntegerType()),
    StructField("rms", DoubleType()),
])


def extract_audio_features(media: DataFrame) -> DataFrame:
    """REAL audio decode (WAV or FLAC, sniffed per blob) → audio
    features: sample count, duration, peak amplitude, RMS (over all
    channels). Arrow-batched ``mapInPandas``; blobs never leave the
    executors — swap the kernel for a mel-spectrogram extractor when a
    DSP library exists, keep the plumbing."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                rate, samples = decode_audio(bytes(content))
                flat = samples.astype(np.float64).ravel()
                out.append((int(mid), int(rate), int(samples.shape[0]),
                            round(samples.shape[0] / rate, 6),
                            int(np.abs(flat).max()) if flat.size else 0,
                            round(float(np.sqrt(np.mean(flat ** 2))), 6)
                            if flat.size else 0.0))
            yield pd.DataFrame(out, columns=[f.name for f
                                             in AUDIO_FEATURE_SCHEMA])

    return media.select("media_id", "content").mapInPandas(
        kernel, schema=AUDIO_FEATURE_SCHEMA)


def synthesize_sine_media(spark, n: int = 64, sample_rate: int = 8000,
                          n_samples: int = 1000) -> DataFrame:
    """Deterministic pure-tone WAV table: clip ``m`` is a PCM-16 sine of
    frequency ``8·(25 + m % 50)`` Hz — an exact integer number of periods
    over ``n_samples`` at ``sample_rate`` (bin width 8 Hz), so its DFT has
    all energy in one bin and the spectral features below have closed-form
    expected values an external oracle can state analytically."""
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for m in pdf["id"]:
                m = int(m)
                freq = (sample_rate / n_samples) * (25 + m % 50)
                t = np.arange(n_samples) / sample_rate
                samples = np.round(
                    12000.0 * np.sin(2 * np.pi * freq * t)).astype(np.int16)
                rows.append((m, "audio", encode_wav(samples, sample_rate),
                             {"format": "wav", "width": None, "height": None,
                              "duration_s": n_samples / sample_rate}))
            yield pd.DataFrame(rows,
                               columns=["media_id", "kind", "content",
                                        "meta"])

    return _synth_range(spark, n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def resample_audio(media: DataFrame, factor: int = 4) -> DataFrame:
    """Integer-factor audio downsampling — the audio sibling of the
    integer-exact image resize: each output sample is the FLOOR of the
    mean of ``factor`` consecutive input samples (per channel), the
    sample rate divides by ``factor`` (duration preserved), and the
    trailing partial group is dropped. Floor-of-mean keeps every output
    value integer-exact, so resampled audio is reproducible across
    engines and re-runs (no float dither), and an external oracle can
    replay the whole decimation analytically. Decodes WAV or FLAC
    (sniffed); re-encodes WAV. Arrow-batched ``mapInPandas`` — samples
    never leave the executors."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                rate, samples = decode_audio(bytes(content))
                n = samples.shape[0] - samples.shape[0] % factor
                grouped = samples[:n].astype(np.int64) \
                    .reshape(-1, factor, samples.shape[1])
                out = np.floor_divide(grouped.sum(axis=1), factor) \
                    .astype(np.int16)
                new_rate = rate // factor
                rows.append((int(mid), "audio",
                             encode_wav(out, new_rate),
                             {"format": "wav", "width": None,
                              "height": None,
                              "duration_s": (out.shape[0] / new_rate
                                             if new_rate else None)}))
            yield pd.DataFrame(rows,
                               columns=["media_id", "kind", "content",
                                        "meta"])

    return media.select("media_id", "content").mapInPandas(
        kernel, schema=MEDIA_SCHEMA)


def synthesize_flac_media(spark, n: int = 48,
                          sample_rate: int = 8000) -> DataFrame:
    """Deterministic REAL-FLAC media table: clip ``m`` is mono PCM-16
    with ``800 + (m % 5)·200`` samples following the closed form
    ``((23·i + 31·m) mod 256 − 128) · 128`` — losslessly compressed
    (the sawtooth's first difference is constant between wraparounds, so
    the fixed predictors + rice coding genuinely shrink it), and because
    FLAC is lossless the SAME closed form is analytically aggregatable
    by an external oracle through encode→decode→feature. Distributed
    generation."""
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for m in pdf["id"]:
                m = int(m)
                cnt = 800 + (m % 5) * 200
                i = np.arange(cnt)
                samples = ((((23 * i + 31 * m) % 256) - 128) * 128) \
                    .astype(np.int16)
                rows.append((m, "audio",
                             encode_flac(samples, sample_rate,
                                         block_size=512),
                             {"format": "flac", "width": None,
                              "height": None,
                              "duration_s": cnt / sample_rate}))
            yield pd.DataFrame(rows,
                               columns=["media_id", "kind", "content",
                                        "meta"])

    return _synth_range(spark, n).mapInPandas(gen, schema=MEDIA_SCHEMA)


SPECTRUM_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("n_samples", LongType()),
    StructField("n_bins", IntegerType()),
    StructField("dominant_bin", IntegerType()),
    StructField("dominant_freq_hz", DoubleType()),
])


def extract_audio_spectrum(media: DataFrame) -> DataFrame:
    """REAL frequency analysis: WAV decode → rfft (numpy) → dominant
    non-DC bin and its frequency. Integer outputs are robust to PCM-16
    quantization noise (which perturbs magnitudes ~90 dB below a tone),
    so pure-tone inputs are exactly oracle-checkable. Arrow-batched
    ``mapInPandas`` — the FFT runs where the bytes live."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                rate, samples = decode_audio(bytes(content))
                mono = samples[:, 0].astype(np.float64)
                spec = np.abs(np.fft.rfft(mono))
                n_bins = spec.size
                k = 1 + int(np.argmax(spec[1:])) if n_bins > 1 else 0
                out.append((int(mid), int(mono.size), int(n_bins), k,
                            round(k * rate / mono.size, 6)))
            yield pd.DataFrame(out, columns=[f.name for f
                                             in SPECTRUM_SCHEMA])

    return media.select("media_id", "content").mapInPandas(
        kernel, schema=SPECTRUM_SCHEMA)


def synthesize_bmp_media(spark, n: int = 64) -> DataFrame:
    """Deterministic REAL-BMP media table: image ``m`` is ``(8 + m % 3)``
    rows × ``(8 + m % 5)`` cols with pixel value
    ``(3x + 5y + 7m + 11c) mod 256`` — a closed form an external oracle can
    aggregate analytically, so the encode→decode→feature path is fully
    hash-checkable. Generation runs distributed (mapInPandas over a range,
    no driver loop)."""
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for m in pdf["id"]:
                m = int(m)
                w, h = 8 + m % 5, 8 + m % 3
                x = np.arange(w).reshape(1, w, 1)
                y = np.arange(h).reshape(h, 1, 1)
                c = np.arange(3).reshape(1, 1, 3)
                px = ((3 * x + 5 * y + 7 * m + 11 * c) % 256).astype(np.uint8)
                rows.append((m, "image", encode_bmp(px),
                             {"format": "bmp", "width": w, "height": h,
                              "duration_s": None}))
            yield pd.DataFrame(rows,
                               columns=["media_id", "kind", "content",
                                        "meta"])

    return _synth_range(spark, n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def synthesize_png_media(spark, n: int = 64) -> DataFrame:
    """Deterministic REAL-PNG media table: same analytic pixel closed form
    as ``synthesize_bmp_media`` (``(3x + 5y + 7m + 11c) mod 256`` over
    ``(8 + m % 3) × (8 + m % 5)``), but zlib-compressed through the real
    PNG encoder with scanline filter ``m % 5`` — so a full-table decode
    exercises every PNG filter type, and the SAME external oracle verifies
    the features analytically. Distributed generation."""
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for m in pdf["id"]:
                m = int(m)
                w, h = 8 + m % 5, 8 + m % 3
                x = np.arange(w).reshape(1, w, 1)
                y = np.arange(h).reshape(h, 1, 1)
                c = np.arange(3).reshape(1, 1, 3)
                px = ((3 * x + 5 * y + 7 * m + 11 * c) % 256).astype(np.uint8)
                rows.append((m, "image", encode_png(px, filter_type=m % 5),
                             {"format": "png", "width": w, "height": h,
                              "duration_s": None}))
            yield pd.DataFrame(rows,
                               columns=["media_id", "kind", "content",
                                        "meta"])

    return _synth_range(spark, n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def synthesize_jpeg_media(spark, n: int = 64) -> DataFrame:
    """Deterministic REAL-JPEG media table with an EXACTLY verifiable
    decode: image ``m`` is ``8*(1 + m % 3)`` rows × ``8*(1 + m % 4)``
    cols of constant-grey 8×8 blocks, block ``(bx, by)`` holding value
    ``(16*bx + 40*by + 7*m) % 256`` in all three channels. Constant
    blocks have a DC-only DCT, and at quality 75 the luma DC quantizer
    divides the DC exactly (step 8 against ``8*(v-128)``) while grey
    pixels pin both chroma planes to exactly 128 (zero after level
    shift) — so the full encode→Huffman→decode→feature path reproduces
    the closed form bit-exactly and an external oracle can aggregate the
    SAME values analytically. Distributed generation; the lossy general
    case is covered by pytest round-trip bounds instead."""
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for m in pdf["id"]:
                m = int(m)
                bw, bh = 1 + m % 4, 1 + m % 3
                bx = np.arange(bw).reshape(1, bw)
                by = np.arange(bh).reshape(bh, 1)
                vals = (16 * bx + 40 * by + 7 * m) % 256
                px = np.repeat(np.repeat(vals, 8, 0), 8, 1).astype(np.uint8)
                rgb = np.repeat(px[:, :, None], 3, 2)
                rows.append((m, "image", encode_jpeg(rgb, quality=75),
                             {"format": "jpg", "width": 8 * bw,
                              "height": 8 * bh, "duration_s": None}))
            yield pd.DataFrame(rows,
                               columns=["media_id", "kind", "content",
                                        "meta"])

    return _synth_range(spark, n).mapInPandas(gen, schema=MEDIA_SCHEMA)


IMAGE_FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("px_sum", LongType()),
    StructField("px_mean", DoubleType()),
    StructField("ahash64", LongType()),
])


def _ahash64(px) -> int:
    """64-bit average-hash of an (H, W, 3) raster: 8×8 block-mean luma
    thresholded at the global mean (the standard aHash), as a SIGNED
    64-bit int (Spark LongType). Pure numpy; any raster size via integer
    grid assignment."""
    import numpy as np

    h, w, _ = px.shape
    luma = px.astype(np.float64).mean(axis=2)
    gy = (np.arange(h) * 8 // h)
    gx = (np.arange(w) * 8 // w)
    blocks = np.zeros((8, 8))
    counts = np.zeros((8, 8))
    np.add.at(blocks, (gy[:, None], gx[None, :]), luma)
    np.add.at(counts, (gy[:, None], gx[None, :]), 1.0)
    blocks /= np.maximum(counts, 1.0)
    bits = (blocks > luma.mean()).flatten()
    ah = 0
    for i, b in enumerate(bits):
        if b:
            ah |= (1 << i)
    return ah - (1 << 64) if ah >= (1 << 63) else ah


def extract_image_features(media: DataFrame) -> DataFrame:
    """REAL decode → feature extraction: dimensions, pixel sum/mean, and
    the 64-bit average-hash (``_ahash64``). Runs as Arrow-batched
    ``mapInPandas``; blobs never leave the executors."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content, meta in zip(pdf["media_id"], pdf["content"],
                                          pdf["meta"]):
                fmt = (meta or {}).get("format")
                px = decode_real(bytes(content), fmt)
                h, w, _ = px.shape
                out.append((int(mid), w, h, int(px.sum()),
                            round(float(px.mean()), 6), _ahash64(px)))
            yield pd.DataFrame(out, columns=[f.name for f
                                             in IMAGE_FEATURE_SCHEMA])

    return media.select("media_id", "content", "meta").mapInPandas(
        kernel, schema=IMAGE_FEATURE_SCHEMA)


def _entropy(counts) -> float:
    import numpy as np
    p = counts / max(1, counts.sum())
    nz = p[p > 0]
    return float(-(nz * np.log2(nz)).sum())


def extract_features(media: DataFrame,
                     batch_size: int = 256) -> DataFrame:
    """Byte-level feature extraction via Arrow-batched ``mapInPandas``.

    A stand-in for decode→feature (CLIP/pHash/mel-spec): computes per-blob
    byte statistics and a deterministic 64-bit pseudo-pHash. The UDF shape
    (Iterator[pd.DataFrame] → Iterator[pd.DataFrame]) is exactly what a real
    decoder uses — swap the kernel, keep the plumbing.
    """
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                arr = np.frombuffer(content or b"", dtype=np.uint8)
                if arr.size == 0:
                    out.append((mid, 0, 0.0, 0.0, 0))
                    continue
                counts = np.bincount(arr, minlength=256)
                # pseudo-pHash: sign bits of 64 evenly spaced byte deltas
                idx = np.linspace(0, arr.size - 1, 65).astype(int)
                deltas = arr[idx[1:]].astype(int) - arr[idx[:-1]].astype(int)
                ph = 0
                for i, d in enumerate(deltas):
                    if d > 0:
                        ph |= (1 << i)
                ph = ph - (1 << 64) if ph >= (1 << 63) else ph
                out.append((mid, int(arr.size), float(arr.mean()),
                            round(_entropy(counts), 6), ph))
            yield pd.DataFrame(out, columns=["media_id", "n_bytes",
                                             "byte_mean", "byte_entropy",
                                             "phash64"])

    return media.select("media_id", "content").mapInPandas(
        kernel, schema=FEATURE_SCHEMA)


def _box_resize(px, width: int, height: int):
    """Integer-grid box-average resample of an (H, W, 3) uint8 raster to
    ``width × height``: target cell (X, Y) is the floor-of-mean of source
    box ``x ∈ [X·w//W, max((X+1)·w//W, X·w//W + 1))`` (same for y) —
    downscale boxes are the classic area partition, upscale boxes
    degenerate to one pixel (nearest-neighbor). Box sums come from a 2-D
    integral image: O(H·W) total, vectorized."""
    import numpy as np

    h, w, _ = px.shape
    x0 = np.arange(width) * w // width
    x1 = np.maximum((np.arange(width) + 1) * w // width, x0 + 1)
    y0 = np.arange(height) * h // height
    y1 = np.maximum((np.arange(height) + 1) * h // height, y0 + 1)
    integ = np.zeros((h + 1, w + 1, 3), dtype=np.int64)
    integ[1:, 1:] = px.astype(np.int64).cumsum(0).cumsum(1)
    sums = (integ[np.ix_(y1, x1)] - integ[np.ix_(y0, x1)]
            - integ[np.ix_(y1, x0)] + integ[np.ix_(y0, x0)])
    counts = ((y1 - y0)[:, None] * (x1 - x0)[None, :])[:, :, None]
    return (sums // counts).astype(np.uint8)


def resize_media(media: DataFrame, width: int, height: int,
                 out_format: str = "bmp") -> DataFrame:
    """REAL image resize: decode (BMP/PPM/PNG), integer-grid box-average
    resample to ``width × height``, re-encode. Target cell ``(X, Y)``
    averages the source box ``x ∈ [X·w//W, max((X+1)·w//W, X·w//W + 1))``
    (same for y): downscale boxes are the classic area partition, upscale
    boxes degenerate to one pixel (nearest-neighbor). Each cell becomes
    ``floor(sum / count)`` — deliberately integer so an external SQL oracle
    can reproduce every resized pixel exactly, making the
    decode→resample→encode path hash-checkable end-to-end (see
    ``_box_resize``). Arrow-batched ``mapInPandas``; blobs never leave the
    executors. Blobs in formats the decoder doesn't support fail the task
    (fail-fast beats silently passing bytes through)."""
    encoders = {"bmp": encode_bmp, "ppm": encode_ppm,
                "png": encode_png}
    enc = encoders[out_format]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, content, meta in zip(
                    pdf["media_id"], pdf["kind"], pdf["content"],
                    pdf["meta"]):
                px = decode_real(bytes(content), (meta or {}).get("format"))
                out = _box_resize(px, width, height)
                rows.append((int(mid), kind, enc(out),
                             {"format": out_format, "width": width,
                              "height": height, "duration_s": None}))
            yield pd.DataFrame(rows, columns=["media_id", "kind",
                                              "content", "meta"])

    return media.select("media_id", "kind", "content", "meta") \
                .mapInPandas(kernel, schema=MEDIA_SCHEMA)


def synthesize_avi_media(spark, n: int = 32, fps: int = 10,
                         key_mod: int | None = None) -> DataFrame:
    """Deterministic REAL-AVI media table: clip ``m`` has ``4 + k % 3``
    frames of ``(6 + k % 2) × (8 + k % 3)`` with pixel value
    ``(3x + 5y + 7k + 11c + 13f) mod 256`` — the video member of the
    analytic-closed-form family (BMP/PNG images, WAV audio), so
    decode→sample→feature is verifiable by an external oracle. By default
    ``k = m`` (every clip distinct); ``key_mod`` plants exact visual
    duplicates (``k = m % key_mod``) for dedup contracts. Distributed
    generation."""
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                m = mid % key_mod if key_mod else mid
                w, h, nf = 8 + m % 3, 6 + m % 2, 4 + m % 3
                f = np.arange(nf).reshape(nf, 1, 1, 1)
                y = np.arange(h).reshape(1, h, 1, 1)
                x = np.arange(w).reshape(1, 1, w, 1)
                c = np.arange(3).reshape(1, 1, 1, 3)
                px = ((3 * x + 5 * y + 7 * m + 11 * c + 13 * f) % 256) \
                    .astype(np.uint8)
                rows.append((mid, "video", encode_avi(px, fps),
                             {"format": "avi", "width": w, "height": h,
                              "duration_s": nf / fps}))
            yield pd.DataFrame(rows,
                               columns=["media_id", "kind", "content",
                                        "meta"])

    return _synth_range(spark, n).mapInPandas(gen, schema=MEDIA_SCHEMA)


FRAME_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("content", BinaryType()),
    StructField("meta", MEDIA_SCHEMA["meta"].dataType),
])


def synthesize_mjpeg_media(spark, n: int = 48, fps: int = 10) -> DataFrame:
    """Deterministic REAL Motion-JPEG media table with an EXACTLY
    verifiable decode: clip ``m`` has ``2 + m % 3`` frames of
    ``8*(1 + m % 2)`` × ``8*(1 + m % 4)`` constant-grey 8×8 blocks,
    block ``(bx, by)`` of frame ``f`` holding
    ``(16*bx + 40*by + 7*m + 13*f) % 256`` in all channels — the same
    DC-exact quality-75 construction as :func:`synthesize_jpeg_media`,
    lifted to video: every frame is an independent baseline JPEG inside
    a real AVI container, and decode→sample→feature reproduces the
    closed form bit-exactly for an external oracle. Distributed
    generation."""
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                m = int(mid)
                bh, bw, nf = 1 + m % 2, 1 + m % 4, 2 + m % 3
                f = np.arange(nf).reshape(nf, 1, 1)
                by = np.arange(bh).reshape(1, bh, 1)
                bx = np.arange(bw).reshape(1, 1, bw)
                vals = (16 * bx + 40 * by + 7 * m + 13 * f) % 256
                px = np.repeat(np.repeat(vals, 8, 1), 8, 2)
                frames = np.repeat(px[:, :, :, None], 3, 3) \
                           .astype(np.uint8)
                rows.append((m, "video",
                             encode_avi(frames, fps, codec="MJPG",
                                        quality=75),
                             {"format": "avi", "width": 8 * bw,
                              "height": 8 * bh,
                              "duration_s": nf / fps}))
            yield pd.DataFrame(rows,
                               columns=["media_id", "kind", "content",
                                        "meta"])

    return _synth_range(spark, n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def synthesize_mp4_media(spark, n: int = 40, fps: int = 12) -> DataFrame:
    """Deterministic REAL MP4 media table with an EXACTLY verifiable
    decode: clip ``m`` has ``2 + m % 4`` frames of ``8*(1 + m % 3)`` ×
    ``8*(1 + m % 2)`` constant-grey 8×8 blocks, block ``(bx, by)`` of
    frame ``f`` holding ``(24*bx + 48*by + 5*m + 11*f) % 256`` in all
    channels — the DC-exact quality-75 construction (constant blocks
    survive the lossy JPEG path bit-exactly), packed as a Motion-JPEG
    track in a real ISO BMFF container (``encode_mp4``: ftyp/mdat/moov
    with full stsd/stts/stsc/stsz/stco sample tables, multi-sample
    chunks). Distributed generation; an external oracle reproduces
    decode→sample→feature from the closed form."""
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                m = int(mid)
                bh, bw, nf = 1 + m % 2, 1 + m % 3, 2 + m % 4
                f = np.arange(nf).reshape(nf, 1, 1)
                by = np.arange(bh).reshape(1, bh, 1)
                bx = np.arange(bw).reshape(1, 1, bw)
                vals = (24 * bx + 48 * by + 5 * m + 11 * f) % 256
                px = np.repeat(np.repeat(vals, 8, 1), 8, 2)
                frames = np.repeat(px[:, :, :, None], 3, 3) \
                           .astype(np.uint8)
                rows.append((m, "video",
                             encode_mp4(frames, fps, quality=75),
                             {"format": "mp4", "width": 8 * bw,
                              "height": 8 * bh,
                              "duration_s": nf / fps}))
            yield pd.DataFrame(rows,
                               columns=["media_id", "kind", "content",
                                        "meta"])

    return _synth_range(spark, n).mapInPandas(gen, schema=MEDIA_SCHEMA)


@_classify_parse_errors
def media_probe(data: bytes) -> dict:
    """Header-only probe across EVERY supported container — the
    format-agnostic big sibling of :func:`jpeg_meta`: sniff the magic,
    read ONLY headers/metadata tables (BMP/PNG/PPM/JPEG headers, WAV fmt
    + data-size, FLAC STREAMINFO, AVI hdrl — the movi payload list is
    never entered, MP4 moov — mdat is never touched), and return
    ``{kind, format, width, height, n_frames, sample_rate, channels,
    n_samples, duration_s}`` with None for fields the kind lacks. O(header)
    bytes per blob regardless of blob size — the primitive that
    inventories a 100-TB mixed-media corpus at IO speed without decoding
    a pixel or a sample."""
    import struct

    out = {"kind": None, "format": None, "width": None, "height": None,
           "n_frames": None, "sample_rate": None, "channels": None,
           "n_samples": None, "duration_s": None}

    if data[:2] == b"BM":
        (_off,) = struct.unpack_from("<I", data, 10)
        _sz, w, h = struct.unpack_from("<Iii", data, 14)
        out.update(kind="image", format="bmp", width=w, height=abs(h))
        return out
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        if data[12:16] != b"IHDR":
            raise ValueError("PNG missing IHDR")
        w, h = struct.unpack_from(">II", data, 16)
        out.update(kind="image", format="png", width=w, height=h)
        return out
    if data[:2] == b"P6":
        fields = data[2:64].split()
        if len(fields) < 2:
            raise ValueError("truncated PPM header")
        out.update(kind="image", format="ppm",
                   width=int(fields[0]), height=int(fields[1]))
        return out
    if data[:2] == b"\xFF\xD8":
        m = jpeg_meta(data)
        out.update(kind="image", format="jpeg",
                   width=m["width"], height=m["height"])
        return out
    if data[:4] == b"fLaC":
        br = _FlacBitReader(data, 8)    # skip marker + block header
        br.read(16), br.read(16), br.read(24), br.read(24)
        rate = br.read(20)
        ch = br.read(3) + 1
        br.read(5)
        total = br.read(36)
        out.update(kind="audio", format="flac", sample_rate=rate,
                   channels=ch, n_samples=total,
                   duration_s=round(total / rate, 6) if rate else None)
        return out
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        pos, fmt, data_size = 12, None, None
        while pos + 8 <= len(data):
            cid = data[pos:pos + 4]
            (size,) = struct.unpack_from("<I", data, pos + 4)
            if cid == b"fmt ":
                fmt = struct.unpack_from("<HHIIHH", data, pos + 8)
            elif cid == b"data":
                data_size = size        # size only — payload untouched
            pos += 8 + size + (size % 2)
        if fmt is None or data_size is None:
            raise ValueError("missing fmt/data chunk")
        _af, ch, rate, _br, block_align, _bits = fmt
        n = data_size // max(block_align, 1)
        out.update(kind="audio", format="wav", sample_rate=rate,
                   channels=ch, n_samples=n,
                   duration_s=round(n / rate, 6) if rate else None)
        return out
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        dims, fps = {}, None
        pos = 12
        while pos + 8 <= len(data):
            cid = data[pos:pos + 4]
            (size,) = struct.unpack_from("<I", data, pos + 4)
            if cid == b"LIST":
                ltype = data[pos + 8:pos + 12]
                if ltype in (b"hdrl", b"strl"):
                    # descend into header lists only — movi is skipped
                    inner = pos + 12
                    end = pos + 8 + size
                    stack = [(inner, end)]
                    while stack:
                        p, e = stack.pop()
                        while p + 8 <= e:
                            c2 = data[p:p + 4]
                            (s2,) = struct.unpack_from("<I", data, p + 4)
                            if c2 == b"LIST" \
                                    and data[p + 8:p + 12] == b"strl":
                                stack.append((p + 12, p + 8 + s2))
                            elif c2 == b"avih":
                                vals = struct.unpack_from(
                                    "<14I", data, p + 8)
                                dims["n"], dims["w"], dims["h"] = \
                                    vals[4], vals[8], vals[9]
                            elif c2 == b"strh" \
                                    and data[p + 8:p + 12] == b"vids":
                                scale, rate = struct.unpack_from(
                                    "<II", data, p + 28)
                                fps = rate // max(scale, 1)
                            p += 8 + s2 + (s2 % 2)
            pos += 8 + size + (size % 2)
        if "w" not in dims:
            raise ValueError("missing avih header")
        out.update(kind="video", format="avi", width=dims["w"],
                   height=dims["h"], n_frames=dims["n"],
                   duration_s=round(dims["n"] / fps, 6) if fps else None)
        return out
    if len(data) >= 12 and data[4:8] == b"ftyp":
        moov = _find_box(data, 0, len(data), (b"moov",))
        for btype, s, e in _walk_boxes(data, *moov):
            if btype != b"trak":
                continue
            try:
                mdia = _find_box(data, s, e, (b"mdia",))
                hs, _he = _find_box(data, *mdia, (b"hdlr",))
                if data[hs + 8:hs + 12] != b"vide":
                    continue
                ms, _me = _find_box(data, *mdia, (b"mdhd",))
                ver = data[ms]
                off = 20 if ver == 1 else 12
                timescale = struct.unpack_from(">I", data, ms + off)[0]
                stbl = _find_box(data, *mdia, (b"minf", b"stbl"))
                zs, _ze = _find_box(data, *stbl, (b"stsz",))
                _fixed, n = struct.unpack_from(">II", data, zs + 4)
                ds, de = _find_box(data, *stbl, (b"stsd",))
                width = height = None
                for _cc, es, _ee in _walk_boxes(data, ds + 8, de):
                    width, height = struct.unpack_from(">HH", data,
                                                       es + 24)
                    break
                ts, _te = _find_box(data, *stbl, (b"stts",))
                _n_stts = struct.unpack_from(">I", data, ts + 4)[0]
                _cnt, delta = struct.unpack_from(">II", data, ts + 8)
                fps = timescale // max(delta, 1)
                out.update(kind="video", format="mp4", width=width,
                           height=height, n_frames=n,
                           duration_s=round(n / fps, 6) if fps else None)
                return out
            except ValueError:
                continue
        raise ValueError("no video track found")
    raise ValueError("unrecognized media container")


MEDIA_CATALOG_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("format", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_frames", IntegerType()),
    StructField("sample_rate", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("n_samples", LongType()),
    StructField("duration_s", DoubleType()),
    StructField("content_bytes", LongType()),
])


def media_catalog(media: DataFrame) -> DataFrame:
    """Format-agnostic header-only inventory: one row per blob with
    kind/format/dims/frame-count/sample-count/duration from
    :func:`media_probe` — no pixel or sample decode anywhere, so a mixed
    100-TB corpus catalogs at IO speed. Unparseable blobs yield a
    ``kind='corrupt'`` row instead of failing the task (a corrupt file
    is a catalog fact, not a pipeline error)."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content)
                try:
                    m = media_probe(b)
                    out.append((int(mid), m["kind"], m["format"],
                                m["width"], m["height"], m["n_frames"],
                                m["sample_rate"], m["channels"],
                                m["n_samples"], m["duration_s"], len(b)))
                except (ValueError, NotImplementedError, struct.error,
                        IndexError):
                    out.append((int(mid), "corrupt", None, None, None,
                                None, None, None, None, None, len(b)))
            yield pd.DataFrame(out, columns=[f.name for f
                                             in MEDIA_CATALOG_SCHEMA])

    return media.select("media_id", "content").mapInPandas(
        kernel, schema=MEDIA_CATALOG_SCHEMA)


def synthesize_cross_container_media(spark, n: int = 16,
                                     fps: int = 10) -> DataFrame:
    """Planted cross-container duplicates: clip ``m`` (< n) is a
    Motion-JPEG AVI of closed-form footage; clip ``m + n`` is the SAME
    footage muxed as an ISO BMFF MP4. Footage: ``2 + m % 3`` frames of
    ``8·(1 + m % 2)`` × ``8·(1 + m % 3)`` constant-grey blocks holding
    ``(32·bx + 56·by + 9·m + 17·f) % 256`` — distinct per ``m`` by
    construction, identical across the two containers, and exact
    through quality-75 JPEG. ``video_signature`` must therefore pair
    ``(m, m+n)`` exactly: container-invariant dedup, provable by an
    external oracle without decoding a byte."""
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                i = int(mid)
                m = i % n
                bh, bw, nf = 1 + m % 2, 1 + m % 3, 2 + m % 3
                f = np.arange(nf).reshape(nf, 1, 1)
                by = np.arange(bh).reshape(1, bh, 1)
                bx = np.arange(bw).reshape(1, 1, bw)
                vals = (32 * bx + 56 * by + 9 * m + 17 * f) % 256
                px = np.repeat(np.repeat(vals, 8, 1), 8, 2)
                frames = np.repeat(px[:, :, :, None], 3, 3) \
                           .astype(np.uint8)
                if i < n:
                    blob, fmt = encode_avi(frames, fps, codec="MJPG",
                                           quality=75), "avi"
                else:
                    blob, fmt = encode_mp4(frames, fps, quality=75), "mp4"
                rows.append((i, "video", blob,
                             {"format": fmt, "width": 8 * bw,
                              "height": 8 * bh,
                              "duration_s": nf / fps}))
            yield pd.DataFrame(rows,
                               columns=["media_id", "kind", "content",
                                        "meta"])

    return _synth_range(spark, 2 * n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every: int = 1) -> DataFrame:
    """REAL video frame sampling: decode the container (AVI or MP4,
    sniffed per blob by magic bytes, so mixed corpora work), keep every
    ``every``-th frame, re-encode each kept frame as a standalone BMP —
    one output row per sampled frame, ready for the image
    feature/resize/dedup kernels. The row-explosion (frames ≫ clips)
    happens inside ``mapInPandas``, so it pipelines batch-by-batch
    without materializing whole videos."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                _fps, frames = decode_video(bytes(content))
                _n, h, w, _ = frames.shape
                for i in range(0, frames.shape[0], every):
                    rows.append((int(mid), i, encode_bmp(frames[i]),
                                 {"format": "bmp", "width": w, "height": h,
                                  "duration_s": None}))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx",
                                              "content", "meta"])

    return media.select("media_id", "content").mapInPandas(
        kernel, schema=FRAME_SCHEMA)


SIGNATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("n_frames", IntegerType()),
    StructField("signature", StringType()),
])


def video_signature(media: DataFrame, every: int = 1) -> DataFrame:
    """Visual-temporal video fingerprint: decode the container (AVI or
    MP4, sniffed per blob), fingerprint every
    ``every``-th frame as ``aHash:dims:pixel-sum``, join into one
    signature string. Re-containered copies of the same footage collapse
    to one signature (the fingerprint sees pixels, not bytes), while the
    aHash component keeps block structure and the sum/dims components
    split brightness-shifted footage a bare perceptual hash would merge.
    Video-level dedup becomes an ordinary groupBy on the signature — the
    video member of the dedup family (exact/MinHash/SimHash/embedding/
    semantic → visual-temporal). One mapInPandas pass; signatures are
    tiny strings, so the downstream dedup shuffle moves fingerprints,
    never pixels."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                _fps, frames = decode_video(bytes(content))
                _n, h, w, _c = frames.shape
                parts = []
                for i in range(0, frames.shape[0], every):
                    fr = frames[i]
                    parts.append(
                        f"{_ahash64(fr) & 0xFFFFFFFFFFFFFFFF:016x}"
                        f":{w}x{h}:{int(fr.sum())}")
                out.append((int(mid), int(frames.shape[0]),
                            "-".join(parts)))
            yield pd.DataFrame(out, columns=[f.name for f
                                             in SIGNATURE_SCHEMA])

    return media.select("media_id", "content").mapInPandas(
        kernel, schema=SIGNATURE_SCHEMA)


FRAME_FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("px_sum", LongType()),
])


def extract_frame_features(frames: DataFrame) -> DataFrame:
    """Per-sampled-frame pixel statistics (decode the BMP each row carries
    — the full video path is decode AVI → re-encode frame → decode frame,
    every step a real codec)."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, fidx, content, meta in zip(
                    pdf["media_id"], pdf["frame_idx"], pdf["content"],
                    pdf["meta"]):
                px = decode_real(bytes(content), (meta or {}).get("format"))
                h, w, _ = px.shape
                out.append((int(mid), int(fidx), w, h, int(px.sum())))
            yield pd.DataFrame(out, columns=[f.name for f
                                             in FRAME_FEATURE_SCHEMA])

    return frames.mapInPandas(kernel, schema=FRAME_FEATURE_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing for blobs in formats WITHOUT a real decoder here
    (jpg/mp4): updates metadata, passes content through the same
    mapInPandas shape ``resize_media`` uses for decodable formats."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # real impl (see resize_media): decode → resample → re-encode
            yield pdf

    resized = media.select("media_id", "kind", "content").mapInPandas(
        kernel, schema=StructType([
            StructField("media_id", LongType()),
            StructField("kind", StringType()),
            StructField("content", BinaryType())]))
    return resized.withColumn(
        "meta", F.struct(F.lit("fake").alias("format"),
                         F.lit(width).cast("int").alias("width"),
                         F.lit(height).cast("int").alias("height"),
                         F.lit(None).cast("double").alias("duration_s")))


def frame_sample_stub(media: DataFrame, every_s: float = 1.0) -> DataFrame:
    """Frame-sampling plumbing for container formats WITHOUT a real
    decoder here (mp4/mkv — see ``sample_frames`` for the real AVI path):
    one output row per pseudo-frame (``ceil(n_bytes/1024)`` per blob) so
    the explode/partitioning shape is real.
    """
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                n = max(1, len(content or b"") // 1024 + 1)
                for i in range(n):
                    rows.append((mid, i, (content or b"")[i * 16:(i + 1) * 16]))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx",
                                              "frame_bytes"])

    return media.select("media_id", "content").mapInPandas(
        kernel, schema=StructType([
            StructField("media_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame_bytes", BinaryType())]))


def synthesize_bmp_near_dups(spark, n: int = 64, n_dups: int = 16) -> DataFrame:
    """REAL-BMP corpus with PLANTED near-duplicates for perceptual-hash
    dedup: image ``m < n`` has pixel value
    ``(3x + 5y + 7m + 11c + (x+1)(y+2)(3m+1)) mod 256`` (the multiplicative
    term decorrelates images — plain gradients collide under aHash), and
    image ``m >= n`` is a copy of base ``m - n`` with +1 perturbation where
    ``(x + y) % 5 == 0`` (a re-encode/noise stand-in that flips 0–3
    signature bits). Closed form, so an external SQL oracle reproduces
    every pixel, every signature bit, and every near-dup pair exactly.
    Distributed generation (mapInPandas over a range)."""
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for m in pdf["id"]:
                m = int(m)
                b, dup = (m, False) if m < n else (m - n, True)
                w, h = 8 + b % 5, 8 + b % 3
                x = np.arange(w).reshape(1, w, 1)
                y = np.arange(h).reshape(h, 1, 1)
                c = np.arange(3).reshape(1, 1, 3)
                px = 3 * x + 5 * y + 7 * b + 11 * c \
                    + (x + 1) * (y + 2) * (3 * b + 1)
                if dup:
                    px = px + ((x + y) % 5 == 0)
                px = (px % 256).astype(np.uint8)
                rows.append((m, "image", encode_bmp(px),
                             {"format": "bmp", "width": w, "height": h,
                              "duration_s": None}))
            yield pd.DataFrame(rows, columns=["media_id", "kind",
                                              "content", "meta"])

    return _synth_range(spark, n + n_dups).mapInPandas(gen, schema=MEDIA_SCHEMA)


def _ahash64_exact(px) -> int:
    """Integer-exact 64-bit average hash: bit ``(by·8 + bx)`` is set iff
    the block's summed channel values exceed the image mean —
    ``block_sum · n_pixels > total_sum · block_pixels`` compared in
    INTEGER arithmetic (no float block means), so any engine reproduces
    the exact same bits from the same pixels regardless of summation
    order. Grid assignment matches ``_ahash64``: pixel row ``y`` maps to
    block row ``y·8 // h``."""
    import numpy as np

    h, w, _ = px.shape
    ls = px.astype(np.int64).sum(axis=2)
    gy = (np.arange(h) * 8) // h
    gx = (np.arange(w) * 8) // w
    bs = np.zeros((8, 8), dtype=np.int64)
    bc = np.zeros((8, 8), dtype=np.int64)
    np.add.at(bs, (gy[:, None], gx[None, :]), ls)
    np.add.at(bc, (gy[:, None], gx[None, :]), 1)
    ts, tc = int(ls.sum()), h * w
    bits = (bs * tc > ts * bc).flatten()
    ah = 0
    for i, b in enumerate(bits):
        if b:
            ah |= (1 << i)
    return ah - (1 << 64) if ah >= (1 << 63) else ah


def image_signature(media: DataFrame) -> DataFrame:
    """REAL decode → integer-exact perceptual signature (``_ahash64_exact``)
    per image. Arrow-batched ``mapInPandas``; blobs never leave the
    executors — only 8-byte signatures shuffle afterwards (the property
    that makes image dedup feasible at 100 TB: the pair search runs on
    signatures, never on pixels)."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content, meta in zip(pdf["media_id"], pdf["content"],
                                          pdf["meta"]):
                px = decode_real(bytes(content), (meta or {}).get("format"))
                out.append((int(mid), _ahash64_exact(px)))
            yield pd.DataFrame(out, columns=["media_id", "sig64"])

    return media.select("media_id", "content", "meta").mapInPandas(
        kernel, schema=StructType([StructField("media_id", LongType()),
                                   StructField("sig64", LongType())]))


JPEG_CATALOG_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_components", IntegerType()),
    StructField("sampling", StringType()),
    StructField("baseline", StringType()),
    StructField("content_bytes", LongType()),
])


def jpeg_catalog(media: DataFrame) -> DataFrame:
    """Header-only JPEG inventory: dimensions/components/sampling per
    blob via :func:`jpeg_meta` — NO pixel decode, NO Huffman parse, only
    the marker headers are touched. The 100-TB catalog primitive: a
    petabyte JPEG corpus inventories at IO speed (and with parquet-side
    pruning, reading only the content column). Unparseable blobs yield a
    NULL-dimension row instead of failing the task — a corrupt file is a
    catalog fact, not a pipeline error."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content)
                try:
                    m = jpeg_meta(b)
                    out.append((int(mid), m["width"], m["height"],
                                m["n_components"], m["sampling"],
                                str(m["baseline"]).lower(), len(b)))
                except (ValueError, NotImplementedError):
                    out.append((int(mid), None, None, None, "corrupt",
                                "false", len(b)))
            yield pd.DataFrame(out, columns=[f.name for f
                                             in JPEG_CATALOG_SCHEMA])

    return media.select("media_id", "content").mapInPandas(
        kernel, schema=JPEG_CATALOG_SCHEMA)


def image_signature_jpeg_dc(media: DataFrame) -> DataFrame:
    """Perceptual signature from DC coefficients only
    (:func:`decode_jpeg_dc_thumbnail` → ``_ahash64_exact``): per-block
    IDCT, full-res assembly, and full-res color conversion all skipped —
    the bulk-dedup sweep shape for JPEG corpora. On rasters whose aHash
    grid aligns with JPEG blocks (dims multiples of 64) the signature
    EQUALS the full-decode :func:`image_signature` bit-for-bit
    (block-mean of pixels == DC/8; pytest-locked); elsewhere it is the
    standard near-dup approximation. Same output schema, so
    :func:`phash_near_dup_pairs` consumes either."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                th = decode_jpeg_dc_thumbnail(bytes(content))
                out.append((int(mid), _ahash64_exact(th)))
            yield pd.DataFrame(out, columns=["media_id", "sig64"])

    return media.select("media_id", "content").mapInPandas(
        kernel, schema=StructType([StructField("media_id", LongType()),
                                   StructField("sig64", LongType())]))


def phash_near_dup_pairs(sig: DataFrame, bands: int = 8,
                         max_hamming: int = 6) -> DataFrame:
    """Banded near-duplicate pair search over 64-bit signatures: split each
    signature into ``bands`` equal bit-bands, self-join on (band, value)
    — two signatures within ``max_hamming < bands`` Hamming distance share
    at least one unchanged band (pigeonhole), so banding has FULL recall
    and candidates-then-verify equals the exact all-pairs answer without
    the O(n²) scan. Shuffles only (band, band_value) keys; verification is
    ``bit_count(a XOR b)`` on the carried signatures (codegen, no second
    scan of the corpus). The LSH-for-Hamming analog of the MinHash band
    join in ``dedup.py``."""
    if max_hamming >= bands:
        raise ValueError("full recall needs max_hamming < bands")
    width = 64 // bands
    mask = (1 << width) - 1
    bandvals = F.array(*[
        F.shiftrightunsigned(F.col("sig64"), width * b).bitwiseAND(mask)
        for b in range(bands)])
    banded = (sig.select("media_id", "sig64",
                         F.posexplode(bandvals).alias("band", "bval")))
    left = banded.select(F.col("media_id").alias("id_a"),
                         F.col("sig64").alias("sig_a"), "band", "bval")
    right = banded.select(F.col("media_id").alias("id_b"),
                          F.col("sig64").alias("sig_b"), "band", "bval")
    cands = (left.join(right, ["band", "bval"])
                 .where(F.col("id_a") < F.col("id_b"))
                 .select("id_a", "id_b", "sig_a", "sig_b").distinct())
    return (cands.withColumn(
                "hamming",
                F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))))
                 .where(F.col("hamming") <= max_hamming)
                 .select("id_a", "id_b", "hamming"))


def synthesize_tone_sequence_media(spark, n: int = 24, n_dups: int = 8,
                                   segs: int = 4, seg_samples: int = 512,
                                   sample_rate: int = 8000) -> DataFrame:
    """REAL-WAV corpus with PLANTED near-duplicate clips for audio
    fingerprinting: clip ``m < n`` is ``segs`` concatenated pure tones
    whose segment-``j`` DFT bin is ``20 + (7m + 3j) mod 40`` (7 is
    invertible mod 40, so every clip's bin sequence is distinct for
    ``n ≤ 40``; each tone runs an exact integer number of periods per
    segment). Clip ``m >= n`` repeats base ``m − n`` at HALF amplitude —
    the re-encoded/re-mastered copy whose spectral fingerprint must still
    match. Closed form, so the oracle states the expected pairing
    analytically. Distributed generation."""
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for m in pdf["id"]:
                m = int(m)
                b, amp = (m, 12000.0) if m < n else (m - n, 6000.0)
                parts = []
                for j in range(segs):
                    k = 20 + (7 * b + 3 * j) % 40
                    t = np.arange(seg_samples) / sample_rate
                    freq = k * sample_rate / seg_samples
                    parts.append(np.round(
                        amp * np.sin(2 * np.pi * freq * t)))
                samples = np.concatenate(parts).astype(np.int16)
                rows.append((m, "audio", encode_wav(samples, sample_rate),
                             {"format": "wav", "width": None, "height": None,
                              "duration_s": segs * seg_samples
                              / sample_rate}))
            yield pd.DataFrame(rows, columns=["media_id", "kind",
                                              "content", "meta"])

    return _synth_range(spark, n + n_dups).mapInPandas(gen, schema=MEDIA_SCHEMA)


def audio_signature(media: DataFrame, seg_samples: int = 512) -> DataFrame:
    """Spectral audio fingerprint (chromaprint-shaped): decode → frame into
    ``seg_samples`` windows → rfft per window → dominant non-DC bin →
    signature = the dash-joined bin sequence (+ sample count). Amplitude-
    INVARIANT by construction (argmax of magnitudes), so gain-changed /
    re-mastered copies fingerprint identically, while any tone change
    flips a bin. Arrow-batched ``mapInPandas``: FFTs run where the bytes
    live; only ~short signature strings shuffle — the audio sibling of
    ``video_signature``."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                _rate, samples = decode_audio(bytes(content))
                mono = samples[:, 0].astype(np.float64)
                n_frames = len(mono) // seg_samples
                bins = []
                for j in range(n_frames):
                    seg = mono[j * seg_samples:(j + 1) * seg_samples]
                    spec = np.abs(np.fft.rfft(seg))
                    bins.append(1 + int(np.argmax(spec[1:]))
                                if spec.size > 1 else 0)
                sig = f"{len(mono)}:" + "-".join(map(str, bins))
                out.append((int(mid), sig))
            yield pd.DataFrame(out, columns=["media_id", "signature"])

    return media.select("media_id", "content").mapInPandas(
        kernel, schema=StructType([StructField("media_id", LongType()),
                                   StructField("signature", StringType())]))
