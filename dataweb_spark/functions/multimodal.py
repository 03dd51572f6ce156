"""Multimodal (image/audio/video) column plumbing (beyond-reference).

Media are opaque ``binary`` columns + a typed metadata struct; all transforms
run as Arrow-batched ``mapInPandas`` / pandas UDFs so bytes never cross the
JVM↔Python boundary row-at-a-time. The actual codecs (PIL/ffmpeg/…) are NOT
in this container, so the decode kernels are stubbed: ``decode_fake`` is a
deterministic stand-in (byte-statistics) that keeps schema, partitioning,
batch shape and UDF signatures real and testable; ``decode_real`` raises
``NotImplementedError`` until a codec library is installed.

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
    """Real decode — requires a codec library not present in this container."""
    raise NotImplementedError(
        "media decode requires PIL/av/soundfile; install a codec library "
        "and swap decode_real into extract_features")


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


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: updates metadata, passes content through the same
    mapInPandas shape a real resampler would use (kernel stubbed to
    identity bytes — container has no image codec)."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # real impl: decode → resample(width, height) → re-encode
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
    """Video frame-sampling plumbing: one output row per sampled frame.

    Kernel stubbed (no ffmpeg): emits ``ceil(n_bytes/1024)`` pseudo-frames
    per blob so the explode/partitioning shape is real.
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
