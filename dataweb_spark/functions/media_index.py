"""Persisted MEDIA dedup index — the media analog of ``dedup_index``.

The text gate (``dedup_index.py``) materializes fingerprints + MinHash
bands once so steady-state ingest never rescans corpus text. Media
corpora need the same shape even more urgently: blobs are KB-GB each,
so "recompute corpus signatures per batch" is a non-starter at 100 TB.
This module materializes two narrow tables

    ``{path}/sigs``   (id, kind, sig)   — exact-tier signature strings:
                      images key on md5(pixels)+dims (container-
                      invariant: a PNG re-encode of a BMP collapses),
                      videos on the per-frame visual-temporal string
                      (AVI↔MP4 re-containers collapse), audio on the
                      amplitude-invariant spectral fingerprint
                      (re-masters collapse)
    ``{path}/ahash``  (id, sig64)       — image perceptual hashes for
                      the NEAR tier: banded Hamming lookup
                      (pigeonhole-complete for max_hamming < bands)
    ``{path}/meta.json``                — params, checked on read

and classifies each ingest batch against THOSE — batch side broadcast,
pixels/samples never shuffle, corpus blobs never re-read. Admitted rows
append (:func:`append_media_batch`); nothing is rebuilt.

Reference anchor: the ingest-dedup gate of ``SURVEY.md §2`` (incremental
ingest), lifted from text to the multimodal columns — beyond-reference,
like all of ``functions/``.
"""

from __future__ import annotations

import hashlib
import json
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (LongType, StringType, StructField,
                               StructType)

from dataweb_spark.functions.dedup_index import (_fs_read_text,
                                                 _fs_write_text)

_META = "meta.json"

SIG_SCHEMA = StructType([
    StructField("id", LongType()),
    StructField("kind", StringType()),
    StructField("sig", StringType()),
    StructField("sig64", LongType()),    # images only, else NULL
])


def media_signatures(media: DataFrame,
                     id_col: str = "media_id") -> DataFrame:
    """One Arrow pass → (id, kind, sig, sig64) per blob. Kind is sniffed
    from magic bytes (not trusted from metadata), so mixed and
    mislabelled corpora fingerprint correctly:

    * image → ``sig = "i:<md5(raw pixels)>:<h>x<w>"`` (exact across
      containers — any lossless re-encode of the same raster collapses)
      plus ``sig64`` = the integer-exact aHash for the near tier;
    * video → ``sig = "v:" + per-frame "<ahash>:<dims>:<pixel-sum>"``
      joined ``|`` (container-invariant, same construction as
      ``video_signature``);
    * audio → ``sig = "a:" + dominant-FFT-bin sequence over 512-sample
      windows`` (amplitude-invariant, same construction as
      ``audio_signature``).

    Undecodable blobs get ``kind='corrupt'``, ``sig = "c:<md5(bytes)>"``
    — corrupt duplicates still dedup, and one bad blob never fails the
    batch."""
    import numpy as np

    from dataweb_spark.functions import multimodal as M

    def one(content: bytes):
        try:
            kind = M.media_probe(content)["kind"]
        except (ValueError, NotImplementedError):
            kind = "corrupt"
        try:
            if kind == "image":
                fmt = M.media_probe(content)["format"]
                px = M.decode_real(content, fmt)
                h, w = px.shape[0], px.shape[1]
                dig = hashlib.md5(
                    np.ascontiguousarray(px).tobytes()).hexdigest()
                return kind, f"i:{dig}:{h}x{w}", M._ahash64_exact(px)
            if kind == "video":
                _fps, frames = M.decode_video(content)
                _n, h, w, _c = frames.shape
                parts = [f"{M._ahash64_exact(fr):016x}:{w}x{h}"
                         f":{int(fr.sum())}" for fr in frames]
                return kind, "v:" + "|".join(parts), None
            if kind == "audio":
                _rate, samples = M.decode_audio(content)
                mono = samples[:, 0].astype(np.float64)
                seg = 512
                bins = []
                for s0 in range(0, len(mono) - seg + 1, seg):
                    spec = np.abs(np.fft.rfft(mono[s0:s0 + seg]))
                    bins.append(str(1 + int(np.argmax(spec[1:])))
                                if spec.size > 1 else "0")
                return kind, "a:" + "|".join(bins), None
        except (ValueError, NotImplementedError):
            kind = "corrupt"
        dig = hashlib.md5(content).hexdigest()
        return "corrupt", f"c:{dig}", None

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf[id_col], pdf["content"]):
                kind, sig, sig64 = one(bytes(content))
                out.append((int(mid), kind, sig, sig64))
            yield pd.DataFrame(out, columns=[f.name for f in SIG_SCHEMA])

    return media.select(id_col, "content").mapInPandas(
        kernel, schema=SIG_SCHEMA)


def build_media_index(media: DataFrame, path: str,
                      id_col: str = "media_id", bands: int = 8,
                      max_hamming: int = 6) -> None:
    """One corpus pass → persisted signature tables. The blobs are never
    read again; every later classify touches only these narrow rows."""
    if max_hamming >= bands:
        raise ValueError("full recall needs max_hamming < bands")
    spark = media.sparkSession
    sigs = media_signatures(media, id_col)
    sigs.write.mode("overwrite").parquet(f"{path}/sigs")
    (spark.read.parquet(f"{path}/sigs")
     .where(F.col("sig64").isNotNull())
     .select("id", "sig64")
     .write.mode("overwrite").parquet(f"{path}/ahash"))
    _fs_write_text(spark, f"{path}/{_META}", json.dumps(
        {"bands": bands, "max_hamming": max_hamming}))


def _load_params(spark: SparkSession, path: str) -> dict:
    text = _fs_read_text(spark, f"{path}/{_META}")
    if text is None:
        raise ValueError(f"no media index at {path}")
    return json.loads(text)


def classify_media_batch(spark: SparkSession, batch: DataFrame, path: str,
                         id_col: str = "media_id") -> DataFrame:
    """Classify an ingest batch against the persisted index:

    * ``exact_dup`` — signature string already indexed (any kind; for
      images this is pixel-exact across containers);
    * ``near_dup``  — images only: banded-Hamming aHash lookup within
      ``max_hamming`` (pigeonhole-complete recall for
      ``max_hamming < bands``);
    * ``novel``     — neither.

    ``match_id`` = the lowest-id indexed match (nearest first for the
    near tier). The batch side is broadcast into both lookups; the index
    tables stream; corpus blobs are never touched."""
    params = _load_params(spark, path)
    bands, max_h = params["bands"], params["max_hamming"]
    width = 64 // bands
    mask = (1 << width) - 1

    bsig = media_signatures(batch, id_col).persist()
    isig = spark.read.parquet(f"{path}/sigs")

    exact = (isig.join(F.broadcast(bsig.select("sig", F.col("id")
                                               .alias("_bid"))), "sig")
             .groupBy("_bid").agg(F.min("id").alias("exact_match")))

    iah = spark.read.parquet(f"{path}/ahash")

    def banded(df, idc, sigc):
        vals = F.array(*[
            F.shiftrightunsigned(F.col(sigc), width * b).bitwiseAND(mask)
            for b in range(bands)])
        return df.select(F.col(idc), F.col(sigc),
                         F.posexplode(vals).alias("band", "bval"))

    bh = banded(bsig.where(F.col("sig64").isNotNull())
                .select(F.col("id").alias("_bid"),
                        F.col("sig64").alias("_bsig")), "_bid", "_bsig")
    ih = banded(iah.select("id", "sig64"), "id", "sig64")
    near = (ih.join(F.broadcast(bh), ["band", "bval"])
            .select("_bid", "id",
                    F.bit_count(F.col("sig64").bitwiseXOR(F.col("_bsig")))
                    .alias("hamming"))
            .where(F.col("hamming") <= max_h)
            .groupBy("_bid")
            .agg(F.min(F.struct("hamming", "id")).alias("m"))
            .select("_bid", F.col("m.id").alias("near_match")))

    out = (bsig.select(F.col("id").alias("_bid"), "kind")
           .join(exact, "_bid", "left")
           .join(near, "_bid", "left")
           .select(F.col("_bid").alias(id_col), "kind",
                   F.when(F.col("exact_match").isNotNull(), "exact_dup")
                    .when(F.col("near_match").isNotNull(), "near_dup")
                    .otherwise("novel").alias("verdict"),
                   F.coalesce("exact_match", "near_match")
                    .alias("match_id")))
    # bsig stays persisted until the returned frame is evaluated — an
    # eager unpersist here would silently re-decode the batch blobs once
    # per join subtree; the context cleaner reclaims it afterwards.
    return out


def streaming_media_gate(stream_df: DataFrame, index_path: str,
                         checkpoint: str, id_col: str = "media_id"):
    """Streaming media ingest gate — the media face of
    ``dedup_index.streaming_ingest_gate``, same one-implementation rule:
    ``readStream → foreachBatch(classify → admit)`` over EXACTLY the
    batch classify/append code. Per micro-batch: collapse within-batch
    duplicates (min id per signature string — exact tier; media near
    tiers are signature-string-equal by construction for re-encodes/
    re-containers/re-masters, so the string collapse covers them),
    classify survivors against the persisted index, append novel blobs'
    signature rows. State lives entirely in the on-disk tables; the
    stream restarts from the checkpoint with nothing to rebuild.

    Replay idempotency: ``foreachBatch`` is at-least-once — the gate
    anti-joins the batch against already-indexed ids first, so a replay
    after the append admits nothing twice (precondition: ``id_col`` is a
    stable unique key; a re-sent id is a replay of the same blob).

    Returns the started StreamingQuery (caller awaits/ stops)."""
    from pyspark.sql import Window

    def _gate(batch: DataFrame, _epoch: int) -> None:
        spark = batch.sparkSession
        indexed = (spark.read.parquet(f"{index_path}/sigs")
                   .select(F.col("id").alias(id_col)))
        fresh = batch.join(indexed, id_col, "left_anti")
        sigs = media_signatures(fresh, id_col)
        keep = (sigs.withColumn(
                    "_rn", F.row_number().over(
                        Window.partitionBy("sig").orderBy("id")))
                .where(F.col("_rn") == 1).select(F.col("id").alias(id_col)))
        survivors = fresh.join(F.broadcast(keep), id_col)
        verdicts = classify_media_batch(spark, survivors, index_path)
        admitted = survivors.join(
            F.broadcast(verdicts.where(F.col("verdict") == "novel")
                        .select(id_col)), id_col)
        append_media_batch(admitted, index_path, id_col)

    return (stream_df.writeStream
            .foreachBatch(_gate)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())


def append_media_batch(admitted: DataFrame, path: str,
                       id_col: str = "media_id") -> None:
    """Append admitted blobs' signature rows — one pass over the batch,
    no index rebuild, no corpus re-read."""
    sigs = media_signatures(admitted, id_col).persist()
    sigs.write.mode("append").parquet(f"{path}/sigs")
    (sigs.where(F.col("sig64").isNotNull()).select("id", "sig64")
     .write.mode("append").parquet(f"{path}/ahash"))
    sigs.unpersist()
