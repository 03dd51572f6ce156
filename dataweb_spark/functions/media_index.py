"""Persisted MEDIA dedup index — the media analog of ``dedup_index``.

The text gate (``dedup_index.py``) materializes fingerprints + MinHash
bands once so steady-state ingest never rescans corpus text. Media
corpora need the same shape even more urgently: blobs are KB-GB each,
so "recompute corpus signatures per batch" is a non-starter at 100 TB.
This module materializes three narrow tables

    ``{path}/sigs``   (id, kind, sig)   — exact-tier signature strings:
                      images key on md5(pixels)+dims (container-
                      invariant: a PNG re-encode of a BMP collapses),
                      videos on the per-frame visual-temporal string
                      (AVI↔MP4 re-containers collapse), audio on the
                      amplitude-invariant spectral fingerprint
                      (re-masters collapse)
    ``{path}/ahash``  (id, sig64)       — image perceptual hashes for
                      the image NEAR tier: banded Hamming lookup
                      (pigeonhole-complete for max_hamming < bands)
    ``{path}/vhash``  (id, fidx, sig64) — POSITION signatures for the
                      video/audio near tier, RATE-NORMALIZED (r10):
                      positions are sampled at a canonical rate in
                      time — perceptual hashes of the frames nearest
                      the canonical ticks for videos, hashed
                      dominant-FFT bins over canonical-duration windows
                      for audio — so a variable-rate re-encode (fps
                      change, audio resample) lands on the same
                      position sequence as its source. Banded Hamming
                      lookup between positions aligned at any constant
                      offset within ±pos_max_offset (offset VOTING),
                      near when >= 80% of the longer side's positions
                      match at some offset — so a RE-ENCODED video with
                      a few perturbed frames, a TRIMMED-intro audio
                      clip, a video with prepended frames, or an
                      FPS-HALVED copy still collapses (cross-kind rows
                      cannot reach 80% against each other: the hashes
                      come from disjoint constructions)
    ``{path}/meta.json``                — params, checked on read

and classifies each ingest batch against THOSE — batch side broadcast,
pixels/samples never shuffle, corpus blobs never re-read. Blobs are
DECODED EXACTLY ONCE per pass: every public entry point accepts a
precomputed ``sig_df`` (one :func:`media_signatures` output) so callers
that classify AND append — the streaming gate — pay one decode, not
three. Admitted rows append (:func:`append_media_batch`); nothing is
rebuilt.

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
from pyspark.sql.types import (ArrayType, LongType, StringType,
                               StructField, StructType)

from dataweb_spark.functions.dedup_index import (_fs_read_text,
                                                 _fs_write_text,
                                                 read_index_table)

_META = "meta.json"

SIG_SCHEMA = StructType([
    StructField("id", LongType()),
    StructField("kind", StringType()),
    StructField("sig", StringType()),
    StructField("sig64", LongType()),             # images only, else NULL
    StructField("frame_sigs", ArrayType(LongType())),   # videos only
])

# A batch video/audio is near an indexed one when matched·DEN >= n·NUM of
# the longer side's positions match within max_hamming (integer-exact
# 80% rule — no float threshold to diverge between engines).
_VIDEO_NEAR_NUM = 4
_VIDEO_NEAR_DEN = 5
# Temporal tolerance of the position near tier: positions may align at
# any constant offset with |offset| <= this cap (a trimmed intro shifts
# every position by the trim length; offset 0 is the aligned case).
# The cap bounds the per-candidate-pair vote rows to (2·cap+1)·n even
# for degenerate all-identical-frame content.
_POS_MAX_OFFSET = 4
# Rate normalization of the position tier (r10): positions are sampled
# at a canonical rate in TIME, not per stored frame/window, so a
# variable-rate re-encode — fps change, audio resample — lands on the
# SAME position sequence as its source and pairs in the near tier
# (offset voting alone cannot catch it: a rate change rescales ALL
# positions, no constant offset exists). Video positions are the frames
# nearest the canonical ticks; audio windows span a canonical DURATION
# (so the dominant-FFT bin index maps to frequency k/window_s Hz,
# independent of sample rate).
_CANON_VIDEO_RATE = 10.0      # position ticks per second
_CANON_AUDIO_WINDOW = 0.064   # seconds per FFT window (512 @ 8 kHz)


def _bin_sig64(bin_str: str) -> int:
    """Hash an audio window's dominant-bin label to a signed 64-bit
    position signature: distinct bins land ~32 Hamming apart, so the
    banded-Hamming position lookup degenerates to equality for audio."""
    v = int.from_bytes(
        hashlib.md5(b"abin:" + bin_str.encode()).digest()[:8], "big")
    return v - (1 << 64) if v >= (1 << 63) else v


def media_signatures(media: DataFrame,
                     id_col: str = "media_id",
                     canon_video_rate: float = _CANON_VIDEO_RATE,
                     canon_audio_window: float = _CANON_AUDIO_WINDOW
                     ) -> DataFrame:
    """One Arrow pass → (id, kind, sig, sig64, frame_sigs) per blob.
    Kind is sniffed from magic bytes (not trusted from metadata), so
    mixed and mislabelled corpora fingerprint correctly:

    * image → ``sig = "i:<md5(raw pixels)>:<h>x<w>"`` (exact across
      containers — any lossless re-encode of the same raster collapses)
      plus ``sig64`` = the integer-exact aHash for the near tier;
    * video → ``sig = "v:" + per-frame "<ahash>:<dims>:<pixel-sum>"``
      joined ``|`` (container-invariant, same construction as
      ``video_signature``) plus ``frame_sigs`` = aHashes of the frames
      nearest the CANONICAL ticks (``canon_video_rate`` per second) —
      rate-normalized, so an fps-changed re-encode produces the same
      position sequence as its source and the near tier pairs them;
    * audio → ``sig = "a:" + dominant-FFT-bin sequence over canonical
      ``canon_audio_window``-second windows`` (amplitude-invariant; the
      window spans a fixed DURATION, so the bin index maps to frequency
      k/window_s Hz independent of sample rate — a resampled re-master
      reproduces the sequence) plus ``frame_sigs`` = the per-window
      bins hashed to 64 bits (md5 prefix), so the position near tier
      treats window matches as effective equality (distinct bins land
      ~32 Hamming apart, far outside ``max_hamming``).

    Each blob is probed and decoded ONCE. Undecodable blobs get
    ``kind='corrupt'``, ``sig = "c:<md5(bytes)>"`` — corrupt duplicates
    still dedup, and one bad blob never fails the batch."""
    import numpy as np

    from dataweb_spark.functions import multimodal as M

    def one(content: bytes):
        try:
            info = M.media_probe(content)
            kind = info["kind"]
        except (ValueError, NotImplementedError):
            info, kind = None, "corrupt"
        try:
            if kind == "image":
                px = M.decode_real(content, info["format"])
                h, w = px.shape[0], px.shape[1]
                dig = hashlib.md5(
                    np.ascontiguousarray(px).tobytes()).hexdigest()
                return kind, f"i:{dig}:{h}x{w}", M._ahash64_exact(px), None
            if kind == "video":
                fps, frames = M.decode_video(content)
                n, h, w, _c = frames.shape
                all_sigs = [M._ahash64_exact(fr) for fr in frames]
                parts = [f"{fs:016x}:{w}x{h}:{int(fr.sum())}"
                         for fs, fr in zip(all_sigs, frames)]
                if fps > 0:
                    # rate-normalized positions: the frame nearest each
                    # canonical tick t/canon_video_rate — an fps-halved
                    # re-encode (every other frame at half the rate)
                    # lands on the same source frames at the same ticks
                    n_pos = max(1, int(round(n / fps * canon_video_rate)))
                    step = fps / canon_video_rate
                    fsigs = [all_sigs[min(n - 1, int(round(t * step)))]
                             for t in range(n_pos)]
                else:
                    # decoders return fps=0 when rate metadata is absent
                    # (no strh/stts): no time base exists, so positions
                    # fall back to the stored frames — degraded recall
                    # against rate-changed copies, but one metadata-poor
                    # blob must never fail the batch
                    fsigs = all_sigs
                return kind, "v:" + "|".join(parts), None, fsigs
            if kind == "audio":
                rate, samples = M.decode_audio(content)
                mono = samples[:, 0].astype(np.float64)
                # canonical-DURATION window: seg scales with the sample
                # rate, so bin k always means frequency k/window_s Hz
                # and window counts match across resamples
                seg = max(1, int(round(rate * canon_audio_window)))
                bins = []
                for s0 in range(0, len(mono) - seg + 1, seg):
                    spec = np.abs(np.fft.rfft(mono[s0:s0 + seg]))
                    bins.append(str(1 + int(np.argmax(spec[1:])))
                                if spec.size > 1 else "0")
                fsigs = [_bin_sig64(b) for b in bins]
                return kind, "a:" + "|".join(bins), None, fsigs
        except (ValueError, NotImplementedError):
            kind = "corrupt"
        dig = hashlib.md5(content).hexdigest()
        return "corrupt", f"c:{dig}", None, None

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf[id_col], pdf["content"]):
                kind, sig, sig64, fsigs = one(bytes(content))
                out.append((int(mid), kind, sig, sig64, fsigs))
            yield pd.DataFrame(out, columns=[f.name for f in SIG_SCHEMA])

    return media.select(id_col, "content").mapInPandas(
        kernel, schema=SIG_SCHEMA)


def _vhash_rows(sigs: DataFrame) -> DataFrame:
    """Explode video signature rows into (id, fidx, sig64) — the narrow
    per-frame near-tier table."""
    return (sigs.where(F.col("frame_sigs").isNotNull())
            .select("id", F.posexplode("frame_sigs").alias("fidx", "sig64")))


def build_media_index(media: DataFrame, path: str,
                      id_col: str = "media_id", bands: int = 8,
                      max_hamming: int = 6,
                      pos_max_offset: int = _POS_MAX_OFFSET,
                      canon_video_rate: float = _CANON_VIDEO_RATE,
                      canon_audio_window: float = _CANON_AUDIO_WINDOW
                      ) -> None:
    """One corpus pass → persisted signature tables. The blobs are never
    read again; every later classify touches only these narrow rows.
    The canonical position rates are recorded in meta.json so every
    later classify/gate batch fingerprints at the SAME rates — index
    and batch positions must share one time base."""
    if max_hamming >= bands:
        raise ValueError("full recall needs max_hamming < bands")
    spark = media.sparkSession
    sigs = media_signatures(media, id_col, canon_video_rate,
                            canon_audio_window)
    sigs.write.mode("overwrite").parquet(f"{path}/sigs")
    persisted = spark.read.parquet(f"{path}/sigs")
    ahash = (persisted.where(F.col("sig64").isNotNull())
             .select("id", "sig64"))
    vhash = _vhash_rows(persisted)
    # the two derived tables read the already-persisted sigs and write
    # to independent paths — overlap the jobs (r15, guide §2.6)
    from dataweb_spark.functions.dedup_index import (_concurrent_writes,
                                                     record_table_schemas)
    _concurrent_writes(
        lambda: ahash.write.mode("overwrite").parquet(f"{path}/ahash"),
        lambda: vhash.write.mode("overwrite").parquet(f"{path}/vhash"))
    params = {"bands": bands, "max_hamming": max_hamming,
              "video_near_num": _VIDEO_NEAR_NUM,
              "video_near_den": _VIDEO_NEAR_DEN,
              "pos_max_offset": pos_max_offset,
              "canon_video_rate": canon_video_rate,
              "canon_audio_window": canon_audio_window}
    record_table_schemas(params, sigs=persisted, ahash=ahash, vhash=vhash)
    _fs_write_text(spark, f"{path}/{_META}", json.dumps(params))


def _load_params(spark: SparkSession, path: str) -> dict:
    text = _fs_read_text(spark, f"{path}/{_META}")
    if text is None:
        raise ValueError(f"no media index at {path}")
    params = json.loads(text)
    if "canon_video_rate" not in params:
        # An index whose vhash rows predate rate normalization holds one
        # position PER STORED FRAME; comparing canonical-tick batch
        # positions against it makes the offsets vary with position and
        # near-dup recall silently collapses. Refuse instead of degrade.
        raise ValueError(
            f"media index at {path} predates canonical-rate position "
            "signatures (no canon_video_rate in meta.json) — rebuild it "
            "with build_media_index before classifying new batches")
    return params


def classify_media_batch(spark: SparkSession, batch: DataFrame, path: str,
                         id_col: str = "media_id",
                         sig_df: DataFrame | None = None) -> DataFrame:
    """Classify an ingest batch against the persisted index:

    * ``exact_dup`` — signature string already indexed (any kind; for
      images this is pixel-exact across containers, for videos
      visual-temporal-exact across containers, for audio
      amplitude-invariant);
    * ``near_dup``  — images: banded-Hamming aHash lookup within
      ``max_hamming`` (pigeonhole-complete recall for
      ``max_hamming < bands``); videos/audio: banded-Hamming POSITION
      lookup (per-frame aHash / hashed per-window bin) with OFFSET
      VOTING — positions may align at any constant shift within
      ``±pos_max_offset`` — near when >= 80% of the longer side's
      positions match within ``max_hamming`` at some offset. Catches
      video re-ENCODES whose perturbed frames break the exact
      visual-temporal string, audio EDITS touching a few windows, AND
      temporally EDITED copies (trimmed intro, prepended frames) whose
      positions are index-shifted;
    * ``novel``     — neither.

    ``match_id`` = the lowest-id indexed match (nearest first for the
    image near tier). The batch side is broadcast into every lookup; the
    index tables stream; corpus blobs are never touched. Pass ``sig_df``
    (a :func:`media_signatures` output for ``batch``) to skip the decode
    entirely — callers that classify AND append should compute
    signatures once and thread them through."""
    params = _load_params(spark, path)
    bands, max_h = params["bands"], params["max_hamming"]
    near_num = params.get("video_near_num", _VIDEO_NEAR_NUM)
    near_den = params.get("video_near_den", _VIDEO_NEAR_DEN)
    width = 64 // bands
    mask = (1 << width) - 1

    if sig_df is not None:
        bsig = sig_df
    else:
        # one decode pass, materialized eagerly so the three join
        # subtrees below reuse the rows instead of re-decoding the
        # batch blobs (and nothing is left pinned in the cache) — at
        # the INDEX's canonical rates, so batch and index positions
        # share one time base
        # params[...] direct, no defaults: _load_params hard-fails on a
        # legacy meta.json, and a silent fallback here could fingerprint
        # a batch at a rate mismatched with the index
        bsig = media_signatures(
            batch, id_col,
            params["canon_video_rate"], params["canon_audio_window"]
        ).localCheckpoint(eager=True)
    # tier pruning: a kind-homogeneous batch (the common case) must not
    # pay the other kinds' join stages. Cheap — bsig is materialized
    # (callers passing sig_df should pass it materialized too).
    has_img = not bsig.where(F.col("sig64").isNotNull()).isEmpty()
    has_pos = not bsig.where(F.col("frame_sigs").isNotNull()).isEmpty()
    isig = read_index_table(spark, path, "sigs", params)

    exact = (isig.join(F.broadcast(bsig.select("sig", F.col("id")
                                               .alias("_bid"))), "sig")
             .groupBy("_bid").agg(F.min("id").alias("exact_match")))

    iah = read_index_table(spark, path, "ahash", params)

    def banded(df, idc, sigc, extra=()):
        vals = F.array(*[
            F.shiftrightunsigned(F.col(sigc), width * b).bitwiseAND(mask)
            for b in range(bands)])
        return df.select(F.col(idc), F.col(sigc), *[F.col(c) for c in extra],
                         F.posexplode(vals).alias("band", "bval"))

    near_parts = []
    if has_img:
        bh = banded(bsig.where(F.col("sig64").isNotNull())
                    .select(F.col("id").alias("_bid"),
                            F.col("sig64").alias("_bsig")), "_bid", "_bsig")
        ih = banded(iah.select("id", "sig64"), "id", "sig64")
        near_parts.append(
            (ih.join(F.broadcast(bh), ["band", "bval"])
             .select("_bid", "id",
                     F.bit_count(F.col("sig64")
                                 .bitwiseXOR(F.col("_bsig")))
                     .alias("hamming"))
             .where(F.col("hamming") <= max_h)
             .groupBy("_bid")
             .agg(F.min(F.struct("hamming", "id")).alias("m"))
             .select("_bid", F.col("m.id").alias("near_match"))))

    # POSITION near tier (video frames / audio windows): banded Hamming
    # between positions aligned at ANY constant offset within
    # ±pos_max_offset (offset 0 = the aligned case; a trimmed intro or
    # prepended frames shift every position by the edit length). Per
    # candidate pair the matches VOTE by offset; the pair qualifies
    # when some offset's matched positions cover >= near_num/near_den
    # of the LONGER side (integer compare). The offset cap keeps the
    # vote rows bounded at (2·cap+1)·n per pair even for degenerate
    # all-identical-position content — without it a static clip would
    # produce n² band hits against its own re-encode.
    if has_pos:
        max_off = params.get("pos_max_offset", _POS_MAX_OFFSET)
        ivh = read_index_table(spark, path, "vhash", params)
        bvf = (bsig.where(F.col("frame_sigs").isNotNull())
               .select(F.col("id").alias("_bid"),
                       F.size("frame_sigs").alias("_bn"),
                       F.posexplode("frame_sigs").alias("fidx", "_bsig")))
        bvh = banded(bvf, "_bid", "_bsig", extra=("fidx", "_bn"))
        ivn = ivh.groupBy("id").agg((F.max("fidx") + 1).alias("_in"))
        # at a fixed offset each index position pairs with at most one
        # batch position, so distinct on (pair, off, index fidx) counts
        # matched positions; multi-band hits of the same pair collapse
        frame_hits = (banded(ivh.withColumnRenamed("fidx", "ifidx"),
                             "id", "sig64", extra=("ifidx",))
                      .join(F.broadcast(bvh), ["band", "bval"])
                      .where((F.abs(F.col("ifidx") - F.col("fidx"))
                              <= max_off)
                             & (F.bit_count(
                                 F.col("sig64").bitwiseXOR(F.col("_bsig")))
                                <= max_h))
                      .select("_bid", "id",
                              (F.col("ifidx") - F.col("fidx")).alias("off"),
                              "ifidx", "_bn").distinct())
        near_parts.append(
            (frame_hits.groupBy("_bid", "id", "off", "_bn")
             .agg(F.count("*").alias("matched"))
             .join(ivn, "id")
             .where(F.col("matched") * near_den
                    >= F.greatest("_bn", "_in") * near_num)
             .groupBy("_bid").agg(F.min("id").alias("near_match"))))

    out = (bsig.select(F.col("id").alias("_bid"), "kind")
           .join(exact, "_bid", "left"))
    if near_parts:
        # a blob has exactly one kind, so the image and position near
        # frames never share a _bid — union then reduce is safe
        near = near_parts[0]
        for p in near_parts[1:]:
            near = near.unionByName(p)
        near = (near.groupBy("_bid")
                .agg(F.min("near_match").alias("near_match")))
        out = out.join(near, "_bid", "left")
    else:
        out = out.withColumn("near_match", F.lit(None).cast("long"))
    return out.select(F.col("_bid").alias(id_col), "kind",
                      F.when(F.col("exact_match").isNotNull(), "exact_dup")
                       .when(F.col("near_match").isNotNull(), "near_dup")
                       .otherwise("novel").alias("verdict"),
                      F.coalesce("exact_match", "near_match")
                       .alias("match_id"))


def streaming_media_gate(stream_df: DataFrame, index_path: str,
                         checkpoint: str, id_col: str = "media_id"):
    """Streaming media ingest gate — the media face of
    ``dedup_index.streaming_ingest_gate``, same one-implementation rule:
    ``readStream → foreachBatch(classify → admit)`` over EXACTLY the
    batch classify/append code. Per micro-batch: signatures are computed
    ONCE (one decode per blob) and threaded through every step —
    within-batch collapse (min id per signature string — exact tier;
    media near tiers are signature-string-equal by construction for
    re-encodes/re-containers/re-masters, so the string collapse covers
    them), classify survivors against the persisted index, append novel
    blobs' signature rows. State lives entirely in the on-disk tables;
    the stream restarts from the checkpoint with nothing to rebuild.

    Replay idempotency: ``foreachBatch`` is at-least-once — the gate
    anti-joins the batch against already-indexed ids first, so a replay
    after the append admits nothing twice (precondition: ``id_col`` is a
    stable unique key; a re-sent id is a replay of the same blob).

    Returns the started StreamingQuery (caller awaits/ stops)."""
    from pyspark.sql import Window

    def _gate(batch: DataFrame, _epoch: int) -> None:
        spark = batch.sparkSession
        params = _load_params(spark, index_path)
        indexed = (read_index_table(spark, index_path, "sigs", params)
                   .select(F.col("id").alias(id_col)))
        fresh = batch.join(indexed, id_col, "left_anti")
        # ONE decode pass per micro-batch; localCheckpoint materializes
        # the narrow signature rows so collapse/classify/append all
        # reuse them (and nothing stays pinned after the batch) — at the
        # index's canonical rates (one time base, same as classify)
        sigs = media_signatures(
            fresh, id_col,
            params["canon_video_rate"], params["canon_audio_window"]
        ).localCheckpoint(eager=True)
        keep = (sigs.withColumn(
                    "_rn", F.row_number().over(
                        Window.partitionBy("sig").orderBy("id")))
                .where(F.col("_rn") == 1).drop("_rn"))
        verdicts = classify_media_batch(spark, None, index_path,
                                        id_col, sig_df=keep)
        admitted_sigs = keep.join(
            F.broadcast(verdicts.where(F.col("verdict") == "novel")
                        .select(F.col(id_col).alias("id"))), "id")
        append_media_batch(None, index_path, id_col, sig_df=admitted_sigs)

    return (stream_df.writeStream
            .foreachBatch(_gate)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())


def append_media_batch(admitted: DataFrame | None, path: str,
                       id_col: str = "media_id",
                       sig_df: DataFrame | None = None) -> None:
    """Append admitted blobs' signature rows — one pass over the batch,
    no index rebuild, no corpus re-read. Pass ``sig_df`` (the admitted
    subset of an existing :func:`media_signatures` output) to append
    without touching the blobs at all."""
    if sig_df is not None:
        sigs = sig_df
    else:
        sigs = media_signatures(admitted, id_col).localCheckpoint(eager=True)
    # three independent appends over the materialized signature rows
    # (the localCheckpoint above / the caller's contract for sig_df) —
    # overlapped; per-batch cost is job overhead, not data (r15, §2.6)
    from dataweb_spark.functions.dedup_index import _concurrent_writes
    _concurrent_writes(
        lambda: sigs.write.mode("append").parquet(f"{path}/sigs"),
        lambda: (sigs.where(F.col("sig64").isNotNull())
                 .select("id", "sig64")
                 .write.mode("append").parquet(f"{path}/ahash")),
        lambda: _vhash_rows(sigs).write.mode("append")
                                 .parquet(f"{path}/vhash"))
