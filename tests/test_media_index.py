"""Persisted media-dedup index: build → classify → append contracts
(the media analog of test_dedup_index.py). All planted constructions are
deterministic md5-chain rasters / closed-form samples."""

import hashlib
import tempfile

import numpy as np
import pandas as pd
import pytest

from dataweb_spark.functions import media_index as MI
from dataweb_spark.functions import multimodal as M


def _pixels(seed: int, h: int = 16, w: int = 16):
    need = h * w * 3
    buf = b"".join(hashlib.md5(f"{seed}:{k}".encode()).digest()
                   for k in range(need // 16 + 1))
    return np.frombuffer(buf[:need], dtype=np.uint8).reshape(h, w, 3).copy()


def _frames(seed: int, n: int = 3):
    vals = np.array([[(seed * 37 + f * 11 + b * 5) % 256
                      for b in range(2)] for f in range(n)]) \
        .reshape(n, 1, 2)
    px = np.repeat(np.repeat(vals, 8, 1), 8, 2)
    return np.repeat(px[:, :, :, None], 3, 3).astype(np.uint8)


def _media_df(spark, rows):
    pdf = pd.DataFrame({
        "media_id": [r[0] for r in rows],
        "kind": ["?"] * len(rows),
        "content": [r[1] for r in rows],
        "meta": [None] * len(rows),
    })
    return spark.createDataFrame(pdf, schema=M.MEDIA_SCHEMA)


def test_media_index_cross_kind_classify_and_append(spark):
    """One index serves images, video AND audio: a PNG re-encode of an
    indexed BMP is exact (pixel md5), an MP4 re-container of an indexed
    MJPEG-AVI is exact (visual-temporal sig), a half-amplitude re-master
    of an indexed WAV is exact (amplitude-invariant spectral sig), a
    perturbed image is near, novel blobs are novel — and after
    append_media_batch, re-classifying the same batch flips every novel
    to exact_dup (the steady-state ingest loop)."""
    tone = np.round(8000 * np.sin(2 * np.pi * 40
                                  * np.arange(2048) / 8000)) \
        .astype(np.int16)
    corpus = _media_df(spark, [
        (0, M.encode_bmp(_pixels(0))),
        (1, M.encode_bmp(_pixels(1))),
        (2, M.encode_avi(_frames(2), 10, codec="MJPG", quality=75)),
        (3, M.encode_wav(tone, 8000)),
    ])
    idx = tempfile.mkdtemp(prefix="t_media_idx_")
    MI.build_media_index(corpus, idx)

    perturbed = _pixels(1)
    perturbed[8, 8, 0] ^= 1
    batch = _media_df(spark, [
        (100, M.encode_png(_pixels(0))),                 # image exact
        (101, M.encode_bmp(perturbed)),                  # image near
        (102, M.encode_mp4(_frames(2), 10, quality=75)),  # video exact
        (103, M.encode_wav((tone // 2).astype(np.int16), 8000)),  # audio
        (104, M.encode_bmp(_pixels(50))),                # novel image
        (105, b"definitely not media"),                  # corrupt
    ])
    got = {r["media_id"]: r for r in
           MI.classify_media_batch(spark, batch, idx).collect()}
    assert got[100]["verdict"] == "exact_dup" and got[100]["match_id"] == 0
    assert got[101]["verdict"] == "near_dup" and got[101]["match_id"] == 1
    assert got[102]["verdict"] == "exact_dup" and got[102]["match_id"] == 2
    assert got[103]["verdict"] == "exact_dup" and got[103]["match_id"] == 3
    assert got[104]["verdict"] == "novel" and got[104]["match_id"] is None
    assert got[105]["verdict"] == "novel" and got[105]["kind"] == "corrupt"

    # admit the novels, re-classify: everything now dups (corrupt blobs
    # dedup on their byte hash too)
    admitted = batch.join(
        MI.classify_media_batch(spark, batch, idx)
          .where("verdict = 'novel'").select("media_id"), "media_id")
    MI.append_media_batch(admitted, idx)
    again = {r["media_id"]: r for r in
             MI.classify_media_batch(spark, batch, idx).collect()}
    assert again[104]["verdict"] == "exact_dup" \
        and again[104]["match_id"] == 104
    assert again[105]["verdict"] == "exact_dup" \
        and again[105]["match_id"] == 105
    for mid in (100, 102, 103):
        assert again[mid]["verdict"] == "exact_dup"


def test_streaming_media_gate_admits_only_novel(spark):
    """Drain a media drop-directory stream through the gate: corpus
    duplicates (any container) are rejected, within-batch duplicate
    signatures collapse to one admit, novels land in the index — and a
    direct replay of the same batch admits nothing (idempotency)."""
    corpus = _media_df(spark, [
        (0, M.encode_bmp(_pixels(0))),
        (1, M.encode_avi(_frames(1), 10, codec="MJPG", quality=75)),
    ])
    idx = tempfile.mkdtemp(prefix="t_media_gate_idx_")
    MI.build_media_index(corpus, idx)

    drop = tempfile.mkdtemp(prefix="t_media_gate_drop_")
    batch = _media_df(spark, [
        (100, M.encode_png(_pixels(0))),          # corpus dup (re-encode)
        (101, M.encode_mp4(_frames(1), 10, quality=75)),  # re-container
        (102, M.encode_bmp(_pixels(7))),          # novel
        (103, M.encode_bmp(_pixels(7))),          # within-batch dup of 102
        (104, M.encode_bmp(_pixels(9))),          # novel
    ])
    batch.write.parquet(f"{drop}/media")
    schema = spark.read.parquet(f"{drop}/media").schema
    stream = (spark.readStream.schema(schema).format("parquet")
              .load(f"{drop}/media"))
    q = MI.streaming_media_gate(stream, idx, f"{drop}/cp")
    assert q.awaitTermination(300)

    ids = sorted(r["id"] for r in
                 spark.read.parquet(f"{idx}/sigs").collect())
    assert ids == [0, 1, 102, 104]

    # the whole batch now classifies as duplicate (103's twin 102 won)
    got = {r["media_id"]: r["verdict"] for r in
           MI.classify_media_batch(spark, batch, idx).collect()}
    assert got == {100: "exact_dup", 101: "exact_dup", 102: "exact_dup",
                   103: "exact_dup", 104: "exact_dup"}

    # at-least-once replay: the same blobs arrive again as new files —
    # the gate's anti-join on indexed ids admits nothing twice
    batch.write.mode("append").parquet(f"{drop}/media")
    q2 = MI.streaming_media_gate(stream, idx, f"{drop}/cp")
    assert q2.awaitTermination(300)
    ids2 = sorted(r["id"] for r in
                  spark.read.parquet(f"{idx}/sigs").collect())
    assert ids2 == ids


def _rand_frames(seed: int, n: int = 6, h: int = 16, w: int = 16):
    """n independent md5-chain random frames — cross-frame and
    cross-video aHash Hamming ~32, so near-tier matches are
    unambiguous (the structured _frames blocks all share one
    thresholded pattern and would collide)."""
    return np.stack([_pixels(seed * 1000 + f, h, w) for f in range(n)])


def test_media_index_video_near_tier(spark):
    """A RE-ENCODED video copy with one replaced frame breaks the
    exact visual-temporal string (per-frame pixel sums differ) but must
    classify near_dup via the banded per-frame-aHash tier (>= 80% of
    frame positions within max_hamming); a two-frame-replaced copy
    (4/6 < 80%) and a fully different video stay novel."""
    corpus = _media_df(spark, [
        (0, M.encode_avi(_rand_frames(1), 10)),
        (1, M.encode_avi(_rand_frames(2), 10)),
    ])
    idx = tempfile.mkdtemp(prefix="t_media_vnear_")
    MI.build_media_index(corpus, idx)

    one_off = _rand_frames(2).copy()
    one_off[3] = _pixels(999)              # replace one frame outright
    two_off = _rand_frames(1).copy()
    two_off[0] = _pixels(998)
    two_off[5] = _pixels(997)
    batch = _media_df(spark, [
        (100, M.encode_avi(one_off, 10)),   # 5/6 frames match → near
        (101, M.encode_avi(two_off, 10)),   # 4/6 < 80% → novel
        (102, M.encode_avi(_rand_frames(9), 10)),   # different → novel
    ])
    got = {r["media_id"]: r for r in
           MI.classify_media_batch(spark, batch, idx).collect()}
    assert got[100]["verdict"] == "near_dup" and got[100]["match_id"] == 1
    assert got[101]["verdict"] == "novel"
    assert got[102]["verdict"] == "novel"


def test_media_index_audio_near_tier(spark):
    """An audio EDIT (a few windows' content replaced) breaks the exact
    spectral string but must classify near_dup via the position tier
    (>= 80% of window positions keep their dominant bin); an edit
    touching half the clip, and a different tone sequence, stay novel."""
    def _tone_windows(freqs):
        # one 512-sample window per frequency step → one dominant bin
        # per window position
        t = np.arange(512) / 8000.0
        return np.concatenate([
            np.round(8000 * np.sin(2 * np.pi * f * t)).astype(np.int16)
            for f in freqs])

    base = [400 + 80 * (k % 7) for k in range(20)]     # 20 windows
    other = [440 + 80 * ((k + 3) % 7) for k in range(20)]
    corpus = _media_df(spark, [
        (0, M.encode_wav(_tone_windows(base), 8000)),
        (1, M.encode_wav(_tone_windows(other), 8000)),
    ])
    idx = tempfile.mkdtemp(prefix="t_media_anear_")
    MI.build_media_index(corpus, idx)

    near_edit = list(base)
    near_edit[7] = 1200                                 # 1/20 = 5% edited
    far_edit = [1200 + 160 * (k % 5) if k % 2 else base[k]
                for k in range(20)]                     # 50% edited
    batch = _media_df(spark, [
        (100, M.encode_wav(_tone_windows(near_edit), 8000)),
        (101, M.encode_wav(_tone_windows(far_edit), 8000)),
        (102, M.encode_wav(_tone_windows(
            [2000 + 80 * (k % 6) for k in range(20)]), 8000)),
    ])
    got = {r["media_id"]: r for r in
           MI.classify_media_batch(spark, batch, idx).collect()}
    assert got[100]["verdict"] == "near_dup" and got[100]["match_id"] == 0
    assert got[101]["verdict"] == "novel"
    assert got[102]["verdict"] == "novel"


def test_media_index_video_temporal_shift_near(spark):
    """Temporally EDITED video copies — a dropped intro frame and a
    prepended frame — shift every position index, so the offset-0 join
    alone would miss them; offset voting must classify both near_dup
    (matched positions cover >= 80% of the longer side at offsets +1
    and -1 respectively)."""
    frames = _rand_frames(2)                      # 6 frames
    corpus = _media_df(spark, [(1, M.encode_avi(frames, 10))])
    idx = tempfile.mkdtemp(prefix="t_media_vshift_")
    MI.build_media_index(corpus, idx)

    trimmed = frames[1:]                          # dropped intro frame
    prepended = np.concatenate([_rand_frames(77, n=1), frames])
    batch = _media_df(spark, [
        (100, M.encode_avi(trimmed, 10)),    # 5/6 at offset +1 → near
        (101, M.encode_avi(prepended, 10)),  # 6/7 at offset -1 → near
    ])
    got = {r["media_id"]: r for r in
           MI.classify_media_batch(spark, batch, idx).collect()}
    assert got[100]["verdict"] == "near_dup" and got[100]["match_id"] == 1
    assert got[101]["verdict"] == "near_dup" and got[101]["match_id"] == 1


def test_media_index_audio_trimmed_intro_near_and_offset_cap(spark):
    """A trimmed-intro audio copy (2 of 40 windows removed → every
    window shifts by +2) must classify near_dup via offset voting; a
    6-window trim has 85% coverage but sits BEYOND the ±4 offset cap,
    so it stays novel — the cap is what bounds the vote join."""
    def _tone_windows(freqs):
        t = np.arange(512) / 8000.0
        return np.concatenate([
            np.round(8000 * np.sin(2 * np.pi * f * t)).astype(np.int16)
            for f in freqs])

    # APERIODIC window sequence (period 37 > clip length): a periodic
    # one (k % 7) would self-align at offset trim−7 and legitimately
    # match — the cap assertion needs no alias offset inside ±4
    base = [400 + 40 * ((k * 17 + 5) % 37) for k in range(40)]
    corpus = _media_df(spark, [(0, M.encode_wav(_tone_windows(base),
                                                8000))])
    idx = tempfile.mkdtemp(prefix="t_media_ashift_")
    MI.build_media_index(corpus, idx)

    batch = _media_df(spark, [
        # 38/40 = 95% coverage at offset +2 → near
        (100, M.encode_wav(_tone_windows(base[2:]), 8000)),
        # 34/40 = 85% coverage but offset +6 > cap 4 → novel
        (101, M.encode_wav(_tone_windows(base[6:]), 8000)),
    ])
    got = {r["media_id"]: r for r in
           MI.classify_media_batch(spark, batch, idx).collect()}
    assert got[100]["verdict"] == "near_dup" and got[100]["match_id"] == 0
    assert got[101]["verdict"] == "novel"


def test_media_index_requires_meta(spark):
    df = _media_df(spark, [(0, M.encode_bmp(_pixels(0)))])
    with pytest.raises(ValueError, match="no media index"):
        MI.classify_media_batch(spark, df, tempfile.mkdtemp())


def test_media_index_rejects_bad_band_params(spark):
    df = _media_df(spark, [(0, M.encode_bmp(_pixels(0)))])
    with pytest.raises(ValueError, match="full recall"):
        MI.build_media_index(df, tempfile.mkdtemp(), bands=8,
                             max_hamming=8)


def test_media_index_rate_normalized_positions(spark):
    """Variable-RATE re-encodes: an fps-halved video copy and a
    resampled audio copy rescale every position, so offset voting alone
    misses them; canonical-rate position sampling must pair both with
    their sources. The audio resample reproduces the exact bin string
    (canonical-duration windows → rate-independent bin indices), so it
    lands exact_dup; the video's exact string still carries all frames,
    so the halved copy is near_dup."""
    frames20 = np.stack([_pixels(5000 + f) for f in range(12)])
    def _tone_at(freqs, rate):
        seg = rate // 8000 * 512
        t = np.arange(seg) / float(rate)
        return np.concatenate([
            np.round(8000 * np.sin(2 * np.pi * f * t)).astype(np.int16)
            for f in freqs])

    base = [400 + 40 * ((7 * k * k + k) % 83) for k in range(20)]
    corpus = _media_df(spark, [
        (0, M.encode_avi(frames20, 20)),          # 6 canonical positions
        (1, M.encode_wav(_tone_at(base, 8000), 8000)),
    ])
    idx = tempfile.mkdtemp(prefix="t_media_rate_")
    MI.build_media_index(corpus, idx)

    edited = list(base)
    edited[9] = 3900
    batch = _media_df(spark, [
        (100, M.encode_avi(frames20[0::2], 10)),  # fps-halved → near
        (101, M.encode_wav(_tone_at(base, 16000), 16000)),    # → exact
        (102, M.encode_wav(_tone_at(edited, 16000), 16000)),  # → near
    ])
    got = {r["media_id"]: r for r in
           MI.classify_media_batch(spark, batch, idx).collect()}
    assert got[100]["verdict"] == "near_dup" and got[100]["match_id"] == 0
    assert got[101]["verdict"] == "exact_dup" and got[101]["match_id"] == 1
    assert got[102]["verdict"] == "near_dup" and got[102]["match_id"] == 1


def test_media_signatures_survive_fps_zero_blob(spark):
    """decode_avi returns fps=0 when the strh rate header is absent —
    rate normalization must fall back to per-frame positions for that
    blob instead of failing the whole batch (the one-bad-blob
    contract)."""
    frames = np.stack([_pixels(7000 + f) for f in range(4)])
    blob = bytearray(M.encode_avi(frames, 10))
    i = bytes(blob).find(b"strh")
    assert i > 0
    blob[i:i + 4] = b"strX"          # obscure the stream header
    from dataweb_spark.functions.multimodal import decode_avi
    fps, back = decode_avi(bytes(blob))
    assert fps == 0 and back.shape[0] == 4   # precondition holds
    df = _media_df(spark, [(0, bytes(blob)),
                           (1, M.encode_avi(frames, 10))])
    rows = {r.id: r for r in MI.media_signatures(df).collect()}
    assert rows[0].kind == "video"
    assert len(rows[0].frame_sigs) == 4      # per-frame fallback
    assert rows[1].frame_sigs == rows[0].frame_sigs  # same pixels
