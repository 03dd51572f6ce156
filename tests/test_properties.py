"""Property-based tests (hypothesis) for the mapping/permission algebra —
the reference has only golden-string tests (SURVEY.md §5); these pin the
*semantics*: transformations round-trip through their inverses and compose
associatively when evaluated as real SQL (DuckDB as the evaluator), and the
permission algebra obeys set laws."""

from hypothesis import example, given, settings, strategies as st

import duckdb

from dataweb_spark.catalog.model import (
    SourcePermission, Transformation, effective_permission,
)

finite = st.floats(min_value=-1e6, max_value=1e6,
                   allow_nan=False, allow_infinity=False)
nonzero = finite.filter(lambda x: abs(x) > 1e-3)


def _lit(v: float) -> str:
    return f"cast({v!r} as double)"


def _eval(expr: str) -> float:
    return duckdb.sql(f"select cast(({expr}) as double)").fetchall()[0][0]


@st.composite
def linear_transform(draw):
    a = draw(nonzero)
    b = draw(finite)
    return Transformation(f"{{v}} * cast({a!r} as double) + cast({b!r} as double)",
                          f"({{v}} - cast({b!r} as double)) / cast({a!r} as double)"), a, b


@given(linear_transform(), finite)
@settings(max_examples=40, deadline=None)
def test_transformation_inverse_roundtrip(t_ab, v):
    t, a, b = t_ab
    forward = _eval(t.apply(_lit(v)))
    back = _eval(t.apply_inverse(_lit(forward)))
    assert abs(back - v) <= 1e-6 * max(1.0, abs(v), abs(forward) / max(abs(a), 1e-3))


@given(linear_transform(), linear_transform(), finite)
@settings(max_examples=40, deadline=None)
def test_transformation_compose_is_application(outer, inner, v):
    t2, _, _ = outer
    t1, _, _ = inner
    composed = t2.compose(t1)
    direct = _eval(t2.apply(f"({t1.apply(_lit(v))})"))
    via_compose = _eval(composed.apply(_lit(v)))
    assert abs(direct - via_compose) <= 1e-9 * max(1.0, abs(direct))


cols = st.frozensets(st.sampled_from(["a", "b", "c", "d", "e"]), max_size=5)


@given(cols, cols)
@settings(max_examples=50, deadline=None)
def test_permission_union_intersection_sets(c1, c2):
    p1 = SourcePermission(c1, "x > 1")
    p2 = SourcePermission(c2, "y < 2")
    assert p1.union(p2).allowed_columns == c1 | c2
    assert p1.intersection(p2).allowed_columns == c1 & c2


@given(cols, cols, cols)
@settings(max_examples=50, deadline=None)
def test_effective_permission_algebra(cd, cu, cr):
    """effective = default ∪ (user ∩ relay) — core/src/execute/mod.rs:148-196."""
    d = SourcePermission(cd, "d")
    u = SourcePermission(cu, "u")
    r = SourcePermission(cr, "r")
    eff = effective_permission(d, u, r)
    assert eff.allowed_columns == cd | (cu & cr)


@given(cols, cols)
@settings(max_examples=30, deadline=None)
def test_permission_row_predicate_structure(c1, c2):
    """Row filters combine as OR (union) / AND (intersection) —
    access_control.rs:127-143."""
    p1 = SourcePermission(c1, "x > 1")
    p2 = SourcePermission(c2, "y < 2")
    assert "OR" in p1.union(p2).allowed_rows.upper()
    assert "AND" in p1.intersection(p2).allowed_rows.upper()


# -- source-pruning soundness ----------------------------------------------
# source_can_match may only return False when NO value inside [lo, hi]
# satisfies the conjunct — otherwise pruning would drop real rows.

ops = st.sampled_from(["=", "<", "<=", ">", ">="])
ints = st.integers(min_value=-1000, max_value=1000)


def _holds(op: str, x: int, v: int) -> bool:
    return {"=": x == v, "<": x < v, "<=": x <= v,
            ">": x > v, ">=": x >= v}[op]


@given(ints, ints, ints, ops, ints)
@settings(max_examples=300, deadline=None)
def test_source_can_match_never_prunes_satisfiable(lo, hi, x, op, v):
    from dataweb_spark.plans.pruning import source_can_match
    lo, hi = min(lo, hi), max(lo, hi)
    can = source_can_match([("c", op, v)], {"c": (lo, hi)})
    if not can:
        # pruned -> no x in [lo, hi] may satisfy the predicate
        for probe in {lo, hi, x if lo <= x <= hi else lo,
                      max(lo, min(hi, v)),
                      max(lo, min(hi, v - 1)), max(lo, min(hi, v + 1))}:
            assert not _holds(op, probe, v), (lo, hi, op, v, probe)


@given(ints, ints, ops, ints)
@settings(max_examples=200, deadline=None)
def test_source_can_match_open_bounds_sound(lo, op, v, x):
    from dataweb_spark.plans.pruning import source_can_match
    # upper-open interval [lo, inf)
    if not source_can_match([("c", op, v)], {"c": (lo, None)}):
        probe = max(lo, x, v, v + 1)
        assert not _holds(op, probe, v)
    # lower-open interval (-inf, lo]
    if not source_can_match([("c", op, v)], {"c": (None, lo)}):
        probe = min(lo, x, v, v - 1)
        assert not _holds(op, probe, v)


# ---------------------------------------------------------------------------
# Raster codec round-trips: every (H, W, 3) uint8 array must survive
# encode → decode bit-exactly (BMP hits the 4-byte row-padding edge cases
# whenever W % 4 != 0; PPM has none but shares the harness).
# ---------------------------------------------------------------------------

import numpy as np

from dataweb_spark.functions import multimodal as M

dims = st.integers(min_value=1, max_value=23)


@settings(max_examples=40, deadline=None)
@given(h=dims, w=dims, seed=st.integers(min_value=0, max_value=2**31 - 1))
def test_bmp_roundtrip_property(h, w, seed):
    px = np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8)
    assert (M.decode_bmp(M.encode_bmp(px)) == px).all()


@settings(max_examples=40, deadline=None)
@given(h=dims, w=dims, seed=st.integers(min_value=0, max_value=2**31 - 1))
def test_ppm_roundtrip_property(h, w, seed):
    px = np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8)
    assert (M.decode_ppm(M.encode_ppm(px)) == px).all()


@settings(max_examples=40, deadline=None)
@given(h=dims, w=dims, seed=st.integers(min_value=0, max_value=2**31 - 1),
       ftype=st.integers(min_value=0, max_value=4))
def test_png_roundtrip_property(h, w, seed, ftype):
    """PNG survives encode → decode bit-exactly under every scanline
    filter type (None/Sub/Up/Average/Paeth), and agrees with the BMP
    codec on the same raster."""
    px = np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8)
    assert (M.decode_png(M.encode_png(px, filter_type=ftype)) == px).all()
    assert (M.decode_png(M.encode_png(px, filter_type=ftype))
            == M.decode_bmp(M.encode_bmp(px))).all()


@settings(max_examples=20, deadline=None)
@given(h=dims, w=dims, seed=st.integers(min_value=0, max_value=2**31 - 1))
def test_png_grey_and_alpha_decode(h, w, seed):
    """Greyscale PNGs decode replicated to 3 channels; RGBA drops alpha."""
    rng = np.random.default_rng(seed)
    g = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    assert (M.decode_png(M.encode_png(g, filter_type=2))
            == np.repeat(g[:, :, None], 3, axis=2)).all()
    a = rng.integers(0, 256, size=(h, w, 4), dtype=np.uint8)
    assert (M.decode_png(M.encode_png(a, filter_type=4))
            == a[:, :, :3]).all()


@settings(max_examples=30, deadline=None)
@given(n=st.integers(min_value=1, max_value=6), h=dims, w=dims,
       seed=st.integers(min_value=0, max_value=2**31 - 1),
       fps=st.integers(min_value=1, max_value=60))
def test_avi_roundtrip_property(n, h, w, seed, fps):
    """Every (N, H, W, 3) uint8 frame stack survives AVI encode → decode
    bit-exactly, with fps preserved (odd widths hit DIB row padding)."""
    fr = np.random.default_rng(seed).integers(
        0, 256, size=(n, h, w, 3), dtype=np.uint8)
    got_fps, back = M.decode_avi(M.encode_avi(fr, fps=fps))
    assert got_fps == fps
    assert back.shape == fr.shape and (back == fr).all()


@settings(max_examples=25, deadline=None)
@given(bw=st.integers(min_value=1, max_value=4),
       bh=st.integers(min_value=1, max_value=4),
       seed=st.integers(min_value=0, max_value=2**31 - 1))
def test_jpeg_constant_blocks_roundtrip_exact(bw, bh, seed):
    """Constant-grey 8×8 blocks survive the baseline JPEG codec
    BIT-EXACTLY at quality 75: the DCT of a constant block is DC-only,
    the q75 luma DC step (8) divides ``8*(v-128)`` for every integer v,
    and grey pixels pin both chroma planes to 128 — the property the
    ``multimodal_jpeg_features`` oracle is built on."""
    vals = np.random.default_rng(seed).integers(0, 256, size=(bh, bw))
    px = np.repeat(np.repeat(vals, 8, 0), 8, 1).astype(np.uint8)
    rgb = np.repeat(px[:, :, None], 3, 2)
    assert (M.decode_jpeg(M.encode_jpeg(rgb, quality=75)) == rgb).all()
    # single-component greyscale stream too
    grey = M.decode_jpeg(M.encode_jpeg(px, quality=75))
    assert (grey == rgb).all()


@settings(max_examples=25, deadline=None)
@given(h=st.integers(min_value=1, max_value=40),
       w=st.integers(min_value=1, max_value=40),
       seed=st.integers(min_value=0, max_value=2**31 - 1),
       ri=st.integers(min_value=0, max_value=6),
       sub=st.sampled_from(["444", "420"]))
def test_jpeg_subsampling_and_restarts_decode_identically(h, w, seed, ri,
                                                          sub):
    """4:2:0 subsampling and restart intervals change the BITSTREAM, not
    the decode: the same raster encoded with/without RSTn markers decodes
    to identical pixels (restart path = byte-align + DC reset only), and
    4:2:0 streams exercise the decoder's chroma-upsample path with exact
    dimensions on non-MCU-multiple edges."""
    rng = np.random.default_rng(seed)
    a, b = rng.integers(0, 4, size=2)
    x = np.arange(w).reshape(1, w, 1)
    y = np.arange(h).reshape(h, 1, 1)
    ch = np.arange(3).reshape(1, 1, 3)
    px = ((a * x + b * y + 25 * ch) % 256).astype(np.uint8)
    plain = M.decode_jpeg(M.encode_jpeg(px, 90, subsampling=sub))
    assert plain.shape == (h, w, 3)
    if ri:
        with_rst = M.decode_jpeg(
            M.encode_jpeg(px, 90, subsampling=sub, restart_interval=ri))
        assert (with_rst == plain).all()


@settings(max_examples=15, deadline=None)
@given(n=st.integers(min_value=1, max_value=4),
       bw=st.integers(min_value=1, max_value=3),
       bh=st.integers(min_value=1, max_value=3),
       fps=st.integers(min_value=1, max_value=30),
       seed=st.integers(min_value=0, max_value=2**31 - 1))
def test_mjpeg_avi_constant_blocks_roundtrip_exact(n, bw, bh, fps, seed):
    """Motion-JPEG AVI (every frame an independent baseline JPEG inside
    the RIFF container) roundtrips constant-grey-block frames bit-exactly
    at quality 75, with fps and frame count preserved."""
    vals = np.random.default_rng(seed).integers(0, 256, size=(n, bh, bw))
    px = np.repeat(np.repeat(vals, 8, 1), 8, 2)
    frames = np.repeat(px[:, :, :, None], 3, 3).astype(np.uint8)
    got_fps, back = M.decode_avi(
        M.encode_avi(frames, fps=fps, codec="MJPG", quality=75))
    assert got_fps == fps
    assert back.shape == frames.shape and (back == frames).all()


@settings(max_examples=15, deadline=None)
@given(n=st.integers(min_value=1, max_value=6),
       bw=st.integers(min_value=1, max_value=3),
       bh=st.integers(min_value=1, max_value=3),
       fps=st.integers(min_value=1, max_value=30),
       k=st.integers(min_value=1, max_value=5),
       fast=st.booleans(),
       seed=st.integers(min_value=0, max_value=2**31 - 1))
def test_mp4_roundtrip_property(n, bw, bh, fps, k, fast, seed):
    """ISO BMFF MP4 (Motion-JPEG track) roundtrips constant-grey-block
    frames bit-exactly at quality 75 across every chunk layout — n below
    / equal to / above samples_per_chunk, with and without a partial tail
    chunk, mdat-first AND faststart (moov-first) box orders — with fps
    and frame count preserved through the stts/stsc/stsz/stco sample
    tables."""
    vals = np.random.default_rng(seed).integers(0, 256, size=(n, bh, bw))
    px = np.repeat(np.repeat(vals, 8, 1), 8, 2)
    frames = np.repeat(px[:, :, :, None], 3, 3).astype(np.uint8)
    blob = M.encode_mp4(frames, fps=fps, quality=75, samples_per_chunk=k,
                        faststart=fast)
    got_fps, back = M.decode_mp4(blob)
    assert got_fps == fps
    assert back.shape == frames.shape and (back == frames).all()
    # container sniffing picks the right decoder for both families
    got_fps2, back2 = M.decode_video(blob)
    assert got_fps2 == fps and (back2 == frames).all()


def test_mp4_foreign_writer_tolerance():
    """Files from other muxers carry extra boxes and 64-bit offset
    tables: stray free/udta siblings are skipped, a co64 (64-bit) chunk
    offset table decodes like stco, and non-MJPEG codec fourccs raise
    NotImplementedError (not a crash) naming the codec."""
    import struct

    frames = np.full((3, 8, 16, 3), 77, dtype=np.uint8)
    blob = M.encode_mp4(frames, fps=10, samples_per_chunk=2)

    # inject a top-level free box between mdat and moov
    moov_at = blob.index(b"moov") - 4
    free = struct.pack(">I", 16) + b"free" + b"\x00" * 8
    padded = blob[:moov_at] + free + blob[moov_at:]
    fps, back = M.decode_mp4(padded)
    assert fps == 10 and (back == frames).all()

    # rewrite stco as co64 (same offsets, 8-byte entries)
    at = blob.index(b"stco") - 4
    (size,) = struct.unpack_from(">I", blob, at)
    (n_chunks,) = struct.unpack_from(">I", blob, at + 12)
    offs = struct.unpack_from(f">{n_chunks}I", blob, at + 16)
    co64 = (struct.pack(">I", 16 + 8 * n_chunks) + b"co64"
            + b"\x00" * 4 + struct.pack(">I", n_chunks)
            + b"".join(struct.pack(">Q", o) for o in offs))
    grown = len(co64) - size

    def bump(buf, fourcc, delta):
        i = buf.index(fourcc) - 4
        (s,) = struct.unpack_from(">I", buf, i)
        return buf[:i] + struct.pack(">I", s + delta) + buf[i + 4:]

    v = blob[:at] + co64 + blob[at + size:]
    for outer in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
        v = bump(v, outer, grown)
    fps, back = M.decode_mp4(v)
    assert fps == 10 and (back == frames).all()

    # foreign codec fourcc -> loud NotImplementedError
    avc = blob.replace(b"jpeg", b"avc1", 1)
    try:
        M.decode_mp4(avc)
        raise AssertionError("avc1 should not decode")
    except NotImplementedError as e:
        assert "avc1" in str(e)


def test_media_probe_header_only():
    """media_probe must read ONLY headers: streams truncated to just
    their metadata (WAV cut at the data-chunk header, AVI cut before
    movi, faststart MP4 cut at mdat) still probe fully — the property
    that makes a 100-TB catalog scan IO-bound on headers, not payloads.
    Both MP4 layouts decode identically; garbage raises ValueError."""
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (2, 3))
    fr = np.repeat(np.repeat(np.repeat(px, 8, 0), 8, 1)[None, :, :, None],
                   3, 3).astype(np.uint8)
    fr = np.repeat(fr, 5, 0)

    for fast in (False, True):
        blob = M.encode_mp4(fr, fps=10, faststart=fast)
        fps, out = M.decode_mp4(blob)
        assert fps == 10 and (out == fr).all()
        m = M.media_probe(blob)
        assert (m["kind"], m["n_frames"], m["width"], m["height"]) \
            == ("video", 5, 24, 16)

    fast_blob = M.encode_mp4(fr, fps=10, faststart=True)
    truncated = fast_blob[:fast_blob.index(b"mdat") - 4]
    assert M.media_probe(truncated)["n_frames"] == 5

    wav = M.encode_wav(np.arange(3000).astype(np.int16), 8000)
    assert M.media_probe(wav[:52])["n_samples"] == 3000

    avi = M.encode_avi(fr, 10)
    cut = avi[:avi.index(b"movi") - 8]
    assert M.media_probe(cut)["n_frames"] == 5

    flac = M.encode_flac(np.arange(2000).astype(np.int16), 16000)
    m = M.media_probe(flac[:42])
    assert m["n_samples"] == 2000 and m["sample_rate"] == 16000

    for bad in (b"", b"garbage bytes here", b"\x00" * 64):
        try:
            M.media_probe(bad)
            raise AssertionError("garbage probed")
        except (ValueError, IndexError):
            pass


@settings(max_examples=25, deadline=None)
@given(n=st.integers(min_value=1, max_value=9000),
       ch=st.integers(min_value=1, max_value=2),
       seed=st.integers(min_value=0, max_value=2**31 - 1),
       rate=st.sampled_from([8000, 16000, 44100]),
       smooth=st.booleans())
def test_flac_roundtrip_property(n, ch, seed, rate, smooth):
    """Every int16 signal — smooth random walks (fixed predictors win)
    and white noise (verbatim fallback) — survives FLAC encode → decode
    bit-exactly, across frame boundaries, partial tail blocks, and both
    channel counts; sample rate is preserved via STREAMINFO."""
    rng = np.random.default_rng(seed)
    if smooth:
        x = rng.integers(-300, 300, (n, ch)).cumsum(axis=0)
        x = np.clip(x, -32768, 32767).astype(np.int16)
    else:
        x = rng.integers(-32768, 32768, (n, ch)).astype(np.int16)
    blob = M.encode_flac(x, rate, block_size=1024)
    got_rate, back = M.decode_flac(blob)
    assert got_rate == rate
    assert back.shape == x.shape and (back == x).all()
    if smooth and n > 2048:
        assert len(blob) < x.nbytes    # predictors actually compress


def test_flac_utf8_number_minimal_and_roundtrips():
    """FLAC frame/sample numbers must use the MINIMAL UTF-8-style byte
    count — an encoding with n continuation bytes carries 6+5n payload
    bits, and strict external decoders reject overlong forms (the old
    6+4n threshold emitted 1024 as 3 bytes instead of 2). Assert exact
    byte counts at every boundary and bit-exact round-trip."""
    from dataweb_spark.functions.multimodal import _flac_utf8_number

    def decode(b: bytes) -> int:
        lead = b[0]
        if lead < 0x80:
            assert len(b) == 1
            return lead
        extra = 0
        while extra < 7 and lead & (0x80 >> extra):
            extra += 1
        assert len(b) == extra          # lead + (extra-1) continuations
        v = lead & (0xFF >> (extra + 1))
        for c in b[1:]:
            assert c & 0xC0 == 0x80     # valid continuation byte
            v = (v << 6) | (c & 0x3F)
        return v

    assert _flac_utf8_number(1024) == b"\xd0\x80"   # 2 bytes, not 3
    for v, nbytes in [(0, 1), (0x7F, 1), (0x80, 2), (1024, 2),
                      (2**11 - 1, 2), (2**11, 3), (2**16 - 1, 3),
                      (2**16, 4), (2**21 - 1, 4), (2**21, 5),
                      (2**26 - 1, 5), (2**26, 6), (2**31 - 1, 6),
                      (2**31, 7), (2**36 - 1, 7)]:
        b = _flac_utf8_number(v)
        assert len(b) == nbytes, (v, b.hex())
        assert decode(b) == v


@settings(max_examples=30, deadline=None)
@given(seed=st.integers(min_value=0, max_value=2**31 - 1),
       flip=st.integers(min_value=0, max_value=10**9))
def test_flac_corruption_never_crashes(seed, flip):
    """A random byte-flip anywhere in a FLAC stream either fails loudly
    (ValueError / NotImplementedError — CRCs, MD5, sync, reserved codes)
    or still decodes; it never crashes or hangs the kernel."""
    rng = np.random.default_rng(seed)
    x = rng.integers(-500, 500, 700).cumsum().astype(np.int16)
    blob = bytearray(M.encode_flac(x, 8000, block_size=256))
    blob[flip % len(blob)] ^= 1 + (flip % 255)
    try:
        M.decode_flac(bytes(blob))
    except (ValueError, NotImplementedError, IndexError):
        pass


def test_flac_stereo_decorrelation_compresses_and_roundtrips():
    """The encoder's per-frame channel-assignment search: dual-mono
    collapses to ~half (side channel constant 0), correlated stereo
    beats independent coding, uncorrelated noise never regresses — and
    every mode round-trips bit-exactly through the decoder's four
    stereo reconstructions."""
    rng = np.random.default_rng(9)
    t = np.arange(6000)
    left = np.round(9000 * np.sin(t / 40)).astype(np.int64)
    right = left + rng.integers(-50, 50, len(t))
    corr = np.stack([left, right], 1).astype(np.int16)
    auto = M.encode_flac(corr, 44100)
    indep = M.encode_flac(corr, 44100, stereo="indep")
    assert (M.decode_flac(auto)[1] == corr).all()
    assert (M.decode_flac(indep)[1] == corr).all()
    assert len(auto) < len(indep)

    dual = np.stack([left, left], 1).astype(np.int16)
    a2 = M.encode_flac(dual, 8000)
    assert (M.decode_flac(a2)[1] == dual).all()
    assert len(a2) < 0.6 * len(M.encode_flac(dual, 8000, stereo="indep"))

    noise = rng.integers(-32768, 32768, (4000, 2)).astype(np.int16)
    a3 = M.encode_flac(noise, 8000)
    assert (M.decode_flac(a3)[1] == noise).all()
    assert len(a3) <= len(M.encode_flac(noise, 8000, stereo="indep"))


def _craft_flac(channels, bs, ch_code, write_subframes):
    """Hand-mux a single-frame FLAC stream the way a foreign encoder
    would: STREAMINFO (zero MD5 → decoder skips the hash check), frame
    header with an 8-bit blocksize field, caller-supplied subframes."""
    import struct
    bw = M._FlacBitWriter()
    bw.write(1, 1); bw.write(0, 7); bw.write(34, 24)
    bw.write(bs, 16); bw.write(bs, 16)
    bw.write(0, 24); bw.write(0, 24)
    bw.write(8000, 20); bw.write(channels - 1, 3); bw.write(15, 5)
    bw.write(0, 4); bw.write(bs, 32)
    out = [b"fLaC", bw.bytes() + b"\x00" * 16]

    hdr = M._FlacBitWriter()
    hdr.write(0b11111111111110, 14); hdr.write(0, 1); hdr.write(0, 1)
    hdr.write(0b0110, 4)            # 8-bit blocksize-1 field follows
    hdr.write(0, 4)                 # sample rate from STREAMINFO
    hdr.write(ch_code, 4)
    hdr.write(0b100, 3); hdr.write(0, 1)
    hdr.write(0, 8)                 # frame number 0
    hdr.write(bs - 1, 8)
    hbytes = hdr.bytes()
    hbytes += bytes([M._crc8_flac(hbytes)])

    body = M._FlacBitWriter()
    for b in hbytes:
        body.write(b, 8)
    write_subframes(body)
    fbytes = body.bytes()
    out.append(fbytes + struct.pack(">H", M._crc16_flac(fbytes)))
    return b"".join(out)


def test_flac_foreign_writer_surface():
    """Decoder features our encoder never emits, hand-muxed as a foreign
    writer would: left-side and mid-side stereo decorrelation (17-bit
    side channel), rice method 1 (5-bit params), escaped raw-bit
    partitions, and wasted-bits shifting — each must reconstruct the
    exact samples."""
    left = np.array([100, -5, 327, 4, 8, -1000, 77, 3], dtype=np.int64)
    right = np.array([90, 0, -327, 4, 1, 500, -77, 2], dtype=np.int64)
    side = left - right
    mid = (left + right) >> 1

    def verbatim(body, samples, cbps):
        body.write(0, 1); body.write(0b000001, 6); body.write(0, 1)
        for v in samples:
            body.write(int(v) & ((1 << cbps) - 1), cbps)

    # left-side: sub0 = left @16, sub1 = side @17
    blob = _craft_flac(2, 8, 8, lambda b: (verbatim(b, left, 16),
                                           verbatim(b, side, 17)))
    _sr, back = M.decode_flac(blob)
    assert (back[:, 0] == left).all() and (back[:, 1] == right).all()

    # right-side: sub0 = side @17, sub1 = right @16
    blob = _craft_flac(2, 8, 9, lambda b: (verbatim(b, side, 17),
                                           verbatim(b, right, 16)))
    _sr, back = M.decode_flac(blob)
    assert (back[:, 0] == left).all() and (back[:, 1] == right).all()

    # mid-side: sub0 = mid @16, sub1 = side @17
    blob = _craft_flac(2, 8, 10, lambda b: (verbatim(b, mid, 16),
                                            verbatim(b, side, 17)))
    _sr, back = M.decode_flac(blob)
    assert (back[:, 0] == left).all() and (back[:, 1] == right).all()

    # rice method 1 + FIXED order 0 (mono): residuals ARE the samples
    vals = np.array([0, -1, 3, -7, 2, 100, -64, 5], dtype=np.int64)

    def rice1(body):
        body.write(0, 1); body.write(0b001000, 6); body.write(0, 1)
        body.write(1, 2)            # method 1: 5-bit rice params
        body.write(0, 4)            # partition order 0
        body.write(3, 5)            # param 3
        for v in vals:
            u = (int(v) << 1) ^ (int(v) >> 63)
            for _ in range(u >> 3):
                body.write(0, 1)
            body.write(1, 1)
            body.write(u & 7, 3)

    _sr, back = M.decode_flac(_craft_flac(1, 8, 0, rice1))
    assert (back[:, 0] == vals).all()

    # escaped partition: raw 12-bit residuals, FIXED order 0
    def escaped(body):
        body.write(0, 1); body.write(0b001000, 6); body.write(0, 1)
        body.write(0, 2); body.write(0, 4)
        body.write(0b1111, 4)       # method-0 escape
        body.write(12, 5)           # raw bit width
        for v in vals:
            body.write(int(v) & 0xFFF, 12)

    _sr, back = M.decode_flac(_craft_flac(1, 8, 0, escaped))
    assert (back[:, 0] == vals).all()

    # LPC subframe (what real encoders emit by default): order 2,
    # coeffs [3, -1], shift 1 — x[i] = res[i] + ((3*x[i-1] - x[i-2]) >> 1)
    warm = [100, 120]
    residuals = [5, -3, 0, 7, -20, 2]
    expect = list(warm)
    for r in residuals:
        acc = 3 * expect[-1] - 1 * expect[-2]
        expect.append(r + (acc >> 1))

    def lpc(body):
        body.write(0, 1)
        body.write(0b100000 | (2 - 1), 6)   # LPC, order 2
        body.write(0, 1)
        for v in warm:
            body.write(v & 0xFFFF, 16)
        body.write(4 - 1, 4)                # coefficient precision 4
        body.write(1, 5)                    # quantization shift 1
        body.write(3 & 0xF, 4)              # c0 = 3
        body.write(-1 & 0xF, 4)             # c1 = -1
        body.write(0, 2); body.write(0, 4)  # rice method 0, 1 partition
        body.write(0b1111, 4)               # escaped partition
        body.write(16, 5)                   # raw 16-bit residuals
        for r in residuals:
            body.write(r & 0xFFFF, 16)

    _sr, back = M.decode_flac(_craft_flac(1, 8, 0, lpc))
    assert back[:, 0].tolist() == expect

    # wasted bits: all samples share a factor of 4 -> shift of 2
    shifted = vals * 4

    def wasted(body):
        body.write(0, 1); body.write(0b000001, 6)
        body.write(1, 1)            # wasted-bits flag
        body.write(0, 1); body.write(1, 1)   # unary 1 -> wasted = 2
        for v in vals:
            body.write(int(v) & 0x3FFF, 14)  # cbps = 16 - 2
    _sr, back = M.decode_flac(_craft_flac(1, 8, 0, wasted))
    assert (back[:, 0] == shifted).all()


@settings(max_examples=25, deadline=None)
@example(h=34, w=40, seed=55, quality=70)  # r12: the wrap case, pinned
@given(h=st.integers(min_value=1, max_value=40),
       w=st.integers(min_value=1, max_value=40),
       seed=st.integers(min_value=0, max_value=2**31 - 1),
       quality=st.integers(min_value=70, max_value=100))
def test_jpeg_smooth_image_bounded_error(h, w, seed, quality):
    """General (smooth) rasters are lossy but bounded: a low-frequency
    image decodes within a small per-pixel error at quality ≥70, with
    exact dimensions (incl. non-multiple-of-8 edges).

    The ramp is CLIPPED at 255, not taken mod 256: `% 256` let slopes
    3+3 wrap 256→0 at h/w near 40, and a hard 255→0 edge inside one
    8×8 block rings ~111 at q70 — correct lossy-codec behavior, not a
    smooth image (hypothesis found the wrap after four rounds of green
    runs; the old fixture family was smooth for every earlier draw).
    Clipping keeps the family piecewise-linear with a saturation
    plateau, which the DCT reproduces within the tight bound."""
    rng = np.random.default_rng(seed)
    a, b, c = rng.integers(0, 4, size=3)
    x = np.arange(w).reshape(1, w, 1)
    y = np.arange(h).reshape(h, 1, 1)
    ch = np.arange(3).reshape(1, 1, 3)
    px = np.clip(a * x + b * y + 20 * ch, 0, 255).astype(np.uint8)
    back = M.decode_jpeg(M.encode_jpeg(px, quality=quality))
    assert back.shape == (h, w, 3)
    err = np.abs(back.astype(int) - px.astype(int))
    assert err.max() <= 24, err.max()


@settings(max_examples=20, deadline=None)
@given(seed=st.integers(min_value=0, max_value=2**31 - 1))
def test_jpeg_dc_thumbnail_signature_equals_full_decode(seed):
    """On 64-multiple dims (aHash grid cell == one JPEG block) with the
    DC-exact constant-block family, the DC-only thumbnail signature
    equals the full-decode signature bit-for-bit — the contract that
    lets the bulk-dedup sweep skip the IDCT entirely."""
    vals = np.random.default_rng(seed).integers(0, 256, size=(8, 8))
    px = np.repeat(np.repeat(vals, 8, 0), 8, 1).astype(np.uint8)
    rgb = np.repeat(px[:, :, None], 3, 2)
    enc = M.encode_jpeg(rgb, quality=75)
    full_sig = M._ahash64_exact(M.decode_jpeg(enc))
    dc_sig = M._ahash64_exact(M.decode_jpeg_dc_thumbnail(enc))
    assert full_sig == dc_sig
    # thumbnail itself is exactly the block-value grid on this family
    assert (M.decode_jpeg_dc_thumbnail(enc)
            == np.repeat(vals.astype(np.uint8)[:, :, None], 3, 2)).all()


@settings(max_examples=30, deadline=None)
@given(h=st.integers(min_value=1, max_value=40),
       w=st.integers(min_value=1, max_value=40),
       seed=st.integers(min_value=0, max_value=2**31 - 1),
       sub=st.sampled_from(["444", "420"]))
def test_jpeg_dc_thumbnail_matches_blockwise_mean(h, w, seed, sub):
    """The DC thumbnail approximates the blockwise mean of the full
    decode within quantization error on smooth rasters, at ceil(dim/8)
    resolution, for both subsampling layouts."""
    rng = np.random.default_rng(seed)
    a, b = rng.integers(0, 4, size=2)
    x = np.arange(w).reshape(1, w, 1)
    y = np.arange(h).reshape(h, 1, 1)
    ch = np.arange(3).reshape(1, 1, 3)
    px = ((a * x + b * y + 25 * ch) % 256).astype(np.uint8)
    enc = M.encode_jpeg(px, 90, subsampling=sub)
    th = M.decode_jpeg_dc_thumbnail(enc)
    assert th.shape == (-(-h // 8), -(-w // 8), 3)
    meta = M.jpeg_meta(enc)
    assert (meta["width"], meta["height"]) == (w, h)
    assert meta["sampling"] == (sub if sub == "420" else "444")


@settings(max_examples=100, deadline=None)
@given(buf=st.binary(max_size=150))
def test_jpeg_decoder_garbage_never_crashes(buf):
    """Arbitrary bytes → ValueError/NotImplementedError only (the decode
    kernels run inside executors; unhandled exception types would fail
    whole tasks on corrupt inputs instead of being classifiable)."""
    try:
        M.decode_jpeg(b"\xff\xd8" + buf)
    except (ValueError, NotImplementedError):
        pass
    try:
        M.decode_jpeg(buf)
    except (ValueError, NotImplementedError):
        pass


@settings(max_examples=30, deadline=None)
@given(n=st.integers(min_value=0, max_value=5000),
       ch=st.integers(min_value=1, max_value=2),
       factor=st.integers(min_value=2, max_value=8),
       seed=st.integers(min_value=0, max_value=2**31 - 1))
def test_audio_resample_floor_mean_property(n, ch, factor, seed):
    """Decimation contract, checked sample-by-sample against a naive
    loop: output j = floor(mean(input[j*f:(j+1)*f])) per channel
    (floor toward -inf, negatives included), tail partial group
    dropped, identical whether the input container is WAV or FLAC."""
    rng = np.random.default_rng(seed)
    x = rng.integers(-32768, 32768, (n, ch)).astype(np.int16)
    expect = np.array(
        [[int(np.floor(x[j * factor:(j + 1) * factor, c]
                       .astype(np.int64).mean())) for c in range(ch)]
         for j in range(n // factor)], dtype=np.int16) \
        .reshape(n // factor, ch)

    for blob in (M.encode_wav(x, 8000), M.encode_flac(x, 8000)):
        rate, samples = M.decode_audio(blob)
        m = samples.shape[0] - samples.shape[0] % factor
        grouped = samples[:m].astype(np.int64) \
            .reshape(-1, factor, samples.shape[1])
        out = np.floor_divide(grouped.sum(axis=1), factor) \
            .astype(np.int16)
        assert out.shape == expect.shape and (out == expect).all()


@settings(max_examples=60, deadline=None)
@given(buf=st.binary(min_size=0, max_size=400))
def test_mp4_flac_decoders_garbage_never_crashes(buf):
    """Arbitrary bytes — bare, and wearing each container's magic —
    raise only ValueError/NotImplementedError from the MP4 and FLAC
    decoders and the media probe (classifiable per-row failures, never
    task-killing exception types). IndexError is additionally tolerated
    from media_probe's fixed-offset header reads."""
    for data in (buf,
                 b"\x00\x00\x00\x14ftypisom" + buf,
                 b"fLaC" + buf,
                 b"RIFF" + buf[:4] + b"AVI " + buf,
                 b"RIFF" + buf[:4] + b"WAVE" + buf):
        try:
            M.decode_mp4(data)
        except (ValueError, NotImplementedError):
            pass
        try:
            M.decode_flac(data)
        except (ValueError, NotImplementedError):
            pass
        try:
            M.media_probe(data)
        except (ValueError, NotImplementedError, IndexError):
            pass


@settings(max_examples=30, deadline=None)
@given(h=dims, w=dims, seed=st.integers(min_value=0, max_value=2**31 - 1),
       tw=st.integers(min_value=1, max_value=8),
       th=st.integers(min_value=1, max_value=8))
def test_resize_box_mean_property(h, w, seed, tw, th):
    """The integral-image resize kernel (_box_resize, the exact math
    resize_media runs per blob) equals a naive per-cell floor-of-mean over
    the same boxes, for downscale AND upscale shapes."""
    px = np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8)
    got = M._box_resize(px, tw, th)
    x0 = np.arange(tw) * w // tw
    x1 = np.maximum((np.arange(tw) + 1) * w // tw, x0 + 1)
    y0 = np.arange(th) * h // th
    y1 = np.maximum((np.arange(th) + 1) * h // th, y0 + 1)
    for Y in range(th):
        for X in range(tw):
            box = px[y0[Y]:y1[Y], x0[X]:x1[X]].astype(np.int64)
            want = box.reshape(-1, 3).sum(0) // (box.shape[0] * box.shape[1])
            assert (got[Y, X] == want).all()


# ---------------------------------------------------------------------------
# Bloom filter: no false negatives, ever — for ANY member set and fp target,
# every inserted (h1, h2) pair must test positive against the built bits.
# ---------------------------------------------------------------------------

from dataweb_spark.functions.dedup import _bloom_build, _bloom_params

h64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@settings(max_examples=60, deadline=None)
@given(pairs=st.lists(st.tuples(h64, h64), min_size=1, max_size=200),
       fpp=st.sampled_from([1e-2, 1e-4, 1e-8]))
def test_bloom_never_false_negative(pairs, fpp):
    m, k = _bloom_params(len(pairs), fpp)
    bits = _bloom_build(pairs, m, k)
    h1 = np.asarray([p[0] for p in pairs], dtype=np.int64).view(np.uint64)
    h2 = np.asarray([p[1] for p in pairs], dtype=np.int64).view(np.uint64)
    hit = np.ones(len(pairs), dtype=bool)
    for i in range(k):
        pos = (h1 + np.uint64(i) * h2) % np.uint64(m)
        byte = bits[(pos >> np.uint64(3)).astype(np.int64)]
        hit &= (byte >> (pos & np.uint64(7)).astype(np.uint8)) & 1 == 1
    assert hit.all()


# ---------------------------------------------------------------------------
# Invertible-conjunct pushdown: the pushed physical-namespace bounds must be
# a SUPERSET of the rows the entity-namespace predicate keeps (Inexact
# semantics: over-fetch is re-filtered locally; under-fetch is wrong).
# ---------------------------------------------------------------------------

_ops = {"=": lambda x, y: x == y, "<": lambda x, y: x < y,
        "<=": lambda x, y: x <= y, ">": lambda x, y: x > y,
        ">=": lambda x, y: x >= y}

small = st.floats(min_value=-1e6, max_value=1e6,
                  allow_nan=False, allow_infinity=False)
small_nz = small.filter(lambda x: abs(x) > 1e-6)


@given(a=small_nz, b=small, value=small, x=small,
       op=st.sampled_from(list(_ops)))
@settings(max_examples=300, deadline=None)
def test_push_conjunct_never_drops_matching_rows(a, b, value, x, op):
    t = Transformation(f"{{v}} * {a!r} + {b!r}",
                       f"({{v}} - {b!r}) / {a!r}")
    pushed = t.push_conjunct(op, value)
    assert pushed is not None, "plain affine template must be invertible"
    fx = x * a + b  # engine-side float evaluation of the forward transform
    if _ops[op](fx, value):
        for o2, v2 in pushed:
            assert _ops[o2](x, v2), (
                f"pushed bound drops a matching row: x={x!r} f(x)={fx!r} "
                f"{op} {value!r} but fails {o2} {v2!r}")


def test_push_conjunct_summand_dominated_equality_regression():
    """Hypothesis-found r11 soundness corner: b dominates a*x, so EVERY
    |x| below ~ulp(b)/(2a) satisfies f(x)==value exactly in engine
    floats — the pushed '=' range must admit all of them."""
    a, b = 6.103515625e-05, 131072.0
    t = Transformation(f"{{v}} * {a!r} + {b!r}", "")
    pushed = t.push_conjunct("=", 131072.0)
    ops = {">=": lambda x, v: x >= v, "<=": lambda x, v: x <= v}
    for x in (1.192092896e-07, -1.192092896e-07, 2.4e-07, 0.0):
        if x * a + b == 131072.0:  # engine-float match
            assert all(ops[o](x, v) for o, v in pushed), x


@given(a=small_nz, b=small, value=small,
       op=st.sampled_from(["<", "<=", ">", ">="]))
@settings(max_examples=150, deadline=None)
def test_push_conjunct_bounds_are_tight(a, b, value, op):
    """The widened bound must stay within ~2e-9 relative of the exact
    inverse boundary — over-fetch is bounded, not unbounded."""
    from fractions import Fraction
    t = Transformation(f"{{v}} * {a!r} + {b!r}", "")
    [(o2, v2)] = t.push_conjunct(op, value)
    p = (Fraction(value) - Fraction(b)) / Fraction(a)
    width = abs(Fraction(v2) - p)
    summand_scale = ((abs(Fraction(value)) + abs(Fraction(b)))
                     / abs(Fraction(a)))
    assert width <= Fraction(2, 10**9) * max(abs(p), Fraction(1),
                                             summand_scale)


wav_n = st.integers(min_value=1, max_value=500)
wav_ch = st.integers(min_value=1, max_value=2)


@settings(max_examples=40, deadline=None)
@given(n=wav_n, ch=wav_ch, seed=st.integers(min_value=0, max_value=2**31 - 1),
       rate=st.sampled_from([8000, 16000, 44100]))
def test_wav_roundtrip_property(n, ch, seed, rate):
    rng = np.random.RandomState(seed)
    samples = rng.randint(-32768, 32768, size=(n, ch)).astype(np.int16)
    rate2, back = M.decode_wav(M.encode_wav(samples, rate))
    assert rate2 == rate
    assert back.shape == (n, ch)
    assert np.array_equal(back, samples)


def test_wav_decoder_skips_extra_chunks():
    """Files from other writers carry LIST/INFO chunks between fmt and
    data — the chunk walk must skip them."""
    import struct
    samples = np.arange(-5, 5, dtype=np.int16)
    raw = M.encode_wav(samples, 8000)
    # splice a LIST chunk (odd size → word-alignment padding exercised)
    fmt_end = raw.index(b"data")
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = raw[:fmt_end] + extra + raw[fmt_end:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    rate, back = M.decode_wav(spliced)
    assert rate == 8000 and np.array_equal(back.ravel(), samples)


def test_wav_decoder_rejects_non_pcm():
    import struct
    raw = bytearray(M.encode_wav(np.zeros(4, dtype=np.int16)))
    fmt_at = raw.index(b"fmt ") + 8
    struct.pack_into("<H", raw, fmt_at, 3)  # IEEE float format tag
    try:
        M.decode_wav(bytes(raw))
        raise AssertionError("expected NotImplementedError")
    except NotImplementedError as e:
        assert "PCM-16" in str(e)


# -- BPE tokenizer ----------------------------------------------------------

words_strategy = st.lists(
    st.tuples(st.text(alphabet="abcdef", min_size=1, max_size=10),
              st.integers(min_value=1, max_value=50)),
    min_size=1, max_size=30, unique_by=lambda t: t[0])


@given(words_strategy, st.integers(min_value=0, max_value=30))
@settings(max_examples=40, deadline=None)
def test_bpe_segments_always_reconstruct(words, n_merges):
    """For ANY word histogram and merge budget: segmentation of every
    trained-on word concatenates back to the word, and merges never
    exceed the budget."""
    from dataweb_spark.functions.tokenizer import (_segment,
                                                   train_bpe_merges)
    merges = train_bpe_merges(words, n_merges)
    assert len(merges) <= n_merges
    ranks = {p: i for i, p in enumerate(merges)}
    for w, _ in words:
        seg = _segment(w, ranks)
        assert "".join(seg) == w
        assert all(s for s in seg)


@given(words_strategy, st.integers(min_value=1, max_value=20))
@settings(max_examples=30, deadline=None)
def test_bpe_training_invariant_to_input_order(words, n_merges):
    from dataweb_spark.functions.tokenizer import train_bpe_merges
    assert train_bpe_merges(words, n_merges) == \
        train_bpe_merges(list(reversed(words)), n_merges)


# -- perceptual-hash banding ------------------------------------------------

@given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1),
                min_size=2, max_size=12, unique=True),
       st.integers(min_value=0, max_value=7))
@settings(max_examples=40, deadline=None)
def test_phash_pigeonhole_band_guarantee(sigs, max_h):
    """Any two 64-bit signatures within max_hamming < 8 share at least one
    of the 8 8-bit bands exactly (the full-recall guarantee the banded
    join relies on)."""
    for i, a in enumerate(sigs):
        for b in sigs[i + 1:]:
            hd = bin((a ^ b) & ((1 << 64) - 1)).count("1")
            if hd <= max_h:
                shares = any(((a >> (8 * k)) & 255) == ((b >> (8 * k)) & 255)
                             for k in range(8))
                assert shares
