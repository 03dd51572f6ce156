"""WARC (ISO 28500) record source: record framing, per-record-gzip
member splitting, the malformed-record ValueError contract, and the
binaryFile directory ingest face."""

import gzip
import tempfile

import pandas as pd
import pytest

from pyspark.sql import functions as F

from dataweb_spark.sources import warc as W


def _docs(spark, n=25):
    return (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .orderBy("doc_id").limit(n))


def _blob_df(spark, blob: bytes, blob_id: int = 0):
    pdf = pd.DataFrame({"blob_id": [blob_id], "warc": [blob]})
    return spark.createDataFrame(pdf, schema="blob_id long, warc binary")


@pytest.mark.parametrize("compress", [False, True])
def test_warc_roundtrip_fields_match_source_rows(spark, compress):
    docs = _docs(spark)
    blobs = W.synthesize_warc_blobs(docs, docs_per_blob=10,
                                    compress=compress)
    recs = W.parse_warc_records(blobs).collect()
    by_uri = {r.target_uri: r for r in recs}
    for d in docs.collect():
        uri = f"http://example.com/{d.source}/{d.doc_id}"
        r = by_uri[uri]
        assert r.warc_type == "response"
        assert r.record_id == f"<urn:dataweb:doc-{d.doc_id}>"
        assert r.content_type == "text/plain"
        assert bytes(r.payload).decode("utf-8") == d.text
        assert r.content_length == len(d.text.encode("utf-8"))
        assert r.blob_id == d.doc_id // 10
    # records are consecutive in doc_id order within a blob
    idx = {(r.blob_id, r.rec_index) for r in recs}
    assert len(idx) == len(recs)


def test_warc_missing_content_length_is_valueerror():
    """A record without Content-Length must fail the module's documented
    ValueError contract — not leak KeyError into the Spark task."""
    rec = (b"WARC/1.0\r\n"
           b"WARC-Type: response\r\n"
           b"WARC-Target-URI: http://x/1\r\n"
           b"\r\n"
           b"body\r\n\r\n")
    with pytest.raises(ValueError, match="Content-Length"):
        list(W._parse_warc_bytes(rec))


def test_warc_malformed_records_are_valueerror():
    with pytest.raises(ValueError, match="bad WARC Content-Length"):
        list(W._parse_warc_bytes(
            b"WARC/1.0\r\nContent-Length: nope\r\n\r\nx\r\n\r\n"))
    with pytest.raises(ValueError, match="bad WARC version"):
        list(W._parse_warc_bytes(
            b"HTTP/1.0\r\nContent-Length: 1\r\n\r\nx\r\n\r\n"))
    with pytest.raises(ValueError, match="truncated WARC payload"):
        list(W._parse_warc_bytes(
            b"WARC/1.0\r\nContent-Length: 999\r\n\r\nshort"))
    with pytest.raises(ValueError, match="truncated gzip member"):
        full = gzip.compress(b"WARC/1.0\r\nContent-Length: 1\r\n\r\nx",
                             mtime=0)
        list(W._parse_warc_bytes(full[:-3]))


def test_warc_gzip_members_split_independently():
    """.warc.gz framing: each record its own gzip member, concatenated —
    the member boundary is what makes a 100-TB crawl splittable."""
    r1 = W.build_warc_record(1, "web", "alpha")
    r2 = W.build_warc_record(2, "web", "beta gamma")
    blob = gzip.compress(r1, mtime=0) + gzip.compress(r2, mtime=0)
    got = list(W._parse_warc_bytes(blob))
    assert [g[4] for g in got] == [5, 10]        # content lengths
    assert [g[5] for g in got] == [b"alpha", b"beta gamma"]


def test_warc_directory_ingest_face(spark):
    """write_warc_directory → read_warc_directory → parse equals the
    in-memory parse: the filesystem face adds no records, loses none,
    and recovers blob ids from the file names."""
    docs = _docs(spark)
    blobs = W.synthesize_warc_blobs(docs, docs_per_blob=10, compress=True)
    d = tempfile.mkdtemp(prefix="t_warc_dir_")
    n = W.write_warc_directory(blobs, d)
    assert n == blobs.count()

    via_fs = (W.parse_warc_records(W.read_warc_directory(spark, d))
              .select("blob_id", "rec_index", "target_uri",
                      F.md5("payload").alias("h")))
    direct = (W.parse_warc_records(blobs)
              .select("blob_id", "rec_index", "target_uri",
                      F.md5("payload").alias("h")))
    assert sorted(map(tuple, via_fs.collect())) \
        == sorted(map(tuple, direct.collect()))


def test_warc_directory_blob_id_falls_back_to_path_hash(spark):
    import os
    d = tempfile.mkdtemp(prefix="t_warc_noid_")
    rec = gzip.compress(W.build_warc_record(7, "web", "hello"), mtime=0)
    with open(os.path.join(d, "no-digits-here.warc.gz"), "wb") as f:
        f.write(rec)
    rows = W.read_warc_directory(spark, d).collect()
    assert len(rows) == 1 and rows[0].blob_id is not None
    parsed = W.parse_warc_records(
        W.read_warc_directory(spark, d)).collect()
    assert parsed[0].target_uri == "http://example.com/web/7"


def test_warc_directory_ambiguous_numeric_names_never_collide(spark):
    """Names with digit runs that are NOT the write_warc_directory
    convention (part-1.warc.gz in two subdirs, date-prefixed segment
    names sharing a leading digit run) must hash the full path — never
    collapse onto one blob_id."""
    import os
    d = tempfile.mkdtemp(prefix="t_warc_amb_")
    rec = gzip.compress(W.build_warc_record(7, "web", "hello"), mtime=0)
    for sub, name in [("a", "part-1.warc.gz"), ("b", "part-1.warc.gz"),
                      ("a", "20240101-seg.warc.gz"),
                      ("a", "20240102-seg.warc.gz")]:
        os.makedirs(os.path.join(d, sub), exist_ok=True)
        with open(os.path.join(d, sub, name), "wb") as f:
            f.write(rec)
    ids = [r.blob_id for r in
           W.read_warc_directory(spark, d + "/*").collect()]
    assert len(ids) == 4 and len(set(ids)) == 4
    # the convention name still maps to its literal integer
    with open(os.path.join(d, "a", "blob-0000000042.warc.gz"), "wb") as f:
        f.write(rec)
    ids2 = {r.blob_id for r in
            W.read_warc_directory(spark, d + "/*").collect()}
    assert 42 in ids2 and len(ids2) == 5


# ---------------------------------------------------------------------------
# fuzz: arbitrary bytes never crash the parser with anything but the
# documented ValueError (or parse cleanly)
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=50, deadline=None)
@given(junk=st.binary(min_size=0, max_size=300))
def test_warc_parser_fuzz_classified_errors(junk):
    try:
        list(W._parse_warc_bytes(junk))
    except ValueError:
        pass        # the documented malformed-record contract


@settings(max_examples=30, deadline=None)
@given(seed=st.integers(min_value=0, max_value=2**31 - 1),
       flip=st.integers(min_value=0, max_value=10**9))
def test_warc_gzip_bitflip_fuzz(seed, flip):
    """A byte-flip anywhere in a .warc.gz blob either still parses or
    fails with the documented ValueError — a bare zlib.error would kill
    the Spark task unclassified."""
    rec = W.build_warc_record(seed % 1000, "web", f"text {seed}")
    blob = bytearray(gzip.compress(rec, mtime=0))
    blob[flip % len(blob)] ^= 1 + (flip % 255)
    try:
        list(W._parse_warc_bytes(bytes(blob)))
    except ValueError:
        pass


# -- HTTP envelope extraction (real Common Crawl response payloads) ---------

def _http_record(doc_id, status, headers, body, **kw):
    payload = W.build_http_response(status, headers, body)
    return W.build_warc_record(
        doc_id, "web", "", payload=payload,
        content_type="application/http; msgtype=response", **kw)


def _extract(spark, blob):
    parts = W.http_response_parts(W.parse_warc_records(
        _blob_df(spark, blob)))
    return parts.orderBy("rec_index").collect()


def test_http_envelope_strip_and_headers(spark):
    """Status line, lowercased wire-order headers, body split — the
    reference-free RFC 9112 shape real crawl response records carry."""
    blob = _http_record(
        1, 200, [("Content-Type", "text/html; charset=UTF-8"),
                 ("X-Served-By", "cache-7")],
        b"<html>hi</html>")
    [r] = _extract(spark, blob)
    assert r.http_status == 200
    assert [(h.name, h.val) for h in r.http_headers] == [
        ("content-type", "text/html; charset=UTF-8"),
        ("x-served-by", "cache-7")]
    assert r.mime == "text/html"
    assert r.charset == "utf-8"
    assert r.body == "<html>hi</html>"
    assert r.n_bad_chars == 0


def test_http_charset_resolution_order(spark):
    """Header charset param beats the meta tag; meta tag beats the
    utf-8 default; unknown labels fall back to utf-8."""
    meta = b'<html><head><meta charset="windows-1252"></head>\x93q\x94'
    # 1) param wins over meta
    blob = _http_record(0, 200, [("Content-Type",
                                  "text/html; charset=ISO-8859-1")], meta)
    [r] = _extract(spark, blob)
    assert r.charset == "iso-8859-1"
    assert "\x93q\x94" in r.body          # latin-1 maps 93/94 to C1 ctrls
    # 2) meta fallback decodes the smart quotes
    blob = _http_record(1, 200, [("Content-Type", "text/html")], meta)
    [r] = _extract(spark, blob)
    assert r.charset == "windows-1252"
    assert "“q”" in r.body
    # 3) unknown label → utf-8 decode
    blob = _http_record(2, 200, [("Content-Type",
                                  "text/plain; charset=klingon-9")],
                        b"ok \xe2\x82\xac")
    [r] = _extract(spark, blob)
    assert r.charset == "klingon-9"       # reported as declared
    assert r.body == "ok €"               # decoded via the utf-8 fallback


def test_http_replacement_char_accounting(spark):
    blob = _http_record(0, 200, [("Content-Type",
                                  "text/plain; charset=utf-8")],
                        b"good \xff\xfe bad")
    [r] = _extract(spark, blob)
    assert r.n_bad_chars == 2
    assert r.body.count("�") == 2


def test_http_status_variants_and_headerless(spark):
    """404s parse; LF-only header blocks tolerated; an envelope with no
    blank line yields an empty body rather than a crash."""
    blob = _http_record(0, 404, [("Content-Type", "text/plain")],
                        b"gone")
    [r] = _extract(spark, blob)
    assert (r.http_status, r.body) == (404, "gone")
    lf_payload = b"HTTP/1.1 302 Found\nLocation: /x\n\nmoved"
    blob = W.build_warc_record(1, "web", "", payload=lf_payload,
                               content_type="application/http")
    [r] = _extract(spark, blob)
    assert (r.http_status, r.body) == (302, "moved")
    assert [(h.name, h.val) for h in r.http_headers] == [
        ("location", "/x")]
    no_sep = b"HTTP/1.1 200 OK\r\nX-Broken: yes"
    blob = W.build_warc_record(2, "web", "", payload=no_sep,
                               content_type="application/http")
    [r] = _extract(spark, blob)
    assert (r.http_status, r.body) == (200, "")


def test_wet_conversion_records_pass_through(spark):
    """WET conversion records (and any non-http payload) ride the same
    face: whole payload = body, status null, mime from the WARC
    Content-Type."""
    blob = W.build_warc_record(7, "web", "plain extract",
                               warc_type="conversion")
    [r] = _extract(spark, blob)
    assert r.warc_type == "conversion"
    assert r.http_status is None
    assert r.http_headers == []
    assert (r.mime, r.charset) == ("text/plain", "utf-8")
    assert r.body == "plain extract"


def test_http_extract_composes_with_text_ops(spark):
    """The promised chain: response-mode WARC → envelope strip → real
    page text reaches html_to_text (no header junk)."""
    from dataweb_spark.functions import text as T
    html = b"<html><body><p>Spark engines federate.</p></body></html>"
    blob = _http_record(3, 200,
                        [("Content-Type", "text/html; charset=utf-8")],
                        html)
    parts = W.http_response_parts(W.parse_warc_records(
        _blob_df(spark, blob)))
    out = parts.select(T.html_to_text(F.col("body")).alias("t")).collect()
    assert out[0].t == "Spark engines federate."
    raw = W.parse_warc_records(_blob_df(spark, blob)).select(
        T.html_to_text(F.col("payload").cast("string")).alias("t")
    ).collect()
    assert "HTTP/1.1" in raw[0].t  # what item 3 warned about, pre-strip


@settings(max_examples=60, deadline=None)
@given(junk=st.binary(min_size=0, max_size=300),
       ct=st.sampled_from(["application/http; msgtype=response",
                           "application/http", "text/plain", "",
                           "application/octet-stream"]))
def test_http_payload_parse_is_total_and_deterministic(junk, ct):
    """_parse_http_payload is TOTAL over arbitrary payload bytes — any
    blob yields a (status, headers, mime, charset, body, n_bad) tuple,
    never an executor-killing exception — and is deterministic."""
    a = W._parse_http_payload(junk, ct)
    b = W._parse_http_payload(junk, ct)
    assert a == b
    status, headers, mime, charset, body, n_bad = a
    assert status is None or 100 <= status <= 999
    assert isinstance(body, str)
    assert n_bad == body.count("�")
    assert all(k == k.lower() for k, _ in headers)


def test_nontext_codec_charset_labels_fall_back(spark):
    """charset labels naming registered NON-TEXT codecs (hex, base64,
    rot13 — codecs.lookup succeeds, .decode raises) must fall back to
    utf-8 instead of killing the task."""
    for label in ("hex", "base64", "rot13", "zlib"):
        status, headers, mime, charset, body, n_bad = W._parse_http_payload(
            W.build_http_response(
                200, [("Content-Type", f"text/plain; charset={label}")],
                "ok €".encode("utf-8")),
            "application/http; msgtype=response")
        assert (status, body) == (200, "ok €"), label


def test_lf_only_header_splits_at_first_blank_line():
    """An LF-only header block whose BODY contains \\r\\n\\r\\n must
    split at the earlier \\n\\n — not deep inside the body."""
    payload = (b"HTTP/1.1 200 OK\nContent-Type: text/plain; "
               b"charset=utf-8\n\nline1\r\n\r\nline2")
    status, headers, mime, charset, body, n_bad = \
        W._parse_http_payload(payload, "application/http")
    assert status == 200
    assert body == "line1\r\n\r\nline2"


def test_content_encoding_gzip_and_deflate_inflate():
    """Crawls store bodies AS-SENT: gzip, x-gzip, zlib-wrapped deflate
    and raw deflate all inflate before charset decode; a corrupt stream
    keeps the raw bytes and surfaces as replacement-char damage, never
    a task kill."""
    import zlib
    text = "compressed päge €"
    raw = text.encode("utf-8")
    co = zlib.compressobj(wbits=-15)
    half = len(raw) // 2
    cases = [
        ("gzip", gzip.compress(raw, mtime=0)),
        ("x-gzip", gzip.compress(raw, mtime=0)),
        ("deflate", zlib.compress(raw)),                # zlib-wrapped
        ("deflate", co.compress(raw) + co.flush()),     # raw deflate
        # MULTIPLE concatenated gzip members (RFC 1952 — per-chunk
        # flushes): zlib.decompress(body, 47) silently keeps only the
        # first member; the full text must survive
        ("gzip", gzip.compress(raw[:half], mtime=0)
                 + gzip.compress(raw[half:], mtime=0)),
        # zlib-wrapped body MISLABELED gzip (seen in the wild; wbits=47
        # auto-detects both headers)
        ("gzip", zlib.compress(raw)),
    ]
    for enc, body in cases:
        status, headers, mime, charset, out, n_bad = W._parse_http_payload(
            W.build_http_response(
                200, [("Content-Type", "text/plain; charset=utf-8"),
                      ("Content-Encoding", enc)], body),
            "application/http; msgtype=response")
        assert (status, out, n_bad) == (200, text, 0), enc
    # a valid member followed by trailing garbage (Content-Length
    # slack): the decoded member survives, the garbage is dropped
    status, headers, mime, charset, out, n_bad = W._parse_http_payload(
        W.build_http_response(
            200, [("Content-Type", "text/plain; charset=utf-8"),
                  ("Content-Encoding", "gzip")],
            gzip.compress(raw, mtime=0) + b"\x00\x17 junk tail"),
        "application/http; msgtype=response")
    assert (status, out, n_bad) == (200, text, 0)
    # corrupt gzip: raw bytes ride through, damage accounted not raised
    status, headers, mime, charset, out, n_bad = W._parse_http_payload(
        W.build_http_response(
            200, [("Content-Type", "text/plain; charset=utf-8"),
                  ("Content-Encoding", "gzip")], b"\x1f\x8b junk"),
        "application/http; msgtype=response")
    assert status == 200 and n_bad > 0
