"""WARC (Web ARChive, ISO 28500) record source — Common Crawl ingestion.

Web-scale pretraining corpora arrive as WARC/WET files: concatenated
records, each a CRLF-terminated header block (``WARC/1.0`` + named
headers + ``Content-Length``) followed by that many payload octets and a
blank-record separator. The on-disk ``.warc.gz`` form compresses EVERY
RECORD AS ITS OWN GZIP MEMBER and concatenates the members — that
per-record framing is what makes a 100-TB crawl splittable: any worker
can start at a member boundary without seeing the rest of the file.

Spark-first shape: one blob (file or file-slice) per row in a binary
column; :func:`parse_warc_records` explodes blobs into records inside an
Arrow-batched ``mapInPandas`` — record bytes never shuffle, parsing is
map-only and scales linearly with input splits. The synthesizer exists
so tests and driver oracles can state every parsed field in closed form
from the ``documents`` table.

No counterpart in the reference repo (its sources are SQL engines and
file directories — ``datafusion_table_providers``-backed); this is part
of the greenfield LLM-pipeline layer.
"""

from __future__ import annotations

import gzip
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

WARC_VERSION = b"WARC/1.0"
_CRLF = b"\r\n"

WARC_RECORD_SCHEMA = (
    "blob_id long, rec_index int, warc_type string, record_id string, "
    "target_uri string, content_type string, content_length long, "
    "payload binary"
)


def build_warc_record(doc_id: int, source: str, text: str,
                      warc_type: str = "response",
                      content_type: str = "text/plain",
                      payload: bytes | None = None) -> bytes:
    """One deterministic WARC record for a document row (the closed form
    the oracle replays: URI/ID/length all derive from the row itself).

    The defaults give the legacy bare-text ``response`` record. Real
    Common Crawl ``response`` records carry a FULL HTTP MESSAGE as the
    payload with ``content_type='application/http; msgtype=response'``
    (compose one with :func:`build_http_response`); WET extracts use
    ``warc_type='conversion'`` with plain text. Pass ``payload`` to
    override the UTF-8 encoding of ``text``."""
    payload = text.encode("utf-8") if payload is None else payload
    headers = (
        WARC_VERSION + _CRLF
        + f"WARC-Type: {warc_type}".encode() + _CRLF
        + f"WARC-Record-ID: <urn:dataweb:doc-{doc_id}>".encode() + _CRLF
        + f"WARC-Target-URI: http://example.com/{source}/{doc_id}".encode()
        + _CRLF
        + b"WARC-Date: 2026-01-01T00:00:00Z" + _CRLF
        + f"Content-Type: {content_type}".encode() + _CRLF
        + f"Content-Length: {len(payload)}".encode() + _CRLF
        + _CRLF
    )
    return headers + payload + _CRLF + _CRLF


def build_http_response(status: int, headers: list[tuple[str, str]],
                        body: bytes,
                        reason: str = "OK") -> bytes:
    """A full HTTP/1.1 response message — what a real crawl ``response``
    record's payload looks like (status line + headers + CRLF + body).
    Feed to :func:`build_warc_record` with
    ``content_type='application/http; msgtype=response'``."""
    head = f"HTTP/1.1 {status} {reason}\r\n".encode("ascii")
    for k, v in headers:
        head += f"{k}: {v}\r\n".encode("ascii")
    return head + _CRLF + body


def synthesize_warc_blobs(docs: DataFrame, docs_per_blob: int = 10,
                          compress: bool = False,
                          record_builder=None) -> DataFrame:
    """Pack documents into WARC blobs: blob ``doc_id // docs_per_blob``
    holds its documents as consecutive records in doc_id order.

    With ``compress=True`` each record becomes its own gzip member
    (mtime pinned to 0 so the bytes are deterministic) — the standard
    ``.warc.gz`` layout. One ``applyInPandas`` per blob group; the only
    shuffle is the blob-id grouping of the (small) text rows.

    ``record_builder(doc_id, source, text) -> bytes`` overrides the
    default bare-text record — e.g. to wrap each document in a full HTTP
    response envelope (:func:`build_http_response`) or emit WET
    ``conversion`` records. Must be deterministic; it is pickled into
    the executors.
    """
    build = record_builder or build_warc_record

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        buf = bytearray()
        for _, r in pdf.iterrows():
            rec = build(int(r.doc_id), r.source, r.text)
            if compress:
                rec = gzip.compress(rec, compresslevel=6, mtime=0)
            buf += rec
        return pd.DataFrame({"blob_id": [int(pdf.blob_id.iloc[0])],
                             "n_records": [len(pdf)],
                             "warc": [bytes(buf)]})

    with_blob = docs.select(
        "doc_id", "source", "text",
        (F.col("doc_id") / docs_per_blob).cast("long").alias("blob_id"))
    return (with_blob.groupBy("blob_id")
            .applyInPandas(pack,
                           schema="blob_id long, n_records int, warc binary"))


def _split_gzip_members(blob: bytes) -> Iterator[bytes]:
    """Yield each gzip member's decompressed bytes from a multi-member
    stream (the .warc.gz framing). Corrupt deflate streams surface as
    the module's documented ValueError, never a bare zlib.error."""
    rest = blob
    while rest:
        d = zlib.decompressobj(wbits=31)
        try:
            out = d.decompress(rest)
            if not d.eof:
                raise ValueError("truncated gzip member in WARC blob")
            tail = d.flush()
        except zlib.error as e:
            raise ValueError(f"corrupt gzip member in WARC blob: {e}") \
                from None
        yield out + tail
        rest = d.unused_data


def _parse_warc_bytes(blob: bytes) -> Iterator[tuple]:
    """Yield (warc_type, record_id, target_uri, content_type, length,
    payload) per record. Tolerates both bare and per-record-gzip blobs
    (sniffed on the gzip magic)."""
    if blob[:2] == b"\x1f\x8b":
        chunks: Iterator[bytes] = _split_gzip_members(blob)
    else:
        chunks = iter([blob])
    for chunk in chunks:
        pos = 0
        while pos < len(chunk):
            # skip inter-record blank lines
            while chunk[pos:pos + 2] == _CRLF:
                pos += 2
            if pos >= len(chunk):
                break
            head_end = chunk.find(_CRLF + _CRLF, pos)
            if head_end < 0:
                raise ValueError("unterminated WARC header block")
            head = chunk[pos:head_end].decode("utf-8", "replace")
            lines = head.split("\r\n")
            if not lines[0].startswith("WARC/"):
                raise ValueError(f"bad WARC version line: {lines[0]!r}")
            hdrs = {}
            for line in lines[1:]:
                k, _, v = line.partition(":")
                hdrs[k.strip().lower()] = v.strip()
            raw_len = hdrs.get("content-length")
            if raw_len is None:
                raise ValueError("WARC record missing Content-Length")
            try:
                length = int(raw_len)
            except ValueError:
                raise ValueError(
                    f"bad WARC Content-Length: {raw_len!r}") from None
            body_start = head_end + 4
            payload = chunk[body_start:body_start + length]
            if len(payload) != length:
                raise ValueError("truncated WARC payload")
            yield (hdrs.get("warc-type", ""),
                   hdrs.get("warc-record-id", ""),
                   hdrs.get("warc-target-uri", ""),
                   hdrs.get("content-type", ""),
                   length, payload)
            pos = body_start + length


def read_warc_directory(spark, path: str,
                        pattern: str = "*.warc*") -> DataFrame:
    """Filesystem ingest face: a directory of ``.warc`` / ``.warc.gz``
    files → the ``(blob_id, warc)`` frame :func:`parse_warc_records`
    expects, via ``spark.read.format("binaryFile")``.

    One row per FILE — Common Crawl ships ~1 GB member-concatenated
    gzip files, so file-per-row is the standard crawl granularity
    (parallelism = number of files; a 100-TB crawl is ~100k files, far
    more than any executor count). ``blob_id`` is the file-name integer
    ONLY for names matching the :func:`write_warc_directory` convention
    exactly (``blob-00000042.warc[.gz]`` → 42); every other name —
    date-prefixed Common Crawl segments, ``part-1.warc.gz`` repeated
    across subdirectories — gets a 64-bit hash of the FULL path, so two
    files never silently collide onto one blob_id (downstream dedup and
    the directory-ingest oracle rely on (blob_id, rec_index)
    uniqueness). Stable either way across retries and re-lists.
    Hadoop-FS URIs (s3a://, hdfs://) work as-is.
    """
    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", pattern)
             .load(path))
    name = F.element_at(F.split(F.col("path"), "/"), -1)
    num = F.regexp_extract(name, r"^blob-(\d+)\.warc(?:\.gz)?$", 1)
    blob_id = (F.when(num != "", num.cast("long"))
                .otherwise(F.xxhash64("path")))
    return files.select(blob_id.alias("blob_id"),
                        F.col("content").alias("warc"))


def write_warc_directory(blobs: DataFrame, path: str,
                         blob_col: str = "warc",
                         id_col: str = "blob_id") -> int:
    """TEST-FIXTURE writer: materialize ``(blob_id, warc)`` rows as
    ``blob-<id>.warc.gz`` files so :func:`read_warc_directory` has a
    directory to ingest. Driver-side by design — ``toLocalIterator``
    holds ONE blob in driver memory at a time — and bounded to fixture
    scale; a real crawl's files already exist on the store, this only
    fabricates them for tests and oracle queries."""
    import os

    os.makedirs(path, exist_ok=True)
    n = 0
    for row in blobs.select(id_col, blob_col).toLocalIterator():
        fn = os.path.join(path, f"blob-{int(row[id_col]):010d}.warc.gz")
        with open(fn, "wb") as f:
            f.write(bytes(row[blob_col]))
        n += 1
    return n


def parse_warc_records(blobs: DataFrame, blob_col: str = "warc",
                       id_col: str = "blob_id") -> DataFrame:
    """Explode WARC blobs into one row per record.

    Arrow-batched ``mapInPandas``: each task parses its own blobs —
    record bytes never shuffle, no state, linear in input bytes. Bare
    and per-record-gzip (``.warc.gz``) blobs both parse (sniffed).
    """
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["blob_id", "rec_index", "warc_type", "record_id",
                "target_uri", "content_type", "content_length", "payload"]
        for pdf in batches:
            rows = []
            for bid, blob in zip(pdf[id_col], pdf[blob_col]):
                for i, rec in enumerate(_parse_warc_bytes(bytes(blob))):
                    rows.append((int(bid), i) + rec)
            yield pd.DataFrame(rows, columns=cols)

    return blobs.select(F.col(id_col), F.col(blob_col)) \
                .mapInPandas(gen, schema=WARC_RECORD_SCHEMA)


# ---------------------------------------------------------------------------
# HTTP envelope extraction (real Common Crawl response records)
# ---------------------------------------------------------------------------

WARC_HTTP_SCHEMA = (
    "blob_id long, rec_index int, warc_type string, record_id string, "
    "target_uri string, content_type string, content_length long, "
    "http_status int, "
    "http_headers array<struct<name:string,val:string>>, "
    "mime string, charset string, body string, n_bad_chars long"
)

_CHARSET_PARAM = None  # compiled lazily (module import stays light)


def _charset_regexes():
    global _CHARSET_PARAM
    if _CHARSET_PARAM is None:
        import re
        _CHARSET_PARAM = (
            re.compile(r"""charset\s*=\s*["']?([\w.:+-]+)""", re.I),
            re.compile(rb"""<meta[^>]+charset\s*=\s*["']?([\w.:+-]+)""",
                       re.I),
            re.compile(rb"HTTP/\d(?:\.\d)?\s+(\d{3})"),
        )
    return _CHARSET_PARAM


def _decode_body(body: bytes, charset: str) -> tuple[str, int]:
    """Charset-decode with replacement-character accounting: undecodable
    byte sequences become U+FFFD, and ``n_bad`` counts the U+FFFD in the
    RESULT (original U+FFFD included — both signal damage upstream; the
    count feeds ``text.encoding_quality``). Unknown charset labels fall
    back to utf-8 — deterministic, never an executor crash. The decode
    itself sits inside the guard: labels like ``hex``/``base64``/``rot13``
    pass ``codecs.lookup`` (they ARE registered codecs) but raise
    LookupError('not a text encoding') only at ``.decode`` time."""
    try:
        text = body.decode(charset, errors="replace")
    except (LookupError, ValueError):
        text = body.decode("utf-8", errors="replace")
    return text, text.count("�")


def _parse_http_payload(payload: bytes, warc_content_type: str):
    """(status, headers, mime, charset, body_text, n_bad) for one record
    payload. ``application/http`` payloads (real crawl ``response``
    records) get the envelope stripped: status line parsed, header block
    → lowercased (name, value) pairs in wire order, a
    ``Content-Encoding: gzip/x-gzip/deflate`` body inflated (corrupt
    streams kept raw — the decode accounts the damage as U+FFFD), then
    the body charset-decoded
    per the HTTP Content-Type charset param, falling back to an
    HTML-prolog ``<meta charset=…>`` scan of the first 1024 body bytes,
    then utf-8. Everything else (WET ``conversion`` records, the
    synthesizer's bare-text records) is all body — status null, headers
    empty, mime/charset from the WARC Content-Type."""
    param_re, meta_re, status_re = _charset_regexes()
    is_http = (warc_content_type.split(";", 1)[0].strip().lower()
               == "application/http")
    if is_http and payload[:5] == b"HTTP/":
        # header block ends at whichever blank line comes FIRST — an
        # LF-only header followed by a body that happens to contain
        # \r\n\r\n must split at the \n\n, not deep inside the body
        found = [(i, n) for i, n in ((payload.find(b"\r\n\r\n"), 4),
                                     (payload.find(b"\n\n"), 2)) if i >= 0]
        if not found:
            head_bytes, body = payload, b""
        else:
            sep, sep_len = min(found)
            head_bytes, body = payload[:sep], payload[sep + sep_len:]
        lines = head_bytes.decode("latin-1").splitlines()
        m = status_re.match(head_bytes)
        status = int(m.group(1)) if m else None
        headers = []
        for ln in lines[1:]:
            name, colon, val = ln.partition(":")
            if colon:
                headers.append((name.strip().lower(), val.strip()))
        ct = next((v for k, v in headers if k == "content-type"), "")
        # real servers routinely send compressed bodies and crawls store
        # them as-sent — inflate gzip/deflate before charset decode
        # (deflate tried zlib-wrapped first, then raw: both occur in the
        # wild); a corrupt stream keeps the raw bytes, whose decode then
        # accounts the damage as U+FFFD rather than killing the task
        enc = next((v for k, v in headers if k == "content-encoding"),
                   "").strip().lower()
        if enc in ("gzip", "x-gzip", "deflate"):
            try:
                if enc == "deflate":
                    try:
                        body = zlib.decompress(body)
                    except zlib.error:
                        body = zlib.decompress(body, -15)
                else:
                    # Decode RFC 1952 members in a decompressobj loop:
                    # bodies may be MULTIPLE concatenated gzip members
                    # (per-chunk flushes) — a one-shot
                    # zlib.decompress(body, 47) silently keeps only the
                    # first — while real crawls ALSO carry trailing
                    # garbage after a valid member and zlib-wrapped
                    # bodies mislabeled gzip (wbits=47 auto-detects
                    # both headers), which a strict gzip.decompress
                    # rejects outright. Keep every member that decodes;
                    # stop at the first non-stream tail.
                    chunks: list[bytes] = []
                    data = body
                    while data:
                        d = zlib.decompressobj(47)
                        try:
                            chunks.append(d.decompress(data))
                        except zlib.error:
                            if not chunks:
                                raise  # wholly corrupt → raw fallback
                            break      # garbage after good members
                        if not d.eof:
                            break      # truncated final member
                        data = d.unused_data
                    body = b"".join(chunks)
            except zlib.error:
                pass
    else:
        status, headers, body = None, [], payload
        ct = warc_content_type
    mime = ct.split(";", 1)[0].strip().lower() or None
    m = param_re.search(ct)
    charset = m.group(1).lower() if m else None
    if charset is None:
        m = meta_re.search(body[:1024])
        charset = m.group(1).decode("ascii", "replace").lower() if m \
            else "utf-8"
    text, n_bad = _decode_body(body, charset)
    return status, headers, mime, charset, text, n_bad


def http_response_parts(records: DataFrame,
                        payload_col: str = "payload") -> DataFrame:
    """Strip the HTTP message envelope real Common Crawl ``response``
    records carry (``Content-Type: application/http; msgtype=response``
    — status line + headers + body), charset-decode the body, and
    account replacement characters, so downstream text operators
    (``html_to_text``, C4, CCNet) see the PAGE, not header junk.

    Input is :func:`parse_warc_records` output; output replaces the raw
    ``payload`` with ``http_status`` (null for non-envelope records),
    ``http_headers`` (lowercased name/val structs in wire order),
    ``mime``, ``charset`` (header param → ``<meta charset>`` in the
    first 1 KB → utf-8), decoded ``body`` (gzip/deflate
    ``Content-Encoding`` inflated first — crawls store bodies as-sent)
    and ``n_bad_chars`` (U+FFFD count — feed to
    ``text.encoding_quality`` tiers). WET
    ``conversion`` records and bare-text payloads pass through the same
    face with the whole payload as body.

    Arrow-batched ``mapInPandas``, map-only: record bytes never
    shuffle, one pass, linear in input bytes — the same scaling
    contract as the record parser. Chunked transfer decoding is out of
    scope (Common Crawl stores identity-coded payloads).

    No reference counterpart (greenfield pipeline layer); the envelope
    format is RFC 9110/9112, the charset sniff order is the WHATWG one
    trimmed to header-then-meta-then-utf8.
    """
    cols = ["blob_id", "rec_index", "warc_type", "record_id",
            "target_uri", "content_type", "content_length"]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out_cols = cols + ["http_status", "http_headers", "mime",
                           "charset", "body", "n_bad_chars"]
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                status, headers, mime, charset, body, n_bad = \
                    _parse_http_payload(bytes(getattr(rec, payload_col)),
                                        rec.content_type or "")
                rows.append(tuple(getattr(rec, c) for c in cols)
                            + (status,
                               [{"name": k, "val": v} for k, v in headers],
                               mime, charset, body, n_bad))
            yield pd.DataFrame(rows, columns=out_cols)

    return records.mapInPandas(gen, schema=WARC_HTTP_SCHEMA)
