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


def build_warc_record(doc_id: int, source: str, text: str) -> bytes:
    """One deterministic ``response`` record for a document row (the
    closed form the oracle replays: URI/ID/length all derive from the
    row itself)."""
    payload = text.encode("utf-8")
    headers = (
        WARC_VERSION + _CRLF
        + b"WARC-Type: response" + _CRLF
        + f"WARC-Record-ID: <urn:dataweb:doc-{doc_id}>".encode() + _CRLF
        + f"WARC-Target-URI: http://example.com/{source}/{doc_id}".encode()
        + _CRLF
        + b"WARC-Date: 2026-01-01T00:00:00Z" + _CRLF
        + b"Content-Type: text/plain" + _CRLF
        + f"Content-Length: {len(payload)}".encode() + _CRLF
        + _CRLF
    )
    return headers + payload + _CRLF + _CRLF


def synthesize_warc_blobs(docs: DataFrame, docs_per_blob: int = 10,
                          compress: bool = False) -> DataFrame:
    """Pack documents into WARC blobs: blob ``doc_id // docs_per_blob``
    holds its documents as consecutive records in doc_id order.

    With ``compress=True`` each record becomes its own gzip member
    (mtime pinned to 0 so the bytes are deterministic) — the standard
    ``.warc.gz`` layout. One ``applyInPandas`` per blob group; the only
    shuffle is the blob-id grouping of the (small) text rows.
    """
    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        buf = bytearray()
        for _, r in pdf.iterrows():
            rec = build_warc_record(int(r.doc_id), r.source, r.text)
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
