"""WARC (Web ARChive, ISO 28500) source — the container Common Crawl
ships, which is where a real 100 TB text corpus actually starts.

The reference ingests third-party feeds from S3 (README.md:35,160-161);
a crawl corpus arrives the same way but as WARC: a stream of records
(`WARC/1.0` + headers + Content-Length payload), response records
wrapping a raw HTTP response whose body is the HTML that
functions/html.extract_main_text exists to clean. Real CC files are
`.warc.gz` with each record its own gzip member; stdlib zlib iterates
the concatenated members, so no external dependency.

Implemented from scratch on the PUBLIC spec (ISO 28500 / IIPC
warc-specifications): record grammar `WARC/1.x CRLF headers CRLF CRLF
payload CRLF CRLF`, Content-Length in bytes, HTTP payloads split at the
first blank line. TOLERANT by contract (the engine's CSV/JSON/XML
quarantine discipline): a record with a bad/missing length, a truncated
payload, or a garbled header block yields ONE quarantine row carrying
the reason, and the parser RESYNCS at the next `WARC/1.0` magic instead
of failing the file — one rotten record never costs the other ~50k in a
CC segment.

Scale shape: `binaryFile` gives a distributed listing with one task per
file (CC segments are ~1 GB — the standard unit; task memory is bounded
by file size, exactly like every production WARC reader);
`mapInPandas` parses inside Arrow batches; bodies stay on executors and
downstream projections prune them before any exchange. At 100 TB the
pattern is WARC -> one ETL pass (this reader + extract_main_text) ->
partitioned parquet, the reference's CSV->parquet conversion
(README.md:125-127) applied to the crawl.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: Output schema: one row per WARC record (or per quarantined parse).
WARC_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("http_content_type", T.StringType()),
        T.StructField("body", T.BinaryType()),
        T.StructField("error", T.StringType()),
    ]
)

_MAGIC = b"WARC/"


def _gunzip_members(data: bytes) -> bytes:
    """Concatenated gzip members (the .warc.gz layout: one member per
    record) -> the plain byte stream. Trailing garbage after the last
    member is kept so the parser can quarantine it."""
    out = []
    rest = data
    while rest.startswith(b"\x1f\x8b"):
        d = zlib.decompressobj(47)
        try:
            out.append(d.decompress(rest))
        except zlib.error:
            break
        if not d.eof:  # truncated member: surface what decoded
            rest = b""
            break
        rest = d.unused_data
    out.append(rest)
    return b"".join(out)


def _parse_http(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """Split a raw HTTP response into (status, content-type, body);
    returns (None, None, payload) when the payload isn't HTTP."""
    head, sep, body = payload.partition(b"\r\n\r\n")
    if not sep:
        return None, None, payload
    lines = head.split(b"\r\n")
    parts = lines[0].split(None, 2)
    if len(parts) < 2 or not parts[0].startswith(b"HTTP/"):
        return None, None, payload
    try:
        status = int(parts[1])
    except ValueError:
        return None, None, payload
    ctype = None
    for ln in lines[1:]:
        k, _, v = ln.partition(b":")
        if k.strip().lower() == b"content-type":
            ctype = v.strip().decode("latin-1")
            break
    return status, ctype, body


def parse_warc_bytes(path: str, data: bytes) -> Iterator[tuple]:
    """Yield WARC_SCHEMA rows from one file's bytes. Malformed records
    quarantine (error column) and the scan resyncs at the next magic."""
    if data.startswith(b"\x1f\x8b"):
        data = _gunzip_members(data)
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(_MAGIC, pos)
        if start < 0:
            if data[pos:].strip():
                yield (path, None, None, None, None, None, None, None,
                       "trailing bytes with no WARC magic")
            return
        if start > pos and data[pos:start].strip():
            yield (path, None, None, None, None, None, None, None,
                   "unparseable bytes before next record")
        hdr_end = data.find(b"\r\n\r\n", start)
        if hdr_end < 0:
            yield (path, None, None, None, None, None, None, None,
                   "truncated header block")
            return
        headers: dict[str, str] = {}
        ok = True
        for ln in data[start:hdr_end].split(b"\r\n")[1:]:
            k, sep, v = ln.partition(b":")
            if not sep:
                ok = False
                break
            headers[k.strip().lower().decode("latin-1")] = v.strip().decode(
                "latin-1"
            )
        length_s = headers.get("content-length")
        if not ok or length_s is None or not length_s.isdigit():
            yield (path, None, None, None, None, None, None, None,
                   "bad or missing Content-Length")
            pos = start + len(_MAGIC)  # resync past this magic
            continue
        length = int(length_s)
        body_start = hdr_end + 4
        if body_start + length > n:
            yield (path, None, None, None, None, None, None, None,
                   "payload truncated at end of file")
            return
        payload = data[body_start:body_start + length]
        wtype = headers.get("warc-type")
        status: int | None = None
        ctype: str | None = None
        body: bytes = payload
        if wtype == "response":
            status, ctype, body = _parse_http(payload)
        yield (
            path,
            wtype,
            headers.get("warc-record-id"),
            headers.get("warc-target-uri"),
            headers.get("warc-date"),
            status,
            ctype,
            bytes(body),
            None,
        )
        pos = body_start + length
        # consume the inter-record CRLF CRLF if present
        if data[pos:pos + 4] == b"\r\n\r\n":
            pos += 4


def encode_http_response(
    body: bytes, status: int = 200, content_type: str = "text/html"
) -> bytes:
    """Raw HTTP/1.1 response bytes for a WARC response record's payload."""
    reason = {200: "OK", 404: "Not Found"}.get(status, "Status")
    head = (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    )
    return head.encode("latin-1") + body


def encode_warc_record(
    warc_type: str,
    payload: bytes,
    target_uri: str | None = None,
    record_id: str = "<urn:uuid:0>",
    date: str = "2026-01-01T00:00:00Z",
) -> bytes:
    """One spec-shaped WARC/1.0 record (encoder twin of the parser —
    fixtures and tests build real byte streams, never mocks)."""
    lines = [
        "WARC/1.0",
        f"WARC-Type: {warc_type}",
        f"WARC-Record-ID: {record_id}",
        f"WARC-Date: {date}",
    ]
    if target_uri is not None:
        lines.append(f"WARC-Target-URI: {target_uri}")
    if warc_type == "response":
        lines.append("Content-Type: application/http;msgtype=response")
    lines.append(f"Content-Length: {len(payload)}")
    head = ("\r\n".join(lines) + "\r\n\r\n").encode("latin-1")
    return head + payload + b"\r\n\r\n"


def gzip_member(record: bytes) -> bytes:
    """One gzip member per record — the .warc.gz layout."""
    import gzip

    return gzip.compress(record)


#: binaryFile's fixed schema (streaming reads must declare it).
_BINARYFILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def _records(files: DataFrame) -> DataFrame:
    """(path, content) frame -> WARC_SCHEMA records via one Arrow-batched
    mapInPandas stage — shared by the batch scan and the streaming front
    (the parser is a pure per-file function, so the stage is legal and
    replay-deterministic in Structured Streaming)."""
    import pandas as pd

    def _parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = [f.name for f in WARC_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                rows.extend(parse_warc_bytes(p, bytes(content)))
            yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(_parse, schema=WARC_SCHEMA)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC scan: distributed `binaryFile` listing -> Arrow-batched
    per-file record parse. One row per record; quarantined parses carry
    `error` and NULL fields. Handles plain `.warc` and per-record-gzip
    `.warc.gz` transparently."""
    return _records(
        spark.read.format("binaryFile").load(path).select("path", "content")
    )


def stream_warc(spark: SparkSession, path: str) -> DataFrame:
    """Streaming twin of :func:`read_warc`: new crawl segments landing
    under ``path`` flow through the same parse stage (binaryFile IS a
    streaming file source; its schema must be declared). Pair with
    foreachBatch for the curation loop — see
    streaming/ingest_dedup.start_warc_curation."""
    files = (
        spark.readStream.format("binaryFile")
        .schema(_BINARYFILE_SCHEMA)
        .load(path)
        .select("path", "content")
    )
    return _records(files)
