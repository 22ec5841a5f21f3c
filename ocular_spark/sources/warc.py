"""WARC web-archive ingest: .warc.gz bytes -> per-record rows.

The north rule targets main-content extraction over 10^12 interleaved
web documents; at that scale the raw input is WARC (ISO 28500), the
Common Crawl container: a file is a concatenation of records, each
record a WARC header block + payload, and each record compressed as
its OWN gzip member so readers can seek to a record boundary without
decompressing the whole file.  This module gives that seam a real,
tested Spark shape:

* ``write_warc`` — deterministic writer (fixtures/tests only): one
  gzip member per record, mtime=0 so bytes are reproducible.
* ``parse_warc`` — honest parser: splits gzip members with a
  ``zlib.decompressobj(wbits=31)`` loop on ``unused_data`` (also
  accepts an uncompressed WARC), then parses each record's version
  line, header block, and Content-Length-delimited payload.  For
  ``response`` records the HTTP message is split at the first CRLFCRLF
  into status line / headers / body.
* ``ingest_warcs`` — the distributed stage: a (file_id, warc) binary
  DataFrame maps, Arrow-batched via ``mapInPandas`` (no per-row Python
  rows at the Spark layer), to one row per WARC record.

100 TB shape: one WARC file parses whole within its task (a ~1 GB
.warc.gz is the Common Crawl unit and fits task memory as a stream;
random access inside a file needs the companion CDX index, which is
out of scope here), and records re-expand as rows, so downstream
stages repartition at record granularity — the same expand-then-
rebalance pattern as sources/pdf.py page expansion.  Everything after
the parse is ordinary columnar data; the binary never shuffles unless
a downstream stage asks for payload bytes.

The reference has no web-archive source (its sources are image
folders and PDFs, e.g. data/LazyRawImageLoader.java); this seam is
the north-rule extraction tier's input format, built from the public
WARC/1.0 spec.
"""

from __future__ import annotations

import gzip
import zlib
from typing import Iterator, List, Optional, Tuple

CRLF = b"\r\n"

# (rec_type, warc_headers, payload)
Record = Tuple[str, List[Tuple[str, str]], bytes]


def write_warc(records: List[Record]) -> bytes:
    """Serialize records as a .warc.gz: per record, a WARC/1.0 header
    block + payload + trailing CRLFCRLF, gzip-compressed as its own
    member (mtime=0 for byte determinism)."""
    out = []
    for rec_type, headers, payload in records:
        head = [b"WARC/1.0"]
        head.append(b"WARC-Type: " + rec_type.encode("ascii"))
        for k, v in headers:
            if k.lower() in ("warc-type", "content-length"):
                raise ValueError(f"reserved WARC header: {k}")
            head.append(k.encode("ascii") + b": " + v.encode("utf-8"))
        head.append(b"Content-Length: %d" % len(payload))
        raw = CRLF.join(head) + CRLF + CRLF + payload + CRLF + CRLF
        out.append(gzip.compress(raw, mtime=0))
    return b"".join(out)


def _gzip_members(data: bytes) -> Iterator[bytes]:
    """Decompress a multi-member gzip stream one member at a time
    (unused_data after EOF is the start of the next member)."""
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        chunk = d.decompress(data[pos:])
        if not d.eof:
            raise ValueError("truncated gzip member in WARC stream")
        yield chunk + d.flush()
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError("empty gzip member in WARC stream")
        pos += consumed


def _parse_records(raw: bytes) -> Iterator[Tuple[str, dict, bytes]]:
    """Parse concatenated uncompressed WARC records: yields
    (rec_type, headers_lowercased, payload)."""
    pos = 0
    while pos < len(raw):
        # tolerate inter-record CRLF padding
        while raw.startswith(CRLF, pos):
            pos += 2
        if pos >= len(raw):
            return
        end_head = raw.find(CRLF + CRLF, pos)
        if end_head < 0:
            raise ValueError("WARC record without header terminator")
        head = raw[pos:end_head].decode("utf-8")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"bad WARC version line: {lines[0]!r}")
        headers = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers["content-length"])
        body_start = end_head + 4
        payload = raw[body_start : body_start + length]
        if len(payload) != length:
            raise ValueError("WARC payload shorter than Content-Length")
        yield headers.get("warc-type", ""), headers, payload
        pos = body_start + length


def parse_warc(data: bytes) -> Iterator[Tuple[str, dict, bytes]]:
    """Parse .warc.gz (multi-member) or plain .warc bytes into
    (rec_type, headers, payload) tuples, in file order."""
    if data[:2] == b"\x1f\x8b":
        for member in _gzip_members(data):
            yield from _parse_records(member)
    else:
        yield from _parse_records(data)


def split_http(payload: bytes) -> Tuple[Optional[int], dict, bytes]:
    """Split an HTTP message payload into (status, headers, body).
    Returns (None, {}, payload) when there is no HTTP envelope."""
    sep = payload.find(CRLF + CRLF)
    if sep < 0 or not payload.startswith(b"HTTP/"):
        return None, {}, payload
    head = payload[:sep].decode("utf-8", errors="replace")
    lines = head.split("\r\n")
    try:
        status = int(lines[0].split(" ")[1])
    except (IndexError, ValueError):
        return None, {}, payload
    headers = {}
    for line in lines[1:]:
        k, _, v = line.partition(":")
        headers[k.strip().lower()] = v.strip()
    return status, headers, payload[sep + 4 :]


INGEST_SCHEMA = (
    "file_id long, rec_idx long, rec_type string, url string, "
    "http_status long, mime string, payload_len long, body string"
)


def ingest_warcs(warcs):
    """(file_id, warc binary) DataFrame -> one row per WARC record:
    (file_id, rec_idx, rec_type, url, http_status, mime, payload_len,
    body).  For response records payload_len/body describe the HTTP
    BODY (the document); for other record types payload_len is the
    raw WARC payload length and body is NULL.  Arrow-batched."""

    def kernel(batches):
        import pandas as pd

        for b in batches:
            rows = []
            for file_id, blob in zip(b["file_id"], b["warc"]):
                for i, (rec_type, headers, payload) in enumerate(
                    parse_warc(bytes(blob))
                ):
                    url = headers.get("warc-target-uri")
                    if rec_type == "response":
                        status, hh, body = split_http(payload)
                        mime = hh.get("content-type")
                        rows.append(
                            (int(file_id), i, rec_type, url, status,
                             mime, len(body),
                             body.decode("utf-8", errors="replace"))
                        )
                    else:
                        rows.append(
                            (int(file_id), i, rec_type, url, None,
                             None, len(payload), None)
                        )
            yield pd.DataFrame(
                rows,
                columns=["file_id", "rec_idx", "rec_type", "url",
                         "http_status", "mime", "payload_len", "body"],
            )

    return warcs.mapInPandas(kernel, schema=INGEST_SCHEMA)
