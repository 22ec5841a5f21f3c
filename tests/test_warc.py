"""WARC source: multi-member gzip framing, record parse, HTTP split,
and the distributed ingest stage (sources/warc.py).

North-rule seam: the 10^12-document extraction corpus arrives as
Common Crawl-style .warc.gz (one gzip member per record); the
reference has no web-archive source, so these vectors pin the public
WARC/1.0 spec behaviors the parser relies on."""

import pytest

from ocular_spark.sources.warc import (
    ingest_warcs,
    parse_warc,
    split_http,
    write_warc,
)


def _sample_records():
    body = b"<html><body><p>hello warc</p></body></html>"
    resp = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Length: %d\r\n\r\n" % len(body)
    ) + body
    return [
        ("warcinfo", [], b"software: test\r\n"),
        (
            "request",
            [("WARC-Target-URI", "https://example.org/a")],
            b"GET /a HTTP/1.1\r\nHost: example.org\r\n\r\n",
        ),
        (
            "response",
            [("WARC-Target-URI", "https://example.org/a")],
            resp,
        ),
    ]


def test_roundtrip_gzip_members():
    blob = write_warc(_sample_records())
    # honest per-record gzip framing: 3 records -> 3 gzip magics
    assert blob.count(b"\x1f\x8b\x08") >= 3
    out = list(parse_warc(blob))
    assert [t for t, _, _ in out] == ["warcinfo", "request", "response"]
    assert out[1][1]["warc-target-uri"] == "https://example.org/a"
    # payload bytes survive exactly, including embedded CRLFCRLF
    assert out[2][2] == _sample_records()[2][2]


def test_payload_with_crlfcrlf_and_binary():
    """Content-Length slicing must not be confused by record-
    terminator look-alikes inside the payload."""
    tricky = b"\r\n\r\nWARC/1.0\r\n\x00\xff\r\n\r\n trailing"
    blob = write_warc([("resource", [], tricky)])
    (rec,) = list(parse_warc(blob))
    assert rec[2] == tricky


def test_uncompressed_warc_accepted():
    import zlib

    blob = write_warc(_sample_records())
    # concatenate the decompressed members into one plain .warc
    plain, pos = b"", 0
    while pos < len(blob):
        d = zlib.decompressobj(wbits=31)
        plain += d.decompress(blob[pos:]) + d.flush()
        pos = len(blob) - len(d.unused_data)
    out = list(parse_warc(plain))
    assert len(out) == 3


def test_truncated_member_raises():
    blob = write_warc(_sample_records())
    with pytest.raises(ValueError, match="truncated"):
        list(parse_warc(blob[:-10]))


def test_short_payload_raises():
    raw = b"WARC/1.0\r\nWARC-Type: resource\r\nContent-Length: 99\r\n\r\nshort"
    with pytest.raises(ValueError, match="shorter"):
        list(parse_warc(raw))


def test_split_http():
    status, headers, body = split_http(
        b"HTTP/1.1 301 Moved\r\nLocation: /b\r\n\r\n"
    )
    assert status == 301 and headers["location"] == "/b" and body == b""
    # non-HTTP payload passes through unsplit
    status, headers, body = split_http(b"not http at all")
    assert status is None and body == b"not http at all"


def test_ingest_warcs_spark(spark):
    import pandas as pd

    blob = write_warc(_sample_records())
    df = spark.createDataFrame(
        pd.DataFrame({"file_id": [0, 1], "warc": [blob, blob]})
    )
    rows = ingest_warcs(df).orderBy("file_id", "rec_idx").collect()
    assert len(rows) == 6
    r = rows[2]
    assert (r.rec_type, r.http_status, r.mime) == ("response", 200, "text/html")
    assert r.body == "<html><body><p>hello warc</p></body></html>"
    assert r.payload_len == len(b"<html><body><p>hello warc</p></body></html>")
    # non-response records carry the raw WARC payload length
    assert rows[0].rec_type == "warcinfo" and rows[0].http_status is None
    assert rows[0].payload_len == len(b"software: test\r\n")


def _mk_warc_file(tmp_path, name, pages):
    """pages: list of (url, html_body). Returns the file path."""
    recs = []
    for url, body in pages:
        b = body.encode()
        resp = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            b"Content-Length: %d\r\n\r\n" % len(b)
        ) + b
        recs.append(("response", [("WARC-Target-URI", url)], resp))
        # a non-200 and a non-html record that the job must skip
    recs.append(("request", [("WARC-Target-URI", "https://x/skip")],
                 b"GET /skip HTTP/1.1\r\n\r\n"))
    p = tmp_path / name
    p.write_bytes(write_warc(recs))
    return p


def _interleave_ref(body):
    """Independent reference for the img-split interleaving."""
    import re

    frags = re.split(r"(?i)<img[^>]*>", body)
    srcs = re.findall(r'(?i)<img[^>]*src="([^"]*)"[^>]*>', body)
    spans, off = [], 0
    for i, frag in enumerate(frags):
        spans.append(("text", frag, None, off)); off += 1
        if i < len(srcs):
            spans.append(("media", None, srcs[i], off)); off += 1
    return spans


def test_ingest_warc_job_end_to_end(spark, tmp_path):
    import argparse

    from ocular_spark.jobs.ingest_warc import run

    pages1 = [
        ("https://a/1", 'intro <IMG src="im/a.png"> middle '
                        '<img alt="x" src="im/b.png"/> tail'),
        ("https://a/2", "no images at all"),
    ]
    pages2 = [("https://b/1", '<img src="only.png">')]
    land = tmp_path / "land"; land.mkdir()
    _mk_warc_file(land, "f1.warc.gz", pages1)
    _mk_warc_file(land, "f2.warc.gz", pages2)
    out = str(tmp_path / "docs.parquet")
    met = str(tmp_path / "metrics.parquet")
    args = argparse.Namespace(
        warcs=str(land), output=out, metrics=met, resume_from=None,
        fail_if_empty=True, num_partitions=2,
    )
    run(spark, args)
    got = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    assert set(got) == {"https://a/1", "https://a/2", "https://b/1"}
    for url, body in pages1 + pages2:
        want = _interleave_ref(body)
        have = [(s.kind, s.text, s.media_ref, s.offset)
                for s in sorted(got[url].spans, key=lambda s: s.offset)]
        assert have == want, url
    assert got["https://a/1"].n_media == 2
    m = {r.src_file: r for r in spark.read.parquet(met).collect()}
    assert sum(r.n_docs for r in m.values()) == 3

    # resume: drop a new file in, re-run with --resume-from; snapshot
    # must append exactly the new doc (no duplicates of done docs)
    _mk_warc_file(land, "f3.warc.gz", [("https://c/1", "late arrival")])
    args2 = argparse.Namespace(
        warcs=str(land), output=out, metrics=None, resume_from=out,
        fail_if_empty=True, num_partitions=None,
    )
    run(spark, args2)
    snap = spark.read.parquet(out).collect()
    ids = [r.doc_id for r in snap]
    assert sorted(ids) == sorted(set(ids))  # no dup after append
    assert "https://c/1" in ids and len(ids) == 4
