"""PDF page ingest (S3): pdf binary -> per-page grayscale page rows.

Re-expresses the reference's PDF source seam Spark-first:
``data/PdfImageReader.java:23-93`` renders each PDF page to a
BufferedImage (via JPedal) and ``data/LazyRawPdfImageDocument.java``
expands one PDF into one Document per page.  Here the ingest is a
Spark job: a (doc_id, pdf) table maps — Arrow-batched, no per-row
Python rows — to (doc_id, media_ref, page_idx, page_png) rows that
feed the whole-page preprocessing path of pipeline.transcribe.

This container has no PDF rendering library, so the parser implements
an honest SUBSET of PDF 1.4 sufficient for image-per-page documents
(the scanned-book shape Ocular consumes): one DeviceGray Image
XObject per page, /FlateDecode or uncompressed streams, 8 bits per
component.  Anything else raises NotImplementedError — the Spark-side
plumbing (schema, page expansion, batching) is the real, tested part,
and a production deployment would swap `_render_page` for a real
rasterizer exactly as the reference swaps JPedal.

The writer exists so fixtures/tests can synthesize deterministic PDFs
without external data.
"""

from __future__ import annotations

import re
import zlib
from typing import Iterator, List, Tuple

import numpy as np

_OBJ_HDR_RE = re.compile(rb"(\d+)\s+0\s+obj\b")
_STREAM_START_RE = re.compile(rb"stream\r?\n")
_NUM = rb"(\d+)"


def write_gray_pdf(pages: List[np.ndarray]) -> bytes:
    """Minimal PDF 1.4 writer: one full-page 8-bit DeviceGray Image
    XObject per page (FlateDecode), valid xref.  `pages` are (h, w)
    uint8 arrays (row-major, y down)."""
    objs: List[bytes] = []  # 1-indexed object bodies, in object order

    def ref(i: int) -> bytes:
        return b"%d 0 R" % i

    n_pages = len(pages)
    # object layout: 1=Catalog, 2=Pages, then per page: Page, Contents,
    # Image  (3 objects per page)
    page_obj = lambda k: 3 + 3 * k
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")  # 1
    kids = b"[" + b" ".join(ref(page_obj(k)) for k in range(n_pages)) + b"]"
    objs.append(
        b"<< /Type /Pages /Kids " + kids + b" /Count %d >>" % n_pages
    )  # 2
    for k, img in enumerate(pages):
        if img.dtype != np.uint8 or img.ndim != 2:
            raise ValueError("pages must be 2-D uint8 arrays")
        h, w = img.shape
        pid, cid, iid = page_obj(k), page_obj(k) + 1, page_obj(k) + 2
        objs.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %d %d] "
            b"/Contents %s /Resources << /XObject << /Im%d %s >> >> >>"
            % (w, h, ref(cid), k, ref(iid))
        )
        content = b"q %d 0 0 %d 0 0 cm /Im%d Do Q" % (w, h, k)
        objs.append(
            b"<< /Length %d >>\nstream\n" % len(content) + content + b"\nendstream"
        )
        data = zlib.compress(img.tobytes())
        objs.append(
            b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
            b"/ColorSpace /DeviceGray /BitsPerComponent 8 "
            b"/Filter /FlateDecode /Length %d >>\nstream\n" % (w, h, len(data))
            + data
            + b"\nendstream"
        )

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(out)


def _parse_dict_int(d: bytes, key: bytes) -> int:
    m = re.search(rb"/" + key + rb"\s+" + _NUM, d)
    if not m:
        raise NotImplementedError("PDF image missing /%s" % key.decode())
    return int(m.group(1))


def extract_pdf_page_images(pdf: bytes) -> List[np.ndarray]:
    """Parse the supported PDF subset back to (h, w) uint8 page arrays,
    in page order.  Raises NotImplementedError on unsupported filters /
    color spaces — see module docstring."""
    if not pdf.startswith(b"%PDF"):
        raise ValueError("not a PDF")
    images: List[Tuple[int, np.ndarray]] = []
    # iterate object headers; slice each stream by its /Length so that
    # compressed bytes containing 'endobj'/'endstream' cannot confuse
    # the parse
    hdrs = list(_OBJ_HDR_RE.finditer(pdf))
    for hi, m in enumerate(hdrs):
        obj_num = int(m.group(1))
        end = hdrs[hi + 1].start() if hi + 1 < len(hdrs) else len(pdf)
        sm = _STREAM_START_RE.search(pdf, m.end(), end)
        dict_end = sm.start() if sm else end
        body = pdf[m.end() : dict_end]
        if b"/Subtype /Image" not in body and b"/Subtype/Image" not in body:
            continue
        w = _parse_dict_int(body, b"Width")
        h = _parse_dict_int(body, b"Height")
        bpc = _parse_dict_int(body, b"BitsPerComponent")
        length = _parse_dict_int(body, b"Length")
        if bpc != 8:
            raise NotImplementedError("only 8-bit images supported")
        if b"/DeviceGray" not in body:
            raise NotImplementedError("only /DeviceGray images supported")
        if sm is None:
            raise ValueError("image object %d has no stream" % obj_num)
        raw = pdf[sm.end() : sm.end() + length]
        if b"/FlateDecode" in body:
            raw = zlib.decompress(raw)
        elif b"/Filter" in body:
            raise NotImplementedError("unsupported stream filter")
        if len(raw) < w * h:
            raise ValueError("truncated image stream")
        images.append((obj_num, np.frombuffer(raw[: w * h], dtype=np.uint8).reshape(h, w)))
    images.sort(key=lambda t: t[0])  # writer emits in page order
    return [img for _, img in images]


PDF_PAGES_SCHEMA = "doc_id string, media_ref string, page_idx int, page_png binary"


def pdf_pages_kernel(batches: Iterator["object"]) -> Iterator["object"]:
    """mapInPandas kernel: rows (doc_id, pdf) -> one row per page
    (doc_id, media_ref, page_idx, page_png).  The page expansion of
    LazyRawPdfImageDocument.java as a distributed flatMap."""
    import pandas as pd

    from ocular_spark.functions.png import encode_gray_png

    for pdf_batch in batches:
        out = []
        for doc_id, blob in zip(pdf_batch["doc_id"], pdf_batch["pdf"]):
            for k, img in enumerate(extract_pdf_page_images(bytes(blob))):
                out.append(
                    (
                        str(doc_id),
                        "m-%s-%02d" % (doc_id, k),
                        k,
                        encode_gray_png(img),
                    )
                )
        yield pd.DataFrame(
            out, columns=["doc_id", "media_ref", "page_idx", "page_png"]
        )


def ingest_pdfs(pdfs_df):
    """(doc_id, pdf: binary) DataFrame -> (doc_id, media_ref, page_idx,
    page_png) DataFrame.  Pages of one PDF land in one task (a PDF must
    be parsed whole), but page-level downstream repartitioning in
    transcribe() redistributes the decode cost, so a 40-page PDF does
    not serialize 40 pages of OCR onto one core."""
    return pdfs_df.select("doc_id", "pdf").mapInPandas(
        pdf_pages_kernel, schema=PDF_PAGES_SCHEMA
    )
