"""Minimal grayscale PNG codec (pure stdlib: zlib + struct).

The reference reads page images via javax.imageio (ImageUtils.java);
this environment has no image library, so the media store's
``page_png`` column (FIXTURES.md §2) is written/read with this codec:
8-bit grayscale, non-interlaced, critical chunks only (PNG spec is
public: RFC 2083 / W3C).  Supports all five scanline filters on read,
writes filter 0.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_gray_png(img: np.ndarray) -> bytes:
    """img: (height, width) uint8 -> PNG bytes."""
    if img.ndim != 2:
        raise ValueError("expected 2-D grayscale array")
    h, w = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # bit depth 8, gray
    raw = b"".join(b"\x00" + img[r].astype(np.uint8).tobytes() for r in range(h))
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _unfilter(ftype: int, cur: np.ndarray, prev: np.ndarray) -> np.ndarray:
    if ftype == 0:
        return cur
    out = cur.astype(np.int64)
    if ftype == 2:  # Up
        return ((out + prev) % 256).astype(np.uint8)
    if ftype == 1:  # Sub
        acc = 0
        res = np.empty_like(cur)
        for i in range(len(cur)):
            acc = (cur[i] + acc) & 0xFF
            res[i] = acc
        return res
    if ftype == 3:  # Average
        res = np.empty_like(cur)
        left = 0
        for i in range(len(cur)):
            left = (cur[i] + ((left + int(prev[i])) >> 1)) & 0xFF
            res[i] = left
        return res
    if ftype == 4:  # Paeth
        res = np.empty_like(cur)
        left = 0
        upleft = 0
        for i in range(len(cur)):
            up = int(prev[i])
            p = left + up - upleft
            pa, pb, pc = abs(p - left), abs(p - up), abs(p - upleft)
            pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else upleft)
            left = (cur[i] + pred) & 0xFF
            res[i] = left
            upleft = up
        return res
    raise ValueError("unknown PNG filter %d" % ftype)


def decode_gray_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (height, width) uint8.  Grayscale 8-bit only."""
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(">IIBBBBB", payload)
            if depth != 8 or color != 0 or interlace != 0:
                raise ValueError("only 8-bit non-interlaced grayscale supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    raw = zlib.decompress(idat)
    stride = w + 1
    img = np.zeros((h, w), dtype=np.uint8)
    prev = np.zeros(w, dtype=np.uint8)
    for r in range(h):
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=r * stride)
        line = _unfilter(int(row[0]), row[1:].copy(), prev)
        img[r] = line
        prev = line
    return img
