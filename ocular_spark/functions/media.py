"""Multimodal binary columns: typed metadata + decode/resize/sample
kernels (training-data-pipeline operators over opaque media bytes).

Pattern (per the engine's media contract, pipeline.py): media travel
as opaque ``binary`` columns with typed metadata extracted by
Arrow-batched kernels — never per-row Python UDFs.  Three modalities:

* image — the engine's real path (functions/png.py pure-stdlib codec);
  here adds nearest-neighbor resize and metadata extraction.
* audio — REAL WAV (RIFF/PCM) encode/parse via the stdlib ``wave``
  module: metadata (sample rate / channels / width / n_frames) and a
  deterministic mel-free feature stub (frame RMS energy bands).
* video — this container has no video codec, so a clearly-marked
  DETERMINISTIC FAKE container format (``RAWV``: header + packed
  grayscale frames) stands in; ``sample_frames`` implements the real
  frame-sampling logic (uniform stride over the frame index) against
  it.  Real deployments swap the two ``_decode_rawv*`` functions for a
  proper demuxer; everything Spark-side (schemas, batching, kernel
  signatures) is unchanged and tested.
"""

from __future__ import annotations

import io
import struct
import wave
from typing import Iterator, List, Tuple

import numpy as np

# ---------------------------------------------------------------- image

def resize_gray(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor grayscale resize (vectorized index gather)."""
    h, w = img.shape
    yi = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    xi = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return img[yi[:, None], xi[None, :]]


# ---------------------------------------------------------------- audio

def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 mono PCM -> WAV bytes (stdlib wave — a real codec)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def wav_metadata(blob: bytes) -> Tuple[int, int, int, int]:
    """(sample_rate, n_channels, sample_width_bytes, n_frames)."""
    with wave.open(io.BytesIO(blob), "rb") as w:
        return w.getframerate(), w.getnchannels(), w.getsampwidth(), w.getnframes()


def wav_rms_bands(blob: bytes, n_bands: int = 4) -> np.ndarray:
    """Feature extraction: RMS energy over n_bands equal time slices
    (float64) — the vectorized stand-in for a real mel/MFCC frontend."""
    with wave.open(io.BytesIO(blob), "rb") as w:
        n = w.getnframes()
        raw = w.readframes(n)
    x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    if len(x) == 0:
        return np.zeros(n_bands)
    edges = (np.arange(n_bands + 1) * len(x)) // n_bands
    return np.array(
        [
            np.sqrt(np.mean(x[a:b] ** 2)) if b > a else 0.0
            for a, b in zip(edges[:-1], edges[1:])
        ]
    )


# ---------------------------------------------------------------- video
# RAWV deterministic fake container: b"RAWV" + <u16 h, u16 w, u16 n> +
# n grayscale frames of h*w uint8.  NOT a real codec — see module
# docstring; swap the two functions below for a demuxer in production.

def encode_rawv(frames: List[np.ndarray]) -> bytes:
    h, w = frames[0].shape
    out = bytearray(b"RAWV" + struct.pack("<HHH", h, w, len(frames)))
    for f in frames:
        if f.shape != (h, w):
            raise ValueError("inconsistent frame shapes")
        out += f.astype(np.uint8).tobytes()
    return bytes(out)


def rawv_metadata(blob: bytes) -> Tuple[int, int, int]:
    """(height, width, n_frames); raises on a non-RAWV payload (a real
    video codec is NOT available in this container)."""
    if blob[:4] != b"RAWV":
        raise NotImplementedError(
            "only the RAWV fixture container is decodable here; real video "
            "codecs are unavailable in this environment"
        )
    h, w, n = struct.unpack_from("<HHH", blob, 4)
    return h, w, n


def sample_frames(blob: bytes, k: int) -> List[np.ndarray]:
    """Uniform-stride frame sampling: k frames at indices
    floor(i * n / k) — the real sampling logic, over the fake codec."""
    h, w, n = rawv_metadata(blob)
    frame_sz = h * w
    out = []
    for i in range(min(k, n)):
        idx = (i * n) // min(k, n)
        off = 10 + idx * frame_sz
        out.append(
            np.frombuffer(blob, dtype=np.uint8, count=frame_sz, offset=off).reshape(h, w)
        )
    return out


# ------------------------------------------------- Spark-side kernels

AUDIO_META_SCHEMA = (
    "media_ref string, sample_rate int, n_channels int, sample_width int, "
    "n_frames int, rms_b0 double, rms_b1 double, rms_b2 double, rms_b3 double"
)


def audio_meta_kernel(batches: Iterator["object"]) -> Iterator["object"]:
    """mapInPandas: (media_ref, audio binary) -> typed metadata +
    4-band RMS features, one vectorized pass per Arrow batch."""
    import pandas as pd

    for pdf in batches:
        rows = []
        for ref, blob in zip(pdf["media_ref"], pdf["audio"]):
            sr, ch, sw, nf = wav_metadata(bytes(blob))
            bands = wav_rms_bands(bytes(blob), 4)
            rows.append((ref, sr, ch, sw, nf, *[float(b) for b in bands]))
        yield pd.DataFrame(
            rows,
            columns=[
                "media_ref", "sample_rate", "n_channels", "sample_width",
                "n_frames", "rms_b0", "rms_b1", "rms_b2", "rms_b3",
            ],
        )


def dhash_gray(img: np.ndarray, hash_h: int = 8, hash_w: int = 8) -> str:
    """Difference hash (dHash) of a grayscale image: resize to
    (hash_h, hash_w + 1) with the engine's nearest-neighbor gather,
    then bit (i, j) = 1 iff thumb[i][j] < thumb[i][j + 1].  Returned
    as a row-major '0'/'1' string (hash_h * hash_w chars) so the full
    64-bit hash needs no signed-overflow convention cross-engine.

    The hash is invariant under a uniform brightness offset (adding a
    constant to every pixel preserves every adjacent-pixel comparison
    as long as values stay in [0, 255] without wrap) — the property
    that lets it catch near-duplicate images exact byte-dedup misses."""
    thumb = resize_gray(img, hash_h, hash_w + 1).astype(np.int64)
    bits = thumb[:, :-1] < thumb[:, 1:]
    return "".join("1" if b else "0" for b in bits.ravel())


IMAGE_DHASH_SCHEMA = "media_ref string, doc_id bigint, dhash string"


def image_dhash_kernel(hash_h: int = 8, hash_w: int = 8):
    """mapInPandas factory: (doc_id, media_ref, image binary PNG) ->
    (media_ref, doc_id, dhash) via the real decode path
    (functions/png.py inflate/unfilter) + dhash_gray."""
    import pandas as pd

    from ocular_spark.functions.png import decode_gray_png

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for doc_id, ref, blob in zip(
                pdf["doc_id"], pdf["media_ref"], pdf["image"]
            ):
                img = decode_gray_png(bytes(blob))
                rows.append((ref, int(doc_id), dhash_gray(img, hash_h, hash_w)))
            yield pd.DataFrame(rows, columns=["media_ref", "doc_id", "dhash"])

    return fn


IMAGE_META_SCHEMA = (
    "media_ref string, height int, width int, out_h int, out_w int, "
    "px_min int, px_max int, px_sum bigint, px_wsum bigint"
)


def image_meta_kernel(out_h: int, out_w: int):
    """mapInPandas factory: (media_ref, image binary PNG) -> typed
    metadata + nearest-neighbor thumbnail integrity stats.

    The stats are all EXACT integers over the out_h x out_w thumbnail —
    min, max, sum, and a position-weighted sum (weight of thumbnail
    pixel (i, j) is i*out_w + j + 1) — so a cross-engine comparison
    needs no float rounding convention, and the weighted sum pins every
    pixel to its POSITION (a transposed or shifted thumbnail with the
    same histogram fails the gate)."""
    import pandas as pd

    from ocular_spark.functions.png import decode_gray_png

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        weights = np.arange(1, out_h * out_w + 1, dtype=np.int64).reshape(
            out_h, out_w
        )
        for pdf in batches:
            rows = []
            for ref, blob in zip(pdf["media_ref"], pdf["image"]):
                img = decode_gray_png(bytes(blob))
                h, w = img.shape
                thumb = resize_gray(img, out_h, out_w).astype(np.int64)
                rows.append(
                    (
                        ref, h, w, out_h, out_w,
                        int(thumb.min()), int(thumb.max()),
                        int(thumb.sum()), int((thumb * weights).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_ref", "height", "width", "out_h", "out_w",
                    "px_min", "px_max", "px_sum", "px_wsum",
                ],
            )

    return fn


VIDEO_FRAMES_SCHEMA = (
    "media_ref string, frame_idx int, height int, width int, mean_level double"
)


def video_sample_kernel(k: int):
    """mapInPandas factory: (media_ref, video binary) -> k sampled
    frames per video with per-frame stats (page-expansion shape, like
    sources/pdf.ingest_pdfs)."""
    import pandas as pd

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for ref, blob in zip(pdf["media_ref"], pdf["video"]):
                for i, frame in enumerate(sample_frames(bytes(blob), k)):
                    rows.append(
                        (ref, i, frame.shape[0], frame.shape[1], float(frame.mean()))
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_ref", "frame_idx", "height", "width", "mean_level"],
            )

    return fn
