"""PNG codec + whole-page pipeline path (preprocessing inside the
Spark kernel)."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from ocular_spark.functions.png import decode_gray_png, encode_gray_png


def test_png_roundtrip():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, size=(37, 61)).astype(np.uint8)
    data = encode_gray_png(img)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    out = decode_gray_png(data)
    np.testing.assert_array_equal(img, out)


def test_png_decodes_zlib_filters():
    # encode with filter 2 (Up) manually to exercise the unfilter path
    import struct
    import zlib

    img = np.tile(np.arange(16, dtype=np.uint8), (8, 1))
    h, w = img.shape
    raw = bytearray()
    prev = np.zeros(w, dtype=np.uint8)
    for r in range(h):
        raw.append(2)  # Up filter
        raw.extend(((img[r].astype(np.int64) - prev) % 256).astype(np.uint8).tobytes())
        prev = img[r]
    from ocular_spark.functions.png import _chunk, _SIGNATURE

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    data = (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(decode_gray_png(data), img)


def test_full_page_pipeline_matches_pre_extracted(spark, sf_dir):
    """The whole-page path (PNG -> straighten/crop/binarize/extract/
    resample -> decode) must read the same text as the pre-extracted
    path on clean fixtures."""
    from ocular_spark.fixtures import (
        build_models,
        derive_docs_and_media,
        media_lines_to_page_pngs,
    )
    from ocular_spark.pipeline import DOCS_DDL, ModelBundle, transcribe

    documents = pq.read_table(os.path.join(sf_dir, "documents.parquet")).to_pandas()
    docs, media = derive_docs_and_media(
        documents, n_docs=2, max_pages_per_doc=1, noise_levels=(0.0,)
    )
    pages = media_lines_to_page_pngs(media, skew=False)
    bundle, char_strs = build_models(documents)
    fast_bundle = ModelBundle(
        bundle.font_bytes, bundle.lm, beam_size=10, preprocess_em_restarts=20
    )

    docs_df = spark.createDataFrame(docs, schema=DOCS_DDL)
    bundle_bc = spark.sparkContext.broadcast(fast_bundle)

    lines_out = (
        transcribe(docs_df, spark.createDataFrame(media[["media_ref", "n_lines", "lines"]]),
                   bundle_bc, char_strs)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    pages_out = (
        transcribe(docs_df, spark.createDataFrame(pages), bundle_bc, char_strs)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )

    def texts(df):
        return [
            [(s["kind"], (s["text"] or "").split()) for s in spans]
            for spans in df["spans"]
        ]

    # token-level equality: the full-page path re-extracts line bands so
    # margins/pixel alignment may differ, but the words must match
    assert texts(lines_out) == texts(pages_out)
