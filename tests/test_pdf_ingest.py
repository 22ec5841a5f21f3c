"""PDF ingest source (S3): pdf -> page rows -> decoded spans.

Reference seam: data/PdfImageReader.java:23-93 (page render) +
data/LazyRawPdfImageDocument.java (per-page expansion)."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from ocular_spark.sources.pdf import (
    extract_pdf_page_images,
    ingest_pdfs,
    write_gray_pdf,
)


def test_pdf_roundtrip_and_subset_errors():
    rng = np.random.RandomState(7)
    pages = [
        rng.randint(0, 256, size=(40, 60)).astype(np.uint8),
        rng.randint(0, 256, size=(30, 50)).astype(np.uint8),
    ]
    pdf = write_gray_pdf(pages)
    out = extract_pdf_page_images(pdf)
    assert len(out) == 2
    for a, b in zip(pages, out):
        np.testing.assert_array_equal(a, b)
    with pytest.raises(ValueError):
        extract_pdf_page_images(b"not a pdf")
    # unsupported filter raises rather than silently garbling
    bad = pdf.replace(b"/Filter /FlateDecode", b"/Filter /DCTDecode")
    with pytest.raises(NotImplementedError):
        extract_pdf_page_images(bad)


def test_pdf_ingest_to_decoded_spans(spark, sf_dir):
    """End-to-end: synthetic 2-page PDF -> ingest_pdfs (Spark page
    expansion) -> whole-page preprocessing + decode -> token-level
    equality with the pre-extracted-lines path."""
    from ocular_spark.fixtures import (
        build_models,
        derive_docs_and_media,
        media_lines_to_page_pngs,
    )
    from ocular_spark.functions.png import decode_gray_png
    from ocular_spark.pipeline import DOCS_DDL, ModelBundle, transcribe

    documents = pq.read_table(os.path.join(sf_dir, "documents.parquet")).to_pandas()
    docs, media = derive_docs_and_media(
        documents, n_docs=1, max_pages_per_doc=2, noise_levels=(0.0,)
    )
    pages = media_lines_to_page_pngs(media, skew=False)
    assert len(pages) == 2  # a 2-page document
    bundle, char_strs = build_models(documents)
    fast_bundle = ModelBundle(
        bundle.font_bytes, bundle.lm, beam_size=10, preprocess_em_restarts=20,
        transition_model=bundle.transition_model,
    )

    # one PDF holding both pages, keyed by the doc id
    doc_id = docs.iloc[0]["doc_id"]
    page_arrays = [decode_gray_png(bytes(p)) for p in pages["page_png"]]
    pdf = write_gray_pdf(page_arrays)
    pdfs_df = spark.createDataFrame([(doc_id, bytearray(pdf))], "doc_id string, pdf binary")

    ingested = ingest_pdfs(pdfs_df)
    rows = ingested.collect()
    assert [r.page_idx for r in rows] == [0, 1]
    # media_refs from ingest follow the fixture convention m-<doc>-<k>
    media_from_pdf = ingested.select("media_ref", "page_idx", "page_png").withColumnRenamed(
        "page_idx", "n_lines"  # schema slot unused by the png path
    )

    docs_df = spark.createDataFrame(docs, schema=DOCS_DDL)
    bundle_bc = spark.sparkContext.broadcast(fast_bundle)

    lines_out = (
        transcribe(docs_df, spark.createDataFrame(media[["media_ref", "n_lines", "lines"]]),
                   bundle_bc, char_strs)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    pdf_out = (
        transcribe(docs_df, media_from_pdf, bundle_bc, char_strs)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )

    def texts(df):
        return [
            [(s["kind"], (s["text"] or "").split()) for s in spans]
            for spans in df["spans"]
        ]

    assert texts(pdf_out) == texts(lines_out)
