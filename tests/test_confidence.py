"""Decode-confidence routing laws (pipeline.decode_confidence).

The driver row (transcribe_confidence) pins exact buckets/routes vs
the independent serial loop at sf0.01; here we pin the operator's
LAWS on the Spark path at a small fixture:

* route == 'accept'  <=>  conf_bucket >= CONFIDENCE_THRESHOLD
  (exact because the threshold is an integer: avg_lp >= T  <=>
  floor(avg_lp) >= T for integer T)
* both routes occur (the fixture's clean vs LM-mismatched page
  classes separate by >16 per-char units)
* every decoded page yields n_chars > 0 and a finite bucket
"""

import os

import pyarrow.parquet as pq
import pytest


@pytest.mark.usefixtures("spark")
def test_confidence_routing_laws(spark, sf_dir):
    from ocular_spark.fixtures import build_models, derive_docs_and_media
    from ocular_spark.pipeline import (
        CONFIDENCE_THRESHOLD,
        DOCS_DDL,
        decode_confidence,
    )

    assert CONFIDENCE_THRESHOLD == int(CONFIDENCE_THRESHOLD), (
        "threshold must stay integral or the bucket<->route law below "
        "(and the driver gate's drift argument) weakens"
    )
    documents = pq.read_table(
        os.path.join(sf_dir, "documents.parquet")
    ).to_pandas()
    docs, media = derive_docs_and_media(documents, n_docs=3, max_pages_per_doc=2)
    bundle, char_strs = build_models(documents)
    docs_df = spark.createDataFrame(docs, schema=DOCS_DDL)
    media_df = spark.createDataFrame(media[["media_ref", "n_lines", "lines"]])
    bundle_bc = spark.sparkContext.broadcast(bundle)

    rows = decode_confidence(docs_df, media_df, bundle_bc, char_strs).collect()
    assert len(rows) == sum(
        1 for r in docs.itertuples() for s in r.spans if s["kind"] == "media"
    )
    routes = set()
    for r in rows:
        assert r.n_chars > 0
        assert r.conf_bucket is not None
        expected = "accept" if r.conf_bucket >= CONFIDENCE_THRESHOLD else "review"
        assert r.route == expected, (r.doc_id, r.media_ref, r.conf_bucket)
        routes.add(r.route)
    assert routes == {"accept", "review"}
