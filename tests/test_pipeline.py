"""Spark pipeline parity: the distributed transcription must equal the
single-process oracle span-for-span — the BASELINE.json correctness
gate: span-sequence equality (kind, text, media_ref, order) per doc.

local[2] with pinned shuffle partitions (FIXTURES.md §8)."""

import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from ocular_spark.fixtures import (
    build_models,
    derive_docs_and_media,
    oracle_transcribe_pandas,
)
from ocular_spark.pipeline import DOCS_DDL, transcribe, decode_metrics


@pytest.fixture(scope="module")
def small_fixture(sf_dir):
    documents = pq.read_table(os.path.join(sf_dir, "documents.parquet")).to_pandas()
    docs, media = derive_docs_and_media(documents, n_docs=6, max_pages_per_doc=2)
    bundle, char_strs = build_models(documents)
    return docs, media, bundle, char_strs


def _spans_tuples(spans):
    # the invariant: ordered list of (kind, text, media_ref)
    return [(s["kind"], s["text"], s["media_ref"]) for s in spans]


def test_spark_matches_oracle_span_sequence(spark, small_fixture):
    docs, media, bundle, char_strs = small_fixture
    oracle = oracle_transcribe_pandas(docs, media, bundle, char_strs)

    docs_df = spark.createDataFrame(docs, schema=DOCS_DDL)
    media_df = spark.createDataFrame(media[["media_ref", "n_lines", "lines"]])
    bundle_bc = spark.sparkContext.broadcast(bundle)

    out = transcribe(docs_df, media_df, bundle_bc, char_strs)
    result = out.toPandas().sort_values("doc_id").reset_index(drop=True)

    assert list(result["doc_id"]) == list(oracle["doc_id"])
    for got, want, doc_id in zip(result["spans"], oracle["spans"], result["doc_id"]):
        got_t = [(s["kind"], s["text"], s["media_ref"]) for s in got]
        want_t = _spans_tuples(want)
        assert got_t == want_t, doc_id


def test_media_text_decodes_correctly(spark, small_fixture):
    """At low noise the self-rendered pages decode to their source text."""
    docs, media, bundle, char_strs = small_fixture
    oracle = oracle_transcribe_pandas(docs, media, bundle, char_strs)
    src = {r.media_ref: (r.src_text, r.noise) for r in media.itertuples()}
    n_checked = 0
    for spans in oracle["spans"]:
        for s in spans:
            if s["kind"] == "media" and src[s["media_ref"]][1] <= 0.02:
                want = src[s["media_ref"]][0]
                got = "\n".join(l.strip() for l in s["text"].split("\n"))
                assert got == want, s["media_ref"]
                n_checked += 1
    assert n_checked > 0


def test_anti_join_resume(spark, small_fixture):
    docs, media, bundle, char_strs = small_fixture
    docs_df = spark.createDataFrame(docs, schema=DOCS_DDL)
    media_df = spark.createDataFrame(media[["media_ref", "n_lines", "lines"]])
    bundle_bc = spark.sparkContext.broadcast(bundle)
    done = docs_df.select("doc_id").limit(3)
    out = transcribe(docs_df, media_df, bundle_bc, char_strs, skip_already_transcribed=done)
    remaining = out.select("doc_id").toPandas()
    done_ids = set(r.doc_id for r in done.collect())
    assert set(remaining["doc_id"]).isdisjoint(done_ids)
    assert len(remaining) == len(docs) - len(done_ids)


def test_decode_metrics_lineage(spark, small_fixture):
    docs, media, bundle, char_strs = small_fixture
    docs_df = spark.createDataFrame(docs, schema=DOCS_DDL)
    media_df = spark.createDataFrame(media[["media_ref", "n_lines", "lines"]])
    bundle_bc = spark.sparkContext.broadcast(bundle)
    m = decode_metrics(docs_df, media_df, bundle_bc, char_strs).toPandas()
    n_media = sum(
        1 for spans in docs["spans"] for s in spans if s["kind"] == "media"
    )
    assert len(m) == n_media
    assert (m["n_lines"] >= 1).all()
    assert m["log_prob"].notna().all()
    # per-partition lineage (north_rule): every page reports the task
    # partition that decoded it and its wall-clock
    assert (m["partition_id"] >= 0).all()
    assert (m["decode_sec"] > 0).all()


def test_pipeline_plan_has_no_cartesian_and_prunes(spark, small_fixture):
    docs, media, bundle, char_strs = small_fixture
    docs_df = spark.createDataFrame(docs, schema=DOCS_DDL)
    media_df = spark.createDataFrame(media[["media_ref", "n_lines", "lines"]])
    bundle_bc = spark.sparkContext.broadcast(bundle)
    out = transcribe(docs_df, media_df, bundle_bc, char_strs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_code_switch_gsm_spark_path(spark, sf_dir):
    """O12 end-to-end on Spark: bilingual pages decode through the
    CodeSwitchTransitionModel + uniform GSM shipped in the broadcast;
    output must (a) equal the single-process oracle span-for-span,
    (b) preserve the rendered LONG-S diplomatically, and (c) read the
    reversed-language line verbatim (code switch mid-page)."""
    from ocular_spark.fixtures import (
        build_models_cs,
        derive_docs_and_media_cs,
        reverse_words,
    )

    documents = pq.read_table(os.path.join(sf_dir, "documents.parquet")).to_pandas()
    docs, media = derive_docs_and_media_cs(documents, n_docs=3)
    bundle, char_strs = build_models_cs(documents)
    oracle = oracle_transcribe_pandas(docs, media, bundle, char_strs)

    docs_df = spark.createDataFrame(docs, schema=DOCS_DDL)
    media_df = spark.createDataFrame(media[["media_ref", "n_lines", "lines"]])
    bundle_bc = spark.sparkContext.broadcast(bundle)
    out = transcribe(docs_df, media_df, bundle_bc, char_strs)
    result = out.toPandas().sort_values("doc_id").reset_index(drop=True)

    assert list(result["doc_id"]) == list(oracle["doc_id"])
    all_media_text = []
    for got, want in zip(result["spans"], oracle["spans"]):
        got_t = [(s["kind"], s["text"], s["media_ref"]) for s in got]
        assert got_t == _spans_tuples(want)
        all_media_text += [s["text"] for s in got if s["kind"] == "media"]
    joined = "\n".join(all_media_text)
    assert "ſ" in joined  # GSM long-s decoded diplomatically
    # each page's second line is the reversed-language source text
    for r, got_spans in zip(media.itertuples(), result["spans"]):
        line1 = r.src_text.split("\n")[1]
        media_text = [s["text"] for s in got_spans if s["kind"] == "media"][0]
        assert line1.strip() in media_text.replace("  ", " ")


def test_markov_offset_spark_path(spark, sf_dir):
    """O13 end-to-end on Spark: vertically shifted lines decode
    cleanly through the explicit-offset variant, matching the
    single-process oracle and the unshifted source text."""
    from ocular_spark.fixtures import (
        build_models_offset,
        derive_docs_and_media_offset,
    )

    documents = pq.read_table(os.path.join(sf_dir, "documents.parquet")).to_pandas()
    docs, media = derive_docs_and_media_offset(documents, n_docs=3)
    bundle, char_strs = build_models_offset(documents)
    oracle = oracle_transcribe_pandas(docs, media, bundle, char_strs)

    docs_df = spark.createDataFrame(docs, schema=DOCS_DDL)
    media_df = spark.createDataFrame(media[["media_ref", "n_lines", "lines"]])
    bundle_bc = spark.sparkContext.broadcast(bundle)
    out = transcribe(docs_df, media_df, bundle_bc, char_strs)
    result = out.toPandas().sort_values("doc_id").reset_index(drop=True)

    assert list(result["doc_id"]) == list(oracle["doc_id"])
    for got, want in zip(result["spans"], oracle["spans"]):
        got_t = [(s["kind"], s["text"], s["media_ref"]) for s in got]
        assert got_t == _spans_tuples(want)
    # decoded text matches the unshifted source lines
    for r, got_spans in zip(media.itertuples(), result["spans"]):
        media_text = [s["text"] for s in got_spans if s["kind"] == "media"][0]
        decoded_lines = [l.strip() for l in media_text.split("\n")]
        src_lines = [l.strip() for l in r.src_text.split("\n")]
        assert decoded_lines == src_lines, (r.media_ref, decoded_lines, src_lines)


def test_fail_if_empty_raises_when_resume_covers_everything(spark, small_fixture):
    """F3: the reference throws NoDocumentsToProcessException instead
    of silently writing an empty output (main/Transcribe.java)."""
    from ocular_spark.pipeline import NoDocumentsToProcessError

    docs, media, bundle, char_strs = small_fixture
    docs_df = spark.createDataFrame(docs, schema=DOCS_DDL)
    media_df = spark.createDataFrame(media[["media_ref", "n_lines", "lines"]])
    bundle_bc = spark.sparkContext.broadcast(bundle)
    done = docs_df.select("doc_id")  # everything already transcribed
    with pytest.raises(NoDocumentsToProcessError):
        transcribe(
            docs_df, media_df, bundle_bc, char_strs,
            skip_already_transcribed=done, fail_if_empty=True,
        )
    # without the flag: empty result, no raise (round-1 behavior)
    out = transcribe(
        docs_df, media_df, bundle_bc, char_strs, skip_already_transcribed=done
    )
    assert out.count() == 0


def test_decoder_memo_keys_by_bundle_identity_not_address(sf_dir):
    """Regression (r3): get_decoder memoized by id(bundle); a reused
    python worker could recycle a freed bundle's address for a NEW
    model generation and silently decode with the OLD model.  The memo
    must key on the construction-time bundle_key, so (a) a pickle
    round-trip of the SAME bundle hits the cache, while (b) a
    different bundle misses it."""
    import os
    import pickle

    import pyarrow.parquet as pq

    from ocular_spark.fixtures import build_models
    from ocular_spark.pipeline import get_decoder

    documents = pq.read_table(os.path.join(sf_dir, "documents.parquet")).to_pandas()
    bundle, _ = build_models(documents)
    d1 = get_decoder(bundle)
    clone = pickle.loads(pickle.dumps(bundle))
    assert clone.bundle_key == bundle.bundle_key
    assert get_decoder(clone) is d1  # same generation -> cache hit
    from ocular_spark.pipeline import ModelBundle

    other = ModelBundle(bundle.font_bytes, bundle.lm, beam_size=bundle.beam_size)
    assert other.bundle_key != bundle.bundle_key
    assert get_decoder(other) is not d1  # new generation -> fresh decoder
