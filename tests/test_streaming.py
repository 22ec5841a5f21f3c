"""Structured Streaming surface tests.

* transcribe_pages_stream: exactly-once incremental decode with
  checkpoint resume — new page files decode on restart, old ones do
  NOT re-decode, and the streamed span text equals the batch
  pipeline's output for the same pages.
* sessionize_stream: native session-window aggregation agrees with
  the batch gaps-and-islands query per (user, session).
"""

import os


def _fixture(sf_dir):
    import pyarrow.parquet as pq

    from ocular_spark.fixtures import build_models, derive_docs_and_media

    documents = pq.read_table(os.path.join(sf_dir, "documents.parquet")).to_pandas()
    docs, media = derive_docs_and_media(documents, n_docs=6, max_pages_per_doc=2)
    bundle, char_strs = build_models(documents)
    return docs, media, bundle, char_strs


def _pages_rows(docs, media):
    """(doc_id, media_ref, offset, lines) one row per page."""
    by_ref = {r.media_ref: list(r.lines) for r in media.itertuples()}
    rows = []
    for r in docs.itertuples():
        for s in r.spans:
            if s["kind"] == "media":
                rows.append(
                    (r.doc_id, s["media_ref"], s["offset"], by_ref[s["media_ref"]])
                )
    return rows


def test_transcribe_stream_incremental_and_resume(spark, sf_dir, tmp_path):
    from ocular_spark.fixtures import oracle_transcribe_pandas
    from ocular_spark.streaming.jobs import PAGES_DDL, transcribe_pages_stream

    docs, media, bundle, char_strs = _fixture(sf_dir)
    rows = _pages_rows(docs, media)
    assert len(rows) >= 4
    first, second = rows[:-2], rows[-2:]

    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(pages_dir)
    bundle_bc = spark.sparkContext.broadcast(bundle)

    # the file source watches a flat dir; write each micro-batch as
    # files within it (append = new files)
    spark.createDataFrame(first, PAGES_DDL).coalesce(1).write.mode(
        "append"
    ).parquet(pages_dir)
    q = transcribe_pages_stream(
        spark, pages_dir, out_dir, ckpt, bundle_bc, char_strs
    )
    q.awaitTermination(300)
    out1 = spark.read.parquet(out_dir)
    assert out1.count() == len(first)

    # restart with two NEW pages appended: only they get decoded
    spark.createDataFrame(second, PAGES_DDL).coalesce(1).write.mode(
        "append"
    ).parquet(pages_dir)
    q2 = transcribe_pages_stream(
        spark, pages_dir, out_dir, ckpt, bundle_bc, char_strs
    )
    q2.awaitTermination(300)
    out2 = spark.read.parquet(out_dir)
    assert out2.count() == len(rows)  # exactly once: no re-decodes

    # streamed text == the in-process oracle text span-for-span
    oracle = oracle_transcribe_pandas(docs, media, bundle, char_strs)
    want = {
        (r.doc_id, s["media_ref"]): s["text"]
        for r in oracle.itertuples()
        for s in r.spans
        if s["kind"] == "media"
    }
    got = {
        (r.doc_id, r.media_ref): r.text
        for r in out2.select("doc_id", "media_ref", "text").collect()
    }
    assert got == want


def test_sessionize_stream_matches_batch(spark, sf_dir, tmp_path):
    from __spark_entry__ import _sessionize
    from ocular_spark.streaming.jobs import sessionize_stream

    events = (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        .select("user_id", "event_id", "ts", "value")
        .limit(2000)
    )
    epd = events.toPandas()
    src = str(tmp_path / "events")
    events.coalesce(2).write.parquet(src)

    stream = spark.readStream.schema(
        "user_id long, event_id long, ts timestamp_ntz, value double"
    ).parquet(src)
    # watermarks require TIMESTAMP (tz-adjusted); the constant session-tz
    # shift cannot move a gap across the 30-minute boundary
    from pyspark.sql import functions as F

    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    sessions = sessionize_stream(stream)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = (
        spark.table("sess_stream")
        .groupBy("user_id")
        .count()
        .toPandas()
        .set_index("user_id")["count"]
        .to_dict()
    )
    want_df = _sessionize(spark.createDataFrame(epd)).toPandas()
    want = want_df.set_index("user_id")["n_sessions"].to_dict()
    # boundary caveat: gap == exactly 1800.000000s differs by design;
    # the synthetic events have microsecond-random timestamps, so the
    # two rules agree exactly here
    assert got == want
