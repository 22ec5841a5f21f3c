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
    # the 1800999999-microsecond session-window gap is the exact
    # streaming equivalent of the batch second-truncated `> 1800` rule
    # under Spark's end-INCLUSIVE window merging, so the two paths
    # agree for EVERY input (test_session_gap_boundary pins the
    # boundary microseconds; rationale in ocular_spark/streaming/jobs.py)
    assert got == want


def test_session_gap_boundary(spark, tmp_path):
    """Pin the batch/streaming agreement at the session boundary.

    The batch rule `timestampdiff(SECOND, prev, ts) > 1800` truncates
    to whole seconds: a new session starts iff the true gap is
    >= 1801.000000 s.  Spark's streaming session windows merge
    end-INCLUSIVELY (an event landing exactly ON a window's end
    extends it), so the equivalent streaming gap is 1800999999
    MICROSECONDS: merge iff gap <= 1800.999999 s ⟺ split iff
    gap >= 1801.000000 s — the same microsecond as the batch rule
    (rationale: ocular_spark/streaming/jobs.py sessionize_stream).
    Three crafted users, one event pair each:
      u1 gap 1800.000000 s  -> one session on both paths
      u2 gap 1800.999999 s  -> one session on both paths (truncation!)
      u3 gap 1801.000000 s  -> two sessions on both paths
    """
    import datetime as dt

    from pyspark.sql import functions as F

    from __spark_entry__ import _sessionize
    from ocular_spark.streaming.jobs import sessionize_stream

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    for uid, gap_us in [(1, 1_800_000_000), (2, 1_800_999_999), (3, 1_801_000_000)]:
        rows.append((uid, uid * 10, t0, 1.0))
        rows.append((uid, uid * 10 + 1, t0 + dt.timedelta(microseconds=gap_us), 1.0))
    ddl = "user_id long, event_id long, ts timestamp_ntz, value double"
    events = spark.createDataFrame(rows, ddl)
    want = {1: 1, 2: 1, 3: 2}

    batch = {
        r.user_id: r.n_sessions for r in _sessionize(events).collect()
    }
    assert batch == want, batch

    src = str(tmp_path / "boundary_events")
    events.coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema(ddl)
        .parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = (
        sessionize_stream(stream)
        .writeStream.format("memory")
        .queryName("sess_boundary")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_got = (
        spark.table("sess_boundary")
        .groupBy("user_id")
        .count()
        .toPandas()
        .set_index("user_id")["count"]
        .astype(int)
        .to_dict()
    )
    assert stream_got == want, stream_got


def test_extract_spans_stream_incremental_and_resume(spark, sf_dir, tmp_path):
    """Streaming extraction: availableNow over an append-only
    interleaved docs dir equals the batch DOM kernel span-for-span;
    restart with new docs extracts ONLY them (checkpoint = resume)."""
    from ocular_spark.functions.html import extract_main_content_dom
    from ocular_spark.streaming.jobs import extract_spans_stream
    from tests.test_jobs import _interleaved_fixture

    import pyarrow.parquet as pq

    all_path = str(tmp_path / "all_docs.parquet")
    _interleaved_fixture(spark, sf_dir, all_path, n_docs=8)
    inp = pq.read_table(all_path).to_pandas().sort_values("doc_id").reset_index(drop=True)
    first_ids = sorted(inp["doc_id"])[:5]

    docs_dir = str(tmp_path / "stream_docs")
    out_dir = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "stream_ckpt")
    os.makedirs(docs_dir)

    src = spark.read.parquet(all_path)
    src.filter(src["doc_id"].isin(first_ids)).coalesce(1).write.mode(
        "append"
    ).parquet(docs_dir)
    q = extract_spans_stream(spark, docs_dir, out_dir, ckpt)
    assert q.awaitTermination(300)
    assert spark.read.parquet(out_dir).count() == 5

    # restart with the remaining docs appended: only they extract
    src.filter(~src["doc_id"].isin(first_ids)).coalesce(1).write.mode(
        "append"
    ).parquet(docs_dir)
    q2 = extract_spans_stream(spark, docs_dir, out_dir, ckpt)
    assert q2.awaitTermination(300)
    out = spark.read.parquet(out_dir).toPandas().sort_values("doc_id").reset_index(drop=True)
    assert list(out["doc_id"]) == list(inp["doc_id"])  # exactly once

    for spans_out, spans_in, co in zip(out["spans"], inp["spans"], out["chars_out"]):
        got_chars = 0
        for so, si in zip(spans_out, spans_in):
            assert (so["kind"], so["media_ref"], so["offset"]) == (
                si["kind"], si["media_ref"], si["offset"])
            if si["kind"] == "text":
                assert so["text"] == extract_main_content_dom(si["text"])[2]
            else:
                assert so["text"] is None
            if so["text"] is not None:
                got_chars += len(so["text"])
        assert co == got_chars


def test_dedup_stream_drops_duplicates_across_microbatches(spark, tmp_path):
    """Clones land in a SEPARATE input file with maxFilesPerTrigger=1,
    so the stream must run >= 2 micro-batches and the clone batch must
    be deduped purely by state-store lookups (its rows were never
    co-resident with the originals in one batch).  Also pins resume:
    a third file appended after restart dedups against the
    checkpointed state, not just the running query's memory."""
    from ocular_spark.streaming.jobs import dedup_docs_stream

    docs_dir = str(tmp_path / "docs")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    orig = spark.createDataFrame(
        [(i, f"text number {i}") for i in range(20)], "doc_id long, text string"
    )
    clones = spark.createDataFrame(
        [(10_000_000 + i, f"text number {i}") for i in range(0, 20, 4)],
        "doc_id long, text string",
    )
    orig.coalesce(1).write.parquet(docs_dir)
    clones.coalesce(1).write.mode("append").parquet(docs_dir)

    q = dedup_docs_stream(spark, docs_dir, out_dir, ckpt)
    assert q.awaitTermination(300)
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 2, n_batches  # clones crossed a batch boundary
    got = {r.text_hash for r in spark.read.parquet(out_dir).collect()}
    assert len(got) == 20  # all 5 clone digests dropped

    # restart with one new file: 2 re-clones + 1 genuinely new doc
    more = spark.createDataFrame(
        [(30_000_000, "text number 1"), (30_000_001, "text number 2"),
         (30_000_002, "a brand new doc")],
        "doc_id long, text string",
    )
    more.coalesce(1).write.mode("append").parquet(docs_dir)
    q2 = dedup_docs_stream(spark, docs_dir, out_dir, ckpt)
    assert q2.awaitTermination(300)
    got2 = {r.text_hash for r in spark.read.parquet(out_dir).collect()}
    assert len(got2) == 21  # checkpointed state deduped the re-clones
    assert got < got2


def test_hourly_agg_stream_watermark_semantics(spark, tmp_path):
    """Three watermark laws, across a checkpoint restart: (1) a window
    is emitted exactly once, when the watermark passes its end; (2) a
    row arriving LATER than the watermark cannot change an emitted
    window (it is dropped, not double-counted); (3) newly unlocked
    windows emit on the next run."""
    from ocular_spark.streaming.jobs import hourly_agg_stream

    in_dir = str(tmp_path / "ev")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def ev(eid, hour, minute, etype="click", value=1.0):
        return (eid, f"2024-01-01 {hour:02d}:{minute:02d}:00", 1, etype, value, "{}")

    ddl = ("event_id long, ts string, user_id long, event_type string, "
           "value double, props string")

    def write(rows):
        import pyspark.sql.functions as F
        (spark.createDataFrame(rows, ddl)
         .withColumn("ts", F.col("ts").cast("timestamp"))
         .coalesce(1).write.mode("append").parquet(in_dir))

    # batch 1: events in hours 00 and 03 -> watermark 03:00-1h = 02:00,
    # so ONLY hour 00 (end 01:00 <= 02:00) emits
    write([ev(0, 0, 10), ev(1, 0, 20), ev(2, 3, 0)])
    q = hourly_agg_stream(spark, in_dir, out_dir, ckpt)
    assert q.awaitTermination(300)
    got = {(r.hour, r.n_events) for r in spark.read.parquet(out_dir).collect()}
    assert got == {("2024-01-01 00:00:00", 2)}

    # batch 2 after restart: a LATE row for hour 00 (beyond the
    # watermark -> dropped) + hour 05 rows that unlock hours 03 and 04-
    # empty/05? watermark moves to 05:59-1h, so hour 03 (end 04:00)
    # and the late-free hour 04 has no rows; hour 05 stays open
    write([ev(3, 0, 30), ev(4, 5, 59), ev(5, 5, 1)])
    q2 = hourly_agg_stream(spark, in_dir, out_dir, ckpt)
    assert q2.awaitTermination(300)
    got2 = {(r.hour, r.n_events) for r in spark.read.parquet(out_dir).collect()}
    assert got2 == {
        ("2024-01-01 00:00:00", 2),   # unchanged: late row dropped
        ("2024-01-01 03:00:00", 1),   # unlocked by the new watermark
    }, got2


def test_custom_sessionization_state_across_batches(spark, tmp_path):
    """The hand-managed applyInPandasWithState machine must CONTINUE a
    session across a checkpoint restart (events in a later file within
    the gap join the open session), split at the exact 1801.000000 s
    boundary, and emit the final session via event-time timeout."""
    import pyspark.sql.functions as F
    from ocular_spark.streaming.jobs import sessionize_stream_custom

    in_dir = str(tmp_path / "ev")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    ddl = ("event_id long, ts string, user_id long, event_type string, "
           "value double, props string")

    def write(rows):
        (spark.createDataFrame(rows, ddl)
         .withColumn("ts", F.col("ts").cast("timestamp"))
         .coalesce(1).write.mode("append").parquet(in_dir))

    # file 1: one event at 00:00:00 (user 1)
    write([(0, "2024-01-01 00:00:00", 1, "c", 1.0, "{}")])
    q = sessionize_stream_custom(spark, in_dir, out_dir, ckpt)
    assert q.awaitTermination(300)
    assert spark.read.parquet(out_dir).count() == 0  # still open

    # file 2 after restart: +1800.999999s (same session — gap below
    # 1801.000000), then +1801.000000s exactly (split), then a far
    # event that lets the timeout close session 2 but not session 3
    write([
        (1, "2024-01-01 00:30:00.999999", 1, "c", 2.0, "{}"),
        (2, "2024-01-01 01:00:01.999999", 1, "c", 4.0, "{}"),
        (3, "2024-01-01 09:00:00",        1, "c", 8.0, "{}"),
    ])
    q2 = sessionize_stream_custom(spark, in_dir, out_dir, ckpt)
    assert q2.awaitTermination(300)
    got = sorted(
        (r.n_events, float(r.sum_value))
        for r in spark.read.parquet(out_dir).collect()
    )
    # session 1 = events 0+1 (continued across the restart, then split
    # by event 2); session 2 = event 2 alone, closed by event 3's
    # arrival... but ALSO only emitted once; session 3 (event 3) stays
    # open: watermark = 09:00 - 1h = 08:00 < 09:00 + gap
    assert got == [(1, 4.0), (2, 3.0)], got


def test_upsert_stream_cross_batch_lineage_and_resume(spark, tmp_path):
    """foreachBatch MERGE sink: (a) a refetch arriving in a LATER
    micro-batch still increments n_versions (the target table carries
    the cross-batch state); (b) a second stream run with the same
    checkpoint processes ONLY newly-arrived files and keeps
    accumulating (incremental resume)."""
    from pyspark.sql import functions as F

    from ocular_spark.streaming.jobs import upsert_crawl_stream

    versions = str(tmp_path / "versions")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id bigint, crawl_id int, fetch_ts bigint, content_digest string"
    f1 = [(1, 0, 100, "a1"), (2, 0, 101, "b1"), (3, 0, 102, "c1")]
    f2 = [(1, 1, 200, "a2")]  # refetch of doc 1, later batch
    spark.createDataFrame(f1, schema).coalesce(1).write.parquet(versions)
    spark.createDataFrame(f2, schema).coalesce(1).write.mode("append").parquet(versions)
    q = upsert_crawl_stream(spark, versions, table, ckpt)
    assert q.awaitTermination(300)
    t = {r.doc_id: r for r in spark.read.parquet(table).collect()}
    assert t[1].n_versions == 2 and t[1].content_digest == "a2"
    assert t[1].crawl_id == 1 and t[1].fetch_ts == 200
    assert t[2].n_versions == 1 and t[3].n_versions == 1

    # resume: a third file arrives; same checkpoint -> only it processes
    f3 = [(1, 2, 300, "a3"), (4, 2, 301, "d1")]
    spark.createDataFrame(f3, schema).coalesce(1).write.mode("append").parquet(versions)
    q2 = upsert_crawl_stream(spark, versions, table, ckpt)
    assert q2.awaitTermination(300)
    t2 = {r.doc_id: r for r in spark.read.parquet(table).collect()}
    assert t2[1].n_versions == 3 and t2[1].content_digest == "a3"
    assert t2[4].n_versions == 1
    assert t2[2].n_versions == 1  # untouched rows survive the rewrite
    assert len(t2) == 4


def test_hll_sketch_stream_idempotent_and_monotone(spark, tmp_path):
    """Mergeable-sketch streaming: max-merge is idempotent (a replayed
    file cannot change any register — at-least-once delivery is safe
    by algebra) and monotone (new items only raise registers)."""
    from pyspark.sql import functions as F

    import __spark_entry__ as entry_mod
    from ocular_spark.streaming.jobs import sketch_merge_stream

    schema = "doc_id bigint, source string, text string"
    src = str(tmp_path / "docs")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    f1 = [(1, "s0", "alpha beta gamma"), (2, "s0", "beta delta")]
    spark.createDataFrame(f1, schema).coalesce(1).write.parquet(src)

    def run():
        q = sketch_merge_stream(
            spark, src, schema,
            lambda b: entry_mod._hll_registers(entry_mod._hll_items(b)),
            table, ckpt, key_cols=["source", "gram", "idx"],
        )
        assert q.awaitTermination(300)
        return {
            (r.source, r.gram, r.idx): r.r
            for r in spark.read.parquet(table).collect()
        }

    regs1 = run()
    # replay: identical content arrives again as a new file
    spark.createDataFrame(f1, schema).coalesce(1).write.mode("append").parquet(src)
    regs2 = run()
    assert regs2 == regs1, "replay must not change any register"
    # new items: registers may only grow, never shrink
    f3 = [(3, "s0", "epsilon zeta eta theta iota kappa")]
    spark.createDataFrame(f3, schema).coalesce(1).write.mode("append").parquet(src)
    regs3 = run()
    for k, v in regs1.items():
        assert regs3[k] >= v
    assert len(regs3) >= len(regs1)
    assert regs3 != regs1, "genuinely new items must move the sketch"
