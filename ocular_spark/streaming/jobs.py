"""Structured Streaming surface.

The reference is pure batch (SURVEY.md §2.8) — these jobs are the
Spark-native streaming re-expression of its incremental semantics:

* ``transcribe_pages_stream`` — incremental transcription over an
  append-only page table (the streaming analog of the reference's
  skip-already-transcribed resume scan, LazyRawImageDocument +
  FonttrainTranscribeShared's output-exists check): new page files are
  decoded exactly once, the streaming checkpoint IS the resume state
  (no anti-join needed), and the decode kernel is the very same
  Arrow-batched ``decode_pages_kernel`` the batch pipeline uses.

* ``sessionize_stream`` — event sessionization as a NATIVE
  session-window aggregation (``F.session_window`` + watermark),
  the declarative Catalyst form of the batch gaps-and-islands query
  (__spark_entry__._sessionize).  Boundary alignment: the batch rule
  is ``timestampdiff(SECOND, prev, ts) > 1800`` — second-TRUNCATED,
  so a new session starts iff the true gap is >= 1801.000000 s.
  Spark MERGES touching session windows (an event landing exactly on
  a window's end extends it — end-inclusive merge), so the exact
  streaming equivalent is a gap of 1800999999 microseconds: merge iff
  gap <= 1800.999999 s ⟺ split iff gap >= 1801.000000 s.  Both paths
  agree at microsecond resolution for EVERY input (pinned by
  tests/test_streaming.py::test_session_gap_boundary).
"""

from __future__ import annotations

from typing import List

from pyspark.sql import functions as F

from ocular_spark.pipeline import DECODED_SCHEMA, decode_pages_kernel

# stream input: one row per page (offset = span offset within the doc)
PAGES_DDL = "doc_id string, media_ref string, offset int, lines array<binary>"


def transcribe_pages_stream(
    spark,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    bundle_bc,
    char_strs: List[str],
    available_now: bool = True,
):
    """Incremental page transcription: readStream over an append-only
    parquet directory of pages -> stateless Arrow decode kernel ->
    parquet sink with checkpointing.  Each page is decoded exactly
    once across restarts (file-source + checkpoint = the resume
    semantics the north_rule asks for, with per-partition lineage
    columns flowing through unchanged).  Returns the started query."""
    pages = spark.readStream.schema(PAGES_DDL).parquet(pages_dir)
    decoded = pages.mapInPandas(
        decode_pages_kernel(bundle_bc, char_strs), schema=DECODED_SCHEMA
    )
    writer = (
        decoded.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


IMPS_DDL = "imp_user bigint, imp_id bigint, imp_ts timestamp"
CLICKS_DDL = "click_user bigint, click_id bigint, click_ts timestamp"


def attrib_join_stream(
    spark,
    imps_dir: str,
    clicks_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "30 minutes",
    watermark: str = "2 hours",
    available_now: bool = True,
):
    """Watermarked STREAM-STREAM inner join (ad-attribution shape):
    a click joins every impression by the same user it follows within
    `window`.  This is the API class none of the other eight streaming
    surfaces exercises — two unbounded inputs, join state buffered on
    BOTH sides, the event-time range condition + watermarks bounding
    that state (without them the join state grows forever; with them
    Spark evicts an impression once the click watermark passes
    imp_ts + window).  INNER join semantics: matches emit as they
    form — the watermark bounds state, not emission — so an
    availableNow replay emits exactly the batch join's multiset.

    At scale the join state is the operator's memory story: per
    executor it holds only impressions younger than (click watermark
    - window) for its user-hash partitions; a mega-user hotspot is
    the same skew the batch side salts."""
    imps = (
        spark.readStream.schema(IMPS_DDL)
        .parquet(imps_dir)
        .withWatermark("imp_ts", watermark)
    )
    clicks = (
        spark.readStream.schema(CLICKS_DDL)
        .parquet(clicks_dir)
        .withWatermark("click_ts", watermark)
    )
    joined = imps.join(
        clicks,
        F.expr(
            f"imp_user = click_user AND click_ts >= imp_ts"
            f" AND click_ts <= imp_ts + interval {window}"
        ),
        "inner",
    ).select(
        F.col("imp_user").alias("user_id"),
        "imp_id",
        "click_id",
        F.expr("timestampdiff(MICROSECOND, imp_ts, click_ts)")
        .cast("long")
        .alias("delay_us"),
    )
    writer = (
        joined.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def sessionize_stream(
    events, gap: str = "1800999999 microseconds", watermark: str = "2 hours"
):
    """Streaming sessionization over an events stream with columns
    (user_id, event_id, ts, value): native session windows (state
    managed by Spark, merged incrementally, closed by the watermark).
    The default gap is 1800.999999 s, NOT 1800: the batch query's rule
    ``timestampdiff(SECOND, prev, ts) > 1800`` truncates to whole
    seconds (splits iff the true gap >= 1801.000000 s), and Spark's
    session windows merge end-INCLUSIVELY, so gap = 1800999999 us is
    the exact streaming equivalent (see module docstring).
    Returns per-session rows (user_id, session_start, session_end,
    n_events, sum_value)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


# stream input: the interleaved table shape (north_rule input_hint)
DOCS_SPANS_DDL = (
    "doc_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)


def extract_spans_stream(
    spark,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Incremental main-content extraction: readStream over an
    append-only parquet directory of interleaved (doc_id, spans) docs
    -> the SAME stateless span-rewrite projection the batch
    extract_content job uses (jobs/extract_content.stripped_spans_expr;
    text spans stripped, media spans pass through, span order
    preserved) -> parquet sink with checkpointing.  Each newly crawled
    doc is extracted exactly once across restarts — the streaming
    analog of the batch job's --resume-from anti-join, with the
    checkpoint as the resume state.  Returns the started query."""
    from ocular_spark.jobs.extract_content import _chars_expr, stripped_spans_expr

    docs = spark.readStream.schema(DOCS_SPANS_DDL).parquet(docs_dir)
    out = docs.select(
        "doc_id",
        stripped_spans_expr().alias("spans"),
        F.expr("size(spans)").alias("n_spans"),
        F.expr(_chars_expr("spans")).alias("chars_in"),
    ).withColumn("chars_out", F.expr(_chars_expr("spans")))
    writer = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

SESSION_GAP_US = 1_801_000_000  # split iff true gap >= 1801.000000 s
#   == the batch rule timestampdiff(SECOND, prev, ts) > 1800 exactly
#   (floor(gap) > 1800 <=> gap_us >= 1_801_000_000)

SESSION_OUT_DDL = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, sum_value double"
)
_SESSION_STATE_DDL = "start long, last long, n long, s double"


def _session_fn(key, pdfs, state):
    """applyInPandasWithState kernel: a hand-managed per-user session
    state machine — state = (start_us, last_us, n, sum) of the OPEN
    session.  Sessions closed by a following event emit immediately;
    the final open session emits when the event-time timeout fires
    (watermark passes last + gap).  All gap arithmetic in integer
    microseconds — bit-identical to the batch rule."""
    import pandas as pd

    (user_id,) = key
    cols = ["user_id", "session_start", "session_end", "n_events", "sum_value"]
    sessions = []
    if state.hasTimedOut:
        start, last, n, s = state.get
        sessions.append((user_id, start, last, n, s))
        state.remove()
    else:
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        ts_us = (rows["ts"].astype("int64") // 1000).tolist()
        vals = rows["value"].tolist()
        if state.exists:
            start, last, n, s = state.get
        else:
            start = last = None
            n, s = 0, 0.0
        for t, v in zip(ts_us, vals):
            if last is not None and t - last >= SESSION_GAP_US:
                sessions.append((user_id, start, last, n, s))
                start, n, s = None, 0, 0.0
            if start is None:
                start = t
            last = t
            n += 1
            s += float(v)
        state.update((int(start), int(last), int(n), float(s)))
        # fire when the watermark passes last + gap (epoch millis)
        state.setTimeoutTimestamp(last // 1000 + SESSION_GAP_US // 1000)
    out = pd.DataFrame(sessions, columns=cols)
    if len(out):
        out["session_start"] = pd.to_datetime(out["session_start"], unit="us")
        out["session_end"] = pd.to_datetime(out["session_end"], unit="us")
    yield out


def sessionize_stream_custom(
    spark,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "1 hour",
    available_now: bool = True,
):
    """CUSTOM stateful streaming sessionization via
    ``applyInPandasWithState`` — the hand-managed-state counterpart of
    sessionize_stream's native session_window (the API surface for
    operators Spark's built-ins cannot express).  Emission contract
    (deterministic, what the driver row hashes): every session CLOSED
    BY A FOLLOWING EVENT emits in that event's batch; each user's
    final open session emits iff the end-of-stream watermark
    (max event time - ``watermark``) has passed its last event + gap;
    later-than-watermark stragglers would start a fresh session (state
    was removed) — the standard reopening caveat of timeout-based
    sessionization.  Returns the started query."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    events = (
        spark.readStream.schema(EVENTS_DDL)
        .parquet(events_dir)
        .withWatermark("ts", watermark)
    )
    out = events.groupBy("user_id").applyInPandasWithState(
        _session_fn,
        outputStructType=SESSION_OUT_DDL,
        stateStructType=_SESSION_STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    writer = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def hourly_agg_stream(
    spark,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "1 hour",
    available_now: bool = True,
):
    """Streaming tumbling-window aggregation with watermark-gated
    emission — the incremental form of the batch hourly rollup
    (q_event_hourly): state is one row per open (window, event_type),
    and a window is emitted (append mode) exactly when the watermark
    passes its end, i.e. the emitted set is precisely
    ``window_end <= max(event_time) - watermark`` — a pure function of
    the input, which is what the driver row hashes.  Late rows inside
    the watermark merge into open state; rows later than the watermark
    are dropped deterministically.  Returns the started query."""
    events = spark.readStream.schema(EVENTS_DDL).parquet(events_dir)
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type", "n_events", "sum_value",
        )
    )
    writer = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def dedup_docs_stream(
    spark,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int = 1,
):
    """Incremental EXACT dedup over an append-only doc stream — the
    streaming analog of the batch hash-groupBy (q_dedup_exact): each
    doc's content digest is checked against the state store's seen-set
    (``dropDuplicates``), so a re-crawled or duplicated doc arriving
    in ANY later micro-batch emits nothing.  maxFilesPerTrigger=1
    forces one input file per micro-batch, so duplicates that arrive
    in a later file genuinely cross a state-store boundary (pinned by
    tests/test_streaming.py).

    The sink carries ONLY the digest: which doc survives per digest
    depends on processing order (non-deterministic across retries),
    but the surviving digest SET is a pure function of the corpus —
    that is the deterministic contract the driver row hashes.

    State bound at 100 TB: the seen-set grows by one 16-byte key per
    distinct doc forever; production crawls bound it with
    ``dropDuplicatesWithinWatermark`` (event-time TTL on the state)
    or periodic state compaction; availableNow drains here make the
    unbounded form safe for the gate."""
    docs = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )
    deduped = (
        docs.select(F.md5("text").alias("text_hash"))
        .dropDuplicates(["text_hash"])
    )
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def upsert_crawl_stream(
    spark,
    versions_dir: str,
    table_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int = 1,
):
    """Streaming latest-wins crawl merge via a foreachBatch MERGE sink
    — the seventh streaming surface and the one API class the others
    don't cover: arbitrary batch logic against an external table from
    inside a stream (Spark's documented stand-in for MERGE INTO until
    the sink is an ACID format).  Each micro-batch of crawl versions
    is pre-aggregated per doc_id, unioned with the CURRENT target
    table, and re-argmaxed; n_versions sums across batches, so the
    table itself carries the cross-batch lineage state (refetches
    arriving in a LATER micro-batch still count — pinned by
    tests/test_streaming.py).  The merge is commutative (argmax +
    sum), so the result is independent of file arrival order.

    The rewritten table is localCheckpoint'd EAGERLY before the
    overwrite — the merged plan reads table_dir, and overwriting a
    parquet directory you are lazily reading is a self-clobber (the
    link_pagerank lineage lesson).  At 100 TB the sink is an Iceberg
    MERGE INTO (snapshot isolation, no rewrite); the full-rewrite
    parquet form here keeps the same merge algebra with the same
    gate."""
    from pyspark.errors import AnalysisException

    versions = (
        spark.readStream.schema(
            "doc_id bigint, crawl_id int, fetch_ts bigint,"
            " content_digest string"
        )
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(versions_dir)
    )

    def _merge(batch_df, batch_id):
        agg = batch_df.groupBy("doc_id").agg(
            F.max(
                F.struct(
                    F.col("fetch_ts").alias("ts"),
                    F.col("crawl_id").alias("c"),
                    F.col("content_digest").alias("h"),
                )
            ).alias("w"),
            F.count(F.lit(1)).alias("n"),
        )
        try:
            cur = batch_df.sparkSession.read.parquet(table_dir).select(
                "doc_id",
                F.struct(
                    F.col("fetch_ts").alias("ts"),
                    F.col("crawl_id").alias("c"),
                    F.col("content_digest").alias("h"),
                ).alias("w"),
                F.col("n_versions").alias("n"),
            )
            allv = cur.unionByName(agg)
        except AnalysisException:
            allv = agg
        merged = (
            allv.groupBy("doc_id")
            .agg(F.max("w").alias("w"), F.sum("n").alias("n"))
            .select(
                "doc_id",
                F.col("w.c").alias("crawl_id"),
                F.col("w.ts").alias("fetch_ts"),
                F.col("n").cast("long").alias("n_versions"),
                F.col("w.h").alias("content_digest"),
            )
        )
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(
            table_dir
        )

    writer = (
        versions.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def sketch_merge_stream(
    spark,
    src_dir: str,
    src_schema: str,
    batch_registers_fn,
    table_dir: str,
    checkpoint_dir: str,
    key_cols: list,
    val_col: str = "r",
    available_now: bool = True,
    max_files_per_trigger: int = 1,
):
    """Streaming MERGEABLE-SKETCH maintenance (8th streaming surface):
    each micro-batch's register table is folded into a persistent
    sketch by key-wise MAX — the algebra that makes HLL (and any
    max-mergeable summary) distribute across time exactly as it
    distributes across partitions.  Because max is commutative,
    idempotent, and monotone, the merged sketch is independent of file
    arrival order AND of replays (an at-least-once re-delivery cannot
    change a register) — strictly stronger delivery semantics than the
    argmax upsert, for free, by algebra.  State = the sketch itself
    (fixed size per group), carried in the target table; same
    localCheckpoint-before-overwrite discipline as
    upsert_crawl_stream.  At 100 TB the sink is an Iceberg MERGE with
    GREATEST(), or registers live in the state store keyed by
    (group, idx)."""
    from pyspark.errors import AnalysisException

    stream = (
        spark.readStream.schema(src_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )

    def _merge(batch_df, batch_id):
        regs = batch_registers_fn(batch_df)
        try:
            cur = batch_df.sparkSession.read.parquet(table_dir).select(
                *key_cols, val_col
            )
            allv = cur.unionByName(regs.select(*key_cols, val_col))
        except AnalysisException:
            allv = regs.select(*key_cols, val_col)
        merged = allv.groupBy(*key_cols).agg(F.max(val_col).alias(val_col))
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(
            table_dir
        )

    writer = (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------- quota
# Streaming per-source crawl quota (10th streaming surface): the
# politeness/contribution cap enforced AT INGEST TIME — each source's
# running arrival rank is hand-managed state, so a source that exceeds
# its quota is suppressed (kept=0) from that point on, across
# micro-batches AND restarts.  The batch analog caps by corpus hash
# order (q_domain_cap); the streaming form necessarily caps by ARRIVAL
# order (doc_id here), which is the operational semantics of a crawl
# frontier quota.
#
# API note (honest capability guard): Spark 4's
# transformWithStateInPandas is the newest API for this operator
# class, but its state-server protocol needs the google-protobuf
# Python package, which is absent in this environment (the TWS driver
# worker crashes with ImportError on google.protobuf; installs are
# out of scope).  applyInPandasWithState expresses the same
# per-key mutable-state semantics on the stable API, so the job uses
# that; swapping to transformWithState is a mechanical port once
# protobuf exists.

QUOTA_IN_DDL = "doc_id long, source string"
QUOTA_OUT_DDL = "doc_id long, source string, rank long, kept int"
_QUOTA_STATE_DDL = "n long"


def _quota_fn(cap: int):
    def fn(key, pdfs, state):
        import pandas as pd

        (source,) = key
        n = state.get[0] if state.exists else 0
        rows = pd.concat(list(pdfs)).sort_values("doc_id")
        ranks = list(range(n + 1, n + 1 + len(rows)))
        n += len(rows)
        state.update((int(n),))
        yield pd.DataFrame(
            {
                # .to_numpy(): sort_values keeps the ORIGINAL index and
                # the DataFrame constructor aligns Series by index —
                # mixing the sorted column with fresh-indexed ranks
                # would silently scramble the pairing
                "doc_id": rows["doc_id"].to_numpy("int64"),
                "source": source,
                "rank": pd.Series(ranks, dtype="int64"),
                "kept": pd.Series(
                    [1 if r <= cap else 0 for r in ranks], dtype="int32"
                ),
            }
        )

    return fn


def crawl_quota_stream(
    spark,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    cap: int,
    available_now: bool = True,
):
    """Per-source arrival-rank quota over an append-only doc stream.

    Emission contract (what the driver row hashes): every arriving doc
    emits exactly once with its running per-source rank (1-based, in
    doc_id order within a batch, batch order across batches) and
    kept = rank <= cap.  The rank state is one BIGINT per source —
    O(sources) state, corpus-size independent; no timeout (quota state
    is permanent for the stream's lifetime).  Restart law pinned by
    tests/test_quota_stream.py: ranks CONTINUE across a checkpoint
    restart (a source at rank n before the restart hands rank n+1 to
    its next doc after it)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    docs = spark.readStream.schema(QUOTA_IN_DDL).parquet(docs_dir)
    out = docs.groupBy("source").applyInPandasWithState(
        _quota_fn(cap),
        outputStructType=QUOTA_OUT_DDL,
        stateStructType=_QUOTA_STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    writer = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ------------------------------------------------ streaming debounce

DEBOUNCE_IN_DDL = "event_id long, user_id long, ts_sec long"
DEBOUNCE_OUT_DDL = "event_id long, user_id long, ts_sec long"
_DEBOUNCE_STATE_DDL = "last_kept long"


def _debounce_fn(gap: int):
    def fn(key, pdfs, state):
        import pandas as pd

        (user_id,) = key
        last = state.get[0] if state.exists else None
        rows = pd.concat(list(pdfs)).sort_values(["ts_sec", "event_id"])
        keep = []
        for eid, sec in zip(
            rows["event_id"].to_numpy("int64"),
            rows["ts_sec"].to_numpy("int64"),
        ):
            if last is None or sec - last >= gap:
                last = int(sec)
                keep.append((int(eid), int(user_id), int(sec)))
        if last is not None:
            state.update((int(last),))
        yield pd.DataFrame(
            keep, columns=["event_id", "user_id", "ts_sec"]
        )

    return fn


def debounce_stream(
    spark,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    gap: int = 600,
    available_now: bool = True,
):
    """Streaming cooldown suppression (the alert-throttling state
    machine): keep an event iff >= ``gap`` seconds have passed since
    the LAST KEPT event of the same user — per-user state is ONE
    bigint (the last kept second), O(users) total, corpus-independent,
    no timeout (the cooldown reference survives idle periods by
    design).  The batch counterpart is the q_debounce_events
    applyInPandas fold; an availableNow one-batch replay emits exactly
    the batch fold's kept set, which is what the driver gate hashes
    against the recursive-CTE oracle.  Restart law pinned by
    tests/test_debounce_stream.py: suppression continues ACROSS a
    checkpoint restart (an event arriving after the restart is judged
    against the last event KEPT before it)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    events = spark.readStream.schema(DEBOUNCE_IN_DDL).parquet(events_dir)
    out = events.groupBy("user_id").applyInPandasWithState(
        _debounce_fn(gap),
        outputStructType=DEBOUNCE_OUT_DDL,
        stateStructType=_DEBOUNCE_STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    writer = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
