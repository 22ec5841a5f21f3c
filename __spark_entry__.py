"""Driver contract for the spark-graft builder (PySpark target).

Queries come in two groups:

* OCR-pipeline queries (the engine's core, SURVEY.md §2.7): the
  interleaved-span transcription pipeline and its lineage metrics.
  These are not SQL-expressible (beam semi-Markov Viterbi over page
  images) so they carry no oracle_sql entry — the driver records the
  rows-only check; full value-level parity is covered by
  tests/test_pipeline.py (Spark output == single-process NumPy oracle,
  span-sequence equality).

* Relational / training-data operators (SURVEY.md §2.1-2.6 +
  dedup/similarity/text-analysis): each has a DuckDB oracle with
  identical column names and rounding.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pandas as pd  # module-level: pandas_udf type hints must resolve
                     # under `from __future__ import annotations`

from pyspark.sql import DataFrame, SparkSession, functions as F


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _load_wide(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load + spread across cores.  The test parquet is a single small
    file (1 input split), so row-explosion work would otherwise run on
    one core.  The repartition is GATED on the scan's actual split
    count: at production scale the scan already yields >= cores splits
    and no shuffle is inserted."""
    df = _load(spark, sf_dir, name)
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    if df.rdd.getNumPartitions() < nparts:
        df = df.repartition(nparts)
    return df


# ---------------------------------------------------------------- OCR core

_N_PIPELINE_DOCS = 8  # fixed, sf-independent (deterministic fixture slice)


def _pipeline_frames(spark: SparkSession, sf_dir: str):
    import pyarrow.parquet as pq

    from ocular_spark.fixtures import build_models, derive_docs_and_media
    from ocular_spark.pipeline import DOCS_DDL

    documents = pq.read_table(os.path.join(sf_dir, "documents.parquet")).to_pandas()
    docs, media = derive_docs_and_media(
        documents, n_docs=_N_PIPELINE_DOCS, max_pages_per_doc=2
    )
    bundle, char_strs = build_models(documents)
    docs_df = spark.createDataFrame(docs, schema=DOCS_DDL)
    media_df = spark.createDataFrame(media[["media_ref", "n_lines", "lines"]])
    bundle_bc = spark.sparkContext.broadcast(bundle)
    return docs_df, media_df, bundle_bc, char_strs


def q_transcribe_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: interleaved text+media docs -> spans with media spans
    replaced by Viterbi transcriptions, order preserved."""
    from ocular_spark.pipeline import transcribe

    docs_df, media_df, bundle_bc, char_strs = _pipeline_frames(spark, sf_dir)
    out = transcribe(docs_df, media_df, bundle_bc, char_strs)
    # flatten for a stable, hashable shape
    return out.select(
        "doc_id", F.posexplode("spans").alias("pos", "span")
    ).select(
        "doc_id",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )


def _flatten_spans(out: DataFrame) -> DataFrame:
    return out.select(
        "doc_id", F.posexplode("spans").alias("pos", "span")
    ).select(
        "doc_id",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )


def q_transcribe_spans_cs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-switch + glyph-substitution transcription (O12 on the
    SPARK path): bilingual pages (language 0 = document text, language
    1 = word-reversed) decoded with the CodeSwitchTransitionModel and
    a uniform GSM; the first page renders a LONG-S glyph, which the
    diplomatic channel must preserve (reference serving wiring:
    main/FonttrainTranscribeShared.java:255-304)."""
    import pyarrow.parquet as pq

    from ocular_spark.fixtures import build_models_cs, derive_docs_and_media_cs
    from ocular_spark.pipeline import DOCS_DDL, transcribe

    documents = pq.read_table(os.path.join(sf_dir, "documents.parquet")).to_pandas()
    docs, media = derive_docs_and_media_cs(documents, n_docs=3)
    bundle, char_strs = build_models_cs(documents)
    docs_df = spark.createDataFrame(docs, schema=DOCS_DDL)
    media_df = spark.createDataFrame(media[["media_ref", "n_lines", "lines"]])
    bundle_bc = spark.sparkContext.broadcast(bundle)
    return _flatten_spans(transcribe(docs_df, media_df, bundle_bc, char_strs))


def q_transcribe_spans_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov vertical-offset transcription (O13 on the SPARK path):
    page lines are shifted by deterministic per-line offsets in
    [-3, 3]; the explicit-offset transition/emission variant tracks
    the shift (CharacterNgramTransitionModelMarkovOffset.java,
    CachingEmissionModelExplicitOffset.java)."""
    import pyarrow.parquet as pq

    from ocular_spark.fixtures import (
        build_models_offset,
        derive_docs_and_media_offset,
    )
    from ocular_spark.pipeline import DOCS_DDL, transcribe

    documents = pq.read_table(os.path.join(sf_dir, "documents.parquet")).to_pandas()
    docs, media = derive_docs_and_media_offset(documents, n_docs=4)
    bundle, char_strs = build_models_offset(documents)
    docs_df = spark.createDataFrame(docs, schema=DOCS_DDL)
    media_df = spark.createDataFrame(media[["media_ref", "n_lines", "lines"]])
    bundle_bc = spark.sparkContext.broadcast(bundle)
    return _flatten_spans(transcribe(docs_df, media_df, bundle_bc, char_strs))


def q_transcribe_spans_crop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-crop transcription (O4 on the SPARK path, round-4 punch
    list #7): whole-page PNGs wrapped in book-scan margins + dark edge
    bands (fixtures.add_page_margins) run the FULL preprocessing chain
    inside the decode kernel — straighten -> Cropper.crop (ON; it is
    off for the clean-page fixtures) -> binarize -> line extraction ->
    resample -> decode.  Without crop the dark bands are extracted and
    decoded as characters (tests/test_preprocess.py pins the
    contrast); with crop the clean-page tokens come back.  Golden
    frozen from the in-process no-Spark oracle like the other OCR
    rows (reference: Cropper.java:254-273, LazyRawImageDocument:80-92)."""
    import pyarrow.parquet as pq

    from ocular_spark.fixtures import build_models_crop, derive_docs_and_media_crop
    from ocular_spark.pipeline import DOCS_DDL, transcribe

    documents = pq.read_table(os.path.join(sf_dir, "documents.parquet")).to_pandas()
    docs, pages = derive_docs_and_media_crop(documents, n_docs=2)
    bundle, char_strs = build_models_crop(documents)
    docs_df = spark.createDataFrame(docs, schema=DOCS_DDL)
    media_df = spark.createDataFrame(pages[["media_ref", "n_lines", "page_png"]])
    bundle_bc = spark.sparkContext.broadcast(bundle)
    return _flatten_spans(transcribe(docs_df, media_df, bundle_bc, char_strs))


def q_transcribe_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 Structured Streaming transcription UNDER THE DRIVER GATE
    (round-4 punch list #3): the same 8-doc page fixture as
    transcribe_spans is written as a parquet stream source, decoded
    incrementally by transcribe_pages_stream (availableNow trigger,
    fresh checkpoint each call — the checkpoint IS the exactly-once
    resume state; restart semantics are pinned by
    tests/test_streaming.py), and the sink's media spans are returned.
    Deterministic: the streaming path runs the very same Arrow decode
    kernel, so its output must equal the media rows of the FROZEN
    transcribe_spans golden (the no-Spark NumPy oracle path)."""
    import shutil
    import tempfile

    from ocular_spark.streaming.jobs import transcribe_pages_stream

    global _STREAM_TMP_ROOT
    docs_df, media_df, bundle_bc, char_strs = _pipeline_frames(spark, sf_dir)
    pages = (
        docs_df.select("doc_id", F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .select(
            "doc_id",
            F.col("s.media_ref").alias("media_ref"),
            F.col("s.offset").alias("offset"),
        )
        .join(media_df, "media_ref")
        .select("doc_id", "media_ref", "offset", "lines")
    )
    # one scratch tree per session, recycled per call (repeated driver /
    # bench invocations must not accumulate pages/out/ckpt trees)
    if _STREAM_TMP_ROOT is not None:
        shutil.rmtree(_STREAM_TMP_ROOT, ignore_errors=True)
    root = tempfile.mkdtemp(prefix="ocular_stream_")
    _STREAM_TMP_ROOT = root
    pages_dir = os.path.join(root, "pages")
    out_dir = os.path.join(root, "out")
    ckpt = os.path.join(root, "ckpt")
    pages.write.parquet(pages_dir)
    q = transcribe_pages_stream(
        spark, pages_dir, out_dir, ckpt, bundle_bc, char_strs
    )
    # awaitTermination returns False on timeout — a partially written
    # sink must fail loudly, not hash-mismatch three stages later
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("streaming transcription did not finish in 600s")
    return spark.read.parquet(out_dir).select(
        "doc_id", "media_ref", "offset", "text"
    )


def q_transcribe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-page decode lineage metrics (resume/monitoring table)."""
    from ocular_spark.pipeline import decode_metrics

    docs_df, media_df, bundle_bc, char_strs = _pipeline_frames(spark, sf_dir)
    return decode_metrics(docs_df, media_df, bundle_bc, char_strs).select(
        "doc_id", "media_ref", "offset", "n_lines"
    )


def q_transcribe_confidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-page decode-confidence routing (accept/review triage): the
    Viterbi joint log-prob normalized per decoded character, routed
    against CONFIDENCE_THRESHOLD — the QA gate between the decoder and
    the sink (pipeline.decode_confidence docstring has the length-
    invariance rationale).  Oracle: frozen golden computed by the
    IN-PROCESS serial decode loop (tools/freeze_goldens.py), same
    provenance as transcribe_spans; the fixture's two page classes
    separate by >16 per-char units around the threshold, so the frozen
    routes are stable under float drift."""
    from ocular_spark.pipeline import decode_confidence

    docs_df, media_df, bundle_bc, char_strs = _pipeline_frames(spark, sf_dir)
    return decode_confidence(docs_df, media_df, bundle_bc, char_strs)


# ------------------------------------------------- relational operators

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style aggregation (partial+final agg, SURVEY §2.4)."""
    l = _load(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + agg + deterministic top-k (TPC-H Q3 shape)."""
    c = _load(spark, sf_dir, "customer")
    o = _load(spark, sf_dir, "orders")
    l = _load(spark, sf_dir, "lineitem")
    return (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way broadcast join through the star schema (Q5 shape)."""
    r = _load(spark, sf_dir, "region")
    n = _load(spark, sf_dir, "nation")
    s = _load(spark, sf_dir, "supplier")
    l = _load(spark, sf_dir, "lineitem")
    return (
        l.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join — the resumability filter shape (F2/J2)."""
    c = _load(spark, sf_dir, "customer")
    o = _load(spark, sf_dir, "orders")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


def q_first_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window function: first 2 orders per customer (deterministic)."""
    from pyspark.sql.window import Window

    o = _load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("o_custkey", "o_orderkey", "rn")
    )


def q_event_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation over the events stream table."""
    e = _load(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .withColumn("hour", F.date_format("hour", "yyyy-MM-dd HH:mm:ss"))
    )


def q_event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization — the gaps-and-islands stateful pattern (the
    batch analog of a session window): per user, a new session starts
    whenever the gap to the previous event exceeds 30 minutes
    (lag + conditional cumulative sum over an event-time window);
    output is per-user session stats.  One shuffle on user_id; the
    window sort is within user partitions only."""
    from pyspark.sql.window import Window

    return _sessionize(_load(spark, sf_dir, "events"))


def _sessionize(e: DataFrame) -> DataFrame:
    """Gaps-and-islands over (user_id, ts): factored out so the
    heavy-user skew test can drive it on a synthetic table.  Skew note:
    per-user sessionization inherently serializes one user's events
    onto one partition; a pathological user bounds that task's runtime
    (tests/test_plan_shapes.py pins behavior at 10x-median skew)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # timestampdiff is timezone-free on TIMESTAMP_NTZ (matches DuckDB
    # EPOCH arithmetic on naive timestamps; a cast-to-long would pull
    # the session timezone in)
    sess = (
        e.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_session",
            F.when(
                F.col("prev_ts").isNull()
                | (F.expr("timestampdiff(SECOND, prev_ts, ts)") > 1800),
                1,
            ).otherwise(0),
        )
        .withColumn("session_no", F.sum("new_session").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        ))
    )
    return (
        sess.groupBy("user_id", "session_no")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr("timestampdiff(SECOND, min(ts), max(ts))").alias("duration_sec"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.max("n_events").alias("max_session_events"),
            F.max("duration_sec").alias("max_session_sec"),
            F.round(F.sum("sum_value"), 4).alias("total_value"),
        )
    )


def q_events_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join — the canonical event-enrichment operator
    Spark lacks natively (pandas merge_asof / DuckDB ASOF JOIN): each
    event is joined to the SAME user's most recent purchase event at
    or before its timestamp (NULL when none).  Implemented as the
    union-marker + running-window formulation in
    ocular_spark/operators/asof.py: ONE hash shuffle on user_id + a
    per-partition sort — no range cross-product, no Python.  The
    oracle is DuckDB's native ASOF LEFT JOIN, a genuinely independent
    second algorithm (plan-based range matching vs window carry).
    Microsecond deltas are exact BIGINTs in both engines."""
    from ocular_spark.operators.asof import asof_join_backward

    e = _load(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("ts").alias("last_purchase_ts"),
        F.col("event_id").alias("last_purchase_id"),
    )
    joined = asof_join_backward(
        e.select("event_id", "user_id", "ts", "event_type"),
        purchases,
        on=["user_id"],
        ts="ts",
        payload=["last_purchase_ts", "last_purchase_id"],
    )
    return joined.select(
        "event_id",
        "user_id",
        "event_type",
        F.col("last_purchase_id").cast("long").alias("last_purchase_id"),
        # timestampdiff is timezone-free on TIMESTAMP_NTZ (matches
        # DuckDB EPOCH_US arithmetic on naive timestamps; unix_micros
        # rejects NTZ outright)
        F.expr("timestampdiff(MICROSECOND, last_purchase_ts, ts)")
        .cast("long")
        .alias("us_since_purchase"),
    )


# --------------------------------- training-data ops: dedup / text / ANN

def q_char_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character n-gram counting (A1 corpus-count shape: one shuffle
    over (ngram) with map-side partial aggregation)."""
    d = _load_wide(spark, sf_dir, "documents")
    return (
        d.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(text) - 1), i -> substring(text, i, 2))"
                )
            ).alias("bigram")
        )
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _with_injected_dup_docs(d: DataFrame) -> DataFrame:
    """Deterministically inject exact-duplicate documents (docs with
    doc_id % 100 == 7, cloned at doc_id + 10_000_000).  The synthetic
    corpus has no exact duplicates at any SF, which made the dedup
    driver row vacuously green (VERDICT r2); the oracle SQL applies
    the identical injection."""
    clones = d.filter(F.col("doc_id") % 100 == 7).withColumn(
        "doc_id", F.col("doc_id") + 10_000_000
    )
    return d.unionByName(clones)


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate detection: hash-groupBy over text digests —
    one shuffle on the digest.  Duplicates are injected
    deterministically (see _with_injected_dup_docs) so the driver row
    asserts real group-collapse behavior."""
    d = _with_injected_dup_docs(_load(spark, sf_dir, "documents").select("doc_id", "text"))
    return (
        d.groupBy(F.md5(F.col("text")).alias("text_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min("doc_id").alias("first_doc_id"),
        )
        .filter(F.col("n_dups") > 1)
    )


# Universal-hash family for per-band minhash permutations:
# v_b = (a_b * h + c_b) mod P over the Mersenne prime P = 2^31 - 1.
# Unlike XOR-with-constant (which preserves the ordering of the high
# bits, rank-correlating the bands), multiplication mod P is a proper
# 2-universal permutation family, so the b bands are independent as the
# LSH recall/precision math assumes.  All arithmetic stays < 2^62, so
# it is exact in BIGINT on both engines (no ANSI overflow).
MINHASH_P = 2147483647
MINHASH_A = [1103515245, 1583458089, 784588716, 999999937,
             1804289383, 846930886, 1681692777, 1714636915]
MINHASH_C = [12345, 54321, 98765, 24680,
             424242, 131313, 777777, 909090]


def _minhash_perms(docs: DataFrame, n_perms: int, perm_col: str = "band") -> DataFrame:
    """(doc_id, <perm_col>, minhash): 5-char shingles, ONE md5 digest
    per shingle reduced mod P, then n_perms independent permutations
    (integer min aggregation)."""
    shingles = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(length(text) - 4, 1)),"
                " i -> substring(text, i, 5))"
            )
        ).alias("shingle"),
    )
    hashed = shingles.select(
        "doc_id",
        (
            F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10).cast("long")
            % F.lit(MINHASH_P)
        ).alias("h31"),
    )
    a_case = "CASE %s %s END" % (
        perm_col,
        " ".join(f"WHEN {i} THEN {a}L" for i, a in enumerate(MINHASH_A[:n_perms])),
    )
    c_case = "CASE %s %s END" % (
        perm_col,
        " ".join(f"WHEN {i} THEN {c}L" for i, c in enumerate(MINHASH_C[:n_perms])),
    )
    return (
        hashed.select(
            "doc_id", "h31",
            F.explode(F.expr(f"sequence(0, {n_perms - 1})")).alias(perm_col),
        )
        .withColumn("v", F.expr(f"(h31 * {a_case} + {c_case}) % {MINHASH_P}"))
        .groupBy("doc_id", perm_col)
        .agg(F.min("v").alias("minhash"))
    )


def _minhash_minhashes(docs: DataFrame) -> DataFrame:
    """4-permutation r=1 variant used by q_minhash_bands."""
    return _minhash_perms(docs, 4, "band")


def q_minhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs: 5-char shingles -> per-band min
    hash -> band-bucket grouping (near-dup detection scale path).
    Buckets with >1 doc are candidate duplicate groups."""
    d = _load_wide(spark, sf_dir, "documents")
    minhashes = _minhash_minhashes(d)
    return (
        minhashes.groupBy("band", "minhash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("first_doc_id"))
        .filter(F.col("n_docs") > 1)
    )


WORD_TRIGRAMS = (
    "transform(sequence(1, greatest(size(split(text, ' ')) - 2, 1)),"
    " i -> array_join(slice(split(text, ' '), i, 3), ' '))"
)


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard verification of MinHash-LSH candidates —
    the standard two-stage near-dup pipeline: band buckets propose
    pairs (no all-pairs), then exact shingle-set Jaccard confirms.
    Design choices that keep the pair set bounded at scale:
    (a) WORD-TRIGRAM shingles — on text, char 5-grams are so widely
        shared that buckets explode (767k candidate pairs on 5k docs
        of the sf0.1 corpus; 607 with word trigrams);
    (b) b=4, r=2 banding (bucket key = a PAIR of minhashes per band):
        per-band collision probability is the Jaccard SQUARED, so
        unrelated docs rarely collide while 4 bands keep recall high
        at the 0.5 threshold.

    SINGLE-PASS shape (round-4 rework of the triple scan+explode):
    ONE scan hashes each doc's distinct shingles to int64 INSIDE an
    array expression (the shingle strings never leave the projection,
    never shuffle), giving a compact per-doc hash-set column that is
    persisted for the query's lifetime — at 100 TB that cache is
    ~1 KB/doc vs 3 full re-scans of the corpus.  Everything downstream
    is arrays: per-band (m0, m1) signatures are array_min projections
    (no explode+groupBy), |A∩B| is array_intersect on the two cached
    hash sets (no pair×shingle explode join), |A∪B| = |A|+|B|-|A∩B|.
    Shingle identity is the 60-bit md5 prefix mod 2^31-1, identically
    in the DuckDB oracle, so a hash collision (p ~ n_shingles²/2³¹
    per doc pair) merges the same shingles in both engines."""
    global _NGRAM_BASE_PREV
    if _NGRAM_BASE_PREV is not None:  # previous call's cache, now idle
        _NGRAM_BASE_PREV.unpersist(blocking=False)
    d = _load_wide(spark, sf_dir, "documents")
    base = (
        d.select(
            "doc_id",
            F.expr(
                f"array_distinct(transform({WORD_TRIGRAMS},"
                f" s -> cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint)"
                f" % {MINHASH_P}))"
            ).alias("hs"),
        )
        .withColumn("n_shingles", F.size("hs").cast("long"))
        .persist()
    )
    _NGRAM_BASE_PREV = base

    def minh(perm: int):
        a, c = MINHASH_A[perm], MINHASH_C[perm]
        return F.array_min(
            F.transform(
                "hs", lambda h: (h * F.lit(a) + F.lit(c)) % F.lit(MINHASH_P)
            )
        )

    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                minh(2 * b).alias("m0"),
                minh(2 * b + 1).alias("m1"),
            )
            for b in range(4)
        ]
    )
    sigx = base.select("doc_id", F.explode(band_structs).alias("s")).select(
        "doc_id", "s.band", "s.m0", "s.m1"
    )
    pairs = (
        sigx.alias("a")
        .join(sigx.alias("b"), ["band", "m0", "m1"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )
    # candidate pairs are few (LSH-bounded): broadcast them so the two
    # hash-set lookups against the cached base are map-side joins
    cand = (
        F.broadcast(pairs)
        .join(
            base.select(
                F.col("doc_id").alias("id_a"),
                F.col("hs").alias("hs_a"),
                F.col("n_shingles").alias("n_a"),
            ),
            "id_a",
        )
        .join(
            base.select(
                F.col("doc_id").alias("id_b"),
                F.col("hs").alias("hs_b"),
                F.col("n_shingles").alias("n_b"),
            ),
            "id_b",
        )
    )
    return (
        cand.withColumn(
            "n_shared", F.size(F.array_intersect("hs_a", "hs_b")).cast("long")
        )
        .withColumn(
            "jaccard",
            F.round(F.col("n_shared") / (F.col("n_a") + F.col("n_b") - F.col("n_shared")), 4),
        )
        .filter(F.col("jaccard") >= 0.5)
        .select("id_a", "id_b", "n_shared", "jaccard")
    )


def _cc_min_label(edges: DataFrame, max_rounds: int = 20) -> DataFrame:
    """Connected components over a symmetric (src, dst) edge list by
    min-label propagation with pointer jumping (the MapReduce-CC
    family: Rastogi et al. 2013 hash-to-min; Kiveris et al. 2014
    small-star/large-star).  Per round: (1) label(v) <- min(label(v),
    min over neighbors' labels) — one join + one partial-aggregated
    groupBy, both shuffling only the edge/label tables; (2) pointer
    jump label(v) <- label(label(v)) — one self-join.  Together they
    converge in O(log diameter) rounds vs O(diameter) for propagation
    alone.  Labels are monotone non-increasing and bounded below, so
    sum(label) strictly decreases iff ANY label changed — the
    convergence probe is a single scalar agg per round, no row-diff
    join.  localCheckpoint truncates the per-round lineage so the
    plan stays O(1) instead of growing by two joins every round.

    100 TB shape: the input here is the LSH-VERIFIED pair graph —
    orders of magnitude smaller than the corpus (each table involved
    is O(|dup candidates|), never O(corpus)) — and every step is a
    key-partitioned join/agg with map-side combine; nothing collects
    to the driver but the one convergence scalar."""
    # materialize the edge list ONCE: without this every round's two
    # actions re-run the whole upstream pair pipeline (the LSH band
    # self-join), turning O(log d) cheap rounds into O(log d) full
    # corpus passes (measured 11.7 s -> ~1 s at sf0.1).  Lifetime:
    # each round's localCheckpoint becomes unreferenced when the loop
    # variable advances, so Spark's ContextCleaner reclaims the cached
    # blocks on GC — repeated calls do not accumulate live storage
    # (unlike a persist() without unpersist, r4 ADVICE class).
    edges = edges.localCheckpoint()
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    prev_sum = None
    for _ in range(max_rounds):
        nbr = (
            edges.join(
                labels.select(
                    F.col("node").alias("dst"), F.col("label").alias("dlabel")
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("dlabel").alias("nbr_min"))
            .select(F.col("src").alias("node"), "nbr_min")
        )
        prop = labels.join(nbr, "node", "left").select(
            "node",
            F.least("label", F.coalesce("nbr_min", "label")).alias("label"),
        )
        jumped = prop.join(
            prop.select(
                F.col("node").alias("pnode"), F.col("label").alias("plabel")
            ),
            prop["label"] == F.col("pnode"),
        ).select("node", F.col("plabel").alias("label"))
        labels = jumped.localCheckpoint()
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]
        if cur_sum == prev_sum:
            return labels
        prev_sum = cur_sum
    raise RuntimeError(
        f"connected components did not converge in {max_rounds} rounds"
    )


def q_dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive closure of the near-dup pipeline: LSH candidates ->
    exact-Jaccard-verified pairs (q_ngram_jaccard) -> connected
    components, yielding one cluster id (= min doc_id in the
    component) per duplicated document plus the cluster size.  This
    is the stage that makes dedup actually drop rows: keep
    doc_id == cluster_id, discard the rest — without it, A~B and B~C
    leaves both A,B and B,C pairs and no consistent survivor set.

    Oracle: an independent formulation — DuckDB recursive-CTE
    reachability (full transitive closure, min over reached nodes) vs
    Spark's iterative label propagation; agreement is a genuine
    two-algorithm gate."""
    pairs = q_ngram_jaccard(spark, sf_dir).select("id_a", "id_b")
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    labels = _cc_min_label(edges)
    sizes = labels.groupBy("label").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return labels.join(sizes, "label").select(
        F.col("node").alias("doc_id"),
        F.col("label").alias("cluster_id"),
        F.col("cluster_size"),
    )


SPLIT_TRAIN_PCT, SPLIT_VALID_PCT = 80, 10
_SPLIT_HASH_TMPL = "({k} % 1000003) * 48271 % 2147483647 % 100"


def q_split_by_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/valid/test split: the split key is the
    NEAR-DUP CLUSTER id (q_dedup_cluster's connected component; a doc
    with no near-dups is its own singleton cluster), so near-duplicate
    documents can never straddle splits — the eval-contamination mode
    a naive hash-of-doc_id split ships silently whenever dedup keeps
    both copies (or runs after splitting).  Assignment is the same
    deterministic Lehmer hash-mod as training_mix (reproducible across
    retries/resumes; production: xxhash64(cluster_id, seed)).

    100 TB shape: the cluster map joins back on doc_id — sort-merge,
    NOT broadcast, since the duplicated subset is corpus-sized at web
    scale (30-50% of a crawl) — then the split itself is a pure
    projection.  The driver gate is end-to-end independent: the DuckDB
    oracle recomputes the clusters by recursive-CTE reachability (the
    dedup_cluster two-algorithm gate) and re-derives every assignment."""
    docs = _load_wide(spark, sf_dir, "documents").select("doc_id")
    clusters = q_dedup_cluster(spark, sf_dir).select("doc_id", "cluster_id")
    keyed = docs.join(clusters, "doc_id", "left").select(
        "doc_id", F.coalesce("cluster_id", "doc_id").alias("split_key")
    )
    h = F.expr(_SPLIT_HASH_TMPL.format(k="split_key"))
    split = (
        F.when(h < SPLIT_TRAIN_PCT, "train")
        .when(h < SPLIT_TRAIN_PCT + SPLIT_VALID_PCT, "valid")
        .otherwise("test")
    )
    return keyed.select("doc_id", "split_key", split.alias("split"))


C4_LINE_WORDS = 9  # fixture line width (words per injected line)


def q_c4_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line-level page cleaning (Raffel et al. 2020 §2.2,
    the third public quality-heuristic family in the library after
    Gopher and jusText/boilerpipe): split the page into lines, keep
    lines that (a) end in terminal punctuation, (b) have >= 5 words,
    (c) don't mention javascript; drop the whole page if it contains
    'lorem ipsum' or '{' or keeps < 3 lines.  The word-list corpus
    has neither lines nor punctuation, so the fixture injects them
    deterministically: 9-word lines, terminal '.' on two of every
    three lines, a 'javascript' token on every 4th line of doc_id%7=0
    docs, and page-level 'lorem ipsum' / '{' markers on doc_id%50 in
    {13, 27}.

    100 TB shape: ONE projection — line split, per-line predicates,
    and the page gate are all array expressions over the scan; no
    shuffle, no Python.  The DuckDB oracle mirrors the chain."""
    d = _load_wide(spark, sf_dir, "documents").select("doc_id", "text")
    did = F.col("doc_id")
    words = F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    n_lines_c = F.ceil(F.size(words) / C4_LINE_WORDS).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), n_lines_c - 1),
        lambda k: F.concat(
            F.when(
                (did % 7 == 0) & (k % 4 == 1), F.lit("javascript ")
            ).otherwise(""),
            F.array_join(F.slice(words, k * C4_LINE_WORDS + 1,
                                 C4_LINE_WORDS), " "),
            F.when(k % 3 != 2, ".").otherwise(""),
        ),
    )
    lines = F.when(did % 50 == 13, F.concat(lines, F.array(
        F.lit("lorem ipsum filler text here.")))).otherwise(
        F.when(did % 50 == 27, F.concat(lines, F.array(
            F.lit("config { page marker here.")))).otherwise(lines)
    )
    kept = F.filter(
        lines,
        lambda l: F.substring(l, -1, 1).isin(".", "!", "?")
        & (F.size(F.split(l, " ")) >= 5)
        & (~l.contains("javascript")),
    )
    page_text = F.array_join(lines, "\n")
    page_kept = (
        (~page_text.contains("lorem ipsum"))
        & (~page_text.contains("{"))
        & (F.size(kept) >= 3)
    )
    return d.filter(F.size(words) > 0).select(
        "doc_id",
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept_lines"),
        page_kept.alias("page_kept"),
        F.when(page_kept, F.array_join(kept, "\n")).alias("clean_text"),
    )


def q_split_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-contamination audit: for every VERIFIED near-dup pair,
    check whether its two members landed in different dataset splits —
    the eval-leakage event.  Two assignment methods are audited side
    by side: 'cluster' (q_split_by_cluster — keyed on the connected
    component, so straddling is structurally impossible and the gate
    proves n_straddling = 0) and 'naive' (the same Lehmer hash keyed
    on raw doc_id — the common shortcut, which the fixture shows DOES
    leak).  This is the measurement that justifies split_by_cluster's
    extra join at 100 TB: the audit itself is pair-count-sized (the
    verified near-dup pair list), so it costs nothing next to dedup.

    100 TB shape: pairs are the LSH-verified output (already bounded);
    each side joins its split assignment on doc_id; the final rollup
    is a 2-row aggregate."""
    pairs = q_ngram_jaccard(spark, sf_dir).select("id_a", "id_b")
    assign = q_split_by_cluster(spark, sf_dir).select(
        "doc_id", F.col("split").alias("cluster_split")
    )
    h = _SPLIT_HASH_TMPL.format(k="doc_id")
    naive = (
        F.when(F.expr(h) < SPLIT_TRAIN_PCT, "train")
        .when(F.expr(h) < SPLIT_TRAIN_PCT + SPLIT_VALID_PCT, "valid")
        .otherwise("test")
    )
    assign = assign.withColumn("naive_split", naive)
    a = assign.select(
        F.col("doc_id").alias("id_a"),
        F.col("cluster_split").alias("ca"), F.col("naive_split").alias("na"),
    )
    b = assign.select(
        F.col("doc_id").alias("id_b"),
        F.col("cluster_split").alias("cb"), F.col("naive_split").alias("nb"),
    )
    j = pairs.join(a, "id_a").join(b, "id_b")
    rolled = j.select(
        (F.col("ca") != F.col("cb")).cast("long").alias("cluster_straddle"),
        (F.col("na") != F.col("nb")).cast("long").alias("naive_straddle"),
    ).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("cluster_straddle").alias("cluster_n"),
        F.sum("naive_straddle").alias("naive_n"),
    )
    return rolled.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("cluster").alias("method"),
                    F.col("n_pairs").alias("n_pairs"),
                    F.col("cluster_n").alias("n_straddling"),
                ),
                F.struct(
                    F.lit("naive").alias("method"),
                    F.col("n_pairs").alias("n_pairs"),
                    F.col("naive_n").alias("n_straddling"),
                ),
            )
        ).alias("r")
    ).select("r.method", "r.n_pairs", "r.n_straddling")


BLOOM_M, BLOOM_K, BLOOM_W = 1024, 3, 32  # bits, hashes, bits per word


def _bloom_pos_from_digest(i: int):
    """Hash i of a Bloom family over an `h` = md5(text) column:
    disjoint 8-hex-char substrings of ONE digest (values < 2^32,
    exact in BIGINT) mod M — identical in Spark and DuckDB."""
    return (
        F.conv(F.substring(F.col("h"), 1 + 8 * i, 8), 16, 10).cast("long")
        % BLOOM_M
    )


def q_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast Bloom-filter membership pre-filter — the shuffle-free
    first pass of incremental dedup at 100 TB: instead of anti-joining
    every new crawl batch against the seen-corpus (a corpus-sized
    shuffle), build an m-bit Bloom over the seen digests ONCE (a tiny
    aggregation: m/32 words via bit_or), ship it as a literal array
    (here; a broadcast variable at real m), and probe each new doc
    with a pure projection.  No false negatives — every true duplicate
    is flagged (the injected clones must all report might_contain=1);
    false positives (~14% at this load factor) go to the exact
    verifier, which now touches a fraction of the batch.

    Packing uses 32-bit words in BIGINT so every shift stays below the
    sign bit — Spark's shiftleft and DuckDB's << then agree exactly.
    Seen set = even doc_ids; probe set = odd doc_ids (false-positive
    measurement) + exact clones of seen docs (no-false-negative
    proof)."""
    d = _load(spark, sf_dir, "documents").select("doc_id", "text")
    seen = d.filter(F.col("doc_id") % 2 == 0)
    probe = d.filter(F.col("doc_id") % 2 == 1).unionByName(
        seen.filter(F.col("doc_id") % 100 == 8).withColumn(
            "doc_id", F.col("doc_id") + 10_000_000
        )
    )
    n_words = BLOOM_M // BLOOM_W
    # digest ONCE per row; every hash position is a substring of it
    # (don't rely on Catalyst CSE for k md5 calls over a text column)
    pos = seen.select(F.md5("text").alias("h")).select(
        F.explode(
            F.array(*[_bloom_pos_from_digest(i) for i in range(BLOOM_K)])
        ).alias("p")
    )
    words = (
        pos.select(
            (F.col("p") / BLOOM_W).cast("int").alias("w"),
            F.expr(f"shiftleft(1L, cast(p % {BLOOM_W} as int))").alias("b"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(b)").alias("bits"))
        .collect()
    )
    by_w = {r.w: r.bits for r in words}
    lit_words = F.array(
        *[F.lit(int(by_w.get(w, 0))).cast("long") for w in range(n_words)]
    )
    def p_sql(i: int) -> str:
        return (
            f"(cast(conv(substring(h, {1 + 8 * i}, 8), 16, 10)"
            f" as bigint) % {BLOOM_M})"
        )

    checks = []
    for i in range(BLOOM_K):
        word = F.element_at(
            lit_words, F.expr(f"cast({p_sql(i)} / {BLOOM_W} as int)") + 1
        )
        mask = F.expr(
            f"shiftleft(1L, cast({p_sql(i)} % {BLOOM_W} as int))"
        )
        checks.append(word.bitwiseAND(mask) != 0)
    might = checks[0]
    for c in checks[1:]:
        might = might & c
    return probe.select("doc_id", F.md5("text").alias("h")).select(
        "doc_id", F.when(might, 1).otherwise(0).cast("int").alias("might_contain")
    )


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text quality metrics: token counts, average word length,
    stopword ratio (quality-scoring operator)."""
    d = _load_wide(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    stop = F.filter(toks, lambda t: t.isin("the", "a", "and", "of", "to"))
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars_txt"),
        F.size(toks).alias("n_tokens"),
        F.round(
            (F.length("text") - F.size(toks) + 1) / F.size(toks), 4
        ).alias("avg_word_len"),
        F.round(F.size(stop) / F.size(toks), 4).alias("stopword_ratio"),
    )


def q_contract_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-contract audit (Great-Expectations-style
    expectation suite as ONE aggregation pass): seven rules over the
    documents table — null checks, key uniqueness, a cross-column
    consistency invariant (n_chars == length(text)), a length floor,
    two enum membership rules and a format rule — each reported as
    (rule, n_checked, n_violations, status).  The fixture makes both
    statuses occur (min_text_len_100 and lang_latin_script fail).

    100 TB shape: every rule except uniqueness is a map-side
    SUM(CASE) folded into ONE partial-aggregated pass; uniqueness is
    the single COUNT(DISTINCT key) (exact by contract-audit
    requirements — the sketch alternative is the hll_distinct row).
    The unpivot to rule rows is stack() over a 1-row frame — free."""
    d = _load_wide(spark, sf_dir, "documents")
    agg = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("doc_id").alias("n_key"),
        F.sum(F.when(F.col("text").isNull(), 1).otherwise(0)).alias("v_null"),
        F.sum(
            F.when(F.col("n_chars") != F.length("text"), 1).otherwise(0)
        ).alias("v_cons"),
        F.sum(F.when(F.length("text") < 100, 1).otherwise(0)).alias("v_len"),
        F.sum(
            F.when(
                ~F.col("lang").isin("en", "de", "fr", "es", "zh"), 1
            ).otherwise(0)
        ).alias("v_enum"),
        F.sum(
            F.when(~F.col("lang").isin("en", "de", "fr", "es"), 1).otherwise(0)
        ).alias("v_latin"),
        F.sum(F.when(~F.col("source").startswith("src"), 1).otherwise(0)).alias(
            "v_src"
        ),
    )
    rules = agg.selectExpr(
        "stack(7, "
        "'not_null_text', n, v_null, "
        "'unique_doc_id', n, n - n_key, "
        "'n_chars_matches_text', n, v_cons, "
        "'min_text_len_100', n, v_len, "
        "'lang_in_enum', n, v_enum, "
        "'lang_latin_script', n, v_latin, "
        "'source_prefix', n, v_src"
        ") as (rule, n_checked, n_violations)"
    )
    return rules.select(
        "rule",
        F.col("n_checked").cast("long").alias("n_checked"),
        F.col("n_violations").cast("long").alias("n_violations"),
        F.when(F.col("n_violations") == 0, F.lit("pass"))
        .otherwise(F.lit("fail"))
        .alias("status"),
    )


def q_spans_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interleaved-span algebra: merge runs of ADJACENT text spans
    (concatenate with '|') and re-assign dense offsets, media spans
    untouched — the compaction every extraction pipeline runs after
    span-level strips/filters leave fragmented text runs behind (the
    north-rule (kind, text, media_ref, offset) invariant, here for
    the span REWRITE class rather than pass-through).

    Four adjacency classes by doc_id % 4 (text-text-media-text /
    media-text-text-text / text-media-media-text / single text) so
    merges, non-merges (adjacent MEDIA never merges) and singletons
    all occur.  SHUFFLE-FREE: the merge is one aggregate() fold over
    the spans array inside a projection — never explode-shuffle-
    regroup.  The oracle is the classic gaps-and-islands window
    formulation (off - ROW_NUMBER() island ids + STRING_AGG) — a
    genuinely different decomposition of the same spec."""
    d = _load_wide(spark, sf_dir, "documents")

    def t(i):
        return (
            f"named_struct('kind', 'text',"
            f" 'text', concat('p', doc_id, '.', {i}),"
            f" 'media_ref', cast(null as string), 'offset', {i})"
        )

    def m(i):
        return (
            f"named_struct('kind', 'media', 'text', cast(null as string),"
            f" 'media_ref', concat('m-', doc_id, '-', {i}), 'offset', {i})"
        )

    spans = F.expr(
        "case cast(doc_id % 4 as int) "
        f"when 0 then array({t(0)}, {t(1)}, {m(2)}, {t(3)}) "
        f"when 1 then array({m(0)}, {t(1)}, {t(2)}, {t(3)}) "
        f"when 2 then array({t(0)}, {m(1)}, {m(2)}, {t(3)}) "
        f"else array({t(0)}) end"
    )
    compacted = F.expr(
        "aggregate(spans, "
        "cast(array() as array<struct<kind:string,text:string,media_ref:string> >), "
        "(acc, sp) -> if(sp.kind = 'text' and size(acc) > 0 "
        "and element_at(acc, -1).kind = 'text', "
        "concat(slice(acc, 1, size(acc) - 1), array(named_struct("
        "'kind', 'text', "
        "'text', concat(element_at(acc, -1).text, '|', sp.text), "
        "'media_ref', cast(null as string)))), "
        "concat(acc, array(named_struct('kind', sp.kind, 'text', sp.text, "
        "'media_ref', sp.media_ref)))))"
    )
    return (
        d.select("doc_id", spans.alias("spans"))
        .select("doc_id", compacted.alias("spans"))
        .select("doc_id", F.posexplode("spans").alias("pos", "sp"))
        .select(
            "doc_id",
            F.col("pos").cast("int").alias("offset"),
            F.col("sp.kind").alias("kind"),
            F.col("sp.text").alias("text"),
            F.col("sp.media_ref").alias("media_ref"),
        )
    )


def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon character-distribution entropy per document — the
    classic repetitive/low-diversity quality signal (the cheap proxy
    for the compression-ratio filters real curation pipelines run;
    H = ln(N) - (1/N) * sum_c cnt_c * ln(cnt_c)).

    SHUFFLE-FREE: the per-doc char histogram is computed INSIDE one
    array expression (array_distinct + size(filter(...)) per distinct
    char, O(distinct x len) JVM comparisons per doc), never exploded
    to a (doc, char) shuffle — corpus-size-independent per-row cost.

    Float discipline (the decayed_counts/bm25 construction): the
    entropy numerator is sum(floor(cnt * ln(cnt) * 1e6)) — an
    ORDER-FREE exact BIGINT (each term a deterministic IEEE expression
    over exact integer counts; ln() agreed bit-for-bit cross-engine in
    the bm25/pmi/quality_logit rows) — so the one float expression at
    the end is assembled identically in both engines regardless of
    aggregation order.  The oracle is an independent decomposition
    (unnest + two GROUP BYs) of the same integer spec."""
    d = _load_wide(spark, sf_dir, "documents")
    chars = (
        "case when length(text) = 0 then array() "
        "else transform(sequence(1, length(text)), i -> substring(text, i, 1)) end"
    )
    staged = d.select("doc_id", F.length("text").alias("n_chars"),
                      F.expr(chars).alias("cs"))
    counted = staged.select(
        "doc_id", "n_chars",
        F.expr(
            "transform(array_distinct(cs),"
            " c -> size(filter(cs, x -> x = c)))"
        ).alias("counts"),
    )
    return counted.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.size("counts").cast("long").alias("n_distinct"),
        F.expr(
            "case when n_chars > 0 then round("
            "ln(cast(n_chars as double)) - "
            "(cast(aggregate(counts, 0L, (acc, c) -> acc + "
            "floor(cast(c as double) * ln(cast(c as double)) * 1000000D)"
            ") as double) / 1000000D) / cast(n_chars as double), 6) "
            "else 0.0 end"
        ).alias("char_entropy"),
    )


# Gopher-style document quality gate (Rae et al. 2021 §A1.1 rules 1-4),
# thresholds scaled to the fixture corpus (10-99 words/doc) so both
# verdict classes occur; at 100 TB the same projection runs unchanged
QF_MIN_WORDS, QF_MAX_WORDS = 30, 100_000
QF_MIN_MWL, QF_MAX_MWL = 3.0, 10.0
QF_MIN_STOP_HITS = 2          # distinct stopwords present (Gopher: >= 2)
QF_MIN_ALPHA_FRAC = 0.8       # words that are purely alphabetic
QF_STOPWORDS = ("the", "a", "of", "to", "and", "in")


def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality-filter verdict per document: the four cheap
    Gopher document rules (word count bounds, mean word length band,
    distinct-stopword floor, alphabetic-word fraction) computed and
    combined into a keep/drop verdict in ONE map-side JVM projection —
    the realistic first stage of a training-data pipeline, where the
    verdict column then drives a partition-pruning filter downstream.
    No shuffle, no Python; every signal is also emitted so the oracle
    pins the intermediate arithmetic, not just the verdict."""
    d = _load_wide(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    mwl = F.round(
        F.aggregate(toks, F.lit(0), lambda a, w: a + F.length(w)) / n, 4
    )
    stop_hits = F.size(F.array_intersect(toks, F.array(*[F.lit(s) for s in QF_STOPWORDS])))
    alpha = F.round(
        F.size(F.filter(toks, lambda t: t.rlike("^[a-zA-Z]+$"))) / n, 4
    )
    out = d.select(
        "doc_id",
        n.alias("n_words"),
        mwl.alias("mean_word_len"),
        stop_hits.alias("stop_hits"),
        alpha.alias("alpha_frac"),
    )
    keep = (
        (F.col("n_words") >= QF_MIN_WORDS)
        & (F.col("n_words") <= QF_MAX_WORDS)
        & (F.col("mean_word_len") >= QF_MIN_MWL)
        & (F.col("mean_word_len") <= QF_MAX_MWL)
        & (F.col("stop_hits") >= QF_MIN_STOP_HITS)
        & (F.col("alpha_frac") >= QF_MIN_ALPHA_FRAC)
    )
    return out.withColumn("keep", keep.cast("int"))


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways (training-data budget estimation):
    whitespace tokens and a BPE-ish regex segmentation (letter runs /
    digit runs / single punctuation — the GPT-2 pretokenizer shape,
    restricted to constructs Java regex and RE2 treat identically).
    Pure JVM expressions; one map-only pass."""
    d = _load_wide(spark, sf_dir, "documents")
    # pattern passed as a Column literal, NOT through a SQL string
    # (Spark SQL literals eat single backslashes: '\s' -> 's')
    bpe = F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]")
    n_bpe = F.size(F.regexp_extract_all(F.col("text"), bpe, F.lit(0)))
    n_ws = F.size(F.split(F.trim("text"), r"\s+"))
    return d.select(
        "doc_id",
        n_ws.alias("n_ws_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        F.round(n_bpe / n_ws, 4).alias("bpe_per_word"),
    )


def _run_length_masses(sorted_grams):
    """Given a SORTED array column of n-gram strings, return
    (run_lengths, char_masses) array columns where run i covers one
    distinct n-gram g_i: run_lengths[i] = occurrence count of g_i,
    char_masses[i] = count * length(g_i).  Duplicate detection on a
    sorted array is pure adjacency — no groupBy, no shuffle: the whole
    repetition profile of a document is computed inside one JVM array
    expression (run starts -> run ends -> zip_with diffs)."""
    s = sorted_grams
    m = F.size(s)
    # 0-based indices where a new run starts; the greatest(i,1) guard
    # keeps element_at's 1-based index legal under ANSI mode at i=0
    # (the i==0 disjunct already keeps that position).
    starts = F.filter(
        F.sequence(F.lit(0), m - 1),
        lambda i: (i == F.lit(0))
        | (F.element_at(s, i + 1) != F.element_at(s, F.greatest(i, F.lit(1)))),
    )
    ends = F.concat(F.slice(starts, 2, m), F.array(m))
    runlens = F.zip_with(starts, ends, lambda a, b: b - a)
    masses = F.zip_with(
        starts, runlens, lambda st, l: l * F.length(F.element_at(s, st + 1))
    )
    return runlens, masses


def q_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition quality signals in the style of the
    Gopher data-quality filters (Rae et al. 2021, Appendix A1.1; also
    used by MassiveText/Dolma/NeMo-Curator pipelines): per document,
    the character mass of the heaviest word 2-gram and the character
    mass of all DUPLICATED word {2,3}-grams, as fractions of document
    length.  Deviation from the paper (documented, deterministic):
    'top' is the max of count*len over distinct 2-grams (char-mass
    argmax) rather than most-frequent-then-mass, which removes the
    count-tie ambiguity; masses of overlapping occurrences double
    count, so fractions may exceed 1 on degenerate inputs.

    100 TB shape: the metric is per-document, so it is computed
    SHUFFLE-FREE — n-grams are built, sorted, and run-length analyzed
    inside one array-expression projection (see _run_length_masses);
    zero exchanges, map-only over the scan.  The DuckDB oracle is an
    independent formulation (unnest + GROUP BY counts), making this a
    two-implementation gate on the semantics."""
    d = _load_wide(spark, sf_dir, "documents")
    words = F.split(F.trim(F.col("text")), r"\s+")
    nw = F.size(words)
    n_chars = F.length("text")

    def grams(n):
        # 1-based start positions 1..nw-n+1; the when() guard keeps
        # sequence() ascending (sequence(1,0) would descend) and
        # element_at in bounds for short docs
        idx = F.sequence(F.lit(1), nw - (n - 1))
        joined = lambda i: F.concat_ws(
            " ", *[F.element_at(words, i + k) for k in range(n)]
        )
        return F.when(nw >= n, F.array_sort(F.transform(idx, joined))).otherwise(
            F.array().cast("array<string>")
        )

    base = d.select(
        "doc_id", n_chars.alias("n_chars"), nw.alias("n_words"),
        grams(2).alias("g2"), grams(3).alias("g3"),
    )
    r2, m2 = _run_length_masses(F.col("g2"))
    r3, m3 = _run_length_masses(F.col("g3"))

    def dup_mass(runlens, masses):
        kept = F.zip_with(
            runlens, masses,
            lambda l, ms: F.when(l >= F.lit(2), ms).otherwise(F.lit(0)),
        )
        return F.aggregate(kept, F.lit(0), lambda acc, x: acc + x)

    zero = F.lit(0.0)
    return base.select(
        "doc_id",
        "n_words",
        F.when(F.size("g2") > 0, F.round(F.array_max(m2) / F.col("n_chars"), 4))
        .otherwise(zero)
        .alias("top_bigram_frac"),
        F.when(F.size("g2") > 0, F.round(dup_mass(r2, m2) / F.col("n_chars"), 4))
        .otherwise(zero)
        .alias("dup_bigram_frac"),
        F.when(F.size("g3") > 0, F.round(dup_mass(r3, m3) / F.col("n_chars"), 4))
        .otherwise(zero)
        .alias("dup_trigram_frac"),
    )


def q_audio_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio ingest under the driver gate (multimodal binary-column
    contract, functions/media.py): deterministic mono int16 PCM is
    synthesized per doc inside a kernel — four equal time slices, each
    a CONSTANT amplitude a_k = ((doc_id*31 + k*97) % 20000) + 1000,
    n_frames = 4*(50 + doc_id % 7) — encoded with the REAL stdlib WAV
    codec, then pushed through the real Arrow metadata/feature kernel
    (audio_meta_kernel: wave parse + 4-band RMS).

    The DuckDB oracle predicts every output analytically: a constant-
    amplitude band's RMS is EXACTLY a_k/32768 in IEEE float64 (a_k and
    a_k^2 are exactly representable; the band mean of identical exact
    doubles and its sqrt are both correctly-rounded back to the exact
    dyadic value), so a hash match proves the WAV encode -> parse ->
    float conversion -> band slicing round-trip is lossless — the same
    construction-formula-oracle pattern as q_pdf_ingest.

    100 TB shape: both stages are Arrow-batched mapInPandas over the
    opaque binary column; no shuffle at all (audio stays in its scan
    partition end-to-end)."""
    from ocular_spark.functions.media import AUDIO_META_SCHEMA, audio_meta_kernel

    d = (
        _load_wide(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 25 == 0)
        .select("doc_id")
    )

    def make_wavs(batches):
        import numpy as np
        import pandas as pd

        from ocular_spark.functions.media import encode_wav

        for b in batches:
            rows = []
            for raw in b["doc_id"]:
                doc_id = int(raw)
                m = 50 + doc_id % 7
                x = np.concatenate(
                    [
                        np.full(m, ((doc_id * 31 + k * 97) % 20000) + 1000,
                                dtype=np.int16)
                        for k in range(4)
                    ]
                )
                rows.append((f"a-{doc_id}", encode_wav(x)))
            yield pd.DataFrame(rows, columns=["media_ref", "audio"])

    wavs = d.mapInPandas(make_wavs, schema="media_ref string, audio binary")
    meta = wavs.mapInPandas(audio_meta_kernel, schema=AUDIO_META_SCHEMA)
    return meta.select(
        "media_ref", "sample_rate", "n_channels", "sample_width", "n_frames",
        *[F.round(f"rms_b{k}", 6).alias(f"rms_b{k}") for k in range(4)],
    )


def q_video_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling under the driver gate: per-doc synthetic
    clips in the RAWV fixture container (functions/media.py — real
    video codecs are unavailable here and the container is honestly
    labeled; the SAMPLING LOGIC under test is real), each with
    n = 2 + doc_id % 5 constant-level frames (frame j's level is
    (doc_id*11 + j*17) % 256), pushed through video_sample_kernel
    (uniform-stride sampling: sample i reads source frame
    (i*n)//min(k,n), k=3).  The oracle replays the stride arithmetic
    and level formula analytically — a hash match proves container
    encode -> demux -> stride indexing -> frame stats end-to-end,
    including the n < k clips where fewer than k frames come back.

    100 TB shape: Arrow-batched mapInPandas over the opaque binary
    column; frames re-expand as rows (the pdf_ingest page-expansion
    shape) so downstream per-frame work repartitions freely."""
    from ocular_spark.functions.media import (
        VIDEO_FRAMES_SCHEMA,
        video_sample_kernel,
    )

    d = (
        _load_wide(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 25 == 0)
        .select("doc_id")
    )

    def make_clips(batches):
        import numpy as np
        import pandas as pd

        from ocular_spark.functions.media import encode_rawv

        for b in batches:
            rows = []
            for raw in b["doc_id"]:
                doc_id = int(raw)
                h, w = 8 + doc_id % 3, 12
                n = 2 + doc_id % 5
                frames = [
                    np.full((h, w), (doc_id * 11 + j * 17) % 256, dtype=np.uint8)
                    for j in range(n)
                ]
                rows.append((f"v-{doc_id}", encode_rawv(frames)))
            yield pd.DataFrame(rows, columns=["media_ref", "video"])

    clips = d.mapInPandas(make_clips, schema="media_ref string, video binary")
    return clips.mapInPandas(video_sample_kernel(3), schema=VIDEO_FRAMES_SCHEMA)


def q_image_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image ingest under the driver gate — completes the multimodal
    quartet (pdf/audio/video/image) over the opaque-binary contract:
    per-doc grayscale gradient images (pixel (y, x) of doc d is
    (d*7 + y*13 + x*29) % 256, h = 16 + d%5, w = 24 + d%3) are encoded
    with the REAL pure-stdlib PNG codec (functions/png.py: zlib +
    Paeth-filter pipeline), then pushed through image_meta_kernel:
    PNG decode -> nearest-neighbor 8x12 thumbnail (resize_gray's exact
    integer index gather: source row of thumbnail row i is
    min((i*h)//8, h-1)) -> exact-integer stats (min/max/sum/position-
    weighted sum).

    The DuckDB oracle replays the construction formula AND the resize
    index arithmetic analytically over a generated (i, j) grid — every
    output is an exact integer, so a hash match proves the PNG encode
    -> inflate/unfilter -> index-gather resize round-trip is lossless
    at every thumbnail position (the weighted sum fails on any
    transposition or shift that preserves the histogram).

    100 TB shape: both stages are Arrow-batched mapInPandas over the
    binary column; zero shuffle (images never leave their scan
    partition).  Real deployments swap the gradient synthesizer for a
    binary-column scan and resize_gray for a SIMD decoder — schemas,
    batching, and kernel signatures are unchanged."""
    from ocular_spark.functions.media import IMAGE_META_SCHEMA, image_meta_kernel

    d = (
        _load_wide(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 25 == 0)
        .select("doc_id")
    )

    def make_pngs(batches):
        import numpy as np
        import pandas as pd

        from ocular_spark.functions.png import encode_gray_png

        for b in batches:
            rows = []
            for raw in b["doc_id"]:
                doc_id = int(raw)
                h, w = 16 + doc_id % 5, 24 + doc_id % 3
                y = np.arange(h, dtype=np.int64)[:, None]
                x = np.arange(w, dtype=np.int64)[None, :]
                img = ((doc_id * 7 + y * 13 + x * 29) % 256).astype(np.uint8)
                rows.append((f"i-{doc_id}", encode_gray_png(img)))
            yield pd.DataFrame(rows, columns=["media_ref", "image"])

    pngs = d.mapInPandas(make_pngs, schema="media_ref string, image binary")
    return pngs.mapInPandas(image_meta_kernel(8, 12), schema=IMAGE_META_SCHEMA)


def q_image_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image dedup — the multimodal analog of
    dedup_exact: per-doc images are synthesized so that docs sharing
    g = (doc_id // 5) % 5 have the SAME underlying pattern at a
    DIFFERENT uniform brightness (offset = doc_id % 40, values kept
    <= 239 so nothing wraps), pushed through the real codec path
    (functions/png.py encode -> decode), dHash'd (media.dhash_gray:
    8x9 nearest-neighbor thumbnail, adjacent-pixel comparison bits),
    and grouped by hash.  Exact byte-dedup CANNOT group these (every
    PNG differs — n_offsets > 1 per group certifies it analytically);
    the brightness-invariant dHash groups them all.

    The DuckDB oracle replays construction + the resize index gather
    + the comparison bits analytically over a generated (i, j) grid —
    every bit is integer-derived, so a hash match proves the PNG
    round-trip AND the dHash kernel bit-for-bit.

    100 TB shape: hashing is Arrow-batched mapInPandas over the binary
    column (images never leave their scan partition); the only
    exchange is the final groupBy on the 64-char hash key — the same
    single-shuffle shape as dedup_exact."""
    from ocular_spark.functions.media import (
        IMAGE_DHASH_SCHEMA,
        image_dhash_kernel,
    )

    d = (
        _load_wide(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 5 == 0)
        .select("doc_id")
    )

    def make_pngs(batches):
        import numpy as np
        import pandas as pd

        from ocular_spark.functions.png import encode_gray_png

        for b in batches:
            rows = []
            for raw in b["doc_id"]:
                doc_id = int(raw)
                g = (doc_id // 5) % 5
                h, w = 16 + g % 5, 24 + g % 3
                off = doc_id % 40
                y = np.arange(h, dtype=np.int64)[:, None]
                x = np.arange(w, dtype=np.int64)[None, :]
                img = (((g * 37 + y * 13 + x * 29) % 200) + off).astype(
                    np.uint8
                )
                rows.append((doc_id, f"p-{doc_id}", encode_gray_png(img)))
            yield pd.DataFrame(rows, columns=["doc_id", "media_ref", "image"])

    pngs = d.mapInPandas(
        make_pngs, schema="doc_id long, media_ref string, image binary"
    )
    hashes = pngs.mapInPandas(image_dhash_kernel(8, 8), schema=IMAGE_DHASH_SCHEMA)
    return hashes.groupBy("dhash").agg(
        F.count(F.lit(1)).alias("n_imgs"),
        F.min("doc_id").alias("min_doc_id"),
        F.countDistinct(F.col("doc_id") % 40).alias("n_offsets"),
    )


def q_pdf_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF page ingest under the driver gate (reference seam:
    data/PdfImageReader.java:23-93 renders PDF pages,
    data/LazyRawPdfImageDocument.java expands one PDF into one document
    per page).  Deterministic PDFs are synthesized from the documents
    table inside a kernel (one image-per-page PDF whose page count,
    dimensions and pixel pattern are pure functions of doc_id), pushed
    through the REAL ingest path — sources/pdf.py PDF 1.4 subset parse
    -> per-page expansion -> PNG encode — and the decoded pages are
    reduced to per-page metadata + pixel statistics.  The DuckDB oracle
    predicts those statistics INDEPENDENTLY from the construction
    formula (brute-force grid enumeration), so a hash match proves the
    entire binary round-trip (PDF write -> Flate parse -> PNG encode ->
    PNG decode) is lossless.

    100 TB shape: one PDF parses whole within its task (inherent), but
    pages re-expand as rows so downstream page-level repartitioning
    spreads decode cost (see ingest_pdfs docstring); all three stages
    are Arrow-batched mapInPandas, no per-row Python."""
    from ocular_spark.sources.pdf import ingest_pdfs

    d = (
        _load_wide(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 50 == 0)
        .select("doc_id")
    )

    def make_pdfs(batches):
        import numpy as np
        import pandas as pd

        from ocular_spark.sources.pdf import write_gray_pdf

        for b in batches:
            rows = []
            for raw in b["doc_id"]:
                doc_id = int(raw)
                pages = []
                for k in range(1 + doc_id % 3):
                    h = 40 + (doc_id % 3) * 8
                    w = 60 + (doc_id % 5) * 4
                    v = (doc_id * 7 + k * 13) % 200  # < 255: fill != ink
                    y, x = np.mgrid[0:h, 0:w]
                    img = np.full((h, w), v, dtype=np.uint8)
                    img[(x + y) % 9 == 0] = 255
                    pages.append(img)
                rows.append((doc_id, write_gray_pdf(pages)))
            yield pd.DataFrame(rows, columns=["doc_id", "pdf"])

    pdfs = d.mapInPandas(make_pdfs, schema="doc_id long, pdf binary")
    pages = ingest_pdfs(pdfs)

    def page_stats(batches):
        import pandas as pd

        from ocular_spark.functions.png import decode_gray_png

        for b in batches:
            rows = []
            for doc_id, media_ref, page_idx, png in zip(
                b["doc_id"], b["media_ref"], b["page_idx"], b["page_png"]
            ):
                img = decode_gray_png(bytes(png))
                rows.append(
                    (
                        doc_id,
                        media_ref,
                        int(page_idx),
                        int(img.shape[0]),
                        int(img.shape[1]),
                        int((img == 255).sum()),
                        int(img.sum(dtype="int64")),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "media_ref", "page_idx",
                    "height", "width", "n_ink", "pix_sum",
                ],
            )

    return pages.mapInPandas(
        page_stats,
        schema=(
            "doc_id string, media_ref string, page_idx int, "
            "height int, width int, n_ink long, pix_sum long"
        ),
    )


def q_warc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC web-archive ingest under the driver gate (north-rule input
    format: Common Crawl's container for the 10^12-document corpus).
    Deterministic .warc.gz files are synthesized from the documents
    table — 50 docs per file, each file a warcinfo record plus a
    request/response pair per doc, every record its own gzip member
    per the WARC spec — then pushed through the REAL ingest path
    (sources/warc.py: multi-member gzip split -> WARC header/payload
    parse -> HTTP status/header/body split) and reduced to per-record
    metadata + the extracted document text (one JVM regexp projection
    over the parsed rows).  The DuckDB oracle predicts every row
    INDEPENDENTLY from the construction formula, so a hash match
    proves the whole binary round-trip (gzip member framing, WARC
    Content-Length slicing, HTTP envelope split, body decode) is
    lossless.

    100 TB shape: files parse whole within their task (the Common
    Crawl unit; see sources/warc.py docstring), records re-expand as
    rows for downstream record-level repartitioning, the body bytes
    never shuffle (this query projects metadata + text before any
    exchange), and both stages are Arrow-batched mapInPandas /
    applyInPandas — no per-row Python at the Spark layer."""
    import pandas as pd

    from ocular_spark.sources.warc import ingest_warcs, write_warc

    d = _load_wide(spark, sf_dir, "documents").select(
        "doc_id", "text", F.floor(F.col("doc_id") / 50).alias("file_id")
    )

    def build_file(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        file_id = int(pdf["file_id"].iloc[0])
        records = [(
            "warcinfo", [],
            b"software: ocular-spark\r\nformat: WARC File Format 1.0\r\n",
        )]
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            doc_id = int(doc_id)
            uri = f"https://example.org/doc/{doc_id}"
            req = (
                f"GET /doc/{doc_id} HTTP/1.1\r\n"
                "Host: example.org\r\n\r\n"
            ).encode()
            records.append(("request", [("WARC-Target-URI", uri)], req))
            if doc_id % 25 == 7:
                body = f"not found: /doc/{doc_id}".encode()
                status, mime = "404 Not Found", "text/plain"
            else:
                body = (
                    "<html><body><p>" + str(text)[:120] + "</p></body></html>"
                ).encode()
                status, mime = "200 OK", "text/html"
            resp = (
                f"HTTP/1.1 {status}\r\nContent-Type: {mime}\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
            ).encode() + body
            records.append(("response", [("WARC-Target-URI", uri)], resp))
        return pd.DataFrame({"file_id": [file_id],
                             "warc": [write_warc(records)]})

    warcs = d.groupBy("file_id").applyInPandas(
        build_file, schema="file_id long, warc binary"
    )
    recs = ingest_warcs(warcs)
    return recs.select(
        "file_id", "rec_idx", "rec_type", "url", "http_status", "mime",
        "payload_len",
        F.when(
            F.col("mime") == "text/html",
            F.regexp_extract("body", "<p>(.*)</p>", 1),
        ).when(F.col("mime").isNotNull(), F.col("body"))
        .alias("body_text"),
    )


def _with_injected_dup_vecs(e: DataFrame) -> DataFrame:
    """Deterministically inject exact-duplicate embeddings (vec_id < 5
    cloned at vec_id + 1_000_000, identical vector -> cosine exactly
    1.0).  The synthetic embeddings have no >0.8-cosine pairs at any
    SF, which made the neighbor/near-dup driver rows vacuously green
    (VERDICT r2); the oracle SQL applies the identical injection."""
    clones = e.filter(F.col("vec_id") < 5).withColumn(
        "vec_id", F.col("vec_id") + 1_000_000
    )
    return e.unionByName(clones)


def q_embed_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine similarity search: for each probe vector
    (vec_id < 10), count neighbors above threshold.  JVM-side
    F.aggregate/zip_with arithmetic — no Python UDF.  Near-dup pairs
    are injected deterministically (see _with_injected_dup_vecs) so
    the driver row asserts non-empty neighbor counts."""
    e = _with_injected_dup_vecs(
        _load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    )
    probes = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    dot = F.aggregate(
        F.zip_with("probe_vec", "embedding", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda col: F.sqrt(
        F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    cos = dot / (norm(F.col("probe_vec")) * norm(F.col("embedding")))
    return (
        F.broadcast(probes)
        .crossJoin(e)
        .filter(F.col("probe_id") != F.col("vec_id"))
        .withColumn("cos", cos)
        .filter(F.col("cos") > 0.8)
        .groupBy("probe_id")
        .agg(F.count(F.lit(1)).alias("n_neighbors"))
    )


def q_label_centroid_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding stats: count + mean vector norm (rounded)."""
    e = _load(spark, sf_dir, "embeddings")
    norm = F.sqrt(
        F.aggregate("embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double") * x)
    )
    return (
        e.withColumn("vnorm", norm)
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg("vnorm"), 4).alias("avg_norm"),
        )
    )


def q_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization of the embedding column
    (the 4x storage/bandwidth compression step ANN serving stacks
    apply before indexing — FAISS SQ8 shape): scale = 127/max|e_i|,
    q_i = floor(e_i*scale + 0.5), plus the quality metrics that
    decide whether the compressed index is usable — saturated-lane
    count, max absolute dequantization error, and cosine between the
    original and dequantized vector.

    100 TB shape: ONE map-side projection, no shuffle, no Python —
    every step (abs-max, quantize, dequantize, error fold, cosine
    fold) is a JVM array expression.  Determinism across engines:
    all arithmetic in float64 with identical expression shape; the
    rounding rule is floor(x+0.5) (not ROUND) because Spark and
    DuckDB agree on floor for every double, while half-even/half-up
    conventions differ.  Spark's floor returns BIGINT and DuckDB's
    DOUBLE — immaterial, q is only compared to 127 and divided back.
    Folded dots pair Spark's left-to-right F.aggregate with DuckDB's
    LIST_DOT_PRODUCT at 5-6 dp rounding (the embed_topk-proven
    pairing)."""
    e = _load(spark, sf_dir, "embeddings")
    ed = e.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("ed"),
    )
    m = ed.select(
        "vec_id", "ed", F.array_max(F.transform("ed", F.abs)).alias("mx")
    ).filter(F.col("mx") > 0)
    q = m.select(
        "vec_id", "ed",
        (F.lit(127.0) / F.col("mx")).alias("scale"),
    ).select(
        "vec_id", "ed", "scale",
        F.transform(
            "ed", lambda x: F.floor(x * F.col("scale") + F.lit(0.5))
        ).alias("qv"),
    ).select(
        "*",
        F.transform("qv", lambda v: v / F.col("scale")).alias("dq"),
    )
    err = F.array_max(
        F.zip_with("ed", "dq", lambda a, b: F.abs(a - b))
    )
    cos = _dot64(F.col("ed"), F.col("dq")) / (
        F.sqrt(_dot64(F.col("ed"), F.col("ed")))
        * F.sqrt(_dot64(F.col("dq"), F.col("dq")))
    )
    return q.select(
        "vec_id",
        F.size(F.filter("qv", lambda v: F.abs(v) == 127)).cast("long").alias("n_sat"),
        F.round(err, 6).alias("max_abs_err"),
        F.round(cos, 6).alias("cos_dequant"),
    )


SEMDEDUP_TAU = 0.95


def q_embed_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023): drop every
    embedding that has a >= SEMDEDUP_TAU-cosine neighbor with a
    smaller vec_id, keep the min-id representative.  Unlike the
    pair-listing ops (embed_neardup) this emits the actual KEEP/DROP
    decision per vector — the row a training pipeline filters on —
    with dup_of pointing at the surviving representative.

    Candidate generation is the hyperplane-LSH bucket scheme of
    q_embed_lsh_buckets (16 sign bits x 2 tables over disjoint dim
    blocks), so pair work is within-bucket only — linear at 100 TB,
    no all-pairs.  The greedy min-id survivor policy (SemDeDup's
    per-cluster policy) is order-free: a vec's fate depends only on
    the SET of its similar smaller ids, so the result is
    deterministic under any partitioning.  Cosines are rounded to
    6 dp before the threshold compare in both engines (the
    embed_topk-proven float64 pairing).  The dup_of aggregation is
    bounded by the candidate pair count; the final corpus join
    broadcasts the (small) dup set."""
    e = _with_injected_dup_vecs(
        _load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    )

    def sig(d0: int) -> "F.Column":
        return F.concat(
            *[
                F.when(F.element_at("embedding", d0 + k + 1) >= 0, F.lit("1"))
                .otherwise(F.lit("0"))
                for k in range(16)
            ]
        )

    eb = e.select(
        "vec_id",
        "embedding",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("table_id"), sig(0).alias("bucket")),
                F.struct(F.lit(1).alias("table_id"), sig(16).alias("bucket")),
            )
        ).alias("tb"),
    ).select(
        "vec_id", "embedding",
        F.col("tb.table_id").alias("table_id"),
        F.col("tb.bucket").alias("bucket"),
    )
    a = eb.select(
        "table_id", "bucket",
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"),
    )
    b = eb.select(
        "table_id", "bucket",
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"),
    )
    cos = F.round(
        _dot64(F.col("va"), F.col("vb"))
        / (
            F.sqrt(_dot64(F.col("va"), F.col("va")))
            * F.sqrt(_dot64(F.col("vb"), F.col("vb")))
        ),
        6,
    )
    pairs = (
        a.join(b, ["table_id", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(cos >= SEMDEDUP_TAU)
        .select("id_a", "id_b")
        .distinct()
    )
    dup_of = (
        pairs.groupBy("id_b")
        .agg(F.min("id_a").alias("dup_of"))
        .select(F.col("id_b").alias("vec_id"), "dup_of")
    )
    return (
        e.select("vec_id")
        .join(F.broadcast(dup_of), "vec_id", "left")
        .select(
            "vec_id",
            "dup_of",
            F.when(F.col("dup_of").isNull(), 1).otherwise(0)
            .cast("int").alias("kept"),
        )
    )


def _dot64(a, b):
    """Deterministic float64 dot product of two float32 array columns:
    promote then left-to-right fold (bit-identical in Spark and DuckDB)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def q_embed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k similarity search (ANN baseline):
    3 nearest neighbors for each probe vector (embeddings are
    unit-norm, so dot == cosine)."""
    from pyspark.sql.window import Window

    e = _load(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    scored = (
        F.broadcast(probes)
        .crossJoin(e)
        .filter(F.col("probe_id") != F.col("vec_id"))
        .withColumn("cos", F.round(_dot64(F.col("probe_vec"), F.col("embedding")), 5))
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("probe_id", "vec_id", "cos", "rank")
    )


def q_embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate detection: unordered pairs with
    cosine above threshold, summarized per left vector.

    Implementation: the comparison side is broadcast as a dense NumPy
    matrix and each partition computes a float64 GEMM block
    (sims = batch @ M.T) inside an Arrow kernel — the brute-force ANN
    pattern. Catalyst's per-element higher-order functions are ~30x
    slower here.  Output columns are integers, so the GEMM's different
    summation order vs the SQL oracle cannot flip results except
    exactly at the 0.9 threshold (measure-zero for real embeddings)."""
    import numpy as np
    import pyarrow.parquet as pq

    tbl = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids = np.asarray(tbl["vec_id"])
    mat = np.stack(tbl["embedding"].to_pandas().values).astype(np.float64)
    # identical duplicate injection as _with_injected_dup_vecs (the
    # comparison matrix and the streamed side must agree)
    clone_mask = ids < 5
    ids = np.concatenate([ids, ids[clone_mask] + 1_000_000])
    mat = np.vstack([mat, mat[clone_mask]])
    bc = spark.sparkContext.broadcast((ids, mat))

    def kernel(batches):
        import pandas as pd

        ids_all, m_all = bc.value
        for pdf in batches:
            batch_ids = pdf["vec_id"].to_numpy()
            batch = np.stack(pdf["embedding"].values).astype(np.float64)
            sims = batch @ m_all.T  # (b, N) float64 GEMM
            out = []
            for r in range(len(batch_ids)):
                id_a = int(batch_ids[r])
                mask = (sims[r] > 0.9) & (ids_all > id_a)
                if mask.any():
                    out.append(
                        (id_a, int(mask.sum()), int(ids_all[mask].min()))
                    )
            yield pd.DataFrame(out, columns=["id_a", "n_near_dups", "first_match"])

    e = _with_injected_dup_vecs(
        _load_wide(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    )
    return e.mapInPandas(
        kernel, schema="id_a long, n_near_dups long, first_match long"
    )


def q_embed_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH bucketed ANN — the 100 TB scale path: candidate
    pairs are generated only WITHIN buckets.  16 sign bits per table
    (2^16 buckets -> O(1)-sized buckets at scale, so the within-bucket
    self-join is linear, not quadratic) and TWO hash tables over
    disjoint dim blocks (multi-table probing recovers the recall a
    single 16-bit table loses).  Output: per-table bucket/pair summary
    (n_buckets, max bucket size, pair counts, high-cosine candidates)."""
    e = _load(spark, sf_dir, "embeddings")

    def sig(d0: int) -> "F.Column":
        return F.concat(
            *[
                F.when(F.element_at("embedding", d0 + k + 1) >= 0, F.lit("1"))
                .otherwise(F.lit("0"))
                for k in range(16)
            ]
        )

    eb = e.select(
        "vec_id",
        "embedding",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("table_id"), sig(0).alias("bucket")),
                F.struct(F.lit(1).alias("table_id"), sig(16).alias("bucket")),
            )
        ).alias("tb"),
    ).select("vec_id", "embedding", F.col("tb.table_id").alias("table_id"), F.col("tb.bucket").alias("bucket"))

    sizes = eb.groupBy("table_id", "bucket").agg(F.count(F.lit(1)).alias("sz"))
    bucket_stats = sizes.groupBy("table_id").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("sz").alias("max_bucket_size"),
    )
    a = eb.select("table_id", "bucket", F.col("vec_id").alias("id_a"), F.col("embedding").alias("vec_a"))
    b = eb.select("table_id", "bucket", F.col("vec_id").alias("id_b"), F.col("embedding").alias("vec_b"))
    pair_stats = (
        a.join(b, ["table_id", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", _dot64(F.col("vec_a"), F.col("vec_b")))
        .groupBy("table_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.count(F.when(F.col("cos") > 0.9, 1)).alias("n_candidates"),
        )
    )
    return (
        bucket_stats.join(pair_stats, "table_id", "left")
        .select(
            "table_id",
            "n_buckets",
            "max_bucket_size",
            F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
            F.coalesce("n_candidates", F.lit(0)).alias("n_candidates"),
        )
    )


# trained codebooks are deterministic per (dataset fingerprint, k);
# keyed on the embeddings parquet's (path, mtime_ns, size) entries so
# regenerated fixture data invalidates the memo instead of silently
# serving a codebook trained on the old bytes (r3 ADVICE), with
# clear_ivf_cache() for harnesses that rewrite data in-process
_IVF_CB_CACHE: dict = {}

# scratch tree of the last q_transcribe_stream call (recycled per call)
_STREAM_TMP_ROOT = None

# last persisted per-doc hash-set DataFrame from q_ngram_jaccard: kept
# alive until the NEXT invocation (the returned DataFrame is lazy — the
# caller materializes it after we return), then unpersisted so repeated
# bench/driver loops hold at most one cached copy
_NGRAM_BASE_PREV = None

# same one-live-copy scope for q_similarity_join's hash-set cache
_SIMJOIN_BASE_PREV = None

# one tmp tree per session for the streaming upsert gate (previous
# invocation's tree removed at the next call, transcribe_stream rule)
_UPSERT_STREAM_TMP_ROOT = None
_HLL_STREAM_TMP_ROOT = None

# kernel-path codebook broadcasts still owned by a live serving plan;
# unpersisted (executor copies dropped, handle stays re-usable) at the
# next q_embed_ivf_topk call — same one-live-copy scope as above
_IVF_SERVING_BC: list = []

# above this K the literal-projection assignment grows the plan by
# O(K*d) expression nodes — a driver/codegen wall at the K ~ sqrt(N) a
# 100 TB corpus needs (K=10^4, d=64 -> multi-hundred-MB expression
# tree); past it, assignment switches to a broadcast pandas-GEMM
# argmax kernel: same no-join/no-sort/no-shuffle projection property,
# O(K*d) *broadcast bytes* instead of O(K*d) plan nodes
IVF_KERNEL_THRESHOLD = 64


def clear_ivf_cache() -> None:
    """Drop memoized IVF codebooks (driver/bench harness hook)."""
    _IVF_CB_CACHE.clear()


def _embeddings_fingerprint(sf_dir: str):
    """(path, mtime_ns, size) of every file under embeddings.parquet —
    the codebook-memo key component that changes whenever the fixture
    data is regenerated."""
    root = os.path.join(sf_dir, "embeddings.parquet")
    ents = []
    if os.path.isdir(root):
        for base, _dirs, files in os.walk(root):
            for f in sorted(files):
                p = os.path.join(base, f)
                st = os.stat(p)
                ents.append((p, st.st_mtime_ns, st.st_size))
    elif os.path.exists(root):
        st = os.stat(root)
        ents.append((root, st.st_mtime_ns, st.st_size))
    return tuple(ents)


def _ivf_assign_expr(cb) -> "F.Column":
    """Map-side nearest-centroid argmax over the ``embedding`` column:
    the codebook is inlined as literal arrays (K*d doubles — O(1) plan
    size at any data scale, the Spark analog of FAISS's local coarse
    quantization), so assignment is a pure PROJECTION — no join, no
    aggregation, no sort, no shuffle.  First-occurrence-of-max with the
    codebook sorted by cent_id breaks cdot ties toward the smallest
    cent_id, matching the oracle's ORDER BY cdot DESC, cent_id ASC."""
    cb = sorted(cb, key=lambda r: r["cent_id"])
    dots = F.array(
        *[
            _dot64(
                F.col("embedding"),
                F.array(*[F.lit(float(x)) for x in r["cent_vec"]]),
            )
            for r in cb
        ]
    )
    cids = F.array(*[F.lit(int(r["cent_id"])) for r in cb])
    return F.element_at(cids, F.array_position(dots, F.array_max(dots)).cast("int"))


def _ivf_assign_col(spark: SparkSession, cb, bc_out: list = None) -> "F.Column":
    """Nearest-centroid ``cluster`` column, switching implementation on
    codebook size (both are pure projections — no join, no sort, no
    shuffle; plan-pinned by tests/test_ivf.py):

    * K <= IVF_KERNEL_THRESHOLD: literal-expression argmax
      (_ivf_assign_expr) — zero Python in the hot path, bit-matched by
      the DuckDB oracle;
    * K > threshold: Arrow-batched pandas GEMM argmax over a BROADCAST
      (K, d) float64 centroid matrix — O(K*d) broadcast bytes instead
      of O(K*d) Catalyst nodes, the only form that survives the
      K ~ sqrt(N) codebooks a 100 TB corpus needs.  np.argmax takes the
      first maximum, matching the projection path's smallest-cent_id
      tie rule; last-ulp dot-product ties may still differ from the
      sequential-fold projection (GEMMs sum pairwise), which is why the
      oracle-gated driver query stays on the literal path at K=16."""
    if len(cb) <= IVF_KERNEL_THRESHOLD:
        return _ivf_assign_expr(cb)
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    cb_sorted = sorted(cb, key=lambda r: r["cent_id"])
    mat = np.asarray([r["cent_vec"] for r in cb_sorted], dtype=np.float64)
    cids = np.asarray([int(r["cent_id"]) for r in cb_sorted], dtype=np.int32)
    cb_bc = spark.sparkContext.broadcast((mat, cids))
    if bc_out is not None:  # caller owns the broadcast's lifetime
        bc_out.append(cb_bc)

    @pandas_udf("int")
    def _assign(emb: pd.Series) -> pd.Series:
        m, ids = cb_bc.value
        e = np.stack(emb.to_numpy()).astype(np.float64, copy=False)
        return pd.Series(ids[np.argmax(e @ m.T, axis=1)])

    return _assign("embedding")


def _ivf_train_codebook(
    spark: SparkSession, e: DataFrame, k: int = 16, n_iters: int = 3
):
    """Distributed spherical k-means codebook for the IVF query: seed
    with the first ``k`` vectors, then ``n_iters`` Lloyd iterations,
    each fully distributed —
      assign: map-side nearest-centroid projection (_ivf_assign_col:
              literal argmax at small K, broadcast pandas-GEMM above
              IVF_KERNEL_THRESHOLD — no shuffle, no sort either way);
      M-step: posexplode to (cluster, dim) and ONE shuffle on the
              (cluster, dim) key, K*d groups total.  The per-dimension
              mean is ORDER-INDEPENDENT by construction: components
              are floor-scaled to integers (floor(val * 1e9) — an
              exact double op on float32 inputs) and summed as int64
              (exact, commutative), so any partitioning/merge order
              yields the same bits, and DuckDB's AVG-free mirror
              matches without leaning on rounding to mask ~1e-16
              sum-order jitter (r3 ADVICE: F.avg + ROUND(x, 6) broke
              whenever a component landed within jitter of a 0.5e-6
              boundary);
      re-center: L2-normalize (cosine -> spherical k-means), round to
              6 dp (compactness — determinism no longer depends on
              it), and collect the K rows (O(K*d) to the driver per
              iteration — constant at any data scale).
    Empty clusters drop out (both engines drop them identically).
    int64 headroom: |floor(val*1e9)| <= 2^30 for unit-norm components,
    so the per-group sum overflows only past ~2^33 vectors per
    (cluster, dim); at that scale switch the agg to decimal(38,0)."""
    cb = (
        e.filter(F.col("vec_id") < k)
        .select(
            F.col("vec_id").cast("int").alias("cent_id"),
            F.transform("embedding", lambda x: x.cast("double")).alias("cent_vec"),
        )
        .collect()
    )
    for _ in range(n_iters):
        iter_bc: list = []
        assigned = e.select(
            _ivf_assign_col(spark, cb, bc_out=iter_bc).alias("cluster"),
            "embedding",
        )
        norm = F.sqrt(
            F.aggregate("raw_vec", F.lit(0.0), lambda acc, x: acc + x * x)
        )
        means = (
            assigned.select(
                "cluster", F.posexplode("embedding").alias("pos", "val")
            )
            .groupBy("cluster", "pos")
            .agg(
                F.sum(
                    F.floor(F.col("val").cast("double") * 1000000000.0).cast("long")
                ).alias("s9"),
                F.count(F.lit(1)).alias("cnt"),
            )
            .withColumn("m", F.col("s9") / (F.col("cnt") * 1000000000.0))
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select(
                F.col("cluster").alias("cent_id"),
                F.transform("pm", lambda s: s["m"]).alias("raw_vec"),
            )
            .select(
                "cent_id",
                F.transform("raw_vec", lambda x: F.round(x / norm, 6)).alias(
                    "cent_vec"
                ),
            )
        )
        cb = means.collect()
        for bc in iter_bc:  # this iteration's plan is fully materialized
            bc.destroy()
    return cb


def q_ivf_upsert(spark: SparkSession, sf_dir: str, k: int = 16) -> DataFrame:
    """Incremental ANN index maintenance: a NEW embedding batch is
    upserted into the EXISTING IVF index by map-side assignment to the
    FROZEN codebook — no retraining, no shuffle, no join (the serving
    reality of a 100 TB vector index: the codebook retrains on a slow
    cadence; arriving vectors are assigned online).  The new batch is
    a deterministic derivation of the corpus (vec_id + 100000,
    embedding reversed — reversal preserves the unit norm and both
    engines replay it exactly), so the assignment is fully checkable:
    the oracle re-derives the same frozen codebook (the shared
    _IVF_CENT_CTES Lloyd unroll) and assigns the same derived batch.
    Reuses q_embed_ivf_topk's memoized codebook — training cost is
    paid once per (corpus fingerprint, k), exactly like production."""
    e = _load(spark, sf_dir, "embeddings")
    cache_key = (_embeddings_fingerprint(sf_dir), k)
    cb = _IVF_CB_CACHE.get(cache_key)
    if cb is None:
        cb = _ivf_train_codebook(spark, e, k=k)
        _IVF_CB_CACHE[cache_key] = cb
    new_batch = e.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.reverse("embedding").alias("embedding"),
    )
    return new_batch.select(
        "vec_id",
        _ivf_assign_col(spark, cb).alias("cluster"),
    )


def q_embed_ivf_topk(
    spark: SparkSession,
    sf_dir: str,
    k: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """IVF ANN (the coarse-quantizer scale path, complementing
    hyperplane LSH): a ``k``-centroid codebook TRAINED by 3
    distributed spherical-k-means Lloyd iterations (see
    _ivf_train_codebook; seeded from the first k vectors,
    order-independent integer-sum means), every vector assigned to its
    nearest centroid by a map-side projection — literal-codebook
    argmax at K <= IVF_KERNEL_THRESHOLD, broadcast pandas-GEMM argmax
    above it (no shuffle, no sort, no join either way; the round-2
    row_number window shuffled and sorted the N x K scored table) —
    probes search only their top-``nprobe`` clusters, then exact
    cosine top-3 within the candidate set.  At 100 TB: codebook
    broadcast is O(K*d) bytes, cluster assignment is a map-only pass,
    and per-probe work is bounded by the probed clusters' sizes
    instead of N; K grows ~sqrt(N), which is exactly why the kernel
    path exists (a literal plan with K=10^4 centroids is a
    driver/codegen wall).

    Measured recall@3 vs brute-force cosine (q_embed_topk, probes
    vec_id < 10, tools/ivf_recall.py) on near-uniform random unit
    vectors — the WORST case for a coarse quantizer; real embedding
    corpora cluster far better:

      k=16, sf0.01 (500 vecs):  nprobe=1: 0.867  2: 0.900  4: 0.967  8: 0.967
      k=16, sf0.1  (2000 vecs): nprobe=1: 0.933  2: 0.933  4: 0.967  8: 1.000
      k=256 kernel path, sf0.001: nprobe=32: 0.933  64: 0.967
        (tests/test_ivf.py pins nprobe=64 recall >= 0.95)
    """
    from pyspark.sql.window import Window

    e = _load(spark, sf_dir, "embeddings")
    cache_key = (_embeddings_fingerprint(sf_dir), k)
    cb = _IVF_CB_CACHE.get(cache_key)
    if cb is None:
        cb = _ivf_train_codebook(spark, e, k=k)
        _IVF_CB_CACHE[cache_key] = cb
    while _IVF_SERVING_BC:  # drop executor copies of prior calls' codebooks
        _IVF_SERVING_BC.pop().unpersist(blocking=False)
    assigned = e.select(
        "vec_id",
        "embedding",
        _ivf_assign_col(spark, cb, bc_out=_IVF_SERVING_BC).alias("cluster"),
    )
    cent = F.broadcast(
        spark.createDataFrame(cb, schema="cent_id int, cent_vec array<double>")
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.desc("cdot"), F.asc("cent_id"))
    probes = (
        e.filter(F.col("vec_id") < 10)  # tiny: the window sorts 10*K rows
        .crossJoin(cent)
        .withColumn("cdot", _dot64(F.col("embedding"), F.col("cent_vec")))
        .withColumn("crank", F.row_number().over(w_assign))
        .filter(F.col("crank") <= nprobe)
        .select(
            F.col("vec_id").alias("probe_id"),
            F.col("embedding").alias("probe_vec"),
            F.col("cent_id").alias("cluster"),
        )
    )
    # probes is <= 10*nprobe rows; `assigned` is N rows at scale — the
    # candidate join MUST broadcast probes (a silent AQE fallback to a
    # shuffle-hash join would shuffle the whole corpus on `cluster`)
    cands = (
        F.broadcast(probes).join(assigned, "cluster")
        .filter(F.col("probe_id") != F.col("vec_id"))
        .withColumn("cos", F.round(_dot64(F.col("probe_vec"), F.col("embedding")), 5))
    )
    w_rank = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        cands.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= 3)
        .select("probe_id", "vec_id", "cos", "rank")
    )


def q_html_main_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Main-content extraction (north_rule: HTML boilerplate strip +
    DOM heuristics) — EXPRESSION path: each document's text is wrapped
    in a deterministic boilerplate page (nav + ad links + <p> content
    tiling + share/like clusters + footer; ocular_spark/functions/
    html.py), then the jusText/boilerpipe-style block heuristic
    (text_len >= 20, link_density < 0.5 by integer cross-multiply)
    strips the boilerplate back out — all as JVM regex/array
    expressions: a pure projection over the scan, no shuffle, no
    Python, whole-stage-codegen'd.  At 100 TB this is the map-side
    hot path; the DuckDB oracle mirrors it string-for-string."""
    from ocular_spark.functions import html as H

    d = _load_wide(spark, sf_dir, "documents")
    wrapped = d.select(
        "doc_id", F.expr(H.wrap_boilerplate_spark()).alias("html")
    )
    cols = H.main_content_cols_spark("html")
    return wrapped.select(
        "doc_id",
        F.expr(cols["n_blocks"]).cast("long").alias("n_blocks"),
        F.expr(cols["n_kept"]).cast("long").alias("n_kept"),
        F.expr(cols["main_text"]).alias("main_text"),
    )


def q_html_main_content_dom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Main-content extraction — DOM path: the SAME pages parsed by a
    real stdlib html.parser tag walk inside an Arrow-batched
    mapInPandas kernel (functions/html.py extract_main_content_dom),
    applying the same block heuristic.  Checked against the SAME
    DuckDB oracle as the expression path: two genuinely independent
    implementations (regex pipeline vs DOM walk) against one oracle,
    plus tests/test_html.py pinning them equal block-for-block."""
    from ocular_spark.functions import html as H

    d = _load_wide(spark, sf_dir, "documents")
    wrapped = d.select(
        "doc_id", F.expr(H.wrap_boilerplate_spark()).alias("html")
    )
    return wrapped.mapInPandas(
        H.main_content_kernel(), schema=H.MAIN_CONTENT_SCHEMA
    )


def q_html_main_content_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Main-content extraction over the ADVERSARIAL nested/entity
    pages (round-4 weak flag): mixed-case block tags with attributes,
    three-deep div nesting with content text at every depth, a <link>
    head element (tag-prefix trap for '<li'), a multiline script, an
    entity-bearing heading and anchors, and a comment containing '>'.
    The atomic-text-block segmentation (split at every block-tag
    boundary — boilerpipe's own block model) is EXACT under this
    nesting, as a pure JVM regex/array projection; the DuckDB oracle
    mirrors it string-for-string."""
    from ocular_spark.functions import html as H

    d = _load_wide(spark, sf_dir, "documents")
    wrapped = d.select(
        "doc_id", F.expr(H.wrap_nested_spark()).alias("html")
    )
    cols = H.main_content_cols_spark("html")
    return wrapped.select(
        "doc_id",
        F.expr(cols["n_blocks"]).cast("long").alias("n_blocks"),
        F.expr(cols["n_kept"]).cast("long").alias("n_kept"),
        F.expr(cols["main_text"]).alias("main_text"),
    )


def q_html_main_content_nested_dom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME adversarial nested/entity pages through the DOM walk
    kernel, against the SAME DuckDB oracle — the two-implementation
    gate now proves agreement on nested + entity-bearing pages, not
    just the flat fixture."""
    from ocular_spark.functions import html as H

    d = _load_wide(spark, sf_dir, "documents")
    wrapped = d.select(
        "doc_id", F.expr(H.wrap_nested_spark()).alias("html")
    )
    return wrapped.mapInPandas(
        H.main_content_kernel(), schema=H.MAIN_CONTENT_SCHEMA
    )


def q_layout_reading_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-layout analysis: recursive XY-cut reading order (Nagy &
    Seth 1984) — the "PDF/layout parse" leg of the north-rule
    extraction pipeline, next to the HTML boilerplate strip.  Each
    selected document synthesizes a deterministic page of text-block
    bounding boxes (4 layout classes: single column, header+2-column,
    header+2-column+footer, and a mixed page whose tight 2x2 grid
    exercises the no-gap leaf scan order; block ids Fisher-Yates
    permuted so rank != id) and the NumPy kernel emits blocks in
    reading order via mapInPandas — ZERO shuffles, per-page O(n^2
    log n) in the page's own block count, corpus-size independent.

    Oracle: frozen golden (tools/freeze_goldens.py) computed by an
    INDEPENDENT recursive implementation of the same integer spec
    (plain-Python lists vs the kernel's iterative NumPy stack) — a
    genuine two-implementation gate; all-integer, so bit-reproducible
    across engines/partitionings/retries.  Properties (column-before-
    column, full-width separators, leaf scan order, permutation and
    partitioning invariance) pinned by tests/test_layout.py."""
    from ocular_spark.functions import layout as LY

    d = _load_wide(spark, sf_dir, "documents")
    pages = d.filter(F.col("doc_id") % 5 == 0).select("doc_id")
    return pages.mapInPandas(
        LY.reading_order_kernel(), schema=LY.READING_ORDER_SCHEMA
    )


def q_strip_spans_html(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level main-content extraction over the INTERLEAVED table
    shape (north_rule input_hint: (doc_id, spans array<struct<kind,
    text, media_ref, offset>>)): each doc becomes [text(html page),
    media(ref), text(appendix page)], the extractor rewrites ONLY the
    text spans (media spans pass through untouched), and the output
    preserves exact (kind, text, media_ref, offset) span order — the
    north_rule's per-row invariant, here for the boilerplate-strip
    operator.  The whole transform is one projection (transform() over
    the spans array); the explode below exists only to give the driver
    a flat hashable shape."""
    from ocular_spark.functions import html as H

    d = _load_wide(spark, sf_dir, "documents")
    spans = F.expr(
        "array("
        "named_struct('kind', 'text', 'text', "
        + H.wrap_boilerplate_spark()
        + ", 'media_ref', cast(null as string), 'offset', 0), "
        "named_struct('kind', 'media', 'text', cast(null as string),"
        " 'media_ref', concat('m-', doc_id), 'offset', 1), "
        f"named_struct('kind', 'text', 'text', '{H.APPENDIX_HTML}',"
        " 'media_ref', cast(null as string), 'offset', 2))"
    )
    stripped = F.expr(
        "transform(spans, sp -> named_struct("
        "'kind', sp.kind, "
        "'text', case when sp.kind = 'text' then "
        + H.main_text_expr_spark("sp.text")
        + " else sp.text end, "
        "'media_ref', sp.media_ref, 'offset', sp.offset))"
    )
    return (
        d.select("doc_id", spans.alias("spans"))
        .select("doc_id", stripped.alias("spans"))
        .select("doc_id", F.posexplode("spans").alias("pos", "span"))
        .select(
            "doc_id",
            F.col("span.kind").alias("kind"),
            F.col("span.text").alias("text"),
            F.col("span.media_ref").alias("media_ref"),
            F.col("span.offset").alias("offset"),
        )
    )


_EXTRACT_STREAM_TMP_ROOT = None


def q_extract_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming main-content extraction under the driver gate: the
    interleaved fixture (flat-boilerplate page, media span, adversarial
    nested page; docs with doc_id % 10 == 0) is written to an
    append-only parquet dir, extracted by streaming/jobs.py::
    extract_spans_stream (availableNow, fresh checkpoint per call —
    the checkpoint IS the exactly-once resume state; restart semantics
    pinned by tests/test_streaming.py), and the sink is returned
    flattened.  The streaming path runs the SAME span-rewrite
    projection as the batch job, so the DuckDB oracle recomputes the
    expected output independently (no golden needed)."""
    import shutil
    import tempfile

    from ocular_spark.functions import html as H
    from ocular_spark.streaming.jobs import extract_spans_stream

    global _EXTRACT_STREAM_TMP_ROOT
    d = _load_wide(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    spans = F.expr(
        "array("
        "named_struct('kind', 'text', 'text', "
        + H.wrap_boilerplate_spark()
        + ", 'media_ref', cast(null as string), 'offset', 0), "
        "named_struct('kind', 'media', 'text', cast(null as string),"
        " 'media_ref', concat('m-', doc_id), 'offset', 1), "
        "named_struct('kind', 'text', 'text', "
        + H.wrap_nested_spark()
        + ", 'media_ref', cast(null as string), 'offset', 2))"
    )
    inp = d.select(F.col("doc_id").cast("string").alias("doc_id"),
                   spans.alias("spans"))

    if _EXTRACT_STREAM_TMP_ROOT is not None:
        shutil.rmtree(_EXTRACT_STREAM_TMP_ROOT, ignore_errors=True)
    root = tempfile.mkdtemp(prefix="ocular_extract_stream_")
    _EXTRACT_STREAM_TMP_ROOT = root
    docs_dir = os.path.join(root, "docs")
    out_dir = os.path.join(root, "out")
    ckpt = os.path.join(root, "ckpt")
    inp.write.parquet(docs_dir)
    q = extract_spans_stream(spark, docs_dir, out_dir, ckpt)
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("streaming extraction did not finish in 600s")
    return (
        spark.read.parquet(out_dir)
        .select("doc_id", F.posexplode("spans").alias("pos", "span"))
        .select(
            "doc_id",
            F.col("span.kind").alias("kind"),
            F.col("span.text").alias("text"),
            F.col("span.media_ref").alias("media_ref"),
            F.col("span.offset").alias("offset"),
        )
    )


_HOURLY_STREAM_TMP_ROOT = None


def q_event_hourly_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming hourly rollup under the driver gate: the events table
    replayed through hourly_agg_stream (availableNow, 1-hour
    watermark).  Emission is watermark-gated, so the sink holds
    EXACTLY the windows with window_end <= max(ts) - 1 hour — the
    batch oracle recomputes that set independently (same aggregation
    + the emission predicate).  This pins the append-mode semantics
    the batch/streaming pair must agree on: every emitted window is
    final (exactly-once per window), and the held-back tail is the
    price of correctness under late data."""
    import shutil
    import tempfile

    from ocular_spark.streaming.jobs import hourly_agg_stream

    global _HOURLY_STREAM_TMP_ROOT
    ev = _load(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )

    if _HOURLY_STREAM_TMP_ROOT is not None:
        shutil.rmtree(_HOURLY_STREAM_TMP_ROOT, ignore_errors=True)
    root = tempfile.mkdtemp(prefix="ocular_hourly_stream_")
    _HOURLY_STREAM_TMP_ROOT = root
    in_dir = os.path.join(root, "events")
    out_dir = os.path.join(root, "out")
    ckpt = os.path.join(root, "ckpt")
    ev.write.parquet(in_dir)
    q = hourly_agg_stream(spark, in_dir, out_dir, ckpt)
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("streaming hourly agg did not finish in 600s")
    return spark.read.parquet(out_dir).select(
        "hour", "event_type", "n_events", "sum_value"
    )


_SESS_STREAM_TMP_ROOT = None


def q_event_sessions_custom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSTOM stateful streaming sessionization under the driver gate
    (streaming/jobs.py::sessionize_stream_custom): a hand-managed
    applyInPandasWithState state machine — the API surface for
    stateful operators Spark's built-ins can't express — replaying the
    events table with availableNow.  Deterministic emission contract
    hashed by the row: sessions closed by a following event always
    emit; each user's final session emits iff session_end + gap <=
    max(ts) - watermark (event-time timeout).  The DuckDB oracle
    recomputes sessions independently (gaps-and-islands) and applies
    the same predicate.  Gap arithmetic is integer microseconds
    (>= 1801.000000 s splits), exactly the batch event_sessions
    rule."""
    import shutil
    import tempfile

    from ocular_spark.streaming.jobs import sessionize_stream_custom

    global _SESS_STREAM_TMP_ROOT
    # a third of the users is plenty to exercise the state machine
    # (thousands of sessions at sf0.01); the oracle mirrors the filter
    ev = (
        _load(spark, sf_dir, "events")
        .filter(F.col("user_id") % 3 == 0)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )

    if _SESS_STREAM_TMP_ROOT is not None:
        shutil.rmtree(_SESS_STREAM_TMP_ROOT, ignore_errors=True)
    root = tempfile.mkdtemp(prefix="ocular_sess_stream_")
    _SESS_STREAM_TMP_ROOT = root
    in_dir = os.path.join(root, "events")
    out_dir = os.path.join(root, "out")
    ckpt = os.path.join(root, "ckpt")
    ev.coalesce(1).write.parquet(in_dir)
    q = sessionize_stream_custom(spark, in_dir, out_dir, ckpt)
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("custom streaming sessionization timed out")
    return spark.read.parquet(out_dir).select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .alias("session_end"),
        "n_events",
        F.round("sum_value", 4).alias("sum_value"),
    )


_QUOTA_STREAM_TMP_ROOT = None


def q_crawl_quota_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-source crawl quota (10th streaming surface,
    streaming/jobs.py::crawl_quota_stream): each source's running
    arrival rank is hand-managed per-key state; docs beyond
    DOMAIN_CAP_N are suppressed (kept=0) from that point on, across
    micro-batches and restarts.  The availableNow replay of the docs
    table arrives in one batch, where the kernel ranks by doc_id —
    so the emission equals the batch window ROW_NUMBER() OVER
    (PARTITION BY source ORDER BY doc_id), which IS the DuckDB
    oracle.  (The batch domain_cap row caps by corpus HASH order —
    the reproducible-sample semantics; this row caps by ARRIVAL
    order — the crawl-frontier semantics.)  The cross-restart law
    (ranks continue from checkpointed state) is pinned by
    tests/test_quota_stream.py."""
    import shutil
    import tempfile

    from ocular_spark.streaming.jobs import crawl_quota_stream

    global _QUOTA_STREAM_TMP_ROOT
    d = _load_wide(spark, sf_dir, "documents").select("doc_id", "source")

    if _QUOTA_STREAM_TMP_ROOT is not None:
        shutil.rmtree(_QUOTA_STREAM_TMP_ROOT, ignore_errors=True)
    root = tempfile.mkdtemp(prefix="ocular_quota_stream_")
    _QUOTA_STREAM_TMP_ROOT = root
    in_dir = os.path.join(root, "docs")
    out_dir = os.path.join(root, "out")
    ckpt = os.path.join(root, "ckpt")
    d.coalesce(1).write.parquet(in_dir)
    q = crawl_quota_stream(spark, in_dir, out_dir, ckpt, cap=DOMAIN_CAP_N)
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("streaming quota did not finish in 600s")
    return spark.read.parquet(out_dir)


_DEDUP_STREAM_TMP_ROOT = None


def q_dedup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup under the driver gate: the original docs
    land as input file 1, their injected exact clones (same
    deterministic injection as q_dedup_exact) as file 2, and
    maxFilesPerTrigger=1 forces the clones into a LATER micro-batch —
    so every clone is dropped by state-store lookups across a real
    micro-batch boundary, not within-batch distinct.  The sink is the
    surviving digest set, which must equal the batch-distinct digests
    of the un-cloned corpus (the oracle): if streaming dedup dropped
    nothing the row count is wrong, if it dropped too much the hash
    is wrong."""
    import shutil
    import tempfile

    from ocular_spark.streaming.jobs import dedup_docs_stream

    global _DEDUP_STREAM_TMP_ROOT
    d = _load(spark, sf_dir, "documents").select("doc_id", "text")
    clones = d.filter(F.col("doc_id") % 100 == 7).withColumn(
        "doc_id", F.col("doc_id") + 10_000_000
    )

    if _DEDUP_STREAM_TMP_ROOT is not None:
        shutil.rmtree(_DEDUP_STREAM_TMP_ROOT, ignore_errors=True)
    root = tempfile.mkdtemp(prefix="ocular_dedup_stream_")
    _DEDUP_STREAM_TMP_ROOT = root
    docs_dir = os.path.join(root, "docs")
    out_dir = os.path.join(root, "out")
    ckpt = os.path.join(root, "ckpt")
    # two separate single-file appends: originals first, clones second
    d.coalesce(1).write.parquet(docs_dir)
    clones.coalesce(1).write.mode("append").parquet(docs_dir)
    q = dedup_docs_stream(spark, docs_dir, out_dir, ckpt)
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("streaming dedup did not finish in 600s")
    return spark.read.parquet(out_dir).select("text_hash")


SPAN_DEDUP_MIN_DF = 10


def q_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document span-level boilerplate dedup over the
    INTERLEAVED table shape (CCNet-style paragraph-granularity
    dedup, Wenzek et al. 2020; the 'most common paragraph' filter of
    main-content pipelines): each doc becomes one text span per
    atomic block of its boilerplate-wrapped page plus a trailing
    media span, and any text span whose EXACT block text occurs in
    >= SPAN_DEDUP_MIN_DF distinct documents is dropped (nav / ad /
    share-bar / footer blocks — the cross-doc signal the per-page
    jusText heuristic cannot see); all surviving spans keep their
    original (kind, text, media_ref, offset) values — the north_rule
    per-row invariant.

    100 TB shape: block texts never shuffle — doc frequency is
    aggregated on the 8-byte xxhash64 of the block (map-side partial
    agg, one shuffle), the frequent set is tiny (boilerplate only) and
    broadcast back as a LEFT ANTI join, so the serving side is
    shuffle-free.  Media spans (text NULL -> hash NULL) never match
    the anti-join key and pass through untouched."""
    from ocular_spark.functions import html as H

    d = _load_wide(spark, sf_dir, "documents")
    stats = H.stats_expr_spark(H.segments_expr_spark(H.wrap_boilerplate_spark()))
    base = d.select(
        "doc_id", F.expr(f"transform({stats}, s -> s.txt)").alias("blocks")
    )
    spans = base.select(
        "doc_id",
        F.expr(
            "concat("
            "transform(blocks, (b, i) -> named_struct("
            "'kind', 'text', 'text', b, "
            "'media_ref', cast(null as string), 'offset', i)), "
            "array(named_struct('kind', 'media', 'text', cast(null as string), "
            "'media_ref', concat('m-', doc_id), 'offset', size(blocks))))"
        ).alias("spans"),
    )
    flat = spans.select("doc_id", F.explode("spans").alias("span")).select(
        "doc_id",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )
    boiler = (
        flat.filter(F.col("kind") == "text")
        .select(F.xxhash64("text").alias("h"), "doc_id")
        .groupBy("h")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= SPAN_DEDUP_MIN_DF)
        .select("h")
    )
    keyed = flat.withColumn(
        "h", F.when(F.col("kind") == "text", F.xxhash64("text"))
    )
    return keyed.join(F.broadcast(boiler), "h", "left_anti").drop("h")


# PII patterns restricted to constructs Java regex (Spark) and RE2
# (DuckDB) treat identically: character classes, bounded repetition,
# non-capturing groups, \b word boundaries.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+1-[0-9]{3}-[0-9]{4}"
PII_IP_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"


def _pii_injected_text():
    """Deterministic PII fixture: the synthetic corpus contains no PII,
    so emails / NANP phones / IPv4s are appended as doc_id-derived
    suffixes (mirrored exactly in the DuckDB oracle).  A doc can carry
    zero, one, or several PII kinds (moduli 3/4/5 interleave)."""
    did = F.col("doc_id")
    t = F.col("text")
    t = F.when(
        did % 3 == 0,
        F.concat(t, F.lit(" contact user"), did.cast("string"),
                 F.lit("@example.com now")),
    ).otherwise(t)
    t = F.when(
        did % 4 == 1,
        F.concat(t, F.lit(" call +1-555-"),
                 F.lpad((did % 10000).cast("string"), 4, "0"),
                 F.lit(" today")),
    ).otherwise(t)
    t = F.when(
        did % 5 == 2,
        F.concat(t, F.lit(" from 10."), (did % 256).cast("string"),
                 F.lit(".0."), ((did * 7) % 256).cast("string"),
                 F.lit(" logged")),
    ).otherwise(t)
    return t


def q_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization (web-scale curation: URL-level dedup and
    domain grouping need one canonical form per resource).  Messy URLs
    are synthesized deterministically per doc (mixed-case scheme/host,
    default and non-default ports, dot-segments, duplicate slashes,
    utm_* tracking params, fragments), then normalized by ONE chain of
    JVM regexp/array expressions — RFC 3986 §6.2 case + default-port +
    dot-segment normalization, plus the curation-standard tracking-
    param strip and query-param sort: lowercase scheme/host, drop the
    fragment, drop :80/:443 only for the matching scheme, collapse
    duplicate slashes, resolve /./ and segment/.. (two passes each —
    bounded depth; production routes deeper chains to an Arrow kernel,
    and tests/test_url_normalize.py pins the chain against a genuine
    RFC remove_dot_segments reference), drop utm_* params, sort the
    rest.  Pure projection over the scan: no shuffle, no Python,
    whole-stage-codegen'd; the DuckDB oracle mirrors the chain
    string-for-string (patterns restricted to Java-regex/RE2-identical
    constructs, as in pii_redact)."""
    d = _load_wide(spark, sf_dir, "documents").select("doc_id")
    did = F.col("doc_id")
    m3, m4, m5, m7, m11 = did % 3, did % 4, did % 5, did % 7, did % 11
    scheme_raw = (
        F.when(m3 == 0, "http").when(m3 == 1, "HTTPS").otherwise("HtTp")
    )
    host_raw = (
        F.when(m4 == 0, "ExAmple.org")
        .when(m4 == 1, "example.ORG")
        .when(m4 == 2, "WWW.example.org")
        .otherwise("sub.Example.org")
    )
    port_raw = (
        F.when(m5 == 0, ":80").when(m5 == 1, ":443")
        .when(m5 == 2, ":8080").otherwise("")
    )
    path_raw = F.concat(
        F.lit("/a/./sec"),
        F.when(m7 == 3, "//").otherwise("/"),
        F.lit("x/../item/"),
        did.cast("string"),
    )
    query_raw = F.when(m11 == 0, F.lit("utm_only=1")).otherwise(
        F.concat(
            F.lit("utm_source=feed&z="), (did % 10).cast("string"),
            F.lit("&utm_campaign=c&a=1"),
        )
    )
    url_raw = F.concat(
        scheme_raw, F.lit("://"), host_raw, port_raw, path_raw,
        F.lit("?"), query_raw, F.lit("#sec"), (did % 2).cast("string"),
    )

    from ocular_spark.functions.urls import url_norm_cols

    u = d.select("doc_id", url_raw.alias("url_raw"))
    cols = url_norm_cols(F.col("url_raw"))
    return u.select(
        "doc_id", "url_raw",
        *[cols[k].alias(k)
          for k in ("scheme", "host", "path", "query", "url_norm")],
    )


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (emails, NANP phone numbers, IPv4 addresses), the
    standard pre-training redaction pass (CCNet/Dolma-style pipelines
    run exactly this shape before tokenization): per-kind match counts
    plus the redacted text with typed placeholders.

    100 TB shape: ONE map-side JVM projection — regexp_count +
    chained regexp_replace inside whole-stage codegen; no shuffle, no
    Python, no UDF.  Patterns are passed as Column literals, not SQL
    strings (SQL literals eat single backslashes).  Replacement order
    (email -> phone -> IP) is fixed and placeholder tokens match no
    later pattern, so the composition is order-exact."""
    d = _load_wide(spark, sf_dir, "documents")
    raw = d.select("doc_id", _pii_injected_text().alias("t"))
    email, phone, ip = (F.lit(p) for p in (PII_EMAIL_RE, PII_PHONE_RE, PII_IP_RE))
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("t"), email, F.lit("<EMAIL>")),
            phone, F.lit("<PHONE>")),
        ip, F.lit("<IP>"))
    return raw.select(
        "doc_id",
        F.regexp_count(F.col("t"), email).cast("long").alias("n_email"),
        F.regexp_count(F.col("t"), phone).cast("long").alias("n_phone"),
        F.regexp_count(F.col("t"), ip).cast("long").alias("n_ip"),
        clean.alias("clean_text"),
    )


def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode text normalization (NFC + space folding + zero-width/
    control strip + run collapse; ocular_spark/functions/text.py) —
    the pass every corpus pipeline runs before hashing, or exact
    dedup misses byte-different/logically-equal pairs.  Stage 1 (NFC)
    is an Arrow-batched pandas UDF over CPython's unicodedata; stages
    2-5 are ONE JVM translate+regex projection.  The DuckDB oracle
    runs its OWN independent NFC (nfc_normalize) plus the mirrored
    stages — a genuine two-implementation gate on the Unicode
    composition tables.  Fixture docs are ASCII, so decorations
    exercising every stage are injected by doc_id (mirrored in the
    oracle)."""
    from ocular_spark.functions import text as T

    d = _load_wide(spark, sf_dir, "documents")
    raw = d.select("doc_id", F.expr(T.injected_expr()).alias("t"))
    normed = raw.withColumn("__nfc", T.nfc_kernel()("t")).select(
        "doc_id",
        "t",
        T.normalize_col(F.col("__nfc")).alias("norm_text"),
    )
    return normed.select(
        "doc_id",
        "norm_text",
        (F.col("t") != F.col("norm_text")).cast("long").alias("changed"),
        F.length("t").cast("long").alias("len_raw"),
        F.length("norm_text").cast("long").alias("len_norm"),
    )


def q_html_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured-data extraction: HTML tables -> relational rows (the
    WebTables/WDC side of main-content extraction — at web scale,
    tables are the densest machine-readable facts on a page).  Each
    doc is wrapped in a deterministic page with a 2-row metadata table
    and a variable-row data table (tags carry attributes; cells carry
    inline markup); extraction is ONE chain of JVM regexp_extract_all
    + posexplode generators: tables -> rows -> cells, inner tags
    stripped, whitespace collapsed.  No Python, no join; the only
    exchanges are the generators' natural output.  FLAT tables only
    (non-greedy '</table>' match) — nested tables route to a DOM
    kernel, the same documented split as functions/html.py.  The
    DuckDB oracle mirrors the chain with regexp_extract_all +
    UNNEST(range) ordinals."""
    d = _load_wide(spark, sf_dir, "documents").select("doc_id", "lang")
    did = F.col("doc_id")
    data_rows = F.array_join(
        F.transform(
            F.sequence(F.lit(0), did % 3),
            lambda r: F.concat(
                F.lit('<tr><td>r'), r.cast("string"),
                F.lit("</td><td>"), ((did * 7 + r) % 100).cast("string"),
                F.lit("</td><td><b>x</b> "),
                ((did + r) % 13).cast("string"),
                F.lit("</td></tr>"),
            ),
        ),
        "",
    )
    html = F.concat(
        F.lit('<html><body><div>intro</div><table class="meta">'),
        F.lit("<tr><th>id</th><td>"), did.cast("string"),
        F.lit("</td></tr><tr><th>lang</th><td>"), F.col("lang"),
        F.lit('</td></tr></table><p>filler</p><table id="data">'),
        data_rows,
        F.lit("</table></body></html>"),
    )
    w = d.select("doc_id", html.alias("html"))
    tbls = F.regexp_extract_all(
        F.col("html"), F.lit(r"(?is)<table[^>]*>(.*?)</table>"), 1
    )
    t = w.select("doc_id", F.posexplode(tbls).alias("table_idx", "tbl"))
    trs = F.regexp_extract_all(
        F.col("tbl"), F.lit(r"(?is)<tr[^>]*>(.*?)</tr>"), 1
    )
    r = t.select(
        "doc_id", "table_idx", F.posexplode(trs).alias("row_idx", "row")
    )
    cells = F.transform(
        F.regexp_extract_all(
            F.col("row"), F.lit(r"(?is)<t[dh][^>]*>(.*?)</t[dh]>"), 1
        ),
        lambda c: F.trim(
            F.regexp_replace(
                F.regexp_replace(c, "<[^>]*>", ""), "[ \t\n\r]+", " "
            )
        ),
    )
    return r.select(
        "doc_id",
        F.col("table_idx").cast("long").alias("table_idx"),
        F.col("row_idx").cast("long").alias("row_idx"),
        F.size(cells).cast("long").alias("n_cells"),
        F.array_join(cells, "|").alias("cell_text"),
    )


def q_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based sentence segmentation (the doc->sentence expansion
    feeding sentence-level dedup, alignment, and chunking).  The
    word-list corpus has no punctuation, so terminators and an
    abbreviation trap are injected deterministically by word index
    (every 13th word gains '.', every 20th '!', every 29th becomes
    'e.g.' — which must NOT split); the splitter then (1) protects
    abbreviation dots with a control byte, (2) marks each terminator-
    space boundary with a sentinel, (3) splits on the sentinel, (4)
    restores the protected dots.  No lookbehind anywhere — Java regex
    has it but RE2 (DuckDB, and Spark's codegen-friendly subset)
    doesn't, so the sentinel rewrite is the portable formulation.

    100 TB shape: one projection + posexplode — no shuffle, no
    Python; output rows ~ input sentences.  The replacement-string
    syntax differs by engine ($1 vs \\1) but every PATTERN is
    RE2/Java-identical (pii_redact's portability rule)."""
    d = _load_wide(spark, sf_dir, "documents").select("doc_id", "text")
    words = F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    n = F.size(words)
    marked = F.array_join(
        F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda i: F.when((i % 29) == 28, "e.g.")
            .when((i % 13) == 12, F.concat(F.element_at(words, i + 1),
                                           F.lit(".")))
            .when((i % 20) == 19, F.concat(F.element_at(words, i + 1),
                                           F.lit("!")))
            .otherwise(F.element_at(words, i + 1)),
        ),
        " ",
    )
    protected = F.replace(marked, F.lit("e.g."), F.lit("e\x02g\x02"))
    sentinel = F.regexp_replace(protected, r"([.!?]) +", "$1\x01")
    sents = F.split(sentinel, "\x01")
    s = d.filter(n > 0).select(
        "doc_id", F.posexplode(sents).alias("sent_idx", "raw")
    )
    restored = F.replace(F.col("raw"), F.lit("\x02"), F.lit("."))
    return s.select(
        "doc_id",
        F.col("sent_idx").cast("long").alias("sent_idx"),
        F.length(restored).cast("long").alias("n_chars"),
        restored.alias("sentence"),
    )


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction: token -> posting list (sorted
    doc_ids with term frequencies), document frequency and collection
    frequency — the retrieval-side artifact a corpus engine emits for
    BM25/boolean search (the Lucene segment-build expressed as two
    aggregations).  Postings are exposed as a bounded head (first 10
    'doc:tf' entries) plus an md5 over the FULL ordered list, so the
    driver hash pins every posting without shipping unbounded rows.

    100 TB shape: explode -> (token, doc) partial-count -> (token)
    list-assembly is two shuffles, both map-side combinable; the
    posting assembly uses sort_array over collect_list (collect_list
    order is partition-dependent — sorting restores determinism).
    Stopword-grade tokens make posting rows heavy at web scale:
    production salts the token key into (token, bucket) shards and
    concatenates per-bucket lists, same as the span_dedup skew note."""
    d = _load_wide(spark, sf_dir, "documents").select("doc_id", "text")
    toks = d.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.col("text"), " "), lambda t: t != "")
        ).alias("token"),
    )
    tf = toks.groupBy("token", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    postings = tf.groupBy("token").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("cf"),
        F.transform(
            F.sort_array(F.collect_list(F.struct("doc_id", "tf"))),
            lambda s: F.concat(
                s["doc_id"].cast("string"), F.lit(":"),
                s["tf"].cast("string"),
            ),
        ).alias("arr"),
    )
    return postings.select(
        "token", "df", "cf",
        F.array_join(F.slice(F.col("arr"), 1, 10), ",").alias(
            "posting_head"
        ),
        F.md5(F.array_join(F.col("arr"), ",")).alias("posting_digest"),
    )


def _crawl_version_frames(d: DataFrame):
    """The deterministic crawl-version synthesis shared by the batch
    merge (q_crawl_upsert) and its streaming foreachBatch counterpart
    (q_crawl_upsert_stream) — one definition so the two gates can
    never drift: crawl 0 = every doc; crawl 1 refetches doc_id%4==1
    with changed content and discovers doc_id%10==3 as new URLs."""
    did = F.col("doc_id")
    base = d.select(
        "doc_id", F.lit(0).alias("crawl_id"),
        (F.lit(1_700_000_000) + did).alias("fetch_ts"),
        F.md5("text").alias("content_digest"),
    )
    refetch = d.filter(did % 4 == 1).select(
        "doc_id", F.lit(1).alias("crawl_id"),
        (F.lit(1_700_500_000) + did).alias("fetch_ts"),
        F.md5(F.concat(F.col("text"), F.lit(" v2"))).alias("content_digest"),
    )
    new = d.filter(did % 10 == 3).select(
        (did + 100_000).alias("doc_id"), F.lit(1).alias("crawl_id"),
        (F.lit(1_700_500_000) + did).alias("fetch_ts"),
        F.md5(F.concat(F.lit("new:"), F.col("text"))).alias("content_digest"),
    )
    return base, refetch, new


def q_crawl_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental crawl merge, latest version wins (the Iceberg
    MERGE INTO seam of a continuously-refreshed corpus: recrawled
    URLs replace their prior version, new URLs append).  Base corpus
    = the documents table at crawl 0; the synthetic crawl-1 batch
    refetches every doc_id % 4 == 1 (content changed, later
    fetch_ts) and discovers new docs (doc_id + 100000 for
    doc_id % 10 == 3).  The merge is union -> ONE hash shuffle on
    doc_id -> max_by(struct(fetch_ts, crawl_id)): a declarative
    argmax, so Catalyst runs it with map-side partial aggregation —
    deliberately NOT a row_number window, which would force a full
    per-key sort for the same answer.  n_versions counts the lineage
    depth per URL (1 = never refetched).

    Content is reduced to md5 BEFORE the shuffle so document bodies
    never move between executors — at 100 TB the merge shuffles only
    (key, ts, digest) tuples, and the winning version's body is
    re-read column-pruned from the winning snapshot's files."""
    d = _load_wide(spark, sf_dir, "documents").select("doc_id", "text")
    base, refetch, new = _crawl_version_frames(d)
    allv = base.unionByName(refetch).unionByName(new)
    win = allv.groupBy("doc_id").agg(
        F.max(
            F.struct(
                F.col("fetch_ts").alias("ts"),
                F.col("crawl_id").alias("c"),
                F.col("content_digest").alias("h"),
            )
        ).alias("w"),
        F.count(F.lit(1)).alias("n_versions"),
    )
    return win.select(
        "doc_id",
        F.col("w.c").alias("crawl_id"),
        F.col("w.ts").alias("fetch_ts"),
        F.col("n_versions"),
        F.col("w.h").alias("content_digest"),
    )


def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type-2 history (Kimball SCD2) over
    the crawl versions — the OTHER half of the lakehouse upsert story:
    q_crawl_upsert keeps only the latest row; a training-data audit
    ("which snapshot was doc X when run R read it?") needs every
    version as a validity interval [valid_from, valid_to) with an
    is_current flag.  Built from the SAME _crawl_version_frames
    synthesis as the upsert gates, so the three surfaces can't drift.

    Scale shape: ONE hash shuffle on doc_id, then lead()/row_number()
    windows that sort only the per-key version lists (2-3 rows per
    URL) — never the corpus; digests computed before the shuffle so
    bodies never move.  -1 is the open-interval sentinel (BIGINT
    column, no NULL-vs-hash ambiguity in the driver compare)."""
    from pyspark.sql.window import Window

    d = _load_wide(spark, sf_dir, "documents").select("doc_id", "text")
    base, refetch, new = _crawl_version_frames(d)
    allv = base.unionByName(refetch).unionByName(new)
    w = Window.partitionBy("doc_id").orderBy("valid_from", "crawl_id")
    return allv.select(
        "doc_id",
        F.col("crawl_id").cast("long").alias("crawl_id"),
        F.col("fetch_ts").cast("long").alias("valid_from"),
        "content_digest",
    ).select(
        "doc_id",
        F.row_number().over(w).cast("long").alias("version_seq"),
        "crawl_id",
        "valid_from",
        F.coalesce(F.lead("valid_from").over(w), F.lit(-1))
        .cast("long")
        .alias("valid_to"),
        F.lead("valid_from").over(w).isNull().cast("long").alias("is_current"),
        "content_digest",
    )


def q_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-policy filtering: apply per-source robots.txt rules to
    document paths with the RFC 9309 precedence — among all matching
    rules the LONGEST path prefix wins, Allow beating Disallow on a
    length tie.  Each source synthesizes three deterministic rules
    (a section Disallow, a longer Allow carve-out inside it, and a
    never-matching Disallow), each doc a path derived from doc_id;
    the fixture covers all four outcomes: no-match fetch, disallowed,
    carve-out re-allowed, and the tie rule.

    100 TB shape: the rules table is robots.txt-sized (dimension data)
    — BROADCAST to the corpus, prefix match as a theta-join predicate,
    then ONE groupBy doc taking max_by(struct(len, is_allow)): a
    map-side-combinable argmax, no window, no sort.  The DuckDB
    oracle restates precedence with arg_max over the same rank."""
    d = _load_wide(spark, sf_dir, "documents").select("doc_id", "source")
    did = F.col("doc_id")
    docs = d.select(
        "doc_id", "source",
        F.concat(
            F.lit("/sec"), (F.floor(did / 3) % 5).cast("string"),
            F.lit("/item/"), did.cast("string"),
        ).alias("path"),
    )
    # alias to rule_source: rules derive from the same documents scan
    # as docs, and a self-join on the shared lineage column is
    # ambiguous to the analyzer
    src = docs.select(F.col("source").alias("rule_source")).distinct()
    k = F.substring(F.col("rule_source"), 4, 10).cast("int") % 5
    rules = (
        src.select(
            "rule_source",
            F.concat(F.lit("/sec"), k.cast("string"), F.lit("/")).alias(
                "prefix"
            ),
            F.lit(0).alias("is_allow"),
        )
        .unionByName(
            src.select(
                "rule_source",
                F.concat(
                    F.lit("/sec"), k.cast("string"), F.lit("/item/1")
                ).alias("prefix"),
                F.lit(1).alias("is_allow"),
            )
        )
        .unionByName(
            src.select(
                "rule_source", F.lit("/private/").alias("prefix"),
                F.lit(0).alias("is_allow"),
            )
        )
    )
    m = docs.join(
        F.broadcast(rules),
        (F.col("source") == F.col("rule_source"))
        & F.col("path").startswith(F.col("prefix")),
        "left",
    ).select("source", "doc_id", "path", "prefix", "is_allow")
    best = m.groupBy("doc_id", "source", "path").agg(
        F.max(
            F.when(
                F.col("prefix").isNotNull(),
                F.struct(
                    F.length("prefix").alias("l"),
                    F.col("is_allow").alias("a"),
                    F.col("prefix").alias("p"),
                ),
            )
        ).alias("rule")
    )
    return best.select(
        "doc_id", "source", "path",
        F.col("rule.p").alias("matched_rule"),
        F.when(
            F.col("rule").isNull() | (F.col("rule.a") == 1), "fetch"
        ).otherwise("skip").alias("decision"),
    )


def q_anchor_texts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor (link) extraction — the first stage of any web-graph /
    anchor-text-corpus build (anchor text is classic training signal:
    it labels the TARGET page): every <a> element of the synthesized
    pages becomes a (doc_id, href, anchor) row.  One
    regexp_extract_all projection + explode, per-anchor href/text as
    JVM regex — no shuffle, no Python.  The anchor-text cleanup
    reuses the exact entity-unescape/tag-strip fragment the
    main-content extractor uses (functions/html.py _txt_frag), so the
    two surfaces cannot drift."""
    from ocular_spark.functions import html as H

    d = _load_wide(spark, sf_dir, "documents")
    wrapped = d.select(
        "doc_id", F.expr(H.wrap_links_spark()).alias("html")
    )
    exploded = wrapped.select(
        "doc_id", F.explode(F.expr(H.anchors_expr("html"))).alias("a")
    )
    return exploded.select(
        "doc_id",
        F.regexp_extract("a", H.HREF_PAT, 1).alias("href"),
        F.expr(H._txt_frag(False, "a")).alias("anchor"),
    )


# PageRank fixed-point arithmetic: BIGINT rank at SCALE so every
# engine sums the same exact integers (order-independent — the same
# device as the IVF Lloyd means); production would carry doubles.
PR_SCALE = 10**12
PR_D_NUM, PR_D_DEN = 85, 100  # damping 0.85
PR_ITERS = 3


def q_link_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the extracted doc->doc link graph — the web-graph
    propagation operator (dedup_cluster covers unweighted reachability;
    this adds weighted iterative mass flow).  Edges come from the SAME
    page synthesis + href regex the anchor row gates; ranks are exact
    BIGINTs at PR_SCALE with per-edge floor division, so three
    unrolled iterations hash identically in both engines.  Dangling
    mass (nodes with no out-links) is dropped, not redistributed —
    documented variant, mirrored in the oracle.

    100 TB shape: the edge list is localCheckpoint'd ONCE (the
    dedup_cluster lesson: un-materialized, every iteration re-runs
    the upstream extraction); each iteration is one src-join (rank
    carry) + one dst-groupBy (mass sum) — the canonical two-shuffle
    PageRank step; at production scale edges would be bucketed by src
    so the carry join is co-located and only the dst aggregation
    shuffles."""
    from ocular_spark.functions import html as H

    d = _load_wide(spark, sf_dir, "documents")
    wrapped = d.select(
        "doc_id", F.expr(H.wrap_links_spark()).alias("html")
    )
    edges = wrapped.select(
        F.col("doc_id").alias("src"),
        F.explode(F.expr(H.doc_links_expr("html"))).alias("d"),
    ).select("src", F.col("d").cast("long").alias("dst"))
    return pagerank_ranks(edges)


def pagerank_ranks(edges: DataFrame, iters: int = PR_ITERS) -> DataFrame:
    """Fixed-point PageRank over an (src, dst) edge frame — see
    q_link_pagerank for arithmetic and scale notes.  Edges are
    deduplicated and localCheckpoint'd once up front."""
    edges = edges.distinct().localCheckpoint()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    nodes = (
        edges.select(F.col("src").alias("n"))
        .union(edges.select(F.col("dst").alias("n")))
        .distinct()
        .localCheckpoint()
    )
    n_nodes = nodes.count()  # driver scalar (bounded: |V|)
    base = (PR_SCALE * (PR_D_DEN - PR_D_NUM)) // (PR_D_DEN * n_nodes)
    # cast: a small-universe initial rank fits INT and ANSI mode would
    # overflow the INT multiply inside the contribution expression
    ranks = nodes.withColumn("rank", F.lit(PR_SCALE // n_nodes).cast("long"))
    carry = edges.join(deg, "src")
    for _ in range(iters):
        contrib = (
            carry.join(ranks, carry["src"] == ranks["n"])
            .select(
                "dst",
                F.expr(f"(rank * {PR_D_NUM}) DIV ({PR_D_DEN} * outdeg)").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(contrib, nodes["n"] == contrib["dst"], "left").select(
            "n",
            (F.lit(base).cast("long") + F.coalesce(F.col("s"), F.lit(0).cast("long")))
            .alias("rank"),
        )
    return ranks.select(
        F.col("n").alias("node"), F.col("rank").cast("long").alias("rank")
    )


# HyperLogLog (Flajolet et al. 2007): m = 64 registers (p = 6),
# alpha_64 = 0.709.  ALPHA_M2_SCALED is alpha * m^2 * 2^53 as ONE
# precomputed double literal so neither engine multiplies (DuckDB
# would infer DECIMAL and overflow; separate multiplies could also
# associate differently).
HLL_M = 64
HLL_ALPHA_M2_SCALED = "2.6157483096520143e+19"


def _hll_items(d: DataFrame) -> DataFrame:
    """(source, gram, item) token stream — unigrams + bigrams — shared
    by the batch sketch (q_hll_distinct) and the streaming register
    merge (q_hll_distinct_stream) so the two gates can't drift."""
    t = d.select("source", F.split("text", " ").alias("ts"))
    uni = t.select(
        "source", F.lit(1).alias("gram"), F.explode("ts").alias("item")
    ).filter(F.col("item") != "")
    bi = t.select(
        "source",
        F.lit(2).alias("gram"),
        F.explode(
            F.expr(
                "CASE WHEN size(ts) >= 2 THEN transform(sequence(1, size(ts) - 1),"
                " i -> concat(element_at(ts, i), ' ', element_at(ts, i + 1)))"
                " ELSE array() END"
            )
        ).alias("item"),
    )
    return uni.unionByName(bi)


def _hll_registers(items: DataFrame) -> DataFrame:
    """(source, gram, idx, r) HLL register maxes for an item stream —
    see q_hll_distinct for the exactness devices."""
    hashed = items.select(
        "source",
        "gram",
        F.expr(
            "cast(conv(substring(md5(item), 1, 4), 16, 10) as bigint) % 64"
        ).alias("idx"),
        F.expr("cast(conv(substring(md5(item), 5, 13), 16, 10) as bigint)").alias("x"),
    ).select(
        "source",
        "gram",
        "idx",
        F.expr("CASE WHEN x = 0 THEN 53 ELSE length(bin(x & -x)) END").alias("rho"),
    )
    return hashed.groupBy("source", "gram", "idx").agg(F.max("rho").alias("r"))


def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct counting by HAND-ROLLED HyperLogLog sketch — the
    mergeable cardinality structure every 100 TB profiler needs
    (approx_count_distinct is Spark's blackbox HLL++; this one is
    deterministic and engine-portable, so the DuckDB oracle replays
    it register-for-register).  Per (source, n-gram order): unigrams
    land in the linear-counting branch (~31 distinct << 2.5m),
    bigrams in the raw-estimate branch (~700 distinct) — both code
    paths gated.

    Exactness device: rho (first-set-bit rank) is
    length(bin(x & -x)) — pure integer/string, immune to the
    log2-of-power-of-two ULP trap; the register sum is the exact
    BIGINT sum of 2^(53-rho) (missing registers contribute 2^53), so
    the only float ops are one division and possibly one ln, rounded
    to 4 dp.  100 TB shape: tokenize + hash + rho is a pure
    projection; ONE shuffle to (source, gram, idx) register maxes
    (64 rows per group); the register -> estimate fold is a second
    tiny agg.  n_exact (the verification column) would be dropped at
    scale — it is the quantity HLL exists to avoid."""
    d = _load_wide(spark, sf_dir, "documents").select("source", "text")
    items = _hll_items(d)
    regs = _hll_registers(items)
    folded = regs.groupBy("source", "gram").agg(
        F.expr("sum(cast(shiftleft(1L, 53 - r) as bigint))").alias("s_used"),
        F.count(F.lit(1)).alias("used"),
    )
    exact = items.groupBy("source", "gram").agg(
        F.countDistinct("item").alias("n_exact")
    )
    sk = folded.select(
        "source",
        "gram",
        (F.lit(HLL_M) - F.col("used")).cast("long").alias("v_zero"),
        F.expr(
            f"cast(s_used + ({HLL_M} - used) * cast(shiftleft(1L, 53) as bigint)"
            " as bigint)"
        ).alias("s_scaled"),
    )
    est_raw = f"({HLL_ALPHA_M2_SCALED} / cast(s_scaled as double))"
    est = (
        f"round(CASE WHEN {est_raw} <= 160.0 AND v_zero > 0"
        f" THEN 64.0 * ln(64.0 / v_zero) ELSE {est_raw} END, 4)"
    )
    return (
        sk.join(exact, ["source", "gram"])
        .select(
            "source",
            F.col("gram").cast("long").alias("gram"),
            "v_zero",
            "s_scaled",
            "n_exact",
            F.expr(est).alias("est"),
        )
    )


# Exact-substring dedup unit (Lee et al. 2021 use 50 BPE tokens;
# char-40 here): long enough that random small-vocab text still
# leaves most positions unique (measured: 4.5% of distinct 40-grams
# are cross-doc at sf0.01), short enough to flag real boilerplate.
DUPSUB_K = 40
DUPSUB_PASSAGE = (
    " the same forty plus character passage recurs verbatim across"
    " every fiftieth document of this corpus"
)


def q_dup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplicated-mass (ExactSubstr, Lee et al. 2021
    'Deduplicating Training Data Makes Language Models Better'): per
    document, the character mass covered by >= K-char substrings that
    also occur in ANOTHER document.  The reference method builds a
    corpus suffix array; the distributed formulation is a stride-1
    char K-gram inventory — doc frequency on xxhash64 of each gram
    (8-byte keys shuffle, gram strings never leave the projection),
    flagged positions joined back, and the covered mass computed as
    the interval-union via one lead() window per doc: each flagged
    start contributes min(K, next_start - start), the last one K.

    The oracle regroups on the RAW gram strings (no hashing) — an
    independent formulation that also certifies xxhash64
    collision-freeness on this corpus.  Docs with doc_id % 50 == 9
    carry an injected shared passage (strong positives); the 4.5%
    natural vocabulary-collision background supplies weak ones.

    100 TB note: stride-1 inventories are O(n*K) work; production
    would winnow candidates first (doc_fingerprint) and run this
    coverage pass only on candidate pairs — documented trade, same
    operators."""
    from pyspark.sql.window import Window

    K = DUPSUB_K
    d = _load_wide(spark, sf_dir, "documents")
    raw = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 50 == 9, F.concat("text", F.lit(DUPSUB_PASSAGE))
        ).otherwise(F.col("text")).alias("t"),
    )
    grams = raw.select(
        "doc_id",
        F.explode(
            F.expr(
                f"CASE WHEN length(t) >= {K} THEN"
                f" transform(sequence(1, length(t) - {K} + 1),"
                f" p -> named_struct('p', p, 'h', xxhash64(substring(t, p, {K}))))"
                " ELSE array() END"
            )
        ).alias("g"),
    ).select("doc_id", F.col("g.p").alias("p"), F.col("g.h").alias("h"))
    dup = (
        grams.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    w = Window.partitionBy("doc_id").orderBy("p")
    cov = (
        grams.join(dup, "h")
        .select("doc_id", "p", F.lead("p").over(w).alias("np"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_dup_starts"),
            F.sum(
                F.coalesce(
                    F.least(F.lit(K).cast("long"), F.col("np") - F.col("p")),
                    F.lit(K).cast("long"),
                )
            ).alias("dup_chars"),
        )
    )
    totals = raw.select(
        "doc_id",
        F.greatest(F.length("t") - K + 1, F.lit(0)).cast("long").alias("n_grams"),
        F.length("t").cast("long").alias("len"),
    )
    return totals.join(cov, "doc_id", "left").select(
        "doc_id",
        "n_grams",
        F.coalesce("n_dup_starts", F.lit(0)).cast("long").alias("n_dup_starts"),
        F.coalesce("dup_chars", F.lit(0)).cast("long").alias("dup_chars"),
        F.expr("round(cast(coalesce(dup_chars, 0) as double) / len, 6)").alias(
            "dup_frac"
        ),
    )


# 13-word shingles, the GPT-3/Gopher/Dolma decontamination unit
DECON_N = 13
DECON_CANON = (
    "the quick brown fox jumps over the lazy dog while spark shuffles data"
)
DECON_CANON2 = (
    "every byte of common crawl is filtered deduplicated and scored "
    "before training runs"
)


def _decon_injected_text():
    """Deterministic contamination fixture: benchmark docs
    (doc_id % 100 == 7) carry both canonical sentences; 'leaked' docs
    carry one (doc_id % 10 == 4 -> >=1 shared shingle) or both
    (doc_id % 10 == 9 -> >=14: CANON + CANON2 + the 12 shingles
    straddling their boundary, occasionally +1 more when the leaked
    doc's trailing words coincide with a benchmark doc's — the small
    synthetic vocabulary makes that possible and both engines count it
    identically); docs with neither sentence share nothing (random
    word salad cannot reproduce a specific 13-word sequence)."""
    did = F.col("doc_id")
    both = F.lit(" " + DECON_CANON + " " + DECON_CANON2)
    return F.concat(
        F.col("text"),
        F.when(did % 100 == 7, both)
        .when(did % 10 == 4, F.lit(" " + DECON_CANON))
        .when(did % 10 == 9, both)
        .otherwise(F.lit("")),
    )


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (GPT-3 appendix C / Gopher / Dolma):
    flag every corpus document sharing at least one 13-word shingle
    with the benchmark set, reporting the overlap count.  The shingle
    inventory of each document is built inside ONE array expression
    (split -> sliding slice -> concat_ws -> array_distinct), hashed to
    int64 with xxhash64 before the explode so shingle STRINGS never
    leave the projection.

    100 TB shape: benchmark suites are tiny by nature, so the bench
    shingle-hash set is collected-free and BROADCAST; the corpus side
    is map-side (scan -> projection -> explode -> broadcast semi-join)
    with the plan's only exchange the final per-doc count.  The DuckDB
    oracle groups on shingle strings where Spark joins on their
    xxhash64 — the hash is a shuffle-width optimization, not a
    semantic difference (same argument as span_dedup).  In production
    the benchmark suite is a separate (tiny) table; this fixture
    derives it from the corpus scan by doc_id modulus, so the corpus
    parquet is scanned twice — an artifact of the self-contained
    oracle, not of the operator's shape."""
    n = DECON_N
    d = _load_wide(spark, sf_dir, "documents")
    toks = F.split(F.col("t"), " ")
    grams = F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i, n))),
            )
        ),
    ).otherwise(F.expr("CAST(array() AS array<bigint>)"))
    gh = (
        d.select("doc_id", _decon_injected_text().alias("t"))
        .select("doc_id", F.explode(grams).alias("h"))
    )
    bench = gh.filter(F.col("doc_id") % 100 == 7).select("h").distinct()
    return (
        gh.filter(F.col("doc_id") % 100 != 7)
        .join(F.broadcast(bench), "h")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_benchmark_grams"))
    )


# per-language sampling rates (percent) for the training mix, plus the
# Lehmer-style selection hash (safe int64 arithmetic in BOTH engines:
# (doc_id % 1000003) * 48271 stays < 2^63 for any bigint doc_id)
TRAIN_MIX_RATES = {"en": 62, "zh": 35, "es": 35, "de": 35, "fr": 35}
TRAIN_MIX_DEFAULT = 25
_MIX_CASE = (
    "CASE lang "
    + " ".join(f"WHEN '{k}' THEN {v}" for k, v in sorted(TRAIN_MIX_RATES.items()))
    + f" ELSE {TRAIN_MIX_DEFAULT} END"
)
_MIX_HASH = "(doc_id % 1000003) * 48271 % 2147483647 % 100"


DSIR_BUCKETS = 64
DSIR_TARGET_SOURCE = "src0"


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, Data Selection via
    Importance Resampling): score every document by how target-like
    its hashed-unigram distribution is.  Features are word unigrams
    hashed to DSIR_BUCKETS buckets (md5-prefix — identical bytes in
    both engines); the target sample is the docs with
    source = 'src0', the raw distribution is the whole corpus.  Per
    bucket, the add-one-smoothed log ratio
    ln((ct+1)/(Tt+B)) - ln((cs+1)/(Ts+B)) is rounded ONCE to integer
    micro-nats (the exact-integer device of hll/ivf: per-doc weights
    are then SUMS OF BIGINTS — order-independent, no cross-engine
    float accumulation), and each doc's weight is the sum of its
    tokens' bucket ratios.

    100 TB shape: the distributions are ONE 64-row aggregation
    (map-side partial to 64 keys), collected driver-side (O(B) — the
    IVF-codebook pattern) and re-emitted as a literal array inside a
    single whole-stage-codegen projection: the per-doc scoring pass
    is ZERO-shuffle (no explode survives — the token walk happens
    inside one `aggregate()` array expression per row)."""
    import math

    d = _load_wide(spark, sf_dir, "documents")
    bucket_sql = (
        "cast(conv(substring(md5(t), 1, 8), 16, 10) as bigint) % "
        f"{DSIR_BUCKETS}"
    )
    toks = d.select(
        "source",
        F.explode(
            F.filter(F.split("text", " "), lambda w: w != "")
        ).alias("t"),
    ).select("source", F.expr(bucket_sql).alias("bucket"))
    counts = (
        toks.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("cs"),
            F.sum(
                F.when(F.col("source") == DSIR_TARGET_SOURCE, 1).otherwise(0)
            ).alias("ct"),
        )
        .collect()
    )  # bounded: exactly DSIR_BUCKETS rows
    ts = sum(r["cs"] for r in counts)
    tt = sum(r["ct"] for r in counts)
    # default for never-observed buckets (ct = cs = 0); no token can
    # reference such a bucket (its token would have counted), so this
    # value never reaches an output row — it only keeps the literal
    # array total
    empty_lr = round(
        (math.log(ts + DSIR_BUCKETS) - math.log(tt + DSIR_BUCKETS))
        * 1_000_000
    )
    lr = [empty_lr] * DSIR_BUCKETS
    for r in counts:
        lr[int(r["bucket"])] = round(
            (
                math.log(r["ct"] + 1)
                - math.log(tt + DSIR_BUCKETS)
                - math.log(r["cs"] + 1)
                + math.log(ts + DSIR_BUCKETS)
            )
            * 1_000_000
        )
    lr_lits = ",".join(f"{int(v)}L" for v in lr)
    score_sql = f"""aggregate(
        filter(split(text, ' '), w -> w != ''),
        0L,
        (acc, t) -> acc + element_at(array({lr_lits}),
                                     cast({bucket_sql} + 1 as int)),
        acc -> acc)"""
    return d.select(
        "doc_id",
        F.size(F.filter(F.split("text", " "), lambda w: w != "")).alias(
            "n_tokens"
        ),
        F.expr(score_sql).alias("dsir_weight_micro"),
    )


def q_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling for a training-data mix
    (the language/source re-weighting stage of LLM pipelines — the
    Pile / Gopher / Llama mixture tables): each language is sampled at
    its target rate by a hash-mod selection on doc_id, and every kept
    doc carries its inverse-propensity weight (100/rate) so downstream
    loss weighting can undo the mix.

    100 TB shape: ONE map-side projection+filter — the rate table is
    dimension-sized and inlined as a CASE (a broadcast join for bigger
    tables), the selection predicate pushes to the scan, no shuffle
    anywhere.  Hash-mod (not rand()) makes the sample reproducible
    across retries/resumes — the property that matters for exactly-
    once training-set construction.  The Lehmer-style hash here keeps
    the DuckDB oracle bit-identical; production would use
    xxhash64(doc_id, seed) with the same modular structure."""
    d = _load_wide(spark, sf_dir, "documents")
    rate = F.expr(_MIX_CASE)
    keep = F.expr(_MIX_HASH) < rate
    return d.filter(keep).select(
        "doc_id",
        "lang",
        F.round(F.lit(100.0) / rate, 4).alias("weight"),
    )


CHUNK_TOKENS = 64   # tokens per retrieval chunk
CHUNK_STRIDE = 48   # chunk start stride (overlap = 64 - 48 = 16)


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking — the doc->chunk expansion a
    retrieval/embedding-index pipeline runs before embedding (RAG
    chunking with a 16-token overlap so no answer span is cut at a
    boundary).  Each doc yields chunks starting every CHUNK_STRIDE
    tokens; a chunk is CHUNK_TOKENS long or whatever remains.  Chunk
    ids are (doc_id, chunk_idx) with the start-token offset — stable
    across runs, so re-embedding is incremental.

    100 TB shape: the whole expansion is ONE generator expression
    (sequence -> transform -> posexplode) inside a projection — no
    shuffle, no Python, no self-join; output size is input size
    x ~(1 + overlap/stride)."""
    d = _load_wide(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    chunks = F.transform(
        F.sequence(
            F.lit(0),
            F.greatest(F.size(toks) - 1, F.lit(0)),
            F.lit(CHUNK_STRIDE),
        ),
        lambda s: F.struct(
            s.alias("tok_start"),
            F.array_join(
                F.slice(toks, s + 1, CHUNK_TOKENS), " "
            ).alias("chunk_text"),
            F.least(F.size(toks) - s, F.lit(CHUNK_TOKENS)).alias(
                "n_chunk_tokens"
            ),
        ),
    )
    return d.select(
        "doc_id", F.posexplode(chunks).alias("chunk_idx", "c")
    ).select(
        "doc_id",
        "chunk_idx",
        F.col("c.tok_start").alias("tok_start"),
        F.col("c.n_chunk_tokens").cast("long").alias("n_chunk_tokens"),
        F.col("c.chunk_text").alias("chunk_text"),
    )


PACK_SEQLEN = 512  # tokens per packed training sequence
PACK_SHARDS = 8    # deterministic doc->shard map (see docstring)
_PACK_SHARD = f"(doc_id % 1000003) * 48271 % 2147483647 % {PACK_SHARDS}"


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing — the step that turns a doc
    corpus into fixed-length training sequences (GPT-style: concatenate
    the token stream per shard, cut every PACK_SEQLEN tokens).  Each
    doc gets its (shard, seq_id, seq_offset) placement plus a
    crosses_boundary flag (docs a packer might re-place or truncate).

    Determinism contract: shard = Lehmer hash-mod of doc_id (same
    family as q_training_mix — reproducible across retries/engines),
    order within a shard = doc_id.  Placement is a prefix sum over
    that order, so the full layout is a pure function of the corpus —
    the property exactly-once training-set construction needs.

    100 TB shape: ONE hash-partitioned window per shard (shuffle on
    the 8-byte shard key, then a per-shard sort — the unavoidable cost
    of deterministic packing; at production scale PACK_SHARDS is set
    ~= task parallelism, e.g. 10k, so each shard sorts ~10 GB locally
    and skew is bounded by the hash).  No join, no second shuffle;
    token counting is a JVM projection."""
    from pyspark.sql.window import Window

    d = _load_wide(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.expr(_PACK_SHARD).alias("shard"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = t.withColumn(
        "cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    return c.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.floor(F.col("cum_before") / PACK_SEQLEN).alias("seq_id"),
        (F.col("cum_before") % PACK_SEQLEN).alias("seq_offset"),
        (
            (F.col("cum_before") % PACK_SEQLEN) + F.col("n_tokens")
            > PACK_SEQLEN
        ).cast("int").alias("crosses_boundary"),
    )


def q_corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus profiling — the distribution dashboard a
    curation run is steered by (how long are docs per source, where do
    the outliers start): doc counts, token sums, mean and exact
    p50/p90/p99 of n_chars per source.

    Engine parity: Spark's `percentile` and DuckDB's `quantile_cont`
    both use linear interpolation on the sorted values — verified
    identical at 6 dp on this data before wiring.  Scale note: EXACT
    percentile buffers each group's values (fine here and for any
    bounded-cardinality profiling axis); at 100 TB over huge groups
    production swaps in approx_percentile (t-digest sketch, mergeable
    map-side) — same query shape, sketch instead of buffer."""
    d = _load_wide(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).alias("n_tokens"),
        F.round(F.avg("n_chars"), 4).alias("mean_chars"),
        F.round(F.expr("percentile(n_chars, 0.5)"), 4).alias("p50_chars"),
        F.round(F.expr("percentile(n_chars, 0.9)"), 4).alias("p90_chars"),
        F.round(F.expr("percentile(n_chars, 0.99)"), 4).alias("p99_chars"),
    )


DOMAIN_CAP_N = 15  # max docs kept per source (< the fixture's
#   25 docs/source, so both kept and capped classes occur in the gate)


def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain contribution capping — the CommonCrawl-curation rule
    that no single source may dominate the training mix: keep at most
    DOMAIN_CAP_N docs per source, chosen by a DETERMINISTIC hash order
    (Lehmer hash of doc_id, doc_id as tiebreak) so the kept set is a
    pure function of the corpus — reproducible across retries, unlike
    a rand() sample, and unbiased w.r.t. doc_id order, unlike a plain
    LIMIT.  Output marks every doc kept/capped with its rank.

    100 TB shape: one hash exchange on source + a per-source window.
    Source cardinality is domain-count-sized (millions), so the key is
    well distributed; a pathological mega-domain is bounded by the cap
    itself downstream and by AQE skew-split during the sort."""
    from pyspark.sql.window import Window

    d = _load_wide(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.expr("(doc_id % 1000003) * 48271 % 2147483647"), "doc_id"
    )
    return d.select(
        "doc_id", "source", F.row_number().over(w).alias("rank")
    ).select(
        "doc_id",
        "source",
        "rank",
        F.when(F.col("rank") <= DOMAIN_CAP_N, 1).otherwise(0)
        .cast("int").alias("kept"),
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon-vote language-ID heuristic (stopword-profile matching):
    count matches against two token lexicons, classify by majority."""
    d = _load_wide(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    common = F.size(F.filter(toks, lambda t: t.isin("the", "a", "and", "of", "to")))
    tech = F.size(
        F.filter(toks, lambda t: t.isin("spark", "join", "hash", "query", "table"))
    )
    return d.select(
        "doc_id",
        common.alias("n_common"),
        tech.alias("n_tech"),
        F.when(common >= tech, F.lit("common")).otherwise(F.lit("tech")).alias("lang_guess"),
    )


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting by rolling-hash WINNOWING (the MOSS
    scheme): polynomial Rabin-Karp hash of every 7-gram (base 257 mod
    2^31-1 — at scale computed incrementally per char, here as a
    vectorized JVM expression), minimum over each window of 8
    consecutive gram hashes, distinct minima = the document's
    fingerprints; fingerprints shared by >1 doc are near-dup/plagiarism
    candidates.  The whole winnow (gram hashes -> window minima ->
    distinct) happens INSIDE one array expression, so the only shuffle
    in the plan is the final groupBy on the fingerprint — no per-doc
    window sort, no all-pairs."""
    k, w, B, P = 7, 8, 257, 2147483647
    d = _load_wide(spark, sf_dir, "documents")
    gram_hashes = (
        f"transform(sequence(1, length(text) - {k - 1}), i -> "
        f"aggregate(transform(sequence(0, {k - 1}), "
        f"j -> ascii(substring(text, i + j, 1))), "
        f"0L, (acc, x) -> (acc * {B} + x) % {P}))"
    )
    # bind the gram-hash array to a column FIRST: referenced inside the
    # winnow lambda it would otherwise be recomputed per window position
    hs = d.select(
        "doc_id",
        F.expr(
            f"CASE WHEN length(text) >= {k} THEN {gram_hashes} "
            f"ELSE CAST(array() AS array<bigint>) END"
        ).alias("hs"),
    )
    fps_arr = (
        f"CASE WHEN size(hs) >= {w} THEN "
        f"array_distinct(transform(sequence(1, size(hs) - {w - 1}), "
        f"p -> array_min(slice(hs, p, {w})))) "
        f"ELSE CAST(array() AS array<bigint>) END"
    )
    fps = hs.select("doc_id", F.explode(F.expr(fps_arr)).alias("fp"))
    return (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("first_doc_id"))
        .filter(F.col("n_docs") > 1)
    )


def q_lang_id_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-n-gram-profile language ID (the Cavnar-Trenkle shape, as a
    generative bigram scorer): per-language bigram profiles are
    aggregated from the corpus (one shuffle over (lang, bigram)),
    every document is scored under every language with Laplace
    smoothing, and argmax classifies.  Output is the (actual,
    predicted) confusion matrix.  NOTE on the synthetic corpus: all
    lang labels share one English-ish vocabulary, so the extractable
    signal is only word-frequency drift (~0.36 accuracy vs 0.2
    chance); on real multilingual text the same plan separates
    languages by orders of magnitude.  The profile table is dimension-sized
    -> broadcast joins; doc scoring is a map-side explode + two
    broadcast lookups + one aggregation."""
    from pyspark.sql.window import Window

    d = _load_wide(spark, sf_dir, "documents")
    bi = d.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, length(text) - 1), i -> substring(text, i, 2))"
            )
        ).alias("bigram"),
    )
    profile = bi.groupBy(F.col("lang").alias("cand_lang"), "bigram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    totals = bi.groupBy(F.col("lang").alias("cand_lang")).agg(
        F.count(F.lit(1)).alias("tot")
    )
    vocab = bi.select(F.countDistinct("bigram").alias("v"))
    langs = bi.select(F.col("lang").alias("cand_lang")).distinct()
    # pre-aggregate per-doc bigram multiplicities BEFORE the x|langs|
    # blowup: the cross join then multiplies the compact (doc, bigram)
    # table, not the raw position stream
    doc_bi = bi.groupBy("doc_id", "lang", "bigram").agg(
        F.count(F.lit(1)).alias("n")
    )
    scored = (
        doc_bi.crossJoin(F.broadcast(langs))
        .join(F.broadcast(profile), ["cand_lang", "bigram"], "left")
        .join(F.broadcast(totals), "cand_lang")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "logp",
            F.col("n")
            * F.log((F.coalesce(F.col("cnt"), F.lit(0)) + 1) / (F.col("tot") + F.col("v"))),
        )
        .groupBy("doc_id", "lang", "cand_lang")
        .agg(F.round(F.sum("logp"), 6).alias("score"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("cand_lang"))
    pred = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", F.col("cand_lang").alias("pred_lang"))
    )
    return pred.groupBy("lang", "pred_lang").agg(F.count(F.lit(1)).alias("n_docs"))


def q_em_font_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One distributed EM E-step (decode + count accumulation via RDD
    treeAggregate, SURVEY §2.4 A3) over a fixed fixture slice; returns
    the per-character template width-count table (deterministic)."""
    import pandas as pd

    from ocular_spark.em import run_estep

    docs_df, media_df, bundle_bc, char_strs = _pipeline_frames(spark, sf_dir)
    pages = (
        docs_df.select("doc_id", F.explode("spans").alias("span"))
        .filter(F.col("span.kind") == "media")
        .select("doc_id", F.col("span.media_ref").alias("media_ref"))
        .join(media_df, "media_ref")
        .select("doc_id", "media_ref", "lines")
    )
    bundle = bundle_bc.value
    counts = run_estep(spark, pages, bundle_bc, char_strs, bundle.lm.get_max_order())
    rows = [
        {"char": char_strs[c], "template_width": int(w), "count": float(n)}
        for c, wd in sorted(counts.width.items())
        for w, n in sorted(wd.items())
    ]
    return spark.createDataFrame(pd.DataFrame(rows))


def q_train_font_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One FULL distributed EM training iteration under the driver
    gate (O15 loop + A4/A5 M-step; train/FontTrainer.java:137-269):
    Spark E-step (page-salted decode -> treeAggregate count merge) ->
    driver M-step (width-gaussian refit + LBFGS template refit) ->
    the retrained font summarized as (char, width, width_lp, tw_sum).
    The golden is frozen from an in-process SERIAL train step
    (tools/freeze_goldens.py): the E-step counts are exact integers,
    so the distributed treeAggregate merge must reproduce the serial
    accumulation bit-for-bit, and the (driver-side, deterministic)
    M-step then yields identical floats."""
    import pandas as pd

    from ocular_spark.em import train_font
    from ocular_spark.font import Font

    docs_df, media_df, bundle_bc, char_strs = _pipeline_frames(spark, sf_dir)
    pages = (
        docs_df.select("doc_id", F.explode("spans").alias("span"))
        .filter(F.col("span.kind") == "media")
        .select("doc_id", F.col("span.media_ref").alias("media_ref"))
        .join(media_df, "media_ref")
        .select("doc_id", "media_ref", "lines")
    )
    bundle = bundle_bc.value
    font = Font.from_bytes(bundle.font_bytes)
    trained, _lm, _gsm, _hist = train_font(
        spark, pages, font, bundle.lm, char_strs,
        num_em_iters=1, beam_size=bundle.beam_size,
    )
    return spark.createDataFrame(
        pd.DataFrame(font_summary_rows(trained, char_strs))
    )


def font_summary_rows(font, char_strs) -> list:
    """(char, width, width_lp, tw_sum) rows pinning both halves of the
    font M-step: the width-gaussian refit (width_lp per allowed width)
    and the LBFGS template refit (tw_sum = template-weight sum)."""
    rows = []
    for c in char_strs:
        t = font.get(c)
        tw_sum = (
            0.0
            if t.is_space  # space has no template image, only widths
            else round(float(t.template_weights.astype("float64").sum()), 3)
        )
        for w in t.allowed_widths():
            rows.append(
                {
                    "char": c,
                    "width": int(w),
                    "width_lp": round(float(t.width_log_prob(w)), 6),
                    "tw_sum": tw_sum,
                }
            )
    return rows


def q_train_font_step_cs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One FULL distributed EM training iteration of the MULTILINGUAL
    stack under the driver gate (O15 + A4/A5/A6/A7;
    train/FontTrainer.java:137-269 with GSM + code-switch LM enabled,
    as wired by main/FonttrainTranscribeShared.java:255-304): Spark
    E-step over bilingual code-switch pages (font + per-language LM
    n-gram + GSM Viterbi counts accumulated in ONE pass, merged via
    treeAggregate) -> THREE driver M-steps (width/template refit,
    per-language Kneser-Ney re-interpolation with priors from decoded
    chars, GSM factory make with smoothing prior).  Summarized as
    (section, lang, key, value) rows: the retrained font's width
    log-probs + template-weight sums, the re-estimated language
    priors, a probe grid of re-estimated per-language bigram
    log-probs, and each language's argmax glyph + log-prob per LM
    char under the re-estimated GSM.  Golden frozen from an
    in-process SERIAL loop (tools/freeze_goldens.py): all E-step
    counts are exact integers, so the distributed merge must match
    bit-for-bit and the deterministic M-steps yield identical
    floats."""
    import pandas as pd
    import pyarrow.parquet as pq

    from ocular_spark.cstransition import CodeSwitchTransitionModel
    from ocular_spark.em import train_font
    from ocular_spark.fixtures import build_models_cs, derive_docs_and_media_cs
    from ocular_spark.font import Font
    from ocular_spark.gsm import BasicGlyphSubstitutionModelFactory
    from ocular_spark.pipeline import DOCS_DDL

    documents = pq.read_table(os.path.join(sf_dir, "documents.parquet")).to_pandas()
    docs, media = derive_docs_and_media_cs(documents, n_docs=3)
    bundle, char_strs = build_models_cs(documents)
    cslm = bundle.lm
    ci = cslm.get_character_indexer()
    actives = [cslm.get(k).get_active_characters() for k in range(2)]
    gsm_factory = BasicGlyphSubstitutionModelFactory(
        1.0, 100.0, list(cslm.lang_names), ci, actives, gsm_power=1.0
    )
    docs_df = spark.createDataFrame(docs, schema=DOCS_DDL)
    media_df = spark.createDataFrame(media[["media_ref", "n_lines", "lines"]])
    pages = (
        docs_df.select("doc_id", F.explode("spans").alias("span"))
        .filter(F.col("span.kind") == "media")
        .select("doc_id", F.col("span.media_ref").alias("media_ref"))
        .join(media_df, "media_ref")
        .select("doc_id", "media_ref", "lines")
    )

    def tm_factory(lm, gsm):
        # same wiring as the fixture's serving tm (build_models_cs)
        return CodeSwitchTransitionModel(
            lm, True, gsm, allow_glyph_substitution=True, no_char_sub_prior=0.9
        )

    font = Font.from_bytes(bundle.font_bytes)
    trained_font, trained_lm, trained_gsm, _hist = train_font(
        spark, pages, font, cslm, char_strs,
        num_em_iters=1, beam_size=bundle.beam_size,
        reestimate_lm_too=True,
        tm_factory=tm_factory,
        gsm_factory=gsm_factory,
        gsm=gsm_factory.uniform(),
    )
    return spark.createDataFrame(
        pd.DataFrame(
            cs_train_summary_rows(trained_font, trained_lm, trained_gsm, char_strs)
        )
    )


def cs_train_summary_rows(font, cslm, gsm, char_strs) -> list:
    """(section, lang, key, value) rows pinning all three M-steps of a
    code-switch training iteration: font_wlp/font_tw (width-gaussian +
    LBFGS template refits), lang_prior (decoded-chars+1 priors),
    lm_bigram (probe grid of re-estimated per-language KN bigram
    log-probs over the 8 lowest-index active chars), and
    gsm_glyph/gsm_logp (argmax glyph index + log-prob per LM char
    under the re-estimated GSM)."""
    import math

    import numpy as np

    rows = []
    seen_tw = set()
    for r in font_summary_rows(font, char_strs):
        rows.append({
            "section": "font_wlp", "lang": "",
            "key": "%s|%02d" % (r["char"], r["width"]),
            "value": r["width_lp"],
        })
        if r["char"] not in seen_tw:
            seen_tw.add(r["char"])
            rows.append({
                "section": "font_tw", "lang": "",
                "key": r["char"], "value": r["tw_sum"],
            })
    for k in range(cslm.num_languages()):
        lang = cslm.lang_names[k]
        rows.append({
            "section": "lang_prior", "lang": lang, "key": "",
            "value": round(float(cslm.language_prior(k)), 6),
        })
        sub = cslm.get(k)
        active = sorted(sub.get_active_characters())
        for a in active[:8]:
            for b in active[:8]:
                p = max(float(sub.get_char_ngram_prob([a], b)), 1e-300)
                rows.append({
                    "section": "lm_bigram", "lang": lang,
                    "key": "%s|%s" % (char_strs[a], char_strs[b]),
                    "value": round(math.log(p), 6),
                })
        if gsm is not None:
            for c in active:
                g = int(np.argmax(gsm.probs[k, c]))
                lp = math.log(max(float(gsm.probs[k, c, g]), 1e-300))
                rows.append({
                    "section": "gsm_glyph", "lang": lang,
                    "key": char_strs[c], "value": float(g),
                })
                rows.append({
                    "section": "gsm_logp", "lang": lang,
                    "key": char_strs[c], "value": round(lp, 6),
                })
    return rows


def q_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document LM perplexity (O20) of the documents text under the
    fixture char-LM.  The broadcast carries only the DENSE scoring
    tables (log P(c|ctx) matrix + per-order context-code indexes,
    plain NumPy — built once on the driver); the kernel is fully
    vectorized (strided window codes + searchsorted + gather), no
    per-character Python and no KN recursion at scoring time."""
    import pyarrow.parquet as pq

    from ocular_spark.fixtures import build_models
    from ocular_spark.lm import DensePplTables

    documents_path = os.path.join(sf_dir, "documents.parquet")
    bundle, char_strs = build_models(
        pq.read_table(documents_path).to_pandas()
    )
    tables_bc = spark.sparkContext.broadcast(DensePplTables(bundle.transition_model))
    d = _load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)

    def ppl_kernel(batches):
        import numpy as np
        import pandas as pd

        tables = tables_bc.value
        for pdf in batches:
            n_chars, ppl = tables.score_batch([str(t) for t in pdf["text"]])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_scored": n_chars.astype("int32"),
                    "perplexity": np.round(ppl, 4),
                }
            )

    return d.select("doc_id", "text").mapInPandas(
        ppl_kernel, schema="doc_id long, n_scored int, perplexity double"
    )


def q_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020, CCNet
    §3.3): per-language head/middle/tail terciles over the per-doc LM
    perplexities of q_lm_perplexity — the standard quality gate that
    keeps the 'head' bucket for LM training.  Ranking is total
    ((perplexity rounded to 4 dp by the scorer, doc_id) within lang),
    so the NTILE assignment is deterministic cross-engine.

    Oracle: derived from the frozen lm_perplexity golden (same NTILE
    over the same VALUES) joined to documents for lang — routed to the
    sf0.01 golden gate via GOLDEN_DERIVED.

    100 TB shape: the scorer is the broadcast dense-table kernel (see
    q_lm_perplexity); bucketing adds one window partitioned by lang —
    a per-language shuffle whose skew matches the corpus language mix
    (salt-by-range if one language dominates; at CCNet scale the
    published recipe shards per language first, which this partition
    key reproduces)."""
    from pyspark.sql import Window

    ppl = q_lm_perplexity(spark, sf_dir)
    langs = _load(spark, sf_dir, "documents").select("doc_id", "lang")
    j = ppl.join(langs, "doc_id")
    w = Window.partitionBy("lang").orderBy(
        F.col("perplexity").asc(), F.col("doc_id").asc()
    )
    return j.select(
        "doc_id",
        "lang",
        "perplexity",
        F.ntile(3).over(w).alias("bucket"),
        (F.ntile(3).over(w) == 1).alias("keep_head"),
    )


def q_orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation (grouping sets) over order priority/status."""
    o = _load(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


def q_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events props column + aggregation."""
    e = _load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
    )


def q_token_doc_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document frequency per token (IDF-style corpus statistic):
    distinct tokens per doc -> count docs per token, top by df."""
    d = _load_wide(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.desc("df"), F.asc("token"))
        .limit(20)
    )


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF terms — the keyword/topic-signal
    extraction step of corpus curation (and the classic relevance
    score): tf = in-doc term count, idf = ln((N+1)/(df+1)) + 1
    (smoothed, sklearn form), per-doc top-3 by (score desc, token asc
    — a total order, so the cut is deterministic in both engines).

    100 TB shape: tf is a (doc_id, token) groupBy with map-side
    partial agg; df reuses the same exploded pass; the zipfian token
    skew lands on the df agg where partial aggregation absorbs it
    (the hot token's partials are one row per task).  N is a
    metadata-level scalar (driver count), not a cross join.  The
    per-doc top-k window partitions on doc_id — the natural,
    well-distributed key."""
    from pyspark.sql.window import Window

    d = _load_wide(spark, sf_dir, "documents")
    n_docs = d.count()
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).alias("tf")
    )
    df = (
        toks.select("doc_id", "token")
        .distinct()
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    scored = tf.join(df, "token").select(
        "doc_id",
        "token",
        "tf",
        F.round(
            F.col("tf")
            * (
                F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df") + 1.0))
                + 1.0
            ),
            6,
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("token")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "rank", "token", "tf", "tfidf")
    )


BM25_K1, BM25_B = 1.2, 0.75
BM25_QUERY = ("spark", "table", "row")  # fixture-vocabulary terms


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval over the corpus — the scoring consumer of
    q_inverted_index's statistics (Robertson/Sparck Jones BM25 with
    k1=1.2, b=0.75, the Lucene-default IDF form ln(1+(N-df+0.5)/
    (df+0.5))): score the 3-term query against every document, return
    the top 20 by (rounded score desc, doc_id asc) — a total order,
    so the cut is deterministic in both engines (tfidf_top_terms
    convention; scores rounded to 6 dp before ranking).

    100 TB shape: the query-term filter prunes the exploded token
    stream BEFORE any aggregation (only matching postings shuffle);
    df and avgdl/N are metadata-scale (driver scalars / broadcast);
    the final top-k is a single global sort of doc-count-bounded
    scored rows — at retrieval scale this is takeOrdered, not a full
    sort (Spark's sortBy+limit compiles to TakeOrderedAndProject)."""
    d = _load_wide(spark, sf_dir, "documents")
    stats = d.select(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.size(F.filter(F.split("text", " "), lambda w: w != "")))
        .alias("avgdl"),
    ).collect()[0]
    n_docs, avgdl = float(stats["n"]), float(stats["avgdl"])
    toks = d.select(
        "doc_id",
        F.size(F.filter(F.split("text", " "), lambda w: w != ""))
        .alias("dl"),
        F.explode(F.split("text", " ")).alias("token"),
    ).filter(F.col("token").isin(*BM25_QUERY))
    tf = toks.groupBy("doc_id", "token", "dl").agg(
        F.count(F.lit(1)).alias("tf")
    )
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(F.broadcast(df), "token").select(
        "doc_id",
        "token",
        (
            F.log(
                1.0
                + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5)
            )
            * (F.col("tf") * (BM25_K1 + 1.0))
            / (
                F.col("tf")
                + BM25_K1
                * (1.0 - BM25_B + BM25_B * F.col("dl") / F.lit(avgdl))
            )
        ).alias("s"),
    )
    # one conditional sum per query term, added in FIXED order: a
    # plain SUM over doubles is accumulation-order-dependent in the
    # last ulp, which can straddle the 6-dp rounding boundary between
    # engines/runs — per-term partial sums have at most one row each,
    # so the addition order below is the only order
    per_term = [
        F.coalesce(
            F.sum(F.when(F.col("token") == t, F.col("s"))), F.lit(0.0)
        ).alias(f"s{i}")
        for i, t in enumerate(BM25_QUERY)
    ]
    agg = scored.groupBy("doc_id").agg(
        *per_term, F.count(F.lit(1)).alias("n_terms_hit")
    )
    score = F.round(
        sum((F.col(f"s{i}") for i in range(1, len(BM25_QUERY))),
            F.col("s0")),
        6,
    )
    out = agg.select("doc_id", score.alias("score"), "n_terms_hit")
    return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(20)


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash document fingerprint: per-token md5 -> bit votes
    -> majority per bit -> packed fingerprint; duplicate-fingerprint
    buckets are near-dup candidates."""
    d = _load_wide(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).withColumn("h", F.conv(F.substring(F.md5("token"), 1, 4), 16, 10).cast("long"))
    bits = toks.select(
        "doc_id", "h", F.explode(F.expr("sequence(0, 15)")).alias("b")
    ).withColumn(
        "vote",
        F.expr("CASE WHEN (shiftright(h, b) & 1) = 1 THEN 1 ELSE -1 END"),
    )
    votes = bits.groupBy("doc_id", "b").agg(F.sum("vote").alias("v"))
    fingerprints = votes.withColumn(
        "bitval", F.expr("CASE WHEN v > 0 THEN shiftleft(CAST(1 AS BIGINT), b) ELSE 0 END")
    ).groupBy("doc_id").agg(F.sum("bitval").alias("simhash"))
    return (
        fingerprints.groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("first_doc_id"))
        .filter(F.col("n_docs") > 1)
    )


def _simhash48(d: DataFrame) -> DataFrame:
    """48-bit SimHash fingerprints (doc_id, fp).  Wider than q_simhash's
    16-bit demo on purpose: the Hamming join below keys on 12-bit
    blocks, and block-key cardinality (4096 per block position) is
    what keeps the candidate self-join's per-key groups small at
    corpus scale — 4-bit blocks would collapse to 16 join keys and
    quadratic buckets.  h = conv of 12 md5 hex chars < 2^48: exact in
    BIGINT and replayable bit-for-bit by the DuckDB oracle."""
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).withColumn(
        "h", F.conv(F.substring(F.md5("token"), 1, 12), 16, 10).cast("long")
    )
    votes = (
        toks.select(
            "doc_id", "h", F.explode(F.expr("sequence(0, 47)")).alias("b")
        )
        .withColumn(
            "vote",
            F.expr("CASE WHEN (shiftright(h, b) & 1) = 1 THEN 1 ELSE -1 END"),
        )
        .groupBy("doc_id", "b")
        .agg(F.sum("vote").alias("v"))
    )
    return votes.groupBy("doc_id").agg(
        F.sum(
            F.expr(
                "CASE WHEN v > 0 THEN shiftleft(CAST(1 AS BIGINT), b)"
                " ELSE CAST(0 AS BIGINT) END"
            )
        ).alias("fp")
    )


def q_simhash_hamming_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All document pairs within SimHash Hamming distance <= 3 WITHOUT
    an all-pairs comparison — the block-permutation (pigeonhole)
    candidate scheme of Manku, Jain & Das Sarma (WWW 2007): split the
    48-bit fingerprint into 4 blocks of 12 bits; any pair differing in
    <= 3 bits differs in at most 3 blocks, so it agrees EXACTLY on at
    least one block.  Candidates = equi-self-join on (block position,
    block value) — a hash join Catalyst shuffles on a 14-bit composite
    key; verify = bit_count(fp_a ^ fp_b) on the candidates only.
    Complements `simhash` (exact-fingerprint buckets = distance 0):
    this surfaces the distance 1..3 near-misses a single-bucket
    groupBy cannot see.  At 100 TB the known hot spot is a popular
    block value (e.g. boilerplate-heavy shards voting the same bits):
    per-key candidate cost is O(n_key^2), handled in production by
    per-key caps or an extra block split (k=3 -> 6 blocks of 8),
    both order-preserving under the same pigeonhole argument.
    Completeness (candidates ⊇ every true <=3 pair) and the prune
    ratio are pinned by tests/test_simhash_join.py."""
    fp = _simhash48(_load_wide(spark, sf_dir, "documents"))
    blocks = fp.select(
        "doc_id", "fp", F.explode(F.expr("sequence(0, 3)")).alias("j")
    ).withColumn("key", F.expr("shiftright(fp, 12 * j) & 4095"))
    a = blocks.select(
        F.col("doc_id").alias("doc_a"), F.col("fp").alias("fp_a"), "j", "key"
    )
    b = blocks.select(
        F.col("doc_id").alias("doc_b"), F.col("fp").alias("fp_b"), "j", "key"
    )
    cand = (
        a.join(b, ["j", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "fp_a", "fp_b")
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.expr("CAST(bit_count(fp_a ^ fp_b) AS INT)")
        )
        .filter(F.col("hamming") <= 3)
        .select("doc_a", "doc_b", "hamming")
    )


# Count-Min sketch geometry: small enough that the synthetic corpus's
# ~900 distinct bigrams actually collide (the sketch's error term is
# the thing under test), deep enough that the min across rows recovers
# most of it.  At 100 TB the sketch stays EXACTLY this size — that is
# the point of the structure.
CMS_D = 4
CMS_W = 64


def _cms_idx_array(item_col: str) -> str:
    """D register indexes per item as one array expression from ONE
    md5 per item (not D): the 52-bit conv value's disjoint 6-bit
    fields index the D rows — md5 bits are independent, and hashing
    once per occurrence is the difference between 1x and Dx hash cost
    on the corpus-sized stream.  Same bytes in Spark and DuckDB, so
    the oracle replays register-for-register."""
    h = (
        f"cast(conv(substring(md5({item_col}), 1, 13), 16, 10) as bigint)"
    )
    cells = ", ".join(
        f"(h div {CMS_W ** j}) % {CMS_W}" for j in range(CMS_D)
    )
    # two-step: bind h once as a named column (projection-level CSE is
    # not guaranteed in interpreted mode), then slice its bit fields
    return h, f"array({cells})"


def q_count_min_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter word bigrams via a HAND-ROLLED Count-Min sketch
    (Cormode & Muthukrishnan 2005) — the mergeable frequency structure
    a 100 TB profiler uses where exact per-item counts are too many to
    keep.  Build: every occurrence increments D=4 registers (one tiny
    (j, idx) shuffle onto a fixed 4x64 table — map-side partial agg
    absorbs the corpus; register count is INDEPENDENT of data size).
    Probe: est(item) = min_j sketch[j][h_j(item)], a broadcast join of
    the 256-row sketch onto the candidate set.  Top-20 by (est DESC,
    item ASC) — a deterministic total order, so both engines cut the
    same boundary.  n_exact is the verification column the sketch
    exists to avoid; the CMS guarantee est >= n_exact is pinned by
    tests/test_sketch_join.py.  Candidates here are the distinct items
    (bounded at test scale); at 100 TB candidates come from a
    per-partition Misra-Gries pre-pass, the standard companion.

    Exactness devices (HLL lessons reused): hash = conv of 13 md5 hex
    chars (< 2^52, BIGINT-exact both engines); counts are BIGINTs; the
    only comparison is on integers."""
    d = _load_wide(spark, sf_dir, "documents").select(
        F.split("text", " ").alias("ts")
    )
    items = d.select(
        F.explode(
            F.expr(
                "CASE WHEN size(ts) >= 2 THEN transform(sequence(1, size(ts) - 1),"
                " i -> concat(element_at(ts, i), ' ', element_at(ts, i + 1)))"
                " ELSE array() END"
            )
        ).alias("item")
    )
    h_expr, idx_arr = _cms_idx_array("item")
    upd = items.select(F.expr(h_expr).alias("h")).select(
        F.posexplode(F.expr(idx_arr)).alias("j", "idx")
    )
    sketch = upd.groupBy("j", "idx").agg(F.count(F.lit(1)).alias("c"))
    cand = items.groupBy("item").agg(F.count(F.lit(1)).alias("n_exact"))
    probes = cand.select(
        "item", "n_exact", F.expr(h_expr).alias("h")
    ).select("item", "n_exact", F.posexplode(F.expr(idx_arr)).alias("j", "idx"))
    est = (
        probes.join(F.broadcast(sketch), ["j", "idx"])
        .groupBy("item", "n_exact")
        .agg(F.min("c").alias("est"))
    )
    return (
        est.orderBy(F.desc("est"), F.asc("item"))
        .limit(20)
        .select(
            "item",
            F.col("est").cast("long").alias("est"),
            F.col("n_exact").cast("long").alias("n_exact"),
        )
    )


# Interval-join geometry: 200 hourly-anchored maintenance windows of
# 90 min over the event stream — width > stride, so boundary events
# match TWO intervals and the join is genuinely one-to-many.
IVJ_N = 200
IVJ_STRIDE_US = 3_600_000_000
IVJ_WIDTH_US = 5_400_000_000
IVJ_BIN_US = 1_800_000_000


def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval-overlap) join — the operator Spark has no
    native physical strategy for (a naive t BETWEEN lo AND hi join
    plans as BroadcastNestedLoop = all-pairs).  The scale pattern is
    BINNING: explode each interval to the fixed-width buckets it
    covers, bucket each event once, equi-join on the bucket, and
    re-check the exact predicate.  Cost: |intervals| x (width/bin + 1)
    expansion on the SMALL side, one hash join on the big side, zero
    cross product.  Here the exploded interval table (200 x 4 rows) is
    broadcast, so the event stream never shuffles at all — the only
    exchange is the final per-interval aggregate.  At 100 TB the same
    plan holds whenever intervals fit a broadcast (calendars, outage
    windows, campaigns); otherwise the equi-join shuffles on the
    bucket key, still never a cross product.

    The interval table is synthesized deterministically from the
    stream's own min timestamp (one O(1) scalar agg) so both engines
    construct identical windows; time is compared as exact integer
    MICROSECOND OFFSETS from that anchor (timestampdiff / DATE_DIFF —
    the events column is TIMESTAMP_NTZ, so epoch conversions would
    drag in a session timezone; offsets never do), closed on both
    ends."""
    raw = _load(spark, sf_dir, "events")
    anchor = raw.agg(F.min("ts")).collect()[0][0]
    a_lit = anchor.strftime("%Y-%m-%d %H:%M:%S.%f")
    ev = raw.select(
        "event_id",
        "user_id",
        "value",
        F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '{a_lit}', ts)"
        ).alias("us"),
    )
    iv = spark.range(IVJ_N).select(
        F.col("id").alias("interval_id"),
        (F.col("id") * IVJ_STRIDE_US).alias("lo"),
        (F.col("id") * IVJ_STRIDE_US + IVJ_WIDTH_US).alias("hi"),
    )
    exploded = iv.select(
        "interval_id",
        "lo",
        "hi",
        F.explode(
            F.expr(f"sequence(lo div {IVJ_BIN_US}, hi div {IVJ_BIN_US})")
        ).alias("b"),
    )
    joined = (
        ev.withColumn("b", F.expr(f"us div {IVJ_BIN_US}"))
        .join(F.broadcast(exploded), "b")
        .filter((F.col("us") >= F.col("lo")) & (F.col("us") <= F.col("hi")))
    )
    return joined.groupBy("interval_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


# Set-similarity join threshold 3/5: kept as an exact integer ratio so
# every filter is integer cross-multiplication (5*min >= 3*max), never
# a float boundary.
SSJ_T_NUM = 3
SSJ_T_DEN = 5


def q_similarity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact set-similarity self-join by PREFIX FILTERING (AllPairs /
    PPJoin family, Bayardo et al. 2007; Xiao et al. 2008) — the
    candidate generator that, unlike MinHash LSH (`ngram_jaccard`), is
    EXACT: no false negatives by construction, so the verify step is
    the only filter.  Same similarity definition as ngram_jaccard
    (word-trigram shingle Jaccard) — two genuinely different
    algorithms over one spec.

    Scale shape (the ngram_jaccard single-pass lessons applied):
    (1) shingles are HASHED to int64 inside the array expression —
    the strings never leave the projection, never shuffle; the per-doc
    hash-set column is persisted once and feeds candidate generation
    AND both verify sides (one corpus scan, not three); (2) one agg
    for global shingle document frequency; (3) each doc's shingles
    sorted rarest-first by (df, hash), and only the first
    |x| - ceil(t|x|) + 1 (the RAREST) explode as 8-byte join keys, so
    the self-join fan-out is bounded by the df of rare shingles, not
    corpus size — the all-pairs blowup LSH dodges probabilistically is
    dodged combinatorially (a hash collision can only ADD a candidate,
    never lose one — verification decides); (4) integer length filter
    5*min >= 3*max prunes before verification; (5) verify =
    array_intersect on the two int64 hash sets (same set identity as
    ngram_jaccard, mirrored by the oracle).  Prefix length uses the
    integer identity ceil(3n/5) = (3n+4) div 5."""
    global _SIMJOIN_BASE_PREV
    if _SIMJOIN_BASE_PREV is not None:  # previous call's cache, now idle
        _SIMJOIN_BASE_PREV.unpersist(blocking=False)
    d = _load_wide(spark, sf_dir, "documents").filter(
        F.size(F.split("text", " ")) >= 3
    )
    base = (
        d.select(
            "doc_id",
            F.expr(
                f"array_distinct(transform({WORD_TRIGRAMS},"
                f" s -> cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint)"
                f" % {MINHASH_P}))"
            ).alias("hs"),
        )
        .withColumn("n", F.size("hs"))
        .persist()
    )
    _SIMJOIN_BASE_PREV = base
    ex = base.select("doc_id", "n", F.explode("hs").alias("sid"))
    df_tbl = ex.groupBy("sid").agg(F.count(F.lit(1)).alias("df"))
    ordered = (
        ex.join(F.broadcast(df_tbl), "sid")
        .groupBy("doc_id", "n")
        .agg(F.expr("sort_array(collect_list(struct(df, sid)))").alias("arr"))
    )
    pref = ordered.select(
        "doc_id",
        "n",
        F.explode(
            F.expr(
                f"slice(arr, 1, cast(n - ((({SSJ_T_NUM} * n) + {SSJ_T_DEN} - 1)"
                f" div {SSJ_T_DEN}) + 1 as int))"
            )
        ).alias("p"),
    ).select("doc_id", "n", F.col("p.sid").alias("sid"))
    a = pref.alias("a")
    b = pref.alias("b")
    cand = (
        a.join(b, F.col("a.sid") == F.col("b.sid"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .filter(
            SSJ_T_DEN * F.least(F.col("a.n"), F.col("b.n"))
            >= SSJ_T_NUM * F.greatest(F.col("a.n"), F.col("b.n"))
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sa = base.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("hs_a"))
    sb = base.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("hs_b"))
    verified = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.expr("size(array_intersect(hs_a, hs_b))").alias("n_inter"),
            F.expr(
                "size(hs_a) + size(hs_b) - size(array_intersect(hs_a, hs_b))"
            ).alias("n_union"),
        )
        .filter(
            F.col("n_inter") * SSJ_T_DEN >= F.col("n_union") * SSJ_T_NUM
        )
    )
    return verified.select(
        "doc_a",
        "doc_b",
        F.col("n_inter").cast("long").alias("n_inter"),
        F.col("n_union").cast("long").alias("n_union"),
        F.round(
            F.col("n_inter").cast("double") / F.col("n_union").cast("double"), 6
        ).alias("jaccard"),
    )


# BPE geometry: few enough merges that common words still tokenize to
# multiple subwords (the interesting regime), capped vocab so the
# driver-side merge loop is bounded at any corpus size.
BPE_MERGES = 24
BPE_MAX_VOCAB = 10000
_BPE_CACHE: dict = {}


def _bpe_merges(spark: SparkSession, sf_dir: str):
    """Learned merge list, memoized per data fingerprint (the IVF
    codebook pattern): word counting is the distributed stage (one
    groupBy shuffle — the only corpus-sized cost); the merge loop runs
    driver-side over the collected dictionary, bounded at
    BPE_MAX_VOCAB rows by a deterministic (count DESC, word ASC) cut
    — the SentencePiece / HF-tokenizers architecture, where training
    cost grows with vocabulary, not corpus."""
    p = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(p)
    key = (p, st.st_size, st.st_mtime_ns)
    if key not in _BPE_CACHE:
        from ocular_spark.functions.bpe import train_bpe

        wc = (
            _load_wide(spark, sf_dir, "documents")
            .select(F.explode(F.split("text", " ")).alias("w"))
            .filter(F.col("w") != "")
            .groupBy("w")
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy(F.desc("c"), F.asc("w"))
            .limit(BPE_MAX_VOCAB)
            .collect()
        )
        _BPE_CACHE[key] = train_bpe({r.w: r.c for r in wc}, BPE_MERGES)
    return _BPE_CACHE[key]


def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned BPE merge table (Sennrich et al. 2016) — rank order IS
    the model.  Oracle is a frozen golden computed by an INDEPENDENT
    regex-based implementation (the original learn_bpe formulation:
    space-joined symbol strings, lookaround-anchored substitution) in
    tools/freeze_goldens.py — a two-implementation gate over the full
    determinism contract (overlapping pair counts, lexicographic
    tie-break, greedy left-to-right merging)."""
    merges = _bpe_merges(spark, sf_dir)
    return spark.createDataFrame(
        [(i, a, b, a + b) for i, (a, b) in enumerate(merges)],
        "rank long, left string, right string, merged string",
    )


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus tokenization with the learned BPE model.  Scale shape:
    encoding runs once per DISTINCT word (Zipf: cost grows with
    vocabulary, not corpus) in an Arrow-batched mapInPandas kernel
    with the merge ranks broadcast; documents then join the tiny
    word->tokens map (broadcast here; sort-merge at vocabularies past
    broadcast size) and reassemble per-doc token sequences by word
    position — one groupBy, no Python in the corpus-sized path.
    tokens_hash pins the exact token SEQUENCE (subword order within
    and across words) against the independent regex encoder's
    golden."""
    from ocular_spark.functions.bpe import encode_words

    merges = _bpe_merges(spark, sf_dir)
    merges_bc = spark.sparkContext.broadcast(merges)
    docs = _load_wide(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("ts")
    )
    words = (
        docs.select(F.explode("ts").alias("w"))
        .filter(F.col("w") != "")
        .distinct()
    )

    def enc_iter(batches):
        for pdf in batches:
            enc = encode_words(pdf["w"].tolist(), merges_bc.value)
            yield pd.DataFrame(
                {
                    "w": pdf["w"],
                    "toks": [" ".join(enc[w]) for w in pdf["w"]],
                    "n_toks": [len(enc[w]) for w in pdf["w"]],
                }
            )

    wmap = words.mapInPandas(enc_iter, "w string, toks string, n_toks int")
    exploded = docs.select(
        "doc_id", F.posexplode("ts").alias("pos", "w")
    ).filter(F.col("w") != "")
    return (
        exploded.join(F.broadcast(wmap), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_toks").cast("long").alias("n_tokens"),
            F.expr(
                "md5(array_join(transform(sort_array(collect_list("
                "struct(pos, toks))), x -> x.toks), ' '))"
            ).alias("tokens_hash"),
        )
        .select(
            "doc_id",
            F.col("n_words").cast("long").alias("n_words"),
            "n_tokens",
            "tokens_hash",
        )
    )


# cluster-balanced sampling: keep ceil(3/10) of each cluster — exact
# integer ratio so the cut is never a float boundary
CLUSTER_SAMPLE_NUM = 3
CLUSTER_SAMPLE_DEN = 10
CLUSTER_SAMPLE_K = 16


def q_cluster_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced sampling — the embedding-space curation rule
    (SemDeDup / DoReMi-adjacent): sample uniformly WITHIN clusters so
    the kept subset preserves cluster coverage instead of mirroring
    the corpus's cluster skew.  Assignment reuses the IVF
    literal-argmax projection (_ivf_assign_expr) over the
    deterministic seed codebook (first K raw vectors — the SAMPLING
    logic is this operator; codebook quality is embed_ivf_topk's
    concern).  Within each cluster, keep ceil(0.3*n_c) rows by the
    Lehmer-hash order domain_cap uses (reproducible across retries,
    unbiased w.r.t. id order); every kept row carries the exact
    inverse-propensity weight n_c / cap.  100 TB shape: assignment is
    a map-side projection; ONE hash exchange on cluster feeds both
    the window rank and the cluster size — no second scan."""
    from pyspark.sql.window import Window

    e = _load_wide(spark, sf_dir, "embeddings")
    cb = [
        {"cent_id": int(r.cent_id), "cent_vec": list(r.cent_vec)}
        for r in e.filter(F.col("vec_id") < CLUSTER_SAMPLE_K)
        .select(
            F.col("vec_id").alias("cent_id"),
            F.col("embedding").cast("array<double>").alias("cent_vec"),
        )
        .collect()
    ]
    assigned = e.select(
        "vec_id", "embedding", _ivf_assign_expr(cb).alias("cluster")
    )
    order = Window.partitionBy("cluster").orderBy(
        F.expr("(vec_id % 1000003) * 48271 % 2147483647"), "vec_id"
    )
    whole = Window.partitionBy("cluster")
    cap = F.expr(
        f"({CLUSTER_SAMPLE_NUM} * n_c + {CLUSTER_SAMPLE_DEN - 1})"
        f" div {CLUSTER_SAMPLE_DEN}"
    )
    return (
        assigned.select(
            "vec_id",
            F.col("cluster").cast("long").alias("cluster"),
            F.row_number().over(order).alias("rk"),
            F.count(F.lit(1)).over(whole).alias("n_c"),
        )
        .select(
            "vec_id",
            "cluster",
            F.col("rk").cast("long").alias("rk"),
            F.col("n_c").cast("long").alias("n_c"),
            F.when(F.col("rk") <= cap, 1).otherwise(0).cast("int").alias("kept"),
            F.round(
                F.when(F.col("rk") <= cap, F.col("n_c").cast("double") / cap)
                .otherwise(F.lit(0.0)),
                6,
            ).alias("weight"),
        )
    )


# Johnson-Lindenstrauss sign projection: k output dims, signs are a
# FIXED d x k matrix derived once from md5 (a model constant, not a
# per-row computation — inlined as literals so the projection is one
# shuffle-free integer expression at any corpus size)
RPROJ_K = 16
RPROJ_D = 64
RPROJ_SCALE = 1_000_000  # quantization: exact integer sums, order-free


def _rproj_signs() -> list:
    """Deterministic ±1 sign matrix (Achlioptas 2001 database-friendly
    random projections, sign variant): sign(i,j) from one md5 bit —
    reproducible in any engine/language, no RNG state."""
    import hashlib

    return [
        [
            1 if hashlib.md5(f"{i}_{j}".encode()).digest()[0] & 1 else -1
            for i in range(RPROJ_D)
        ]
        for j in range(RPROJ_K)
    ]


def q_embed_rproj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random sign projection of the embedding column to RPROJ_K dims
    (Johnson-Lindenstrauss; Achlioptas 2001's ±1 matrix) — the cheap
    dimensionality reduction a 100 TB pipeline runs before LSH or
    clustering when d is large.  Exactness device: components are
    quantized to integers (floor(x * 1e6), float32->double cast is
    exact) so every projected coordinate is an exact BIGINT sum —
    order-independent, no float summation anywhere.  The sign matrix
    is inlined as literal arrays (O(d*k) plan bytes, data-independent)
    so the whole operator is ONE shuffle-free projection; the JL
    cosine-preservation property is pinned by tests/test_sketch_join.py
    siblings in test_rproj.py."""
    signs = _rproj_signs()
    sg = F.array(
        *[F.array(*[F.lit(s) for s in row]) for row in signs]
    )
    e = _load_wide(spark, sf_dir, "embeddings")
    return (
        e.select(
            "vec_id",
            F.expr(
                "transform(cast(embedding as array<double>),"
                f" x -> cast(floor(x * {RPROJ_SCALE}.0) as bigint))"
            ).alias("xq"),
        )
        .select(
            "vec_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(RPROJ_K - 1)),
                    lambda j: F.aggregate(
                        F.sequence(F.lit(1), F.lit(RPROJ_D)),
                        F.lit(0).cast("long"),
                        lambda acc, i: acc
                        + F.element_at(F.col("xq"), i)
                        * F.element_at(F.element_at(sg, j + 1), i),
                    ),
                )
            ).alias("j", "y"),
        )
        .select("vec_id", F.col("j").cast("long").alias("j"), "y")
    )


# skew-join salting: fan the hot key across this many sub-keys
SKEW_NSALT = 8


def _skew_keyed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministically skewed join key over the event stream: 70% of
    rows collapse onto key 0 (the mega-key), the rest keep their
    user_id — the Zipf-head shape that breaks shuffle joins."""
    return _load_wide(spark, sf_dir, "events").select(
        "event_id",
        "value",
        F.expr(
            "CASE WHEN user_id % 10 < 7 THEN CAST(0 AS BIGINT)"
            " ELSE user_id END"
        ).alias("k"),
    )


def q_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted shuffle join — the explicit mitigation for the
    Zipf-head key that AQE's skew split cannot always save (AQE splits
    a skewed PARTITION only in sort-merge joins after materialization;
    salting prevents the skew from ever existing).  Pattern: the big
    side gets salt = hash(row id) % S as an extra join key; the small
    side is exploded S ways (S rows per key — tiny); the join runs on
    (k, salt), so the mega-key's rows spread across S tasks instead of
    one.  The sort-merge hint FORCES the shuffle-join regime (a
    broadcast would hide the skew problem this operator exists to
    solve — at 100 TB the dimension side is often too big to
    broadcast).  Salting is partitioning-only: the aggregated result
    is provably identical to the plain join, which is exactly what the
    DuckDB oracle computes (plain join, no salt — the gate proves the
    rewrite is semantics-preserving).  tests/test_skew_join.py pins
    the mechanics: salt present in the join keys, no broadcast, and
    the mega-key's rows actually spread S-ways."""
    ev = _skew_keyed_events(spark, sf_dir)
    dim = ev.select("k").distinct().select(
        "k", (F.col("k") % 7).alias("category")
    )
    salted_ev = ev.withColumn(
        "salt", F.pmod(F.xxhash64("event_id"), F.lit(SKEW_NSALT))
    )
    salted_dim = dim.select(
        "k",
        "category",
        F.explode(F.sequence(F.lit(0), F.lit(SKEW_NSALT - 1))).alias("salt"),
    ).withColumn("salt", F.col("salt").cast("long"))
    joined = salted_ev.hint("merge").join(salted_dim, ["k", "salt"])
    return joined.groupBy("category").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


# rendezvous sharding: old and new cluster sizes under test
HRW_N_OLD = 10
HRW_N_NEW = 11


def _hrw_shard_expr(n_shards: int) -> str:
    """Rendezvous (highest-random-weight) shard pick as one SQL
    expression: shard = argmax over s of h(doc_id, s), h = the same
    conv-of-13-md5-hex-chars BIGINT both engines compute identically.
    First-occurrence argmax + distinct hash inputs make ties
    impossible in practice and deterministic anyway."""
    cells = ", ".join(
        f"cast(conv(substring(md5(concat(cast(doc_id as string), '#', '{s}')),"
        " 1, 13), 16, 10) as bigint)"
        for s in range(n_shards)
    )
    return (
        f"array_position(array({cells}), array_max(array({cells}))) - 1"
    )


def q_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous / highest-random-weight sharding (Thaler & Ravishankar
    1998) — how a 100 TB store assigns documents to shards so that
    GROWING the cluster moves the theoretical minimum of data: going
    N -> N+1, a doc moves only if the NEW shard wins its rendezvous,
    so exactly ~1/(N+1) of docs move and every move lands ON the new
    shard — no old->old churn (consistent hashing's property without
    the ring).  The operator emits both assignments and the moved
    flag; the property itself (all moves target shard N_OLD, moved
    fraction ~ 1/N_NEW) is pinned by tests/test_shard_assign.py.
    Pure map-side projection — O(N) hashes per row, zero shuffle."""
    d = _load_wide(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.expr(_hrw_shard_expr(HRW_N_OLD)).cast("long").alias("shard_old"),
        F.expr(_hrw_shard_expr(HRW_N_NEW)).cast("long").alias("shard_new"),
    ).select(
        "doc_id",
        "shard_old",
        "shard_new",
        (F.col("shard_old") != F.col("shard_new")).cast("int").alias("moved"),
    )


def q_partial_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable partial aggregation — the incremental-rollup pattern a
    100 TB warehouse lives on: per-day PARTIAL aggregate states
    (count / exact-integer sum / min / max — all algebraic, all
    mergeable) are materialized once per day and MERGED for any range,
    instead of rescanning the raw events.  The query computes both the
    merged-from-partials answer and the direct full-scan answer per
    event_type and proves them equal (`consistent`) — the algebraic-
    mergeability law itself under the driver's value gate.  value is
    quantized floor(value*100) so the sums are exact BIGINTs (order-
    and grouping-independent — the property that MAKES the merge
    lawful; float sums would differ by grouping).  Scale shape: the
    partial table is days x types rows; merging any range is an
    O(range) fold, never a rescan."""
    ev = _load_wide(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.expr("cast(floor(value * 100) as bigint)").alias("v"),
    )
    partials = ev.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
    )
    merged = partials.groupBy("event_type").agg(
        F.sum("n").alias("n_merged"),
        F.sum("s").alias("sum_merged"),
        F.min("mn").alias("min_merged"),
        F.max("mx").alias("max_merged"),
    )
    direct = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_direct"),
        F.sum("v").alias("sum_direct"),
        F.min("v").alias("min_direct"),
        F.max("v").alias("max_direct"),
    )
    return merged.join(direct, "event_type").select(
        "event_type",
        F.col("n_merged").cast("long").alias("n_merged"),
        "sum_merged",
        "min_merged",
        "max_merged",
        F.col("n_direct").cast("long").alias("n_direct"),
        "sum_direct",
        "min_direct",
        "max_direct",
        (
            (F.col("n_merged") == F.col("n_direct"))
            & (F.col("sum_merged") == F.col("sum_direct"))
            & (F.col("min_merged") == F.col("min_direct"))
            & (F.col("max_merged") == F.col("max_direct"))
        ).cast("int").alias("consistent"),
    )


_SPAN_LEX_COMMON = ("the", "a", "and", "of", "to")
_SPAN_LEX_TECH = ("spark", "join", "hash", "query", "table")


def q_span_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-SPAN language ID over the interleaved table shape (the
    north_rule input: (doc_id, spans array<struct<kind, text,
    media_ref, offset>>)): each doc becomes [text(first half),
    media(ref), text(second half)], and the lexicon-vote classifier
    (q_lang_id's integer rule — exact, no float scores) runs INSIDE
    the spans array as one transform() projection; media spans pass
    through with NULL votes and the (kind, media_ref, offset) order is
    preserved — the per-row invariant, here for span-granular
    analytics.  Zero shuffle: classification happens before the
    flatten, and the flatten exists only for the driver's hashable
    shape.  At 100 TB this is the pattern for every span-level
    annotator: annotate in place in the array, never explode-shuffle-
    regroup."""
    d = _load_wide(spark, sf_dir, "documents")
    common = ", ".join(f"'{w}'" for w in _SPAN_LEX_COMMON)
    tech = ", ".join(f"'{w}'" for w in _SPAN_LEX_TECH)
    spans = F.expr(
        "array("
        "named_struct('kind', 'text',"
        " 'text', substring(text, 1, length(text) div 2),"
        " 'media_ref', cast(null as string), 'offset', 0), "
        "named_struct('kind', 'media', 'text', cast(null as string),"
        " 'media_ref', concat('m-', doc_id), 'offset', 1), "
        "named_struct('kind', 'text',"
        " 'text', substring(text, length(text) div 2 + 1),"
        " 'media_ref', cast(null as string), 'offset', 2))"
    )
    annotated = F.expr(
        "transform(spans, sp -> named_struct("
        "'kind', sp.kind, 'media_ref', sp.media_ref, 'offset', sp.offset, "
        "'n_common', case when sp.kind = 'text' then "
        f"size(filter(split(sp.text, ' '), t -> t in ({common})))"
        " else cast(null as int) end, "
        "'n_tech', case when sp.kind = 'text' then "
        f"size(filter(split(sp.text, ' '), t -> t in ({tech})))"
        " else cast(null as int) end))"
    )
    return (
        d.select("doc_id", spans.alias("spans"))
        .select("doc_id", annotated.alias("spans"))
        .select("doc_id", F.explode("spans").alias("sp"))
        .select(
            "doc_id",
            F.col("sp.kind").alias("kind"),
            F.col("sp.media_ref").alias("media_ref"),
            F.col("sp.offset").cast("long").alias("offset"),
            F.col("sp.n_common").cast("long").alias("n_common"),
            F.col("sp.n_tech").cast("long").alias("n_tech"),
            F.when(F.col("sp.kind") != "text", F.lit(None).cast("string"))
            .when(F.col("sp.n_common") >= F.col("sp.n_tech"), F.lit("common"))
            .otherwise(F.lit("tech"))
            .alias("lang_guess"),
        )
    )


# compaction target: group files into ~this many chars of payload
COMPACT_TARGET = 4000


def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planning — the Iceberg/lakehouse
    maintenance job that bin-packs many small data files into
    target-sized rewrite groups.  Files (one per doc here, size =
    n_chars) are packed per source partition by PREFIX-SUM BINNING:
    group = (running_size - size) div TARGET, i.e. a file joins the
    group its first byte lands in — a deterministic, single-window
    formulation of first-fit that parallelizes (greedy first-fit is
    inherently sequential; prefix-sum binning is the distributed
    stand-in, overshooting a group by at most one file).  One hash
    exchange on source + one window; output is the rewrite manifest
    (group sizes, file counts, id ranges)."""
    from pyspark.sql.window import Window

    d = _load_wide(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").alias("sz")
    )
    w = Window.partitionBy("source").orderBy("doc_id")
    binned = d.select(
        "doc_id", "source", "sz", F.sum("sz").over(w).alias("run")
    ).select(
        "doc_id",
        "source",
        "sz",
        # integer div end-to-end: no float rounding in the group id
        F.expr(f"(run - sz) div {COMPACT_TARGET}").cast("long").alias("grp"),
    )
    return binned.groupBy("source", "grp").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("sz").alias("bytes"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


def q_crawl_upsert_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming latest-wins crawl merge (7th streaming surface, the
    foreachBatch MERGE-sink API class): the SAME crawl versions as
    q_crawl_upsert (shared synthesis — _crawl_version_frames) land as
    three separate files, maxFilesPerTrigger=1 forces each into its
    own micro-batch, and the foreachBatch sink merges every batch
    into the target table — so a refetch arriving in a LATER
    micro-batch must still produce n_versions=2 cross-batch lineage.
    The final table must hash-equal the BATCH merge's oracle (the
    same SQL), which is the whole point: streaming-incremental and
    batch recompute agree row-for-row."""
    import shutil
    import tempfile

    from ocular_spark.streaming.jobs import upsert_crawl_stream

    global _UPSERT_STREAM_TMP_ROOT
    d = _load(spark, sf_dir, "documents").select("doc_id", "text")
    base, refetch, new = _crawl_version_frames(d)

    if _UPSERT_STREAM_TMP_ROOT is not None:
        shutil.rmtree(_UPSERT_STREAM_TMP_ROOT, ignore_errors=True)
    root = tempfile.mkdtemp(prefix="ocular_upsert_stream_")
    _UPSERT_STREAM_TMP_ROOT = root
    versions_dir = os.path.join(root, "versions")
    table_dir = os.path.join(root, "table")
    ckpt = os.path.join(root, "ckpt")
    base.coalesce(1).write.parquet(versions_dir)
    refetch.coalesce(1).write.mode("append").parquet(versions_dir)
    new.coalesce(1).write.mode("append").parquet(versions_dir)
    q = upsert_crawl_stream(spark, versions_dir, table_dir, ckpt)
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("streaming upsert did not finish in 600s")
    return spark.read.parquet(table_dir).select(
        "doc_id", "crawl_id", "fetch_ts", "n_versions", "content_digest"
    )


def q_link_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting over the link graph — the graph-local
    clustering operator (community signal, spam-farm detection) whose
    naive formulation is the textbook shuffle bomb.  The scale-aware
    plan is DEGREE ORDERING (Cohen 2009 / Suri-Vassilvitskii 2011):
    orient every undirected edge from the lower-(degree, id) endpoint
    to the higher, so every vertex's out-degree is O(sqrt(m)) and the
    wedge self-join is bounded by sum(outdeg^2) ~ m^(3/2) instead of
    sum(deg^2), which a single hub vertex makes quadratic.  Wedges
    then probe the canonical edge set once.  Each triangle is found
    exactly once (at its lowest-ranked vertex, wedge arms ordered).

    Edges = the SAME href-extracted crawl links the pagerank row gates
    UNION deterministic 5-clique 'related docs' groups (doc_id div 5)
    — the synthetic crawl links are linear maps that close no
    triangles, so the cliques make the gate non-vacuous (10 triangles
    per full group, plus any mixed closures).  The oracle counts the
    same canonical edge set by the NAIVE 3-way self-join — feasible at
    oracle scale, and a genuinely different formulation than the
    degree-oriented wedge probe.  Output: per-node triangle counts."""
    from ocular_spark.functions import html as H

    d = _load_wide(spark, sf_dir, "documents")
    wrapped = d.select("doc_id", F.expr(H.wrap_links_spark()).alias("html"))
    crawl = wrapped.select(
        F.col("doc_id").alias("src"),
        F.explode(F.expr(H.doc_links_expr("html"))).alias("dd"),
    ).select("src", F.col("dd").cast("long").alias("dst"))
    clique = d.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.expr("transform(sequence(0, 4), j -> (doc_id div 5) * 5 + j)")
        ).alias("dst"),
    )
    und = (
        crawl.unionByName(clique)
        .select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()  # cut re-extraction lineage (pagerank lesson)
    )
    deg = (
        und.select(F.col("u").alias("n"))
        .unionByName(und.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("n").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("n").alias("v"), F.col("deg").alias("deg_v"))
    oriented = (
        und.join(F.broadcast(du), "u")
        .join(F.broadcast(dv), "v")
        .select(
            F.when(
                F.struct(F.col("deg_u").alias("d"), F.col("u").alias("i"))
                < F.struct(F.col("deg_v").alias("d"), F.col("v").alias("i")),
                F.struct(F.col("u").alias("lo"), F.col("v").alias("hi")),
            )
            .otherwise(F.struct(F.col("v").alias("lo"), F.col("u").alias("hi")))
            .alias("e")
        )
        .select(F.col("e.lo").alias("lo"), F.col("e.hi").alias("hi"))
    )
    a = oriented.alias("a")
    b = oriented.alias("b")
    wedges = a.join(b, (F.col("a.lo") == F.col("b.lo")) & (F.col("a.hi") < F.col("b.hi"))).select(
        F.col("a.lo").alias("x"),
        F.least(F.col("a.hi"), F.col("b.hi")).alias("u"),
        F.greatest(F.col("a.hi"), F.col("b.hi")).alias("v"),
    )
    tris = wedges.join(und, ["u", "v"]).select(
        F.col("x").alias("n1"), F.col("u").alias("n2"), F.col("v").alias("n3")
    )
    return (
        tris.select(
            F.explode(F.array("n1", "n2", "n3")).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
        .select("node", F.col("n_triangles").cast("long").alias("n_triangles"))
    )


def q_hll_distinct_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming HLL register maintenance (8th streaming surface, the
    mergeable-sketch class): the corpus lands as TWO files split by
    doc_id parity, maxFilesPerTrigger=1 merges each half's registers
    into the persistent sketch in separate micro-batches, and the
    final register table must equal the BATCH sketch over the whole
    corpus register-for-register (the DuckDB oracle recomputes it
    independently).  This is the distributivity law HLL exists for —
    max-merge over time == max-merge over partitions — made a driver
    gate; item extraction is shared with q_hll_distinct
    (_hll_items/_hll_registers) so the two surfaces can't drift."""
    import shutil
    import tempfile

    from ocular_spark.streaming.jobs import sketch_merge_stream

    global _HLL_STREAM_TMP_ROOT
    d = _load(spark, sf_dir, "documents").select("doc_id", "source", "text")

    if _HLL_STREAM_TMP_ROOT is not None:
        shutil.rmtree(_HLL_STREAM_TMP_ROOT, ignore_errors=True)
    root = tempfile.mkdtemp(prefix="ocular_hll_stream_")
    _HLL_STREAM_TMP_ROOT = root
    src = os.path.join(root, "docs")
    table = os.path.join(root, "table")
    ckpt = os.path.join(root, "ckpt")
    d.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(src)
    d.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode("append").parquet(src)
    q = sketch_merge_stream(
        spark,
        src,
        "doc_id bigint, source string, text string",
        lambda batch: _hll_registers(_hll_items(batch)),
        table,
        ckpt,
        key_cols=["source", "gram", "idx"],
    )
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("streaming HLL merge did not finish in 600s")
    return spark.read.parquet(table).select(
        "source",
        F.col("gram").cast("long").alias("gram"),
        F.col("idx").cast("long").alias("idx"),
        F.col("r").cast("long").alias("r"),
    )


VOCAB_DECILES = 10


def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth curve (Heaps' law) — the corpus statistic
    that sizes tokenizers, embedding tables, and dictionary-bounded
    stages (the BPE_MAX_VOCAB cap's empirical justification): distinct
    words accumulated as the corpus is consumed in doc_id order,
    reported per corpus decile.  The naive formulation (count distinct
    per prefix) rescans the corpus once per point; the scale shape is
    FIRST-OCCURRENCE: one shuffle to min(doc_id) per word, then a
    decile histogram + running sum over a 10-row frame — cost is one
    pass regardless of how many curve points are asked for.

    Measured over unigrams AND bigrams (the same item stream the HLL
    sketch profiles): the synthetic corpus's closed word vocabulary
    saturates in the first decile — exactly what the curve is FOR
    (a flat curve says the unit is closed-class) — while bigram
    first-occurrences keep spreading across the corpus."""
    from pyspark.sql.window import Window

    d = _load_wide(spark, sf_dir, "documents")
    n_docs = d.count()  # driver scalar (bounded metadata)
    per_decile = max(1, n_docs // VOCAB_DECILES)
    items = _hll_items(
        d.select(F.col("doc_id").cast("string").alias("source"), "text")
    ).select(F.col("source").cast("long").alias("doc_id"), "gram", "item")
    first = items.groupBy("gram", "item").agg(F.min("doc_id").alias("first_doc"))
    hist = first.select(
        "gram",
        # integer div, not float-divide-then-cast: exact at any corpus
        # size (a double quotient can land one ulp under a boundary)
        F.least(
            F.expr(f"first_doc div {per_decile}"),
            F.lit(VOCAB_DECILES - 1).cast("long"),
        ).alias("decile"),
    ).groupBy("gram", "decile").agg(F.count(F.lit(1)).alias("new_items"))
    w = (
        Window.partitionBy("gram")
        .orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return hist.select(
        F.col("gram").cast("long").alias("gram"),
        "decile",
        F.col("new_items").cast("long").alias("new_items"),
        F.sum("new_items").over(w).cast("long").alias("cum_items"),
    )


# -------------------------------------------------- exact order statistics

# quantile targets as exact rationals (num/den) so k = ceil(p*n) is
# integer arithmetic in BOTH engines — float ceil(0.99 * n) can land
# one ulp under the boundary at large n
QUANTILE_TARGETS = (("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4),
                    ("p90", 9, 10), ("p99", 99, 100))
QUANTILE_HIST_BUCKETS = 4096   # per-pass fan-out B
QUANTILE_FINAL_WIDTH = 8192    # switch to exact groupBy(v) below this


def _exact_kth(
    df: DataFrame,
    ks: dict[str, int],
    lo0: int,
    hi0: int,
    preds: dict[str, str] | None = None,
    los: dict[str, int] | None = None,
    his: dict[str, int] | None = None,
):
    """Distributed EXACT order statistics (k-th smallest of bigint
    column `v`) by shared-pass histogram refinement — the selection
    algorithm for 10^12-row tables where a global sort is off the
    table (multi-pass selection in the Munro-Paterson 1980 streaming
    model; the classic iterative-bisection / histogram-refinement
    distributed SELECT).

    Per pass, EVERY unresolved target's live range is histogrammed in
    ONE job: targets ride an exploded struct array so the input is
    scanned once per pass, not once per quantile.  Each pass narrows a
    range by the fan-out B, so passes = ceil(log_B(domain)) — 2 passes
    for a 10^9-wide integer domain at B=4096 — then one final exact
    pass grouped on (target, v) over ranges of width <=
    QUANTILE_FINAL_WIDTH.  Driver memory is O(targets * B) bucket
    counts per pass, never the data; the only shuffle per pass is the
    groupBy on <= targets * B keys.

    GROUPED order statistics ride the same passes: `preds[t]` is an
    extra SQL predicate (e.g. "g = 'click'") ANDed into target t's
    row condition, and `los`/`his` give per-target initial ranges —
    per-group quantiles cost the SAME number of jobs as one global
    quantile.  Returns ({label: v}, histogram_pass_count)."""
    preds = preds or {}
    los = los or {}
    his = his or {}

    def _cond(t: str, lo: int, hi: int):
        c = (F.col("v") >= lo) & (F.col("v") <= hi)
        if t in preds:
            c = c & F.expr(preds[t])
        return c

    # state per target: [lo, hi, below] with the invariant (within the
    # target's predicate stratum)
    #   below == |{rows: v < lo}|  and  below < k <= below + |rows in [lo,hi]|
    state = {t: [los.get(t, lo0), his.get(t, hi0), 0] for t in ks}
    passes = 0
    while True:
        live = {t: s for t, s in state.items()
                if s[1] - s[0] + 1 > QUANTILE_FINAL_WIDTH}
        if not live:
            break
        passes += 1
        B = QUANTILE_HIST_BUCKETS
        tids = sorted(live)
        widths = {}
        cols = []
        for i, t in enumerate(tids):
            lo, hi, _ = live[t]
            widths[t] = (hi - lo + B) // B  # ceil((hi-lo+1)/B)
            cols.append(
                F.when(
                    _cond(t, lo, hi),
                    F.struct(
                        F.lit(i).alias("tid"),
                        F.expr(f"(v - {lo}) div {widths[t]}").alias("b"),
                    ),
                )
            )
        got = (
            df.select(F.explode(F.array(*cols)).alias("s"))
            .where(F.col("s").isNotNull())
            .groupBy("s.tid", "s.b")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        counts: dict[int, dict[int, int]] = {}
        for r in got:
            counts.setdefault(r["tid"], {})[r["b"]] = r["c"]
        for i, t in enumerate(tids):
            lo, hi, below = live[t]
            w = widths[t]
            kloc = ks[t] - below  # 1-based rank within [lo, hi]
            acc = 0
            for b in sorted(counts.get(i, {})):
                c = counts[i][b]
                if acc + c >= kloc:
                    state[t] = [lo + b * w,
                                min(hi, lo + (b + 1) * w - 1),
                                below + acc]
                    break
                acc += c
    # final exact pass: ONE job grouped on (target, v) over each
    # target's remaining range (per-target structs again, so grouped
    # targets with overlapping v ranges stay separated); collect is
    # bounded by targets * QUANTILE_FINAL_WIDTH rows
    tids = sorted(state)
    cols = [
        F.when(
            _cond(t, state[t][0], state[t][1]),
            F.struct(F.lit(i).alias("tid"), F.col("v").alias("v")),
        )
        for i, t in enumerate(tids)
    ]
    got = (
        df.select(F.explode(F.array(*cols)).alias("s"))
        .where(F.col("s").isNotNull())
        .groupBy("s.tid", "s.v")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    by_tid: dict[int, list[tuple[int, int]]] = {}
    for r in got:
        by_tid.setdefault(r["tid"], []).append((r["v"], r["c"]))
    out = {}
    for i, t in enumerate(tids):
        acc = state[t][2]
        for v, c in sorted(by_tid.get(i, [])):
            acc += c
            if acc >= ks[t]:
                out[t] = v
                break
    return out, passes


def q_exact_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact global quantiles (p25/p50/p75/p90/p99) of events.value
    WITHOUT a global sort — the order-statistics primitive behind
    quality-score cutoffs, perplexity-bucket boundaries, and length
    caps, computed exactly at any scale: approxQuantile's error bounds
    are fine for dashboards but a training-data FILTER boundary wants
    the exact value (reproducibility: the kept set must not depend on
    sketch parameters).  Values are quantized to integer micro-units
    (floor(value*1e6)) so the order statistic is well-defined and
    engine-independent.  Cost: stats pass + ceil(log_4096(domain))
    shared histogram passes + one exact pass over <= 5*8192-wide
    ranges — 4 map-side scans total here, independent of row count;
    see _exact_kth for the scale contract."""
    ev = _load_wide(spark, sf_dir, "events").select(
        F.expr("cast(floor(value * 1000000) as bigint)").alias("v")
    )
    ev = ev.persist()
    try:
        row = ev.agg(
            F.min("v").alias("lo"), F.max("v").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        ).first()
        n = int(row["n"])
        if n == 0:
            return spark.createDataFrame(
                [], "p_label string, k bigint, quantile_v bigint")
        ks = {lab: (num * n + den - 1) // den
              for lab, num, den in QUANTILE_TARGETS}
        res, _ = _exact_kth(ev, ks, int(row["lo"]), int(row["hi"]))
    finally:
        ev.unpersist()
    rows = [(lab, ks[lab], res[lab]) for lab, _, _ in QUANTILE_TARGETS]
    return spark.createDataFrame(
        rows, "p_label string, k bigint, quantile_v bigint")


GROUP_QUANTILE_TARGETS = (("p50", 1, 2), ("p90", 9, 10))


def q_group_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact PER-GROUP quantiles (p50/p90 of events.value per
    event_type) in the SAME shared histogram passes as one global
    quantile — the grouped generalization of exact_quantile: every
    (group, quantile) target carries its own predicate and live range
    through _exact_kth, so G groups x Q quantiles cost
    ceil(log_B(domain)) jobs, not G*Q sorts and not G*Q jobs.  This is
    the shape that matters at scale: per-language length cutoffs,
    per-domain quality boundaries, per-source perplexity medians — all
    one pass-set over the corpus.  A window-rank formulation would
    shuffle and sort the FULL stream per group; here the stream is
    only ever scanned and counted."""
    ev = _load_wide(spark, sf_dir, "events").select(
        F.col("event_type").alias("g"),
        F.expr("cast(floor(value * 1000000) as bigint)").alias("v"),
    )
    ev = ev.persist()
    try:
        stats = ev.groupBy("g").agg(
            F.min("v").alias("lo"), F.max("v").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        ).collect()
        ks, preds, los, his, meta = {}, {}, {}, {}, []
        for r in sorted(stats, key=lambda r: r["g"]):
            gsql = r["g"].replace("'", "''")
            for lab, num, den in GROUP_QUANTILE_TARGETS:
                t = f"{r['g']}|{lab}"
                ks[t] = (num * int(r["n"]) + den - 1) // den
                preds[t] = f"g = '{gsql}'"
                los[t] = int(r["lo"])
                his[t] = int(r["hi"])
                meta.append((r["g"], lab, t))
        res, _ = _exact_kth(ev, ks, 0, 0, preds, los, his)
    finally:
        ev.unpersist()
    rows = [(g, lab, ks[t], res[t]) for g, lab, t in meta]
    return spark.createDataFrame(
        rows, "event_type string, p_label string, k bigint, quantile_v bigint")


# ------------------------------------------------- funnel / retention

FUNNEL_STEPS = ("view", "click", "purchase")
RETENTION_WEEK_US = 7 * 86400 * 1_000_000


def _event_us(spark: SparkSession, sf_dir: str):
    """events with time as exact integer MICROSECOND OFFSETS from the
    stream's min(ts) anchor (timestampdiff on the TIMESTAMP_NTZ column
    — epoch casts would drag in the session timezone; offsets never
    do).  One O(1) scalar agg for the anchor, then a pure projection."""
    raw = _load_wide(spark, sf_dir, "events")
    anchor = raw.agg(F.min("ts")).collect()[0][0]
    a_lit = anchor.strftime("%Y-%m-%d %H:%M:%S.%f")
    return raw.select(
        "user_id",
        "event_type",
        F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '{a_lit}', ts)"
        ).alias("us"),
    )


def q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis (view -> click -> purchase with STRICTLY
    increasing timestamps) — the sequential-pattern operator every
    product-analytics engine ships (windowFunnel in ClickHouse terms)
    and Spark has no builtin for.  Semantics: greedy earliest
    completion — t1 = first view, t2 = first click after t1, t3 =
    first purchase after t2 (greedy is optimal for earliest feasible
    completion, so it equals the oracle's min-chain formulation).

    Scale shape: ONE shuffle (groupBy user), then the per-user event
    list is sorted and folded entirely inside a JVM `aggregate()`
    lambda — no window sort over the raw stream, no per-user Python,
    no N passes for N steps.  Per-user state is 3 bigints; the
    collect_list is bounded by per-user activity (the same bound any
    per-user sessionizer carries); a pathological mega-user would be
    handled by the skew_join salting pattern."""
    ev = _event_us(spark, sf_dir).where(
        F.col("event_type").isin(*FUNNEL_STEPS)
    )
    per_user = ev.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("us", "event_type"))).alias("seq")
    )
    folded = per_user.select(
        "user_id",
        F.expr(
            """
            aggregate(
              seq,
              named_struct('t1', -1L, 't2', -1L, 't3', -1L),
              (acc, x) -> named_struct(
                't1', CASE WHEN acc.t1 = -1L AND x.event_type = 'view'
                           THEN x.us ELSE acc.t1 END,
                't2', CASE WHEN acc.t2 = -1L AND acc.t1 <> -1L
                                AND x.event_type = 'click'
                                AND x.us > acc.t1
                           THEN x.us ELSE acc.t2 END,
                't3', CASE WHEN acc.t3 = -1L AND acc.t2 <> -1L
                                AND x.event_type = 'purchase'
                                AND x.us > acc.t2
                           THEN x.us ELSE acc.t3 END))
            """
        ).alias("f"),
    )
    return folded.select(
        "user_id",
        F.col("f.t1").alias("t_view"),
        F.col("f.t2").alias("t_click"),
        F.col("f.t3").alias("t_purchase"),
        (
            (F.col("f.t1") != -1).cast("long")
            + (F.col("f.t2") != -1).cast("long")
            + (F.col("f.t3") != -1).cast("long")
        ).alias("steps_reached"),
    )


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix — users cohorted by their first active
    week, counted per (cohort_week, week_offset) cell: the growth
    metric behind every "week-N retention" dashboard.  Scale shape:
    distinct (user, week) first (collapses the raw stream to at most
    users x weeks rows BEFORE any join), per-user min for the cohort,
    one equi-join back on user_id (at 10^12 events the distinct is the
    only stream-sized shuffle; the join operates on the collapsed
    activity table), then a cells-sized aggregate.  cohort_size rides
    a broadcast join of the week-sized cohort table."""
    uw = (
        _event_us(spark, sf_dir)
        .select("user_id", F.expr(f"us div {RETENTION_WEEK_US}").alias("week"))
        .distinct()
    )
    cohort = uw.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    cells = (
        uw.join(cohort, "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    sizes = cohort.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return cells.join(F.broadcast(sizes), "cohort_week").select(
        F.col("cohort_week").cast("long").alias("cohort_week"),
        F.col("week_offset").cast("long").alias("week_offset"),
        F.col("n_active").cast("long").alias("n_active"),
        F.col("cohort_size").cast("long").alias("cohort_size"),
    )


# ------------------------------------------------------- z-order layout

ZORDER_FILE_DIV = 16777216  # top 8 of 32 z-bits -> 256 z-tiles ("files")


def _morton_expr(xe: str, ye: str, shl) -> str:
    """32-bit Morton/Z-curve interleave of two 16-bit lanes as a pure
    integer expression (Morton 1966; the magic-mask bit spread used by
    every z-order implementation, e.g. Delta Lake OPTIMIZE ZORDER BY).
    `shl` formats a left-shift for the target engine (Spark:
    shiftleft(e, n); DuckDB: e << n) so the SAME algebra runs in both
    engines; all arithmetic stays in BIGINT.  Inputs must already be
    in [0, 65535]."""
    def spread(e: str) -> str:
        e = f"(({e} | {shl(e, 8)}) & 16711935)"      # 0x00FF00FF
        e = f"(({e} | {shl(e, 4)}) & 252645135)"     # 0x0F0F0F0F
        e = f"(({e} | {shl(e, 2)}) & 858993459)"     # 0x33333333
        e = f"(({e} | {shl(e, 1)}) & 1431655765)"    # 0x55555555
        return e
    return f"({spread(xe)} | {shl(spread(ye), 1)})"


_ZORDER_X = "(((user_id % 65536) + 65536) % 65536)"
_ZORDER_Y = "(((cast(floor(value * 100) as bigint) % 65536) + 65536) % 65536)"


def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order data-layout clustering — how a 100 TB lakehouse makes
    min/max file pruning work on TWO columns at once (Morton 1966;
    Delta OPTIMIZE ZORDER): rows are keyed by the bit-interleave of
    quantized (user_id, value) lanes and tiled into 256 z-ranges
    ("files" = zval div 2^24, a pure projection — at production scale
    this is a range-repartition on zval; the tiling stand-in keeps the
    operator shuffle-free).  The emitted per-file min/max envelopes of
    BOTH lanes are the clustering evidence: under z-layout each file's
    x AND y ranges are tight, so a two-column predicate prunes ~all
    files; a single-column sort would leave the second column's
    envelope full-width.  tests/test_zorder.py pins the interleave
    against an independent bit-twiddling reference and the pruning
    benefit vs linear layout.  Plan: projection + one 256-key groupBy."""
    shl = lambda e, n: f"shiftleft({e}, {n})"  # noqa: E731
    z = _morton_expr(_ZORDER_X, _ZORDER_Y, shl)
    proj = _load_wide(spark, sf_dir, "events").select(
        F.expr(_ZORDER_X).alias("x16"),
        F.expr(_ZORDER_Y).alias("y16"),
        F.expr(z).alias("zval"),
    )
    return (
        proj.select("x16", "y16", "zval",
                    F.expr(f"zval div {ZORDER_FILE_DIV}").alias("file_id"))
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("x16").alias("x_min"), F.max("x16").alias("x_max"),
            F.min("y16").alias("y_min"), F.max("y16").alias("y_max"),
            F.min("zval").alias("z_min"), F.max("zval").alias("z_max"),
        )
        .select(
            F.col("file_id").cast("long").alias("file_id"),
            F.col("n_rows").cast("long").alias("n_rows"),
            "x_min", "x_max", "y_min", "y_max", "z_min", "z_max",
        )
    )


# ------------------------------------------------- exact heavy hitters

# Misra-Gries counter budget.  The stream has 39 distinct items (31
# fixture words + 'dup' + 7 synthetic hot levels), so K=15 forces real
# evictions in every partition summary AND in the merge; the exactness
# guarantee (any item with freq > n/(K+1) survives the merged summary)
# is what makes the two-pass output EXACT, not approximate.
HH_K = 15
HH_LEVELS = 7  # synthetic Zipf head: hot_v has expected freq ~ N * 2^(6-v)


def _mg_partition_kernel(k: int):
    """Arrow-batched per-partition Misra-Gries summary (Misra & Gries
    1982; batched/mergeable form from Agarwal et al., "Mergeable
    Summaries", PODS 2012).  Per batch: value_counts() (vectorized,
    vocab-sized dict work only) is added into the counter dict; when
    more than k counters are live, subtract the (k+1)-th largest count
    from all and drop non-positives — the standard batched decrement,
    equivalent to a sequence of single-item MG steps.  Invariant: for
    any item x, freq_partition(x) - n_partition/(k+1) <= est(x) <=
    freq_partition(x), and the summary never exceeds k items between
    batches."""

    def fn(batches):
        counters: dict = {}
        for pdf in batches:
            for item, c in pdf["item"].value_counts().items():
                counters[item] = counters.get(item, 0) + int(c)
            if len(counters) > k:
                t = sorted(counters.values(), reverse=True)[k]
                counters = {i: c - t for i, c in counters.items() if c > t}
        yield pd.DataFrame(
            {
                "item": pd.Series(list(counters.keys()), dtype=object),
                "est": pd.Series(list(counters.values()), dtype="int64"),
            }
        )

    return fn


def _mg_merge(summaries: list, k: int) -> dict:
    """Merge per-partition MG summaries: sum per item, then one batched
    decrement back to <= k counters.  Mergeable-summaries theorem: the
    merged error stays <= n_total/(k+1), so any item with global freq
    > n/(k+1) survives with est > 0 — candidates are a SUPERSET of the
    true heavy hitters (the recount pass makes the output exact)."""
    merged: dict = {}
    for item, est in summaries:
        merged[item] = merged.get(item, 0) + est
    if len(merged) > k:
        t = sorted(merged.values(), reverse=True)[k]
        merged = {i: c - t for i, c in merged.items() if c > t}
    return merged


def _hh_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The heavy-hitter item stream: whitespace tokens (natural data,
    near-uniform by construction of the fixture vocab) UNION a
    deterministic synthetic Zipf head — hot_v replicated 2^(6-v) times
    per doc unless the doc's md5 draw (25% of docs) caps it at 1.
    Real crawl token streams are Zipf (the reason MG exists); the
    synthetic head restores the skew the uniform fixture lacks, with
    md5-derived multiplicities both engines replay byte-for-byte."""
    d = _load_wide(spark, sf_dir, "documents").select("doc_id", "text")
    toks = d.select(F.explode(F.split("text", " ")).alias("item"))
    hot = d.select(
        F.explode(
            F.expr(
                f"flatten(transform(sequence(0, {HH_LEVELS - 1}), v ->"
                " transform(sequence(1, CASE WHEN"
                " cast(conv(substring(md5(concat(cast(doc_id as string),"
                " '#hh', cast(v as string))), 1, 13), 16, 10) as bigint)"
                f" % 4 = 0 THEN 1 ELSE shiftleft(1, {HH_LEVELS - 1} - v)"
                " END), j -> concat('hot_', cast(v as string)))))"
            )
        ).alias("item")
    )
    return toks.unionByName(hot)


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT heavy hitters (freq > n/(K+1)) with NO corpus-wide
    groupBy — the two-pass Misra-Gries + recount pattern
    q_count_min_topk's docstring names as the production candidate
    generator.  Pass 1 is map-side ONLY: each partition emits a <= K
    row MG summary (mapInPandas, vectorized value_counts); summaries
    (<= K x P rows, the same bounded-collect class as the IVF
    codebook) merge driver-side into <= K candidates that provably
    contain every true heavy hitter.  Pass 2 recounts exactly: items
    are tagged candidate-or-NULL, so map-side partial aggregation
    collapses each partition to <= K+1 rows before the only shuffle
    in the whole job — at 100 TB the exchange moves O(K x partitions)
    rows regardless of corpus size, where a naive exact top-k shuffles
    the full token multiset.  The NULL group still contributes to n,
    so the final integer filter cnt*(K+1) > n uses the exact stream
    size from the same single job.

    Oracle: plain GROUP BY + HAVING over the identical stream — the
    exactness claim IS the gate.  tests/test_heavy_hitters.py pins the
    MG guarantee on adversarial streams and partitioning-invariance of
    the final output."""
    stream = _hh_stream(spark, sf_dir)
    parts = stream.mapInPandas(
        _mg_partition_kernel(HH_K), schema="item string, est long"
    ).collect()
    merged = _mg_merge([(r["item"], r["est"]) for r in parts], HH_K)
    cands = sorted(merged)
    tagged = stream.select(
        F.when(F.col("item").isin(cands), F.col("item")).alias("g")
    )
    counts = tagged.groupBy("g").agg(F.count(F.lit(1)).alias("cnt"))
    tot = counts.agg(F.sum("cnt").alias("n"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .filter(F.col("g").isNotNull() & (F.col("cnt") * (HH_K + 1) > F.col("n")))
        .select(
            F.col("g").alias("item"),
            F.col("cnt").cast("long").alias("cnt"),
            F.col("n").cast("long").alias("n_stream"),
        )
    )


# ---------------------------------------------------- PMI collocations

PMI_MIN_COUNT = 5  # prune singleton bigrams BEFORE any join (the tail
# of a Zipf bigram distribution is most of its distinct keys)


def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining by pointwise mutual information (Church &
    Hanks 1990) — the standard phrase/multi-word-expression detector a
    tokenizer-training pipeline runs before merging phrases: PMI(x,y)
    = ln(p(x,y) / (p(x)p(y))) over adjacent word bigrams.

    Scale shape: ONE corpus-sized shuffle (the bigram groupBy, map-side
    combined); the unigram count table is vocab-sized and joins back
    BROADCAST twice (w1, w2 sides); corpus totals come from per-doc
    token counts (a scalar agg on the same scan, cross-joined back).
    The min-count filter runs BEFORE the joins, cutting the Zipf tail
    where most distinct bigram keys live.  Float discipline (the
    bm25_topk lesson): the PMI ratio is assembled in ONE fixed
    multiplication order from exact BIGINT counts cast to DOUBLE, so
    both engines round the identical IEEE value at 6 dp."""
    d = _load_wide(spark, sf_dir, "documents").select(
        F.split("text", " ").alias("ts")
    )
    tot = d.agg(
        F.sum(F.size("ts")).cast("long").alias("n_uni"),
        F.sum(F.greatest(F.size("ts") - 1, F.lit(0)))
        .cast("long")
        .alias("n_big"),
    )
    big = d.select(
        F.explode(
            F.expr(
                "CASE WHEN size(ts) >= 2 THEN transform(sequence(1,"
                " size(ts) - 1), i -> struct(element_at(ts, i) AS w1,"
                " element_at(ts, i + 1) AS w2)) ELSE array() END"
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    cxy = (
        big.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= PMI_MIN_COUNT)
    )
    uni = d.select(F.explode("ts").alias("w"))
    cu = uni.groupBy("w").agg(F.count(F.lit(1)).alias("cw"))
    joined = (
        cxy.join(
            F.broadcast(cu.select(F.col("w").alias("w1"),
                                  F.col("cw").alias("cw1"))),
            "w1",
        )
        .join(
            F.broadcast(cu.select(F.col("w").alias("w2"),
                                  F.col("cw").alias("cw2"))),
            "w2",
        )
        .crossJoin(F.broadcast(tot))
    )
    return joined.select(
        "w1",
        "w2",
        F.col("cnt").cast("long").alias("cnt"),
        F.expr(
            "round(ln((cast(cnt as double) * n_uni * n_uni) /"
            " (cast(n_big as double) * cw1 * cw2)), 6)"
        ).alias("pmi"),
    )


# --------------------------------------------------- robust outliers

RO_CONTAM_MOD = 83     # deterministic contamination: doc_id % 83 == 0
RO_CONTAM_SHIFT = 2000  # gets +2000 chars — the corrupted-record stand-in
RO_FENCE = 3           # flag |x - median| > 3 * MAD


def q_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group robust outlier detection with median/MAD fences — the
    data-cleaning gate a corpus pipeline runs before length/quality
    filters are tuned: mean/stddev fences MOVE when the corruption
    they exist to catch arrives; median and MAD have a 50% breakdown
    point, so the injected contamination (doc_id % 83 docs get +2000
    chars) leaves the per-language fences where the clean data put
    them and the corrupted rows land OUTSIDE.  Flag: |x - med| >
    3*MAD, all in exact BIGINT arithmetic.

    Scale shape: both the median and the MAD round ride _exact_kth's
    shared histogram passes (G groups x 2 statistics = the job count
    of ONE global quantile per round; the stream is scanned and
    counted, never sorted); the per-group fences are a 5-row broadcast
    joined back for the final projection-filter.  A window-rank
    median would sort the full corpus per group."""
    d = _load_wide(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.expr(
            f"n_chars + CASE WHEN doc_id % {RO_CONTAM_MOD} = 0"
            f" THEN {RO_CONTAM_SHIFT} ELSE 0 END"
        ).alias("x"),
    ).persist()
    try:
        stats = d.groupBy("lang").agg(
            F.min("x").alias("lo"), F.max("x").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        ).collect()
        langs = sorted(r["lang"] for r in stats)
        by_lang = {r["lang"]: r for r in stats}
        ks = {g: (int(by_lang[g]["n"]) + 1) // 2 for g in langs}
        preds = {g: f"lang = '{g}'" for g in langs}
        med, _ = _exact_kth(
            d.select("lang", F.col("x").alias("v")), ks, 0, 0, preds,
            {g: int(by_lang[g]["lo"]) for g in langs},
            {g: int(by_lang[g]["hi"]) for g in langs},
        )
        med_df = spark.createDataFrame(
            [(g, med[g]) for g in langs], "lang string, med bigint"
        )
        dev = d.join(F.broadcast(med_df), "lang").select(
            "lang", F.abs(F.col("x") - F.col("med")).alias("v")
        )
        dev_hi = {
            g: max(int(by_lang[g]["hi"]) - med[g],
                   med[g] - int(by_lang[g]["lo"]))
            for g in langs
        }
        mad, _ = _exact_kth(dev, ks, 0, 0, preds,
                            {g: 0 for g in langs}, dev_hi)
        fence_df = spark.createDataFrame(
            [(g, med[g], mad[g]) for g in langs],
            "lang string, med bigint, mad bigint",
        )
        return (
            d.join(F.broadcast(fence_df), "lang")
            .filter(F.abs(F.col("x") - F.col("med"))
                    > RO_FENCE * F.col("mad"))
            .select(
                "doc_id", "lang",
                F.col("x").cast("long").alias("x"),
                F.col("med").cast("long").alias("med"),
                F.col("mad").cast("long").alias("mad"),
            )
        )
    finally:
        d.unpersist()


# --------------------------------------------------- weighted sample

WS_K = 20  # sample size
WS_U53 = 9007199254740992.0  # 2^53: md5 draw -> uniform in (0, 1]


def _weighted_sample_df(
    spark: SparkSession, sf_dir: str, salt: int = 0
) -> DataFrame:
    """Efraimidis-Spirakis weighted sampling without replacement
    (Inf. Proc. Letters 2006): each row draws u ~ U(0,1] and the k
    rows with the largest u^(1/w) ARE a weight-proportional sample
    without replacement.  The draw is an md5 hash of (doc_id, salt),
    not an RNG: re-running the job — after a retry, on different
    partitioning, at either engine — selects the IDENTICAL sample,
    which is what makes sampling auditable in a lineage-tracked
    pipeline (and what a seeded RNG over nondeterministic partition
    order does NOT give).  The key is computed as ln(u)/w, a monotone
    transform of u^(1/w) that avoids pow() entirely.

    Scale shape: pure projection + orderBy(key).limit(k), which Spark
    plans as TakeOrderedAndProject — per-partition top-k heaps merged
    on the driver, NEVER a global sort; the exchange carries k rows
    per partition."""
    d = _load_wide(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.col("n_chars").cast("long").alias("w")
    )
    key = (
        f"ln((cast(conv(substring(md5(concat(cast(doc_id as string),"
        f" '#ws{salt}')), 1, 13), 16, 10) as bigint) + 1) / {WS_U53})"
        f" / w"
    )
    return (
        d.filter(F.col("w") > 0)
        .select("doc_id", "lang", "w", F.expr(key).alias("es_key"))
        .orderBy(F.desc("es_key"), F.asc("doc_id"))
        .limit(WS_K)
        .select("doc_id", "lang", "w", F.round("es_key", 9).alias("es_key"))
    )


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sample (k=20, weight = n_chars) — see
    _weighted_sample_df.  tests/test_weighted_sample.py pins the
    weight-proportionality law over many salts and Spark == pandas
    replay of the identical draw."""
    return _weighted_sample_df(spark, sf_dir, salt=0)


# ------------------------------------------------------- group top-k

GTK_K = 3  # per-language winners


def _gtk_partition_topk(k: int):
    """Per-partition pre-top-k: keep only each group's k best
    (score DESC, doc_id ASC) rows inside the partition — vectorized
    pandas sort + groupby.head, no per-row Python.  The union of
    per-partition top-k sets is trivially a SUPERSET of the global
    per-group top-k (any globally kept row is top-k within its own
    partition a fortiori), which is what makes the two-stage answer
    exact."""

    def fn(batches):
        state = None
        for pdf in batches:
            cur = pdf if state is None else pd.concat(
                [state, pdf], ignore_index=True
            )
            cur = cur.sort_values(
                ["lang", "score", "doc_id"], ascending=[True, False, True]
            )
            # fold: task memory stays O(k x groups + one Arrow batch),
            # never the partition
            state = cur.groupby("lang", sort=False).head(k)
        if state is not None:
            yield state

    return fn


def q_group_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k (the k longest docs per language) WITHOUT a
    corpus-wide window sort — the row_number()-over-partition
    formulation shuffles and sorts the FULL table per group key; at
    10^12 rows that sort is the job.  Two stages instead: (1)
    mapInPandas pre-top-k inside each partition (superset law in
    _gtk_partition_topk), (2) the survivors — <= k x partitions x
    groups rows, corpus-size-independent — take one tiny shuffle and
    a final per-group rank.  This is TakeOrderedAndProject
    generalized from one global top-k to per-group top-k.

    Ties break (score DESC, doc_id ASC) in both stages and both
    engines, so the cut is deterministic."""
    from pyspark.sql.window import Window

    d = _load_wide(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.col("n_chars").cast("long").alias("score")
    )
    cand = d.mapInPandas(
        _gtk_partition_topk(GTK_K),
        schema="doc_id long, lang string, score long",
    )
    w = Window.partitionBy("lang").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        cand.select(
            "lang",
            F.row_number().over(w).cast("long").alias("rank"),
            "doc_id",
            "score",
        )
        .filter(F.col("rank") <= GTK_K)
    )


# ---------------------------------------------------- ECDF normalize


def q_ecdf_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-rank (ECDF) normalization of a quantized score
    within each language — how heterogeneous quality signals are made
    comparable before blending (rank normalization): for each doc,
    rank_lt = #docs in its language with a strictly smaller score, so
    ecdf = rank_lt / n is the exact empirical CDF at the doc.

    Scale shape: when the score is QUANTIZED (every real quality
    score is — here n_chars), the CDF is a distinct-value table, not a
    corpus sort: one groupBy on (lang, v) [the only corpus-sized
    shuffle, map-side combined to the distinct-value count], a
    cumulative sum over that DOMAIN-sized table (the window sorts
    hundreds of rows, never the corpus), then a BROADCAST join back.
    The window-rank formulation the oracle uses would shuffle + sort
    every row per group.  All outputs exact integers (rank_lt, n) —
    the division is left to the consumer so the gate stays
    float-free."""
    from pyspark.sql.window import Window

    d = _load_wide(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.col("n_chars").cast("long").alias("v")
    )
    vc = d.groupBy("lang", "v").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("lang").orderBy("v")
    cdf = vc.select(
        "lang",
        "v",
        (F.sum("c").over(w) - F.col("c")).cast("long").alias("rank_lt"),
        F.sum("c").over(Window.partitionBy("lang"))
        .cast("long").alias("n_g"),
    )
    return d.join(F.broadcast(cdf), ["lang", "v"]).select(
        "doc_id", "lang", "v", "rank_lt", "n_g"
    )


# ------------------------------------------------------- Pareto front


def _pareto_front_pandas(df: pd.DataFrame) -> pd.DataFrame:
    """Exact 2-D skyline of (x, y) maximization by one descending
    sweep: process equal-x groups in x-DESC order, carrying M = max y
    over all strictly-greater x.  A point survives iff its y equals
    its group's max AND beats M strictly; exact (x, y) duplicates all
    survive (neither strictly dominates the other)."""
    keep = []
    m = None
    for _x, grp in df.sort_values("x", ascending=False).groupby(
        "x", sort=False
    ):
        gmax = grp["y"].max()
        if m is None or gmax > m:
            keep.append(grp[grp["y"] == gmax])
            m = gmax if m is None else max(m, gmax)
    return (
        pd.concat(keep, ignore_index=True)
        if keep
        else df.iloc[0:0]
    )


def _pareto_kernel(batches):
    state = None
    for pdf in batches:
        cur = pdf if state is None else pd.concat(
            [state, pdf], ignore_index=True
        )
        state = _pareto_front_pandas(cur)  # fold: state = running front
    if state is not None:
        yield state


def q_pareto_front(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto-front (skyline) selection over two maximization
    objectives — multi-objective data curation ("longest AND highest
    quality, keep everything not dominated"); Spark has no skyline
    operator.  Objectives: x = n_chars, y = a deterministic md5
    quality score, so both engines synthesize identical points.

    Distributed shape (the classic two-phase skyline): (1) each
    partition computes its LOCAL front (mapInPandas sweep, folded so
    task memory is the running front + one Arrow batch); (2) the
    union of local fronts — small: a 2-D front of n independent-ish
    points is ~O(log n .. sqrt(n)) — collapses on ONE task for the
    exact global front.  Correctness: front(union of local fronts) =
    global front, because domination is transitive: if q dominates p
    globally then either q is in its partition's front, or something
    in that front dominates q and hence p; either way p is eliminated
    in phase 2, and no undominated p can be eliminated anywhere.
    tests/test_selection_ops.py pins equality with the NOT EXISTS
    brute force and partitioning invariance."""
    d = _load_wide(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("n_chars").cast("long").alias("x"),
        F.expr(
            "cast(conv(substring(md5(concat(cast(doc_id as string),"
            " '#pq')), 1, 13), 16, 10) as bigint) % 1000"
        ).alias("y"),
    )
    local = d.mapInPandas(
        _pareto_kernel, schema="doc_id long, x long, y long"
    )
    return local.repartition(1).mapInPandas(
        _pareto_kernel, schema="doc_id long, x long, y long"
    )


# ------------------------------------------------- end-to-end curation

CURATE_DUP_MOD = 13  # docs doc_id % 100 == 13 get an exact +10M copy


def q_curate_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE END-TO-END curation chain as ONE hard driver gate: quality
    (Gopher rules) -> exact dedup (min-doc_id survivor) -> PII
    redaction -> benchmark decontamination (13-gram shingles) ->
    training-mix selection -> sequence packing.  The stages are the
    jobs/curate_corpus.py functions THEMSELVES (imported, not
    restated), so this row gates the exact composition spark-submit
    runs — previously the chain had pytest coverage only, while each
    stage had its own driver row; stage interaction (e.g. redaction
    running before decontamination, packing over the post-mix
    survivor set) was un-gated.

    Audit fixture (all deterministic, mirrored in the oracle): decon
    canon sentences injected for doc_id % 100 == 7 / % 10 in {4, 9};
    PII suffixes for % 3/4/5 classes; exact duplicate copies
    (doc_id + 10_000_000) for % 100 == 13, injected BEFORE the union
    so copies are byte-identical and dedup is non-vacuous.  Output
    carries md5(text) so the gate pins the redacted BYTES, and the
    packing layout columns so it pins the final physical placement.

    Scale shape: inherited from the gated stages — quality/PII are
    codegen projections, dedup digests before its one shuffle, decon
    is a broadcast semi-join on hashed shingles, mix is a projection,
    packing is per-shard prefix sums."""
    from ocular_spark.jobs import curate_corpus as cc

    base = _load_wide(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    injected = base.select(
        "doc_id", "lang", _decon_injected_text().alias("text")
    ).select("doc_id", "lang", _pii_injected_text().alias("text"))
    dups = injected.filter(
        F.col("doc_id") % 100 == CURATE_DUP_MOD
    ).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "lang", "text"
    )
    d0 = injected.unionByName(dups)
    cur = cc.quality_stage(d0)
    cur = cc.dedup_stage(cur)
    cur = cc.pii_stage(cur)
    cur = cc.decontaminate_stage(cur, [DECON_CANON, DECON_CANON2])
    cur = cc.mix_stage(cur)
    out = cc.pack_stage(cur, epoch=0)
    return out.select(
        "doc_id",
        "lang",
        "weight",
        F.col("shard").cast("long").alias("shard"),
        "n_tokens",
        F.col("seq_id").cast("long").alias("seq_id"),
        F.col("seq_offset").cast("long").alias("seq_offset"),
        F.md5("text").alias("text_digest"),
    )


# ------------------------------------------------------ n-gram novelty

NOVELTY_N = 5  # shingle width for the novelty attribution
_NOVELTY_BASE_PREV = None  # one-live-copy cache scope (see below)


def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram NOVELTY — the memorization/contamination
    signal crawl curation orders snapshots by: for each doc, how many
    of its distinct 5-gram shingles appear in NO earlier document
    (doc_id order = ingest order).  Low novelty = the doc restates
    what the corpus already has (near-dup tail, boilerplate); the
    per-doc attribution is what vocab_growth's corpus-level curve
    can't give.

    Scale shape — NO join back to the corpus: novelty only needs, per
    shingle, WHICH doc saw it first, so the whole operator is
    groupBy(shingle_hash).agg(min(doc_id)) [the one corpus-sized
    shuffle, map-side combined] followed by a second aggregate over
    the VOCABULARY-sized result keyed by that min — a (doc, shingle)
    join-back would shuffle the full pair multiset a second time.
    Shingles are hashed to int64 INSIDE the array expression (the
    ngram_jaccard lesson: strings never shuffle); n_shingles is a
    pure projection.  Hash identity differs per engine (xxhash64 vs
    raw strings in DuckDB) but only grouping identity matters —
    equal-up-to-collisions, and a collision would have to straddle
    the min boundary to show."""
    global _NOVELTY_BASE_PREV
    d = _load_wide(spark, sf_dir, "documents").select("doc_id", "text")
    n = NOVELTY_N
    # CASE guard, not greatest(.., 0): sequence(1, 0) is DESCENDING in
    # Spark ([1, 0]) and slice(arr, 0, n) throws under ANSI — the
    # short-doc landmine the verify-skill probe list names
    sh = (
        f"array_distinct(CASE WHEN size(split(text, ' ')) >= {n}"
        f" THEN transform(sequence(1, size(split(text, ' ')) - {n - 1}),"
        f"  i -> xxhash64(array_join(slice(split(text, ' '), i, {n}), ' ')))"
        f" ELSE cast(array() as array<bigint>) END)"
    )
    per_doc = d.select("doc_id", F.expr(sh).alias("hs")).persist()
    # one-live-copy cache scope (the ngram_jaccard pattern): the
    # previous call's now-idle cache is released when the next call
    # arrives, so repeated invocations never accumulate blocks
    if _NOVELTY_BASE_PREV is not None:
        _NOVELTY_BASE_PREV.unpersist(blocking=False)
    _NOVELTY_BASE_PREV = per_doc
    firsts = (
        per_doc.select("doc_id", F.explode("hs").alias("h"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("first_doc"))
        .groupBy("first_doc")
        .agg(F.count(F.lit(1)).alias("n_novel"))
    )
    return (
        per_doc.select("doc_id", F.size("hs").alias("n_shingles"))
        .join(
            # doc-level equi-join (n_docs rows on both sides) — NOT
            # the (doc, shingle) pair multiset; at corpus scale this
            # shuffles two doc-keyed tables, the cheapest join there is
            firsts.select(F.col("first_doc").alias("doc_id"), "n_novel"),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            F.col("n_shingles").cast("long").alias("n_shingles"),
            F.coalesce("n_novel", F.lit(0)).cast("long").alias("n_novel"),
        )
    )


# ------------------------------------------------------ decayed counts

DECAY_BUCKET_US = 6 * 3600 * 1_000_000  # 6-hour age buckets
DECAY_HALFLIFE_BUCKETS = 4  # half-life = 1 day
DECAY_MAX_AGE = 40  # ages clamp here; 2^40 scale keeps BIGINTs exact


def q_decayed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed event counts per type (trending /
    freshness scoring): score = sum over events of 2^(-age/halflife).
    The float trap: summing per-event decay weights is accumulation-
    order-dependent — the exact class of nondeterminism the bm25/IVF
    rows closed.  Fix: ages are INTEGER buckets, so the score is
    sum(count_b * 2^(max_age - age_b)) / 2^max_age — the numerator an
    order-free exact BIGINT (counts < 9e6 at 2^40 stay under 2^63),
    ONE float division at the very end.  halflife = 4 buckets means
    the exponent uses age div 4; the fractional remainder is folded
    by bucketing (documented coarseness, not hidden float error).

    Scale shape: one groupBy(event_type, age_bucket) — map-side
    combined onto a types x ages table that is CORPUS-SIZE-INDEPENDENT
    — then the scaled-integer sum per type.  Ages anchor to max(ts)
    (one O(1) scalar agg), so the operator is a pure function of the
    stream."""
    raw = _load_wide(spark, sf_dir, "events")
    anchor = raw.agg(F.max("ts")).collect()[0][0]
    a_lit = anchor.strftime("%Y-%m-%d %H:%M:%S.%f")
    hl, mx = DECAY_HALFLIFE_BUCKETS, DECAY_MAX_AGE
    bucketed = raw.select(
        "event_type",
        F.expr(
            f"least(cast(timestampdiff(MICROSECOND, ts,"
            f" TIMESTAMP_NTZ '{a_lit}') div {DECAY_BUCKET_US} div {hl}"
            f" as bigint), {mx})"
        ).alias("age"),
    )
    per = bucketed.groupBy("event_type", "age").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        per.groupBy("event_type")
        .agg(
            F.sum(
                # the 1 must be BIGINT: shiftleft on an INT literal
                # wraps 32-bit for shifts >= 31
                F.col("c")
                * F.expr(f"shiftleft(cast(1 as bigint), {mx} - age)")
            ).alias("num"),
            F.sum("c").alias("n_events"),
        )
        .select(
            "event_type",
            F.col("n_events").cast("long").alias("n_events"),
            F.col("num").cast("long").alias("decay_num"),
            F.round(F.col("num") / F.lit(float(2 ** mx)), 6).alias(
                "decayed_count"
            ),
        )
    )


# --------------------------------------------------- model-based quality

# "trained" quality-classifier coefficients shipped as constants — the
# fastText/classifier-filter stand-in (CCNet's LM filter, Llama's
# quality classifiers): the model is a broadcast constant, scoring is
# a pure projection.  Feature scaling keeps every logit in a range
# where exp() is well-conditioned in both engines.
QL_W0 = -3.5
QL_W_NWORDS = 0.02   # per word, saturating via least() at 200
QL_W_MWL = 0.35      # mean word length
QL_W_ALPHA = 2.0     # alphabetic fraction
QL_W_STOP = 0.25     # distinct stopword hits


def q_quality_logit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality scoring: a logistic classifier over the
    Gopher-style signals, evaluated as ONE codegen projection with the
    coefficient vector inlined (at scale: broadcast) — how learned
    quality filters actually deploy, vs q_quality_filter's rule gate.

    Float discipline (bm25/pmi): features are exact or 4-dp-rounded
    rationals, the logit is assembled in ONE fixed multiply-add order,
    and both engines evaluate the identical sigmoid double before the
    6-dp round — exp() has agreed bit-for-bit across Spark and DuckDB
    everywhere ln() has (bm25, pmi rows)."""
    d = _load_wide(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n = F.size(toks)
    mwl = F.round(
        F.aggregate(toks, F.lit(0), lambda a, w: a + F.length(w)) / n, 4
    )
    alpha = F.round(
        F.size(F.filter(toks, lambda t: t.rlike("^[a-zA-Z]+$"))) / n, 4
    )
    stop = F.size(
        F.array_intersect(toks, F.array(*[F.lit(s) for s in QF_STOPWORDS]))
    )
    logit = (
        F.lit(QL_W0)
        + F.lit(QL_W_NWORDS) * F.least(n, F.lit(200))
        + F.lit(QL_W_MWL) * mwl
        + F.lit(QL_W_ALPHA) * alpha
        + F.lit(QL_W_STOP) * stop
    )
    return d.select(
        "doc_id",
        F.round(logit, 6).alias("logit"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6).alias("score"),
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)) >= 0.5)
        .cast("long")
        .alias("keep"),
    )


# ------------------------------------------------ edit-distance verify

ED_VARIANT_MOD = 50   # docs doc_id % 50 == 9 get a one-word-edited copy
ED_MAX_DIST = 30      # accept pairs within this Levenshtein radius


def _ed_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents plus injected near-duplicate variants: each variant
    copies its source with the 5th word replaced — past the 3-token
    blocking prefix, so the pair stays in one block and the edit is a
    single bounded substitution."""
    d = _load_wide(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split("text", " ")
    edited = F.array_join(
        F.concat(
            F.slice(toks, 1, 4),
            F.array(F.lit("EDITED")),
            F.slice(toks, 6, F.size(toks)),
        ),
        " ",
    )
    variants = d.filter(
        (F.col("doc_id") % ED_VARIANT_MOD == 9)
        & (F.size(toks) >= 6)
    ).select(
        (F.col("doc_id") + 20_000_000).alias("doc_id"), edited.alias("text")
    )
    return d.unionByName(variants)


def q_editdist_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate verification by EXACT edit distance on blocked
    candidate pairs — the verify half of every candidate-generate /
    verify dedup pipeline (the LSH rows generate; this row is the
    expensive exact check that only ever runs on pairs): block on the
    first-3-token prefix, self-join WITHIN blocks (a, b ordered so
    each pair appears once), keep pairs with levenshtein <= 30.

    Scale shape: the O(len^2) DP runs ONLY on blocked pairs — the
    blocking equi-join is the single corpus shuffle and block sizes
    are the skew to watch (a salted variant would cap them; the
    fixture's blocks are 1-2 docs).  Both engines ship the identical
    classical Levenshtein, so the gate pins the DISTANCES, not just
    the pair set.  Injected variants (5th word replaced, +20M ids)
    guarantee non-vacuous within-radius pairs; unrelated docs sharing
    a block verify OUT."""
    docs = _ed_docs(spark, sf_dir)
    keyed = docs.select(
        "doc_id",
        "text",
        F.array_join(F.slice(F.split("text", " "), 1, 3), " ").alias("blk"),
    )
    a = keyed.select(
        F.col("doc_id").alias("a_id"), F.col("text").alias("a_text"), "blk"
    )
    b = keyed.select(
        F.col("doc_id").alias("b_id"), F.col("text").alias("b_text"), "blk"
    )
    pairs = a.join(b, "blk").filter(F.col("a_id") < F.col("b_id"))
    return (
        pairs.select(
            "a_id",
            "b_id",
            F.levenshtein("a_text", "b_text").cast("long").alias("dist"),
        )
        .filter(F.col("dist") <= ED_MAX_DIST)
    )


# ------------------------------------------------------- snapshot diff


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot diff (crawl N vs crawl N+1): classify every URL
    as added / removed / changed / unchanged — the audit every
    incremental-crawl ingest publishes next to its upsert.  Built on
    the SAME _crawl_version_frames synthesis as crawl_upsert /
    crawl_upsert_stream / scd2_history (plus a deterministic removal
    class: doc_id % 9 == 5 drops out of crawl 1), so all four
    lakehouse-maintenance surfaces share one fixture and cannot
    drift.

    Scale shape: digests computed at scan (bodies never move), ONE
    full-outer hash join on doc_id, classification a pure projection.
    The status counts every crawl report needs are a 4-row rollup of
    this output."""
    d = _load_wide(spark, sf_dir, "documents").select("doc_id", "text")
    base, refetch, new = _crawl_version_frames(d)
    snap0 = base.select("doc_id", F.col("content_digest").alias("d0"))
    snap1_updates = refetch.unionByName(new).select(
        "doc_id", F.col("content_digest").alias("d1")
    )
    # crawl 1 = crawl 0 carried forward, minus removals, plus updates
    carried = snap0.filter(F.col("doc_id") % 9 != 5).select(
        "doc_id", F.col("d0").alias("d1")
    )
    snap1 = (
        carried.join(snap1_updates, "doc_id", "left_anti")
        .unionByName(snap1_updates)
    )
    j = snap0.join(snap1, "doc_id", "full_outer")
    return j.select(
        "doc_id",
        F.when(F.col("d0").isNull(), F.lit("added"))
        .when(F.col("d1").isNull(), F.lit("removed"))
        .when(F.col("d0") == F.col("d1"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("status"),
        F.coalesce("d1", "d0").alias("digest"),
    )


# -------------------------------------------- stream-stream attribution

_ATTRIB_STREAM_TMP_ROOT = None


def q_attrib_join_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked STREAM-STREAM inner join under the driver gate
    (9th streaming surface; streaming/jobs.py::attrib_join_stream) —
    the one API class the other eight don't cover: TWO unbounded
    inputs with join state buffered on both sides, bounded by the
    event-time range condition + watermarks.  Fixture: impressions =
    the events stream's 'view' rows, clicks = its 'click' rows; a
    click attributes to every same-user impression at most 30 minutes
    older.  INNER-join emission is not watermark-gated, so the
    availableNow replay must equal the batch join's exact multiset —
    which is precisely what the DuckDB oracle computes.  delay_us is
    an integer difference, so the gate is timezone- and float-free."""
    import shutil
    import tempfile

    from ocular_spark.streaming.jobs import attrib_join_stream

    global _ATTRIB_STREAM_TMP_ROOT
    ev = _load(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    imps = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("imp_user"),
        F.col("event_id").alias("imp_id"),
        F.col("ts").alias("imp_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("click_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )

    if _ATTRIB_STREAM_TMP_ROOT is not None:
        shutil.rmtree(_ATTRIB_STREAM_TMP_ROOT, ignore_errors=True)
    root = tempfile.mkdtemp(prefix="ocular_attrib_stream_")
    _ATTRIB_STREAM_TMP_ROOT = root
    imps_dir = os.path.join(root, "imps")
    clicks_dir = os.path.join(root, "clicks")
    out_dir = os.path.join(root, "out")
    ckpt = os.path.join(root, "ckpt")
    imps.write.parquet(imps_dir)
    clicks.write.parquet(clicks_dir)
    q = attrib_join_stream(spark, imps_dir, clicks_dir, out_dir, ckpt)
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("stream-stream attribution join timed out")
    return spark.read.parquet(out_dir).select(
        "user_id", "imp_id", "click_id", "delay_us"
    )


# ------------------------------------------------ pivot / window classes

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot / crosstab: per-user event-type breakdown as WIDE columns
    (count + value sum per type) — the reshape class none of the other
    rows cover (BI-style crosstab; also the feature-vector layout step
    before a per-user model).  The pivot value list is EXPLICIT
    (_EVENT_TYPES): Spark otherwise runs a separate distinct-discovery
    job over the full table first, and an unbounded type vocabulary
    would make the output width data-dependent — both wrong at 100 TB.
    With the list pinned, Spark plans two exchanges — (user_id,
    event_type) then user_id — but map-side partial aggregation
    reduces the stream to <= |types| rows per user BEFORE the first
    one, so the raw table moves zero times and both shuffles carry
    only the reduced crosstab cells.  Sums are exact integer cents
    (floor(value*100), the order-free construction every money row
    uses), so the gate is float-free.  Missing (user, type) combos:
    Spark's pivot yields NULL (empty group), the oracle's conditional
    aggregation yields 0/NULL — both sides land on COALESCE(..., 0)
    so absent means zero, pinned identically in both engines."""
    e = _load(spark, sf_dir, "events")
    piv = (
        e.select(
            "user_id",
            "event_type",
            F.expr("cast(floor(value * 100) as bigint)").alias("cents"),
        )
        .groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("cents"),
        )
    )
    cols = [F.col("user_id")]
    for t in _EVENT_TYPES:
        cols.append(F.coalesce(F.col(f"{t}_n"), F.lit(0)).alias(f"{t}_n"))
        cols.append(
            F.coalesce(F.col(f"{t}_cents"), F.lit(0)).alias(f"{t}_cents")
        )
    return piv.select(*cols)


def q_rolling_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame rolling window: per event, the count and value sum
    of the SAME user's events in the trailing hour (value-based frame
    [ts-3599s, ts] — ROWS frames can't express a time horizon when
    event spacing is irregular).  Event times are mapped to integer
    seconds from a fixed anchor via timestampdiff, which is timezone-
    free on naive timestamps (the _sessionize lesson) and truncates
    identically to DuckDB's date_diff boundary count; peers at equal
    truncated seconds are frame-mates in BOTH engines by RANGE
    semantics, so the result is order-independent.  Sums are integer
    cents (order-free).  One shuffle on user_id; the frame scan is a
    per-partition sliding two-pointer inside Spark's window exec —
    no cross-user state, so a pathological user bounds one task, not
    the stage (same skew posture as sessionization)."""
    from pyspark.sql.window import Window

    e = _load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.expr(
            "timestampdiff(SECOND, TIMESTAMP '2024-01-01 00:00:00', ts)"
        ).alias("ts_sec"),
        F.expr("cast(floor(value * 100) as bigint)").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_sec")
        .rangeBetween(-3599, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts_sec",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.sum("cents").over(w).alias("cents_1h"),
    )


def q_html_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-metadata extraction (the head-of-page complement to the
    main-content rows): title / meta-description / canonical URL /
    html@lang / anchor count pulled from deterministic crawl pages
    synthesized per document (functions/html.py wrap_meta — one ||/
    CASE string valid verbatim in both engines).  Every 5th page has
    NO meta description, pinning cross-engine no-match semantics
    (regexp_extract group 1 -> '' in Spark AND DuckDB).  Pure JVM
    regex projection over the scan: no shuffle, no Python,
    whole-stage-codegen'd — at 100 TB this runs at parquet-scan
    speed, the map-side metadata pass every crawl pipeline starts
    with."""
    from ocular_spark.functions import html as H

    d = _load_wide(spark, sf_dir, "documents")
    wrapped = d.select(
        "doc_id", F.expr(H.wrap_meta("text", "doc_id", "lang", "source"))
        .alias("html")
    )
    cols = H.meta_cols("html", size_fn="size")
    return wrapped.select(
        "doc_id",
        F.expr(cols["lang_attr"]).alias("lang_attr"),
        F.expr(cols["title"]).alias("title"),
        F.expr(cols["description"]).alias("description"),
        F.expr(cols["canonical"]).alias("canonical"),
        F.expr(cols["n_links"]).cast("long").alias("n_links"),
    )


_CUSUM_K = 10000   # reference level (cents): the in-control mean
_CUSUM_H = 30000   # alarm threshold (cents)


def q_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM drift/changepoint detection per user (Page 1954): the
    one-sided statistic S_i = max(0, S_{i-1} + x_i - k), alarm when
    S_i > h.  The recursion looks inherently sequential, but it
    LINEARIZES: with c_i the plain prefix sum of (x_i - k),
    S_i = c_i - min(0, min_{j<=i} c_j) — so Spark computes it as two
    stacked window passes (cumulative sum, then cumulative min) with
    NO recursion, no UDF, no state: the trick that makes per-entity
    drift detection a shuffle-once window job at 100 TB instead of a
    sequential fold.  The DuckDB oracle runs the NAIVE recursion
    itself (recursive CTE stepping rank-by-rank) — a genuinely
    different algorithm, so the gate proves the linearization, not
    just engine agreement; tests/test_cusum_twap.py re-proves it
    against a plain-Python fold.  All arithmetic is integer cents."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e = (
        _load(spark, sf_dir, "events")
        .select(
            "user_id",
            "ts",
            "event_id",
            (
                F.expr("cast(floor(value * 100) as bigint)")
                - F.lit(_CUSUM_K)
            ).alias("d"),
        )
        .withColumn("rn", F.row_number().over(w))
        .withColumn("c", F.sum("d").over(cum))
        .withColumn("m", F.min("c").over(cum))
        .withColumn("s", F.col("c") - F.least(F.col("m"), F.lit(0)))
    )
    alarm = F.col("s") > _CUSUM_H
    return e.groupBy("user_id").agg(
        F.sum(F.when(alarm, 1).otherwise(0)).alias("n_alarms"),
        F.max("s").alias("max_cusum"),
        F.coalesce(
            F.min(F.when(alarm, F.col("rn"))), F.lit(0)
        ).alias("first_alarm_rn"),
    )


def q_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user (the TWAP shape: each
    observation holds until the next one, so its weight is the gap to
    the successor — a step-function integral, not a row mean).  The
    last observation has no successor and integrates to zero width.
    Emitted as an exact integer (numerator in cents*seconds,
    denominator in seconds) so the gate is float-free; consumers
    divide.  One shuffle on user_id; lead() + groupBy, no state."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
    e = (
        _load(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_id",
            F.expr(
                "timestampdiff(SECOND, TIMESTAMP '2024-01-01 00:00:00', ts)"
            ).alias("ts_sec"),
            F.expr("cast(floor(value * 100) as bigint)").alias("cents"),
        )
        .withColumn(
            "dur",
            F.coalesce(F.lead("ts_sec").over(w) - F.col("ts_sec"), F.lit(0)),
        )
    )
    return e.groupBy("user_id").agg(
        F.sum(F.col("cents") * F.col("dur")).alias("twap_num"),
        F.sum("dur").alias("twap_dur"),
        F.count(F.lit(1)).alias("n_obs"),
    )


_ZM_LO = "1997-01-01"
_ZM_HI = "1997-12-31"


def q_zone_map_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map / manifest pruning planner (the Iceberg file-skipping
    decision, north-rule storage layer): rows are laid into synthetic
    files in INGEST order with realistic jitter (file key = shipdate
    day + an orderkey-dependent 0-44-day offset, 60-day files — so
    neighboring files overlap, the layout real append-only tables
    get), per-file min/max shipdate stats are aggregated, and a fixed
    predicate (shipdate in 1997) is planned against the STATS ONLY:
    'skip' when the range proves no row can match, 'full' when it
    proves every row matches (predicate evaluation elided), else
    'scan'.  n_match (the true per-file selectivity) rides along so
    the gate also proves the plan SOUND: skip => 0 matches, full =>
    all rows match — pinned by tests/test_zone_map.py.  At 100 TB the
    stats aggregation is the one-off manifest build (map-side partial
    agg, one shuffle on file_id); planning itself reads manifests,
    never data."""
    li = _load(spark, sf_dir, "lineitem")
    stats = (
        li.withColumn(
            "file_id",
            F.expr(
                "(datediff(l_shipdate, DATE '1995-01-01')"
                " + l_orderkey % 45) div 60"
            ),
        )
        .withColumn(
            "is_match",
            F.when(
                (F.col("l_shipdate") >= F.lit(_ZM_LO).cast("timestamp"))
                & (
                    F.col("l_shipdate")
                    <= F.lit(_ZM_HI + " 23:59:59").cast("timestamp")
                ),
                1,
            ).otherwise(0),
        )
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("is_match").alias("n_match"),
            F.date_format(F.min("l_shipdate"), "yyyy-MM-dd")
            .alias("min_ship"),
            F.date_format(F.max("l_shipdate"), "yyyy-MM-dd")
            .alias("max_ship"),
        )
    )
    # ISO day strings compare lexicographically == chronologically,
    # so the planner rule is pure string CASE logic over the manifest
    verdict = (
        F.when(
            (F.col("max_ship") < _ZM_LO) | (F.col("min_ship") > _ZM_HI),
            F.lit("skip"),
        )
        .when(
            (F.col("min_ship") >= _ZM_LO) & (F.col("max_ship") <= _ZM_HI),
            F.lit("full"),
        )
        .otherwise(F.lit("scan"))
    )
    return stats.select(
        "file_id",
        "n_rows",
        "n_match",
        "min_ship",
        "max_ship",
        verdict.alias("verdict"),
    )


_MERKLE_P = 1_000_000_007


def q_merkle_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-entropy / replica-diff digests (the Merkle leaf level a
    lakehouse uses to find divergent key ranges without moving rows):
    lineitem is bucketed by orderkey, each row hashed with an ENGINE-
    AGNOSTIC polynomial over its business columns (no xxhash64 — the
    digest must be recomputable by any system holding the data), and
    per-bucket digests are order-free modular SUMS, so the aggregation
    is commutative: map-side partial agg, one shuffle on bucket, and
    two replicas compare 64 rows instead of 60 M.  Scale note: a
    64-bit sum of P-sized terms overflows past ~9e9 rows/bucket; at
    that scale the digest combiner re-mods per partial (treeAggregate
    shape) — here the direct sum is exact and ANSI-safe."""
    li = _load(spark, sf_dir, "lineitem")
    # keys reduce mod P BEFORE the multiply: raw orderkeys at
    # 10^12-row scale would overflow the BIGINT product (ANSI throws);
    # reduced, the largest term is ~2.7e18 < 2^63
    rowhash = (
        f"pmod((l_orderkey % {_MERKLE_P}) * 2654435761"
        " + l_linenumber * 97531"
        " + cast(floor(l_quantity * 100) as bigint) * 1009"
        " + cast(floor(l_extendedprice * 100) as bigint) * 31,"
        f" {_MERKLE_P})"
    )
    return (
        li.select(
            F.expr("pmod(l_orderkey, 64)").alias("bucket"),
            F.expr(rowhash).alias("h"),
            "l_orderkey",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr(f"pmod(sum(h), {_MERKLE_P})").alias("digest"),
            F.min("l_orderkey").alias("min_key"),
            F.max("l_orderkey").alias("max_key"),
        )
    )


def q_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill imputation (last observation carried forward): a
    deterministic subset of readings is nulled (event_id % 7 == 0 —
    the sensor-dropout fixture) and each gap is filled with the same
    user's most recent non-null value; leading gaps stay null and are
    flagged.  This is the IGNORE NULLS window-frame class: one
    last(ignorenulls) over (user, time) — no self-join, no state, one
    shuffle; at 100 TB it's the standard telemetry-repair pass."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    e = _load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.when(
            F.col("event_id") % 7 != 0,
            F.expr("cast(floor(value * 100) as bigint)"),
        ).alias("cents_raw"),
    )
    filled = F.last("cents_raw", ignorenulls=True).over(w)
    return e.select(
        "event_id",
        "user_id",
        filled.alias("cents_filled"),
        (F.col("cents_raw").isNull() & filled.isNotNull())
        .alias("was_imputed"),
    )


_DEBOUNCE_GAP = 600  # suppression window, seconds


def q_debounce_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debounce / cooldown suppression per user: keep an event only if
    >= 600 s have passed since the LAST KEPT event — the alerting /
    notification-throttling rule.  Unlike sessionization this fold
    does NOT linearize (each keep depends on the previous keep, not
    the previous row), so the Spark side runs it as a vectorized
    per-user applyInPandas fold — the honest batch shape for an
    inherently sequential per-entity rule, parallel ACROSS users
    (shuffle on user_id, one pass per group, memory O(group)).  The
    oracle steps the same rule row-by-row in a recursive CTE: two
    independent algorithms, one result.  Kept-count + the exact kept
    set are what the gate hashes; integer seconds only."""
    import pandas as pd

    def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
        # applyInPandas hands the WHOLE user group in one frame (the
        # state-safety contract a mapInPandas batch stream lacks)
        pdf = pdf.sort_values(["ts_sec", "event_id"])
        keep, last = [], None
        for eid, uid, sec in zip(
            pdf["event_id"].to_numpy(),
            pdf["user_id"].to_numpy(),
            pdf["ts_sec"].to_numpy(),
        ):
            if last is None or sec - last >= _DEBOUNCE_GAP:
                last = sec
                keep.append((int(eid), int(uid), int(sec)))
        return pd.DataFrame(keep, columns=["event_id", "user_id", "ts_sec"])

    e = _load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.expr(
            "timestampdiff(SECOND, TIMESTAMP '2024-01-01 00:00:00', ts)"
        ).alias("ts_sec"),
    )
    return e.groupBy("user_id").applyInPandas(
        fold, schema="event_id bigint, user_id bigint, ts_sec bigint"
    )


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts over per-user event
    sequences (the user-journey matrix behind funnel design and
    next-event models): lag(event_type) within (user, time) order,
    then count per (prev, cur) pair with a synthetic '_start' state
    for each user's first event.  One shuffle to order each user's
    history + one tiny aggregation over |types|^2 keys — at 100 TB
    the output is 36 rows regardless of input size, so the final agg
    is map-side-combined to almost nothing."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = _load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    return (
        e.withColumn(
            "prev_type",
            F.coalesce(F.lag("event_type").over(w), F.lit("_start")),
        )
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n_trans"))
    )


def q_sales_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE / grouping-sets aggregation over orders (the OLAP
    rollup-lattice surface the plain ROLLUP row doesn't cover): all
    four (status × priority) marginal combinations in ONE pass —
    Spark expands grouping sets BEFORE the shuffle so the table is
    still read once, with partial aggregation per set.  GROUPING()
    flags disambiguate 'subtotal' from a hypothetical NULL key, the
    standard lattice-consumer contract; totals in exact cents."""
    o = _load(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderstatus",
            "o_orderpriority",
            F.expr("cast(floor(o_totalprice * 100) as bigint)")
            .alias("cents"),
        )
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("sum_cents"),
            F.grouping("o_orderstatus").alias("g_status"),
            F.grouping("o_orderpriority").alias("g_priority"),
        )
    )


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-quota stratified sampling (the eval-set carve-out that
    must keep every language represented): per lang stratum, quota =
    max(1, n/10) docs chosen by a deterministic engine-agnostic hash
    order (LCG over doc_id — xxhash64 would not be recomputable by
    the oracle), so tiny strata are never starved the way a global
    10% Bernoulli sample starves them.  One shuffle on lang; the
    rank-within-stratum window serializes a stratum onto one task —
    the documented skew posture shared with sessionization (a
    pathological stratum bounds one task, not the stage)."""
    from pyspark.sql.window import Window

    # doc_id is reduced mod 2^31-1 BEFORE the multiply: at 10^12-doc
    # scale the raw product would overflow BIGINT (ANSI mode throws);
    # reduced, the product tops out near 2.4e18 < 2^63
    d = _load_wide(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.expr(
            "((doc_id % 2147483647) * 1103515245 + 12345) % 2147483647"
        ).alias("h"),
    )
    w = Window.partitionBy("lang").orderBy("h", "doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "quota",
            F.greatest(
                F.lit(1),
                F.expr(
                    "count(1) over (partition by lang) div 10"
                ).cast("int"),
            ),
        )
        .filter(F.col("rn") <= F.col("quota"))
        .select("doc_id", "lang", F.col("rn").cast("long").alias("rn"))
    )


def q_cooccurrence_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite projection (user × event_type -> type co-occurrence
    graph, the 'users who did X also did Y' edge list): distinct the
    bipartite edges first — THE scale move: the self-join then runs on
    |users|·|types| rows instead of raw events, and both join sides
    share the user_id partitioning so the join is co-located, no
    second shuffle.  Canonical a < b ordering halves the output and
    makes it deterministic.  Per-user join-group width is bounded by
    |types| (5), so heavy users cannot blow up a task — the quadratic
    blowup that kills naive projections is capped by the type
    vocabulary, and that bound is the operator's 100 TB contract.

    Implementation: NOT a self-join.  collect_set per user (ONE
    shuffle, partial-aggregated map-side so raw events reduce to <=
    |types| entries per user per partition), then the pair expansion
    runs inside an array expression on the per-user set — capped at
    C(|types|,2) — and the pair counts aggregate over tiny keys.  Two
    exchanges total vs the naive self-join's four (measured); the
    DuckDB oracle IS that self-join, so the gate also crosses
    algorithms."""
    sets = (
        _load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.array_sort(F.collect_set("event_type")).alias("types"))
    )
    pairs = sets.select(
        F.explode(
            F.expr(
                "flatten(transform(types, (x, i) ->"
                " transform(slice(types, i + 2, size(types)),"
                " y -> struct(x AS type_a, y AS type_b))))"
            )
        ).alias("p")
    )
    return pairs.groupBy(
        F.col("p.type_a").alias("type_a"),
        F.col("p.type_b").alias("type_b"),
    ).agg(F.count(F.lit(1)).alias("n_users"))


def q_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier life table for time-to-first-purchase with right
    censoring (retention analytics in its statistically honest form —
    users who never purchased are CENSORED at their last observed
    event, not dropped): per user, duration = days from first event
    to first purchase (event=1) or to last event (censored, event=0);
    then the day-indexed table (n_risk, n_events, n_censored) where
    n_risk counts users still under observation — total minus everyone
    who exited strictly earlier.  All integers (day buckets, counts);
    the survival product is a trivial post-step for consumers.  Two
    shuffles: per-user reduce, then the tiny day-table window."""
    from pyspark.sql.window import Window

    e = _load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.expr(
            "timestampdiff(SECOND, TIMESTAMP '2024-01-01 00:00:00', ts)"
        ).alias("sec"),
    )
    per_user = e.groupBy("user_id").agg(
        F.min("sec").alias("t0"),
        F.max("sec").alias("t_last"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("sec"))
        ).alias("t_purchase"),
    )
    durs = per_user.select(
        F.when(
            F.col("t_purchase").isNotNull(),
            (F.col("t_purchase") - F.col("t0")),
        )
        .otherwise(F.col("t_last") - F.col("t0"))
        .alias("dur_sec"),
        F.col("t_purchase").isNotNull().cast("int").alias("event"),
    ).select(
        F.expr("dur_sec div 86400").alias("day"),
        "event",
    )
    day_tbl = durs.groupBy("day").agg(
        F.sum("event").alias("n_events"),
        F.sum(F.lit(1) - F.col("event")).alias("n_censored"),
    )
    # n_risk at day t = everyone exiting at day >= t: one suffix-sum
    # window over the DAY TABLE (size = distinct days, ~hundreds), so
    # the global unpartitioned sort is on the tiny aggregate, never
    # the per-user data
    w_risk = Window.orderBy("day").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    exited = F.col("n_events") + F.col("n_censored")
    return day_tbl.select(
        "day",
        F.sum(exited).over(w_risk).alias("n_risk"),
        "n_events",
        "n_censored",
    )


def q_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-of-intervals coverage per user (total seconds of activity
    when each event opens a variable-length window — the
    utilization/uptime measure where naive SUM(length) double-counts
    overlaps): the classic sweep — sort intervals by start, keep the
    running max of prior ends, and each interval contributes only the
    part past that frontier: greatest(0, end - greatest(start,
    prev_frontier)).  Contained intervals (a long window swallowing a
    later short one — lengths vary 60..659 s by event_id so they
    genuinely occur) contribute exactly 0.  One shuffle on user_id,
    one window pass, all integers; the frontier max is
    order-insensitive over the preceding SET, so same-start ties
    cannot change the sum."""
    from pyspark.sql.window import Window

    e = _load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.expr(
            "timestampdiff(SECOND, TIMESTAMP '2024-01-01 00:00:00', ts)"
        ).alias("s"),
    ).withColumn("e", F.col("s") + 60 + F.col("event_id") % 600)
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    contrib = F.greatest(
        F.lit(0),
        F.col("e")
        - F.greatest(F.col("s"), F.coalesce(F.max("e").over(w_prev),
                                            F.col("s"))),
    )
    return (
        e.withColumn("contrib", contrib)
        .groupBy("user_id")
        .agg(
            F.sum("contrib").alias("covered_sec"),
            F.count(F.lit(1)).alias("n_intervals"),
            (F.max("e") - F.min("s")).alias("span_sec"),
        )
    )


_DEBOUNCE_STREAM_TMP_ROOT = None


def q_debounce_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming cooldown suppression (11th streaming surface,
    streaming/jobs.py::debounce_stream): the debounce_events rule as
    hand-managed per-user state — ONE bigint per user (last kept
    second).  The availableNow one-batch replay emits exactly the
    batch fold's kept set, so this row shares the batch row's
    recursive-CTE oracle VERBATIM: the gate's claim is precisely that
    the streaming state machine and the batch fold implement one
    rule.  The cross-restart law (suppression continues from
    checkpointed state; kept rows never re-emit) is pinned by
    tests/test_debounce_stream.py."""
    import shutil
    import tempfile

    from ocular_spark.streaming.jobs import debounce_stream

    global _DEBOUNCE_STREAM_TMP_ROOT
    e = _load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.expr(
            "timestampdiff(SECOND, TIMESTAMP '2024-01-01 00:00:00', ts)"
        ).alias("ts_sec"),
    )

    if _DEBOUNCE_STREAM_TMP_ROOT is not None:
        shutil.rmtree(_DEBOUNCE_STREAM_TMP_ROOT, ignore_errors=True)
    root = tempfile.mkdtemp(prefix="ocular_debounce_stream_")
    _DEBOUNCE_STREAM_TMP_ROOT = root
    in_dir = os.path.join(root, "events")
    out_dir = os.path.join(root, "out")
    ckpt = os.path.join(root, "ckpt")
    e.coalesce(1).write.parquet(in_dir)
    q = debounce_stream(spark, in_dir, out_dir, ckpt, gap=_DEBOUNCE_GAP)
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("streaming debounce did not finish in 600s")
    return spark.read.parquet(out_dir)


_FD_CANDIDATES = [
    ("event_id", "user_id"),      # key FD: holds by construction
    ("user_id", "event_type"),    # behavioral: should fail
    ("event_type", "user_id"),    # reverse direction: should fail
]


def q_fd_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency DISCOVERY profiling (the schema-mining
    complement to contract_audit's declared rules): for each candidate
    det -> dep, the g3 violation measure — the minimum number of rows
    to delete so the FD holds, computed as sum over det groups of
    (group size - the group's plurality dep count).  Two aggregations
    per candidate ((det,dep) counts, then det rollup), both
    partial-aggregated; the final table is |candidates| rows.  Exact
    integers; a holds flag for the profiler's verdict.  This is how a
    100 TB pipeline learns candidate keys and denormalization-safe
    columns without a catalog."""
    e = _load(spark, sf_dir, "events")
    parts = []
    for det, dep in _FD_CANDIDATES:
        pair = (
            e.groupBy(F.col(det).alias("det"), F.col(dep).alias("dep"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        per_det = pair.groupBy("det").agg(
            F.sum("cnt").alias("n"),
            F.max("cnt").alias("plurality"),
        )
        parts.append(
            per_det.agg(
                F.lit(f"{det}->{dep}").alias("fd"),
                F.count(F.lit(1)).alias("n_groups"),
                F.sum("n").alias("n_rows"),
                (F.sum("n") - F.sum("plurality")).alias("n_violations"),
                (F.sum("n") == F.sum("plurality")).alias("holds"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ------------------------------------------------- AUC model evaluation

AUC_NW_THRESHOLD = 30  # label rule: long-doc indicator ...
AUC_NOISE_MOD = 7      # ... XOR a deterministic noise flip (doc_id % 7 == 3)


def q_auc_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC per language via the Mann-Whitney rank statistic
    — the evaluation step every learned filter (quality_logit, lang_id
    confidence, dedup scorers) needs before its threshold ships.
    Score = word count, label = (n_words >= 30) XOR (doc_id % 7 == 3)
    — correlated with deterministic noise so 0.5 < AUC < 1.0 and both
    error classes occur.

    Ties handled exactly by midranks kept INTEGER: for a tie group
    with rank_lt docs strictly below and n members, twice the average
    rank is 2*rank_lt + n + 1 (an integer), so twice the positive
    rank-sum R2 = sum(n_pos_v * (2*rank_lt_v + n_v + 1)) is an exact
    BIGINT and AUC = (R2 - n_pos*(n_pos+1)) / (2*n_pos*n_neg) — one
    float division at the very end (auc_num/auc_den ride along so the
    gate is float-free up to that single op).

    Scale shape (the ecdf_normalize move): scores are quantized, so
    ranks come from the DOMAIN-sized distinct-value table — one
    map-side-combined groupBy(lang, s) is the only corpus-sized stage;
    the rank window sorts hundreds of rows, never the corpus.  The
    oracle computes the SAME statistic through per-row RANK()/COUNT()
    windows over the full table — a genuinely different algorithm
    (row-wise midranks vs value-table prefix sums) that agrees only if
    the midrank algebra is right.  tests/test_auc_ols.py re-proves
    both against brute-force pair counting (concordant + 0.5*ties)."""
    from pyspark.sql.window import Window

    d = _load_wide(spark, sf_dir, "documents")
    nw = F.size(F.split("text", " "))
    y = (
        (nw >= AUC_NW_THRESHOLD) != (F.col("doc_id") % AUC_NOISE_MOD == 3)
    ).cast("long")
    rows = d.select("lang", nw.cast("long").alias("s"), y.alias("y"))
    g = rows.groupBy("lang", "s").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("np")
    )
    w = Window.partitionBy("lang").orderBy("s")
    ranked = g.select(
        "lang", "n", "np",
        (F.sum("n").over(w) - F.col("n")).alias("rank_lt"),
    )
    per = ranked.groupBy("lang").agg(
        F.sum("np").alias("n_pos"),
        (F.sum("n") - F.sum("np")).alias("n_neg"),
        F.sum(
            F.col("np") * (F.lit(2) * F.col("rank_lt") + F.col("n") + 1)
        ).alias("r2"),
    )
    num = F.col("r2") - F.col("n_pos") * (F.col("n_pos") + 1)
    den = F.lit(2) * F.col("n_pos") * F.col("n_neg")
    return per.filter((F.col("n_pos") > 0) & (F.col("n_neg") > 0)).select(
        "lang",
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
        num.cast("long").alias("auc_num"),
        den.cast("long").alias("auc_den"),
        F.round(num / den, 6).alias("auc"),
    )


# ------------------------------------------- closed-form OLS trend fit


def q_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type daily-volume trend: simple linear regression
    (count = a + b*day) fitted in CLOSED FORM from the five algebraic
    sufficient statistics (n, Σx, Σy, Σxy, Σx²) — the regression
    deploy shape at 10^12 rows: no iterative solver, no driver-side
    matrix, every statistic an order-free exact BIGINT with map-side
    partial aggregation.  slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²) and
    intercept = (Σy·slope_den − slope_num·Σx) / (n·slope_den) ride
    along as exact integer rationals; the two float divisions happen
    once at the end (6 dp).

    Scale shape: groupBy(event_type, day) count is the only
    corpus-sized stage (map-side combined onto a types × days table);
    the sufficient-statistic rollup runs over that tiny table.  The
    driver-side MIN(ts) anchor is one O(1) scalar agg (decayed_counts
    precedent).  tests/test_auc_ols.py cross-checks the rational
    algebra against DuckDB's built-in REGR_SLOPE/REGR_INTERCEPT — an
    independent (Welford-style streaming) implementation."""
    raw = _load_wide(spark, sf_dir, "events")
    d0 = raw.agg(F.min(F.to_date("ts"))).collect()[0][0]
    daily = raw.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit(d0.strftime("%Y-%m-%d")).cast("date"))
        .cast("long")
        .alias("x"),
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    s = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    s_num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    s_den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    i_num = F.col("sy") * s_den - s_num * F.col("sx")
    i_den = F.col("n") * s_den
    return s.filter(F.col("n") >= 2).select(
        "event_type",
        F.col("n").alias("n_days"),
        s_num.cast("long").alias("slope_num"),
        s_den.cast("long").alias("slope_den"),
        F.round(s_num / s_den, 6).alias("slope"),
        i_num.cast("long").alias("icept_num"),
        i_den.cast("long").alias("icept_den"),
        F.round(i_num / i_den, 6).alias("icept"),
    )


# --------------------------------------------- reciprocal-rank fusion

RRF_K0 = 60    # the standard RRF damping constant (Cormack et al. 2009)
RRF_TOPK = 20  # per-ranker candidate depth


def q_rrf_fuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid-retrieval fusion: Reciprocal Rank Fusion (Cormack,
    Clarke & Buettcher, SIGIR 2009) of two independent rankers — the
    BM25 lexical top-20 (q_bm25_topk, reused verbatim so the lists
    cannot drift) and a quality ranker (n_chars DESC) standing in for
    the dense/semantic leg.  score(d) = Σ_r 1/(60 + rank_r(d)) over
    the lists containing d.

    Float discipline: with at most two terms the sum is an exact
    rational — both lists: num = 120+ra+rb, den = (60+ra)(60+rb);
    one list: num = 1, den = 60+r — carried as BIGINTs (rrf_num,
    rrf_den) with ONE float division at the end; the fused rank
    orders by that same single-division double with doc_id
    tiebreak, so the cut is deterministic in both engines.

    Scale shape: each ranker is TakeOrderedAndProject over its
    corpus-sized input (never a full sort); everything downstream —
    rank windows, the full-outer merge, the fused ordering — runs on
    ≤ 2k rows, corpus-size-independent.  This is how lexical+vector
    hybrid search actually composes at serving time."""
    from pyspark.sql.window import Window

    a = q_bm25_topk(spark, sf_dir)
    wa = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    ra = a.select(
        "doc_id", F.row_number().over(wa).cast("long").alias("ra")
    )
    d = _load_wide(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").cast("long").alias("q")
    )
    wb = Window.orderBy(F.desc("q"), F.asc("doc_id"))
    rb = (
        d.orderBy(F.desc("q"), F.asc("doc_id"))
        .limit(RRF_TOPK)
        .select("doc_id", F.row_number().over(wb).cast("long").alias("rb"))
    )
    j = ra.join(rb, "doc_id", "full_outer")
    both = F.col("ra").isNotNull() & F.col("rb").isNotNull()
    num = (
        F.when(both, F.lit(2 * RRF_K0) + F.col("ra") + F.col("rb"))
        .otherwise(F.lit(1))
        .cast("long")
    )
    den = (
        F.when(
            both, (F.lit(RRF_K0) + F.col("ra")) * (F.lit(RRF_K0) + F.col("rb"))
        )
        .otherwise(F.lit(RRF_K0) + F.coalesce(F.col("ra"), F.col("rb")))
        .cast("long")
    )
    s = j.select(
        "doc_id", "ra", "rb",
        num.alias("rrf_num"), den.alias("rrf_den"),
        F.round(num / den, 6).alias("rrf"),
    )
    wf = Window.orderBy(
        F.desc(F.col("rrf_num") / F.col("rrf_den")), F.asc("doc_id")
    )
    return s.select(
        "*", F.row_number().over(wf).cast("long").alias("fused_rank")
    )


# --------------------------------------- bottom-k (KMV) distinct sketch

BK_K = 32  # sketch size

# last persisted candidate DataFrame from q_bottomk_sketch — the
# ngram_jaccard one-live-copy convention: kept cached while the caller
# materializes the returned frame, dropped on the next invocation
_BK_CAND_PREV = None


def _bk_partition_bottomk(k: int):
    """Per-partition bottom-k fold (the _gtk_partition_topk superset
    law, ascending): any hash in the global per-type bottom-k is
    bottom-k within its own partition a fortiori, so the union of
    per-partition sketches is a superset of the global sketch.  Task
    memory stays O(k × types + one Arrow batch).

    The fold also CARRIES the partition's per-type row count out on
    the first emitted row of each type (w column, 0 elsewhere): the
    input is globally distinct, so sum(w) over all partitions is the
    exact distinct count — the estimator's ground truth rides the
    same single corpus pass instead of costing a second one."""
    import numpy as np

    def fn(batches):
        state = None
        counts: dict = {}
        for pdf in batches:
            for et, c in pdf["event_type"].value_counts().items():
                counts[et] = counts.get(et, 0) + int(c)
            cur = pdf if state is None else pd.concat(
                [state, pdf], ignore_index=True
            )
            cur = cur.sort_values(["event_type", "h"])
            state = cur.groupby("event_type", sort=False).head(k)
        if state is not None:
            state = state.sort_values(["event_type", "h"]).reset_index(
                drop=True
            )
            w = np.zeros(len(state), dtype=np.int64)
            first = (~state["event_type"].duplicated()).to_numpy()
            w[first] = [
                counts[et] for et in state.loc[first, "event_type"]
            ]
            state["w"] = w
            yield state

    return fn


def q_bottomk_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k / KMV distinct-value sketch per event type (Bar-Yossef
    et al. 2002; Beyer et al. SIGMOD 2007): keep the k=32 smallest
    52-bit md5 hashes of the distinct user set.  The sketch is
    MERGEABLE (bottom-k of a union == bottom-k of the union of
    sketches — the algebra that lets per-partition / per-day sketches
    roll up without touching raw data; pinned by tests/test_auc_ols.py)
    and yields the unbiased estimator DV ≈ (k−1)·M / h_(k) with
    M = 2^52; when a group holds fewer than k distinct values the
    sketch IS the exact answer.

    Gate: the full sketch CONTENTS row-by-row ((event_type, pos, h)),
    the exact distinct count, and the estimate — not just the scalar
    (the hll_distinct convention: the exact count is the gate's
    certificate, carried by the fold at zero extra passes).  Oracle
    ranks with a per-type ROW_NUMBER window over all distinct hashes;
    Spark never sorts a whole group: (1) distinct (type, h) pairs —
    the ONLY corpus-sized shuffle, map-side combined, also collapsing
    md5 collisions identically in both engines — (2) a mapInPandas
    per-partition bottom-k fold (superset + count-carry laws above),
    (3) the ≤ k × types × partitions survivor table is persisted
    (one-live-copy scope) and feeds the final window, the k-th-hash
    summary, and the exact-count rollup from ONE materialization."""
    from pyspark.sql.window import Window

    global _BK_CAND_PREV
    e = _load_wide(spark, sf_dir, "events")
    pairs = e.select(
        "event_type",
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 13), 16, 10)
        .cast("long")
        .alias("h"),
    ).distinct()
    if _BK_CAND_PREV is not None:  # previous call's cache, now idle
        _BK_CAND_PREV.unpersist(blocking=False)
    cand = pairs.mapInPandas(
        _bk_partition_bottomk(BK_K),
        schema="event_type string, h long, w long",
    ).persist()
    _BK_CAND_PREV = cand
    exact = cand.groupBy("event_type").agg(
        F.sum("w").cast("long").alias("n_distinct")
    )
    w = Window.partitionBy("event_type").orderBy(F.asc("h"))
    sk = cand.select(
        "event_type", "h", F.row_number().over(w).cast("long").alias("pos")
    ).filter(F.col("pos") <= BK_K)
    summ = sk.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_sketch"),
        F.max("h").alias("kth_hash"),
    )
    est = F.when(
        F.col("n_sketch") < BK_K, F.col("n_sketch").cast("double")
    ).otherwise(
        F.round(
            F.lit(float((BK_K - 1) * (1 << 52))) / F.col("kth_hash"), 6
        )
    )
    return (
        sk.join(F.broadcast(summ), "event_type")
        .join(F.broadcast(exact), "event_type")
        .select("event_type", "pos", "h", "n_distinct", est.alias("dv_est"))
    )


# ------------------------------------------- MMR result diversification

MMR_M = 5          # results to select
MMR_K = 12         # candidate pool depth (top-K by relevance)
MMR_SCALE = 1_000_000  # component quantization (exact int64 dots)


def _mmr_qvec(col):
    """Quantize a float32 embedding to int64 micro-units so every dot
    product is an exact order-free BIGINT (the embed_rproj / IVF
    floor-quantization discipline): |comp| <= 1 -> |q| <= 1e6, 64-dim
    dot <= 6.4e13, far below 2^63."""
    return F.transform(
        col, lambda x: F.floor(x.cast("double") * MMR_SCALE).cast("long")
    )


def _mmr_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    """Greedy MMR over one candidate group, all-integer: step 1 takes
    max relevance; step t takes argmax of rel_i - max_{s in S}
    dot(i, s) (lambda = 1/2 cancels into equal weights), ties broken
    by smaller vec_id.  The pairwise-sim matrix is one int64 GEMM over
    K rows — bounded by the candidate depth, never the corpus."""
    import numpy as np

    V = np.stack([np.asarray(x, dtype=np.int64) for x in pdf["qv"]])
    rel = pdf["rel"].to_numpy().astype(np.int64)
    ids = pdf["vec_id"].to_numpy().astype(np.int64)
    sims = V @ V.T  # exact int64
    sel: list = []
    remaining = list(range(len(ids)))
    rows = []
    for step in range(1, MMR_M + 1):
        vals = rel if step == 1 else rel - sims[:, sel].max(axis=1)
        i = min(remaining, key=lambda j: (-int(vals[j]), int(ids[j])))
        rows.append((step, int(ids[i]), int(rel[i]), int(vals[i])))
        sel.append(i)
        remaining.remove(i)
    return pd.DataFrame(
        rows, columns=["step", "vec_id", "rel", "mmr_value"]
    )


def q_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR 1998) — the retrieval post-processor that trades relevance
    against redundancy: from the top-K=12 cosine candidates for probe
    vec 0, greedily select M=5 maximizing rel(i) − max_{s∈S} sim(i,s).

    Everything is EXACT int64 (quantized components, integer dots), so
    the greedy argmax chain is float-free and bit-reproducible.  The
    oracle runs the SAME greedy as five UNROLLED SQL steps (the IVF
    Lloyd-unroll precedent) with correlated MAX-dot subqueries — a
    genuinely independent formulation of the selection recursion.

    Scale shape: relevance scoring + top-K are corpus-sized but
    declarative (broadcast probe, TakeOrderedAndProject); the greedy
    runs in one applyInPandas kernel over the K-row candidate group —
    at serving scale this parallelizes per query (groupBy(query_id)),
    each group bounded by K, never the corpus."""
    e = _load(spark, sf_dir, "embeddings")
    base = e.select("vec_id", _mmr_qvec(F.col("embedding")).alias("qv"))
    probe = base.filter(F.col("vec_id") == 0).select(
        F.col("qv").alias("probe")
    )
    rel = (
        base.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(probe))
        .select(
            "vec_id",
            "qv",
            F.aggregate(
                F.zip_with("qv", "probe", lambda a, b: a * b),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("rel"),
        )
    )
    cand = rel.orderBy(F.desc("rel"), F.asc("vec_id")).limit(MMR_K)
    return cand.groupBy(F.lit(1).alias("g")).applyInPandas(
        lambda pdf: _mmr_kernel(pdf),
        schema="step long, vec_id long, rel long, mmr_value long",
    )


# ------------------------------------- differentially-private release

DP_SALT = "dp-release-1"  # the seeded-noise secret (deploy: rotated key)
DP_B = 1.0                # Laplace scale = sensitivity/epsilon = 1/1


def q_dp_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private histogram release (Dwork et al. 2006):
    per-language doc counts + Laplace(b = sensitivity/ε = 1) noise via
    the inverse CDF −b·sgn(u−½)·ln(1−2|u−½|), with u derived from a
    keyed hash of the cell (md5, 52 bits, shifted into the OPEN
    interval (0,1) so ln never sees 0).  Seeded noise is the testable
    deploy shape for DP pipelines — the release is replayable from the
    secret, and swapping the salt for a per-release random key gives
    the production mechanism unchanged.

    Float discipline: u, u−½, 1−2|·|, ln, multiply — each step a
    single IEEE op written identically in both engines (ln agreement
    precedent: bm25/pmi); release rounded at 6 dp.  Scale: one
    map-side-combined groupBy onto the domain-sized cell table, then a
    pure projection."""
    d = _load_wide(spark, sf_dir, "documents")
    g = d.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("n"))
    h = F.conv(
        F.substring(F.md5(F.concat_ws("|", F.col("lang"), F.lit(DP_SALT))), 1, 13),
        16,
        10,
    ).cast("long")
    u = (h + F.lit(1)) / F.lit(float((1 << 52) + 2))
    c = u - F.lit(0.5)
    lap = -F.signum(c) * F.lit(DP_B) * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(c))
    return g.select(
        "lang",
        F.round(F.col("n") + lap, 6).alias("n_noisy"),
        F.lit(1.0).alias("epsilon"),
    )


# --------------------------------------------- training epoch shuffle

EPOCH_SHARDS = 8


def _epoch_shuffle_df(
    spark: SparkSession, sf_dir: str, epoch: int
) -> DataFrame:
    from pyspark.sql.window import Window

    d = _load_wide(spark, sf_dir, "documents")
    key = F.md5(
        F.concat_ws("|", F.lit(f"epoch{epoch}"), F.col("doc_id").cast("string"))
    )
    keyed = d.select(
        "doc_id",
        F.pmod(
            F.conv(F.substring(key, 1, 8), 16, 10).cast("long"),
            F.lit(EPOCH_SHARDS),
        ).alias("shard"),
        F.conv(F.substring(key, 9, 13), 16, 10).cast("long").alias("okey"),
    )
    w = Window.partitionBy("shard").orderBy("okey", "doc_id")
    return keyed.select(
        "shard",
        F.row_number().over(w).cast("long").alias("pos"),
        "doc_id",
        "okey",
    )


def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-loader epoch permutation contract: assign every
    doc to one of 8 output shards and give it a deterministic position
    inside the shard — hash-keyed on (epoch, doc_id) so every epoch is
    a DIFFERENT but fully reproducible global permutation (resume a
    crashed epoch mid-shard, re-run it bit-identically, shard i on any
    worker count).  This is how 10^12-doc training corpora are
    shuffled: NO global sort — one hash exchange onto shards, then a
    per-shard (= per-output-file) sort bounded by shard size, which is
    corpus_size / n_shards by the hash-balance law (pinned, with the
    permutation and epoch-decorrelation laws, by
    tests/test_s12_batch2.py)."""
    return _epoch_shuffle_df(spark, sf_dir, epoch=1)


# ------------------------------- experiment assignment + SRM guard

AB_EXP_SALT = "exp-holdout-1"
# chi-square(df=1) critical value at alpha=0.05, in 1/1000 units so the
# verdict is an exact integer cross-multiplication
AB_CHI2_CRIT_MILLI = 3841


def q_ab_assign_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experimentation infrastructure: deterministic 50/50 arm
    assignment (md5 of (user, experiment-salt) mod 2 — sticky across
    sessions/machines, no assignment table) plus the Sample-Ratio
    Mismatch guard per segment: with expected 50/50 and df=1 the
    chi-square statistic COLLAPSES to (n0 − n1)² / n, an exact integer
    rational, and the alpha=0.05 verdict is the cross-multiplication
    1000·(n0−n1)² > 3841·n — the entire test is float-free except the
    one reported division.  An SRM flag is the standard trigger to
    quarantine an experiment (assignment bug, bot filtering skew).

    Scale shape: distinct (segment, user) — the only corpus-sized
    shuffle, map-side combined — then arm is a projection and the
    counts land on a segment-sized table."""
    e = _load_wide(spark, sf_dir, "events")
    pairs = e.select("event_type", "user_id").distinct()
    arm = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.col("user_id").cast("string"),
                                  F.lit(AB_EXP_SALT))), 1, 13
            ),
            16, 10,
        ).cast("long") % 2
    )
    g = pairs.select("event_type", arm.alias("arm")).groupBy(
        "event_type"
    ).agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("long").alias("n0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("long").alias("n1"),
    )
    diff2 = (F.col("n0") - F.col("n1")) * (F.col("n0") - F.col("n1"))
    n = F.col("n0") + F.col("n1")
    return g.select(
        "event_type", "n0", "n1",
        diff2.cast("long").alias("srm_num"),
        n.cast("long").alias("srm_den"),
        F.round(diff2 / n, 6).alias("srm_chi2"),
        (F.lit(1000) * diff2 > F.lit(AB_CHI2_CRIT_MILLI) * n)
        .cast("long").alias("srm_flag"),
    )


# ------------------------------- Fellegi-Sunter record-linkage scoring

# log2(m/u) agreement and log2((1-m)/(1-u)) disagreement weights for
# the three comparison fields — "trained" model constants (the
# quality_logit deploy shape: broadcast constants, pure projection)
FS_W = {
    "lang": (2.0, -1.5),
    "source": (1.5, -1.0),
    "len": (1.0, -0.5),
}
FS_LEN_BUCKET = 64   # n_chars bucket width for the length field
FS_THRESHOLD = 2.0   # classify as match at/above this score


def q_linkage_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probabilistic record linkage (Fellegi & Sunter, JASA 1969):
    candidate pairs from the editdist_verify 3-token blocks (blocking
    = the linkage scale move: the O(len²) comparison space never
    materializes, only within-block pairs), each scored by the sum of
    per-field agreement/disagreement log-likelihood weights over
    (lang, source, n_chars bucket).  With fixed per-field weights the
    score is a sum of THREE constants selected by agreement bits,
    assembled in one fixed order — the accumulation-order float class
    is structurally absent.  The same injected near-dup variants the
    edit-distance row verifies give true matches; unrelated docs
    sharing a 3-token prefix give the non-match mass.

    Scale shape: block keys are a projection; the self-join shuffles
    once on the block key with per-block width bounded by the blocking
    discipline; scoring is a pure projection."""
    docs = _ed_docs(spark, sf_dir)
    d = _load_wide(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    # variants inherit their source row's fields (same lang/source;
    # n_chars differs by the one-word edit — recompute from text)
    base = docs.join(
        d.select(F.col("doc_id").alias("src_id"), "lang", "source"),
        F.pmod(F.col("doc_id"), F.lit(20_000_000)) == F.col("src_id"),
    ).select(
        "doc_id", "text", "lang", "source",
        F.length("text").cast("long").alias("len_chars"),
    )
    keyed = base.select(
        "doc_id", "lang", "source",
        # integer division in BOTH engines (div / //) — a double-cast
        # here would hit the CAST round-vs-truncate seam
        F.expr(f"len_chars div {FS_LEN_BUCKET}").alias("len_b"),
        F.array_join(F.slice(F.split("text", " "), 1, 3), " ").alias("blk"),
    )
    a, b = [
        keyed.select(*[F.col(c).alias(f"{p}_{c}") for c in keyed.columns])
        for p in ("a", "b")
    ]
    pairs = a.join(b, F.col("a_blk") == F.col("b_blk")).filter(
        F.col("a_doc_id") < F.col("b_doc_id")
    )
    agree = {
        "lang": (F.col("a_lang") == F.col("b_lang")),
        "source": (F.col("a_source") == F.col("b_source")),
        "len": (F.col("a_len_b") == F.col("b_len_b")),
    }
    score = None
    for f in ("lang", "source", "len"):  # FIXED assembly order
        t = F.when(agree[f], F.lit(FS_W[f][0])).otherwise(F.lit(FS_W[f][1]))
        score = t if score is None else score + t
    return pairs.select(
        F.col("a_doc_id").alias("a_id"),
        F.col("b_doc_id").alias("b_id"),
        agree["lang"].cast("long").alias("agree_lang"),
        agree["source"].cast("long").alias("agree_source"),
        agree["len"].cast("long").alias("agree_len"),
        F.round(score, 6).alias("score"),
        (score >= FS_THRESHOLD).cast("long").alias("is_match"),
    )


# --------------------------------------- probability calibration bins

CAL_BINS = 10


def q_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram for the quality_logit classifier against
    the auc_eval label — calibration is the OTHER half of model
    evaluation (AUC measures discrimination; a model can rank well
    and still lie about probabilities).  Per decile bin of predicted
    probability: count, positives, the exact micro-unit sum of
    predictions (6-dp scores ×1e6 are integer-valued doubles, so the
    BIGINT sum is exact and order-free), observed rate and mean
    prediction with ONE division each.

    Scale: rides the quality_logit projection; one map-side-combined
    groupBy onto a 10-row table."""
    scored = q_quality_logit(spark, sf_dir).select("doc_id", "score")
    d = _load_wide(spark, sf_dir, "documents")
    nw = F.size(F.split("text", " "))
    lab = d.select(
        "doc_id",
        ((nw >= AUC_NW_THRESHOLD) != (F.col("doc_id") % AUC_NOISE_MOD == 3))
        .cast("long")
        .alias("y"),
    )
    j = scored.join(lab, "doc_id").select(
        F.least(
            F.floor(F.col("score") * CAL_BINS).cast("long"),
            F.lit(CAL_BINS - 1),
        ).alias("bin"),
        # ROUND before the integer cast: score*1e6 is integer-valued
        # only up to float representation (…99999), and bare CAST
        # truncates in Spark but rounds in DuckDB
        F.round(F.col("score") * 1_000_000).cast("long").alias("p_micro"),
        "y",
    )
    g = j.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("n_pos"),
        F.sum("p_micro").cast("long").alias("sum_p_micro"),
    )
    return g.select(
        "bin", "n", "n_pos", "sum_p_micro",
        F.round(F.col("n_pos") / F.col("n"), 6).alias("obs_rate"),
        F.round(F.col("sum_p_micro") / (F.col("n") * F.lit(1_000_000)), 6)
        .alias("mean_pred"),
    )


# -------------------------------- degree distribution + power-law tail

PL_DMIN = 3            # Hill tail cutoff (degree >= d_min; the sf0.01
                       # graph has degree-2 nodes, so the cutoff is real)
PL_LN_SCALE = 10**9    # ln quantization for the exact tail sum


def q_degree_powerlaw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-graph degree statistics: the in-degree histogram of the
    extracted doc->doc link graph plus the Hill MLE tail exponent
    alpha = 1 + n / Σ ln(d_i/d_min) over nodes with degree >= d_min —
    the power-law diagnostic every crawl-graph pipeline publishes
    (hub detection, crawler-trap triage, sampling design).

    Float discipline: ln is evaluated once per DISTINCT degree (a
    deterministic double both engines agree on — bm25 ln precedent),
    quantized to 1e-9 units, and the tail sum is an exact BIGINT of
    count × quantized-ln products — the accumulation-order class is
    closed the decayed_counts way.  ONE division at the end.

    The extracted crawl links alone form a near-REGULAR graph (the
    synthetic pages link uniformly — 2 distinct degrees), which would
    make a tail estimator vacuous; a deterministic HUB overlay is
    unioned in (every doc also links to doc_id mod 2^k for k=1..9),
    giving in-degrees spanning ~N/2 down to the cutoff — a genuine
    heavy tail with dozens of distinct degree values, synthesized
    identically in both engines.

    Scale shape: edges and in-degrees are the corpus-sized stages
    (one distinct + one groupBy, both map-side combined); the
    histogram, tail sum, and alpha all live on the DOMAIN-sized
    degree table."""
    from ocular_spark.functions import html as H

    d = _load_wide(spark, sf_dir, "documents")
    wrapped = d.select(
        "doc_id", F.expr(H.wrap_links_spark()).alias("html")
    )
    crawl = wrapped.select(
        F.col("doc_id").alias("src"),
        F.explode(F.expr(H.doc_links_expr("html"))).alias("dd"),
    ).select("src", F.col("dd").cast("long").alias("dst"))
    hubs = d.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.array(*[F.pmod(F.col("doc_id"), F.lit(1 << k)) for k in range(1, 10)])
        ).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    edges = crawl.unionByName(hubs).distinct()
    indeg = edges.groupBy("dst").agg(
        F.count(F.lit(1)).cast("long").alias("degree")
    )
    hist = indeg.groupBy("degree").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes")
    )
    lnq = F.round(
        F.log(F.col("degree") / F.lit(float(PL_DMIN))) * PL_LN_SCALE
    ).cast("long")
    summ = (
        hist.filter(F.col("degree") >= PL_DMIN)
        .select("n_nodes", (F.col("n_nodes") * lnq).alias("c"))
        .agg(
            F.sum("n_nodes").cast("long").alias("n_tail"),
            F.sum("c").cast("long").alias("ln_sum_q"),
        )
        .filter(F.col("ln_sum_q") > 0)
        .select(
            "n_tail",
            "ln_sum_q",
            F.round(
                F.lit(1.0)
                + (F.col("n_tail") * F.lit(PL_LN_SCALE)) / F.col("ln_sum_q"),
                6,
            ).alias("alpha"),
        )
    )
    return hist.crossJoin(F.broadcast(summ)).select(
        "degree",
        "n_nodes",
        (F.col("degree") >= PL_DMIN).cast("long").alias("in_tail"),
        "n_tail",
        "alpha",
    )


# ------------------------------------------- right-to-be-forgotten purge

FORGET_MOD, FORGET_RESIDUE = 11, 3  # the deletion list: user_id % 11 == 3


def _forget_purged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The purged events table: one anti-join on the deletion
    predicate.  At lakehouse scale this is the MERGE DELETE / file
    rewrite; the predicate form keeps it partition-prunable."""
    e = _load_wide(spark, sf_dir, "events")
    return e.filter(
        ~(F.col("user_id") % FORGET_MOD == FORGET_RESIDUE)
    )


def q_forget_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compliance deletion (GDPR/CCPA right-to-be-forgotten): purge
    every event of the listed users and emit the TOMBSTONE MANIFEST —
    the auditable record (who, how many rows, activity span) that
    deletion pipelines must produce *while deleting the data itself*.
    The manifest intentionally carries counts and day spans, never
    content.  tests/test_s12_batch4.py pins the purge laws: no listed
    user survives in _forget_purged, non-listed rows are untouched,
    and dropped + remaining == total.

    Scale shape: the deletion predicate is a pure filter (no
    deletion-list join needed for predicate-definable lists; an
    explicit list would broadcast); the manifest is one
    map-side-combined groupBy over only the deleted slice."""
    e = _load_wide(spark, sf_dir, "events")
    listed = e.filter(F.col("user_id") % FORGET_MOD == FORGET_RESIDUE)
    return listed.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows_dropped"),
        F.countDistinct(F.to_date("ts")).cast("long").alias("n_days_active"),
        F.countDistinct("event_type").cast("long").alias("n_types"),
    )


# --------------------------------------------- CDC apply (full MERGE)

CDC_NEW_OFFSET = 100_000


def _cdc_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesized change log over the documents snapshot, exercising
    every MERGE branch INCLUDING the two that upsert rows don't:
    DELETE, and INSERT-after-DELETE (tombstone resurrection).
      seq 1: update doc_id%4==1 -> ' v2'
      seq 2: delete doc_id%9==5
      seq 3: second update doc_id%8==1 -> ' v3' (last-wins over seq 1),
             insert new keys doc_id%10==3 at +CDC_NEW_OFFSET
      seq 4: re-insert doc_id%18==5 ('resurrected:') over seq-2 deletes

    The resurrection is its OWN transaction (seq 4), not part of the
    seq-3 wave: doc_id ≡ 41 (mod 72) satisfies BOTH %8==1 and %18==5,
    so a seq-3 resurrection would give one key two ops with equal seq
    and the max_by winner would be engine-dependent (caught at
    sf0.001 by test_entry_parity — the sf0.01 gate was green by
    accident of tie-iteration order).  A seq per transaction is also
    the honest CDC contract: real op logs are totally ordered per key.
    """
    d = _load(spark, sf_dir, "documents").select("doc_id", "text")
    u1 = d.filter(F.col("doc_id") % 4 == 1).select(
        "doc_id", F.lit(1).alias("seq"), F.lit("U").alias("op"),
        F.md5(F.concat(F.col("text"), F.lit(" v2"))).alias("digest"),
    )
    # deletes carry an EMPTY-STRING digest sentinel, not NULL: DuckDB's
    # arg_max skips NULL values while Spark's max_by does not — a
    # cross-engine seam this synthesis must not touch (delete rows are
    # filtered by last_op anyway, so the sentinel never escapes)
    d2 = d.filter(F.col("doc_id") % 9 == 5).select(
        "doc_id", F.lit(2).alias("seq"), F.lit("D").alias("op"),
        F.lit("").alias("digest"),
    )
    u3 = d.filter(F.col("doc_id") % 8 == 1).select(
        "doc_id", F.lit(3).alias("seq"), F.lit("U").alias("op"),
        F.md5(F.concat(F.col("text"), F.lit(" v3"))).alias("digest"),
    )
    i3 = d.filter(F.col("doc_id") % 10 == 3).select(
        (F.col("doc_id") + CDC_NEW_OFFSET).alias("doc_id"),
        F.lit(3).alias("seq"), F.lit("I").alias("op"),
        F.md5(F.concat(F.lit("new:"), F.col("text"))).alias("digest"),
    )
    r3 = d.filter(F.col("doc_id") % 18 == 5).select(
        "doc_id", F.lit(4).alias("seq"), F.lit("I").alias("op"),
        F.md5(F.concat(F.lit("resurrected:"), F.col("text"))).alias("digest"),
    )
    out = u1
    for part in (d2, u3, i3, r3):
        out = out.unionByName(part)
    return out


def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture apply: fold an ordered I/U/D op log onto a
    base snapshot — the FULL MERGE INTO semantics (crawl_upsert covers
    latest-version-wins upserts; this row adds the delete branch and
    the tombstone-resurrection seam, the two places naive MERGE
    implementations corrupt state).  Winner per key = the op with the
    highest seq (base rows are seq 0), applied as one declarative
    max_by argmax — map-side combinable, no window sort; deleted keys
    whose last op is D vanish; keys re-inserted after a delete
    survive with the new digest.

    Digests are computed at scan (the crawl_upsert discipline: bodies
    never shuffle).  Output carries last_seq + n_ops lineage so the
    apply is auditable."""
    d = _load_wide(spark, sf_dir, "documents").select("doc_id", "text")
    base = d.select(
        "doc_id", F.lit(0).alias("seq"), F.lit("I").alias("op"),
        F.md5("text").alias("digest"),
    )
    log = base.unionByName(_cdc_ops(spark, sf_dir))
    folded = log.groupBy("doc_id").agg(
        F.max_by("op", "seq").alias("last_op"),
        F.max_by("digest", "seq").alias("digest"),
        F.max("seq").cast("long").alias("last_seq"),
        F.count(F.lit(1)).cast("long").alias("n_ops"),
    )
    return folded.filter(F.col("last_op") != "D").select(
        "doc_id", "digest", "last_seq", "n_ops"
    )


# ------------------------------------- columnar encoding advisor

ENC_COLS = ("l_returnflag", "l_discount", "l_orderkey", "l_extendedprice")
ENC_DICT_RATIO = 10   # dict if ndv*10 <= n
ENC_RLE_RUN = 3       # rle  if n >= 3*n_runs (avg run >= 3)
# at sf0.01 the four columns land on dict/dict/rle/plain — all three
# verdicts occur (the zone_map_prune fixture lesson)


def q_encoding_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage physical-design advisor (the zone_map/compaction family):
    for each candidate column, compute the statistics a columnar
    writer needs to pick an encoding — row count, exact NDV, and the
    RUN count in the table's clustering order (runs are an order
    property: RLE pays off only if equal values are adjacent on disk)
    — then decide dict / rle / plain by integer cross-multiplied
    thresholds (dict when 10·ndv ≤ n; else rle when n ≥ 3·runs).

    Scale shape: ALL columns ride ONE sort — the clustering key plus
    the value columns themselves as tiebreaks, because
    (l_orderkey, l_linenumber) is NOT unique in this data and runs
    under a non-total order are nondeterministic (measured: two
    engines gave 39786 vs 39872 returnflag runs before the fix).
    The value-tiebroken order is also what a writer sorting within
    row groups could actually achieve.  And the sort is a
    DISTRIBUTED range sort, never a single-partition global window
    (the first draft's `Window.orderBy` moved the whole corpus to
    one task — the exact WindowExec warning the plan tests exist to
    catch): repartitionByRange + sortWithinPartitions gives every
    partition a contiguous slice of the global order, one Arrow
    kernel counts each slice's run boundaries on RAW values (a
    string cast would reintroduce engine-specific float formatting),
    and the P−1 partition seams are stitched driver-side from exact
    byte-encoded first/last values — O(P·cols) rows, the em.py
    assign_batches offsets pattern.  Ties that straddle a seam are
    safe: equal tuples compare equal, so the seam correction fires
    exactly when the run truly continues.  NDVs are
    map-side-combined distinct aggregates.  The decision table is
    O(columns) scalars, assembled driver-side (bm25 scalar
    precedent)."""
    li = _load_wide(spark, sf_dir, "lineitem")
    order_cols = ["l_orderkey", "l_linenumber"] + [
        c for c in ENC_COLS if c not in ("l_orderkey", "l_linenumber")
    ]
    stats = li.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        *[
            F.countDistinct(c).cast("long").alias(f"ndv_{c}")
            for c in ENC_COLS
        ],
    ).collect()[0]

    n_parts = max(2, int(spark.sparkContext.defaultParallelism))
    sliced = (
        li.select(*order_cols)
        .repartitionByRange(n_parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("pid", F.spark_partition_id())
    )
    cols = list(ENC_COLS)

    def _enc_bytes(v) -> bytes:
        import numpy as np

        if isinstance(v, (float, np.floating)):
            return np.float64(v).tobytes()
        if isinstance(v, (int, np.integer)):
            return int(v).to_bytes(8, "little", signed=True)
        return str(v).encode("utf-8")

    def _runs_kernel(batches):
        local = {c: 0 for c in cols}
        first = {c: None for c in cols}
        last = {c: None for c in cols}
        pid = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf["pid"].iloc[0])
            for c in cols:
                s = pdf[c]
                cnt = int((s != s.shift()).sum())
                if last[c] is not None and s.iloc[0] == last[c]:
                    cnt -= 1  # run continues across Arrow batches
                local[c] += cnt
                if first[c] is None:
                    first[c] = s.iloc[0]
                last[c] = s.iloc[-1]
        if pid is None:
            return
        yield pd.DataFrame(
            {
                "pid": pid,
                "column": cols,
                "runs": [local[c] for c in cols],
                "first": [_enc_bytes(first[c]) for c in cols],
                "last": [_enc_bytes(last[c]) for c in cols],
            }
        )

    part_rows = sliced.mapInPandas(
        _runs_kernel,
        schema="pid int, column string, runs long, first binary, last binary",
    ).collect()
    by_col: dict[str, list] = {c: [] for c in cols}
    for r in part_rows:
        by_col[r["column"]].append((r["pid"], r["runs"], bytes(r["first"]), bytes(r["last"])))
    runs = {}
    for c in cols:
        parts = sorted(by_col[c])
        total = sum(p[1] for p in parts)
        # seam stitch: a partition's first row only opens a NEW run
        # if it differs from the previous partition's last row
        for prev, cur in zip(parts, parts[1:]):
            if cur[2] == prev[3]:
                total -= 1
        runs[f"r_{c}"] = total
    n = int(stats["n"])
    rows = []
    for c in ENC_COLS:
        ndv, nr = int(stats[f"ndv_{c}"]), int(runs[f"r_{c}"])
        enc = (
            "dict" if ndv * ENC_DICT_RATIO <= n
            else "rle" if n >= ENC_RLE_RUN * nr
            else "plain"
        )
        rows.append((c, n, ndv, nr, enc))
    return spark.createDataFrame(
        rows, schema="column string, n long, ndv long, n_runs long, encoding string"
    )


# ----------------------------------------- PSI distribution drift

PSI_LN_SCALE = 10**9


def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index drift monitor — the model-serving
    guard that compares the current traffic's category distribution
    against a reference window: PSI = Σ (p_i − q_i)·ln(p_i/q_i) over
    event types, reference = the first half of the time range vs
    current = the second (split at the midpoint microsecond), with
    +1 Laplace smoothing so empty categories stay defined.

    Exactness (the decayed_counts/degree_powerlaw device): with
    smoothed integer counts, p−q = (c_p·n_q − c_q·n_p)/(n_p·n_q) and
    ln(p/q) is ONE deterministic double per category quantized to
    1e-9; psi_num = Σ diff·lnq is an exact order-free BIGINT and PSI
    is one division.  (At 10^12 rows the products need the merkle
    re-mod treatment or a 1e-6 ln scale — documented, not hidden.)

    The driver gates the MECHANISM on the real halves (PSI ≈ 0 on
    stationary traffic is itself the law); tests/test_s12_batch5.py
    injects a category drop and pins that PSI moves two orders of
    magnitude."""
    from datetime import timedelta

    e = _load_wide(spark, sf_dir, "events")
    lo, hi = e.agg(F.min("ts"), F.max("ts")).collect()[0]
    lo_lit = lo.strftime("%Y-%m-%d %H:%M:%S.%f")
    # midpoint as INTEGER microseconds from min(ts): Python timedelta
    # division and SQL INTERVAL division round differently at odd
    # microsecond spans — integer offsets close the seam (the
    # interval_join device)
    mid_us = ((hi - lo) // timedelta(microseconds=1)) // 2
    tagged = e.select(
        "event_type",
        (
            F.expr(
                f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '{lo_lit}', ts)"
            )
            < mid_us
        ).cast("long").alias("is_ref"),
    )
    g = tagged.groupBy("event_type").agg(
        (F.sum("is_ref") + 1).cast("long").alias("c_ref"),
        (F.sum(F.lit(1) - F.col("is_ref")) + 1).cast("long").alias("c_cur"),
    )
    tot = g.agg(
        F.sum("c_ref").cast("long").alias("n_ref"),
        F.sum("c_cur").cast("long").alias("n_cur"),
    )
    j = g.crossJoin(F.broadcast(tot))
    diff = F.col("c_ref") * F.col("n_cur") - F.col("c_cur") * F.col("n_ref")
    lnq = F.round(
        F.log(
            (F.col("c_ref") * F.col("n_cur"))
            / (F.col("c_cur") * F.col("n_ref"))
        )
        * PSI_LN_SCALE
    ).cast("long")
    cells = j.select(
        "event_type", "c_ref", "c_cur",
        diff.cast("long").alias("diff_num"),
        lnq.alias("lnq"),
        "n_ref", "n_cur",
    )
    summ = cells.agg(
        F.sum(F.col("diff_num") * F.col("lnq")).cast("long").alias("psi_num"),
        F.max("n_ref").alias("nr"),
        F.max("n_cur").alias("nc"),
    ).select(
        "psi_num",
        F.round(
            F.col("psi_num")
            / (F.col("nr") * F.col("nc") * F.lit(float(PSI_LN_SCALE))),
            9,
        ).alias("psi"),
    )
    return cells.select(
        "event_type", "c_ref", "c_cur", "diff_num", "lnq"
    ).crossJoin(F.broadcast(summ))


# --------------------------------------- position-based attribution

ATTR_WINDOW_MIN = 1440  # 1-day window: sf0.01 yields k=1,2,3 shapes
ATTR_FIRST_BPS, ATTR_LAST_BPS, ATTR_MID_BPS = 4000, 4000, 2000


def q_position_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) marketing attribution: each purchase
    credits the views that preceded it within 30 minutes for the same
    user — 40% to the first touch, 40% to the last, 20% split across
    the middles — in exact integer BASIS POINTS that sum to 10000 per
    purchase by construction: middles get 2000 div (k−2) each and the
    integer remainder goes to the earliest middle (a deterministic
    rule both engines replay; k=1 → 10000, k=2 → 5000/5000).

    Scale shape: the touch/conversion join is the attrib_join_stream
    range join (bounded state); position ranks are windows over
    per-purchase groups bounded by the 30-minute window, never the
    corpus."""
    from pyspark.sql.window import Window

    e = _load_wide(spark, sf_dir, "events")
    v = e.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("touch_id"),
        F.col("ts").alias("v_ts"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    j = v.join(p, "user_id").filter(
        (F.col("v_ts") <= F.col("p_ts"))
        & (
            F.col("v_ts")
            >= F.col("p_ts") - F.expr(f"INTERVAL {ATTR_WINDOW_MIN} MINUTE")
        )
    )
    w = Window.partitionBy("purchase_id").orderBy("v_ts", "touch_id")
    ranked = j.select(
        "purchase_id", "touch_id",
        F.row_number().over(w).cast("long").alias("position"),
        F.count(F.lit(1)).over(Window.partitionBy("purchase_id"))
        .cast("long").alias("k"),
    )
    k, pos = F.col("k"), F.col("position")
    mid_each = F.expr(f"{ATTR_MID_BPS} div (k - 2)")
    mid_rem = F.lit(ATTR_MID_BPS) - mid_each * (k - 2)
    credit = (
        F.when(k == 1, F.lit(10000))
        .when(k == 2, F.lit(5000))
        .when(pos == 1, F.lit(ATTR_FIRST_BPS))
        .when(pos == k, F.lit(ATTR_LAST_BPS))
        .when(pos == 2, mid_each + mid_rem)
        .otherwise(mid_each)
    )
    return ranked.select(
        "purchase_id", "touch_id", "position", "k",
        credit.cast("long").alias("credit_bps"),
    )


# ------------------------------------------------ graded-ranking NDCG

NDCG_K = 20
NDCG_LN_SCALE = 10**9
# graded relevance = word-count bucket with deterministic noise (the
# auc_eval label device): rel0 = (nw>=30)+(nw>=60) in {0,1,2}; docs
# with doc_id%7==3 get 3-rel0, so grade 3 exists and the bm25 ranking
# is deliberately imperfect against it (0 < NDCG < 1, non-vacuous)
NDCG_NW_LO, NDCG_NW_HI, NDCG_NOISE_MOD = 30, 60, 7


def _ndcg_discount(k: int) -> int:
    """Position discount quantized to 1e9: round(1e9·ln2/ln(k+1)),
    half-up via floor(x+0.5) — the SAME literal formula the DuckDB
    oracle runs (FLOOR(x + 0.5)), so the constant table cannot drift
    the way Python's banker's round() vs SQL ROUND would."""
    import math

    return int(math.floor(NDCG_LN_SCALE * math.log(2.0) / math.log(k + 1.0) + 0.5))


def q_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@k curve (k=1..20) of the BM25 ranking against graded
    relevance labels — the ranking-quality metric (Järvelin &
    Kekäläinen 2002) that AUC (binary, rank-free) and calibration
    (score-scale) don't cover; together the three complete the eval
    triad every retrieval/filter stack ships with.

    Exactness: gains 2^rel−1 ∈ {0,1,3,7} are integers; the position
    discount 1/log2(k+1) is quantized to 1e-9 per position (the
    decayed_counts ln device — 20 deterministic constants, computed
    by the SAME floor(x·1e9+0.5) formula in both engines), so
    dcg_num = Σ gain·d_k and idcg_num (ideal = the corpus-wide
    top-20 grade multiset, which dominates any actual prefix
    position-wise) are exact order-free BIGINTs; ndcg = ONE division
    rounded in-engine at 9 dp.

    Scale shape: the ranking leg is q_bm25_topk reused VERBATIM (and
    its SQL embedded verbatim in the oracle — the rrf_fuse
    drift-proofing); relevance is one corpus projection; the ideal
    list is TakeOrderedAndProject(20); everything after is 20 rows
    assembled driver-side (bm25 scalar precedent)."""
    bm = q_bm25_topk(spark, sf_dir)
    d = _load_wide(spark, sf_dir, "documents")
    nw = F.size(F.split("text", " "))
    rel0 = (nw >= NDCG_NW_LO).cast("long") + (nw >= NDCG_NW_HI).cast("long")
    rel = (
        F.when(F.col("doc_id") % NDCG_NOISE_MOD == 3, F.lit(3) - rel0)
        .otherwise(rel0)
        .cast("long")
    )
    rels = d.select("doc_id", rel.alias("rel"))
    actual = [
        int(r["rel"])
        for r in rels.join(F.broadcast(bm.select("doc_id", "score")), "doc_id")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .collect()
    ]
    ideal = [
        int(r["rel"])
        for r in rels.orderBy(F.desc("rel"), F.asc("doc_id"))
        .limit(NDCG_K)
        .collect()
    ]
    gain = lambda r: (1 << r) - 1  # noqa: E731
    rows, dcg, idcg = [], 0, 0
    for k in range(1, min(NDCG_K, len(actual)) + 1):
        dk = _ndcg_discount(k)
        dcg += gain(actual[k - 1]) * dk
        idcg += gain(ideal[k - 1]) * dk
        rows.append((k, gain(actual[k - 1]), gain(ideal[k - 1]), dcg, idcg))
    out = spark.createDataFrame(
        rows,
        schema="k long, gain long, ideal_gain long, dcg_num long, idcg_num long",
    )
    return out.select(
        "*", F.round(F.col("dcg_num") / F.col("idcg_num"), 9).alias("ndcg")
    )


# --------------------------------------- market-basket association

BASKET_MIN_SUPPORT = 3  # pair support threshold (63 pairs at sf0.01)


def q_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over orders: for every part
    pair co-occurring in ≥3 orders, support / confidence / lift —
    the pairwise core of Agrawal-Srikant frequent-itemset mining,
    which is how recommenders and assortment planners read
    transaction logs.  lift = n_orders·c_ab/(c_a·c_b) rides as an
    exact BIGINT rational (lift_num/lift_den) with the rounded
    double alongside; confidences are one division each.

    Scale shape (the cooccurrence_graph device): distinct
    (order, part) → per-order sorted item arrays → i<j pair
    expansion INSIDE the array expression (pairs per order are
    C(items,2) with items ≤ 7 — bounded, no quadratic key group) →
    one groupBy(pa, pb); item supports are a 2k-row broadcast joined
    twice; n_orders is one scalar agg.  The oracle computes the same
    pairs by a genuinely different algorithm — an items×items
    self-join on order — so the array-expansion algebra is
    cross-checked, not mirrored."""
    li = _load_wide(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    n_orders = int(
        items.agg(F.countDistinct("l_orderkey")).collect()[0][0]
    )
    supp = items.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    baskets = items.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    pairs = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(ps, (x, i) -> "
                "transform(slice(ps, i + 2, size(ps)), "
                "y -> struct(x AS pa, y AS pb))))"
            )
        ).alias("pr")
    ).select(F.col("pr.pa").alias("pa"), F.col("pr.pb").alias("pb"))
    pc = (
        pairs.groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).cast("long").alias("c_ab"))
        .filter(F.col("c_ab") >= BASKET_MIN_SUPPORT)
    )
    sa = supp.select(F.col("l_partkey").alias("pa"), F.col("c").alias("c_a"))
    sb = supp.select(F.col("l_partkey").alias("pb"), F.col("c").alias("c_b"))
    j = pc.join(F.broadcast(sa), "pa").join(F.broadcast(sb), "pb")
    lift_num = F.lit(n_orders) * F.col("c_ab")
    lift_den = F.col("c_a") * F.col("c_b")
    return j.select(
        F.col("pa").cast("long").alias("pa"),
        F.col("pb").cast("long").alias("pb"),
        "c_ab", "c_a", "c_b",
        lift_num.cast("long").alias("lift_num"),
        lift_den.cast("long").alias("lift_den"),
        F.round(lift_num / lift_den, 9).alias("lift"),
        F.round(F.col("c_ab") / F.col("c_a"), 9).alias("conf_ab"),
        F.round(F.col("c_ab") / F.col("c_b"), 9).alias("conf_ba"),
    )


# ------------------------------------------ inter-rater agreement

KAPPA_NW_LO, KAPPA_NW_HI = 30, 60      # rater A: word-count buckets
KAPPA_NC_LO, KAPPA_NC_HI = 150, 300    # rater B: char-count buckets


def q_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa inter-rater agreement per language — the
    labeling-QA gate every human- or model-annotated dataset ships
    with (agreement corrected for chance).  The two 'raters' are two
    genuinely different measurements of the same latent size class:
    A buckets by word count (30/60), B by char count (150/300) —
    correlated but imperfect, so 0 < kappa < 1 in every language.

    Exactness: with integer confusion counts, kappa =
    (n·Σc_kk − Σ_k rA_k·rB_k) / (n² − Σ_k rA_k·rB_k) — carried as
    exact BIGINTs (kappa_num/kappa_den) with ONE division at 9 dp.

    Scale shape: ONE map-side-combined groupBy(lang, a, b) is the
    only corpus-sized stage; marginals, the pe join, and the kappa
    algebra run on ≤ langs×9 rows."""
    d = _load_wide(spark, sf_dir, "documents")
    nw = F.size(F.split("text", " "))
    ra = (
        (nw >= KAPPA_NW_LO).cast("long") + (nw >= KAPPA_NW_HI).cast("long")
    ).alias("ra")
    rb = (
        (F.length("text") >= KAPPA_NC_LO).cast("long")
        + (F.length("text") >= KAPPA_NC_HI).cast("long")
    ).alias("rb")
    cells = (
        d.select("lang", ra, rb)
        .groupBy("lang", "ra", "rb")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    per = cells.groupBy("lang").agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.when(F.col("ra") == F.col("rb"), F.col("c")).otherwise(0))
        .cast("long")
        .alias("agree"),
    )
    ma = cells.groupBy(
        F.col("lang").alias("lang_a"), F.col("ra").alias("cls_a")
    ).agg(F.sum("c").alias("m_a"))
    mb = cells.groupBy(
        F.col("lang").alias("lang_b"), F.col("rb").alias("cls_b")
    ).agg(F.sum("c").alias("m_b"))
    pe = (
        ma.join(
            mb,
            (F.col("lang_a") == F.col("lang_b"))
            & (F.col("cls_a") == F.col("cls_b")),
        )
        .select(
            F.col("lang_a").alias("lang"),
            (F.col("m_a") * F.col("m_b")).alias("p"),
        )
        .groupBy("lang")
        .agg(F.sum("p").cast("long").alias("pe_num"))
    )
    k = per.join(pe, "lang")
    num = F.col("n") * F.col("agree") - F.col("pe_num")
    den = F.col("n") * F.col("n") - F.col("pe_num")
    return k.select(
        "lang", "n", "agree", "pe_num",
        num.cast("long").alias("kappa_num"),
        den.cast("long").alias("kappa_den"),
        F.round(num / den, 9).alias("kappa"),
    )


# -------------------------------------- golden-record survivorship

GR_CLONE_OFF = 10_000_000   # exact-copy source-system offset
GR_VAR_A_OFF = 20_000_000   # edited-variant system A offset
GR_VAR_B_OFF = 30_000_000   # edited-variant system B offset


def _gr_universe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multi-source record universe for entity resolution:
    documents plus (a) the dedup_exact injector's exact clones
    (doc_id%100==7 at +10M — _with_injected_dup_docs reused verbatim)
    and (b) TWO one-word-edited variants per editdist-selected doc
    (doc_id%50==9): 'EDITED' at +20M (the _ed_docs device) and
    'AMENDED' at +30M — a third source system, which is what makes
    entities of size 3 exist and the transitive-closure step
    non-vacuous (linkage matches alone are all source↔variant pairs,
    measured 15/15 size-2 at sf0.01)."""
    d = _load_wide(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split("text", " ")

    def edited(word: str, off: int) -> DataFrame:
        t = F.array_join(
            F.concat(
                F.slice(toks, 1, 4),
                F.array(F.lit(word)),
                F.slice(toks, 6, F.size(toks)),
            ),
            " ",
        )
        return d.filter(
            (F.col("doc_id") % ED_VARIANT_MOD == 9) & (F.size(toks) >= 6)
        ).select((F.col("doc_id") + off).alias("doc_id"), t.alias("text"))

    clones = d.filter(F.col("doc_id") % 100 == 7).select(
        (F.col("doc_id") + GR_CLONE_OFF).alias("doc_id"), "text"
    )
    return d.unionByName(clones).unionByName(
        edited("EDITED", GR_VAR_A_OFF)
    ).unionByName(edited("AMENDED", GR_VAR_B_OFF))


def q_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden-record survivorship — the step AFTER matching that
    entity resolution ships: union the edges of two independent
    matchers (exact text digest; Fellegi-Sunter blocked field
    scoring with the linkage_score weights), transitively close them
    into entities (_cc_min_label — the dedup_cluster CC), then merge
    each entity's records by per-field survivorship rules: text
    survivor = longest (tie → min doc_id), lang/source = most
    frequent value (tie → lexicographic min) — the deterministic
    mode both engines replay.

    Scale shape: both matchers are block-bounded (digest groupBy;
    3-token-block self-join) — no all-pairs; CC runs on the matched
    edge graph, orders of magnitude smaller than the corpus; the
    survivor argmax is max(struct(len, −id)) (map-side combinable,
    no window) and the mode windows partition by entity, bounded by
    entity size.  Oracle: recursive-CTE reachability + window-rank
    survivorship — independent algorithms for both halves."""
    from pyspark.sql.window import Window

    u = _gr_universe(spark, sf_dir)
    # matcher 1: exact content digest (star edges to the group min)
    ex = (
        u.groupBy(F.md5("text").alias("h"))
        .agg(
            F.min("doc_id").alias("root"),
            F.collect_set("doc_id").alias("ids"),
        )
        .filter(F.size("ids") > 1)
        .select("root", F.explode("ids").alias("doc_id"))
        .filter(F.col("doc_id") != F.col("root"))
        .select(F.col("root").alias("a"), F.col("doc_id").alias("b"))
    )
    # matcher 2: FS field scoring over 3-token blocks (linkage_score
    # weights; fields resolved through pmod(id, 10M) so clones and
    # both variant systems inherit their source row's lang/source)
    flds = _load_wide(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("src_id"), "lang", "source"
    )
    base = u.join(
        flds, F.pmod(F.col("doc_id"), F.lit(GR_CLONE_OFF)) == F.col("src_id")
    ).select(
        "doc_id", "lang", "source",
        F.expr(f"length(text) div {FS_LEN_BUCKET}").alias("len_b"),
        F.array_join(F.slice(F.split("text", " "), 1, 3), " ").alias("blk"),
    )
    a, b = [
        base.select(*[F.col(c).alias(f"{p}_{c}") for c in base.columns])
        for p in ("a", "b")
    ]
    score = None
    for f, (wa, wd) in (
        ("lang", FS_W["lang"]), ("source", FS_W["source"]), ("len_b", FS_W["len"])
    ):
        t = F.when(F.col(f"a_{f}") == F.col(f"b_{f}"), F.lit(wa)).otherwise(
            F.lit(wd)
        )
        score = t if score is None else score + t
    fs = (
        a.join(b, F.col("a_blk") == F.col("b_blk"))
        .filter(F.col("a_doc_id") < F.col("b_doc_id"))
        .filter(score >= FS_THRESHOLD)
        .select(F.col("a_doc_id").alias("a"), F.col("b_doc_id").alias("b"))
    )
    pairs = ex.unionByName(fs).distinct()
    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    labels = _cc_min_label(edges)
    mem = labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("entity_id")
    ).join(
        base.select("doc_id", "lang", "source"), "doc_id"
    ).join(
        u.select("doc_id", F.length("text").cast("long").alias("len_chars")),
        "doc_id",
    )
    per = mem.groupBy("entity_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.max(
            F.struct(F.col("len_chars"), (-F.col("doc_id")).alias("neg"))
        ).alias("sv"),
    )
    surv = per.select(
        "entity_id", "n_members",
        (-F.col("sv.neg")).cast("long").alias("survivor_id"),
        F.col("sv.len_chars").cast("long").alias("survivor_len"),
    )

    def mode_of(col: str) -> DataFrame:
        cnt = mem.groupBy("entity_id", col).agg(F.count(F.lit(1)).alias("cnt"))
        w = Window.partitionBy("entity_id").orderBy(F.desc("cnt"), F.asc(col))
        return (
            cnt.select(
                "entity_id", col, F.row_number().over(w).alias("rn")
            )
            .filter(F.col("rn") == 1)
            .select("entity_id", F.col(col).alias(f"{col}_mode"))
        )

    return (
        surv.join(mode_of("lang"), "entity_id")
        .join(mode_of("source"), "entity_id")
        .select(
            F.col("entity_id").cast("long").alias("entity_id"),
            "n_members", "survivor_id", "survivor_len",
            "lang_mode", "source_mode",
        )
    )


# ----------------------------------------------- k-anonymity audit

KANON_K = 5
KANON_B0, KANON_B1 = 1000, 5000  # acctbal bucket widths, level 0 / 1


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (Sweeney 2002) over the customer
    quasi-identifiers (nation, market segment, account-balance
    bucket) with a two-step generalization ladder (Samarati's
    lattice walk): for every level-0 equivalence class report its
    size and k<5 violation flag, plus the sizes the class would have
    after (1) coarsening the balance bucket 1000→5000 and (2) also
    dropping nation — the audit output a privacy officer needs to
    pick the cheapest generalization that clears k.

    Exactness: buckets are FLOOR(bal/width) — the SAME literal
    formula in both engines (a bare integer CAST would hit the
    truncate-vs-round seam on negative balances); floor(floor(x/a)/b)
    = floor(x/(ab)) makes level-1 derivable from level-0 exactly.

    Scale shape: ONE corpus-sized groupBy (level 0); levels 1 and 2
    re-aggregate the class table (domain-sized, not corpus-sized) and
    join back broadcast."""
    c = _load_wide(spark, sf_dir, "customer")
    b0 = F.floor(F.col("c_acctbal") / KANON_B0).cast("long")
    cls0 = c.groupBy(
        F.col("c_nationkey").cast("long").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        b0.alias("bal_b"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    step = KANON_B1 // KANON_B0
    b1 = F.floor(F.col("bal_b") / F.lit(float(step))).cast("long")
    lvl0 = cls0.withColumn("bal_b1", b1)
    cls1 = lvl0.groupBy("nation", "segment", "bal_b1").agg(
        F.sum("n").cast("long").alias("n1")
    )
    cls2 = cls1.groupBy("segment", "bal_b1").agg(
        F.sum("n1").cast("long").alias("n2")
    )
    return (
        lvl0.join(F.broadcast(cls1), ["nation", "segment", "bal_b1"])
        .join(F.broadcast(cls2), ["segment", "bal_b1"])
        .select(
            "nation", "segment", "bal_b", "n",
            (F.col("n") < KANON_K).cast("long").alias("violates"),
            "n1",
            (F.col("n1") >= KANON_K).cast("long").alias("gen1_ok"),
            "n2",
            (F.col("n2") >= KANON_K).cast("long").alias("gen2_ok"),
        )
    )


# -------------------------------------------- seasonal anomaly flags

SEAS_MULT = 2  # flag hours above 2x / below 1/2x their seasonal mean


def q_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-baseline anomaly detection over event volumes: each
    (type, date, hour) cell is compared against its OWN seasonal
    stratum — the (type, day-of-week, hour) mean — and flagged when
    it exceeds 2× or falls below ½× that mean.  This is the
    monitoring layer cusum_drift (sequential) and rolling_stats
    (trailing window) don't give: a weekly-periodic baseline that
    doesn't flag every Saturday as a drop.

    Exactness: the comparisons are integer cross-multiplications
    (c·m > 2·s and 2·c·m < s, with m = stratum cell count and s =
    stratum sum) — no division anywhere.  Day-of-week is computed as
    days-since-epoch mod 7 in BOTH engines (Spark dayofweek is
    1=Sunday, DuckDB dow is 0=Sunday — the function seam is avoided,
    not papered over).

    Scale shape: one corpus groupBy onto (type, date, hour) cells;
    the baseline is a second agg over the CELL table (calendar-sized)
    joined back broadcast."""
    e = _load_wide(spark, sf_dir, "events")
    cells = e.groupBy(
        "event_type",
        F.to_date("ts").alias("d"),
        F.hour("ts").cast("long").alias("h"),
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    cells = cells.withColumn(
        "dw",
        (F.datediff(F.col("d"), F.lit("1970-01-01").cast("date")) % 7)
        .cast("long"),
    )
    baseline = cells.groupBy("event_type", "dw", "h").agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("c").cast("long").alias("s"),
    )
    j = cells.join(F.broadcast(baseline), ["event_type", "dw", "h"])
    hi = F.col("c") * F.col("m") > F.lit(SEAS_MULT) * F.col("s")
    lo = F.lit(SEAS_MULT) * F.col("c") * F.col("m") < F.col("s")
    return (
        j.filter(hi | lo)
        .select(
            "event_type",
            F.date_format("d", "yyyy-MM-dd").alias("d"),
            "h", "dw", "c", "m", "s",
            hi.cast("long").alias("flag_hi"),
            lo.cast("long").alias("flag_lo"),
        )
    )


# ----------------------------------------- classifier macro/micro F1

F1_Q_SCALE = 10**9


def q_macro_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision/recall/F1 + macro/micro rollups for the
    char-n-gram language classifier against gold labels — consuming
    q_lang_id_ngram's confusion matrix VERBATIM (the rrf_fuse
    drift-proofing), which closes the eval suite: AUC ranks, NDCG
    grades, calibration checks probabilities, kappa checks raters,
    and this row scores the multiclass decision itself.

    Exactness: tp/fp/fn are integers from the matrix; per class
    F1 = 2tp/(2tp+fp+fn) rides as a BIGINT rational; the MACRO row
    averages per-class F1s after quantizing each to 1e-9 (f1q =
    ROUND(2tp·1e9/(2tp+fp+fn)) — one deterministic double per class,
    the decayed_counts device), so macro_num = Σ f1q is exact and
    order-free; the MICRO row uses the SAME rational formula on the
    summed counts (for single-label multiclass it equals accuracy).

    Scale shape: everything runs on the classes×classes matrix —
    corpus-size-independent past the reused lang_id_ngram agg."""
    cm = q_lang_id_ngram(spark, sf_dir)
    by_true = cm.groupBy(F.col("lang").alias("label")).agg(
        F.sum("n_docs").cast("long").alias("row_n"),
        F.sum(F.when(F.col("pred_lang") == F.col("lang"), F.col("n_docs"))
              .otherwise(0)).cast("long").alias("tp"),
    )
    by_pred = cm.groupBy(F.col("pred_lang").alias("label")).agg(
        F.sum("n_docs").cast("long").alias("col_n")
    )
    per = by_true.join(by_pred, "label", "full_outer").select(
        "label",
        F.coalesce("tp", F.lit(0)).alias("tp"),
        (F.coalesce("col_n", F.lit(0)) - F.coalesce("tp", F.lit(0)))
        .alias("fp"),
        (F.coalesce("row_n", F.lit(0)) - F.coalesce("tp", F.lit(0)))
        .alias("fn"),
    )
    f1_num = F.lit(2) * F.col("tp")
    f1_den = F.lit(2) * F.col("tp") + F.col("fp") + F.col("fn")
    cls = per.select(
        "label", "tp", "fp", "fn",
        f1_num.cast("long").alias("f1_num"),
        f1_den.cast("long").alias("f1_den"),
        F.round(f1_num * F.lit(F1_Q_SCALE) / f1_den).cast("long")
        .alias("f1_q"),
        F.round(f1_num / f1_den, 9).alias("f1"),
    )
    micro = cls.agg(
        F.sum("tp").alias("tp"), F.sum("fp").alias("fp"),
        F.sum("fn").alias("fn"),
    ).select(
        F.lit("__micro__").alias("label"),
        F.col("tp").cast("long").alias("tp"),
        F.col("fp").cast("long").alias("fp"),
        F.col("fn").cast("long").alias("fn"),
        (F.lit(2) * F.col("tp")).cast("long").alias("f1_num"),
        (F.lit(2) * F.col("tp") + F.col("fp") + F.col("fn")).cast("long")
        .alias("f1_den"),
        F.round(
            F.lit(2) * F.col("tp") * F.lit(F1_Q_SCALE)
            / (F.lit(2) * F.col("tp") + F.col("fp") + F.col("fn"))
        ).cast("long").alias("f1_q"),
        F.round(
            F.lit(2) * F.col("tp")
            / (F.lit(2) * F.col("tp") + F.col("fp") + F.col("fn")),
            9,
        ).alias("f1"),
    )
    macro = cls.agg(
        F.sum("tp").alias("tp"), F.sum("fp").alias("fp"),
        F.sum("fn").alias("fn"), F.sum("f1_q").alias("mnum"),
        F.count(F.lit(1)).alias("k"),
    ).select(
        F.lit("__macro__").alias("label"),
        F.col("tp").cast("long").alias("tp"),
        F.col("fp").cast("long").alias("fp"),
        F.col("fn").cast("long").alias("fn"),
        F.col("mnum").cast("long").alias("f1_num"),
        (F.col("k") * F.lit(F1_Q_SCALE)).cast("long").alias("f1_den"),
        F.lit(None).cast("long").alias("f1_q"),
        F.round(F.col("mnum") / (F.col("k") * F.lit(F1_Q_SCALE)), 9)
        .alias("f1"),
    )
    return cls.unionByName(micro).unionByName(macro)


# ------------------------------------------ snapshot vacuum planner

VACUUM_RETAIN_DAYS = 7  # keep the last 7 daily snapshots


def q_vacuum_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-expiry vacuum planner — the lakehouse GC step
    (Iceberg expire_snapshots / Delta VACUUM): model the events table
    as MVCC state files, one per (user, active day), where a user's
    file is superseded the next day they have activity.  With daily
    snapshots and a retain-last-7 policy, a file is safe to delete
    iff its validity interval [day, next_day) ends at or before the
    oldest retained snapshot — since snapshots exist at every active
    day, the interval-overlap test collapses to ONE comparison
    (next_day ≤ min_retained), no snapshot×file join.

    Scale shape: files = one distinct over (user, day) (map-side
    combined); next_day = LEAD over per-user windows (bounded by a
    user's active days); min_retained is one scalar from the
    domain-sized distinct-day table.  Output carries n_events as the
    file-size proxy so the plan doubles as a reclaim estimate."""
    from pyspark.sql.window import Window

    e = _load_wide(spark, sf_dir, "events")
    files = e.groupBy(
        "user_id", F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    days = [
        r["d"]
        for r in files.select("d").distinct()
        .orderBy(F.desc("d")).limit(VACUUM_RETAIN_DAYS).collect()
    ]
    min_retained = min(days).strftime("%Y-%m-%d")
    w = Window.partitionBy("user_id").orderBy("d")
    led = files.withColumn("next_d", F.lead("d").over(w))
    vac = F.col("next_d").isNotNull() & (
        F.col("next_d") <= F.lit(min_retained).cast("date")
    )
    return led.select(
        "user_id",
        F.date_format("d", "yyyy-MM-dd").alias("d"),
        F.date_format("next_d", "yyyy-MM-dd").alias("next_d"),
        "n_events",
        vac.cast("long").alias("vacuum"),
    )


# ------------------------------------------- k-core decomposition

KCORE_K = 10        # core threshold
KCORE_CLIQUE = 14   # deterministic clique overlay (docs 0..13) so the
                    # K-core is non-empty: 13 mutual neighbors >= K
KCORE_MAX_ROUNDS = 30


def _kcore_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected simple graph for the peel: the degree_powerlaw edge
    universe (extracted crawl links + the hub overlay) symmetrized to
    (a < b) pairs, plus an all-pairs clique over docs 0..13."""
    from ocular_spark.functions import html as H

    d = _load_wide(spark, sf_dir, "documents")
    wrapped = d.select("doc_id", F.expr(H.wrap_links_spark()).alias("html"))
    crawl = wrapped.select(
        F.col("doc_id").alias("src"),
        F.explode(F.expr(H.doc_links_expr("html"))).alias("dd"),
    ).select("src", F.col("dd").cast("long").alias("dst"))
    hubs = d.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.array(*[F.pmod(F.col("doc_id"), F.lit(1 << k)) for k in range(1, 10)])
        ).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    clique = (
        d.filter(F.col("doc_id") < KCORE_CLIQUE)
        .select(F.col("doc_id").alias("src"))
        .join(
            d.filter(F.col("doc_id") < KCORE_CLIQUE)
            .select(F.col("doc_id").alias("dst")),
            F.col("src") < F.col("dst"),
        )
    )
    e0 = crawl.unionByName(hubs).filter(F.col("src") != F.col("dst"))
    und = e0.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).unionByName(clique.select(F.col("src").alias("a"), F.col("dst").alias("b")))
    return und.distinct()


def q_kcore_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core peel trace (Matula & Beck 1983; Batagelj-Zaveršnik):
    synchronously remove all nodes of degree < K, repeat to fixpoint;
    output every node with the ROUND it was peeled at (0 = survives
    in the K-core) and its degree at that moment (for survivors, the
    final in-core degree).  This is the graph-curation primitive
    crawl pipelines use to separate link-farm periphery from the
    densely-connected core — the iterative-peel sibling of the CC
    row's label propagation.

    Determinism: the peel is SYNCHRONOUS (all sub-K nodes of a round
    leave together), so the trace is unique — no tie-breaking.  The
    convergence probe is one scalar count per round, and per-round
    lineage is truncated with localCheckpoint (the _cc_min_label
    discipline).  The oracle unrolls 8 peel rounds as chained CTEs
    (the Lloyd-unroll precedent; the sf0.01 cascade fixes in 6 —
    pinned by tests) — a genuinely different formulation of the same
    recursion.

    Scale shape: per round ONE degree groupBy over surviving edges +
    one semi-join — all key-partitioned, map-side combined; rounds =
    O(peel depth), each O(|E_t|) with shrinking E_t."""
    und = _kcore_edges(spark, sf_dir).localCheckpoint()
    edges = und.select(F.col("a").alias("src"), F.col("b").alias("dst")) \
        .unionByName(und.select(F.col("b").alias("src"), F.col("a").alias("dst"))) \
        .localCheckpoint()
    # the node set is tracked EXPLICITLY (degree 0 via coalesce): a
    # node whose last edges vanish inside one round must still be
    # peeled, not silently dropped from the degree table
    nodes = edges.select(F.col("src").alias("node")).distinct().localCheckpoint()
    peeled_parts = []
    for rnd in range(1, KCORE_MAX_ROUNDS + 1):
        edeg = edges.groupBy(F.col("src").alias("node")).agg(
            F.count(F.lit(1)).cast("long").alias("edeg")
        )
        deg = nodes.join(edeg, "node", "left").select(
            "node", F.coalesce("edeg", F.lit(0)).cast("long").alias("deg")
        )
        drop = deg.filter(F.col("deg") < KCORE_K).localCheckpoint()
        if drop.count() == 0:
            survivors = deg.select(
                "node",
                F.lit(0).cast("long").alias("peel_round"),
                F.col("deg"),
            )
            break
        peeled_parts.append(
            drop.select(
                "node",
                F.lit(rnd).cast("long").alias("peel_round"),
                F.col("deg"),
            )
        )
        nodes = deg.filter(F.col("deg") >= KCORE_K).select("node") \
            .localCheckpoint()
        edges = (
            edges.join(nodes.withColumnRenamed("node", "src"), "src", "semi")
            .join(nodes.withColumnRenamed("node", "dst"), "dst", "semi")
            .localCheckpoint()
        )
    else:
        raise RuntimeError(
            f"k-core peel did not converge in {KCORE_MAX_ROUNDS} rounds"
        )
    out = survivors
    for p in peeled_parts:
        out = out.unionByName(p)
    return out


# ------------------------------------------------ crawl BFS depth

CRAWL_SEEDS = 3          # seed set = doc_id < 3
CRAWL_MAX_DEPTH = 30


def q_crawl_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS hop distance from the seed set over the DIRECTED extracted
    link graph — crawl-frontier scheduling's core quantity (depth
    caps, politeness budgets, discovery-order analytics all key on
    it).  Frontier iteration: depth d's unvisited out-neighbors
    become depth d+1 — each round is ONE join + ONE anti-join, both
    key-partitioned, with lineage truncated per round
    (_cc_min_label discipline); the convergence probe is the
    frontier count scalar.  The fixture cascade runs 8 levels
    (depths 0..7, all 500 docs reached — pinned by tests).

    Oracle: a genuinely different formulation — DuckDB recursive CTE
    enumerating (node, depth) pairs with UNION dedup (bounded by
    nodes × depth cap, cycle-safe) and MIN(depth) per node.

    Scale shape: no corpus-sized state beyond the edge list and the
    visited set; each round shuffles only the current frontier's
    out-edges."""
    from ocular_spark.functions import html as H

    d = _load_wide(spark, sf_dir, "documents")
    wrapped = d.select("doc_id", F.expr(H.wrap_links_spark()).alias("html"))
    edges = (
        wrapped.select(
            F.col("doc_id").alias("src"),
            F.explode(F.expr(H.doc_links_expr("html"))).alias("dd"),
        )
        .select("src", F.col("dd").cast("long").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    frontier = (
        d.filter(F.col("doc_id") < CRAWL_SEEDS)
        .select(F.col("doc_id").alias("node"))
        .localCheckpoint()
    )
    visited = frontier.withColumn("depth", F.lit(0).cast("long")) \
        .localCheckpoint()
    for depth in range(1, CRAWL_MAX_DEPTH + 1):
        nxt = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "anti")
            .localCheckpoint()
        )
        if nxt.count() == 0:
            break
        visited = visited.unionByName(
            nxt.withColumn("depth", F.lit(depth).cast("long"))
        ).localCheckpoint()
        frontier = nxt
    else:
        raise RuntimeError(
            f"BFS did not converge in {CRAWL_MAX_DEPTH} rounds"
        )
    return visited


# ------------------------------------------------ join-key skew audit

SKEW_AUDIT_COLS = ("l_orderkey", "l_partkey", "l_suppkey")
SKEW_LN_SCALE = 10**9


def q_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostics — the planning input the skew_join
    row's salting decision consumes: for each candidate join key of
    lineitem, the key cardinality, the heaviest key's count and
    share, and the key-distribution Shannon entropy.  Entropy is
    exact-ified the decayed_counts way: H·n·1e9 = n·lnq(n) − Σ c·lnq(c)
    where lnq is the 1e-9-quantized ln evaluated once per DISTINCT
    count value — both sums are order-free BIGINTs, ONE division at
    the end.

    Scale shape: ONE pass over the fact table — each row explodes
    into (col, key) pairs inside an array expression (3× map-side
    width, zero extra scans), one groupBy(col, key) with map-side
    combine, then all metrics live on the per-column count tables."""
    li = _load_wide(spark, sf_dir, "lineitem")
    pairs = li.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col"),
                        F.col(c).cast("long").alias("k"),
                    )
                    for c in SKEW_AUDIT_COLS
                ]
            )
        ).alias("p")
    ).select("p.col", "p.k")
    counts = pairs.groupBy("col", "k").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    lnq_c = F.round(F.log("c") * SKEW_LN_SCALE).cast("long")
    per = counts.groupBy("col").agg(
        F.sum("c").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("c").cast("long").alias("max_cnt"),
        F.sum(F.col("c") * lnq_c).cast("long").alias("sum_clnq"),
    )
    lnq_n = F.round(F.log("n_rows") * SKEW_LN_SCALE).cast("long")
    ent_num = F.col("n_rows") * lnq_n - F.col("sum_clnq")
    return per.select(
        "col", "n_rows", "n_keys", "max_cnt", "sum_clnq",
        F.round(F.col("max_cnt") / F.col("n_rows"), 9).alias("top1_share"),
        ent_num.cast("long").alias("ent_num"),
        F.round(
            ent_num / (F.col("n_rows") * F.lit(float(SKEW_LN_SCALE))), 9
        ).alias("entropy"),
    )


# --------------------------------------------- gap backfill planner


def q_gap_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backfill-job planner: find every missing hour in each event
    type's hourly grid (min..max observed hour) and merge consecutive
    misses into one backfill interval (gaps-and-islands on the
    COMPLEMENT — fill_forward imputes values, this emits the job
    list an orchestrator would actually run).  Island key = the
    epoch-hour minus the per-type row_number, so a run of consecutive
    missing hours shares one anchor — pure integer arithmetic, no
    interval-type seams.

    Scale shape: the observed-hour table is a map-side-combined
    distinct; the grid is sequence() per type (calendar-sized);
    anti-join + the per-type island window run on the miss table
    (calendar-sized, never corpus)."""
    from pyspark.sql.window import Window

    e = _load_wide(spark, sf_dir, "events")
    obs = e.select(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).distinct()
    bounds = obs.groupBy("event_type").agg(
        F.min("h").alias("lo"), F.max("h").alias("hi")
    )
    grid = bounds.select(
        "event_type",
        F.explode(
            F.expr("sequence(lo, hi, interval 1 hour)")
        ).alias("h"),
    )
    miss = grid.join(obs, ["event_type", "h"], "anti")
    w = Window.partitionBy("event_type").orderBy("h")
    isl = miss.select(
        "event_type", "h",
        (
            (F.unix_timestamp("h") / 3600).cast("long")
            - F.row_number().over(w)
        ).alias("anchor"),
    )
    return isl.groupBy("event_type", "anchor").agg(
        F.date_format(F.min("h"), "yyyy-MM-dd HH:mm:ss").alias("gap_start"),
        F.date_format(F.max("h"), "yyyy-MM-dd HH:mm:ss").alias("gap_end"),
        F.count(F.lit(1)).cast("long").alias("n_hours"),
    ).drop("anchor")


# --------------------------------------- referential-integrity audit

FK_PURGE_CUST_MOD, FK_PURGE_CUST_RES = 97, 3
FK_PURGE_PART_MOD, FK_PURGE_PART_RES = 89, 5


def q_fk_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit after a simulated compliance purge
    — the check every forget_user-style deletion needs before the
    next pipeline run: with customers (c_custkey%97==3) and parts
    (p_partkey%89==5) purged, every FK edge of the star schema is
    audited for dangling children: child row count, orphan row count,
    distinct orphan keys.  Purged edges go non-zero; untouched edges
    (orders→lineitem, supplier, nation) prove zero — both classes in
    one report.

    Scale shape: each edge is ONE anti-join on its key (the
    customers_without_orders shape) feeding a scalar agg; dimension
    parents broadcast; the two fact-side edges shuffle once each on
    the child key."""
    li = _load_wide(spark, sf_dir, "lineitem")
    o = _load_wide(spark, sf_dir, "orders")
    c = _load_wide(spark, sf_dir, "customer").filter(
        ~(F.col("c_custkey") % FK_PURGE_CUST_MOD == FK_PURGE_CUST_RES)
    )
    p = _load_wide(spark, sf_dir, "part").filter(
        ~(F.col("p_partkey") % FK_PURGE_PART_MOD == FK_PURGE_PART_RES)
    )
    s = _load_wide(spark, sf_dir, "supplier")
    n = _load_wide(spark, sf_dir, "nation")
    edges = [
        ("lineitem.l_orderkey->orders", li, "l_orderkey", o, "o_orderkey"),
        ("lineitem.l_partkey->part", li, "l_partkey", p, "p_partkey"),
        ("lineitem.l_suppkey->supplier", li, "l_suppkey", s, "s_suppkey"),
        ("orders.o_custkey->customer", o, "o_custkey", c, "c_custkey"),
        ("customer.c_nationkey->nation", c, "c_nationkey", n, "n_nationkey"),
    ]
    out = None
    for name, child, ck, parent, pk in edges:
        orphans = child.select(F.col(ck).alias("k")).join(
            parent.select(F.col(pk).alias("k")), "k", "anti"
        )
        row = child.agg(
            F.count(F.lit(1)).cast("long").alias("n_child")
        ).crossJoin(
            orphans.agg(
                F.count(F.lit(1)).cast("long").alias("n_orphans"),
                F.countDistinct("k").cast("long").alias("n_orphan_keys"),
            )
        ).select(F.lit(name).alias("fk_edge"), "n_child", "n_orphans",
                 "n_orphan_keys")
        out = row if out is None else out.unionByName(row)
    return out


# --------------------------------------------- l-diversity audit

LDIV_L = 3    # require >= 3 distinct sensitive values per QI class
LDIV_B = 200  # finer bal bucket than k_anonymity: at width 1000 every
              # class trivially clears l=3 (measured 55/55) — the QI
              # must be fine enough that both verdicts occur (24 fail)


def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007) — the privacy
    property k-anonymity misses: a class can be large yet reveal the
    sensitive attribute if everyone in it shares one value.  QI =
    (market segment, FLOOR(bal/1000)); sensitive = nation.  Per
    class: size, distinct sensitive values, the l>=3 verdict, and the
    dominant value's share as an exact rational (top_cnt/n — the
    probabilistic-disclosure risk).

    Scale shape: ONE corpus groupBy(QI, sensitive); class rollups and
    the deterministic dominant-value rank (cnt desc, value asc) run
    on the domain-sized cell table with per-class-bounded windows."""
    from pyspark.sql.window import Window

    c = _load_wide(spark, sf_dir, "customer")
    cells = c.groupBy(
        F.col("c_mktsegment").alias("segment"),
        F.floor(F.col("c_acctbal") / LDIV_B).cast("long").alias("bal_b"),
        F.col("c_nationkey").cast("long").alias("nation"),
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    per = cells.groupBy("segment", "bal_b").agg(
        F.sum("cnt").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_sensitive"),
    )
    w = Window.partitionBy("segment", "bal_b").orderBy(
        F.desc("cnt"), F.asc("nation")
    )
    top = cells.select(
        "segment", "bal_b", "nation", "cnt",
        F.row_number().over(w).alias("rn"),
    ).filter(F.col("rn") == 1).select(
        "segment", "bal_b",
        F.col("nation").alias("top_nation"),
        F.col("cnt").alias("top_cnt"),
    )
    return per.join(top, ["segment", "bal_b"]).select(
        "segment", "bal_b", "n", "n_sensitive",
        (F.col("n_sensitive") >= LDIV_L).cast("long").alias("l_ok"),
        "top_nation", "top_cnt",
        F.round(F.col("top_cnt") / F.col("n"), 9).alias("top_share"),
    )


# ------------------------------------------- product quantization

PQ_M = 4        # subspaces over the 64-dim embeddings (16 dims each)
PQ_KSUB = 16    # centroids per subquantizer (codes are 4 x 4-bit)
PQ_ITERS = 2    # Lloyd iterations per subquantizer


def _pq_assign_expr(sub_col, cb) -> "F.Column":
    """Nearest-centroid argmin over a subvector column by the
    dot-product identity argmin|x−c|² = argmax(x·c − ½c·c), with the
    first-max rule breaking ties toward the smallest code (codebook
    sorted by cent_id — the _ivf_assign_expr convention).  Both the
    x·c and c·c folds are left-to-right _dot64 chains, mirrored by
    the oracle's LIST_DOT_PRODUCT."""
    cb = sorted(cb, key=lambda r: r["cent_id"])
    scores = F.array(
        *[
            _dot64(sub_col, F.array(*[F.lit(float(x)) for x in r["cent_vec"]]))
            - F.lit(0.5)
            * _dot64(
                F.array(*[F.lit(float(x)) for x in r["cent_vec"]]),
                F.array(*[F.lit(float(x)) for x in r["cent_vec"]]),
            )
            for r in cb
        ]
    )
    cids = F.array(*[F.lit(int(r["cent_id"])) for r in cb])
    return F.element_at(
        cids, F.array_position(scores, F.array_max(scores)).cast("int")
    )


def q_pq_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization (Jégou, Douze & Schmid, TPAMI 2011) — the
    vector-compression half of the ANN stack (IVF partitions the
    corpus; PQ compresses residents to M small codes): the 64-dim
    embeddings split into M=4 16-dim subspaces, each trained with 2
    Lloyd iterations (seed = first 16 vectors' slices), then every
    vector is encoded as its per-subspace nearest-centroid code and
    scored by the squared reconstruction error of that subspace.

    Exactness: Lloyd means are exact int64 sums of floor(val·1e9)
    (the _ivf_train_codebook device) WITHOUT spherical normalization
    (PQ is plain k-means — subvectors are not unit-norm); assignment
    uses argmin|x−c|² = argmax(x·c − ½c·c) where every fold is a
    deterministic left-to-right _dot64 / LIST_DOT_PRODUCT chain and
    ties break toward the smaller code; err² = x·x − 2x·c + c·c in a
    FIXED 3-term order, rounded at 6 dp.

    Scale shape: training collects only O(KSUB·d/M) centroid rows per
    iteration (constant at any corpus size); assignment and error
    are pure map-side projections against literal codebooks — the
    serving shape of a PQ encoder at 100 TB."""
    e = _load(spark, sf_dir, "embeddings")
    width = 64 // PQ_M
    rows = None
    for m in range(PQ_M):
        lo = m * width + 1
        sub = F.transform(
            F.slice("embedding", lo, width), lambda x: x.cast("double")
        )
        se = e.select("vec_id", sub.alias("subv"))
        cb = (
            se.filter(F.col("vec_id") < PQ_KSUB)
            .select(
                F.col("vec_id").cast("int").alias("cent_id"),
                F.col("subv").alias("cent_vec"),
            )
            .collect()
        )
        for _ in range(PQ_ITERS):
            assigned = se.select(
                _pq_assign_expr(F.col("subv"), cb).alias("cluster"), "subv"
            )
            means = (
                assigned.select(
                    "cluster", F.posexplode("subv").alias("pos", "val")
                )
                .groupBy("cluster", "pos")
                .agg(
                    F.sum(
                        F.floor(F.col("val") * 1000000000.0).cast("long")
                    ).alias("s9"),
                    F.count(F.lit(1)).alias("cnt"),
                )
                .withColumn(
                    "m", F.round(F.col("s9") / (F.col("cnt") * 1000000000.0), 6)
                )
                .groupBy("cluster")
                .agg(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm")
                )
                .select(
                    F.col("cluster").alias("cent_id"),
                    F.transform("pm", lambda s: s["m"]).alias("cent_vec"),
                )
            )
            cb = means.collect()
        cbs = sorted(cb, key=lambda r: r["cent_id"])
        code = _pq_assign_expr(F.col("subv"), cbs)
        cvecs = F.array(
            *[F.array(*[F.lit(float(x)) for x in r["cent_vec"]]) for r in cbs]
        )
        cids = F.array(*[F.lit(int(r["cent_id"])) for r in cbs])
        cvec = F.element_at(
            cvecs, (F.array_position(cids, F.col("code"))).cast("int")
        )
        part = (
            se.withColumn("code", code)
            .withColumn("cvec", cvec)
            .select(
                "vec_id",
                F.lit(m).cast("long").alias("sub"),
                F.col("code").cast("long").alias("code"),
                F.round(
                    _dot64(F.col("subv"), F.col("subv"))
                    - F.lit(2.0) * _dot64(F.col("subv"), F.col("cvec"))
                    + _dot64(F.col("cvec"), F.col("cvec")),
                    6,
                ).alias("err6"),
            )
        )
        rows = part if rows is None else rows.unionByName(part)
    return rows


# ----------------------------------------- Pearson correlation matrix

CORR_COLS = (
    ("l_quantity", 1),        # integer-valued already
    ("l_extendedprice", 100), # cents
    ("l_discount", 100),      # percent points
    ("l_revenue", 100),       # derived: extendedprice*(1-discount) —
                              # the synthetic generator draws the raw
                              # measures INDEPENDENTLY (all pairwise
                              # corr ~0.003, unlike real TPC-H), so a
                              # derived measure keeps the matrix
                              # non-degenerate (corr ~0.998 with price)
)
_CORR_REVENUE = "l_extendedprice * (1 - l_discount)"


def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix over the lineitem measures
    — the feature-screening / drift-monitoring statistic, computed
    from algebraic sufficient statistics in ONE corpus pass (every
    pair's Σx, Σx², Σxy in a single agg — no per-pair scans, no
    iterative solver).

    Exactness: each measure is quantized to its natural integer unit
    (cents / percent points — ROUND, exact for these 2-dp values), so
    all sufficient statistics are EXACT decimal(38,0) sums (int64
    would overflow: Σ price²·cents² ≈ 6·10¹⁹ at sf0.1); the
    correlation numerator n·Σxy − ΣxΣy is assembled driver-side in
    Python bignums (the bm25 scalar precedent — collected stats are
    O(cols²) scalars), and only the final sqrt/division touch floats,
    mirrored op-for-op by the oracle (HUGEINT in DuckDB).

    Scale shape: one map-side-combined agg over the fact table; the
    output is the cols×cols matrix — corpus-size-independent."""
    import math

    li = _load_wide(spark, sf_dir, "lineitem").withColumn(
        "l_revenue", F.expr(_CORR_REVENUE)
    )
    cols = [c for c, _ in CORR_COLS]
    q = {
        c: F.round(F.col(c) * F.lit(s)).cast("decimal(38,0)")
        for c, s in CORR_COLS
    }
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for c in cols:
        aggs.append(F.sum(q[c]).alias(f"s_{c}"))
        aggs.append(F.sum(q[c] * q[c]).alias(f"ss_{c}"))
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            aggs.append(F.sum(q[a] * q[b]).alias(f"sp_{a}_{b}"))
    st = li.agg(*aggs).collect()[0]
    n = int(st["n"])
    s = {c: int(st[f"s_{c}"]) for c in cols}
    ss = {c: int(st[f"ss_{c}"]) for c in cols}
    rows = []
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            sp = int(st[f"sp_{a}_{b}"])
            num = n * sp - s[a] * s[b]
            va = n * ss[a] - s[a] * s[a]
            vb = n * ss[b] - s[b] * s[b]
            # emit the FULL-precision double: both engines derive it
            # from identical exact integers with identical op order
            # (float cast -> sqrt -> multiply -> divide), so the bits
            # match and the driver's 9-dp canonicalization agrees —
            # no in-engine ROUND, no half-even-vs-half-away seam
            corr = (
                float(num) / (math.sqrt(float(va)) * math.sqrt(float(vb)))
                if va > 0 and vb > 0
                else None
            )
            rows.append((a, b, n, s[a], s[b], corr))
    return spark.createDataFrame(
        rows,
        schema="col_a string, col_b string, n long, sum_a long, "
               "sum_b long, corr double",
    )


# --------------------------------------- join cardinality estimation

JCE_SCENARIOS = (
    # (name, child filter SQL/Spark predicate pair applied to orders)
    ("fk_plain", None),
    ("filter_status_F", "o_orderstatus = 'F'"),
    ("filter_hiprice", "o_totalprice >= 200000"),
)


def q_join_card_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimizer cardinality-estimation audit: the System-R uniform
    assumption |A ⋈ B| ≈ n_A·n_B / max(d_A, d_B) evaluated against
    the ACTUAL join size for three scenarios over
    lineitem ⋈ orders(o_orderkey) — the unfiltered FK join (where the
    formula is provably exact, q-error = 1) and two filtered variants
    whose key-set/filter correlation breaks the independence
    assumption (q-error > 1).  This is the planner-diagnostics row:
    zone_map/skew_audit describe the data, this one scores the
    estimator optimizers actually use on it.

    Exactness: est rides as the BIGINT rational n_A·n_B / max(d_A,
    d_B); q_error = max(est/actual, actual/est) compared and emitted
    after ONE division each (6 dp).  Counts are exact aggregates;
    the actual join count is one equi-join COUNT."""
    li = _load_wide(spark, sf_dir, "lineitem")
    o = _load_wide(spark, sf_dir, "orders")
    n_li = li.count()
    d_li = li.agg(F.countDistinct("l_orderkey")).collect()[0][0]
    out_rows = []
    for name, pred in JCE_SCENARIOS:
        ob = o if pred is None else o.filter(F.expr(pred))
        n_o = ob.count()
        d_o = ob.agg(F.countDistinct("o_orderkey")).collect()[0][0]
        actual = li.join(
            ob.select(F.col("o_orderkey").alias("l_orderkey")),
            "l_orderkey",
        ).count()
        est_num, est_den = n_li * n_o, max(d_li, d_o)
        # full-precision doubles (the corr_matrix convention): both
        # engines derive them from identical exact integers, so the
        # driver's 9-dp canonicalization agrees without in-engine ROUND
        est = est_num / est_den
        q_err = max(est / actual, actual / est) if actual > 0 else None
        out_rows.append(
            (name, n_li, n_o, d_li, d_o, actual, est_num, est_den, est, q_err)
        )
    return spark.createDataFrame(
        out_rows,
        schema="scenario string, n_fact long, n_dim long, d_fact long, "
               "d_dim long, actual long, est_num long, est_den long, "
               "est double, q_error double",
    )


# ------------------------------------------- change-point detection

CP_SCORE_SCALE = 10**6


def q_changepoint_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single change-point detection per event type (binary
    segmentation, first split): over the daily-volume series, pick
    the split that maximizes the between-segment term
    S_L²/n_L + S_R²/n_R (equivalently minimizes total SSE — counts
    are integers so the term is a rational), quantized to 1e-6 for
    the argmax with earliest-day ties.

    Exactness: daily counts, prefix sums, and S²·n cross terms are
    exact BIGINTs (S² ≈ 4·10¹⁰ at sf0.1 — headroom to ~10⁵× more
    volume); ONE deterministic double division per candidate is
    quantized to the score; means are emitted after one division
    each.

    Scale shape: groupBy(type, day) is the only corpus stage; prefix
    sums and the argmax run on the types×days table with per-type
    windows."""
    from pyspark.sql.window import Window

    e = _load_wide(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    w = Window.partitionBy("event_type").orderBy("d")
    tot = Window.partitionBy("event_type")
    cum = daily.select(
        "event_type", "d", "c",
        F.sum("c").over(w).cast("long").alias("s_l"),
        F.row_number().over(w).cast("long").alias("n_l"),
        F.sum("c").over(tot).cast("long").alias("s"),
        F.count(F.lit(1)).over(tot).cast("long").alias("m"),
    ).filter(F.col("n_l") < F.col("m"))
    s_r = (F.col("s") - F.col("s_l")).alias("s_r")
    n_r = (F.col("m") - F.col("n_l")).alias("n_r")
    cand = cum.select(
        "event_type", "d", "n_l", "s_l", n_r, s_r, "s", "m"
    ).withColumn(
        "score",
        F.round(
            (
                F.col("s_l") * F.col("s_l") * F.col("n_r")
                + F.col("s_r") * F.col("s_r") * F.col("n_l")
            )
            * F.lit(float(CP_SCORE_SCALE))
            / (F.col("n_l") * F.col("n_r")),
        ).cast("long"),
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.desc("score"), F.asc("d")
    )
    best = cand.select(
        "*", F.row_number().over(wr).alias("rn")
    ).filter(F.col("rn") == 1)
    return best.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("split_day"),
        "n_l", "s_l", "n_r", "s_r", "score",
        F.round(F.col("s_l") / F.col("n_l"), 6).alias("mean_l"),
        F.round(F.col("s_r") / F.col("n_r"), 6).alias("mean_r"),
    )


# --------------------------------------------- JSON schema inference

JSI_KEYS = ("k", "tag", "score", "flag")
# value-token regex: a JSON string, number, or boolean right after the
# key — the synthesized payloads are flat and escape-free, so the
# token's first character classifies its type exactly
_JSI_VAL = '"{key}"\\s*:\\s*("[^"]*"|-?[0-9]+\\.[0-9]+|-?[0-9]+|true|false)'


def _jsi_payload_spark() -> "F.Column":
    """Deterministically heterogenize the homogeneous {"k": int}
    props (the _with_injected_dup_docs precedent — the raw fixture
    would make inference vacuous): event_id%3==0 adds a string tag,
    %5==0 adds a double score, %7==0 re-types k itself as a string
    (a REAL type conflict), %11==0 drops k (missingness)."""
    k_num = F.regexp_extract("props", '"k":\\s*([0-9]+)', 1)
    parts = F.array(
        F.when(F.col("event_id") % 11 == 0, F.lit(None)).otherwise(
            F.when(
                F.col("event_id") % 7 == 0,
                F.concat(F.lit('"k": "s'), k_num, F.lit('"')),
            ).otherwise(F.concat(F.lit('"k": '), k_num))
        ),
        F.when(
            F.col("event_id") % 3 == 0,
            F.concat(F.lit('"tag": "t'), (F.col("event_id") % 4).cast("string"), F.lit('"')),
        ),
        F.when(
            F.col("event_id") % 5 == 0,
            F.concat(F.lit('"score": '), (F.col("event_id") % 9).cast("string"), F.lit(".5")),
        ),
        F.when(
            F.col("event_id") % 2 == 0,
            F.concat(F.lit('"flag": '), F.when(F.col("event_id") % 4 == 0, F.lit("true")).otherwise(F.lit("false"))),
        ),
    )
    return F.concat(
        F.lit("{"),
        F.array_join(F.filter(parts, lambda x: x.isNotNull()), ", "),
        F.lit("}"),
    )


def q_json_schema_infer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured schema inference — the ingestion-time discovery
    step every JSON/event-log loader runs before a table exists: per
    candidate key, presence count and per-type votes (long / double /
    string / bool) from the raw value tokens, then the inferred
    column type by the standard widening rules (any string-typed
    occurrence → string; else any double → double; else bool if pure
    bool; else long) plus nullability (= not always present).

    The payloads are deterministically heterogenized (see
    _jsi_payload_spark) so the operator exercises a genuine type
    CONFLICT (k is long in most rows, string in %7 rows → string),
    a float widening, a pure-bool column, and missingness.

    Scale shape: ONE pass of pure JVM regexp projections (type
    classification by the value token's first character — no JSON
    library in the hot path, no Python); the vote table is
    keys-sized."""
    e = _load_wide(spark, sf_dir, "events")
    p = e.select(F.col("event_id"), _jsi_payload_spark().alias("payload"))
    n_total = p.count()
    aggs = []
    for key in JSI_KEYS:
        tok = F.regexp_extract("payload", _JSI_VAL.format(key=key), 1)
        first = F.substring(tok, 1, 1)
        aggs.extend([
            F.sum((tok != "").cast("long")).alias(f"present_{key}"),
            F.sum((first == '"').cast("long")).alias(f"str_{key}"),
            F.sum(tok.rlike("^-?[0-9]+$").cast("long")).alias(f"long_{key}"),
            F.sum(tok.rlike("^-?[0-9]+\\.[0-9]+$").cast("long")).alias(f"dbl_{key}"),
            F.sum(((tok == "true") | (tok == "false")).cast("long")).alias(f"bool_{key}"),
        ])
    st = p.agg(*aggs).collect()[0]
    rows = []
    for key in JSI_KEYS:
        pres = int(st[f"present_{key}"])
        ns, nl, nd, nb = (
            int(st[f"str_{key}"]), int(st[f"long_{key}"]),
            int(st[f"dbl_{key}"]), int(st[f"bool_{key}"]),
        )
        inferred = (
            "string" if ns > 0
            else "double" if nd > 0
            else "bool" if nb == pres and pres > 0
            else "long" if nl > 0
            else "null"
        )
        rows.append(
            (key, n_total, pres, nl, nd, ns, nb, inferred, int(pres < n_total))
        )
    return spark.createDataFrame(
        rows,
        schema="key string, n_total long, n_present long, n_long long, "
               "n_double long, n_string long, n_bool long, "
               "inferred string, nullable long",
    )


# --------------------------------------- longest-prefix-match join

LPM_NET_BASE = 10  # nation n owns the /8 block (10+n).0.0.0/8


def q_ip_lpm_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest-prefix-match enrichment join (the geo-IP / CIDR lookup
    every log pipeline ships): events get deterministic synthetic
    IPv4s inside nation-owned /8 blocks; the prefix table holds the
    25 /8 routes plus /16 overrides (x.7.0.0/16 for every 5th
    nation), and each event takes its MOST SPECIFIC matching route.

    Scale shape: candidates come from an equi-join on the /8 bucket
    (first octet) — never a range cross-join; the prefix table is a
    broadcast dim; specificity = one per-event rank over ≤2
    candidates (mask-match filtered), all integer shift/AND
    arithmetic that both engines evaluate exactly.

    Output is the per-route traffic rollup (route, owner, n_events,
    n_users) — the shape a traffic-attribution job actually emits."""
    from pyspark.sql.window import Window

    e = _load_wide(spark, sf_dir, "events")
    n = _load_wide(spark, sf_dir, "nation")
    # ip32 = (10+user%25).(md5-derived 24 bits)
    low24 = (
        F.conv(F.substring(F.md5(F.concat_ws(":", "user_id", "event_id")), 1, 6), 16, 10)
        .cast("long") % F.lit(1 << 24)
    )
    ips = e.select(
        "event_id", "user_id",
        (
            (F.lit(LPM_NET_BASE) + F.col("user_id") % 25)
            * F.lit(1 << 24) + low24
        ).alias("ip"),
    )
    r8 = n.select(
        ((F.lit(LPM_NET_BASE) + F.col("n_nationkey")) * F.lit(1 << 24))
        .alias("prefix"),
        F.lit(8).cast("long").alias("plen"),
        F.concat(F.lit("nation:"), F.col("n_name")).alias("owner"),
    )
    r16 = n.filter(F.col("n_nationkey") % 5 == 0).select(
        (
            (F.lit(LPM_NET_BASE) + F.col("n_nationkey")) * F.lit(1 << 24)
            + F.lit(7 << 16)
        ).alias("prefix"),
        F.lit(16).cast("long").alias("plen"),
        F.concat(F.lit("override:"), F.col("n_name")).alias("owner"),
    )
    routes = r8.unionByName(r16).withColumn(
        "bucket", (F.col("prefix") / F.lit(1 << 24)).cast("long")
    )
    cand = ips.withColumn(
        "bucket", (F.col("ip") / F.lit(1 << 24)).cast("long")
    ).join(F.broadcast(routes), "bucket")
    # mask match: ip >> (32 - plen) == prefix >> (32 - plen), as exact
    # integer division (2^shift ≤ 2^24, values < 2^32 — no precision
    # loss in the double pow)
    shift = F.lit(32) - F.col("plen")
    matched = cand.filter(
        F.floor(F.col("ip") / F.pow(F.lit(2.0), shift))
        == F.floor(F.col("prefix") / F.pow(F.lit(2.0), shift))
    )
    w = Window.partitionBy("event_id").orderBy(F.desc("plen"))
    best = matched.select(
        "event_id", "user_id", "prefix", "plen", "owner",
        F.row_number().over(w).alias("rn"),
    ).filter(F.col("rn") == 1)
    return best.groupBy("prefix", "plen", "owner").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )


# ------------------------------------------------- SLO burn rate

SLO_THRESHOLD = 90.0  # "slow" above this value
SLO_BUDGET_PCT = 10   # 90% SLO -> 10% error budget


def q_slo_burn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-window SLO burn-rate alerting (the SRE-workbook pattern):
    treating value as a latency and value > 90 as an SLO miss
    against a 90% target, compute per (type, day) the 1-day burn
    rate (err_rate ÷ 10% budget) and the trailing-3-day burn, and
    alert only when BOTH exceed their thresholds (short > 2, long >
    1.5) — the two-window AND is what keeps one bad hour from paging.

    Exactness: burns ride as integer rationals; the alert is pure
    cross-multiplication (5·e₁ ≥ n₁ AND 20·e₃ ≥ 3·n₃); the emitted
    burn doubles are single divisions.

    Scale shape: one corpus groupBy(type, day); the trailing window
    is per-type over the calendar-sized daily table."""
    from pyspark.sql.window import Window

    e = _load_wide(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("value") > SLO_THRESHOLD).cast("long"))
        .cast("long").alias("err"),
    )
    w3 = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-2, 0)
    )
    j = daily.select(
        "event_type", "d", "n", "err",
        F.sum("n").over(w3).cast("long").alias("n3"),
        F.sum("err").over(w3).cast("long").alias("e3"),
    )
    alert = (
        (F.lit(5) * F.col("err") >= F.col("n"))
        & (F.lit(20) * F.col("e3") >= F.lit(3) * F.col("n3"))
    )
    return j.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("d"),
        "n", "err", "n3", "e3",
        F.round(F.lit(10) * F.col("err") / F.col("n"), 6).alias("burn_1d"),
        F.round(F.lit(10) * F.col("e3") / F.col("n3"), 6).alias("burn_3d"),
        alert.cast("long").alias("alert"),
    )


HITS_SCALE = 10**6  # L1 normalization scale: a hub/auth score is a
HITS_ITERS = 2      # BIGINT in [0, HITS_SCALE]; see overflow note below


def _hits_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HUB-OVERLAID extracted link graph (degree_powerlaw's edge
    synthesis): crawl links from the wrapped pages plus the
    deterministic doc_id mod 2^k overlay — the overlay is what gives
    the graph non-regular structure (the raw crawl links are
    near-uniform, which would make HITS degenerate)."""
    from ocular_spark.functions import html as H

    d = _load_wide(spark, sf_dir, "documents")
    wrapped = d.select("doc_id", F.expr(H.wrap_links_spark()).alias("html"))
    crawl = wrapped.select(
        F.col("doc_id").alias("src"),
        F.explode(F.expr(H.doc_links_expr("html"))).alias("dd"),
    ).select("src", F.col("dd").cast("long").alias("dst"))
    hubs = d.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.array(*[F.pmod(F.col("doc_id"), F.lit(1 << k)) for k in range(1, 10)])
        ).alias("dst"),
    )
    return (
        crawl.unionByName(hubs)
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )


def _hits_normalize(nodes: DataFrame, raw: DataFrame, key: str,
                    rawcol: str, outcol: str) -> DataFrame:
    """L1-normalize a raw HITS mass column to exact BIGINTs in
    [0, HITS_SCALE]: x -> (x * SCALE) DIV total.  The total rides as a
    1-row broadcast (scalar subquery in the oracle); DIV (trunc) ==
    // (floor) because every mass is non-negative.  Each round is
    localCheckpoint'd: 2 iterations x 2 half-steps would otherwise
    stack 8 joins of lineage (the dedup_cluster lesson)."""
    tot = raw.agg(F.sum(rawcol).alias("tot"))
    scaled = raw.crossJoin(F.broadcast(tot)).select(
        F.col(key).alias("n"),
        F.expr(f"({rawcol} * {HITS_SCALE}) DIV tot").alias(outcol),
    )
    return (
        nodes.join(scaled, "n", "left")
        .select(
            "n",
            F.coalesce(F.col(outcol), F.lit(0).cast("long")).alias(outcol),
        )
        .localCheckpoint()
    )


def q_link_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) over the hub-overlaid
    extracted link graph — the second classic link-analysis fixed
    point next to PageRank, with a genuinely different propagation
    structure (two mutually-recursive scores over edge DIRECTION
    instead of one damped mass flow).

    Exactness: scores are exact BIGINTs at HITS_SCALE with L1
    normalization after every half-step — a_raw(v) = Σ h(u) over
    in-edges, then a = (a_raw·SCALE) DIV Σ a_raw; all sums order-free
    integer adds, so two unrolled iterations hash identically in both
    engines.  Overflow headroom: a_raw ≤ |V|·SCALE ≈ 5e9 at sf0.1;
    a_raw·SCALE ≤ 5e15 < 2^63 (at 1e12 docs the multiply would ride
    DECIMAL(38,0) — corr_matrix precedent).

    Scale shape: identical to PageRank's two-shuffle step — one
    src-join (score carry) + one dst-groupBy per half-step; edges
    localCheckpoint'd once; the normalization total is a 1-row
    broadcast, never a driver round-trip per iteration."""
    edges = _hits_edges(spark, sf_dir)
    nodes = (
        edges.select(F.col("src").alias("n"))
        .union(edges.select(F.col("dst").alias("n")))
        .distinct()
        .localCheckpoint()
    )
    hub = nodes.withColumn("h", F.lit(HITS_SCALE).cast("long"))
    auth = None
    for _ in range(HITS_ITERS):
        a_raw = (
            edges.join(hub, edges["src"] == hub["n"])
            .groupBy("dst")
            .agg(F.sum("h").alias("ar"))
        )
        auth = _hits_normalize(nodes, a_raw, "dst", "ar", "a")
        h_raw = (
            edges.join(auth, edges["dst"] == auth["n"])
            .groupBy("src")
            .agg(F.sum("a").alias("hr"))
        )
        hub = _hits_normalize(nodes, h_raw, "src", "hr", "h")
    return (
        nodes.join(hub, "n")
        .join(auth, "n")
        .select(
            F.col("n").alias("node"),
            F.col("h").alias("hub"),
            F.col("a").alias("auth"),
        )
    )


# Redirect-chain resolution: deterministic redirect map over the doc
# universe — chains (u%20 in 1..3 -> u+1, length <= 3), a 2-cycle per
# 100-block (50<->51), and a feeder INTO the cycle (49 -> 50, the
# resolves-to-a-cycle class).  CASE order is identical in both
# engines; the arms are provably disjoint (49/50/51 mod 20 are
# 9/10/11).
REDIR_CASE = (
    "CASE WHEN doc_id % 100 = 49 THEN doc_id + 1 "
    "WHEN doc_id % 100 = 50 THEN doc_id + 1 "
    "WHEN doc_id % 100 = 51 THEN doc_id - 1 "
    "WHEN doc_id % 20 IN (1, 2, 3) THEN doc_id + 1 END"
)
REDIR_ROUNDS = 4  # pointer doubling covers chains up to 2^4 = 16 hops


def q_redirect_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redirect-chain resolution over a functional graph (every URL
    redirects to at most ONE target) — the crawl-frontier operator
    that canonicalizes 301/302 chains before fetch dedup.  Pointer
    DOUBLING composes the map with itself each round (u -> f(u), dist
    telescopes d + d(f(u))), so chains of length L resolve in
    ceil(log2 L) rounds — at 1e12 URLs that is ~5 joins instead of a
    40-round sequential walk.  Nodes still unresolved after the bound
    are cycle-bound (including chains that ENTER a cycle): final and
    dist are NULLed, is_cycle = 1.

    Composition telescoping is exact regardless of schedule, so the
    doubling result equals the oracle's step-by-step recursive-CTE
    walk on every resolved row.  Each round localCheckpoint'd (the
    dedup_cluster lineage lesson).

    Scale shape: the map is corpus-sized; each round is ONE self-join
    on the current target key — at production the map would be
    bucketed by u so round r's probe side reuses round r-1's layout."""
    d = _load_wide(spark, sf_dir, "documents")
    m = (
        d.select(
            F.col("doc_id").alias("u"),
            F.expr(REDIR_CASE).cast("long").alias("v"),
        )
        .filter(F.col("v").isNotNull())
        .withColumn("dist", F.lit(1).cast("long"))
        .localCheckpoint()
    )
    full = m
    for _ in range(REDIR_ROUNDS):
        nxt = full.select(
            F.col("u").alias("u2"),
            F.col("v").alias("v2"),
            F.col("dist").alias("d2"),
        )
        full = (
            full.join(nxt, full["v"] == nxt["u2"], "left")
            .select(
                "u",
                F.coalesce(F.col("v2"), F.col("v")).alias("v"),
                (F.col("dist") + F.coalesce(F.col("d2"), F.lit(0).cast("long")))
                .alias("dist"),
            )
            .localCheckpoint()
        )
    sources = m.select(F.col("u").alias("su"))
    out = full.join(sources, full["v"] == sources["su"], "left")
    cyc = F.col("su").isNotNull()
    return out.select(
        F.col("u").alias("start"),
        F.when(~cyc, F.col("v")).alias("final"),
        F.when(~cyc, F.col("dist")).alias("dist"),
        cyc.cast("long").alias("is_cycle"),
    )


# Benford first-digit audit: expected proportions log10(1 + 1/d)
# quantized at 1e-4 — computed ONCE in Python and embedded as the same
# CASE literal in both engines (the ndcg discount-table device).
# Scale choice is the sf0.1 overflow bound: (n·SCALE)^2 ≤ (1.5e5·1e4)^2
# = 2.25e18 < 2^63; at 1e12 rows the square would ride DECIMAL(38,0).
BENFORD_SCALE = 10**4
import math as _math

BENFORD_EXP = {
    dd: _math.floor(_math.log10(1 + 1 / dd) * BENFORD_SCALE)
    for dd in range(1, 10)
}
BENFORD_EXP_CASE = (
    "CASE digit "
    + " ".join(f"WHEN {dd} THEN {p}" for dd, p in BENFORD_EXP.items())
    + " END"
)


def q_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit audit of o_totalprice per order
    status — the fraud/data-quality screen for any ingested numeric
    feed (Nigrini 2012).  First digit is extracted from the BIGINT
    cents value's decimal string (floor(x·100 + 0.5) — the established
    cents device; ×100 preserves the leading digit), never from float
    formatting.

    Exactness: the full status × digit(1..9) grid is generated so
    unobserved cells still contribute their expected mass; the
    chi-square statistic rides entirely in integers — expected mass
    E_scaled = n·p_q (units 1e-4 counts), per-cell contribution
    (n_obs·SCALE − E_scaled)² DIV E_scaled (units 1e-4 · (O−E)²/E),
    and the per-status chi2_q is an order-free BIGINT window sum.

    Scale shape: ONE corpus groupBy(status, digit); everything after
    lives on the 27-cell grid."""
    o = _load_wide(spark, sf_dir, "orders")
    digit = F.expr(
        "CAST(substring(CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)"
        " AS STRING), 1, 1) AS BIGINT)"
    )
    per = o.groupBy(
        F.col("o_orderstatus").alias("status"), digit.alias("digit")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    grid = (
        o.select(F.col("o_orderstatus").alias("status"))
        .distinct()
        .crossJoin(spark.range(1, 10).select(F.col("id").alias("digit")))
    )
    cells = grid.join(per, ["status", "digit"], "left").select(
        "status",
        "digit",
        F.coalesce(F.col("n_obs"), F.lit(0).cast("long")).alias("n_obs"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("status")
    cells = cells.withColumn(
        "n_total", F.sum("n_obs").over(w).cast("long")
    ).withColumn("exp_scaled", F.expr(BENFORD_EXP_CASE).cast("long"))
    cells = cells.withColumn(
        "expected_n_scaled", (F.col("n_total") * F.col("exp_scaled")).cast("long")
    ).withColumn(
        "contrib_q",
        F.expr(
            f"((n_obs * {BENFORD_SCALE} - expected_n_scaled)"
            f" * (n_obs * {BENFORD_SCALE} - expected_n_scaled))"
            " DIV expected_n_scaled"
        ),
    )
    return cells.select(
        "status",
        "digit",
        "n_obs",
        "n_total",
        "exp_scaled",
        "expected_n_scaled",
        "contrib_q",
        F.sum("contrib_q").over(w).cast("long").alias("chi2_q"),
    )


POLITE_DELAY_US = 4 * 3600 * 1_000_000  # 4h per-host crawl delay


def q_politeness_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-frontier politeness scheduling: each host (user_id)
    serves at most one fetch every POLITE_DELAY_US; request i starts
    at t_i = max(avail_i, t_{i-1} + D) — the sequential per-host fold
    every frontier implements before dispatch.

    The fold LINEARIZES (unlike debounce, whose state is the last
    KEPT row): by induction t_i = max_{j<=i}(avail_j + (i-j)·D)
    = i·D + max_{j<=i}(avail_j − j·D), so the whole schedule is ONE
    running-max window over (avail − seq·D) — no per-row Python, no
    recursion.  The oracle walks the recurrence step-by-step in a
    recursive CTE: two independent algorithms, one result, exact
    integer microseconds (timestampdiff vs date_diff, both µs since
    2024-01-01 on naive timestamps — the events_asof device).

    Overflow: D·seq ≤ 1.44e10 · rows-per-host; at 1e12 fetches per
    host the product would ride DECIMAL(38,0) (corr_matrix
    precedent).  Scale shape: one shuffle on host; the window is a
    single per-partition pass — at 1e12 URLs with per-host salting
    the closed form still works because the prefix max is mergeable
    across salt slices (max of slice maxima + slice seq offsets)."""
    from pyspark.sql.window import Window

    D = POLITE_DELAY_US
    e = _load_wide(spark, sf_dir, "events")
    base = e.select(
        F.col("user_id").alias("host"),
        "event_id",
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP '2024-01-01 00:00:00', ts)"
        ).cast("long").alias("avail_us"),
    )
    w_ord = Window.partitionBy("host").orderBy("avail_us", "event_id")
    base = base.withColumn(
        "seq", (F.row_number().over(w_ord) - 1).cast("long")
    )
    w_run = (
        Window.partitionBy("host")
        .orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (
        F.lit(D).cast("long") * F.col("seq")
        + F.max(F.col("avail_us") - F.lit(D).cast("long") * F.col("seq")).over(w_run)
    )
    return (
        base.withColumn("start_us", start.cast("long"))
        .select(
            "host",
            "event_id",
            "seq",
            "avail_us",
            "start_us",
            (F.col("start_us") - F.col("avail_us")).alias("wait_us"),
            (F.col("start_us") > F.col("avail_us")).cast("long").alias("delayed"),
        )
    )


CPM_BLOCK = 20  # tasks per project block; precedence stays in-block


def _cpm_edges_py(ids):
    """Shared Python edge derivation for the task DAG: within a
    CPM_BLOCK of doc_ids, r = u % 20 — u -> u+1 if r%4 != 3 else
    u -> u+2, plus u -> u+5 if r%7 == 1; duration(u) = 1 + (u%4)·2.
    Edges always go to a LARGER id in the same block (acyclic by
    construction); targets missing from the corpus are skipped."""
    s = set(ids)
    edges = []
    for u in ids:
        r = u % CPM_BLOCK
        for cond, d in ((r % 4 != 3, 1), (r % 4 == 3, 2), (r % 7 == 1, 5)):
            v = u + d
            if cond and r + d <= CPM_BLOCK - 1 and v in s:
                edges.append((u, v, 1 + (u % 4) * 2))
    return edges


def q_critical_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Critical-path method (CPM) over per-block task DAGs: earliest
    start ES(v) = max over in-edges (ES(u) + dur(u)), earliest finish
    EF = ES + dur, block makespan = max EF — the scheduling core of
    any pipeline/workflow planner.

    The Spark side runs the forward DP per block in applyInPandas
    (the debounce device: a genuinely order-dependent recurrence,
    vectorized-dispatched and parallel ACROSS blocks, O(block)
    memory — blocks are 20 tasks, so the group fold is trivially
    bounded).  Ascending id order IS a topological order (edges only
    increase id), so one pass suffices.  The oracle ENUMERATES every
    path in a recursive CTE and takes max(Σ dur) per endpoint — a
    different algorithm whose equality with the DP is Bellman's
    principle.  All integer.

    Scale shape: one shuffle on block; at 1e12 tasks the block
    partitioning is the skew story (each DAG is independent), and
    the window for makespan reuses the same partitioning."""
    import pandas as pd

    def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
        ids = sorted(int(x) for x in pdf["doc_id"])
        es = {u: 0 for u in ids}
        for u, v, w in _cpm_edges_py(ids):
            es[v] = max(es[v], es[u] + w)
        rows = []
        for u in ids:
            dur = 1 + (u % 4) * 2
            rows.append((u, u // CPM_BLOCK, es[u], dur, es[u] + dur))
        return pd.DataFrame(
            rows, columns=["task", "block", "es", "dur", "ef"]
        )

    from pyspark.sql.window import Window

    d = _load_wide(spark, sf_dir, "documents").select("doc_id")
    folded = (
        d.withColumn("block", F.expr(f"doc_id DIV {CPM_BLOCK}"))
        .groupBy("block")
        .applyInPandas(
            fold,
            schema="task bigint, block bigint, es bigint, dur bigint,"
            " ef bigint",
        )
    )
    w = Window.partitionBy("block")
    return folded.withColumn(
        "makespan", F.max("ef").over(w).cast("long")
    ).withColumn(
        "tail_critical", (F.col("ef") == F.col("makespan")).cast("long")
    )


# Spatial grid self-join: deterministic planar points from event_id
# via a QUADRATIC mixer mod distinct primes — an affine LCG puts all
# pair differences on a few lattice vectors (measured: 8 distinct
# squared distances in 6505 pairs), the quadratic scatters them
# (1350 distinct in 1561 pairs at R=300).  event_id is reduced mod P
# BEFORE squaring so the square stays < 1e10 at any corpus size.
SPATIAL_PX, SPATIAL_PY = 99991, 99989
SPATIAL_R = 300
_e = f"(event_id % {SPATIAL_PX})"
SPATIAL_X_SQL = f"({_e} * {_e} + 3 * {_e}) % {SPATIAL_PX}"
_e = f"(event_id % {SPATIAL_PY})"
SPATIAL_Y_SQL = f"(7 * ({_e} * {_e}) + 11 * {_e} + 5) % {SPATIAL_PY}"
del _e


def q_spatial_grid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius self-join via grid bucketing: all point pairs within
    SPATIAL_R, found by hashing each point to an R×R cell and probing
    only the 3×3 cell neighborhood — the standard spatial-join shape
    (geohash / H3 cell join) that turns O(N²) into O(9N) candidate
    rows + one equi-join shuffle.

    Completeness proof: |dx| ≤ R implies the cells' x-indices differ
    by at most 1 (same for y), so every qualifying pair has b's home
    cell inside a's 9-cell probe set.  Uniqueness proof: a's 9 probe
    keys are distinct and b has ONE home cell, so each ordered (a,b)
    candidate is generated at most once — no DISTINCT needed; the
    a < b filter keeps exactly one row per unordered pair.  The
    oracle is the brute-force O(N²) cross join: grid pruning is the
    thing under test.

    Scale shape: candidates shuffle once on the cell key; dense
    cells are the skew story (salt or cap per cell at production);
    dist² stays < 2e10, far under 2^63."""
    e = _load_wide(spark, sf_dir, "events")
    pts = e.select(
        F.col("event_id").alias("pid"),
        F.expr(SPATIAL_X_SQL).cast("long").alias("x"),
        F.expr(SPATIAL_Y_SQL).cast("long").alias("y"),
    ).withColumn("cx", F.expr(f"x DIV {SPATIAL_R}")).withColumn(
        "cy", F.expr(f"y DIV {SPATIAL_R}")
    )
    probes = (
        pts.select(
            F.col("pid").alias("a"),
            F.col("x").alias("ax"),
            F.col("y").alias("ay"),
            "cx",
            "cy",
            F.explode(F.expr("sequence(-1, 1)")).alias("dx"),
        )
        .select(
            "a", "ax", "ay", "cx", "cy", "dx",
            F.explode(F.expr("sequence(-1, 1)")).alias("dy"),
        )
        .select(
            "a", "ax", "ay",
            ((F.col("cx") + F.col("dx")) * 1000000 + F.col("cy") + F.col("dy"))
            .alias("pk"),
        )
    )
    homes = pts.select(
        F.col("pid").alias("b"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        (F.col("cx") * 1000000 + F.col("cy")).alias("hk"),
    )
    dsq = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))
    return (
        probes.join(homes, probes["pk"] == homes["hk"])
        .filter(F.col("a") < F.col("b"))
        .withColumn("dist_sq", dsq.cast("long"))
        .filter(F.col("dist_sq") <= SPATIAL_R * SPATIAL_R)
        .select("a", "b", "dist_sq")
    )


# Phrase queries for the positional-index search row.  Chosen from
# the corpus for non-vacuity: "table table" (21 hits, and the corpus
# contains "table table table" so OVERLAPPING matches are exercised),
# plus two 3-gram phrases (8 and 7 hits at sf0.01).
PHRASES = {
    1: ("table", "table"),
    2: ("slow", "hash", "batch"),
    3: ("row", "column", "sort"),
}


def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional-index phrase search: find every occurrence of each
    query phrase as (phrase_id, doc_id, pos) — the IR operator behind
    quoted-query retrieval, built the way a real engine does it:
    tokenize once into a positional index, then intersect the POSTING
    LISTS of the phrase's terms with pos arithmetic (term k must sit
    at start+k).  Each join side is the index filtered to ONE term —
    the selective-pushdown shape that makes phrase search cheap at
    corpus scale — and the join key (doc_id, pos) co-partitions all
    legs.  Overlapping matches are naturally emitted (every start
    position is independent).

    The oracle scans sequentially instead: tokenize + LEAD window
    over each document, no index — two genuinely different
    algorithms.  Tokenization is the identical split-on-space in
    both engines (split vs string_split; 0-based positions).

    Scale shape: one explode + one shuffle on (doc_id, pos) per leg;
    posting-list filters prune before every join; at 1e12 docs the
    index would be bucketed by term (the inverted_index row) so leg
    joins are shuffle-free."""
    d = _load_wide(spark, sf_dir, "documents")
    idx = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    ).localCheckpoint()
    parts = []
    for pid, words in PHRASES.items():
        cur = idx.filter(F.col("tok") == words[0]).select("doc_id", "pos")
        for k, wd in enumerate(words[1:], 1):
            leg = idx.filter(F.col("tok") == wd).select(
                F.col("doc_id").alias("d2"), (F.col("pos") - k).alias("p2")
            )
            cur = cur.join(
                leg, (cur["doc_id"] == leg["d2"]) & (cur["pos"] == leg["p2"])
            ).select("doc_id", "pos")
        parts.append(
            cur.select(
                F.lit(pid).cast("long").alias("phrase_id"),
                "doc_id",
                F.col("pos").cast("long").alias("pos"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


BITMAP_SEG_BITS = 62  # bits per segment; shift <= 61 keeps the mask
#                       positive in BOTH engines (DuckDB's << THROWS
#                       on 1<<63; Spark's shiftleft would wrap signed)


def q_bitmap_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap via bitmap-index algebra: per (event_type,
    user-segment) presence bitmaps (bit_or of 1<<(user % 62)), then
    every type-pair's common-user count = Σ_seg bit_count(bm_a &
    bm_b) — the roaring-bitmap / bitmap-index plan OLAP engines use
    for COUNT(DISTINCT) intersections, shrinking a user-level join
    to |types|·|users|/62 words.

    The audience entity is the USER-DAY (user_id·1024 + µs-day):
    every raw user turned out to engage every type at sf0.01, so a
    plain user audience made all overlaps full sets (the l_diversity
    fine-key lesson) — active user-days keep the intersection
    strictly partial AND are the unit ad/engagement overlap is
    actually reported in.  The day index is µs DIV 86400000000 (the
    established µs device — calendar date_diff('day') counts
    boundary crossings and would diverge between engines).

    No DISTINCT is needed before the bit_or: duplicate events set
    the same bit (idempotence IS the dedup — a deliberate scale win
    over distinct-first).  The full type-pair grid is generated so a
    zero-overlap pair still emits 0, and per-type exact entity
    counts ride along (n_a, n_b) — also from the bitmaps.  The
    oracle computes the same counts the relational way: DISTINCT
    entity sets, self-join, COUNT — two different algorithms.

    Scale shape: one shuffle on (type, seg) builds the bitmaps; the
    pair join runs on the tiny bitmap relation.  At 1e12 events the
    bitmap relation is |types| · (entities/62) rows — the
    compression is what makes the pairwise overlap matrix feasible."""
    e = _load_wide(spark, sf_dir, "events")
    ent = F.expr(
        "user_id * 1024 + timestampdiff(MICROSECOND,"
        " TIMESTAMP '2024-01-01 00:00:00', ts) DIV 86400000000"
    )
    marked = e.select(
        F.col("event_type").alias("etype"),
        (ent.cast("long") % F.lit(BITMAP_SEG_BITS)).alias("bit"),
        F.expr(
            f"(user_id * 1024 + timestampdiff(MICROSECOND,"
            f" TIMESTAMP '2024-01-01 00:00:00', ts) DIV 86400000000)"
            f" DIV {BITMAP_SEG_BITS}"
        ).alias("seg"),
    ).select(
        "etype",
        "seg",
        F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))").alias("mask"),
    )
    bm = (
        marked.groupBy("etype", "seg")
        .agg(F.expr("bit_or(mask)").alias("bmp"))
        .localCheckpoint()
    )
    totals = bm.groupBy("etype").agg(
        F.sum(F.bit_count("bmp")).alias("n_users")
    )
    a = bm.select(
        F.col("etype").alias("type_a"), "seg", F.col("bmp").alias("ba")
    )
    b = bm.select(
        F.col("etype").alias("type_b"),
        F.col("seg").alias("seg_b"),
        F.col("bmp").alias("bb"),
    )
    common = (
        a.join(b, (a["seg"] == b["seg_b"]) & (a["type_a"] < b["type_b"]))
        .groupBy("type_a", "type_b")
        .agg(F.sum(F.bit_count(F.col("ba").bitwiseAND(F.col("bb")))).alias("nc"))
    )
    types = bm.select(F.col("etype").alias("t")).distinct()
    grid = (
        types.select(F.col("t").alias("type_a"))
        .crossJoin(types.select(F.col("t").alias("type_b")))
        .filter(F.col("type_a") < F.col("type_b"))
    )
    return (
        grid.join(common, ["type_a", "type_b"], "left")
        .join(
            totals.select(F.col("etype").alias("type_a"), F.col("n_users").alias("n_a")),
            "type_a",
        )
        .join(
            totals.select(F.col("etype").alias("type_b"), F.col("n_users").alias("n_b")),
            "type_b",
        )
        .select(
            "type_a",
            "type_b",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.coalesce(F.col("nc"), F.lit(0)).cast("long").alias("n_common"),
        )
    )


BOOT_B = 48      # bootstrap replicates
BOOT_LO, BOOT_HI = 2, 47  # ~2.5% / 97.5% order statistics of 48
# Poisson(1) pmf quantized at 1e-3 (CDF thresholds on r in [0,1000)):
# P(0)=.368, P(1)=.368, P(2)=.184, P(3)=.061, tail -> 4.
BOOT_THRESH = (368, 736, 920, 981)
BOOT_M_CASE = (
    f"CASE WHEN r < {BOOT_THRESH[0]} THEN 0"
    f" WHEN r < {BOOT_THRESH[1]} THEN 1"
    f" WHEN r < {BOOT_THRESH[2]} THEN 2"
    f" WHEN r < {BOOT_THRESH[3]} THEN 3 ELSE 4 END"
)
BOOT_R = (
    "((event_id % 1000003) * 48271 + (b + 1) * 104729)"
    " % 2147483647 % 1000"
)


def q_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap confidence interval for the mean event value
    — the resampling scheme that works on a DATA-PARALLEL engine
    (Chamandy et al., Google 2012): instead of drawing N rows with
    replacement (which needs global coordination), each row enters
    replicate b with multiplicity m ~ Poisson(1), computed row-local.
    Here m is DETERMINISTIC: an LCG over (event_id, b) mapped through
    the 1e-3-quantized Poisson(1) CDF — recomputable bit-for-bit by
    both engines (the dp_histogram seeded-noise device).

    Emits one row per replicate: n_eff = Σm, sum_cents = Σ m·cents
    (exact cents via floor(value·100 + 0.5)), mean_q = (sum_cents ·
    1e6) DIV n_eff, and the CI order statistics lo_q / hi_q (2nd and
    47th of 48 sorted replicate means) broadcast onto every row.
    All-integer; ties in mean_q are harmless because lo/hi are VALUE
    order statistics.

    Scale shape: the ×B explode is map-side (no shuffle until the
    per-replicate agg, which is 48 keys with map-side combine); the
    final ranking window runs on 48 rows.  n_eff ≈ N so the DIV is
    safe for any non-trivial input."""
    from pyspark.sql.window import Window

    e = _load_wide(spark, sf_dir, "events").select(
        "event_id",
        F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    reps = e.crossJoin(
        F.broadcast(spark.range(BOOT_B).select(F.col("id").alias("b")))
    )
    reps = reps.withColumn("r", F.expr(BOOT_R)).withColumn(
        "m", F.expr(BOOT_M_CASE).cast("long")
    )
    agg = reps.groupBy("b").agg(
        F.sum("m").alias("n_eff"),
        F.sum(F.col("m") * F.col("cents")).alias("sum_cents"),
    )
    agg = agg.withColumn(
        "mean_q", F.expr("(sum_cents * 1000000) DIV n_eff")
    )
    w_all = Window.orderBy("mean_q", "b").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    rn = F.row_number().over(Window.orderBy("mean_q", "b"))
    return (
        agg.withColumn("rn", rn)
        .withColumn(
            "lo_q",
            F.max(F.when(F.col("rn") == BOOT_LO, F.col("mean_q"))).over(w_all),
        )
        .withColumn(
            "hi_q",
            F.max(F.when(F.col("rn") == BOOT_HI, F.col("mean_q"))).over(w_all),
        )
        .select(
            "b",
            F.col("n_eff").cast("long").alias("n_eff"),
            F.col("sum_cents").cast("long").alias("sum_cents"),
            F.col("mean_q").cast("long").alias("mean_q"),
            F.col("lo_q").cast("long").alias("lo_q"),
            F.col("hi_q").cast("long").alias("hi_q"),
        )
    )


# Consistent-hash ring config (NOT data): 8 -> 9 physical nodes, 16
# virtual nodes each.  Positions spread by a multiplier large enough
# to wrap the ring many times — a small multiplier left every key on
# a 1% arc and ZERO keys moved (measured).  Collision-freedom of the
# 144 positions is asserted at import.
RING_MOD = 2147483647
RING_V = 16
RING_OLD_N, RING_NEW_N = 8, 9


def _ring_combos(n_nodes):
    """Sorted (pos*64 + node) encodings — one BIGINT per vnode keeps
    the ring a flat array literal both engines can binary-scan with
    list_filter/min.  node < 64 so the encoding is reversible."""
    combos = []
    for node in range(n_nodes):
        for v in range(RING_V):
            pos = ((node * 1024 + v + 1) * 2654435761) % RING_MOD
            combos.append(pos * 64 + node)
    assert len({c // 64 for c in combos}) == len(combos)
    return sorted(combos)


RING_COMBOS_OLD = _ring_combos(RING_OLD_N)
RING_COMBOS_NEW = _ring_combos(RING_NEW_N)
RING_KEY_SQL = f"((doc_id % 1000003) * 1103515245 + 12345) % {RING_MOD}"


def _ring_owner_sql(combos, kp_sql):
    lit = ",".join(str(c) for c in combos)
    arr = f"array({lit})"
    return (
        f"COALESCE(array_min(filter({arr}, c -> c >= ({kp_sql}) * 64)),"
        f" {min(combos)}) % 64"
    )


def q_consistent_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent-hash ring rebalance (Karger 1997): keys hash onto a
    2^31-1 ring owned by the next virtual node clockwise (wraparound
    to the ring minimum); adding physical node 8 moves ONLY the keys
    whose successor vnode is one of the newcomer's — no old->old
    churn, the property that makes ring sharding resizable.  The
    complement of shard_assign's rendezvous row: same contract,
    structurally different algorithm (successor search on a sorted
    ring vs per-node max-weight).

    The ring is CONFIG, not data, so it rides as a sorted literal
    array of (pos·64 + node) encodings; ownership is
    min(filter(ring, pos >= key)) with a COALESCE wraparound — pure
    per-row expressions, zero shuffle, and the same list algebra in
    DuckDB (list_filter/list_min).  The successor comparison is done
    at the ENCODED scale (c >= kp·64): safe because node < 64.

    Scale shape: map-side only.  Ring variance with V=16 is real
    (measured old-owner spread 35..122 of 500) — that imbalance is
    the classic argument for more vnodes, not a bug; the test pins
    the exact move set instead of a balance assumption."""
    d = _load_wide(spark, sf_dir, "documents")
    kp = RING_KEY_SQL
    return d.select(
        "doc_id",
        F.expr(_ring_owner_sql(RING_COMBOS_OLD, kp)).cast("long").alias("old_node"),
        F.expr(_ring_owner_sql(RING_COMBOS_NEW, kp)).cast("long").alias("new_node"),
    ).withColumn(
        "moved", (F.col("old_node") != F.col("new_node")).cast("long")
    )


HIER_MAX_DEPTH = 41  # doc_id DIV 2^40 == 0 for any id < 2^40


def q_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subtree rollup over an implicit binary hierarchy (parent(u) =
    u DIV 2, root 0) — the org-chart / category-tree aggregation:
    every node reports the total n_chars and descendant count of its
    subtree, self included.

    The Spark side inverts the problem: instead of walking DOWN from
    each node (quadratic), each row EXPLODES its own O(log n)
    ancestor chain (doc_id DIV 2^k, k = 0..40, array_distinct
    collapses the 0-tail) and one groupBy(ancestor) sums
    contributions — the log-depth closure device, one shuffle total.
    The oracle climbs the same chain row-by-row in a recursive CTE.
    Only nodes that exist as documents are reported (inner join),
    but contributions FLOW THROUGH missing intermediate ids —
    ancestry is arithmetic, not a join against the corpus.

    Scale shape: explode factor is ≤ 41 regardless of corpus size;
    the rollup groupBy is map-side combinable; at 1e12 docs the hot
    root keys are classic skew — salt the first levels (the
    transcribe repartition lesson)."""
    d = _load_wide(spark, sf_dir, "documents")
    chain = "array_distinct(array(" + ",".join(
        f"doc_id DIV {1 << k}" for k in range(HIER_MAX_DEPTH)
    ) + "))"
    contrib = d.select(
        F.col("n_chars"), F.explode(F.expr(chain)).alias("node")
    )
    rolled = contrib.groupBy("node").agg(
        F.sum("n_chars").alias("subtree_chars"),
        F.count(F.lit(1)).alias("n_desc"),
    )
    return (
        d.select(F.col("doc_id").alias("node"))
        .join(rolled, "node")
        .select(
            "node",
            F.col("subtree_chars").cast("long").alias("subtree_chars"),
            F.col("n_desc").cast("long").alias("n_desc"),
        )
    )


CDF_BUCKET_CENTS = 2000  # ~25 buckets over the 0..490 value range
CDF_SPLIT_DAY = 15       # period A: day < 15; period B: day >= 15


def q_cdf_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift between two periods per event_type via the
    CDF: exact 1-D earth-mover distance (EMD = Σ |F_A − F_B| · gap
    over the observed support) and Kolmogorov-Smirnov statistic
    (max |F_A − F_B|) from ONE cumulative pass — the complement of
    psi_drift (PSI is a density ratio; EMD/KS are CDF geometry, and
    KS needs no binning assumptions to be valid).

    Exactness: CDF differences ride cross-multiplied — |cumA·nB −
    cumB·nA| in units of nA·nB — so no division ever happens; the
    EMD adds the inter-support gap weight (LEAD(bucket) − bucket,
    coalesced to 0 on the last row, where the cross term is provably
    0 anyway since both CDFs reached their totals).  Overflow: cum ≤
    n, so a term is ≤ nA·nB·gap ≈ 8e9 at sf0.1; 1e12-row inputs
    would ride DECIMAL(38,0) (corr_matrix precedent).

    Scale shape: ONE corpus groupBy(type, bucket); the window pass
    runs on the tiny (type × observed-bucket) grid."""
    from pyspark.sql.window import Window

    e = _load_wide(spark, sf_dir, "events")
    day = (
        "timestampdiff(MICROSECOND, TIMESTAMP '2024-01-01 00:00:00', ts)"
        " DIV 86400000000"
    )
    base = e.select(
        F.col("event_type").alias("etype"),
        F.expr(
            f"CAST(FLOOR(value * 100 + 0.5) AS BIGINT) DIV {CDF_BUCKET_CENTS}"
        ).alias("bucket"),
        F.expr(f"CASE WHEN {day} < {CDF_SPLIT_DAY} THEN 1 ELSE 0 END").alias(
            "in_a"
        ),
    )
    per = base.groupBy("etype", "bucket").agg(
        F.sum("in_a").cast("long").alias("n_a"),
        F.sum(1 - F.col("in_a")).cast("long").alias("n_b"),
    )
    w_type = Window.partitionBy("etype")
    w_cum = (
        Window.partitionBy("etype")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_lead = Window.partitionBy("etype").orderBy("bucket")
    per = (
        per.withColumn("tot_a", F.sum("n_a").over(w_type).cast("long"))
        .withColumn("tot_b", F.sum("n_b").over(w_type).cast("long"))
        .withColumn("cum_a", F.sum("n_a").over(w_cum).cast("long"))
        .withColumn("cum_b", F.sum("n_b").over(w_cum).cast("long"))
        .withColumn(
            "gap",
            F.coalesce(
                F.lead("bucket").over(w_lead) - F.col("bucket"), F.lit(0)
            ).cast("long"),
        )
    )
    diff = F.abs(
        F.col("cum_a") * F.col("tot_b") - F.col("cum_b") * F.col("tot_a")
    )
    per = per.withColumn("contrib_q", (diff * F.col("gap")).cast("long"))
    return per.select(
        "etype",
        "bucket",
        "n_a",
        "n_b",
        "cum_a",
        "cum_b",
        "gap",
        "contrib_q",
        F.sum("contrib_q").over(w_type).cast("long").alias("emd_q"),
        F.max(diff).over(w_type).cast("long").alias("ks_q"),
    )


HYST_H_CENTS = 5000   # Schmitt trigger: set when value >= 50.00,
HYST_L_CENTS = 1000   # clear when value <= 10.00; deadband holds state


def q_hysteresis_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-threshold (Schmitt-trigger) alerting per host: state goes
    HIGH when the metric crosses H, LOW when it drops under L, and
    HOLDS inside the deadband — the hysteresis every alerting system
    uses so a metric hovering at one threshold doesn't flap.

    The fold LINEARIZES (the third linearization class after
    sessionize's gap test and politeness's prefix-max): rows inside
    the deadband never change state, so state_i is simply the LAST
    non-deadband row's direction — last_value(flag, ignoreNulls)
    over the ordered window, coalesced to the initial LOW.  Edges
    (alert_on / alert_off) are lag() comparisons on the recovered
    state.  The oracle steps the recurrence row-by-row in a
    recursive CTE: two independent algorithms.  Comparisons run on
    exact cents, never floats.

    Scale shape: one shuffle on host, two window passes over each
    partition; at 1e12 events the host partitioning is the skew
    story (hot hosts -> per-epoch sub-keys, merging states at epoch
    seams by carrying the last flag, which the linearization makes
    trivial)."""
    from pyspark.sql.window import Window

    e = _load_wide(spark, sf_dir, "events")
    base = e.select(
        F.col("user_id").alias("host"),
        "event_id",
        F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)").alias("cents"),
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP '2024-01-01 00:00:00', ts)"
        ).cast("long").alias("ts_us"),
    ).withColumn(
        "flag",
        F.when(F.col("cents") >= HYST_H_CENTS, F.lit(1))
        .when(F.col("cents") <= HYST_L_CENTS, F.lit(0)),
    )
    w_ord = Window.partitionBy("host").orderBy("ts_us", "event_id")
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = base.withColumn(
        "state",
        F.coalesce(F.last("flag", ignorenulls=True).over(w_run), F.lit(0))
        .cast("long"),
    ).withColumn("prev", F.coalesce(F.lag("state").over(w_ord), F.lit(0)))
    return out.select(
        "host",
        "event_id",
        "cents",
        "state",
        ((F.col("prev") == 0) & (F.col("state") == 1)).cast("long")
        .alias("alert_on"),
        ((F.col("prev") == 1) & (F.col("state") == 0)).cast("long")
        .alias("alert_off"),
    )


FAIR_CAP_NUM, FAIR_CAP_DEN = 3, 5  # pool capacity = 60% of its demand


def q_fair_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-min fair (water-filling) capacity allocation per pool:
    each event_type pool has capacity C = 60% of its total demand
    (demand = each user's event count); users with demand under the
    water level get everything, the rest split what remains as
    evenly as integers allow — the fair-share scheduler core
    (networking's max-min fairness, YARN/K8s quota sharing).

    Closed form instead of the iterative drain: sort demands
    ascending (user id tiebreak); user at rank i is FULLY served iff
    d_i·(n−i+1) + P_{i−1} ≤ C (serving everyone remaining at d_i
    still fits — exactly the d_i ≤ λ* test, monotone along the
    sort).  With k satisfied users and prefix P_k: base level
    λ = (C − P_k) DIV (n−k) and the remainder (C − P_k) % (n−k)
    goes to the FIRST unsatisfied users in the same sort order —
    deterministic and documented.  The law test replays the classic
    iterative water-filling and checks Σalloc = C, alloc ≤ d, and
    the max-min property (an unsatisfied user's allocation is within
    1 of every other unsatisfied allocation).

    Scale shape: one shuffle on (pool, user) for demands, then
    window passes inside each pool — pools are independent, so at
    1e12 events this is embarrassingly parallel across pools."""
    from pyspark.sql.window import Window

    e = _load_wide(spark, sf_dir, "events")
    dem = e.groupBy(
        F.col("event_type").alias("pool"), F.col("user_id").alias("usr")
    ).agg(F.count(F.lit(1)).cast("long").alias("demand"))
    w_pool = Window.partitionBy("pool")
    w_ord = Window.partitionBy("pool").orderBy("demand", "usr")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dem = (
        dem.withColumn("n", F.count(F.lit(1)).over(w_pool).cast("long"))
        .withColumn("tot", F.sum("demand").over(w_pool).cast("long"))
        .withColumn(
            "cap",
            F.expr(f"(tot * {FAIR_CAP_NUM}) DIV {FAIR_CAP_DEN}"),
        )
        .withColumn("rn", F.row_number().over(w_ord).cast("long"))
        .withColumn("pref", F.sum("demand").over(w_cum).cast("long"))
        .withColumn(
            "full",
            (
                F.col("demand") * (F.col("n") - F.col("rn") + 1)
                + F.col("pref")
                - F.col("demand")
                <= F.col("cap")
            ).cast("long"),
        )
    )
    dem = dem.withColumn(
        "k", F.sum("full").over(w_pool).cast("long")
    ).withColumn(
        "p_k",
        F.coalesce(
            F.max(F.when(F.col("full") == 1, F.col("pref"))).over(w_pool),
            F.lit(0),
        ).cast("long"),
    )
    lam = F.expr("CASE WHEN n > k THEN (cap - p_k) DIV (n - k) END")
    rem = F.expr("CASE WHEN n > k THEN (cap - p_k) % (n - k) END")
    alloc = F.when(F.col("full") == 1, F.col("demand")).otherwise(
        lam + (F.col("rn") - F.col("k") <= rem).cast("long")
    )
    # satisfied is derived from the OUTCOME (alloc == demand), not the
    # water-level test: a user just above the level whose remainder +1
    # happens to reach their demand IS satisfied.
    return dem.withColumn("alloc", alloc.cast("long")).select(
        "pool",
        "usr",
        "demand",
        "cap",
        (F.col("alloc") == F.col("demand")).cast("long").alias("satisfied"),
        "alloc",
    )


TA_K = 10      # result size
TA_DEPTH = 60  # prefix depth per ranked list (certificate verified)


def q_threshold_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fagin threshold-algorithm top-k over two ranked score lists
    (TA, Fagin/Lotem/Naor 2001): the distributed-retrieval primitive
    that proves an EXACT top-k while reading only a prefix of each
    list.  Scores: s1 = n_chars (the "quality" list), s2 = an LCG
    over doc_id (the "relevance" list); total = s1 + s2.

    Candidates = union of each list's top-TA_DEPTH prefix (rank by
    score desc, doc_id asc).  Threshold τ = s1@depth + s2@depth
    bounds every unseen doc (outside both prefixes ⇒ both scores ≤
    their depth-th value, ties included).  The emitted `cert` column
    is the machine-checkable proof: kth-best candidate total ≥ τ —
    when 1 the prefix top-k IS the global top-k, which the oracle
    (full-scan sort) confirms.  TA_DEPTH=60 was tuned so the
    certificate holds on the fixture; the test also pins that
    shrinking the prefix flips the certificate off before it ever
    yields a wrong answer.

    Scale shape: at 1e12 docs each ranked prefix comes from a
    per-shard top-DEPTH + merge (the group_topk device) — here the
    global ranking is a rank window; the candidate set is ≤ 2·DEPTH rows,
    so everything after the prefixes is driver-trivial."""
    from pyspark.sql.window import Window

    d = _load_wide(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("s1"),
        F.expr("((doc_id % 1000003) * 48271 + 11) % 2147483647 % 1000")
        .cast("long").alias("s2"),
    ).localCheckpoint()
    r1 = F.row_number().over(Window.orderBy(F.desc("s1"), F.asc("doc_id")))
    r2 = F.row_number().over(Window.orderBy(F.desc("s2"), F.asc("doc_id")))
    ranked = scored.withColumn("r1", r1).withColumn("r2", r2)
    cand = ranked.filter(
        (F.col("r1") <= TA_DEPTH) | (F.col("r2") <= TA_DEPTH)
    )
    tau = ranked.filter(F.col("r1") == TA_DEPTH).select(
        F.col("s1").alias("b1")
    ).crossJoin(
        ranked.filter(F.col("r2") == TA_DEPTH).select(F.col("s2").alias("b2"))
    ).select((F.col("b1") + F.col("b2")).alias("tau"))
    topk = (
        cand.withColumn("total", F.col("s1") + F.col("s2"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(F.desc("total"), F.asc("doc_id"))
            ),
        )
        .filter(F.col("rk") <= TA_K)
    )
    return topk.crossJoin(F.broadcast(tau)).select(
        "doc_id",
        "s1",
        "s2",
        "total",
        F.col("rk").cast("long").alias("rk"),
        (F.min("total").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ) >= F.col("tau")).cast("long").alias("cert"),
    )


DRAWDOWN_POS_TYPES = ("purchase", "signup")  # inflows; rest outflows


def q_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per host over its signed cash-flow series
    (inflow for purchase/signup, outflow otherwise, exact cents) —
    the sequence-analytics core shared by finance risk (peak-to-
    trough), capacity burn-down, and Kadane's max-subarray (drawdown
    of the negated series).  The balance starts at 0 BEFORE the
    first event, so the running peak is max(0, max cum) and drawdown
    can begin on the first outflow.

    Pure window algebra — cumulative sum, running max over the same
    frame, max of the difference — no fold needed because both
    running aggregates are prefix-monotone.  One output row per
    host.

    Scale shape: one shuffle on host, one window pass, one groupBy
    reusing the same partitioning (no second exchange)."""
    from pyspark.sql.window import Window

    e = _load_wide(spark, sf_dir, "events")
    pos = ", ".join(f"'{t}'" for t in DRAWDOWN_POS_TYPES)
    base = e.select(
        F.col("user_id").alias("host"),
        "event_id",
        F.expr(
            f"CASE WHEN event_type IN ({pos}) THEN 1 ELSE -1 END"
            " * CAST(FLOOR(value * 100 + 0.5) AS BIGINT)"
        ).alias("delta"),
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP '2024-01-01 00:00:00', ts)"
        ).cast("long").alias("ts_us"),
    )
    w_run = (
        Window.partitionBy("host")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cur = base.withColumn("cum", F.sum("delta").over(w_run).cast("long"))
    cur = cur.withColumn(
        "peak",
        F.greatest(F.lit(0).cast("long"), F.max("cum").over(w_run)),
    ).withColumn("dd", F.col("peak") - F.col("cum"))
    return cur.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.max("cum").alias("max_cents"),
        # last-by-event-order, NOT F.last (which is partition-order-
        # dependent inside a groupBy agg)
        F.expr("max_by(cum, struct(ts_us, event_id))").alias("final_cents"),
        F.max("dd").cast("long").alias("max_drawdown"),
    ).select(
        "host",
        "n_events",
        F.greatest(F.lit(0).cast("long"), F.col("max_cents")).alias(
            "peak_cents"
        ),
        F.col("final_cents").cast("long").alias("final_cents"),
        "max_drawdown",
    )


# SPRT constants (Wald 1945), all data-independent literals computed
# once here and embedded identically in both engines: test p0 = 0.15
# vs p1 = 0.25 conversion, alpha = beta = 0.05 -> log boundaries
# +-ln(19).  Quantized at 1e-6 nats.
import math as _m

SPRT_L1 = _m.floor(_m.log(0.25 / 0.15) * 10**6)   # llr of a conversion
SPRT_L0 = _m.floor(_m.log(0.75 / 0.85) * 10**6)   # llr of a miss
SPRT_A = _m.floor(_m.log(19.0) * 10**6)            # accept H1 boundary
del _m


def q_sprt_decision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald sequential probability-ratio test per user: walk the
    event stream accumulating the conversion log-likelihood ratio
    (purchase = hit) and STOP at the first boundary crossing —
    accept_h1 at +ln19, accept_h0 at −ln19, else keep sampling — the
    sequential A/B-testing primitive that decides with ~half the
    samples of a fixed-horizon test.

    The stopped walk is recovered with windows, no fold: cum llr is
    a prefix sum; the decision row is the MIN seq among crossing
    rows (crossings AFTER the first are ignored — exactly Wald's
    stopping rule, since what cum does after a stop is irrelevant);
    the verdict is that row's crossing direction.  Integer nats at
    1e-6; the llr increments are compile-time literals.

    Scale shape: one shuffle on user, two window passes, final
    groupBy on the same key; boundary literals broadcast as
    constants."""
    from pyspark.sql.window import Window

    e = _load_wide(spark, sf_dir, "events")
    base = e.select(
        F.col("user_id").alias("usr"),
        "event_id",
        F.expr(
            f"CASE WHEN event_type = 'purchase' THEN {SPRT_L1}"
            f" ELSE {SPRT_L0} END"
        ).cast("long").alias("llr"),
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP '2024-01-01 00:00:00', ts)"
        ).cast("long").alias("ts_us"),
    )
    w_ord = Window.partitionBy("usr").orderBy("ts_us", "event_id")
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cur = base.withColumn("seq", (F.row_number().over(w_ord) - 1).cast("long"))
    cur = cur.withColumn("cum", F.sum("llr").over(w_run).cast("long"))
    cur = cur.withColumn(
        "cross",
        F.when(F.col("cum") >= SPRT_A, F.lit(1))
        .when(F.col("cum") <= -SPRT_A, F.lit(-1)),
    )
    agg = cur.groupBy("usr").agg(
        F.min(F.when(F.col("cross").isNotNull(), F.col("seq"))).alias("dseq"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    first = cur.select(
        F.col("usr").alias("u2"), F.col("seq").alias("s2"),
        F.col("cross").alias("dir"), F.col("cum").alias("cum_stop"),
    )
    out = agg.join(
        first,
        (agg["usr"] == first["u2"]) & (agg["dseq"] == first["s2"]),
        "left",
    )
    return out.select(
        "usr",
        "n_events",
        F.coalesce(F.col("dseq"), F.lit(-1)).cast("long").alias("decision_seq"),
        F.expr(
            "CASE WHEN dir = 1 THEN 'accept_h1'"
            " WHEN dir = -1 THEN 'accept_h0'"
            " ELSE 'continue' END"
        ).alias("decision"),
        F.coalesce(F.col("cum_stop"), F.lit(0)).cast("long").alias("llr_stop"),
    )


CL_COHORTS = 4       # synthetic signup cohorts: user_id % 4 (week)
CL_SCALE = 10**6     # development-factor quantization
CL_WEEK_US = 7 * 86400000000


def q_chain_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chain-ladder development-triangle projection (the actuarial /
    revenue-forecast standard, Mack 1993): cohorts accumulate value
    by age; all-cohort development factors f_a = Σ C[·,a+1] / Σ
    C[·,a] (over cohorts observing both ages) roll the last observed
    diagonal forward to the horizon.

    The fixture assigns signup cohorts deterministically (user_id %
    4 = signup week; pre-signup events dropped) — every user's first
    event landed in week 0, so NATURAL cohorts give a 1-row triangle
    with nothing to project (the chain_ladder analog of the
    l_diversity fine-key lesson).  Factors are quantized at 1e6 and
    applied stepwise with floor division — the step ORDER is the
    spec, identical in both engines; at most CL_COHORTS−1 steps ever
    (cohort c misses exactly c diagonals), so the projection loop is
    bounded by the cohort count, not the horizon.

    Output: the full (cohort, age) grid — observed cumulative cents
    (is_observed=1) plus projected cells (is_observed=0).

    Scale shape: one corpus groupBy to the (cohort, age) grid;
    everything after (factors, rollforward) lives on the tiny
    triangle.  At 1e12 events the grid is |cohorts|·|ages| rows
    regardless of input size."""
    e = _load_wide(spark, sf_dir, "events")
    base = e.select(
        F.expr(f"user_id % {CL_COHORTS}").alias("cohort"),
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP '2024-01-01 00:00:00', ts)"
            f" DIV {CL_WEEK_US}"
        ).alias("wk"),
        F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)").alias("cents"),
    ).filter(F.col("wk") >= F.col("cohort"))
    horizon = base.agg(F.max("wk").alias("w")).collect()[0]["w"]
    W = int(horizon)
    inc = base.withColumn("age", F.col("wk") - F.col("cohort")).groupBy(
        "cohort", "age"
    ).agg(F.sum("cents").alias("inc"))
    from pyspark.sql.window import Window

    grid = (
        spark.range(CL_COHORTS).select(F.col("id").alias("cohort"))
        .crossJoin(spark.range(W + 1).select(F.col("id").alias("age")))
        .filter(F.col("age") <= W - F.col("cohort"))
    )
    w_cum = (
        Window.partitionBy("cohort")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    obs = (
        grid.join(inc, ["cohort", "age"], "left")
        .withColumn("inc", F.coalesce(F.col("inc"), F.lit(0)))
        .withColumn("cum", F.sum("inc").over(w_cum).cast("long"))
        .localCheckpoint()
    )
    nxt = obs.select(
        F.col("cohort").alias("c2"),
        (F.col("age") - 1).alias("a2"),
        F.col("cum").alias("cum_next"),
    )
    factors = (
        obs.join(nxt, (obs["cohort"] == nxt["c2"]) & (obs["age"] == nxt["a2"]))
        .groupBy("age")
        .agg(
            F.expr(f"(SUM(cum_next) * {CL_SCALE}) DIV SUM(cum)").alias("f_q")
        )
        .localCheckpoint()
    )
    diag = obs.filter(F.col("age") == W - F.col("cohort")).select(
        "cohort", "age", "cum"
    )
    fac = factors.select(F.col("age").alias("f_age"), "f_q")
    projected = []
    cur = diag
    for _ in range(CL_COHORTS - 1):
        cur = (
            cur.join(fac, F.col("age") == F.col("f_age"))
            .select(
                "cohort",
                (F.col("age") + 1).alias("age"),
                F.expr(f"(cum * f_q) DIV {CL_SCALE}").alias("cum"),
            )
            .filter(F.col("age") <= W)
            .localCheckpoint()
        )
        projected.append(cur)
    out = obs.select(
        "cohort", "age", F.col("cum").alias("cum_cents"),
        F.lit(1).cast("long").alias("is_observed"),
    )
    for p in projected:
        out = out.unionByName(
            p.select(
                "cohort", "age", F.col("cum").alias("cum_cents"),
                F.lit(0).cast("long").alias("is_observed"),
            )
        )
    return out


# Point-in-polygon config (NOT data): three polygons on the
# [0,1e5)^2 plane shared with spatial_grid_join — a triangle, a
# convex quad, and a concave C-shape (the notch is what separates
# ray casting from a bbox test; 459 fixture points land in the C's
# bbox but outside the C).  Verified: no fixture point lies exactly
# on any edge, so the half-open crossing rule has no parity seams.
PIP_POLYS = {
    0: [(10000, 10000), (90000, 20000), (30000, 80000)],
    1: [(50000, 50000), (95000, 55000), (90000, 95000), (55000, 90000)],
    2: [(5000, 40000), (45000, 40000), (45000, 55000), (15000, 55000),
        (15000, 70000), (45000, 70000), (45000, 85000), (5000, 85000)],
}


def _pip_crossings_sql(poly, px, py):
    """Literal-unrolled ray-casting crossings for one polygon: for
    each non-horizontal edge normalized to y1 < y2, a crossing is
    y1 <= py < y2 AND (px−x1)(y2−y1) < (x2−x1)(py−y1) — the
    cross-multiplied form of 'px left of the edge at height py', so
    the whole test is integer arithmetic with no division."""
    terms = []
    n = len(poly)
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        if y1 == y2:
            continue
        if y1 > y2:
            x1, y1, x2, y2 = x2, y2, x1, y1
        terms.append(
            f"CASE WHEN {y1} <= {py} AND {py} < {y2}"
            f" AND ({px} - {x1}) * {y2 - y1}"
            f" < {x2 - x1} * ({py} - {y1}) THEN 1 ELSE 0 END"
        )
    return "(" + " + ".join(terms) + ")"


def q_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-polygon containment via integer ray casting — the
    geofencing primitive (is this point inside the delivery zone /
    country boundary / exclusion area).  Polygons are config, so the
    entire test compiles to ONE literal-unrolled projection: per
    polygon, a sum of per-edge crossing CASEs (cross-multiplied, no
    division, half-open in y so shared vertices count once), parity
    = containment.  Zero joins, zero shuffle, whole-stage codegen —
    the correct 100 TB shape for config-sized geometry; a polygon
    RELATION would instead broadcast edges and pay a per-row loop.

    Emits per point: how many polygons contain it and the
    containment bitmask.  The concave polygon's notch is the
    regression the law test pins (inside-bbox ≠ inside).

    Scale shape: pure map-side projection over the corpus."""
    e = _load_wide(spark, sf_dir, "events")
    pts = e.select(
        F.col("event_id").alias("pid"),
        F.expr(SPATIAL_X_SQL).cast("long").alias("x"),
        F.expr(SPATIAL_Y_SQL).cast("long").alias("y"),
    )
    inside = {
        p: f"({_pip_crossings_sql(poly, 'x', 'y')} % 2)"
        for p, poly in PIP_POLYS.items()
    }
    n_inside = " + ".join(inside.values())
    mask = " + ".join(f"({ex}) * {1 << p}" for p, ex in inside.items())
    return pts.select(
        "pid",
        "x",
        "y",
        F.expr(n_inside).cast("long").alias("n_inside"),
        F.expr(mask).cast("long").alias("poly_mask"),
    )


KNAP_BLOCK = 15          # items per planning block (2^15 oracle masks)
KNAP_CAP_NUM, KNAP_CAP_DEN = 2, 5  # IO budget = 40% of block weight


def q_knapsack_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """0/1-knapsack compaction planning per block: given per-file
    rewrite costs (weight = (n_chars % 50) + 10) and reclaim values
    (value = n_chars), pick the subset maximizing reclaimed value
    under an IO budget of 40% of the block's total cost — the
    optimizer behind 'which files do we rewrite tonight'.

    The Spark side runs the exact DP per block in applyInPandas
    (value -> min-weight dict; the answer (max value, then min
    weight at that value) is set-deterministic, so item order is
    irrelevant).  The oracle ENUMERATES all 2^15 subsets as a mask
    range join — exhaustive search as the cross-engine optimality
    proof, the strongest oracle shape in the suite.  Block size 15
    is chosen exactly so the oracle stays enumerable.

    Scale shape: one shuffle on block; DP is O(items · distinct
    values) per block, independent of corpus size; blocks are
    embarrassingly parallel."""
    import pandas as pd

    def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
        ws = [int(w) for w in pdf["w"]]
        vs = [int(v) for v in pdf["v"]]
        blk = int(pdf["block"].iloc[0])
        cap = sum(ws) * KNAP_CAP_NUM // KNAP_CAP_DEN
        best = {0: 0}  # achievable value -> min weight
        for w, v in zip(ws, vs):
            for val, wt in list(best.items()):
                nv, nw = val + v, wt + w
                if nw <= cap and (nv not in best or nw < best[nv]):
                    best[nv] = nw
        bv = max(best)
        return pd.DataFrame(
            [(blk, len(ws), sum(ws), cap, bv, best[bv])],
            columns=[
                "block", "n_items", "w_tot", "cap", "best_value",
                "best_weight",
            ],
        )

    d = _load_wide(spark, sf_dir, "documents")
    items = d.select(
        F.expr(f"doc_id DIV {KNAP_BLOCK}").alias("block"),
        F.expr("(n_chars % 50) + 10").cast("long").alias("w"),
        F.col("n_chars").cast("long").alias("v"),
    )
    return items.groupBy("block").applyInPandas(
        fold,
        schema="block bigint, n_items bigint, w_tot bigint, cap bigint,"
        " best_value bigint, best_weight bigint",
    )


ACT_DUR_US_PER_CENT = 1_000_000  # interval length = cents seconds


def q_activity_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval scheduling (activity selection) per host: from each
    host's intervals [start, start + cents·1s), keep the classic
    earliest-end greedy's choices — provably a MAXIMUM-cardinality
    non-overlapping set (the exchange argument; the law test
    re-proves it per host against an independent DP).  Touching
    intervals (next start == last end) are compatible.

    The greedy's state is the last KEPT end — like debounce, it does
    NOT linearize, so the Spark side is a per-host applyInPandas
    fold (parallel across hosts, O(group) memory) and the oracle
    steps the same rule in a recursive CTE ordered by (end, id).

    Scale shape: one shuffle on host; the fold is one pass per
    group."""
    import pandas as pd

    def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(["end_us", "event_id"])
        rows = []
        last = None
        for eid, h, s, en in zip(
            pdf["event_id"], pdf["host"], pdf["start_us"], pdf["end_us"]
        ):
            if last is None or int(s) >= last:
                last = int(en)
                rows.append(
                    (int(h), int(eid), int(s), int(en), len(rows) + 1)
                )
        return pd.DataFrame(
            rows,
            columns=["host", "event_id", "start_us", "end_us", "k_idx"],
        )

    e = _load_wide(spark, sf_dir, "events")
    iv = e.select(
        F.col("user_id").alias("host"),
        "event_id",
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP '2024-01-01 00:00:00', ts)"
        ).cast("long").alias("start_us"),
        F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)").alias("cents"),
    ).select(
        "host",
        "event_id",
        "start_us",
        (F.col("start_us") + F.col("cents") * ACT_DUR_US_PER_CENT)
        .alias("end_us"),
    )
    return iv.groupBy("host").applyInPandas(
        fold,
        schema="host bigint, event_id bigint, start_us bigint,"
        " end_us bigint, k_idx bigint",
    )


def q_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Spearman rank correlation between two per-doc
    quality signals (n_chars vs token count) — the rank-agreement
    complement to corr_matrix's Pearson: do two quality scorers
    ORDER the corpus the same way (the question that matters for
    threshold-based filtering), not do they co-vary linearly.

    Exactness device: average ranks for ties are half-integers, so
    the engine-shared quantity is 2·avgrank = 2·RANK() + tiecount −
    1 — an exact BIGINT in both engines.  All five moment sums are
    exact integer aggregates; the only float ops are ONE division
    and ONE sqrt assembled in the same order in both engines
    (IEEE-correctly-rounded on identical inputs ⇒ bit-identical;
    the bm25/pmi lesson).  rho is reported at 6 dp.

    Scale shape: two window sorts inside ONE hash partitioning by
    source (the second window reuses the first's exchange), then a
    partial-aggregated groupBy — no corpus-wide sort, no driver
    collect.  At 1e12 docs the per-source rank windows are the cost;
    for unbounded groups the production variant samples per source
    first (the stratified_sample row)."""
    from pyspark.sql.window import Window

    d = _load_wide(spark, sf_dir, "documents")
    base = d.select(
        "source",
        F.col("n_chars").cast("long").alias("x"),
        F.size(F.split(F.col("text"), " ")).cast("long").alias("y"),
    )
    wx = Window.partitionBy("source").orderBy("x")
    wy = Window.partitionBy("source").orderBy("y")
    ranked = base.select(
        "source",
        (2 * F.rank().over(wx)
         + F.count("*").over(Window.partitionBy("source", "x")) - 1
         ).alias("rx"),
        (2 * F.rank().over(wy)
         + F.count("*").over(Window.partitionBy("source", "y")) - 1
         ).alias("ry"),
    )
    a = ranked.groupBy("source").agg(
        F.count("*").alias("n"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    denx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return a.select(
        "source",
        F.col("n").alias("n_docs"),
        F.round(
            num.cast("double")
            / F.sqrt(denx.cast("double") * deny.cast("double")),
            6,
        ).alias("rho"),
    )


def q_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Gini coefficient of document lengths — the
    corpus-diversity audit (is one source's contribution dominated
    by a few huge documents?).  Data-mixture work cares about this
    before sampling rates are set.

    Exactness device: the sorted-prefix Gini G = (2·Σ i·x_i −
    (n+1)·Σx) / (n·Σx) needs only ONE total order by (x, doc_id);
    ties among equal x contribute x·Σi regardless of their relative
    order, so the formula is tie-stable by algebra, not by
    convention.  The numerator is emitted as an exact BIGINT
    (gini_num) so the gate covers the integer algebra itself; the
    single final division is the only float op.

    Scale shape: one window rank inside a hash partitioning by
    source + one partial-aggregated groupBy.  The law test
    re-derives G per source from the O(n²) mean-absolute-difference
    definition — a genuinely different formulation."""
    from pyspark.sql.window import Window

    d = _load_wide(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    ranked = d.select(
        "source",
        F.col("n_chars").cast("long").alias("x"),
        F.row_number().over(w).cast("long").alias("i"),
    )
    a = ranked.groupBy("source").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("tot"),
        F.sum(F.col("i") * F.col("x")).alias("six"),
    )
    num = 2 * F.col("six") - (F.col("n") + 1) * F.col("tot")
    return a.select(
        "source",
        F.col("n").alias("n_docs"),
        F.col("tot").alias("total_chars"),
        num.alias("gini_num"),
        F.round(
            num.cast("double") / (F.col("n") * F.col("tot")).cast("double"),
            6,
        ).alias("gini"),
    )


TOP_PATHS_LEN = 3   # events per user-path prefix
TOP_PATHS_K = 20    # paths reported


def q_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user journey paths: each user's first TOP_PATHS_LEN
    event types in (ts, event_id) order joined with '>', ranked by
    how many users share the path — the product-analytics 'most
    common first session shape' question (funnel_steps pins ONE
    target path; this discovers the paths).

    Deterministic by total order (n_users DESC, path ASC); the
    boundary tie at rank K cuts identically in both engines.  At
    sf0.01 the fixture realizes 88 distinct 3-paths with max
    multiplicity 5 and 40 shared paths — non-vacuous ranking.

    Scale shape: per-user collect_list+array_sort inside ONE
    groupBy (user event counts are session-bounded), then a
    path-count groupBy whose result is DOMAIN-sized (≤ |types|^L),
    cut via TakeOrderedAndProject — no corpus sort.  The final
    row_number window runs on exactly K rows (bounded, post-limit),
    never on the corpus."""
    from pyspark.sql.window import Window

    e = _load_wide(spark, sf_dir, "events")
    seq = e.groupBy("user_id").agg(
        F.slice(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ),
            1,
            TOP_PATHS_LEN,
        ).alias("first_k")
    )
    paths = seq.select(
        F.concat_ws(
            ">", F.transform("first_k", lambda s: s["event_type"])
        ).alias("path")
    )
    counted = paths.groupBy("path").agg(F.count("*").alias("n_users"))
    top = counted.orderBy(F.desc("n_users"), F.asc("path")).limit(TOP_PATHS_K)
    return top.withColumn(
        "rank_idx",
        F.row_number()
        .over(Window.orderBy(F.desc("n_users"), F.asc("path")))
        .cast("long"),
    )


FIFO_CREDIT_TYPE = "purchase"   # credits consumed FIFO ...
FIFO_DEBIT_TYPE = "view"        # ... by these debits


def q_fifo_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO allocation matching (inventory lots / cost basis / quota
    consumption): per user, debit quantities consume credit
    quantities strictly first-in-first-out; emit every (credit,
    debit, matched_qty) lot.  The classic formulation is a stateful
    queue walk — which does not distribute.

    Linearization: credit i owns the cumulative-quantity interval
    [ccum_{i-1}, ccum_i) and debit j owns [dcum_{j-1}, dcum_j);
    FIFO matches are EXACTLY the pairwise interval overlaps
    (max(0, min(hi) − max(lo))), because FIFO consumes the shared
    quantity axis left to right on both sides.  Two window cumsums
    + one equi-join on user with an overlap predicate — no state,
    no Python, exact BIGINT cents throughout.

    The oracle is the INDEPENDENT formulation: a recursive-CTE
    two-pointer walk carrying (credit idx, debit idx, consumed
    amounts) — queue semantics stepped one match at a time.

    Scale shape: per-user match counts are bounded by per-user
    event counts, so the overlap join fans out per user, not per
    corpus; at unbounded per-key volumes the production variant
    bins the quantity axis first (the interval_join pattern) so
    candidate pairs are bucket-local."""
    from pyspark.sql.window import Window

    e = _load_wide(spark, sf_dir, "events")
    base = e.filter(
        F.col("event_type").isin(FIFO_CREDIT_TYPE, FIFO_DEBIT_TYPE)
    ).select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)").alias("qty"),
    ).filter(F.col("qty") > 0)

    def _cum(etype: str, pfx: str) -> DataFrame:
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        side = base.filter(F.col("event_type") == etype)
        return side.select(
            "user_id",
            F.col("event_id").alias(f"{pfx}_event"),
            F.sum("qty").over(w).alias(f"{pfx}_hi"),
            (F.sum("qty").over(w) - F.col("qty")).alias(f"{pfx}_lo"),
        )

    c = _cum(FIFO_CREDIT_TYPE, "credit")
    d = _cum(FIFO_DEBIT_TYPE, "debit").withColumnRenamed(
        "user_id", "d_user"
    )
    pairs = c.join(
        d,
        (F.col("user_id") == F.col("d_user"))
        & (F.col("credit_lo") < F.col("debit_hi"))
        & (F.col("debit_lo") < F.col("credit_hi")),
    )
    return pairs.select(
        "user_id",
        "credit_event",
        "debit_event",
        (
            F.least("credit_hi", "debit_hi")
            - F.greatest("credit_lo", "debit_lo")
        ).alias("qty"),
    )


MAXSUB_BASE_CENTS = 3500  # fixed per-event cost; median revenue is 3459


def q_max_subarray(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum-sum contiguous run per user (best streak vs a fixed
    per-event cost): Kadane's sequential fold linearized to windows
    — gain ending at i = cum_i − min(0, min_{j<i} cum_j), so ONE
    cumulative sum + ONE running struct-min replace the stateful
    scan.  The running min is taken over struct(cum, seq) so the
    argmin POSITION rides along exactly (earliest prefix argmin =
    smallest start, matching the oracle's tie order); a virtual
    seq-0 / cum-0 row per user represents the empty prefix.  Final
    answer = one max(struct(gain, −end, −start)) per user — total
    order (gain DESC, end ASC, start ASC), all exact BIGINT cents.

    The oracle ENUMERATES every interval (all O(n²) prefix pairs)
    and takes the same argmax — brute force as the optimality
    proof (the knapsack_plan pattern).

    Scale shape: one hash partitioning by user for the windows +
    one partial-aggregated groupBy; nothing corpus-sorted."""
    from pyspark.sql.window import Window

    e = _load_wide(spark, sf_dir, "events")
    rows = e.select(
        "user_id",
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .cast("long")
        .alias("seq"),
        (
            F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)")
            - MAXSUB_BASE_CENTS
        ).alias("net"),
    )
    virtual = rows.select("user_id").distinct().select(
        "user_id", F.lit(0).cast("long").alias("seq"),
        F.lit(0).cast("long").alias("net"),
    )
    w = Window.partitionBy("user_id").orderBy("seq")
    cum = rows.unionByName(virtual).select(
        "user_id", "seq", F.sum("net").over(w).alias("cum")
    )
    wprev = (
        Window.partitionBy("user_id")
        .orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cand = cum.select(
        "user_id",
        "seq",
        "cum",
        F.min(F.struct("cum", "seq")).over(wprev).alias("m"),
    ).filter(F.col("seq") >= 1)
    scored = cand.select(
        "user_id",
        F.struct(
            (F.col("cum") - F.col("m.cum")).alias("gain"),
            (-F.col("seq")).alias("neg_end"),
            (-(F.col("m.seq") + 1)).alias("neg_start"),
        ).alias("c"),
    )
    best = scored.groupBy("user_id").agg(
        F.count("*").alias("n_events"), F.max("c").alias("b")
    )
    return best.select(
        "user_id",
        "n_events",
        F.col("b.gain").alias("best_sum"),
        (-F.col("b.neg_start")).alias("start_seq"),
        (-F.col("b.neg_end")).alias("end_seq"),
    )


ACF_LAGS = (1, 2, 3)


def q_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user lag-k autocorrelation of the event-value series
    (k = 1..3) — the seasonality/burstiness diagnostic: is a user's
    spend predictable from their previous events?  Spec: Pearson
    correlation over the lagged PAIRS (x_i, x_{i−k}) — the
    regression form of sample ACF; both engines implement this same
    definition.

    Exactness: cents are exact BIGINT, all six moment sums per lag
    are exact integer aggregates over the non-null-lag rows, and
    the one division + sqrt is assembled in the same operand order
    in both engines (the spearman_corr device).  The three lags
    ride ONE window partitioning (three lag() columns, same sort)
    and ONE groupBy; stack() unpivots the 1-row-per-user aggregate
    — free.

    Scale shape: one hash partitioning by user + partial agg; no
    self-join (lag() replaces the seq+k equi-join)."""
    from pyspark.sql.window import Window

    e = _load_wide(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    base = e.select(
        "user_id",
        F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)").alias("x"),
        *[
            F.lag(
                F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)"), k
            ).over(w).alias(f"y{k}")
            for k in ACF_LAGS
        ],
    )
    aggs = []
    for k in ACF_LAGS:
        y = F.col(f"y{k}")
        ok = y.isNotNull()
        aggs += [
            F.sum(F.when(ok, 1).otherwise(0)).alias(f"n{k}"),
            F.sum(F.when(ok, F.col("x")).otherwise(0)).alias(f"sx{k}"),
            F.sum(F.when(ok, y).otherwise(0)).alias(f"sy{k}"),
            F.sum(F.when(ok, F.col("x") * F.col("x")).otherwise(0)).alias(
                f"sxx{k}"
            ),
            F.sum(F.when(ok, y * y).otherwise(0)).alias(f"syy{k}"),
            F.sum(F.when(ok, F.col("x") * y).otherwise(0)).alias(f"sxy{k}"),
        ]
    a = base.groupBy("user_id").agg(*aggs)
    acfs = a.select(
        "user_id",
        *[
            F.round(
                (
                    F.col(f"n{k}") * F.col(f"sxy{k}")
                    - F.col(f"sx{k}") * F.col(f"sy{k}")
                ).cast("double")
                / F.sqrt(
                    (
                        F.col(f"n{k}") * F.col(f"sxx{k}")
                        - F.col(f"sx{k}") * F.col(f"sx{k}")
                    ).cast("double")
                    * (
                        F.col(f"n{k}") * F.col(f"syy{k}")
                        - F.col(f"sy{k}") * F.col(f"sy{k}")
                    ).cast("double")
                ),
                6,
            ).alias(f"acf{k}")
            for k in ACF_LAGS
        ],
        *[F.col(f"n{k}").alias(f"np{k}") for k in ACF_LAGS],
    )
    stack_args = ", ".join(
        f"CAST({k} AS BIGINT), acf{k}, np{k}" for k in ACF_LAGS
    )
    return acfs.select(
        "user_id",
        F.expr(
            f"stack({len(ACF_LAGS)}, {stack_args}) AS (lag_k, acf, n_pairs)"
        ),
    ).select("user_id", "lag_k", "acf", "n_pairs")


TCLOSE_T_NUM, TCLOSE_T_DEN = 3, 20   # t = 0.15 (splits 165/109 at sf0.01)


def q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li et al., ICDE 2007) — completes the
    privacy trio: k_anonymity bounds class SIZE, l_diversity bounds
    sensitive-value VARIETY, t-closeness bounds how far a class's
    sensitive DISTRIBUTION drifts from the global one (a class can
    be large and diverse yet still leak — e.g. 90% one nation vs 4%
    globally).  Same QI as l_diversity (segment, floor(bal/1000));
    sensitive = nationkey, an ORDERED domain, so the distance is the
    ordered-domain EMD: Σ_i |cumP_i − cumQ_i| / (m−1).

    Exactness device: cross-multiplied cumulative counts — the term
    at domain position i is |cum_c_i·N − cum_C_i·n_g|, an exact
    BIGINT; emd_num = Σ terms is under the gate as an integer, and
    emd = emd_num / (n_g·N·(m−1)) is the single float division.
    Missing domain values still contribute terms (the cum carries),
    so the class table is densified against the 25-value domain
    first — a DOMAIN-sized cross join, not a corpus one.

    Scale shape: ONE corpus groupBy(QI, sensitive); everything after
    runs on the cell table (|classes|·m rows) with per-class-bounded
    windows and a broadcast 25-row global CDF."""
    from pyspark.sql.window import Window

    c = _load_wide(spark, sf_dir, "customer")
    cells = c.groupBy(
        F.col("c_mktsegment").alias("segment"),
        F.floor(F.col("c_acctbal") / LDIV_B).cast("long").alias("bal_b"),
        F.col("c_nationkey").cast("long").alias("nation"),
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    dom = cells.select("nation").distinct()
    classes = cells.select("segment", "bal_b").distinct()
    dense = classes.crossJoin(F.broadcast(dom)).join(
        cells, ["segment", "bal_b", "nation"], "left"
    ).select(
        "segment", "bal_b", "nation",
        F.coalesce("cnt", F.lit(0)).cast("long").alias("cnt"),
    )
    wc = Window.partitionBy("segment", "bal_b").orderBy("nation")
    cum_c = dense.select(
        "segment", "bal_b", "nation",
        F.sum("cnt").over(wc).alias("cum_c"),
        F.sum("cnt").over(
            Window.partitionBy("segment", "bal_b")
        ).alias("n_g"),
    )
    glob = cells.groupBy("nation").agg(F.sum("cnt").alias("gcnt"))
    wg = Window.orderBy("nation").rowsBetween(
        Window.unboundedPreceding, 0
    )
    gcum = glob.select(
        "nation",
        F.sum("gcnt").over(wg).alias("cum_g"),
        F.sum("gcnt").over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n_tot"),
    )
    m = dom.count()  # domain size: bounded, a model constant at scale
    joined = cum_c.join(F.broadcast(gcum), "nation")
    agg = joined.groupBy("segment", "bal_b").agg(
        F.max("n_g").alias("n"),
        F.max("n_tot").alias("n_tot"),
        F.sum(
            F.abs(
                F.col("cum_c") * F.col("n_tot")
                - F.col("cum_g") * F.col("n_g")
            )
        ).alias("emd_num"),
    )
    emd = F.col("emd_num").cast("double") / (
        F.col("n") * F.col("n_tot") * F.lit(m - 1)
    ).cast("double")
    return agg.select(
        "segment", "bal_b", "n", "emd_num",
        F.round(emd, 9).alias("emd"),
        (
            F.col("emd_num") * TCLOSE_T_DEN
            <= F.col("n") * F.col("n_tot") * F.lit(m - 1) * TCLOSE_T_NUM
        ).cast("long").alias("t_ok"),
    )


def q_mutual_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal nearest-neighbor matching over embeddings: pairs
    (a, b) where b is a's cosine argmax AND a is b's — the
    bidirectional-agreement criterion used for translation-pair
    mining, cross-corpus alignment, and high-precision semantic
    dedup (one-directional NN is noisy; mutuality filters it).

    Exactness: cosine via the deterministic left-to-right _dot64
    fold, ROUNDED to 5 dp before the argmax so both engines rank the
    identical quantized metric; ties broken by vec_id.  Output is
    pairs + their quantized cosine — no float ambiguity survives.

    Scale shape: the gate runs the exact all-pairs form (broadcast
    right side, argmax per row, self-join of the two NN relations on
    the reversed pair).  At corpus scale the candidate generator is
    the LSH/IVF bucket path (embed_lsh_buckets / embed_ivf_topk);
    mutuality filtering is the same reversed-pair self-join over the
    bounded candidate set."""
    from pyspark.sql.window import Window

    e = _load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    left = e.select(F.col("vec_id").alias("a"), F.col("embedding").alias("va"))
    right = e.select(F.col("vec_id").alias("b"), F.col("embedding").alias("vb"))
    scored = left.join(F.broadcast(right), F.col("a") != F.col("b")).select(
        "a", "b", F.round(_dot64(F.col("va"), F.col("vb")), 5).alias("cos")
    )
    w = Window.partitionBy("a").orderBy(F.desc("cos"), F.asc("b"))
    nn = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("a", "b", "cos")
    )
    n2 = nn.select(
        F.col("a").alias("b2"), F.col("b").alias("a2")
    )
    return (
        nn.join(
            n2, (F.col("a") == F.col("a2")) & (F.col("b") == F.col("b2"))
        )
        .filter(F.col("a") < F.col("b"))
        .select(
            F.col("a").alias("id_a"),
            F.col("b").alias("id_b"),
            F.col("cos").alias("cos_ab"),
        )
    )


def q_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candle bars per (user, day): open/close = value at the
    first/last event under the (ts, event_id) total order, high/low
    = extremes, plus count and exact cents volume — the canonical
    time-series downsampling aggregation.

    Device: open/close via min_by/max_by keyed on struct(ts,
    event_id) — the declarative argmin/argmax (no window, no
    self-join); the oracle picks the same rows with ROW_NUMBER
    because DuckDB's arg_min takes no tuple key (the max_drawdown
    lesson).  All outputs exact BIGINT cents.

    Scale shape: ONE partial-aggregated groupBy(user, day); min_by
    partials merge associatively, so the bar table never sees a
    shuffle wider than its own (bounded) cardinality."""
    e = _load_wide(spark, sf_dir, "events")
    base = e.select(
        "user_id",
        F.to_date("ts").alias("day"),
        "ts",
        "event_id",
        F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    return base.groupBy("user_id", "day").agg(
        F.expr("min_by(cents, struct(ts, event_id))").alias("open_c"),
        F.max("cents").alias("high_c"),
        F.min("cents").alias("low_c"),
        F.expr("max_by(cents, struct(ts, event_id))").alias("close_c"),
        F.count(F.lit(1)).cast("long").alias("n_trades"),
        F.sum("cents").alias("vol_cents"),
    )


FH_BUCKETS = 1024  # hashing-trick feature space


def q_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurization (Weinberger et al., ICML 2009):
    tokens map to a fixed 2^10-bucket feature space via md5, with a
    ±1 sign hash so colliding tokens cancel in expectation — the
    vocabulary-free featurizer for streaming/classifier pipelines
    (no vocab build pass, no OOV handling, bounded width at any
    corpus size).

    Exactness: bucket = 8 md5 hex chars (< 2^32, exact BIGINT) mod
    buckets; sign from the 9th nibble's parity; weight = exact
    integer signed term frequency.  Zero-weight cells (exact
    cancellation) are dropped in both engines.

    Scale shape: explode + ONE groupBy(doc, bucket) with map-side
    partial aggregation; output is corpus x ≤1024 sparse — no
    vocab-sized state anywhere."""
    d = _load_wide(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    hashed = toks.select(
        "doc_id",
        (
            F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
            % FH_BUCKETS
        ).alias("bucket"),
        F.when(
            F.conv(F.substring(F.md5("tok"), 9, 1), 16, 10).cast("long")
            % 2
            == 0,
            F.lit(1),
        )
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("sign"),
    )
    return (
        hashed.groupBy("doc_id", "bucket")
        .agg(F.sum("sign").alias("weight"))
        .filter(F.col("weight") != 0)
    )


CDC_W = 8            # rolling-hash window (chars)
CDC_B = 257          # polynomial base
CDC_P = 2147483647   # modulus (2^31 - 1): products stay < 2^40
CDC_MOD = 32         # boundary if h % 32 == 0 -> ~32-char avg chunks


def _cdc_hash_sql(text_col: str, pos: str) -> str:
    """ONE emitter for the window-W polynomial rolling hash — the
    identical nested-mod algebra compiles for Spark and DuckDB (the
    zorder_layout pattern), so the bit-twiddling itself is under the
    cross-engine gate.  Seed cast to BIGINT (DuckDB ascii is INT32
    and would overflow at the first multiply)."""
    h = f"CAST(ascii(substr({text_col}, {pos}-{CDC_W - 1}, 1)) AS BIGINT)"
    for k in range(CDC_W - 2, -1, -1):
        h = (
            f"(({h}) * {CDC_B} + ascii(substr({text_col}, {pos}-{k}, 1)))"
            f" % {CDC_P}"
        )
    return h


def q_cdc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (the rsync/LBFS/FastCDC primitive):
    split each document where a W=8-char polynomial rolling hash
    ≡ 0 (mod 32) — boundaries depend only on LOCAL content, so an
    insertion near the front re-chunks only its neighborhood and
    every later chunk keeps its identity (the shift-resistance
    exact dedup by fixed offsets lacks; pinned by the law test).
    Emits (chunk_idx, start, len, chunk md5) per doc; at sf0.01 the
    shared vocabulary yields 358 cross-doc duplicate chunk hashes —
    the storage-dedup signal this operator exists to expose.

    Implementation: boundary positions as ONE filter(transform(
    sequence)) array expression (O(n·W) JVM char ops, no Python, no
    shuffle); the sentinel end-of-doc boundary closes the tail
    chunk; chunk spans derive from the ends array by index.  Docs
    shorter than W take the sentinel-only path (the descending-
    sequence ANSI landmine, ngram_novelty lesson).  Production
    FastCDC adds min/max chunk-size clamps — a debounce-family
    sequential fold, documented not implemented.

    Scale shape: pure per-doc projection + explode; zero shuffles.
    The cross-doc dedup consumer is ONE groupBy(chunk_md5) away."""
    h = _cdc_hash_sql("text", "i")
    ends_expr = f"""
        array_distinct(concat(
            CASE WHEN length(text) >= {CDC_W}
                 THEN filter(
                     transform(sequence({CDC_W}, length(text)),
                               i -> CASE WHEN ({h}) % {CDC_MOD} = 0
                                         THEN CAST(i AS BIGINT)
                                         ELSE CAST(NULL AS BIGINT) END),
                     x -> x IS NOT NULL)
                 ELSE CAST(array() AS ARRAY<BIGINT>)
            END,
            array(CAST(length(text) AS BIGINT))))
    """
    d = _load_wide(spark, sf_dir, "documents")
    w = d.select("doc_id", "text", F.expr(ends_expr).alias("ends"))
    ch = w.select(
        "doc_id",
        "text",
        F.explode(
            F.expr(
                "transform(ends, (e, j) -> struct("
                "  CAST(j + 1 AS BIGINT) AS chunk_idx,"
                "  CASE WHEN j = 0 THEN CAST(1 AS BIGINT)"
                "       ELSE element_at(ends, j) + 1 END AS start_pos,"
                "  e AS endp))"
            )
        ).alias("c"),
    )
    return ch.select(
        "doc_id",
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.col("c.start_pos").alias("start_pos"),
        (F.col("c.endp") - F.col("c.start_pos") + 1).alias("chunk_len"),
        F.substring(
            F.md5(
                F.expr(
                    "substr(text, CAST(c.start_pos AS INT),"
                    " CAST(c.endp - c.start_pos + 1 AS INT))"
                )
            ),
            1,
            16,
        ).alias("chunk_md5"),
    )


BFS_SEEDS_BELOW = 5  # seed set: doc_id < 5
BFS_MAX_HOPS = 6


def q_graph_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS (shortest hop count) over the extracted
    doc→doc link graph — the frontier-propagation primitive behind
    crawl-depth-from-seeds, blast-radius, and influence-horizon
    questions (link_pagerank flows mass; this flows DISTANCE).

    Spark side: fixed-point relaxation — BFS_MAX_HOPS rounds of
    (edge join + union + min-per-node), the dedup_cluster shape:
    lineage localCheckpoint-truncated each round, no driver data
    motion.  Edges reuse the SAME page-synthesis + href-regex
    extraction the anchor_texts row gates.  The oracle is the
    INDEPENDENT formulation: a recursive-CTE frontier enumeration
    over the arithmetic link rule, deduplicated by UNION — path
    enumeration vs fixed-point relaxation, and regex extraction vs
    closed-form edges, in one gate.

    Scale shape: each round is one src-equi-join + one min groupBy
    (both on the node key, partitioning reused); rounds are bounded
    by the hop cap, not the diameter of the data."""
    from ocular_spark.functions import html as H

    d = _load_wide(spark, sf_dir, "documents")
    wrapped = d.select(
        "doc_id", F.expr(H.wrap_links_spark()).alias("html")
    )
    edges = wrapped.select(
        F.col("doc_id").alias("src"),
        F.explode(F.expr(H.doc_links_expr("html"))).alias("dd"),
    ).select(
        F.col("src").cast("long").alias("src"),
        F.col("dd").cast("long").alias("dst"),
    ).distinct().localCheckpoint()
    dist = d.filter(F.col("doc_id") < BFS_SEEDS_BELOW).select(
        F.col("doc_id").cast("long").alias("node"),
        F.lit(0).cast("long").alias("dist"),
    ).localCheckpoint()
    for _ in range(BFS_MAX_HOPS):
        nxt = edges.join(
            dist, edges["src"] == dist["node"]
        ).select(
            F.col("dst").alias("node"), (F.col("dist") + 1).alias("dist")
        )
        dist = (
            dist.unionByName(nxt)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint()
        )
    return dist


BURST_MIN_DF = 10       # report terms seen in >= this many docs
BURST_DOC_MOD = 50      # overlay: burst docs are doc_id % 50 == 0
BURST_TF = 40           # overlay: burst term count inside a burst doc


def q_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-term burstiness via the Fano factor (variance-to-mean
    ratio of per-doc term counts, zeros included) — the corpus
    statistic that separates topical/bursty terms (a term that
    appears 40 times in 1 of 50 docs) from function words (one
    occurrence everywhere) even when their TOTAL frequencies tie;
    the signal behind Church-Gale burstiness weighting and
    stopword-vs-content routing in cleaning pipelines.

    Exactness: with N docs, F = var/mean = (N·Σc² − (Σc)²)/(N·Σc) —
    numerator/denominator emitted as exact BIGINTs (zero docs
    contribute nothing to either sum, so only nonzero tf rows are
    touched), the double is ONE division, and the dispersion verdict
    is pure integer comparison (num<den → under; num≤2·den →
    poisson; else bursty).  FIXTURE LESSON: the synthetic generator
    is near-Poisson (every real token's F ∈ [1.02, 1.49]) — a
    deterministic overlay (one term at 40× in every 50th doc, one
    term once per doc) makes all three verdict classes occur, the
    hub-overlay/clique-injection device.

    Scale shape: ONE map-side-combined groupBy(term) over the
    exploded corpus; N arrives via a broadcast 1-row cross join; the
    report is vocabulary-sized."""
    d = _load_wide(spark, sf_dir, "documents")
    tf = (
        d.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
        )
        .filter(F.col("term") != "")
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    burst = d.filter(F.col("doc_id") % BURST_DOC_MOD == 0).select(
        F.lit("burstword").alias("term"),
        "doc_id",
        F.lit(BURST_TF).cast("long").alias("c"),
    )
    steady = d.select(
        F.lit("steadyword").alias("term"),
        "doc_id",
        F.lit(1).cast("long").alias("c"),
    )
    n_docs = d.groupBy().agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    agg = (
        tf.unionByName(burst)
        .unionByName(steady)
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("doc_freq"),
            F.sum("c").alias("s1"),
            F.sum(F.col("c") * F.col("c")).alias("s2"),
        )
        .filter(F.col("doc_freq") >= BURST_MIN_DF)
        .crossJoin(F.broadcast(n_docs))
    )
    num = F.col("n_docs") * F.col("s2") - F.col("s1") * F.col("s1")
    den = F.col("n_docs") * F.col("s1")
    return agg.select(
        "term",
        "doc_freq",
        F.col("s1").alias("total_tf"),
        num.alias("fano_num"),
        den.alias("fano_den"),
        (num.cast("double") / den.cast("double")).alias("fano"),
        F.when(num < den, F.lit("under"))
        .when(num <= 2 * den, F.lit("poisson"))
        .otherwise(F.lit("bursty"))
        .alias("dispersion"),
    )


ZIPF_TOP = 256  # fit over at most this many top ranks (overflow headroom)


def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus rank-frequency table: OLS of
    ln(freq) on ln(rank) — slope ≈ −s is the Zipf exponent, the
    one-number corpus-health signature (natural text ≈ −1; a
    template-spam corpus flattens, boilerplate-heavy dedup residue
    steepens) used to sanity-check crawl snapshots before training.

    Exactness: both logs quantized to BIGINT via FLOOR(ln(·)·1e6)
    (the skew_audit lnq device — ln over exact integer-valued
    doubles agreed bit-for-bit cross-engine), so ALL five OLS
    sufficient statistics (m, Σx, Σy, Σxy, Σx²) are exact integers;
    slope = (m·Σxy − Σx·Σy)/(m·Σx² − (Σx)²) and the intercept touch
    float in ONE division each, identical op order both engines,
    with the exact numerator/denominator BIGINTs emitted beside
    them.  Rank = frequency desc, term asc (total order).  At
    ZIPF_TOP=256 every cross product stays < 2^62.

    Scale shape: one exploded groupBy(term) corpus pass; the
    rank/fit stages run on the vocabulary-sized table (the global
    row_number sorts ≤256 rows)."""
    from pyspark.sql.window import Window

    d = _load_wide(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
    )
    ranked = (
        freq.withColumn(
            "rnk",
            F.row_number().over(
                Window.orderBy(F.desc("f"), F.asc("term"))
            ).cast("long"),
        )
        .filter(F.col("rnk") <= ZIPF_TOP)
        .select(
            "rnk",
            "f",
            F.expr(
                "CAST(FLOOR(ln(CAST(rnk AS DOUBLE)) * 1000000D) AS BIGINT)"
            ).alias("x"),
            F.expr(
                "CAST(FLOOR(ln(CAST(f AS DOUBLE)) * 1000000D) AS BIGINT)"
            ).alias("y"),
        )
    )
    stats = ranked.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    s_num = F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")
    s_den = F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = s_num.cast("double") / s_den.cast("double")
    return stats.select(
        F.col("m").alias("n_terms"),
        s_num.alias("slope_num"),
        s_den.alias("slope_den"),
        slope.alias("slope"),
        (
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
            / F.col("m").cast("double")
            / F.lit(1000000.0)
        ).alias("intercept_ln"),
    )


BH_N_TRIALS = 48                      # Bernoulli trials per hypothesis
BH_ALPHA_NUM, BH_ALPHA_DEN = 1, 20    # FDR level alpha = 0.05
BH_PRED_TYPES = ("click", "view")     # success predicate (global share .4)
# cumulative Bin(48, 1/2) numerators: CUM[x] = sum_{j<=x} C(48,j);
# p-value = CUM[x] / 2^48 — ONE Python emitter shared by both engines
_BH_CUM: list[int] = []
_acc, _c = 0, 1
for _j in range(BH_N_TRIALS + 1):
    _acc += _c
    _BH_CUM.append(_acc)
    _c = _c * (BH_N_TRIALS - _j) // (_j + 1)
BH_TWO_N = 2**BH_N_TRIALS
assert _BH_CUM[-1] == BH_TWO_N


def q_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control (step-up) over one exact
    binomial test per user: among each user's first 48 events (by
    (ts, event_id)), is the click/view share significantly BELOW
    the p₀ = 1/2 null?  The multiple-testing gate every per-segment
    metric scan needs — with 150 simultaneous hypotheses, pointwise
    α = 0.05 would flag ~7 users by chance alone; BH bounds the
    expected false-discovery FRACTION instead.

    Exactness: the one-sided p-value is the exact binomial lower
    tail CUM[x]/2^48, with the 49-entry cumulative-C(48,j) table
    emitted from ONE Python math.comb loop into both engines (the
    _cdc_hash_sql shared-emitter device); the step-up condition
    p_(k) ≤ k·α/m becomes 20·m·CUM[x] ≤ k·2^48 — all BIGINT (peak
    20·1500·2^48 ≈ 8.4e18 < 2^63 even at 10× the fixture's user
    count).  k* = max satisfying rank; reject ranks ≤ k* (the
    step-up reach-back: a hypothesis can be rejected even when its
    OWN pointwise line fails — pinned by the law test).  The data
    carries genuine signal: the true click/view share is ≈0.4, so
    per-user noise decides which hypotheses clear the line and both
    verdict classes occur.

    Scale shape: ONE corpus pass (per-user window + groupBy); all
    BH machinery (rank, m, k*) runs on the m-row hypothesis table —
    the global sort is over users, never events."""
    from pyspark.sql.window import Window

    e = _load_wide(spark, sf_dir, "events")
    w48 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    per_user = (
        e.withColumn("rn", F.row_number().over(w48))
        .filter(F.col("rn") <= BH_N_TRIALS)
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("event_type").isin(*BH_PRED_TYPES), 1)
                .otherwise(0)
            ).cast("long").alias("x")
        )
    )
    cum = F.array(*[F.lit(v) for v in _BH_CUM])
    scored = per_user.select(
        "user_id",
        "x",
        F.element_at(cum, (F.col("x") + 1).cast("int")).alias("p_num"),
    )
    wr = Window.orderBy("p_num", "user_id")
    wall = Window.partitionBy()
    ranked = scored.select(
        "user_id",
        "x",
        "p_num",
        F.row_number().over(wr).cast("long").alias("rnk"),
        F.count(F.lit(1)).over(wall).cast("long").alias("m"),
    )
    ok = (
        F.lit(BH_ALPHA_DEN) * F.col("m") * F.col("p_num")
        <= F.col("rnk") * F.lit(BH_TWO_N) * F.lit(BH_ALPHA_NUM)
    )
    kstar = F.max(F.when(ok, F.col("rnk"))).over(wall)
    return ranked.select(
        "user_id",
        "x",
        "p_num",
        (F.col("p_num").cast("double") / F.lit(float(BH_TWO_N))).alias(
            "p_value"
        ),
        "rnk",
        (F.col("rnk") <= F.coalesce(kstar, F.lit(0)))
        .cast("long")
        .alias("rejected"),
    )


TREND_Z2_NUM = 2401  # 1.96^2 = (49/25)^2 as an exact rational
TREND_Z2_DEN = 625
MK_OVERLAY_N = 30  # injected monotone series length
MK_MIN_N = 10


def q_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend detection per user: is the time-ordered
    series of event values monotonically drifting?  The
    distribution-free trend test (Mann 1945, Kendall 1975) that
    OLS-slope (q_ols_trend) can't replace — it is invariant to any
    monotone transform of the values and exact under ties.

    Exactness: S = Σ_{i<j} sign(v_j − v_i) is an exact BIGINT (each
    sign cast to long before the order-free sum); the tie-corrected
    variance stays scaled by 18: var18 = n(n−1)(2n+5) − Σ_t
    t(t−1)(2t+5), also exact; the two-sided α=0.05 verdict is the
    all-BIGINT line 625·18·(|S|−1)² ≥ 2401·var18 (continuity
    correction |S|−1 clamped at 0), so 'increasing'/'decreasing'/
    'no_trend' never touches a float; the reported z is ONE shared
    sqrt, (S∓1)/sqrt(var18/18).  Overlay (the burstword device):
    user −1 carries a strictly increasing 30-point series and user
    −2 its mirror, so both signed verdicts occur on any corpus;
    real users supply 'no_trend' (plus chance crossings, identical
    in both engines).

    Scale shape: the pair enumeration is a per-user self-join —
    O(n²) rows per key but ZERO cross-key traffic (one hash
    partition by user_id serves rn-window, join, and both aggs).
    Per-key n here is ≤ ~100; for unbounded series the exact
    alternative is the merge-sort inversion count (documented, not
    needed at this per-key cardinality).  Int64 headroom: the
    verdict line stays < 2^63 for per-key n up to ~5·10⁴."""
    from pyspark.sql.window import Window

    e = _load_wide(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    real = e.select(
        "user_id", F.row_number().over(w).alias("rn"), F.col("value").alias("v")
    )
    rng = spark.range(1, MK_OVERLAY_N + 1)
    up = rng.select(
        F.lit(-1).cast("long").alias("user_id"),
        F.col("id").cast("int").alias("rn"),
        F.col("id").cast("double").alias("v"),
    )
    down = rng.select(
        F.lit(-2).cast("long").alias("user_id"),
        F.col("id").cast("int").alias("rn"),
        (F.lit(MK_OVERLAY_N + 1) - F.col("id")).cast("double").alias("v"),
    )
    base = real.unionByName(up).unionByName(down)
    l, r = base.alias("l"), base.alias("r")
    pairs = l.join(
        r,
        (F.col("l.user_id") == F.col("r.user_id"))
        & (F.col("l.rn") < F.col("r.rn")),
    )
    s_agg = pairs.groupBy(F.col("l.user_id").alias("user_id")).agg(
        F.sum(F.signum(F.col("r.v") - F.col("l.v")).cast("long")).alias("s")
    )
    per_user = base.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    ties = (
        base.groupBy("user_id", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("t18")
        )
    )
    n = F.col("n")
    var18 = (n * (n - 1) * (2 * n + 5) - F.col("t18")).alias("var18")
    joined = (
        per_user.join(ties, "user_id")
        .join(s_agg, "user_id")
        .filter(n >= MK_MIN_N)
        .select("user_id", "n", "s", var18)
    )
    s = F.col("s")
    s_adj = F.greatest(F.abs(s) - 1, F.lit(0).cast("long"))
    sig = (
        F.lit(TREND_Z2_DEN) * 18 * s_adj * s_adj
        >= F.lit(TREND_Z2_NUM) * F.col("var18")
    ) & (s != 0)
    z = (
        F.when(F.col("var18") == 0, F.lit(0.0))
        .when(s > 0, (s - 1).cast("double") / F.sqrt(F.col("var18") / F.lit(18.0)))
        .when(s < 0, (s + 1).cast("double") / F.sqrt(F.col("var18") / F.lit(18.0)))
        .otherwise(F.lit(0.0))
    )
    return joined.select(
        "user_id",
        "n",
        "s",
        "var18",
        z.alias("z"),
        F.when(sig & (s > 0), F.lit("increasing"))
        .when(sig & (s < 0), F.lit("decreasing"))
        .otherwise(F.lit("no_trend"))
        .alias("trend"),
    )


MW_GRP_TYPE = "purchase"  # sample 1 = this event type, sample 2 = the rest
MW_MIN_N = 5


def q_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test per user: do the user's
    '{purchase}' event values rank-shift against their other
    events?  The two-sample location test that needs no normality —
    the per-segment A/B primitive t-tests can't supply on skewed
    value distributions.

    Exactness: ranks ride the 2·avg-rank trick (rank2 = 2·RANK +
    tiecount − 1, an exact BIGINT), so 2·U₁ = Σ_grp1 rank2 −
    n₁(n₁+1) is exact; the tie-corrected variance stays scaled by
    12N(N−1): vnum = n₁n₂·(N(N−1)(N+1) − Σ_t(t³−t)) with the tie
    sum folded to Σ_rows(ceq²−1) (each member of a t-group
    contributes t²−1, summing to t³−t — no second grouping);
    two-sided α=0.05 verdict is the all-BIGINT line
    625·3·N(N−1)·(2U−n₁n₂)² ≥ 2401·vnum; z is ONE shared sqrt.
    Overlay: user −1 gets a fully separated 10-vs-10 sample
    ('shift' guaranteed), user −2 two identical samples (all-tie
    'null', vnum exercises the tie path hard).

    Scale shape: one window pass (rank within user) + one groupBy —
    both hash-partitioned by user_id, zero extra shuffles; the
    hypothesis table is user-sized.  Int64 headroom: the verdict
    line stays < 2^63 for per-key N up to ~600 (here N ≤ ~100)."""
    from pyspark.sql.window import Window

    e = _load_wide(spark, sf_dir, "events")
    real = e.select(
        "user_id",
        (F.col("event_type") == MW_GRP_TYPE).cast("long").alias("grp"),
        F.col("value").alias("v"),
    )
    rng = spark.range(1, 11)
    sep = rng.select(
        F.lit(-1).cast("long").alias("user_id"),
        F.lit(1).cast("long").alias("grp"),
        (F.col("id") + 100).cast("double").alias("v"),
    ).unionByName(
        rng.select(
            F.lit(-1).cast("long").alias("user_id"),
            F.lit(0).cast("long").alias("grp"),
            F.col("id").cast("double").alias("v"),
        )
    )
    null = rng.select(
        F.lit(-2).cast("long").alias("user_id"),
        F.lit(1).cast("long").alias("grp"),
        F.col("id").cast("double").alias("v"),
    ).unionByName(
        rng.select(
            F.lit(-2).cast("long").alias("user_id"),
            F.lit(0).cast("long").alias("grp"),
            F.col("id").cast("double").alias("v"),
        )
    )
    base = real.unionByName(sep).unionByName(null)
    wv = Window.partitionBy("user_id").orderBy("v")
    wuv = Window.partitionBy("user_id", "v")
    ranked = base.select(
        "user_id",
        "grp",
        (
            2 * F.rank().over(wv).cast("long")
            + F.count(F.lit(1)).over(wuv).cast("long")
            - 1
        ).alias("rank2"),
        F.count(F.lit(1)).over(wuv).cast("long").alias("ceq"),
    )
    agg = ranked.groupBy("user_id").agg(
        F.sum("grp").alias("n1"),
        F.sum(1 - F.col("grp")).alias("n2"),
        F.sum(F.col("grp") * F.col("rank2")).alias("r1_2"),
        F.sum(F.col("ceq") * F.col("ceq") - 1).alias("tsum"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    nn = n1 + n2
    u2 = (F.col("r1_2") - n1 * (n1 + 1)).alias("u2")
    stats = agg.filter((n1 >= MW_MIN_N) & (n2 >= MW_MIN_N)).select(
        "user_id",
        "n1",
        "n2",
        u2,
        (n1 * n2).alias("e2"),
        (n1 * n2 * (nn * (nn - 1) * (nn + 1) - F.col("tsum"))).alias("vnum"),
    )
    d = F.col("u2") - F.col("e2")
    nb = F.col("n1") + F.col("n2")
    z = F.when(F.col("vnum") == 0, F.lit(0.0)).otherwise(
        d.cast("double")
        / (
            2.0
            * F.sqrt(
                F.col("vnum") / (12.0 * nb.cast("double") * (nb - 1).cast("double"))
            )
        )
    )
    sig = (
        F.lit(TREND_Z2_DEN) * 3 * nb * (nb - 1) * d * d
        >= F.lit(TREND_Z2_NUM) * F.col("vnum")
    ) & (F.col("vnum") > 0)
    return stats.select(
        "user_id",
        "n1",
        "n2",
        "u2",
        "e2",
        "vnum",
        z.alias("z"),
        F.when(sig, F.lit("shift")).otherwise(F.lit("null")).alias("verdict"),
    )


AP_SCORE_TOK = "query"  # ranking score = tf of this token
AP_REL_TOK = "dup"  # relevant if doc contains it ...
AP_REL_MOD, AP_REL_RES = 11, 4  # ... or doc_id % 11 == 4 (label overlay)
AP_SCALE = 1_000_000_000_000  # precision@k quantization (1e-12)


def q_avg_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average Precision per source (the MAP inner loop): each
    source's docs are ranked by a deterministic score (tf of
    '{query}', ties by doc_id) and scored against binary relevance
    labels — the rank-sensitive retrieval metric that completes the
    eval triad next to AUC (pairwise) and NDCG (graded): AP is the
    area under the precision-recall curve and weights EARLY
    precision the way recall-oriented curation sweeps care about.

    Exactness: AP = (1/R)·Σ_{k: rel_k} precision@k has per-term
    denominators k, so the float sum would be order-dependent —
    instead each precision@k is quantized to an exact BIGINT
    (c_k·10¹² DIV k, pure integer division; c_k = cumulative
    relevant count, a running window sum) and the order-free
    integer SUM is divided ONCE by R·10¹² at the end.  Labels are
    token presence of '{dup}' OR doc_id ≡ 4 (mod 11) — the
    deterministic label overlay (ndcg's noise-mod device) that
    guarantees both relevant and irrelevant docs in every source.

    Scale shape: one projection (split + filter-count, pure JVM),
    one window pass partitioned by source (rank + running sum on
    the same partitioning), one groupBy(source) — a single hash
    partition by source serves all three; the report is
    source-sized.  Int64 headroom: c_k·10¹² needs c_k < 9.2·10⁶
    per source partition."""
    from pyspark.sql.window import Window

    d = _load_wide(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    score = F.size(F.filter(toks, lambda t: t == F.lit(AP_SCORE_TOK)))
    rel = (
        F.array_contains(toks, AP_REL_TOK)
        | (F.col("doc_id") % AP_REL_MOD == AP_REL_RES)
    ).cast("long")
    labeled = d.select(
        "source",
        "doc_id",
        score.cast("long").alias("score"),
        rel.alias("rel"),
    )
    wrank = Window.partitionBy("source").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    wcum = Window.partitionBy("source").orderBy("rn").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = labeled.withColumn(
        "rn", F.row_number().over(wrank).cast("long")
    ).withColumn("ck", F.sum("rel").over(wcum))
    term = F.when(
        F.col("rel") == 1,
        F.expr(f"(ck * {AP_SCALE}) DIV rn"),
    ).otherwise(F.lit(0))
    out = (
        ranked.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("rel").alias("n_rel"),
            F.sum(term).alias("ap_num"),
        )
        .filter(F.col("n_rel") >= 1)
    )
    return out.select(
        "source",
        "n_docs",
        "n_rel",
        "ap_num",
        (
            F.col("ap_num").cast("double")
            / (F.col("n_rel") * F.lit(AP_SCALE)).cast("double")
        ).alias("ap"),
    )


AA_SCALE = 1_000_000_000_000  # 1/ln(deg) quantization (1e-12)
AA_MIN_CN = 2  # report pairs with >= this many common neighbors


def q_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction over the crawl link graph: for
    every non-adjacent pair (u,v), AA = Σ_{w ∈ N(u)∩N(v)} 1/ln(deg w)
    — the common-neighbor score that downweights promiscuous hubs
    (Adamic & Adar 2003), the standard 'suggest related docs /
    likely missing link' primitive next to triangle counting
    (which scores EXISTING closure, not candidates).

    Exactness: each hub's weight 1/ln(deg) is quantized ONCE to an
    exact BIGINT (FLOOR(10¹²/ln(deg)), the zipf quantized-ln device
    — deg ≥ 2 is structural: a wedge center has two distinct
    neighbors), so per-pair AA numerators are order-free integer
    sums; the reported aa is ONE division.  Candidates with a
    direct edge are removed by anti-join on the SAME canonical
    (least, greatest) edge set that generated the wedges.

    Edges reuse the link_triangles graph verbatim (href-extracted
    crawl links + doc_id-div-5 'related' cliques).  Non-vacuity:
    crawl links make inter-group wedges whose endpoints are NOT
    directly linked, so real candidates survive the anti-join.

    Scale shape: wedges = one self-join of the adjacency list on
    the center key — Σ deg² rows; at web scale the hub tail is
    capped (1/ln(deg) of a 10⁶-degree hub contributes ~0.07 —
    sampling hubs changes AA by o(1), documented not needed at
    fixture degrees); the pair aggregation and the anti-join both
    shuffle on the canonical pair key only."""
    from ocular_spark.functions import html as H

    d = _load_wide(spark, sf_dir, "documents")
    wrapped = d.select("doc_id", F.expr(H.wrap_links_spark()).alias("html"))
    crawl = wrapped.select(
        F.col("doc_id").alias("src"),
        F.explode(F.expr(H.doc_links_expr("html"))).alias("dd"),
    ).select("src", F.col("dd").cast("long").alias("dst"))
    clique = d.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.expr("transform(sequence(0, 4), j -> (doc_id div 5) * 5 + j)")
        ).alias("dst"),
    )
    und = (
        crawl.unionByName(clique)
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()  # cut re-extraction lineage (pagerank lesson)
    )
    adj = und.select(
        F.col("u").alias("w"), F.col("v").alias("n")
    ).unionByName(und.select(F.col("v").alias("w"), F.col("u").alias("n")))
    deg = adj.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    weighted = adj.join(
        deg.select(
            "w",
            F.floor(
                F.lit(float(AA_SCALE)) / F.log(F.col("deg").cast("double"))
            )
            .cast("long")
            .alias("invln_q"),
        ),
        "w",
    )
    l, r = weighted.alias("l"), weighted.alias("r")
    wedges = l.join(
        r,
        (F.col("l.w") == F.col("r.w")) & (F.col("l.n") < F.col("r.n")),
    ).select(
        F.col("l.n").alias("u"),
        F.col("r.n").alias("v"),
        F.col("l.invln_q").alias("invln_q"),
    )
    pairs = (
        wedges.groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cn"),
            F.sum("invln_q").alias("aa_num"),
        )
        .filter(F.col("cn") >= AA_MIN_CN)
    )
    cand = pairs.join(und, ["u", "v"], "left_anti")
    return cand.select(
        "u",
        "v",
        "cn",
        "aa_num",
        (F.col("aa_num").cast("double") / F.lit(float(AA_SCALE))).alias("aa"),
    )


DBSCAN_EPS = 150
DBSCAN_MIN_PTS = 10  # core = >= this many points within eps (incl self)
_DBSCAN_BLOBS = ((10000, 10000), (50000, 50000), (90000, 20000))


def q_dbscan_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN over the 2-D event point cloud (density clustering:
    Ester et al. 1996): core points (≥ minPts neighbors within eps,
    self included) form clusters by eps-reachability; non-core
    points within eps of a core are border; the rest is noise —
    the cluster family that finds arbitrary-shape dense regions and
    labels sparse background as OUTLIERS, which centroid methods
    (the IVF codebook) structurally cannot.

    Determinism: cluster id = MIN core pid in the component
    (_cc_min_label, the dedup_cluster device); a border point takes
    the MIN label among its core neighbors.  The verdict needs no
    floats anywhere — dist² ≤ eps² is exact integer arithmetic.
    Overlay (the clique-injection device): 3 planted 20-point grid
    blobs (spacing 25 → blob diameter 125 < eps, so each blob is a
    complete eps-graph and all 60 points are core) + one satellite
    140 px right of each blob's corner (within eps of exactly that
    corner → border, 2 < minPts) guarantee all three roles; the
    hash-scattered background (≈1 expected point per 3·eps² cell)
    can never reach minPts → noise.

    Scale shape: the eps-neighbor graph rides the spatial_grid_join
    cell device — eps-sized cells, 3×3 probe, each ordered pair
    generated exactly once, ONE shuffle on the cell key; the CC
    runs on the core-core subgraph only (blob-sized, not
    corpus-sized); counts/roles are one groupBy each."""
    e = _load_wide(spark, sf_dir, "events")
    hashpts = e.select(
        F.col("event_id").alias("pid"),
        F.expr(SPATIAL_X_SQL).cast("long").alias("x"),
        F.expr(SPATIAL_Y_SQL).cast("long").alias("y"),
    )
    blob = spark.range(60).select(
        (-(F.col("id") + 1)).alias("pid"),
        F.element_at(
            F.array(*[F.lit(bx) for bx, _ in _DBSCAN_BLOBS]),
            (F.col("id") / 20 + 1).cast("int"),
        )
        + (F.col("id") % 5) * 25,
        F.element_at(
            F.array(*[F.lit(by) for _, by in _DBSCAN_BLOBS]),
            (F.col("id") / 20 + 1).cast("int"),
        )
        + ((F.col("id") % 20) / 5).cast("long") * 25,
    ).toDF("pid", "x", "y")
    sat = spark.range(3).select(
        (-(F.col("id") + 1001)).alias("pid"),
        (
            F.element_at(
                F.array(*[F.lit(bx) for bx, _ in _DBSCAN_BLOBS]),
                (F.col("id") + 1).cast("int"),
            )
            + 100
            + 140
        ).alias("x"),
        (
            F.element_at(
                F.array(*[F.lit(by) for _, by in _DBSCAN_BLOBS]),
                (F.col("id") + 1).cast("int"),
            )
            + 75
        ).alias("y"),
    )
    pts = hashpts.unionByName(blob).unionByName(sat).localCheckpoint()
    cell = lambda c: F.floor(F.col(c) / F.lit(DBSCAN_EPS))  # noqa: E731
    homed = pts.withColumn("cx", cell("x")).withColumn("cy", cell("y"))
    probes = (
        homed.select(
            F.col("pid").alias("a"),
            F.col("x").alias("ax"),
            F.col("y").alias("ay"),
            "cx",
            "cy",
            F.explode(F.expr("sequence(-1, 1)")).alias("dx"),
        )
        .select(
            "a", "ax", "ay", "cx", "cy", "dx",
            F.explode(F.expr("sequence(-1, 1)")).alias("dy"),
        )
        .select(
            "a", "ax", "ay",
            ((F.col("cx") + F.col("dx")) * 1000000 + F.col("cy") + F.col("dy"))
            .alias("pk"),
        )
    )
    homes = homed.select(
        F.col("pid").alias("b"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        (F.col("cx") * 1000000 + F.col("cy")).alias("pk"),
    )
    dd = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))
    nbrs = (
        probes.join(homes, "pk")
        .filter((F.col("a") != F.col("b")) & (dd <= DBSCAN_EPS * DBSCAN_EPS))
        .select("a", "b")
        .localCheckpoint()
    )
    ncount = nbrs.groupBy("a").agg(
        (F.count(F.lit(1)) + 1).cast("long").alias("n_eps")
    )
    roles = pts.join(ncount, pts["pid"] == ncount["a"], "left").select(
        "pid", "x", "y", F.coalesce("n_eps", F.lit(1)).alias("n_eps")
    )
    core = roles.filter(F.col("n_eps") >= DBSCAN_MIN_PTS).select("pid")
    core_edges = (
        nbrs.join(core.select(F.col("pid").alias("a")), "a")
        .join(core.select(F.col("pid").alias("b")), "b")
        .select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )
    core_labels = _cc_min_label(core_edges).select(
        F.col("node").alias("pid"), F.col("label")
    )
    core_lbl = (
        core.join(core_labels, "pid", "left")
        .select("pid", F.coalesce("label", "pid").alias("cluster"))
        .localCheckpoint()
    )
    border_lbl = (
        nbrs.join(
            core_lbl.select(
                F.col("pid").alias("b"), F.col("cluster").alias("bc")
            ),
            "b",
        )
        .join(core_lbl.select(F.col("pid").alias("a")), "a", "left_anti")
        .groupBy(F.col("a").alias("pid"))
        .agg(F.min("bc").alias("cluster"))
    )
    labeled = core_lbl.select(
        "pid", "cluster", F.lit("core").alias("role")
    ).unionByName(
        border_lbl.select("pid", "cluster", F.lit("border").alias("role"))
    )
    return (
        roles.join(labeled, "pid", "left")
        .select(
            "pid",
            "x",
            "y",
            "n_eps",
            F.coalesce("role", F.lit("noise")).alias("role"),
            F.coalesce("cluster", F.lit(-999999)).alias("cluster"),
        )
    )


MOTIF_M = 4  # motif window length (non-overlapping pairs only)
MOTIF_OVL_N = 30  # overlay series length


def _motif_overlay_cents(i: int) -> int:
    """Overlay series: distinct values except the planted motif
    (positions 20..23 copy positions 3..6) — (i·53) mod 997 is
    injective on 1..30, so SAD = 0 exactly at the plant."""
    j = i - 17 if 20 <= i <= 23 else i
    return 100 + (j * 53) % 997


def q_motif_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Motif discovery per user (the matrix-profile question, Yeh et
    al. 2016, under an exact integer metric): find the pair of
    non-overlapping length-m windows of the time-ordered value
    series with MINIMUM sum-of-absolute-differences — the repeated
    pattern detector behind 'does this user replay the same spend
    shape twice?' that point-wise stats (autocorrelation at a fixed
    lag) can't answer because the best lag differs per user.

    Exactness: values quantize to integer cents (exact — fixture
    values carry 2 decimals), SAD is an integer sum; the argmin
    rides a struct-min (sad, i, j) so ties break on the SMALLEST
    (i, j) — a total order (the max_subarray device).  Overlay:
    user −1 carries an injective series with positions 20..23
    copying 3..6, so the true motif (sad = 0 at (3, 20)) is planted
    and uniquely identified.

    Scale shape: windows are a per-user sliding collect_list (one
    window pass), the pair enumeration a per-user self-join — O(n²)
    rows per key, zero cross-key traffic (matrix-profile's O(n²)
    is inherent; the production path bounds n per key or goes
    MASS/FFT, documented).  The oracle is a genuinely different
    formulation: a scalar (i, j, offset) grid with two positional
    joins instead of array zip_with."""
    from pyspark.sql.window import Window

    e = _load_wide(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    real = e.select(
        "user_id",
        F.row_number().over(w).alias("rn"),
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    ovl = spark.range(1, MOTIF_OVL_N + 1).select(
        F.lit(-1).cast("long").alias("user_id"),
        F.col("id").cast("int").alias("rn"),
        F.element_at(
            F.array(
                *[
                    F.lit(_motif_overlay_cents(i))
                    for i in range(1, MOTIF_OVL_N + 1)
                ]
            ),
            F.col("id").cast("int"),
        ).cast("long").alias("c"),
    )
    base = real.unionByName(ovl)
    wwin = (
        Window.partitionBy("user_id")
        .orderBy("rn")
        .rowsBetween(Window.currentRow, MOTIF_M - 1)
    )
    wins = (
        base.select(
            "user_id", F.col("rn").alias("i"), F.collect_list("c").over(wwin).alias("w")
        )
        .filter(F.size("w") == MOTIF_M)
        .localCheckpoint()  # window pass runs once, not once per join side
    )
    l, r = wins.alias("l"), wins.alias("r")
    sad = F.aggregate(
        F.zip_with(F.col("l.w"), F.col("r.w"), lambda a, b: F.abs(a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    pairs = l.join(
        r,
        (F.col("l.user_id") == F.col("r.user_id"))
        & (F.col("r.i") >= F.col("l.i") + MOTIF_M),
    ).select(
        F.col("l.user_id").alias("user_id"),
        F.col("l.i").alias("i"),
        F.col("r.i").alias("j"),
        sad.alias("sad"),
    )
    best = pairs.groupBy("user_id").agg(
        F.min(F.struct("sad", "i", "j")).alias("m"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
    )
    return best.select(
        "user_id",
        F.col("m.sad").alias("sad"),
        F.col("m.i").cast("long").alias("i"),
        F.col("m.j").cast("long").alias("j"),
        "n_pairs",
    )


def _soundex_sql(c: str) -> str:
    """American Soundex as ONE SQL scalar expression, emitted from a
    single Python source into BOTH engines (the _cdc_hash_sql
    shared-emitter device) — restricted to RE2/Java-identical
    constructs (char-class regexp_replace, translate, replace,
    substr, rpad, ||).

    Exact rule set (Russell/NARA): keep the first LETTER; H and W
    are transparent (removed BEFORE coding, so codes they separated
    become adjacent and collapse); vowels code to 0 which SEPARATES
    duplicate codes (collapse runs first, strip 0s after); if the
    first letter itself carries a code, its whole leading run is
    dropped (Pfister -> P236); H/W first letters carry no code so
    nothing is dropped (Honeyman -> H555); pad/truncate to 3 digits.
    Run collapsing is replace('dd','d') applied 4x per digit —
    exact for runs up to 16, far beyond any name."""
    # NOTE: regexp_replace is global in Spark but FIRST-MATCH in
    # DuckDB without a 'g' flag Spark doesn't accept — so every
    # load-bearing global substitution below uses plain replace()
    # (global in both).  The [^A-Z] cleanup is safe as-is: after
    # upper() an all-letter name has ZERO matches, and the roster is
    # all-letter by construction.
    s0 = f"regexp_replace(upper({c}), '[^A-Z]', '')"
    first = f"substr({s0}, 1, 1)"
    hw = f"replace(replace({s0}, 'H', ''), 'W', '')"
    col = (
        f"translate({hw}, 'ABCDEFGIJKLMNOPQRSTUVXYZ',"
        " '012301202245501262301202')"
    )
    for d in "123456":
        for _ in range(4):
            col = f"replace({col}, '{d}{d}', '{d}')"
    body = (
        f"(CASE WHEN {first} IN ('H', 'W') THEN {col} "
        f"ELSE substr({col}, 2) END)"
    )
    body = f"replace({body}, '0', '')"
    return f"({first} || rpad(substr({body}, 1, 3), 3, '0'))"


PB_NAMES = [
    "Robert", "Rupert", "Ashcraft", "Ashcroft", "Tymczak",
    "Pfister", "Smith", "Smyth", "Schmidt", "Johnson",
    "Jonson", "Thompson", "Tomson", "Mueller", "Muller",
    "Miller", "Wright", "Write", "White", "Wite",
]
PB_MAX_LEV = 2


def q_phonetic_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phonetic blocking for entity resolution: customers get
    deterministic (first, last) names drawn from a roster of classic
    Soundex collision families (Smith/Smyth/Schmidt, Robert/Rupert,
    Ashcraft/Ashcroft, Mueller/Muller/Miller ...); candidate pairs
    are generated ONLY within (soundex(first), soundex(last)) blocks
    and verified by Levenshtein ≤ {2} on the full name — the
    standard two-stage fuzzy-match shape (cheap recall-oriented
    blocking, expensive precision-oriented verify) that a direct
    O(N²) name-distance join cannot afford.

    Exactness: the Soundex code is ONE shared-emitter SQL expression
    (_soundex_sql — same string in Spark and DuckDB), Levenshtein is
    the built-in integer metric in both engines, and the roster is a
    Python list emitted into both literals.  Known-miss law: classic
    Soundex puts Thompson (T512) and Tomson (T525) in DIFFERENT
    blocks — the recall gap every phonetic blocker ships — pinned in
    the tests rather than papered over.

    Scale shape: blocking is a pure projection; the self-join
    shuffles once on the block key and block sizes are name-family
    bounded (skewed natural names would salt or cap blocks —
    documented; the verify stays O(Σ block²) ≪ O(N²))."""
    c = _load_wide(spark, sf_dir, "customer")
    roster = F.array(*[F.lit(n) for n in PB_NAMES])
    nn = len(PB_NAMES)
    rec = c.select(
        F.col("c_custkey").alias("ck"),
        F.element_at(
            roster, ((F.col("c_custkey") * 7) % nn + 1).cast("int")
        ).alias("fn"),
        F.element_at(
            roster, ((F.col("c_custkey") * 13 + 3) % nn + 1).cast("int")
        ).alias("ln"),
    ).select(
        "ck",
        "fn",
        "ln",
        F.expr(_soundex_sql("fn")).alias("sdx_f"),
        F.expr(_soundex_sql("ln")).alias("sdx_l"),
    )
    l, r = rec.alias("l"), rec.alias("r")
    pairs = l.join(
        r,
        (F.col("l.sdx_f") == F.col("r.sdx_f"))
        & (F.col("l.sdx_l") == F.col("r.sdx_l"))
        & (F.col("l.ck") < F.col("r.ck")),
    )
    lev = F.levenshtein(
        F.concat_ws(" ", F.col("l.fn"), F.col("l.ln")),
        F.concat_ws(" ", F.col("r.fn"), F.col("r.ln")),
    )
    return (
        pairs.select(
            F.col("l.ck").alias("a"),
            F.col("r.ck").alias("b"),
            F.col("l.sdx_f").alias("sdx_f"),
            F.col("l.sdx_l").alias("sdx_l"),
            lev.cast("long").alias("lev"),
        )
        # genuinely fuzzy matches only: identical full names are
        # exact duplicates (dedup_exact's job, and they'd dominate
        # the output ~50:1)
        .filter((F.col("lev") >= 1) & (F.col("lev") <= PB_MAX_LEV))
    )


RAKE_STOPWORDS = ("a", "the")
RAKE_SCALE = 1_000_000_000  # word-score deg/freq quantization (1e-9)


def q_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases
    are maximal stopword-free token runs; each word scores
    deg/freq (deg = Σ length of phrases containing it, freq = its
    candidate occurrences — both per document); a phrase scores the
    sum of its word scores; report each document's best phrase —
    the document-local keyword primitive that tfidf_top_terms
    (corpus-global, single-token) does not cover.

    Exactness: deg and freq are integers; the word score is
    quantized by pure integer division ((deg·10⁹) DIV freq) so the
    phrase sum is an order-free BIGINT; the per-doc argmax rides
    min(struct(−score, phrase)) — a total order with ties broken on
    the lexicographically smallest phrase.  Phrase boundaries come
    from the gaps-and-islands trick (pos − row_number over non-stop
    tokens), the standard SQL run-grouping device.

    Scale shape: everything is partitioned by doc_id — one window
    pass for islands, one groupBy for phrases, window sums for
    deg/freq on the same partitioning, one final per-doc argmax;
    zero cross-doc traffic (RAKE is per-document by definition)."""
    from pyspark.sql.window import Window

    d = _load_wide(spark, sf_dir, "documents")
    toks = (
        d.select(
            "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
        )
        .filter(F.col("tok") != "")
        .filter(~F.col("tok").isin(*RAKE_STOPWORDS))
    )
    w_ord = Window.partitionBy("doc_id").orderBy("pos")
    isl = toks.withColumn(
        "island", F.col("pos") - F.row_number().over(w_ord)
    )
    w_phr = Window.partitionBy("doc_id", "island")
    w_word = Window.partitionBy("doc_id", "tok")
    scored = (
        isl.withColumn("phr_len", F.count(F.lit(1)).over(w_phr).cast("long"))
        .withColumn("freq", F.count(F.lit(1)).over(w_word).cast("long"))
        .withColumn("deg", F.sum("phr_len").over(w_word))
        .withColumn("ws_q", F.expr(f"(deg * {RAKE_SCALE}) DIV freq"))
    )
    phrases = scored.groupBy("doc_id", "island").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda x: x["tok"],
            ),
            " ",
        ).alias("phrase"),
        F.sum("ws_q").alias("score_q"),
    )
    best = phrases.groupBy("doc_id").agg(
        F.min(
            F.struct((-F.col("score_q")).alias("neg"), F.col("phrase"))
        ).alias("m"),
        F.count(F.lit(1)).cast("long").alias("n_phrases"),
    )
    return best.select(
        "doc_id",
        F.col("m.phrase").alias("phrase"),
        (-F.col("m.neg")).alias("score_q"),
        (
            (-F.col("m.neg")).cast("double") / F.lit(float(RAKE_SCALE))
        ).alias("score"),
        "n_phrases",
    )


def q_cdx_surt_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDX-style capture index with SURT keys (the web-archive /
    crawl-index layout: Sort-friendly URI Reordering Transform):
    each doc gets a deterministic messy URL (mixed schemes, www and
    non-www and subdomain hosts, an :8080 port class, unsorted
    query params); the SURT key reverses host labels comma-joined
    ('org,example')  + optional port + ')' + path + sorted query, so
    a plain SORT co-locates every capture of a registered domain
    and its subdomains — the property that makes petabyte CDX
    lookups a bounded range scan instead of a full-index filter.

    Exactness: pure string algebra in both engines (lower, www-strip
    by anchored regex, label reverse + comma join, param sort);
    digest = md5(text) (both engines emit lowercase hex); idx =
    row_number over (surt, doc_id) PINS the total order in a
    hashable column — ASCII ')' < ',' makes 'org,example)…' sort
    strictly before 'org,example,sub)…', so domain groups are
    contiguous and subdomains follow their parent (pinned by law).

    Scale shape: one projection + ONE global sort (the index build
    IS a sort — rangepartitioned at scale, exactly what
    zorder_layout does for multi-key); no Python, no extra
    shuffle."""
    from pyspark.sql.window import Window

    d = _load_wide(spark, sf_dir, "documents")
    did = F.col("doc_id")
    scheme = F.when(did % 2 == 0, "http").otherwise("https")
    host = (
        F.when(did % 4 == 0, "example.org")
        .when(did % 4 == 1, "WWW.example.org")
        .when(did % 4 == 2, "sub.example.org")
        .otherwise("archive.net")
    )
    port = F.when(did % 7 == 2, ":8080").otherwise("")
    path = F.concat(F.lit("/p/"), did.cast("string"))
    query = (
        F.when(did % 5 == 0, "b=2&a=1")
        .when(did % 5 == 1, "a=1")
        .otherwise("")
    )
    url = F.concat(
        scheme,
        F.lit("://"),
        host,
        port,
        path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(""),
    )
    host2 = F.regexp_replace(F.lower(host), "^www\\.", "")
    rev = F.array_join(F.reverse(F.split(host2, "\\.")), ",")
    qsorted = F.array_join(F.array_sort(F.split(query, "&")), "&")
    surt = F.concat(
        rev,
        port,
        F.lit(")"),
        path,
        F.when(query != "", F.concat(F.lit("?"), qsorted)).otherwise(""),
    )
    rows = d.select(
        "doc_id",
        url.alias("url"),
        surt.alias("surt"),
        F.md5(F.col("text")).alias("digest"),
    )
    w = Window.orderBy("surt", "doc_id")
    return rows.withColumn(
        "idx", F.row_number().over(w).cast("long")
    )


TS_OVL_N = 30  # Theil-Sen overlay series length
TS_OVL_SLOPE = 5  # planted linear slope
TS_OVL_OUTLIERS = (5, 15, 25)  # positions forced to a huge spike


def q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust slope per user: the MEDIAN of all pairwise
    slopes (v_j − v_i)/(j − i) over the time-ordered value series —
    the estimator with a 29.3% breakdown point that q_ols_trend
    (zero breakdown: one spike drags the fit) cannot match; the
    standard robust-trend primitive for noisy per-segment metrics.

    Exactness: each slope is ONE double division (deterministic
    IEEE in both engines); the median is positional — row_number
    over the total order (slope, i, j) picks the middle one or two
    rows, and the even case averages exactly two doubles with the
    same op order.  Overlay: user −1 is a planted line of slope 5
    with three positions spiked to 10⁶ — the law pins slope_med
    exactly 5.0 (the spiked pairs are a minority), the
    outlier-immunity OLS provably lacks.

    Scale shape: the pair join, the sort, and the median pick are
    all partitioned by user_id — O(n²) per key, zero cross-key
    traffic (same contract as mann_kendall; big-n keys would use
    the O(n log n) randomized median-of-slopes refinement,
    documented not needed at this per-key cardinality)."""
    from pyspark.sql.window import Window

    e = _load_wide(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    real = e.select(
        "user_id", F.row_number().over(w).alias("rn"),
        F.col("value").alias("v"),
    )
    ovl_v = (
        F.when(
            F.col("id").isin(*TS_OVL_OUTLIERS), F.lit(1000000.0)
        )
        .otherwise((F.col("id") * TS_OVL_SLOPE + 7).cast("double"))
    )
    ovl = spark.range(1, TS_OVL_N + 1).select(
        F.lit(-1).cast("long").alias("user_id"),
        F.col("id").cast("int").alias("rn"),
        ovl_v.alias("v"),
    )
    base = real.unionByName(ovl)
    l, r = base.alias("l"), base.alias("r")
    slopes = l.join(
        r,
        (F.col("l.user_id") == F.col("r.user_id"))
        & (F.col("l.rn") < F.col("r.rn")),
    ).select(
        F.col("l.user_id").alias("user_id"),
        F.col("l.rn").alias("i"),
        F.col("r.rn").alias("j"),
        (
            (F.col("r.v") - F.col("l.v"))
            / (F.col("r.rn") - F.col("l.rn")).cast("double")
        ).alias("slope"),
    )
    word = Window.partitionBy("user_id").orderBy("slope", "i", "j")
    wall = Window.partitionBy("user_id")
    ranked = slopes.select(
        "user_id",
        "slope",
        F.row_number().over(word).cast("long").alias("rs"),
        F.count(F.lit(1)).over(wall).cast("long").alias("np"),
    )
    # middle one (odd) or two (even) positions — integer DIV, since
    # plain / is double division in Spark SQL and would skip a row
    mid = ranked.filter(
        (F.col("rs") == F.expr("(np + 1) DIV 2"))
        | (F.col("rs") == F.expr("(np + 2) DIV 2"))
    )
    return mid.groupBy("user_id").agg(
        F.max("np").alias("n_pairs"),
        (F.sum("slope") / F.count(F.lit(1)).cast("double")).alias(
            "slope_med"
        ),
    )


ISO_SCALE = 1_000_000_000  # segment-average quantization (1e-9)


def q_isotonic_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (PAV) calibration per source: fit the best monotone
    non-decreasing curve to binary relevance labels ordered by the
    ranking score — the calibration step between raw scores and
    probabilities that calibration_bins (fixed-width, not monotone)
    doesn't give; the classic pool-adjacent-violators output.

    Exactness: PAV is computed by the MINIMAX IDENTITY fit_i =
    max_{j≤i} min_{k≥i} avg(y_j..y_k) — no sequential pooling loop
    — with every segment average quantized to an exact BIGINT
    ((S_k − S_{j−1})·10⁹ DIV (k−j+1), prefix sums of 0/1 labels),
    so min/max run on integers and the result is engine-exact.
    Monotonicity survives quantization structurally (the j-set
    grows and the k-set shrinks with i for ANY cell values —
    pinned by law); the quantized fit is within 1e-9 of exact PAV
    (law-checked against a Fraction-exact reference).

    Scale shape: calibration runs per source group — the (j,k)
    segment table is O(n²) per KEY (n = docs per source ≈ 25;
    calibration tables are small by nature), built by one
    key-partitioned self-join; the suffix-min and the final max are
    windows/groupBys on the same partitioning; zero cross-key
    traffic."""
    from pyspark.sql.window import Window

    d = _load_wide(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    score = F.size(F.filter(toks, lambda t: t == F.lit(AP_SCORE_TOK)))
    rel = (
        F.array_contains(toks, AP_REL_TOK)
        | (F.col("doc_id") % AP_REL_MOD == AP_REL_RES)
    ).cast("long")
    worder = Window.partitionBy("source").orderBy("score", "doc_id")
    wpre = (
        Window.partitionBy("source")
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pos = (
        d.select(
            "source",
            "doc_id",
            score.cast("long").alias("score"),
            rel.alias("y"),
        )
        .withColumn("rn", F.row_number().over(worder).cast("long"))
        .withColumn("s", F.sum("y").over(wpre))
        .withColumn("sprev", F.col("s") - F.col("y"))
        .localCheckpoint()  # one window pass feeds both join sides
    )
    jj = pos.select(
        "source", F.col("rn").alias("j"), F.col("sprev").alias("sj")
    )
    kk = pos.select("source", F.col("rn").alias("k"), F.col("s").alias("sk"))
    segs = jj.join(kk, "source").filter(F.col("k") >= F.col("j")).select(
        "source",
        "j",
        F.col("k").alias("i"),
        F.expr(
            f"((sk - sj) * {ISO_SCALE}) DIV (k - j + 1)"
        ).alias("q"),
    )
    wsuf = (
        Window.partitionBy("source", "j")
        .orderBy(F.desc("i"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    mji = segs.withColumn("m", F.min("q").over(wsuf))
    fit = (
        mji.groupBy("source", "i")
        .agg(F.max("m").alias("fit_q"))
        .withColumnRenamed("source", "fsource")  # defuse self-join lineage
    )
    return (
        pos.join(
            fit,
            (F.col("source") == F.col("fsource"))
            & (F.col("rn") == F.col("i")),
        )
        .select(
            "source",
            "doc_id",
            "rn",
            "score",
            "y",
            "fit_q",
            (F.col("fit_q").cast("double") / F.lit(float(ISO_SCALE))).alias(
                "fit"
            ),
        )
    )


def q_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) over the DIRECTED
    crawl link graph — two exact power iterations from h⁰ = 1:
    a¹ = indegree, h¹ = Σ_out a¹, a² = Σ_in h¹, h² = Σ_out a² —
    the mutually-reinforcing centrality pair that PageRank's single
    score conflates (a catalog page is a great hub and a terrible
    authority; link_pagerank can't say which).

    Exactness: normalization is deliberately deferred (rankings are
    scale-invariant under HITS iteration), so every score is an
    exact BIGINT path count — a² counts in-paths of shape in·out·in,
    h² counts out·in·out — and the cross-engine gate never touches
    a float.  Int64 headroom: bounded by (max deg)⁴ · N ≪ 2^63 at
    fixture degrees (a production run normalizes per iteration in
    floats; the exact-integer form is the TESTABLE core).

    Scale shape: each half-iteration is one equi-join of the edge
    list with the current score vector + one key-partitioned
    groupBy — the link_pagerank shuffle shape; 4 half-iterations,
    lineage cut between rounds is unnecessary at this depth."""
    from ocular_spark.functions import html as H

    d = _load_wide(spark, sf_dir, "documents")
    wrapped = d.select("doc_id", F.expr(H.wrap_links_spark()).alias("html"))
    edges = (
        wrapped.select(
            F.col("doc_id").alias("src"),
            F.explode(F.expr(H.doc_links_expr("html"))).alias("dd"),
        )
        .select("src", F.col("dd").cast("long").alias("dst"))
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    # a1 = indegree (h0 = 1)
    a1 = edges.groupBy(F.col("dst").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("a1")
    )
    h1 = (
        edges.join(a1, edges["dst"] == a1["node"])
        .groupBy(F.col("src").alias("node"))
        .agg(F.sum("a1").alias("h1"))
    )
    a2 = (
        edges.join(h1, edges["src"] == h1["node"])
        .groupBy(F.col("dst").alias("node"))
        .agg(F.sum("h1").alias("a2"))
    )
    h2 = (
        edges.join(a2, edges["dst"] == a2["node"])
        .groupBy(F.col("src").alias("node"))
        .agg(F.sum("a2").alias("h2"))
    )
    return (
        nodes.join(a1, "node", "left")
        .join(h1, "node", "left")
        .join(a2, "node", "left")
        .join(h2, "node", "left")
        .select(
            "node",
            F.coalesce("a1", F.lit(0)).alias("a1"),
            F.coalesce("h1", F.lit(0)).alias("h1"),
            F.coalesce("a2", F.lit(0)).alias("a2"),
            F.coalesce("h2", F.lit(0)).alias("h2"),
        )
    )


DIJK_CAP = 200  # oracle walk-enumeration distance cap (≫ any real SP)
DIJK_MAX_ROUNDS = 64


def _crawl_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed href-extracted crawl edges (the graph_bfs/pagerank
    edge set), distinct + lineage-cut."""
    from ocular_spark.functions import html as H

    d = _load_wide(spark, sf_dir, "documents")
    wrapped = d.select("doc_id", F.expr(H.wrap_links_spark()).alias("html"))
    return (
        wrapped.select(
            F.col("doc_id").alias("src"),
            F.explode(F.expr(H.doc_links_expr("html"))).alias("dd"),
        )
        .select("src", F.col("dd").cast("long").alias("dst"))
        .distinct()
        .localCheckpoint()
    )


def q_dijkstra_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted single-source(-set) shortest paths over the crawl
    link graph — graph_bfs flows HOP distance; this flows COST
    (edge weight = 1 + (7·src + 13·dst) mod 10, the deterministic
    weight synthesis device), the primitive behind cheapest-route /
    weighted-influence questions an unweighted BFS cannot answer.

    Spark side: Bellman-Ford-style fixed-point relaxation — each
    round one src-equi-join (dist + w) + one min groupBy, lineage
    localCheckpoint-truncated, converged when the (count, sum) probe
    stops moving (distances are monotone non-increasing and bounded,
    the _cc_min_label scalar-probe device) — no priority queue
    needed; rounds ≤ longest shortest-path hop count.  The oracle is
    the INDEPENDENT formulation: recursive-CTE WALK enumeration
    deduplicated by (node, dist) with a distance cap ≫ any real
    shortest path (every prefix of a shortest path stays under the
    cap, so the minimum is exact), then MIN per node.

    Exactness: integer weights, integer sums — no floats anywhere.
    Scale shape: per round one key-partitioned join + combine; the
    frontier table is node-sized, never edge-enumerated."""
    edges = _crawl_edges(spark, sf_dir).select(
        "src",
        "dst",
        (1 + (F.col("src") * 7 + F.col("dst") * 13) % 10).alias("w"),
    ).localCheckpoint()
    d = _load_wide(spark, sf_dir, "documents")
    dist = (
        d.filter(F.col("doc_id") < BFS_SEEDS_BELOW)
        .select(
            F.col("doc_id").cast("long").alias("node"),
            F.lit(0).cast("long").alias("dist"),
        )
        .localCheckpoint()
    )
    prev_probe = None
    for _ in range(DIJK_MAX_ROUNDS):
        relaxed = (
            edges.join(dist, edges["src"] == dist["node"])
            .select(
                F.col("dst").alias("node"),
                (F.col("dist") + F.col("w")).alias("dist"),
            )
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint()
        )
        probe = dist.agg(
            F.count(F.lit(1)).alias("c"), F.sum("dist").alias("s")
        ).collect()[0]
        probe = (probe["c"], probe["s"])
        if probe == prev_probe:
            break
        prev_probe = probe
    return dist


CENSUS_SEEDS_BELOW = 5
CENSUS_MAX_HOPS = 6


def q_path_count_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shortest-path multiplicity census from a seed set: for every
    reachable node, the hop distance AND σ = the exact NUMBER of
    distinct shortest paths from the seed — the path-redundancy
    signal (single-path bottleneck vs richly connected) that plain
    BFS distance (graph_bfs) throws away; σ is also the forward
    half of Brandes betweenness.

    Spark side: layered BFS carrying (seed, node, σ) — per layer one
    edge join, one sum-combine of σ over predecessors (σ additivity:
    σ(v) = Σ_{pred u at d−1} σ(u), exact BIGINT), one anti-join
    against settled nodes; hop-bounded.  Oracle: recursive-CTE
    enumeration of ALL walks up to the hop cap (UNION ALL — row
    multiplicity IS the count), then COUNT at the minimal depth per
    (seed, node): a minimal-length walk cannot revisit a node
    (removing the cycle would shorten it), so minimal-walk count =
    shortest-PATH count exactly — two genuinely different
    formulations of σ.

    Scale shape: frontier tables are O(reached nodes) per seed;
    every step is key-partitioned join/agg; the hop cap bounds
    rounds; seed fan-out is the parallel axis at scale."""
    edges = _crawl_edges(spark, sf_dir)
    d = _load_wide(spark, sf_dir, "documents")
    frontier = (
        d.filter(F.col("doc_id") < CENSUS_SEEDS_BELOW)
        .select(
            F.col("doc_id").cast("long").alias("seed"),
            F.col("doc_id").cast("long").alias("node"),
            F.lit(0).cast("long").alias("dist"),
            F.lit(1).cast("long").alias("sigma"),
        )
        .localCheckpoint()
    )
    settled = frontier
    for hop in range(1, CENSUS_MAX_HOPS + 1):
        nxt = (
            edges.join(frontier, edges["src"] == frontier["node"])
            .groupBy("seed", F.col("dst").alias("node"))
            .agg(F.sum("sigma").alias("sigma"))
            .withColumn("dist", F.lit(hop).cast("long"))
        )
        frontier = nxt.join(
            settled.select("seed", "node"), ["seed", "node"], "left_anti"
        ).select("seed", "node", "dist", "sigma").localCheckpoint()
        if frontier.isEmpty():
            break
        settled = settled.unionByName(frontier).localCheckpoint()
    return settled


BT_K = 168  # backtest holdout horizon (hours)
BT_SCALE = 1_000_000_000  # per-term sMAPE quantization (1e-9)


def q_backtest_smape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest per event type: predict each
    hour's event count with the count 24 hours earlier, score the
    last {168}-hour holdout with sMAPE — the baseline every
    forecasting pipeline must beat, and the backtest-evaluation
    primitive (dense calendar grid, lag forecast, horizon split)
    that the anomaly/drift rows don't provide.

    Exactness: the hour index is exact integer µs offsets from the
    stream's hour-truncated min(ts) anchor (the _event_us
    TIMESTAMP_NTZ device — epoch casts would drag in a session
    timezone) DIV 3600·10⁶; missing hours are densified to 0 via a
    sequence grid; each sMAPE term 2|F−A|/(F+A) is quantized to an
    exact BIGINT by integer division (0 when F+A=0, the standard
    convention), the sum is order-free, and smape is ONE division.
    Overlay: a 'periodic' series repeating with period 24 exactly
    (sMAPE = 0 pinned) and a 'drift' series adding +1 per day
    (nonzero, hand-computable).

    Scale shape: one groupBy(type, hour) over the corpus, a
    broadcast hour grid (constant-sized) cross-joined to types,
    per-type window lag on the (type)-partitioned grid, one final
    groupBy — shuffles only on the type/hour keys."""
    from pyspark.sql.window import Window

    raw = _load_wide(spark, sf_dir, "events")
    anchor = raw.agg(F.min("ts")).collect()[0][0]
    anchor_hour = anchor.replace(minute=0, second=0, microsecond=0)
    a_lit = anchor_hour.strftime("%Y-%m-%d %H:%M:%S.%f")
    h = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '{a_lit}', ts)"
        " DIV 3600000000"
    )
    counts = raw.groupBy(
        F.col("event_type").alias("etype"), h.alias("h")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    hmax = counts.groupBy().agg(F.max("h").alias("hmax"))
    grid = (
        counts.select("etype")
        .distinct()
        .crossJoin(F.broadcast(hmax))
        .select(
            "etype", F.explode(F.expr("sequence(0, hmax)")).alias("h"), "hmax"
        )
    )
    dense = grid.join(counts, ["etype", "h"], "left").select(
        "etype", "h", "hmax", F.coalesce("c", F.lit(0)).alias("c")
    )
    hours = (
        hmax.select(
            F.explode(F.expr("sequence(0, hmax)")).alias("h"), "hmax"
        )
    )
    ovl = hours.select(
        F.lit("periodic").alias("etype"),
        "h",
        "hmax",
        (10 + F.col("h") % 24).cast("long").alias("c"),
    ).unionByName(
        hours.select(
            F.lit("drift").alias("etype"),
            "h",
            "hmax",
            (10 + F.col("h") % 24 + F.expr("h DIV 24")).cast("long").alias(
                "c"
            ),
        )
    )
    allseries = dense.unionByName(ovl)
    wlag = Window.partitionBy("etype").orderBy("h")
    lagged = allseries.withColumn("f", F.lag("c", 24).over(wlag))
    hold = lagged.filter(
        (F.col("h") > F.col("hmax") - BT_K) & F.col("f").isNotNull()
    )
    term = F.when(
        F.col("f") + F.col("c") > 0,
        F.expr(f"(2 * abs(f - c) * {BT_SCALE}) DIV (f + c)"),
    ).otherwise(F.lit(0))
    agg = hold.groupBy("etype").agg(
        F.count(F.lit(1)).cast("long").alias("n_h"),
        F.sum(term).alias("smape_q"),
    )
    return agg.select(
        "etype",
        "n_h",
        "smape_q",
        (
            F.col("smape_q").cast("double")
            / (F.col("n_h") * F.lit(BT_SCALE)).cast("double")
        ).alias("smape"),
    )


CONV_K = 14  # conversion = >= this many events of the type
PZ_OVL = (75, 70, 75, 30)  # planted arm: (n1, x1, n0, x0) -> 'shift'


def q_prop_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test per event type: does the treatment arm
    (user_id mod 2) convert differently, where conversion = at
    least {14} events of that type?  The A/B significance primitive
    under the pooled-variance normal approximation — the categorical
    counterpart to mann_whitney's continuous shift test.

    Exactness: with x = x1+x0, n = n1+n0, the squared statistic is
    the exact rational z² = (x1·n0 − x0·n1)²·n / (n1·n0·x·(n−x)),
    so the two-sided α=0.05 verdict is the all-BIGINT line
    625·(x1n0 − x0n1)²·n ≥ 2401·n1·n0·x·(n−x) — degenerate rates
    (x = 0 or x = n) short-circuit to 'null' before any division;
    the reported z is ONE shared sqrt.  Overlay: one planted arm
    pair (70/75 vs 30/75) guarantees 'shift' on any corpus; the
    real assignment is effect-free so 'null' rows dominate.

    Scale shape: one per-(user, type) count, one per-type 4-sum
    groupBy — two key-partitioned aggregations, report is
    type-sized."""
    e = _load_wide(spark, sf_dir, "events")
    per_user = (
        e.groupBy("user_id", F.col("event_type").alias("etype"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "etype",
            (F.col("user_id") % 2 == 1).cast("long").alias("t"),
            (F.col("cnt") >= CONV_K).cast("long").alias("conv"),
        )
    )
    agg = per_user.groupBy("etype").agg(
        F.sum("t").alias("n1"),
        F.sum(F.col("t") * F.col("conv")).alias("x1"),
        F.sum(1 - F.col("t")).alias("n0"),
        F.sum((1 - F.col("t")) * F.col("conv")).alias("x0"),
    )
    n1o, x1o, n0o, x0o = PZ_OVL
    ovl = spark.range(1).select(
        F.lit("planted").alias("etype"),
        F.lit(n1o).cast("long").alias("n1"),
        F.lit(x1o).cast("long").alias("x1"),
        F.lit(n0o).cast("long").alias("n0"),
        F.lit(x0o).cast("long").alias("x0"),
    )
    allarms = agg.unionByName(ovl)
    n1, x1, n0, x0 = (F.col(c) for c in ("n1", "x1", "n0", "x0"))
    x, n = x1 + x0, n1 + n0
    dnum = x1 * n0 - x0 * n1
    ok_var = (x > 0) & (x < n) & (n1 > 0) & (n0 > 0)
    z = F.when(
        ok_var,
        dnum.cast("double")
        / F.sqrt(
            (n1 * n0).cast("double")
            * (x * (n - x)).cast("double")
            / n.cast("double")
        ),
    ).otherwise(F.lit(0.0))
    sig = ok_var & (
        F.lit(TREND_Z2_DEN) * dnum * dnum * n
        >= F.lit(TREND_Z2_NUM) * n1 * n0 * x * (n - x)
    )
    return allarms.select(
        "etype",
        "n1",
        "x1",
        "n0",
        "x0",
        z.alias("z"),
        F.when(sig, F.lit("shift")).otherwise(F.lit("null")).alias(
            "verdict"
        ),
    )


DID_SPLIT_H = 360  # pre = first 360 grid hours, post = the rest
DID_SCALE = 1_000_000  # cell-mean quantization (micro-cents)
DID_PLANT_C = 10000  # planted additive effect: +100.00 in cents


def q_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences over the event stream: outcome =
    event value in integer cents, arms = user_id mod 2, periods =
    first vs second half of the hour grid; DiD = (T_post − T_pre) −
    (C_post − C_pre) on quantized cell means — the causal-inference
    workhorse that a plain arm comparison (prop_ztest) cannot give
    when arms start from different baselines.

    Exactness: values quantize to integer cents; each cell mean is
    quantized ONCE to micro-cents by integer division
    ((S·10⁶) DIV n — bounded ~10¹⁰, no overflow at any sf), and
    did_q is pure BIGINT arithmetic on the four quantized means.
    The gate carries its own causal control: a second metric
    'planted' adds exactly +{10000} cents to treated-post events
    only, and floor((S + 10000·n)·10⁶ / n) = floor(S·10⁶/n) + 10¹⁰
    EXACTLY, so did_q(planted) − did_q(value) == 10¹⁰ with no
    tolerance — the effect-recovery law.

    Scale shape: ONE pass (project arm/period/cents, one 4-key
    groupBy with map-side combine), then 8 rows of arithmetic."""
    raw = _load_wide(spark, sf_dir, "events")
    anchor = raw.agg(F.min("ts")).collect()[0][0]
    anchor_hour = anchor.replace(minute=0, second=0, microsecond=0)
    a_lit = anchor_hour.strftime("%Y-%m-%d %H:%M:%S.%f")
    h = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '{a_lit}', ts)"
        " DIV 3600000000"
    )
    base = raw.select(
        (F.col("user_id") % 2 == 1).cast("long").alias("t"),
        (h >= DID_SPLIT_H).cast("long").alias("post"),
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    metrics = base.select(
        F.lit("value").alias("metric"), "t", "post", "c"
    ).unionByName(
        base.select(
            F.lit("planted").alias("metric"),
            "t",
            "post",
            (
                F.col("c")
                + F.col("t") * F.col("post") * F.lit(DID_PLANT_C)
            ).alias("c"),
        )
    )
    cells = metrics.groupBy("metric", "t", "post").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").alias("s"),
    )
    mq = F.expr(f"(s * {DID_SCALE}) DIV n")
    wide = (
        cells.select("metric", "t", "post", "n", mq.alias("m"))
        .groupBy("metric")
        .agg(
            F.sum(F.when((F.col("t") == 1) & (F.col("post") == 1),
                         F.col("m"))).alias("mt_post"),
            F.sum(F.when((F.col("t") == 1) & (F.col("post") == 0),
                         F.col("m"))).alias("mt_pre"),
            F.sum(F.when((F.col("t") == 0) & (F.col("post") == 1),
                         F.col("m"))).alias("mc_post"),
            F.sum(F.when((F.col("t") == 0) & (F.col("post") == 0),
                         F.col("m"))).alias("mc_pre"),
            F.sum("n").alias("n_events"),
        )
    )
    did_q = (F.col("mt_post") - F.col("mt_pre")) - (
        F.col("mc_post") - F.col("mc_pre")
    )
    return wide.select(
        "metric",
        "n_events",
        "mt_pre",
        "mt_post",
        "mc_pre",
        "mc_post",
        did_q.alias("did_q"),
        (did_q.cast("double") / F.lit(float(DID_SCALE * 100))).alias(
            "did_dollars"
        ),
    )


CUPED_SCALE = 100_000  # theta quantization (1e-5)
CUPED_OVL_N = 20  # planted strongly-correlated cohort size


def q_cuped_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng et al. 2013): per user, X =
    pre-period spend (cents), Y = post-period spend; the adjusted
    metric Z = Y − θX with θ = cov(X,Y)/var(X) shrinks metric
    variance by the squared correlation — the standard trick that
    makes experiment readouts converge ~weeks earlier; X and Y are
    genuinely correlated here through per-user event volume.

    Exactness: cents sums are exact; cov_num = N·Σxy − Σx·Σy and
    var_num = N·Σx² − (Σx)² are exact BIGINTs; θ is quantized ONCE
    (θ_q = cov_num·10⁶ DIV var_num) and each user's adjusted value
    re-quantizes to cents (z_q = (y·10⁶ − θ_q·x) DIV 10⁶) so all
    downstream sums stay far from 2⁶³.  The variance-reduction
    report (pooled N·Σz² − (Σz)² vs the same for raw Y) is exact
    integer; vr is ONE division.  Law: θ_q is discretely optimal —
    replaying with θ_q ± 1 can only raise the adjusted variance.

    Scale shape: one per-user two-period aggregation (single
    groupBy), one 5-sum scalar agg broadcast back (O(1) rows), one
    projection, one final per-arm agg — no shuffle wider than the
    user key."""
    raw = _load_wide(spark, sf_dir, "events")
    anchor = raw.agg(F.min("ts")).collect()[0][0]
    anchor_hour = anchor.replace(minute=0, second=0, microsecond=0)
    a_lit = anchor_hour.strftime("%Y-%m-%d %H:%M:%S.%f")
    h = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '{a_lit}', ts)"
        " DIV 3600000000"
    )
    per_user = raw.select(
        "user_id",
        (h >= DID_SPLIT_H).cast("long").alias("post"),
        F.round(F.col("value") * 100).cast("long").alias("c"),
    ).groupBy("user_id").agg(
        F.sum(F.when(F.col("post") == 0, F.col("c")).otherwise(0)).alias(
            "x"
        ),
        F.sum(F.when(F.col("post") == 1, F.col("c")).otherwise(0)).alias(
            "y"
        ),
    )
    # planted cohort (the overlay device): 20 users whose pre/post
    # spends are strongly linearly tied — real per-event values are
    # i.i.d. uniform, so without it the pooled correlation is ~0 and
    # the operator's variance reduction would be invisible (~0.5%)
    ovl = spark.range(1, CUPED_OVL_N + 1).select(
        (-F.col("id")).cast("long").alias("user_id"),
        (F.col("id") * 50000).cast("long").alias("x"),
        (F.col("id") * 40000 + (F.col("id") % 7) * 137).cast("long").alias(
            "y"
        ),
    )
    per_user = per_user.unionByName(ovl)
    # theta moments run on DOLLAR-truncated sums: cov/var is
    # invariant under common scaling, and cent-level moments times
    # the 1e5 quantum would overflow int64 (the truncation is part
    # of the spec, identical in both engines; production keeps
    # theta's moments in double — theta needs ~6 digits)
    dollars = per_user.select(
        F.expr("x DIV 100").alias("xd"), F.expr("y DIV 100").alias("yd")
    )
    tot = dollars.agg(
        F.count(F.lit(1)).cast("long").alias("nu"),
        F.sum("xd").alias("sx"),
        F.sum("yd").alias("sy"),
        F.sum(F.col("xd") * F.col("yd")).alias("sxy"),
        F.sum(F.col("xd") * F.col("xd")).alias("sxx"),
    )
    theta = tot.select(
        "nu",
        (F.col("nu") * F.col("sxy") - F.col("sx") * F.col("sy")).alias(
            "cov_num"
        ),
        (F.col("nu") * F.col("sxx") - F.col("sx") * F.col("sx")).alias(
            "var_num"
        ),
    ).select(
        "nu",
        "cov_num",
        "var_num",
        F.expr(f"(cov_num * {CUPED_SCALE}) DIV var_num").alias("theta_q"),
    )
    adj = per_user.crossJoin(F.broadcast(theta)).select(
        "user_id",
        "x",
        "y",
        "theta_q",
        F.expr(f"(y * {CUPED_SCALE} - theta_q * x) DIV {CUPED_SCALE}").alias(
            "z"
        ),
    )
    pooled = adj.groupBy("theta_q").agg(
        F.count(F.lit(1)).cast("long").alias("nu"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum("z").alias("sz"),
        F.sum(F.col("z") * F.col("z")).alias("szz"),
    )
    arms = adj.select(
        (F.col("user_id") % 2 == 1).cast("long").alias("t"), "y", "z"
    ).groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("y").alias("sum_y"),
        F.sum("z").alias("sum_z"),
    )
    var_raw = F.col("nu") * F.col("syy") - F.col("sy") * F.col("sy")
    var_adj = F.col("nu") * F.col("szz") - F.col("sz") * F.col("sz")
    return arms.crossJoin(
        F.broadcast(
            pooled.select(
                "theta_q",
                var_raw.alias("var_raw_num"),
                var_adj.alias("var_adj_num"),
                (
                    var_adj.cast("double") / var_raw.cast("double")
                ).alias("vr"),
            )
        )
    ).select(
        "t",
        "n_users",
        "sum_y",
        "sum_z",
        "theta_q",
        "var_raw_num",
        "var_adj_num",
        "vr",
    )


PEAK_MIN_PROM = 3  # report peaks with prominence >= this
_PEAK_MOUNTAIN = (0, 5, 0, 9, 1, 6, 0, 2, 0, 7, 3, 8, 0)  # planted


def q_peak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topographic peak detection with PROMINENCE over the hourly
    event-count series per type (the scipy.signal.find_peaks
    contract): a peak is a strict local maximum; its prominence is
    its height above the higher of the two valley minima between it
    and the nearest HIGHER point on each side (series edge if none)
    — the measure that separates real activity spikes from ripples
    riding a trend, which a plain threshold (hysteresis_alerts) or
    z-score (seasonal_anomaly) conflates.

    Exactness: counts are integers; bounds and valley minima are
    conditional integer aggregates over (peak, point) pairs, so
    prominence never touches a float.  A strict-both-sides peak has
    a point strictly between it and either bound (the adjacent
    neighbor is lower than the peak, hence below any higher-bound),
    so the valley minima are never over an empty set.  Overlay: a
    planted 13-hour 'mountain' series with hand-computable
    prominences (9 is the global max: its bases reach the edges).

    Scale shape: candidate peaks are prefiltered by one window pass
    (lag/lead), so the two pair joins are O(peaks·n) per type key —
    not O(n²) — and everything shuffles on the type key only; at
    unbounded n the production path is the monotone-stack scan
    inside one mapInPandas partition, documented."""
    from pyspark.sql.window import Window

    raw = _load_wide(spark, sf_dir, "events")
    anchor = raw.agg(F.min("ts")).collect()[0][0]
    anchor_hour = anchor.replace(minute=0, second=0, microsecond=0)
    a_lit = anchor_hour.strftime("%Y-%m-%d %H:%M:%S.%f")
    h = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '{a_lit}', ts)"
        " DIV 3600000000"
    )
    counts = raw.groupBy(
        F.col("event_type").alias("etype"), h.alias("h")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    hmax = counts.groupBy().agg(F.max("h").alias("hmax"))
    grid = (
        counts.select("etype")
        .distinct()
        .crossJoin(F.broadcast(hmax))
        .select("etype", F.explode(F.expr("sequence(0, hmax)")).alias("h"))
    )
    dense = grid.join(counts, ["etype", "h"], "left").select(
        "etype", "h", F.coalesce("c", F.lit(0)).alias("c")
    )
    mountain = F.array(*[F.lit(v) for v in _PEAK_MOUNTAIN])
    ovl = spark.range(len(_PEAK_MOUNTAIN)).select(
        F.lit("mountain").alias("etype"),
        F.col("id").cast("long").alias("h"),
        F.element_at(mountain, (F.col("id") + 1).cast("int"))
        .cast("long")
        .alias("c"),
    )
    series = dense.unionByName(ovl).localCheckpoint()
    wlag = Window.partitionBy("etype").orderBy("h")
    peaks = (
        series.withColumn("cl", F.lag("c").over(wlag))
        .withColumn("cr", F.lead("c").over(wlag))
        .filter(
            F.col("cl").isNotNull()
            & F.col("cr").isNotNull()
            & (F.col("c") > F.col("cl"))
            & (F.col("c") > F.col("cr"))
        )
        .select("etype", F.col("h").alias("ph"), F.col("c").alias("pc"))
        .localCheckpoint()
    )
    pts = series.select("etype", F.col("h").alias("j"), F.col("c").alias("cj"))
    bounds = (
        peaks.join(pts, "etype")
        .groupBy("etype", "ph", "pc")
        .agg(
            F.max(
                F.when(
                    (F.col("j") < F.col("ph")) & (F.col("cj") > F.col("pc")),
                    F.col("j"),
                )
            ).alias("jl"),
            F.min(
                F.when(
                    (F.col("j") > F.col("ph")) & (F.col("cj") > F.col("pc")),
                    F.col("j"),
                )
            ).alias("jr"),
        )
        .select(
            "etype",
            "ph",
            "pc",
            F.coalesce("jl", F.lit(-1)).alias("jl"),
            F.coalesce("jr", F.lit(1 << 40)).alias("jr"),
        )
    )
    valleys = (
        bounds.join(pts, "etype")
        .groupBy("etype", "ph", "pc", "jl", "jr")
        .agg(
            F.min(
                F.when(
                    (F.col("j") > F.col("jl")) & (F.col("j") < F.col("ph")),
                    F.col("cj"),
                )
            ).alias("minl"),
            F.min(
                F.when(
                    (F.col("j") > F.col("ph")) & (F.col("j") < F.col("jr")),
                    F.col("cj"),
                )
            ).alias("minr"),
        )
    )
    return (
        valleys.select(
            "etype",
            F.col("ph").alias("h"),
            F.col("pc").alias("c"),
            (F.col("pc") - F.greatest("minl", "minr")).alias("prom"),
        )
        .filter(F.col("prom") >= PEAK_MIN_PROM)
    )


KS_CRIT2_NUM = 18496  # 1.36^2 * 1e4 (alpha = 0.05 asymptotic)
KS_CRIT2_DEN = 10000
KS_OVL_N = 50


def q_ks_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sample Kolmogorov-Smirnov uniformity test per user: are
    the user's event times uniform over the global observation
    window (the Poisson-process sanity check behind bot/burst
    triage)?  D = sup|ECDF(t) − t/T| evaluated at both sides of
    every step.

    Exactness: times are integer MINUTE offsets from the anchored
    window start (µs device DIV 6·10⁷); with n events sorted, the
    scaled statistic D·n·T = max_i max(i·T − n·t_i, n·t_i −
    (i−1)·T) is an exact BIGINT (window row_number + order-free
    max); the α=0.05 verdict D ≥ 1.36/√n cross-multiplies to the
    all-BIGINT line 10⁴·D_int² ≥ 18496·n·T²; the reported d is ONE
    division.  Overlay: user −1 bunches 50 events into the first 50
    minutes ('reject' guaranteed), user −2 spreads 48 events on an
    exact even lattice ('uniform' guaranteed).

    Scale shape: one window pass partitioned by user + one groupBy
    — the mann_whitney shuffle contract; T arrives via a broadcast
    1-row cross join."""
    from pyspark.sql.window import Window

    raw = _load_wide(spark, sf_dir, "events")
    anchor = raw.agg(F.min("ts")).collect()[0][0]
    anchor_hour = anchor.replace(minute=0, second=0, microsecond=0)
    a_lit = anchor_hour.strftime("%Y-%m-%d %H:%M:%S.%f")
    m = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '{a_lit}', ts)"
        " DIV 60000000"
    )
    real = raw.select("user_id", m.alias("t"))
    tmax = real.groupBy().agg((F.max("t") + 1).alias("tt"))
    ovl1 = spark.range(1, KS_OVL_N + 1).select(
        F.lit(-1).cast("long").alias("user_id"), F.col("id").alias("t")
    )
    lattice = F.expr(f"(id * 2 - 1) * (tt DIV {2 * 48})")
    ovl2 = (
        spark.range(1, 49)
        .crossJoin(F.broadcast(tmax))
        .select(
            F.lit(-2).cast("long").alias("user_id"), lattice.alias("t")
        )
    )
    base = real.unionByName(ovl1).unionByName(ovl2)
    w = Window.partitionBy("user_id").orderBy("t", "user_id")
    ranked = (
        base.crossJoin(F.broadcast(tmax))
        .withColumn("i", F.row_number().over(w).cast("long"))
        .withColumn(
            "n", F.count(F.lit(1)).over(Window.partitionBy("user_id"))
        )
    )
    dplus = F.col("i") * F.col("tt") - F.col("n") * F.col("t")
    dminus = F.col("n") * F.col("t") - (F.col("i") - 1) * F.col("tt")
    agg = ranked.groupBy("user_id").agg(
        F.max("n").alias("n"),
        F.max("tt").alias("t_span"),
        F.max(F.greatest(dplus, dminus)).alias("d_int"),
    )
    sig = (
        F.lit(KS_CRIT2_DEN) * F.col("d_int") * F.col("d_int")
        >= F.lit(KS_CRIT2_NUM)
        * F.col("n")
        * F.col("t_span")
        * F.col("t_span")
    )
    return agg.select(
        "user_id",
        "n",
        "t_span",
        "d_int",
        (
            F.col("d_int").cast("double")
            / (F.col("n") * F.col("t_span")).cast("double")
        ).alias("d"),
        F.when(sig, F.lit("reject")).otherwise(F.lit("uniform")).alias(
            "verdict"
        ),
    )


APPORTION_K = 97  # sample slots to allocate across sources


def q_seat_apportionment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamilton (largest-remainder) apportionment of a fixed sample
    budget across sources: each source gets floor(K·n_s/N) slots,
    and the K − Σfloor leftover slots go to the largest remainders
    — the exact proportional-allocation primitive behind stratified
    sampling quotas, shard budgeting, and survey design, with the
    QUOTA GUARANTEE (every allocation within one of its exact
    proportional share) that naive rounding violates.

    Exactness: floor quota = (K·n_s) DIV N and remainder = (K·n_s)
    mod N are pure integer arithmetic; the leftover count is K −
    Σfloor; winners are the top-remainder sources (ties broken by
    source name ascending — a total order); no floats anywhere.

    Scale shape: one groupBy(source), one O(sources) window rank —
    the report is strata-sized; the corpus is touched once."""
    from pyspark.sql.window import Window

    d = _load_wide(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    tot = counts.groupBy().agg(F.sum("n_docs").alias("nn"))
    q = counts.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        F.expr(f"({APPORTION_K} * n_docs) DIV nn").alias("floor_q"),
        F.expr(f"({APPORTION_K} * n_docs) % nn").alias("rem_num"),
    )
    wext = Window.orderBy(F.desc("rem_num"), F.asc("source"))
    wall = Window.partitionBy()
    ranked = q.withColumn("rk", F.row_number().over(wext)).withColumn(
        "extra", F.lit(APPORTION_K) - F.sum("floor_q").over(wall)
    )
    return ranked.select(
        "source",
        "n_docs",
        "floor_q",
        "rem_num",
        (
            F.col("floor_q")
            + (F.col("rk") <= F.col("extra")).cast("long")
        ).alias("seats"),
    )


def q_lsh_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall/precision audit of the MinHash-LSH banding against
    EXACT all-pairs Jaccard ground truth — the tuning meta-eval that
    answers 'how many bands do I need at my threshold?' before a
    100 TB dedup run; per band-budget nb = 1..4 it reports how many
    true ≥0.5-Jaccard pairs the first nb bands recover.

    Exactness: doc hash-sets, permutations, and band signatures are
    VERBATIM the q_ngram_jaccard constructions (same constants — the
    audit audits the production path, not a replica); ground truth
    uses the exact integer line 3·|A∩B| ≥ |A|+|B| (j ≥ 0.5 cross-
    multiplied — note the production row's display rounding can
    admit j = 0.49996; the audit uses the exact line and says so);
    tp/cand counts are integers, recall/precision one division each.

    Scale shape: the CANDIDATE leg is the production LSH shape (band
    equi-join); the TRUTH leg is O(N²) BY DESIGN — an audit runs on
    a sample at scale (documented), exactly like the IVF recall
    curve; here N = corpus and the quadratic side stays oracle-
    sized.  Law: recall and candidate count are monotone
    non-decreasing in nb."""
    d = _load_wide(spark, sf_dir, "documents")
    base = (
        d.select(
            "doc_id",
            F.expr(
                f"array_distinct(transform({WORD_TRIGRAMS},"
                f" s -> cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint)"
                f" % {MINHASH_P}))"
            ).alias("hs"),
        )
        .withColumn("n_shingles", F.size("hs").cast("long"))
        .localCheckpoint()
    )
    a, b = base.alias("a"), base.alias("b")
    inter = F.size(F.array_intersect(F.col("a.hs"), F.col("b.hs"))).cast(
        "long"
    )
    truth = (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            inter.alias("i"),
            F.col("a.n_shingles").alias("na"),
            F.col("b.n_shingles").alias("nb_"),
        )
        .filter((F.col("i") >= 1) & (3 * F.col("i") >= F.col("na") + F.col("nb_")))
        .select("id_a", "id_b")
        .localCheckpoint()
    )

    def minh(perm: int):
        aa, cc = MINHASH_A[perm], MINHASH_C[perm]
        return F.array_min(
            F.transform(
                "hs", lambda h: (h * F.lit(aa) + F.lit(cc)) % F.lit(MINHASH_P)
            )
        )

    band_structs = F.array(
        *[
            F.struct(
                F.lit(bb).alias("band"),
                minh(2 * bb).alias("m0"),
                minh(2 * bb + 1).alias("m1"),
            )
            for bb in range(4)
        ]
    )
    sigx = base.select("doc_id", F.explode(band_structs).alias("s")).select(
        "doc_id", "s.band", "s.m0", "s.m1"
    )
    cand = (
        sigx.alias("x")
        .join(sigx.alias("y"), ["band", "m0", "m1"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .groupBy(
            F.col("x.doc_id").alias("id_a"),
            F.col("y.doc_id").alias("id_b"),
        )
        .agg(F.min("band").alias("min_band"))
        .localCheckpoint()
    )
    nbs = spark.range(1, 5).select(F.col("id").cast("long").alias("nb"))
    cand_nb = nbs.join(
        cand, cand["min_band"] < nbs["nb"]
    ).select("nb", "id_a", "id_b")
    tp_nb = cand_nb.join(truth, ["id_a", "id_b"]).groupBy("nb").agg(
        F.count(F.lit(1)).cast("long").alias("tp")
    )
    n_cand = cand_nb.groupBy("nb").agg(
        F.count(F.lit(1)).cast("long").alias("n_cand")
    )
    n_truth = truth.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_truth")
    )
    return (
        nbs.join(n_cand, "nb", "left")
        .join(tp_nb, "nb", "left")
        .crossJoin(F.broadcast(n_truth))
        .select(
            "nb",
            F.coalesce("n_cand", F.lit(0)).alias("n_cand"),
            "n_truth",
            F.coalesce("tp", F.lit(0)).alias("tp"),
            (
                F.coalesce("tp", F.lit(0)).cast("double")
                / F.col("n_truth").cast("double")
            ).alias("recall"),
            (
                F.coalesce("tp", F.lit(0)).cast("double")
                / F.greatest(F.coalesce("n_cand", F.lit(0)), F.lit(1)).cast(
                    "double"
                )
            ).alias("precision"),
        )
    )


TRIM_PCT_DEN = 10  # trim n DIV 10 rows from EACH tail
TRIM_OVL_BASE = 200
TRIM_OVL_SPIKES = 5


def q_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10%-trimmed mean of event value per type — the robust
    location estimate between the mean (zero breakdown) and the
    median (throws away efficiency): drop the n DIV 10 smallest and
    largest observations, average the rest.  The per-group
    order-statistics primitive behind outlier-hardened KPIs.

    Exactness: values quantize to integer cents; trimming is pure
    rank arithmetic (row_number per type; rank ties among equal
    values permute freely but the KEPT MULTISET is invariant, so
    the sum is deterministic); sum/count are exact BIGINTs and each
    mean is ONE division.  Overlay: 'spike_a' and 'spike_b' carry
    the SAME 200-point base plus 5 zero and 5 huge outliers
    differing ONLY in magnitude (10⁸ vs 10⁹ cents) — their trimmed
    means are EXACTLY equal (the outliers all fall in the trimmed
    tails) while their plain means differ by ~10×: the breakdown
    contrast as a zero-tolerance law.

    Scale shape: one window pass + one groupBy, both partitioned by
    the type key — the mann_whitney shuffle contract."""
    from pyspark.sql.window import Window

    e = _load_wide(spark, sf_dir, "events")
    real = e.select(
        F.col("event_type").alias("etype"),
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    rng = spark.range(TRIM_OVL_BASE + 2 * TRIM_OVL_SPIKES)
    base_c = (
        F.when(F.col("id") < TRIM_OVL_BASE, 1000 + (F.col("id") + 1) * 7)
        .when(F.col("id") < TRIM_OVL_BASE + TRIM_OVL_SPIKES, F.lit(0))
        .otherwise(F.lit(None))
    )
    ovl = rng.select(
        F.explode(F.array(F.lit("spike_a"), F.lit("spike_b"))).alias(
            "etype"
        ),
        F.col("id"),
    ).select(
        "etype",
        F.coalesce(
            base_c,
            F.when(F.col("etype") == "spike_a", F.lit(100_000_000))
            .otherwise(F.lit(1_000_000_000)),
        ).cast("long").alias("c"),
    )
    allv = real.unionByName(ovl)
    wr = Window.partitionBy("etype").orderBy("c")
    wall = Window.partitionBy("etype")
    ranked = allv.withColumn("rk", F.row_number().over(wr).cast("long")
    ).withColumn("n", F.count(F.lit(1)).over(wall).cast("long"))
    k = F.expr(f"n DIV {TRIM_PCT_DEN}")
    kept = (F.col("rk") > k) & (F.col("rk") <= F.col("n") - k)
    agg = ranked.groupBy("etype").agg(
        F.max("n").alias("n"),
        F.max(k).alias("k_trim"),
        F.sum("c").alias("sum_all"),
        F.sum(F.when(kept, F.col("c")).otherwise(0)).alias("sum_kept"),
        F.sum(kept.cast("long")).alias("n_kept"),
    )
    return agg.select(
        "etype",
        "n",
        "k_trim",
        "sum_all",
        "sum_kept",
        "n_kept",
        (F.col("sum_all").cast("double") / F.col("n").cast("double")).alias(
            "mean_cents"
        ),
        (
            F.col("sum_kept").cast("double") / F.col("n_kept").cast("double")
        ).alias("trimmed_mean_cents"),
    )


def q_hll_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch SET ALGEBRA: estimate the overlap of active user-days
    between every pair of event types by HLL inclusion-exclusion —
    |A∩B| ≈ est(A) + est(B) − est(A∪B), where est(A∪B) comes from
    REGISTER-LEVEL max-merge of the two per-type sketches (the
    mergeability property that makes sketches composable without
    re-reading data: the union sketch of the streams IS the
    elementwise max of their registers).  The audience-overlap /
    segment-intersection primitive a single-set sketch
    (q_hll_distinct) cannot answer.

    Exactness: the register pipeline is q_hll_distinct's verbatim
    (md5 idx + first-set-bit rho via length(bin(x & -x)), register
    max, exact BIGINT 2^(53−r) fold with empty registers at 2^53);
    registers are DENSIFIED to all 64 indices (r = 0 ≡ empty) so
    the pair merge is a plain equi-join + greatest; the only floats
    are the three estimate divisions (4-dp rounded, identical CASE
    in both engines).  n_exact (the verification column) would be
    dropped at scale — it is what the sketch exists to avoid.

    Scale shape: one corpus pass builds 64 registers per type; the
    pair algebra runs on (types² × 64) rows — sketch-sized, never
    corpus-sized; the exact leg is one distinct + one item
    self-join (audit-only at scale)."""
    e = _load_wide(spark, sf_dir, "events")
    items = e.select(
        F.col("event_type").alias("etype"),
        F.concat_ws(
            "@",
            F.col("user_id").cast("string"),
            F.date_format("ts", "yyyy-MM-dd"),
        ).alias("item"),
    )
    hashed = items.select(
        "etype",
        F.expr(
            "cast(conv(substring(md5(item), 1, 4), 16, 10) as bigint) % 64"
        ).alias("idx"),
        F.expr(
            "cast(conv(substring(md5(item), 5, 13), 16, 10) as bigint)"
        ).alias("x"),
    ).select(
        "etype",
        "idx",
        F.expr(
            "CASE WHEN x = 0 THEN 53 ELSE length(bin(x & -x)) END"
        ).alias("rho"),
    )
    regs = hashed.groupBy("etype", "idx").agg(F.max("rho").alias("r"))
    types = items.select("etype").distinct()
    dense = (
        types.select(
            "etype", F.explode(F.expr("sequence(0, 63)")).alias("idx")
        )
        .join(regs, ["etype", "idx"], "left")
        .select("etype", "idx", F.coalesce("r", F.lit(0)).alias("r"))
        .localCheckpoint()
    )

    def fold(df, key_cols):
        return df.groupBy(*key_cols).agg(
            F.expr(
                "cast(sum(cast(shiftleft(1L, 53 - r) as bigint)) as bigint)"
            ).alias("s_scaled"),
            F.sum((F.col("r") == 0).cast("long")).alias("v_zero"),
        )

    est_raw = f"({HLL_ALPHA_M2_SCALED} / cast(s_scaled as double))"
    est = (
        f"round(CASE WHEN {est_raw} <= 160.0 AND v_zero > 0"
        f" THEN 64.0 * ln(64.0 / v_zero) ELSE {est_raw} END, 4)"
    )
    per_type = fold(dense, ["etype"]).select(
        "etype", F.expr(est).alias("est_t")
    )
    ta = types.select(F.col("etype").alias("type_a"))
    tb = types.select(F.col("etype").alias("type_b"))
    pairs = ta.join(tb, F.col("type_a") < F.col("type_b"))
    merged = (
        pairs.join(
            dense.select(
                F.col("etype").alias("type_a"),
                "idx",
                F.col("r").alias("ra"),
            ),
            "type_a",
        )
        .join(
            dense.select(
                F.col("etype").alias("type_b"),
                F.col("idx").alias("idx_b"),
                F.col("r").alias("rb"),
            ),
            "type_b",
        )
        .filter(F.col("idx") == F.col("idx_b"))
        .select(
            "type_a", "type_b", F.greatest("ra", "rb").alias("r")
        )
    )
    est_union = fold(merged, ["type_a", "type_b"]).select(
        "type_a", "type_b", F.expr(est).alias("est_union")
    )
    di = items.distinct()
    exact = (
        di.alias("x")
        .join(di.alias("y"), F.col("x.item") == F.col("y.item"))
        .filter(F.col("x.etype") < F.col("y.etype"))
        .groupBy(
            F.col("x.etype").alias("type_a"),
            F.col("y.etype").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
    )
    return (
        est_union.join(
            per_type.select(
                F.col("etype").alias("type_a"), F.col("est_t").alias("est_a")
            ),
            "type_a",
        )
        .join(
            per_type.select(
                F.col("etype").alias("type_b"), F.col("est_t").alias("est_b")
            ),
            "type_b",
        )
        .join(exact, ["type_a", "type_b"], "left")
        .select(
            "type_a",
            "type_b",
            "est_a",
            "est_b",
            "est_union",
            F.round(
                F.col("est_a") + F.col("est_b") - F.col("est_union"), 4
            ).alias("est_intersect"),
            F.coalesce("n_exact", F.lit(0)).alias("n_exact"),
        )
    )


def q_textrank_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank extractive scoring (Mihalcea & Tarau 2004) with
    exact integer power iterations: per document, sentences (the
    q_sentence_split segmentation — same injected terminators) form
    a graph weighted by shared-distinct-token counts; two
    UNNORMALIZED power iterations score centrality — s¹ = weighted
    degree, s² = Σ w(u,v)·s¹(u) — and the top sentence is the
    extractive summary pick.  Normalization is deferred exactly as
    in hits_scores (rankings are scale-invariant), so every score
    is an exact BIGINT and the cross-engine gate never floats.

    Scale shape: everything is per-document — sentence pairs are a
    doc-partitioned self-join over ~5 sentences/doc (O(s²) per key,
    zero cross-key traffic); two join+groupBy half-iterations on
    the same partitioning; the argmax rides min(struct(−s², idx)).
    Output: every sentence with (s1, s2, is_top) — the full scored
    table, not just the pick, so downstream compression ratios are
    choosable."""
    from pyspark.sql.window import Window

    sents = q_sentence_split(spark, sf_dir).select(
        "doc_id", "sent_idx", F.col("sentence")
    )
    toks = sents.select(
        "doc_id",
        "sent_idx",
        F.array_distinct(
            F.filter(
                F.split(F.regexp_replace("sentence", "[.!]", ""), " "),
                lambda t: t != "",
            )
        ).alias("tk"),
    ).localCheckpoint()
    a, b = toks.alias("a"), toks.alias("b")
    w_uv = F.size(F.array_intersect(F.col("a.tk"), F.col("b.tk"))).cast(
        "long"
    )
    edges = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.sent_idx") != F.col("b.sent_idx")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id"),
            F.col("a.sent_idx").alias("u"),
            F.col("b.sent_idx").alias("v"),
            w_uv.alias("w"),
        )
        .filter(F.col("w") > 0)
        .localCheckpoint()
    )
    s1 = edges.groupBy("doc_id", F.col("v").alias("sent_idx")).agg(
        F.sum("w").alias("s1")
    )
    s2 = (
        edges.join(
            s1.select(
                "doc_id", F.col("sent_idx").alias("u"), F.col("s1").alias("su")
            ),
            ["doc_id", "u"],
        )
        .groupBy("doc_id", F.col("v").alias("sent_idx"))
        .agg(F.sum(F.col("w") * F.col("su")).alias("s2"))
    )
    scored = (
        sents.join(s1, ["doc_id", "sent_idx"], "left")
        .join(s2, ["doc_id", "sent_idx"], "left")
        .select(
            "doc_id",
            "sent_idx",
            "sentence",
            F.coalesce("s1", F.lit(0)).alias("s1"),
            F.coalesce("s2", F.lit(0)).alias("s2"),
        )
    )
    wtop = Window.partitionBy("doc_id")
    mstruct = F.struct(
        (-F.col("s2")).alias("neg"), F.col("sent_idx").alias("si")
    )
    return scored.withColumn(
        "is_top", (mstruct == F.min(mstruct).over(wtop)).cast("long")
    )


def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary) — the
    classic customer-base stratification: per user, days since last
    event, event count, and total spend in cents, each scored into
    quintiles (5 = best) and mapped to a named segment.  The
    ntile-over-total-order device is the point: quintile membership
    is deterministic because every ORDER BY carries user_id as the
    final tiebreak, and NTILE's fill rule (first n mod 5 buckets
    get the extra row) is identical in Spark and DuckDB.

    Exactness: recency is integer days on the anchored grid (µs
    device DIV 86400·10⁶); frequency and cents sums are exact; the
    scores are pure rank arithmetic; the segment is one CASE chain
    evaluated in fixed order.  Laws: per-dimension quintile sizes
    balanced within one, replayed bucket-for-bucket.

    Scale shape: one per-user aggregation + three ntile windows over
    the user table (users ≪ events) + a projection; the corpus is
    touched once."""
    from pyspark.sql.window import Window

    raw = _load_wide(spark, sf_dir, "events")
    anchor = raw.agg(F.min("ts")).collect()[0][0]
    anchor_hour = anchor.replace(minute=0, second=0, microsecond=0)
    a_lit = anchor_hour.strftime("%Y-%m-%d %H:%M:%S.%f")
    day = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '{a_lit}', ts)"
        " DIV 86400000000"
    )
    per_user = raw.select(
        "user_id",
        day.alias("d"),
        F.round(F.col("value") * 100).cast("long").alias("c"),
    ).groupBy("user_id").agg(
        F.max("d").alias("last_day"),
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.sum("c").alias("monetary_c"),
    )
    maxd = per_user.groupBy().agg(F.max("last_day").alias("md"))
    base = per_user.crossJoin(F.broadcast(maxd)).select(
        "user_id",
        (F.col("md") - F.col("last_day")).alias("recency_d"),
        "freq",
        "monetary_c",
    )
    r_sc = F.ntile(5).over(
        Window.orderBy(F.desc("recency_d"), F.asc("user_id"))
    )
    f_sc = F.ntile(5).over(Window.orderBy(F.asc("freq"), F.asc("user_id")))
    m_sc = F.ntile(5).over(
        Window.orderBy(F.asc("monetary_c"), F.asc("user_id"))
    )
    scored = base.select(
        "user_id",
        "recency_d",
        "freq",
        "monetary_c",
        r_sc.cast("long").alias("r"),
        f_sc.cast("long").alias("f"),
        m_sc.cast("long").alias("m"),
    )
    seg = (
        F.when(
            (F.col("r") >= 4) & (F.col("f") >= 4) & (F.col("m") >= 4),
            "champion",
        )
        .when(F.col("f") >= 4, "loyal")
        .when(F.col("m") >= 4, "big_spender")
        .when((F.col("r") <= 2) & (F.col("f") >= 3), "at_risk")
        .when(F.col("r") <= 2, "hibernating")
        .otherwise("regular")
    )
    return scored.withColumn("segment", seg)


GEOHASH_ALPHA = "0123456789bcdefghjkmnpqrstuvwxyz"
GEOHASH_BITS = 15  # per-lane quantization -> 30-bit cell, 6 chars


def _geohash_z_sql(shl, div) -> str:
    """30-bit geohash cell key: quantize each lane to 15 bits
    ((v << 15) div extent) and Morton-interleave with longitude (x)
    on the high alternating bits (the standard geohash layout) —
    shared-emitter modulo the engines' shift/div spellings.  Emit
    this ONCE into a column: inlining it per base32 char blows the
    generated-code size past Spark's codegen limit (observed
    InternalCompilerException fallback) for zero gain."""
    gx = div(shl("x", GEOHASH_BITS), SPATIAL_PX)
    gy = div(shl("y", GEOHASH_BITS), SPATIAL_PY)
    return _morton_expr(gy, gx, shl)  # odd bits = x (lon-first MSB)


def _geohash_chars_sql(zcol: str, shr) -> str:
    """6 base32 chars from a 30-bit z COLUMN — tiny per-char exprs,
    codegen-friendly."""
    chars = [
        f"substr('{GEOHASH_ALPHA}',"
        f" (({shr(zcol, 25 - 5 * k)}) & 31) + 1, 1)"
        for k in range(6)
    ]
    return "(" + " || ".join(chars) + ")"


def q_geohash_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash encoding of the 2-D event point cloud — the base32
    PREFIX-keyed cell scheme (Niemeyer 2008) whose defining property
    zorder_layout's integer keys don't give you: truncating the
    STRING is coarsening the cell, so same-prefix grouping, prefix
    range scans, and proximity joins all ride plain string ops.
    Emits each point's 6-char geohash and its 4-char coarse cell,
    plus the coarse-cell occupancy (the shard-key histogram a geo
    partitioner needs).

    Exactness: lanes quantize by pure integer shift-division; the
    interleave is the _morton_expr magic-mask device; base32 chars
    are substr lookups — no floats anywhere.  Locality law (pinned
    in pytest): equal 4-char prefixes bound |Δx| by the 10-bit lane
    cell width (~98 units), and truncation coarsens monotonically
    (gh4 is a prefix of gh6 by construction).

    Scale shape: pure projection over the scan + ONE groupBy on the
    coarse cell for occupancy — the partitioner histogram; no other
    shuffle."""
    from pyspark.sql.window import Window

    e = _load_wide(spark, sf_dir, "events")
    shl = lambda ex, n: f"shiftleft({ex}, {n})"  # noqa: E731
    shr = lambda ex, n: f"shiftright({ex}, {n})"  # noqa: E731
    div = lambda ex, n: f"(({ex}) DIV {n})"  # noqa: E731
    # the base32 chars ride ONE transform() lambda so `z` appears
    # exactly once even after Catalyst's projection collapse
    # re-inlines it (a 6-way inline of the Morton algebra was
    # observed to blow whole-stage codegen into interpreted fallback)
    gh6 = (
        f"array_join(transform(sequence(0, 5), k -> substr("
        f"'{GEOHASH_ALPHA}', (shiftright(z, 25 - 5 * k) & 31) + 1, 1"
        f")), '')"
    )
    pts = (
        e.select(
            F.col("event_id").alias("pid"),
            F.expr(SPATIAL_X_SQL).cast("long").alias("x"),
            F.expr(SPATIAL_Y_SQL).cast("long").alias("y"),
        )
        .withColumn("z", F.expr(_geohash_z_sql(shl, div)))
        .select("pid", "x", "y", F.expr(gh6).alias("gh6"))
    )
    cells = pts.withColumn("gh4", F.expr("substr(gh6, 1, 4)"))
    occ = cells.groupBy("gh4").agg(
        F.count(F.lit(1)).cast("long").alias("cell_n")
    )
    return cells.join(occ, "gh4").select(
        "pid", "x", "y", "gh6", "gh4", "cell_n"
    )


def q_stock_clamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-negative running balance per user (wallet/stock semantics:
    credits add, debits subtract, the balance CLAMPS at zero — a
    failed debit burns only the available funds).  The recurrence
    s_t = max(0, s_{t−1} + d_t) is nonlinear and not directly
    window-expressible; the engine uses its Skorokhod-reflection
    CLOSED FORM s_t = P_t − least(0, min_{j≤t} P_j) (P = prefix
    sum), which IS two plain windows — the fifo_match trick of
    linearizing a sequential recurrence.  The naive guess
    max(0, P_t) is WRONG (it forgets money burned at earlier
    clamps); the law test exhibits rows where they differ.

    Exactness: daily deltas are exact cents (purchases credit 4×,
    everything else debits — weights chosen so the walk straddles
    zero and the clamp genuinely binds); prefix sums, running mins,
    and balances are all BIGINT.  The oracle is the genuinely
    different formulation: a recursive-CTE day-by-day walk applying
    the literal max(0, ·) recurrence.

    Scale shape: one (user, day) aggregation + two windows on the
    same user partitioning; zero cross-key traffic."""
    from pyspark.sql.window import Window

    raw = _load_wide(spark, sf_dir, "events")
    anchor = raw.agg(F.min("ts")).collect()[0][0]
    anchor_hour = anchor.replace(minute=0, second=0, microsecond=0)
    a_lit = anchor_hour.strftime("%Y-%m-%d %H:%M:%S.%f")
    day = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '{a_lit}', ts)"
        " DIV 86400000000"
    )
    c = F.round(F.col("value") * 100).cast("long")
    delta = F.when(F.col("event_type") == "purchase", 4 * c).otherwise(-c)
    daily = raw.select(
        "user_id", day.alias("d"), delta.alias("dc")
    ).groupBy("user_id", "d").agg(F.sum("dc").alias("delta_c"))
    wp = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pre = daily.withColumn("prefix_c", F.sum("delta_c").over(wp))
    run = pre.withColumn("runmin", F.min("prefix_c").over(wp))
    return run.select(
        "user_id",
        "d",
        "delta_c",
        "prefix_c",
        (
            F.col("prefix_c") - F.least(F.lit(0), F.col("runmin"))
        ).alias("balance_c"),
    )


CONC_DUR_BASE = 60  # activity window seconds = 60 + event_id % 600
CONC_DUR_MOD = 600


def q_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency per event type: each event opens a
    half-open activity window [t, t + 60 + id mod 600); report the
    MAXIMUM number of simultaneously open windows and the earliest
    microsecond it is reached — the capacity-planning number
    (max simultaneous sessions/connections) that interval_coverage
    (union LENGTH) deliberately does not give.

    Spark side: the classic sweep — boundary rows (+1 at start, −1
    at end), running sum ordered by (time, delta, event_id) so ends
    close BEFORE starts open at the same instant (half-open
    semantics) and the order is total; peak + argmax ride ONE
    struct-min of (−run, t).  Oracle: the genuinely different
    formulation — for every window START, count the windows
    containing it (the max of a right-continuous step function is
    attained at a start), then take the max with the same tiebreak.

    Exactness: times are exact integer µs offsets (anchor device);
    counts are integers; no floats at all.
    Scale shape: one window pass partitioned by type; boundary rows
    are 2× events; the oracle's O(n²) per-start counting stays
    audit-side."""
    from pyspark.sql.window import Window

    raw = _load_wide(spark, sf_dir, "events")
    anchor = raw.agg(F.min("ts")).collect()[0][0]
    anchor_hour = anchor.replace(minute=0, second=0, microsecond=0)
    a_lit = anchor_hour.strftime("%Y-%m-%d %H:%M:%S.%f")
    us = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '{a_lit}', ts)"
    )
    dur_us = (
        (F.lit(CONC_DUR_BASE) + F.col("event_id") % CONC_DUR_MOD)
        * 1_000_000
    )
    base = raw.select(
        F.col("event_type").alias("etype"),
        "event_id",
        us.alias("s"),
        (us + dur_us).alias("e"),
    )
    starts = base.select(
        "etype", F.col("s").alias("t"), F.lit(1).alias("delta"), "event_id"
    )
    ends = base.select(
        "etype", F.col("e").alias("t"), F.lit(-1).alias("delta"), "event_id"
    )
    bounds = starts.unionByName(ends)
    wrun = (
        Window.partitionBy("etype")
        .orderBy("t", "delta", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = bounds.withColumn(
        "run", F.sum("delta").over(wrun).cast("long")
    )
    best = swept.groupBy("etype").agg(
        F.min(F.struct((-F.col("run")).alias("neg"), F.col("t"))).alias(
            "m"
        ),
        F.count(F.lit(1)).cast("long").alias("n_bounds"),
    )
    return best.select(
        "etype",
        (-F.col("m.neg")).alias("peak"),
        F.col("m.t").alias("peak_at_us"),
        "n_bounds",
    )


RANSAC_TOL = 3  # vertical-distance inlier tolerance
RANSAC_PLANT_N = 40  # planted collinear points (y = 2x + 500)
RANSAC_ANCHOR_MOD = 500  # hash points with pid % this == 7 are anchors


def q_robust_line_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic RANSAC line fit over the 2-D point cloud: a
    bounded anchor set proposes candidate lines (every anchor
    pair), each line counts its inliers over ALL points, and the
    max-inlier hypothesis wins — the robust model-fit primitive
    (here: the page-skew/baseline-detection shape from the OCR
    world) that least squares cannot survive when 99% of points are
    background clutter.  Randomness is replaced by a deterministic
    anchor rule (hash pids ≡ 7 mod 500, plus every other planted
    point) — same estimator guarantees, replayable cross-engine.

    Exactness: the inlier test is the cross-multiplied integer line
    |(y−y1)·dx − (x−x1)·dy| ≤ TOL·|dx| (vertical distance, dx ≠ 0
    hypotheses only) — no division, no floats; the winner rides one
    struct-min of (−n_inliers, pid_a, pid_b).  Overlay: 40 planted
    points exactly on y = 2x + 500 — the winning line recovers
    slope 2 as the exact rational dy/dx and captures all 40
    (background contributes ~0.7 expected chance inliers per line,
    so the plant dominates by construction).

    Scale shape: hypotheses × points is an intentional bounded
    blow-up (|anchors|² ≈ 800 lines × N points, one broadcast
    nested-loop join + one groupBy); at production the anchor
    budget is the knob, exactly like RANSAC's iteration count."""
    e = _load_wide(spark, sf_dir, "events")
    cloud = e.select(
        F.col("event_id").alias("pid"),
        F.expr(SPATIAL_X_SQL).cast("long").alias("x"),
        F.expr(SPATIAL_Y_SQL).cast("long").alias("y"),
    )
    plant = spark.range(1, RANSAC_PLANT_N + 1).select(
        (-F.col("id")).cast("long").alias("pid"),
        (F.col("id") * 1000).cast("long").alias("x"),
        (F.col("id") * 2000 + 500).cast("long").alias("y"),
    )
    pts = cloud.unionByName(plant).localCheckpoint()
    anchors = pts.filter(
        ((F.col("pid") >= 0) & (F.col("pid") % RANSAC_ANCHOR_MOD == 7))
        | ((F.col("pid") < 0) & (F.col("pid") % 2 == 0))
    )
    a, b = anchors.alias("a"), anchors.alias("b")
    hyp = (
        a.join(b, F.col("a.pid") < F.col("b.pid"))
        .select(
            F.col("a.pid").alias("pa"),
            F.col("b.pid").alias("pb"),
            F.col("a.x").alias("x1"),
            F.col("a.y").alias("y1"),
            (F.col("b.x") - F.col("a.x")).alias("dx"),
            (F.col("b.y") - F.col("a.y")).alias("dy"),
        )
        .filter(F.col("dx") != 0)
        .localCheckpoint()
    )
    resid = F.abs(
        (F.col("y") - F.col("y1")) * F.col("dx")
        - (F.col("x") - F.col("x1")) * F.col("dy")
    )
    scored = (
        hyp.crossJoin(pts)
        .filter(resid <= RANSAC_TOL * F.abs(F.col("dx")))
        .groupBy("pa", "pb", "x1", "y1", "dx", "dy")
        .agg(F.count(F.lit(1)).cast("long").alias("n_inliers"))
    )
    best = scored.groupBy().agg(
        F.min(
            F.struct(
                (-F.col("n_inliers")).alias("neg"),
                F.col("pa").alias("pa"),
                F.col("pb").alias("pb"),
                F.col("x1").alias("x1"),
                F.col("y1").alias("y1"),
                F.col("dx").alias("dx"),
                F.col("dy").alias("dy"),
            )
        ).alias("m")
    )
    return best.select(
        F.col("m.pa").alias("pid_a"),
        F.col("m.pb").alias("pid_b"),
        (-F.col("m.neg")).alias("n_inliers"),
        F.col("m.dy").alias("slope_num"),
        F.col("m.dx").alias("slope_den"),
        (
            F.col("m.dy").cast("double") / F.col("m.dx").cast("double")
        ).alias("slope"),
        (
            F.col("m.y1")
            - F.expr("CAST(m.x1 * m.dy AS DOUBLE) / CAST(m.dx AS DOUBLE)")
        ).alias("intercept"),
    )


VC_MOD = 8  # clock component range (md5-derived)


def q_vector_clock_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-clock causality audit over document versions — the
    eventually-consistent-store primitive: each doc carries three
    replica versions whose 3-component clocks derive from md5 of
    the content (organically mixing happened-before and concurrent
    pairs) plus one reconciled version planted as the element-wise
    max + 1 (dominating by construction); every version pair is
    classified a_before_b / b_before_a / concurrent, and the
    conflict-resolution MERGE (element-wise max — the CRDT join) is
    emitted per pair.

    Exactness: clocks are integers from md5 nibbles; dominance is
    forall(zip_with(≤)) ∧ (a ≠ b) — pure array algebra, no floats;
    the merged clock is serialized 'x|y|z' for the driver hash.
    Laws (pytest): antisymmetry (never both before-relations),
    merge commutativity/idempotence, the planted version dominates
    all three replicas on every doc, and both organic classes
    occur.

    Scale shape: versions are a 4× projection of the corpus; pair
    classification is a per-doc self-join (6 pairs/doc, zero
    cross-doc traffic)."""
    d = _load_wide(spark, sf_dir, "documents")
    comp = (
        lambda v, j: F.expr(
            f"cast(conv(substring(md5(concat(text, 'v{v}')),"
            f" {1 + 4 * j}, 4), 16, 10) as bigint) % {VC_MOD}"
        )
    )  # noqa: E731
    vers = None
    for v in range(3):
        one = d.select(
            "doc_id",
            F.lit(f"r{v}").alias("ver"),
            F.array(comp(v, 0), comp(v, 1), comp(v, 2)).alias("clock"),
        )
        vers = one if vers is None else vers.unionByName(one)
    merged = (
        vers.groupBy("doc_id")
        .agg(
            F.array(
                *[
                    F.max(F.element_at("clock", j + 1)).alias(f"m{j}")
                    for j in range(3)
                ]
            ).alias("mx")
        )
        .select(
            "doc_id",
            F.lit("merged").alias("ver"),
            F.transform("mx", lambda x: x + 1).alias("clock"),
        )
    )
    allv = vers.unionByName(merged).localCheckpoint()
    a, b = allv.alias("a"), allv.alias("b")
    pairs = a.join(
        b,
        (F.col("a.doc_id") == F.col("b.doc_id"))
        & (F.col("a.ver") < F.col("b.ver")),
    )
    le = lambda x, y: F.forall(  # noqa: E731
        F.zip_with(x, y, lambda p, q: p <= q), lambda t: t
    )
    a_le_b = le(F.col("a.clock"), F.col("b.clock"))
    b_le_a = le(F.col("b.clock"), F.col("a.clock"))
    eq = a_le_b & b_le_a
    rel = (
        F.when(eq, "equal")
        .when(a_le_b, "a_before_b")
        .when(b_le_a, "b_before_a")
        .otherwise("concurrent")
    )
    return pairs.select(
        F.col("a.doc_id").alias("doc_id"),
        F.col("a.ver").alias("ver_a"),
        F.col("b.ver").alias("ver_b"),
        F.array_join(F.col("a.clock"), "|").alias("clock_a"),
        F.array_join(F.col("b.clock"), "|").alias("clock_b"),
        rel.alias("relation"),
        F.array_join(
            F.zip_with(
                F.col("a.clock"),
                F.col("b.clock"),
                lambda x, y: F.greatest(x, y),
            ),
            "|",
        ).alias("merged"),
    )


SC_TREATED = "purchase"
SC_DONORS = ("click", "view")
SC_LIFT = 5  # planted per-hour post-period lift


def q_synthetic_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic control (Abadie et al.): fit the treated series'
    pre-period as a linear combination of two donor series, then
    read the post-period treatment effect as actual − counterfactual
    — the causal estimator for ONE treated unit where diff-in-diff's
    parallel-trends assumption is replaced by a fitted donor weight
    vector.  Runs on the anchored hourly count grid: treated =
    'purchase', donors = 'click' and 'view'.

    Exactness: the 2-donor least squares solves the NORMAL EQUATIONS
    in exact integers via Cramer's rule — det = Σx1²·Σx2² − (Σx1x2)²
    and weight NUMERATORS over that determinant — and the total
    post effect stays rational: effect_num = det·Σy − w1n·Σx1 −
    w2n·Σx2 over effect_den = det; ONE division at the end.  The
    gate carries its own recovery control (the diff_in_diff
    device): a 'planted' treated series built as EXACTLY 2·x1+3·x2
    plus a {5}/hour post lift — Cramer recovers (2,3) exactly (the
    residual is 0, so any det ≠ 0 does), and effect_num ==
    lift·n_post·det with ZERO tolerance.

    Scale shape: one grid pass, one 7-sum pre-period scalar agg,
    one post-period projection+agg — the donor pool size is the
    only knob, and the normal equations stay donor²-sized."""
    raw = _load_wide(spark, sf_dir, "events")
    anchor = raw.agg(F.min("ts")).collect()[0][0]
    anchor_hour = anchor.replace(minute=0, second=0, microsecond=0)
    a_lit = anchor_hour.strftime("%Y-%m-%d %H:%M:%S.%f")
    h = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '{a_lit}', ts)"
        " DIV 3600000000"
    )
    counts = raw.groupBy(
        F.col("event_type").alias("etype"), h.alias("h")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    hmax = counts.groupBy().agg(F.max("h").alias("hmax"))
    hours = hmax.select(
        F.explode(F.expr("sequence(0, hmax)")).alias("h")
    )

    def series(name):
        return hours.join(
            counts.filter(F.col("etype") == name).select("h", "c"),
            "h",
            "left",
        ).select("h", F.coalesce("c", F.lit(0)).alias(name))

    grid = (
        series(SC_TREATED)
        .join(series(SC_DONORS[0]), "h")
        .join(series(SC_DONORS[1]), "h")
        .select(
            "h",
            F.col(SC_DONORS[0]).alias("x1"),
            F.col(SC_DONORS[1]).alias("x2"),
            F.col(SC_TREATED).alias("y_real"),
            (
                2 * F.col(SC_DONORS[0])
                + 3 * F.col(SC_DONORS[1])
                + F.when(
                    F.col("h") >= DID_SPLIT_H, F.lit(SC_LIFT)
                ).otherwise(0)
            ).alias("y_planted"),
        )
        .localCheckpoint()
    )
    out = None
    for metric, ycol in (("real", "y_real"), ("planted", "y_planted")):
        pre = grid.filter(F.col("h") < DID_SPLIT_H).agg(
            F.sum(F.col("x1") * F.col("x1")).alias("a"),
            F.sum(F.col("x1") * F.col("x2")).alias("b"),
            F.sum(F.col("x2") * F.col("x2")).alias("cc"),
            F.sum(F.col("x1") * F.col(ycol)).alias("p"),
            F.sum(F.col("x2") * F.col(ycol)).alias("q"),
        )
        post = grid.filter(F.col("h") >= DID_SPLIT_H).agg(
            F.count(F.lit(1)).cast("long").alias("n_post"),
            F.sum("x1").alias("sx1"),
            F.sum("x2").alias("sx2"),
            F.sum(ycol).alias("sy"),
        )
        det = F.col("a") * F.col("cc") - F.col("b") * F.col("b")
        w1n = F.col("cc") * F.col("p") - F.col("b") * F.col("q")
        w2n = F.col("a") * F.col("q") - F.col("b") * F.col("p")
        row = pre.crossJoin(post).select(
            F.lit(metric).alias("metric"),
            w1n.alias("w1_num"),
            w2n.alias("w2_num"),
            det.alias("det"),
            (
                det * F.col("sy")
                - w1n * F.col("sx1")
                - w2n * F.col("sx2")
            ).alias("effect_num"),
            "n_post",
        )
        out = row if out is None else out.unionByName(row)
    return out.select(
        "metric",
        "w1_num",
        "w2_num",
        "det",
        "effect_num",
        "n_post",
        (F.col("w1_num").cast("double") / F.col("det").cast("double")).alias(
            "w1"
        ),
        (F.col("w2_num").cast("double") / F.col("det").cast("double")).alias(
            "w2"
        ),
        (
            F.col("effect_num").cast("double")
            / (F.col("det") * F.col("n_post")).cast("double")
        ).alias("effect_per_hour"),
    )


MRD_SCALE = 10_000  # rate quantization (1e-4 cents)


def q_mix_rate_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mix/rate decomposition of a KPI movement (the 'why did the
    average move' BI primitive): the average event value shifted
    between the two period halves; per segment (event type) the
    shift splits into a MIX effect (the segment's traffic share
    changed, valued at its old rate) and a RATE effect (the
    segment's own average changed, weighted by its new share) —
    the exact identity Σ_s (mix_s + rate_s) = ΔKPI.

    Exactness: rates quantize ONCE to 10⁻⁴-cent units by integer
    division ((S·10⁴) DIV n — the engine identity is then on
    quantized parts, with the exact-rational identity law checked
    via Fractions in pytest and the quantization slack bounded by
    the segment count); all shares stay as exact integer
    cross-products ((n2_s·n1 − n1_s·n2) over n1·n2).  Int64
    headroom: share cross-products ~10⁷ times 10⁷-scale quantized
    rates stay well under 2⁶³.

    Scale shape: ONE pass — a (segment, period) groupBy with
    map-side combine — then segment-count rows of arithmetic."""
    raw = _load_wide(spark, sf_dir, "events")
    anchor = raw.agg(F.min("ts")).collect()[0][0]
    anchor_hour = anchor.replace(minute=0, second=0, microsecond=0)
    a_lit = anchor_hour.strftime("%Y-%m-%d %H:%M:%S.%f")
    h = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '{a_lit}', ts)"
        " DIV 3600000000"
    )
    base = raw.select(
        F.col("event_type").alias("etype"),
        (h >= DID_SPLIT_H).cast("long").alias("post"),
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    cells = base.groupBy("etype").agg(
        F.sum(1 - F.col("post")).alias("n1_s"),
        F.sum(F.when(F.col("post") == 0, F.col("c")).otherwise(0)).alias(
            "s1_c"
        ),
        F.sum("post").alias("n2_s"),
        F.sum(F.when(F.col("post") == 1, F.col("c")).otherwise(0)).alias(
            "s2_c"
        ),
    )
    tot = cells.groupBy().agg(
        F.sum("n1_s").alias("n1"), F.sum("n2_s").alias("n2")
    )
    j = cells.crossJoin(F.broadcast(tot))
    rate1_q = F.expr(f"(s1_c * {MRD_SCALE}) DIV n1_s")
    rate2_q = F.expr(f"(s2_c * {MRD_SCALE}) DIV n2_s")
    share_x = F.col("n2_s") * F.col("n1") - F.col("n1_s") * F.col("n2")
    mix_q = F.expr(
        f"((n2_s * n1 - n1_s * n2) * ((s1_c * {MRD_SCALE}) DIV n1_s))"
        " DIV (n1 * n2)"
    )
    rate_q = F.expr(
        f"(n2_s * (((s2_c * {MRD_SCALE}) DIV n2_s)"
        f" - ((s1_c * {MRD_SCALE}) DIV n1_s))) DIV n2"
    )
    return j.select(
        "etype",
        "n1_s",
        "s1_c",
        "n2_s",
        "s2_c",
        rate1_q.alias("rate1_q"),
        rate2_q.alias("rate2_q"),
        share_x.alias("share_xnum"),
        mix_q.alias("mix_q"),
        rate_q.alias("rate_q"),
    ).withColumn(
        "contribution_dollars",
        (F.col("mix_q") + F.col("rate_q")).cast("double")
        / F.lit(float(MRD_SCALE * 100)),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_transcribe_spans(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "transcribe_spans": q_transcribe_spans,
        "transcribe_spans_cs": q_transcribe_spans_cs,
        "transcribe_spans_offset": q_transcribe_spans_offset,
        "transcribe_spans_crop": q_transcribe_spans_crop,
        "transcribe_stream": q_transcribe_stream,
        "transcribe_metrics": q_transcribe_metrics,
        "pricing_summary": q_pricing_summary,
        "top_orders": q_top_orders,
        "nation_volume": q_nation_volume,
        "customers_without_orders": q_customers_without_orders,
        "first_orders": q_first_orders,
        "event_hourly": q_event_hourly,
        "event_sessions": q_event_sessions,
        "events_asof": q_events_asof,
        "text_normalize": q_text_normalize,
        "anchor_texts": q_anchor_texts,
        "link_pagerank": q_link_pagerank,
        "hll_distinct": q_hll_distinct,
        "dup_substring": q_dup_substring,
        "char_bigrams": q_char_bigrams,
        "dedup_exact": q_dedup_exact,
        "minhash_bands": q_minhash_bands,
        "ngram_jaccard": q_ngram_jaccard,
        "text_stats": q_text_stats,
        "char_entropy": q_char_entropy,
        "spans_compact": q_spans_compact,
        "contract_audit": q_contract_audit,
        "quality_filter": q_quality_filter,
        "token_counts": q_token_counts,
        "gopher_repetition": q_gopher_repetition,
        "pdf_ingest": q_pdf_ingest,
        "warc_ingest": q_warc_ingest,
        "embed_neighbors": q_embed_neighbors,
        "label_centroid_sim": q_label_centroid_sim,
        "orders_rollup": q_orders_rollup,
        "events_json": q_events_json,
        "token_doc_freq": q_token_doc_freq,
        "simhash": q_simhash,
        "simhash_hamming_join": q_simhash_hamming_join,
        "doc_fingerprint": q_doc_fingerprint,
        "em_font_counts": q_em_font_counts,
        "train_font_step": q_train_font_step,
        "train_font_step_cs": q_train_font_step_cs,
        "lm_perplexity": q_lm_perplexity,
        "embed_topk": q_embed_topk,
        "embed_neardup": q_embed_neardup,
        "embed_lsh_buckets": q_embed_lsh_buckets,
        "embed_ivf_topk": q_embed_ivf_topk,
        "ivf_upsert": q_ivf_upsert,
        "lang_id": q_lang_id,
        "lang_id_ngram": q_lang_id_ngram,
        "html_tables": q_html_tables,
        "robots_filter": q_robots_filter,
        "crawl_upsert": q_crawl_upsert,
        "inverted_index": q_inverted_index,
        "sentence_split": q_sentence_split,
        "bm25_topk": q_bm25_topk,
        "html_main_content": q_html_main_content,
        "html_main_content_dom": q_html_main_content_dom,
        "layout_reading_order": q_layout_reading_order,
        "transcribe_confidence": q_transcribe_confidence,
        "html_main_content_nested": q_html_main_content_nested,
        "html_main_content_nested_dom": q_html_main_content_nested_dom,
        "strip_spans_html": q_strip_spans_html,
        "extract_stream": q_extract_stream,
        "span_dedup": q_span_dedup,
        "pii_redact": q_pii_redact,
        "url_normalize": q_url_normalize,
        "decontaminate": q_decontaminate,
        "training_mix": q_training_mix,
        "embed_quantize": q_embed_quantize,
        "dedup_cluster": q_dedup_cluster,
        "split_by_cluster": q_split_by_cluster,
        "split_contamination": q_split_contamination,
        "c4_line_filter": q_c4_line_filter,
        "pack_sequences": q_pack_sequences,
        "dedup_stream": q_dedup_stream,
        "embed_semdedup": q_embed_semdedup,
        "chunk_documents": q_chunk_documents,
        "tfidf_top_terms": q_tfidf_top_terms,
        "audio_ingest": q_audio_ingest,
        "video_ingest": q_video_ingest,
        "image_ingest": q_image_ingest,
        "image_phash_dedup": q_image_phash_dedup,
        "dsir_weights": q_dsir_weights,
        "ppl_buckets": q_ppl_buckets,
        "bloom_prefilter": q_bloom_prefilter,
        "event_hourly_stream": q_event_hourly_stream,
        "domain_cap": q_domain_cap,
        "corpus_profile": q_corpus_profile,
        "event_sessions_custom": q_event_sessions_custom,
        "crawl_quota_stream": q_crawl_quota_stream,
        "count_min_topk": q_count_min_topk,
        "interval_join": q_interval_join,
        "similarity_join": q_similarity_join,
        "bpe_train": q_bpe_train,
        "bpe_encode": q_bpe_encode,
        "cluster_sample": q_cluster_sample,
        "embed_rproj": q_embed_rproj,
        "skew_join": q_skew_join,
        "shard_assign": q_shard_assign,
        "partial_agg_merge": q_partial_agg_merge,
        "span_lang_id": q_span_lang_id,
        "compaction_plan": q_compaction_plan,
        "crawl_upsert_stream": q_crawl_upsert_stream,
        "link_triangles": q_link_triangles,
        "hll_distinct_stream": q_hll_distinct_stream,
        "vocab_growth": q_vocab_growth,
        "exact_quantile": q_exact_quantile,
        "zorder_layout": q_zorder_layout,
        "funnel_steps": q_funnel_steps,
        "retention_cohorts": q_retention_cohorts,
        "group_quantile": q_group_quantile,
        "scd2_history": q_scd2_history,
        "heavy_hitters": q_heavy_hitters,
        "pmi_collocations": q_pmi_collocations,
        "robust_outliers": q_robust_outliers,
        "weighted_sample": q_weighted_sample,
        "group_topk": q_group_topk,
        "ecdf_normalize": q_ecdf_normalize,
        "pareto_front": q_pareto_front,
        "curate_pipeline": q_curate_pipeline,
        "ngram_novelty": q_ngram_novelty,
        "decayed_counts": q_decayed_counts,
        "quality_logit": q_quality_logit,
        "editdist_verify": q_editdist_verify,
        "snapshot_diff": q_snapshot_diff,
        "attrib_join_stream": q_attrib_join_stream,
        "event_pivot": q_event_pivot,
        "rolling_stats": q_rolling_stats,
        "html_metadata": q_html_metadata,
        "cusum_drift": q_cusum_drift,
        "twap": q_twap,
        "zone_map_prune": q_zone_map_prune,
        "merkle_digest": q_merkle_digest,
        "fill_forward": q_fill_forward,
        "debounce_events": q_debounce_events,
        "event_transitions": q_event_transitions,
        "sales_cube": q_sales_cube,
        "stratified_sample": q_stratified_sample,
        "cooccurrence_graph": q_cooccurrence_graph,
        "survival_km": q_survival_km,
        "debounce_stream": q_debounce_stream,
        "interval_coverage": q_interval_coverage,
        "fd_audit": q_fd_audit,
        "auc_eval": q_auc_eval,
        "ols_trend": q_ols_trend,
        "rrf_fuse": q_rrf_fuse,
        "bottomk_sketch": q_bottomk_sketch,
        "mmr_diversify": q_mmr_diversify,
        "dp_histogram": q_dp_histogram,
        "epoch_shuffle": q_epoch_shuffle,
        "ab_assign_srm": q_ab_assign_srm,
        "linkage_score": q_linkage_score,
        "calibration_bins": q_calibration_bins,
        "degree_powerlaw": q_degree_powerlaw,
        "forget_user": q_forget_user,
        "cdc_apply": q_cdc_apply,
        "encoding_advisor": q_encoding_advisor,
        "psi_drift": q_psi_drift,
        "position_attribution": q_position_attribution,
        "ndcg_eval": q_ndcg_eval,
        "basket_lift": q_basket_lift,
        "cohens_kappa": q_cohens_kappa,
        "golden_record": q_golden_record,
        "k_anonymity": q_k_anonymity,
        "seasonal_anomaly": q_seasonal_anomaly,
        "macro_f1": q_macro_f1,
        "vacuum_plan": q_vacuum_plan,
        "kcore_decompose": q_kcore_decompose,
        "crawl_depth": q_crawl_depth,
        "skew_audit": q_skew_audit,
        "gap_backfill": q_gap_backfill,
        "fk_audit": q_fk_audit,
        "l_diversity": q_l_diversity,
        "pq_quantize": q_pq_quantize,
        "corr_matrix": q_corr_matrix,
        "join_card_est": q_join_card_est,
        "changepoint_detect": q_changepoint_detect,
        "json_schema_infer": q_json_schema_infer,
        "ip_lpm_join": q_ip_lpm_join,
        "slo_burn": q_slo_burn,
        "link_hits": q_link_hits,
        "redirect_resolve": q_redirect_resolve,
        "benford_audit": q_benford_audit,
        "politeness_schedule": q_politeness_schedule,
        "critical_path": q_critical_path,
        "spatial_grid_join": q_spatial_grid_join,
        "phrase_search": q_phrase_search,
        "bitmap_intersect": q_bitmap_intersect,
        "poisson_bootstrap": q_poisson_bootstrap,
        "consistent_ring": q_consistent_ring,
        "hierarchy_rollup": q_hierarchy_rollup,
        "cdf_drift": q_cdf_drift,
        "hysteresis_alerts": q_hysteresis_alerts,
        "fair_share": q_fair_share,
        "threshold_topk": q_threshold_topk,
        "max_drawdown": q_max_drawdown,
        "sprt_decision": q_sprt_decision,
        "chain_ladder": q_chain_ladder,
        "point_in_polygon": q_point_in_polygon,
        "knapsack_plan": q_knapsack_plan,
        "activity_select": q_activity_select,
        "spearman_corr": q_spearman_corr,
        "gini_concentration": q_gini_concentration,
        "top_paths": q_top_paths,
        "fifo_match": q_fifo_match,
        "max_subarray": q_max_subarray,
        "autocorrelation": q_autocorrelation,
        "t_closeness": q_t_closeness,
        "mutual_match": q_mutual_match,
        "ohlc_bars": q_ohlc_bars,
        "feature_hashing": q_feature_hashing,
        "cdc_chunking": q_cdc_chunking,
        "graph_bfs": q_graph_bfs,
        "term_burstiness": q_term_burstiness,
        "zipf_fit": q_zipf_fit,
        "bh_fdr": q_bh_fdr,
        "mann_kendall": q_mann_kendall,
        "mann_whitney": q_mann_whitney,
        "avg_precision": q_avg_precision,
        "adamic_adar": q_adamic_adar,
        "dbscan_cluster": q_dbscan_cluster,
        "motif_discovery": q_motif_discovery,
        "phonetic_blocking": q_phonetic_blocking,
        "rake_keywords": q_rake_keywords,
        "cdx_surt_index": q_cdx_surt_index,
        "theil_sen": q_theil_sen,
        "isotonic_fit": q_isotonic_fit,
        "hits_scores": q_hits_scores,
        "dijkstra_paths": q_dijkstra_paths,
        "path_count_census": q_path_count_census,
        "backtest_smape": q_backtest_smape,
        "prop_ztest": q_prop_ztest,
        "diff_in_diff": q_diff_in_diff,
        "cuped_adjust": q_cuped_adjust,
        "peak_detection": q_peak_detection,
        "ks_uniformity": q_ks_uniformity,
        "seat_apportionment": q_seat_apportionment,
        "lsh_recall_audit": q_lsh_recall_audit,
        "trimmed_mean": q_trimmed_mean,
        "hll_intersect": q_hll_intersect,
        "textrank_sentences": q_textrank_sentences,
        "rfm_segments": q_rfm_segments,
        "geohash_encode": q_geohash_encode,
        "stock_clamp": q_stock_clamp,
        "peak_concurrency": q_peak_concurrency,
        "robust_line_fit": q_robust_line_fit,
        "vector_clock_audit": q_vector_clock_audit,
        "synthetic_control": q_synthetic_control,
        "mix_rate_decomposition": q_mix_rate_decomposition,
    }


# queries whose oracle is DERIVED from the sf0.01-pinned frozen
# goldens (so, like the goldens themselves, they are only checkable
# at sf0.01 — tests/test_entry_parity.py routes them to the sf0.01
# golden gate instead of the sf0.001 recomputable gate)
GOLDEN_DERIVED = frozenset({"transcribe_stream", "ppl_buckets"})


def oracle_sql() -> dict[str, str]:
    out = dict(_ORACLE_SQL)
    # frozen VALUES-goldens for the non-SQL-expressible OCR-core
    # queries (deterministic decode outputs at the driver's sf0.01
    # correctness scale; regenerate via tools/freeze_goldens.py)
    try:
        from golden_oracles import GOLDEN_ORACLES

        out.update(GOLDEN_ORACLES)
        # the streaming transcription sink must equal the media rows
        # of the batch golden (same kernel, same fixture) — derive its
        # oracle rather than freezing a duplicate
        out["transcribe_stream"] = (
            'SELECT doc_id, media_ref, "offset", text FROM ('
            + GOLDEN_ORACLES["transcribe_spans"]
            + ") AS g WHERE kind = 'media'"
        )
        # CCNet bucketing over the frozen per-doc perplexities: the
        # same deterministic NTILE ((perplexity, doc_id) total order
        # within lang) the Spark query applies
        out["ppl_buckets"] = (
            "SELECT g.doc_id, d.lang, g.perplexity, "
            "NTILE(3) OVER (PARTITION BY d.lang "
            "ORDER BY g.perplexity ASC, g.doc_id ASC) AS bucket, "
            "(NTILE(3) OVER (PARTITION BY d.lang "
            "ORDER BY g.perplexity ASC, g.doc_id ASC)) = 1 AS keep_head "
            "FROM (" + GOLDEN_ORACLES["lm_perplexity"] + ") g "
            "JOIN documents d ON g.doc_id = d.doc_id"
        )
    except ImportError:
        pass
    return out


_IVF_CENT_CTES = """
            WITH cb0 AS (
                SELECT CAST(vec_id AS INT) AS cent_id,
                       CAST(embedding AS DOUBLE[]) AS cent_vec
                FROM embeddings WHERE vec_id < 16
            ),
            -- 3 unrolled spherical-k-means Lloyd iterations (assign ->
            -- per-dim ORDER-INDEPENDENT mean: exact int64 sum of
            -- floor(val*1e9) -> L2-normalize -> ROUND 6dp), mirroring
            -- _ivf_train_codebook bit-for-bit (no engine-dependent
            -- float summation order anywhere)
            s1 AS (
                SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS emb, c.cent_id,
                       LIST_DOT_PRODUCT(CAST(e.embedding AS DOUBLE[]), c.cent_vec) AS cdot
                FROM embeddings e CROSS JOIN cb0 c
            ),
            a1 AS (
                SELECT vec_id, emb, cent_id AS cluster FROM (
                    SELECT *, ROW_NUMBER() OVER (
                        PARTITION BY vec_id ORDER BY cdot DESC, cent_id ASC) AS rn
                    FROM s1
                ) WHERE rn = 1
            ),
            m1 AS (
                SELECT cluster, pos,
                       CAST(SUM(CAST(FLOOR(val * 1000000000.0) AS BIGINT)) AS DOUBLE)
                           / (COUNT(*) * 1000000000.0) AS m FROM (
                    SELECT cluster, UNNEST(emb) AS val,
                           UNNEST(GENERATE_SERIES(1, LEN(emb))) AS pos
                    FROM a1
                ) GROUP BY 1, 2
            ),
            r1 AS (
                SELECT cluster AS cent_id, LIST(m ORDER BY pos) AS raw FROM m1 GROUP BY 1
            ),
            cb1 AS (
                SELECT cent_id,
                       LIST_TRANSFORM(raw, x -> ROUND(x / SQRT(LIST_DOT_PRODUCT(raw, raw)), 6)) AS cent_vec
                FROM r1
            ),
            s2 AS (
                SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS emb, c.cent_id,
                       LIST_DOT_PRODUCT(CAST(e.embedding AS DOUBLE[]), c.cent_vec) AS cdot
                FROM embeddings e CROSS JOIN cb1 c
            ),
            a2 AS (
                SELECT vec_id, emb, cent_id AS cluster FROM (
                    SELECT *, ROW_NUMBER() OVER (
                        PARTITION BY vec_id ORDER BY cdot DESC, cent_id ASC) AS rn
                    FROM s2
                ) WHERE rn = 1
            ),
            m2 AS (
                SELECT cluster, pos,
                       CAST(SUM(CAST(FLOOR(val * 1000000000.0) AS BIGINT)) AS DOUBLE)
                           / (COUNT(*) * 1000000000.0) AS m FROM (
                    SELECT cluster, UNNEST(emb) AS val,
                           UNNEST(GENERATE_SERIES(1, LEN(emb))) AS pos
                    FROM a2
                ) GROUP BY 1, 2
            ),
            r2 AS (
                SELECT cluster AS cent_id, LIST(m ORDER BY pos) AS raw FROM m2 GROUP BY 1
            ),
            cb2 AS (
                SELECT cent_id,
                       LIST_TRANSFORM(raw, x -> ROUND(x / SQRT(LIST_DOT_PRODUCT(raw, raw)), 6)) AS cent_vec
                FROM r2
            ),
            s3 AS (
                SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS emb, c.cent_id,
                       LIST_DOT_PRODUCT(CAST(e.embedding AS DOUBLE[]), c.cent_vec) AS cdot
                FROM embeddings e CROSS JOIN cb2 c
            ),
            a3 AS (
                SELECT vec_id, emb, cent_id AS cluster FROM (
                    SELECT *, ROW_NUMBER() OVER (
                        PARTITION BY vec_id ORDER BY cdot DESC, cent_id ASC) AS rn
                    FROM s3
                ) WHERE rn = 1
            ),
            m3 AS (
                SELECT cluster, pos,
                       CAST(SUM(CAST(FLOOR(val * 1000000000.0) AS BIGINT)) AS DOUBLE)
                           / (COUNT(*) * 1000000000.0) AS m FROM (
                    SELECT cluster, UNNEST(emb) AS val,
                           UNNEST(GENERATE_SERIES(1, LEN(emb))) AS pos
                    FROM a3
                ) GROUP BY 1, 2
            ),
            r3 AS (
                SELECT cluster AS cent_id, LIST(m ORDER BY pos) AS raw FROM m3 GROUP BY 1
            ),
            cent AS (
                SELECT cent_id,
                       LIST_TRANSFORM(raw, x -> ROUND(x / SQRT(LIST_DOT_PRODUCT(raw, raw)), 6)) AS cent_vec
                FROM r3
            ),"""


_ORACLE_SQL = {
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 2) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   ROUND(AVG(l_quantity), 4) AS avg_qty,
                   ROUND(AVG(l_discount), 4) AS avg_disc,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "top_orders": """
            SELECT l_orderkey,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON o_orderkey = l_orderkey
            WHERE c_mktsegment = 'BUILDING'
            GROUP BY l_orderkey
            ORDER BY revenue DESC, l_orderkey ASC
            LIMIT 10
        """,
        "nation_volume": """
            SELECT r_name, n_name,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   COUNT(*) AS n_items
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name, n_name
        """,
        "customers_without_orders": """
            SELECT c_custkey, c_name, c_mktsegment
            FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        """,
        "first_orders": """
            SELECT o_custkey, o_orderkey, rn FROM (
                SELECT o_custkey, o_orderkey,
                       ROW_NUMBER() OVER (
                           PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey) AS rn
                FROM orders
            ) WHERE rn <= 2
        """,
        "event_hourly": """
            SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
                   event_type,
                   COUNT(*) AS n_events,
                   ROUND(SUM(value), 4) AS sum_value
            FROM events
            GROUP BY 1, 2
        """,
        "events_asof": """
            SELECT e.event_id,
                   e.user_id,
                   e.event_type,
                   p.event_id AS last_purchase_id,
                   EPOCH_US(e.ts) - EPOCH_US(p.ts) AS us_since_purchase
            FROM events e
            ASOF LEFT JOIN (
                SELECT user_id, ts, event_id
                FROM events
                WHERE event_type = 'purchase'
            ) p
            ON e.user_id = p.user_id AND e.ts >= p.ts
        """,
        "event_sessions": """
            WITH gaps AS (
                SELECT user_id, event_id, ts, value,
                       -- exact integer microsecond arithmetic (// is
                       -- BIGINT floor division) matches Spark
                       -- timestampdiff(SECOND, ..) truncation with no
                       -- double-rounding at the 1800 s boundary
                       CASE WHEN (EPOCH_US(ts) - LAG(EPOCH_US(ts)) OVER (
                                PARTITION BY user_id ORDER BY ts, event_id))
                                // 1000000 > 1800
                            OR LAG(ts) OVER (
                                PARTITION BY user_id ORDER BY ts, event_id)
                                IS NULL
                            THEN 1 ELSE 0 END AS new_session
                FROM events
            ),
            sess AS (
                SELECT user_id, ts, value,
                       SUM(new_session) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_no
                FROM gaps
            ),
            per_session AS (
                SELECT user_id, session_no,
                       COUNT(*) AS n_events,
                       CAST((MAX(EPOCH_US(ts)) - MIN(EPOCH_US(ts))) // 1000000 AS BIGINT) AS duration_sec,
                       ROUND(SUM(value), 4) AS sum_value
                FROM sess GROUP BY user_id, session_no
            )
            SELECT user_id,
                   COUNT(*) AS n_sessions,
                   CAST(MAX(n_events) AS BIGINT) AS max_session_events,
                   MAX(duration_sec) AS max_session_sec,
                   ROUND(CAST(SUM(sum_value) AS DOUBLE), 4) AS total_value
            FROM per_session
            GROUP BY user_id
        """,
        "char_bigrams": """
            WITH pos AS (
                SELECT text,
                       UNNEST(GENERATE_SERIES(1, LENGTH(text) - 1)) AS i
                FROM documents
            )
            SELECT SUBSTRING(text, i, 2) AS bigram, COUNT(*) AS cnt
            FROM pos
            GROUP BY 1
        """,
        "dedup_exact": """
            WITH all_docs AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 10000000 AS doc_id, text
                FROM documents WHERE doc_id % 100 = 7
            )
            SELECT MD5(text) AS text_hash,
                   COUNT(*) AS n_dups,
                   MIN(doc_id) AS first_doc_id
            FROM all_docs
            GROUP BY 1
            HAVING COUNT(*) > 1
        """,
        "minhash_bands": """
            WITH pos AS (
                SELECT doc_id, text,
                       UNNEST(GENERATE_SERIES(1, GREATEST(LENGTH(text) - 4, 1))) AS i
                FROM documents
            ),
            hashed AS (
                SELECT doc_id,
                       CAST(('0x' || SUBSTRING(MD5(SUBSTRING(text, i, 5)), 1, 15))::UBIGINT
                            AS BIGINT) % 2147483647 AS h31
                FROM pos
            ),
            bands AS (SELECT UNNEST(GENERATE_SERIES(0, 3)) AS band),
            minhashes AS (
                SELECT doc_id, band,
                       MIN((h31 * CASE band WHEN 0 THEN 1103515245
                                            WHEN 1 THEN 1583458089
                                            WHEN 2 THEN 784588716
                                            ELSE 999999937 END
                            + CASE band WHEN 0 THEN 12345
                                        WHEN 1 THEN 54321
                                        WHEN 2 THEN 98765
                                        ELSE 24680 END) % 2147483647) AS minhash
                FROM hashed CROSS JOIN bands
                GROUP BY doc_id, band
            )
            SELECT band, minhash, COUNT(*) AS n_docs, MIN(doc_id) AS first_doc_id
            FROM minhashes
            GROUP BY band, minhash
            HAVING COUNT(*) > 1
        """,
        "ngram_jaccard": """
            -- mirrors the single-pass Spark shape: per-doc distinct
            -- shingle-HASH sets (60-bit md5 prefix mod 2^31-1), band
            -- signatures as list_min projections, |A∩B| via
            -- list_intersect on the hash sets
            WITH base AS (
                SELECT doc_id,
                       LIST_DISTINCT(LIST_TRANSFORM(
                           LIST_TRANSFORM(
                               GENERATE_SERIES(1, GREATEST(
                                   LEN(STRING_SPLIT(text, ' ')) - 2, 1)),
                               i -> ARRAY_TO_STRING(
                                   STRING_SPLIT(text, ' ')[i:i+2], ' ')),
                           s -> CAST(('0x' || SUBSTRING(MD5(s), 1, 15))::UBIGINT
                                     AS BIGINT) % 2147483647)) AS hs
                FROM documents
            ),
            sized AS (
                SELECT doc_id, hs, CAST(LEN(hs) AS BIGINT) AS n_shingles
                FROM base
            ),
            sigx AS (
                SELECT doc_id, band,
                       LIST_MIN(LIST_TRANSFORM(hs, h ->
                           (h * CASE band WHEN 0 THEN 1103515245
                                          WHEN 1 THEN 784588716
                                          WHEN 2 THEN 1804289383
                                          ELSE 1681692777 END
                              + CASE band WHEN 0 THEN 12345
                                          WHEN 1 THEN 98765
                                          WHEN 2 THEN 424242
                                          ELSE 777777 END) % 2147483647)) AS m0,
                       LIST_MIN(LIST_TRANSFORM(hs, h ->
                           (h * CASE band WHEN 0 THEN 1583458089
                                          WHEN 1 THEN 999999937
                                          WHEN 2 THEN 846930886
                                          ELSE 1714636915 END
                              + CASE band WHEN 0 THEN 54321
                                          WHEN 1 THEN 24680
                                          WHEN 2 THEN 131313
                                          ELSE 909090 END) % 2147483647)) AS m1
                FROM sized
                CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, 3)) AS band)
            ),
            pairs AS (
                SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                FROM sigx a
                JOIN sigx b ON a.band = b.band AND a.m0 = b.m0 AND a.m1 = b.m1
                           AND a.doc_id < b.doc_id
            ),
            cand AS (
                SELECT p.id_a, p.id_b,
                       CAST(LEN(LIST_INTERSECT(za.hs, zb.hs)) AS BIGINT) AS n_shared,
                       za.n_shingles AS n_a, zb.n_shingles AS n_b
                FROM pairs p
                JOIN sized za ON za.doc_id = p.id_a
                JOIN sized zb ON zb.doc_id = p.id_b
            )
            SELECT id_a, id_b, n_shared,
                   ROUND(n_shared * 1.0 / (n_a + n_b - n_shared), 4) AS jaccard
            FROM cand
            WHERE ROUND(n_shared * 1.0 / (n_a + n_b - n_shared), 4) >= 0.5
        """,
        "text_stats": """
            SELECT doc_id,
                   LENGTH(text) AS n_chars_txt,
                   LEN(STRING_SPLIT(text, ' ')) AS n_tokens,
                   ROUND((LENGTH(text) - LEN(STRING_SPLIT(text, ' ')) + 1.0)
                         / LEN(STRING_SPLIT(text, ' ')), 4) AS avg_word_len,
                   ROUND(LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                         t -> t IN ('the', 'a', 'and', 'of', 'to'))) * 1.0
                         / LEN(STRING_SPLIT(text, ' ')), 4) AS stopword_ratio
            FROM documents
        """,
        "contract_audit": """
            WITH agg AS (
                SELECT CAST(COUNT(*) AS BIGINT) AS n,
                       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_key,
                       CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_null,
                       CAST(SUM(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END) AS BIGINT) AS v_cons,
                       CAST(SUM(CASE WHEN length(text) < 100 THEN 1 ELSE 0 END) AS BIGINT) AS v_len,
                       CAST(SUM(CASE WHEN lang NOT IN ('en','de','fr','es','zh') THEN 1 ELSE 0 END) AS BIGINT) AS v_enum,
                       CAST(SUM(CASE WHEN lang NOT IN ('en','de','fr','es') THEN 1 ELSE 0 END) AS BIGINT) AS v_latin,
                       CAST(SUM(CASE WHEN source NOT LIKE 'src%' THEN 1 ELSE 0 END) AS BIGINT) AS v_src
                FROM documents
            ),
            rules AS (
                SELECT 'not_null_text' AS rule, n AS n_checked, v_null AS n_violations FROM agg
                UNION ALL SELECT 'unique_doc_id', n, n - n_key FROM agg
                UNION ALL SELECT 'n_chars_matches_text', n, v_cons FROM agg
                UNION ALL SELECT 'min_text_len_100', n, v_len FROM agg
                UNION ALL SELECT 'lang_in_enum', n, v_enum FROM agg
                UNION ALL SELECT 'lang_latin_script', n, v_latin FROM agg
                UNION ALL SELECT 'source_prefix', n, v_src FROM agg
            )
            SELECT rule, n_checked, n_violations,
                   CASE WHEN n_violations = 0 THEN 'pass' ELSE 'fail' END AS status
            FROM rules
        """,
        "spans_compact": """
            WITH synth AS (
                SELECT doc_id,
                       s.kind AS kind, s.text AS text,
                       s.media_ref AS media_ref, s.off AS off
                FROM documents, UNNEST(
                    CASE CAST(doc_id % 4 AS INTEGER)
                    WHEN 0 THEN [
                        {'kind': 'text', 'text': 'p' || doc_id || '.0', 'media_ref': CAST(NULL AS VARCHAR), 'off': 0},
                        {'kind': 'text', 'text': 'p' || doc_id || '.1', 'media_ref': CAST(NULL AS VARCHAR), 'off': 1},
                        {'kind': 'media', 'text': CAST(NULL AS VARCHAR), 'media_ref': 'm-' || doc_id || '-2', 'off': 2},
                        {'kind': 'text', 'text': 'p' || doc_id || '.3', 'media_ref': CAST(NULL AS VARCHAR), 'off': 3}]
                    WHEN 1 THEN [
                        {'kind': 'media', 'text': CAST(NULL AS VARCHAR), 'media_ref': 'm-' || doc_id || '-0', 'off': 0},
                        {'kind': 'text', 'text': 'p' || doc_id || '.1', 'media_ref': CAST(NULL AS VARCHAR), 'off': 1},
                        {'kind': 'text', 'text': 'p' || doc_id || '.2', 'media_ref': CAST(NULL AS VARCHAR), 'off': 2},
                        {'kind': 'text', 'text': 'p' || doc_id || '.3', 'media_ref': CAST(NULL AS VARCHAR), 'off': 3}]
                    WHEN 2 THEN [
                        {'kind': 'text', 'text': 'p' || doc_id || '.0', 'media_ref': CAST(NULL AS VARCHAR), 'off': 0},
                        {'kind': 'media', 'text': CAST(NULL AS VARCHAR), 'media_ref': 'm-' || doc_id || '-1', 'off': 1},
                        {'kind': 'media', 'text': CAST(NULL AS VARCHAR), 'media_ref': 'm-' || doc_id || '-2', 'off': 2},
                        {'kind': 'text', 'text': 'p' || doc_id || '.3', 'media_ref': CAST(NULL AS VARCHAR), 'off': 3}]
                    ELSE [
                        {'kind': 'text', 'text': 'p' || doc_id || '.0', 'media_ref': CAST(NULL AS VARCHAR), 'off': 0}]
                    END) AS t(s)
            ),
            g AS (
                SELECT *, CASE WHEN kind = 'text'
                           THEN off - ROW_NUMBER() OVER (
                               PARTITION BY doc_id, kind ORDER BY off)
                           ELSE off + 1000 END AS grp
                FROM synth
            ),
            merged AS (
                SELECT doc_id, MIN(off) AS first_off,
                       ANY_VALUE(kind) AS kind,
                       CASE WHEN ANY_VALUE(kind) = 'text'
                            THEN STRING_AGG(text, '|' ORDER BY off)
                            ELSE CAST(NULL AS VARCHAR) END AS text,
                       ANY_VALUE(media_ref) AS media_ref
                FROM g GROUP BY doc_id, grp
            )
            SELECT doc_id,
                   CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                        ORDER BY first_off) - 1 AS INTEGER) AS "offset",
                   kind, text, media_ref
            FROM merged
        """,
        "char_entropy": """
            WITH ch AS (
                SELECT doc_id, unnest(string_split(text, '')) AS c
                FROM documents WHERE length(text) > 0
            ),
            cnts AS (
                SELECT doc_id, c, CAST(COUNT(*) AS BIGINT) AS cnt
                FROM ch GROUP BY doc_id, c
            ),
            agg AS (
                SELECT doc_id,
                       CAST(SUM(cnt) AS BIGINT) AS n_chars,
                       CAST(COUNT(*) AS BIGINT) AS n_distinct,
                       CAST(SUM(CAST(floor(
                           CAST(cnt AS DOUBLE) * ln(CAST(cnt AS DOUBLE))
                           * 1000000.0) AS BIGINT)) AS BIGINT) AS h_micro
                FROM cnts GROUP BY doc_id
            )
            SELECT d.doc_id,
                   COALESCE(a.n_chars, 0) AS n_chars,
                   COALESCE(a.n_distinct, 0) AS n_distinct,
                   CASE WHEN a.n_chars > 0 THEN ROUND(
                       ln(CAST(a.n_chars AS DOUBLE))
                       - (CAST(a.h_micro AS DOUBLE) / 1000000.0)
                         / CAST(a.n_chars AS DOUBLE), 6)
                   ELSE 0.0 END AS char_entropy
            FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
        """,
        "quality_filter": """
            WITH sig AS (
                SELECT doc_id,
                       LEN(STRING_SPLIT(text, ' ')) AS n_words,
                       ROUND(LIST_SUM(LIST_TRANSFORM(STRING_SPLIT(text, ' '),
                             w -> LEN(w))) * 1.0
                             / LEN(STRING_SPLIT(text, ' ')), 4) AS mean_word_len,
                       LEN(LIST_DISTINCT(LIST_INTERSECT(STRING_SPLIT(text, ' '),
                             ['the', 'a', 'of', 'to', 'and', 'in']))) AS stop_hits,
                       ROUND(LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                             w -> REGEXP_FULL_MATCH(w, '[a-zA-Z]+'))) * 1.0
                             / LEN(STRING_SPLIT(text, ' ')), 4) AS alpha_frac
                FROM documents
            )
            SELECT doc_id, n_words, mean_word_len, stop_hits, alpha_frac,
                   CAST(n_words >= 30 AND n_words <= 100000
                        AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
                        AND stop_hits >= 2
                        AND alpha_frac >= 0.8 AS INTEGER) AS keep
            FROM sig
        """,
        "token_counts": """
            SELECT doc_id,
                   LEN(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+')) AS n_ws_tokens,
                   LEN(REGEXP_EXTRACT_ALL(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS n_bpe_tokens,
                   ROUND(LEN(REGEXP_EXTRACT_ALL(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) * 1.0
                         / LEN(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+')), 4) AS bpe_per_word
            FROM documents
        """,
        # predicts the PDF->PNG round-trip's page metadata + pixel
        # stats INDEPENDENTLY from the construction formula (the Spark
        # side actually writes/parses the binary formats)
        "pdf_ingest": """
            WITH sel AS (SELECT doc_id FROM documents WHERE doc_id % 50 = 0),
            pg AS (SELECT doc_id, UNNEST(RANGE(0, 1 + doc_id % 3)) AS page_idx
                   FROM sel),
            dims AS (SELECT doc_id, page_idx,
                            40 + (doc_id % 3) * 8 AS height,
                            60 + (doc_id % 5) * 4 AS width,
                            (doc_id * 7 + page_idx * 13) % 200 AS v
                     FROM pg),
            cells AS (SELECT doc_id, page_idx, height, width, v,
                             UNNEST(RANGE(0, height * width)) AS i
                      FROM dims),
            px AS (SELECT doc_id, page_idx, height, width, v,
                          ((i // width) + (i % width)) % 9 = 0 AS ink
                   FROM cells)
            SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                   PRINTF('m-%d-%02d', doc_id, page_idx) AS media_ref,
                   CAST(page_idx AS INTEGER) AS page_idx,
                   CAST(height AS INTEGER) AS height,
                   CAST(width AS INTEGER) AS width,
                   CAST(SUM(CASE WHEN ink THEN 1 ELSE 0 END) AS BIGINT) AS n_ink,
                   CAST(SUM(CASE WHEN ink THEN 255 ELSE v END) AS BIGINT) AS pix_sum
            FROM px
            GROUP BY doc_id, page_idx, height, width, v
        """,
        # same line synthesis + predicates; RIGHT(l,1) stands in for
        # Spark's substring(l,-1,1); (n+8)//9 for ceil(n/9)
        "c4_line_filter": """
            WITH w AS (
                SELECT doc_id, LIST_FILTER(STRING_SPLIT(text, ' '),
                                           x -> x <> '') AS words
                FROM documents
            ),
            l0 AS (
                SELECT doc_id, LIST_TRANSFORM(
                    range(0, (LEN(words) + 8) // 9),
                    k -> (CASE WHEN doc_id % 7 = 0 AND k % 4 = 1
                               THEN 'javascript ' ELSE '' END)
                         || ARRAY_TO_STRING(
                             words[CAST(k * 9 + 1 AS INT)
                                   :CAST(k * 9 + 9 AS INT)], ' ')
                         || (CASE WHEN k % 3 <> 2 THEN '.' ELSE '' END)
                    ) AS lines
                FROM w WHERE LEN(words) > 0
            ),
            l1 AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 50 = 13 THEN LIST_CONCAT(lines,
                                ['lorem ipsum filler text here.'])
                            WHEN doc_id % 50 = 27 THEN LIST_CONCAT(lines,
                                ['config { page marker here.'])
                            ELSE lines END AS lines
                FROM l0
            ),
            k AS (
                SELECT doc_id, lines,
                       LIST_FILTER(lines,
                           l -> RIGHT(l, 1) IN ('.', '!', '?')
                                AND LEN(STRING_SPLIT(l, ' ')) >= 5
                                AND NOT CONTAINS(l, 'javascript')) AS kept
                FROM l1
            ),
            pk AS (
                SELECT doc_id, lines, kept,
                       (NOT CONTAINS(ARRAY_TO_STRING(lines, chr(10)),
                                     'lorem ipsum'))
                       AND (NOT CONTAINS(ARRAY_TO_STRING(lines, chr(10)),
                                         '{'))
                       AND LEN(kept) >= 3 AS page_kept
                FROM k
            )
            SELECT doc_id,
                   CAST(LEN(lines) AS BIGINT) AS n_lines,
                   CAST(LEN(kept) AS BIGINT) AS n_kept_lines,
                   page_kept,
                   CASE WHEN page_kept
                        THEN ARRAY_TO_STRING(kept, chr(10)) END AS clean_text
            FROM pk
        """,
        # BM25 restated with the same left-associated double
        # arithmetic and FIXED per-term addition order (see the Spark
        # docstring); float literals all CAST to DOUBLE (bare 1.2 is
        # DECIMAL in DuckDB)
        "bm25_topk": """
            WITH d AS (
                SELECT doc_id, text,
                       CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                                w -> w <> '')) AS BIGINT) AS dl
                FROM documents
            ),
            meta AS (
                SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl
                FROM d
            ),
            tok AS (
                SELECT doc_id, dl, UNNEST(STRING_SPLIT(text, ' ')) AS token
                FROM d
            ),
            tf AS (
                SELECT doc_id, dl, token, COUNT(*) AS tf
                FROM tok WHERE token IN ('spark', 'table', 'row')
                GROUP BY doc_id, dl, token
            ),
            df AS (
                SELECT token, CAST(COUNT(*) AS DOUBLE) AS df
                FROM tf GROUP BY token
            ),
            s AS (
                SELECT doc_id, token,
                       (LN(CAST(1.0 AS DOUBLE)
                           + (n - df + CAST(0.5 AS DOUBLE))
                             / (df + CAST(0.5 AS DOUBLE)))
                        * (tf * CAST(2.2 AS DOUBLE)))
                       / (tf + CAST(1.2 AS DOUBLE)
                              * (CAST(0.25 AS DOUBLE)
                                 + (CAST(0.75 AS DOUBLE) * dl) / avgdl))
                       AS s
                FROM tf JOIN df USING (token), meta
            ),
            agg AS (
                SELECT doc_id,
                       COALESCE(SUM(CASE WHEN token = 'spark' THEN s END),
                                CAST(0 AS DOUBLE)) AS s0,
                       COALESCE(SUM(CASE WHEN token = 'table' THEN s END),
                                CAST(0 AS DOUBLE)) AS s1,
                       COALESCE(SUM(CASE WHEN token = 'row' THEN s END),
                                CAST(0 AS DOUBLE)) AS s2,
                       CAST(COUNT(*) AS BIGINT) AS n_terms_hit
                FROM s GROUP BY doc_id
            )
            SELECT doc_id, ROUND(s0 + s1 + s2, 6) AS score, n_terms_hit
            FROM agg
            ORDER BY score DESC, doc_id
            LIMIT 20
        """,
        # same protect/sentinel/split/restore chain; control bytes
        # spelled chr(1)/chr(2), group ref '\1' (RE2 rewrite syntax —
        # Spark's is '$1'; patterns themselves are engine-identical)
        "sentence_split": r"""
            WITH w AS (
                SELECT doc_id, LIST_FILTER(STRING_SPLIT(text, ' '),
                                           x -> x <> '') AS words
                FROM documents
            ),
            m AS (
                SELECT doc_id, ARRAY_TO_STRING(LIST_TRANSFORM(
                    range(0, LEN(words)),
                    i -> CASE WHEN i % 29 = 28 THEN 'e.g.'
                              WHEN i % 13 = 12
                                  THEN words[CAST(i + 1 AS INT)] || '.'
                              WHEN i % 20 = 19
                                  THEN words[CAST(i + 1 AS INT)] || '!'
                              ELSE words[CAST(i + 1 AS INT)] END), ' ')
                    AS marked
                FROM w WHERE LEN(words) > 0
            ),
            p AS (
                SELECT doc_id, STRING_SPLIT(
                    regexp_replace(
                        REPLACE(marked, 'e.g.',
                                'e' || chr(2) || 'g' || chr(2)),
                        '([.!?]) +', '\1' || chr(1), 'g'),
                    chr(1)) AS sents
                FROM m
            )
            SELECT doc_id, CAST(i - 1 AS BIGINT) AS sent_idx,
                   CAST(LENGTH(REPLACE(sents[CAST(i AS INT)], chr(2), '.'))
                        AS BIGINT) AS n_chars,
                   REPLACE(sents[CAST(i AS INT)], chr(2), '.') AS sentence
            FROM p, UNNEST(range(1, LEN(sents) + 1)) AS u(i)
        """,
        # postings rebuilt with LIST(... ORDER BY doc_id) — an ordered
        # aggregate, vs Spark's sort_array(collect_list) — and the
        # same 'doc:tf' string form hashed end-to-end
        "inverted_index": """
            WITH toks AS (
                SELECT doc_id, UNNEST(LIST_FILTER(
                    STRING_SPLIT(text, ' '), t -> t <> '')) AS token
                FROM documents
            ),
            tf AS (
                SELECT token, doc_id, COUNT(*) AS tf
                FROM toks GROUP BY token, doc_id
            ),
            p AS (
                SELECT token,
                       CAST(COUNT(*) AS BIGINT) AS df,
                       CAST(SUM(tf) AS BIGINT) AS cf,
                       LIST(CAST(doc_id AS VARCHAR) || ':'
                            || CAST(tf AS VARCHAR)
                            ORDER BY doc_id) AS arr
                FROM tf GROUP BY token
            )
            SELECT token, df, cf,
                   ARRAY_TO_STRING(arr[1:10], ',') AS posting_head,
                   MD5(ARRAY_TO_STRING(arr, ',')) AS posting_digest
            FROM p
        """,
        # latest-wins merge restated with arg_max on fetch_ts
        # (distinct by construction: base 1.7e9+id vs batch 1.7005e9+id)
        "crawl_upsert": """
            WITH allv AS (
                SELECT doc_id, 0 AS crawl_id,
                       1700000000 + doc_id AS fetch_ts,
                       MD5(text) AS content_digest
                FROM documents
                UNION ALL
                SELECT doc_id, 1, 1700500000 + doc_id,
                       MD5(text || ' v2')
                FROM documents WHERE doc_id % 4 = 1
                UNION ALL
                SELECT doc_id + 100000, 1, 1700500000 + doc_id,
                       MD5('new:' || text)
                FROM documents WHERE doc_id % 10 = 3
            )
            SELECT doc_id,
                   CAST(ARG_MAX(crawl_id, fetch_ts) AS INT) AS crawl_id,
                   CAST(MAX(fetch_ts) AS BIGINT) AS fetch_ts,
                   CAST(COUNT(*) AS BIGINT) AS n_versions,
                   ARG_MAX(content_digest, fetch_ts) AS content_digest
            FROM allv
            GROUP BY doc_id
        """,
        # RFC 9309 precedence restated as arg_max over rank =
        # 2*len(prefix) + is_allow (tie-free by fixture construction;
        # arg_max skips the NULL ranks of unmatched docs)
        "robots_filter": """
            WITH docs AS (
                SELECT doc_id, source,
                       '/sec' || CAST((doc_id // 3) % 5 AS VARCHAR)
                       || '/item/' || CAST(doc_id AS VARCHAR) AS path
                FROM documents
            ),
            k AS (
                SELECT source, CAST(SUBSTR(source, 4) AS INT) % 5 AS k
                FROM (SELECT DISTINCT source FROM documents)
            ),
            rules AS (
                SELECT source, '/sec' || CAST(k AS VARCHAR) || '/' AS prefix,
                       0 AS is_allow FROM k
                UNION ALL
                SELECT source, '/sec' || CAST(k AS VARCHAR) || '/item/1',
                       1 FROM k
                UNION ALL
                SELECT source, '/private/', 0 FROM k
            ),
            m AS (
                SELECT d.doc_id, d.source, d.path, r.prefix, r.is_allow
                FROM docs d LEFT JOIN rules r
                  ON d.source = r.source AND STARTS_WITH(d.path, r.prefix)
            )
            SELECT doc_id, source, path,
                   ARG_MAX(prefix, 2 * LENGTH(prefix) + is_allow)
                       AS matched_rule,
                   CASE WHEN ARG_MAX(prefix, 2 * LENGTH(prefix) + is_allow)
                             IS NULL
                         OR ARG_MAX(is_allow, 2 * LENGTH(prefix) + is_allow)
                             = 1
                        THEN 'fetch' ELSE 'skip' END AS decision
            FROM m
            GROUP BY doc_id, source, path
        """,
        # mirrors the extraction chain: regexp_extract_all with
        # UNNEST(range) ordinals standing in for Spark's posexplode
        "html_tables": r"""
            WITH w AS (
                SELECT doc_id,
                    '<html><body><div>intro</div><table class="meta">'
                    || '<tr><th>id</th><td>' || CAST(doc_id AS VARCHAR)
                    || '</td></tr><tr><th>lang</th><td>' || lang
                    || '</td></tr></table><p>filler</p><table id="data">'
                    || ARRAY_TO_STRING(LIST_TRANSFORM(
                           range(0, doc_id % 3 + 1),
                           r -> '<tr><td>r' || CAST(r AS VARCHAR)
                                || '</td><td>'
                                || CAST((doc_id * 7 + r) % 100 AS VARCHAR)
                                || '</td><td><b>x</b> '
                                || CAST((doc_id + r) % 13 AS VARCHAR)
                                || '</td></tr>'), '')
                    || '</table></body></html>' AS html
                FROM documents
            ),
            t AS (SELECT doc_id, regexp_extract_all(html,
                      '(?is)<table[^>]*>(.*?)</table>', 1) AS tbls FROM w),
            tx AS (SELECT doc_id, i - 1 AS table_idx,
                          tbls[CAST(i AS INT)] AS tbl
                   FROM t, UNNEST(range(1, len(tbls) + 1)) AS u(i)),
            r AS (SELECT doc_id, table_idx, regexp_extract_all(tbl,
                      '(?is)<tr[^>]*>(.*?)</tr>', 1) AS rws FROM tx),
            rx AS (SELECT doc_id, table_idx, j - 1 AS row_idx,
                          rws[CAST(j AS INT)] AS rw
                   FROM r, UNNEST(range(1, len(rws) + 1)) AS u(j)),
            cx AS (SELECT doc_id, table_idx, row_idx,
                       LIST_TRANSFORM(regexp_extract_all(rw,
                           '(?is)<t[dh][^>]*>(.*?)</t[dh]>', 1),
                           c -> trim(regexp_replace(regexp_replace(c,
                               '<[^>]*>', '', 'g'), '[ \t\n\r]+', ' ', 'g'))
                       ) AS cells
                   FROM rx)
            SELECT doc_id, CAST(table_idx AS BIGINT) AS table_idx,
                   CAST(row_idx AS BIGINT) AS row_idx,
                   CAST(len(cells) AS BIGINT) AS n_cells,
                   COALESCE(ARRAY_TO_STRING(cells, '|'), '') AS cell_text
            FROM cx
        """,
        # mirrors the Spark normalization chain string-for-string
        # (RE2/Java-identical patterns; regexp_replace needs the 'g'
        # flag here — Spark replaces all matches by default)
        "url_normalize": r"""
            WITH raw AS (
                SELECT doc_id,
                       (CASE doc_id % 3 WHEN 0 THEN 'http'
                             WHEN 1 THEN 'HTTPS' ELSE 'HtTp' END)
                       || '://'
                       || (CASE doc_id % 4 WHEN 0 THEN 'ExAmple.org'
                             WHEN 1 THEN 'example.ORG'
                             WHEN 2 THEN 'WWW.example.org'
                             ELSE 'sub.Example.org' END)
                       || (CASE doc_id % 5 WHEN 0 THEN ':80'
                             WHEN 1 THEN ':443' WHEN 2 THEN ':8080'
                             ELSE '' END)
                       || '/a/./sec'
                       || (CASE WHEN doc_id % 7 = 3 THEN '//' ELSE '/' END)
                       || 'x/../item/' || CAST(doc_id AS VARCHAR)
                       || '?'
                       || (CASE WHEN doc_id % 11 = 0 THEN 'utm_only=1'
                           ELSE 'utm_source=feed&z='
                                || CAST(doc_id % 10 AS VARCHAR)
                                || '&utm_campaign=c&a=1' END)
                       || '#sec' || CAST(doc_id % 2 AS VARCHAR)
                       AS url_raw
                FROM documents
            ),
            parts AS (
                SELECT doc_id, url_raw,
                       LOWER(regexp_extract(url_raw,
                           '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS scheme,
                       LOWER(regexp_extract(url_raw,
                           '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1)) AS auth,
                       regexp_extract(url_raw,
                           '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)',
                           1) AS path0,
                       regexp_extract(url_raw, '\?([^#]*)', 1) AS query0
                FROM raw
            ),
            norm AS (
                SELECT doc_id, url_raw, scheme,
                       CASE WHEN scheme = 'http'
                            THEN regexp_replace(auth, ':80$', '', 'g')
                            WHEN scheme = 'https'
                            THEN regexp_replace(auth, ':443$', '', 'g')
                            ELSE auth END AS host,
                       regexp_replace(regexp_replace(
                         regexp_replace(regexp_replace(
                           regexp_replace(
                             CASE WHEN path0 = '' THEN '/' ELSE path0 END,
                             '/{2,}', '/', 'g'),
                           '/\.(/|$)', '/', 'g'), '/\.(/|$)', '/', 'g'),
                         '/[^/]+/\.\.(/|$)', '/', 'g'),
                         '/[^/]+/\.\.(/|$)', '/', 'g') AS path,
                       -- DuckDB ARRAY_TO_STRING([]) is NULL where
                       -- Spark array_join([]) is '' — coalesce it
                       COALESCE(ARRAY_TO_STRING(LIST_SORT(LIST_FILTER(
                           STRING_SPLIT(query0, '&'),
                           x -> NOT STARTS_WITH(x, 'utm_') AND x <> ''
                       )), '&'), '') AS query
                FROM parts
            )
            SELECT doc_id, url_raw, scheme, host, path, query,
                   scheme || '://' || host || path ||
                   CASE WHEN query = '' THEN ''
                        ELSE '?' || query END AS url_norm
            FROM norm
        """,
        # predicts every parsed WARC record analytically from the
        # construction formula (warcinfo + request/response per doc,
        # 50 docs/file): a hash match proves the gzip-member framing,
        # Content-Length slicing and HTTP split round-trip losslessly
        "warc_ingest": """
            WITH c AS (SELECT CHR(13) || CHR(10) AS crlf),
            files AS (SELECT DISTINCT doc_id // 50 AS file_id FROM documents),
            info AS (
                SELECT file_id, CAST(0 AS BIGINT) AS rec_idx,
                       'warcinfo' AS rec_type,
                       CAST(NULL AS VARCHAR) AS url,
                       CAST(NULL AS BIGINT) AS http_status,
                       CAST(NULL AS VARCHAR) AS mime,
                       CAST(LENGTH('software: ocular-spark' || crlf ||
                                   'format: WARC File Format 1.0' || crlf)
                            AS BIGINT) AS payload_len,
                       CAST(NULL AS VARCHAR) AS body_text
                FROM files, c
            ),
            req AS (
                SELECT doc_id // 50 AS file_id,
                       CAST(1 + 2 * (doc_id % 50) AS BIGINT) AS rec_idx,
                       'request' AS rec_type,
                       'https://example.org/doc/' || CAST(doc_id AS VARCHAR) AS url,
                       CAST(NULL AS BIGINT) AS http_status,
                       CAST(NULL AS VARCHAR) AS mime,
                       CAST(LENGTH('GET /doc/' || CAST(doc_id AS VARCHAR) ||
                                   ' HTTP/1.1' || crlf ||
                                   'Host: example.org' || crlf || crlf)
                            AS BIGINT) AS payload_len,
                       CAST(NULL AS VARCHAR) AS body_text
                FROM documents, c
            ),
            resp AS (
                SELECT doc_id // 50 AS file_id,
                       CAST(2 + 2 * (doc_id % 50) AS BIGINT) AS rec_idx,
                       'response' AS rec_type,
                       'https://example.org/doc/' || CAST(doc_id AS VARCHAR) AS url,
                       CAST(CASE WHEN doc_id % 25 = 7 THEN 404 ELSE 200 END
                            AS BIGINT) AS http_status,
                       CASE WHEN doc_id % 25 = 7 THEN 'text/plain'
                            ELSE 'text/html' END AS mime,
                       CAST(CASE WHEN doc_id % 25 = 7
                            THEN LENGTH('not found: /doc/' ||
                                        CAST(doc_id AS VARCHAR))
                            ELSE LENGTH('<html><body><p>' ||
                                        SUBSTR(text, 1, 120) ||
                                        '</p></body></html>') END
                            AS BIGINT) AS payload_len,
                       CASE WHEN doc_id % 25 = 7
                            THEN 'not found: /doc/' || CAST(doc_id AS VARCHAR)
                            ELSE SUBSTR(text, 1, 120) END AS body_text
                FROM documents
            )
            SELECT * FROM info
            UNION ALL SELECT * FROM req
            UNION ALL SELECT * FROM resp
        """,
        # independent formulation vs the Spark sorted-run expression:
        # duplicate detection via unnest + GROUP BY occurrence counts
        "gopher_repetition": r"""
            WITH w AS (
                SELECT doc_id, LENGTH(text) AS n_chars,
                       REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+') AS words
                FROM documents
            ), g AS (
                SELECT doc_id, n_chars, LEN(words) AS n_words,
                       LIST_TRANSFORM(RANGE(1, LEN(words)),
                           i -> words[i] || ' ' || words[i+1]) AS g2,
                       LIST_TRANSFORM(RANGE(1, LEN(words) - 1),
                           i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]) AS g3
                FROM w
            ),
            x2 AS (SELECT doc_id, UNNEST(g2) AS gram FROM g),
            c2 AS (SELECT doc_id, gram, COUNT(*) AS c, LENGTH(gram) AS gl
                   FROM x2 GROUP BY doc_id, gram),
            a2 AS (SELECT doc_id, MAX(c * gl) AS top2,
                          CAST(SUM(CASE WHEN c >= 2 THEN c * gl ELSE 0 END) AS BIGINT) AS dup2
                   FROM c2 GROUP BY doc_id),
            x3 AS (SELECT doc_id, UNNEST(g3) AS gram FROM g),
            c3 AS (SELECT doc_id, gram, COUNT(*) AS c, LENGTH(gram) AS gl
                   FROM x3 GROUP BY doc_id, gram),
            a3 AS (SELECT doc_id,
                          CAST(SUM(CASE WHEN c >= 2 THEN c * gl ELSE 0 END) AS BIGINT) AS dup3
                   FROM c3 GROUP BY doc_id)
            SELECT g.doc_id, CAST(n_words AS INTEGER) AS n_words,
                   COALESCE(ROUND(top2 * 1.0 / n_chars, 4), 0.0) AS top_bigram_frac,
                   COALESCE(ROUND(dup2 * 1.0 / n_chars, 4), 0.0) AS dup_bigram_frac,
                   COALESCE(ROUND(dup3 * 1.0 / n_chars, 4), 0.0) AS dup_trigram_frac
            FROM g
            LEFT JOIN a2 ON g.doc_id = a2.doc_id
            LEFT JOIN a3 ON g.doc_id = a3.doc_id
        """,
        "embed_neighbors": """
            WITH all_vecs AS (
                SELECT vec_id, embedding FROM embeddings
                UNION ALL
                SELECT vec_id + 1000000 AS vec_id, embedding
                FROM embeddings WHERE vec_id < 5
            )
            SELECT p.vec_id AS probe_id, COUNT(*) AS n_neighbors
            FROM all_vecs p
            JOIN all_vecs e ON p.vec_id != e.vec_id
            WHERE p.vec_id < 10
              AND LIST_DOT_PRODUCT(p.embedding, e.embedding)
                  / (SQRT(LIST_DOT_PRODUCT(p.embedding, p.embedding))
                     * SQRT(LIST_DOT_PRODUCT(e.embedding, e.embedding))) > 0.8
            GROUP BY 1
        """,
        "label_centroid_sim": """
            SELECT label,
                   COUNT(*) AS n_vecs,
                   ROUND(AVG(SQRT(LIST_DOT_PRODUCT(
                       CAST(embedding AS DOUBLE[]),
                       CAST(embedding AS DOUBLE[])))), 4) AS avg_norm
            FROM embeddings
            GROUP BY label
        """,
        "orders_rollup": """
            SELECT o_orderpriority, o_orderstatus,
                   COUNT(*) AS n_orders,
                   ROUND(SUM(o_totalprice), 2) AS total_price
            FROM orders
            GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
        """,
        "events_json": """
            SELECT event_type,
                   COUNT(*) AS n_events,
                   CAST(SUM(CAST(JSON_EXTRACT(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
                   MAX(CAST(JSON_EXTRACT(props, '$.k') AS BIGINT)) AS max_k
            FROM events
            GROUP BY event_type
        """,
        "token_doc_freq": """
            WITH toks AS (
                SELECT DISTINCT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token
                FROM documents
            )
            SELECT token, COUNT(*) AS df
            FROM toks
            GROUP BY token
            ORDER BY df DESC, token ASC
            LIMIT 20
        """,
        "embed_topk": """
            WITH scored AS (
                SELECT p.vec_id AS probe_id, e.vec_id AS vec_id,
                       ROUND(LIST_DOT_PRODUCT(CAST(p.embedding AS DOUBLE[]),
                                              CAST(e.embedding AS DOUBLE[])), 5) AS cos
                FROM embeddings p
                JOIN embeddings e ON p.vec_id != e.vec_id
                WHERE p.vec_id < 20
            ),
            ranked AS (
                SELECT probe_id, vec_id, cos,
                       ROW_NUMBER() OVER (PARTITION BY probe_id
                                          ORDER BY cos DESC, vec_id ASC) AS rank
                FROM scored
            )
            SELECT probe_id, vec_id, cos, rank FROM ranked WHERE rank <= 3
        """,
        "embed_neardup": """
            WITH all_vecs AS (
                SELECT vec_id, embedding FROM embeddings
                UNION ALL
                SELECT vec_id + 1000000 AS vec_id, embedding
                FROM embeddings WHERE vec_id < 5
            )
            SELECT a.vec_id AS id_a,
                   COUNT(*) AS n_near_dups,
                   MIN(b.vec_id) AS first_match
            FROM all_vecs a
            JOIN all_vecs b ON a.vec_id < b.vec_id
            WHERE LIST_DOT_PRODUCT(CAST(a.embedding AS DOUBLE[]),
                                   CAST(b.embedding AS DOUBLE[])) > 0.9
            GROUP BY 1
        """,
        "embed_lsh_buckets": """
            WITH tables(table_id, d0) AS (VALUES (0, 0), (1, 16)),
            eb AS (
                SELECT t.table_id, e.vec_id, e.embedding,
                       LIST_AGGREGATE(
                           LIST_TRANSFORM(GENERATE_SERIES(1, 16),
                               k -> CASE WHEN e.embedding[t.d0 + k] >= 0
                                         THEN '1' ELSE '0' END),
                           'string_agg', '') AS bucket
                FROM embeddings e CROSS JOIN tables t
            ),
            bucket_stats AS (
                SELECT table_id,
                       COUNT(*) AS n_buckets,
                       MAX(sz) AS max_bucket_size
                FROM (SELECT table_id, bucket, COUNT(*) AS sz
                      FROM eb GROUP BY 1, 2)
                GROUP BY table_id
            ),
            pair_stats AS (
                SELECT a.table_id,
                       COUNT(*) AS n_pairs,
                       COUNT(*) FILTER (WHERE LIST_DOT_PRODUCT(
                           CAST(a.embedding AS DOUBLE[]),
                           CAST(b.embedding AS DOUBLE[])) > 0.9) AS n_candidates
                FROM eb a
                JOIN eb b ON a.table_id = b.table_id
                         AND a.bucket = b.bucket AND a.vec_id < b.vec_id
                GROUP BY 1
            )
            SELECT s.table_id, s.n_buckets, s.max_bucket_size,
                   COALESCE(p.n_pairs, 0) AS n_pairs,
                   COALESCE(p.n_candidates, 0) AS n_candidates
            FROM bucket_stats s
            LEFT JOIN pair_stats p ON s.table_id = p.table_id
        """,
        "doc_fingerprint": """
            WITH grams AS (
                SELECT doc_id,
                       UNNEST(GENERATE_SERIES(1, LENGTH(text) - 6)) AS pos,
                       text
                FROM documents
                WHERE LENGTH(text) >= 7
            ),
            hashed AS (
                SELECT doc_id, pos,
                       (ASCII(SUBSTRING(text, pos + 0, 1))::BIGINT * 336663071
                      + ASCII(SUBSTRING(text, pos + 1, 1))::BIGINT * 168429323
                      + ASCII(SUBSTRING(text, pos + 2, 1))::BIGINT * 67503107
                      + ASCII(SUBSTRING(text, pos + 3, 1))::BIGINT * 16974593
                      + ASCII(SUBSTRING(text, pos + 4, 1))::BIGINT * 66049
                      + ASCII(SUBSTRING(text, pos + 5, 1))::BIGINT * 257
                      + ASCII(SUBSTRING(text, pos + 6, 1))::BIGINT) % 2147483647 AS h
                FROM grams
            ),
            winnowed AS (
                SELECT doc_id, pos,
                       MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                                    ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS minh,
                       COUNT(*) OVER (PARTITION BY doc_id) AS n_grams
                FROM hashed
            ),
            fps AS (
                SELECT DISTINCT doc_id, minh AS fp
                FROM winnowed
                WHERE pos <= n_grams - 7
            )
            SELECT fp, COUNT(*) AS n_docs, MIN(doc_id) AS first_doc_id
            FROM fps
            GROUP BY fp
            HAVING COUNT(*) > 1
        """,
        "ivf_upsert": _IVF_CENT_CTES + """
            newb AS (
                SELECT vec_id + 100000 AS vec_id,
                       LIST_REVERSE(CAST(embedding AS DOUBLE[])) AS emb
                FROM embeddings
            ),
            ns AS (
                SELECT n.vec_id, c.cent_id,
                       LIST_DOT_PRODUCT(n.emb, c.cent_vec) AS cdot
                FROM newb n CROSS JOIN cent c
            )
            SELECT vec_id, CAST(cent_id AS INT) AS cluster FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY vec_id ORDER BY cdot DESC, cent_id ASC) AS rn
                FROM ns
            ) WHERE rn = 1
        """,
        "embed_ivf_topk": _IVF_CENT_CTES + """
            scored AS (
                SELECT e.vec_id, e.embedding, c.cent_id,
                       LIST_DOT_PRODUCT(CAST(e.embedding AS DOUBLE[]), c.cent_vec) AS cdot
                FROM embeddings e CROSS JOIN cent c
            ),
            ranked AS (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY vec_id ORDER BY cdot DESC, cent_id ASC) AS crank
                FROM scored
            ),
            assigned AS (
                SELECT vec_id, embedding, cent_id AS cluster FROM ranked WHERE crank = 1
            ),
            probes AS (
                SELECT vec_id AS probe_id, embedding AS probe_vec, cent_id AS cluster
                FROM ranked WHERE vec_id < 10 AND crank <= 4
            ),
            cands AS (
                SELECT p.probe_id, a.vec_id,
                       ROUND(LIST_DOT_PRODUCT(CAST(p.probe_vec AS DOUBLE[]),
                                              CAST(a.embedding AS DOUBLE[])), 5) AS cos
                FROM probes p JOIN assigned a ON p.cluster = a.cluster
                WHERE p.probe_id != a.vec_id
            ),
            rr AS (
                SELECT probe_id, vec_id, cos,
                       ROW_NUMBER() OVER (
                           PARTITION BY probe_id ORDER BY cos DESC, vec_id ASC) AS rank
                FROM cands
            )
            SELECT probe_id, vec_id, cos, rank FROM rr WHERE rank <= 3
        """,
        "lang_id": """
            SELECT doc_id,
                   LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                       t -> t IN ('the', 'a', 'and', 'of', 'to'))) AS n_common,
                   LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                       t -> t IN ('spark', 'join', 'hash', 'query', 'table'))) AS n_tech,
                   CASE WHEN LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                            t -> t IN ('the', 'a', 'and', 'of', 'to')))
                         >= LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                            t -> t IN ('spark', 'join', 'hash', 'query', 'table')))
                        THEN 'common' ELSE 'tech' END AS lang_guess
            FROM documents
        """,
        "lang_id_ngram": """
            WITH bi AS (
                SELECT doc_id, lang,
                       SUBSTRING(text, UNNEST(GENERATE_SERIES(1, LENGTH(text) - 1)), 2) AS bigram
                FROM documents
            ),
            profile AS (
                SELECT lang AS cand_lang, bigram, COUNT(*) AS cnt
                FROM bi GROUP BY 1, 2
            ),
            totals AS (
                SELECT lang AS cand_lang, COUNT(*) AS tot FROM bi GROUP BY 1
            ),
            vocab AS (SELECT COUNT(DISTINCT bigram) AS v FROM bi),
            langs AS (SELECT DISTINCT lang AS cand_lang FROM bi),
            scored AS (
                SELECT b.doc_id, b.lang, l.cand_lang,
                       ROUND(SUM(LN((COALESCE(p.cnt, 0) + 1) * 1.0
                                    / (t.tot + vocab.v))), 6) AS score
                FROM bi b
                CROSS JOIN langs l
                LEFT JOIN profile p ON p.cand_lang = l.cand_lang AND p.bigram = b.bigram
                JOIN totals t ON t.cand_lang = l.cand_lang
                CROSS JOIN vocab
                GROUP BY b.doc_id, b.lang, l.cand_lang, t.tot, vocab.v
            ),
            pred AS (
                SELECT doc_id, lang, cand_lang AS pred_lang,
                       ROW_NUMBER() OVER (PARTITION BY doc_id
                                          ORDER BY score DESC, cand_lang ASC) AS rn
                FROM scored
            )
            SELECT lang, pred_lang, COUNT(*) AS n_docs
            FROM pred WHERE rn = 1
            GROUP BY lang, pred_lang
        """,
        "simhash_hamming_join": """
            WITH toks AS (
                SELECT doc_id,
                       CAST(('0x' || SUBSTRING(MD5(UNNEST(STRING_SPLIT(text, ' '))), 1, 12))::UBIGINT AS BIGINT) AS h
                FROM documents
            ),
            bits AS (
                SELECT doc_id, h, UNNEST(GENERATE_SERIES(0, 47)) AS b FROM toks
            ),
            votes AS (
                SELECT doc_id, b,
                       SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
                FROM bits GROUP BY doc_id, b
            ),
            fp AS (
                SELECT doc_id,
                       CAST(SUM(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END)
                            AS BIGINT) AS fp
                FROM votes GROUP BY doc_id
            ),
            blocks0 AS (
                SELECT doc_id, fp, UNNEST(GENERATE_SERIES(0, 3)) AS j FROM fp
            ),
            blocks AS (
                SELECT doc_id, fp, j, (fp >> (12 * j)) & 4095 AS key FROM blocks0
            ),
            cand AS (
                SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                                a.fp AS fp_a, b.fp AS fp_b
                FROM blocks a JOIN blocks b
                  ON a.j = b.j AND a.key = b.key AND a.doc_id < b.doc_id
            )
            SELECT doc_a, doc_b,
                   CAST(BIT_COUNT(XOR(fp_a, fp_b)) AS INT) AS hamming
            FROM cand
            WHERE BIT_COUNT(XOR(fp_a, fp_b)) <= 3
        """,
        "simhash": """
            WITH toks AS (
                SELECT doc_id,
                       CAST(('0x' || SUBSTRING(MD5(UNNEST(STRING_SPLIT(text, ' '))), 1, 4))::UBIGINT AS BIGINT) AS h
                FROM documents
            ),
            bits AS (
                SELECT doc_id, h, UNNEST(GENERATE_SERIES(0, 15)) AS b FROM toks
            ),
            votes AS (
                SELECT doc_id, b,
                       SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
                FROM bits GROUP BY doc_id, b
            ),
            fingerprints AS (
                SELECT doc_id,
                       CAST(SUM(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END)
                            AS BIGINT) AS simhash
                FROM votes GROUP BY doc_id
            )
            SELECT simhash, COUNT(*) AS n_docs, MIN(doc_id) AS first_doc_id
            FROM fingerprints
            GROUP BY simhash
            HAVING COUNT(*) > 1
        """,
    }


# main-content extraction oracles are assembled from the same
# expression fragments the Spark queries use (functions/html.py), so
# synthesizer and heuristic stay mirrored by construction; the DOM
# query shares the expression oracle (independent impl, one oracle)
def _install_html_oracles() -> None:
    from ocular_spark.functions import html as _H

    wrapped = "(" + _H.wrap_boilerplate_duckdb("text", "doc_id") + ")"
    _ORACLE_SQL["html_main_content"] = (
        "SELECT doc_id, "
        + _H.main_content_sql_duckdb(wrapped)
        + " FROM documents"
    )
    _ORACLE_SQL["html_main_content_dom"] = _ORACLE_SQL["html_main_content"]
    nested = "(" + _H.wrap_nested_duckdb("text", "doc_id") + ")"
    _ORACLE_SQL["html_main_content_nested"] = (
        "SELECT doc_id, "
        + _H.main_content_sql_duckdb(nested)
        + " FROM documents"
    )
    _ORACLE_SQL["html_main_content_nested_dom"] = _ORACLE_SQL[
        "html_main_content_nested"
    ]
    appendix = "'" + _H.APPENDIX_HTML + "'"
    _ORACLE_SQL["strip_spans_html"] = (
        "WITH spans AS ("
        "SELECT doc_id, 'text' AS kind, " + wrapped + " AS raw, "
        "CAST(NULL AS VARCHAR) AS media_ref, 0 AS off FROM documents "
        "UNION ALL SELECT doc_id, 'media', CAST(NULL AS VARCHAR), "
        "'m-' || doc_id, 1 FROM documents "
        "UNION ALL SELECT doc_id, 'text', " + appendix + ", "
        "CAST(NULL AS VARCHAR), 2 FROM documents) "
        "SELECT doc_id, kind, "
        "CASE WHEN kind = 'text' THEN ("
        + _H.main_text_expr_duckdb("raw")
        + ") ELSE raw END AS text, media_ref, "
        'CAST(off AS INTEGER) AS "offset" FROM spans'
    )
    # extract_stream: the streaming path runs the same span-rewrite
    # projection, so the oracle recomputes it over the same fixture
    # (boilerplate page / media / NESTED page; doc_id % 10 subset,
    # doc_id as VARCHAR to match the stream DDL)
    _ORACLE_SQL["extract_stream"] = (
        "WITH sel AS (SELECT * FROM documents WHERE doc_id % 10 = 0), "
        "spans AS ("
        "SELECT doc_id, 'text' AS kind, " + wrapped + " AS raw, "
        "CAST(NULL AS VARCHAR) AS media_ref, 0 AS off FROM sel "
        "UNION ALL SELECT doc_id, 'media', CAST(NULL AS VARCHAR), "
        "'m-' || doc_id, 1 FROM sel "
        "UNION ALL SELECT doc_id, 'text', " + nested + ", "
        "CAST(NULL AS VARCHAR), 2 FROM sel) "
        "SELECT CAST(doc_id AS VARCHAR) AS doc_id, kind, "
        "CASE WHEN kind = 'text' THEN ("
        + _H.main_text_expr_duckdb("raw")
        + ") ELSE raw END AS text, media_ref, "
        'CAST(off AS INTEGER) AS "offset" FROM spans'
    )
    # span_dedup mirrors the Spark plan semantically: DuckDB groups on
    # the raw block TEXT where Spark groups on its xxhash64 (the hash
    # is a shuffle-width optimization, not a semantic difference)
    blocks = (
        "list_transform("
        + _H.stats_expr_duckdb(
            _H.segments_expr_duckdb("(" + _H.wrap_boilerplate_duckdb("text", "doc_id") + ")")
        )
        + ", s -> s.txt)"
    )
    _ORACLE_SQL["span_dedup"] = (
        "WITH b AS (SELECT doc_id, " + blocks + " AS blocks FROM documents), "
        "tx AS (SELECT doc_id, 'text' AS kind, unnest(blocks) AS text, "
        "CAST(NULL AS VARCHAR) AS media_ref, "
        "generate_subscripts(blocks, 1) - 1 AS off FROM b), "
        "md AS (SELECT doc_id, 'media' AS kind, CAST(NULL AS VARCHAR) AS text, "
        "'m-' || doc_id AS media_ref, len(blocks) AS off FROM b), "
        "flat AS (SELECT * FROM tx UNION ALL SELECT * FROM md), "
        "boiler AS (SELECT text FROM tx GROUP BY text "
        f"HAVING COUNT(DISTINCT doc_id) >= {SPAN_DEDUP_MIN_DF}) "
        "SELECT doc_id, kind, text, media_ref, "
        'CAST(off AS INTEGER) AS "offset" FROM flat '
        "WHERE kind = 'media' OR text NOT IN (SELECT text FROM boiler)"
    )


_install_html_oracles()


def _install_text_normalize_oracle() -> None:
    """text_normalize: injected decorations + stages 2-5 are shared
    expression fragments (functions/text.py) so Spark and oracle stay
    mirrored by construction; stage 1 (NFC) is INDEPENDENT — DuckDB's
    nfc_normalize vs CPython unicodedata."""
    from ocular_spark.functions import text as _T

    inj = "(" + _T.injected_expr("text", "doc_id") + ")"
    norm = _T.normalize_expr_duckdb("t")
    _ORACLE_SQL["text_normalize"] = (
        "WITH raw AS (SELECT doc_id, " + inj + " AS t FROM documents), "
        "n AS (SELECT doc_id, t, " + norm + " AS norm_text FROM raw) "
        "SELECT doc_id, norm_text, "
        "CAST(t != norm_text AS BIGINT) AS changed, "
        "CAST(length(t) AS BIGINT) AS len_raw, "
        "CAST(length(norm_text) AS BIGINT) AS len_norm FROM n"
    )


_install_text_normalize_oracle()


def _install_link_graph_oracles() -> None:
    """anchor_texts / link_pagerank: page synthesis and extraction are
    shared fragments (functions/html.py); the PageRank iterations are
    unrolled in SQL with the same BIGINT fixed-point arithmetic
    (DuckDB // == Spark DIV on positive BIGINTs)."""
    from ocular_spark.functions import html as _H

    pages = (
        "pages AS (SELECT doc_id, "
        + _H.wrap_links_duckdb("text", "doc_id")
        + " AS html FROM documents)"
    )
    _ORACLE_SQL["anchor_texts"] = (
        "WITH " + pages + ", "
        "ax AS (SELECT doc_id, unnest(" + _H.anchors_expr("html") + ") AS a "
        "FROM pages) "
        "SELECT doc_id, "
        f"regexp_extract(a, '{_H.HREF_PAT}', 1) AS href, "
        + _H._txt_frag(True, "a")
        + " AS anchor FROM ax"
    )
    base = f"({PR_SCALE} * {PR_D_DEN - PR_D_NUM}) // ({PR_D_DEN} * (SELECT c FROM nn))"
    its = []
    prev = "r0"
    for i in range(1, PR_ITERS + 1):
        its.append(
            f"c{i} AS (SELECT e.dst, "
            f"SUM((r.rank * {PR_D_NUM}) // ({PR_D_DEN} * g.outdeg)) AS s "
            f"FROM edges e JOIN deg g ON e.src = g.src "
            f"JOIN {prev} r ON r.n = e.src GROUP BY e.dst), "
            f"r{i} AS (SELECT n.n, {base} + COALESCE(CAST(c{i}.s AS BIGINT), 0) "
            f"AS rank FROM nodes n LEFT JOIN c{i} ON c{i}.dst = n.n)"
        )
        prev = f"r{i}"
    _ORACLE_SQL["link_pagerank"] = (
        "WITH " + pages + ", "
        "ex AS (SELECT doc_id AS src, unnest("
        + _H.doc_links_expr("html")
        + ") AS d FROM pages), "
        "edges AS (SELECT DISTINCT src, CAST(d AS BIGINT) AS dst FROM ex), "
        "deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src), "
        "nodes AS (SELECT src AS n FROM edges UNION SELECT dst FROM edges), "
        "nn AS (SELECT COUNT(*) AS c FROM nodes), "
        f"r0 AS (SELECT n, {PR_SCALE} // (SELECT c FROM nn) AS rank FROM nodes), "
        + ", ".join(its)
        + f" SELECT n AS node, rank FROM r{PR_ITERS}"
    )


_install_link_graph_oracles()


def _install_hll_oracle() -> None:
    """hll_distinct: register-for-register replay.  Same md5 windows,
    same length(bin(x & -x)) rho, same exact BIGINT register sum,
    same single-division + ln estimate with the one precomputed
    double constant."""
    est_raw = f"({HLL_ALPHA_M2_SCALED} / CAST(s_scaled AS DOUBLE))"
    _ORACLE_SQL["hll_distinct"] = f"""
        WITH toks AS (
            SELECT source, string_split(text, ' ') AS ts FROM documents
        ),
        uni AS (
            SELECT source, 1 AS gram, unnest(ts) AS item FROM toks
        ),
        bi AS (
            SELECT source, 2 AS gram,
                   unnest(CASE WHEN len(ts) >= 2 THEN list_transform(
                       generate_series(1, len(ts) - 1),
                       i -> ts[i] || ' ' || ts[i + 1]) ELSE [] END) AS item
            FROM toks
        ),
        items AS (
            SELECT * FROM uni WHERE item != ''
            UNION ALL SELECT * FROM bi
        ),
        hashed AS (
            SELECT source, gram, item,
                   CAST(('0x' || substring(md5(item), 1, 4))::UBIGINT
                        AS BIGINT) % {HLL_M} AS idx,
                   CAST(('0x' || substring(md5(item), 5, 13))::UBIGINT
                        AS BIGINT) AS x
            FROM items
        ),
        rhos AS (
            SELECT source, gram, idx,
                   CASE WHEN x = 0 THEN 53
                        ELSE length(bin(x & -x)) END AS rho
            FROM hashed
        ),
        regs AS (
            SELECT source, gram, idx, MAX(rho) AS r
            FROM rhos GROUP BY 1, 2, 3
        ),
        folded AS (
            SELECT source, gram,
                   CAST(SUM(CAST(1 AS BIGINT) << (53 - r)) AS BIGINT)
                       AS s_used,
                   COUNT(*) AS used
            FROM regs GROUP BY 1, 2
        ),
        exact AS (
            SELECT source, gram, COUNT(DISTINCT item) AS n_exact
            FROM items GROUP BY 1, 2
        ),
        sk AS (
            SELECT source, gram,
                   CAST({HLL_M} - used AS BIGINT) AS v_zero,
                   CAST(s_used + ({HLL_M} - used)
                        * (CAST(1 AS BIGINT) << 53) AS BIGINT) AS s_scaled
            FROM folded
        )
        SELECT sk.source, CAST(sk.gram AS BIGINT) AS gram, v_zero, s_scaled,
               CAST(n_exact AS BIGINT) AS n_exact,
               round(CASE WHEN {est_raw} <= 160.0 AND v_zero > 0
                     THEN 64.0 * ln(64.0 / v_zero)
                     ELSE {est_raw} END, 4) AS est
        FROM sk JOIN exact
          ON sk.source = exact.source AND sk.gram = exact.gram
    """


_install_hll_oracle()


def _install_dup_substring_oracle() -> None:
    """dup_substring: the oracle regroups on RAW gram strings (the
    Spark side doc-counts xxhash64 of them), so a hash collision on
    this corpus would surface as a gate mismatch."""
    K = DUPSUB_K
    passage = DUPSUB_PASSAGE.replace("'", "''")
    _ORACLE_SQL["dup_substring"] = f"""
        WITH raw AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 50 = 9 THEN text || '{passage}'
                        ELSE text END AS t
            FROM documents
        ),
        pos AS (
            SELECT doc_id, t,
                   unnest(generate_series(1, length(t) - {K} + 1)) AS p
            FROM raw WHERE length(t) >= {K}
        ),
        g2 AS (
            SELECT doc_id, p, substring(t, p, {K}) AS g FROM pos
        ),
        df AS (
            SELECT g FROM g2 GROUP BY g
            HAVING COUNT(DISTINCT doc_id) >= 2
        ),
        fl AS (
            SELECT doc_id, p,
                   lead(p) OVER (PARTITION BY doc_id ORDER BY p) AS np
            FROM g2 JOIN df USING (g)
        ),
        cov AS (
            SELECT doc_id,
                   COUNT(*) AS n_dup_starts,
                   CAST(SUM(COALESCE(LEAST({K}, np - p), {K})) AS BIGINT)
                       AS dup_chars
            FROM fl GROUP BY doc_id
        )
        SELECT raw.doc_id,
               CAST(GREATEST(length(t) - {K} + 1, 0) AS BIGINT) AS n_grams,
               CAST(COALESCE(n_dup_starts, 0) AS BIGINT) AS n_dup_starts,
               CAST(COALESCE(dup_chars, 0) AS BIGINT) AS dup_chars,
               round(CAST(COALESCE(dup_chars, 0) AS DOUBLE) / length(t), 6)
                   AS dup_frac
        FROM raw LEFT JOIN cov ON raw.doc_id = cov.doc_id
    """


_install_dup_substring_oracle()


def _install_pipeline_oracles() -> None:
    """pii_redact / decontaminate: the doc_id-derived fixture suffixes
    and the redaction/shingle logic restated independently in DuckDB
    SQL (RE2 regexes; list lambdas for the 13-word shingles)."""
    inj = (
        "text"
        " || CASE WHEN doc_id % 3 = 0 THEN ' contact user' ||"
        " CAST(doc_id AS VARCHAR) || '@example.com now' ELSE '' END"
        " || CASE WHEN doc_id % 4 = 1 THEN ' call +1-555-' ||"
        " lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' today'"
        " ELSE '' END"
        " || CASE WHEN doc_id % 5 = 2 THEN ' from 10.' ||"
        " CAST(doc_id % 256 AS VARCHAR) || '.0.' ||"
        " CAST((doc_id * 7) % 256 AS VARCHAR) || ' logged' ELSE '' END"
    )
    _ORACLE_SQL["pii_redact"] = (
        f"WITH raw AS (SELECT doc_id, {inj} AS t FROM documents) "
        "SELECT doc_id, "
        f"len(regexp_extract_all(t, '{PII_EMAIL_RE}')) AS n_email, "
        f"len(regexp_extract_all(t, '{PII_PHONE_RE}')) AS n_phone, "
        f"len(regexp_extract_all(t, '{PII_IP_RE}')) AS n_ip, "
        "regexp_replace(regexp_replace(regexp_replace(t, "
        f"'{PII_EMAIL_RE}', '<EMAIL>', 'g'), "
        f"'{PII_PHONE_RE}', '<PHONE>', 'g'), "
        f"'{PII_IP_RE}', '<IP>', 'g') AS clean_text "
        "FROM raw"
    )
    n = DECON_N
    both = " " + DECON_CANON + " " + DECON_CANON2
    _ORACLE_SQL["decontaminate"] = (
        "WITH t AS (SELECT doc_id, text || CASE "
        f"WHEN doc_id % 100 = 7 THEN '{both}' "
        f"WHEN doc_id % 10 = 4 THEN ' {DECON_CANON}' "
        f"WHEN doc_id % 10 = 9 THEN '{both}' "
        "ELSE '' END AS txt FROM documents), "
        "tok AS (SELECT doc_id, string_split(txt, ' ') AS toks FROM t), "
        "g AS (SELECT doc_id, unnest(list_distinct(list_transform("
        f"range(1, greatest(len(toks) - {n - 2}, 1)), "
        f"i -> array_to_string(toks[i:i+{n - 1}], ' ')))) AS gram FROM tok), "
        "bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 100 = 7) "
        "SELECT g.doc_id, COUNT(*) AS n_benchmark_grams "
        "FROM g JOIN bench USING (gram) WHERE g.doc_id % 100 <> 7 "
        "GROUP BY g.doc_id"
    )
    _ORACLE_SQL["training_mix"] = (
        "SELECT doc_id, lang, "
        # CAST: DuckDB types the bare literal 100.0 as DECIMAL, which
        # would reach the driver as Decimal values and hash-mismatch
        # Spark's doubles
        f"round(CAST(100.0 AS DOUBLE) / ({_MIX_CASE}), 4) AS weight "
        f"FROM documents WHERE {_MIX_HASH} < ({_MIX_CASE})"
    )
    # embed_quantize: same arithmetic restated over DuckDB list
    # lambdas; floor(x+0.5) rounding (engine-agnostic), LIST_DOT_PRODUCT
    # pairs with Spark's left fold (embed_topk-proven), and the 127
    # literal is CAST to DOUBLE (bare 127.0 would be DECIMAL)
    _ORACLE_SQL["embed_quantize"] = """
        WITH ed AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ed FROM embeddings
        ), m AS (
            SELECT vec_id, ed,
                   list_max(list_transform(ed, x -> abs(x))) AS mx
            FROM ed
        ), q AS (
            SELECT vec_id, ed, CAST(127 AS DOUBLE) / mx AS scale,
                   list_transform(ed,
                       x -> floor(x * (CAST(127 AS DOUBLE) / mx) + 0.5)) AS qv
            FROM m WHERE mx > 0
        ), d AS (
            SELECT vec_id, ed, qv, scale,
                   list_transform(qv, v -> v / scale) AS dq
            FROM q
        )
        SELECT vec_id,
               CAST(len(list_filter(qv, v -> abs(v) = 127)) AS BIGINT) AS n_sat,
               ROUND(list_max(list_transform(range(1, len(ed) + 1),
                   i -> abs(ed[i] - dq[i]))), 6) AS max_abs_err,
               ROUND(LIST_DOT_PRODUCT(ed, dq)
                     / (SQRT(LIST_DOT_PRODUCT(ed, ed))
                        * SQRT(LIST_DOT_PRODUCT(dq, dq))), 6) AS cos_dequant
        FROM d
    """
    # dedup_cluster: connected components over the verified near-dup
    # pair graph.  Independent algorithm from the Spark side: full
    # recursive-CTE transitive closure (min over reachable nodes) vs
    # iterative min-label propagation + pointer jumping.
    _ORACLE_SQL["dedup_cluster"] = f"""
        WITH RECURSIVE pairs AS ({_ORACLE_SQL["ngram_jaccard"]}),
        edges AS (
            SELECT id_a AS src, id_b AS dst FROM pairs
            UNION ALL
            SELECT id_b AS src, id_a AS dst FROM pairs
        ),
        reach AS (
            SELECT src AS node, dst AS r FROM edges
            UNION
            SELECT reach.node, e.dst AS r
            FROM reach JOIN edges e ON reach.r = e.src
        ),
        lab AS (
            SELECT node AS doc_id, LEAST(node, MIN(r)) AS cluster_id
            FROM reach GROUP BY node
        )
        SELECT doc_id, cluster_id,
               CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT)
                   AS cluster_size
        FROM lab
    """
    # split_by_cluster: clusters recomputed INDEPENDENTLY (recursive
    # CTE reachability), then the same Lehmer assignment re-derived
    _h = _SPLIT_HASH_TMPL.format(k="split_key")
    _ORACLE_SQL["split_by_cluster"] = f"""
        WITH lab AS ({_ORACLE_SQL["dedup_cluster"]}),
        keyed AS (
            SELECT d.doc_id,
                   COALESCE(l.cluster_id, d.doc_id) AS split_key
            FROM documents d LEFT JOIN lab l USING (doc_id)
        )
        SELECT doc_id, split_key,
               CASE WHEN {_h} < {SPLIT_TRAIN_PCT} THEN 'train'
                    WHEN {_h} < {SPLIT_TRAIN_PCT + SPLIT_VALID_PCT}
                        THEN 'valid'
                    ELSE 'test' END AS split
        FROM keyed
    """
    # split_contamination: both assignments re-derived (cluster via
    # the recursive-CTE split oracle, naive via the doc_id hash) and
    # the straddle census recomputed over the independent pair list
    _hn = _SPLIT_HASH_TMPL.format(k="doc_id")
    _ORACLE_SQL["split_contamination"] = f"""
        WITH pairs AS ({_ORACLE_SQL["ngram_jaccard"]}),
        asg AS (
            SELECT doc_id, split AS cluster_split,
                   CASE WHEN {_hn} < {SPLIT_TRAIN_PCT} THEN 'train'
                        WHEN {_hn} < {SPLIT_TRAIN_PCT + SPLIT_VALID_PCT}
                            THEN 'valid'
                        ELSE 'test' END AS naive_split
            FROM ({_ORACLE_SQL["split_by_cluster"]})
        ),
        j AS (
            SELECT p.id_a, p.id_b,
                   a.cluster_split AS ca, b.cluster_split AS cb,
                   a.naive_split AS na, b.naive_split AS nb
            FROM pairs p
            JOIN asg a ON p.id_a = a.doc_id
            JOIN asg b ON p.id_b = b.doc_id
        ),
        agg AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
                   CAST(SUM(CASE WHEN ca <> cb THEN 1 ELSE 0 END)
                        AS BIGINT) AS cluster_n,
                   CAST(SUM(CASE WHEN na <> nb THEN 1 ELSE 0 END)
                        AS BIGINT) AS naive_n
            FROM j
        )
        SELECT 'cluster' AS method, n_pairs, cluster_n AS n_straddling
        FROM agg
        UNION ALL
        SELECT 'naive', n_pairs, naive_n FROM agg
    """
    # pack_sequences: same Lehmer shard + prefix-sum placement; window
    # SUM(BIGINT) is HUGEINT in DuckDB, so cast before the modular
    # arithmetic
    _ORACLE_SQL["pack_sequences"] = f"""
        WITH t AS (
            SELECT doc_id,
                   {_PACK_SHARD} AS shard,
                   CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens
            FROM documents
        ), c AS (
            SELECT doc_id, shard, n_tokens,
                   CAST(COALESCE(SUM(n_tokens) OVER (
                       PARTITION BY shard ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS BIGINT) AS cum_before
            FROM t
        )
        SELECT doc_id, shard, n_tokens,
               CAST(FLOOR(cum_before / {PACK_SEQLEN}.0) AS BIGINT) AS seq_id,
               cum_before % {PACK_SEQLEN} AS seq_offset,
               CAST(CASE WHEN cum_before % {PACK_SEQLEN} + n_tokens
                              > {PACK_SEQLEN}
                         THEN 1 ELSE 0 END AS INT) AS crosses_boundary
        FROM c
    """
    # dedup_stream: the surviving digest set must equal the batch
    # distinct digests of the UN-cloned corpus (clones add no digests)
    _ORACLE_SQL["dedup_stream"] = (
        "SELECT DISTINCT MD5(text) AS text_hash FROM documents"
    )
    # embed_semdedup: same LSH buckets + greedy min-id survivor,
    # restated over DuckDB list lambdas; cosine rounded to 6 dp before
    # the threshold compare in both engines
    _ORACLE_SQL["embed_semdedup"] = f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
            UNION ALL
            SELECT vec_id + 1000000, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings WHERE vec_id < 5
        ), eb AS (
            SELECT vec_id, v, t.table_id,
                   ARRAY_TO_STRING(LIST_TRANSFORM(
                       GENERATE_SERIES(1, 16),
                       k -> CASE WHEN v[t.table_id * 16 + k] >= 0
                                 THEN '1' ELSE '0' END), '') AS bucket
            FROM e
            CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, 1)) AS table_id) t
        ), pairs AS (
            SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
            FROM eb a
            JOIN eb b ON a.table_id = b.table_id AND a.bucket = b.bucket
                     AND a.vec_id < b.vec_id
            WHERE ROUND(LIST_DOT_PRODUCT(a.v, b.v)
                        / (SQRT(LIST_DOT_PRODUCT(a.v, a.v))
                           * SQRT(LIST_DOT_PRODUCT(b.v, b.v))), 6)
                  >= {SEMDEDUP_TAU}
        ), dup AS (
            SELECT id_b AS vec_id, MIN(id_a) AS dup_of FROM pairs GROUP BY id_b
        )
        SELECT e.vec_id, dup.dup_of,
               CAST(CASE WHEN dup.dup_of IS NULL THEN 1 ELSE 0 END AS INT)
                   AS kept
        FROM e LEFT JOIN dup ON e.vec_id = dup.vec_id
    """
    # chunk_documents: same generator restated with DuckDB list ops;
    # GENERATE_SERIES is end-INCLUSIVE like Spark's sequence, list
    # slicing v[a:b] is 1-based inclusive like Spark's slice(start,len)
    _ORACLE_SQL["chunk_documents"] = f"""
        WITH t AS (
            SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM documents
        ), g AS (
            SELECT doc_id, toks,
                   GENERATE_SERIES(0, GREATEST(LEN(toks) - 1, 0),
                                   {CHUNK_STRIDE}) AS starts
            FROM t
        ), x AS (
            SELECT doc_id, toks,
                   UNNEST(starts) AS tok_start,
                   GENERATE_SUBSCRIPTS(starts, 1) - 1 AS chunk_idx
            FROM g
        )
        SELECT doc_id,
               CAST(chunk_idx AS INT) AS chunk_idx,
               CAST(tok_start AS INT) AS tok_start,
               CAST(LEAST(LEN(toks) - tok_start, {CHUNK_TOKENS}) AS BIGINT)
                   AS n_chunk_tokens,
               ARRAY_TO_STRING(
                   toks[tok_start + 1 : tok_start + {CHUNK_TOKENS}], ' ')
                   AS chunk_text
        FROM x
    """
    # tfidf_top_terms: smoothed sklearn-form TF-IDF, per-doc top-3 by
    # the total order (tfidf desc, token asc); LN is float64 in both
    # engines and the score is rounded to 6 dp BEFORE ranking so the
    # cut is taken on identical values
    _ORACLE_SQL["tfidf_top_terms"] = """
        WITH toks AS (
            SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token
            FROM documents
        ), tf AS (
            SELECT doc_id, token, COUNT(*) AS tf
            FROM toks GROUP BY doc_id, token
        ), df AS (
            SELECT token, COUNT(*) AS df
            FROM (SELECT DISTINCT doc_id, token FROM toks) GROUP BY token
        ), n AS (
            SELECT COUNT(*) AS n_docs FROM documents
        ), scored AS (
            SELECT tf.doc_id, tf.token, CAST(tf.tf AS BIGINT) AS tf,
                   ROUND(tf.tf * (LN((n.n_docs + 1.0) / (df.df + 1.0))
                                  + 1.0), 6) AS tfidf
            FROM tf JOIN df USING (token) CROSS JOIN n
        )
        SELECT doc_id, CAST(rank AS INT) AS rank, token, tf, tfidf
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY doc_id ORDER BY tfidf DESC, token ASC
            ) AS rank
            FROM scored
        ) WHERE rank <= 3
    """
    # audio_ingest: every output predicted analytically from the
    # construction formula (constant-band RMS = a_k/32768 exactly)
    _ORACLE_SQL["audio_ingest"] = """
        SELECT 'a-' || doc_id AS media_ref,
               16000 AS sample_rate,
               1 AS n_channels,
               2 AS sample_width,
               CAST(4 * (50 + doc_id % 7) AS INT) AS n_frames,
               ROUND((((doc_id * 31 + 0 * 97) % 20000) + 1000)
                     / 32768.0, 6) AS rms_b0,
               ROUND((((doc_id * 31 + 1 * 97) % 20000) + 1000)
                     / 32768.0, 6) AS rms_b1,
               ROUND((((doc_id * 31 + 2 * 97) % 20000) + 1000)
                     / 32768.0, 6) AS rms_b2,
               ROUND((((doc_id * 31 + 3 * 97) % 20000) + 1000)
                     / 32768.0, 6) AS rms_b3
        FROM documents WHERE doc_id % 25 = 0
    """
    # video_ingest: stride arithmetic + constant-level formula replayed
    # analytically (sample i of a clip with n frames reads source frame
    # (i*n)//min(3,n); a constant uint8 frame's mean is exact)
    _ORACLE_SQL["video_ingest"] = """
        WITH clips AS (
            SELECT doc_id,
                   2 + doc_id % 5 AS n,
                   LEAST(3, 2 + doc_id % 5) AS m,
                   8 + doc_id % 3 AS h
            FROM documents WHERE doc_id % 25 = 0
        )
        SELECT 'v-' || doc_id AS media_ref,
               CAST(i AS INT) AS frame_idx,
               CAST(h AS INT) AS height,
               12 AS width,
               CAST((doc_id * 11 + ((i * n) // m) * 17) % 256 AS DOUBLE)
                   AS mean_level
        FROM clips, UNNEST(GENERATE_SERIES(0, m - 1)) AS t(i)
    """
    # image_ingest: construction formula + nearest-neighbor index
    # arithmetic replayed analytically over the (i, j) thumbnail grid —
    # all-integer outputs, so no float rounding convention is needed
    _ORACLE_SQL["image_ingest"] = """
        WITH imgs AS (
            SELECT doc_id,
                   16 + doc_id % 5 AS h,
                   24 + doc_id % 3 AS w
            FROM documents WHERE doc_id % 25 = 0
        ),
        px AS (
            SELECT doc_id, h, w, i, j,
                   (doc_id * 7
                    + LEAST((i * h) // 8, h - 1) * 13
                    + LEAST((j * w) // 12, w - 1) * 29) % 256 AS v
            FROM imgs,
                 UNNEST(GENERATE_SERIES(0, 7)) AS a(i),
                 UNNEST(GENERATE_SERIES(0, 11)) AS b(j)
        )
        SELECT 'i-' || doc_id AS media_ref,
               CAST(h AS INT) AS height,
               CAST(w AS INT) AS width,
               8 AS out_h,
               12 AS out_w,
               CAST(MIN(v) AS INT) AS px_min,
               CAST(MAX(v) AS INT) AS px_max,
               CAST(SUM(v) AS BIGINT) AS px_sum,
               CAST(SUM(v * (i * 12 + j + 1)) AS BIGINT) AS px_wsum
        FROM px GROUP BY doc_id, h, w
    """
    # image_phash_dedup: construction + the 8x9 nearest-neighbor index
    # gather + the adjacent-pixel comparison bits replayed analytically
    # — every dHash bit is integer-derived, so matching group rows
    # prove the PNG round-trip and the dHash kernel bit-for-bit
    _ORACLE_SQL["image_phash_dedup"] = """
        WITH imgs AS (
            SELECT doc_id,
                   (doc_id // 5) % 5 AS g,
                   16 + ((doc_id // 5) % 5) % 5 AS h,
                   24 + ((doc_id // 5) % 5) % 3 AS w
            FROM documents WHERE doc_id % 5 = 0
        ),
        tpix AS (
            SELECT doc_id, i, j,
                   (g * 37
                    + LEAST((i * h) // 8, h - 1) * 13
                    + LEAST((j * w) // 9, w - 1) * 29) % 200
                   + doc_id % 40 AS p
            FROM imgs,
                 UNNEST(GENERATE_SERIES(0, 7)) AS a(i),
                 UNNEST(GENERATE_SERIES(0, 8)) AS b(j)
        ),
        bits AS (
            SELECT doc_id, i, j,
                   CASE WHEN p < LEAD(p) OVER (
                            PARTITION BY doc_id, i ORDER BY j)
                        THEN '1' ELSE '0' END AS bt
            FROM tpix
        ),
        hashes AS (
            SELECT doc_id, STRING_AGG(bt, '' ORDER BY i, j) AS dhash
            FROM bits WHERE j < 8 GROUP BY doc_id
        )
        SELECT dhash,
               COUNT(*) AS n_imgs,
               MIN(doc_id) AS min_doc_id,
               COUNT(DISTINCT doc_id % 40) AS n_offsets
        FROM hashes GROUP BY dhash
    """
    # dsir_weights: same md5-prefix bucket family, same add-one
    # smoothed log ratio rounded once to integer micro-nats (so the
    # per-doc sums are exact BIGINT arithmetic in both engines)
    _ORACLE_SQL["dsir_weights"] = f"""
        WITH toks AS (
            SELECT doc_id, source, t FROM (
                SELECT doc_id, source,
                       UNNEST(STRING_SPLIT(text, ' ')) AS t
                FROM documents
            ) WHERE t <> ''
        ),
        b AS (
            SELECT doc_id, source,
                   CAST(('0x' || SUBSTRING(MD5(t), 1, 8))::UBIGINT
                        AS BIGINT) % {DSIR_BUCKETS} AS bucket
            FROM toks
        ),
        counts AS (
            SELECT bucket, COUNT(*) AS cs,
                   SUM(CASE WHEN source = '{DSIR_TARGET_SOURCE}'
                            THEN 1 ELSE 0 END) AS ct
            FROM b GROUP BY bucket
        ),
        tot AS (SELECT SUM(cs) AS ts, SUM(ct) AS tt FROM counts),
        lr AS (
            SELECT bucket,
                   CAST(ROUND((LN(ct + 1) - LN(tt + {DSIR_BUCKETS})
                               - LN(cs + 1) + LN(ts + {DSIR_BUCKETS}))
                              * 1000000) AS BIGINT) AS lr
            FROM counts, tot
        ),
        scores AS (
            SELECT b.doc_id, COUNT(*) AS n_tokens, SUM(lr.lr) AS w
            FROM b JOIN lr USING (bucket)
            GROUP BY b.doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(s.n_tokens, 0) AS INT) AS n_tokens,
               CAST(COALESCE(s.w, 0) AS BIGINT) AS dsir_weight_micro
        FROM documents d LEFT JOIN scores s ON d.doc_id = s.doc_id
    """
    # bloom_prefilter: identical hash family (disjoint md5 substrings
    # mod M) and 32-bit word packing; the oracle probes by joining the
    # word table instead of a literal array — same semantics
    _ORACLE_SQL["bloom_prefilter"] = f"""
        WITH hashes AS (SELECT UNNEST(GENERATE_SERIES(0, {BLOOM_K - 1})) AS i),
        seen AS (
            SELECT MD5(text) AS h FROM documents WHERE doc_id % 2 = 0
        ),
        pos AS (
            SELECT CAST(('0x' || SUBSTRING(seen.h, 1 + 8 * i, 8))::UBIGINT
                        AS BIGINT) % {BLOOM_M} AS p
            FROM seen CROSS JOIN hashes
        ),
        words AS (
            SELECT p // {BLOOM_W} AS w,
                   BIT_OR(CAST(1 AS BIGINT) << CAST(p % {BLOOM_W} AS INT))
                       AS bits
            FROM pos GROUP BY p // {BLOOM_W}
        ),
        probe AS (
            SELECT doc_id, MD5(text) AS h FROM documents WHERE doc_id % 2 = 1
            UNION ALL
            SELECT doc_id + 10000000, MD5(text) FROM documents
            WHERE doc_id % 2 = 0 AND doc_id % 100 = 8
        ),
        ppos AS (
            SELECT doc_id, i,
                   CAST(('0x' || SUBSTRING(h, 1 + 8 * i, 8))::UBIGINT
                        AS BIGINT) % {BLOOM_M} AS p
            FROM probe CROSS JOIN hashes
        ),
        hit AS (
            SELECT doc_id, i,
                   COALESCE(MAX((bits >> CAST(p % {BLOOM_W} AS INT)) & 1), 0)
                       AS b
            FROM ppos LEFT JOIN words ON p // {BLOOM_W} = w
            GROUP BY doc_id, i
        )
        SELECT doc_id, CAST(MIN(b) AS INT) AS might_contain
        FROM hit GROUP BY doc_id
    """
    # event_hourly_stream: the batch rollup restricted to the
    # watermark-emitted set (window_end <= max(ts) - 1 hour)
    _ORACLE_SQL["event_hourly_stream"] = """
        SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M:%S')
                   AS hour,
               event_type,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 4) AS sum_value
        FROM events
        GROUP BY DATE_TRUNC('hour', ts), event_type
        HAVING DATE_TRUNC('hour', ts) + INTERVAL 1 HOUR
               <= (SELECT MAX(ts) FROM events) - INTERVAL 1 HOUR
    """
    # domain_cap: same Lehmer order + per-source rank
    _ORACLE_SQL["domain_cap"] = f"""
        SELECT doc_id, source, CAST(rank AS INT) AS rank,
               CAST(CASE WHEN rank <= {DOMAIN_CAP_N} THEN 1 ELSE 0 END
                    AS INT) AS kept
        FROM (
            SELECT doc_id, source,
                   ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY (doc_id % 1000003) * 48271 % 2147483647,
                                doc_id
                   ) AS rank
            FROM documents
        )
    """
    # corpus_profile: quantile_cont == Spark percentile (both linear
    # interpolation); SUM(BIGINT-ish) cast per the HUGEINT rule
    _ORACLE_SQL["corpus_profile"] = """
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT) AS n_tokens,
               ROUND(AVG(n_chars), 4) AS mean_chars,
               ROUND(QUANTILE_CONT(n_chars, 0.5), 4) AS p50_chars,
               ROUND(QUANTILE_CONT(n_chars, 0.9), 4) AS p90_chars,
               ROUND(QUANTILE_CONT(n_chars, 0.99), 4) AS p99_chars
        FROM documents GROUP BY source
    """
    # crawl_quota_stream: the availableNow replay equals the batch
    # arrival-order window exactly (single batch, kernel ranks by
    # doc_id) — that batch window IS the oracle
    _ORACLE_SQL["crawl_quota_stream"] = """
        SELECT doc_id, source,
               CAST(ROW_NUMBER() OVER (PARTITION BY source
                    ORDER BY doc_id) AS BIGINT) AS rank,
               CAST(CASE WHEN ROW_NUMBER() OVER (PARTITION BY source
                    ORDER BY doc_id) <= 15 THEN 1 ELSE 0 END
                    AS INTEGER) AS kept
        FROM documents
    """
    # event_sessions_custom: independent gaps-and-islands + the
    # emission predicate (closed-by-event OR timeout-closed)
    _ORACLE_SQL["event_sessions_custom"] = """
        WITH ev AS (
            SELECT * FROM events WHERE user_id % 3 = 0
        ), o AS (
            SELECT user_id, event_id, ts, value,
                   LAG(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev
            FROM ev
        ), m AS (
            SELECT user_id, event_id, ts, value,
                   CASE WHEN prev IS NULL OR
                        DATE_DIFF('microseconds', prev, ts) >= 1801000000
                        THEN 1 ELSE 0 END AS new_s
            FROM o
        ), g AS (
            SELECT *, SUM(new_s) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
                       AS sess
            FROM m
        ), s AS (
            SELECT user_id, sess,
                   MIN(ts) AS session_start, MAX(ts) AS session_end,
                   COUNT(*) AS n_events,
                   ROUND(SUM(value), 4) AS sum_value
            FROM g GROUP BY user_id, sess
        ), mx AS (SELECT MAX(ts) AS mt FROM ev)
        SELECT user_id,
               STRFTIME(session_start, '%Y-%m-%d %H:%M:%S.%f')
                   AS session_start,
               STRFTIME(session_end, '%Y-%m-%d %H:%M:%S.%f')
                   AS session_end,
               n_events, sum_value
        FROM s CROSS JOIN mx
        WHERE sess < (SELECT MAX(s2.sess) FROM s s2
                      WHERE s2.user_id = s.user_id)
           OR session_end + INTERVAL 1801 SECOND <= mt - INTERVAL 1 HOUR
    """


_install_pipeline_oracles()


def _install_sketch_join_oracles() -> None:
    """count_min_topk / interval_join / similarity_join: the sketch
    replayed register-for-register, the range join restated as a plain
    theta join (DuckDB plans BETWEEN natively — an independent
    physical strategy), and the prefix-filter join restated as
    brute-force all-pairs (the O(n^2) formulation prefix filtering
    exists to avoid — feasible at oracle scale, and exactly the
    semantics the exact join must reproduce)."""
    duck_idx = (
        f"((h // power({CMS_W}, js.j)::BIGINT) % {CMS_W})"
    )
    duck_h = (
        "CAST(('0x' || substring(md5(item), 1, 13))::UBIGINT AS BIGINT)"
    )
    _ORACLE_SQL["count_min_topk"] = f"""
        WITH js AS (SELECT j FROM generate_series(0, {CMS_D - 1}) t(j)),
        toks AS (
            SELECT string_split(text, ' ') AS ts FROM documents
        ),
        items AS (
            SELECT unnest(CASE WHEN len(ts) >= 2 THEN list_transform(
                       generate_series(1, len(ts) - 1),
                       i -> ts[i] || ' ' || ts[i + 1]) ELSE [] END) AS item
            FROM toks
        ),
        hashed AS (SELECT item, {duck_h} AS h FROM items),
        upd AS (
            SELECT js.j, {duck_idx} AS idx FROM hashed CROSS JOIN js
        ),
        sketch AS (
            SELECT j, idx, COUNT(*) AS c FROM upd GROUP BY 1, 2
        ),
        cand AS (
            SELECT item, {duck_h} AS h, COUNT(*) AS n_exact
            FROM items GROUP BY 1, 2
        ),
        probes AS (
            SELECT item, n_exact, js.j, {duck_idx} AS idx
            FROM cand CROSS JOIN js
        )
        SELECT item, CAST(MIN(c) AS BIGINT) AS est,
               CAST(n_exact AS BIGINT) AS n_exact
        FROM probes JOIN sketch USING (j, idx)
        GROUP BY item, n_exact
        ORDER BY est DESC, item ASC
        LIMIT 20
    """
    _ORACLE_SQL["interval_join"] = f"""
        WITH mn AS (SELECT MIN(ts) AS m FROM events),
        iv AS (
            SELECT i AS interval_id,
                   i * {IVJ_STRIDE_US} AS lo,
                   i * {IVJ_STRIDE_US} + {IVJ_WIDTH_US} AS hi
            FROM generate_series(0, {IVJ_N - 1}) t(i)
        ),
        ev AS (
            SELECT user_id, value,
                   DATE_DIFF('microseconds', mn.m, ts) AS us
            FROM events CROSS JOIN mn
        )
        SELECT interval_id,
               COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users,
               ROUND(SUM(value), 4) AS sum_value
        FROM ev JOIN iv ON us BETWEEN lo AND hi
        GROUP BY interval_id
    """
    _ORACLE_SQL["similarity_join"] = f"""
        WITH s AS (
            SELECT doc_id,
                   LIST_DISTINCT(LIST_TRANSFORM(
                       LIST_TRANSFORM(
                           GENERATE_SERIES(1, GREATEST(
                               LEN(STRING_SPLIT(text, ' ')) - 2, 1)),
                           i -> ARRAY_TO_STRING(
                               STRING_SPLIT(text, ' ')[i:i+2], ' ')),
                       s -> CAST(('0x' || SUBSTRING(MD5(s), 1, 15))::UBIGINT
                                 AS BIGINT) % {MINHASH_P})) AS st
            FROM documents
            WHERE len(string_split(text, ' ')) >= 3
        ),
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   len(list_intersect(a.st, b.st)) AS n_inter,
                   len(a.st) + len(b.st) - len(list_intersect(a.st, b.st))
                       AS n_union
            FROM s a JOIN s b ON a.doc_id < b.doc_id
        )
        SELECT doc_a, doc_b,
               CAST(n_inter AS BIGINT) AS n_inter,
               CAST(n_union AS BIGINT) AS n_union,
               ROUND(CAST(n_inter AS DOUBLE) / n_union, 6) AS jaccard
        FROM pairs
        WHERE n_inter * {SSJ_T_DEN} >= n_union * {SSJ_T_NUM}
    """


_install_sketch_join_oracles()


def _install_embed_curation_oracles() -> None:
    """cluster_sample / embed_rproj: assignment + windowed sampling
    restated over DuckDB's native LIST_DOT_PRODUCT (the Spark side
    uses the sequential-fold _dot64 — the same cross-engine pair the
    IVF gate bit-matched), and the sign projection replayed from the
    same md5-derived literal matrix (a model constant computed once at
    import, identical bytes in both engines)."""
    cap = (
        f"(({CLUSTER_SAMPLE_NUM} * n_c + {CLUSTER_SAMPLE_DEN - 1})"
        f" // {CLUSTER_SAMPLE_DEN})"
    )
    _ORACLE_SQL["cluster_sample"] = f"""
        WITH cb AS (
            SELECT CAST(vec_id AS INT) AS cent_id,
                   CAST(embedding AS DOUBLE[]) AS cent_vec
            FROM embeddings WHERE vec_id < {CLUSTER_SAMPLE_K}
        ),
        s AS (
            SELECT e.vec_id, c.cent_id,
                   LIST_DOT_PRODUCT(CAST(e.embedding AS DOUBLE[]),
                                    c.cent_vec) AS cdot
            FROM embeddings e CROSS JOIN cb c
        ),
        a AS (
            SELECT vec_id, cent_id AS cluster FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY vec_id ORDER BY cdot DESC, cent_id ASC) AS rn
                FROM s
            ) WHERE rn = 1
        ),
        r AS (
            SELECT vec_id, cluster,
                   ROW_NUMBER() OVER (PARTITION BY cluster ORDER BY
                       (vec_id % 1000003) * 48271 % 2147483647, vec_id) AS rk,
                   COUNT(*) OVER (PARTITION BY cluster) AS n_c
            FROM a
        )
        SELECT vec_id, CAST(cluster AS BIGINT) AS cluster,
               CAST(rk AS BIGINT) AS rk, CAST(n_c AS BIGINT) AS n_c,
               CASE WHEN rk <= {cap} THEN 1 ELSE 0 END AS kept,
               ROUND(CASE WHEN rk <= {cap}
                     THEN CAST(n_c AS DOUBLE) / {cap}
                     ELSE 0.0 END, 6) AS weight
        FROM r
    """
    signs_sql = (
        "["
        + ", ".join(
            "[" + ", ".join(str(s) for s in row) + "]" for row in _rproj_signs()
        )
        + "]"
    )
    _ORACLE_SQL["embed_rproj"] = f"""
        WITH q AS (
            SELECT vec_id,
                   list_transform(CAST(embedding AS DOUBLE[]),
                       x -> CAST(FLOOR(x * {RPROJ_SCALE}.0) AS BIGINT)) AS xq
            FROM embeddings
        ),
        js AS (SELECT j FROM generate_series(0, {RPROJ_K - 1}) t(j))
        SELECT vec_id, CAST(js.j AS BIGINT) AS j,
               CAST(list_sum(list_transform(generate_series(1, {RPROJ_D}),
                   i -> xq[i] * ({signs_sql})[js.j + 1][i])) AS BIGINT) AS y
        FROM q CROSS JOIN js
    """


_install_embed_curation_oracles()


def _install_skew_join_oracle() -> None:
    """skew_join: the plain unsalted join + aggregate — the gate proves
    the salting rewrite is semantics-preserving."""
    _ORACLE_SQL["skew_join"] = """
        WITH ev AS (
            SELECT event_id, value,
                   CASE WHEN user_id % 10 < 7 THEN CAST(0 AS BIGINT)
                        ELSE user_id END AS k
            FROM events
        ),
        dim AS (SELECT DISTINCT k, k % 7 AS category FROM ev)
        SELECT category,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 4) AS sum_value
        FROM ev JOIN dim USING (k)
        GROUP BY category
    """


_install_skew_join_oracle()


def _install_infra_oracles() -> None:
    """shard_assign / partial_agg_merge: the rendezvous argmax replayed
    with DuckDB's list functions over the same md5-derived hashes, and
    the partial-vs-direct aggregation law recomputed independently."""

    def duck_hrw(n: int) -> str:
        cells = ", ".join(
            "CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '#' ||"
            f" '{s}'), 1, 13))::UBIGINT AS BIGINT)"
            for s in range(n)
        )
        return (
            f"(list_position([{cells}], list_max([{cells}])) - 1)"
        )

    _ORACLE_SQL["shard_assign"] = f"""
        SELECT doc_id,
               CAST({duck_hrw(HRW_N_OLD)} AS BIGINT) AS shard_old,
               CAST({duck_hrw(HRW_N_NEW)} AS BIGINT) AS shard_new,
               CASE WHEN {duck_hrw(HRW_N_OLD)} != {duck_hrw(HRW_N_NEW)}
                    THEN 1 ELSE 0 END AS moved
        FROM documents
    """
    _ORACLE_SQL["partial_agg_merge"] = """
        WITH ev AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(FLOOR(value * 100) AS BIGINT) AS v
            FROM events
        ),
        partials AS (
            SELECT event_type, day, COUNT(*) AS n,
                   CAST(SUM(v) AS BIGINT) AS s,
                   MIN(v) AS mn, MAX(v) AS mx
            FROM ev GROUP BY 1, 2
        ),
        merged AS (
            SELECT event_type,
                   CAST(SUM(n) AS BIGINT) AS n_merged,
                   CAST(SUM(s) AS BIGINT) AS sum_merged,
                   MIN(mn) AS min_merged, MAX(mx) AS max_merged
            FROM partials GROUP BY 1
        ),
        direct AS (
            SELECT event_type,
                   COUNT(*) AS n_direct,
                   CAST(SUM(v) AS BIGINT) AS sum_direct,
                   MIN(v) AS min_direct, MAX(v) AS max_direct
            FROM ev GROUP BY 1
        )
        SELECT m.event_type,
               CAST(n_merged AS BIGINT) AS n_merged, sum_merged,
               min_merged, max_merged,
               CAST(n_direct AS BIGINT) AS n_direct, sum_direct,
               min_direct, max_direct,
               CASE WHEN n_merged = n_direct AND sum_merged = sum_direct
                         AND min_merged = min_direct
                         AND max_merged = max_direct
                    THEN 1 ELSE 0 END AS consistent
        FROM merged m JOIN direct d ON m.event_type = d.event_type
    """


_install_infra_oracles()


def _install_span_compaction_oracles() -> None:
    """span_lang_id / compaction_plan restated in DuckDB: the same
    half-split span synthesis + lexicon votes, and the same prefix-sum
    binning over a window."""
    common = ", ".join(f"'{w}'" for w in _SPAN_LEX_COMMON)
    tech = ", ".join(f"'{w}'" for w in _SPAN_LEX_TECH)
    _ORACLE_SQL["span_lang_id"] = f"""
        WITH halves AS (
            SELECT doc_id,
                   substring(text, 1, length(text) // 2) AS t0,
                   substring(text, length(text) // 2 + 1) AS t2
            FROM documents
        ),
        spans AS (
            SELECT doc_id, 'text' AS kind, CAST(NULL AS VARCHAR) AS media_ref,
                   0 AS "offset", t0 AS t FROM halves
            UNION ALL
            SELECT doc_id, 'media', 'm-' || CAST(doc_id AS VARCHAR), 1,
                   CAST(NULL AS VARCHAR) FROM halves
            UNION ALL
            SELECT doc_id, 'text', CAST(NULL AS VARCHAR), 2, t2 FROM halves
        )
        SELECT doc_id, kind, media_ref, CAST("offset" AS BIGINT) AS "offset",
               CASE WHEN kind = 'text' THEN CAST(len(list_filter(
                   string_split(t, ' '), x -> x IN ({common}))) AS BIGINT)
                    ELSE NULL END AS n_common,
               CASE WHEN kind = 'text' THEN CAST(len(list_filter(
                   string_split(t, ' '), x -> x IN ({tech}))) AS BIGINT)
                    ELSE NULL END AS n_tech,
               CASE WHEN kind != 'text' THEN NULL
                    WHEN len(list_filter(string_split(t, ' '),
                             x -> x IN ({common})))
                         >= len(list_filter(string_split(t, ' '),
                                x -> x IN ({tech})))
                    THEN 'common' ELSE 'tech' END AS lang_guess
        FROM spans
    """
    _ORACLE_SQL["compaction_plan"] = f"""
        WITH f AS (
            SELECT doc_id, source, n_chars AS sz,
                   SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING) AS run
            FROM documents
        ),
        b AS (
            SELECT doc_id, source, sz,
                   CAST((run - sz) // {COMPACT_TARGET} AS BIGINT) AS grp
            FROM f
        )
        SELECT source, grp, COUNT(*) AS n_files,
               CAST(SUM(sz) AS BIGINT) AS bytes,
               MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        FROM b GROUP BY 1, 2
    """


_install_span_compaction_oracles()


# streaming upsert oracle = the BATCH merge's oracle verbatim: the
# gate's claim is exactly that incremental foreachBatch merging and
# batch recompute agree
_ORACLE_SQL["crawl_upsert_stream"] = _ORACLE_SQL["crawl_upsert"]


# event_pivot oracle: conditional aggregation — the classic SQL
# formulation of a crosstab, a genuinely different decomposition from
# Spark's PivotFirst operator (two-formulation gate); generated from
# the same pinned type list so the column vocabulary cannot drift
_ORACLE_SQL["event_pivot"] = (
    "SELECT user_id, "
    + ", ".join(
        f"COALESCE(COUNT(CASE WHEN event_type = '{t}' THEN 1 END), 0)"
        f" AS {t}_n, "
        f"CAST(COALESCE(SUM(CASE WHEN event_type = '{t}' THEN cents END),"
        f" 0) AS BIGINT) AS {t}_cents"
        for t in _EVENT_TYPES
    )
    + " FROM (SELECT user_id, event_type,"
    "   CAST(floor(value * 100) AS BIGINT) AS cents FROM events)"
    " GROUP BY user_id"
)

# rolling_stats oracle: the same trailing-hour RANGE frame in DuckDB's
# window engine; date_diff('second', anchor, ts) counts boundary
# crossings = Spark timestampdiff truncation for times after the
# anchor, so the integer frame keys agree exactly
_ORACLE_SQL["rolling_stats"] = """
    SELECT event_id, user_id, ts_sec,
           COUNT(*) OVER w AS n_1h,
           CAST(SUM(cents) OVER w AS BIGINT) AS cents_1h
    FROM (SELECT event_id, user_id,
                 date_diff('second', TIMESTAMP '2024-01-01 00:00:00', ts)
                     AS ts_sec,
                 CAST(floor(value * 100) AS BIGINT) AS cents
          FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec
                 RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
"""


# cusum_drift oracle: the NAIVE sequential recursion itself — a
# recursive CTE stepping every user forward one rank per iteration
# (all users advance in lockstep, depth = max events/user).  Fine at
# oracle scale; the Spark side's prefix-min linearization is the
# scale path, and this gate proves the two agree.
_ORACLE_SQL["cusum_drift"] = f"""
    WITH RECURSIVE ranked AS (
        SELECT user_id,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn,
               CAST(floor(value * 100) AS BIGINT) - {_CUSUM_K} AS d
        FROM events
    ), walk AS (
        SELECT user_id, rn, GREATEST(d, 0) AS s
        FROM ranked WHERE rn = 1
        UNION ALL
        SELECT r.user_id, r.rn, GREATEST(w.s + r.d, 0)
        FROM walk w JOIN ranked r
          ON r.user_id = w.user_id AND r.rn = w.rn + 1
    )
    SELECT user_id,
           CAST(COUNT(CASE WHEN s > {_CUSUM_H} THEN 1 END) AS BIGINT)
               AS n_alarms,
           CAST(MAX(s) AS BIGINT) AS max_cusum,
           CAST(COALESCE(MIN(CASE WHEN s > {_CUSUM_H} THEN rn END), 0)
               AS INTEGER) AS first_alarm_rn
    FROM walk GROUP BY user_id
"""

# twap oracle: same step-function integral via lead(); ordering key is
# (truncated second, event_id) in BOTH engines, and same-second peers
# carry zero width, so the integral is tie-order-free
_ORACLE_SQL["twap"] = """
    WITH obs AS (
        SELECT user_id, event_id,
               date_diff('second', TIMESTAMP '2024-01-01 00:00:00', ts)
                   AS ts_sec,
               CAST(floor(value * 100) AS BIGINT) AS cents
        FROM events
    ), gaps AS (
        SELECT user_id, cents,
               COALESCE(LEAD(ts_sec) OVER (
                   PARTITION BY user_id ORDER BY ts_sec, event_id
               ) - ts_sec, 0) AS dur
        FROM obs
    )
    SELECT user_id,
           CAST(SUM(cents * dur) AS BIGINT) AS twap_num,
           CAST(SUM(dur) AS BIGINT) AS twap_dur,
           COUNT(*) AS n_obs
    FROM gaps GROUP BY user_id
"""


# zone_map_prune oracle: identical stats aggregation + CASE planner
# (the plan rule is shared text by construction; the SOUNDNESS of the
# rule is what tests/test_zone_map.py proves independently)
_ORACLE_SQL["zone_map_prune"] = f"""
    WITH stats AS (
        SELECT (date_diff('day', DATE '1995-01-01', l_shipdate)
                + l_orderkey % 45) // 60 AS file_id,
               COUNT(*) AS n_rows,
               CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '{_ZM_LO}'
                              AND l_shipdate <=
                                  TIMESTAMP '{_ZM_HI} 23:59:59'
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
               strftime(MIN(l_shipdate), '%Y-%m-%d') AS min_ship,
               strftime(MAX(l_shipdate), '%Y-%m-%d') AS max_ship
        FROM lineitem GROUP BY 1
    )
    SELECT file_id, n_rows, n_match, min_ship, max_ship,
           CASE WHEN max_ship < '{_ZM_LO}'
                  OR min_ship > '{_ZM_HI}' THEN 'skip'
                WHEN min_ship >= '{_ZM_LO}'
                 AND max_ship <= '{_ZM_HI}' THEN 'full'
                ELSE 'scan' END AS verdict
    FROM stats
"""


# merkle_digest oracle: identical polynomial (engine-agnostic by
# design — that's the operator's whole point); all terms positive so
# plain % == pmod; DuckDB's HUGEINT sum then one final mod
_ORACLE_SQL["merkle_digest"] = f"""
    WITH h AS (
        SELECT l_orderkey % 64 AS bucket, l_orderkey,
               ((l_orderkey % {_MERKLE_P}) * 2654435761
                + l_linenumber * 97531
                + CAST(floor(l_quantity * 100) AS BIGINT) * 1009
                + CAST(floor(l_extendedprice * 100) AS BIGINT) * 31)
               % {_MERKLE_P} AS hh
        FROM lineitem
    )
    SELECT bucket, COUNT(*) AS n_rows,
           CAST(SUM(hh) % {_MERKLE_P} AS BIGINT) AS digest,
           MIN(l_orderkey) AS min_key, MAX(l_orderkey) AS max_key
    FROM h GROUP BY bucket
"""

# fill_forward oracle: DuckDB's own IGNORE NULLS frame — same class
# of window engine feature, independent implementation
_ORACLE_SQL["fill_forward"] = """
    WITH base AS (
        SELECT event_id, user_id, ts,
               CASE WHEN event_id % 7 != 0
                    THEN CAST(floor(value * 100) AS BIGINT) END AS cents_raw
        FROM events
    )
    SELECT event_id, user_id,
           LAST_VALUE(cents_raw IGNORE NULLS) OVER w AS cents_filled,
           (cents_raw IS NULL
            AND LAST_VALUE(cents_raw IGNORE NULLS) OVER w IS NOT NULL)
               AS was_imputed
    FROM base
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""

# debounce_events oracle: the sequential rule stepped row-by-row in a
# recursive CTE (rank order = (truncated second, event_id), matching
# the kernel's sort EXACTLY — ranking by raw ts would diverge on
# same-second microsecond ties)
_ORACLE_SQL["debounce_events"] = f"""
    WITH RECURSIVE ranked AS (
        SELECT user_id, event_id,
               date_diff('second', TIMESTAMP '2024-01-01 00:00:00', ts)
                   AS sec,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id
                   ORDER BY date_diff('second',
                            TIMESTAMP '2024-01-01 00:00:00', ts),
                            event_id) AS rn
        FROM events
    ), walk AS (
        SELECT user_id, event_id, sec, rn,
               TRUE AS kept, sec AS last_kept
        FROM ranked WHERE rn = 1
        UNION ALL
        SELECT r.user_id, r.event_id, r.sec, r.rn,
               (r.sec - w.last_kept) >= {_DEBOUNCE_GAP} AS kept,
               CASE WHEN r.sec - w.last_kept >= {_DEBOUNCE_GAP}
                    THEN r.sec ELSE w.last_kept END
        FROM walk w JOIN ranked r
          ON r.user_id = w.user_id AND r.rn = w.rn + 1
    )
    SELECT event_id, user_id, CAST(sec AS BIGINT) AS ts_sec
    FROM walk WHERE kept
"""


_ORACLE_SQL["event_transitions"] = """
    WITH seq AS (
        SELECT COALESCE(LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ), '_start') AS prev_type,
               event_type AS next_type
        FROM events
    )
    SELECT prev_type, next_type, COUNT(*) AS n_trans
    FROM seq GROUP BY prev_type, next_type
"""

_ORACLE_SQL["sales_cube"] = """
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority
    FROM (SELECT o_orderstatus, o_orderpriority,
                 CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
          FROM orders)
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""

_ORACLE_SQL["stratified_sample"] = """
    WITH ranked AS (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY ((doc_id % 2147483647) * 1103515245
                             + 12345) % 2147483647,
                            doc_id) AS rn,
               GREATEST(1, COUNT(*) OVER (PARTITION BY lang) // 10)
                   AS quota
        FROM documents
    )
    SELECT doc_id, lang, CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= quota
"""


_ORACLE_SQL["cooccurrence_graph"] = """
    WITH bip AS (SELECT DISTINCT user_id, event_type FROM events)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           COUNT(*) AS n_users
    FROM bip a JOIN bip b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY 1, 2
"""

_ORACLE_SQL["survival_km"] = """
    WITH per_user AS (
        SELECT user_id,
               MIN(date_diff('second', TIMESTAMP '2024-01-01 00:00:00',
                             ts)) AS t0,
               MAX(date_diff('second', TIMESTAMP '2024-01-01 00:00:00',
                             ts)) AS t_last,
               MIN(CASE WHEN event_type = 'purchase' THEN
                   date_diff('second', TIMESTAMP '2024-01-01 00:00:00',
                             ts) END) AS t_purchase
        FROM events GROUP BY user_id
    ), durs AS (
        SELECT (CASE WHEN t_purchase IS NOT NULL
                     THEN t_purchase - t0 ELSE t_last - t0 END)
               // 86400 AS day,
               CASE WHEN t_purchase IS NOT NULL THEN 1 ELSE 0 END
                   AS event
        FROM per_user
    ), day_tbl AS (
        SELECT day,
               CAST(SUM(event) AS BIGINT) AS n_events,
               CAST(SUM(1 - event) AS BIGINT) AS n_censored
        FROM durs GROUP BY day
    )
    SELECT day,
           CAST(SUM(n_events + n_censored) OVER (
               ORDER BY day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
           ) AS BIGINT) AS n_risk,
           n_events, n_censored
    FROM day_tbl
"""


# streaming debounce oracle = the batch fold's oracle verbatim: the
# gate's claim is exactly that the streaming state machine and the
# batch applyInPandas fold implement one suppression rule
_ORACLE_SQL["debounce_stream"] = _ORACLE_SQL["debounce_events"]


# interval_coverage oracle: gaps-and-islands — flag island starts
# (start past the running frontier), number islands by cumulative
# sum, MERGE each island and measure it (max(e)-min(s)), then sum.
# A genuinely different decomposition from the Spark side's
# per-interval frontier contributions (merge-then-measure vs
# measure-while-sweeping): the two agree only if both handle touching,
# overlapping AND contained intervals correctly.
_ORACLE_SQL["interval_coverage"] = """
    WITH iv AS (
        SELECT user_id, event_id,
               date_diff('second', TIMESTAMP '2024-01-01 00:00:00', ts)
                   AS s,
               date_diff('second', TIMESTAMP '2024-01-01 00:00:00', ts)
                   + 60 + event_id % 600 AS e
        FROM events
    ), flagged AS (
        SELECT user_id, event_id, s, e,
               CASE WHEN s > COALESCE(MAX(e) OVER (
                   PARTITION BY user_id ORDER BY s, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), -1) THEN 1 ELSE 0 END AS new_island
        FROM iv
    ), islands AS (
        SELECT user_id, s, e,
               SUM(new_island) OVER (
                   PARTITION BY user_id ORDER BY s, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS isl
        FROM flagged
    ), merged AS (
        SELECT user_id, isl, MAX(e) - MIN(s) AS len, COUNT(*) AS n
        FROM islands GROUP BY user_id, isl
    )
    SELECT m.user_id,
           CAST(SUM(m.len) AS BIGINT) AS covered_sec,
           CAST(SUM(m.n) AS BIGINT) AS n_intervals,
           CAST(ANY_VALUE(sp.span) AS BIGINT) AS span_sec
    FROM merged m
    JOIN (SELECT user_id, MAX(e) - MIN(s) AS span FROM iv
          GROUP BY user_id) sp
      ON m.user_id = sp.user_id
    GROUP BY m.user_id
"""


# fd_audit oracle: same g3 measure per candidate, generated from the
# same pinned candidate list so the two sides cannot drift
_ORACLE_SQL["fd_audit"] = " UNION ALL ".join(
    f"""
    SELECT '{det}->{dep}' AS fd,
           COUNT(*) AS n_groups,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           CAST(SUM(n) - SUM(plurality) AS BIGINT) AS n_violations,
           SUM(n) = SUM(plurality) AS holds
    FROM (SELECT det, SUM(cnt) AS n, MAX(cnt) AS plurality
          FROM (SELECT {det} AS det, {dep} AS dep, COUNT(*) AS cnt
                FROM events GROUP BY 1, 2)
          GROUP BY det)
    """
    for det, dep in _FD_CANDIDATES
)


def _install_meta_oracle() -> None:
    """html_metadata: page synthesis AND extraction share one ||/CASE
    fragment string with the Spark side (functions/html.py), so the
    fixture cannot drift between engines; only the list-length
    spelling differs (len vs size)."""
    from ocular_spark.functions import html as _H

    wrapped = "(" + _H.wrap_meta("text", "doc_id", "lang", "source") + ")"
    c = _H.meta_cols(wrapped, size_fn="len")
    _ORACLE_SQL["html_metadata"] = (
        "SELECT doc_id, "
        + c["lang_attr"] + " AS lang_attr, "
        + c["title"] + " AS title, "
        + c["description"] + " AS description, "
        + c["canonical"] + " AS canonical, CAST("
        + c["n_links"] + " AS BIGINT) AS n_links FROM documents"
    )


_install_meta_oracle()


def _install_triangle_oracle() -> None:
    """link_triangles: same page synthesis + href extraction fragments
    as the pagerank oracle, same 5-clique injection, but counted by
    the NAIVE 3-way self-join on canonical undirected edges — a
    different algorithm than the Spark side's degree-oriented wedge
    probe (the two-formulation gate)."""
    from ocular_spark.functions import html as _H

    pages = (
        "pages AS (SELECT doc_id, "
        + _H.wrap_links_duckdb("text", "doc_id")
        + " AS html FROM documents)"
    )
    _ORACLE_SQL["link_triangles"] = (
        "WITH " + pages + ", "
        "ex AS (SELECT doc_id AS src, unnest("
        + _H.doc_links_expr("html")
        + ") AS d FROM pages), "
        "crawl AS (SELECT src, CAST(d AS BIGINT) AS dst FROM ex), "
        "clique AS (SELECT doc_id AS src, (doc_id // 5) * 5 + j AS dst "
        "FROM documents CROSS JOIN generate_series(0, 4) t(j)), "
        "allv AS (SELECT * FROM crawl UNION ALL SELECT * FROM clique), "
        "und AS (SELECT DISTINCT LEAST(src, dst) AS u, "
        "GREATEST(src, dst) AS v FROM allv WHERE src != dst), "
        "tri AS (SELECT a.u AS x, a.v AS y, b.v AS z FROM und a "
        "JOIN und b ON b.u = a.u AND b.v > a.v "
        "JOIN und c ON c.u = a.v AND c.v = b.v), "
        "nodes AS (SELECT x AS node FROM tri "
        "UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri) "
        "SELECT node, COUNT(*) AS n_triangles FROM nodes GROUP BY node"
    )


_install_triangle_oracle()


def _install_hll_stream_oracle() -> None:
    """hll_distinct_stream: the register table recomputed from scratch
    in DuckDB over the WHOLE corpus — streaming max-merge across
    micro-batches must equal the one-shot batch sketch exactly."""
    _ORACLE_SQL["hll_distinct_stream"] = """
        WITH toks AS (
            SELECT source, string_split(text, ' ') AS ts FROM documents
        ),
        uni AS (SELECT source, 1 AS gram, unnest(ts) AS item FROM toks),
        bi AS (
            SELECT source, 2 AS gram,
                   unnest(CASE WHEN len(ts) >= 2 THEN list_transform(
                       generate_series(1, len(ts) - 1),
                       i -> ts[i] || ' ' || ts[i + 1]) ELSE [] END) AS item
            FROM toks
        ),
        items AS (
            SELECT * FROM uni WHERE item != ''
            UNION ALL SELECT * FROM bi
        ),
        hashed AS (
            SELECT source, gram,
                   CAST(('0x' || substring(md5(item), 1, 4))::UBIGINT
                        AS BIGINT) % 64 AS idx,
                   CAST(('0x' || substring(md5(item), 5, 13))::UBIGINT
                        AS BIGINT) AS x
            FROM items
        )
        SELECT source, CAST(gram AS BIGINT) AS gram,
               CAST(idx AS BIGINT) AS idx,
               CAST(MAX(CASE WHEN x = 0 THEN 53
                             ELSE length(bin(x & -x)) END) AS BIGINT) AS r
        FROM hashed GROUP BY 1, 2, 3
    """


_install_hll_stream_oracle()


def _install_vocab_growth_oracle() -> None:
    """vocab_growth: the same first-occurrence formulation (the naive
    per-prefix COUNT DISTINCT would also work at oracle scale, but
    per-decile boundaries make first-occurrence equally simple)."""
    _ORACLE_SQL["vocab_growth"] = f"""
        WITH nd AS (SELECT COUNT(*) AS n FROM documents),
        pd AS (SELECT GREATEST(1, n // {VOCAB_DECILES}) AS p FROM nd),
        toks AS (
            SELECT doc_id, string_split(text, ' ') AS ts FROM documents
        ),
        uni AS (
            SELECT doc_id, 1 AS gram, unnest(ts) AS item FROM toks
        ),
        bi AS (
            SELECT doc_id, 2 AS gram,
                   unnest(CASE WHEN len(ts) >= 2 THEN list_transform(
                       generate_series(1, len(ts) - 1),
                       i -> ts[i] || ' ' || ts[i + 1]) ELSE [] END) AS item
            FROM toks
        ),
        items AS (
            SELECT * FROM uni WHERE item != ''
            UNION ALL SELECT * FROM bi
        ),
        first AS (
            SELECT gram, item, MIN(doc_id) AS first_doc
            FROM items GROUP BY 1, 2
        ),
        hist AS (
            SELECT gram,
                   LEAST(first_doc // (SELECT p FROM pd),
                         {VOCAB_DECILES - 1}) AS decile,
                   COUNT(*) AS new_items
            FROM first GROUP BY 1, 2
        )
        SELECT CAST(gram AS BIGINT) AS gram, decile,
               CAST(new_items AS BIGINT) AS new_items,
               CAST(SUM(new_items) OVER (PARTITION BY gram ORDER BY decile
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_items
        FROM hist
    """


_install_vocab_growth_oracle()


def _install_exact_quantile_oracle() -> None:
    """exact_quantile: oracle-scale formulation = ROW_NUMBER over the
    sorted values (fine at sf0.01; the Spark side must NOT sort — that
    is the point).  k uses the same exact-rational ceil as the Spark
    driver loop."""
    vals = ", ".join(f"('{lab}', {num}, {den})"
                     for lab, num, den in QUANTILE_TARGETS)
    _ORACLE_SQL["exact_quantile"] = f"""
        WITH q AS (
            SELECT CAST(floor(value * 1000000) AS BIGINT) AS v FROM events
        ),
        n AS (SELECT COUNT(*) AS c FROM q),
        r AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS rn FROM q),
        ks AS (
            SELECT p_label, CAST((num * c + den - 1) // den AS BIGINT) AS k
            FROM (VALUES {vals}) t(p_label, num, den) CROSS JOIN n
        )
        SELECT ks.p_label AS p_label, ks.k AS k, r.v AS quantile_v
        FROM ks JOIN r ON r.rn = ks.k
    """


_install_exact_quantile_oracle()


def _install_zorder_oracle() -> None:
    """zorder_layout: the SAME Morton algebra emitted by _morton_expr,
    with DuckDB's << as the shift formatter — a genuinely independent
    evaluation engine over an identical bit-twiddling formula."""
    shl = lambda e, n: f"({e} << {n})"  # noqa: E731
    x = "(((user_id % 65536) + 65536) % 65536)"
    y = "(((CAST(floor(value * 100) AS BIGINT) % 65536) + 65536) % 65536)"
    z = _morton_expr(x, y, shl)
    _ORACLE_SQL["zorder_layout"] = f"""
        WITH p AS (
            SELECT {x} AS x16, {y} AS y16, {z} AS zval FROM events
        )
        SELECT CAST(zval // {ZORDER_FILE_DIV} AS BIGINT) AS file_id,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               MIN(x16) AS x_min, MAX(x16) AS x_max,
               MIN(y16) AS y_min, MAX(y16) AS y_max,
               MIN(zval) AS z_min, MAX(zval) AS z_max
        FROM p GROUP BY 1
    """


_install_zorder_oracle()


def _install_funnel_retention_oracles() -> None:
    """funnel_steps: the min-chain formulation (t1 = min view, t2 = min
    click after t1, t3 = min purchase after t2) — provably equal to the
    Spark side's greedy sorted fold.  retention_cohorts: direct
    relational recomputation.  Both share the interval_join oracle's
    exact-microsecond-offset time base."""
    _ORACLE_SQL["funnel_steps"] = f"""
        WITH mn AS (SELECT MIN(ts) AS m FROM events),
        ev AS (
            SELECT user_id, event_type,
                   DATE_DIFF('microseconds', mn.m, ts) AS us
            FROM events CROSS JOIN mn
            WHERE event_type IN ('view', 'click', 'purchase')
        ),
        u AS (SELECT DISTINCT user_id FROM ev),
        s1 AS (
            SELECT user_id, MIN(us) AS t1 FROM ev
            WHERE event_type = 'view' GROUP BY 1
        ),
        s2 AS (
            SELECT e.user_id, MIN(e.us) AS t2
            FROM ev e JOIN s1 USING (user_id)
            WHERE e.event_type = 'click' AND e.us > s1.t1 GROUP BY 1
        ),
        s3 AS (
            SELECT e.user_id, MIN(e.us) AS t3
            FROM ev e JOIN s2 USING (user_id)
            WHERE e.event_type = 'purchase' AND e.us > s2.t2 GROUP BY 1
        )
        SELECT u.user_id,
               COALESCE(s1.t1, -1) AS t_view,
               COALESCE(s2.t2, -1) AS t_click,
               COALESCE(s3.t3, -1) AS t_purchase,
               CAST((s1.t1 IS NOT NULL)::INT + (s2.t2 IS NOT NULL)::INT
                    + (s3.t3 IS NOT NULL)::INT AS BIGINT) AS steps_reached
        FROM u
        LEFT JOIN s1 USING (user_id)
        LEFT JOIN s2 USING (user_id)
        LEFT JOIN s3 USING (user_id)
    """
    _ORACLE_SQL["retention_cohorts"] = f"""
        WITH mn AS (SELECT MIN(ts) AS m FROM events),
        uw AS (
            SELECT DISTINCT user_id,
                   DATE_DIFF('microseconds', mn.m, ts)
                       // {RETENTION_WEEK_US} AS week
            FROM events CROSS JOIN mn
        ),
        cohort AS (
            SELECT user_id, MIN(week) AS cohort_week FROM uw GROUP BY 1
        ),
        sizes AS (
            SELECT cohort_week, COUNT(*) AS cohort_size
            FROM cohort GROUP BY 1
        )
        SELECT CAST(c.cohort_week AS BIGINT) AS cohort_week,
               CAST(uw.week - c.cohort_week AS BIGINT) AS week_offset,
               CAST(COUNT(*) AS BIGINT) AS n_active,
               CAST(s.cohort_size AS BIGINT) AS cohort_size
        FROM uw
        JOIN cohort c USING (user_id)
        JOIN sizes s ON s.cohort_week = c.cohort_week
        GROUP BY 1, 2, 4
    """


_install_funnel_retention_oracles()


def _install_group_quantile_oracle() -> None:
    """group_quantile: per-group ROW_NUMBER formulation with the same
    exact-rational k."""
    vals = ", ".join(f"('{lab}', {num}, {den})"
                     for lab, num, den in GROUP_QUANTILE_TARGETS)
    _ORACLE_SQL["group_quantile"] = f"""
        WITH q AS (
            SELECT event_type AS g,
                   CAST(floor(value * 1000000) AS BIGINT) AS v
            FROM events
        ),
        n AS (SELECT g, COUNT(*) AS c FROM q GROUP BY 1),
        r AS (
            SELECT g, v,
                   ROW_NUMBER() OVER (PARTITION BY g ORDER BY v) AS rn
            FROM q
        ),
        ks AS (
            SELECT n.g, p_label,
                   CAST((num * c + den - 1) // den AS BIGINT) AS k
            FROM (VALUES {vals}) t(p_label, num, den) CROSS JOIN n
        )
        SELECT ks.g AS event_type, ks.p_label AS p_label, ks.k AS k,
               r.v AS quantile_v
        FROM ks JOIN r ON r.g = ks.g AND r.rn = ks.k
    """


_install_group_quantile_oracle()


def _install_scd2_oracle() -> None:
    """scd2_history: the same version synthesis as crawl_upsert's
    oracle, windowed into validity intervals."""
    _ORACLE_SQL["scd2_history"] = """
        WITH allv AS (
            SELECT doc_id, 0 AS crawl_id,
                   1700000000 + doc_id AS fetch_ts,
                   MD5(text) AS content_digest
            FROM documents
            UNION ALL
            SELECT doc_id, 1, 1700500000 + doc_id,
                   MD5(text || ' v2')
            FROM documents WHERE doc_id % 4 = 1
            UNION ALL
            SELECT doc_id + 100000, 1, 1700500000 + doc_id,
                   MD5('new:' || text)
            FROM documents WHERE doc_id % 10 = 3
        ),
        v AS (
            SELECT doc_id, crawl_id, fetch_ts, content_digest,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                       ORDER BY fetch_ts, crawl_id) AS version_seq,
                   LEAD(fetch_ts) OVER (PARTITION BY doc_id
                       ORDER BY fetch_ts, crawl_id) AS nxt
            FROM allv
        )
        SELECT doc_id,
               CAST(version_seq AS BIGINT) AS version_seq,
               CAST(crawl_id AS BIGINT) AS crawl_id,
               CAST(fetch_ts AS BIGINT) AS valid_from,
               CAST(COALESCE(nxt, -1) AS BIGINT) AS valid_to,
               CAST((nxt IS NULL)::INT AS BIGINT) AS is_current,
               content_digest
        FROM v
    """


_install_scd2_oracle()


def _install_heavy_hitters_oracle() -> None:
    # heavy_hitters: the oracle is the plain corpus-wide GROUP BY +
    # HAVING the two-pass operator exists to avoid — exactness of the
    # MG-candidates + recount path IS the gate.  Same token stream,
    # same md5-derived synthetic Zipf head (DuckDB's scalar
    # generate_series(1, m) accepts column bounds where the TABLE
    # function refuses lateral parameters), same integer threshold.
    _ORACLE_SQL["heavy_hitters"] = f"""
        WITH toks AS (
            SELECT unnest(string_split(text, ' ')) AS item FROM documents
        ),
        hot AS (
            SELECT unnest(list_transform(generate_series(1,
                       CASE WHEN CAST(('0x' || substring(md5(
                                CAST(doc_id AS VARCHAR) || '#hh' ||
                                CAST(v AS VARCHAR)), 1, 13))::UBIGINT
                            AS BIGINT) % 4 = 0
                            THEN 1 ELSE (1 << ({HH_LEVELS - 1} - v)) END),
                   j -> 'hot_' || CAST(v AS VARCHAR))) AS item
            FROM documents, generate_series(0, {HH_LEVELS - 1}) t(v)
        ),
        stream AS (
            SELECT item FROM toks UNION ALL SELECT item FROM hot
        ),
        counts AS (SELECT item, COUNT(*) AS cnt FROM stream GROUP BY item),
        tot AS (SELECT SUM(cnt) AS n FROM counts)
        SELECT item, CAST(cnt AS BIGINT) AS cnt, CAST(n AS BIGINT) AS n_stream
        FROM counts CROSS JOIN tot
        WHERE cnt * {HH_K + 1} > n
    """


_install_heavy_hitters_oracle()


def _install_pmi_oracle() -> None:
    # pmi_collocations: same bigram/unigram counts, same one-order
    # DOUBLE assembly of the PMI ratio (ln of identical IEEE doubles,
    # rounded at 6 dp — the bm25_topk float discipline).
    _ORACLE_SQL["pmi_collocations"] = f"""
        WITH t AS (SELECT string_split(text, ' ') AS ts FROM documents),
        tot AS (
            SELECT CAST(SUM(len(ts)) AS BIGINT) AS n_uni,
                   CAST(SUM(GREATEST(len(ts) - 1, 0)) AS BIGINT) AS n_big
            FROM t
        ),
        big AS (
            SELECT unnest(CASE WHEN len(ts) >= 2 THEN list_transform(
                       generate_series(1, len(ts) - 1),
                       i -> {{'w1': ts[i], 'w2': ts[i + 1]}}) ELSE [] END)
                   AS bg
            FROM t
        ),
        cxy AS (
            SELECT bg.w1 AS w1, bg.w2 AS w2, COUNT(*) AS cnt
            FROM big GROUP BY 1, 2 HAVING COUNT(*) >= {PMI_MIN_COUNT}
        ),
        uni AS (SELECT unnest(ts) AS w FROM t),
        cu AS (SELECT w, COUNT(*) AS cw FROM uni GROUP BY w)
        SELECT w1, w2, CAST(cnt AS BIGINT) AS cnt,
               ROUND(LN((CAST(cnt AS DOUBLE) * n_uni * n_uni) /
                        (CAST(n_big AS DOUBLE) * u1.cw * u2.cw)), 6) AS pmi
        FROM cxy
        JOIN cu u1 ON u1.w = cxy.w1
        JOIN cu u2 ON u2.w = cxy.w2
        CROSS JOIN tot
    """


_install_pmi_oracle()


def _install_robust_outliers_oracle() -> None:
    # robust_outliers: the oracle computes the SAME lower-median
    # (k = ceil(n/2)-th order statistic) via window ranks — the
    # full-sort formulation the histogram-refinement kernel avoids.
    _ORACLE_SQL["robust_outliers"] = f"""
        WITH d AS (
            SELECT doc_id, lang,
                   n_chars + CASE WHEN doc_id % {RO_CONTAM_MOD} = 0
                                  THEN {RO_CONTAM_SHIFT} ELSE 0 END AS x
            FROM documents
        ),
        r AS (
            SELECT lang, x,
                   ROW_NUMBER() OVER (PARTITION BY lang ORDER BY x) AS rn,
                   COUNT(*) OVER (PARTITION BY lang) AS n
            FROM d
        ),
        med AS (
            SELECT lang, MIN(x) AS med FROM r
            WHERE rn = (n + 1) // 2 GROUP BY lang
        ),
        dev AS (
            SELECT d.lang, ABS(d.x - med.med) AS dv
            FROM d JOIN med USING (lang)
        ),
        r2 AS (
            SELECT lang, dv,
                   ROW_NUMBER() OVER (PARTITION BY lang ORDER BY dv) AS rn,
                   COUNT(*) OVER (PARTITION BY lang) AS n
            FROM dev
        ),
        mad AS (
            SELECT lang, MIN(dv) AS mad FROM r2
            WHERE rn = (n + 1) // 2 GROUP BY lang
        )
        SELECT d.doc_id, d.lang, CAST(d.x AS BIGINT) AS x,
               CAST(med.med AS BIGINT) AS med, CAST(mad.mad AS BIGINT) AS mad
        FROM d JOIN med USING (lang) JOIN mad USING (lang)
        WHERE ABS(d.x - med.med) > {RO_FENCE} * mad.mad
    """


_install_robust_outliers_oracle()


def _install_weighted_sample_oracle() -> None:
    # weighted_sample: identical md5 draw, identical ln(u)/w key,
    # identical (key DESC, doc_id) cut.  Keys of adjacent ranks differ
    # by ~1/n — far beyond any ln() ulp divergence between engines.
    _ORACLE_SQL["weighted_sample"] = f"""
        WITH d AS (
            SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS w,
                   LN((CAST(('0x' || substring(md5(
                         CAST(doc_id AS VARCHAR) || '#ws0'), 1, 13))::UBIGINT
                       AS BIGINT) + 1) / {WS_U53}) / w AS es_key
            FROM documents WHERE n_chars > 0
        )
        SELECT doc_id, lang, w, ROUND(es_key, 9) AS es_key
        FROM d ORDER BY es_key DESC, doc_id ASC LIMIT {WS_K}
    """


_install_weighted_sample_oracle()


def _install_group_topk_oracle() -> None:
    # group_topk: the oracle is the full window-rank formulation the
    # two-stage operator avoids; same (score DESC, doc_id ASC) order.
    _ORACLE_SQL["group_topk"] = f"""
        WITH r AS (
            SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS score,
                   ROW_NUMBER() OVER (PARTITION BY lang
                       ORDER BY n_chars DESC, doc_id ASC) AS rank
            FROM documents
        )
        SELECT lang, CAST(rank AS BIGINT) AS rank, doc_id, score
        FROM r WHERE rank <= {GTK_K}
    """


_install_group_topk_oracle()


def _install_selection_oracles() -> None:
    # ecdf_normalize: the oracle uses the window-rank formulation the
    # broadcast-CDF operator avoids (RANK()-1 == #rows strictly below).
    _ORACLE_SQL["ecdf_normalize"] = """
        SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS v,
               CAST(RANK() OVER (PARTITION BY lang ORDER BY n_chars)
                    - 1 AS BIGINT) AS rank_lt,
               CAST(COUNT(*) OVER (PARTITION BY lang) AS BIGINT) AS n_g
        FROM documents
    """
    # pareto_front: NOT EXISTS domination brute force — quadratic, the
    # formulation the two-phase skyline avoids; identical md5 y-score.
    _ORACLE_SQL["pareto_front"] = """
        WITH pts AS (
            SELECT doc_id, CAST(n_chars AS BIGINT) AS x,
                   CAST(('0x' || substring(md5(
                        CAST(doc_id AS VARCHAR) || '#pq'), 1, 13))::UBIGINT
                        AS BIGINT) % 1000 AS y
            FROM documents
        )
        SELECT p.doc_id, p.x, p.y FROM pts p
        WHERE NOT EXISTS (
            SELECT 1 FROM pts q
            WHERE q.x >= p.x AND q.y >= p.y
              AND (q.x > p.x OR q.y > p.y)
        )
    """


_install_selection_oracles()


def _install_curate_pipeline_oracle() -> None:
    # curate_pipeline: the WHOLE six-stage chain restated as one CTE
    # composition — each stage in the exact shape its single-stage
    # oracle already proved, composed in the job's fixed order
    # (quality -> dedup -> redact -> decontaminate -> mix -> pack).
    qgate = """
        LEN(STRING_SPLIT(text, ' ')) >= 30
        AND LEN(STRING_SPLIT(text, ' ')) <= 100000
        AND ROUND(LIST_SUM(LIST_TRANSFORM(STRING_SPLIT(text, ' '),
              w -> LEN(w))) * 1.0 / LEN(STRING_SPLIT(text, ' ')), 4)
            BETWEEN 3.0 AND 10.0
        AND LEN(LIST_DISTINCT(LIST_INTERSECT(STRING_SPLIT(text, ' '),
              ['the', 'a', 'of', 'to', 'and', 'in']))) >= 2
        AND ROUND(LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
              w -> REGEXP_FULL_MATCH(w, '[a-zA-Z]+'))) * 1.0
              / LEN(STRING_SPLIT(text, ' ')), 4) >= 0.8
    """
    grams = (
        "unnest(list_distinct(list_transform("
        "range(1, greatest(len(toks) - 11, 1)),"
        " i -> array_to_string(toks[i:i+12], ' '))))"
    )
    _ORACLE_SQL["curate_pipeline"] = f"""
        WITH base AS (
            SELECT doc_id, lang,
                   text
                   || CASE WHEN doc_id % 100 = 7
                             THEN ' {DECON_CANON} {DECON_CANON2}'
                           WHEN doc_id % 10 = 4 THEN ' {DECON_CANON}'
                           WHEN doc_id % 10 = 9
                             THEN ' {DECON_CANON} {DECON_CANON2}'
                           ELSE '' END
                   || CASE WHEN doc_id % 3 = 0 THEN ' contact user'
                        || CAST(doc_id AS VARCHAR) || '@example.com now'
                        ELSE '' END
                   || CASE WHEN doc_id % 4 = 1 THEN ' call +1-555-'
                        || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                        || ' today' ELSE '' END
                   || CASE WHEN doc_id % 5 = 2 THEN ' from 10.'
                        || CAST(doc_id % 256 AS VARCHAR) || '.0.'
                        || CAST((doc_id * 7) % 256 AS VARCHAR)
                        || ' logged' ELSE '' END
                   AS text
            FROM documents
        ),
        d0 AS (
            SELECT * FROM base
            UNION ALL
            SELECT doc_id + 10000000, lang, text FROM base
            WHERE doc_id % 100 = {CURATE_DUP_MOD}
        ),
        q AS (SELECT * FROM d0 WHERE {qgate}),
        surv AS (
            SELECT MD5(text) AS h, MIN(doc_id) AS doc_id FROM q GROUP BY 1
        ),
        dd AS (SELECT q.* FROM q JOIN surv USING (doc_id)),
        p AS (
            SELECT doc_id, lang,
                   regexp_replace(regexp_replace(regexp_replace(text,
                       '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
                       '{PII_PHONE_RE}', '<PHONE>', 'g'),
                       '{PII_IP_RE}', '<IP>', 'g') AS text
            FROM dd
        ),
        tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM p),
        g AS (SELECT doc_id, {grams} AS gram FROM tok),
        bench AS (
            SELECT {grams} AS gram FROM (
                SELECT string_split(s, ' ') AS toks
                FROM (VALUES ('{DECON_CANON}'), ('{DECON_CANON2}')) b(s)
            )
        ),
        hits AS (SELECT DISTINCT g.doc_id FROM g JOIN bench USING (gram)),
        dc AS (
            SELECT * FROM p
            WHERE doc_id NOT IN (SELECT doc_id FROM hits)
        ),
        m AS (
            SELECT doc_id, lang, text,
                   round(CAST(100.0 AS DOUBLE) / rate, 4) AS weight
            FROM (SELECT *, ({_MIX_CASE}) AS rate FROM dc)
            WHERE {_MIX_HASH} < rate
        ),
        t AS (
            SELECT *, {_PACK_SHARD} AS shard,
                   CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens
            FROM m
        ),
        c AS (
            SELECT *, CAST(COALESCE(SUM(n_tokens) OVER (
                       PARTITION BY shard ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS BIGINT) AS cum_before
            FROM t
        )
        SELECT doc_id, lang, weight, CAST(shard AS BIGINT) AS shard,
               n_tokens,
               CAST(FLOOR(cum_before / {PACK_SEQLEN}.0) AS BIGINT) AS seq_id,
               cum_before % {PACK_SEQLEN} AS seq_offset,
               MD5(text) AS text_digest
        FROM c
    """


_install_curate_pipeline_oracle()


def _install_novelty_decay_oracles() -> None:
    # ngram_novelty: DuckDB groups on raw shingle STRINGS where Spark
    # groups on xxhash64 — grouping identity only (the decontaminate /
    # span_dedup argument); min-attribution and counts are integers.
    n = NOVELTY_N
    _ORACLE_SQL["ngram_novelty"] = f"""
        WITH tok AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ),
        pd AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                       range(1, greatest(len(toks) - {n - 2}, 1)),
                       i -> array_to_string(toks[i:i+{n - 1}], ' ')))
                   AS grams
            FROM tok
        ),
        g AS (SELECT doc_id, unnest(grams) AS gram FROM pd),
        firsts AS (
            SELECT gram, MIN(doc_id) AS first_doc FROM g GROUP BY gram
        ),
        novel AS (
            SELECT first_doc AS doc_id, COUNT(*) AS n_novel
            FROM firsts GROUP BY first_doc
        )
        SELECT pd.doc_id, CAST(len(pd.grams) AS BIGINT) AS n_shingles,
               CAST(COALESCE(novel.n_novel, 0) AS BIGINT) AS n_novel
        FROM pd LEFT JOIN novel USING (doc_id)
    """
    # decayed_counts: same integer age buckets, same exact scaled-
    # integer numerator, ONE float division at the end in both engines.
    hl, mx = DECAY_HALFLIFE_BUCKETS, DECAY_MAX_AGE
    _ORACLE_SQL["decayed_counts"] = f"""
        WITH a AS (SELECT MAX(ts) AS m FROM events),
        b AS (
            SELECT event_type,
                   LEAST(CAST(DATE_DIFF('microseconds', ts, a.m)
                         // {DECAY_BUCKET_US} // {hl} AS BIGINT), {mx})
                   AS age
            FROM events CROSS JOIN a
        ),
        per AS (SELECT event_type, age, COUNT(*) AS c FROM b GROUP BY 1, 2)
        SELECT event_type,
               CAST(SUM(c) AS BIGINT) AS n_events,
               CAST(SUM(c * (1::BIGINT << ({mx} - age))) AS BIGINT)
                   AS decay_num,
               ROUND(SUM(c * (1::BIGINT << ({mx} - age)))
                     / {float(2 ** mx)}, 6) AS decayed_count
        FROM per GROUP BY event_type
    """


_install_novelty_decay_oracles()


def _install_s8_batch3_oracles() -> None:
    # quality_logit: same 4-dp features (the quality_filter shapes),
    # same one-order multiply-add, same sigmoid double rounded at 6dp.
    _ORACLE_SQL["quality_logit"] = f"""
        WITH sig AS (
            SELECT doc_id,
                   LEN(STRING_SPLIT(text, ' ')) AS n_words,
                   ROUND(LIST_SUM(LIST_TRANSFORM(STRING_SPLIT(text, ' '),
                         w -> LEN(w))) * 1.0
                         / LEN(STRING_SPLIT(text, ' ')), 4) AS mwl,
                   ROUND(LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                         w -> REGEXP_FULL_MATCH(w, '[a-zA-Z]+'))) * 1.0
                         / LEN(STRING_SPLIT(text, ' ')), 4) AS alpha,
                   LEN(LIST_DISTINCT(LIST_INTERSECT(STRING_SPLIT(text, ' '),
                         ['the', 'a', 'of', 'to', 'and', 'in']))) AS stop
            FROM documents
        ),
        lg AS (
            SELECT doc_id,
                   {QL_W0} + {QL_W_NWORDS} * LEAST(n_words, 200)
                   + {QL_W_MWL} * mwl + {QL_W_ALPHA} * alpha
                   + {QL_W_STOP} * stop AS logit
            FROM sig
        )
        SELECT doc_id, ROUND(logit, 6) AS logit,
               ROUND(1.0 / (1.0 + EXP(-logit)), 6) AS score,
               CAST(1.0 / (1.0 + EXP(-logit)) >= 0.5 AS BIGINT) AS keep
        FROM lg
    """
    # editdist_verify: identical variant synthesis, identical 3-token
    # blocks, and the gate pins the DISTANCES — both engines run the
    # classical Levenshtein DP.
    _ORACLE_SQL["editdist_verify"] = f"""
        WITH var AS (
            SELECT doc_id + 20000000 AS doc_id,
                   array_to_string(list_concat(list_concat(
                       toks[1:4], ['EDITED']), toks[6:len(toks)]), ' ')
                   AS text
            FROM (SELECT doc_id, string_split(text, ' ') AS toks
                  FROM documents)
            WHERE doc_id % {ED_VARIANT_MOD} = 9 AND len(toks) >= 6
        ),
        docs AS (
            SELECT doc_id, text FROM documents
            UNION ALL SELECT doc_id, text FROM var
        ),
        keyed AS (
            SELECT doc_id, text,
                   array_to_string((string_split(text, ' '))[1:3], ' ')
                   AS blk
            FROM docs
        )
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
               CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist
        FROM keyed a JOIN keyed b USING (blk)
        WHERE a.doc_id < b.doc_id
          AND levenshtein(a.text, b.text) <= {ED_MAX_DIST}
    """
    # snapshot_diff: same _crawl_version_frames synthesis as the
    # upsert/scd2 gates + the removal class; full-outer classify.
    _ORACLE_SQL["snapshot_diff"] = """
        WITH snap0 AS (SELECT doc_id, MD5(text) AS d0 FROM documents),
        upd AS (
            SELECT doc_id, MD5(text || ' v2') AS d1
            FROM documents WHERE doc_id % 4 = 1
            UNION ALL
            SELECT doc_id + 100000, MD5('new:' || text)
            FROM documents WHERE doc_id % 10 = 3
        ),
        carried AS (
            SELECT doc_id, d0 AS d1 FROM snap0 WHERE doc_id % 9 <> 5
        ),
        snap1 AS (
            SELECT * FROM carried
            WHERE doc_id NOT IN (SELECT doc_id FROM upd)
            UNION ALL SELECT * FROM upd
        ),
        j AS (
            SELECT COALESCE(snap0.doc_id, snap1.doc_id) AS doc_id, d0, d1
            FROM snap0 FULL OUTER JOIN snap1 ON snap0.doc_id = snap1.doc_id
        )
        SELECT doc_id,
               CASE WHEN d0 IS NULL THEN 'added'
                    WHEN d1 IS NULL THEN 'removed'
                    WHEN d0 = d1 THEN 'unchanged'
                    ELSE 'changed' END AS status,
               COALESCE(d1, d0) AS digest
        FROM j
    """


_install_s8_batch3_oracles()


def _install_attrib_stream_oracle() -> None:
    # attrib_join_stream: inner stream-stream join emission is not
    # watermark-gated, so the availableNow replay must equal the plain
    # batch join multiset — the oracle IS that batch join.
    _ORACLE_SQL["attrib_join_stream"] = """
        WITH v AS (
            SELECT user_id, event_id AS imp_id, ts AS imp_ts
            FROM events WHERE event_type = 'view'
        ),
        k AS (
            SELECT user_id, event_id AS click_id, ts AS click_ts
            FROM events WHERE event_type = 'click'
        )
        SELECT user_id, imp_id, click_id,
               CAST(DATE_DIFF('microseconds', imp_ts, click_ts) AS BIGINT)
                   AS delay_us
        FROM v JOIN k USING (user_id)
        WHERE click_ts >= imp_ts
          AND click_ts <= imp_ts + INTERVAL 30 MINUTE
    """


_install_attrib_stream_oracle()


def _install_s12_oracles() -> None:
    # auc_eval: same score/label synthesis; the statistic computed
    # through per-row RANK()/COUNT() midrank windows (2*avg_rank =
    # 2*rank_min + tie_count - 1) instead of Spark's distinct-value
    # prefix sums — a two-algorithm gate on the midrank algebra.
    _ORACLE_SQL["auc_eval"] = f"""
        WITH scored AS (
            SELECT lang,
                   CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS s,
                   CAST((LEN(STRING_SPLIT(text, ' ')) >= {AUC_NW_THRESHOLD})
                        <> (doc_id % {AUC_NOISE_MOD} = 3) AS BIGINT) AS y
            FROM documents
        ),
        rk AS (
            SELECT lang, y,
                   2 * RANK() OVER (PARTITION BY lang ORDER BY s)
                     + COUNT(*) OVER (PARTITION BY lang, s) - 1 AS two_avg
            FROM scored
        ),
        agg AS (
            SELECT lang,
                   CAST(SUM(y) AS BIGINT) AS n_pos,
                   CAST(COUNT(*) - SUM(y) AS BIGINT) AS n_neg,
                   CAST(SUM(CASE WHEN y = 1 THEN two_avg ELSE 0 END)
                        AS BIGINT) AS r2
            FROM rk GROUP BY lang
        )
        SELECT lang, n_pos, n_neg,
               CAST(r2 - n_pos * (n_pos + 1) AS BIGINT) AS auc_num,
               CAST(2 * n_pos * n_neg AS BIGINT) AS auc_den,
               ROUND((r2 - n_pos * (n_pos + 1)) * 1.0
                     / (2 * n_pos * n_neg), 6) AS auc
        FROM agg WHERE n_pos > 0 AND n_neg > 0
    """
    # ols_trend: identical sufficient-statistic algebra in SQL (the
    # rational num/den columns make the gate float-free up to the two
    # final divisions); REGR_SLOPE cross-check lives in pytest.
    _ORACLE_SQL["ols_trend"] = """
        WITH a AS (SELECT MIN(CAST(ts AS DATE)) AS d0 FROM events),
        daily AS (
            SELECT event_type,
                   CAST(DATE_DIFF('day', a.d0, CAST(ts AS DATE))
                        AS BIGINT) AS x,
                   CAST(COUNT(*) AS BIGINT) AS y
            FROM events CROSS JOIN a GROUP BY 1, 2
        ),
        s AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x * y) AS BIGINT) AS sxy,
                   CAST(SUM(x * x) AS BIGINT) AS sxx
            FROM daily GROUP BY event_type
        )
        SELECT event_type, n AS n_days,
               CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
               CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
               ROUND((n * sxy - sx * sy) * 1.0
                     / (n * sxx - sx * sx), 6) AS slope,
               CAST(sy * (n * sxx - sx * sx)
                    - (n * sxy - sx * sy) * sx AS BIGINT) AS icept_num,
               CAST(n * (n * sxx - sx * sx) AS BIGINT) AS icept_den,
               ROUND((sy * (n * sxx - sx * sx)
                      - (n * sxy - sx * sy) * sx) * 1.0
                     / (n * (n * sxx - sx * sx)), 6) AS icept
        FROM s WHERE n >= 2
    """
    # rrf_fuse: the BM25 leg is the bm25_topk oracle VERBATIM (list
    # drift impossible); quality leg + fusion mirrored with explicit
    # COALESCE over the full-outer merge.
    _ORACLE_SQL["rrf_fuse"] = f"""
        WITH bm AS ({_ORACLE_SQL['bm25_topk']}),
        a AS (
            SELECT doc_id,
                   ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC)
                       AS ra
            FROM bm
        ),
        b0 AS (
            SELECT doc_id, n_chars FROM documents
            ORDER BY n_chars DESC, doc_id ASC LIMIT {RRF_TOPK}
        ),
        b AS (
            SELECT doc_id,
                   ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id ASC)
                       AS rb
            FROM b0
        ),
        j AS (
            SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
                   CAST(ra AS BIGINT) AS ra, CAST(rb AS BIGINT) AS rb
            FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
        ),
        s AS (
            SELECT doc_id, ra, rb,
                   CAST(CASE WHEN ra IS NOT NULL AND rb IS NOT NULL
                             THEN {2 * RRF_K0} + ra + rb
                             ELSE 1 END AS BIGINT) AS rrf_num,
                   CAST(CASE WHEN ra IS NOT NULL AND rb IS NOT NULL
                             THEN ({RRF_K0} + ra) * ({RRF_K0} + rb)
                             ELSE {RRF_K0} + COALESCE(ra, rb)
                        END AS BIGINT) AS rrf_den
            FROM j
        )
        SELECT doc_id, ra, rb, rrf_num, rrf_den,
               ROUND(rrf_num * 1.0 / rrf_den, 6) AS rrf,
               CAST(ROW_NUMBER() OVER (
                   ORDER BY rrf_num * 1.0 / rrf_den DESC, doc_id ASC)
                   AS BIGINT) AS fused_rank
        FROM s
    """
    # bottomk_sketch: oracle ranks ALL distinct hashes with a per-type
    # window (the formulation Spark's partial-fold avoids); same
    # 52-bit md5 device, same distinct-first collision collapse.
    _ORACLE_SQL["bottomk_sketch"] = f"""
        WITH pairs AS (
            SELECT DISTINCT event_type,
                   CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)),
                        1, 13))::UBIGINT AS BIGINT) AS h
            FROM events
        ),
        ranked AS (
            SELECT event_type, h,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY h ASC) AS pos
            FROM pairs
        ),
        sk AS (SELECT * FROM ranked WHERE pos <= {BK_K}),
        summ AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_sketch,
                   CAST(MAX(h) AS BIGINT) AS kth_hash
            FROM sk GROUP BY event_type
        ),
        ex AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_distinct
            FROM pairs GROUP BY event_type
        )
        SELECT sk.event_type, CAST(sk.pos AS BIGINT) AS pos, sk.h,
               ex.n_distinct,
               CASE WHEN summ.n_sketch < {BK_K}
                    THEN CAST(summ.n_sketch AS DOUBLE)
                    ELSE ROUND({BK_K - 1} * CAST({1 << 52} AS DOUBLE)
                               / summ.kth_hash, 6)
               END AS dv_est
        FROM sk JOIN summ USING (event_type) JOIN ex USING (event_type)
    """


_install_s12_oracles()


def _mmr_unrolled_sql() -> str:
    """The MMR greedy as MMR_M unrolled SQL steps (the IVF
    Lloyd-unroll precedent): p_t picks the argmax of rel − max-dot
    against the running selected set s_{t-1} via a correlated
    subquery; all arithmetic exact BIGINT."""

    def dot(a: str, b: str) -> str:
        return (
            f"CAST(list_sum(list_transform(generate_series(1, len({a})),"
            f" i -> {a}[i] * {b}[i])) AS BIGINT)"
        )

    parts = [
        f"""
        WITH qv0 AS (
            SELECT list_transform(CAST(embedding AS DOUBLE[]),
                   x -> CAST(FLOOR(x * {MMR_SCALE}) AS BIGINT)) AS qv
            FROM embeddings WHERE vec_id = 0
        ),
        vecs AS (
            SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
                   x -> CAST(FLOOR(x * {MMR_SCALE}) AS BIGINT)) AS qv
            FROM embeddings WHERE vec_id <> 0
        ),
        cand AS (
            SELECT v.vec_id, v.qv, {dot('v.qv', 'q.qv')} AS rel
            FROM vecs v CROSS JOIN qv0 q
            ORDER BY rel DESC, vec_id ASC LIMIT {MMR_K}
        ),
        p1 AS (SELECT vec_id, qv, rel, rel AS val FROM cand
               ORDER BY rel DESC, vec_id ASC LIMIT 1),
        s1 AS (SELECT vec_id, qv FROM p1)"""
    ]
    for t in range(2, MMR_M + 1):
        parts.append(
            f""",
        v{t} AS (
            SELECT c.vec_id, c.qv, c.rel,
                   c.rel - (SELECT MAX({dot('c.qv', 's.qv')})
                            FROM s{t - 1} s) AS val
            FROM cand c
            WHERE c.vec_id NOT IN (SELECT vec_id FROM s{t - 1})
        ),
        p{t} AS (SELECT vec_id, qv, rel, val FROM v{t}
                 ORDER BY val DESC, vec_id ASC LIMIT 1),
        s{t} AS (SELECT vec_id, qv FROM s{t - 1}
                 UNION ALL SELECT vec_id, qv FROM p{t})"""
        )
    sel = "\n        UNION ALL ".join(
        f"SELECT {t} AS step, vec_id, rel, val AS mmr_value FROM p{t}"
        for t in range(1, MMR_M + 1)
    )
    return "".join(parts) + "\n        " + sel


def _install_s12_batch2_oracles() -> None:
    _ORACLE_SQL["mmr_diversify"] = _mmr_unrolled_sql()
    # dp_histogram: the identical keyed-hash -> open-interval uniform
    # -> Laplace inverse CDF chain, op for op.
    _ORACLE_SQL["dp_histogram"] = f"""
        WITH g AS (
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
            FROM documents GROUP BY lang
        ),
        h AS (
            SELECT lang, n,
                   CAST(('0x' || substring(md5(
                        concat_ws('|', lang, '{DP_SALT}')), 1, 13))::UBIGINT
                        AS BIGINT) AS hv
            FROM g
        ),
        u AS (
            SELECT lang, n,
                   (hv + 1) / {float((1 << 52) + 2)} AS u
            FROM h
        )
        SELECT lang,
               ROUND(n + (-SIGN(u - 0.5) * {DP_B}
                          * LN(1.0 - 2.0 * ABS(u - 0.5))), 6) AS n_noisy,
               CAST(1.0 AS DOUBLE) AS epsilon
        FROM u
    """
    # epoch_shuffle: same (epoch, doc_id)-keyed md5 split into shard
    # (first 8 hex chars) and order key (next 13); per-shard window.
    _ORACLE_SQL["epoch_shuffle"] = f"""
        WITH keyed AS (
            SELECT doc_id,
                   CAST(('0x' || substring(md5(concat_ws('|', 'epoch1',
                        CAST(doc_id AS VARCHAR))), 1, 8))::UBIGINT
                        AS BIGINT) % {EPOCH_SHARDS} AS shard,
                   CAST(('0x' || substring(md5(concat_ws('|', 'epoch1',
                        CAST(doc_id AS VARCHAR))), 9, 13))::UBIGINT
                        AS BIGINT) AS okey
            FROM documents
        )
        SELECT shard,
               CAST(ROW_NUMBER() OVER (PARTITION BY shard
                    ORDER BY okey, doc_id) AS BIGINT) AS pos,
               doc_id, okey
        FROM keyed
    """


_install_s12_batch2_oracles()


def _install_s12_batch3_oracles() -> None:
    # ab_assign_srm: same 52-bit md5 arm hash; the collapsed df=1
    # chi-square rational and the integer cross-multiplied verdict.
    _ORACLE_SQL["ab_assign_srm"] = f"""
        WITH pairs AS (
            SELECT DISTINCT event_type, user_id FROM events
        ),
        armed AS (
            SELECT event_type,
                   CAST(('0x' || substring(md5(concat_ws('|',
                        CAST(user_id AS VARCHAR), '{AB_EXP_SALT}')),
                        1, 13))::UBIGINT AS BIGINT) % 2 AS arm
            FROM pairs
        ),
        g AS (
            SELECT event_type,
                   CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n0,
                   CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n1
            FROM armed GROUP BY event_type
        )
        SELECT event_type, n0, n1,
               CAST((n0 - n1) * (n0 - n1) AS BIGINT) AS srm_num,
               CAST(n0 + n1 AS BIGINT) AS srm_den,
               ROUND((n0 - n1) * (n0 - n1) * 1.0 / (n0 + n1), 6)
                   AS srm_chi2,
               CAST(1000 * (n0 - n1) * (n0 - n1)
                    > {AB_CHI2_CRIT_MILLI} * (n0 + n1) AS BIGINT)
                   AS srm_flag
        FROM g
    """
    # linkage_score: same variant synthesis (editdist block fixture),
    # same 3-token blocks, same fixed-order weight assembly; every
    # float constant CAST AS DOUBLE (the DECIMAL-literal seam).
    w = FS_W
    _ORACLE_SQL["linkage_score"] = f"""
        WITH var AS (
            SELECT doc_id + 20000000 AS doc_id,
                   array_to_string(list_concat(list_concat(
                       toks[1:4], ['EDITED']), toks[6:len(toks)]), ' ')
                   AS text,
                   doc_id AS src_id
            FROM (SELECT doc_id, string_split(text, ' ') AS toks
                  FROM documents)
            WHERE doc_id % {ED_VARIANT_MOD} = 9 AND len(toks) >= 6
        ),
        docs AS (
            SELECT d.doc_id, d.text, d.doc_id AS src_id FROM documents d
            UNION ALL SELECT doc_id, text, src_id FROM var
        ),
        base AS (
            SELECT docs.doc_id, docs.text, s.lang, s.source,
                   LEN(docs.text) AS len_chars
            FROM docs JOIN documents s ON docs.src_id = s.doc_id
        ),
        keyed AS (
            SELECT doc_id, lang, source,
                   len_chars // {FS_LEN_BUCKET} AS len_b,
                   array_to_string((string_split(text, ' '))[1:3], ' ')
                       AS blk
            FROM base
        ),
        scored AS (
            SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                   CAST(a.lang = b.lang AS BIGINT) AS agree_lang,
                   CAST(a.source = b.source AS BIGINT) AS agree_source,
                   CAST(a.len_b = b.len_b AS BIGINT) AS agree_len,
                   (CASE WHEN a.lang = b.lang
                         THEN CAST({w['lang'][0]} AS DOUBLE)
                         ELSE CAST({w['lang'][1]} AS DOUBLE) END
                    + CASE WHEN a.source = b.source
                           THEN CAST({w['source'][0]} AS DOUBLE)
                           ELSE CAST({w['source'][1]} AS DOUBLE) END
                    + CASE WHEN a.len_b = b.len_b
                           THEN CAST({w['len'][0]} AS DOUBLE)
                           ELSE CAST({w['len'][1]} AS DOUBLE) END)
                       AS score
            FROM keyed a JOIN keyed b USING (blk)
            WHERE a.doc_id < b.doc_id
        )
        SELECT a_id, b_id, agree_lang, agree_source, agree_len,
               ROUND(score, 6) AS score,
               CAST(score >= {FS_THRESHOLD} AS BIGINT) AS is_match
        FROM scored
    """
    # calibration_bins: same quality_logit score expression (reused
    # from its oracle as a subquery — drift-proof), same label rule,
    # ROUND-before-CAST for the micro-unit sum.
    _ORACLE_SQL["calibration_bins"] = f"""
        WITH sc AS ({_ORACLE_SQL['quality_logit']}),
        lab AS (
            SELECT doc_id,
                   CAST((LEN(STRING_SPLIT(text, ' ')) >= {AUC_NW_THRESHOLD})
                        <> (doc_id % {AUC_NOISE_MOD} = 3) AS BIGINT) AS y
            FROM documents
        ),
        j AS (
            SELECT LEAST(CAST(FLOOR(sc.score * {CAL_BINS}) AS BIGINT),
                         {CAL_BINS - 1}) AS bin,
                   CAST(ROUND(sc.score * 1000000) AS BIGINT) AS p_micro,
                   lab.y
            FROM sc JOIN lab USING (doc_id)
        ),
        g AS (
            SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(y) AS BIGINT) AS n_pos,
                   CAST(SUM(p_micro) AS BIGINT) AS sum_p_micro
            FROM j GROUP BY bin
        )
        SELECT bin, n, n_pos, sum_p_micro,
               ROUND(n_pos * 1.0 / n, 6) AS obs_rate,
               ROUND(sum_p_micro * 1.0 / (n * 1000000), 6) AS mean_pred
        FROM g
    """


_install_s12_batch3_oracles()


def _install_s12_batch4_oracles() -> None:
    from ocular_spark.functions import html as _H

    # degree_powerlaw: same pages/edges CTEs as link_pagerank, same
    # quantized-ln exact tail sum, one division.
    _ORACLE_SQL["degree_powerlaw"] = (
        "WITH pages AS (SELECT doc_id, "
        + _H.wrap_links_duckdb("text", "doc_id")
        + " AS html FROM documents), "
        "ex AS (SELECT doc_id AS src, unnest("
        + _H.doc_links_expr("html")
        + ") AS d FROM pages), "
        "hub AS (SELECT doc_id AS src, doc_id % (1 << k) AS d "
        "FROM documents CROSS JOIN generate_series(1, 9) AS t(k) "
        "WHERE doc_id <> doc_id % (1 << k)), "
        "edges AS (SELECT DISTINCT src, CAST(d AS BIGINT) AS dst FROM ex "
        "UNION SELECT DISTINCT src, CAST(d AS BIGINT) FROM hub), "
        "indeg AS (SELECT dst, CAST(COUNT(*) AS BIGINT) AS degree "
        "FROM edges GROUP BY dst), "
        "hist AS (SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_nodes "
        "FROM indeg GROUP BY degree), "
        f"summ AS (SELECT CAST(SUM(n_nodes) AS BIGINT) AS n_tail, "
        f"CAST(SUM(n_nodes * CAST(ROUND(LN(degree / CAST({PL_DMIN} AS "
        f"DOUBLE)) * {PL_LN_SCALE}) AS BIGINT)) AS BIGINT) AS ln_sum_q "
        f"FROM hist WHERE degree >= {PL_DMIN}) "
        f"SELECT h.degree, h.n_nodes, "
        f"CAST(h.degree >= {PL_DMIN} AS BIGINT) AS in_tail, "
        f"s.n_tail, "
        f"ROUND(1.0 + (s.n_tail * {PL_LN_SCALE}) * 1.0 / s.ln_sum_q, 6) "
        f"AS alpha "
        f"FROM hist h CROSS JOIN summ s WHERE s.ln_sum_q > 0"
    )
    # forget_user: tombstone manifest over the deletion slice.
    _ORACLE_SQL["forget_user"] = f"""
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_rows_dropped,
               CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT)
                   AS n_days_active,
               CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
        FROM events
        WHERE user_id % {FORGET_MOD} = {FORGET_RESIDUE}
        GROUP BY user_id
    """
    # cdc_apply: same op-log synthesis; winner per key via arg_max
    # (no NULL digests by the sentinel convention), deletes filtered.
    _ORACLE_SQL["cdc_apply"] = f"""
        WITH base AS (
            SELECT doc_id, 0 AS seq, 'I' AS op, MD5(text) AS digest
            FROM documents
        ),
        u1 AS (
            SELECT doc_id, 1 AS seq, 'U' AS op, MD5(text || ' v2')
            FROM documents WHERE doc_id % 4 = 1
        ),
        d2 AS (
            SELECT doc_id, 2 AS seq, 'D' AS op, ''
            FROM documents WHERE doc_id % 9 = 5
        ),
        u3 AS (
            SELECT doc_id, 3 AS seq, 'U' AS op, MD5(text || ' v3')
            FROM documents WHERE doc_id % 8 = 1
        ),
        i3 AS (
            SELECT doc_id + {CDC_NEW_OFFSET}, 3 AS seq, 'I' AS op,
                   MD5('new:' || text)
            FROM documents WHERE doc_id % 10 = 3
        ),
        r3 AS (
            -- seq 4, its own transaction: doc_id ≡ 41 (mod 72) is in
            -- BOTH %8==1 and %18==5 — at seq 3 the max_by winner
            -- would be an engine-dependent tie
            SELECT doc_id, 4 AS seq, 'I' AS op,
                   MD5('resurrected:' || text)
            FROM documents WHERE doc_id % 18 = 5
        ),
        log AS (
            SELECT * FROM base UNION ALL SELECT * FROM u1
            UNION ALL SELECT * FROM d2 UNION ALL SELECT * FROM u3
            UNION ALL SELECT * FROM i3 UNION ALL SELECT * FROM r3
        ),
        folded AS (
            SELECT doc_id,
                   ARG_MAX(op, seq) AS last_op,
                   ARG_MAX(digest, seq) AS digest,
                   CAST(MAX(seq) AS BIGINT) AS last_seq,
                   CAST(COUNT(*) AS BIGINT) AS n_ops
            FROM log GROUP BY doc_id
        )
        SELECT doc_id, digest, last_seq, n_ops
        FROM folded WHERE last_op <> 'D'
    """


_install_s12_batch4_oracles()


def _install_s12_batch5_oracles() -> None:
    # encoding_advisor: per-column LAG run counts over the same
    # clustering order + the same integer-threshold decisions.
    order_by = ", ".join(
        ["l_orderkey", "l_linenumber"]
        + [c for c in ENC_COLS if c not in ("l_orderkey", "l_linenumber")]
    )
    col_sqls = []
    for c in ENC_COLS:
        col_sqls.append(f"""
        SELECT '{c}' AS "column", n, ndv, n_runs,
               CASE WHEN ndv * {ENC_DICT_RATIO} <= n THEN 'dict'
                    WHEN n >= {ENC_RLE_RUN} * n_runs THEN 'rle'
                    ELSE 'plain' END AS encoding
        FROM (
            WITH b AS (
                SELECT CASE WHEN LAG({c}) OVER (ORDER BY {order_by})
                                 IS NULL
                            OR LAG({c}) OVER (ORDER BY {order_by}) <> {c}
                       THEN 1 ELSE 0 END AS br FROM lineitem
            )
            SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n,
                   (SELECT CAST(COUNT(DISTINCT {c}) AS BIGINT)
                    FROM lineitem) AS ndv,
                   CAST(SUM(br) AS BIGINT) AS n_runs
            FROM b
        )""")
    _ORACLE_SQL["encoding_advisor"] = " UNION ALL ".join(col_sqls)
    # psi_drift: same integer-µs midpoint split, same smoothed counts,
    # same quantized-ln exact numerator, one division at 9 dp.
    _ORACLE_SQL["psi_drift"] = f"""
        WITH a AS (
            SELECT MIN(ts) AS lo,
                   DATE_DIFF('microseconds', MIN(ts), MAX(ts)) // 2
                       AS mid_us
            FROM events
        ),
        tagged AS (
            SELECT event_type,
                   CAST(DATE_DIFF('microseconds', a.lo, ts) < a.mid_us
                        AS BIGINT) AS is_ref
            FROM events CROSS JOIN a
        ),
        g AS (
            SELECT event_type,
                   CAST(SUM(is_ref) + 1 AS BIGINT) AS c_ref,
                   CAST(SUM(1 - is_ref) + 1 AS BIGINT) AS c_cur
            FROM tagged GROUP BY event_type
        ),
        tot AS (
            SELECT CAST(SUM(c_ref) AS BIGINT) AS n_ref,
                   CAST(SUM(c_cur) AS BIGINT) AS n_cur
            FROM g
        ),
        cells AS (
            SELECT g.event_type, g.c_ref, g.c_cur,
                   CAST(g.c_ref * t.n_cur - g.c_cur * t.n_ref AS BIGINT)
                       AS diff_num,
                   CAST(ROUND(LN((g.c_ref * t.n_cur) * 1.0
                                 / (g.c_cur * t.n_ref))
                              * {PSI_LN_SCALE}) AS BIGINT) AS lnq,
                   t.n_ref, t.n_cur
            FROM g CROSS JOIN tot t
        ),
        summ AS (
            SELECT CAST(SUM(diff_num * lnq) AS BIGINT) AS psi_num,
                   ROUND(SUM(diff_num * lnq)
                         / ((MAX(n_ref) * MAX(n_cur))
                            * CAST({PSI_LN_SCALE} AS DOUBLE)), 9) AS psi
            FROM cells
        )
        SELECT c.event_type, c.c_ref, c.c_cur, c.diff_num, c.lnq,
               s.psi_num, s.psi
        FROM cells c CROSS JOIN summ s
    """
    # position_attribution: same range join + U-shaped integer credit.
    _ORACLE_SQL["position_attribution"] = f"""
        WITH v AS (
            SELECT user_id, event_id AS touch_id, ts AS v_ts
            FROM events WHERE event_type = 'view'
        ),
        p AS (
            SELECT user_id, event_id AS purchase_id, ts AS p_ts
            FROM events WHERE event_type = 'purchase'
        ),
        j AS (
            SELECT purchase_id, touch_id, v_ts
            FROM v JOIN p USING (user_id)
            WHERE v_ts <= p_ts
              AND v_ts >= p_ts - INTERVAL {ATTR_WINDOW_MIN} MINUTE
        ),
        ranked AS (
            SELECT purchase_id, touch_id,
                   CAST(ROW_NUMBER() OVER (PARTITION BY purchase_id
                        ORDER BY v_ts, touch_id) AS BIGINT) AS position,
                   CAST(COUNT(*) OVER (PARTITION BY purchase_id)
                        AS BIGINT) AS k
            FROM j
        )
        SELECT purchase_id, touch_id, position, k,
               CAST(CASE
                    WHEN k = 1 THEN 10000
                    WHEN k = 2 THEN 5000
                    WHEN position = 1 THEN {ATTR_FIRST_BPS}
                    WHEN position = k THEN {ATTR_LAST_BPS}
                    WHEN position = 2 THEN {ATTR_MID_BPS} // (k - 2)
                         + ({ATTR_MID_BPS} - ({ATTR_MID_BPS} // (k - 2))
                            * (k - 2))
                    ELSE {ATTR_MID_BPS} // (k - 2)
               END AS BIGINT) AS credit_bps
        FROM ranked
    """


_install_s12_batch5_oracles()


def _install_s12_batch6_oracles() -> None:
    # ndcg_eval: bm25 SQL embedded VERBATIM (rrf_fuse drift-proofing);
    # same noise-graded relevance, same floor(x·1e9+0.5) discount
    # table, same exact-BIGINT cumulative sums.
    _ORACLE_SQL["ndcg_eval"] = f"""
        WITH bm AS ({_ORACLE_SQL['bm25_topk']}),
        rels AS (
            SELECT doc_id,
                   CAST(CASE WHEN doc_id % {NDCG_NOISE_MOD} = 3
                        THEN 3 - (CAST(len(string_split(text, ' ')) >= {NDCG_NW_LO} AS INT)
                                  + CAST(len(string_split(text, ' ')) >= {NDCG_NW_HI} AS INT))
                        ELSE CAST(len(string_split(text, ' ')) >= {NDCG_NW_LO} AS INT)
                             + CAST(len(string_split(text, ' ')) >= {NDCG_NW_HI} AS INT)
                   END AS BIGINT) AS rel
            FROM documents
        ),
        actual AS (
            SELECT r.rel,
                   ROW_NUMBER() OVER (ORDER BY b.score DESC, b.doc_id ASC)
                       AS k
            FROM bm b JOIN rels r USING (doc_id)
        ),
        ideal AS (
            SELECT rel,
                   ROW_NUMBER() OVER (ORDER BY rel DESC, doc_id ASC) AS k
            FROM rels ORDER BY rel DESC, doc_id ASC LIMIT {NDCG_K}
        ),
        disc AS (
            SELECT k,
                   CAST(FLOOR({NDCG_LN_SCALE} * LN(2.0) / LN(k + 1.0)
                              + 0.5) AS BIGINT) AS d
            FROM (SELECT UNNEST(RANGE(1, {NDCG_K} + 1)) AS k)
        ),
        g AS (
            SELECT a.k,
                   CAST(CASE a.rel WHEN 0 THEN 0 WHEN 1 THEN 1
                        WHEN 2 THEN 3 ELSE 7 END AS BIGINT) AS gain,
                   CAST(CASE i.rel WHEN 0 THEN 0 WHEN 1 THEN 1
                        WHEN 2 THEN 3 ELSE 7 END AS BIGINT) AS ideal_gain,
                   d.d
            FROM actual a JOIN ideal i USING (k) JOIN disc d USING (k)
        ),
        c AS (
            SELECT k, gain, ideal_gain,
                   CAST(SUM(gain * d) OVER (ORDER BY k) AS BIGINT)
                       AS dcg_num,
                   CAST(SUM(ideal_gain * d) OVER (ORDER BY k) AS BIGINT)
                       AS idcg_num
            FROM g
        )
        SELECT k, gain, ideal_gain, dcg_num, idcg_num,
               ROUND(dcg_num * 1.0 / idcg_num, 9) AS ndcg
        FROM c
    """
    # basket_lift: the pairs come from an items x items self-join on
    # order — a genuinely different algorithm from Spark's per-order
    # array expansion; same support threshold, same exact rationals.
    _ORACLE_SQL["basket_lift"] = f"""
        WITH items AS (
            SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
        ),
        n AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n_orders
              FROM items),
        supp AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS c
                 FROM items GROUP BY p),
        pc AS (
            SELECT a.p AS pa, b.p AS pb, CAST(COUNT(*) AS BIGINT) AS c_ab
            FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
            GROUP BY 1, 2
            HAVING COUNT(*) >= {BASKET_MIN_SUPPORT}
        )
        SELECT CAST(pc.pa AS BIGINT) AS pa, CAST(pc.pb AS BIGINT) AS pb,
               pc.c_ab, sa.c AS c_a, sb.c AS c_b,
               CAST(n.n_orders * pc.c_ab AS BIGINT) AS lift_num,
               CAST(sa.c * sb.c AS BIGINT) AS lift_den,
               ROUND(n.n_orders * pc.c_ab * 1.0 / (sa.c * sb.c), 9)
                   AS lift,
               ROUND(pc.c_ab * 1.0 / sa.c, 9) AS conf_ab,
               ROUND(pc.c_ab * 1.0 / sb.c, 9) AS conf_ba
        FROM pc
        JOIN supp sa ON pc.pa = sa.p
        JOIN supp sb ON pc.pb = sb.p
        CROSS JOIN n
    """
    # cohens_kappa: same two raters, same exact-BIGINT kappa rational.
    _ORACLE_SQL["cohens_kappa"] = f"""
        WITH r AS (
            SELECT lang,
                   CAST(len(string_split(text, ' ')) >= {KAPPA_NW_LO}
                        AS BIGINT)
                   + CAST(len(string_split(text, ' ')) >= {KAPPA_NW_HI}
                          AS BIGINT) AS ra,
                   CAST(length(text) >= {KAPPA_NC_LO} AS BIGINT)
                   + CAST(length(text) >= {KAPPA_NC_HI} AS BIGINT) AS rb
            FROM documents
        ),
        cells AS (
            SELECT lang, ra, rb, CAST(COUNT(*) AS BIGINT) AS c
            FROM r GROUP BY 1, 2, 3
        ),
        per AS (
            SELECT lang, CAST(SUM(c) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN ra = rb THEN c ELSE 0 END)
                        AS BIGINT) AS agree
            FROM cells GROUP BY lang
        ),
        ma AS (SELECT lang, ra, CAST(SUM(c) AS BIGINT) AS m_a
               FROM cells GROUP BY 1, 2),
        mb AS (SELECT lang, rb, CAST(SUM(c) AS BIGINT) AS m_b
               FROM cells GROUP BY 1, 2),
        pe AS (
            SELECT ma.lang, CAST(SUM(ma.m_a * mb.m_b) AS BIGINT)
                       AS pe_num
            FROM ma JOIN mb ON ma.lang = mb.lang AND ma.ra = mb.rb
            GROUP BY ma.lang
        )
        SELECT per.lang, per.n, per.agree, pe.pe_num,
               CAST(per.n * per.agree - pe.pe_num AS BIGINT)
                   AS kappa_num,
               CAST(per.n * per.n - pe.pe_num AS BIGINT) AS kappa_den,
               ROUND((per.n * per.agree - pe.pe_num) * 1.0
                     / (per.n * per.n - pe.pe_num), 9) AS kappa
        FROM per JOIN pe USING (lang)
    """


_install_s12_batch6_oracles()


def _install_s12_batch7_oracles() -> None:
    # golden_record: recursive-CTE reachability for the entity
    # closure + window-rank survivorship — independent algorithms
    # from Spark's label propagation + struct-argmax on both halves.
    w = FS_W
    _ORACLE_SQL["golden_record"] = f"""
        WITH RECURSIVE uni AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + {GR_CLONE_OFF}, text FROM documents
            WHERE doc_id % 100 = 7
            UNION ALL
            SELECT doc_id + {GR_VAR_A_OFF},
                   array_to_string(list_concat(list_concat(
                       toks[1:4], ['EDITED']), toks[6:len(toks)]), ' ')
            FROM (SELECT doc_id, string_split(text, ' ') AS toks
                  FROM documents)
            WHERE doc_id % {ED_VARIANT_MOD} = 9 AND len(toks) >= 6
            UNION ALL
            SELECT doc_id + {GR_VAR_B_OFF},
                   array_to_string(list_concat(list_concat(
                       toks[1:4], ['AMENDED']), toks[6:len(toks)]), ' ')
            FROM (SELECT doc_id, string_split(text, ' ') AS toks
                  FROM documents)
            WHERE doc_id % {ED_VARIANT_MOD} = 9 AND len(toks) >= 6
        ),
        ex AS (
            SELECT MIN(doc_id) OVER (PARTITION BY md5(text)) AS a,
                   doc_id AS b
            FROM uni QUALIFY b > a
        ),
        base AS (
            SELECT u.doc_id, s.lang, s.source,
                   LEN(u.text) // {FS_LEN_BUCKET} AS len_b,
                   array_to_string((string_split(u.text, ' '))[1:3], ' ')
                       AS blk,
                   CAST(LEN(u.text) AS BIGINT) AS len_chars
            FROM uni u
            JOIN documents s ON u.doc_id % {GR_CLONE_OFF} = s.doc_id
        ),
        fs AS (
            SELECT a.doc_id AS a, b.doc_id AS b
            FROM base a JOIN base b USING (blk)
            WHERE a.doc_id < b.doc_id
              AND (CASE WHEN a.lang = b.lang
                        THEN CAST({w['lang'][0]} AS DOUBLE)
                        ELSE CAST({w['lang'][1]} AS DOUBLE) END
                   + CASE WHEN a.source = b.source
                          THEN CAST({w['source'][0]} AS DOUBLE)
                          ELSE CAST({w['source'][1]} AS DOUBLE) END
                   + CASE WHEN a.len_b = b.len_b
                          THEN CAST({w['len'][0]} AS DOUBLE)
                          ELSE CAST({w['len'][1]} AS DOUBLE) END)
                  >= {FS_THRESHOLD}
        ),
        pairs AS (SELECT a, b FROM ex UNION SELECT a, b FROM fs),
        edges AS (
            SELECT a AS src, b AS dst FROM pairs
            UNION ALL SELECT b, a FROM pairs
        ),
        reach AS (
            SELECT src AS node, dst AS r FROM edges
            UNION
            SELECT reach.node, e.dst FROM reach
            JOIN edges e ON reach.r = e.src
        ),
        lab AS (
            SELECT node AS doc_id, LEAST(node, MIN(r)) AS entity_id
            FROM reach GROUP BY node
        ),
        mem AS (
            SELECT lab.entity_id, base.doc_id, base.lang, base.source,
                   base.len_chars
            FROM lab JOIN base USING (doc_id)
        ),
        surv AS (
            SELECT entity_id, CAST(COUNT(*) AS BIGINT) AS n_members
            FROM mem GROUP BY entity_id
        ),
        sv AS (
            SELECT entity_id, doc_id AS survivor_id,
                   len_chars AS survivor_len,
                   ROW_NUMBER() OVER (PARTITION BY entity_id
                       ORDER BY len_chars DESC, doc_id ASC) AS rn
            FROM mem
        ),
        lmode AS (
            SELECT entity_id, lang AS lang_mode FROM (
                SELECT entity_id, lang,
                       ROW_NUMBER() OVER (PARTITION BY entity_id
                           ORDER BY COUNT(*) DESC, lang ASC) AS rn
                FROM mem GROUP BY entity_id, lang
            ) WHERE rn = 1
        ),
        smode AS (
            SELECT entity_id, source AS source_mode FROM (
                SELECT entity_id, source,
                       ROW_NUMBER() OVER (PARTITION BY entity_id
                           ORDER BY COUNT(*) DESC, source ASC) AS rn
                FROM mem GROUP BY entity_id, source
            ) WHERE rn = 1
        )
        SELECT CAST(s.entity_id AS BIGINT) AS entity_id, s.n_members,
               CAST(v.survivor_id AS BIGINT) AS survivor_id,
               v.survivor_len, l.lang_mode, m.source_mode
        FROM surv s
        JOIN (SELECT * FROM sv WHERE rn = 1) v USING (entity_id)
        JOIN lmode l USING (entity_id)
        JOIN smode m USING (entity_id)
    """
    # k_anonymity: same FLOOR bucketing, same ladder re-aggregation.
    _step = KANON_B1 // KANON_B0
    _ORACLE_SQL["k_anonymity"] = f"""
        WITH cls0 AS (
            SELECT CAST(c_nationkey AS BIGINT) AS nation,
                   c_mktsegment AS segment,
                   CAST(FLOOR(c_acctbal / {KANON_B0}) AS BIGINT) AS bal_b,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM customer GROUP BY 1, 2, 3
        ),
        lvl0 AS (
            SELECT *, CAST(FLOOR(bal_b / {float(_step)}) AS BIGINT)
                       AS bal_b1
            FROM cls0
        ),
        cls1 AS (
            SELECT nation, segment, bal_b1, CAST(SUM(n) AS BIGINT) AS n1
            FROM lvl0 GROUP BY 1, 2, 3
        ),
        cls2 AS (
            SELECT segment, bal_b1, CAST(SUM(n1) AS BIGINT) AS n2
            FROM cls1 GROUP BY 1, 2
        )
        SELECT l.nation, l.segment, l.bal_b, l.n,
               CAST(l.n < {KANON_K} AS BIGINT) AS violates,
               c1.n1, CAST(c1.n1 >= {KANON_K} AS BIGINT) AS gen1_ok,
               c2.n2, CAST(c2.n2 >= {KANON_K} AS BIGINT) AS gen2_ok
        FROM lvl0 l
        JOIN cls1 c1 USING (nation, segment, bal_b1)
        JOIN cls2 c2 USING (segment, bal_b1)
    """
    # seasonal_anomaly: same epoch-mod-7 dow, same integer
    # cross-multiplied flags.
    _ORACLE_SQL["seasonal_anomaly"] = f"""
        WITH cells AS (
            SELECT event_type, CAST(ts AS DATE) AS d,
                   CAST(EXTRACT(hour FROM ts) AS BIGINT) AS h,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2, 3
        ),
        cd AS (
            SELECT *, CAST(DATE_DIFF('day', DATE '1970-01-01', d) % 7
                           AS BIGINT) AS dw
            FROM cells
        ),
        baseline AS (
            SELECT event_type, dw, h,
                   CAST(COUNT(*) AS BIGINT) AS m,
                   CAST(SUM(c) AS BIGINT) AS s
            FROM cd GROUP BY 1, 2, 3
        )
        SELECT cd.event_type, STRFTIME(cd.d, '%Y-%m-%d') AS d,
               cd.h, cd.dw, cd.c, b.m, b.s,
               CAST(cd.c * b.m > {SEAS_MULT} * b.s AS BIGINT) AS flag_hi,
               CAST({SEAS_MULT} * cd.c * b.m < b.s AS BIGINT) AS flag_lo
        FROM cd JOIN baseline b USING (event_type, dw, h)
        WHERE cd.c * b.m > {SEAS_MULT} * b.s
           OR {SEAS_MULT} * cd.c * b.m < b.s
    """


_install_s12_batch7_oracles()


def _install_s12_batch8_oracles() -> None:
    from ocular_spark.functions import html as _H

    # macro_f1: the confusion matrix is the lang_id_ngram oracle
    # VERBATIM; same rational F1s, same 1e-9 quantized macro average.
    _ORACLE_SQL["macro_f1"] = f"""
        WITH cm AS ({_ORACLE_SQL['lang_id_ngram']}),
        bt AS (
            SELECT lang AS label, CAST(SUM(n_docs) AS BIGINT) AS row_n,
                   CAST(SUM(CASE WHEN pred_lang = lang THEN n_docs
                            ELSE 0 END) AS BIGINT) AS tp
            FROM cm GROUP BY 1
        ),
        bp AS (
            SELECT pred_lang AS label, CAST(SUM(n_docs) AS BIGINT)
                       AS col_n
            FROM cm GROUP BY 1
        ),
        per AS (
            SELECT COALESCE(bt.label, bp.label) AS label,
                   COALESCE(tp, 0) AS tp,
                   COALESCE(col_n, 0) - COALESCE(tp, 0) AS fp,
                   COALESCE(row_n, 0) - COALESCE(tp, 0) AS fn
            FROM bt FULL OUTER JOIN bp ON bt.label = bp.label
        ),
        cls AS (
            SELECT label, CAST(tp AS BIGINT) AS tp,
                   CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn,
                   CAST(2 * tp AS BIGINT) AS f1_num,
                   CAST(2 * tp + fp + fn AS BIGINT) AS f1_den,
                   CAST(ROUND(2 * tp * {F1_Q_SCALE}.0
                              / (2 * tp + fp + fn)) AS BIGINT) AS f1_q,
                   ROUND(2.0 * tp / (2 * tp + fp + fn), 9) AS f1
            FROM per
        )
        SELECT * FROM cls
        UNION ALL
        SELECT '__micro__', CAST(SUM(tp) AS BIGINT),
               CAST(SUM(fp) AS BIGINT), CAST(SUM(fn) AS BIGINT),
               CAST(2 * SUM(tp) AS BIGINT),
               CAST(2 * SUM(tp) + SUM(fp) + SUM(fn) AS BIGINT),
               CAST(ROUND(2 * SUM(tp) * {F1_Q_SCALE}.0
                    / (2 * SUM(tp) + SUM(fp) + SUM(fn))) AS BIGINT),
               ROUND(2.0 * SUM(tp)
                     / (2 * SUM(tp) + SUM(fp) + SUM(fn)), 9)
        FROM cls
        UNION ALL
        SELECT '__macro__', CAST(SUM(tp) AS BIGINT),
               CAST(SUM(fp) AS BIGINT), CAST(SUM(fn) AS BIGINT),
               CAST(SUM(f1_q) AS BIGINT),
               CAST(COUNT(*) * {F1_Q_SCALE} AS BIGINT),
               CAST(NULL AS BIGINT),
               ROUND(SUM(f1_q) * 1.0 / (COUNT(*) * {F1_Q_SCALE}), 9)
        FROM cls
    """
    # vacuum_plan: same file model, same LEAD validity interval, same
    # one-comparison retention test ("vacuum" quoted: DuckDB keyword).
    _ORACLE_SQL["vacuum_plan"] = f"""
        WITH f AS (
            SELECT user_id, CAST(ts AS DATE) AS d,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events GROUP BY 1, 2
        ),
        r AS (
            SELECT MIN(d) AS mn FROM (
                SELECT DISTINCT d FROM f ORDER BY d DESC
                LIMIT {VACUUM_RETAIN_DAYS}
            )
        ),
        l AS (
            SELECT user_id, d,
                   LEAD(d) OVER (PARTITION BY user_id ORDER BY d) AS nd,
                   n_events
            FROM f
        )
        SELECT user_id, STRFTIME(d, '%Y-%m-%d') AS d,
               STRFTIME(nd, '%Y-%m-%d') AS next_d, n_events,
               CAST(nd IS NOT NULL AND nd <= r.mn AS BIGINT) AS "vacuum"
        FROM l CROSS JOIN r
    """
    # kcore_decompose: the peel recursion UNROLLED as chained CTEs
    # (Lloyd-unroll precedent) — 8 rounds; the sf0.01 cascade fixes
    # in 6, and extra rounds are provable no-ops at the fixpoint.
    rounds = 8
    head = (
        "WITH pages AS (SELECT doc_id, "
        + _H.wrap_links_duckdb("text", "doc_id")
        + " AS html FROM documents), "
        "ex AS (SELECT doc_id AS src, unnest("
        + _H.doc_links_expr("html")
        + ") AS d FROM pages), "
        "hub AS (SELECT doc_id AS src, doc_id % (1 << k) AS d "
        "FROM documents CROSS JOIN generate_series(1, 9) AS t(k) "
        "WHERE doc_id <> doc_id % (1 << k)), "
        "e0 AS (SELECT DISTINCT src, CAST(d AS BIGINT) AS dst FROM ex "
        "UNION SELECT DISTINCT src, CAST(d AS BIGINT) FROM hub), "
        f"cl AS (SELECT a.doc_id AS a, b.doc_id AS b FROM documents a "
        f"JOIN documents b ON a.doc_id < b.doc_id "
        f"WHERE a.doc_id < {KCORE_CLIQUE} AND b.doc_id < {KCORE_CLIQUE}), "
        # MATERIALIZED: each unrolled round references sym twice; an
        # inlined CTE would re-open the parquet per reference (8
        # rounds blew DuckDB's file-handle budget before this hint)
        "ue AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, "
        "GREATEST(src, dst) AS b FROM e0 WHERE src <> dst "
        "UNION SELECT a, b FROM cl), "
        "sym AS MATERIALIZED (SELECT a AS src, b AS dst FROM ue "
        "UNION ALL SELECT b, a FROM ue), "
        "n0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM sym), "
    )
    # every round CTE is MATERIALIZED: d{r} is referenced twice and
    # n{r} three times by round r+1 — inlining compounds 3x per round
    # (the un-hinted version never finished at 8 rounds)
    parts = []
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(
            f"d{r} AS MATERIALIZED (SELECT n.node, "
            f"CAST(COALESCE(e.c, 0) AS BIGINT) "
            f"AS deg FROM n{p} n LEFT JOIN ("
            f"SELECT s.src AS node, COUNT(*) AS c FROM sym s "
            f"JOIN n{p} x ON s.src = x.node "
            f"JOIN n{p} y ON s.dst = y.node GROUP BY s.src) e "
            f"USING (node)), "
            f"p{r} AS MATERIALIZED (SELECT node, "
            f"CAST({r} AS BIGINT) AS peel_round, "
            f"deg FROM d{r} WHERE deg < {KCORE_K}), "
            f"n{r} AS MATERIALIZED (SELECT node FROM d{r} "
            f"WHERE deg >= {KCORE_K}), "
        )
    tail = (
        f"dfin AS (SELECT n.node, CAST(COALESCE(e.c, 0) AS BIGINT) "
        f"AS deg FROM n{rounds} n LEFT JOIN ("
        f"SELECT s.src AS node, COUNT(*) AS c FROM sym s "
        f"JOIN n{rounds} x ON s.src = x.node "
        f"JOIN n{rounds} y ON s.dst = y.node GROUP BY s.src) e "
        f"USING (node)) "
        "SELECT node, CAST(0 AS BIGINT) AS peel_round, deg FROM dfin "
        + " ".join(
            f"UNION ALL SELECT node, peel_round, deg FROM p{r}"
            for r in range(1, rounds + 1)
        )
    )
    _ORACLE_SQL["kcore_decompose"] = head + "".join(parts) + tail


_install_s12_batch8_oracles()


def _install_s12_batch9_oracles() -> None:
    from ocular_spark.functions import html as _H

    # crawl_depth: recursive-CTE (node, depth) enumeration with UNION
    # dedup (cycle-safe, bounded by nodes x depth cap) + MIN per node
    # — a different algorithm from Spark's frontier iteration.
    _ORACLE_SQL["crawl_depth"] = (
        "WITH RECURSIVE pages AS (SELECT doc_id, "
        + _H.wrap_links_duckdb("text", "doc_id")
        + " AS html FROM documents), "
        "ex AS (SELECT doc_id AS src, unnest("
        + _H.doc_links_expr("html")
        + ") AS d FROM pages), "
        "edges AS MATERIALIZED (SELECT DISTINCT src, CAST(d AS BIGINT) "
        "AS dst FROM ex WHERE src <> CAST(d AS BIGINT)), "
        "walk AS (SELECT doc_id AS node, 0 AS depth FROM documents "
        f"WHERE doc_id < {CRAWL_SEEDS} "
        "UNION "
        "SELECT e.dst, w.depth + 1 FROM walk w "
        "JOIN edges e ON w.node = e.src "
        f"WHERE w.depth < {CRAWL_MAX_DEPTH}) "
        "SELECT node, CAST(MIN(depth) AS BIGINT) AS depth "
        "FROM walk GROUP BY node"
    )
    # skew_audit: per-column mirror via UNION ALL; same quantized-ln
    # exact entropy numerator.
    col_sqls = []
    for c in SKEW_AUDIT_COLS:
        col_sqls.append(f"""
        SELECT '{c}' AS col, n_rows, n_keys, max_cnt, sum_clnq,
               ROUND(max_cnt * 1.0 / n_rows, 9) AS top1_share,
               CAST(n_rows * CAST(ROUND(LN(n_rows) * {SKEW_LN_SCALE})
                    AS BIGINT) - sum_clnq AS BIGINT) AS ent_num,
               ROUND((n_rows * CAST(ROUND(LN(n_rows) * {SKEW_LN_SCALE})
                      AS BIGINT) - sum_clnq) * 1.0
                     / (n_rows * {SKEW_LN_SCALE}.0), 9) AS entropy
        FROM (
            SELECT CAST(SUM(c) AS BIGINT) AS n_rows,
                   CAST(COUNT(*) AS BIGINT) AS n_keys,
                   CAST(MAX(c) AS BIGINT) AS max_cnt,
                   CAST(SUM(c * CAST(ROUND(LN(c) * {SKEW_LN_SCALE})
                        AS BIGINT)) AS BIGINT) AS sum_clnq
            FROM (
                SELECT CAST(COUNT(*) AS BIGINT) AS c
                FROM lineitem GROUP BY {c}
            )
        )""")
    _ORACLE_SQL["skew_audit"] = " UNION ALL ".join(col_sqls)
    # gap_backfill: same grid/anti-join/island-anchor plan in SQL.
    _ORACLE_SQL["gap_backfill"] = """
        WITH obs AS (
            SELECT DISTINCT event_type, date_trunc('hour', ts) AS h
            FROM events
        ),
        bounds AS (
            SELECT event_type, MIN(h) AS lo, MAX(h) AS hi
            FROM obs GROUP BY 1
        ),
        grid AS (
            SELECT event_type,
                   unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
            FROM bounds
        ),
        miss AS (
            SELECT g.event_type, g.h
            FROM grid g LEFT JOIN obs o USING (event_type, h)
            WHERE o.h IS NULL
        ),
        isl AS (
            SELECT event_type, h,
                   CAST(EPOCH(h) AS BIGINT) // 3600
                   - ROW_NUMBER() OVER (PARTITION BY event_type
                                        ORDER BY h) AS anchor
            FROM miss
        )
        SELECT event_type,
               STRFTIME(MIN(h), '%Y-%m-%d %H:%M:%S') AS gap_start,
               STRFTIME(MAX(h), '%Y-%m-%d %H:%M:%S') AS gap_end,
               CAST(COUNT(*) AS BIGINT) AS n_hours
        FROM isl GROUP BY event_type, anchor
    """


_install_s12_batch9_oracles()


def _install_s12_batch10_oracles() -> None:
    # fk_audit: per-edge anti-join (NOT IN over non-null keys) with
    # the same simulated purge predicates.
    purge_c = f"NOT (c_custkey % {FK_PURGE_CUST_MOD} = {FK_PURGE_CUST_RES})"
    purge_p = f"NOT (p_partkey % {FK_PURGE_PART_MOD} = {FK_PURGE_PART_RES})"
    fk_edges = [
        ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
         "SELECT o_orderkey FROM orders"),
        ("lineitem.l_partkey->part", "lineitem", "l_partkey",
         f"SELECT p_partkey FROM part WHERE {purge_p}"),
        ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
         "SELECT s_suppkey FROM supplier"),
        ("orders.o_custkey->customer", "orders", "o_custkey",
         f"SELECT c_custkey FROM customer WHERE {purge_c}"),
        (f"customer.c_nationkey->nation",
         f"(SELECT * FROM customer WHERE {purge_c})", "c_nationkey",
         "SELECT n_nationkey FROM nation"),
    ]
    subs = []
    for name, child, ck, parent_sql in fk_edges:
        subs.append(f"""
        SELECT '{name}' AS fk_edge,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM {child}) AS n_child,
               CAST(COUNT(*) AS BIGINT) AS n_orphans,
               CAST(COUNT(DISTINCT k) AS BIGINT) AS n_orphan_keys
        FROM (SELECT {ck} AS k FROM {child}
              WHERE {ck} NOT IN ({parent_sql}))""")
    _ORACLE_SQL["fk_audit"] = " UNION ALL ".join(subs)
    # l_diversity: same QI cells, same deterministic dominant rank.
    _ORACLE_SQL["l_diversity"] = f"""
        WITH cells AS (
            SELECT c_mktsegment AS segment,
                   CAST(FLOOR(c_acctbal / {LDIV_B}) AS BIGINT) AS bal_b,
                   CAST(c_nationkey AS BIGINT) AS nation,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM customer GROUP BY 1, 2, 3
        ),
        per AS (
            SELECT segment, bal_b, CAST(SUM(cnt) AS BIGINT) AS n,
                   CAST(COUNT(*) AS BIGINT) AS n_sensitive
            FROM cells GROUP BY 1, 2
        ),
        top AS (
            SELECT segment, bal_b, nation AS top_nation,
                   cnt AS top_cnt
            FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY segment, bal_b
                    ORDER BY cnt DESC, nation ASC) AS rn
                FROM cells
            ) WHERE rn = 1
        )
        SELECT per.segment, per.bal_b, per.n, per.n_sensitive,
               CAST(per.n_sensitive >= {LDIV_L} AS BIGINT) AS l_ok,
               top.top_nation, top.top_cnt,
               ROUND(top.top_cnt * 1.0 / per.n, 9) AS top_share
        FROM per JOIN top USING (segment, bal_b)
    """
    # pq_quantize: per-subspace Lloyd unrolled as MATERIALIZED CTEs
    # (the kcore inlining lesson), same floor-scaled exact means, same
    # argmax(x·c − ½c·c) scoring with smallest-code ties, same 3-term
    # err² order.
    width = 64 // PQ_M
    ctes, outs = [], []
    for m in range(PQ_M):
        lo, hi = m * width + 1, (m + 1) * width
        ctes.append(
            f"sub{m} AS MATERIALIZED (SELECT vec_id, "
            f"(CAST(embedding AS DOUBLE[]))[{lo}:{hi}] AS subv "
            f"FROM embeddings), "
            f"cb{m}_0 AS MATERIALIZED (SELECT CAST(vec_id AS INT) AS cent_id, "
            f"subv AS cent_vec FROM sub{m} WHERE vec_id < {PQ_KSUB}), "
        )
        for i in range(1, PQ_ITERS + 2):
            prev = f"cb{m}_{i - 1}"
            ctes.append(
                f"s{m}_{i} AS (SELECT e.vec_id, e.subv, c.cent_id, "
                f"LIST_DOT_PRODUCT(e.subv, c.cent_vec) "
                f"- 0.5 * LIST_DOT_PRODUCT(c.cent_vec, c.cent_vec) AS score "
                f"FROM sub{m} e CROSS JOIN {prev} c), "
                f"a{m}_{i} AS MATERIALIZED (SELECT vec_id, subv, "
                f"cent_id AS cluster FROM ("
                f"SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id "
                f"ORDER BY score DESC, cent_id ASC) AS rn FROM s{m}_{i}"
                f") WHERE rn = 1), "
            )
            if i <= PQ_ITERS:
                ctes.append(
                    f"m{m}_{i} AS (SELECT cluster, pos, "
                    f"ROUND(CAST(SUM(CAST(FLOOR(val * 1000000000.0) "
                    f"AS BIGINT)) AS DOUBLE) "
                    f"/ (COUNT(*) * 1000000000.0), 6) AS m FROM ("
                    f"SELECT cluster, UNNEST(subv) AS val, "
                    f"UNNEST(GENERATE_SERIES(1, LEN(subv))) AS pos "
                    f"FROM a{m}_{i}) GROUP BY 1, 2), "
                    f"cb{m}_{i} AS MATERIALIZED (SELECT cluster AS cent_id, "
                    f"LIST(m ORDER BY pos) AS cent_vec FROM m{m}_{i} "
                    f"GROUP BY 1), "
                )
        last_a, last_cb = f"a{m}_{PQ_ITERS + 1}", f"cb{m}_{PQ_ITERS}"
        outs.append(
            f"SELECT a.vec_id, CAST({m} AS BIGINT) AS sub, "
            f"CAST(a.cluster AS BIGINT) AS code, "
            f"ROUND(LIST_DOT_PRODUCT(a.subv, a.subv) "
            f"- 2.0 * LIST_DOT_PRODUCT(a.subv, c.cent_vec) "
            f"+ LIST_DOT_PRODUCT(c.cent_vec, c.cent_vec), 6) AS err6 "
            f"FROM {last_a} a JOIN {last_cb} c ON a.cluster = c.cent_id"
        )
    _ORACLE_SQL["pq_quantize"] = (
        "WITH " + "".join(ctes).rstrip().rstrip(",")
        + " " + " UNION ALL ".join(outs)
    )


_install_s12_batch10_oracles()


def _install_s12_batch11_oracles() -> None:
    # corr_matrix: same integer quantization, HUGEINT exact sums, and
    # the identical float-op order (cast -> sqrt -> multiply ->
    # divide) at FULL precision — the driver's 9-dp canonicalization
    # does the only rounding.
    pair_sqls = []
    cols = [c for c, _ in CORR_COLS]
    scale = dict(CORR_COLS)
    qexp = {
        c: f"CAST(ROUND({c} * {scale[c]}) AS BIGINT)" for c in cols
    }
    stat_cols = ["CAST(COUNT(*) AS BIGINT) AS n"]
    for c in cols:
        stat_cols.append(f"SUM({qexp[c]}) AS s_{c}")
        stat_cols.append(f"SUM({qexp[c]} * {qexp[c]}) AS ss_{c}")
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            stat_cols.append(f"SUM({qexp[a]} * {qexp[b]}) AS sp_{a}_{b}")
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            pair_sqls.append(f"""
            SELECT '{a}' AS col_a, '{b}' AS col_b, n,
                   CAST(s_{a} AS BIGINT) AS sum_a,
                   CAST(s_{b} AS BIGINT) AS sum_b,
                   CAST(n * sp_{a}_{b} - s_{a} * s_{b} AS DOUBLE)
                   / (SQRT(CAST(n * ss_{a} - s_{a} * s_{a} AS DOUBLE))
                      * SQRT(CAST(n * ss_{b} - s_{b} * s_{b} AS DOUBLE)))
                       AS corr
            FROM st""")
    _ORACLE_SQL["corr_matrix"] = (
        "WITH li AS (SELECT *, " + _CORR_REVENUE + " AS l_revenue "
        "FROM lineitem), "
        "st AS MATERIALIZED (SELECT "
        + ", ".join(stat_cols)
        + " FROM li) "
        + " UNION ALL ".join(pair_sqls)
    )
    # join_card_est: same three scenarios, same uniform-assumption
    # estimate, full-precision est / q_error doubles.
    scen_sqls = []
    for name, pred in JCE_SCENARIOS:
        where = f"WHERE {pred}" if pred else ""
        scen_sqls.append(f"""
        SELECT '{name}' AS scenario, f.n_fact, s.n_dim, f.d_fact,
               s.d_dim, a.actual,
               CAST(f.n_fact * s.n_dim AS BIGINT) AS est_num,
               CAST(GREATEST(f.d_fact, s.d_dim) AS BIGINT) AS est_den,
               (f.n_fact * s.n_dim) * 1.0
                   / GREATEST(f.d_fact, s.d_dim) AS est,
               GREATEST(
                   ((f.n_fact * s.n_dim) * 1.0
                    / GREATEST(f.d_fact, s.d_dim)) / a.actual,
                   a.actual / ((f.n_fact * s.n_dim) * 1.0
                               / GREATEST(f.d_fact, s.d_dim))
               ) AS q_error
        FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n_fact,
                     CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS d_fact
              FROM lineitem) f,
             (SELECT CAST(COUNT(*) AS BIGINT) AS n_dim,
                     CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS d_dim
              FROM orders {where}) s,
             (SELECT CAST(COUNT(*) AS BIGINT) AS actual
              FROM lineitem l JOIN (SELECT o_orderkey FROM orders
                                    {where}) o
              ON l.l_orderkey = o.o_orderkey) a""")
    _ORACLE_SQL["join_card_est"] = " UNION ALL ".join(scen_sqls)
    # changepoint_detect: same prefix-sum candidates, same quantized
    # score, same earliest-day argmax.
    _ORACLE_SQL["changepoint_detect"] = f"""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS d,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2
        ),
        cum AS (
            SELECT event_type, d, c,
                   CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY d)
                        AS BIGINT) AS s_l,
                   CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                        ORDER BY d) AS BIGINT) AS n_l,
                   CAST(SUM(c) OVER (PARTITION BY event_type)
                        AS BIGINT) AS s,
                   CAST(COUNT(*) OVER (PARTITION BY event_type)
                        AS BIGINT) AS m
            FROM daily
        ),
        cand AS (
            SELECT event_type, d, n_l, s_l,
                   m - n_l AS n_r, s - s_l AS s_r, s, m,
                   CAST(ROUND(
                       (s_l * s_l * (m - n_l)
                        + (s - s_l) * (s - s_l) * n_l)
                       * {float(CP_SCORE_SCALE)}
                       / (n_l * (m - n_l))) AS BIGINT) AS score
            FROM cum WHERE n_l < m
        ),
        best AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                       ORDER BY score DESC, d ASC) AS rn
            FROM cand
        )
        SELECT event_type, STRFTIME(d, '%Y-%m-%d') AS split_day,
               n_l, s_l, n_r, s_r, score,
               ROUND(s_l * 1.0 / n_l, 6) AS mean_l,
               ROUND(s_r * 1.0 / n_r, 6) AS mean_r
        FROM best WHERE rn = 1
    """


_install_s12_batch11_oracles()


def _install_s12_batch12_oracles() -> None:
    # json_schema_infer: same deterministic payload synthesis, same
    # value-token regex classification, same widening rules.
    payload = """
        '{' || array_to_string(list_filter([
            CASE WHEN event_id % 11 = 0 THEN NULL
                 WHEN event_id % 7 = 0 THEN '"k": "s'
                      || regexp_extract(props, '"k":\\s*([0-9]+)', 1) || '"'
                 ELSE '"k": '
                      || regexp_extract(props, '"k":\\s*([0-9]+)', 1) END,
            CASE WHEN event_id % 3 = 0 THEN '"tag": "t'
                 || CAST(event_id % 4 AS VARCHAR) || '"' END,
            CASE WHEN event_id % 5 = 0 THEN '"score": '
                 || CAST(event_id % 9 AS VARCHAR) || '.5' END,
            CASE WHEN event_id % 2 = 0 THEN '"flag": '
                 || CASE WHEN event_id % 4 = 0 THEN 'true'
                    ELSE 'false' END END
        ], x -> x IS NOT NULL), ', ') || '}'
    """
    key_sqls = []
    for key in JSI_KEYS:
        # the pattern contains double quotes only — safe in a
        # single-quoted SQL literal
        tok = f"regexp_extract(payload, '{_JSI_VAL.format(key=key)}', 1)"
        key_sqls.append(f"""
        SELECT '{key}' AS key, CAST(COUNT(*) AS BIGINT) AS n_total,
               CAST(SUM(CASE WHEN {tok} <> '' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_present,
               CAST(SUM(CASE WHEN regexp_matches({tok}, '^-?[0-9]+$')
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_long,
               CAST(SUM(CASE WHEN regexp_matches({tok},
                    '^-?[0-9]+\\.[0-9]+$') THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_double,
               CAST(SUM(CASE WHEN substring({tok}, 1, 1) = '"'
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_string,
               CAST(SUM(CASE WHEN {tok} IN ('true', 'false')
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_bool,
               CASE WHEN SUM(CASE WHEN substring({tok}, 1, 1) = '"'
                         THEN 1 ELSE 0 END) > 0 THEN 'string'
                    WHEN SUM(CASE WHEN regexp_matches({tok},
                         '^-?[0-9]+\\.[0-9]+$') THEN 1 ELSE 0 END) > 0
                         THEN 'double'
                    WHEN SUM(CASE WHEN {tok} IN ('true', 'false')
                         THEN 1 ELSE 0 END)
                         = SUM(CASE WHEN {tok} <> '' THEN 1 ELSE 0 END)
                         AND SUM(CASE WHEN {tok} <> '' THEN 1 ELSE 0
                         END) > 0 THEN 'bool'
                    WHEN SUM(CASE WHEN regexp_matches({tok},
                         '^-?[0-9]+$') THEN 1 ELSE 0 END) > 0
                         THEN 'long'
                    ELSE 'null' END AS inferred,
               CAST(SUM(CASE WHEN {tok} <> '' THEN 1 ELSE 0 END)
                    < COUNT(*) AS BIGINT) AS nullable
        FROM pl""")
    _ORACLE_SQL["json_schema_infer"] = (
        f"WITH pl AS MATERIALIZED (SELECT event_id, {payload} AS payload "
        "FROM events) " + " UNION ALL ".join(key_sqls)
    )
    # ip_lpm_join: same synthetic IPs, same /8-bucket candidates, same
    # most-specific rank — integer shifts instead of floor/pow (the
    # two formulations agree exactly on <2^32 values).
    _ORACLE_SQL["ip_lpm_join"] = f"""
        WITH ips AS (
            SELECT event_id, user_id,
                   ({LPM_NET_BASE} + user_id % 25) * (1 << 24)
                   + CAST(('0x' || substring(md5(user_id || ':' ||
                         event_id), 1, 6))::UBIGINT AS BIGINT)
                     % (1 << 24) AS ip
            FROM events
        ),
        routes AS (
            SELECT ({LPM_NET_BASE} + n_nationkey) * (1 << 24) AS prefix,
                   CAST(8 AS BIGINT) AS plen,
                   'nation:' || n_name AS owner
            FROM nation
            UNION ALL
            SELECT ({LPM_NET_BASE} + n_nationkey) * (1 << 24)
                       + (7 << 16),
                   CAST(16 AS BIGINT), 'override:' || n_name
            FROM nation WHERE n_nationkey % 5 = 0
        ),
        cand AS (
            SELECT i.event_id, i.user_id, i.ip,
                   r.prefix, r.plen, r.owner
            FROM ips i JOIN routes r
            ON i.ip // (1 << 24) = r.prefix // (1 << 24)
            WHERE i.ip // (1 << (32 - r.plen))
                  = r.prefix // (1 << (32 - r.plen))
        ),
        best AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id
                       ORDER BY plen DESC) AS rn
            FROM cand
        )
        SELECT prefix, plen, owner,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM best WHERE rn = 1 GROUP BY 1, 2, 3
    """
    # slo_burn: same daily error census, same trailing-3 window, same
    # cross-multiplied two-window alert.
    _ORACLE_SQL["slo_burn"] = f"""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS d,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN value > {SLO_THRESHOLD}
                        THEN 1 ELSE 0 END) AS BIGINT) AS err
            FROM events GROUP BY 1, 2
        ),
        j AS (
            SELECT event_type, d, n, err,
                   CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY d
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS n3,
                   CAST(SUM(err) OVER (PARTITION BY event_type ORDER BY d
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS e3
            FROM daily
        )
        SELECT event_type, STRFTIME(d, '%Y-%m-%d') AS d, n, err, n3, e3,
               ROUND(10.0 * err / n, 6) AS burn_1d,
               ROUND(10.0 * e3 / n3, 6) AS burn_3d,
               CAST(5 * err >= n AND 20 * e3 >= 3 * n3 AS BIGINT)
                   AS alert
        FROM j
    """


_install_s12_batch12_oracles()


def _install_s14_batch1_oracles() -> None:
    from ocular_spark.functions import html as _H

    # link_hits: the same hub-overlaid edge list, two unrolled HITS
    # iterations with the identical (x * SCALE) // total integer
    # normalization; the total is a scalar subquery (Spark: 1-row
    # broadcast).  MATERIALIZED hints per the kcore inlining lesson.
    hub_sel = " UNION ALL ".join(
        f"SELECT doc_id AS src, doc_id % {1 << k} AS dst FROM documents"
        for k in range(1, 10)
    )
    its = []
    prev_h = "h0"
    last_a = None
    for i in range(1, HITS_ITERS + 1):
        its.append(
            f"ar{i} AS MATERIALIZED (SELECT e.dst, CAST(SUM(h.h) AS BIGINT)"
            f" AS ar FROM edges e JOIN {prev_h} h ON e.src = h.n"
            f" GROUP BY e.dst), "
            f"a{i} AS MATERIALIZED (SELECT n.n, CAST(COALESCE("
            f"(ar.ar * {HITS_SCALE}) // (SELECT SUM(ar) FROM ar{i}), 0)"
            f" AS BIGINT) AS a FROM nodes n LEFT JOIN ar{i} ar"
            f" ON ar.dst = n.n), "
            f"hr{i} AS MATERIALIZED (SELECT e.src, CAST(SUM(a.a) AS BIGINT)"
            f" AS hr FROM edges e JOIN a{i} a ON e.dst = a.n"
            f" GROUP BY e.src), "
            f"h{i} AS MATERIALIZED (SELECT n.n, CAST(COALESCE("
            f"(hr.hr * {HITS_SCALE}) // (SELECT SUM(hr) FROM hr{i}), 0)"
            f" AS BIGINT) AS h FROM nodes n LEFT JOIN hr{i} hr"
            f" ON hr.src = n.n)"
        )
        prev_h = f"h{i}"
        last_a = f"a{i}"
    _ORACLE_SQL["link_hits"] = (
        "WITH pages AS (SELECT doc_id, "
        + _H.wrap_links_duckdb("text", "doc_id")
        + " AS html FROM documents), "
        "ex AS (SELECT doc_id AS src, unnest("
        + _H.doc_links_expr("html")
        + ") AS d FROM pages), "
        "crawl AS (SELECT src, CAST(d AS BIGINT) AS dst FROM ex), "
        f"hubs AS ({hub_sel}), "
        "edges AS MATERIALIZED (SELECT DISTINCT src, dst FROM "
        "(SELECT * FROM crawl UNION ALL SELECT * FROM hubs) "
        "WHERE src <> dst), "
        "nodes AS MATERIALIZED (SELECT src AS n FROM edges "
        "UNION SELECT dst FROM edges), "
        f"h0 AS (SELECT n, CAST({HITS_SCALE} AS BIGINT) AS h FROM nodes), "
        + ", ".join(its)
        + f" SELECT n AS node, h.h AS hub, a.a AS auth FROM nodes "
        f"JOIN {prev_h} h USING (n) JOIN {last_a} a USING (n)"
    )
    # redirect_resolve: step-by-step recursive-CTE walk (a different
    # algorithm from the doubling composition); resolved rows are the
    # unique walk row whose cursor is not a redirect source, cycle
    # rows are starts that never resolve within the 2^ROUNDS bound.
    bound = 1 << REDIR_ROUNDS
    _ORACLE_SQL["redirect_resolve"] = f"""
        WITH RECURSIVE m AS MATERIALIZED (
            SELECT u, v FROM (
                SELECT doc_id AS u, CAST({REDIR_CASE} AS BIGINT) AS v
                FROM documents
            ) WHERE v IS NOT NULL
        ),
        walk AS (
            SELECT u AS start, v AS cur, 1 AS d FROM m
            UNION ALL
            SELECT w.start, m.v, w.d + 1 FROM walk w
            JOIN m ON w.cur = m.u WHERE w.d < {bound}
        ),
        resolved AS (
            SELECT w.start, w.cur AS final, CAST(w.d AS BIGINT) AS dist
            FROM walk w LEFT JOIN m ON w.cur = m.u
            WHERE m.u IS NULL
        )
        SELECT start, final, dist, CAST(0 AS BIGINT) AS is_cycle
        FROM resolved
        UNION ALL
        SELECT u AS start, CAST(NULL AS BIGINT) AS final,
               CAST(NULL AS BIGINT) AS dist, CAST(1 AS BIGINT) AS is_cycle
        FROM m WHERE u NOT IN (SELECT start FROM resolved)
    """
    # benford_audit: same cents-string first digit, same full grid,
    # same quantized expected table (the identical Python-computed
    # CASE literal), same integer chi-square.
    exp_case = BENFORD_EXP_CASE
    _ORACLE_SQL["benford_audit"] = f"""
        WITH per AS (
            SELECT o_orderstatus AS status,
                   CAST(substring(CAST(CAST(FLOOR(o_totalprice * 100 + 0.5)
                        AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit,
                   CAST(COUNT(*) AS BIGINT) AS n_obs
            FROM orders GROUP BY 1, 2
        ),
        grid AS (
            SELECT status, CAST(digit AS BIGINT) AS digit
            FROM (SELECT DISTINCT o_orderstatus AS status FROM orders)
            CROSS JOIN generate_series(1, 9) AS g(digit)
        ),
        cells AS (
            SELECT g.status, g.digit,
                   CAST(COALESCE(p.n_obs, 0) AS BIGINT) AS n_obs
            FROM grid g LEFT JOIN per p
            ON g.status = p.status AND g.digit = p.digit
        ),
        w AS (
            SELECT status, digit, n_obs,
                   CAST(SUM(n_obs) OVER (PARTITION BY status) AS BIGINT)
                       AS n_total,
                   CAST({exp_case} AS BIGINT) AS exp_scaled
            FROM cells
        ),
        f AS (
            SELECT status, digit, n_obs, n_total, exp_scaled,
                   CAST(n_total * exp_scaled AS BIGINT) AS expected_n_scaled,
                   CAST(((n_obs * {BENFORD_SCALE} - n_total * exp_scaled)
                        * (n_obs * {BENFORD_SCALE} - n_total * exp_scaled))
                        // (n_total * exp_scaled) AS BIGINT) AS contrib_q
            FROM w
        )
        SELECT status, digit, n_obs, n_total, exp_scaled, expected_n_scaled,
               contrib_q,
               CAST(SUM(contrib_q) OVER (PARTITION BY status) AS BIGINT)
                   AS chi2_q
        FROM f
    """


_install_s14_batch1_oracles()


def _install_s14_batch2_oracles() -> None:
    # politeness_schedule: step-by-step recursive-CTE fold of
    # t_i = max(avail_i, t_{i-1} + D) per host — the Spark side's
    # prefix-max linearization is the thing under test.
    D = POLITE_DELAY_US
    _ORACLE_SQL["politeness_schedule"] = f"""
        WITH RECURSIVE ranked AS (
            SELECT user_id AS host, event_id,
                   CAST(date_diff('microsecond',
                        TIMESTAMP '2024-01-01 00:00:00', ts) AS BIGINT)
                       AS avail_us,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id
                       ORDER BY date_diff('microsecond',
                                TIMESTAMP '2024-01-01 00:00:00', ts),
                                event_id) AS rn
            FROM events
        ), walk AS (
            SELECT host, event_id, avail_us, rn, avail_us AS start_us
            FROM ranked WHERE rn = 1
            UNION ALL
            SELECT r.host, r.event_id, r.avail_us, r.rn,
                   GREATEST(r.avail_us, w.start_us + {D})
            FROM walk w JOIN ranked r
              ON r.host = w.host AND r.rn = w.rn + 1
        )
        SELECT host, event_id, CAST(rn - 1 AS BIGINT) AS seq, avail_us,
               CAST(start_us AS BIGINT) AS start_us,
               CAST(start_us - avail_us AS BIGINT) AS wait_us,
               CAST(CASE WHEN start_us > avail_us THEN 1 ELSE 0 END
                    AS BIGINT) AS delayed
        FROM walk
    """
    # critical_path: enumerate EVERY path in the per-block DAG (the
    # same edge arms as _cpm_edges_py, derived in SQL) and take
    # max(sum of durations of non-terminal nodes) per endpoint —
    # Bellman's principle says this equals the forward DP.
    B = CPM_BLOCK
    _ORACLE_SQL["critical_path"] = f"""
        WITH RECURSIVE edges AS MATERIALIZED (
            SELECT u, v, 1 + (u % 4) * 2 AS dur FROM (
                SELECT doc_id AS u,
                       doc_id + CASE WHEN doc_id % 4 <> 3 THEN 1 ELSE 2 END
                           AS v
                FROM documents
                UNION ALL
                SELECT doc_id, doc_id + 5 FROM documents
                WHERE (doc_id % {B}) % 7 = 1
            ) t
            WHERE v // {B} = u // {B}
              AND v IN (SELECT doc_id FROM documents)
        ),
        walk AS (
            SELECT v AS cur, dur AS dsum FROM edges
            UNION ALL
            SELECT e.v, w.dsum + e.dur FROM walk w
            JOIN edges e ON e.u = w.cur
        ),
        es AS (SELECT cur AS task, MAX(dsum) AS es FROM walk GROUP BY cur),
        base AS (
            SELECT d.doc_id AS task, d.doc_id // {B} AS block,
                   CAST(COALESCE(es.es, 0) AS BIGINT) AS es,
                   CAST(1 + (d.doc_id % 4) * 2 AS BIGINT) AS dur
            FROM documents d LEFT JOIN es ON es.task = d.doc_id
        )
        SELECT task, block, es, dur, es + dur AS ef,
               CAST(MAX(es + dur) OVER (PARTITION BY block) AS BIGINT)
                   AS makespan,
               CAST(CASE WHEN es + dur = MAX(es + dur)
                         OVER (PARTITION BY block)
                    THEN 1 ELSE 0 END AS BIGINT) AS tail_critical
        FROM base
    """
    # spatial_grid_join: brute-force O(N^2) cross join — the grid
    # pruning (cell hash + 3x3 probe) is the thing under test.
    R2 = SPATIAL_R * SPATIAL_R
    _ORACLE_SQL["spatial_grid_join"] = f"""
        WITH q AS (
            SELECT event_id,
                   CAST({SPATIAL_X_SQL} AS BIGINT) AS x,
                   CAST({SPATIAL_Y_SQL} AS BIGINT) AS y
            FROM events
        )
        SELECT a.event_id AS a, b.event_id AS b,
               CAST((a.x - b.x) * (a.x - b.x)
                    + (a.y - b.y) * (a.y - b.y) AS BIGINT) AS dist_sq
        FROM q a JOIN q b
          ON a.event_id < b.event_id
         AND (a.x - b.x) * (a.x - b.x)
             + (a.y - b.y) * (a.y - b.y) <= {R2}
    """


_install_s14_batch2_oracles()


def _install_s14_batch3_oracles() -> None:
    # phrase_search: sequential LEAD-window scan per document — no
    # index; the posting-list intersection is the thing under test.
    # DuckDB zips parallel UNNESTs, giving 0-based token positions.
    arms = []
    for pid, words in PHRASES.items():
        cond = f"tok = '{words[0]}'" + "".join(
            f" AND t{k} = '{w}'" for k, w in enumerate(words[1:], 1)
        )
        arms.append(
            f"SELECT CAST({pid} AS BIGINT) AS phrase_id, doc_id,"
            f" CAST(pos AS BIGINT) AS pos FROM scan WHERE {cond}"
        )
    _ORACLE_SQL["phrase_search"] = (
        "WITH toks AS (SELECT doc_id,"
        " UNNEST(string_split(text, ' ')) AS tok,"
        " UNNEST(range(len(string_split(text, ' ')))) AS pos"
        " FROM documents), "
        "scan AS (SELECT doc_id, pos, tok,"
        " LEAD(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS t1,"
        " LEAD(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS t2"
        " FROM toks) "
        + " UNION ALL ".join(arms)
    )
    # bitmap_intersect: the relational path — DISTINCT user sets,
    # self-join on user, COUNT — vs the Spark side's bitmap algebra.
    _ORACLE_SQL["bitmap_intersect"] = """
        WITH pres AS (
            SELECT DISTINCT event_type AS t,
                   user_id * 1024
                   + date_diff('microsecond',
                               TIMESTAMP '2024-01-01 00:00:00', ts)
                     // 86400000000 AS u
            FROM events
        ),
        totals AS (
            SELECT t, CAST(COUNT(*) AS BIGINT) AS n FROM pres GROUP BY t
        ),
        common AS (
            SELECT a.t AS type_a, b.t AS type_b,
                   CAST(COUNT(*) AS BIGINT) AS nc
            FROM pres a JOIN pres b ON a.u = b.u AND a.t < b.t
            GROUP BY a.t, b.t
        ),
        grid AS (
            SELECT a.t AS type_a, b.t AS type_b
            FROM totals a JOIN totals b ON a.t < b.t
        )
        SELECT g.type_a, g.type_b, ta.n AS n_a, tb.n AS n_b,
               CAST(COALESCE(c.nc, 0) AS BIGINT) AS n_common
        FROM grid g
        JOIN totals ta ON ta.t = g.type_a
        JOIN totals tb ON tb.t = g.type_b
        LEFT JOIN common c
          ON c.type_a = g.type_a AND c.type_b = g.type_b
    """
    # poisson_bootstrap: identical deterministic construction (the
    # LCG, the quantized pmf CASE, the integer mean, the rank-based
    # CI) — the gate pins cross-engine integer agreement end-to-end.
    _ORACLE_SQL["poisson_bootstrap"] = f"""
        WITH reps AS (
            SELECT b.b, e.event_id,
                   CAST(FLOOR(e.value * 100 + 0.5) AS BIGINT) AS cents,
                   {BOOT_R} AS r
            FROM events e
            CROSS JOIN (SELECT UNNEST(range({BOOT_B})) AS b) b
        ),
        mm AS (
            SELECT b, cents, CAST({BOOT_M_CASE} AS BIGINT) AS m FROM reps
        ),
        agg AS (
            SELECT b, CAST(SUM(m) AS BIGINT) AS n_eff,
                   CAST(SUM(m * cents) AS BIGINT) AS sum_cents
            FROM mm GROUP BY b
        ),
        q AS (
            SELECT b, n_eff, sum_cents,
                   CAST((sum_cents * 1000000) // n_eff AS BIGINT) AS mean_q,
                   ROW_NUMBER() OVER (ORDER BY (sum_cents * 1000000)
                                      // n_eff, b) AS rn
            FROM agg
        )
        SELECT b, n_eff, sum_cents, mean_q,
               CAST(MAX(CASE WHEN rn = {BOOT_LO} THEN mean_q END)
                    OVER () AS BIGINT) AS lo_q,
               CAST(MAX(CASE WHEN rn = {BOOT_HI} THEN mean_q END)
                    OVER () AS BIGINT) AS hi_q
        FROM q
    """


_install_s14_batch3_oracles()


def _install_s14_batch4_oracles() -> None:
    # consistent_ring: the identical ring-literal successor search in
    # DuckDB list algebra (list_filter/list_min with the same encoded
    # combos) — the gate pins cross-engine agreement of the encoding,
    # the wraparound, and the move set.
    def owner(combos):
        lit = "[" + ",".join(str(c) for c in combos) + "]"
        return (
            f"COALESCE(list_min(list_filter({lit},"
            f" c -> c >= ({RING_KEY_SQL}) * 64)),"
            f" {min(combos)}) % 64"
        )

    _ORACLE_SQL["consistent_ring"] = f"""
        WITH assign AS (
            SELECT doc_id,
                   CAST({owner(RING_COMBOS_OLD)} AS BIGINT) AS old_node,
                   CAST({owner(RING_COMBOS_NEW)} AS BIGINT) AS new_node
            FROM documents
        )
        SELECT doc_id, old_node, new_node,
               CAST(CASE WHEN old_node <> new_node THEN 1 ELSE 0 END
                    AS BIGINT) AS moved
        FROM assign
    """
    # hierarchy_rollup: climb the parent chain row-by-row in a
    # recursive CTE (node -> node // 2 until root 0) — the Spark
    # side's bounded ancestor-explode is the thing under test.
    _ORACLE_SQL["hierarchy_rollup"] = """
        WITH RECURSIVE climb AS (
            SELECT doc_id AS node, n_chars FROM documents
            UNION ALL
            SELECT node // 2, n_chars FROM climb WHERE node > 0
        ),
        rolled AS (
            SELECT node, CAST(SUM(n_chars) AS BIGINT) AS subtree_chars,
                   CAST(COUNT(*) AS BIGINT) AS n_desc
            FROM climb GROUP BY node
        )
        SELECT d.doc_id AS node, r.subtree_chars, r.n_desc
        FROM documents d JOIN rolled r ON r.node = d.doc_id
    """
    # cdf_drift: same one-pass cumulative construction (same buckets,
    # same cross-multiplied integers, same gap weighting).
    day = (
        "date_diff('microsecond', TIMESTAMP '2024-01-01 00:00:00', ts)"
        " // 86400000000"
    )
    _ORACLE_SQL["cdf_drift"] = f"""
        WITH base AS (
            SELECT event_type AS etype,
                   CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                       // {CDF_BUCKET_CENTS} AS bucket,
                   CASE WHEN {day} < {CDF_SPLIT_DAY} THEN 1 ELSE 0 END
                       AS in_a
            FROM events
        ),
        per AS (
            SELECT etype, bucket,
                   CAST(SUM(in_a) AS BIGINT) AS n_a,
                   CAST(SUM(1 - in_a) AS BIGINT) AS n_b
            FROM base GROUP BY etype, bucket
        ),
        cums AS (
            SELECT etype, bucket, n_a, n_b,
                   CAST(SUM(n_a) OVER (PARTITION BY etype) AS BIGINT)
                       AS tot_a,
                   CAST(SUM(n_b) OVER (PARTITION BY etype) AS BIGINT)
                       AS tot_b,
                   CAST(SUM(n_a) OVER (PARTITION BY etype ORDER BY bucket)
                        AS BIGINT) AS cum_a,
                   CAST(SUM(n_b) OVER (PARTITION BY etype ORDER BY bucket)
                        AS BIGINT) AS cum_b,
                   CAST(COALESCE(LEAD(bucket) OVER (PARTITION BY etype
                        ORDER BY bucket) - bucket, 0) AS BIGINT) AS gap
            FROM per
        ),
        contrib AS (
            SELECT *, CAST(ABS(cum_a * tot_b - cum_b * tot_a) * gap
                           AS BIGINT) AS contrib_q
            FROM cums
        )
        SELECT etype, bucket, n_a, n_b, cum_a, cum_b, gap, contrib_q,
               CAST(SUM(contrib_q) OVER (PARTITION BY etype) AS BIGINT)
                   AS emd_q,
               CAST(MAX(ABS(cum_a * tot_b - cum_b * tot_a))
                    OVER (PARTITION BY etype) AS BIGINT) AS ks_q
        FROM contrib
    """


_install_s14_batch4_oracles()


def _install_s14_batch5_oracles() -> None:
    # hysteresis_alerts: step the Schmitt recurrence row-by-row in a
    # recursive CTE — the last-non-deadband linearization is the
    # thing under test.
    H, L = HYST_H_CENTS, HYST_L_CENTS
    _ORACLE_SQL["hysteresis_alerts"] = f"""
        WITH RECURSIVE ranked AS (
            SELECT user_id AS host, event_id,
                   CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id
                       ORDER BY date_diff('microsecond',
                                TIMESTAMP '2024-01-01 00:00:00', ts),
                                event_id) AS rn
            FROM events
        ), walk AS (
            SELECT host, event_id, cents, rn,
                   CASE WHEN cents >= {H} THEN 1
                        WHEN cents <= {L} THEN 0 ELSE 0 END AS state,
                   CAST(0 AS BIGINT) AS prev
            FROM ranked WHERE rn = 1
            UNION ALL
            SELECT r.host, r.event_id, r.cents, r.rn,
                   CASE WHEN r.cents >= {H} THEN 1
                        WHEN r.cents <= {L} THEN 0
                        ELSE w.state END,
                   CAST(w.state AS BIGINT)
            FROM walk w JOIN ranked r
              ON r.host = w.host AND r.rn = w.rn + 1
        )
        SELECT host, event_id, cents, CAST(state AS BIGINT) AS state,
               CAST(CASE WHEN prev = 0 AND state = 1 THEN 1 ELSE 0 END
                    AS BIGINT) AS alert_on,
               CAST(CASE WHEN prev = 1 AND state = 0 THEN 1 ELSE 0 END
                    AS BIGINT) AS alert_off
        FROM walk
    """
    # fair_share: the identical closed form in SQL windows (the
    # ITERATIVE water-filling replay lives in the pytest law, which
    # is where the two-algorithms check happens for this row).
    _ORACLE_SQL["fair_share"] = f"""
        WITH dem AS (
            SELECT event_type AS pool, user_id AS usr,
                   CAST(COUNT(*) AS BIGINT) AS demand
            FROM events GROUP BY 1, 2
        ),
        rk AS (
            SELECT pool, usr, demand,
                   CAST(COUNT(*) OVER (PARTITION BY pool) AS BIGINT) AS n,
                   CAST(SUM(demand) OVER (PARTITION BY pool) AS BIGINT)
                       AS tot,
                   CAST(ROW_NUMBER() OVER (PARTITION BY pool
                        ORDER BY demand, usr) AS BIGINT) AS rn,
                   CAST(SUM(demand) OVER (PARTITION BY pool
                        ORDER BY demand, usr) AS BIGINT) AS pref
            FROM dem
        ),
        fl AS (
            SELECT *, (tot * {FAIR_CAP_NUM}) // {FAIR_CAP_DEN} AS cap,
                   CASE WHEN demand * (n - rn + 1) + pref - demand
                        <= (tot * {FAIR_CAP_NUM}) // {FAIR_CAP_DEN}
                        THEN 1 ELSE 0 END AS is_full
            FROM rk
        ),
        agg AS (
            SELECT *, CAST(SUM(is_full) OVER (PARTITION BY pool) AS BIGINT)
                       AS k,
                   CAST(COALESCE(MAX(CASE WHEN is_full = 1 THEN pref END)
                        OVER (PARTITION BY pool), 0) AS BIGINT) AS p_k
            FROM fl
        )
        , fin AS (
            SELECT pool, usr, demand, cap,
                   CAST(CASE WHEN is_full = 1 THEN demand
                        ELSE (cap - p_k) // (n - k)
                             + CASE WHEN rn - k <= (cap - p_k) % (n - k)
                                    THEN 1 ELSE 0 END END AS BIGINT)
                       AS alloc
            FROM agg
        )
        SELECT pool, usr, demand, CAST(cap AS BIGINT) AS cap,
               CAST(CASE WHEN alloc = demand THEN 1 ELSE 0 END AS BIGINT)
                   AS satisfied,
               alloc
        FROM fin
    """
    # threshold_topk: the full-scan sort — TA's certificate claims
    # this oracle is reproduced from two 60-row prefixes.
    _ORACLE_SQL["threshold_topk"] = f"""
        WITH scored AS (
            SELECT doc_id, CAST(n_chars AS BIGINT) AS s1,
                   CAST(((doc_id % 1000003) * 48271 + 11)
                        % 2147483647 % 1000 AS BIGINT) AS s2
            FROM documents
        ),
        ranked AS (
            SELECT doc_id, s1, s2, s1 + s2 AS total,
                   ROW_NUMBER() OVER (ORDER BY s1 + s2 DESC, doc_id)
                       AS rk,
                   ROW_NUMBER() OVER (ORDER BY s1 DESC, doc_id) AS r1,
                   ROW_NUMBER() OVER (ORDER BY s2 DESC, doc_id) AS r2
            FROM scored
        ),
        tau AS (
            SELECT (SELECT s1 FROM ranked WHERE r1 = {TA_DEPTH})
                 + (SELECT s2 FROM ranked WHERE r2 = {TA_DEPTH}) AS t
        )
        SELECT doc_id, s1, s2, CAST(total AS BIGINT) AS total,
               CAST(rk AS BIGINT) AS rk,
               CAST(CASE WHEN (SELECT MIN(total) FROM ranked
                               WHERE rk <= {TA_K})
                         >= (SELECT t FROM tau)
                    THEN 1 ELSE 0 END AS BIGINT) AS cert
        FROM ranked WHERE rk <= {TA_K}
    """


_install_s14_batch5_oracles()


def _install_s14_batch6_oracles() -> None:
    # max_drawdown: the same window algebra (cum / running peak /
    # max difference) — prefix-monotone, so no fold is needed in
    # either engine.
    pos = ", ".join(f"'{t}'" for t in DRAWDOWN_POS_TYPES)
    _ORACLE_SQL["max_drawdown"] = f"""
        WITH base AS (
            SELECT user_id AS host, event_id,
                   CASE WHEN event_type IN ({pos}) THEN 1 ELSE -1 END
                   * CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS delta,
                   date_diff('microsecond',
                             TIMESTAMP '2024-01-01 00:00:00', ts) AS us
            FROM events
        ),
        runs AS (
            SELECT host, event_id, us,
                   CAST(SUM(delta) OVER w AS BIGINT) AS cum
            FROM base
            WINDOW w AS (PARTITION BY host ORDER BY us, event_id
                         ROWS UNBOUNDED PRECEDING)
        ),
        dd AS (
            SELECT host, us, event_id, cum,
                   GREATEST(0, CAST(MAX(cum) OVER w AS BIGINT)) AS peak,
                   ROW_NUMBER() OVER (PARTITION BY host
                       ORDER BY us DESC, event_id DESC) AS rlast
            FROM runs
            WINDOW w AS (PARTITION BY host ORDER BY us, event_id
                         ROWS UNBOUNDED PRECEDING)
        )
        SELECT host, CAST(COUNT(*) AS BIGINT) AS n_events,
               GREATEST(0, CAST(MAX(cum) AS BIGINT)) AS peak_cents,
               CAST(MAX(CASE WHEN rlast = 1 THEN cum END) AS BIGINT)
                   AS final_cents,
               CAST(MAX(peak - cum) AS BIGINT) AS max_drawdown
        FROM dd GROUP BY host
    """
    # sprt_decision: identical stopped-walk recovery (prefix sum,
    # first crossing, verdict from that row's direction).
    _ORACLE_SQL["sprt_decision"] = f"""
        WITH base AS (
            SELECT user_id AS usr, event_id,
                   CASE WHEN event_type = 'purchase' THEN {SPRT_L1}
                        ELSE {SPRT_L0} END AS llr,
                   date_diff('microsecond',
                             TIMESTAMP '2024-01-01 00:00:00', ts) AS us
            FROM events
        ),
        runs AS (
            SELECT usr, event_id,
                   ROW_NUMBER() OVER w - 1 AS seq,
                   CAST(SUM(llr) OVER (PARTITION BY usr ORDER BY us,
                        event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
                       AS cum
            FROM base
            WINDOW w AS (PARTITION BY usr ORDER BY us, event_id)
        ),
        marked AS (
            SELECT *, CASE WHEN cum >= {SPRT_A} THEN 1
                           WHEN cum <= -{SPRT_A} THEN -1 END AS dir
            FROM runs
        ),
        agg AS (
            SELECT usr,
                   MIN(CASE WHEN dir IS NOT NULL THEN seq END) AS dseq,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM marked GROUP BY usr
        )
        SELECT a.usr, a.n_events,
               CAST(COALESCE(a.dseq, -1) AS BIGINT) AS decision_seq,
               CASE WHEN m.dir = 1 THEN 'accept_h1'
                    WHEN m.dir = -1 THEN 'accept_h0'
                    ELSE 'continue' END AS decision,
               CAST(COALESCE(m.cum, 0) AS BIGINT) AS llr_stop
        FROM agg a LEFT JOIN marked m
          ON m.usr = a.usr AND m.seq = a.dseq
    """
    # chain_ladder: same triangle, same quantized factors, the same
    # bounded rollforward unrolled as CL_COHORTS-1 CTE steps.
    steps = []
    prev = "diag"
    for s in range(1, CL_COHORTS):
        steps.append(
            f"p{s} AS (SELECT p.cohort, p.age + 1 AS age,"
            f" CAST((p.cum * f.f_q) // {CL_SCALE} AS BIGINT) AS cum"
            f" FROM {prev} p JOIN factors f ON f.age = p.age"
            f" WHERE p.age + 1 <= (SELECT w FROM horizon))"
        )
        prev = f"p{s}"
    proj_union = " UNION ALL ".join(
        f"SELECT cohort, age, cum AS cum_cents,"
        f" CAST(0 AS BIGINT) AS is_observed FROM p{s}"
        for s in range(1, CL_COHORTS)
    )
    _ORACLE_SQL["chain_ladder"] = f"""
        WITH base AS (
            SELECT user_id % {CL_COHORTS} AS cohort,
                   date_diff('microsecond',
                             TIMESTAMP '2024-01-01 00:00:00', ts)
                       // {CL_WEEK_US} AS wk,
                   CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
            FROM events
        ),
        filt AS (SELECT * FROM base WHERE wk >= cohort),
        horizon AS (SELECT MAX(wk) AS w FROM filt),
        inc AS (
            SELECT cohort, wk - cohort AS age,
                   CAST(SUM(cents) AS BIGINT) AS inc
            FROM filt GROUP BY 1, 2
        ),
        grid AS (
            SELECT c.c AS cohort, a.a AS age
            FROM (SELECT UNNEST(range({CL_COHORTS})) AS c) c
            CROSS JOIN (SELECT UNNEST(range((SELECT w FROM horizon) + 1))
                        AS a) a
            WHERE a.a <= (SELECT w FROM horizon) - c.c
        ),
        obs AS MATERIALIZED (
            SELECT g.cohort, g.age,
                   CAST(SUM(COALESCE(i.inc, 0)) OVER (
                        PARTITION BY g.cohort ORDER BY g.age
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
            FROM grid g LEFT JOIN inc i
              ON i.cohort = g.cohort AND i.age = g.age
        ),
        factors AS MATERIALIZED (
            SELECT o.age,
                   CAST((SUM(n.cum) * {CL_SCALE}) // SUM(o.cum) AS BIGINT)
                       AS f_q
            FROM obs o JOIN obs n
              ON n.cohort = o.cohort AND n.age = o.age + 1
            GROUP BY o.age
        ),
        diag AS (
            SELECT cohort, age, cum FROM obs
            WHERE age = (SELECT w FROM horizon) - cohort
        ),
        {", ".join(steps)}
        SELECT cohort, age, cum AS cum_cents,
               CAST(1 AS BIGINT) AS is_observed FROM obs
        UNION ALL
        {proj_union}
    """


_install_s14_batch6_oracles()


def _install_s14_batch7_oracles() -> None:
    # point_in_polygon: the same literal-unrolled crossing expression
    # (CASE syntax and integer arithmetic are engine-identical).
    inside = {
        p: f"({_pip_crossings_sql(poly, 'x', 'y')} % 2)"
        for p, poly in PIP_POLYS.items()
    }
    n_inside = " + ".join(inside.values())
    mask = " + ".join(f"({ex}) * {1 << p}" for p, ex in inside.items())
    _ORACLE_SQL["point_in_polygon"] = f"""
        WITH pts AS (
            SELECT event_id AS pid,
                   CAST({SPATIAL_X_SQL} AS BIGINT) AS x,
                   CAST({SPATIAL_Y_SQL} AS BIGINT) AS y
            FROM events
        )
        SELECT pid, x, y,
               CAST({n_inside} AS BIGINT) AS n_inside,
               CAST({mask} AS BIGINT) AS poly_mask
        FROM pts
    """
    # knapsack_plan: EXHAUSTIVE subset enumeration — every one of the
    # 2^15 masks, weight/value sums via the set-bit join, then the
    # (max value, min weight) argmax per block.  The DP is the thing
    # under test; this oracle is the optimality proof.
    M = 1 << KNAP_BLOCK
    _ORACLE_SQL["knapsack_plan"] = f"""
        WITH items AS MATERIALIZED (
            SELECT doc_id // {KNAP_BLOCK} AS block,
                   CAST((n_chars % 50) + 10 AS BIGINT) AS w,
                   CAST(n_chars AS BIGINT) AS v,
                   ROW_NUMBER() OVER (PARTITION BY doc_id // {KNAP_BLOCK}
                                      ORDER BY doc_id) - 1 AS pos
            FROM documents
        ),
        caps AS (
            SELECT block, CAST(COUNT(*) AS BIGINT) AS n_items,
                   CAST(SUM(w) AS BIGINT) AS w_tot,
                   (SUM(w) * {KNAP_CAP_NUM}) // {KNAP_CAP_DEN} AS cap
            FROM items GROUP BY block
        ),
        masks AS (SELECT UNNEST(range({M})) AS mask),
        sums AS (
            SELECT i.block, m.mask,
                   CAST(SUM(i.w) AS BIGINT) AS w_sum,
                   CAST(SUM(i.v) AS BIGINT) AS v_sum
            FROM masks m JOIN items i ON ((m.mask >> i.pos) & 1) = 1
            GROUP BY i.block, m.mask
        ),
        feas AS (
            SELECT s.block, s.w_sum, s.v_sum
            FROM sums s JOIN caps c ON c.block = s.block
            WHERE s.w_sum <= c.cap
        ),
        best AS (
            SELECT block, MAX(v_sum) AS best_value FROM feas GROUP BY block
        )
        SELECT c.block, c.n_items, c.w_tot, CAST(c.cap AS BIGINT) AS cap,
               CAST(b.best_value AS BIGINT) AS best_value,
               CAST(MIN(f.w_sum) AS BIGINT) AS best_weight
        FROM caps c
        JOIN best b ON b.block = c.block
        JOIN feas f ON f.block = c.block AND f.v_sum = b.best_value
        GROUP BY c.block, c.n_items, c.w_tot, c.cap, b.best_value
    """
    # activity_select: step the earliest-end greedy in a recursive
    # CTE, carrying (last kept end, kept count).
    _ORACLE_SQL["activity_select"] = f"""
        WITH RECURSIVE iv AS (
            SELECT user_id AS host, event_id,
                   CAST(date_diff('microsecond',
                        TIMESTAMP '2024-01-01 00:00:00', ts) AS BIGINT)
                       AS start_us,
                   CAST(date_diff('microsecond',
                        TIMESTAMP '2024-01-01 00:00:00', ts)
                        + FLOOR(value * 100 + 0.5)
                          * {ACT_DUR_US_PER_CENT} AS BIGINT) AS end_us,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id
                       ORDER BY date_diff('microsecond',
                                TIMESTAMP '2024-01-01 00:00:00', ts)
                                + FLOOR(value * 100 + 0.5)
                                  * {ACT_DUR_US_PER_CENT},
                                event_id) AS rn
            FROM events
        ), walk AS (
            SELECT host, event_id, start_us, end_us, rn,
                   TRUE AS kept, end_us AS last_end,
                   CAST(1 AS BIGINT) AS kcnt
            FROM iv WHERE rn = 1
            UNION ALL
            SELECT i.host, i.event_id, i.start_us, i.end_us, i.rn,
                   i.start_us >= w.last_end,
                   CASE WHEN i.start_us >= w.last_end THEN i.end_us
                        ELSE w.last_end END,
                   w.kcnt + CASE WHEN i.start_us >= w.last_end
                                 THEN 1 ELSE 0 END
            FROM walk w JOIN iv i
              ON i.host = w.host AND i.rn = w.rn + 1
        )
        SELECT host, event_id, start_us, end_us,
               CAST(kcnt AS BIGINT) AS k_idx
        FROM walk WHERE kept
    """


_install_s14_batch7_oracles()


def _install_s15_batch1_oracles() -> None:
    # spearman_corr: identical 2*avgrank integerization; every SUM is
    # CAST to BIGINT (DuckDB SUM(BIGINT) -> HUGEINT breaks the value
    # hash, round-2 lesson); the one division + sqrt assembled in the
    # same order as the Spark expression.
    _ORACLE_SQL["spearman_corr"] = """
        WITH b AS (
            SELECT source, CAST(n_chars AS BIGINT) AS x,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS y
            FROM documents
        ),
        r AS (
            SELECT source,
                   2 * RANK() OVER (PARTITION BY source ORDER BY x)
                     + COUNT(*) OVER (PARTITION BY source, x) - 1 AS rx,
                   2 * RANK() OVER (PARTITION BY source ORDER BY y)
                     + COUNT(*) OVER (PARTITION BY source, y) - 1 AS ry
            FROM b
        ),
        a AS (
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(rx) AS BIGINT) AS sx,
                   CAST(SUM(ry) AS BIGINT) AS sy,
                   CAST(SUM(rx * rx) AS BIGINT) AS sxx,
                   CAST(SUM(ry * ry) AS BIGINT) AS syy,
                   CAST(SUM(rx * ry) AS BIGINT) AS sxy
            FROM r GROUP BY source
        )
        SELECT source, n AS n_docs,
               ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                     / SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                            * CAST(n * syy - sy * sy AS DOUBLE)),
                     6) AS rho
        FROM a
    """
    # gini_concentration: same sorted-prefix algebra; gini_num under
    # the gate as an exact BIGINT.
    _ORACLE_SQL["gini_concentration"] = """
        WITH r AS (
            SELECT source, CAST(n_chars AS BIGINT) AS x,
                   CAST(ROW_NUMBER() OVER (
                        PARTITION BY source ORDER BY n_chars, doc_id
                   ) AS BIGINT) AS i
            FROM documents
        ),
        a AS (
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS tot,
                   CAST(SUM(i * x) AS BIGINT) AS six
            FROM r GROUP BY source
        )
        SELECT source, n AS n_docs, tot AS total_chars,
               2 * six - (n + 1) * tot AS gini_num,
               ROUND(CAST(2 * six - (n + 1) * tot AS DOUBLE)
                     / CAST(n * tot AS DOUBLE), 6) AS gini
        FROM a
    """
    # top_paths: ordered STRING_AGG mirrors the sorted-collect_list;
    # rank computed over the full count relation then cut at K (same
    # total order as Spark's TakeOrderedAndProject + K-row window).
    _ORACLE_SQL["top_paths"] = f"""
        WITH seq AS (
            SELECT user_id, event_type,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS rn
            FROM events
        ),
        p AS (
            SELECT user_id,
                   STRING_AGG(event_type, '>' ORDER BY rn) AS path
            FROM seq WHERE rn <= {TOP_PATHS_LEN} GROUP BY user_id
        ),
        c AS (
            SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
            FROM p GROUP BY path
        ),
        ranked AS (
            SELECT path, n_users,
                   CAST(ROW_NUMBER() OVER (
                       ORDER BY n_users DESC, path
                   ) AS BIGINT) AS rank_idx
            FROM c
        )
        SELECT path, n_users, rank_idx
        FROM ranked WHERE rank_idx <= {TOP_PATHS_K}
    """


_install_s15_batch1_oracles()


def _install_s15_batch2_oracles() -> None:
    # fifo_match: INDEPENDENT formulation — a recursive-CTE
    # two-pointer queue walk (one row per match, state = both
    # pointers + consumed amounts), vs the Spark side's
    # interval-overlap algebra.  Equal-remainder steps advance BOTH
    # pointers, exactly where the overlap form emits touching
    # (zero-overlap) intervals that the qty>0 filter drops.
    _ORACLE_SQL["fifo_match"] = f"""
        WITH RECURSIVE c AS (
            SELECT user_id, event_id,
                   CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS qty,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS rn
            FROM events
            WHERE event_type = '{FIFO_CREDIT_TYPE}'
              AND FLOOR(value * 100 + 0.5) > 0
        ),
        d AS (
            SELECT user_id, event_id,
                   CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS qty,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS rn
            FROM events
            WHERE event_type = '{FIFO_DEBIT_TYPE}'
              AND FLOOR(value * 100 + 0.5) > 0
        ),
        walk AS (
            SELECT u.user_id, 1 AS ci, 1 AS di,
                   CAST(0 AS BIGINT) AS cu, CAST(0 AS BIGINT) AS du,
                   CAST(NULL AS BIGINT) AS credit_event,
                   CAST(NULL AS BIGINT) AS debit_event,
                   CAST(0 AS BIGINT) AS qty
            FROM (SELECT DISTINCT user_id FROM c) u
            JOIN (SELECT DISTINCT user_id FROM d) v USING (user_id)
            UNION ALL
            SELECT w.user_id,
                   CASE WHEN cc.qty - w.cu
                             <= dd.qty - w.du THEN w.ci + 1
                        ELSE w.ci END,
                   CASE WHEN dd.qty - w.du
                             <= cc.qty - w.cu THEN w.di + 1
                        ELSE w.di END,
                   CASE WHEN cc.qty - w.cu <= dd.qty - w.du
                        THEN CAST(0 AS BIGINT)
                        ELSE w.cu + LEAST(cc.qty - w.cu, dd.qty - w.du)
                   END,
                   CASE WHEN dd.qty - w.du <= cc.qty - w.cu
                        THEN CAST(0 AS BIGINT)
                        ELSE w.du + LEAST(cc.qty - w.cu, dd.qty - w.du)
                   END,
                   cc.event_id, dd.event_id,
                   LEAST(cc.qty - w.cu, dd.qty - w.du)
            FROM walk w
            JOIN c cc ON cc.user_id = w.user_id AND cc.rn = w.ci
            JOIN d dd ON dd.user_id = w.user_id AND dd.rn = w.di
        )
        SELECT user_id, credit_event, debit_event, qty
        FROM walk WHERE qty > 0
    """
    # max_subarray: brute-force enumeration of EVERY interval via
    # prefix pairs (incl. the virtual seq-0 prefix), argmax under the
    # same (sum DESC, end ASC, start ASC) total order — the
    # optimality proof for the Kadane linearization.
    _ORACLE_SQL["max_subarray"] = f"""
        WITH r AS (
            SELECT user_id,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS BIGINT) AS seq,
                   CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                       - {MAXSUB_BASE_CENTS} AS net
            FROM events
        ),
        cum AS (
            SELECT user_id, seq,
                   CAST(SUM(net) OVER (
                       PARTITION BY user_id ORDER BY seq
                   ) AS BIGINT) AS cum
            FROM r
            UNION ALL
            SELECT DISTINCT user_id, CAST(0 AS BIGINT),
                   CAST(0 AS BIGINT)
            FROM r
        ),
        pairs AS (
            SELECT i.user_id, j.seq + 1 AS start_seq, i.seq AS end_seq,
                   i.cum - j.cum AS s
            FROM cum i
            JOIN cum j ON j.user_id = i.user_id AND j.seq < i.seq
            WHERE i.seq >= 1
        ),
        best AS (
            SELECT user_id, start_seq, end_seq, s,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id
                       ORDER BY s DESC, end_seq ASC, start_seq ASC
                   ) AS rk
            FROM pairs
        ),
        n AS (
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
            FROM r GROUP BY user_id
        )
        SELECT b.user_id, n.n_events, b.s AS best_sum,
               b.start_seq, b.end_seq
        FROM best b JOIN n ON n.user_id = b.user_id
        WHERE b.rk = 1
    """
    # autocorrelation: same lag() + exact-integer moment sums, the
    # division/sqrt assembled in the same operand order.
    lag_blocks = []
    for k in ACF_LAGS:
        lag_blocks.append(f"""
            SELECT user_id, CAST({k} AS BIGINT) AS lag_k,
                   ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                         / SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                                * CAST(n * syy - sy * sy AS DOUBLE)),
                         6) AS acf,
                   n AS n_pairs
            FROM (
                SELECT user_id,
                       CAST(COUNT(*) AS BIGINT) AS n,
                       CAST(SUM(x) AS BIGINT) AS sx,
                       CAST(SUM(y) AS BIGINT) AS sy,
                       CAST(SUM(x * x) AS BIGINT) AS sxx,
                       CAST(SUM(y * y) AS BIGINT) AS syy,
                       CAST(SUM(x * y) AS BIGINT) AS sxy
                FROM (
                    SELECT user_id,
                           CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS x,
                           LAG(CAST(FLOOR(value * 100 + 0.5) AS BIGINT),
                               {k}) OVER (
                               PARTITION BY user_id ORDER BY ts, event_id
                           ) AS y
                    FROM events
                )
                WHERE y IS NOT NULL
                GROUP BY user_id
            )""")
    union = "\n            UNION ALL\n".join(lag_blocks)
    _ORACLE_SQL["autocorrelation"] = union


_install_s15_batch2_oracles()


def _install_s15_batch3_oracles() -> None:
    # t_closeness: same cross-multiplied cumulative algebra; the
    # dense class x domain grid built by CROSS JOIN; every SUM cast
    # (HUGEINT lesson).
    _ORACLE_SQL["t_closeness"] = f"""
        WITH cells AS (
            SELECT c_mktsegment AS segment,
                   CAST(FLOOR(c_acctbal / {LDIV_B}) AS BIGINT) AS bal_b,
                   CAST(c_nationkey AS BIGINT) AS nation,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM customer GROUP BY 1, 2, 3
        ),
        dom AS (SELECT DISTINCT nation FROM cells),
        m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM dom),
        classes AS (SELECT DISTINCT segment, bal_b FROM cells),
        dense AS (
            SELECT cl.segment, cl.bal_b, d.nation,
                   COALESCE(ce.cnt, 0) AS cnt
            FROM classes cl CROSS JOIN dom d
            LEFT JOIN cells ce
              ON ce.segment = cl.segment AND ce.bal_b = cl.bal_b
             AND ce.nation = d.nation
        ),
        cum AS (
            SELECT segment, bal_b, nation,
                   CAST(SUM(cnt) OVER (
                       PARTITION BY segment, bal_b ORDER BY nation
                   ) AS BIGINT) AS cum_c,
                   CAST(SUM(cnt) OVER (
                       PARTITION BY segment, bal_b
                   ) AS BIGINT) AS n_g
            FROM dense
        ),
        gcum AS (
            SELECT nation,
                   CAST(SUM(cnt) OVER (ORDER BY nation) AS BIGINT)
                       AS cum_g,
                   CAST(SUM(cnt) OVER () AS BIGINT) AS n_tot
            FROM (
                SELECT nation, CAST(SUM(cnt) AS BIGINT) AS cnt
                FROM cells GROUP BY nation
            )
        ),
        agg AS (
            SELECT c.segment, c.bal_b,
                   MAX(c.n_g) AS n, MAX(g.n_tot) AS n_tot,
                   CAST(SUM(ABS(c.cum_c * g.n_tot - g.cum_g * c.n_g))
                        AS BIGINT) AS emd_num
            FROM cum c JOIN gcum g ON g.nation = c.nation
            GROUP BY c.segment, c.bal_b
        )
        SELECT segment, bal_b, n, emd_num,
               ROUND(CAST(emd_num AS DOUBLE)
                     / CAST(n * n_tot * (m.m - 1) AS DOUBLE), 9) AS emd,
               CAST(CASE WHEN emd_num * {TCLOSE_T_DEN}
                              <= n * n_tot * (m.m - 1) * {TCLOSE_T_NUM}
                         THEN 1 ELSE 0 END AS BIGINT) AS t_ok
        FROM agg, m
    """
    # mutual_match: LIST_DOT_PRODUCT is the same left-to-right fold
    # as _dot64 (embed_topk precedent); ROUND-5 before the argmax,
    # ties by vec_id, reversed-pair self-join.
    _ORACLE_SQL["mutual_match"] = """
        WITH scored AS (
            SELECT a.vec_id AS a, b.vec_id AS b,
                   ROUND(LIST_DOT_PRODUCT(CAST(a.embedding AS DOUBLE[]),
                                          CAST(b.embedding AS DOUBLE[])),
                         5) AS cos
            FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
        ),
        nn AS (
            SELECT a, b, cos
            FROM (
                SELECT a, b, cos,
                       ROW_NUMBER() OVER (
                           PARTITION BY a ORDER BY cos DESC, b ASC
                       ) AS rn
                FROM scored
            ) WHERE rn = 1
        )
        SELECT n1.a AS id_a, n1.b AS id_b, n1.cos AS cos_ab
        FROM nn n1 JOIN nn n2 ON n2.a = n1.b AND n2.b = n1.a
        WHERE n1.a < n1.b
    """
    # ohlc_bars: ROW_NUMBER picks stand in for struct-keyed
    # min_by/max_by (DuckDB arg_min takes no tuple key).
    _ORACLE_SQL["ohlc_bars"] = """
        WITH base AS (
            SELECT user_id, CAST(ts AS DATE) AS day, ts, event_id,
                   CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id, CAST(ts AS DATE)
                       ORDER BY ts, event_id
                   ) AS rf,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id, CAST(ts AS DATE)
                       ORDER BY ts DESC, event_id DESC
                   ) AS rl
            FROM events
        )
        SELECT user_id, day,
               CAST(MAX(CASE WHEN rf = 1 THEN cents END) AS BIGINT)
                   AS open_c,
               CAST(MAX(cents) AS BIGINT) AS high_c,
               CAST(MIN(cents) AS BIGINT) AS low_c,
               CAST(MAX(CASE WHEN rl = 1 THEN cents END) AS BIGINT)
                   AS close_c,
               CAST(COUNT(*) AS BIGINT) AS n_trades,
               CAST(SUM(cents) AS BIGINT) AS vol_cents
        FROM base GROUP BY user_id, day
    """


_install_s15_batch3_oracles()


def _install_s15_batch4_oracles() -> None:
    # feature_hashing: DuckDB hex-cast idiom for the md5 bucket (the
    # hll_distinct device); identical bucket/sign algebra.
    _ORACLE_SQL["feature_hashing"] = f"""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents
        ),
        hashed AS (
            SELECT doc_id,
                   CAST(('0x' || substring(md5(tok), 1, 8))::UBIGINT
                        AS BIGINT) % {FH_BUCKETS} AS bucket,
                   CASE WHEN CAST(('0x' || substring(md5(tok), 9, 1))
                                  ::UBIGINT AS BIGINT) % 2 = 0
                        THEN 1 ELSE -1 END AS sign
            FROM toks WHERE tok != ''
        )
        SELECT doc_id, bucket, CAST(SUM(sign) AS BIGINT) AS weight
        FROM hashed GROUP BY doc_id, bucket
        HAVING SUM(sign) != 0
    """
    # cdc_chunking: the SAME _cdc_hash_sql emitter; positions via
    # LATERAL range (empty for short docs), ends = boundaries UNION
    # sentinel, chunk spans via LAG, chunk_idx via ROW_NUMBER over
    # the ascending ends order.
    h = _cdc_hash_sql("d.text", "p.i")
    _ORACLE_SQL["cdc_chunking"] = f"""
        WITH pos AS (
            SELECT d.doc_id, p.i, {h} AS h
            FROM documents d,
                 LATERAL (SELECT UNNEST(range(8, d.n_chars + 1)) AS i) p
        ),
        ends AS (
            SELECT doc_id, CAST(i AS BIGINT) AS e
            FROM pos WHERE h % {CDC_MOD} = 0
            UNION
            SELECT doc_id, CAST(n_chars AS BIGINT) FROM documents
        ),
        ch AS (
            SELECT doc_id, e AS endp,
                   COALESCE(LAG(e) OVER (
                       PARTITION BY doc_id ORDER BY e
                   ), 0) + 1 AS start_pos,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY doc_id ORDER BY e
                   ) AS BIGINT) AS chunk_idx
            FROM ends
        )
        SELECT c.doc_id, c.chunk_idx,
               CAST(c.start_pos AS BIGINT) AS start_pos,
               CAST(c.endp - c.start_pos + 1 AS BIGINT) AS chunk_len,
               substring(md5(substr(d.text, CAST(c.start_pos AS INT),
                                    CAST(c.endp - c.start_pos + 1 AS INT))),
                         1, 16) AS chunk_md5
        FROM ch c JOIN documents d ON d.doc_id = c.doc_id
    """
    # graph_bfs: recursive frontier enumeration over the closed-form
    # link rules (independent of the regex extraction path), UNION
    # deduplicated, min per node.
    from ocular_spark.functions import html as H

    edge_union = "\n            UNION ".join(
        f"SELECT CAST(doc_id AS BIGINT) AS src,"
        f" CAST((doc_id * {a} + {c}) % {H.LINK_UNIVERSE} AS BIGINT) AS dst"
        f" FROM documents"
        for a, c in H.LINK_RULES
    )
    _ORACLE_SQL["graph_bfs"] = f"""
        WITH RECURSIVE edges AS (
            {edge_union}
        ),
        walk AS (
            SELECT CAST(doc_id AS BIGINT) AS node,
                   CAST(0 AS BIGINT) AS dist
            FROM documents WHERE doc_id < {BFS_SEEDS_BELOW}
            UNION
            SELECT e.dst, w.dist + 1
            FROM walk w JOIN edges e ON e.src = w.node
            WHERE w.dist < {BFS_MAX_HOPS}
        )
        SELECT node, CAST(MIN(dist) AS BIGINT) AS dist
        FROM walk GROUP BY node
    """


_install_s15_batch4_oracles()


def _install_s15_batch5_oracles() -> None:
    # term_burstiness: the same overlay (burst term in every 50th doc,
    # steady term once per doc) unioned at the tf level; Fano as exact
    # cross-multiplied BIGINT rational, verdict by integer comparison.
    _ORACLE_SQL["term_burstiness"] = f"""
        WITH tf AS (
            SELECT tok AS term, doc_id, COUNT(*)::BIGINT AS c
            FROM (SELECT doc_id,
                         unnest(string_split(text, ' ')) AS tok
                  FROM documents)
            WHERE tok != '' GROUP BY 1, 2
            UNION ALL
            SELECT 'burstword', doc_id, {BURST_TF}::BIGINT
            FROM documents WHERE doc_id % {BURST_DOC_MOD} = 0
            UNION ALL
            SELECT 'steadyword', doc_id, 1::BIGINT FROM documents
        ),
        agg AS (
            SELECT term, COUNT(*)::BIGINT AS doc_freq,
                   SUM(c)::BIGINT AS s1, SUM(c * c)::BIGINT AS s2
            FROM tf GROUP BY 1
            HAVING COUNT(*) >= {BURST_MIN_DF}
        ),
        n AS (SELECT COUNT(*)::BIGINT AS n_docs FROM documents)
        SELECT term, doc_freq, s1 AS total_tf,
               CAST(n_docs * s2 - s1 * s1 AS BIGINT) AS fano_num,
               CAST(n_docs * s1 AS BIGINT) AS fano_den,
               CAST(n_docs * s2 - s1 * s1 AS DOUBLE)
                   / CAST(n_docs * s1 AS DOUBLE) AS fano,
               CASE WHEN n_docs * s2 - s1 * s1 < n_docs * s1
                    THEN 'under'
                    WHEN n_docs * s2 - s1 * s1 <= 2 * n_docs * s1
                    THEN 'poisson'
                    ELSE 'bursty' END AS dispersion
        FROM agg, n
    """
    # zipf_fit: identical quantized-ln sufficient statistics; slope and
    # intercept assembled with the same op order.
    _ORACLE_SQL["zipf_fit"] = f"""
        WITH freq AS (
            SELECT tok AS term, COUNT(*)::BIGINT AS f
            FROM (SELECT unnest(string_split(text, ' ')) AS tok
                  FROM documents)
            WHERE tok != '' GROUP BY 1
        ),
        ranked AS (
            SELECT CAST(FLOOR(ln(CAST(rnk AS DOUBLE)) * 1e6) AS BIGINT)
                       AS x,
                   CAST(FLOOR(ln(CAST(f AS DOUBLE)) * 1e6) AS BIGINT) AS y
            FROM (SELECT f, ROW_NUMBER() OVER (ORDER BY f DESC, term)
                             AS rnk
                  FROM freq)
            WHERE rnk <= {ZIPF_TOP}
        ),
        s AS (
            SELECT COUNT(*)::BIGINT AS m, SUM(x)::BIGINT AS sx,
                   SUM(y)::BIGINT AS sy, SUM(x * y)::BIGINT AS sxy,
                   SUM(x * x)::BIGINT AS sxx
            FROM ranked
        )
        SELECT m AS n_terms,
               CAST(m * sxy - sx * sy AS BIGINT) AS slope_num,
               CAST(m * sxx - sx * sx AS BIGINT) AS slope_den,
               CAST(m * sxy - sx * sy AS DOUBLE)
                   / CAST(m * sxx - sx * sx AS DOUBLE) AS slope,
               (CAST(sy AS DOUBLE)
                - (CAST(m * sxy - sx * sy AS DOUBLE)
                   / CAST(m * sxx - sx * sx AS DOUBLE))
                  * CAST(sx AS DOUBLE))
                   / CAST(m AS DOUBLE) / 1000000.0 AS intercept_ln
        FROM s
    """
    # bh_fdr: the same CUM literal (one Python emitter), the same
    # integer step-up condition, rank/m/k* as window functions.
    cum_list = ", ".join(f"{v}::BIGINT" for v in _BH_CUM)
    _ORACLE_SQL["bh_fdr"] = f"""
        WITH first48 AS (
            SELECT user_id, event_type
            FROM (SELECT user_id, event_type,
                         ROW_NUMBER() OVER (
                             PARTITION BY user_id ORDER BY ts, event_id
                         ) AS rn
                  FROM events)
            WHERE rn <= {BH_N_TRIALS}
        ),
        hyp AS (
            SELECT user_id,
                   SUM(CASE WHEN event_type IN ('click', 'view')
                            THEN 1 ELSE 0 END)::BIGINT AS x
            FROM first48 GROUP BY 1
        ),
        scored AS (
            SELECT user_id, x,
                   ([{cum_list}])[CAST(x + 1 AS INT)] AS p_num
            FROM hyp
        ),
        ranked AS (
            SELECT user_id, x, p_num,
                   ROW_NUMBER() OVER (ORDER BY p_num, user_id)::BIGINT
                       AS rnk,
                   COUNT(*) OVER ()::BIGINT AS m
            FROM scored
        ),
        cut AS (
            SELECT *,
                   MAX(CASE WHEN {BH_ALPHA_DEN} * m * p_num
                                 <= rnk * {BH_TWO_N}::BIGINT
                                    * {BH_ALPHA_NUM}
                            THEN rnk END) OVER () AS kstar
            FROM ranked
        )
        SELECT user_id, x, p_num,
               CAST(p_num AS DOUBLE) / {float(BH_TWO_N)} AS p_value,
               rnk,
               CAST(CASE WHEN rnk <= COALESCE(kstar, 0)
                         THEN 1 ELSE 0 END AS BIGINT) AS rejected
        FROM cut
    """


_install_s15_batch5_oracles()


def _install_s16_batch1_oracles() -> None:
    # mann_kendall: same overlay series via generate_series, same
    # pair self-join, same all-BIGINT verdict line and shared-sqrt z.
    _ORACLE_SQL["mann_kendall"] = f"""
        WITH base AS (
            SELECT user_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS rn,
                   value AS v
            FROM events
            UNION ALL
            SELECT -1::BIGINT, gs, CAST(gs AS DOUBLE)
            FROM generate_series(1, {MK_OVERLAY_N}) t(gs)
            UNION ALL
            SELECT -2::BIGINT, gs, CAST({MK_OVERLAY_N} + 1 - gs AS DOUBLE)
            FROM generate_series(1, {MK_OVERLAY_N}) t(gs)
        ),
        s_agg AS (
            SELECT l.user_id,
                   SUM(CAST(SIGN(r.v - l.v) AS BIGINT))::BIGINT AS s
            FROM base l JOIN base r
              ON l.user_id = r.user_id AND l.rn < r.rn
            GROUP BY 1
        ),
        per_user AS (
            SELECT user_id, COUNT(*)::BIGINT AS n FROM base GROUP BY 1
        ),
        ties AS (
            SELECT user_id,
                   SUM(t * (t - 1) * (2 * t + 5))::BIGINT AS t18
            FROM (SELECT user_id, v, COUNT(*)::BIGINT AS t
                  FROM base GROUP BY 1, 2)
            GROUP BY 1
        ),
        j AS (
            SELECT p.user_id, p.n, s.s,
                   CAST(p.n * (p.n - 1) * (2 * p.n + 5) - t.t18
                        AS BIGINT) AS var18
            FROM per_user p
            JOIN ties t USING (user_id)
            JOIN s_agg s USING (user_id)
            WHERE p.n >= {MK_MIN_N}
        )
        SELECT user_id, n, s, var18,
               CASE WHEN var18 = 0 THEN 0.0
                    WHEN s > 0 THEN CAST(s - 1 AS DOUBLE)
                                    / SQRT(var18 / 18.0)
                    WHEN s < 0 THEN CAST(s + 1 AS DOUBLE)
                                    / SQRT(var18 / 18.0)
                    ELSE 0.0 END AS z,
               CASE WHEN s != 0
                         AND {TREND_Z2_DEN} * 18
                             * GREATEST(ABS(s) - 1, 0)
                             * GREATEST(ABS(s) - 1, 0)
                             >= {TREND_Z2_NUM} * var18
                    THEN CASE WHEN s > 0 THEN 'increasing'
                              ELSE 'decreasing' END
                    ELSE 'no_trend' END AS trend
        FROM j
    """
    # mann_whitney: same 2*avg-rank trick, same folded tie sum
    # (ceq^2 - 1), same verdict line 1875*N(N-1)*(2U-n1n2)^2 >= 2401*vnum.
    _ORACLE_SQL["mann_whitney"] = f"""
        WITH base AS (
            SELECT user_id,
                   CASE WHEN event_type = '{MW_GRP_TYPE}'
                        THEN 1 ELSE 0 END::BIGINT AS grp,
                   value AS v
            FROM events
            UNION ALL
            SELECT -1::BIGINT, 1::BIGINT, CAST(gs + 100 AS DOUBLE)
            FROM generate_series(1, 10) t(gs)
            UNION ALL
            SELECT -1::BIGINT, 0::BIGINT, CAST(gs AS DOUBLE)
            FROM generate_series(1, 10) t(gs)
            UNION ALL
            SELECT -2::BIGINT, 1::BIGINT, CAST(gs AS DOUBLE)
            FROM generate_series(1, 10) t(gs)
            UNION ALL
            SELECT -2::BIGINT, 0::BIGINT, CAST(gs AS DOUBLE)
            FROM generate_series(1, 10) t(gs)
        ),
        ranked AS (
            SELECT user_id, grp,
                   2 * RANK() OVER (PARTITION BY user_id ORDER BY v)
                       + COUNT(*) OVER (PARTITION BY user_id, v)
                       - 1 AS rank2,
                   COUNT(*) OVER (PARTITION BY user_id, v)::BIGINT
                       AS ceq
            FROM base
        ),
        agg AS (
            SELECT user_id,
                   SUM(grp)::BIGINT AS n1,
                   SUM(1 - grp)::BIGINT AS n2,
                   SUM(grp * rank2)::BIGINT AS r1_2,
                   SUM(ceq * ceq - 1)::BIGINT AS tsum
            FROM ranked GROUP BY 1
        ),
        stats AS (
            SELECT user_id, n1, n2,
                   CAST(r1_2 - n1 * (n1 + 1) AS BIGINT) AS u2,
                   CAST(n1 * n2 AS BIGINT) AS e2,
                   CAST(n1 * n2 * ((n1 + n2) * (n1 + n2 - 1)
                                   * (n1 + n2 + 1) - tsum)
                        AS BIGINT) AS vnum
            FROM agg
            WHERE n1 >= {MW_MIN_N} AND n2 >= {MW_MIN_N}
        )
        SELECT user_id, n1, n2, u2, e2, vnum,
               CASE WHEN vnum = 0 THEN 0.0
                    ELSE CAST(u2 - e2 AS DOUBLE)
                         / (2.0 * SQRT(vnum
                               / (12.0 * CAST(n1 + n2 AS DOUBLE)
                                  * CAST(n1 + n2 - 1 AS DOUBLE))))
               END AS z,
               CASE WHEN vnum > 0
                         AND {TREND_Z2_DEN} * 3 * (n1 + n2)
                             * (n1 + n2 - 1) * (u2 - e2) * (u2 - e2)
                             >= {TREND_Z2_NUM} * vnum
                    THEN 'shift' ELSE 'null' END AS verdict
        FROM stats
    """
    # avg_precision: same deterministic score/labels, same quantized
    # precision@k via pure integer floor-division, ONE final division.
    _ORACLE_SQL["avg_precision"] = f"""
        WITH labeled AS (
            SELECT source, doc_id,
                   len(list_filter(string_split(text, ' '),
                                   t -> t = '{AP_SCORE_TOK}'))::BIGINT
                       AS score,
                   CASE WHEN list_contains(string_split(text, ' '),
                                           '{AP_REL_TOK}')
                             OR doc_id % {AP_REL_MOD} = {AP_REL_RES}
                        THEN 1 ELSE 0 END::BIGINT AS rel
            FROM documents
        ),
        ranked AS (
            SELECT source, rel,
                   ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY score DESC, doc_id ASC
                   )::BIGINT AS rn,
                   SUM(rel) OVER (
                       PARTITION BY source
                       ORDER BY score DESC, doc_id ASC
                       ROWS UNBOUNDED PRECEDING
                   )::BIGINT AS ck
            FROM labeled
        ),
        agg AS (
            SELECT source, COUNT(*)::BIGINT AS n_docs,
                   SUM(rel)::BIGINT AS n_rel,
                   SUM(CASE WHEN rel = 1
                            THEN (ck * {AP_SCALE}) // rn
                            ELSE 0 END)::BIGINT AS ap_num
            FROM ranked GROUP BY 1
            HAVING SUM(rel) >= 1
        )
        SELECT source, n_docs, n_rel, ap_num,
               CAST(ap_num AS DOUBLE)
                   / CAST(n_rel * {AP_SCALE} AS DOUBLE) AS ap
        FROM agg
    """


_install_s16_batch1_oracles()


def _install_s16_batch2_oracles() -> None:
    from ocular_spark.functions import html as _H

    # adamic_adar: same page synthesis + href extraction + clique
    # injection as the triangle oracle, same quantized 1/ln(deg)
    # weights, anti-join expressed as NOT EXISTS.
    pages = (
        "pages AS (SELECT doc_id, "
        + _H.wrap_links_duckdb("text", "doc_id")
        + " AS html FROM documents)"
    )
    _ORACLE_SQL["adamic_adar"] = (
        "WITH " + pages + ", "
        "ex AS (SELECT doc_id AS src, unnest("
        + _H.doc_links_expr("html")
        + ") AS d FROM pages), "
        "crawl AS (SELECT src, CAST(d AS BIGINT) AS dst FROM ex), "
        "clique AS (SELECT doc_id AS src, (doc_id // 5) * 5 + j AS dst "
        "FROM documents CROSS JOIN generate_series(0, 4) t(j)), "
        "allv AS (SELECT * FROM crawl UNION ALL SELECT * FROM clique), "
        "und AS (SELECT DISTINCT LEAST(src, dst) AS u, "
        "GREATEST(src, dst) AS v FROM allv WHERE src != dst), "
        "adj AS (SELECT u AS w, v AS n FROM und "
        "UNION ALL SELECT v, u FROM und), "
        "deg AS (SELECT w, COUNT(*)::BIGINT AS deg FROM adj GROUP BY 1), "
        "wt AS (SELECT a.w, a.n, CAST(FLOOR("
        f"{float(AA_SCALE)} / ln(CAST(deg AS DOUBLE))) AS BIGINT) "
        "AS invln_q FROM adj a JOIN deg USING (w)), "
        "wedges AS (SELECT l.n AS u, r.n AS v, l.invln_q "
        "FROM wt l JOIN wt r ON l.w = r.w AND l.n < r.n), "
        "pairs AS (SELECT u, v, COUNT(*)::BIGINT AS cn, "
        "SUM(invln_q)::BIGINT AS aa_num FROM wedges GROUP BY 1, 2 "
        f"HAVING COUNT(*) >= {AA_MIN_CN}) "
        "SELECT p.u, p.v, p.cn, p.aa_num, "
        f"CAST(p.aa_num AS DOUBLE) / {float(AA_SCALE)} AS aa "
        "FROM pairs p WHERE NOT EXISTS "
        "(SELECT 1 FROM und e WHERE e.u = p.u AND e.v = p.v)"
    )
    # dbscan_cluster: brute-force O(N^2) eps-neighbor pairs (grid
    # pruning is the thing under test), CC by recursive-CTE label
    # reachability with UNION dedup, min label per node.
    blobs = " UNION ALL ".join(
        f"SELECT -({b} * 20 + k + 1)::BIGINT AS pid, "
        f"({bx} + (k % 5) * 25)::BIGINT AS x, "
        f"({by} + (k // 5) * 25)::BIGINT AS y "
        "FROM generate_series(0, 19) t(k)"
        for b, (bx, by) in enumerate(_DBSCAN_BLOBS)
    )
    sats = " UNION ALL ".join(
        f"SELECT (-1001 - {b})::BIGINT, ({bx} + 240)::BIGINT, "
        f"({by} + 75)::BIGINT"
        for b, (bx, by) in enumerate(_DBSCAN_BLOBS)
    )
    eps2 = DBSCAN_EPS * DBSCAN_EPS
    _ORACLE_SQL["dbscan_cluster"] = f"""
        WITH RECURSIVE pts AS (
            SELECT event_id AS pid,
                   CAST({SPATIAL_X_SQL} AS BIGINT) AS x,
                   CAST({SPATIAL_Y_SQL} AS BIGINT) AS y
            FROM events
            UNION ALL {blobs}
            UNION ALL {sats}
        ),
        nbrs AS (
            SELECT a.pid AS a, b.pid AS b
            FROM pts a JOIN pts b
              ON a.pid != b.pid
             AND (a.x - b.x) * (a.x - b.x)
                 + (a.y - b.y) * (a.y - b.y) <= {eps2}
        ),
        ncount AS (
            SELECT p.pid,
                   1 + COALESCE(
                       (SELECT COUNT(*) FROM nbrs n WHERE n.a = p.pid),
                       0)::BIGINT AS n_eps
            FROM pts p
        ),
        core AS (SELECT pid FROM ncount WHERE n_eps >= {DBSCAN_MIN_PTS}),
        core_edges AS (
            SELECT n.a, n.b FROM nbrs n
            JOIN core ca ON ca.pid = n.a
            JOIN core cb ON cb.pid = n.b
        ),
        reach(node, lbl) AS (
            SELECT pid, pid FROM core
            UNION
            SELECT e.b, r.lbl FROM reach r JOIN core_edges e
              ON e.a = r.node
        ),
        core_lbl AS (
            SELECT node AS pid, MIN(lbl)::BIGINT AS cluster
            FROM reach GROUP BY 1
        ),
        border_lbl AS (
            SELECT n.a AS pid, MIN(c.cluster)::BIGINT AS cluster
            FROM nbrs n JOIN core_lbl c ON c.pid = n.b
            WHERE n.a NOT IN (SELECT pid FROM core)
            GROUP BY 1
        )
        SELECT p.pid, p.x, p.y, nc.n_eps,
               CASE WHEN cl.pid IS NOT NULL THEN 'core'
                    WHEN bl.pid IS NOT NULL THEN 'border'
                    ELSE 'noise' END AS role,
               COALESCE(cl.cluster, bl.cluster, -999999) AS cluster
        FROM pts p
        JOIN ncount nc ON nc.pid = p.pid
        LEFT JOIN core_lbl cl ON cl.pid = p.pid
        LEFT JOIN border_lbl bl ON bl.pid = p.pid
    """
    # motif_discovery: scalar (i, j, offset) grid with two positional
    # joins -- a genuinely different formulation than array zip_with.
    cents = ", ".join(
        str(_motif_overlay_cents(i)) for i in range(1, MOTIF_OVL_N + 1)
    )
    _ORACLE_SQL["motif_discovery"] = f"""
        WITH s AS (
            SELECT user_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS rn,
                   CAST(ROUND(value * 100) AS BIGINT) AS c
            FROM events
            UNION ALL
            SELECT -1::BIGINT, gs, ([{cents}])[gs]::BIGINT
            FROM generate_series(1, {MOTIF_OVL_N}) t(gs)
        ),
        maxn AS (SELECT user_id, MAX(rn) AS n FROM s GROUP BY 1),
        wins AS (
            SELECT s.user_id, s.rn AS i
            FROM s JOIN maxn USING (user_id)
            WHERE s.rn <= n - {MOTIF_M} + 1
        ),
        pairs AS (
            SELECT a.user_id, a.i AS i, b.i AS j
            FROM wins a JOIN wins b
              ON a.user_id = b.user_id AND b.i >= a.i + {MOTIF_M}
        ),
        sad AS (
            SELECT p.user_id, p.i, p.j,
                   SUM(ABS(x.c - y.c))::BIGINT AS sad
            FROM pairs p
            CROSS JOIN generate_series(0, {MOTIF_M} - 1) t(o)
            JOIN s x ON x.user_id = p.user_id AND x.rn = p.i + o
            JOIN s y ON y.user_id = p.user_id AND y.rn = p.j + o
            GROUP BY 1, 2, 3
        ),
        cnt AS (
            SELECT user_id, COUNT(*)::BIGINT AS n_pairs
            FROM pairs GROUP BY 1
        ),
        best AS (
            SELECT user_id, sad, i, j,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY sad, i, j
                   ) AS rk
            FROM sad
        )
        SELECT b.user_id, b.sad, CAST(b.i AS BIGINT) AS i,
               CAST(b.j AS BIGINT) AS j, c.n_pairs
        FROM best b JOIN cnt c USING (user_id)
        WHERE rk = 1
    """


_install_s16_batch2_oracles()


def _install_s16_batch3_oracles() -> None:
    # phonetic_blocking: the SAME _soundex_sql emitter output (one
    # Python source, two engines), DuckDB's built-in levenshtein.
    names = ", ".join(f"'{n}'" for n in PB_NAMES)
    nn = len(PB_NAMES)
    _ORACLE_SQL["phonetic_blocking"] = f"""
        WITH rec AS (
            SELECT c_custkey AS ck,
                   ([{names}])[CAST((c_custkey * 7) % {nn} + 1 AS INT)]
                       AS fn,
                   ([{names}])[CAST((c_custkey * 13 + 3) % {nn} + 1
                                    AS INT)] AS ln
            FROM customer
        ),
        coded AS (
            SELECT ck, fn, ln,
                   {_soundex_sql("fn")} AS sdx_f,
                   {_soundex_sql("ln")} AS sdx_l
            FROM rec
        )
        SELECT l.ck AS a, r.ck AS b, l.sdx_f, l.sdx_l,
               CAST(levenshtein(l.fn || ' ' || l.ln,
                                r.fn || ' ' || r.ln) AS BIGINT) AS lev
        FROM coded l JOIN coded r
          ON l.sdx_f = r.sdx_f AND l.sdx_l = r.sdx_l AND l.ck < r.ck
        WHERE levenshtein(l.fn || ' ' || l.ln,
                          r.fn || ' ' || r.ln) BETWEEN 1 AND {PB_MAX_LEV}
    """
    # rake_keywords: same gaps-and-islands grouping (1-based pos only
    # shifts the island CONSTANT, group contents identical), same
    # integer-division word scores, argmax by (score DESC, phrase).
    stops = ", ".join(f"'{s}'" for s in RAKE_STOPWORDS)
    _ORACLE_SQL["rake_keywords"] = f"""
        WITH toks0 AS (
            SELECT doc_id, string_split(text, ' ') AS ts FROM documents
        ),
        tpos AS (
            SELECT doc_id, ts,
                   unnest(generate_series(1, len(ts))) AS pos
            FROM toks0
        ),
        tok AS (
            SELECT doc_id, pos, ts[pos] AS tok FROM tpos
            WHERE ts[pos] != '' AND ts[pos] NOT IN ({stops})
        ),
        isl AS (
            SELECT doc_id, pos, tok,
                   pos - ROW_NUMBER() OVER (
                       PARTITION BY doc_id ORDER BY pos
                   ) AS island
            FROM tok
        ),
        s1 AS (
            SELECT doc_id, island, pos, tok,
                   COUNT(*) OVER (
                       PARTITION BY doc_id, island)::BIGINT AS phr_len
            FROM isl
        ),
        s2 AS (
            SELECT *,
                   COUNT(*) OVER (
                       PARTITION BY doc_id, tok)::BIGINT AS freq,
                   SUM(phr_len) OVER (
                       PARTITION BY doc_id, tok)::BIGINT AS deg
            FROM s1
        ),
        s3 AS (
            SELECT *, (deg * {RAKE_SCALE}) // freq AS ws_q FROM s2
        ),
        phr AS (
            SELECT doc_id, island,
                   string_agg(tok, ' ' ORDER BY pos) AS phrase,
                   SUM(ws_q)::BIGINT AS score_q
            FROM s3 GROUP BY 1, 2
        ),
        best AS (
            SELECT doc_id, phrase, score_q,
                   ROW_NUMBER() OVER (
                       PARTITION BY doc_id
                       ORDER BY score_q DESC, phrase ASC
                   ) AS rk,
                   COUNT(*) OVER (PARTITION BY doc_id)::BIGINT
                       AS n_phrases
            FROM phr
        )
        SELECT doc_id, phrase, score_q,
               CAST(score_q AS DOUBLE) / {float(RAKE_SCALE)} AS score,
               n_phrases
        FROM best WHERE rk = 1
    """
    # cdx_surt_index: same URL synthesis and SURT string algebra.
    _ORACLE_SQL["cdx_surt_index"] = """
        WITH raw AS (
            SELECT doc_id, text,
                   CASE WHEN doc_id % 2 = 0 THEN 'http'
                        ELSE 'https' END AS scheme,
                   CASE WHEN doc_id % 4 = 0 THEN 'example.org'
                        WHEN doc_id % 4 = 1 THEN 'WWW.example.org'
                        WHEN doc_id % 4 = 2 THEN 'sub.example.org'
                        ELSE 'archive.net' END AS host,
                   CASE WHEN doc_id % 7 = 2 THEN ':8080'
                        ELSE '' END AS port,
                   '/p/' || CAST(doc_id AS VARCHAR) AS path,
                   CASE WHEN doc_id % 5 = 0 THEN 'b=2&a=1'
                        WHEN doc_id % 5 = 1 THEN 'a=1'
                        ELSE '' END AS query
            FROM documents
        ),
        built AS (
            SELECT doc_id,
                   scheme || '://' || host || port || path
                   || CASE WHEN query != '' THEN '?' || query
                           ELSE '' END AS url,
                   array_to_string(
                       list_reverse(string_split(
                           regexp_replace(lower(host), '^www\\.', ''),
                           '.')),
                       ',')
                   || port || ')' || path
                   || CASE WHEN query != ''
                           THEN '?' || array_to_string(
                               list_sort(string_split(query, '&')), '&')
                           ELSE '' END AS surt,
                   md5(text) AS digest
            FROM raw
        )
        SELECT doc_id, url, surt, digest,
               ROW_NUMBER() OVER (ORDER BY surt, doc_id)::BIGINT AS idx
        FROM built
    """


_install_s16_batch3_oracles()


def _install_s16_batch4_oracles() -> None:
    from ocular_spark.functions import html as _H

    # theil_sen: same pair slopes, same positional median over the
    # (slope, i, j) total order, same two-row even-case averaging.
    outl = ", ".join(str(p) for p in TS_OVL_OUTLIERS)
    _ORACLE_SQL["theil_sen"] = f"""
        WITH base AS (
            SELECT user_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS rn,
                   value AS v
            FROM events
            UNION ALL
            SELECT -1::BIGINT, gs,
                   CASE WHEN gs IN ({outl}) THEN 1000000.0
                        ELSE CAST(gs * {TS_OVL_SLOPE} + 7 AS DOUBLE)
                   END
            FROM generate_series(1, {TS_OVL_N}) t(gs)
        ),
        slopes AS (
            SELECT l.user_id, l.rn AS i, r.rn AS j,
                   (r.v - l.v) / CAST(r.rn - l.rn AS DOUBLE) AS slope
            FROM base l JOIN base r
              ON l.user_id = r.user_id AND l.rn < r.rn
        ),
        ranked AS (
            SELECT user_id, slope,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY slope, i, j
                   )::BIGINT AS rs,
                   COUNT(*) OVER (PARTITION BY user_id)::BIGINT AS np
            FROM slopes
        )
        SELECT user_id, MAX(np) AS n_pairs,
               SUM(slope) / CAST(COUNT(*) AS DOUBLE) AS slope_med
        FROM ranked
        WHERE rs = (np + 1) // 2 OR rs = (np + 2) // 2
        GROUP BY 1
    """
    # isotonic_fit: same minimax identity on the same quantized
    # segment averages (integer floor-division), windows mirrored.
    _ORACLE_SQL["isotonic_fit"] = f"""
        WITH labeled AS (
            SELECT source, doc_id,
                   len(list_filter(string_split(text, ' '),
                                   t -> t = '{AP_SCORE_TOK}'))::BIGINT
                       AS score,
                   CASE WHEN list_contains(string_split(text, ' '),
                                           '{AP_REL_TOK}')
                             OR doc_id % {AP_REL_MOD} = {AP_REL_RES}
                        THEN 1 ELSE 0 END::BIGINT AS y
            FROM documents
        ),
        pos AS (
            SELECT source, doc_id, score, y,
                   ROW_NUMBER() OVER (
                       PARTITION BY source ORDER BY score, doc_id
                   )::BIGINT AS rn,
                   SUM(y) OVER (
                       PARTITION BY source ORDER BY score, doc_id
                       ROWS UNBOUNDED PRECEDING
                   )::BIGINT AS s
            FROM labeled
        ),
        pos2 AS (SELECT *, s - y AS sprev FROM pos),
        segs AS (
            SELECT j.source, j.rn AS j, k.rn AS i,
                   ((k.s - j.sprev) * {ISO_SCALE}) // (k.rn - j.rn + 1)
                       AS q
            FROM pos2 j JOIN pos2 k
              ON j.source = k.source AND k.rn >= j.rn
        ),
        mji AS (
            SELECT source, j, i,
                   MIN(q) OVER (
                       PARTITION BY source, j ORDER BY i DESC
                       ROWS UNBOUNDED PRECEDING
                   ) AS m
            FROM segs
        ),
        fit AS (
            SELECT source, i, MAX(m)::BIGINT AS fit_q
            FROM mji GROUP BY 1, 2
        )
        SELECT p.source, p.doc_id, p.rn, p.score, p.y, f.fit_q,
               CAST(f.fit_q AS DOUBLE) / {float(ISO_SCALE)} AS fit
        FROM pos2 p JOIN fit f
          ON f.source = p.source AND f.i = p.rn
    """
    # hits_scores: same directed crawl edges, each half-iteration a
    # join + groupBy, all-BIGINT path counts.
    pages = (
        "pages AS (SELECT doc_id, "
        + _H.wrap_links_duckdb("text", "doc_id")
        + " AS html FROM documents)"
    )
    _ORACLE_SQL["hits_scores"] = (
        "WITH " + pages + ", "
        "ex AS (SELECT doc_id AS src, unnest("
        + _H.doc_links_expr("html")
        + ") AS d FROM pages), "
        "edges AS (SELECT DISTINCT src, CAST(d AS BIGINT) AS dst FROM ex), "
        "nodes AS (SELECT DISTINCT src AS node FROM edges "
        "UNION SELECT DISTINCT dst FROM edges), "
        "a1 AS (SELECT dst AS node, COUNT(*)::BIGINT AS a1 "
        "FROM edges GROUP BY 1), "
        "h1 AS (SELECT e.src AS node, SUM(a.a1)::BIGINT AS h1 "
        "FROM edges e JOIN a1 a ON a.node = e.dst GROUP BY 1), "
        "a2 AS (SELECT e.dst AS node, SUM(h.h1)::BIGINT AS a2 "
        "FROM edges e JOIN h1 h ON h.node = e.src GROUP BY 1), "
        "h2 AS (SELECT e.src AS node, SUM(a.a2)::BIGINT AS h2 "
        "FROM edges e JOIN a2 a ON a.node = e.dst GROUP BY 1) "
        "SELECT n.node, COALESCE(a1.a1, 0) AS a1, "
        "COALESCE(h1.h1, 0) AS h1, COALESCE(a2.a2, 0) AS a2, "
        "COALESCE(h2.h2, 0) AS h2 "
        "FROM nodes n "
        "LEFT JOIN a1 ON a1.node = n.node "
        "LEFT JOIN h1 ON h1.node = n.node "
        "LEFT JOIN a2 ON a2.node = n.node "
        "LEFT JOIN h2 ON h2.node = n.node"
    )


_install_s16_batch4_oracles()


def _install_s16_batch5_oracles() -> None:
    from ocular_spark.functions import html as _H

    pages = (
        "pages AS (SELECT doc_id, "
        + _H.wrap_links_duckdb("text", "doc_id")
        + " AS html FROM documents)"
    )
    ex = (
        "ex AS (SELECT doc_id AS src, unnest("
        + _H.doc_links_expr("html")
        + ") AS d FROM pages), "
        "edges AS (SELECT DISTINCT src, CAST(d AS BIGINT) AS dst FROM ex)"
    )
    # dijkstra_paths: recursive-CTE WALK enumeration dedup'd by
    # (node, dist) under a cap >> any real shortest path, MIN per node
    # -- an independent formulation vs Spark's fixed-point relaxation.
    _ORACLE_SQL["dijkstra_paths"] = (
        "WITH RECURSIVE " + pages + ", " + ex + ", "
        "wedges AS (SELECT src, dst, "
        "1 + (src * 7 + dst * 13) % 10 AS w FROM edges), "
        "walk(node, dist) AS ("
        f"SELECT doc_id, 0::BIGINT FROM documents "
        f"WHERE doc_id < {BFS_SEEDS_BELOW} "
        "UNION "
        "SELECT e.dst, r.dist + e.w FROM walk r "
        "JOIN wedges e ON e.src = r.node "
        f"WHERE r.dist + e.w <= {DIJK_CAP}) "
        "SELECT node, CAST(MIN(dist) AS BIGINT) AS dist "
        "FROM walk GROUP BY node"
    )
    # path_count_census: UNION ALL walk enumeration (row multiplicity
    # IS the count), then COUNT at minimal depth per (seed, node) --
    # minimal-length walks are simple, so this equals sigma exactly.
    _ORACLE_SQL["path_count_census"] = (
        "WITH RECURSIVE " + pages + ", " + ex + ", "
        "walks(seed, node, d) AS ("
        f"SELECT doc_id, doc_id, 0 FROM documents "
        f"WHERE doc_id < {CENSUS_SEEDS_BELOW} "
        "UNION ALL "
        "SELECT w.seed, e.dst, w.d + 1 FROM walks w "
        f"JOIN edges e ON e.src = w.node WHERE w.d < {CENSUS_MAX_HOPS}), "
        "mind AS (SELECT seed, node, MIN(d) AS dist "
        "FROM walks GROUP BY 1, 2) "
        "SELECT m.seed, m.node, CAST(m.dist AS BIGINT) AS dist, "
        "COUNT(*)::BIGINT AS sigma "
        "FROM mind m JOIN walks w "
        "ON w.seed = m.seed AND w.node = m.node AND w.d = m.dist "
        "GROUP BY 1, 2, 3"
    )
    # backtest_smape: same hour-anchored dense grid, lag-24 forecast,
    # quantized terms, overlay series from the same hour grid.
    _ORACLE_SQL["backtest_smape"] = f"""
        WITH anchor AS (
            SELECT date_trunc('hour', MIN(ts)) AS a FROM events
        ),
        counts AS (
            SELECT event_type AS etype,
                   DATE_DIFF('microseconds', a, ts) // 3600000000 AS h,
                   COUNT(*)::BIGINT AS c
            FROM events, anchor GROUP BY 1, 2
        ),
        hm AS (SELECT MAX(h) AS hmax FROM counts),
        hours AS (
            SELECT unnest(generate_series(0, hmax)) AS h, hmax
            FROM hm
        ),
        grid AS (
            SELECT t.etype, hh.h, hh.hmax
            FROM (SELECT DISTINCT etype FROM counts) t
            CROSS JOIN hours hh
        ),
        dense AS (
            SELECT g.etype, g.h, g.hmax, COALESCE(c.c, 0) AS c
            FROM grid g LEFT JOIN counts c
              ON c.etype = g.etype AND c.h = g.h
            UNION ALL
            SELECT 'periodic', h, hmax, (10 + h % 24)::BIGINT
            FROM hours
            UNION ALL
            SELECT 'drift', h, hmax,
                   (10 + h % 24 + h // 24)::BIGINT
            FROM hours
        ),
        lagged AS (
            SELECT etype, h, hmax, c,
                   LAG(c, 24) OVER (
                       PARTITION BY etype ORDER BY h
                   ) AS f
            FROM dense
        ),
        hold AS (
            SELECT * FROM lagged
            WHERE h > hmax - {BT_K} AND f IS NOT NULL
        )
        SELECT etype, COUNT(*)::BIGINT AS n_h,
               SUM(CASE WHEN f + c > 0
                        THEN (2 * ABS(f - c) * {BT_SCALE}) // (f + c)
                        ELSE 0 END)::BIGINT AS smape_q,
               CAST(SUM(CASE WHEN f + c > 0
                             THEN (2 * ABS(f - c) * {BT_SCALE}) // (f + c)
                             ELSE 0 END) AS DOUBLE)
                   / CAST(COUNT(*) * {BT_SCALE} AS DOUBLE) AS smape
        FROM hold GROUP BY 1
    """


_install_s16_batch5_oracles()


def _install_s16_batch6_oracles() -> None:
    # NOTE (negative-numerator audit): DuckDB's integer `//` and
    # Spark's DIV both truncate toward zero (-7//2 == -3 in BOTH),
    # so the quantizations below are engine-exact even where the
    # numerator can go negative (cuped z, theta).
    n1o, x1o, n0o, x0o = PZ_OVL
    # prop_ztest: same conversion threshold, same all-BIGINT verdict
    # line, same planted arm pair.
    _ORACLE_SQL["prop_ztest"] = f"""
        WITH per_user AS (
            SELECT event_type AS etype,
                   (user_id % 2 = 1)::BIGINT AS t,
                   (COUNT(*) >= {CONV_K})::BIGINT AS conv
            FROM events GROUP BY event_type, user_id
        ),
        agg AS (
            SELECT etype,
                   SUM(t)::BIGINT AS n1,
                   SUM(t * conv)::BIGINT AS x1,
                   SUM(1 - t)::BIGINT AS n0,
                   SUM((1 - t) * conv)::BIGINT AS x0
            FROM per_user GROUP BY 1
            UNION ALL
            SELECT 'planted', {n1o}::BIGINT, {x1o}::BIGINT,
                   {n0o}::BIGINT, {x0o}::BIGINT
        )
        SELECT etype, n1, x1, n0, x0,
               CASE WHEN x1 + x0 > 0 AND x1 + x0 < n1 + n0
                         AND n1 > 0 AND n0 > 0
                    THEN CAST(x1 * n0 - x0 * n1 AS DOUBLE)
                         / SQRT(CAST(n1 * n0 AS DOUBLE)
                                * CAST((x1 + x0)
                                       * (n1 + n0 - x1 - x0) AS DOUBLE)
                                / CAST(n1 + n0 AS DOUBLE))
                    ELSE 0.0 END AS z,
               CASE WHEN x1 + x0 > 0 AND x1 + x0 < n1 + n0
                         AND n1 > 0 AND n0 > 0
                         AND {TREND_Z2_DEN} * (x1 * n0 - x0 * n1)
                             * (x1 * n0 - x0 * n1) * (n1 + n0)
                             >= {TREND_Z2_NUM} * n1 * n0 * (x1 + x0)
                                * (n1 + n0 - x1 - x0)
                    THEN 'shift' ELSE 'null' END AS verdict
        FROM agg
    """
    # diff_in_diff: same anchored hour split, same micro-cent mean
    # quantization, same planted-metric construction.
    _ORACLE_SQL["diff_in_diff"] = f"""
        WITH anchor AS (
            SELECT date_trunc('hour', MIN(ts)) AS a FROM events
        ),
        base AS (
            SELECT (user_id % 2 = 1)::BIGINT AS t,
                   (DATE_DIFF('microseconds', a, ts) // 3600000000
                    >= {DID_SPLIT_H})::BIGINT AS post,
                   CAST(ROUND(value * 100) AS BIGINT) AS c
            FROM events, anchor
        ),
        metrics AS (
            SELECT 'value' AS metric, t, post, c FROM base
            UNION ALL
            SELECT 'planted', t, post,
                   c + t * post * {DID_PLANT_C} FROM base
        ),
        cells AS (
            SELECT metric, t, post, COUNT(*)::BIGINT AS n,
                   SUM(c)::BIGINT AS s
            FROM metrics GROUP BY 1, 2, 3
        ),
        wide AS (
            SELECT metric,
                   SUM(CASE WHEN t = 1 AND post = 1
                            THEN (s * {DID_SCALE}) // n END)::BIGINT
                       AS mt_post,
                   SUM(CASE WHEN t = 1 AND post = 0
                            THEN (s * {DID_SCALE}) // n END)::BIGINT
                       AS mt_pre,
                   SUM(CASE WHEN t = 0 AND post = 1
                            THEN (s * {DID_SCALE}) // n END)::BIGINT
                       AS mc_post,
                   SUM(CASE WHEN t = 0 AND post = 0
                            THEN (s * {DID_SCALE}) // n END)::BIGINT
                       AS mc_pre,
                   SUM(n)::BIGINT AS n_events
            FROM cells GROUP BY 1
        )
        SELECT metric, n_events, mt_pre, mt_post, mc_pre, mc_post,
               CAST((mt_post - mt_pre) - (mc_post - mc_pre)
                    AS BIGINT) AS did_q,
               CAST((mt_post - mt_pre) - (mc_post - mc_pre) AS DOUBLE)
                   / {float(DID_SCALE * 100)} AS did_dollars
        FROM wide
    """
    # cuped_adjust: same integer moments, same one-shot theta and
    # per-user z quantization, same pooled variance report.
    _ORACLE_SQL["cuped_adjust"] = f"""
        WITH anchor AS (
            SELECT date_trunc('hour', MIN(ts)) AS a FROM events
        ),
        per_user AS (
            SELECT user_id,
                   SUM(CASE WHEN DATE_DIFF('microseconds', a, ts)
                                 // 3600000000 < {DID_SPLIT_H}
                            THEN CAST(ROUND(value * 100) AS BIGINT)
                            ELSE 0 END)::BIGINT AS x,
                   SUM(CASE WHEN DATE_DIFF('microseconds', a, ts)
                                 // 3600000000 >= {DID_SPLIT_H}
                            THEN CAST(ROUND(value * 100) AS BIGINT)
                            ELSE 0 END)::BIGINT AS y
            FROM events, anchor GROUP BY 1
        ),
        per_user2 AS (
            SELECT * FROM per_user
            UNION ALL
            SELECT -gs, (gs * 50000)::BIGINT,
                   (gs * 40000 + (gs % 7) * 137)::BIGINT
            FROM generate_series(1, {CUPED_OVL_N}) t(gs)
        ),
        tot AS (
            SELECT COUNT(*)::BIGINT AS nu,
                   SUM(x // 100)::BIGINT AS sx,
                   SUM(y // 100)::BIGINT AS sy,
                   SUM((x // 100) * (y // 100))::BIGINT AS sxy,
                   SUM((x // 100) * (x // 100))::BIGINT AS sxx
            FROM per_user2
        ),
        theta AS (
            SELECT ((nu * sxy - sx * sy) * {CUPED_SCALE})
                       // (nu * sxx - sx * sx) AS theta_q
            FROM tot
        ),
        adj AS (
            SELECT p.user_id, p.x, p.y, th.theta_q,
                   (p.y * {CUPED_SCALE} - th.theta_q * p.x)
                       // {CUPED_SCALE} AS z
            FROM per_user2 p, theta th
        ),
        pooled AS (
            SELECT theta_q, COUNT(*)::BIGINT AS nu,
                   SUM(y)::BIGINT AS sy, SUM(y * y)::BIGINT AS syy,
                   SUM(z)::BIGINT AS sz, SUM(z * z)::BIGINT AS szz
            FROM adj GROUP BY 1
        ),
        arms AS (
            SELECT (user_id % 2 = 1)::BIGINT AS t,
                   COUNT(*)::BIGINT AS n_users,
                   SUM(y)::BIGINT AS sum_y, SUM(z)::BIGINT AS sum_z
            FROM adj GROUP BY 1
        )
        SELECT a.t, a.n_users, a.sum_y, a.sum_z, p.theta_q,
               CAST(p.nu * p.syy - p.sy * p.sy AS BIGINT)
                   AS var_raw_num,
               CAST(p.nu * p.szz - p.sz * p.sz AS BIGINT)
                   AS var_adj_num,
               CAST(p.nu * p.szz - p.sz * p.sz AS DOUBLE)
                   / CAST(p.nu * p.syy - p.sy * p.sy AS DOUBLE) AS vr
        FROM arms a CROSS JOIN pooled p
    """


_install_s16_batch6_oracles()


def _install_s16_batch7_oracles() -> None:
    # peak_detection: same dense grid + planted mountain, same
    # conditional-aggregate bounds/valleys over (peak, point) pairs.
    mountain = ", ".join(str(v) for v in _PEAK_MOUNTAIN)
    _ORACLE_SQL["peak_detection"] = f"""
        WITH anchor AS (
            SELECT date_trunc('hour', MIN(ts)) AS a FROM events
        ),
        counts AS (
            SELECT event_type AS etype,
                   DATE_DIFF('microseconds', a, ts) // 3600000000 AS h,
                   COUNT(*)::BIGINT AS c
            FROM events, anchor GROUP BY 1, 2
        ),
        hm AS (SELECT MAX(h) AS hmax FROM counts),
        grid AS (
            SELECT t.etype, hh.h
            FROM (SELECT DISTINCT etype FROM counts) t
            CROSS JOIN (SELECT unnest(generate_series(0, hmax)) AS h
                        FROM hm) hh
        ),
        series AS (
            SELECT g.etype, g.h, COALESCE(c.c, 0) AS c
            FROM grid g LEFT JOIN counts c
              ON c.etype = g.etype AND c.h = g.h
            UNION ALL
            SELECT 'mountain', gs - 1, ([{mountain}])[gs]::BIGINT
            FROM generate_series(1, {len(_PEAK_MOUNTAIN)}) t(gs)
        ),
        peaks AS (
            SELECT etype, h AS ph, c AS pc
            FROM (SELECT etype, h, c,
                         LAG(c) OVER (PARTITION BY etype ORDER BY h)
                             AS cl,
                         LEAD(c) OVER (PARTITION BY etype ORDER BY h)
                             AS cr
                  FROM series)
            WHERE cl IS NOT NULL AND cr IS NOT NULL
              AND c > cl AND c > cr
        ),
        bounds AS (
            SELECT p.etype, p.ph, p.pc,
                   COALESCE(MAX(CASE WHEN s.h < p.ph AND s.c > p.pc
                                     THEN s.h END), -1) AS jl,
                   COALESCE(MIN(CASE WHEN s.h > p.ph AND s.c > p.pc
                                     THEN s.h END), 1099511627776)
                       AS jr
            FROM peaks p JOIN series s ON s.etype = p.etype
            GROUP BY 1, 2, 3
        ),
        valleys AS (
            SELECT b.etype, b.ph, b.pc,
                   MIN(CASE WHEN s.h > b.jl AND s.h < b.ph
                            THEN s.c END) AS minl,
                   MIN(CASE WHEN s.h > b.ph AND s.h < b.jr
                            THEN s.c END) AS minr
            FROM bounds b JOIN series s ON s.etype = b.etype
            GROUP BY 1, 2, 3
        )
        SELECT etype, ph AS h, pc AS c,
               CAST(pc - GREATEST(minl, minr) AS BIGINT) AS prom
        FROM valleys
        WHERE pc - GREATEST(minl, minr) >= {PEAK_MIN_PROM}
    """
    # ks_uniformity: same minute offsets, same scaled statistic,
    # same all-BIGINT critical line and overlays.
    _ORACLE_SQL["ks_uniformity"] = f"""
        WITH anchor AS (
            SELECT date_trunc('hour', MIN(ts)) AS a FROM events
        ),
        real AS (
            SELECT user_id,
                   DATE_DIFF('microseconds', a, ts) // 60000000 AS t
            FROM events, anchor
        ),
        tm AS (SELECT MAX(t) + 1 AS tt FROM real),
        base AS (
            SELECT user_id, t FROM real
            UNION ALL
            SELECT -1::BIGINT, gs
            FROM generate_series(1, {KS_OVL_N}) t(gs)
            UNION ALL
            SELECT -2::BIGINT, (gs * 2 - 1) * (tt // {2 * 48})
            FROM generate_series(1, 48) t(gs), tm
        ),
        ranked AS (
            SELECT user_id, t, tt,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY t
                   )::BIGINT AS i,
                   COUNT(*) OVER (PARTITION BY user_id)::BIGINT AS n
            FROM base, tm
        ),
        agg AS (
            SELECT user_id, MAX(n) AS n, MAX(tt) AS t_span,
                   MAX(GREATEST(i * tt - n * t,
                                n * t - (i - 1) * tt))::BIGINT AS d_int
            FROM ranked GROUP BY 1
        )
        SELECT user_id, n, t_span, d_int,
               CAST(d_int AS DOUBLE)
                   / CAST(n * t_span AS DOUBLE) AS d,
               CASE WHEN {KS_CRIT2_DEN} * d_int * d_int
                         >= {KS_CRIT2_NUM} * n * t_span * t_span
                    THEN 'reject' ELSE 'uniform' END AS verdict
        FROM agg
    """
    # seat_apportionment: same floor quotas, remainders, and
    # largest-remainder top-up with (rem DESC, source ASC) ties.
    _ORACLE_SQL["seat_apportionment"] = f"""
        WITH counts AS (
            SELECT source, COUNT(*)::BIGINT AS n_docs
            FROM documents GROUP BY 1
        ),
        tot AS (SELECT SUM(n_docs)::BIGINT AS nn FROM counts),
        q AS (
            SELECT source, n_docs,
                   ({APPORTION_K} * n_docs) // nn AS floor_q,
                   ({APPORTION_K} * n_docs) % nn AS rem_num
            FROM counts, tot
        ),
        ranked AS (
            SELECT *,
                   ROW_NUMBER() OVER (
                       ORDER BY rem_num DESC, source ASC
                   ) AS rk,
                   {APPORTION_K} - SUM(floor_q) OVER () AS extra
            FROM q
        )
        SELECT source, n_docs,
               CAST(floor_q AS BIGINT) AS floor_q,
               CAST(rem_num AS BIGINT) AS rem_num,
               CAST(floor_q + CASE WHEN rk <= extra THEN 1 ELSE 0 END
                    AS BIGINT) AS seats
        FROM ranked
    """


_install_s16_batch7_oracles()


def _install_s16_batch8_oracles() -> None:
    # lsh_recall_audit: the ngram_jaccard oracle's base/signature
    # fragments (same constants, generated from the SAME Python
    # lists), truth by the exact integer line, nb expansion mirrored.
    def case_of(vals):
        return (
            "CASE band "
            + " ".join(f"WHEN {b} THEN {v}" for b, v in enumerate(vals[:3]))
            + f" ELSE {vals[3]} END"
        )

    a0 = case_of([MINHASH_A[2 * b] for b in range(4)])
    c0 = case_of([MINHASH_C[2 * b] for b in range(4)])
    a1 = case_of([MINHASH_A[2 * b + 1] for b in range(4)])
    c1 = case_of([MINHASH_C[2 * b + 1] for b in range(4)])
    _ORACLE_SQL["lsh_recall_audit"] = f"""
        WITH base AS (
            SELECT doc_id,
                   LIST_DISTINCT(LIST_TRANSFORM(
                       LIST_TRANSFORM(
                           GENERATE_SERIES(1, GREATEST(
                               LEN(STRING_SPLIT(text, ' ')) - 2, 1)),
                           i -> ARRAY_TO_STRING(
                               STRING_SPLIT(text, ' ')[i:i+2], ' ')),
                       s -> CAST(('0x' || SUBSTRING(MD5(s), 1, 15))::UBIGINT
                                 AS BIGINT) % {MINHASH_P})) AS hs
            FROM documents
        ),
        sized AS (
            SELECT doc_id, hs, CAST(LEN(hs) AS BIGINT) AS n_shingles
            FROM base
        ),
        truth AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM sized a JOIN sized b ON a.doc_id < b.doc_id
            WHERE LEN(LIST_INTERSECT(a.hs, b.hs)) >= 1
              AND 3 * LEN(LIST_INTERSECT(a.hs, b.hs))
                  >= a.n_shingles + b.n_shingles
        ),
        sigx AS (
            SELECT doc_id, band,
                   LIST_MIN(LIST_TRANSFORM(hs, h ->
                       (h * {a0} + {c0}) % {MINHASH_P})) AS m0,
                   LIST_MIN(LIST_TRANSFORM(hs, h ->
                       (h * {a1} + {c1}) % {MINHASH_P})) AS m1
            FROM sized
            CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, 3)) AS band)
        ),
        cand AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   MIN(a.band)::BIGINT AS min_band
            FROM sigx a
            JOIN sigx b ON a.band = b.band AND a.m0 = b.m0
                       AND a.m1 = b.m1 AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ),
        nbs AS (SELECT UNNEST(GENERATE_SERIES(1, 4))::BIGINT AS nb),
        cand_nb AS (
            SELECT n.nb, c.id_a, c.id_b
            FROM nbs n JOIN cand c ON c.min_band < n.nb
        ),
        n_truth AS (SELECT COUNT(*)::BIGINT AS n_truth FROM truth),
        stats AS (
            SELECT cn.nb, COUNT(*)::BIGINT AS n_cand,
                   SUM(CASE WHEN t.id_a IS NOT NULL
                            THEN 1 ELSE 0 END)::BIGINT AS tp
            FROM cand_nb cn
            LEFT JOIN truth t
              ON t.id_a = cn.id_a AND t.id_b = cn.id_b
            GROUP BY 1
        )
        SELECT n.nb, COALESCE(s.n_cand, 0) AS n_cand, nt.n_truth,
               COALESCE(s.tp, 0) AS tp,
               CAST(COALESCE(s.tp, 0) AS DOUBLE)
                   / CAST(nt.n_truth AS DOUBLE) AS recall,
               CAST(COALESCE(s.tp, 0) AS DOUBLE)
                   / CAST(GREATEST(COALESCE(s.n_cand, 0), 1) AS DOUBLE)
                   AS precision
        FROM nbs n
        LEFT JOIN stats s ON s.nb = n.nb
        CROSS JOIN n_truth nt
    """
    # trimmed_mean: same cents, same rank trimming, same overlay.
    nb_, ns = TRIM_OVL_BASE, TRIM_OVL_SPIKES
    _ORACLE_SQL["trimmed_mean"] = f"""
        WITH allv AS (
            SELECT event_type AS etype,
                   CAST(ROUND(value * 100) AS BIGINT) AS c
            FROM events
            UNION ALL
            SELECT t.etype,
                   CASE WHEN gs <= {nb_} THEN 1000 + gs * 7
                        WHEN gs <= {nb_ + ns} THEN 0
                        WHEN t.etype = 'spike_a' THEN 100000000
                        ELSE 1000000000 END::BIGINT
            FROM generate_series(1, {nb_ + 2 * ns}) g(gs)
            CROSS JOIN (SELECT UNNEST(['spike_a', 'spike_b']) AS etype) t
        ),
        ranked AS (
            SELECT etype, c,
                   ROW_NUMBER() OVER (
                       PARTITION BY etype ORDER BY c
                   )::BIGINT AS rk,
                   COUNT(*) OVER (PARTITION BY etype)::BIGINT AS n
            FROM allv
        )
        SELECT etype, MAX(n) AS n,
               MAX(n // {TRIM_PCT_DEN})::BIGINT AS k_trim,
               SUM(c)::BIGINT AS sum_all,
               SUM(CASE WHEN rk > n // {TRIM_PCT_DEN}
                         AND rk <= n - n // {TRIM_PCT_DEN}
                        THEN c ELSE 0 END)::BIGINT AS sum_kept,
               SUM(CASE WHEN rk > n // {TRIM_PCT_DEN}
                         AND rk <= n - n // {TRIM_PCT_DEN}
                        THEN 1 ELSE 0 END)::BIGINT AS n_kept,
               CAST(SUM(c) AS DOUBLE) / CAST(MAX(n) AS DOUBLE)
                   AS mean_cents,
               CAST(SUM(CASE WHEN rk > n // {TRIM_PCT_DEN}
                              AND rk <= n - n // {TRIM_PCT_DEN}
                             THEN c ELSE 0 END) AS DOUBLE)
                   / CAST(SUM(CASE WHEN rk > n // {TRIM_PCT_DEN}
                                    AND rk <= n - n // {TRIM_PCT_DEN}
                                   THEN 1 ELSE 0 END) AS DOUBLE)
                   AS trimmed_mean_cents
        FROM ranked GROUP BY 1
    """


_install_s16_batch8_oracles()


def _install_s16_batch9_oracles() -> None:
    est_raw = f"({HLL_ALPHA_M2_SCALED} / cast(s_scaled as double))"
    est = (
        f"round(CASE WHEN {est_raw} <= 160.0 AND v_zero > 0"
        f" THEN 64.0 * ln(64.0 / v_zero) ELSE {est_raw} END, 4)"
    )
    # hll_intersect: the hll_distinct register pipeline verbatim on
    # (user@day) items, registers densified to 64 indices, pair
    # union = elementwise max, same estimate CASE, exact audit leg.
    _ORACLE_SQL["hll_intersect"] = f"""
        WITH items AS (
            SELECT event_type AS etype,
                   CAST(user_id AS VARCHAR) || '@'
                       || strftime(ts, '%Y-%m-%d') AS item
            FROM events
        ),
        hashed AS (
            SELECT etype,
                   CAST(('0x' || substring(md5(item), 1, 4))::UBIGINT
                        AS BIGINT) % 64 AS idx,
                   CAST(('0x' || substring(md5(item), 5, 13))::UBIGINT
                        AS BIGINT) AS x
            FROM items
        ),
        rhos AS (
            SELECT etype, idx,
                   CASE WHEN x = 0 THEN 53
                        ELSE length(bin(x & -x)) END AS rho
            FROM hashed
        ),
        regs AS (
            SELECT etype, idx, MAX(rho) AS r FROM rhos GROUP BY 1, 2
        ),
        types AS (SELECT DISTINCT etype FROM items),
        dense AS (
            SELECT t.etype, g.idx, COALESCE(r.r, 0) AS r
            FROM types t
            CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS idx) g
            LEFT JOIN regs r ON r.etype = t.etype AND r.idx = g.idx
        ),
        per_type AS (
            SELECT etype,
                   CAST(SUM(CAST(1 AS BIGINT) << (53 - r)) AS BIGINT)
                       AS s_scaled,
                   SUM(CASE WHEN r = 0 THEN 1 ELSE 0 END)::BIGINT
                       AS v_zero
            FROM dense GROUP BY 1
        ),
        est_t AS (SELECT etype, {est} AS est_t FROM per_type),
        pairs AS (
            SELECT a.etype AS type_a, b.etype AS type_b
            FROM types a JOIN types b ON a.etype < b.etype
        ),
        merged AS (
            SELECT p.type_a, p.type_b, da.idx,
                   GREATEST(da.r, db.r) AS r
            FROM pairs p
            JOIN dense da ON da.etype = p.type_a
            JOIN dense db ON db.etype = p.type_b AND db.idx = da.idx
        ),
        ufold AS (
            SELECT type_a, type_b,
                   CAST(SUM(CAST(1 AS BIGINT) << (53 - r)) AS BIGINT)
                       AS s_scaled,
                   SUM(CASE WHEN r = 0 THEN 1 ELSE 0 END)::BIGINT
                       AS v_zero
            FROM merged GROUP BY 1, 2
        ),
        est_u AS (
            SELECT type_a, type_b, {est} AS est_union FROM ufold
        ),
        di AS (SELECT DISTINCT etype, item FROM items),
        exact AS (
            SELECT x.etype AS type_a, y.etype AS type_b,
                   COUNT(*)::BIGINT AS n_exact
            FROM di x JOIN di y
              ON x.item = y.item AND x.etype < y.etype
            GROUP BY 1, 2
        )
        SELECT u.type_a, u.type_b, ea.est_t AS est_a, eb.est_t AS est_b,
               u.est_union,
               round(ea.est_t + eb.est_t - u.est_union, 4)
                   AS est_intersect,
               COALESCE(x.n_exact, 0) AS n_exact
        FROM est_u u
        JOIN est_t ea ON ea.etype = u.type_a
        JOIN est_t eb ON eb.etype = u.type_b
        LEFT JOIN exact x
          ON x.type_a = u.type_a AND x.type_b = u.type_b
    """
    # textrank_sentences: the sentence_split oracle embedded verbatim
    # (rrf_fuse drift-proofing), same integer two-iteration scores.
    _ORACLE_SQL["textrank_sentences"] = f"""
        WITH sents AS ({_ORACLE_SQL["sentence_split"]}),
        toks AS (
            SELECT doc_id, sent_idx,
                   LIST_DISTINCT(LIST_FILTER(
                       STRING_SPLIT(regexp_replace(sentence, '[.!]',
                                                   '', 'g'), ' '),
                       t -> t <> '')) AS tk
            FROM sents
        ),
        edges AS (
            SELECT a.doc_id, a.sent_idx AS u, b.sent_idx AS v,
                   CAST(LEN(LIST_INTERSECT(a.tk, b.tk)) AS BIGINT) AS w
            FROM toks a JOIN toks b
              ON a.doc_id = b.doc_id AND a.sent_idx != b.sent_idx
            WHERE LEN(LIST_INTERSECT(a.tk, b.tk)) > 0
        ),
        s1 AS (
            SELECT doc_id, v AS sent_idx, SUM(w)::BIGINT AS s1
            FROM edges GROUP BY 1, 2
        ),
        s2 AS (
            SELECT e.doc_id, e.v AS sent_idx,
                   SUM(e.w * s.s1)::BIGINT AS s2
            FROM edges e
            JOIN s1 s ON s.doc_id = e.doc_id AND s.sent_idx = e.u
            GROUP BY 1, 2
        ),
        scored AS (
            SELECT st.doc_id, st.sent_idx, st.sentence,
                   COALESCE(s1.s1, 0) AS s1, COALESCE(s2.s2, 0) AS s2
            FROM sents st
            LEFT JOIN s1 ON s1.doc_id = st.doc_id
                        AND s1.sent_idx = st.sent_idx
            LEFT JOIN s2 ON s2.doc_id = st.doc_id
                        AND s2.sent_idx = st.sent_idx
        )
        SELECT doc_id, sent_idx, sentence, s1, s2,
               CASE WHEN ROW_NUMBER() OVER (
                        PARTITION BY doc_id
                        ORDER BY s2 DESC, sent_idx ASC) = 1
                    THEN 1 ELSE 0 END::BIGINT AS is_top
        FROM scored
    """


_install_s16_batch9_oracles()


def _install_s16_batch10_oracles() -> None:
    # rfm_segments: same anchored day grid, same ntile-over-total-
    # order quintiles (NTILE fill rule is identical), same CASE chain.
    _ORACLE_SQL["rfm_segments"] = f"""
        WITH anchor AS (
            SELECT date_trunc('hour', MIN(ts)) AS a FROM events
        ),
        per_user AS (
            SELECT user_id,
                   MAX(DATE_DIFF('microseconds', a, ts)
                       // 86400000000) AS last_day,
                   COUNT(*)::BIGINT AS freq,
                   SUM(CAST(ROUND(value * 100) AS BIGINT))::BIGINT
                       AS monetary_c
            FROM events, anchor GROUP BY 1
        ),
        md AS (SELECT MAX(last_day) AS md FROM per_user),
        base AS (
            SELECT user_id, CAST(md - last_day AS BIGINT) AS recency_d,
                   freq, monetary_c
            FROM per_user, md
        ),
        scored AS (
            SELECT user_id, recency_d, freq, monetary_c,
                   NTILE(5) OVER (
                       ORDER BY recency_d DESC, user_id ASC
                   )::BIGINT AS r,
                   NTILE(5) OVER (
                       ORDER BY freq ASC, user_id ASC
                   )::BIGINT AS f,
                   NTILE(5) OVER (
                       ORDER BY monetary_c ASC, user_id ASC
                   )::BIGINT AS m
            FROM base
        )
        SELECT *,
               CASE WHEN r >= 4 AND f >= 4 AND m >= 4 THEN 'champion'
                    WHEN f >= 4 THEN 'loyal'
                    WHEN m >= 4 THEN 'big_spender'
                    WHEN r <= 2 AND f >= 3 THEN 'at_risk'
                    WHEN r <= 2 THEN 'hibernating'
                    ELSE 'regular' END AS segment
        FROM scored
    """
    # geohash_encode: the SAME emitter with DuckDB shift/div
    # spellings; occupancy join mirrored.
    shl = lambda ex, n: f"(({ex}) << {n})"  # noqa: E731
    shr = lambda ex, n: f"(({ex}) >> {n})"  # noqa: E731
    div = lambda ex, n: f"(({ex}) // {n})"  # noqa: E731
    zsql = _geohash_z_sql(shl, div)
    ghsql = _geohash_chars_sql("z", shr)
    _ORACLE_SQL["geohash_encode"] = f"""
        WITH pts AS (
            SELECT event_id AS pid,
                   CAST({SPATIAL_X_SQL} AS BIGINT) AS x,
                   CAST({SPATIAL_Y_SQL} AS BIGINT) AS y
            FROM events
        ),
        zs AS (SELECT pid, x, y, {zsql} AS z FROM pts),
        cells AS (
            SELECT pid, x, y, {ghsql} AS gh6,
                   substr({ghsql}, 1, 4) AS gh4
            FROM zs
        ),
        occ AS (
            SELECT gh4, COUNT(*)::BIGINT AS cell_n
            FROM cells GROUP BY 1
        )
        SELECT c.pid, c.x, c.y, c.gh6, c.gh4, o.cell_n
        FROM cells c JOIN occ o USING (gh4)
    """


_install_s16_batch10_oracles()


def _install_s16_batch11_oracles() -> None:
    # stock_clamp: the literal max(0, .) recurrence as a recursive
    # day-by-day walk — the genuinely different formulation vs the
    # closed-form reflection windows.
    _ORACLE_SQL["stock_clamp"] = """
        WITH RECURSIVE anchor AS (
            SELECT date_trunc('hour', MIN(ts)) AS a FROM events
        ),
        daily AS (
            SELECT user_id,
                   DATE_DIFF('microseconds', a, ts) // 86400000000 AS d,
                   SUM(CASE WHEN event_type = 'purchase'
                            THEN 4 * CAST(ROUND(value * 100) AS BIGINT)
                            ELSE -CAST(ROUND(value * 100) AS BIGINT)
                       END)::BIGINT AS delta_c
            FROM events, anchor GROUP BY 1, 2
        ),
        seq AS (
            SELECT user_id, d, delta_c,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY d
                   ) AS rn
            FROM daily
        ),
        walk(user_id, rn, d, delta_c, prefix_c, balance_c) AS (
            SELECT user_id, rn, d, delta_c, delta_c,
                   GREATEST(0, delta_c)
            FROM seq WHERE rn = 1
            UNION ALL
            SELECT s.user_id, s.rn, s.d, s.delta_c,
                   w.prefix_c + s.delta_c,
                   GREATEST(0, w.balance_c + s.delta_c)
            FROM walk w JOIN seq s
              ON s.user_id = w.user_id AND s.rn = w.rn + 1
        )
        SELECT user_id, d, delta_c,
               CAST(prefix_c AS BIGINT) AS prefix_c,
               CAST(balance_c AS BIGINT) AS balance_c
        FROM walk
    """
    # peak_concurrency: per-START containment counting (the max of
    # a right-continuous step function is attained at a start) vs
    # the Spark sweep; same half-open semantics and tiebreak.
    _ORACLE_SQL["peak_concurrency"] = f"""
        WITH anchor AS (
            SELECT date_trunc('hour', MIN(ts)) AS a FROM events
        ),
        base AS (
            SELECT event_type AS etype, event_id,
                   DATE_DIFF('microseconds', a, ts) AS s,
                   DATE_DIFF('microseconds', a, ts)
                       + ({CONC_DUR_BASE} + event_id % {CONC_DUR_MOD})
                         * 1000000 AS e
            FROM events, anchor
        ),
        pts AS (SELECT DISTINCT etype, s AS t FROM base),
        cnt AS (
            SELECT p.etype, p.t, COUNT(*)::BIGINT AS conc
            FROM pts p JOIN base o
              ON o.etype = p.etype AND o.s <= p.t AND p.t < o.e
            GROUP BY 1, 2
        ),
        nb AS (
            SELECT event_type AS etype,
                   (2 * COUNT(*))::BIGINT AS n_bounds
            FROM events GROUP BY 1
        ),
        best AS (
            SELECT etype, conc, t,
                   ROW_NUMBER() OVER (
                       PARTITION BY etype ORDER BY conc DESC, t ASC
                   ) AS rk
            FROM cnt
        )
        SELECT b.etype, b.conc AS peak, b.t AS peak_at_us, nb.n_bounds
        FROM best b JOIN nb USING (etype)
        WHERE b.rk = 1
    """


_install_s16_batch11_oracles()


def _install_s16_batch12_oracles() -> None:
    # robust_line_fit: same anchors, same integer inlier line, same
    # (-n, pa, pb) argmax.
    _ORACLE_SQL["robust_line_fit"] = f"""
        WITH cloud AS (
            SELECT event_id AS pid,
                   CAST({SPATIAL_X_SQL} AS BIGINT) AS x,
                   CAST({SPATIAL_Y_SQL} AS BIGINT) AS y
            FROM events
            UNION ALL
            SELECT -gs, (gs * 1000)::BIGINT, (gs * 2000 + 500)::BIGINT
            FROM generate_series(1, {RANSAC_PLANT_N}) t(gs)
        ),
        anchors AS (
            SELECT * FROM cloud
            WHERE (pid >= 0 AND pid % {RANSAC_ANCHOR_MOD} = 7)
               OR (pid < 0 AND pid % 2 = 0)
        ),
        hyp AS (
            SELECT a.pid AS pa, b.pid AS pb, a.x AS x1, a.y AS y1,
                   b.x - a.x AS dx, b.y - a.y AS dy
            FROM anchors a JOIN anchors b ON a.pid < b.pid
            WHERE b.x - a.x != 0
        ),
        scored AS (
            SELECT h.pa, h.pb, h.x1, h.y1, h.dx, h.dy,
                   COUNT(*)::BIGINT AS n_inliers
            FROM hyp h JOIN cloud p
              ON ABS((p.y - h.y1) * h.dx - (p.x - h.x1) * h.dy)
                 <= {RANSAC_TOL} * ABS(h.dx)
            GROUP BY 1, 2, 3, 4, 5, 6
        ),
        best AS (
            SELECT *, ROW_NUMBER() OVER (
                ORDER BY n_inliers DESC, pa ASC, pb ASC
            ) AS rk
            FROM scored
        )
        SELECT pa AS pid_a, pb AS pid_b, n_inliers,
               CAST(dy AS BIGINT) AS slope_num,
               CAST(dx AS BIGINT) AS slope_den,
               CAST(dy AS DOUBLE) / CAST(dx AS DOUBLE) AS slope,
               y1 - CAST(x1 * dy AS DOUBLE) / CAST(dx AS DOUBLE)
                   AS intercept
        FROM best WHERE rk = 1
    """
    # vector_clock_audit: same md5-nibble clocks, same planted
    # merge+1 version, same array dominance algebra.
    comps = lambda v: ", ".join(  # noqa: E731
        f"CAST(('0x' || substring(md5(text || 'v{v}'), {1 + 4 * j}, 4))"
        f"::UBIGINT AS BIGINT) % {VC_MOD}"
        for j in range(3)
    )
    _ORACLE_SQL["vector_clock_audit"] = f"""
        WITH vers AS (
            SELECT doc_id, 'r0' AS ver, [{comps(0)}] AS clock
            FROM documents
            UNION ALL
            SELECT doc_id, 'r1', [{comps(1)}] FROM documents
            UNION ALL
            SELECT doc_id, 'r2', [{comps(2)}] FROM documents
        ),
        mx AS (
            SELECT doc_id, 'merged' AS ver,
                   [MAX(clock[1]) + 1, MAX(clock[2]) + 1,
                    MAX(clock[3]) + 1] AS clock
            FROM vers GROUP BY doc_id
        ),
        allv AS (SELECT * FROM vers UNION ALL SELECT * FROM mx),
        pairs AS (
            SELECT a.doc_id, a.ver AS ver_a, b.ver AS ver_b,
                   a.clock AS ca, b.clock AS cb
            FROM allv a JOIN allv b
              ON a.doc_id = b.doc_id AND a.ver < b.ver
        ),
        cls AS (
            SELECT doc_id, ver_a, ver_b, ca, cb,
                   (ca[1] <= cb[1] AND ca[2] <= cb[2]
                    AND ca[3] <= cb[3]) AS aleb,
                   (cb[1] <= ca[1] AND cb[2] <= ca[2]
                    AND cb[3] <= ca[3]) AS blea
            FROM pairs
        )
        SELECT doc_id, ver_a, ver_b,
               array_to_string(ca, '|') AS clock_a,
               array_to_string(cb, '|') AS clock_b,
               CASE WHEN aleb AND blea THEN 'equal'
                    WHEN aleb THEN 'a_before_b'
                    WHEN blea THEN 'b_before_a'
                    ELSE 'concurrent' END AS relation,
               array_to_string(
                   [GREATEST(ca[1], cb[1]), GREATEST(ca[2], cb[2]),
                    GREATEST(ca[3], cb[3])], '|') AS merged
        FROM cls
    """


_install_s16_batch12_oracles()


def _install_s16_batch13_oracles() -> None:
    d0, d1 = SC_DONORS
    # synthetic_control: same dense grid, same Cramer integers, same
    # planted 2x+3y+lift series.
    _ORACLE_SQL["synthetic_control"] = f"""
        WITH anchor AS (
            SELECT date_trunc('hour', MIN(ts)) AS a FROM events
        ),
        counts AS (
            SELECT event_type AS etype,
                   DATE_DIFF('microseconds', a, ts) // 3600000000 AS h,
                   COUNT(*)::BIGINT AS c
            FROM events, anchor GROUP BY 1, 2
        ),
        hm AS (SELECT MAX(h) AS hmax FROM counts),
        hours AS (
            SELECT unnest(generate_series(0, hmax)) AS h FROM hm
        ),
        grid AS (
            SELECT hh.h,
                   COALESCE(cx1.c, 0) AS x1,
                   COALESCE(cx2.c, 0) AS x2,
                   COALESCE(cy.c, 0) AS y_real,
                   2 * COALESCE(cx1.c, 0) + 3 * COALESCE(cx2.c, 0)
                   + CASE WHEN hh.h >= {DID_SPLIT_H}
                          THEN {SC_LIFT} ELSE 0 END AS y_planted
            FROM hours hh
            LEFT JOIN counts cx1
              ON cx1.etype = '{d0}' AND cx1.h = hh.h
            LEFT JOIN counts cx2
              ON cx2.etype = '{d1}' AND cx2.h = hh.h
            LEFT JOIN counts cy
              ON cy.etype = '{SC_TREATED}' AND cy.h = hh.h
        ),
        metrics AS (
            SELECT 'real' AS metric, h, x1, x2, y_real AS y FROM grid
            UNION ALL
            SELECT 'planted', h, x1, x2, y_planted FROM grid
        ),
        pre AS (
            SELECT metric, SUM(x1 * x1)::BIGINT AS a,
                   SUM(x1 * x2)::BIGINT AS b,
                   SUM(x2 * x2)::BIGINT AS cc,
                   SUM(x1 * y)::BIGINT AS p, SUM(x2 * y)::BIGINT AS q
            FROM metrics WHERE h < {DID_SPLIT_H} GROUP BY 1
        ),
        post AS (
            SELECT metric, COUNT(*)::BIGINT AS n_post,
                   SUM(x1)::BIGINT AS sx1, SUM(x2)::BIGINT AS sx2,
                   SUM(y)::BIGINT AS sy
            FROM metrics WHERE h >= {DID_SPLIT_H} GROUP BY 1
        )
        SELECT pre.metric,
               CAST(cc * p - b * q AS BIGINT) AS w1_num,
               CAST(a * q - b * p AS BIGINT) AS w2_num,
               CAST(a * cc - b * b AS BIGINT) AS det,
               CAST((a * cc - b * b) * sy - (cc * p - b * q) * sx1
                    - (a * q - b * p) * sx2 AS BIGINT) AS effect_num,
               post.n_post,
               CAST(cc * p - b * q AS DOUBLE)
                   / CAST(a * cc - b * b AS DOUBLE) AS w1,
               CAST(a * q - b * p AS DOUBLE)
                   / CAST(a * cc - b * b AS DOUBLE) AS w2,
               CAST((a * cc - b * b) * sy - (cc * p - b * q) * sx1
                    - (a * q - b * p) * sx2 AS DOUBLE)
                   / CAST((a * cc - b * b) * post.n_post AS DOUBLE)
                   AS effect_per_hour
        FROM pre JOIN post USING (metric)
    """
    # mix_rate_decomposition: same quantized rates and share
    # cross-products, same truncating division everywhere.
    _ORACLE_SQL["mix_rate_decomposition"] = f"""
        WITH anchor AS (
            SELECT date_trunc('hour', MIN(ts)) AS a FROM events
        ),
        base AS (
            SELECT event_type AS etype,
                   (DATE_DIFF('microseconds', a, ts) // 3600000000
                    >= {DID_SPLIT_H})::BIGINT AS post,
                   CAST(ROUND(value * 100) AS BIGINT) AS c
            FROM events, anchor
        ),
        cells AS (
            SELECT etype,
                   SUM(1 - post)::BIGINT AS n1_s,
                   SUM(CASE WHEN post = 0 THEN c ELSE 0 END)::BIGINT
                       AS s1_c,
                   SUM(post)::BIGINT AS n2_s,
                   SUM(CASE WHEN post = 1 THEN c ELSE 0 END)::BIGINT
                       AS s2_c
            FROM base GROUP BY 1
        ),
        tot AS (
            SELECT SUM(n1_s)::BIGINT AS n1, SUM(n2_s)::BIGINT AS n2
            FROM cells
        )
        SELECT etype, n1_s, s1_c, n2_s, s2_c,
               CAST((s1_c * {MRD_SCALE}) // n1_s AS BIGINT) AS rate1_q,
               CAST((s2_c * {MRD_SCALE}) // n2_s AS BIGINT) AS rate2_q,
               CAST(n2_s * n1 - n1_s * n2 AS BIGINT) AS share_xnum,
               CAST(((n2_s * n1 - n1_s * n2)
                     * ((s1_c * {MRD_SCALE}) // n1_s)) // (n1 * n2)
                    AS BIGINT) AS mix_q,
               CAST((n2_s * (((s2_c * {MRD_SCALE}) // n2_s)
                             - ((s1_c * {MRD_SCALE}) // n1_s))) // n2
                    AS BIGINT) AS rate_q,
               CAST(((n2_s * n1 - n1_s * n2)
                     * ((s1_c * {MRD_SCALE}) // n1_s)) // (n1 * n2)
                    + (n2_s * (((s2_c * {MRD_SCALE}) // n2_s)
                               - ((s1_c * {MRD_SCALE}) // n1_s))) // n2
                    AS DOUBLE) / {float(MRD_SCALE * 100)}
                   AS contribution_dollars
        FROM cells, tot
    """


_install_s16_batch13_oracles()
