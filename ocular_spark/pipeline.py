"""Spark pipeline: interleaved-span transcription.

The serving path of the engine (reference lifecycle: main/Transcribe.java,
traced in SURVEY.md §3.1), re-expressed Spark-first over the
BASELINE.json `input_hint` schema:

    docs(doc_id: string,
         spans: array<struct<kind:string, text:string,
                             media_ref:string, offset:int>>)
    media(media_ref: string, n_lines: int, lines: array<binary>)
        -- each binary is a raw (width:int32-le header, then
           width*LINE_HEIGHT uint8 pixels) line image, the
           pre-extracted-lines variant of FIXTURES.md §2.

Plan shape (designed for 10^12 docs / 1000 executors):
  1. explode spans; media spans join `media` on media_ref (broadcast for
     small stores, shuffle hash join otherwise — Spark/AQE picks);
  2. **repartition by xxhash64(doc_id, media_ref)**: the decode unit is
     the *page* (line continuity is within a page: the reference's
     Document is one page, data/LazyRawPdfImageDocument expands pdfs
     per page), so page-level salting defeats the heavy-tail page-count
     skew that doc-level grouping would suffer (north_rule requirement;
     a doc with 40 pages costs 40x a 1-page doc but its pages spread
     over 40 partitions);
  3. mapInPandas decode kernel — batched NumPy (decoder.py), models
     from a SparkContext.broadcast, built once per executor process;
  4. union with pass-through text spans and reassemble per doc with
     array_sort over (offset) — span-sequence (kind, text, media_ref,
     order) is preserved exactly.

All Python execution is Arrow-batched; there is no per-row Python and
no driver-side collect in the pipeline.
"""

from __future__ import annotations

import struct
from typing import Iterator, List, Optional, Tuple

import numpy as np

try:  # allow importing kernel helpers without a Spark distribution
    from pyspark.sql import DataFrame, SparkSession, functions as F
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    HAVE_SPARK = True
except ImportError:  # pragma: no cover
    HAVE_SPARK = False

from ocular_spark.font import LINE_HEIGHT

SPAN_STRUCT_DDL = "kind string, text string, media_ref string, offset int"
DOCS_DDL = f"doc_id string, spans array<struct<{SPAN_STRUCT_DDL}>>"

# tasks per core for the decode stage (see transcribe() for rationale)
DECODE_PARTITION_MULTIPLIER = 3


# ---- line-image (de)serialization for the media table ----

def pack_line(img: np.ndarray) -> bytes:
    """(width, LINE_HEIGHT) uint8 -> bytes with int32-le width header."""
    if img.ndim != 2 or img.shape[1] != LINE_HEIGHT:
        raise ValueError("expected (width, %d) line image" % LINE_HEIGHT)
    return struct.pack("<i", img.shape[0]) + img.astype(np.uint8).tobytes()


def unpack_line(raw: bytes) -> np.ndarray:
    (width,) = struct.unpack_from("<i", raw, 0)
    return np.frombuffer(raw, dtype=np.uint8, offset=4).reshape(width, LINE_HEIGHT)


# ---- model bundle: broadcast once, decoder built once per executor ----

class ModelBundle:
    """Picklable (font, lm, decode params); the heavy compiled decoder
    (context tables, template stacks) is derived lazily exactly once
    per executor process and memoized by identity (J3 broadcast-join
    pattern, SURVEY.md §2.3)."""

    def __init__(self, font_bytes: bytes, lm, beam_size: int = 10,
                 pad_min: int = 1, pad_max: int = 5,
                 preprocess_em_iters: int = 5, preprocess_em_restarts: int = 100,
                 binarize_threshold: float = 0.12,
                 preprocess_straighten: bool = True,
                 preprocess_crop: bool = False,
                 transition_model=None) -> None:
        # construction-time unique identity: the worker-side decoder
        # memo must NOT key on id(bundle) — a deserialized bundle can
        # land at a recycled address in a reused python worker and
        # silently return a STALE decoder for the wrong model
        # generation (bit us between EM re-broadcasts)
        import uuid

        self.bundle_key = uuid.uuid4().hex
        self.font_bytes = font_bytes
        self.lm = lm
        # Optional PRE-COMPILED transition model (CompiledTransitionModel
        # / CodeSwitchTransitionModel / MarkovOffsetTransitionModel).
        # Compiling the dense context tables costs O(n_ctx * C) Python
        # loops; doing it once on the driver and shipping plain NumPy
        # arrays in the broadcast turns every cold worker's start-up
        # into O(unpickle) (the round-1 driver bench lost 2.3x decode
        # throughput to per-worker recompiles).
        self.transition_model = transition_model
        self.beam_size = beam_size
        self.pad_min = pad_min
        self.pad_max = pad_max
        # whole-page path (media carries page_png instead of lines)
        self.preprocess_em_iters = preprocess_em_iters
        self.preprocess_em_restarts = preprocess_em_restarts
        self.binarize_threshold = binarize_threshold
        # crop defaults OFF: the reference's margin cropper (Cropper.java)
        # assumes book-page margins; fixture pages have none and the
        # 3-segment objective would cut content. The operator itself is
        # implemented and unit-tested (tests/test_preprocess.py).
        self.preprocess_straighten = preprocess_straighten
        self.preprocess_crop = preprocess_crop


_DECODER_CACHE: dict = {}


def get_decoder(bundle: ModelBundle):
    # bundle_key is assigned once at construction on the driver and
    # travels through the broadcast pickle, so it is collision-free
    # across model generations (unlike id(), which a reused worker can
    # recycle); fall back to id() for unpickled legacy bundles
    key = getattr(bundle, "bundle_key", None) or id(bundle)
    dec = _DECODER_CACHE.get(key)
    if dec is None:
        from ocular_spark.font import Font
        from ocular_spark.decoder import Decoder

        # single-threaded BLAS inside tasks: Spark owns the parallelism
        try:
            import os

            os.environ.setdefault("OMP_NUM_THREADS", "1")
            os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
        except Exception:
            pass
        font = Font.from_bytes(bundle.font_bytes)
        dec = Decoder(
            font, bundle.lm, bundle.pad_min, bundle.pad_max, bundle.beam_size,
            transition_model=getattr(bundle, "transition_model", None),
        )
        _DECODER_CACHE.clear()  # one model generation at a time per worker
        _DECODER_CACHE[key] = dec
    return dec


def decode_pages_kernel(bundle_bc, char_strs: List[str], media_col: str = "lines"):
    """mapInPandas kernel: rows (doc_id, media_ref, offset, <media>) ->
    rows (doc_id, kind='media', text, media_ref, offset, n_lines,
    log_prob).  One decode_document call per page (sequential line
    continuity inside, SURVEY.md §2.7 O9).

    media_col:
      * "lines"    — pre-extracted line images (the reference's
        -extractedLinesPath cache, LazyRawImageDocument.java:94-120);
      * "page_png" — whole-page grayscale PNG run through the full
        preprocessing chain (straighten/crop/binarize/extract/resample,
        LazyRawImageDocument.java:80-92) before decoding.

    Memory ceiling (SURVEY O14; DecoderEM.java:71-84's
    decodeBatchSize=32 analog): peak task RSS = broadcast models + ONE
    page's working set (emission-cache tensor + beam buffers),
    independent of how many page rows the task holds — each
    decode_document call's cache/buffers become garbage as soon as its
    output row is appended, so a 100x page-count (or doc-size) outlier
    costs wall-clock, not memory.  Pinned by
    tests/test_memory_ceiling.py: 4 -> 40 pages of long-line decode
    must not move peak RSS by more than half of one page's
    emission-cache bytes + interpreter slack."""
    import pandas as pd

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import time

        from ocular_spark.transcriptions import diplomatic_text

        try:  # per-partition lineage (north_rule metrics table)
            from pyspark import TaskContext

            tc = TaskContext.get()
            partition_id = tc.partitionId() if tc is not None else -1
        except Exception:  # pragma: no cover
            partition_id = -1

        bundle = bundle_bc.value if hasattr(bundle_bc, "value") else bundle_bc
        decoder = get_decoder(bundle)
        for pdf in batches:
            out_rows = []
            for doc_id, media_ref, offset, payload in zip(
                pdf["doc_id"], pdf["media_ref"], pdf["offset"], pdf[media_col]
            ):
                t_page = time.time()
                if media_col == "lines":
                    imgs = [unpack_line(raw) for raw in payload]
                else:
                    from ocular_spark.functions.png import decode_gray_png
                    from ocular_spark.preprocess import prepare_page

                    page = decode_gray_png(bytes(payload)).T.astype(np.float64)
                    imgs = prepare_page(
                        page,
                        binarize_threshold=bundle.binarize_threshold,
                        do_straighten=bundle.preprocess_straighten,
                        do_crop=bundle.preprocess_crop,
                        num_em_iters=bundle.preprocess_em_iters,
                        num_em_restarts=bundle.preprocess_em_restarts,
                    )
                decodes, log_prob = decoder.decode_document(imgs)
                text = diplomatic_text(decodes, char_strs)
                out_rows.append(
                    (
                        doc_id, "media", text, media_ref, int(offset), len(imgs),
                        float(log_prob), partition_id,
                        round(time.time() - t_page, 4),
                    )
                )
            yield pd.DataFrame(
                out_rows,
                columns=[
                    "doc_id", "kind", "text", "media_ref", "offset", "n_lines",
                    "log_prob", "partition_id", "decode_sec",
                ],
            )

    return fn


DECODED_SCHEMA = (
    "doc_id string, kind string, text string, media_ref string, "
    "offset int, n_lines int, log_prob double, "
    "partition_id int, decode_sec double"
)


class NoDocumentsToProcessError(RuntimeError):
    """main/NoDocumentsToProcessException.java — every input document
    was filtered away (e.g. the resume anti-join covered them all)."""


def transcribe(
    docs: "DataFrame",
    media: "DataFrame",
    bundle_bc,
    char_strs: List[str],
    num_partitions: Optional[int] = None,
    skip_already_transcribed: Optional["DataFrame"] = None,
    fail_if_empty: bool = False,
) -> "DataFrame":
    """The full serving pipeline; returns docs-shaped output
    (doc_id, spans) with media spans replaced by decoded text.

    skip_already_transcribed: an existing output table; docs present
    there are dropped via LEFT ANTI join (resumability filter F2,
    main/Transcribe.java:83-100).
    fail_if_empty: raise NoDocumentsToProcessError when no documents
    remain after the resume filter (F3; the reference throws rather
    than silently writing an empty output)."""
    spark = docs.sparkSession
    if skip_already_transcribed is not None:
        docs = docs.join(
            skip_already_transcribed.select("doc_id"), "doc_id", "left_anti"
        )
    if fail_if_empty and docs.limit(1).count() == 0:
        raise NoDocumentsToProcessError(
            "no documents to process (all filtered or input empty)"
        )

    exploded = docs.select(
        "doc_id", F.posexplode_outer("spans").alias("pos", "span")
    ).select(
        "doc_id",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )

    text_spans = exploded.filter(F.col("kind") == "text")
    media_spans = exploded.filter(F.col("kind") == "media").select(
        "doc_id", "media_ref", "offset"
    )

    media_col = "lines" if "lines" in media.columns else "page_png"
    joined = media_spans.join(media, "media_ref", "inner").select(
        "doc_id", "media_ref", "offset", media_col
    )

    if num_partitions is None:
        num_partitions = DECODE_PARTITION_MULTIPLIER * int(
            spark.conf.get("spark.sql.shuffle.partitions", "32")
        )
    # page-level salt: uniform page distribution regardless of per-doc
    # page-count skew (explicit, not left to AQE — cost is per page;
    # media_ref is unique per page, so exactly as uniform as a
    # (doc_id, media_ref) hash).  The 3x-cores task count is
    # deliberate: decode cost per page is seconds, so finer tasks let
    # dynamic scheduling pack the stragglers that a 1x hash
    # partitioning leaves (max balls-in-bins load ~2x mean at
    # pages≈partitions); 2-3x tasks per core is standard Spark
    # guidance for expensive skewed stages and measured ~20% faster at
    # bench scale.  Tradeoff: with a partition count different from
    # the join's, this exchange no longer elides into the media join's
    # (the payload moves through two shuffles); decode CPU dominates
    # the extra shuffle by ~100x at every scale tested, and callers
    # who want the single-shuffle plan pass num_partitions equal to
    # spark.sql.shuffle.partitions explicitly.
    salted = joined.repartition(num_partitions, F.col("media_ref"))

    decoded = salted.mapInPandas(
        decode_pages_kernel(bundle_bc, char_strs, media_col), schema=DECODED_SCHEMA
    )

    decoded_spans = decoded.select("doc_id", "kind", "text", "media_ref", "offset")
    all_spans = text_spans.unionByName(decoded_spans)

    return all_spans.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(F.struct("offset", "kind", "text", "media_ref"))
        ).alias("ordered"),
    ).select(
        "doc_id",
        F.transform(
            "ordered",
            lambda s: F.struct(
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
                s["offset"].alias("offset"),
            ),
        ).alias("spans"),
    )


def decode_metrics(
    docs: "DataFrame", media: "DataFrame", bundle_bc, char_strs: List[str],
    num_partitions: Optional[int] = None,
) -> "DataFrame":
    """Per-page decode metrics (doc_id, media_ref, offset, n_lines,
    log_prob, partition_id, decode_sec) — the per-partition
    lineage/metrics table required by the north_rule (reference
    analog: per-batch wall-clock prints, DecoderEM.java:128-129).
    partition_id comes from the task context, decode_sec is the page's
    wall-clock inside the kernel; both support straggler/lineage
    monitoring and resume audits."""
    exploded = docs.select("doc_id", F.explode("spans").alias("span")).select(
        "doc_id",
        F.col("span.kind").alias("kind"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )
    media_spans = exploded.filter(F.col("kind") == "media").select(
        "doc_id", "media_ref", "offset"
    )
    joined = media_spans.join(media, "media_ref", "inner").select(
        "doc_id", "media_ref", "offset", "lines"
    )
    spark = docs.sparkSession
    if num_partitions is None:
        num_partitions = DECODE_PARTITION_MULTIPLIER * int(
            spark.conf.get("spark.sql.shuffle.partitions", "32")
        )
    salted = joined.repartition(num_partitions, F.col("media_ref"))
    decoded = salted.mapInPandas(
        decode_pages_kernel(bundle_bc, char_strs), schema=DECODED_SCHEMA
    )
    return decoded.select(
        "doc_id", "media_ref", "offset", "n_lines", "log_prob",
        "partition_id", "decode_sec",
    )


CONFIDENCE_THRESHOLD = -65.0  # avg per-char log-prob; see decode_confidence


def decode_confidence(
    docs: "DataFrame", media: "DataFrame", bundle_bc, char_strs: List[str],
    threshold: float = CONFIDENCE_THRESHOLD,
    num_partitions: Optional[int] = None,
) -> "DataFrame":
    """Per-page decode-confidence routing (doc_id, media_ref, offset,
    n_chars, avg_lp, route): the accept/review triage every production
    OCR/extraction pipeline puts between the decoder and the sink
    (reference analog: the per-document joint log-prob Ocular prints
    after each decode, DecoderEM.java:128-129 — here turned into an
    operator).  Confidence = the Viterbi joint log-prob normalized per
    decoded character; pages below ``threshold`` route to 'review'
    (human QA / re-decode with a larger beam), the rest to 'accept'.

    The normalization matters: raw joint log-prob scales with page
    length, so a threshold on it would just route long pages; avg
    per-char log-prob is length-invariant.  The fixture's two page
    classes (clean vs word-reversed-LM mismatch) separate by >16
    per-char log-prob units around the default threshold, so routing
    is stable under float drift.  Same salted decode plan as
    decode_metrics; the routing itself is one codegen projection."""
    exploded = docs.select("doc_id", F.explode("spans").alias("span")).select(
        "doc_id",
        F.col("span.kind").alias("kind"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )
    media_spans = exploded.filter(F.col("kind") == "media").select(
        "doc_id", "media_ref", "offset"
    )
    joined = media_spans.join(media, "media_ref", "inner").select(
        "doc_id", "media_ref", "offset", "lines"
    )
    spark = docs.sparkSession
    if num_partitions is None:
        num_partitions = DECODE_PARTITION_MULTIPLIER * int(
            spark.conf.get("spark.sql.shuffle.partitions", "32")
        )
    salted = joined.repartition(num_partitions, F.col("media_ref"))
    decoded = salted.mapInPandas(
        decode_pages_kernel(bundle_bc, char_strs), schema=DECODED_SCHEMA
    )
    avg_lp = F.col("log_prob") / F.nullif(F.length("text"), F.lit(0))
    # The driver gate carries floor(avg_lp) (1-unit integer buckets),
    # not the raw double: the joint log-prob is a large float sum
    # whose low bits depend on the GEMM/summation environment (BLAS
    # thread count differs between a serial driver process and the
    # pinned-single-thread workers — observed drift ~2e-6 on this
    # fixture, whose smallest distance to a bucket boundary is 6e-3).
    # Full-precision avg_lp stays available to callers via the
    # decode_metrics log_prob column.
    return decoded.select(
        "doc_id",
        "media_ref",
        "offset",
        F.length("text").cast("long").alias("n_chars"),
        F.floor(avg_lp).cast("long").alias("conf_bucket"),
        F.when(avg_lp >= F.lit(threshold), F.lit("accept"))
        .otherwise(F.lit("review"))  # null avg_lp (empty page) reviews
        .alias("route"),
    )
