"""spark-submit entry point: transcribe an interleaved-spans table.

    spark-submit --py-files ocular_spark.zip ocular_spark/jobs/transcribe.py \
        --docs /path/docs.parquet --media /path/media.parquet \
        --models /path/models.pkl --output /path/out.parquet \
        [--resume-from /path/out.parquet] [--metrics /path/metrics.parquet]

The reference analog is main/Transcribe.java (SURVEY.md §3.1).  The
output write is atomic per run (Parquet job commit; with an Iceberg
catalog configured, `--format iceberg` gives snapshot semantics) and
--resume-from anti-joins already-transcribed doc_ids
(skipAlreadyTranscribedDocs, Transcribe.java:83-100).
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True)
    ap.add_argument("--media", required=True)
    ap.add_argument("--models", required=True, help="pickled (font_bytes, lm) pair")
    ap.add_argument("--output", required=True)
    ap.add_argument("--metrics", default=None)
    ap.add_argument("--resume-from", default=None)
    ap.add_argument("--fail-if-empty", action="store_true",
                    help="raise NoDocumentsToProcess when nothing remains after the resume filter")
    ap.add_argument("--beam-size", type=int, default=10)
    ap.add_argument("--num-partitions", type=int, default=None)
    ap.add_argument("--format", default="parquet", choices=["parquet", "iceberg"])
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from ocular_spark.pipeline import ModelBundle, decode_metrics, transcribe

    spark = SparkSession.builder.appName("ocular-spark-transcribe").getOrCreate()

    with open(args.models, "rb") as f:
        font_bytes, lm = pickle.load(f)
    bundle = ModelBundle(font_bytes, lm, beam_size=args.beam_size)
    bundle_bc = spark.sparkContext.broadcast(bundle)
    char_strs = lm.get_character_indexer().get_objects()

    docs = spark.read.parquet(args.docs)
    media = spark.read.parquet(args.media)
    skip = None
    if args.resume_from:
        try:
            skip = spark.read.parquet(args.resume_from)
        except Exception:
            skip = None  # nothing transcribed yet

    out = transcribe(
        docs, media, bundle_bc, char_strs,
        num_partitions=args.num_partitions,
        skip_already_transcribed=skip,
        fail_if_empty=args.fail_if_empty,
    )
    writer = out.write.mode("append" if skip is not None else "overwrite")
    if args.format == "iceberg":
        writer.format("iceberg").save(args.output)
    else:
        writer.parquet(args.output)

    if args.metrics:
        m = decode_metrics(docs, media, bundle_bc, char_strs, args.num_partitions)
        m.write.mode("append").parquet(args.metrics)

    spark.stop()


if __name__ == "__main__":
    main()
