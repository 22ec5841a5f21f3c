"""spark-submit entry point: STREAMING transcription of an append-only
page table (Structured Streaming; see ocular_spark/streaming/jobs.py).

    spark-submit --py-files ocular_spark.zip \
        ocular_spark/jobs/transcribe_stream.py \
        --pages /path/pages_dir --models /path/models.pkl \
        --output /path/out_dir --checkpoint /path/ckpt_dir \
        [--continuous]

Every page file that appears under --pages is decoded exactly once;
the checkpoint directory is the resume state (kill the job, restart
with the same --checkpoint, and only new files are processed).  With
--continuous the query runs until terminated; the default processes
everything currently available and exits (availableNow trigger — the
batch-catchup mode).
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True, help="append-only parquet dir of "
                    "(doc_id, media_ref, offset, lines) page rows")
    ap.add_argument("--models", required=True, help="pickled (font_bytes, lm) pair")
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--beam-size", type=int, default=10)
    ap.add_argument("--continuous", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from ocular_spark.pipeline import ModelBundle
    from ocular_spark.streaming.jobs import transcribe_pages_stream

    spark = SparkSession.builder.appName("ocular-spark-transcribe-stream").getOrCreate()
    with open(args.models, "rb") as f:
        loaded = pickle.load(f)
    font_bytes, lm = loaded[0], loaded[1]
    bundle = ModelBundle(font_bytes, lm, beam_size=args.beam_size)
    char_strs = lm.get_character_indexer().get_objects()
    bundle_bc = spark.sparkContext.broadcast(bundle)

    q = transcribe_pages_stream(
        spark,
        args.pages,
        args.output,
        args.checkpoint,
        bundle_bc,
        char_strs,
        available_now=not args.continuous,
    )
    q.awaitTermination()
    spark.stop()


if __name__ == "__main__":
    main()
