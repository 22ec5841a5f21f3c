"""spark-submit entry point: EM font training.

    spark-submit --py-files ocular_spark.zip ocular_spark/jobs/train_font.py \
        --pages /path/pages.parquet --models /path/models.pkl \
        --out-dir /path/checkpoints --iters 3 [--batch-size 64] \
        [--reestimate-lm] [--resume]

Reference analog: main/TrainFont.java -> train/FontTrainer.java
(SURVEY.md §3.2).  pages.parquet: (doc_id, media_ref, lines).
Writes per-(iter, batch) checkpoints; --resume continues from the
last complete iteration (TrainingRestarter semantics).
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--models", required=True, help="pickled (font_bytes, lm) pair")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--beam-size", type=int, default=10)
    ap.add_argument("--num-partitions", type=int, default=None)
    ap.add_argument("--reestimate-lm", action="store_true")
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from ocular_spark.em import train_font
    from ocular_spark.font import Font

    spark = SparkSession.builder.appName("ocular-spark-train-font").getOrCreate()

    with open(args.models, "rb") as f:
        font_bytes, lm = pickle.load(f)
    font = Font.from_bytes(font_bytes)
    char_strs = lm.get_character_indexer().get_objects()

    pages = spark.read.parquet(args.pages)
    trained_font, trained_lm, trained_gsm, history = train_font(
        spark, pages, font, lm, char_strs,
        num_em_iters=args.iters,
        update_doc_batch_size=args.batch_size,
        beam_size=args.beam_size,
        out_dir=args.out_dir,
        reestimate_lm_too=args.reestimate_lm,
        continue_from_last_complete_iteration=args.resume,
        num_partitions=args.num_partitions,
    )
    with open(os.path.join(args.out_dir, "models_final.pkl"), "wb") as f:
        pickle.dump((trained_font.to_bytes(), trained_lm, trained_gsm), f)
    print("avg joint log prob per iteration:", history)
    spark.stop()


if __name__ == "__main__":
    main()
