"""spark-submit entry point: line extraction only.

    spark-submit --py-files ocular_spark.zip ocular_spark/jobs/extract_lines.py \
        --media /path/media_pages.parquet --output /path/media_lines.parquet

Reference analog: main/ExtractLinesOnly.java — run the preprocessing
chain over whole-page media (page_png) and persist the pre-extracted
line images (the `-extractedLinesPath` cache,
LazyRawImageDocument.java:94-120) as the `media_lines` intermediate
table (FIXTURES.md §2), so later decode/EM jobs skip preprocessing
(stage resume = read the snapshot).
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Iterator

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def extract_lines_kernel(binarize_threshold: float, do_straighten: bool,
                         do_crop: bool, em_iters: int, em_restarts: int):
    import pandas as pd

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np

        from ocular_spark.functions.png import decode_gray_png
        from ocular_spark.pipeline import pack_line
        from ocular_spark.preprocess import prepare_page

        for pdf in batches:
            rows = []
            for media_ref, png in zip(pdf["media_ref"], pdf["page_png"]):
                page = decode_gray_png(bytes(png)).T.astype(np.float64)
                lines = prepare_page(
                    page,
                    binarize_threshold=binarize_threshold,
                    do_straighten=do_straighten,
                    do_crop=do_crop,
                    num_em_iters=em_iters,
                    num_em_restarts=em_restarts,
                )
                rows.append((media_ref, len(lines), [pack_line(l) for l in lines]))
            yield pd.DataFrame(rows, columns=["media_ref", "n_lines", "lines"])

    return fn


def extract_lines_table(media_pages, binarize_threshold=0.12, do_straighten=True,
                        do_crop=False, em_iters=5, em_restarts=100,
                        num_partitions=None):
    """(media_ref, page_png) -> (media_ref, n_lines, lines)."""
    from pyspark.sql import functions as F

    spark = media_pages.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    salted = media_pages.select("media_ref", "page_png").repartition(
        num_partitions, F.xxhash64("media_ref")
    )
    return salted.mapInPandas(
        extract_lines_kernel(binarize_threshold, do_straighten, do_crop,
                             em_iters, em_restarts),
        schema="media_ref string, n_lines int, lines array<binary>",
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--media", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--binarize-threshold", type=float, default=0.12)
    ap.add_argument("--no-straighten", action="store_true")
    ap.add_argument("--crop", action="store_true")
    ap.add_argument("--em-restarts", type=int, default=100)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("ocular-spark-extract-lines").getOrCreate()
    media = spark.read.parquet(args.media)
    out = extract_lines_table(
        media, args.binarize_threshold, not args.no_straighten, args.crop,
        em_restarts=args.em_restarts,
    )
    out.write.mode("overwrite").parquet(args.output)
    spark.stop()


if __name__ == "__main__":
    main()
