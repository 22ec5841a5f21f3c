"""spark-submit entry point: main-content extraction over an
interleaved text + media spans table, resumable from its own output
snapshot with per-partition lineage metrics.

    spark-submit --py-files ocular_spark.zip ocular_spark/jobs/extract_content.py \
        --docs /path/docs.parquet --output /path/extracted.parquet \
        [--resume-from /path/extracted.parquet] [--metrics /path/metrics.parquet] \
        [--engine expr|dom] [--num-partitions N] [--format parquet|iceberg]

This is the operational wrapper for the north-rule extraction
pipeline (the same semantics the driver gates as `strip_spans_html` /
`html_main_content{_nested,}`): each document's text spans are
rewritten to their extracted main content, media spans pass through
untouched, and (kind, text, media_ref, offset) span order is
preserved exactly.

Scale/resume design (10^12-doc deployment):
- `--engine expr` (default, the 100 TB hot path) is ONE map-side JVM
  projection — `transform()` over the spans array with the block
  heuristic inlined as a scalar SQL expression (higher-order array
  exprs are interpreted, not codegen'd, but stay JVM-side); no
  shuffle, no Python.  `--engine dom` routes pages through the Arrow mapInPandas
  html.parser kernel (same heuristic, structural nesting) — the
  fallback for pathological HTML the expression grammar rejects.
- The output snapshot IS the checkpoint: alongside (doc_id, spans)
  every row carries its input-partition lineage (part_id) and per-doc
  size stats (n_spans, n_text_spans, chars_in, chars_out) — a few
  int64 columns, negligible next to the spans payload.  `--resume-from`
  anti-joins doc_id against a prior snapshot (column-pruned scan of
  the one string column; sort-merge anti, NOT broadcast — at resume
  scale the done-set is as large as the input), and `--output` equal
  to the resume path appends, so snapshot = union(done, new).
- `--metrics` writes the per-partition lineage table
  (part_id, n_docs, n_spans, n_text_spans, chars_in, chars_out)
  aggregated from the snapshot's stat columns — a column-pruned
  re-read of int columns only, never of the spans payload.  Written
  with overwrite: it always reflects the full snapshot at job end.

Reference analog: the extraction counterpart of main/Transcribe.java's
resumable run loop (Transcribe.java:83-100 skipAlreadyTranscribedDocs);
the content heuristic itself is functions/html.py (jusText/boilerpipe
family, public literature).
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Iterator

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

SPAN_FIELDS = "'kind', sp.kind, 'text', {text}, 'media_ref', sp.media_ref, 'offset', sp.offset"

OUT_SCHEMA = (
    "doc_id string, part_id int, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, "
    "n_spans int, n_text_spans int, chars_in bigint, chars_out bigint"
)


def _chars_expr(col: str) -> str:
    return (
        f"aggregate({col}, cast(0 as bigint),"
        " (acc, sp) -> acc + coalesce(length(sp.text), 0))"
    )


def stripped_spans_expr():
    """The span-rewrite Column: text spans -> extracted main content,
    media spans untouched, (kind, text, media_ref, offset) preserved.
    Shared by the batch expr engine and the streaming job."""
    from pyspark.sql import functions as F

    from ocular_spark.functions import html as H

    return F.expr(
        "transform(spans, sp -> named_struct("
        + SPAN_FIELDS.format(
            text="case when sp.kind = 'text' then "
            + H.main_text_expr_spark("sp.text")
            + " else sp.text end"
        )
        + "))"
    )


def extract_expr(df):
    """Expression engine: one map-side JVM projection."""
    from pyspark.sql import functions as F

    stripped = stripped_spans_expr()
    return df.select(
        "doc_id",
        F.spark_partition_id().alias("part_id"),
        stripped.alias("spans"),
        F.expr("size(spans)").alias("n_spans"),
        F.expr("size(filter(spans, sp -> sp.kind = 'text'))").alias("n_text_spans"),
        F.expr(_chars_expr("spans")).alias("chars_in"),
    ).withColumn(
        "chars_out", F.expr(_chars_expr("spans"))
    ).select(
        "doc_id", "part_id", "spans", "n_spans", "n_text_spans",
        "chars_in", "chars_out",
    )


def extract_dom(df):
    """DOM engine: Arrow mapInPandas over the html.parser kernel.
    part_id is stamped BEFORE the map (spark_partition_id is a
    narrow projection; mapInPandas preserves partitioning)."""
    from pyspark.sql import functions as F

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from ocular_spark.functions.html import extract_main_content_dom

        for pdf in batches:
            out_spans, n_spans, n_text, chars_in, chars_out = [], [], [], [], []
            for spans in pdf["spans"]:
                new, ci, co, nt = [], 0, 0, 0
                for sp in spans:
                    txt = sp["text"]
                    ci += len(txt) if txt is not None else 0
                    if sp["kind"] == "text":
                        nt += 1
                        txt = extract_main_content_dom(txt or "")[2]
                    co += len(txt) if txt is not None else 0
                    new.append({
                        "kind": sp["kind"], "text": txt,
                        "media_ref": sp["media_ref"], "offset": sp["offset"],
                    })
                out_spans.append(new)
                n_spans.append(len(new))
                n_text.append(nt)
                chars_in.append(ci)
                chars_out.append(co)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"], "part_id": pdf["part_id"],
                "spans": out_spans, "n_spans": n_spans,
                "n_text_spans": n_text, "chars_in": chars_in,
                "chars_out": chars_out,
            })

    return (
        df.select("doc_id", F.spark_partition_id().alias("part_id"), "spans")
        .mapInPandas(fn, schema=OUT_SCHEMA)
    )


def run(spark, args) -> None:
    from pyspark.sql import functions as F

    from ocular_spark.pipeline import NoDocumentsToProcessError

    # input_hint contract: doc_id is a string key (cast normalizes
    # integer-keyed test tables to the production shape)
    docs = spark.read.parquet(args.docs).select(
        F.col("doc_id").cast("string").alias("doc_id"), "spans"
    )
    skip = None
    if args.resume_from:
        try:
            reader = (spark.read.format("iceberg")
                      if args.format == "iceberg" else spark.read)
            skip = reader.load(args.resume_from).select("doc_id")
        except Exception:
            skip = None  # nothing extracted yet
    if skip is not None:
        docs = docs.join(skip, "doc_id", "left_anti")
    if args.fail_if_empty and len(docs.take(1)) == 0:
        raise NoDocumentsToProcessError(
            "every input document is already extracted (resume filter)"
        )
    if args.num_partitions:
        docs = docs.repartition(args.num_partitions, "doc_id")

    out = extract_dom(docs) if args.engine == "dom" else extract_expr(docs)

    writer = out.write.mode("append" if skip is not None else "overwrite")
    if args.format == "iceberg":
        writer.format("iceberg").save(args.output)
    else:
        writer.parquet(args.output)

    if args.metrics:
        reader = (spark.read.format("iceberg")
                  if args.format == "iceberg" else spark.read)
        snap = reader.load(args.output).select(
            "part_id", "n_spans", "n_text_spans", "chars_in", "chars_out"
        )
        m = snap.groupBy("part_id").agg(
            F.count("*").alias("n_docs"),
            F.sum("n_spans").alias("n_spans"),
            F.sum("n_text_spans").alias("n_text_spans"),
            F.sum("chars_in").alias("chars_in"),
            F.sum("chars_out").alias("chars_out"),
        )
        m.write.mode("overwrite").parquet(args.metrics)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True,
                    help="interleaved spans table: (doc_id, spans array<struct>)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--metrics", default=None)
    ap.add_argument("--resume-from", default=None)
    ap.add_argument("--fail-if-empty", action="store_true")
    ap.add_argument("--engine", default="expr", choices=["expr", "dom"])
    ap.add_argument("--num-partitions", type=int, default=None)
    ap.add_argument("--format", default="parquet", choices=["parquet", "iceberg"])
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("ocular-spark-extract-content").getOrCreate()
    run(spark, args)
    spark.stop()


if __name__ == "__main__":
    main()
