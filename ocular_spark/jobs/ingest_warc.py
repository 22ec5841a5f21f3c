"""spark-submit entry point: WARC landing zone -> interleaved
text + media spans table (the input_hint shape), resumable.

    spark-submit --py-files ocular_spark.zip ocular_spark/jobs/ingest_warc.py \
        --warcs /landing/*.warc.gz --output /corpus/docs.parquet \
        [--resume-from /corpus/docs.parquet] [--metrics /path/metrics.parquet] \
        [--num-partitions N] [--fail-if-empty]

This is the FRONT of the north-rule pipeline: Common Crawl-style
.warc.gz containers become rows of the interleaved documents table
(doc_id:string, spans:array<struct<kind,text,media_ref,offset>>) that
jobs/extract_content.py, jobs/transcribe.py and the dedup/curation
stages consume.  Each text/html response record becomes one document
keyed by its target URI; its body is segmented at every <img> tag:
the HTML fragments become ordered ``text`` spans and each image's src
becomes a ``media`` span holding the reference (binary payloads stay
in the archive / object store — the table carries refs, per the
reference's lazy-image-loading seam, data/LazyRawImageLoader.java).

Scale/resume design (10^12-doc deployment):
- Files arrive via ``binaryFile`` (object-store listing scales by
  prefix sharding); ONE WARC parses whole inside its task — the
  Common Crawl unit (~1 GB gz) fits task memory as a stream; the
  gzip-member split / record parse is sources/warc.py, Arrow-batched.
- Span segmentation is a pure JVM projection over the parsed rows
  (regexp_extract_all + split + an interleave/transform chain):
  records re-expand as documents and no body string ever shuffles —
  the only exchange in the whole job is the optional resume anti-join
  and the explicit --num-partitions output rebalance.
- ``--resume-from`` anti-joins doc_id against the prior snapshot
  (sort-merge, not broadcast: the done-set is corpus-sized at resume
  scale) and appends, so snapshot = union(done, new) — same
  checkpoint contract as extract_content.py.
- ``--metrics`` rolls (src_file, n_docs, n_spans, n_media) from a
  column-pruned re-read of the snapshot's int/lineage columns.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

IMG_TAG = r'(?i)<img[^>]*src="([^"]*)"[^>]*>'
IMG_SPLIT = r"(?i)<img[^>]*>"

OUT_SCHEMA = (
    "doc_id string, src_file string, rec_idx long, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, "
    "n_spans int, n_media int"
)


def parse_responses(files_df):
    """(path, content) binary rows -> one row per text/html response:
    (src_file, rec_idx, url, body).  Arrow-batched; one file parses
    whole per task (see module docstring)."""
    import pandas as pd

    from ocular_spark.sources.warc import parse_warc, split_http

    def kernel(batches):
        for b in batches:
            rows = []
            for path, blob in zip(b["path"], b["content"]):
                for i, (rec_type, headers, payload) in enumerate(
                    parse_warc(bytes(blob))
                ):
                    if rec_type != "response":
                        continue
                    status, hh, body = split_http(payload)
                    if status != 200:
                        continue
                    mime = (hh.get("content-type") or "").split(";")[0]
                    if mime != "text/html":
                        continue
                    rows.append(
                        (path, i, headers.get("warc-target-uri"),
                         body.decode("utf-8", errors="replace"))
                    )
            yield pd.DataFrame(
                rows, columns=["src_file", "rec_idx", "url", "body"]
            )

    return files_df.mapInPandas(
        kernel, schema="src_file string, rec_idx long, url string, body string"
    )


def interleave_spans_expr(body_col: str = "body"):
    """The segmentation Column: split the HTML at every <img> tag into
    interleaved text/media spans with dense offsets.  Pure JVM array
    expression — fragment k and image k are zipped as (text, media)
    pairs, flattened in order, the missing trailing media slot
    dropped, and offsets re-stamped by position."""
    from pyspark.sql import functions as F

    return F.expr(
        f"""
        transform(
          filter(
            flatten(transform(
              split({body_col}, '{IMG_SPLIT}'),
              (frag, i) -> array(
                named_struct('kind', 'text', 'text', frag,
                             'media_ref', cast(null as string),
                             'offset', 0),
                if(i < size(regexp_extract_all({body_col}, '{IMG_TAG}', 1)),
                   named_struct('kind', 'media',
                                'text', cast(null as string),
                                'media_ref', element_at(
                                    regexp_extract_all({body_col},
                                                       '{IMG_TAG}', 1),
                                    i + 1),
                                'offset', 0),
                   cast(null as struct<kind:string,text:string,
                                       media_ref:string,offset:int>))
              )
            )),
            sp -> sp is not null
          ),
          (sp, i) -> named_struct('kind', sp.kind, 'text', sp.text,
                                  'media_ref', sp.media_ref, 'offset', i)
        )
        """
    )


def build_docs(responses):
    from pyspark.sql import functions as F

    spans = interleave_spans_expr("body")
    return responses.select(
        F.col("url").alias("doc_id"), "src_file", "rec_idx",
        spans.alias("spans"),
    ).select(
        "doc_id", "src_file", "rec_idx", "spans",
        F.expr("size(spans)").alias("n_spans"),
        F.expr("size(filter(spans, sp -> sp.kind = 'media'))").alias(
            "n_media"
        ),
    )


def run(spark, args) -> None:
    from pyspark.sql import functions as F

    from ocular_spark.pipeline import NoDocumentsToProcessError

    files = spark.read.format("binaryFile").load(args.warcs).select(
        "path", "content"
    )
    docs = build_docs(parse_responses(files))
    skip = None
    if args.resume_from:
        try:
            skip = spark.read.parquet(args.resume_from).select("doc_id")
        except Exception:
            skip = None  # nothing ingested yet
    if skip is not None:
        docs = docs.join(skip, "doc_id", "left_anti")
    if args.fail_if_empty and len(docs.take(1)) == 0:
        raise NoDocumentsToProcessError(
            "every response in the landing zone is already ingested"
        )
    if args.num_partitions:
        docs = docs.repartition(args.num_partitions, "doc_id")

    docs.write.mode("append" if skip is not None else "overwrite").parquet(
        args.output
    )

    if args.metrics:
        snap = spark.read.parquet(args.output).select(
            "src_file", "n_spans", "n_media"
        )
        m = snap.groupBy("src_file").agg(
            F.count("*").alias("n_docs"),
            F.sum("n_spans").alias("n_spans"),
            F.sum("n_media").alias("n_media"),
        )
        m.write.mode("overwrite").parquet(args.metrics)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--warcs", required=True,
                    help="landing-zone path/glob of .warc(.gz) files")
    ap.add_argument("--output", required=True)
    ap.add_argument("--metrics", default=None)
    ap.add_argument("--resume-from", default=None)
    ap.add_argument("--fail-if-empty", action="store_true")
    ap.add_argument("--num-partitions", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("ocular-spark-ingest-warc").getOrCreate()
    run(spark, args)


if __name__ == "__main__":
    main()
