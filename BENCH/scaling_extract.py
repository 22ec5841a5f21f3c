#!/usr/bin/env python
"""Two-parallelism-level scaling evidence for the EXTRACTION stage
(the north_rule's named pipeline), companion to BENCH/scaling.py's
decode-stage record.

Stage measured: parquet scan of an interleaved (doc_id, spans) table
-> extract_content's expr engine (one map-side JVM projection, the
100 TB hot path) -> noop sink (materializes every output column,
costs nothing to write).  Input is synthesized ONCE per process run
into a temp parquet (deterministic: sf documents text wrapped in the
flat-boilerplate + adversarial-nested page fixtures, replicated with
distinct doc_ids), then both parallelism levels read the SAME files.

    throughput(K) = docs_extracted / wall_seconds
    efficiency    = throughput(4N) / (4 * throughput(N))

Writes BENCH/results_extract.json.

Usage: python BENCH/scaling_extract.py [N] [R]   (default N=4, R=3)
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICATE = int(os.environ.get("SPARK_GRAFT_EXTRACT_REPLICATE", "48"))


def synthesize(spark, out_path: str) -> int:
    """Interleaved table: every sf document becomes REPLICATE docs of
    [flat boilerplate page, media span, nested adversarial page]."""
    from pyspark.sql import functions as F

    from ocular_spark.functions import html as H

    d = (
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .select(F.col("doc_id").cast("string").alias("base_id"), "text")
        .select(
            F.expr(f"explode(sequence(1, {REPLICATE}))").alias("rep"),
            "base_id", "text",
        )
        .select(
            F.concat_ws("-", "base_id", "rep").alias("doc_id"), "text"
        )
    )
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
    df = d.select("doc_id", spans.alias("spans")).repartition(128, "doc_id")
    df.write.mode("overwrite").parquet(out_path)
    return spark.read.parquet(out_path).count()


def run_level(cpus: int, repeats: int, docs_path: str, n_docs: int,
              discard: int = 2):
    from pyspark.sql import functions as F

    from bench import build_spark
    from ocular_spark.jobs.extract_content import extract_expr

    spark = build_spark(cpus)
    try:
        # no repartition: the stage is scan -> project -> sink with no
        # exchange (128 uniform input files give every level >= 8
        # splits/core; maxPartitionBytes subdivides further if needed)
        src = spark.read.parquet(docs_path)
        chars_in = None
        for i in range(1 + discard + repeats):
            t0 = time.time()
            out = extract_expr(src)
            out.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            if i == 0:
                # one verification pass: totals match expectations
                agg = out.agg(
                    F.count("*").alias("n"),
                    F.sum("chars_in").alias("ci"),
                    F.sum("chars_out").alias("co"),
                ).collect()[0]
                assert agg["n"] == n_docs, (agg["n"], n_docs)
                assert 0 < agg["co"] < agg["ci"]
                chars_in = int(agg["ci"])
                times = []
            elif i > discard:
                times.append(dt)
        med = statistics.median(times)
        return {
            "cpus": cpus,
            "docs": n_docs,
            "chars_in": chars_in,
            "times_sec": [round(t, 2) for t in times],
            "median_sec": round(med, 2),
            "docs_per_sec": round(n_docs / med, 1),
            "mb_html_per_sec": round(chars_in / med / 1e6, 1),
        }
    finally:
        spark.stop()


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from bench import build_spark

    tmp = tempfile.mkdtemp(prefix="extract_scaling_")
    docs_path = os.path.join(tmp, "docs.parquet")
    try:
        spark = build_spark(8)
        try:
            n_docs = synthesize(spark, docs_path)
        finally:
            spark.stop()

        low = run_level(n, repeats, docs_path, n_docs)
        high = run_level(4 * n, repeats, docs_path, n_docs)
        eff = high["docs_per_sec"] / (4.0 * low["docs_per_sec"])

        sys.path.insert(0, os.path.join(REPO, "BENCH"))
        from scaling import cpu_control

        control = cpu_control(n, 4 * n)
        result = {
            "sf_dir": SF_DIR,
            "stage": "extract_content expr engine (parquet scan -> "
                     "span-array projection -> noop sink)",
            "low": low,
            "high": high,
            "scaling_efficiency": round(eff, 3),
            "hardware_control": control,
            "spark_layer_efficiency": round(
                eff / control["hardware_efficiency"], 3)
            if control["hardware_efficiency"] > 0 else None,
            "target": 0.8,
            "pass": eff >= 0.8,
        }
        out_path = os.path.join(REPO, "BENCH", "results_extract.json")
        with open(out_path, "w") as f:
            json.dump(result, f, indent=2)
        print(json.dumps(result))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
