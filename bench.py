#!/usr/bin/env python
"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "headline_total", "value": <sum of query secs>,
   "unit": "sec", "queries": {name: sec, ...}, "sf": <sf>,
   "extras": {"decode_docs_per_sec": ..., "decode_pages_per_sec": ...}}

The decode throughput extras are the BASELINE.json target metric
(documents decoded/sec); scaling-efficiency evidence across two
parallelism levels lives in BENCH/scaling.py (writes BENCH/results.json).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_BENCH_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "48"))

# relational / training-data headline queries (from the driver contract)
RELATIONAL = [
    "pricing_summary",
    "top_orders",
    "nation_volume",
    "customers_without_orders",
    "first_orders",
    "event_hourly",
    "event_sessions",
    "char_bigrams",
    "dedup_exact",
    "minhash_bands",
    "ngram_jaccard",
    "text_stats",
    "char_entropy",
    "quality_filter",
    "token_counts",
    "embed_neighbors",
    "label_centroid_sim",
    "orders_rollup",
    "events_json",
    "token_doc_freq",
    "simhash",
    "simhash_hamming_join",
    "doc_fingerprint",
    "embed_topk",
    "embed_neardup",
    "embed_lsh_buckets",
    "embed_ivf_topk",
    "ivf_upsert",
    "lang_id",
    "lang_id_ngram",
    "html_tables",
    "html_main_content",
    "html_main_content_dom",
    "html_main_content_nested",
    "html_main_content_nested_dom",
    "strip_spans_html",
    "spans_compact",
    "layout_reading_order",
    "transcribe_confidence",
    "span_dedup",
    "extract_stream",
    "gopher_repetition",
    "pdf_ingest",
    "warc_ingest",
    "url_normalize",
    "robots_filter",
    "crawl_upsert",
    "inverted_index",
    "sentence_split",
    "bm25_topk",
    "pii_redact",
    "decontaminate",
    "training_mix",
    "embed_quantize",
    "dedup_cluster",
    "split_by_cluster",
    "split_contamination",
    "c4_line_filter",
    "pack_sequences",
    "dedup_stream",
    "embed_semdedup",
    "chunk_documents",
    "tfidf_top_terms",
    "audio_ingest",
    "video_ingest",
    "image_ingest",
    "bloom_prefilter",
    "event_hourly_stream",
    "domain_cap",
    "corpus_profile",
    "contract_audit",
    "event_sessions_custom",
    "events_asof",
    "text_normalize",
    "anchor_texts",
    "link_pagerank",
    "hll_distinct",
    "dup_substring",
    "image_phash_dedup",
    "dsir_weights",
    "ppl_buckets",
    "count_min_topk",
    "interval_join",
    "similarity_join",
    "bpe_encode",
    "cluster_sample",
    "embed_rproj",
    "skew_join",
    "shard_assign",
    "partial_agg_merge",
    "span_lang_id",
    "compaction_plan",
    "crawl_upsert_stream",
    "link_triangles",
    "hll_distinct_stream",
    "vocab_growth",
    "exact_quantile",
    "zorder_layout",
    "funnel_steps",
    "retention_cohorts",
    "group_quantile",
    "scd2_history",
    "heavy_hitters",
    "pmi_collocations",
    "robust_outliers",
    "weighted_sample",
    "group_topk",
    "ecdf_normalize",
    "pareto_front",
    "curate_pipeline",
    "ngram_novelty",
    "decayed_counts",
    "quality_logit",
    "editdist_verify",
    "snapshot_diff",
    "attrib_join_stream",
    "crawl_quota_stream",
    "event_pivot",
    "rolling_stats",
    "html_metadata",
    "cusum_drift",
    "twap",
    "zone_map_prune",
    "merkle_digest",
    "fill_forward",
    "debounce_events",
    "event_transitions",
    "sales_cube",
    "stratified_sample",
    "cooccurrence_graph",
    "survival_km",
    "debounce_stream",
    "interval_coverage",
    "fd_audit",
    "auc_eval",
    "ols_trend",
    "rrf_fuse",
    "bottomk_sketch",
    "mmr_diversify",
    "dp_histogram",
    "epoch_shuffle",
    "ab_assign_srm",
    "linkage_score",
    "calibration_bins",
    "degree_powerlaw",
    "forget_user",
    "cdc_apply",
    "encoding_advisor",
    "psi_drift",
    "position_attribution",
    "ndcg_eval",
    "basket_lift",
    "cohens_kappa",
    "golden_record",
    "k_anonymity",
    "seasonal_anomaly",
    "macro_f1",
    "vacuum_plan",
    "kcore_decompose",
    "crawl_depth",
    "skew_audit",
    "gap_backfill",
    "fk_audit",
    "l_diversity",
    "pq_quantize",
    "corr_matrix",
    "join_card_est",
    "changepoint_detect",
    "json_schema_infer",
    "ip_lpm_join",
    "slo_burn",
]


def build_spark(cpus: int, mem_gb: int = 24, container_cpus: int | None = None):
    # Pin BLAS to one thread per task BEFORE the JVM forks python
    # workers (workers inherit this env; OpenBLAS reads it at load
    # time).  Without this, K workers x 2 BLAS threads oversubscribe
    # the box at high parallelism and scaling efficiency collapses.
    os.environ["OPENBLAS_NUM_THREADS"] = "1"
    os.environ["OMP_NUM_THREADS"] = "1"
    from pyspark.sql import SparkSession

    # ParallelGC: G1 (the JVM default) degrades progressively under
    # the sustained allocation rate of string-heavy interpreted
    # projections at high thread counts (measured on the extraction
    # stage: run times 9.6s -> 44s -> 145s across repeats at
    # local[16]; ParallelGC holds 5.6-8.2s steady).  Throughput
    # collectors fit batch analytics; override via SPARK_GRAFT_GC.
    gc = os.environ.get("SPARK_GRAFT_GC", "-XX:+UseParallelGC")
    # container_cpus: emulate a CPU-limited executor container (as on a
    # real cluster, where each executor JVM sees only its cgroup quota).
    # ActiveProcessorCount sizes every CPU-count-derived JVM pool at
    # once — ParallelGC worker threads, JIT compiler threads, common
    # ForkJoinPool — which is what makes co-resident executor JVMs
    # share a box without GC-thread oversubscription.
    if container_cpus is not None:
        gc = f"{gc} -XX:ActiveProcessorCount={container_cpus}"
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ocular-spark-bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", f"{mem_gb}g")
        .config("spark.driver.extraJavaOptions", gc)
        .config("spark.executor.pyspark.memory", "2g")
        .getOrCreate()
    )


def time_decode(spark, sf_dir: str, n_docs: int):
    """Decode-pipeline throughput: derive a heavy-tailed doc set and
    run the full transcription, timing the decode stage."""
    import pyarrow.parquet as pq

    from ocular_spark.fixtures import build_models, derive_docs_and_media
    from ocular_spark.pipeline import DOCS_DDL, transcribe

    documents = pq.read_table(os.path.join(sf_dir, "documents.parquet")).to_pandas()
    docs, media = derive_docs_and_media(
        documents, n_docs=n_docs, heavy_tail=True, lines_per_page=2
    )
    bundle, char_strs = build_models(documents)
    n_pages = int(media.shape[0])

    docs_df = spark.createDataFrame(docs, schema=DOCS_DDL).cache()
    media_df = spark.createDataFrame(
        media[["media_ref", "n_lines", "lines"]]
    ).cache()
    docs_df.count(), media_df.count()  # materialize inputs outside the timer
    bundle_bc = spark.sparkContext.broadcast(bundle)

    # warm: compile the decoder on every worker with a tiny slice
    transcribe(docs_df.limit(2), media_df, bundle_bc, char_strs).count()

    dt = float("inf")
    for _ in range(2):  # best-of-2 (throttling shield, see RELATIONAL loop)
        t0 = time.time()
        out = transcribe(docs_df, media_df, bundle_bc, char_strs)
        n_out = out.count()
        dt = min(dt, time.time() - t0)
        assert n_out == n_docs, (n_out, n_docs)
    return dt, n_docs / dt, n_pages / dt


def host_speed_witness() -> dict:
    """Fixed reference workloads, so any reader of a bench record can
    tell whether the host was throttled when it ran (this box swings
    10-25x under co-tenant load).  Nominal quiet-host values:
    gemm ~0.2-0.6s, alloc ~1-10ms."""
    import numpy as np

    t0 = time.time()
    a = np.random.RandomState(0).rand(2000, 2000)
    _ = a @ a
    gemm = time.time() - t0
    t0 = time.time()
    for _ in range(10):
        _ = np.full(600_000, 7, dtype=np.int64)
    alloc = (time.time() - t0) / 10
    return {"host_gemm2000_sec": round(gemm, 3), "host_alloc600k_sec": round(alloc, 4)}


def main() -> None:
    t_start = time.time()
    witness = host_speed_witness()
    spark = build_spark(CPUS)
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    timings = {}

    decode_sec, docs_per_sec, pages_per_sec = time_decode(spark, SF_DIR, N_BENCH_DOCS)
    timings["transcribe_spans"] = round(decode_sec, 3)

    # streaming rows are dominated by fixed micro-batch/checkpoint
    # overhead, not throttle-sensitive JVM work — a second run buys no
    # jitter shielding, only wall clock; run them once
    STREAMING_ONCE = {
        "extract_stream", "dedup_stream", "event_hourly_stream",
        "event_sessions_custom", "attrib_join_stream", "crawl_quota_stream",
    }

    for name in RELATIONAL:
        # best-of-2 with the first run doubling as the warm-up: this
        # host's CPU/memory bandwidth jitters up to 10-25x under
        # co-tenant load (see BASELINE.md §6); min-of-2 shields the
        # headline from transient throttling windows at the same total
        # execution count as a warm+timed protocol
        best = float("inf")
        for _ in range(1 if name in STREAMING_ONCE else 2):
            t0 = time.time()
            n = qs[name](spark, SF_DIR).count()
            best = min(best, time.time() - t0)
            assert n >= 0
        timings[name] = round(best, 3)

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    result = {
        "metric": "headline_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "extras": {
            "decode_docs_per_sec": round(docs_per_sec, 3),
            "decode_pages_per_sec": round(pages_per_sec, 3),
            "bench_docs": N_BENCH_DOCS,
            "cpus": CPUS,
            "wall_total_sec": round(time.time() - t_start, 1),
            **witness,
        },
    }
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
