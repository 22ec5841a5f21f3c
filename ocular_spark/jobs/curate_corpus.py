"""spark-submit entry point: the END-TO-END training-corpus curation
chain — the composition the individual driver-gated operators exist
for, as one resumable job:

    quality gate (Gopher rules) -> exact dedup (digest survivor)
    -> PII redaction -> benchmark decontamination (13-gram shingles)
    -> training-mix selection (per-language rates + weights)
    -> sequence packing (deterministic concat-and-chunk layout)

    spark-submit --py-files ocular_spark.zip ocular_spark/jobs/curate_corpus.py \
        --docs /path/documents.parquet --output /path/curated.parquet \
        [--manifest /path/manifest.parquet] [--resume-from /path/curated.parquet] \
        [--benchmark "sentence one" --benchmark "sentence two"]

Design:
- Every stage is the SAME expression shape its driver-gated query
  pins (imported from the query library, not re-implemented): the
  chain cannot drift from the gated semantics.
- One manifest row per stage (stage, n_in, n_out) — the lineage a
  curation run is audited by.  Counts cost one action per stage;
  at 10^12 docs you sample or use accumulators, documented here.
- Stage order matters and is fixed: dedup before PII (redaction must
  not split exact-dup groups), decontamination after PII (benchmark
  text is matched against what will actually be trained on), packing
  last (layout is a pure function of the FINAL survivor set).
- Resume: --resume-from anti-joins doc_id against a prior snapshot
  (sort-merge, not broadcast — the done-set is output-sized), and
  --output equal to the resume path appends.  NOTE the packing caveat:
  appended docs pack into sequences AFTER the prior snapshot's (their
  shard prefix sums restart at 0 with seq ids offset by a resume
  epoch column), so a resumed run never rewrites existing layout —
  exactly-once at the cost of per-epoch packing boundaries.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from pyspark.sql import DataFrame, functions as F


def _lib():
    """The driver-gated query library (lazy: jobs -> entry is the only
    dependency direction; entry never imports this module)."""
    import __spark_entry__ as entry

    return entry


def quality_stage(d: DataFrame) -> DataFrame:
    """Gopher keep-predicate, identical to q_quality_filter's gate."""
    e = _lib()
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    mwl = F.round(
        F.aggregate(toks, F.lit(0), lambda a, w: a + F.length(w)) / n, 4
    )
    stop_hits = F.size(
        F.array_intersect(toks, F.array(*[F.lit(s) for s in e.QF_STOPWORDS]))
    )
    alpha = F.round(
        F.size(F.filter(toks, lambda t: t.rlike("^[a-zA-Z]+$"))) / n, 4
    )
    keep = (
        (n >= e.QF_MIN_WORDS)
        & (n <= e.QF_MAX_WORDS)
        & (mwl >= e.QF_MIN_MWL)
        & (mwl <= e.QF_MAX_MWL)
        & (stop_hits >= e.QF_MIN_STOP_HITS)
        & (alpha >= e.QF_MIN_ALPHA_FRAC)
    )
    return d.filter(keep)


def dedup_stage(d: DataFrame) -> DataFrame:
    """Exact dedup, min-doc_id survivor (q_dedup_exact's grouping).

    r6: min-over-digest window instead of groupBy + join-back — the
    self-join evaluated the whole upstream stage chain TWICE (once
    per join side); the window shuffles the rows by digest once and
    keeps each row iff its doc_id equals its group minimum.  doc_ids
    are unique (one row per doc), so a doc_id is the min of some
    digest group exactly when it is the min of its OWN group — the
    survivor set is identical to the join formulation's."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(F.md5("text"))
    return (
        d.withColumn("_min_id", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("_min_id"))
        .drop("_min_id")
    )


def pii_stage(d: DataFrame) -> DataFrame:
    """q_pii_redact's chained replacement over the real text column."""
    e = _lib()
    email, phone, ip = (
        F.lit(p) for p in (e.PII_EMAIL_RE, e.PII_PHONE_RE, e.PII_IP_RE)
    )
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), email, F.lit("<EMAIL>")),
            phone, F.lit("<PHONE>")),
        ip, F.lit("<IP>"))
    return d.withColumn("text", clean)


def decontaminate_stage(d: DataFrame, benchmark_texts: list) -> DataFrame:
    """Drop docs sharing ANY 13-word shingle with the benchmark set
    (q_decontaminate's shingle unit, broadcast semi-join shape)."""
    e = _lib()
    spark = d.sparkSession
    bench = spark.createDataFrame(
        [(t,) for t in benchmark_texts], "text string"
    )

    def shingles(col: str) -> F.Column:
        # CASE guard, not greatest(.., 0): sequence(1, 0) is DESCENDING
        # in Spark ([1, 0]) and slice(arr, 0, n) throws under ANSI — a
        # sub-13-word doc would crash the stage (the chain's quality
        # gate happens to drop them first, but the stage must stand
        # alone; q_decontaminate uses the same guard)
        return F.expr(
            f"array_distinct(CASE WHEN size(split({col}, ' ')) >= {e.DECON_N}"
            f" THEN transform("
            f"  sequence(1, size(split({col}, ' ')) - {e.DECON_N - 1}),"
            f"  i -> xxhash64(array_join(slice(split({col}, ' '), i, {e.DECON_N}), ' ')))"
            f" ELSE cast(array() as array<bigint>) END)"
        )

    bset = bench.select(F.explode(shingles("text")).alias("h")).distinct()
    # r6 measurement note (guide §1): a literal-array
    # array_intersect(shingles, bset) == empty FILTER variant was
    # prototyped to remove this stage's self-join fork and REVERTED —
    # noop isolation showed it 4x SLOWER (10.0 s vs 2.5 s at sf0.1):
    # the higher-order shingle fold evaluates far worse inside a
    # filter predicate than on the explode path.  The explode +
    # broadcast semi-join + anti-join shape stays.
    hits = (
        d.select("doc_id", F.explode_outer(shingles("text")).alias("h"))
        .join(F.broadcast(bset), "h")
        .select("doc_id")
        .distinct()
    )
    return d.join(hits, "doc_id", "left_anti")


def mix_stage(d: DataFrame) -> DataFrame:
    """q_training_mix's reproducible hash-mod selection + weight."""
    e = _lib()
    rate = F.expr(e._MIX_CASE)
    keep = F.expr(e._MIX_HASH) < rate
    return d.filter(keep).withColumn(
        "weight", F.round(F.lit(100.0) / rate, 4)
    )


def pack_stage(d: DataFrame, epoch: int) -> DataFrame:
    """q_pack_sequences' placement over the survivor set; `epoch`
    namespaces a resumed run's sequences away from prior layout."""
    from pyspark.sql.window import Window

    e = _lib()
    t = d.withColumn("shard", F.expr(e._PACK_SHARD)).withColumn(
        "n_tokens", F.size(F.split("text", " ")).cast("long")
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
        *d.columns,
        "shard",
        "n_tokens",
        F.lit(epoch).alias("pack_epoch"),
        F.floor(F.col("cum_before") / e.PACK_SEQLEN).alias("seq_id"),
        (F.col("cum_before") % e.PACK_SEQLEN).alias("seq_offset"),
    )


def run(spark, args) -> dict:
    docs = spark.read.parquet(args.docs)
    epoch = 0
    if args.resume_from and os.path.exists(args.resume_from):
        done = spark.read.parquet(args.resume_from)
        epoch = done.agg(F.max("pack_epoch")).collect()[0][0] + 1
        docs = docs.join(
            done.select("doc_id").distinct(), "doc_id", "left_anti"
        )
    manifest = []
    cur = docs
    n_prev = cur.count()
    for name, fn in [
        ("quality", quality_stage),
        ("dedup_exact", dedup_stage),
        ("pii_redact", pii_stage),
        ("decontaminate",
         lambda x: decontaminate_stage(x, args.benchmark)),
        ("training_mix", mix_stage),
    ]:
        cur = fn(cur)
        n_now = cur.count()
        manifest.append((name, n_prev, n_now))
        n_prev = n_now
    out = pack_stage(cur, epoch)
    mode = "append" if args.resume_from == args.output else "overwrite"
    out.write.mode(mode).parquet(args.output)
    if args.manifest:
        spark.createDataFrame(
            manifest, "stage string, n_in long, n_out long"
        ).write.mode("overwrite").parquet(args.manifest)
    return {"stages": manifest, "epoch": epoch}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--manifest", default=None)
    ap.add_argument("--resume-from", default=None)
    ap.add_argument("--benchmark", action="append",
                    default=None,
                    help="benchmark sentence(s) to decontaminate against")
    args = ap.parse_args()
    if args.benchmark is None:
        from __spark_entry__ import DECON_CANON, DECON_CANON2

        args.benchmark = [DECON_CANON, DECON_CANON2]

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("ocular-curate-corpus").getOrCreate()
    res = run(spark, args)
    print(res)
    spark.stop()


if __name__ == "__main__":
    main()
