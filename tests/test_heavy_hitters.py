"""Exact heavy hitters via Misra-Gries candidates + recount: the
structural guarantees the driver gate's value equality rests on.

- MG kernel: on adversarial (Zipf + uniform-tail) streams, the
  summary never exceeds k items, every estimate is one-sided
  (est <= freq), and the error is bounded (est >= freq - n/(k+1)) —
  the classical Misra-Gries invariant in its batched form.
- MG merge: merging per-chunk summaries preserves the bound against
  GLOBAL frequencies (Agarwal et al., Mergeable Summaries, PODS 2012),
  so candidates are a superset of the true heavy hitters — the fact
  that makes the two-pass output EXACT.
- Eviction non-vacuity: the driver-row stream has more distinct items
  than counters, so the decrement path actually runs.
- Partitioning invariance: the per-partition summaries depend on the
  data split, but the FINAL recounted output must not.
"""

import os
from collections import Counter

import pandas as pd

import __spark_entry__ as em

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF = os.path.join(TESTDATA, "sf0.001")


def _run_kernel(items, k, batch_size=97):
    batches = (
        pd.DataFrame({"item": items[i : i + batch_size]})
        for i in range(0, len(items), batch_size)
    )
    out = list(em._mg_partition_kernel(k)(batches))
    assert len(out) == 1
    return dict(zip(out[0]["item"], out[0]["est"]))


def _zipf_stream(n_kinds=60, seed_shift=0):
    # deterministic Zipf-ish stream with a uniform tail, adversarially
    # interleaved (heavy items do NOT arrive contiguously)
    items = []
    for v in range(n_kinds):
        items.extend([f"z{v}"] * (1 + (n_kinds * 40) // (v + 1)))
    # interleave deterministically: sort by a rolling key
    items.sort(key=lambda s: hash((s, len(items))) % 1009 + seed_shift)
    return items


def test_mg_kernel_invariants():
    for k in (5, 15, 40):
        items = _zipf_stream()
        freq = Counter(items)
        n = len(items)
        summary = _run_kernel(items, k)
        assert len(summary) <= k
        for item, est in summary.items():
            assert est <= freq[item], "MG never over-estimates"
            assert est >= freq[item] - n // (k + 1) - 1
        # superset guarantee: every true heavy hitter survives
        for item, c in freq.items():
            if c * (k + 1) > n:
                assert item in summary, f"heavy hitter {item} evicted"


def test_mg_merge_global_guarantee():
    k = 10
    items = _zipf_stream(n_kinds=80)
    freq = Counter(items)
    n = len(items)
    # split into uneven chunks (simulating partitions with different
    # local distributions), summarize each, then merge
    cuts = [0, n // 7, n // 2, n // 2 + 13, n]
    chunks = [items[a:b] for a, b in zip(cuts, cuts[1:])]
    assert sum(len(c) for c in chunks) == n
    summaries = []
    for c in chunks:
        summaries.extend(_run_kernel(c, k).items())
    merged = em._mg_merge(summaries, k)
    assert len(merged) <= k
    for item, c in freq.items():
        if c * (k + 1) > n:
            assert item in merged, f"global heavy hitter {item} lost in merge"
    for item, est in merged.items():
        assert est <= freq[item]


def test_driver_row_eviction_nonvacuous_and_exact(spark):
    from pyspark.sql import functions as F

    stream = em._hh_stream(spark, SF)
    n_kinds = stream.select("item").distinct().count()
    assert n_kinds > em.HH_K, "stream must force MG evictions"

    got = {
        (r.item, r.cnt, r.n_stream)
        for r in em.q_heavy_hitters(spark, SF).collect()
    }
    # brute-force exact answer via a plain corpus-wide groupBy
    counts = stream.groupBy("item").agg(F.count(F.lit(1)).alias("cnt"))
    n = stream.count()
    want = {
        (r.item, r.cnt, n)
        for r in counts.filter(F.col("cnt") * (em.HH_K + 1) > n).collect()
    }
    assert got == want
    assert got, "gate must be non-vacuous (some heavy hitter exists)"


def test_partitioning_invariance(spark):
    base = {
        (r.item, r.cnt) for r in em.q_heavy_hitters(spark, SF).collect()
    }

    # same computation with a different physical split: the MG
    # summaries differ, the exact output must not
    stream = em._hh_stream(spark, SF).repartition(7)
    parts = stream.mapInPandas(
        em._mg_partition_kernel(em.HH_K), schema="item string, est long"
    ).collect()
    merged = em._mg_merge([(r["item"], r["est"]) for r in parts], em.HH_K)
    from pyspark.sql import functions as F

    cands = sorted(merged)
    counts = (
        stream.select(
            F.when(F.col("item").isin(cands), F.col("item")).alias("g")
        )
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    n = counts.agg(F.sum("cnt")).collect()[0][0]
    redo = {
        (r.g, r.cnt)
        for r in counts.filter(
            F.col("g").isNotNull() & (F.col("cnt") * (em.HH_K + 1) > F.lit(n))
        ).collect()
    }
    assert redo == base
