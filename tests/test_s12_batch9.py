"""Session-12 batch-9 laws: BFS depth replay vs an independent
Python BFS, skew-audit entropy algebra + replay, gap-backfill
completeness/minimality (the plan exactly covers the missing hours)."""
import math
import os
from collections import defaultdict, deque

import pandas as pd

import __spark_entry__ as em

SF01 = "/root/testdata/sf0.01"


def test_crawl_depth_replay(spark):
    out = em.q_crawl_depth(spark, SF01).toPandas()
    # rebuild the directed edge list through the SAME link extractor
    from ocular_spark.functions import html as H
    from pyspark.sql import functions as F

    d = spark.read.parquet(os.path.join(SF01, "documents.parquet"))
    wrapped = d.select("doc_id", F.expr(H.wrap_links_spark()).alias("html"))
    edges = (
        wrapped.select(
            F.col("doc_id").alias("src"),
            F.explode(F.expr(H.doc_links_expr("html"))).alias("dd"),
        )
        .select("src", F.col("dd").cast("long").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .toPandas()
    )
    adj = defaultdict(list)
    for _, r in edges.iterrows():
        adj[int(r["src"])].append(int(r["dst"]))
    dist = {i: 0 for i in range(em.CRAWL_SEEDS)}
    q = deque(dist)
    while q:
        v = q.popleft()
        for u in adj[v]:
            if u not in dist:
                dist[u] = dist[v] + 1
                q.append(u)
    got = {int(r["node"]): int(r["depth"]) for _, r in out.iterrows()}
    assert got == dist
    # the fixture cascade is deep (8 BFS levels) and total
    assert out["depth"].max() >= 7
    assert len(out) == 500


def test_skew_audit_algebra(spark):
    out = em.q_skew_audit(spark, SF01).toPandas().set_index("col")
    li = pd.read_parquet(os.path.join(SF01, "lineitem.parquet"))
    assert set(out.index) == set(em.SKEW_AUDIT_COLS)
    for c in em.SKEW_AUDIT_COLS:
        vc = li[c].value_counts()
        n, k, mx = len(li), len(vc), int(vc.max())
        r = out.loc[c]
        assert (int(r["n_rows"]), int(r["n_keys"]), int(r["max_cnt"])) == (
            n, k, mx,
        )
        sum_clnq = sum(
            int(cnt) * round(math.log(cnt) * em.SKEW_LN_SCALE)
            for cnt in vc
        )
        assert int(r["sum_clnq"]) == sum_clnq
        ent = (
            n * round(math.log(n) * em.SKEW_LN_SCALE) - sum_clnq
        ) / (n * em.SKEW_LN_SCALE)
        assert abs(r["entropy"] - ent) < 2e-9
        # entropy bounded by ln(n_keys); shares sum to 1 implicitly
        assert 0.0 <= r["entropy"] <= math.log(k) + 1e-6
    # the audit discriminates: orderkey (many small groups) carries
    # more entropy than suppkey (few big groups)
    assert out.loc["l_orderkey", "entropy"] > out.loc["l_suppkey", "entropy"]
    assert out.loc["l_suppkey", "top1_share"] > out.loc["l_orderkey", "top1_share"]


def test_gap_backfill_covers_exactly(spark):
    out = em.q_gap_backfill(spark, SF01).toPandas()
    ev = pd.read_parquet(os.path.join(SF01, "events.parquet"))
    ev = ev.assign(h=ev["ts"].dt.floor("h"))
    plan_hours = set()
    for _, r in out.iterrows():
        hrs = pd.date_range(r["gap_start"], r["gap_end"], freq="h")
        assert len(hrs) == int(r["n_hours"])  # interval arithmetic
        for h in hrs:
            key = (r["event_type"], h)
            assert key not in plan_hours  # intervals never overlap
            plan_hours.add(key)
    # completeness + minimality: the plan is EXACTLY the missing set
    want = set()
    for et, grp in ev.groupby("event_type"):
        obs = set(grp["h"])
        for h in pd.date_range(min(obs), max(obs), freq="h"):
            if h not in obs:
                want.add((et, h))
    assert plan_hours == want
    # islands actually merge: some interval spans >= 2 hours
    assert (out["n_hours"] >= 2).any()
    # maximality: every interval is flanked by observed hours (it
    # cannot be extended) — gap_start-1h and gap_end+1h are observed
    for et, grp in ev.groupby("event_type"):
        obs = set(grp["h"])
        for _, r in out[out["event_type"] == et].iterrows():
            assert pd.Timestamp(r["gap_start"]) - pd.Timedelta(hours=1) in obs
            assert pd.Timestamp(r["gap_end"]) + pd.Timedelta(hours=1) in obs
