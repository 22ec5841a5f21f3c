"""Web-graph operators (anchor extraction + fixed-point PageRank):
naive-Python reference on a hand graph, per-page anchor census, and
plan shape.  The driver gate hashes both rows against DuckDB at
sf0.01 (the PageRank oracle is a genuinely different formulation:
three unrolled SQL CTE iterations vs the DataFrame loop)."""

import pytest

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from __spark_entry__ import PR_D_DEN, PR_D_NUM, PR_SCALE, pagerank_ranks


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _naive_pagerank(edge_list, iters):
    """Independent reference: dict-based, same fixed-point rules
    (per-edge floor division, dangling mass dropped)."""
    edges = sorted(set(edge_list))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    n = len(nodes)
    base = (PR_SCALE * (PR_D_DEN - PR_D_NUM)) // (PR_D_DEN * n)
    rank = {v: PR_SCALE // n for v in nodes}
    for _ in range(iters):
        nxt = {v: base for v in nodes}
        for s, d in edges:
            nxt[d] += (rank[s] * PR_D_NUM) // (PR_D_DEN * outdeg[s])
        rank = nxt
    return rank


# hand graph: hub (1), mutual pair (1<->2), dangling sink (3),
# self-loop (4), isolated-source-only node 5, duplicate edge
HAND_EDGES = [(1, 2), (2, 1), (1, 3), (4, 4), (5, 1), (5, 3), (1, 2)]


@pytest.mark.parametrize("iters", [1, 3])
def test_pagerank_matches_naive_reference(spark, iters):
    edges = spark.createDataFrame(HAND_EDGES, "src long, dst long")
    got = {
        r["node"]: r["rank"]
        for r in pagerank_ranks(edges, iters=iters).collect()
    }
    assert got == _naive_pagerank(HAND_EDGES, iters)


def test_pagerank_mass_is_bounded(spark):
    """Total rank never exceeds the initial mass (dangling + floor
    losses only shrink it) and every rank >= base."""
    edges = spark.createDataFrame(HAND_EDGES, "src long, dst long")
    ranks = [r["rank"] for r in pagerank_ranks(edges, iters=3).collect()]
    assert sum(ranks) <= PR_SCALE
    n = 5
    base = (PR_SCALE * (PR_D_DEN - PR_D_NUM)) // (PR_D_DEN * n)
    assert min(ranks) >= base


def test_anchor_texts_census_per_page(spark, sf_dir):
    """Every synthesized page carries exactly 8 anchors (3 nav + 3
    related + 2 footer) with the nav/footer hrefs fixed and the three
    /doc/ links following the (a*id+c) % 500 rule."""
    out = entry_mod.q_anchor_texts(spark, sf_dir)
    per_doc = out.groupBy("doc_id").count().collect()
    assert all(r["count"] == 8 for r in per_doc)
    rows = out.filter(F.col("doc_id") == 3).collect()
    hrefs = sorted(r["href"] for r in rows)
    expect_docs = sorted(f"/doc/{(3 * a + c) % 500}" for a, c in ((7, 1), (13, 3), (29, 11)))
    assert hrefs == sorted(["/", "/a", "/c", "/t", "/p"] + expect_docs)
    by_href = {r["href"]: r["anchor"] for r in rows}
    assert by_href["/"] == "home"
    assert by_href[f"/doc/{(3 * 7 + 1) % 500}"] == f"see article {(3 * 7 + 1) % 500}"


def test_anchor_texts_plan_is_projection(spark, sf_dir):
    plan = _plan(entry_mod.q_anchor_texts(spark, sf_dir))
    assert plan.count("Exchange") <= 1
    assert "Join" not in plan and "Window" not in plan and "Sort" not in plan


def test_pagerank_plan_no_cartesian(spark, sf_dir):
    plan = _plan(entry_mod.q_link_pagerank(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_link_triangles_equals_adjacency_reference(spark, sf_dir):
    """The degree-oriented wedge probe must count each triangle
    exactly once per participating vertex — checked against a plain
    adjacency-set intersection count over the same edge set."""
    import pandas as pd

    import __spark_entry__ as entry_mod

    out = {
        int(r.node): int(r.n_triangles)
        for r in entry_mod.q_link_triangles(spark, sf_dir).collect()
    }
    # rebuild the same edges serially
    from pyspark.sql import functions as F

    from ocular_spark.functions import html as H

    d = entry_mod._load_wide(spark, sf_dir, "documents")
    wrapped = d.select("doc_id", F.expr(H.wrap_links_spark()).alias("html"))
    crawl = wrapped.select(
        F.col("doc_id").alias("src"),
        F.explode(F.expr(H.doc_links_expr("html"))).alias("dd"),
    ).select("src", F.col("dd").cast("long").alias("dst")).toPandas()
    docs = d.select("doc_id").toPandas()
    und = set()
    for r in crawl.itertuples():
        if r.src != r.dst:
            und.add((min(r.src, r.dst), max(r.src, r.dst)))
    for i in docs["doc_id"]:
        g = (int(i) // 5) * 5
        for j in range(5):
            if g + j != int(i):
                und.add((min(int(i), g + j), max(int(i), g + j)))
    adj = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    want = {}
    for u, v in und:
        for w in adj[u] & adj[v]:
            for n in (u, v, w):
                want[n] = want.get(n, 0) + 1
    # each triangle visited 3x (once per edge), credited 3 nodes each
    # time -> every node's tally is 3x its true triangle count
    want = {n: c // 3 for n, c in want.items()}
    assert out == want
    # full 5-groups guarantee >= C(4,2) = 6 triangles per member
    full_groups = {g for g in range(0, len(docs), 5)
                   if all((g + j) in adj for j in range(5))}
    for g in list(full_groups)[:5]:
        assert out[g] >= 6
