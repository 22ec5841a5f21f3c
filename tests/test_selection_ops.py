"""group_topk / ecdf_normalize / pareto_front: the structural laws
behind the driver-gate equality.

- group_topk: the per-partition pre-top-k superset law (stage-1
  survivors contain every global winner) and invariance of the final
  answer under repartitioning.
- ecdf_normalize: rank_lt is the exact strict-CDF count (pandas
  recompute) and the join back is BROADCAST (the corpus never sorts).
- pareto_front: equality with an O(n^2) domination brute force,
  invariance under repartitioning, and the local-front superset law
  the two-phase scheme rests on.
"""

import hashlib
import os

import pandas as pd

import __spark_entry__ as em

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF = os.path.join(TESTDATA, "sf0.001")


def _docs():
    return pd.read_parquet(os.path.join(SF, "documents.parquet"))


def test_group_topk_superset_and_invariance(spark):
    got = {
        (r.lang, r.rank, r.doc_id, r.score)
        for r in em.q_group_topk(spark, SF).collect()
    }
    docs = _docs().sort_values(
        ["lang", "n_chars", "doc_id"], ascending=[True, False, True]
    )
    want = set()
    for lang, grp in docs.groupby("lang", sort=False):
        for i, (_, row) in enumerate(grp.head(em.GTK_K).iterrows(), 1):
            want.add((lang, i, row["doc_id"], row["n_chars"]))
    assert got == want

    # stage-1 superset law under a hostile repartitioning
    d = em._load_wide(spark, SF, "documents").select(
        "doc_id", "lang", em.F.col("n_chars").cast("long").alias("score")
    ).repartition(13)
    cand = {
        (r.lang, r.doc_id)
        for r in d.mapInPandas(
            em._gtk_partition_topk(em.GTK_K),
            schema="doc_id long, lang string, score long",
        ).collect()
    }
    assert {(l, d_) for (l, _r, d_, _s) in want} <= cand


def test_ecdf_exact_and_broadcast(spark):
    got = {
        r.doc_id: (r.lang, r.v, r.rank_lt, r.n_g)
        for r in em.q_ecdf_normalize(spark, SF).collect()
    }
    docs = _docs()
    for lang, grp in docs.groupby("lang"):
        vals = grp["n_chars"].tolist()
        for _, row in grp.iterrows():
            rank_lt = sum(1 for v in vals if v < row["n_chars"])
            assert got[row["doc_id"]] == (
                lang, row["n_chars"], rank_lt, len(vals)
            )
    plan = (
        em.q_ecdf_normalize(spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def _brute_front(pts):
    out = set()
    for p in pts:
        dominated = any(
            q[1] >= p[1] and q[2] >= p[2] and (q[1] > p[1] or q[2] > p[2])
            for q in pts
        )
        if not dominated:
            out.add(p)
    return out


def _pts():
    docs = _docs()
    pts = []
    for doc_id, x in zip(docs["doc_id"], docs["n_chars"]):
        y = int(hashlib.md5(f"{doc_id}#pq".encode()).hexdigest()[:13], 16) % 1000
        pts.append((doc_id, int(x), y))
    return pts


def test_pareto_front_equals_brute_force(spark):
    got = {(r.doc_id, r.x, r.y) for r in em.q_pareto_front(spark, SF).collect()}
    want = _brute_front(_pts())
    assert got == want
    assert got, "front must be non-empty"


def test_pareto_partition_invariance_and_local_superset(spark):
    want = _brute_front(_pts())
    d = em._load_wide(spark, SF, "documents").select(
        "doc_id",
        em.F.col("n_chars").cast("long").alias("x"),
        em.F.expr(
            "cast(conv(substring(md5(concat(cast(doc_id as string),"
            " '#pq')), 1, 13), 16, 10) as bigint) % 1000"
        ).alias("y"),
    ).repartition(11)
    local = d.mapInPandas(em._pareto_kernel, schema="doc_id long, x long, y long")
    union = {(r.doc_id, r.x, r.y) for r in local.collect()}
    assert want <= union, "local fronts must contain the global front"
    final = {
        (r.doc_id, r.x, r.y)
        for r in local.repartition(1)
        .mapInPandas(em._pareto_kernel, schema="doc_id long, x long, y long")
        .collect()
    }
    assert final == want


def test_pareto_sweep_duplicates_and_ties():
    # exact duplicates both survive; same-x lower-y is dominated;
    # same-y smaller-x is dominated
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "x": [10, 10, 10, 8, 5],
            "y": [7, 7, 3, 7, 9],
        }
    )
    front = em._pareto_front_pandas(df)
    got = set(zip(front["doc_id"], front["x"], front["y"]))
    assert got == {(1, 10, 7), (2, 10, 7), (5, 5, 9)}
