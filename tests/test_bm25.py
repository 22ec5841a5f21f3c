"""bm25_topk: scores cross-checked against an independent pandas/math
restatement; top-k plan compiles to TakeOrderedAndProject (not a full
global sort)."""

import math
import os

import pyarrow.parquet as pq

import __spark_entry__ as entry_mod
from __spark_entry__ import BM25_B, BM25_K1, BM25_QUERY


def test_scores_match_reference(spark, sf_dir):
    got = {r.doc_id: r for r in
           entry_mod.q_bm25_topk(spark, sf_dir).collect()}
    assert len(got) == 20
    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet")
    ).to_pandas()
    texts = {int(d): str(t).split(" ")
             for d, t in zip(docs["doc_id"], docs["text"])}
    dls = {d: len([w for w in ws if w]) for d, ws in texts.items()}
    n = float(len(texts))
    avgdl = sum(dls.values()) / len(dls)
    df = {t: sum(1 for ws in texts.values() if t in ws)
          for t in BM25_QUERY}
    scores = {}
    for d, ws in texts.items():
        s, hit = 0.0, 0
        for t in BM25_QUERY:
            tf = ws.count(t)
            if tf == 0:
                continue
            hit += 1
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += (idf * (tf * (BM25_K1 + 1.0))) / (
                tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dls[d] / avgdl)
            )
        if hit:
            scores[d] = (round(s, 6), hit)
    want = sorted(scores.items(), key=lambda kv: (-kv[1][0], kv[0]))[:20]
    assert {d for d, _ in want} == set(got)
    for d, (sc, hit) in want:
        assert abs(got[d].score - sc) < 1e-6, d
        assert got[d].n_terms_hit == hit


def test_topk_plan(spark, sf_dir):
    plan = entry_mod.q_bm25_topk(spark, sf_dir)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
