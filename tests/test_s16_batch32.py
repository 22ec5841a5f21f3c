"""Session-16 batch-32 laws: rank stability replayed depth-by-depth
with the staged geometric fold, the identical-list identity (the
same half against itself folds to exactly rbo == 1), and overlap
monotonicity."""
import os

import pandas as pd

import __spark_entry__ as em

SF01 = "/root/testdata/sf0.01"


def _staged(seed: int, k: int) -> int:
    x = seed
    for _ in range(k - 1):
        x = (x * em.RBO_P_NUM) // em.RBO_P_DEN
    return x


def _topk(counts: dict) -> list:
    return [
        t for t, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    ][: em.RBO_K]


def test_rank_stability_replay_and_identity(spark):
    out = em.q_rank_stability(spark, SF01).toPandas().iloc[0]
    docs = pd.read_parquet(os.path.join(SF01, "documents.parquet"))
    halves = {0: {}, 1: {}}
    for r in docs.itertuples():
        h = int(r.doc_id) % 2
        for tok in str(r.text).split(" "):
            if tok:
                halves[h][tok] = halves[h].get(tok, 0) + 1
    la, lb = _topk(halves[0]), _topk(halves[1])
    num = den = 0
    ovs = []
    for k in range(1, em.RBO_K + 1):
        ov = len(set(la[:k]) & set(lb[:k]))
        ovs.append(ov)
        num += _staged((ov * em.RBO_SCALE) // k, k)
        den += _staged(em.RBO_SCALE, k)
    assert int(out["ov_k"]) == ovs[-1]
    assert int(out["rbo_num"]) == num
    assert int(out["rbo_den"]) == den
    assert abs(out["rbo"] - num / den) < 1e-12
    # overlap@k is monotone non-decreasing in depth
    assert ovs == sorted(ovs)
    # identity law: a list against itself folds to EXACTLY 1
    inum = sum(
        _staged((k * em.RBO_SCALE) // k, k)
        for k in range(1, em.RBO_K + 1)
    )
    assert inum == den  # term and weight trajectories coincide
    # the metric's point, demonstrated: the halves share almost the
    # whole 31-token vocabulary (12 of 20 top slots shared)
    # yet near-tied counts make the RANK ORDER volatile, so RBO
    # (top-weighted) sits far below the set overlap ratio — exactly
    # the churn a depth-blind Jaccard would hide
    assert ovs[-1] >= 10
    assert 0.0 < out["rbo"] < ovs[-1] / em.RBO_K
