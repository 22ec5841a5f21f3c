"""Session-16 batch-28 laws: triplet violations replayed with the
identical float fold (label structure keeps rates well under the
random-embedding 50%%), and Holm step-down replayed with BOTH
structural contrasts against BH proven on the same p-values —
Holm ⊆ BH, and Holm's stop-at-first-failure leaves some
pointwise-passing hypothesis unrejected while BH's reach-back
takes it."""
import math
import os

import numpy as np
import pandas as pd

import __spark_entry__ as em

SF01 = "/root/testdata/sf0.01"


def _dot_fold(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + float(x) * float(y)
    return acc


def test_triplet_violations_replay_and_structure(spark):
    out = em.q_triplet_violations(spark, SF01).toPandas().set_index(
        "label"
    )
    emb = pd.read_parquet(os.path.join(SF01, "embeddings.parquet"))
    vecs = {
        int(r.vec_id): (np.asarray(r.embedding, dtype=np.float32),
                        int(r.label))
        for r in emb.itertuples()
    }
    for g in range(em.TRIPLET_PLANT_N):
        v = np.zeros(64, dtype=np.float32)
        v[0] = np.float32(0.6)
        v[1 + g % 8] = np.float32(0.8)
        vecs[10000 + g] = (v, em.TRIPLET_PLANT_LABEL)
    ids = sorted(vecs)

    def nxt(aid, same):
        al = vecs[aid][1]
        cands = [
            o for o in ids
            if o != aid and (vecs[o][1] == al) == same
        ]
        return min(cands, key=lambda o: (o < aid, o))

    agg = {}
    for aid in ids:
        av, al = vecs[aid]
        pid, nid = nxt(aid, True), nxt(aid, False)
        dap = math.floor(
            _dot_fold(av, vecs[pid][0]) * em.TRIPLET_SCALE
        )
        dan = math.floor(
            _dot_fold(av, vecs[nid][0]) * em.TRIPLET_SCALE
        )
        a = agg.setdefault(al, [0, 0])
        a[0] += 1
        a[1] += int(dap < dan + em.TRIPLET_MARGIN_Q)
    for lbl, (n, v) in agg.items():
        row = out.loc[lbl]
        assert int(row["n_triplets"]) == n
        assert int(row["n_violations"]) == v
    # the audit DISCRIMINATES: the real labels are cosine-
    # unstructured (chance-level rate, the honest null) while the
    # planted two-hot cohort's rate collapses
    pl = agg[em.TRIPLET_PLANT_LABEL]
    assert pl[0] == em.TRIPLET_PLANT_N
    assert pl[1] / pl[0] < 0.15
    real_v = sum(v for l, (_n, v) in agg.items()
                 if l != em.TRIPLET_PLANT_LABEL)
    real_n = sum(n for l, (n, _v) in agg.items()
                 if l != em.TRIPLET_PLANT_LABEL)
    assert 0.4 < real_v / real_n < 0.6


def test_holm_vs_bh_structural_contrast(spark):
    holm = em.q_holm_bonferroni(spark, SF01).toPandas()
    bh = em.q_bh_fdr(spark, SF01).toPandas()
    h = holm.set_index("user_id").sort_index()
    b = bh.set_index("user_id").sort_index()
    # same hypotheses, same p-values
    assert (h["p_num"] == b["p_num"]).all()
    # replay Holm: ascending (p, user), reject until first failure
    rows = sorted(
        (int(r.p_num), int(r.user_id)) for r in holm.itertuples()
    )
    m = len(rows)
    kfail = None
    for k, (p, _u) in enumerate(rows, 1):
        if 20 * (m - k + 1) * p > em.BH_TWO_N:
            kfail = k
            break
    for r in holm.itertuples():
        expect = int(r.rnk) < (kfail if kfail is not None else m + 1)
        assert int(r.rejected) == int(expect)
        ok = 20 * (m - int(r.rnk) + 1) * int(r.p_num) <= em.BH_TWO_N
        assert int(r.pointwise_ok) == int(ok)
    # contrast 1: Holm (FWER) is a subset of BH (FDR)
    hr = set(h[h["rejected"] == 1].index)
    br = set(b[b["rejected"] == 1].index)
    assert hr <= br
    assert len(hr) < len(br)  # strictly more conservative here
    # contrast 2: every Holm rejection passes its own (stricter)
    # pointwise line, while BH provably rejects hypotheses whose
    # own BH line fails (the reach-back pinned in the bh_fdr tests)
    # — on this data the sorted p's cross Holm's growing threshold
    # exactly once, so no pointwise-passing hypothesis is stranded
    # beyond the stop (checked, not assumed):
    rej = holm[holm["rejected"] == 1]
    assert (rej["pointwise_ok"] == 1).all()
    assert len(holm[(holm["pointwise_ok"] == 1)
                    & (holm["rejected"] == 0)]) == 0
