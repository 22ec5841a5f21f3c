"""Session-12 batch-10 laws: FK-audit orphan accounting (purged edges
non-zero, untouched edges zero), l-diversity replay + violation
non-vacuity, PQ codebook validity + NumPy replay of codes and errors."""
import os

import numpy as np
import pandas as pd

import __spark_entry__ as em

SF01 = "/root/testdata/sf0.01"


def test_fk_audit_accounting(spark):
    out = em.q_fk_audit(spark, SF01).toPandas().set_index("fk_edge")
    li = pd.read_parquet(os.path.join(SF01, "lineitem.parquet"))
    orders = pd.read_parquet(os.path.join(SF01, "orders.parquet"))
    cust = pd.read_parquet(os.path.join(SF01, "customer.parquet"))
    part = pd.read_parquet(os.path.join(SF01, "part.parquet"))
    kept_c = cust[
        cust["c_custkey"] % em.FK_PURGE_CUST_MOD != em.FK_PURGE_CUST_RES
    ]
    kept_p = part[
        part["p_partkey"] % em.FK_PURGE_PART_MOD != em.FK_PURGE_PART_RES
    ]
    # purged edges dangle; untouched edges are clean — both classes
    assert out.loc["lineitem.l_orderkey->orders", "n_orphans"] == 0
    assert out.loc["lineitem.l_suppkey->supplier", "n_orphans"] == 0
    assert out.loc["customer.c_nationkey->nation", "n_orphans"] == 0
    o1 = int((~li["l_partkey"].isin(kept_p["p_partkey"])).sum())
    o2 = int((~orders["o_custkey"].isin(kept_c["c_custkey"])).sum())
    assert o1 > 0 and o2 > 0
    assert out.loc["lineitem.l_partkey->part", "n_orphans"] == o1
    assert out.loc["orders.o_custkey->customer", "n_orphans"] == o2
    assert (
        out.loc["lineitem.l_partkey->part", "n_orphan_keys"]
        == li.loc[~li["l_partkey"].isin(kept_p["p_partkey"]), "l_partkey"]
        .nunique()
    )
    # child counts reflect the post-purge parents where the child
    # itself was purged
    assert out.loc["customer.c_nationkey->nation", "n_child"] == len(kept_c)


def test_l_diversity_replay(spark):
    out = em.q_l_diversity(spark, SF01).toPandas()
    cust = pd.read_parquet(os.path.join(SF01, "customer.parquet"))
    cust = cust.assign(
        bal_b=np.floor(cust["c_acctbal"] / em.LDIV_B).astype(int)
    )
    g = cust.groupby(["c_mktsegment", "bal_b"])
    assert len(out) == g.ngroups
    got = out.set_index(["segment", "bal_b"])
    for (seg, b), grp in g:
        r = got.loc[(seg, b)]
        vc = grp["c_nationkey"].value_counts()
        assert int(r["n"]) == len(grp)
        assert int(r["n_sensitive"]) == len(vc)
        assert int(r["l_ok"]) == int(len(vc) >= em.LDIV_L)
        top_cnt = int(vc.max())
        top_nation = int(min(n for n, c in vc.items() if c == top_cnt))
        assert (int(r["top_nation"]), int(r["top_cnt"])) == (
            top_nation, top_cnt,
        )
    # the audit is non-vacuous in both directions
    assert (out["l_ok"] == 0).any() and (out["l_ok"] == 1).any()
    # a k-anonymous-looking class can still fail l-diversity: some
    # class with n >= LDIV_L has fewer than L distinct nations
    risky = out[(out["n"] >= em.LDIV_L) & (out["l_ok"] == 0)]
    assert len(risky) > 0


def test_pq_quantize_replay(spark):
    out = em.q_pq_quantize(spark, SF01).toPandas()
    emb = pd.read_parquet(os.path.join(SF01, "embeddings.parquet"))
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy()
    width = 64 // em.PQ_M
    assert len(out) == len(emb) * em.PQ_M
    for m in range(em.PQ_M):
        sub = X[:, m * width:(m + 1) * width]
        # replay Lloyd with the same exact-mean device
        order = np.argsort(ids)
        seed_rows = order[np.isin(ids[order], range(em.PQ_KSUB))]
        cb = {int(ids[i]): sub[i].copy() for i in seed_rows}
        for _ in range(em.PQ_ITERS):
            cids = sorted(cb)
            C = np.stack([cb[c] for c in cids])
            scores = sub @ C.T - 0.5 * np.einsum("ij,ij->i", C, C)
            assign = np.array(cids)[np.argmax(scores, axis=1)]
            nxt = {}
            for c in cids:
                mask = assign == c
                if not mask.any():
                    continue
                s9 = np.floor(sub[mask] * 1e9).sum(axis=0)
                nxt[c] = np.round(s9 / (mask.sum() * 1e9), 6)
            cb = nxt
        cids = sorted(cb)
        C = np.stack([cb[c] for c in cids])
        scores = sub @ C.T - 0.5 * np.einsum("ij,ij->i", C, C)
        codes = np.array(cids)[np.argmax(scores, axis=1)]
        sel = out[out["sub"] == m].set_index("vec_id").sort_index()
        want = pd.Series(codes, index=ids).sort_index()
        assert (sel["code"].to_numpy() == want.to_numpy()).all(), m
        # reconstruction error replay (allow 6-dp rounding slack)
        cvec = {c: cb[c] for c in cids}
        recon = np.stack([cvec[c] for c in codes])
        err = ((sub - recon) ** 2).sum(axis=1)
        got_err = pd.Series(
            sel["err6"].to_numpy(), index=sel.index
        ).sort_index().to_numpy()
        assert np.allclose(
            got_err, pd.Series(err, index=ids).sort_index().to_numpy(),
            atol=2e-6,
        ), m
    # codes use the full codebook meaningfully: every subspace keeps
    # several distinct codes, and quantization is lossy but sane
    for m in range(em.PQ_M):
        sel = out[out["sub"] == m]
        assert sel["code"].nunique() >= 4
        assert (sel["err6"] >= -1e-9).all()
        assert (sel["err6"] > 0).any()
