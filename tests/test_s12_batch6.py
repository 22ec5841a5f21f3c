"""Session-12 batch-6 laws: NDCG ideal-dominance + replay +
non-vacuity, basket-lift pandas replay + rational law, Cohen's kappa
replay + chance-corrected bounds."""
import math
import os

import pandas as pd

import __spark_entry__ as em

SF01 = "/root/testdata/sf0.01"


# ---------------------------------------------------------- NDCG


def test_ndcg_laws_and_replay(spark):
    out = (
        em.q_ndcg_eval(spark, SF01)
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert list(out["k"]) == list(range(1, em.NDCG_K + 1))
    # ideal dominance: the global top-k grade multiset dominates any
    # actual prefix position-wise, so dcg <= idcg at every k
    assert (out["dcg_num"] <= out["idcg_num"]).all()
    assert (out["idcg_num"] > 0).all()
    # non-vacuity: the bm25 ranking is imperfect against the graded
    # labels (ndcg < 1 everywhere at sf0.01 — the fixture curve runs
    # 0.143 -> 0.287) but the metric is bounded away from degenerate 0
    assert (out["ndcg"] < 1.0).all()
    assert (out["ndcg"] > 0.0).all()
    assert out["ndcg"].iloc[-1] > 0.1
    # pandas replay from the parquet + the gated bm25 list
    docs = pd.read_parquet(os.path.join(SF01, "documents.parquet"))
    nw = docs["text"].str.split(" ").str.len()
    rel0 = (nw >= em.NDCG_NW_LO).astype(int) + (nw >= em.NDCG_NW_HI).astype(int)
    rel = rel0.where(docs["doc_id"] % em.NDCG_NOISE_MOD != 3, 3 - rel0)
    rel_by_doc = dict(zip(docs["doc_id"], rel))
    bm = em.q_bm25_topk(spark, SF01).toPandas()
    bm = bm.sort_values(["score", "doc_id"], ascending=[False, True])
    actual = [rel_by_doc[d] for d in bm["doc_id"]]
    ideal = sorted(rel_by_doc.values(), reverse=True)[: em.NDCG_K]
    dcg = idcg = 0
    for k in range(1, em.NDCG_K + 1):
        d = em._ndcg_discount(k)
        assert d == int(
            math.floor(em.NDCG_LN_SCALE * math.log(2.0) / math.log(k + 1.0) + 0.5)
        )
        dcg += ((1 << actual[k - 1]) - 1) * d
        idcg += ((1 << ideal[k - 1]) - 1) * d
        row = out.iloc[k - 1]
        assert (row["dcg_num"], row["idcg_num"]) == (dcg, idcg), k


# --------------------------------------------------- basket lift


def test_basket_lift_replay(spark):
    out = em.q_basket_lift(spark, SF01).toPandas()
    assert len(out) > 0
    assert (out["pa"] < out["pb"]).all()
    assert (out["c_ab"] >= em.BASKET_MIN_SUPPORT).all()
    li = pd.read_parquet(os.path.join(SF01, "lineitem.parquet"))
    items = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    n_orders = items["l_orderkey"].nunique()
    supp = items.groupby("l_partkey").size()
    # pair counts by per-order combination expansion
    from collections import Counter

    pc: Counter = Counter()
    for _, grp in items.groupby("l_orderkey")["l_partkey"]:
        ps = sorted(grp)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pc[(ps[i], ps[j])] += 1
    want = {k: v for k, v in pc.items() if v >= em.BASKET_MIN_SUPPORT}
    got = {
        (int(r["pa"]), int(r["pb"])): int(r["c_ab"]) for _, r in out.iterrows()
    }
    assert got == want
    for _, r in out.iterrows():
        ca, cb = int(supp[r["pa"]]), int(supp[r["pb"]])
        assert (int(r["c_a"]), int(r["c_b"])) == (ca, cb)
        assert int(r["lift_num"]) == n_orders * int(r["c_ab"])
        assert int(r["lift_den"]) == ca * cb
        assert abs(r["lift"] - r["lift_num"] / r["lift_den"]) < 1e-9
    # with a support floor over sparse baskets every kept pair is a
    # genuine positive association
    assert (out["lift"] > 1.0).all()


# --------------------------------------------------- Cohen's kappa


def test_cohens_kappa_replay(spark):
    out = em.q_cohens_kappa(spark, SF01).toPandas().set_index("lang")
    docs = pd.read_parquet(os.path.join(SF01, "documents.parquet"))
    nw = docs["text"].str.split(" ").str.len()
    nc = docs["text"].str.len()
    docs = docs.assign(
        ra=(nw >= em.KAPPA_NW_LO).astype(int) + (nw >= em.KAPPA_NW_HI).astype(int),
        rb=(nc >= em.KAPPA_NC_LO).astype(int) + (nc >= em.KAPPA_NC_HI).astype(int),
    )
    assert len(out) == docs["lang"].nunique()
    for lang, grp in docs.groupby("lang"):
        n = len(grp)
        agree = int((grp["ra"] == grp["rb"]).sum())
        pe_num = sum(
            int((grp["ra"] == k).sum()) * int((grp["rb"] == k).sum())
            for k in (0, 1, 2)
        )
        r = out.loc[lang]
        assert (r["n"], r["agree"], r["pe_num"]) == (n, agree, pe_num)
        assert int(r["kappa_num"]) == n * agree - pe_num
        assert int(r["kappa_den"]) == n * n - pe_num
        # two correlated-but-different raters: better than chance,
        # below perfect, in every language
        assert 0.0 < r["kappa"] < 1.0
