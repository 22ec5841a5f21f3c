"""Session-15 batch-3 laws: t-closeness EMD vs an independent numpy
CDF-walk + bounds + verdict split, mutual-match reciprocity proven
against a full numpy argmax + global-best-pair membership, OHLC bars
vs a pandas first/last/extremes replay."""
import os

import numpy as np
import pandas as pd

import __spark_entry__ as em

SF01 = "/root/testdata/sf0.01"


def test_t_closeness_numpy_replay_and_laws(spark):
    out = em.q_t_closeness(spark, SF01).toPandas()
    c = pd.read_parquet(os.path.join(SF01, "customer.parquet"))
    c["bal_b"] = np.floor(c["c_acctbal"] / em.LDIV_B).astype(np.int64)
    doms = np.sort(c["c_nationkey"].unique())
    m = len(doms)
    glob = (
        c["c_nationkey"].value_counts().reindex(doms, fill_value=0)
    ).to_numpy()
    N = int(glob.sum())
    gcum = np.cumsum(glob)
    by_class = {
        (r.segment, int(r.bal_b)): r for r in out.itertuples()
    }
    assert len(by_class) == len(out)
    for (seg, b), g in c.groupby(["c_mktsegment", "bal_b"]):
        cnt = (
            g["c_nationkey"].value_counts().reindex(doms, fill_value=0)
        ).to_numpy()
        n = int(cnt.sum())
        num = int(np.abs(np.cumsum(cnt) * N - gcum * n).sum())
        r = by_class[(seg, int(b))]
        assert int(r.emd_num) == num, (seg, b)
        assert int(r.n) == n
        ref = num / (n * N * (m - 1))
        assert abs(float(r.emd) - ref) < 5e-10
        assert 0.0 <= ref <= 1.0
        assert int(r.t_ok) == int(
            num * em.TCLOSE_T_DEN <= n * N * (m - 1) * em.TCLOSE_T_NUM
        )
    # both verdicts occur (the audit is non-vacuous)
    assert out["t_ok"].nunique() == 2
    # whole-population law: one class containing everyone has EMD 0
    num_all = int(np.abs(gcum * N - gcum * N).sum())
    assert num_all == 0


def test_mutual_match_reciprocity_and_global_best(spark):
    out = em.q_mutual_match(spark, SF01).toPandas()
    emb = pd.read_parquet(os.path.join(SF01, "embeddings.parquet"))
    ids = emb["vec_id"].to_numpy()
    mat = np.stack(emb["embedding"].values).astype(np.float64)
    # independent quantized metric: full GEMM then round to 5 dp
    sims = np.round(mat @ mat.T, 5)
    np.fill_diagonal(sims, -np.inf)
    order = np.argsort(ids)
    assert (ids == np.arange(len(ids))).all()  # contiguous ids
    nn = np.empty(len(ids), dtype=np.int64)
    for i in range(len(ids)):
        # argmax with (cos desc, id asc) tie order
        best = np.flatnonzero(sims[i] == sims[i].max())
        nn[i] = best.min()
    expected = {
        (i, int(nn[i]))
        for i in range(len(ids))
        if nn[int(nn[i])] == i and i < int(nn[i])
    }
    got = {(int(r.id_a), int(r.id_b)) for r in out.itertuples()}
    assert got == expected
    assert len(got) > 10  # non-vacuous matching
    # the globally most-similar pair is always mutual
    gi, gj = np.unravel_index(np.argmax(sims), sims.shape)
    assert (min(gi, gj), max(gi, gj)) in got
    # every emitted cosine equals the quantized metric
    for r in out.itertuples():
        assert abs(float(r.cos_ab) - sims[int(r.id_a), int(r.id_b)]) < 1e-9
    del order


def test_ohlc_bars_pandas_replay(spark):
    out = em.q_ohlc_bars(spark, SF01).toPandas()
    ev = pd.read_parquet(os.path.join(SF01, "events.parquet"))
    ev["cents"] = np.floor(ev["value"] * 100 + 0.5).astype(np.int64)
    ev["day"] = ev["ts"].dt.date
    ev = ev.sort_values(["user_id", "day", "ts", "event_id"])
    ref = ev.groupby(["user_id", "day"]).agg(
        open_c=("cents", "first"),
        high_c=("cents", "max"),
        low_c=("cents", "min"),
        close_c=("cents", "last"),
        n_trades=("cents", "size"),
        vol_cents=("cents", "sum"),
    )
    assert len(out) == len(ref)
    for r in out.itertuples():
        e = ref.loc[(int(r.user_id), r.day)]
        for col in (
            "open_c", "high_c", "low_c", "close_c", "n_trades", "vol_cents"
        ):
            assert int(getattr(r, col)) == int(e[col]), (r.user_id, r.day)
    # invariant: low <= open, close <= high
    assert (out["low_c"] <= out["open_c"]).all()
    assert (out["low_c"] <= out["close_c"]).all()
    assert (out["high_c"] >= out["open_c"]).all()
    assert (out["high_c"] >= out["close_c"]).all()
