"""Session-12 batch-11 laws: correlation matrix vs NumPy, cardinality
q-error structure (FK exact, filters break independence), changepoint
vs brute-force SSE minimization."""
import os

import numpy as np
import pandas as pd

import __spark_entry__ as em

SF01 = "/root/testdata/sf0.01"


def test_corr_matrix_vs_numpy(spark):
    out = em.q_corr_matrix(spark, SF01).toPandas()
    li = pd.read_parquet(os.path.join(SF01, "lineitem.parquet"))
    li = li.assign(
        l_revenue=li["l_extendedprice"] * (1 - li["l_discount"])
    )
    cols = [c for c, _ in em.CORR_COLS]
    scale = dict(em.CORR_COLS)
    assert len(out) == len(cols) * (len(cols) - 1) // 2
    for _, r in out.iterrows():
        a, b = r["col_a"], r["col_b"]
        # half-up quantization (np.round is banker's — would diverge
        # from the engines' ROUND at exact .5 values)
        xa = np.floor(li[a].to_numpy() * scale[a] + 0.5).astype(np.int64)
        xb = np.floor(li[b].to_numpy() * scale[b] + 0.5).astype(np.int64)
        want = np.corrcoef(xa, xb)[0, 1]
        assert abs(r["corr"] - want) < 1e-9, (a, b)
        assert int(r["sum_a"]) == int(xa.sum())
        assert int(r["sum_b"]) == int(xb.sum())
        # quantization to natural units preserves correlation (scale
        # invariance): also matches corr on the RAW doubles closely
        raw = np.corrcoef(li[a].to_numpy(), li[b].to_numpy())[0, 1]
        assert abs(r["corr"] - raw) < 1e-5, (a, b)
    # the matrix is non-degenerate: the raw synthetic measures are
    # drawn independently (all pairwise corr ~0.003), so the derived
    # revenue column supplies the strong pair
    pr = out[
        (out["col_a"] == "l_extendedprice") & (out["col_b"] == "l_revenue")
    ]
    assert float(pr["corr"].iloc[0]) > 0.9
    weak = out[
        (out["col_a"] == "l_quantity") & (out["col_b"] == "l_extendedprice")
    ]
    assert abs(float(weak["corr"].iloc[0])) < 0.05


def test_join_card_est_structure(spark):
    out = em.q_join_card_est(spark, SF01).toPandas().set_index("scenario")
    # the unfiltered FK join is where the uniform assumption is exact:
    # every lineitem joins exactly one order -> est == actual, q = 1
    fk = out.loc["fk_plain"]
    assert int(fk["actual"]) == int(fk["n_fact"])
    assert abs(fk["q_error"] - 1.0) < 1e-9
    # filtered scenarios break independence: q-error strictly > 1
    for s in ("filter_status_F", "filter_hiprice"):
        r = out.loc[s]
        assert r["q_error"] > 1.0 + 1e-9, s
        # estimate algebra
        assert int(r["est_num"]) == int(r["n_fact"]) * int(r["n_dim"])
        assert int(r["est_den"]) == max(int(r["d_fact"]), int(r["d_dim"]))
        assert abs(r["est"] - r["est_num"] / r["est_den"]) < 1e-9
    # selective filters shrink the actual
    assert int(out.loc["filter_hiprice", "actual"]) < int(fk["actual"])


def test_changepoint_vs_bruteforce(spark):
    out = em.q_changepoint_detect(spark, SF01).toPandas().set_index("event_type")
    ev = pd.read_parquet(os.path.join(SF01, "events.parquet"))
    ev = ev.assign(d=ev["ts"].dt.date)
    for et, grp in ev.groupby("event_type"):
        daily = grp.groupby("d").size().sort_index()
        c = daily.to_numpy(dtype=np.int64)
        days = list(daily.index)
        m, s = len(c), int(c.sum())
        best = None
        for i in range(1, m):  # split AFTER position i (1-based n_l=i)
            s_l = int(c[:i].sum())
            s_r = s - s_l
            score = round(
                (s_l * s_l * (m - i) + s_r * s_r * i)
                * float(em.CP_SCORE_SCALE) / (i * (m - i))
            )
            if best is None or score > best[0]:
                best = (score, i, s_l, s_r)
        r = out.loc[et]
        assert int(r["score"]) == best[0], et
        assert str(r["split_day"]) == str(days[best[1] - 1]), et
        assert (int(r["s_l"]), int(r["s_r"])) == (best[2], best[3])
        # the chosen split is a genuine improvement over no split:
        # between-segment term exceeds the pooled S^2/m baseline
        base = best[2] + best[3]
        lhs = best[2] ** 2 * (m - best[1]) + best[3] ** 2 * best[1]
        rhs = (base * base) * best[1] * (m - best[1]) / m
        assert lhs > rhs, et
