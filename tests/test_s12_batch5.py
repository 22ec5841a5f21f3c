"""Session-12 batch-5 laws: encoding-advisor verdict variety +
pandas replay, PSI drift sensitivity (injected category drop), and
U-shaped attribution credit conservation."""
import math
import os

import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as em

SF01 = "/root/testdata/sf0.01"


# ------------------------------------------------ encoding advisor


def test_encoding_advisor_replay_and_variety(spark):
    out = em.q_encoding_advisor(spark, SF01).toPandas().set_index("column")
    li = pd.read_parquet(os.path.join(SF01, "lineitem.parquet"))
    order_cols = ["l_orderkey", "l_linenumber"] + [
        c for c in em.ENC_COLS if c not in ("l_orderkey", "l_linenumber")
    ]
    li = li.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
    for c in em.ENC_COLS:
        n = len(li)
        ndv = li[c].nunique()
        runs = int((li[c] != li[c].shift()).sum())
        r = out.loc[c]
        assert (r["n"], r["ndv"], r["n_runs"]) == (n, ndv, runs), c
        want = (
            "dict" if ndv * em.ENC_DICT_RATIO <= n
            else "rle" if n >= em.ENC_RLE_RUN * runs
            else "plain"
        )
        assert r["encoding"] == want, c
    # all three verdicts occur (the zone_map fixture lesson)
    assert set(out["encoding"]) == {"dict", "rle", "plain"}


# ------------------------------------------------------ PSI drift


def _psi(counts_ref, counts_cur):
    """Reference PSI with +1 smoothing (plain floats)."""
    cats = sorted(set(counts_ref) | set(counts_cur))
    cr = {c: counts_ref.get(c, 0) + 1 for c in cats}
    cc = {c: counts_cur.get(c, 0) + 1 for c in cats}
    nr, nc = sum(cr.values()), sum(cc.values())
    return sum(
        (cr[c] / nr - cc[c] / nc) * math.log((cr[c] / nr) / (cc[c] / nc))
        for c in cats
    )


def test_psi_stationary_small_and_drift_large(spark):
    out = em.q_psi_drift(spark, SF01).toPandas()
    # exact-integer identity: psi equals the float reference to 1e-9
    ev = pd.read_parquet(os.path.join(SF01, "events.parquet"))
    lo, hi = ev["ts"].min(), ev["ts"].max()
    mid_us = ((hi - lo) // pd.Timedelta(microseconds=1)) // 2
    is_ref = ((ev["ts"] - lo) // pd.Timedelta(microseconds=1)) < mid_us
    ref = ev[is_ref].groupby("event_type").size().to_dict()
    cur = ev[~is_ref].groupby("event_type").size().to_dict()
    want = _psi(ref, cur)
    psi = out["psi"].iloc[0]
    assert psi == pytest.approx(want, abs=1e-7)
    # stationarity law: the synthetic stream has no drift — PSI is
    # tiny (industry threshold: <0.1 stable, >0.25 action)
    assert 0 <= psi < 0.01
    # sensitivity: simulate a bot-filter change dropping 2/3 of one
    # category from the current window — PSI must cross the action
    # threshold's order of magnitude
    cur_broken = dict(cur)
    k = sorted(cur_broken)[0]
    cur_broken[k] = cur_broken[k] // 3
    drifted = _psi(ref, cur_broken)
    assert drifted > 30 * max(psi, 1e-9)
    assert drifted > 0.01


# ---------------------------------------------------- attribution


def test_position_attribution_credit_laws(spark):
    out = em.q_position_attribution(spark, SF01).toPandas()
    assert len(out) > 0
    # conservation: every purchase's credits sum to exactly 10000 bps
    sums = out.groupby("purchase_id")["credit_bps"].sum()
    assert (sums == 10000).all()
    ks = out.groupby("purchase_id")["k"].first()
    # the fixture exercises singleton, pair, and k>=3 shapes
    assert (ks == 1).any() or (ks == 2).any()
    assert (ks >= 3).any()
    for pid, grp in out.groupby("purchase_id"):
        k = int(grp["k"].iloc[0])
        g = grp.sort_values("position")
        assert list(g["position"]) == list(range(1, k + 1))
        if k == 1:
            assert list(g["credit_bps"]) == [10000]
        elif k == 2:
            assert list(g["credit_bps"]) == [5000, 5000]
        else:
            assert g["credit_bps"].iloc[0] == em.ATTR_FIRST_BPS
            assert g["credit_bps"].iloc[-1] == em.ATTR_LAST_BPS
            mids = list(g["credit_bps"].iloc[1:-1])
            each = em.ATTR_MID_BPS // (k - 2)
            rem = em.ATTR_MID_BPS - each * (k - 2)
            assert mids[0] == each + rem
            assert all(m == each for m in mids[1:])
