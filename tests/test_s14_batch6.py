"""Session-14 batch-6 laws: drawdown replay + peak/trough algebra,
SPRT stopped-walk replay + boundary laws, chain-ladder triangle
replay + rollforward step order."""
import math
import os
from collections import defaultdict

import pandas as pd

import __spark_entry__ as em

SF01 = "/root/testdata/sf0.01"


def test_max_drawdown_replay(spark):
    out = em.q_max_drawdown(spark, SF01).toPandas().set_index("host")
    ev = pd.read_parquet(os.path.join(SF01, "events.parquet"))
    for host, g in ev.sort_values(["ts", "event_id"]).groupby("user_id"):
        cum = peak = dd = 0
        n = 0
        for t, v in zip(g["event_type"], g["value"]):
            c = int(math.floor(v * 100 + 0.5))
            cum += c if t in em.DRAWDOWN_POS_TYPES else -c
            peak = max(peak, cum)
            dd = max(dd, peak - cum)
            n += 1
        r = out.loc[int(host)]
        assert int(r["n_events"]) == n
        assert int(r["peak_cents"]) == peak
        assert int(r["final_cents"]) == cum
        assert int(r["max_drawdown"]) == dd
        # algebraic laws
        assert dd >= peak - cum >= 0 or peak == cum
        assert dd >= 0
    # non-vacuity: drawdowns are non-trivial somewhere, and at least
    # one host ends above water (final > 0) or below (final < 0)
    assert (out["max_drawdown"] > 0).all()
    assert (out["final_cents"] < 0).any()


def test_sprt_stopped_walk_replay(spark):
    out = em.q_sprt_decision(spark, SF01).toPandas().set_index("usr")
    ev = pd.read_parquet(os.path.join(SF01, "events.parquet"))
    decisions = defaultdict(int)
    for usr, g in ev.sort_values(["ts", "event_id"]).groupby("user_id"):
        cum = 0
        dec, dseq, stop = "continue", -1, 0
        for i, t in enumerate(g["event_type"]):
            cum += em.SPRT_L1 if t == "purchase" else em.SPRT_L0
            if cum >= em.SPRT_A:
                dec, dseq, stop = "accept_h1", i, cum
                break
            if cum <= -em.SPRT_A:
                dec, dseq, stop = "accept_h0", i, cum
                break
        r = out.loc[int(usr)]
        assert r["decision"] == dec
        assert int(r["decision_seq"]) == dseq
        assert int(r["llr_stop"]) == stop
        decisions[dec] += 1
        # boundary law: the stopped llr actually crossed, and only by
        # one increment's overshoot at most
        if dec == "accept_h1":
            assert em.SPRT_A <= stop < em.SPRT_A + em.SPRT_L1
        if dec == "accept_h0":
            assert -em.SPRT_A - abs(em.SPRT_L0) < stop <= -em.SPRT_A
    # all three verdict classes occur (tuned: 25/19/106 at sf0.01)
    assert decisions["accept_h1"] > 0
    assert decisions["accept_h0"] > 0
    assert decisions["continue"] > 0


def test_chain_ladder_triangle_replay(spark):
    out = em.q_chain_ladder(spark, SF01).toPandas()
    ev = pd.read_parquet(os.path.join(SF01, "events.parquet"))
    epoch = pd.Timestamp("2024-01-01 00:00:00")
    wk = (
        (ev["ts"] - epoch) // pd.Timedelta(microseconds=1)
    ) // em.CL_WEEK_US
    ev = ev.assign(
        wk=wk.astype(int),
        cohort=(ev["user_id"] % em.CL_COHORTS).astype(int),
        cents=(ev["value"] * 100 + 0.5).apply(math.floor).astype(int),
    )
    ev = ev[ev["wk"] >= ev["cohort"]]
    W = int(ev["wk"].max())
    inc = ev.assign(age=ev["wk"] - ev["cohort"]).groupby(
        ["cohort", "age"]
    )["cents"].sum()
    tri = {}
    for c in range(em.CL_COHORTS):
        cum = 0
        tri[c] = {}
        for a in range(0, W - c + 1):
            cum += int(inc.get((c, a), 0))
            tri[c][a] = cum
    S = em.CL_SCALE
    fs = {}
    for a in range(W):
        cs = [c for c in tri if a + 1 in tri[c]]
        fs[a] = (
            sum(tri[c][a + 1] for c in cs) * S
            // sum(tri[c][a] for c in cs)
        )
    proj = {}
    for c in range(em.CL_COHORTS):
        cur = tri[c][W - c]
        for a in range(W - c + 1, W + 1):
            cur = cur * fs[a - 1] // S
            proj[(c, a)] = cur
    n_obs = sum(len(v) for v in tri.values())
    assert len(out) == n_obs + len(proj)
    for _, r in out.iterrows():
        c, a = int(r["cohort"]), int(r["age"])
        if int(r["is_observed"]) == 1:
            assert int(r["cum_cents"]) == tri[c][a]
        else:
            assert int(r["cum_cents"]) == proj[(c, a)]
    # triangle shape laws: cohort c has W-c+1 observed cells and
    # exactly c projected cells; cumulative is monotone within cohort
    g = out.groupby(["cohort", "is_observed"]).size()
    for c in range(em.CL_COHORTS):
        assert g.get((c, 1), 0) == W - c + 1
        assert g.get((c, 0), 0) == c
    for c in range(em.CL_COHORTS):
        obs_c = out[(out["cohort"] == c) & (out["is_observed"] == 1)]
        cums = obs_c.sort_values("age")["cum_cents"].to_numpy()
        assert (cums[1:] >= cums[:-1]).all()
    # development factors were all > 1 on this fixture, so the
    # projected ultimate exceeds the last observed diagonal
    for c in range(1, em.CL_COHORTS):
        ult = out[(out["cohort"] == c) & (out["age"] == W)]
        assert int(ult["cum_cents"].iloc[0]) > tri[c][W - c]
