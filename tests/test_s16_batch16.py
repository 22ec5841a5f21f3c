"""Session-16 batch-16 laws: successive halving replayed round-by-
round in pure Python (planted-arm victory, equal-budget-per-round
invariant, elimination accounting), and median-of-medians replayed
with the BFPRT 30-70%% rank guarantee checked against the classic
bound."""
import os

import pandas as pd

import __spark_entry__ as em

SF01 = "/root/testdata/sf0.01"


def _reward(arm: int, t: int) -> int:
    r = (arm * 31 + t * 17) % 100
    if arm == em.SH_PLANT_ARM:
        r += em.SH_PLANT_BONUS
    return r


def test_successive_halving_replay_and_invariants(spark):
    out = em.q_successive_halving(spark, SF01).toPandas()
    state = {a: (0, 0) for a in range(em.SH_ARMS)}  # arm -> (reward, pulls)
    expected = {}
    alive = sorted(state)
    for rnd, pulls in enumerate(em.SH_ROUND_PULLS):
        for a in alive:
            rwd, pl = state[a]
            rwd += sum(_reward(a, t) for t in range(pl, pl + pulls))
            state[a] = (rwd, pl + pulls)
        ranked = sorted(alive, key=lambda a: (-state[a][0], a))
        keep = em.SH_ARMS >> (rnd + 1)
        for a in ranked[keep:]:
            expected[a] = (*state[a], rnd)
        alive = ranked[:keep]
    expected[alive[0]] = (*state[alive[0]], 99)
    got = {
        int(r.arm): (
            int(r.cum_reward), int(r.cum_pulls), int(r.eliminated_round)
        )
        for r in out.itertuples()
    }
    assert got == expected and len(got) == em.SH_ARMS
    # the planted arm wins
    assert got[em.SH_PLANT_ARM][2] == 99
    # equal budget per round: pulls spent in round r =
    # survivors(r) * pulls(r) = 128 for every round
    budgets = [
        (em.SH_ARMS >> rnd) * p
        for rnd, p in enumerate(em.SH_ROUND_PULLS)
    ]
    assert len(set(budgets)) == 1
    # elimination accounting: 8, 4, 2, 1 arms per round + 1 winner
    from collections import Counter

    c = Counter(v[2] for v in got.values())
    assert c == {0: 8, 1: 4, 2: 2, 3: 1, 99: 1}
    # total pulls of the winner = sum of all round budgets per arm
    assert got[em.SH_PLANT_ARM][1] == sum(em.SH_ROUND_PULLS)


def test_median_of_medians_replay_and_guarantee(spark):
    out = em.q_median_of_medians(spark, SF01).toPandas().set_index(
        "etype"
    )
    ev = pd.read_parquet(os.path.join(SF01, "events.parquet"))
    c = (ev["value"] * 100).round().astype("int64")
    for t, g in c.groupby(ev["event_type"]):
        sv = sorted(zip(g, ev.loc[g.index, "event_id"]))
        vals = [v for v, _ in sv]
        groups = [vals[i:i + em.MOM_GROUP]
                  for i in range(0, len(vals), em.MOM_GROUP)]
        gms = [grp[(len(grp) + 1) // 2 - 1] for grp in groups]
        gms_sorted = sorted(gms)
        mom = gms_sorted[(len(gms) + 1) // 2 - 1]
        row = out.loc[t]
        assert int(row["mom_c"]) == mom
        assert int(row["ngroups"]) == len(groups)
        assert int(row["n_less"]) == sum(1 for v in vals if v < mom)
        assert int(row["n"]) == len(vals)
        # the BFPRT guarantee: at least ~3n/10 elements on each side
        # (classic bound 3*(n//5//2 - 1) with partial-group slack)
        n = len(vals)
        lo_bound = 3 * (n // em.MOM_GROUP // 2 - 1)
        n_less, n_greater = int(row["n_less"]), sum(
            1 for v in vals if v > mom
        )
        assert n_less >= lo_bound and n_greater >= lo_bound
        # and empirically it lands mid-band on this data
        assert 0.2 * n < n_less < 0.8 * n
