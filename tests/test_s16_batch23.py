"""Session-16 batch-23 laws: blocking quality replayed pair-census-
by-pair-census (completeness is exactly 1.0 on this roster — the
structural Thompson/Tomson miss never meets the lev<=2 truth bar —
while reduction ratio shows the 93%% saving), and absorption
probabilities replayed step-by-step with the structural
monotonicity law P1 <= P2 <= P3 and the [0, S] range bound."""
import os

import pandas as pd

import __spark_entry__ as em
from tests.test_s16_batch3 import _lev, _py_soundex

SF01 = "/root/testdata/sf0.01"


def test_blocking_quality_replay(spark):
    out = em.q_blocking_quality(spark, SF01).toPandas().iloc[0]
    cust = pd.read_parquet(os.path.join(SF01, "customer.parquet"))
    nn = len(em.PB_NAMES)
    recs = {}
    for ck in cust["c_custkey"].astype(int):
        fn = em.PB_NAMES[(ck * 7) % nn]
        ln = em.PB_NAMES[(ck * 13 + 3) % nn]
        recs[ck] = (f"{fn} {ln}", _py_soundex(fn), _py_soundex(ln))
    keys = sorted(recs)
    # census over distinct NAME PROFILES (full, sdx pair occur in
    # classes) — enumerate by class to keep the replay quadratic in
    # the small class count, not 1500^2 python lev calls
    from collections import Counter

    prof = Counter(recs[k] for k in keys)
    kinds = list(prof)
    n_pairs = n_true = n_blocked = n_found = 0
    for i, a in enumerate(kinds):
        for j in range(i, len(kinds)):
            b = kinds[j]
            cnt = (
                prof[a] * (prof[a] - 1) // 2
                if i == j
                else prof[a] * prof[b]
            )
            t = _lev(a[0], b[0]) <= em.PB_MAX_LEV
            bl = a[1] == b[1] and a[2] == b[2]
            n_pairs += cnt
            n_true += cnt * t
            n_blocked += cnt * bl
            n_found += cnt * (t and bl)
    assert int(out["n_pairs"]) == n_pairs == 1500 * 1499 // 2
    assert int(out["n_true"]) == n_true
    assert int(out["n_blocked"]) == n_blocked
    assert int(out["n_found"]) == n_found
    # on this roster the blocker is LOSSLESS (completeness exactly 1:
    # every lev<=2 name pair shares both codes — the structural miss
    # pair never reaches the truth bar) while skipping 93% of pairs
    assert out["pairs_completeness"] == 1.0
    assert 0.9 < out["reduction_ratio"] < 0.95


def test_absorption_prob_replay_and_monotonicity(spark):
    out = em.q_absorption_prob(spark, SF01).toPandas().set_index("src")
    ev = pd.read_parquet(os.path.join(SF01, "events.parquet")).sort_values(
        ["user_id", "ts", "event_id"]
    )
    trans: dict[tuple, int] = {}
    for u, g in ev.groupby("user_id"):
        ts = list(g["event_type"])
        for a, b in zip(ts, ts[1:]):
            if a != em.ABS_TARGET:
                trans[(a, b)] = trans.get((a, b), 0) + 1
    srcs = sorted({a for a, _ in trans})
    n_src = {s: sum(n for (a, _), n in trans.items() if a == s)
             for s in srcs}
    n_to_t = {
        s: trans.get((s, em.ABS_TARGET), 0) for s in srcs
    }
    S = em.ABS_SCALE
    p = {s: (n_to_t[s] * S) // n_src[s] for s in srcs}
    ps = [dict(p)]
    for _ in range(em.ABS_STEPS - 1):
        np_ = {}
        for s in srcs:
            w = sum(
                n * p[d]
                for (a, d), n in trans.items()
                if a == s and d != em.ABS_TARGET
            )
            np_[s] = (n_to_t[s] * S + w) // n_src[s]
        p = np_
        ps.append(dict(p))
    for s in srcs:
        row = out.loc[s]
        assert int(row["n_src"]) == n_src[s]
        assert int(row["n_to_t"]) == n_to_t[s]
        assert int(row["p1_q"]) == ps[0][s]
        assert int(row["p2_q"]) == ps[1][s]
        assert int(row["p3_q"]) == ps[2][s]
        # structural monotonicity and range
        assert 0 <= ps[0][s] <= ps[1][s] <= ps[2][s] <= S
    # more steps genuinely help (the chain is not absorbed in one)
    assert all(ps[2][s] > ps[0][s] for s in srcs)
