"""Session-16 batch-31 laws: interarrival CV replayed gap-by-gap
with all three tempo classes pinned by the lattice/burst overlays,
and the gains table replayed with telescoping capture, crossover,
and top-decile lift laws."""
import os

import pandas as pd

import __spark_entry__ as em

SF01 = "/root/testdata/sf0.01"


def test_interarrival_cv_replay_and_classes(spark):
    out = em.q_interarrival_cv(spark, SF01).toPandas()
    ev = pd.read_parquet(os.path.join(SF01, "events.parquet"))
    anchor = ev["ts"].min()
    us = ((ev["ts"] - anchor).dt.total_seconds() * 1_000_000).round()
    us = us.astype("int64")
    gaps = {}
    for u, g in us.groupby(ev["user_id"]):
        s = sorted(g)
        gaps[int(u)] = [(b - a) // 1_000_000 for a, b in zip(s, s[1:])]
    gaps[-1] = [600] * 40
    gaps[-2] = [1_000_000 if i == 20 else 1 for i in range(1, 41)]
    got = {
        int(r.user_id): (int(r.n), int(r.s1), int(r.var_num), r.tempo)
        for r in out.itertuples()
    }
    for u, gs in gaps.items():
        if len(gs) < em.IACV_MIN_GAPS:
            assert u not in got
            continue
        n, s1 = len(gs), sum(gs)
        s2 = sum(g * g for g in gs)
        var_num = n * s2 - s1 * s1
        den = s1 * s1
        tempo = (
            "regular" if var_num * n < den
            else "poisson_like" if var_num * n <= 2 * den
            else "bursty"
        )
        assert got[u] == (n, s1, var_num, tempo), u
    # overlays pin the extremes: exact lattice has ZERO variance
    assert got[-1][2] == 0 and got[-1][3] == "regular"
    assert got[-2][3] == "bursty"
    # real users' tempos are data-decided but present
    assert len(got) == 152


def test_gains_table_replay_and_laws(spark):
    out = em.q_gains_table(spark, SF01).toPandas().sort_values("decile")
    docs = pd.read_parquet(os.path.join(SF01, "documents.parquet"))
    rows = []
    for r in docs.itertuples():
        toks = str(r.text).split(" ")
        rel = int(
            em.AP_REL_TOK in toks
            or int(r.doc_id) % em.AP_REL_MOD == em.AP_REL_RES
        )
        rows.append((int(r.doc_id), rel, 2 * rel + int(r.doc_id) % 3))
    rows.sort(key=lambda t: (-t[2], t[0]))
    n = len(rows)
    base, extra = divmod(n, em.GAINS_DECILES)
    per = {}
    i = 0
    for dec in range(1, em.GAINS_DECILES + 1):
        size = base + (1 if dec <= extra else 0)
        chunk = rows[i:i + size]
        i += size
        per[dec] = (len(chunk), sum(rel for _, rel, _ in chunk))
    r_tot = sum(v[1] for v in per.values())
    cum = 0
    for r in out.itertuples():
        dec = int(r.decile)
        n_d, resp = per[dec]
        cum += resp
        assert int(r.n_d) == n_d and int(r.resp_d) == resp
        assert int(r.cum_resp) == cum
        assert int(r.lift_q) == (resp * n * 1_000_000) // (n_d * r_tot)
    # telescoping capture conserves the response total exactly
    assert cum == r_tot
    # the informative score concentrates response up front: top
    # decile lift > 2x and the curve crosses below 1 by the tail
    lifts = list(out["lift"])
    assert lifts[0] > 2.0
    assert lifts[-1] < 1.0
    # captures are monotone by construction
    assert list(out["cum_resp"]) == sorted(out["cum_resp"])
