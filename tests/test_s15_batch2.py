"""Session-15 batch-2 laws: FIFO interval-overlap == independent deque
simulation + conservation + staircase monotonicity, Kadane window
linearization vs a per-user numpy fold with the exact tie order,
lag-k ACF vs float Pearson + bounds."""
import collections
import os

import numpy as np
import pandas as pd

import __spark_entry__ as em

SF01 = "/root/testdata/sf0.01"


def _events():
    ev = pd.read_parquet(os.path.join(SF01, "events.parquet"))
    ev["cents"] = np.floor(ev["value"] * 100 + 0.5).astype(np.int64)
    return ev.sort_values(["user_id", "ts", "event_id"])


def test_fifo_match_deque_replay_and_laws(spark):
    out = em.q_fifo_match(spark, SF01).toPandas()
    ev = _events()
    got = {
        (int(r.user_id), int(r.credit_event), int(r.debit_event)): int(
            r.qty
        )
        for r in out.itertuples()
    }
    assert (out["qty"] > 0).all()
    n_expected = 0
    for uid, g in ev.groupby("user_id"):
        credits = collections.deque(
            (int(r.event_id), int(r.cents))
            for r in g[g.event_type == em.FIFO_CREDIT_TYPE].itertuples()
            if r.cents > 0
        )
        debits = [
            (int(r.event_id), int(r.cents))
            for r in g[g.event_type == em.FIFO_DEBIT_TYPE].itertuples()
            if r.cents > 0
        ]
        tot_c = sum(q for _, q in credits)
        tot_d = sum(q for _, q in debits)
        matched_here = 0
        for deid, drem in debits:
            while drem > 0 and credits:
                ceid, crem = credits[0]
                m = min(crem, drem)
                assert got[(int(uid), ceid, deid)] == m
                n_expected += 1
                matched_here += m
                drem -= m
                if crem == m:
                    credits.popleft()
                else:
                    credits[0] = (ceid, crem - m)
        # conservation: total matched = min(total credits, total debits)
        assert matched_here == min(tot_c, tot_d)
    assert n_expected == len(out)
    # staircase law: within a user, sorting matches by credit order
    # must also sort them by debit order (FIFO never crosses lots)
    ev_rn = ev[ev.cents > 0]
    for side, col in (
        (em.FIFO_CREDIT_TYPE, "credit_event"),
        (em.FIFO_DEBIT_TYPE, "debit_event"),
    ):
        rn = (
            ev_rn[ev_rn.event_type == side]
            .groupby("user_id")
            .cumcount()
            .set_axis(ev_rn[ev_rn.event_type == side]["event_id"])
        )
        out[col + "_rn"] = out[col].map(rn)
    for _, g in out.groupby("user_id"):
        g = g.sort_values(["credit_event_rn", "debit_event_rn"])
        assert g["debit_event_rn"].is_monotonic_increasing


def test_max_subarray_kadane_replay(spark):
    out = em.q_max_subarray(spark, SF01).toPandas().set_index("user_id")
    ev = _events()
    for uid, g in ev.groupby("user_id"):
        net = (g["cents"] - em.MAXSUB_BASE_CENTS).to_numpy()
        # independent fold with the exact tie order: best sum, then
        # earliest end, then earliest start
        best = (-(1 << 62), 0, 0)
        cur, cur_start = 0, 1
        for i, v in enumerate(net, start=1):
            if cur < 0:
                cur, cur_start = 0, i
            cur += int(v)
            if cur > best[0]:
                best = (cur, i, cur_start)
        r = out.loc[int(uid)]
        assert int(r["best_sum"]) == best[0], uid
        assert int(r["end_seq"]) == best[1], uid
        assert int(r["start_seq"]) == best[2], uid
        assert int(r["n_events"]) == len(net)
        # optimality floor: at least the best single element
        assert best[0] >= int(net.max())


def test_autocorrelation_pearson_replay(spark):
    out = em.q_autocorrelation(spark, SF01).toPandas()
    ev = _events()
    by_key = {
        (int(r.user_id), int(r.lag_k)): (float(r.acf), int(r.n_pairs))
        for r in out.itertuples()
    }
    mags = []
    for uid, g in ev.groupby("user_id"):
        x = g["cents"].to_numpy(dtype=float)
        for k in em.ACF_LAGS:
            a, b = x[k:], x[:-k]
            ref = float(
                ((a - a.mean()) * (b - b.mean())).sum()
                / np.sqrt(
                    ((a - a.mean()) ** 2).sum()
                    * ((b - b.mean()) ** 2).sum()
                )
            )
            acf, n_pairs = by_key[(int(uid), k)]
            assert n_pairs == len(a)
            assert abs(acf - ref) < 1e-6, (uid, k)
            assert abs(acf) <= 1.0
            mags.append(abs(acf))
    # white-noise fixture: lagged dependence is weak in the median
    assert float(np.median(mags)) < 0.5
