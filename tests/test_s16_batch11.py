"""Session-16 batch-11 laws: the clamped balance replayed by the
literal sequential recurrence (closed-form reflection must equal
it row-for-row) with the naive-formula counterexample exhibited,
and peak concurrency replayed by a pure-Python sweep plus an
independent containment recount at the reported argmax instant."""
import os

import pandas as pd

import __spark_entry__ as em

SF01 = "/root/testdata/sf0.01"


def _events():
    return pd.read_parquet(os.path.join(SF01, "events.parquet"))


def test_stock_clamp_replay_and_naive_counterexample(spark):
    out = em.q_stock_clamp(spark, SF01).toPandas()
    ev = _events()
    anchor = ev["ts"].min().replace(minute=0, second=0, microsecond=0)
    day = ((ev["ts"] - anchor).dt.total_seconds() // 86400).astype(int)
    c = (ev["value"] * 100).round().astype("int64")
    dc = c.where(ev["event_type"] == "purchase", -c)
    dc = dc.where(ev["event_type"] != "purchase", 4 * c)
    df = pd.DataFrame({"u": ev["user_id"], "d": day, "dc": dc})
    daily = df.groupby(["u", "d"])["dc"].sum()
    expected = {}
    for u in daily.index.get_level_values(0).unique():
        bal, pre = 0, 0
        for d, delta in daily.loc[u].sort_index().items():
            pre += int(delta)
            bal = max(0, bal + int(delta))
            expected[(int(u), int(d))] = (int(delta), pre, bal)
    got = {
        (int(r.user_id), int(r.d)): (
            int(r.delta_c), int(r.prefix_c), int(r.balance_c)
        )
        for r in out.itertuples()
    }
    assert got == expected
    # the balance is a genuine clamped walk: never negative, always
    # >= the unclamped prefix, and the clamp BINDS somewhere
    assert all(b >= 0 and b >= p for _, p, b in got.values())
    zero_after_debit = sum(
        1 for dlt, _p, b in got.values() if b == 0 and dlt < 0
    )
    assert zero_after_debit > 20
    # naive max(0, prefix) is WRONG: burned funds at earlier clamps
    # are forgotten — exhibit rows where the two formulas differ
    diff = sum(1 for _d, p, b in got.values() if b != max(0, p))
    assert diff > 100


def test_peak_concurrency_replay_and_recount(spark):
    out = em.q_peak_concurrency(spark, SF01).toPandas()
    ev = _events()
    anchor = ev["ts"].min().replace(minute=0, second=0, microsecond=0)
    us = ((ev["ts"] - anchor).dt.total_seconds() * 1_000_000).round()
    us = us.astype("int64")
    dur = (
        em.CONC_DUR_BASE + ev["event_id"].astype("int64") % em.CONC_DUR_MOD
    ) * 1_000_000
    df = pd.DataFrame(
        {"t": ev["event_type"], "s": us, "e": us + dur,
         "eid": ev["event_id"].astype("int64")}
    )
    for t, g in df.groupby("t"):
        bounds = sorted(
            [(int(r.s), 1, int(r.eid)) for r in g.itertuples()]
            + [(int(r.e), -1, int(r.eid)) for r in g.itertuples()]
        )
        run, peak, peak_at = 0, -1, None
        for tt, dlt, _eid in bounds:
            run += dlt
            if run > peak:
                peak, peak_at = run, tt
        row = out[out["etype"] == t].iloc[0]
        assert int(row["peak"]) == peak
        assert int(row["peak_at_us"]) == peak_at
        assert int(row["n_bounds"]) == 2 * len(g)
        # independent containment recount at the reported instant
        cont = int(((g["s"] <= peak_at) & (peak_at < g["e"])).sum())
        assert cont == peak
        assert peak > 1  # concurrency is real at this event rate
