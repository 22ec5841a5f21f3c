"""Session-16 batch-30 laws: M4 replayed bucket-by-bucket with the
error-free envelope guarantee checked against the raw series, and
the cohort LTV curves replayed with monotonicity and the exact
total-revenue conservation law."""
import os

import pandas as pd

import __spark_entry__ as em

SF01 = "/root/testdata/sf0.01"


def test_m4_replay_and_envelope_guarantee(spark):
    out = em.q_m4_downsample(spark, SF01).toPandas()
    ev = pd.read_parquet(os.path.join(SF01, "events.parquet"))
    anchor = ev["ts"].min()
    t = ((ev["ts"] - anchor).dt.total_seconds() * 1_000_000).round()
    t = t.astype("int64")
    v = (ev["value"] * 100).round().astype("int64")
    span = int(t.max()) + 1
    df = pd.DataFrame(
        {"etype": ev["event_type"], "t": t, "v": v,
         "eid": ev["event_id"].astype("int64")}
    )
    df["bkt"] = (df["t"] * em.M4_BUCKETS) // span
    got = {
        (r.etype, int(r.bkt)): r for r in out.itertuples()
    }
    n_out = 0
    for (et, bkt), g in df.groupby(["etype", "bkt"]):
        rows = sorted(zip(g["t"], g["eid"], g["v"]))
        byv = sorted(zip(g["v"], g["t"], g["eid"]))
        r = got[(et, int(bkt))]
        n_out += 1
        assert int(r.n_in_bucket) == len(rows)
        assert (int(r.first_t), int(r.first_v)) == (
            rows[0][0], rows[0][2],
        )
        assert (int(r.last_t), int(r.last_v)) == (
            rows[-1][0], rows[-1][2],
        )
        assert (int(r.min_v), int(r.min_t)) == (byv[0][0], byv[0][1])
        assert (int(r.max_v), int(r.max_t)) == (byv[-1][0], byv[-1][1])
        # the M4 guarantee: the kept extremes ARE the bucket extremes
        assert int(r.min_v) == int(g["v"].min())
        assert int(r.max_v) == int(g["v"].max())
    assert n_out == len(out)
    # genuine reduction: <= 4 points per bucket vs ~40 in
    assert len(out) * 4 < len(df) / 2


def test_cohort_ltv_replay_and_conservation(spark):
    out = em.q_cohort_ltv(spark, SF01).toPandas()
    ev = pd.read_parquet(os.path.join(SF01, "events.parquet"))
    anchor = ev["ts"].min().replace(minute=0, second=0, microsecond=0)
    d = ((ev["ts"] - anchor).dt.total_seconds() // 86400).astype(int)
    c = (ev["value"] * 100).round().astype("int64")
    df = pd.DataFrame(
        {"u": ev["user_id"], "d": d, "t": ev["event_type"], "c": c}
    )
    cohort = (df.groupby("u")["d"].min() // 7).to_dict()
    rev = {}
    for r in df[df["t"] == "purchase"].itertuples():
        cw = cohort[r.u]
        age = r.d // 7 - cw
        rev[(cw, age)] = rev.get((cw, age), 0) + int(r.c)
    expected = {}
    for cw in {k[0] for k in rev}:
        max_age = max(a for (c2, a) in rev if c2 == cw)
        cum = 0
        for a in range(max_age + 1):
            inc = rev.get((cw, a), 0)
            cum += inc
            expected[(cw, a)] = (inc, cum)
    got = {
        (int(r.cohort_w), int(r.age_w)): (int(r.rev_c), int(r.cum_rev_c))
        for r in out.itertuples()
    }
    assert got == expected
    # monotone curves, age-0 presence, exact revenue conservation
    for cw in {k[0] for k in got}:
        curve = [got[(cw, a)][1] for (c2, a) in sorted(got) if c2 == cw]
        assert curve == sorted(curve)
        assert (cw, 0) in got
    finals = {
        cw: max(
            (got[(c2, a)][1], a) for (c2, a) in got if c2 == cw
        )[0]
        for cw in {k[0] for k in got}
    }
    total_purchase = int(df.loc[df["t"] == "purchase", "c"].sum())
    assert sum(finals.values()) == total_purchase
