"""Session-16 batch-24 laws: the session gap curve replayed delta-
by-delta with monotonicity and the user-count floor, and the
partition advisor replayed byte-for-byte with the ceiling
inequality and target monotonicity."""
import math
import os

import pandas as pd

import __spark_entry__ as em

SF01 = "/root/testdata/sf0.01"


def test_session_gap_curve_replay_and_monotonicity(spark):
    out = em.q_session_gap_curve(spark, SF01).toPandas().set_index(
        "gap_s"
    )
    ev = pd.read_parquet(os.path.join(SF01, "events.parquet"))
    anchor = ev["ts"].min()
    us = (
        (ev["ts"] - anchor).dt.total_seconds() * 1_000_000
    ).round().astype("int64")
    deltas = []
    for _u, g in us.groupby(ev["user_id"]):
        s = sorted(g)
        deltas.append(None)
        deltas.extend(b - a for a, b in zip(s, s[1:]))
    n_users = ev["user_id"].nunique()
    for gap in em.SESSION_GAPS_S:
        starts = sum(
            1 for d in deltas if d is None or d > gap * 1_000_000
        )
        row = out.loc[gap]
        assert int(row["n_sessions"]) == starts
        assert int(row["n_events"]) == len(deltas)
    counts = [int(out.loc[g, "n_sessions"]) for g in em.SESSION_GAPS_S]
    # monotone non-increasing in the gap; floored by the user count
    assert counts == sorted(counts, reverse=True)
    assert counts[-1] >= n_users
    # the magnitude-spanning grid makes the curve genuinely move:
    # events average ~10h apart, so sub-hour gaps barely merge
    # anything while the 1-week gap collapses toward one session
    # per user
    assert counts[0] > 2 * counts[-1]
    assert counts[-1] < 2 * n_users


def test_partition_advisor_replay_and_ceiling(spark):
    out = em.q_partition_advisor(spark, SF01).toPandas()
    for table, cols in em._PA_COLS.items():
        df = pd.read_parquet(os.path.join(SF01, f"{table}.parquet"))
        width = 0
        for name, kind in cols:
            if kind == "str":
                width += df[name].astype(str).str.len().sum()
            else:
                width += 8 * len(df)
        sub = out[out["tbl"] == table]
        assert set(sub["n_rows"].astype(int)) == {len(df)}
        assert set(sub["est_bytes"].astype(int)) == {int(width)}
        for r in sub.itertuples():
            t, npart = int(r.target_bytes), int(r.n_partitions)
            want = max(1, math.ceil(int(width) / t))
            assert npart == want
            if int(width) > t:
                assert npart * t >= int(width) > (npart - 1) * t
        # monotone non-increasing partition counts as targets grow
        ps = [
            int(sub[sub["target_bytes"] == t]["n_partitions"].iloc[0])
            for t in em.PA_TARGETS
        ]
        assert ps == sorted(ps, reverse=True)
    # the census is non-trivial: lineitem spans multiple 1MB parts
    li = out[(out["tbl"] == "lineitem")
             & (out["target_bytes"] == em.PA_TARGETS[0])]
    assert int(li["n_partitions"].iloc[0]) > 1
