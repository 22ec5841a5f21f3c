"""Session-16 batch-29 laws: Banzhaf power replayed by a vectorized
numpy enumeration of all 2^20 coalitions, with the symmetry law
(equal-seat players have EXACTLY equal swing counts), seat
monotonicity, and the power-vs-seat-share divergence visible."""
import os

import numpy as np
import pandas as pd

import __spark_entry__ as em

SF01 = "/root/testdata/sf0.01"


def test_banzhaf_replay_and_symmetry(spark):
    out = em.q_banzhaf_power(spark, SF01).toPandas().set_index("source")
    seats_df = (
        em.q_seat_apportionment(spark, SF01)
        .select("source", "seats")
        .toPandas()
        .sort_values("source")
    )
    names = list(seats_df["source"])
    seats = np.array(seats_df["seats"], dtype=np.int64)
    n = len(seats)
    assert n == em.BANZHAF_N
    total = int(seats.sum())
    quota = total // 2 + 1
    ids = np.arange(1 << n, dtype=np.int64)
    w = np.zeros(1 << n, dtype=np.int64)
    for j in range(n):
        w += seats[j] * ((ids >> j) & 1)
    swings = {}
    for j in range(n):
        mask = ((ids >> j) & 1) == 0
        swings[names[j]] = int(
            (mask & (w < quota) & (w + seats[j] >= quota)).sum()
        )
    total_swings = sum(swings.values())
    for j, name in enumerate(names):
        row = out.loc[name]
        assert int(row["seats"]) == int(seats[j])
        assert int(row["n_swings"]) == swings[name], name
        assert int(row["total_swings"]) == total_swings
        assert int(row["power_q"]) == (
            swings[name] * em.BANZHAF_SCALE
        ) // total_swings
    # symmetry: equal seats -> EXACTLY equal swings (two classes)
    by_seats = {}
    for name in names:
        by_seats.setdefault(int(out.loc[name, "seats"]), set()).add(
            int(out.loc[name, "n_swings"])
        )
    assert len(by_seats) == 2
    for cls, vals in by_seats.items():
        assert len(vals) == 1, cls
    # monotonicity: more seats, never fewer swings (strict here)
    s5 = next(iter(by_seats[5]))
    s4 = next(iter(by_seats[4]))
    assert s5 > s4
    # power diverges from seat share: the 5-seat class's power
    # premium exceeds its seat premium (the whole point of the index)
    seat_ratio = 5 / 4
    power_ratio = s5 / s4
    assert power_ratio > seat_ratio
