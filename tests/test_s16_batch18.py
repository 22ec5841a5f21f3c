"""Session-16 batch-18 laws: Luhn replayed digit-by-digit with the
EXHAUSTIVE single-digit-substitution theorem (every one of the 9
possible flips at every one of the 16 positions invalidates, for a
sample of accounts), and the join-order DP replayed against
brute-force enumeration with the optimality law (the emitted plan
weakly beats every connected order) and the FK-containment sanity
(|customer ⋈ orders| estimates to |orders| exactly)."""
import os

import pandas as pd

import __spark_entry__ as em

SF01 = "/root/testdata/sf0.01"


def _digits(eid: int) -> list[int]:
    return [(eid * (i + 3) * 2654435761) % 10 for i in range(15)]


def _luhn_sum(payload: list[int], check: int) -> int:
    s = check
    for i, d in enumerate(payload):
        dist = 15 - i
        if dist % 2 == 1:
            d = d * 2 - (9 if d >= 5 else 0)
        s += d
    return s


def _check_digit(payload: list[int]) -> int:
    return (10 - _luhn_sum(payload, 0) % 10) % 10


def test_luhn_replay_and_substitution_theorem(spark):
    out = em.q_luhn_checksum(spark, SF01).toPandas().set_index("etype")
    ev = pd.read_parquet(os.path.join(SF01, "events.parquet"))
    agg = {}
    for r in ev.itertuples():
        eid = int(r.event_id)
        pay = _digits(eid)
        chk = _check_digit(pay)
        corrupt = eid % em.LUHN_CORRUPT_MOD == 3
        if corrupt:
            pos = eid % 15
            pay = list(pay)
            pay[pos] = (pay[pos] + 1 + eid % 9) % 10
        valid = _luhn_sum(pay, chk) % 10 == 0
        a = agg.setdefault(r.event_type, [0, 0, 0, 0, 0])
        a[0] += 1
        if corrupt:
            a[3] += 1
            a[4] += int(valid)
        else:
            a[1] += 1
            a[2] += int(valid)
    for t, a in agg.items():
        row = out.loc[t]
        assert [
            int(row["n"]), int(row["n_clean"]), int(row["n_clean_valid"]),
            int(row["n_corrupt"]), int(row["n_corrupt_valid"]),
        ] == a
    # the driver-visible law: clean 100% valid, corrupted 100% caught
    assert (out["n_clean_valid"] == out["n_clean"]).all()
    assert (out["n_corrupt_valid"] == 0).all()
    # the theorem itself, exhaustively on a sample: EVERY single-digit
    # substitution at EVERY position invalidates
    for eid in list(ev["event_id"].astype(int))[:20]:
        pay = _digits(eid)
        chk = _check_digit(pay)
        assert _luhn_sum(pay, chk) % 10 == 0
        for pos in range(15):
            for delta in range(1, 10):
                mut = list(pay)
                mut[pos] = (mut[pos] + delta) % 10
                assert _luhn_sum(mut, chk) % 10 != 0
        for delta in range(1, 10):  # and the check digit slot too
            assert _luhn_sum(pay, (chk + delta) % 10) % 10 != 0


def test_join_order_dp_replay_and_optimality(spark):
    out = em.q_join_order_dp(spark, SF01).toPandas()
    import duckdb

    con = duckdb.connect()
    for t in em._JOIN_PATH:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF01}/{t}.parquet')"
        )
    rows = {
        i: con.execute(f"SELECT COUNT(*) FROM {t}").fetchone()[0]
        for i, t in enumerate(em._JOIN_PATH)
    }
    ndv = {}
    for e, (ka, kb) in em._JOIN_KEYS.items():
        ta, tb = em._JOIN_PATH[e], em._JOIN_PATH[e + 1]
        ndv[(e, e)] = con.execute(
            f"SELECT COUNT(DISTINCT {ka}) FROM {ta}"
        ).fetchone()[0]
        ndv[(e, e + 1)] = con.execute(
            f"SELECT COUNT(DISTINCT {kb}) FROM {tb}"
        ).fetchone()[0]
    costs = {
        order: em._join_cost(rows, ndv, order)
        for order in em._join_orders()
    }
    best_order = min(costs, key=lambda o: (costs[o][0], o))
    best_cost, steps = costs[best_order]
    plan = ">".join(em._JOIN_PATH[i] for i in best_order)
    assert set(out["plan"]) == {plan}
    assert set(out["total_cost"].astype(int)) == {best_cost}
    got_steps = [
        (r.table_added, int(r.est_rows))
        for r in out.sort_values("step").itertuples()
    ]
    assert got_steps == [
        (em._JOIN_PATH[t], est) for t, est in steps
    ]
    # optimality: the winner weakly beats every connected order, and
    # at least one alternative is STRICTLY worse (non-vacuous choice)
    assert all(costs[o][0] >= best_cost for o in costs)
    assert any(costs[o][0] > best_cost for o in costs)
    # FK containment sanity: joining orders into customer estimates
    # |orders| exactly (every order has exactly one customer)
    co = em._join_cost(rows, ndv, (0, 1))[1]
    assert co[0][1] == rows[1]
    # 8 connected left-deep orders over a 4-node path (2^(n-1))
    assert len(costs) == 8
