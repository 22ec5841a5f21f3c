"""Session-16 batch-6 laws (experimentation suite): two-proportion
z-test replayed from exact integers with the planted arm pinned,
diff-in-differences with the EXACT effect-recovery law (planted
metric minus raw metric == 10^10 micro-cents, no tolerance), and
CUPED replayed end-to-end with the discrete theta-optimality law
(theta_q +/- 1 can only raise the adjusted variance) and the
planted-cohort variance reduction visible (vr < 0.5)."""
import math
import os

import pandas as pd

import __spark_entry__ as em

SF01 = "/root/testdata/sf0.01"


def _events():
    return pd.read_parquet(os.path.join(SF01, "events.parquet"))


def test_prop_ztest_replay_and_planted(spark):
    out = em.q_prop_ztest(spark, SF01).toPandas()
    ev = _events()
    per = (
        ev.groupby(["event_type", "user_id"]).size().reset_index(name="n")
    )
    expected = {}
    for et, g in per.groupby("event_type"):
        t = (g["user_id"] % 2 == 1).astype(int)
        conv = (g["n"] >= em.CONV_K).astype(int)
        n1, x1 = int(t.sum()), int((t * conv).sum())
        n0, x0 = int((1 - t).sum()), int(((1 - t) * conv).sum())
        expected[et] = (n1, x1, n0, x0)
    expected["planted"] = em.PZ_OVL
    got = {}
    for r in out.itertuples():
        got[r.etype] = (int(r.n1), int(r.x1), int(r.n0), int(r.x0))
        n1, x1, n0, x0 = got[r.etype]
        x, n = x1 + x0, n1 + n0
        d = x1 * n0 - x0 * n1
        ok = 0 < x < n and n1 > 0 and n0 > 0
        sig = ok and 625 * d * d * n >= 2401 * n1 * n0 * x * (n - x)
        assert r.verdict == ("shift" if sig else "null"), r.etype
        if ok:
            zz = d / math.sqrt(n1 * n0 * (x * (n - x)) / n)
            assert abs(r.z - zz) < 1e-9
    assert got == expected
    assert out.set_index("etype").loc["planted", "verdict"] == "shift"
    assert (out["verdict"] == "null").sum() >= 3


def test_diff_in_diff_exact_effect_recovery(spark):
    out = em.q_diff_in_diff(spark, SF01).toPandas().set_index("metric")
    ev = _events()
    anchor = ev["ts"].min().replace(minute=0, second=0, microsecond=0)
    h = ((ev["ts"] - anchor).dt.total_seconds() // 3600).astype(int)
    t = (ev["user_id"] % 2 == 1).astype(int)
    post = (h >= em.DID_SPLIT_H).astype(int)
    c = (ev["value"] * 100).round().astype("int64")
    cells = {}
    for metric in ("value", "planted"):
        cc = c + (t * post * em.DID_PLANT_C if metric == "planted" else 0)
        ms = {}
        for tt in (0, 1):
            for pp in (0, 1):
                sel = cc[(t == tt) & (post == pp)]
                ms[(tt, pp)] = (int(sel.sum()) * em.DID_SCALE) // len(sel)
        did = (ms[(1, 1)] - ms[(1, 0)]) - (ms[(0, 1)] - ms[(0, 0)])
        cells[metric] = (ms, did)
    for metric, (ms, did) in cells.items():
        row = out.loc[metric]
        assert int(row["mt_post"]) == ms[(1, 1)]
        assert int(row["mt_pre"]) == ms[(1, 0)]
        assert int(row["mc_post"]) == ms[(0, 1)]
        assert int(row["mc_pre"]) == ms[(0, 0)]
        assert int(row["did_q"]) == did
    # the EXACT effect-recovery law: adding +10000 cents to
    # treated-post shifts the quantized treated-post mean by EXACTLY
    # 10000 * DID_SCALE, hence did_q by the same — zero tolerance
    assert (
        int(out.loc["planted", "did_q"]) - int(out.loc["value", "did_q"])
        == em.DID_PLANT_C * em.DID_SCALE
    )


def _cuped_users():
    ev = _events()
    anchor = ev["ts"].min().replace(minute=0, second=0, microsecond=0)
    h = ((ev["ts"] - anchor).dt.total_seconds() // 3600).astype(int)
    c = (ev["value"] * 100).round().astype("int64")
    df = pd.DataFrame(
        {"u": ev["user_id"], "post": (h >= em.DID_SPLIT_H).astype(int),
         "c": c}
    )
    users = {}
    for u, g in df.groupby("u"):
        users[int(u)] = (
            int(g.loc[g["post"] == 0, "c"].sum()),
            int(g.loc[g["post"] == 1, "c"].sum()),
        )
    for k in range(1, em.CUPED_OVL_N + 1):
        users[-k] = (k * 50000, k * 40000 + (k % 7) * 137)
    return users


def _tdiv(a: int, b: int) -> int:
    """Truncating division — Spark DIV and DuckDB // both truncate
    toward zero; Python // floors, which differs on negatives."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _adj_var(users, theta_q):
    zs = [
        _tdiv(y * em.CUPED_SCALE - theta_q * x, em.CUPED_SCALE)
        for x, y in users.values()
    ]
    n = len(zs)
    return n * sum(z * z for z in zs) - sum(zs) ** 2


def test_cuped_replay_theta_optimality_and_vr(spark):
    out = em.q_cuped_adjust(spark, SF01).toPandas()
    users = _cuped_users()
    n = len(users)
    xd = {u: (x // 100, y // 100) for u, (x, y) in users.items()}
    sx = sum(v[0] for v in xd.values())
    sy = sum(v[1] for v in xd.values())
    sxy = sum(v[0] * v[1] for v in xd.values())
    sxx = sum(v[0] * v[0] for v in xd.values())
    theta_q = ((n * sxy - sx * sy) * em.CUPED_SCALE) // (
        n * sxx - sx * sx
    )
    assert set(out["theta_q"].astype(int)) == {theta_q}
    ys = [y for _, y in users.values()]
    var_raw = n * sum(y * y for y in ys) - sum(ys) ** 2
    var_adj = _adj_var(users, theta_q)
    assert set(out["var_raw_num"].astype(int)) == {var_raw}
    assert set(out["var_adj_num"].astype(int)) == {var_adj}
    # per-arm sums replay — NOTE: Spark/DuckDB % keeps the dividend
    # sign, so every planted user (-k % 2 in {0, -1}) lands in
    # control; Python's floor-mod would disagree, hence the u > 0
    byarm = {0: [], 1: []}
    for u, (x, y) in users.items():
        tt = 1 if (u > 0 and u % 2 == 1) else 0
        z = _tdiv(y * em.CUPED_SCALE - theta_q * x, em.CUPED_SCALE)
        byarm[tt].append((y, z))
    for r in out.itertuples():
        ys_z = byarm[int(r.t)]
        assert int(r.n_users) == len(ys_z)
        assert int(r.sum_y) == sum(y for y, _ in ys_z)
        assert int(r.sum_z) == sum(z for _, z in ys_z)
    # discrete theta optimality: one quantum either way can only
    # raise the adjusted variance
    assert var_adj <= _adj_var(users, theta_q + 1)
    assert var_adj <= _adj_var(users, theta_q - 1)
    # the planted cohort makes the reduction REAL
    vr = var_adj / var_raw
    assert 0 < vr < 0.5
    assert abs(float(out["vr"].iloc[0]) - vr) < 1e-9
