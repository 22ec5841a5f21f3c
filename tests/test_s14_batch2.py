"""Session-14 batch-2 laws: politeness fold replay + spacing
invariant, CPM forward-DP replay + makespan law, spatial grid join
vs numpy brute force + cell-class non-vacuity."""
import os

import numpy as np
import pandas as pd

import __spark_entry__ as em

SF01 = "/root/testdata/sf0.01"


def test_politeness_schedule_fold_replay(spark):
    out = em.q_politeness_schedule(spark, SF01).toPandas()
    ev = pd.read_parquet(os.path.join(SF01, "events.parquet"))
    epoch = pd.Timestamp("2024-01-01 00:00:00")
    ev = ev.assign(avail=(ev["ts"] - epoch) // pd.Timedelta(microseconds=1))
    D = em.POLITE_DELAY_US
    expect = {}
    for host, grp in ev.groupby("user_id"):
        grp = grp.sort_values(["avail", "event_id"])
        t = None
        for seq, (eid, a) in enumerate(
            zip(grp["event_id"].to_numpy(), grp["avail"].to_numpy())
        ):
            t = int(a) if t is None else max(int(a), t + D)
            expect[int(eid)] = (int(host), seq, int(a), t)
    assert len(out) == len(expect)
    for _, r in out.iterrows():
        h, s, a, t = expect[int(r["event_id"])]
        assert (int(r["host"]), int(r["seq"]), int(r["avail_us"])) == (h, s, a)
        assert int(r["start_us"]) == t
        assert int(r["wait_us"]) == t - a
        assert int(r["delayed"]) == (1 if t > a else 0)
    # the schedule is feasible: per-host consecutive starts >= D apart
    for host, grp in out.groupby("host"):
        st = grp.sort_values("seq")["start_us"].to_numpy()
        assert (np.diff(st) >= D).all()
    assert (out["start_us"] >= out["avail_us"]).all()
    # both classes present (D=4h was tuned for a ~37% delayed mix)
    n_delayed = int(out["delayed"].sum())
    assert 0 < n_delayed < len(out)


def test_critical_path_dp_replay(spark):
    out = em.q_critical_path(spark, SF01).toPandas().set_index("task")
    docs = pd.read_parquet(os.path.join(SF01, "documents.parquet"))
    ids = sorted(int(u) for u in docs["doc_id"])
    es = {u: 0 for u in ids}
    for u, v, w in em._cpm_edges_py(ids):
        es[v] = max(es[v], es[u] + w)
    assert len(out) == len(ids)
    mk = {}
    for u in ids:
        dur = 1 + (u % 4) * 2
        assert int(out.loc[u, "es"]) == es[u]
        assert int(out.loc[u, "dur"]) == dur
        assert int(out.loc[u, "ef"]) == es[u] + dur
        b = u // em.CPM_BLOCK
        mk[b] = max(mk.get(b, 0), es[u] + dur)
    for u in ids:
        b = u // em.CPM_BLOCK
        assert int(out.loc[u, "block"]) == b
        assert int(out.loc[u, "makespan"]) == mk[b]
        assert int(out.loc[u, "tail_critical"]) == (
            1 if es[u] + 1 + (u % 4) * 2 == mk[b] else 0
        )
    # the DAG is non-degenerate: deep paths and varied path lengths
    assert max(es.values()) >= 40
    assert len(set(es.values())) >= 10
    # every block ends SOME task on the critical path
    assert out.groupby("block")["tail_critical"].sum().min() >= 1


def test_spatial_grid_join_vs_bruteforce(spark):
    out = em.q_spatial_grid_join(spark, SF01).toPandas()
    ev = pd.read_parquet(os.path.join(SF01, "events.parquet"))
    e = ev["event_id"].to_numpy().astype(np.int64)
    px, py, R = em.SPATIAL_PX, em.SPATIAL_PY, em.SPATIAL_R
    ex = e % px
    x = (ex * ex + 3 * ex) % px
    ey = e % py
    y = (7 * (ey * ey) + 11 * ey + 5) % py
    # chunked numpy brute force (N^2 pairs without an N^2 matrix)
    got = set(zip(out["a"].astype(int), out["b"].astype(int)))
    expect = set()
    order = np.argsort(e)
    e, x, y = e[order], x[order], y[order]
    for i in range(0, len(e), 512):
        sl = slice(i, i + 512)
        dx = x[sl, None] - x[None, :]
        dy = y[sl, None] - y[None, :]
        d2 = dx * dx + dy * dy
        ii, jj = np.nonzero(d2 <= R * R)
        for a, b in zip(e[sl][ii], e[jj]):
            if a < b:
                expect.add((int(a), int(b)))
    assert got == expect
    # dist_sq values are exact
    pos = {int(p): (int(a), int(b)) for p, a, b in zip(e, x, y)}
    for _, r in out.iterrows():
        ax, ay = pos[int(r["a"])]
        bx, by = pos[int(r["b"])]
        assert int(r["dist_sq"]) == (ax - bx) ** 2 + (ay - by) ** 2
    # both candidate classes exercised: same-cell and cross-cell pairs
    same = cross = 0
    for a, b in got:
        ca = (pos[a][0] // R, pos[a][1] // R)
        cb = (pos[b][0] // R, pos[b][1] // R)
        same += ca == cb
        cross += ca != cb
    assert same > 0 and cross > 0
