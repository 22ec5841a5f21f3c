"""Session-16 batch-22 laws: log-rank replayed day-by-day from the
KM durations with both comparison verdicts pinned, and v-optimal
replayed candidate-by-candidate with the planted trimodal series
recovered at zero SSE plus the refinement law (the best 3-segment
SSE never exceeds any 2-segment merge of it)."""
import os

import pandas as pd

import __spark_entry__ as em

SF01 = "/root/testdata/sf0.01"


def _durations():
    ev = pd.read_parquet(os.path.join(SF01, "events.parquet"))
    t0 = pd.Timestamp("2024-01-01")
    sec = ((ev["ts"] - t0).dt.total_seconds()).astype("int64")
    out = {}
    for u, g in sec.groupby(ev["user_id"]):
        mask = ev.loc[g.index, "event_type"] == "purchase"
        tp = g[mask].min() if mask.any() else None
        tmin, tmax = int(g.min()), int(g.max())
        if tp is not None:
            out[int(u)] = ((int(tp) - tmin) // 86400, 1)
        else:
            out[int(u)] = ((tmax - tmin) // 86400, 0)
    return out


def _logrank(obs):
    """obs: list of (grp, day, event); returns (o_a, e_q, v_q)."""
    edays = sorted({d for g, d, e in obs if e == 1})
    o_a = sum(1 for g, d, e in obs if e == 1 and g == 0)
    e_q = v_q = 0
    for t in edays:
        at = [(g, d, e) for g, d, e in obs if d >= t]
        n = len(at)
        na = sum(1 for g, _, _ in at if g == 0)
        d_t = sum(1 for g, dd, e in obs if e == 1 and dd == t)
        e_q += (d_t * na * em.LR_SCALE) // n
        if n > 1:
            v_q += (
                d_t * na * (n - na) * (n - d_t) * em.LR_SCALE
            ) // (n * n * (n - 1))
    return o_a, e_q, v_q


def test_logrank_replay_and_verdicts(spark):
    out = em.q_logrank_test(spark, SF01).toPandas().set_index("cmp")
    durs = _durations()
    arms = [(u % 2, d, e) for u, (d, e) in durs.items()]
    planted = [(0, d, e) for u, (d, e) in durs.items() if u % 2 == 0]
    planted += [(1, k % 5, 1) for k in range(em.LR_PLANT_N)]
    for cmp_name, obs in (("arms", arms), ("planted", planted)):
        o_a, e_q, v_q = _logrank(obs)
        row = out.loc[cmp_name]
        assert int(row["o_a"]) == o_a
        assert int(row["e_a_q"]) == e_q
        assert int(row["var_q"]) == v_q
        dev = o_a * em.LR_SCALE - e_q
        sig = v_q > 0 and 625 * dev * dev >= 2401 * v_q * em.LR_SCALE
        assert row["verdict"] == ("differs" if sig else "null")
    # the planted separation fires; the effect-free arm split doesn't
    assert out.loc["planted", "verdict"] == "differs"
    assert out.loc["arms", "verdict"] == "null"


def _series():
    ev = pd.read_parquet(os.path.join(SF01, "events.parquet"))
    anchor = ev["ts"].min().replace(minute=0, second=0, microsecond=0)
    h = ((ev["ts"] - anchor).dt.total_seconds() // 3600).astype(int)
    pur = ev[ev["event_type"] == em.SC_TREATED]
    counts = h[pur.index].value_counts().to_dict()
    hmax = int(h.max())
    real = [counts.get(i, 0) for i in range(hmax + 1)]
    tri = [10 if i < 240 else 50 if i < 480 else 90
           for i in range(hmax + 1)]
    return {"real": real, "tri": tri}


def _sse_q(seg):
    n = len(seg)
    if n == 0:
        return 0
    s, ss = sum(seg), sum(v * v for v in seg)
    return (ss * n - s * s) * em.VOPT_SCALE // n


def test_voptimal_replay_and_refinement(spark):
    out = em.q_voptimal_histogram(spark, SF01).toPandas().set_index(
        "metric"
    )
    for metric, ys in _series().items():
        n = len(ys)
        edges = list(range(em.VOPT_BKT, n, em.VOPT_BKT))
        best = None
        for i, b1 in enumerate(edges):
            for b2 in edges[i + 1:]:
                tot = (
                    _sse_q(ys[:b1])
                    + _sse_q(ys[b1:b2])
                    + _sse_q(ys[b2:])
                )
                key = (tot, b1, b2)
                if best is None or key < best:
                    best = key
        row = out.loc[metric]
        assert (int(row["b1"]), int(row["b2"])) == (best[1], best[2])
        assert int(row["sse_q"]) == best[0]
        # refinement law: 3 segments never beat their own 2-segment
        # merges (dropping a boundary can only increase SSE)
        merged12 = _sse_q(ys[: best[2]]) + _sse_q(ys[best[2]:])
        merged23 = _sse_q(ys[: best[1]]) + _sse_q(ys[best[1]:])
        assert best[0] <= merged12 and best[0] <= merged23
    # the planted plateaus are recovered exactly at zero SSE
    assert (int(out.loc["tri", "b1"]), int(out.loc["tri", "b2"])) == (
        240, 480,
    )
    assert int(out.loc["tri", "sse_q"]) == 0
    assert int(out.loc["real", "sse_q"]) > 0
