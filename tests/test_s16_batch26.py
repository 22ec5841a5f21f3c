"""Session-16 batch-26 laws: the LSH planner replayed pair-by-pair
with identical float discipline and the S-curve ordering laws
(more bands raise expected recall, more rows lower it), and the
weighted quantile replayed with the constant-weight degeneracy and
the planted heavy-top-decile shift."""
import hashlib
import math
import os

import pandas as pd

import __spark_entry__ as em
from tests.test_s16_batch8 import _hs

SF01 = "/root/testdata/sf0.01"


def test_lsh_planner_replay_and_scurve_laws(spark):
    out = em.q_lsh_planner(spark, SF01).toPandas()
    docs = pd.read_parquet(os.path.join(SF01, "documents.parquet"))
    hs = {int(r.doc_id): _hs(str(r.text)) for r in docs.itertuples()}
    ids = sorted(hs)
    pairs = []
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(hs[a] & hs[b])
            union = len(hs[a]) + len(hs[b]) - inter
            if inter >= 1 and 3 * inter >= len(hs[a]) + len(hs[b]):
                pairs.append((inter, union))
    got = {
        (int(r.bands), int(r.rows_per_band)): (
            int(r.n_true), int(r.sum_p_q)
        )
        for r in out.itertuples()
    }
    for (nb, nr) in em.LSH_PLAN_CONFIGS:
        total = 0
        for i, u in pairs:
            s = float(i) / float(u)
            sr = 1.0
            for _ in range(nr):
                sr = sr * s
            miss = 1.0
            for _ in range(nb):
                miss = miss * (1.0 - sr)
            total += math.floor((1.0 - miss) * em.LSH_PLAN_SCALE)
        assert got[(nb, nr)] == (len(pairs), total), (nb, nr)
    # S-curve ordering: recall grows with bands at fixed rows...
    r2 = {nb: got[(nb, 2)][1] for nb in (2, 4, 8)}
    assert r2[2] < r2[4] < r2[8]
    # ...and shrinks with rows at fixed bands
    assert got[(4, 4)][1] < got[(4, 2)][1]


def test_weighted_quantile_replay_and_shift(spark):
    out = em.q_weighted_quantile(spark, SF01).toPandas()
    ev = pd.read_parquet(os.path.join(SF01, "events.parquet"))
    c = (ev["value"] * 100).round().astype("int64")
    segs = {}
    for t, g in c.groupby(ev["event_type"]):
        rows = [
            (int(v), 1 + int(e) % 10, int(e))
            for v, e in zip(g, ev.loc[g.index, "event_id"])
        ]
        segs[t] = rows
    click = c[ev["event_type"] == "click"]
    segs["planted"] = [
        (int(v), 100 if int(v) >= 10000 else 1, int(e))
        for v, e in zip(click, ev.loc[click.index, "event_id"])
    ]
    got = {
        (r.etype, int(r.pct)): (int(r.value_c), int(r.total_w))
        for r in out.itertuples()
    }
    for t, rows in segs.items():
        rows = sorted(rows, key=lambda x: (x[0], x[2]))
        tw = sum(w for _, w, _ in rows)
        for p in em.WQ_PCTS:
            thresh = (p * tw + 99) // 100
            cw = 0
            val = None
            for v, w, _ in rows:
                cw += w
                if cw >= thresh:
                    val = v
                    break
            assert got[(t, p)] == (val, tw), (t, p)
    # constant-weight degeneracy: a synthetic all-1 replay equals
    # the plain order statistic at ceil(p*n/100)
    plain = sorted(v for v, _, _ in segs["click"])
    n = len(plain)
    for p in em.WQ_PCTS:
        k = (p * n + 99) // 100
        cw = 0
        val = None
        for i, v in enumerate(plain, 1):
            if i >= k:
                val = v
                break
        assert val == plain[k - 1]
    # the heavy tail (c >= $100, ~15% of rows, 100x weight) provably drags the weighted median right:
    # planted p50 lands far above click's p50
    assert got[("planted", 50)][0] > got[("click", 50)][0] + 9000
