"""Session-16 batch-1 laws: Mann-Kendall trend replayed pairwise
from pandas with both signed verdicts pinned by the monotone
overlay, Mann-Whitney U replayed rank-by-rank with the all-tie
null user exercising the tie-corrected variance, and Average
Precision replayed from the quantized integer formula with the
swap-monotonicity law (promoting a relevant doc never lowers AP).
"""
import math
import os

import pandas as pd

import __spark_entry__ as em

SF01 = "/root/testdata/sf0.01"


def _events():
    return pd.read_parquet(os.path.join(SF01, "events.parquet"))


def _mk_series():
    """(user -> time-ordered value list) incl. the two overlay users."""
    ev = _events().sort_values(["user_id", "ts", "event_id"])
    series = {
        int(u): list(g["value"]) for u, g in ev.groupby("user_id")
    }
    n = em.MK_OVERLAY_N
    series[-1] = [float(i) for i in range(1, n + 1)]
    series[-2] = [float(n + 1 - i) for i in range(1, n + 1)]
    return series


def test_mann_kendall_replay_and_overlay(spark):
    out = em.q_mann_kendall(spark, SF01).toPandas()
    got = {
        int(r.user_id): (int(r.n), int(r.s), int(r.var18), r.trend)
        for r in out.itertuples()
    }
    expected = {}
    for u, vs in _mk_series().items():
        n = len(vs)
        if n < em.MK_MIN_N:
            continue
        s = 0
        for i in range(n):
            for j in range(i + 1, n):
                s += (vs[j] > vs[i]) - (vs[j] < vs[i])
        ties: dict[float, int] = {}
        for v in vs:
            ties[v] = ties.get(v, 0) + 1
        t18 = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
        var18 = n * (n - 1) * (2 * n + 5) - t18
        s_adj = max(abs(s) - 1, 0)
        sig = s != 0 and 625 * 18 * s_adj * s_adj >= 2401 * var18
        trend = (
            ("increasing" if s > 0 else "decreasing") if sig else "no_trend"
        )
        expected[u] = (n, s, var18, trend)
    assert got == expected
    # overlay pins both signed verdicts; a tie-free monotone series
    # has S = +/- n(n-1)/2 exactly
    n = em.MK_OVERLAY_N
    assert got[-1][1] == n * (n - 1) // 2 and got[-1][3] == "increasing"
    assert got[-2][1] == -n * (n - 1) // 2 and got[-2][3] == "decreasing"
    # real users supply the third class
    assert "no_trend" in set(out["trend"])
    # z matches the shared-sqrt formula at 9 dp
    for r in out.itertuples():
        s, var18 = int(r.s), int(r.var18)
        if var18 == 0 or s == 0:
            assert r.z == 0.0
        else:
            zz = (s - (1 if s > 0 else -1)) / math.sqrt(var18 / 18.0)
            assert abs(r.z - zz) < 1e-9


def test_mann_whitney_replay_and_tie_null(spark):
    out = em.q_mann_whitney(spark, SF01).toPandas()
    ev = _events()
    samples: dict[int, list[tuple[int, float]]] = {}
    for r in ev.itertuples():
        samples.setdefault(int(r.user_id), []).append(
            (1 if r.event_type == em.MW_GRP_TYPE else 0, float(r.value))
        )
    samples[-1] = [(1, float(i + 100)) for i in range(1, 11)] + [
        (0, float(i)) for i in range(1, 11)
    ]
    samples[-2] = [(1, float(i)) for i in range(1, 11)] + [
        (0, float(i)) for i in range(1, 11)
    ]
    expected = {}
    for u, rows in samples.items():
        n1 = sum(g for g, _ in rows)
        n2 = len(rows) - n1
        if n1 < em.MW_MIN_N or n2 < em.MW_MIN_N:
            continue
        vs = sorted(v for _, v in rows)
        # 2*avg-rank per value (exact integers)
        rank2 = {}
        i = 0
        while i < len(vs):
            j = i
            while j < len(vs) and vs[j] == vs[i]:
                j += 1
            rank2[vs[i]] = (i + 1) + j  # 2*avg of ranks i+1..j
            i = j
        r1_2 = sum(rank2[v] for g, v in rows if g == 1)
        u2 = r1_2 - n1 * (n1 + 1)
        e2 = n1 * n2
        ties: dict[float, int] = {}
        for _, v in rows:
            ties[v] = ties.get(v, 0) + 1
        tsum = sum(t * t * t - t for t in ties.values())
        nn = n1 + n2
        vnum = n1 * n2 * (nn * (nn - 1) * (nn + 1) - tsum)
        d = u2 - e2
        sig = vnum > 0 and 625 * 3 * nn * (nn - 1) * d * d >= 2401 * vnum
        expected[u] = (n1, n2, u2, e2, vnum, "shift" if sig else "null")
    got = {
        int(r.user_id): (
            int(r.n1), int(r.n2), int(r.u2), int(r.e2), int(r.vnum),
            r.verdict,
        )
        for r in out.itertuples()
    }
    assert got == expected
    # fully separated overlay: U1 maximal (u2 = 2*n1*n2), 'shift'
    assert got[-1][2] == 2 * got[-1][3] and got[-1][5] == "shift"
    # identical-sample overlay: u2 == e2 and the tie sum is exercised
    assert got[-2][2] == got[-2][3] and got[-2][5] == "null"
    assert expected[-2][4] < 20 * 19 * 21 * 100  # tie correction bit


def _ap_quantized(ranked_rels: list[int]) -> tuple[int, int]:
    """(ap_num, n_rel) from the quantized integer formula."""
    ck, ap_num = 0, 0
    for k, rel in enumerate(ranked_rels, start=1):
        ck += rel
        if rel:
            ap_num += (ck * em.AP_SCALE) // k
    return ap_num, ck


def test_avg_precision_replay_and_swap_law(spark):
    out = em.q_avg_precision(spark, SF01).toPandas()
    docs = pd.read_parquet(os.path.join(SF01, "documents.parquet"))
    expected = {}
    for src, g in docs.groupby("source"):
        rows = []
        for r in g.itertuples():
            toks = str(r.text).split(" ")
            score = sum(1 for t in toks if t == em.AP_SCORE_TOK)
            rel = int(
                em.AP_REL_TOK in toks
                or int(r.doc_id) % em.AP_REL_MOD == em.AP_REL_RES
            )
            rows.append((score, int(r.doc_id), rel))
        rows.sort(key=lambda t: (-t[0], t[1]))
        ap_num, n_rel = _ap_quantized([rel for _, _, rel in rows])
        if n_rel >= 1:
            expected[src] = (len(rows), n_rel, ap_num)
    got = {
        r.source: (int(r.n_docs), int(r.n_rel), int(r.ap_num))
        for r in out.itertuples()
    }
    assert got == expected
    # every source has both classes -> 0 < ap < 1 strictly somewhere,
    # and ap is a genuine probability-scaled score
    assert ((out["ap"] > 0) & (out["ap"] <= 1)).all()
    assert (out["n_rel"] < out["n_docs"]).all()
    # ap column equals the one-division assembly at 9 dp
    for r in out.itertuples():
        assert abs(r.ap - r.ap_num / (r.n_rel * em.AP_SCALE)) < 1e-12


def test_avg_precision_laws_pure():
    # perfect ranking: AP == 1 exactly (quantization is exact at c_k==k)
    ap_num, n_rel = _ap_quantized([1, 1, 1, 0, 0])
    assert ap_num == 3 * em.AP_SCALE and n_rel == 3
    # swap law: promoting a relevant doc past an irrelevant one above
    # it strictly increases AP
    worse = [0, 1, 0, 1]
    better = [1, 0, 0, 1]
    assert _ap_quantized(better)[0] > _ap_quantized(worse)[0]
    # worst ranking lower-bounds at R/N-ish, never 0 when R >= 1
    assert _ap_quantized([0, 0, 0, 1])[0] > 0
