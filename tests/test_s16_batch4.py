"""Session-16 batch-4 laws: Theil-Sen replayed slope-by-slope with
the outlier-immunity contrast (median slope exactly 5.0 where OLS
is dragged off by the planted spikes), isotonic fit replayed from
the quantized minimax identity AND checked against a Fraction-exact
sequential PAV within one quantization unit plus the monotonicity
law, and HITS replayed as exact integer path counts with the
hub/authority asymmetry proven non-vacuous."""
import os
from fractions import Fraction

import pandas as pd

import __spark_entry__ as em

SF01 = "/root/testdata/sf0.01"


def _series():
    ev = pd.read_parquet(os.path.join(SF01, "events.parquet")).sort_values(
        ["user_id", "ts", "event_id"]
    )
    s = {int(u): list(map(float, g["value"])) for u, g in ev.groupby("user_id")}
    s[-1] = [
        1000000.0 if i in em.TS_OVL_OUTLIERS
        else float(i * em.TS_OVL_SLOPE + 7)
        for i in range(1, em.TS_OVL_N + 1)
    ]
    return s


def test_theil_sen_replay_and_robustness(spark):
    out = em.q_theil_sen(spark, SF01).toPandas()
    got = {
        int(r.user_id): (int(r.n_pairs), float(r.slope_med))
        for r in out.itertuples()
    }
    for u, vs in _series().items():
        slopes = []
        n = len(vs)
        for i in range(n):
            for j in range(i + 1, n):
                slopes.append(((vs[j] - vs[i]) / (j - i), i + 1, j + 1))
        slopes.sort()
        np_ = len(slopes)
        lo, hi = (np_ + 1) // 2, (np_ + 2) // 2
        picked = [slopes[lo - 1][0], slopes[hi - 1][0]][: 2 if lo != hi else 1]
        med = sum(picked) / len(picked)
        assert got[u][0] == np_
        assert abs(got[u][1] - med) < 1e-9, u
    # planted line: median slope is EXACTLY 5.0 despite three spikes
    assert got[-1][1] == float(em.TS_OVL_SLOPE)
    # ...where OLS is dragged far off (the breakdown contrast)
    vs = _series()[-1]
    n = len(vs)
    xm, ym = (n + 1) / 2, sum(vs) / n
    beta = sum((i - xm) * (vs[i - 1] - ym) for i in range(1, n + 1)) / sum(
        (i - xm) ** 2 for i in range(1, n + 1)
    )
    assert abs(beta - em.TS_OVL_SLOPE) > 100


def _py_pav_exact(ys: list[int]) -> list[Fraction]:
    """Sequential pool-adjacent-violators, exact rationals."""
    blocks: list[tuple[Fraction, int]] = []  # (mean, size)
    for y in ys:
        blocks.append((Fraction(y), 1))
        while len(blocks) > 1 and blocks[-2][0] >= blocks[-1][0]:
            (m1, s1), (m2, s2) = blocks[-2], blocks[-1]
            blocks[-2:] = [((m1 * s1 + m2 * s2) / (s1 + s2), s1 + s2)]
    out = []
    for m, s in blocks:
        out.extend([m] * s)
    return out


def test_isotonic_fit_replay_minimax_and_pav(spark):
    out = em.q_isotonic_fit(spark, SF01).toPandas()
    docs = pd.read_parquet(os.path.join(SF01, "documents.parquet"))
    for src, g in docs.groupby("source"):
        rows = []
        for r in g.itertuples():
            toks = str(r.text).split(" ")
            score = sum(1 for t in toks if t == em.AP_SCORE_TOK)
            y = int(
                em.AP_REL_TOK in toks
                or int(r.doc_id) % em.AP_REL_MOD == em.AP_REL_RES
            )
            rows.append((score, int(r.doc_id), y))
        rows.sort()
        ys = [y for _, _, y in rows]
        n = len(ys)
        pre = [0]
        for y in ys:
            pre.append(pre[-1] + y)
        # quantized minimax replay
        q = {
            (j, k): ((pre[k] - pre[j - 1]) * em.ISO_SCALE) // (k - j + 1)
            for j in range(1, n + 1)
            for k in range(j, n + 1)
        }
        fit_q = [
            max(min(q[(j, k)] for k in range(i, n + 1))
                for j in range(1, i + 1))
            for i in range(1, n + 1)
        ]
        sub = out[out["source"] == src].sort_values("rn")
        assert [int(v) for v in sub["fit_q"]] == fit_q, src
        # monotone non-decreasing (survives quantization structurally)
        assert all(a <= b for a, b in zip(fit_q, fit_q[1:]))
        # within one quantization unit of Fraction-exact PAV
        pav = _py_pav_exact(ys)
        for fq, ex in zip(fit_q, pav):
            assert abs(Fraction(fq, em.ISO_SCALE) - ex) <= Fraction(
                2, em.ISO_SCALE
            )


def test_hits_replay_and_asymmetry(spark):
    from pyspark.sql import functions as F
    from ocular_spark.functions import html as H

    out = em.q_hits_scores(spark, SF01).toPandas()
    d = spark.read.parquet(os.path.join(SF01, "documents.parquet"))
    wrapped = d.select("doc_id", F.expr(H.wrap_links_spark()).alias("html"))
    edges = {
        (int(r.src), int(r.dd))
        for r in wrapped.select(
            F.col("doc_id").alias("src"),
            F.explode(F.expr(H.doc_links_expr("html"))).alias("dd"),
        ).collect()
    }
    nodes = {s for s, _ in edges} | {t for _, t in edges}
    a1 = {n: 0 for n in nodes}
    for _, t in edges:
        a1[t] += 1
    h1 = {n: 0 for n in nodes}
    for s, t in edges:
        h1[s] += a1[t]
    a2 = {n: 0 for n in nodes}
    for s, t in edges:
        a2[t] += h1[s]
    h2 = {n: 0 for n in nodes}
    for s, t in edges:
        h2[s] += a2[t]
    got = {
        int(r.node): (int(r.a1), int(r.h1), int(r.a2), int(r.h2))
        for r in out.itertuples()
    }
    assert got == {n: (a1[n], h1[n], a2[n], h2[n]) for n in nodes}
    # hub/authority asymmetry is real on this graph: the two score
    # orders DISAGREE for some node pair (a single conflated score
    # could not represent both), and both scores genuinely vary
    vals = list(got.values())
    assert len({v[2] for v in vals}) > 1 and len({v[3] for v in vals}) > 1
    assert any(
        x[2] > y[2] and x[3] < y[3] for x in vals for y in vals
    )
