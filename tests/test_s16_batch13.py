"""Session-16 batch-13 laws: synthetic control replayed from exact
integer normal equations with the Cramer orthogonality identity
(X'(det·y − X·w_num) == 0, all-BIGINT) and the planted 2x+3y+lift
series recovered with ZERO tolerance, and the mix/rate
decomposition checked against the exact-rational additivity
identity via Fractions with quantization slack bounded by the
segment count."""
import os
from fractions import Fraction

import pandas as pd

import __spark_entry__ as em

SF01 = "/root/testdata/sf0.01"


def _grid():
    ev = pd.read_parquet(os.path.join(SF01, "events.parquet"))
    anchor = ev["ts"].min().replace(minute=0, second=0, microsecond=0)
    h = ((ev["ts"] - anchor).dt.total_seconds() // 3600).astype(int)
    counts = ev.assign(h=h).groupby(["event_type", "h"]).size().to_dict()
    hmax = max(k[1] for k in counts)
    def s(t):
        return [counts.get((t, hh), 0) for hh in range(hmax + 1)]
    return s, hmax


def test_synthetic_control_replay_and_planted(spark):
    out = em.q_synthetic_control(spark, SF01).toPandas().set_index(
        "metric"
    )
    s, hmax = _grid()
    x1, x2 = s(em.SC_DONORS[0]), s(em.SC_DONORS[1])
    ys = {
        "real": s(em.SC_TREATED),
        "planted": [
            2 * a + 3 * b + (em.SC_LIFT if hh >= em.DID_SPLIT_H else 0)
            for hh, (a, b) in enumerate(zip(x1, x2))
        ],
    }
    for metric, y in ys.items():
        pre = range(em.DID_SPLIT_H)
        post = range(em.DID_SPLIT_H, hmax + 1)
        a = sum(x1[i] ** 2 for i in pre)
        b = sum(x1[i] * x2[i] for i in pre)
        cc = sum(x2[i] ** 2 for i in pre)
        p = sum(x1[i] * y[i] for i in pre)
        q = sum(x2[i] * y[i] for i in pre)
        det = a * cc - b * b
        w1n, w2n = cc * p - b * q, a * q - b * p
        eff = (
            det * sum(y[i] for i in post)
            - w1n * sum(x1[i] for i in post)
            - w2n * sum(x2[i] for i in post)
        )
        row = out.loc[metric]
        assert int(row["w1_num"]) == w1n and int(row["w2_num"]) == w2n
        assert int(row["det"]) == det
        assert int(row["effect_num"]) == eff
        assert int(row["n_post"]) == len(list(post))
        # Cramer orthogonality: the normal equations hold exactly
        assert a * w1n + b * w2n == det * p
        assert b * w1n + cc * w2n == det * q
    # planted recovery with ZERO tolerance: weights (2, 3) exactly,
    # effect exactly lift per post hour
    pl = out.loc["planted"]
    assert int(pl["w1_num"]) == 2 * int(pl["det"])
    assert int(pl["w2_num"]) == 3 * int(pl["det"])
    assert (
        int(pl["effect_num"])
        == em.SC_LIFT * int(pl["n_post"]) * int(pl["det"])
    )
    assert pl["w1"] == 2.0 and pl["w2"] == 3.0
    assert pl["effect_per_hour"] == float(em.SC_LIFT)


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_mix_rate_decomposition_replay_and_additivity(spark):
    out = em.q_mix_rate_decomposition(spark, SF01).toPandas()
    ev = pd.read_parquet(os.path.join(SF01, "events.parquet"))
    anchor = ev["ts"].min().replace(minute=0, second=0, microsecond=0)
    h = ((ev["ts"] - anchor).dt.total_seconds() // 3600).astype(int)
    post = (h >= em.DID_SPLIT_H).astype(int)
    c = (ev["value"] * 100).round().astype("int64")
    df = pd.DataFrame({"t": ev["event_type"], "p": post, "c": c})
    cells = {}
    for t, g in df.groupby("t"):
        cells[t] = (
            int((g["p"] == 0).sum()), int(g.loc[g["p"] == 0, "c"].sum()),
            int((g["p"] == 1).sum()), int(g.loc[g["p"] == 1, "c"].sum()),
        )
    n1 = sum(v[0] for v in cells.values())
    n2 = sum(v[2] for v in cells.values())
    S = em.MRD_SCALE
    got = {r.etype: r for r in out.itertuples()}
    for t, (n1s, s1c, n2s, s2c) in cells.items():
        r1q = _tdiv(s1c * S, n1s)
        r2q = _tdiv(s2c * S, n2s)
        mix = _tdiv((n2s * n1 - n1s * n2) * r1q, n1 * n2)
        rate = _tdiv(n2s * (r2q - r1q), n2)
        r = got[t]
        assert (int(r.n1_s), int(r.s1_c), int(r.n2_s), int(r.s2_c)) == (
            n1s, s1c, n2s, s2c
        )
        assert int(r.rate1_q) == r1q and int(r.rate2_q) == r2q
        assert int(r.mix_q) == mix and int(r.rate_q) == rate
    # exact-rational identity: sum over segments of
    # (share2-share1)*rate1 + share2*(rate2-rate1) == KPI2 - KPI1
    total = Fraction(0)
    for n1s, s1c, n2s, s2c in cells.values():
        sh1, sh2 = Fraction(n1s, n1), Fraction(n2s, n2)
        rt1, rt2 = Fraction(s1c, n1s), Fraction(s2c, n2s)
        total += (sh2 - sh1) * rt1 + sh2 * (rt2 - rt1)
    d_kpi = Fraction(sum(v[3] for v in cells.values()), n2) - Fraction(
        sum(v[1] for v in cells.values()), n1
    )
    assert total == d_kpi
    # quantized engine parts land within per-segment slack of exact
    qsum = sum(int(r.mix_q) + int(r.rate_q) for r in out.itertuples())
    slack = 3 * len(cells)  # <= 3 truncations per segment
    assert abs(qsum - int(d_kpi * S)) <= slack + 1
