"""Session-16 batch-17 laws: segmented trend replayed candidate-by-
candidate from exact integer OLS sums with the planted kink
recovered at zero SSE and exact slopes, and CIDR coalescing checked
for the partition laws (exact coverage, disjointness, per-level
minimality: no two full output siblings) plus a Python fixed-point
replay."""
import math
import os

import pandas as pd

import __spark_entry__ as em

SF01 = "/root/testdata/sf0.01"


def test_segmented_trend_replay_and_planted_kink(spark):
    out = em.q_segmented_trend(spark, SF01).toPandas().set_index(
        "metric"
    )
    ev = pd.read_parquet(os.path.join(SF01, "events.parquet"))
    anchor = ev["ts"].min().replace(minute=0, second=0, microsecond=0)
    h = ((ev["ts"] - anchor).dt.total_seconds() // 3600).astype(int)
    pur = ev[ev["event_type"] == em.SC_TREATED]
    counts = h[pur.index].value_counts().to_dict()
    hmax = int(h.max())
    ys = {
        "real": [counts.get(i, 0) for i in range(hmax + 1)],
        "planted": [
            3 * i if i < em.SEG_KINK_H
            else 3 * em.SEG_KINK_H + 7 * (i - em.SEG_KINK_H)
            for i in range(hmax + 1)
        ],
    }

    def fit(xs, yv):
        n = len(xs)
        sx, sy = sum(xs), sum(yv)
        sxy = sum(a * b for a, b in zip(xs, yv))
        sxx = sum(a * a for a in xs)
        syy = sum(b * b for b in yv)
        bn, bd = n * sxy - sx * sy, n * sxx - sx * sx
        sse = (
            float(syy) - float(sy * sy) / float(n)
            - float(bn) * float(bn) / float(n * bd)
        )
        return bn, bd, sse

    for metric, y in ys.items():
        best = None
        for h0 in range(em.SEG_STEP, hmax - em.SEG_STEP + 1, em.SEG_STEP):
            xl = list(range(h0))
            xr = list(range(h0, hmax + 1))
            bl = fit(xl, y[:h0])
            br = fit(xr, y[h0:])
            sq = math.floor((bl[2] + br[2]) * em.SEG_SCALE)
            key = (sq, h0)
            if best is None or key < best[0]:
                best = (key, bl, br)
        (sq, h0), bl, br = best
        row = out.loc[metric]
        assert int(row["break_h"]) == h0 and int(row["sse_q"]) == sq
        assert int(row["slope_l_num"]) == bl[0]
        assert int(row["slope_l_den"]) == bl[1]
        assert int(row["slope_r_num"]) == br[0]
        assert int(row["slope_r_den"]) == br[1]
    # planted kink: exact recovery at zero residual
    pl = out.loc["planted"]
    assert int(pl["break_h"]) == em.SEG_KINK_H
    assert int(pl["sse_q"]) == 0
    assert pl["slope_l"] == 3.0 and pl["slope_r"] == 7.0


def test_cidr_coalesce_partition_laws(spark):
    out = em.q_cidr_coalesce(spark, SF01).toPandas()
    ev = pd.read_parquet(os.path.join(SF01, "events.parquet"))
    p24 = set((ev["event_id"].astype("int64") * 2654435761) % 4096)
    # python fixed-point replay
    blocks = {(p, 24): 1 for p in p24}
    for lvl in range(em.CIDR_LEVELS):
        full, ml = 1 << lvl, 24 - lvl
        parents = {}
        for (pfx, m), cov in blocks.items():
            if m == ml and cov == full:
                parents.setdefault(pfx // 2, []).append((pfx, cov))
        for ppfx, kids in parents.items():
            if len(kids) == 2:
                for pfx, _ in kids:
                    del blocks[(pfx, ml)]
                blocks[(ppfx, ml - 1)] = 2 * full
    got = {
        (int(r.pfx), int(r.masklen)): int(r.n_covered)
        for r in out.itertuples()
    }
    assert got == blocks
    # exact coverage: blocks partition the original /24 set
    covered = set()
    for (pfx, m), cov in got.items():
        span = 1 << (24 - m)
        assert cov == span  # every emitted block is FULL
        rng = set(range(pfx * span, (pfx + 1) * span))
        assert not (rng & covered)  # disjoint
        covered |= rng
    assert covered == p24
    # minimality per level: no two full siblings both present
    for (pfx, m) in got:
        if m > 24 - em.CIDR_LEVELS:
            assert (pfx ^ 1, m) not in got or m == 24 - em.CIDR_LEVELS
    # coalescing is real at this density (~91% of /24s occupied)
    assert len(got) < len(p24) // 4
    assert any(m == 20 for _, m in got)
