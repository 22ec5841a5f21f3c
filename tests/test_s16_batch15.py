"""Session-16 batch-15 laws: TextTiling replayed gap-by-gap in pure
Python with the vocab-disjoint planted seam recovered as the unique
zero-cohesion boundary, and the watermark audit replayed with the
monotone-drops law and the provable 7200-second zero point."""
import os

import pandas as pd

import __spark_entry__ as em

SF01 = "/root/testdata/sf0.01"


def _blocks(text: str):
    toks = [t for t in text.split(" ") if t]
    out = []
    for i in range(0, len(toks), em.TT_BLOCK):
        blk = {}
        for t in toks[i:i + em.TT_BLOCK]:
            blk[t] = blk.get(t, 0) + 1
        out.append(blk)
    return out


def test_texttiling_replay_and_planted_seam(spark):
    out = em.q_texttiling_boundaries(spark, SF01).toPandas()
    docs = pd.read_parquet(os.path.join(SF01, "documents.parquet"))
    texts = {int(r.doc_id): str(r.text) for r in docs.itertuples()}
    texts[-1] = " ".join(["L"] * 20 + ["R"] * 20)
    expected = {}
    for d, text in texts.items():
        blocks = _blocks(text)
        if len(blocks) < 2:
            continue
        gaps = []
        for g in range(len(blocks) - 1):
            a, b = blocks[g], blocks[g + 1]
            dot = sum(a[t] * b.get(t, 0) for t in a)
            na = sum(v * v for v in a.values())
            nb = sum(v * v for v in b.values())
            simq = (dot * dot * em.TT_SCALE) // (na * nb)
            gaps.append((g, dot, simq))
        n, total = len(gaps), sum(s for _, _, s in gaps)
        for i, (g, dot, simq) in enumerate(gaps):
            left = gaps[i - 1][2] if i > 0 else None
            right = gaps[i + 1][2] if i < n - 1 else None
            bnd = (
                simq * n < total
                and (left is None or simq <= left)
                and (right is None or simq <= right)
            )
            expected[(d, g)] = (dot, simq, int(bnd))
    got = {
        (int(r.doc_id), int(r.g)): (int(r.dot), int(r.simq),
                                    int(r.is_boundary))
        for r in out.itertuples()
    }
    assert got == expected
    # the planted seam: 4 blocks, gap 1 (L-block vs R-block) has
    # ZERO cohesion and is the unique boundary
    plant = {g: v for (d, g), v in got.items() if d == -1}
    assert plant[1] == (0, 0, 1)
    assert plant[0][2] == 0 and plant[2][2] == 0
    # boundaries exist in the organic corpus too (below-mean minima)
    organic = [v for (d, _), v in got.items() if d >= 0]
    n_bnd = sum(b for _, _, b in organic)
    assert 0 < n_bnd < len(organic)


def test_late_arrival_audit_replay_and_monotonicity(spark):
    out = em.q_late_arrival_audit(spark, SF01).toPandas().set_index(
        "w_secs"
    )
    ev = pd.read_parquet(os.path.join(SF01, "events.parquet"))
    anchor = ev["ts"].min().replace(minute=0, second=0, microsecond=0)
    t = ((ev["ts"] - anchor).dt.total_seconds() // 1).astype("int64")
    eid = ev["event_id"].astype("int64")
    wend = (t // 3600 + 1) * 3600
    arrival = t + (eid * em.LATE_DELAY_MUL) % em.LATE_DELAY_MOD
    for w in em.LATE_WATERMARKS:
        dropped = int((arrival > wend + w).sum())
        row = out.loc[w]
        assert int(row["n_dropped"]) == dropped
        assert int(row["n_total"]) == len(ev)
        assert int(row["max_late_secs"]) == int((arrival - wend).max())
    # drops are monotone non-increasing in the watermark, and the
    # 7200-second point is provably zero (delay < 7200, t < wend)
    drops = [int(out.loc[w, "n_dropped"]) for w in em.LATE_WATERMARKS]
    assert drops == sorted(drops, reverse=True)
    assert drops[-1] == 0
    # tight watermarks genuinely drop data at this delay profile
    assert drops[0] > 1000
