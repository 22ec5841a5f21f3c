"""Session-14 batch-7 laws: ray-casting replay + concavity + bbox
falsification, knapsack DP vs independent brute force + feasibility,
activity-selection greedy replay + DP optimality proof."""
import bisect
import math
import os

import pandas as pd

import __spark_entry__ as em

SF01 = "/root/testdata/sf0.01"


def _inside(px, py, poly):
    cnt = 0
    n = len(poly)
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        if y1 == y2:
            continue
        if y1 > y2:
            x1, y1, x2, y2 = x2, y2, x1, y1
        if y1 <= py < y2 and (px - x1) * (y2 - y1) < (x2 - x1) * (py - y1):
            cnt += 1
    return cnt % 2 == 1


def test_point_in_polygon_replay(spark):
    out = em.q_point_in_polygon(spark, SF01).toPandas()
    notch_cases = 0
    per_poly = {p: 0 for p in em.PIP_POLYS}
    for _, r in out.iterrows():
        x, y = int(r["x"]), int(r["y"])
        mask = n = 0
        for p, poly in em.PIP_POLYS.items():
            if _inside(x, y, poly):
                mask |= 1 << p
                n += 1
            per_poly[p] += _inside(x, y, poly)
        assert int(r["n_inside"]) == n
        assert int(r["poly_mask"]) == mask
        # concavity law: inside the C-polygon's bbox but OUTSIDE it
        cx = 5000 <= x <= 45000 and 40000 <= y <= 85000
        if cx and not (mask & 4):
            notch_cases += 1
    assert all(v > 500 for v in per_poly.values())
    assert notch_cases > 100  # the bbox test would get these wrong


def test_knapsack_plan_vs_bruteforce(spark):
    out = em.q_knapsack_plan(spark, SF01).toPandas().set_index("block")
    docs = pd.read_parquet(os.path.join(SF01, "documents.parquet"))
    docs = docs.sort_values("doc_id")
    blocks = {}
    for d, nc in zip(docs["doc_id"], docs["n_chars"]):
        blocks.setdefault(int(d) // em.KNAP_BLOCK, []).append(
            ((int(nc) % 50) + 10, int(nc))
        )
    for blk, items in blocks.items():
        cap = sum(w for w, _ in items) * em.KNAP_CAP_NUM // em.KNAP_CAP_DEN
        bv, bw = 0, 0
        for mask in range(1 << len(items)):
            w = v = 0
            for i, (iw, ivl) in enumerate(items):
                if (mask >> i) & 1:
                    w += iw
                    v += ivl
            if w <= cap and (v > bv or (v == bv and w < bw)):
                bv, bw = v, w
        r = out.loc[blk]
        assert int(r["n_items"]) == len(items)
        assert int(r["cap"]) == cap
        assert int(r["best_value"]) == bv
        assert int(r["best_weight"]) == bw
        # feasibility + non-vacuity: budget binds (can't take all)
        assert bw <= cap
        assert bv < sum(v for _, v in items)
        assert bv > 0


def _max_nonoverlap(intervals):
    """Independent optimality check: weighted-free interval DP via
    sort-by-end + binary search (NOT the greedy)."""
    ivs = sorted(intervals, key=lambda t: t[1])
    ends = [e for _, e in ivs]
    best = [0] * (len(ivs) + 1)
    for i, (s, e) in enumerate(ivs):
        j = bisect.bisect_right(ends, s, 0, i)
        best[i + 1] = max(best[i], best[j] + 1)
    return best[len(ivs)]


def test_activity_select_greedy_and_optimality(spark):
    out = em.q_activity_select(spark, SF01).toPandas()
    ev = pd.read_parquet(os.path.join(SF01, "events.parquet"))
    epoch = pd.Timestamp("2024-01-01 00:00:00")
    us = (ev["ts"] - epoch) // pd.Timedelta(microseconds=1)
    ev = ev.assign(
        s=us.astype(int),
        e=(us + (ev["value"] * 100 + 0.5).apply(math.floor).astype(int)
           * em.ACT_DUR_US_PER_CENT).astype(int),
    )
    total_kept = 0
    for host, g in ev.groupby("user_id"):
        rows = sorted(zip(g["e"], g["event_id"], g["s"]))
        kept = []
        last = None
        for e, eid, s in rows:
            if last is None or s >= last:
                last = int(e)
                kept.append((int(eid), int(s), int(e)))
        got = out[out["host"] == int(host)].sort_values("k_idx")
        assert [int(x) for x in got["event_id"]] == [k[0] for k in kept]
        assert got["k_idx"].tolist() == list(range(1, len(kept) + 1))
        # kept set is pairwise non-overlapping and in end order
        for (_, s1, e1), (_, s2, e2) in zip(kept, kept[1:]):
            assert s2 >= e1
        # OPTIMALITY: greedy count equals the DP maximum
        assert len(kept) == _max_nonoverlap(
            list(zip(g["s"].astype(int), g["e"].astype(int)))
        )
        total_kept += len(kept)
    # overlaps actually exist: some intervals were rejected
    assert total_kept < len(ev)
    assert len(out) == total_kept
