"""Session-16 batch-12 laws: RANSAC replayed hypothesis-by-
hypothesis in pure Python with the planted line's exact recovery
(slope 2, all 40 plants inlying, background contributing only
chance hits), and vector clocks replayed from md5 nibbles with
antisymmetry, CRDT-merge laws, planted dominance, and both organic
classes present."""
import hashlib
import os

import pandas as pd

import __spark_entry__ as em

SF01 = "/root/testdata/sf0.01"


def _cloud():
    ev = pd.read_parquet(os.path.join(SF01, "events.parquet"))
    px, py = em.SPATIAL_PX, em.SPATIAL_PY
    pts = {}
    for eid in ev["event_id"].astype(int):
        ex = eid % px
        ey = eid % py
        pts[eid] = ((ex * ex + 3 * ex) % px, (7 * ey * ey + 11 * ey + 5) % py)
    for k in range(1, em.RANSAC_PLANT_N + 1):
        pts[-k] = (k * 1000, k * 2000 + 500)
    return pts


def test_ransac_replay_and_plant_recovery(spark):
    out = em.q_robust_line_fit(spark, SF01).toPandas().iloc[0]
    pts = _cloud()
    anchors = [
        p for p in pts
        if (p >= 0 and p % em.RANSAC_ANCHOR_MOD == 7)
        or (p < 0 and p % 2 == 0)
    ]
    best = None
    for i, pa in enumerate(sorted(anchors)):
        for pb in sorted(anchors)[i + 1:]:
            x1, y1 = pts[pa]
            dx = pts[pb][0] - x1
            dy = pts[pb][1] - y1
            if dx == 0:
                continue
            n = sum(
                1
                for (x, y) in pts.values()
                if abs((y - y1) * dx - (x - x1) * dy)
                <= em.RANSAC_TOL * abs(dx)
            )
            key = (-n, pa, pb)
            if best is None or key < best[0]:
                best = (key, x1, y1, dx, dy)
    (negn, pa, pb), x1, y1, dx, dy = best
    assert int(out["pid_a"]) == pa and int(out["pid_b"]) == pb
    assert int(out["n_inliers"]) == -negn
    assert int(out["slope_num"]) == dy and int(out["slope_den"]) == dx
    # the planted line wins: both anchors are plants, slope exactly 2,
    # intercept exactly 500, and every planted point is an inlier
    assert pa < 0 and pb < 0
    assert out["slope"] == 2.0 and out["intercept"] == 500.0
    assert int(out["n_inliers"]) >= em.RANSAC_PLANT_N
    # background-only lines are far behind (chance inliers ~0.7/line)
    assert int(out["n_inliers"]) < em.RANSAC_PLANT_N + 20


def _clock(text: str, v: int) -> tuple:
    h = hashlib.md5(f"{text}v{v}".encode()).hexdigest()
    return tuple(
        int(h[4 * j:4 * j + 4], 16) % em.VC_MOD for j in range(3)
    )


def test_vector_clock_replay_and_laws(spark):
    out = em.q_vector_clock_audit(spark, SF01).toPandas()
    docs = pd.read_parquet(os.path.join(SF01, "documents.parquet"))
    clocks = {}
    for r in docs.itertuples():
        d = int(r.doc_id)
        vs = {f"r{v}": _clock(str(r.text), v) for v in range(3)}
        mx = tuple(
            max(vs[f"r{v}"][j] for v in range(3)) + 1 for j in range(3)
        )
        vs["merged"] = mx
        clocks[d] = vs
    got = {}
    for r in out.itertuples():
        got[(int(r.doc_id), r.ver_a, r.ver_b)] = (
            r.clock_a, r.clock_b, r.relation, r.merged
        )
    assert len(got) == 6 * len(docs)
    rels = {"a_before_b": 0, "b_before_a": 0, "concurrent": 0, "equal": 0}
    for (d, va, vb), (ca, cb, rel, mg) in got.items():
        xa, xb = clocks[d][va], clocks[d][vb]
        assert ca == "|".join(map(str, xa))
        assert cb == "|".join(map(str, xb))
        aleb = all(p <= q for p, q in zip(xa, xb))
        blea = all(q <= p for p, q in zip(xa, xb))
        want = (
            "equal" if aleb and blea
            else "a_before_b" if aleb
            else "b_before_a" if blea
            else "concurrent"
        )
        assert rel == want
        rels[rel] += 1
        # CRDT merge: element-wise max, commutative and idempotent
        m = tuple(max(p, q) for p, q in zip(xa, xb))
        assert mg == "|".join(map(str, m))
        assert m == tuple(max(q, p) for p, q in zip(xa, xb))
        if rel == "a_before_b":
            assert m == xb  # merge with a dominator is absorption
    # the planted merged version dominates every replica on every
    # doc: 'merged' < 'rV' in the pair ordering, and the DOMINATOR
    # has the larger clock, so the replica is causally before it
    # (b_before_a with a = merged)
    for d in clocks:
        for v in range(3):
            assert got[(d, "merged", f"r{v}")][2] == "b_before_a"
    # organic classes both occur in volume
    assert rels["concurrent"] > 300
    assert rels["a_before_b"] + rels["b_before_a"] > 1600
