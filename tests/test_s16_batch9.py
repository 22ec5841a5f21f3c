"""Session-16 batch-9 laws: the HLL intersection replayed
register-for-register in pure Python (md5 index, first-set-bit rho,
max-merge mergeability law asserted directly: union registers ==
elementwise max == registers of the concatenated stream), and
TextRank replayed sentence-graph-by-sentence-graph with the
weighted-degree identity for the first iteration."""
import hashlib
import math
import os

import pandas as pd

import __spark_entry__ as em

SF01 = "/root/testdata/sf0.01"


def _hll_regs(items):
    regs = [0] * 64
    for it in items:
        h = hashlib.md5(it.encode()).hexdigest()
        idx = int(h[:4], 16) % 64
        x = int(h[4:17], 16)
        rho = 53 if x == 0 else (x & -x).bit_length()
        regs[idx] = max(regs[idx], rho)
    return regs


def _hll_est(regs):
    s = sum(1 << (53 - r) for r in regs)
    raw = float(em.HLL_ALPHA_M2_SCALED) / s
    v0 = sum(1 for r in regs if r == 0)
    if raw <= 160.0 and v0 > 0:
        return round(64.0 * math.log(64.0 / v0), 4)
    return round(raw, 4)


def test_hll_intersect_replay_and_mergeability(spark):
    out = em.q_hll_intersect(spark, SF01).toPandas()
    ev = pd.read_parquet(os.path.join(SF01, "events.parquet"))
    items = {
        t: [
            f"{int(u)}@{d.strftime('%Y-%m-%d')}"
            for u, d in zip(g["user_id"], g["ts"])
        ]
        for t, g in ev.groupby("event_type")
    }
    regs = {t: _hll_regs(v) for t, v in items.items()}
    sets = {t: set(v) for t, v in items.items()}
    for r in out.itertuples():
        ra, rb = regs[r.type_a], regs[r.type_b]
        # mergeability: elementwise max == sketch of concatenation
        merged = [max(x, y) for x, y in zip(ra, rb)]
        assert merged == _hll_regs(items[r.type_a] + items[r.type_b])
        assert abs(r.est_a - _hll_est(ra)) < 1e-9
        assert abs(r.est_b - _hll_est(rb)) < 1e-9
        assert abs(r.est_union - _hll_est(merged)) < 1e-9
        # inclusion-exclusion identity holds exactly on the columns
        assert abs(
            r.est_intersect - round(r.est_a + r.est_b - r.est_union, 4)
        ) < 1e-9
        # exact audit leg
        assert int(r.n_exact) == len(sets[r.type_a] & sets[r.type_b])
        # m=64 is coarse but the estimate is in the right ballpark
        assert 0.2 * r.n_exact < r.est_intersect < 3 * r.n_exact
    assert len(out) == 10  # all 5-choose-2 type pairs


def test_textrank_replay(spark):
    out = em.q_textrank_sentences(spark, SF01).toPandas()
    sents = em.q_sentence_split(spark, SF01).toPandas()
    import re

    toks = {}
    for r in sents.itertuples():
        tk = {
            t
            for t in re.sub(r"[.!]", "", str(r.sentence)).split(" ")
            if t
        }
        toks.setdefault(int(r.doc_id), {})[int(r.sent_idx)] = tk
    expected = {}
    for d, sd in toks.items():
        idxs = sorted(sd)
        w = {
            (u, v): len(sd[u] & sd[v])
            for u in idxs
            for v in idxs
            if u != v and len(sd[u] & sd[v]) > 0
        }
        s1 = {v: sum(ww for (u, vv), ww in w.items() if vv == v)
              for v in idxs}
        s2 = {
            v: sum(ww * s1[u] for (u, vv), ww in w.items() if vv == v)
            for v in idxs
        }
        top = min(idxs, key=lambda i: (-s2[i], i))
        for i in idxs:
            expected[(d, i)] = (s1[i], s2[i], 1 if i == top else 0)
    got = {
        (int(r.doc_id), int(r.sent_idx)): (
            int(r.s1), int(r.s2), int(r.is_top)
        )
        for r in out.itertuples()
    }
    assert got == expected
    # exactly one top pick per doc; s1 is the weighted degree (same
    # value summed either direction since the graph is symmetric)
    tops = out.groupby("doc_id")["is_top"].sum()
    assert (tops == 1).all()
    assert (out["s2"] >= out["s1"]).any()  # second hop amplifies hubs
