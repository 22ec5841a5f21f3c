"""Session-14 batch-4 laws: consistent-ring move-set replay + the
no-old-to-old-churn property, hierarchy rollup replay + monotonicity,
CDF-drift replay + EMD/KS identities."""
import math
import os
from collections import defaultdict

import pandas as pd

import __spark_entry__ as em

SF01 = "/root/testdata/sf0.01"


def _ring_owner(combos, kp):
    succ = [c for c in combos if c // 64 >= kp]
    return (min(succ) if succ else min(combos)) % 64


def test_consistent_ring_move_set(spark):
    out = em.q_consistent_ring(spark, SF01).toPandas()
    docs = pd.read_parquet(os.path.join(SF01, "documents.parquet"))
    assert len(out) == len(docs)
    moved = 0
    for _, r in out.iterrows():
        d = int(r["node"]) if "node" in r else int(r["doc_id"])
        kp = ((d % 1000003) * 1103515245 + 12345) % em.RING_MOD
        old = _ring_owner(em.RING_COMBOS_OLD, kp)
        new = _ring_owner(em.RING_COMBOS_NEW, kp)
        assert int(r["old_node"]) == old
        assert int(r["new_node"]) == new
        assert int(r["moved"]) == (1 if old != new else 0)
        if old != new:
            moved += 1
            # minimal-disruption law: every move lands ON the new node
            assert int(r["new_node"]) == em.RING_NEW_N - 1
    # non-vacuity both ways
    assert 0 < moved < len(out)
    # all old nodes still serve something after the rebalance
    assert set(out["new_node"]) == set(range(em.RING_NEW_N))


def test_hierarchy_rollup_replay(spark):
    out = em.q_hierarchy_rollup(spark, SF01).toPandas().set_index("node")
    docs = pd.read_parquet(os.path.join(SF01, "documents.parquet"))
    vals = {int(d): int(c) for d, c in zip(docs["doc_id"], docs["n_chars"])}
    sums = defaultdict(int)
    cnts = defaultdict(int)
    for d, c in vals.items():
        n = d
        while True:
            sums[n] += c
            cnts[n] += 1
            if n == 0:
                break
            n //= 2
    assert len(out) == len(vals)
    for d in vals:
        assert int(out.loc[d, "subtree_chars"]) == sums[d]
        assert int(out.loc[d, "n_desc"]) == cnts[d]
    # laws: root totals everything; parent subtree >= child subtree
    assert int(out.loc[0, "subtree_chars"]) == sum(vals.values())
    assert int(out.loc[0, "n_desc"]) == len(vals)
    for d in vals:
        if d > 0 and d // 2 in vals:
            assert out.loc[d // 2, "subtree_chars"] >= out.loc[d, "subtree_chars"]
    # depth is non-trivial (the explode really collapses a chain)
    assert max(cnts.values()) == len(vals)
    assert any(cnts[d] == 1 for d in vals)  # leaves exist


def test_cdf_drift_replay(spark):
    out = em.q_cdf_drift(spark, SF01).toPandas()
    ev = pd.read_parquet(os.path.join(SF01, "events.parquet"))
    epoch = pd.Timestamp("2024-01-01 00:00:00")
    day = ((ev["ts"] - epoch) // pd.Timedelta(microseconds=1)) // 86400000000
    W = em.CDF_BUCKET_CENTS
    per = defaultdict(lambda: [0, 0])
    for t, v, d in zip(ev["event_type"], ev["value"], day):
        b = int(math.floor(v * 100 + 0.5)) // W
        per[(t, b)][0 if d < em.CDF_SPLIT_DAY else 1] += 1
    types = sorted({t for t, _ in per})
    emd = {}
    ks = {}
    rows = {}
    for t in types:
        buckets = sorted(b for tt, b in per if tt == t)
        na_tot = sum(per[(t, b)][0] for b in buckets)
        nb_tot = sum(per[(t, b)][1] for b in buckets)
        ca = cb = 0
        e = k = 0
        for i, b in enumerate(buckets):
            ca += per[(t, b)][0]
            cb += per[(t, b)][1]
            gap = buckets[i + 1] - b if i + 1 < len(buckets) else 0
            diff = abs(ca * nb_tot - cb * na_tot)
            e += diff * gap
            k = max(k, diff)
            rows[(t, b)] = (ca, cb, gap, diff * gap)
        emd[t], ks[t] = e, k
    assert len(out) == len(rows)
    for _, r in out.iterrows():
        key = (r["etype"], int(r["bucket"]))
        ca, cb, gap, contrib = rows[key]
        assert (int(r["cum_a"]), int(r["cum_b"])) == (ca, cb)
        assert int(r["gap"]) == gap
        assert int(r["contrib_q"]) == contrib
        assert int(r["emd_q"]) == emd[r["etype"]]
        assert int(r["ks_q"]) == ks[r["etype"]]
    # identities: KS <= nA*nB always; EMD 0 iff CDFs identical (they
    # are not, for every type, on this fixture); last-row gap is 0
    for t in types:
        assert 0 < ks[t]
        assert 0 < emd[t]
    last = out.sort_values("bucket").groupby("etype").tail(1)
    assert (last["gap"] == 0).all()
