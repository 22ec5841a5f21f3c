"""Session-14 batch-1 laws: HITS integer fixed point replayed in pure
Python + authority discrimination, redirect-chain doubling vs a
step-by-step walk + class non-vacuity, Benford chi-square replay +
grid completeness."""
import math
import os
from collections import Counter, defaultdict

import pandas as pd

import __spark_entry__ as em
from ocular_spark.functions.html import LINK_RULES, LINK_UNIVERSE

SF01 = "/root/testdata/sf0.01"


def _edges(doc_ids):
    ids = set(int(u) for u in doc_ids)
    edges = set()
    for u in ids:
        for a, c in LINK_RULES:
            edges.add((u, (u * a + c) % LINK_UNIVERSE))
        for k in range(1, 10):
            edges.add((u, u % (1 << k)))
    return {(s, d) for s, d in edges if s != d}


def test_link_hits_replay_and_discrimination(spark):
    out = em.q_link_hits(spark, SF01).toPandas().set_index("node")
    docs = pd.read_parquet(os.path.join(SF01, "documents.parquet"))
    edges = _edges(docs["doc_id"])
    nodes = {s for s, _ in edges} | {d for _, d in edges}
    out_adj = defaultdict(list)
    in_adj = defaultdict(list)
    for s, d in edges:
        out_adj[s].append(d)
        in_adj[d].append(s)
    S = em.HITS_SCALE
    h = {n: S for n in nodes}
    a = {}
    for _ in range(em.HITS_ITERS):
        ar = {n: sum(h[u] for u in in_adj[n]) for n in nodes}
        tot = sum(ar.values())
        a = {n: ar[n] * S // tot for n in nodes}
        hr = {n: sum(a[v] for v in out_adj[n]) for n in nodes}
        tot = sum(hr.values())
        h = {n: hr[n] * S // tot for n in nodes}
    assert len(out) == len(nodes)
    for n in nodes:
        assert int(out.loc[n, "hub"]) == h[n], n
        assert int(out.loc[n, "auth"]) == a[n], n
    # discrimination: nodes 0 and 1 each receive ~N/2 overlay
    # in-links (u%2 targets) -> the top authority is one of them
    assert out["auth"].idxmax() in (0, 1)
    assert out["hub"].nunique() > 10
    assert out["auth"].nunique() > 10


def test_redirect_resolve_classes(spark):
    out = em.q_redirect_resolve(spark, SF01).toPandas()
    docs = pd.read_parquet(os.path.join(SF01, "documents.parquet"))
    ids = sorted(int(u) for u in docs["doc_id"])
    m = {}
    for u in ids:
        if u % 100 == 49 or u % 100 == 50:
            m[u] = u + 1
        elif u % 100 == 51:
            m[u] = u - 1
        elif u % 20 in (1, 2, 3):
            m[u] = u + 1
    assert set(out["start"]) == set(m)
    # replay: walk each start to terminal or cycle (bounded)
    for _, row in out.iterrows():
        u = int(row["start"])
        cur, d, seen = m[u], 1, set()
        while cur in m and cur not in seen:
            seen.add(cur)
            cur, d = m[cur], d + 1
        if cur in m:  # stopped by cycle revisit
            assert row["is_cycle"] == 1
            assert pd.isna(row["final"]) and pd.isna(row["dist"])
        else:
            assert row["is_cycle"] == 0
            assert int(row["final"]) == cur and int(row["dist"]) == d
    # class non-vacuity: chains of length 1, 2, 3; 2-cycles + feeders
    dists = Counter(out.loc[out["is_cycle"] == 0, "dist"].astype(int))
    assert dists[1] > 0 and dists[2] > 0 and dists[3] > 0
    # 5 blocks x (49 feeder, 50, 51) = 15 cycle-bound starts at N=500
    assert int(out["is_cycle"].sum()) == 15
    # resolved finals are never redirect sources
    finals = out.loc[out["is_cycle"] == 0, "final"].astype(int)
    assert not any(f in m for f in finals)


def test_benford_audit_replay(spark):
    out = em.q_benford_audit(spark, SF01).toPandas()
    orders = pd.read_parquet(os.path.join(SF01, "orders.parquet"))
    S = em.BENFORD_SCALE
    obs = Counter()
    for st, p in zip(orders["o_orderstatus"], orders["o_totalprice"]):
        cents = int(math.floor(p * 100 + 0.5))
        obs[(st, int(str(cents)[0]))] += 1
    statuses = sorted(orders["o_orderstatus"].unique())
    # full grid emitted
    assert len(out) == len(statuses) * 9
    assert set(zip(out["status"], out["digit"])) == {
        (st, d) for st in statuses for d in range(1, 10)
    }
    n_tot = Counter(orders["o_orderstatus"])
    chi2 = defaultdict(int)
    for _, row in out.iterrows():
        st, d = row["status"], int(row["digit"])
        n = n_tot[st]
        assert int(row["n_obs"]) == obs[(st, d)]
        assert int(row["n_total"]) == n
        exp = em.BENFORD_EXP[d]
        assert int(row["exp_scaled"]) == exp
        e_scaled = n * exp
        assert int(row["expected_n_scaled"]) == e_scaled
        contrib = (obs[(st, d)] * S - e_scaled) ** 2 // e_scaled
        assert int(row["contrib_q"]) == contrib
        chi2[st] += contrib
    for _, row in out.iterrows():
        assert int(row["chi2_q"]) == chi2[row["status"]]
    # the price distribution spans ~2.7 decades: leading digit 1 must
    # dominate digit 9 in every status (the signal the audit screens)
    g = out.groupby("digit")["n_obs"].sum()
    assert g[1] > g[9]
