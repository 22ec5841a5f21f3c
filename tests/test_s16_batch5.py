"""Session-16 batch-5 laws: weighted SSSP replayed by a pure-Python
Dijkstra (heap) against the fixed-point relaxation, shortest-path
multiplicity replayed by layered BFS with the sigma-additivity and
multiplicity-nonvacuity checks, and the seasonal-naive backtest
replayed from pandas with the planted periodic (sMAPE exactly 0)
and drift (nonzero, hand-computable) series."""
import heapq
import os
from collections import defaultdict

import pandas as pd

import __spark_entry__ as em

SF01 = "/root/testdata/sf0.01"


def _edges(spark):
    return {
        (int(r.src), int(r.dst))
        for r in em._crawl_edges(spark, SF01).collect()
    }


def test_dijkstra_replay(spark):
    out = em.q_dijkstra_paths(spark, SF01).toPandas()
    edges = _edges(spark)
    adj = defaultdict(list)
    for s, t in edges:
        adj[s].append((t, 1 + (s * 7 + t * 13) % 10))
    seeds = [
        s for s in range(em.BFS_SEEDS_BELOW)
        if s in adj or any(t == s for _, t in edges)
    ]
    dist = {s: 0 for s in seeds}
    pq = [(0, s) for s in seeds]
    heapq.heapify(pq)
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist.get(u, 1 << 60):
            continue
        for v, w in adj[u]:
            nd = d + w
            if nd < dist.get(v, 1 << 60):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    got = {int(r.node): int(r.dist) for r in out.itertuples()}
    assert got == dist
    # seeds at 0; non-seed distances positive; weights genuinely vary
    assert all(got[s] == 0 for s in seeds)
    assert len({d for n, d in got.items() if n not in seeds}) > 3


def test_path_count_census_replay_and_sigma(spark):
    out = em.q_path_count_census(spark, SF01).toPandas()
    edges = _edges(spark)
    adj = defaultdict(list)
    for s, t in edges:
        adj[s].append(t)
    expected = {}
    for seed in range(em.CENSUS_SEEDS_BELOW):
        dist = {seed: 0}
        sigma = {seed: 1}
        frontier = [seed]
        for d in range(1, em.CENSUS_MAX_HOPS + 1):
            nxt = defaultdict(int)
            for u in frontier:
                for v in adj[u]:
                    if v not in dist:
                        nxt[v] += sigma[u]
            for v, s in nxt.items():
                dist[v] = d
                sigma[v] = s
            frontier = list(nxt)
            if not frontier:
                break
        for n in dist:
            expected[(seed, n)] = (dist[n], sigma[n])
    got = {
        (int(r.seed), int(r.node)): (int(r.dist), int(r.sigma))
        for r in out.itertuples()
    }
    assert got == expected
    # multiplicity is non-vacuous: some node is reached by >1
    # distinct shortest path
    assert any(s > 1 for _, s in got.values())
    # sigma additivity spot-check: sigma(v) = sum of sigma over
    # predecessors at dist-1 (replay already proves it; assert the
    # law explicitly on every non-seed row of one seed)
    seed = 0
    by_node = {
        n: v for (sd, n), v in got.items() if sd == seed
    }
    for n, (d, s) in by_node.items():
        if d == 0:
            continue
        preds = sum(
            by_node[u][1]
            for u, t in edges
            if t == n and u in by_node and by_node[u][0] == d - 1
        )
        assert preds == s, n


def test_backtest_smape_replay_and_planted(spark):
    out = em.q_backtest_smape(spark, SF01).toPandas()
    ev = pd.read_parquet(os.path.join(SF01, "events.parquet"))
    anchor = ev["ts"].min().replace(minute=0, second=0, microsecond=0)
    h = ((ev["ts"] - anchor).dt.total_seconds() // 3600).astype(int)
    counts = (
        ev.assign(h=h).groupby(["event_type", "h"]).size().to_dict()
    )
    hmax = max(k[1] for k in counts)
    series = {
        t: [counts.get((t, hh), 0) for hh in range(hmax + 1)]
        for t in ev["event_type"].unique()
    }
    series["periodic"] = [10 + hh % 24 for hh in range(hmax + 1)]
    series["drift"] = [10 + hh % 24 + hh // 24 for hh in range(hmax + 1)]
    expected = {}
    for t, cs in series.items():
        terms = []
        for hh in range(hmax + 1):
            if hh <= hmax - em.BT_K or hh < 24:
                continue
            fa, a = cs[hh - 24], cs[hh]
            terms.append(
                (2 * abs(fa - a) * em.BT_SCALE) // (fa + a)
                if fa + a > 0 else 0
            )
        expected[t] = (len(terms), sum(terms))
    got = {
        r.etype: (int(r.n_h), int(r.smape_q)) for r in out.itertuples()
    }
    assert got == expected
    # planted laws: exact periodicity -> sMAPE exactly 0; drift > 0
    assert got["periodic"][1] == 0
    assert got["drift"][1] > 0
    # sMAPE bounded in [0, 2] for every series
    assert ((out["smape"] >= 0) & (out["smape"] <= 2)).all()
    # real series carry genuine forecast error (nonzero, non-degenerate)
    real = out[~out["etype"].isin(["periodic", "drift"])]
    assert (real["smape"] > 0).all() and len(real) == 5
