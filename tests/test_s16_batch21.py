"""Session-16 batch-21 laws: onion peeling replayed layer-by-layer
(layer 1 equals the brute-force front, layers are antichains,
peeling covers: every layer-k+1 point dominated by a layer-k
point), and Bradley-Terry replayed iteration-by-iteration with the
planted champ ranked first and the strength-adjustment property
visible."""
import hashlib
import os

import pandas as pd

import __spark_entry__ as em

SF01 = "/root/testdata/sf0.01"


def _pts():
    docs = pd.read_parquet(os.path.join(SF01, "documents.parquet"))
    pts = {}
    for r in docs.itertuples():
        d = int(r.doc_id)
        y = int(
            hashlib.md5(f"{d}#pq".encode()).hexdigest()[:13], 16
        ) % 1000
        pts[d] = (int(r.n_chars), y)
    return pts


def _dominated(p, q):
    return q[0] >= p[0] and q[1] >= p[1] and (q[0] > p[0] or q[1] > p[1])


def test_pareto_layers_replay_and_peeling_laws(spark):
    out = em.q_pareto_layers(spark, SF01).toPandas()
    pts = _pts()
    remaining = dict(pts)
    expected = {}
    for layer in range(1, em.PARETO_LAYERS + 1):
        front = {
            d: p
            for d, p in remaining.items()
            if not any(
                _dominated(p, remaining[dq])
                for dq in remaining
                if dq != d
            )
        }
        for d in front:
            expected[d] = layer
            del remaining[d]
    for d in remaining:
        expected[d] = 99
    got = {int(r.doc_id): int(r.layer) for r in out.itertuples()}
    assert got == expected
    # peeling laws
    by_layer = {}
    for d, l in expected.items():
        by_layer.setdefault(l, []).append(d)
    for l, ds in by_layer.items():
        if l == 99:
            continue
        # antichain: no in-layer dominance
        for a in ds:
            for b in ds:
                if a != b:
                    assert not _dominated(pts[a], pts[b])
        # coverage: each point in layer l+1 dominated by layer l
        nxt = by_layer.get(l + 1, [])
        for b in nxt:
            assert any(_dominated(pts[b], pts[a]) for a in ds)
    assert len(by_layer.get(1, [])) > 0 and 99 in by_layer


def test_bradley_terry_replay_and_champ(spark):
    out = em.q_bradley_terry(spark, SF01).toPandas().set_index("etype")
    ev = pd.read_parquet(os.path.join(SF01, "events.parquet"))
    day = ev["ts"].dt.strftime("%Y-%m-%d")
    per = (
        ev.assign(day=day)
        .groupby(["user_id", "day", "event_type"])
        .size()
    )
    wins: dict[tuple, int] = {}
    for (u, d), g in per.groupby(level=[0, 1]):
        items = list(g.droplevel([0, 1]).items())
        for ti, ci in items:
            for tj, cj in items:
                if ti != tj and ci > cj:
                    wins[(ti, tj)] = wins.get((ti, tj), 0) + 1
    champ, cw, cl = em.BT_CHAMP
    types = sorted(ev["event_type"].unique())
    for t in types:
        wins[(champ, t)] = wins.get((champ, t), 0) + cw
        wins[(t, champ)] = wins.get((t, champ), 0) + cl
    games: dict[tuple, int] = {}
    wtot: dict[str, int] = {}
    for (i, j), n in wins.items():
        games[(i, j)] = games.get((i, j), 0) + n
        games[(j, i)] = games.get((j, i), 0) + n
        wtot[i] = wtot.get(i, 0) + n
    allt = sorted({i for i, _ in games})
    S = em.BT_SCALE
    r = {t: S for t in allt}
    for _ in range(2):
        nr = {}
        for i in allt:
            d = sum(
                (g * S * S) // (r[i] + r[j])
                for (ii, j), g in games.items()
                if ii == i
            )
            nr[i] = (wtot.get(i, 0) * S * S) // d
        r = nr
    ranked = sorted(allt, key=lambda t: (-r[t], t))
    for t in allt:
        row = out.loc[t]
        assert int(row["wins"]) == wtot.get(t, 0)
        assert int(row["rating_q"]) == r[t], t
        assert int(row["rank"]) == ranked.index(t) + 1
    # the planted champ is rank 1 with a decisive rating margin
    assert int(out.loc[champ, "rank"]) == 1
    second = out[out["rank"] == 2].iloc[0]
    assert int(out.loc[champ, "rating_q"]) > 2 * int(second["rating_q"])
