"""Session-14 batch-3 laws: phrase search vs a naive Python scan
(incl. overlapping matches), bitmap intersection vs set algebra,
Poisson-bootstrap replay + CI order-statistic laws."""
import math
import os
from collections import defaultdict

import pandas as pd

import __spark_entry__ as em

SF01 = "/root/testdata/sf0.01"


def test_phrase_search_vs_naive_scan(spark):
    out = em.q_phrase_search(spark, SF01).toPandas()
    docs = pd.read_parquet(os.path.join(SF01, "documents.parquet"))
    expect = set()
    for did, text in zip(docs["doc_id"], docs["text"]):
        toks = text.split(" ")
        for pid, words in em.PHRASES.items():
            for i in range(len(toks) - len(words) + 1):
                if tuple(toks[i : i + len(words)]) == tuple(words):
                    expect.add((pid, int(did), i))
    got = set(
        zip(out["phrase_id"].astype(int), out["doc_id"].astype(int),
            out["pos"].astype(int))
    )
    assert got == expect
    # every phrase hits (non-vacuity) ...
    per = out.groupby("phrase_id").size()
    assert all(per.get(pid, 0) > 0 for pid in em.PHRASES)
    # ... and "table table" has OVERLAPPING matches somewhere
    # (consecutive start positions in one doc)
    tt = sorted(
        (d, p) for pid, d, p in got if pid == 1
    )
    assert any(
        d1 == d2 and p2 == p1 + 1 for (d1, p1), (d2, p2) in zip(tt, tt[1:])
    )


def test_bitmap_intersect_vs_sets(spark):
    out = em.q_bitmap_intersect(spark, SF01).toPandas()
    ev = pd.read_parquet(os.path.join(SF01, "events.parquet"))
    epoch = pd.Timestamp("2024-01-01 00:00:00")
    day = ((ev["ts"] - epoch) // pd.Timedelta(microseconds=1)) // 86400000000
    sets = defaultdict(set)
    for t, u, d in zip(ev["event_type"], ev["user_id"], day):
        sets[t].add(int(u) * 1024 + int(d))
    types = sorted(sets)
    assert len(out) == len(types) * (len(types) - 1) // 2
    for _, r in out.iterrows():
        a, b = r["type_a"], r["type_b"]
        assert a < b
        assert int(r["n_a"]) == len(sets[a])
        assert int(r["n_b"]) == len(sets[b])
        assert int(r["n_common"]) == len(sets[a] & sets[b])
    # overlaps are non-trivial: strictly between 0 and min(n_a, n_b)
    # for at least one pair, and equal to a full set for none
    assert (out["n_common"] > 0).any()
    assert (out["n_common"] < out[["n_a", "n_b"]].min(axis=1)).any()


def test_poisson_bootstrap_replay(spark):
    out = em.q_poisson_bootstrap(spark, SF01).toPandas()
    ev = pd.read_parquet(os.path.join(SF01, "events.parquet"))
    cents = {
        int(e): int(math.floor(v * 100 + 0.5))
        for e, v in zip(ev["event_id"], ev["value"])
    }
    T = em.BOOT_THRESH
    means = {}
    for b in range(em.BOOT_B):
        n_eff = sum_c = 0
        for e, c in cents.items():
            r = ((e % 1000003) * 48271 + (b + 1) * 104729) % 2147483647 % 1000
            m = 0 if r < T[0] else 1 if r < T[1] else 2 if r < T[2] \
                else 3 if r < T[3] else 4
            n_eff += m
            sum_c += m * c
        means[b] = (n_eff, sum_c, (sum_c * 1000000) // n_eff)
    assert len(out) == em.BOOT_B
    for _, r in out.iterrows():
        n, s, mq = means[int(r["b"])]
        assert (int(r["n_eff"]), int(r["sum_cents"]), int(r["mean_q"])) == (
            n, s, mq,
        )
    ordered = sorted(m for _, _, m in means.values())
    lo, hi = ordered[em.BOOT_LO - 1], ordered[em.BOOT_HI - 1]
    assert (out["lo_q"] == lo).all() and (out["hi_q"] == hi).all()
    # CI laws: non-degenerate interval that brackets the full-sample
    # point estimate (Poisson bootstrap is unbiased around it)
    assert lo < hi
    point = (sum(cents.values()) * 1000000) // len(cents)
    assert lo <= point <= hi
    # replicate sizes concentrate near N (Poisson(1) thinning)
    assert (out["n_eff"] > 0.8 * len(cents)).all()
    assert (out["n_eff"] < 1.2 * len(cents)).all()
