"""Efraimidis-Spirakis weighted sampling: the statistical law the
operator exists for (inclusion probability proportional to weight),
pinned over many independent md5 salts in a pandas replay of the
identical draw; plus Spark == pandas equality for the driver-row salt
and the TakeOrderedAndProject plan (no global sort)."""

import hashlib
import math
import os

import pandas as pd

import __spark_entry__ as em

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF = os.path.join(TESTDATA, "sf0.001")


def _pandas_sample(docs, salt, k=em.WS_K):
    rows = []
    for doc_id, lang, w in zip(docs["doc_id"], docs["lang"], docs["n_chars"]):
        if w <= 0:
            continue
        h = int(hashlib.md5(f"{doc_id}#ws{salt}".encode()).hexdigest()[:13], 16)
        rows.append((doc_id, lang, int(w), math.log((h + 1) / em.WS_U53) / w))
    rows.sort(key=lambda r: (-r[3], r[0]))
    return rows[:k]


def test_spark_equals_pandas_replay(spark):
    docs = pd.read_parquet(os.path.join(SF, "documents.parquet"))
    want = [(r[0], r[1], r[2]) for r in _pandas_sample(docs, 0)]
    got = [
        (r.doc_id, r.lang, r.w)
        for r in em.q_weighted_sample(spark, SF).collect()
    ]
    assert got == want


def test_inclusion_probability_tracks_weight():
    docs = pd.read_parquet(os.path.join(SF, "documents.parquet"))
    n_salts = 300
    incl = {}
    for salt in range(n_salts):
        for doc_id, _, _w, _k in _pandas_sample(docs, salt):
            incl[doc_id] = incl.get(doc_id, 0) + 1
    w = dict(zip(docs["doc_id"], docs["n_chars"]))
    # split docs into weight terciles; mean inclusion rate must be
    # strictly increasing across terciles (weighted, not uniform)
    ordered = sorted(w, key=lambda d: w[d])
    t = len(ordered) // 3
    rates = [
        sum(incl.get(d, 0) for d in part) / (len(part) * n_salts)
        for part in (ordered[:t], ordered[t : 2 * t], ordered[2 * t :])
    ]
    assert rates[0] < rates[1] < rates[2], rates
    # first-order law: for the HEAVIEST vs LIGHTEST doc the inclusion
    # ratio should be at least half the weight ratio (k draws without
    # replacement compress ratios toward 1, never invert them)
    heavy, light = ordered[-1], ordered[0]
    assert incl.get(heavy, 0) > incl.get(light, 0)


def test_plan_is_take_ordered(spark):
    plan = (
        em.q_weighted_sample(spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan
