"""PMI collocations: definitional correctness against an independent
pandas recompute, and the plan shape the 100 TB story rests on (the
unigram table joins back BROADCAST; the only corpus-sized exchange is
the bigram aggregate)."""

import math
import os
from collections import Counter

import pandas as pd

import __spark_entry__ as em

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF = os.path.join(TESTDATA, "sf0.001")


def test_pmi_matches_pandas_recompute(spark):
    got = {
        (r.w1, r.w2): (r.cnt, r.pmi)
        for r in em.q_pmi_collocations(spark, SF).collect()
    }

    docs = pd.read_parquet(os.path.join(SF, "documents.parquet"))
    uni, big = Counter(), Counter()
    for text in docs["text"]:
        ts = text.split(" ")
        uni.update(ts)
        big.update(zip(ts, ts[1:]))
    n_uni = sum(uni.values())
    n_big = sum(big.values())
    want = {}
    for (w1, w2), c in big.items():
        if c >= em.PMI_MIN_COUNT:
            pmi = math.log((float(c) * n_uni * n_uni)
                           / (float(n_big) * uni[w1] * uni[w2]))
            want[(w1, w2)] = (c, round(pmi, 6))
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 1e-9, (k, got[k], want[k])
    # sanity: PMI must separate real collocations from incidental
    # adjacency — the fixture vocab is near-uniform, so values spread
    vals = [v[1] for v in want.values()]
    assert max(vals) - min(vals) > 0.1


def test_pmi_plan_broadcasts_unigrams(spark):
    plan = em.q_pmi_collocations(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan
