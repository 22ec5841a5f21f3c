"""Session-16 batch-14 laws: the Mattson curve checked against a
LITERAL OrderedDict LRU simulation at every cache size (the
inclusion property made executable) plus curve monotonicity, and
Kish effective size replayed with the Cauchy-Schwarz law (n_eff <=
n, equality exactly on the constant-weight planted segment)."""
import os
from collections import OrderedDict

import pandas as pd

import __spark_entry__ as em

SF01 = "/root/testdata/sf0.01"


def test_lru_curve_matches_literal_simulation(spark):
    out = em.q_lru_stack_distance(spark, SF01).toPandas().set_index("c")
    ev = pd.read_parquet(os.path.join(SF01, "events.parquet")).sort_values(
        ["ts", "event_id"]
    )
    keys = [int(u) for u in ev["user_id"]]
    for c in em.LRU_SIZES:
        cache: OrderedDict = OrderedDict()
        hits = 0
        for k in keys:
            if k in cache:
                hits += 1
                cache.move_to_end(k)
            else:
                if len(cache) >= c:
                    cache.popitem(last=False)
                cache[k] = True
        row = out.loc[c]
        assert int(row["n_hits"]) == hits, c
        assert int(row["n_total"]) == len(keys)
    # monotone in capacity; saturates at (n - distinct_keys)/n
    ratios = [out.loc[c, "hit_ratio"] for c in em.LRU_SIZES]
    assert ratios == sorted(ratios)
    # saturation: a cache larger than the key population (256 > 150)
    # hits on every non-compulsory access
    n, k = len(keys), len(set(keys))
    assert k < max(em.LRU_SIZES)
    assert int(out.loc[max(em.LRU_SIZES), "n_hits"]) == n - k
    # small caches genuinely thrash at 150 hot keys
    assert out.loc[1, "hit_ratio"] < 0.05
    assert out.loc[max(em.LRU_SIZES), "hit_ratio"] > 0.9


def test_kish_neff_replay_and_cauchy_schwarz(spark):
    out = em.q_kish_neff(spark, SF01).toPandas().set_index("etype")
    ev = pd.read_parquet(os.path.join(SF01, "events.parquet"))
    w = 1 + ev["event_id"].astype("int64") % 10
    segs = {
        t: list(g) for t, g in w.groupby(ev["event_type"])
    }
    segs["uniform"] = [7] * 200
    for t, ws in segs.items():
        n, sw, sww = len(ws), sum(ws), sum(x * x for x in ws)
        row = out.loc[t]
        assert (int(row["n"]), int(row["sw"]), int(row["sww"])) == (
            n, sw, sww
        )
        assert int(row["neff_q"]) == (sw * sw * em.KISH_SCALE) // sww
        # Cauchy-Schwarz: (Σw)² <= n·Σw², all-BIGINT
        assert sw * sw <= n * sww
    # equality EXACTLY on the constant-weight segment
    u = out.loc["uniform"]
    assert int(u["neff_q"]) == 200 * em.KISH_SCALE
    assert u["design_effect"] == 1.0
    # real segments pay a genuine design effect
    real = out.drop("uniform")
    assert (real["design_effect"] > 1.05).all()
    assert (real["neff"] < real["n"]).all()
