"""exact_quantile: distributed exact order statistics (no global sort).

Pins (a) value-level equality with a trusted in-memory sort at two
data shapes, (b) the pass bound the scale story rests on (shared
histogram passes = ceil(log_B(domain)), independent of row count and
of how many quantiles are asked), (c) the degenerate constant-column
path (zero histogram passes).
"""
import math
import os

import numpy as np
import pytest

import __spark_entry__ as em
from __spark_entry__ import (
    QUANTILE_FINAL_WIDTH,
    QUANTILE_HIST_BUCKETS,
    QUANTILE_TARGETS,
    _exact_kth,
    q_exact_quantile,
)


def _numpy_kth(vals: np.ndarray, k: int) -> int:
    return int(np.partition(vals, k - 1)[k - 1])


def test_exact_quantile_matches_sort(spark, sf_dir):
    got = {r["p_label"]: (r["k"], r["quantile_v"])
           for r in q_exact_quantile(spark, sf_dir).collect()}
    import pyarrow.parquet as pq

    value = pq.read_table(os.path.join(sf_dir, "events.parquet"))["value"]
    v = np.floor(value.to_numpy() * 1_000_000).astype(np.int64)
    n = len(v)
    assert n > 0
    for lab, num, den in QUANTILE_TARGETS:
        k = (num * n + den - 1) // den
        assert got[lab] == (k, _numpy_kth(v, k)), lab


def test_kth_wide_domain_pass_bound(spark):
    # domain ~2^40 forces the histogram loop to actually iterate;
    # the bound is ceil(log_B(domain / FINAL_WIDTH)) + small slack for
    # ceil-width rounding — NOT a function of n or of len(ks)
    rng = np.random.RandomState(0)
    v = rng.randint(0, 1 << 40, size=5000).astype(np.int64)
    df = spark.createDataFrame([(int(x),) for x in v], "v long")
    n = len(v)
    ks = {"k1": 1, "kmid": n // 3, "kn": n,
          "kq": (9 * n + 9) // 10}
    out, passes = _exact_kth(df, ks, int(v.min()), int(v.max()))
    for lab, k in ks.items():
        assert out[lab] == _numpy_kth(v, k), lab
    domain = int(v.max()) - int(v.min()) + 1
    bound = math.ceil(
        math.log(max(2, domain // QUANTILE_FINAL_WIDTH))
        / math.log(QUANTILE_HIST_BUCKETS)
    ) + 1
    assert 1 <= passes <= bound


def test_kth_constant_column_zero_passes(spark):
    df = spark.createDataFrame([(7,)] * 100, "v long")
    out, passes = _exact_kth(df, {"a": 1, "b": 100}, 7, 7)
    assert passes == 0
    assert out == {"a": 7, "b": 7}


def test_kth_duplicate_heavy(spark):
    # ties across a bucket boundary: the invariant below < k <= below+
    # in-range must hold when one value carries most of the mass
    v = np.array([5] * 400 + [6] * 300 + [10 ** 9] * 300, dtype=np.int64)
    df = spark.createDataFrame([(int(x),) for x in v], "v long")
    ks = {"p40": 400, "p41": 401, "p70": 700, "p71": 701, "p100": 1000}
    out, _ = _exact_kth(df, ks, 5, 10 ** 9)
    sv = np.sort(v)
    for lab, k in ks.items():
        assert out[lab] == int(sv[k - 1]), lab


def test_group_quantile_matches_per_group_sort(spark, sf_dir):
    from __spark_entry__ import GROUP_QUANTILE_TARGETS, q_group_quantile
    import pyarrow.parquet as pq

    got = {(r["event_type"], r["p_label"]): (r["k"], r["quantile_v"])
           for r in q_group_quantile(spark, sf_dir).collect()}
    t = pq.read_table(os.path.join(sf_dir, "events.parquet"),
                      columns=["event_type", "value"]).to_pandas()
    t["v"] = np.floor(t["value"].to_numpy() * 1_000_000).astype(np.int64)
    for g, sub in t.groupby("event_type"):
        v = sub["v"].to_numpy()
        n = len(v)
        for lab, num, den in GROUP_QUANTILE_TARGETS:
            k = (num * n + den - 1) // den
            assert got[(g, lab)] == (k, _numpy_kth(v, k)), (g, lab)


def test_kth_grouped_shares_passes(spark):
    # two groups on DISJOINT wide value scales: grouped targets must
    # resolve in the same pass bound as a single global target — the
    # pass count is a function of the widest live range, not of the
    # number of (group, quantile) targets
    rng = np.random.RandomState(3)
    a = rng.randint(0, 1 << 40, size=2000).astype(np.int64)
    b = rng.randint(1 << 50, 1 << 52, size=2000).astype(np.int64)
    rows = [("a", int(x)) for x in a] + [("b", int(x)) for x in b]
    df = spark.createDataFrame(rows, "g string, v long")
    ks = {"a|mid": 1000, "a|hi": 1999, "b|mid": 1000, "b|hi": 1999}
    preds = {t: f"g = '{t[0]}'" for t in ks}
    los = {"a|mid": int(a.min()), "a|hi": int(a.min()),
           "b|mid": int(b.min()), "b|hi": int(b.min())}
    his = {"a|mid": int(a.max()), "a|hi": int(a.max()),
           "b|mid": int(b.max()), "b|hi": int(b.max())}
    out, passes = _exact_kth(df, ks, 0, 0, preds, los, his)
    assert out["a|mid"] == _numpy_kth(a, 1000)
    assert out["a|hi"] == _numpy_kth(a, 1999)
    assert out["b|mid"] == _numpy_kth(b, 1000)
    assert out["b|hi"] == _numpy_kth(b, 1999)
    widest = max(int(a.max()) - int(a.min()), int(b.max()) - int(b.min())) + 1
    bound = math.ceil(
        math.log(max(2, widest // QUANTILE_FINAL_WIDTH))
        / math.log(QUANTILE_HIST_BUCKETS)
    ) + 1
    assert 1 <= passes <= bound
