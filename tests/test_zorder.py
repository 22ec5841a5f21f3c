"""zorder_layout: Morton interleave + the pruning benefit it exists for.

Pins (a) the SQL bit-spread against an independent per-bit Python
reference over seeded random lanes, (b) the either-column pruning
property on uniform synthetic data: z-tiled files bound BOTH lanes'
min/max envelopes, so a predicate on the SECOND column alone prunes
most files, while a single-column-sorted layout prunes none of them.
"""
import numpy as np
from pyspark.sql import functions as F

from __spark_entry__ import ZORDER_FILE_DIV, _morton_expr


def _py_morton(x: int, y: int) -> int:
    z = 0
    for i in range(16):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def _shl_spark(e, n):
    return f"shiftleft({e}, {n})"


def test_morton_matches_bitwise_reference(spark):
    rng = np.random.RandomState(42)
    pairs = [(int(x), int(y))
             for x, y in rng.randint(0, 65536, size=(200, 2))]
    pairs += [(0, 0), (65535, 65535), (65535, 0), (0, 65535), (1, 2)]
    df = spark.createDataFrame(pairs, "x16 long, y16 long")
    got = df.select(
        "x16", "y16",
        F.expr(_morton_expr("x16", "y16", _shl_spark)).alias("z"),
    ).collect()
    for r in got:
        assert r["z"] == _py_morton(r["x16"], r["y16"]), (r["x16"], r["y16"])


def test_zorder_prunes_on_second_column(spark):
    rng = np.random.RandomState(7)
    pts = [(int(x), int(y))
           for x, y in rng.randint(0, 65536, size=(20000, 2))]
    df = spark.createDataFrame(pts, "x16 long, y16 long").select(
        "x16", "y16",
        F.expr(_morton_expr("x16", "y16", _shl_spark)).alias("zval"),
    )

    def envelopes(file_expr):
        rows = (
            df.select("x16", "y16", F.expr(file_expr).alias("f"))
            .groupBy("f")
            .agg(F.min("y16").alias("y_min"), F.max("y16").alias("y_max"))
            .collect()
        )
        return [(r["y_min"], r["y_max"]) for r in rows]

    z_env = envelopes(f"zval div {ZORDER_FILE_DIV}")   # 256 z-tiles
    x_env = envelopes("x16 div 256")                   # 256 x-sort tiles
    assert len(z_env) > 200 and len(x_env) > 200

    probes = rng.randint(0, 65536, size=20)

    def mean_candidate_frac(env):
        hits = [sum(1 for lo, hi in env if lo <= b <= hi) / len(env)
                for b in probes]
        return sum(hits) / len(hits)

    z_frac = mean_candidate_frac(z_env)
    x_frac = mean_candidate_frac(x_env)
    # z-layout: y is bounded to ~1/16 of the domain per file -> a
    # y-only predicate touches ~6% of files; x-sorted layout leaves
    # the y envelope full-width -> touches ~all files
    assert z_frac < 0.15, z_frac
    assert x_frac > 0.9, x_frac
    assert z_frac < x_frac / 5
