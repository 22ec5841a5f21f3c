"""Connected-components kernel (_cc_min_label) on adversarial graph
shapes the LSH fixture never produces: a long path (worst-case
diameter — pointer jumping must converge in O(log d) rounds, not
O(d)), multiple components, and an empty edge set."""

import pyspark.sql.functions as F

import __spark_entry__ as entry_mod


def _edges(spark, pairs):
    sym = pairs + [(b, a) for a, b in pairs]
    return spark.createDataFrame(sym, "src long, dst long")


def test_path_graph_converges_within_log_rounds(spark):
    """64-node path 0-1-2-...-63: diameter 63.  Plain min-label
    propagation needs 63 rounds; propagate+jump doubles reach per
    round, so 12 rounds must suffice (2 margin over log2(63)+confirm)."""
    pairs = [(i, i + 1) for i in range(63)]
    labels = entry_mod._cc_min_label(_edges(spark, pairs), max_rounds=12)
    got = {r.node: r.label for r in labels.collect()}
    assert got == {i: 0 for i in range(64)}


def test_two_components_and_star(spark):
    pairs = [(10, 11), (11, 12), (12, 10),        # triangle
             (100, 101), (100, 102), (100, 103)]  # star centered off-min
    labels = entry_mod._cc_min_label(_edges(spark, pairs))
    got = {r.node: r.label for r in labels.collect()}
    assert got == {10: 10, 11: 10, 12: 10,
                   100: 100, 101: 100, 102: 100, 103: 100}


def test_empty_edges_yield_empty_labels(spark):
    labels = entry_mod._cc_min_label(
        spark.createDataFrame([], "src long, dst long")
    )
    assert labels.count() == 0
