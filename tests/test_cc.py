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


def test_split_by_cluster_leakage_invariant(spark, sf_dir):
    """Every near-dup cluster lands entirely in ONE split (the
    leakage-safety contract), every doc is assigned exactly once, and
    all three splits are populated at roughly 80/10/10."""
    rows = entry_mod.q_split_by_cluster(spark, sf_dir).collect()
    split_of = {r.doc_id: r.split for r in rows}
    assert len(split_of) == len(rows)  # one assignment per doc
    clusters = entry_mod.q_dedup_cluster(spark, sf_dir).collect()
    assert clusters, "fixture must produce near-dup clusters"
    by_cluster = {}
    for r in clusters:
        by_cluster.setdefault(r.cluster_id, []).append(r.doc_id)
    multi = [m for m in by_cluster.values() if len(m) > 1]
    assert multi, "fixture must produce a multi-doc cluster"
    for members in by_cluster.values():
        assert len({split_of[d] for d in members}) == 1
    from collections import Counter

    frac = Counter(split_of.values())
    n = len(split_of)
    assert frac["train"] / n > 0.6
    assert frac["valid"] > 0 and frac["test"] > 0


def test_split_contamination_audit(spark, sf_dir):
    """Cluster-keyed split has structurally zero straddling near-dup
    pairs; the naive doc_id-hash split demonstrably leaks."""
    rows = {r.method: r for r in
            entry_mod.q_split_contamination(spark, sf_dir).collect()}
    assert rows["cluster"].n_straddling == 0
    assert rows["naive"].n_straddling > 0
    assert rows["cluster"].n_pairs == rows["naive"].n_pairs > 0
