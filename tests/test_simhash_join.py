"""SimHash Hamming-distance join (simhash_hamming_join).

Pins the two laws the block-permutation scheme (Manku, Jain &
Das Sarma, WWW 2007) lives or dies by:

1. COMPLETENESS (pigeonhole): with 4 blocks of 12 bits, every pair at
   Hamming distance <= 3 agrees exactly on >= 1 block, so the block
   equi-join's candidate set is a superset of the true answer and the
   operator's output EQUALS the brute-force all-pairs <=3 set.  The
   brute force here is an independent Python bit_count over the same
   fingerprint table, not a second run of the join.
2. PRUNING: the candidate set the join actually verifies is a small
   fraction of n*(n-1)/2 — the property that makes the scheme viable
   at corpus scale (verification cost tracks near-dup density, not
   corpus size squared).

Plus the non-vacuity that makes the gate meaningful: the sf0.001
corpus must contain at least one pair at distance 1..3 — the class
the exact-bucket `simhash` groupBy (distance 0 only) cannot surface.
"""

import pyspark.sql.functions as F

from __spark_entry__ import _load_wide, _simhash48, q_simhash_hamming_join


def test_completeness_vs_brute_force(spark, sf_dir):
    fps = {
        r["doc_id"]: r["fp"]
        for r in _simhash48(_load_wide(spark, sf_dir, "documents")).collect()
    }
    ids = sorted(fps)
    truth = {
        (a, b, bin(fps[a] ^ fps[b]).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(fps[a] ^ fps[b]).count("1") <= 3
    }
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in q_simhash_hamming_join(spark, sf_dir).collect()
    }
    assert got == truth
    # the gate is non-vacuous only if it covers the class the
    # distance-0 bucket groupBy cannot see
    assert any(h > 0 for _, _, h in truth), "fixture has no 1..3 pairs"


def test_candidates_prune_the_quadratic(spark, sf_dir):
    fp = _simhash48(_load_wide(spark, sf_dir, "documents"))
    n = fp.count()
    blocks = fp.select(
        "doc_id", F.explode(F.expr("sequence(0, 3)")).alias("j"),
        F.col("fp"),
    ).withColumn("key", F.expr("shiftright(fp, 12 * j) & 4095"))
    a = blocks.select(F.col("doc_id").alias("doc_a"), "j", "key")
    b = blocks.select(F.col("doc_id").alias("doc_b"), "j", "key")
    n_cand = (
        a.join(b, ["j", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
        .count()
    )
    all_pairs = n * (n - 1) // 2
    assert n_cand < all_pairs * 0.25, (n_cand, all_pairs)
