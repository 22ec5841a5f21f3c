"""quality_logit / editdist_verify / snapshot_diff structural laws.

- quality_logit: monotonicity in each feature direction (a classifier
  whose score does not rise with its positive-weight features is
  mis-assembled) and sigmoid sanity (score in (0,1), keep == score>=.5).
- editdist_verify: every injected variant pair is found with the
  expected small distance (one word substituted), no pair exceeds the
  radius, and distances are symmetric-consistent with Python's DP.
- snapshot_diff: the four statuses partition the URL universe; counts
  reconcile exactly with the fixture's modulus classes; digest column
  carries the LIVE digest for non-removed rows.
"""

import os

import __spark_entry__ as em

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF = os.path.join(TESTDATA, "sf0.001")


def _lev(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_quality_logit_monotone_and_sane(spark):
    rows = em.q_quality_logit(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 < r.score < 1.0
        assert r.keep == (1 if r.score >= 0.5 else 0)
    # direction check on a controlled pair: more stopwords and higher
    # alpha fraction must raise the score
    d = spark.createDataFrame(
        [(1, "zzz " * 40 + "zzz"), (2, ("the of and to in a " * 7)[:-1])],
        "doc_id long, text string",
    )
    import tempfile

    tmp = tempfile.mkdtemp()
    d.write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
    out = {r.doc_id: r.score for r in em.q_quality_logit(spark, tmp).collect()}
    assert out[2] > out[1]


def test_editdist_variants_found_and_distances_exact(spark):
    rows = em.q_editdist_verify(spark, SF).collect()
    pairs = {(r.a_id, r.b_id): r.dist for r in rows}
    assert all(d <= em.ED_MAX_DIST for d in pairs.values())
    # injected variants: (doc, doc + 20M) with the 5th word replaced
    injected = {(a, b): d for (a, b), d in pairs.items()
                if b == a + 20_000_000}
    assert injected, "variant pairs must be found"
    docs = {r.doc_id: r.text
            for r in em._ed_docs(spark, SF).collect()}
    for (a, b), d in pairs.items():
        assert d == _lev(docs[a], docs[b]), (a, b)
    for (a, b), d in injected.items():
        # one word substituted: distance bounded by the two word
        # lengths, never zero
        w = docs[a].split(" ")[4]
        assert 0 < d <= len(w) + len("EDITED")


def test_snapshot_diff_partitions_universe(spark):
    rows = em.q_snapshot_diff(spark, SF).collect()
    by = {}
    for r in rows:
        by.setdefault(r.status, set()).add(r.doc_id)
    n = 500
    want_added = {i + 100_000 for i in range(n) if i % 10 == 3}
    want_changed = {i for i in range(n) if i % 4 == 1}
    want_removed = {i for i in range(n) if i % 9 == 5 and i % 4 != 1}
    assert by["added"] == want_added
    assert by["changed"] == want_changed
    assert by["removed"] == want_removed
    assert by["unchanged"] == (
        set(range(n)) - want_changed - want_removed
    )
    # statuses partition: no doc appears twice
    all_ids = [r.doc_id for r in rows]
    assert len(all_ids) == len(set(all_ids))
