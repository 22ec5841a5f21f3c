"""scd2_history: validity-interval laws over the crawl versions.

Per doc: version_seq contiguous from 1, exactly ONE open (is_current)
interval which is the LAST one, intervals chain (valid_to of version i
== valid_from of version i+1), and the version counts agree with the
crawl synthesis (refetched docs have 2 versions, discovered docs 1).
The current row of every doc must equal q_crawl_upsert's winner —
the latest-wins merge is a projection of this history.
"""
from collections import defaultdict

from __spark_entry__ import q_crawl_upsert, q_scd2_history


def test_scd2_interval_laws(spark, sf_dir):
    rows = q_scd2_history(spark, sf_dir).collect()
    assert rows
    by_doc = defaultdict(list)
    for r in rows:
        by_doc[r["doc_id"]].append(r)
    for doc_id, vs in by_doc.items():
        vs.sort(key=lambda r: r["version_seq"])
        assert [v["version_seq"] for v in vs] == list(range(1, len(vs) + 1))
        # chaining + single open interval at the end
        for a, b in zip(vs, vs[1:]):
            assert a["valid_to"] == b["valid_from"], doc_id
            assert a["is_current"] == 0
        assert vs[-1]["valid_to"] == -1
        assert vs[-1]["is_current"] == 1
        # synthesis census
        if doc_id >= 100_000:
            assert len(vs) == 1 and vs[0]["crawl_id"] == 1
        elif doc_id % 4 == 1:
            assert len(vs) == 2
        else:
            assert len(vs) == 1


def test_scd2_current_equals_upsert_winner(spark, sf_dir):
    cur = {r["doc_id"]: (r["crawl_id"], r["valid_from"], r["content_digest"])
           for r in q_scd2_history(spark, sf_dir).collect()
           if r["is_current"] == 1}
    win = {r["doc_id"]: (r["crawl_id"], r["fetch_ts"], r["content_digest"])
           for r in q_crawl_upsert(spark, sf_dir).collect()}
    assert cur == win
