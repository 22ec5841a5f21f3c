"""inverted_index: postings cross-checked against an independent
pandas restatement (df/cf totals, ordered posting prefix, digest)."""

import hashlib
import os

import pyarrow.parquet as pq

import __spark_entry__ as entry_mod


def test_postings_match_pandas_reference(spark, sf_dir):
    rows = {r.token: r for r in
            entry_mod.q_inverted_index(spark, sf_dir).collect()}
    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet")
    ).to_pandas()
    # independent reference: dict-of-dicts token -> doc -> tf
    ref: dict = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        for t in str(text).split(" "):
            if t:
                ref.setdefault(t, {}).setdefault(int(doc_id), 0)
                ref[t][int(doc_id)] += 1
    assert set(rows) == set(ref)
    for t, by_doc in ref.items():
        r = rows[t]
        assert r.df == len(by_doc)
        assert r.cf == sum(by_doc.values())
        full = ",".join(f"{d}:{by_doc[d]}" for d in sorted(by_doc))
        assert r.posting_digest == hashlib.md5(full.encode()).hexdigest()
        assert full.startswith(r.posting_head)
        assert r.posting_head.count(",") <= 9
