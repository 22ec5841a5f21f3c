"""Structural invariants for the training-set layout operators —
laws the driver's value-hash gate cannot express:

* chunk_documents: full token coverage (every token index of every
  doc falls in >= 1 chunk), stride/overlap geometry, exact tail.
* pack_sequences: placement is a prefix sum (seq_id * SEQLEN +
  seq_offset == tokens before the doc in its shard), token
  conservation per shard, crosses_boundary definition.
"""

import os
from collections import defaultdict

import pyarrow.parquet as pq

import __spark_entry__ as entry_mod

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF = os.path.join(TESTDATA, "sf0.001")


def _token_counts():
    df = pq.read_table(os.path.join(SF, "documents.parquet")).to_pandas()
    return {int(r.doc_id): len(r.text.split(" ")) for r in df.itertuples()}


def test_chunks_cover_every_token_with_correct_geometry(spark):
    n_toks = _token_counts()
    rows = entry_mod.q_chunk_documents(spark, SF).collect()
    K, S = entry_mod.CHUNK_TOKENS, entry_mod.CHUNK_STRIDE
    by_doc = defaultdict(list)
    for r in rows:
        by_doc[r.doc_id].append(r)
    assert set(by_doc) == set(n_toks)
    for doc_id, chunks in by_doc.items():
        n = n_toks[doc_id]
        chunks.sort(key=lambda r: r.chunk_idx)
        covered = set()
        for i, c in enumerate(chunks):
            assert c.chunk_idx == i
            assert c.tok_start == i * S  # stride geometry
            assert c.n_chunk_tokens == min(K, n - c.tok_start)
            assert len(c.chunk_text.split(" ")) == c.n_chunk_tokens
            covered.update(range(c.tok_start, c.tok_start + c.n_chunk_tokens))
        assert covered == set(range(n)), doc_id  # full coverage, no gap


def test_packing_is_exact_prefix_sum_per_shard(spark):
    n_toks = _token_counts()
    rows = entry_mod.q_pack_sequences(spark, SF).collect()
    L = entry_mod.PACK_SEQLEN
    by_shard = defaultdict(list)
    for r in rows:
        assert r.n_tokens == n_toks[r.doc_id]
        by_shard[r.shard].append(r)
    assert len(by_shard) == entry_mod.PACK_SHARDS
    for shard, docs in by_shard.items():
        docs.sort(key=lambda r: r.doc_id)
        cum = 0
        for r in docs:
            # placement IS the prefix sum: no gaps, no overlaps
            assert r.seq_id * L + r.seq_offset == cum, (shard, r.doc_id)
            assert 0 <= r.seq_offset < L
            assert r.crosses_boundary == int(r.seq_offset + r.n_tokens > L)
            cum += r.n_tokens
        # token conservation: the shard's final write position
        assert cum == sum(n_toks[r.doc_id] for r in docs)
