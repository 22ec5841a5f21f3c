"""SQ8 embedding quantization (q_embed_quantize): the compression is
only useful if the compressed index still retrieves the right
neighbors.  Pins (a) the numeric contract of the Spark projection
(saturation, bounded dequantization error, near-1 cosine) and (b) the
retrieval-quality claim — top-k cosine recall of the dequantized
int8 vectors vs fp32 — with the identical quantizer restated in
NumPy (independent implementation, same floor(x*scale+0.5) rule)."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entry_mod

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF001 = os.path.join(TESTDATA, "sf0.01")


def _vecs():
    t = pq.read_table(os.path.join(SF001, "embeddings.parquet"))
    df = t.to_pandas().sort_values("vec_id")
    return np.stack(df["embedding"].to_numpy()).astype(np.float64)


def _quantize(x: np.ndarray):
    """Reference quantizer: identical arithmetic to the Spark/DuckDB
    expression — scale = 127/max|x_i|, q = floor(x*scale + 0.5)."""
    mx = np.abs(x).max(axis=1, keepdims=True)
    scale = 127.0 / mx
    q = np.floor(x * scale + 0.5)
    return q, q / scale


def _topk_sets(x: np.ndarray, k: int):
    n = x / np.linalg.norm(x, axis=1, keepdims=True)
    sims = n @ n.T
    np.fill_diagonal(sims, -np.inf)
    idx = np.argpartition(-sims, k, axis=1)[:, :k]
    return [set(row) for row in idx]


def test_sq8_preserves_topk_recall():
    """The headline claim: int8-dequantized cosine top-10 recalls
    >= 0.95 of the fp32 top-10 on the real embedding fixture."""
    x = _vecs()
    q, dq = _quantize(x)
    assert np.abs(q).max() <= 127  # symmetric range respected
    base = _topk_sets(x, 10)
    comp = _topk_sets(dq, 10)
    recall = np.mean([len(b & c) / 10 for b, c in zip(base, comp)])
    assert recall >= 0.95, recall


def test_quantize_query_numeric_contract(spark):
    """The Spark projection's own quality metrics: every vector
    dequantizes back with cosine >= 0.999 and max abs error <= the
    half-step bound mx/127 * (1/2 + eps); at least one saturated lane
    (the max element itself) per vector."""
    rows = entry_mod.q_embed_quantize(spark, SF001).collect()
    assert len(rows) == 500
    x = _vecs()
    mx = np.abs(x).max(axis=1)
    bound = mx / 127.0 * 0.5 + 1e-9
    by_id = {i: b for i, b in enumerate(bound)}
    for r in rows:
        assert r.n_sat >= 1, r
        assert r.cos_dequant >= 0.999, r
        assert r.max_abs_err <= by_id[r.vec_id] + 5e-7, r
