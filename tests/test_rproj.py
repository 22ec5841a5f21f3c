"""Random sign projection + cluster-balanced sampling: the properties
the operators exist for, beyond driver-gate value equality.

- embed_rproj must actually PRESERVE GEOMETRY (Johnson-Lindenstrauss):
  pairwise cosines in the 8-dim projected space track the 64-dim
  originals.  With k=8 the JL distortion is coarse; the pin is a rank
  correlation over many pairs, not per-pair epsilon.
- cluster_sample must keep exactly ceil(0.3 * n_c) per cluster, with
  inverse-propensity weights that reconstruct cluster sizes exactly.
"""

import os

import numpy as np
import pandas as pd

import __spark_entry__ as entry_mod

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF = os.path.join(TESTDATA, "sf0.001")


def test_sign_matrix_is_deterministic_and_balanced():
    s1 = entry_mod._rproj_signs()
    s2 = entry_mod._rproj_signs()
    assert s1 == s2
    assert len(s1) == entry_mod.RPROJ_K
    assert all(len(row) == entry_mod.RPROJ_D for row in s1)
    flat = [v for row in s1 for v in row]
    assert set(flat) == {-1, 1}
    # md5 bits are unbiased: neither sign dominates grossly
    assert 0.3 < flat.count(1) / len(flat) < 0.7


def test_projection_preserves_norms(spark):
    # E[y_j^2] = ||x||^2 for sign projections, so ||y||^2 / k must
    # concentrate around ||x_q||^2 (both in quantized units) — the JL
    # property at the statistic the operator's downstream consumers
    # (LSH bucketing, clustering) actually rely on
    out = entry_mod.q_embed_rproj(spark, SF).toPandas()
    proj = out.pivot(index="vec_id", columns="j", values="y").sort_index()
    emb = pd.read_parquet(os.path.join(SF, "embeddings.parquet"))
    orig = np.stack(emb.sort_values("vec_id")["embedding"].to_numpy())
    xq = np.floor(orig.astype(np.float64) * entry_mod.RPROJ_SCALE)
    ratios = (proj.to_numpy().astype(np.float64) ** 2).sum(axis=1) / (
        entry_mod.RPROJ_K * (xq**2).sum(axis=1)
    )
    assert 0.85 < ratios.mean() < 1.15, ratios.mean()
    assert (ratios > 0.3).all() and (ratios < 3.0).all()


def test_projection_separates_near_duplicates():
    # the operational property: after projection, a near-duplicate
    # pair (cosine ~0.99) must still score far above unrelated pairs —
    # what dedup-after-reduction depends on.  Deterministic synthetic
    # vectors through the SAME sign matrix.
    rng = np.random.default_rng(7)
    base = rng.normal(size=(50, entry_mod.RPROJ_D))
    near = base + 0.05 * rng.normal(size=base.shape)
    other = rng.normal(size=base.shape)
    S = np.asarray(entry_mod._rproj_signs(), dtype=np.float64)

    def cos(a, b):
        pa, pb = a @ S.T, b @ S.T
        return (pa * pb).sum(axis=1) / (
            np.linalg.norm(pa, axis=1) * np.linalg.norm(pb, axis=1)
        )

    near_cos = cos(base, near)
    rand_cos = cos(base, other)
    assert near_cos.min() > 0.8, near_cos.min()
    assert near_cos.min() > rand_cos.max() + 0.2


def test_projection_matches_numpy_reference(spark):
    out = entry_mod.q_embed_rproj(spark, SF).toPandas()
    proj = out.pivot(index="vec_id", columns="j", values="y").sort_index()
    emb = pd.read_parquet(os.path.join(SF, "embeddings.parquet"))
    orig = np.stack(emb.sort_values("vec_id")["embedding"].to_numpy())
    xq = np.floor(orig.astype(np.float64) * entry_mod.RPROJ_SCALE).astype(
        np.int64
    )
    S = np.asarray(entry_mod._rproj_signs(), dtype=np.int64)  # (k, d)
    want = xq @ S.T
    assert (proj.to_numpy() == want).all()


def test_cluster_sample_cap_and_weights(spark):
    out = entry_mod.q_cluster_sample(spark, SF).toPandas()
    num, den = entry_mod.CLUSTER_SAMPLE_NUM, entry_mod.CLUSTER_SAMPLE_DEN
    for cluster, grp in out.groupby("cluster"):
        n_c = int(grp["n_c"].iloc[0])
        cap = (num * n_c + den - 1) // den
        kept = grp[grp["kept"] == 1]
        assert len(grp) == n_c
        assert len(kept) == cap, (cluster, n_c, cap, len(kept))
        # inverse-propensity weights reconstruct the cluster size
        assert abs(kept["weight"].sum() - n_c) < 1e-3
        # ranks are a permutation of 1..n_c
        assert sorted(grp["rk"]) == list(range(1, n_c + 1))
    # every vector appears exactly once
    assert out["vec_id"].is_unique
