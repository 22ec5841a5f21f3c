"""Session-16 batch-33 laws: KMV replayed hash-for-hash with the
EXACT sketch-merge law (the k smallest of the concatenated
per-source sketches equal the k smallest of the full union stream)
and the coarse-but-honest estimate bounds."""
import hashlib
import os

import pandas as pd

import __spark_entry__ as em

SF01 = "/root/testdata/sf0.01"


def _h(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:14], 16)


def test_kmv_replay_and_merge_law(spark):
    out = em.q_kmv_distinct(spark, SF01).toPandas().set_index("source")
    docs = pd.read_parquet(os.path.join(SF01, "documents.parquet"))
    by_src = {}
    for r in docs.itertuples():
        s = by_src.setdefault(r.source, set())
        for tok in str(r.text).split(" "):
            if tok:
                s.add(tok)
    sketches = {}
    for src, toks in by_src.items():
        hs = sorted({_h(t) for t in toks})
        assert len(hs) >= em.KMV_K
        sketches[src] = hs[: em.KMV_K]
        hk = hs[em.KMV_K - 1]
        row = out.loc[src]
        assert int(row["hk"]) == hk
        assert int(row["n_exact"]) == len(toks)
        assert int(row["est"]) == (
            (em.KMV_K - 1) * em.KMV_SPACE
        ) // hk
        # k=16 is coarse and says so: order-of-magnitude sanity only
        assert 0.2 * len(toks) < int(row["est"]) < 5 * len(toks)
    # THE MERGE LAW, exactly: union-of-sketches k-th minimum equals
    # the k-th minimum of the full union stream
    from_sketches = sorted(
        {h for sk in sketches.values() for h in sk}
    )[em.KMV_K - 1]
    full_union = sorted(
        {_h(t) for toks in by_src.values() for t in toks}
    )[em.KMV_K - 1]
    assert from_sketches == full_union
    assert set(out["est_union"].astype(int)) == {
        ((em.KMV_K - 1) * em.KMV_SPACE) // full_union
    }
