"""Session-12 batch-4 laws: Hill-estimator replay + tail-cutoff
reality, GDPR purge completeness/minimality, and the CDC apply's
delete / last-wins / resurrection branches."""
import math
import os

import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as em

SF01 = "/root/testdata/sf0.01"


# ----------------------------------------------------- degree tail


def test_degree_powerlaw_hill_replay_and_cutoff(spark):
    out = em.q_degree_powerlaw(spark, SF01).toPandas()
    # a real histogram, not the 2-value regular graph
    assert out["degree"].nunique() >= 10
    # Hill replay from the histogram itself
    tail = out[out["degree"] >= em.PL_DMIN]
    excl = out[out["degree"] < em.PL_DMIN]
    assert len(excl) >= 1, "the d_min cutoff must exclude something"
    n_tail = int(tail["n_nodes"].sum())
    s = sum(
        int(r["n_nodes"])
        * round(math.log(r["degree"] / float(em.PL_DMIN)) * em.PL_LN_SCALE)
        for _, r in tail.iterrows()
    )
    alpha = round(1.0 + (n_tail * em.PL_LN_SCALE) / s, 6)
    assert (out["n_tail"] == n_tail).all()
    assert out["alpha"].iloc[0] == pytest.approx(alpha, abs=1e-9)
    assert (out["in_tail"] == (out["degree"] >= em.PL_DMIN)).all()
    # the overlay produces a genuine heavy tail: max degree is far
    # above the median degree
    assert out["degree"].max() >= 10 * int(out["degree"].median())
    # a sane tail exponent for a hub graph
    assert 1.1 < alpha < 5.0


# ------------------------------------------------------ GDPR purge


def test_forget_user_purge_laws(spark):
    ev = pd.read_parquet(os.path.join(SF01, "events.parquet"))
    listed = ev[ev["user_id"] % em.FORGET_MOD == em.FORGET_RESIDUE]
    assert len(listed) > 0, "deletion list must be non-empty"
    purged = em._forget_purged(spark, SF01).toPandas()
    manifest = em.q_forget_user(spark, SF01).toPandas()
    # completeness: no listed user survives the purge
    assert (
        purged["user_id"] % em.FORGET_MOD == em.FORGET_RESIDUE
    ).sum() == 0
    # minimality: non-listed rows are untouched (exact multiset by id)
    keep = ev[ev["user_id"] % em.FORGET_MOD != em.FORGET_RESIDUE]
    assert sorted(purged["event_id"]) == sorted(keep["event_id"])
    # accounting: dropped + remaining == total, and the manifest's
    # per-user counts sum to the dropped slice
    assert manifest["n_rows_dropped"].sum() + len(purged) == len(ev)
    per_user = listed.groupby("user_id").size()
    m = manifest.set_index("user_id")["n_rows_dropped"]
    assert m.sort_index().equals(per_user.sort_index().astype("int64"))
    # the manifest carries no content columns
    assert set(manifest.columns) == {
        "user_id", "n_rows_dropped", "n_days_active", "n_types"
    }


# ------------------------------------------------------- CDC apply


def test_cdc_apply_branches(spark):
    import hashlib

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    d = pd.read_parquet(os.path.join(SF01, "documents.parquet"))[
        ["doc_id", "text"]
    ]
    out = em.q_cdc_apply(spark, SF01).toPandas().set_index("doc_id")
    by_id = dict(zip(d["doc_id"], d["text"]))
    deleted = {
        i for i in by_id if i % 9 == 5 and i % 18 != 5
    }
    resurrected = {i for i in by_id if i % 18 == 5}
    assert deleted and resurrected, "both delete classes must occur"
    # delete branch: keys whose last op is D vanish
    assert not (set(out.index) & deleted)
    # resurrection branch: deleted-then-reinserted keys survive with
    # the NEW digest and last_seq 4 (its own transaction — at seq 3
    # doc_id ≡ 41 mod 72 would tie with the second update and the
    # max_by winner would be engine-dependent)
    for i in sorted(resurrected)[:10]:
        assert out.loc[i, "digest"] == md5("resurrected:" + by_id[i])
        assert out.loc[i, "last_seq"] == 4
    # last-wins: doc_id%8==1 got U@1 then U@3 -> v3 digest, 3 ops+base
    twice = [i for i in by_id if i % 8 == 1 and i % 9 != 5]
    assert twice
    for i in sorted(twice)[:10]:
        assert out.loc[i, "digest"] == md5(by_id[i] + " v3")
        assert out.loc[i, "n_ops"] == 3  # base + U1 + U3
    # single update: %4==1 but not %8==1 -> v2
    once = [i for i in by_id if i % 4 == 1 and i % 8 != 1 and i % 9 != 5]
    for i in sorted(once)[:10]:
        assert out.loc[i, "digest"] == md5(by_id[i] + " v2")
    # inserts: new keys present with the new digest
    news = [i for i in by_id if i % 10 == 3]
    assert news
    for i in sorted(news)[:10]:
        assert out.loc[i + em.CDC_NEW_OFFSET, "digest"] == md5(
            "new:" + by_id[i]
        )
    # untouched keys keep the base digest and seq 0
    plain = [
        i for i in by_id
        if i % 4 != 1 and i % 9 != 5 and i % 8 != 1
    ]
    for i in sorted(plain)[:10]:
        assert out.loc[i, "digest"] == md5(by_id[i])
        assert out.loc[i, "last_seq"] == 0
