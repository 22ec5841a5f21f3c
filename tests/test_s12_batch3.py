"""Session-12 batch-3 laws: SRM verdict math + skew detection,
Fellegi-Sunter score/classification structure, calibration-bin
accounting."""
import hashlib
import os

import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as em

SF01 = "/root/testdata/sf0.01"


# ------------------------------------------------------------- SRM


def _chi2_verdict(n0, n1):
    return 1000 * (n0 - n1) ** 2 > em.AB_CHI2_CRIT_MILLI * (n0 + n1)


def test_srm_healthy_on_hash_assignment_and_fires_on_skew(spark):
    rows = em.q_ab_assign_srm(spark, SF01).collect()
    assert rows
    for r in rows:
        # verdict algebra replay
        assert bool(r["srm_flag"]) == _chi2_verdict(r["n0"], r["n1"])
        assert r["srm_num"] == (r["n0"] - r["n1"]) ** 2
        assert r["srm_den"] == r["n0"] + r["n1"]
        # the md5 assignment is actually balanced: a healthy pipeline
        # must NOT flag (this is the hash-balance law in disguise)
        assert r["srm_flag"] == 0
    # the guard fires when it should: simulate a bot filter dropping
    # 30% of arm-1 users from a segment of the same size
    n = rows[0]["n0"] + rows[0]["n1"]
    n1_broken = int(rows[0]["n1"] * 0.5)
    assert _chi2_verdict(rows[0]["n0"], n1_broken)
    # boundary sanity: 50/50 exactly never flags, 60/40 at n=1000 does
    assert not _chi2_verdict(500, 500)
    assert _chi2_verdict(600, 400)


def test_srm_assignment_is_sticky():
    """The arm is a pure function of (user, salt) — no state."""
    def arm(u):
        hv = int(
            hashlib.md5(f"{u}|{em.AB_EXP_SALT}".encode()).hexdigest()[:13],
            16,
        )
        return hv % 2

    assert all(arm(u) == arm(u) for u in range(100))
    # and roughly balanced over a user range
    arms = [arm(u) for u in range(2000)]
    assert 0.45 < sum(arms) / len(arms) < 0.55


# --------------------------------------------------------- linkage


def test_linkage_score_structure(spark):
    rows = em.q_linkage_score(spark, SF01).collect()
    assert rows
    pats = set()
    for r in rows:
        w = em.FS_W
        want = (
            w["lang"][0] if r["agree_lang"] else w["lang"][1]
        ) + (
            w["source"][0] if r["agree_source"] else w["source"][1]
        ) + (
            w["len"][0] if r["agree_len"] else w["len"][1]
        )
        assert r["score"] == pytest.approx(want, abs=1e-9)
        assert r["is_match"] == (1 if want >= em.FS_THRESHOLD else 0)
        pats.add((r["agree_lang"], r["agree_source"], r["agree_len"]))
    # non-vacuity: both classes occur, and multiple agreement patterns
    assert any(r["is_match"] for r in rows)
    assert any(not r["is_match"] for r in rows)
    assert len(pats) >= 3
    # the injected one-word-edit variants are found as matches: every
    # variant pairs with its source (same block, same lang/source)
    var_pairs = [
        r for r in rows if r["b_id"] == r["a_id"] + 20_000_000
    ]
    assert var_pairs and all(r["is_match"] for r in var_pairs)


# ----------------------------------------------------- calibration


def test_calibration_bins_accounting(spark):
    out = em.q_calibration_bins(spark, SF01).toPandas()
    d = pd.read_parquet(os.path.join(SF01, "documents.parquet"))
    # conservation: every doc lands in exactly one bin
    assert out["n"].sum() == len(d)
    nw = d["text"].str.split(" ").map(len)
    y = (
        (nw >= em.AUC_NW_THRESHOLD)
        ^ (d["doc_id"] % em.AUC_NOISE_MOD == 3)
    ).astype(int)
    assert out["n_pos"].sum() == int(y.sum())
    for _, r in out.iterrows():
        assert 0 <= r["bin"] < em.CAL_BINS
        assert 0 <= r["n_pos"] <= r["n"]
        assert r["obs_rate"] == round(r["n_pos"] / r["n"], 6)
        # mean_pred lives inside (or at the edge of) its bin up to the
        # 6-dp score rounding
        assert (
            r["bin"] / em.CAL_BINS - 1e-6
            <= r["mean_pred"]
            <= (r["bin"] + 1) / em.CAL_BINS + 1e-6
        ) or r["bin"] == em.CAL_BINS - 1
    # non-vacuity: the classifier is measurably miscalibrated
    # somewhere (|obs - pred| > 0.1 in at least one bin) — otherwise
    # the diagram tests nothing
    assert (out["obs_rate"] - out["mean_pred"]).abs().max() > 0.1
