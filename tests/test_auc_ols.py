"""Session-12 operator laws: exact AUC midrank algebra (brute-force
pair counting), OLS closed form vs DuckDB's independent REGR_*
implementation, RRF rational assembly, and the bottom-k sketch's
merge/superset/estimator laws."""
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as em

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def _duck(sf_dir):
    con = duckdb.connect()
    for t in ["documents", "events"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


# ------------------------------------------------------------- AUC


def _brute_auc(scores, labels):
    """AUC by definition: P(score_pos > score_neg) + 0.5 P(tie) over
    all (pos, neg) pairs — the O(n^2) ground truth the rank statistic
    must equal exactly (as a rational: numerator in half-units)."""
    pos = [s for s, y in zip(scores, labels) if y == 1]
    neg = [s for s, y in zip(scores, labels) if y == 0]
    num2 = 0  # 2 * (concordant + 0.5*ties), an integer
    for p in pos:
        for n in neg:
            if p > n:
                num2 += 2
            elif p == n:
                num2 += 1
    return num2, 2 * len(pos) * len(neg)


def test_auc_equals_brute_force_pair_counting(spark):
    out = {
        r["lang"]: r
        for r in em.q_auc_eval(spark, SF001).collect()
    }
    df = pd.read_parquet(os.path.join(SF001, "documents.parquet"))
    df["s"] = df["text"].str.split(" ").map(len)
    df["y"] = (
        (df["s"] >= em.AUC_NW_THRESHOLD)
        ^ (df["doc_id"] % em.AUC_NOISE_MOD == 3)
    ).astype(int)
    assert out, "no langs survived the n_pos>0/n_neg>0 filter"
    for lang, grp in df.groupby("lang"):
        num2, den2 = _brute_auc(grp["s"].tolist(), grp["y"].tolist())
        if den2 == 0:
            assert lang not in out
            continue
        r = out[lang]
        # same rational, not just the same 6-dp float
        assert (r["auc_num"], r["auc_den"]) == (num2, den2), lang
        assert r["auc"] == round(num2 / den2, 6)
        # the fixture must be non-degenerate: discriminative but noisy
        assert 0.5 < num2 / den2 < 1.0, lang


def test_auc_fixture_has_real_ties(spark):
    """Midrank handling must be exercised: some tied score value has
    BOTH labels in it (otherwise ties contribute nothing and the
    two_avg algebra is vacuously right)."""
    df = pd.read_parquet(os.path.join(SF001, "documents.parquet"))
    df["s"] = df["text"].str.split(" ").map(len)
    df["y"] = (
        (df["s"] >= em.AUC_NW_THRESHOLD)
        ^ (df["doc_id"] % em.AUC_NOISE_MOD == 3)
    ).astype(int)
    mixed = df.groupby(["lang", "s"])["y"].agg(["min", "max"])
    assert ((mixed["min"] == 0) & (mixed["max"] == 1)).any()


# ------------------------------------------------------------- OLS


def test_ols_matches_duckdb_regr_builtins(spark):
    """The closed-form rationals must agree with DuckDB's own
    REGR_SLOPE/REGR_INTERCEPT (an independent streaming-moments
    implementation) to 6 dp on the same daily table."""
    rows = em.q_ols_trend(spark, SF01).collect()
    assert len(rows) >= 3
    con = _duck(SF01)
    ref = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            """
            WITH a AS (SELECT MIN(CAST(ts AS DATE)) AS d0 FROM events),
            daily AS (
                SELECT event_type,
                       DATE_DIFF('day', a.d0, CAST(ts AS DATE)) AS x,
                       COUNT(*) AS y
                FROM events CROSS JOIN a GROUP BY 1, 2
            )
            SELECT event_type, REGR_SLOPE(y, x), REGR_INTERCEPT(y, x)
            FROM daily GROUP BY event_type
            """
        ).fetchall()
    }
    for r in rows:
        slope = r["slope_num"] / r["slope_den"]
        icept = r["icept_num"] / r["icept_den"]
        assert slope == pytest.approx(ref[r["event_type"]][0], abs=1e-6)
        assert icept == pytest.approx(ref[r["event_type"]][1], abs=1e-6)
        assert r["slope"] == round(slope, 6)
        assert r["icept"] == round(icept, 6)


# ------------------------------------------------------------- RRF


def test_rrf_rational_assembly_and_coverage(spark):
    rows = em.q_rrf_fuse(spark, SF01).collect()
    by_id = {r["doc_id"]: r for r in rows}
    n_both = sum(
        1 for r in rows if r["ra"] is not None and r["rb"] is not None
    )
    n_single = len(rows) - n_both
    # non-vacuity: the two rankers overlap somewhere and disagree
    # somewhere, so both CASE branches execute
    assert n_both >= 1 and n_single >= 1
    for r in rows:
        terms = [
            1.0 / (em.RRF_K0 + rk)
            for rk in (r["ra"], r["rb"])
            if rk is not None
        ]
        assert r["rrf_num"] / r["rrf_den"] == pytest.approx(
            sum(terms), rel=1e-12
        )
    # fused_rank is a permutation ordered by the score
    ranks = sorted(r["fused_rank"] for r in rows)
    assert ranks == list(range(1, len(rows) + 1))
    ordered = sorted(
        rows, key=lambda r: (-r["rrf_num"] / r["rrf_den"], r["doc_id"])
    )
    assert [r["fused_rank"] for r in ordered] == ranks
    # a doc on both lists with good ranks must beat a tail-of-one-list doc
    best_both = min(
        (r for r in rows if r["ra"] and r["rb"]),
        key=lambda r: r["fused_rank"],
    )
    worst_single = max(
        (r for r in rows if (r["ra"] is None) != (r["rb"] is None)),
        key=lambda r: r["fused_rank"],
    )
    assert best_both["fused_rank"] < worst_single["fused_rank"]
    assert len(by_id) == len(rows)  # doc_id unique after the merge


# ------------------------------------------------- bottom-k sketch


def _hash52(user_ids):
    import hashlib

    return np.array(
        sorted(
            {
                int(hashlib.md5(str(u).encode()).hexdigest()[:13], 16)
                for u in user_ids
            }
        ),
        dtype=np.int64,
    )


def test_bottomk_merge_law_and_estimator(spark):
    """bottom_k(A ∪ B) == bottom_k(bottom_k(A) ∪ bottom_k(B)) — the
    mergeability that lets per-partition/per-day sketches roll up —
    plus estimator exactness below k and sanity above k."""
    ev = pd.read_parquet(os.path.join(SF01, "events.parquet"))
    k = em.BK_K
    for et, grp in ev.groupby("event_type"):
        hs = _hash52(grp["user_id"])
        half = len(grp) // 2
        a = _hash52(grp["user_id"].iloc[:half])
        b = _hash52(grp["user_id"].iloc[half:])
        merged = np.array(
            sorted(set(a[:k].tolist()) | set(b[:k].tolist()))[:k]
        )
        assert np.array_equal(hs[:k], merged), et
    out = em.q_bottomk_sketch(spark, SF01).toPandas()
    for et, grp in ev.groupby("event_type"):
        hs = _hash52(grp["user_id"])
        sk = out[out["event_type"] == et].sort_values("pos")
        assert np.array_equal(
            sk["h"].to_numpy(), hs[: min(k, len(hs))]
        ), et
        n_exact = len(set(grp["user_id"]))
        est = sk["dv_est"].iloc[0]
        if len(hs) < k:
            assert est == float(len(hs))
        else:
            # KMV standard error ~ 1/sqrt(k-2): allow 4 sigma
            assert abs(est - n_exact) / n_exact < 4.0 / np.sqrt(k - 2), (
                et,
                est,
                n_exact,
            )
        assert (sk["n_distinct"] == n_exact).all() or len(hs) != n_exact


def test_bottomk_partition_fold_superset_law():
    """The mapInPandas fold may see any batch split; its output must
    always contain the true per-type bottom-k."""
    rng = np.random.RandomState(7)
    pdf = pd.DataFrame(
        {
            "event_type": rng.choice(["a", "b", "c"], 500),
            "h": rng.randint(0, 2**50, 500),
        }
    ).drop_duplicates()
    fold = em._bk_partition_bottomk(em.BK_K)
    for nsplit in (1, 3, 7):
        batches = np.array_split(pdf, nsplit)
        (res,) = list(fold(iter(batches)))
        for et, grp in pdf.groupby("event_type"):
            want = set(np.sort(grp["h"].to_numpy())[: em.BK_K].tolist())
            sub = res[res["event_type"] == et]
            got = set(sub["h"].tolist())
            assert want <= got, (nsplit, et)
            # count-carry law: the partition's per-type distinct row
            # count rides out on exactly one row per type
            assert sub["w"].sum() == len(grp), (nsplit, et)
            assert (sub["w"] > 0).sum() == 1, (nsplit, et)
