"""Robust outlier fences: the breakdown-point property the operator's
docstring claims — the injected contamination must (a) all be flagged,
(b) drag no clean rows over the fence, and (c) leave the median/MAD
estimates essentially where the CLEAN data put them (the reason
median/MAD replace mean/stddev for corpus-quality fences)."""

import os

import pandas as pd

import __spark_entry__ as em

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF = os.path.join(TESTDATA, "sf0.001")


def _lower_median(vals):
    s = sorted(vals)
    return s[(len(s) + 1) // 2 - 1]


def test_contaminated_flagged_clean_not_and_fences_robust(spark):
    rows = em.q_robust_outliers(spark, SF).collect()
    flagged = {r.doc_id for r in rows}
    fences = {r.lang: (r.med, r.mad) for r in rows}

    docs = pd.read_parquet(os.path.join(SF, "documents.parquet"))
    contaminated = set(
        docs.loc[docs["doc_id"] % em.RO_CONTAM_MOD == 0, "doc_id"]
    )
    assert contaminated, "fixture must contain contaminated docs"
    assert flagged == contaminated

    # definitional equality: the Spark fences equal a pandas lower-
    # median/MAD on the SAME contaminated values; robustness: they sit
    # within 5% of the clean-data fences (a c-row contamination can
    # shift a rank statistic by at most c order positions)
    for lang, grp in docs.groupby("lang"):
        x = (grp["n_chars"]
             + (grp["doc_id"] % em.RO_CONTAM_MOD == 0) * em.RO_CONTAM_SHIFT
             ).tolist()
        med_x = _lower_median(x)
        mad_x = _lower_median([abs(v - med_x) for v in x])
        clean = grp["n_chars"].tolist()
        med_clean = _lower_median(clean)
        mad_clean = _lower_median([abs(v - med_clean) for v in clean])
        if lang in fences:
            med_got, mad_got = fences[lang]
            assert (med_got, mad_got) == (med_x, mad_x)
            assert abs(med_got - med_clean) <= 0.05 * med_clean
            assert abs(mad_got - mad_clean) <= 0.15 * max(mad_clean, 20)

    # contrast: a mean + 3*stddev fence on the contaminated data
    # misses at least one contaminated doc in at least one language
    # (the estimator the robust fence replaces is dragged by its own
    # target) OR inflates stddev by > 25% somewhere
    moved = False
    for lang, grp in docs.groupby("lang"):
        x = grp["n_chars"] + (grp["doc_id"] % em.RO_CONTAM_MOD == 0) * em.RO_CONTAM_SHIFT
        if grp["n_chars"].std() > 0 and x.std() > 1.25 * grp["n_chars"].std():
            moved = True
    assert moved, "contamination should visibly inflate stddev fences"
