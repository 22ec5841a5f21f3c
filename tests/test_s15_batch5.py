"""Session-15 batch-5 laws: Fano burstiness replayed zeros-included
from pandas with all three dispersion classes pinned, Zipf OLS
replayed from numpy-free exact integer sufficient statistics, and
Benjamini-Hochberg step-up replayed from math.comb with the
reach-back property (a rejected hypothesis whose OWN pointwise line
fails) proven non-vacuous on the fixture."""
import math
import os

import pandas as pd

import __spark_entry__ as em

SF01 = "/root/testdata/sf0.01"


def _docs():
    return pd.read_parquet(os.path.join(SF01, "documents.parquet"))


def test_term_burstiness_replay_and_all_classes(spark):
    out = em.q_term_burstiness(spark, SF01).toPandas()
    docs = _docs()
    n_docs = len(docs)
    counts: dict[str, dict[int, int]] = {}
    for r in docs.itertuples():
        did = int(r.doc_id)
        for tok in str(r.text).split(" "):
            if tok:
                c = counts.setdefault(tok, {})
                c[did] = c.get(did, 0) + 1
        # overlay, same constants the query injects
        if did % em.BURST_DOC_MOD == 0:
            counts.setdefault("burstword", {})[did] = em.BURST_TF
        counts.setdefault("steadyword", {})[did] = 1
    expected = {}
    for term, per_doc in counts.items():
        if len(per_doc) < em.BURST_MIN_DF:
            continue
        s1 = sum(per_doc.values())
        s2 = sum(v * v for v in per_doc.values())
        num = n_docs * s2 - s1 * s1  # zeros-included N*var*N identity
        den = n_docs * s1
        verdict = (
            "under" if num < den
            else ("poisson" if num <= 2 * den else "bursty")
        )
        expected[term] = (len(per_doc), s1, num, den, verdict)
    got = {
        r.term: (
            int(r.doc_freq), int(r.total_tf),
            int(r.fano_num), int(r.fano_den), r.dispersion,
        )
        for r in out.itertuples()
    }
    assert got == expected
    # the overlay makes the operator non-vacuous: all three classes
    classes = set(out["dispersion"])
    assert classes == {"under", "poisson", "bursty"}
    by_term = out.set_index("term")
    assert by_term.loc["burstword", "dispersion"] == "bursty"
    # steadyword: every doc exactly once -> variance 0 -> under
    assert by_term.loc["steadyword", "dispersion"] == "under"
    assert int(by_term.loc["steadyword", "fano_num"]) == 0


def test_zipf_fit_replay_and_negative_slope(spark):
    out = em.q_zipf_fit(spark, SF01).toPandas()
    assert len(out) == 1
    row = out.iloc[0]
    freq: dict[str, int] = {}
    for text in _docs()["text"]:
        for tok in str(text).split(" "):
            if tok:
                freq[tok] = freq.get(tok, 0) + 1
    ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    ranked = ranked[: em.ZIPF_TOP]
    xs = [math.floor(math.log(r) * 1e6) for r in range(1, len(ranked) + 1)]
    ys = [math.floor(math.log(f) * 1e6) for _, f in ranked]
    m = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    num, den = m * sxy - sx * sy, m * sxx - sx * sx
    assert int(row.n_terms) == m
    assert int(row.slope_num) == num
    assert int(row.slope_den) == den
    slope = num / den
    assert abs(float(row.slope) - slope) < 1e-12
    intercept = (sy - slope * sx) / m / 1e6
    assert abs(float(row.intercept_ln) - intercept) < 1e-9
    # corpus-health law: rank-frequency slope is negative and the
    # fit is over a genuinely decaying curve (top freq > bottom freq)
    assert slope < 0
    assert ranked[0][1] > ranked[-1][1]


def _bh_replay():
    ev = pd.read_parquet(os.path.join(SF01, "events.parquet"))
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    first = ev.groupby("user_id").head(em.BH_N_TRIALS)
    x = (
        first.assign(s=first["event_type"].isin(em.BH_PRED_TYPES))
        .groupby("user_id")["s"].sum()
    )
    cum = []
    acc, c = 0, 1
    for j in range(em.BH_N_TRIALS + 1):
        acc += c
        cum.append(acc)
        c = c * (em.BH_N_TRIALS - j) // (j + 1)
    hyp = sorted((cum[int(v)], int(u)) for u, v in x.items())
    m = len(hyp)
    kstar = 0
    for k, (p, _) in enumerate(hyp, 1):
        if em.BH_ALPHA_DEN * m * p <= k * em.BH_TWO_N * em.BH_ALPHA_NUM:
            kstar = k
    return hyp, m, kstar


def test_bh_fdr_stepup_replay_and_reachback(spark):
    out = em.q_bh_fdr(spark, SF01).toPandas()
    hyp, m, kstar = _bh_replay()
    assert len(out) == m
    # every user has >= BH_N_TRIALS events at sf0.01 (min is 49), so
    # the Bin(48, 1/2) null is sound for every hypothesis
    ev = pd.read_parquet(os.path.join(SF01, "events.parquet"))
    assert int(ev.groupby("user_id").size().min()) >= em.BH_N_TRIALS
    expected_rej = {u for k, (p, u) in enumerate(hyp, 1) if k <= kstar}
    got_rej = {int(r.user_id) for r in out.itertuples() if int(r.rejected)}
    assert got_rej == expected_rej
    assert 0 < len(got_rej) < m  # both verdict classes occur
    # rank/p agreement with the replay
    got = {
        int(r.user_id): (int(r.p_num), int(r.rnk))
        for r in out.itertuples()
    }
    for k, (p, u) in enumerate(hyp, 1):
        assert got[u] == (p, k)
    # step-up reach-back (the property a naive pointwise filter
    # lacks): some REJECTED hypothesis fails its own line
    reachback = [
        k for k, (p, _) in enumerate(hyp, 1)
        if k <= kstar
        and em.BH_ALPHA_DEN * m * p > k * em.BH_TWO_N * em.BH_ALPHA_NUM
    ]
    assert reachback, "fixture must exercise the step-up reach-back"
    # monotone frontier: max rejected p <= min accepted p
    rej_p = [p for k, (p, _) in enumerate(hyp, 1) if k <= kstar]
    acc_p = [p for k, (p, _) in enumerate(hyp, 1) if k > kstar]
    assert max(rej_p) <= min(acc_p)
