"""Session-16 batch-20 laws: chi-square independence replayed
cell-by-cell with the planted dependent segment dominating the
statistic (and the organic-only table failing to reject), and
Dorfman pooling replayed with identical float discipline plus the
two planted regimes (rare prevalence earns a big pool, coin-flip
prevalence keeps the no-pooling baseline) and the analytic
sqrt-rule sanity check."""
import math
import os

import pandas as pd

import __spark_entry__ as em

SF01 = "/root/testdata/sf0.01"


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_chisq_replay_and_planted_dependence(spark):
    out = em.q_chisq_independence(spark, SF01).toPandas()
    ev = pd.read_parquet(os.path.join(SF01, "events.parquet"))
    cells = (
        ev.groupby(["event_type", ev["user_id"] % 2]).size().to_dict()
    )
    cells[("planted", 0)], cells[("planted", 1)] = em.CHISQ_PLANT
    r = {}
    c = {}
    for (t, a), o in cells.items():
        r[t] = r.get(t, 0) + o
        c[a] = c.get(a, 0) + o
    n = sum(cells.values())
    contrib = {
        (t, a): _tdiv(
            (o * n - r[t] * c[a]) ** 2 * em.CHISQ_SCALE,
            n * r[t] * c[a],
        )
        for (t, a), o in cells.items()
    }
    chi2 = sum(contrib.values())
    got = {
        (x.etype, int(x.arm)): (int(x.o), int(x.contrib_q))
        for x in out.itertuples()
    }
    assert got == {
        k: (cells[k], contrib[k]) for k in cells
    }
    assert set(out["chi2_q"].astype(int)) == {chi2}
    verdict = "dependent" if chi2 >= em.CHISQ_CRIT_Q else "independent"
    assert set(out["verdict"]) == {verdict} == {"dependent"}
    # the planted cells dominate the statistic...
    planted_part = contrib[("planted", 0)] + contrib[("planted", 1)]
    assert planted_part > chi2 // 2
    # ...and the organic-only statistic is far smaller (note: it can
    # itself exceed the multinomial critical value because EVENTS
    # cluster within users — the classic overdispersion caveat of
    # count-level chi-square under user-level randomization; the
    # planted signal is an order of magnitude beyond it)
    org = {k: v for k, v in cells.items() if k[0] != "planted"}
    ro = {}
    co = {}
    for (t, a), o in org.items():
        ro[t] = ro.get(t, 0) + o
        co[a] = co.get(a, 0) + o
    no = sum(org.values())
    chi2_org = sum(
        _tdiv((o * no - ro[t] * co[a]) ** 2 * em.CHISQ_SCALE,
              no * ro[t] * co[a])
        for (t, a), o in org.items()
    )
    assert chi2_org < planted_part // 5


def test_dorfman_replay_and_regimes(spark):
    out = em.q_dorfman_pooling(spark, SF01).toPandas().set_index("etype")
    ev = pd.read_parquet(os.path.join(SF01, "events.parquet"))
    per = ev.groupby(["event_type", "user_id"]).size()
    segs = {
        t: (len(g), int((g >= em.CONV_K).sum()))
        for t, g in per.groupby(level=0)
    }
    for t, n, x in em.DORF_PLANTS:
        segs[t] = (n, x)
    for t, (n, x) in segs.items():
        q = float(n - x) / float(n)
        best = (em.DORF_SCALE, 0)
        for k in range(2, em.DORF_KMAX + 1):
            p = 1.0
            for _ in range(k):
                p = p * q
            tq = math.floor((1.0 / k + 1.0 - p) * em.DORF_SCALE)
            if (tq, k) < best:
                best = (tq, k)
        row = out.loc[t]
        assert (int(row["n"]), int(row["x"])) == (n, x)
        assert int(row["best_k"]) == best[1] and int(row["t_q"]) == best[0]
    # regimes: rare prevalence pools big and saves ~78%; coin-flip
    # prevalence keeps the baseline (pooling can never win there)
    assert int(out.loc["rare", "best_k"]) >= 8
    assert out.loc["rare", "tests_per_person"] < 0.25
    assert int(out.loc["common", "best_k"]) == 0
    # sqrt-rule sanity: optimal k is near 1/sqrt(p) for small p
    p = 2.0 / 150.0
    assert abs(int(out.loc["rare", "best_k"]) - round(1 / math.sqrt(p))) <= 1
