"""Session-16 batch-7 laws: prominence replayed from a pure-Python
scipy-spec implementation with the planted mountain's hand-computed
prominences pinned exactly, the KS statistic replayed from sorted
integer offsets with both overlay verdicts pinned, and Hamilton
apportionment replayed with the sum and quota-guarantee laws."""
import os

import pandas as pd

import __spark_entry__ as em

SF01 = "/root/testdata/sf0.01"


def _hourly_series():
    ev = pd.read_parquet(os.path.join(SF01, "events.parquet"))
    anchor = ev["ts"].min().replace(minute=0, second=0, microsecond=0)
    h = ((ev["ts"] - anchor).dt.total_seconds() // 3600).astype(int)
    counts = ev.assign(h=h).groupby(["event_type", "h"]).size().to_dict()
    hmax = max(k[1] for k in counts)
    out = {
        t: [counts.get((t, hh), 0) for hh in range(hmax + 1)]
        for t in ev["event_type"].unique()
    }
    out["mountain"] = list(em._PEAK_MOUNTAIN)
    return out


def _py_prominences(cs: list[int]):
    """scipy.signal.find_peaks contract: strict local maxima;
    prominence vs valley minima toward the nearest higher point
    (series edge if none)."""
    res = {}
    n = len(cs)
    for i in range(1, n - 1):
        if not (cs[i] > cs[i - 1] and cs[i] > cs[i + 1]):
            continue
        jl = max((j for j in range(i) if cs[j] > cs[i]), default=-1)
        jr = min((j for j in range(i + 1, n) if cs[j] > cs[i]), default=n)
        minl = min(cs[jl + 1:i])
        minr = min(cs[i + 1:jr])
        res[i] = cs[i] - max(minl, minr)
    return res


def test_peak_detection_replay_and_mountain(spark):
    out = em.q_peak_detection(spark, SF01).toPandas()
    got = {
        (r.etype, int(r.h)): (int(r.c), int(r.prom))
        for r in out.itertuples()
    }
    expected = {}
    for t, cs in _hourly_series().items():
        for i, prom in _py_prominences(cs).items():
            if prom >= em.PEAK_MIN_PROM:
                expected[(t, i)] = (cs[i], prom)
    assert got == expected
    # the planted mountain's prominences, hand-computed: the global
    # max's bases reach the edges (prom = height), interior peaks
    # are bounded by their enclosing higher summits
    mt = {h: v for (t, h), v in got.items() if t == "mountain"}
    assert mt == {1: (5, 5), 3: (9, 9), 5: (6, 5), 9: (7, 4), 11: (8, 8)}
    # prominence never exceeds height, and is at least the threshold
    assert all(0 < p <= c for c, p in got.values())


def test_ks_uniformity_replay_and_overlays(spark):
    out = em.q_ks_uniformity(spark, SF01).toPandas()
    ev = pd.read_parquet(os.path.join(SF01, "events.parquet"))
    anchor = ev["ts"].min().replace(minute=0, second=0, microsecond=0)
    t = ((ev["ts"] - anchor).dt.total_seconds() // 60).astype("int64")
    series = {
        int(u): sorted(g) for u, g in t.groupby(ev["user_id"])
    }
    tt = int(t.max()) + 1
    series[-1] = list(range(1, em.KS_OVL_N + 1))
    series[-2] = [(i * 2 - 1) * (tt // 96) for i in range(1, 49)]
    expected = {}
    for u, ts in series.items():
        n = len(ts)
        d_int = max(
            max(i * tt - n * ti, n * ti - (i - 1) * tt)
            for i, ti in enumerate(sorted(ts), 1)
        )
        rej = 10000 * d_int * d_int >= 18496 * n * tt * tt
        expected[u] = (n, tt, d_int, "reject" if rej else "uniform")
    got = {
        int(r.user_id): (int(r.n), int(r.t_span), int(r.d_int), r.verdict)
        for r in out.itertuples()
    }
    assert got == expected
    # overlays pin both verdicts; D is a genuine sup bounded by 1
    assert got[-1][3] == "reject" and got[-2][3] == "uniform"
    assert ((out["d"] > 0) & (out["d"] <= 1)).all()
    # bunched events: D is close to 1 (everything in the first hour)
    assert out.set_index("user_id").loc[-1, "d"] > 0.9


def test_seat_apportionment_laws(spark):
    out = em.q_seat_apportionment(spark, SF01).toPandas()
    docs = pd.read_parquet(os.path.join(SF01, "documents.parquet"))
    counts = docs.groupby("source").size().to_dict()
    nn = sum(counts.values())
    k = em.APPORTION_K
    floor_q = {s: (k * n) // nn for s, n in counts.items()}
    rem = {s: (k * n) % nn for s, n in counts.items()}
    extra = k - sum(floor_q.values())
    winners = set(
        sorted(counts, key=lambda s: (-rem[s], s))[:extra]
    )
    expected = {
        s: (counts[s], floor_q[s], rem[s],
            floor_q[s] + (1 if s in winners else 0))
        for s in counts
    }
    got = {
        r.source: (int(r.n_docs), int(r.floor_q), int(r.rem_num),
                   int(r.seats))
        for r in out.itertuples()
    }
    assert got == expected
    # the fixed budget is spent exactly
    assert sum(v[3] for v in got.values()) == k
    # quota guarantee: floor(q) <= seats <= ceil(q)
    for s, (n, fq, rm, seats) in got.items():
        assert fq <= seats <= fq + (1 if rm > 0 else 0)
    # the top-up is non-vacuous (some source rounds up)
    assert any(v[3] == v[1] + 1 for v in got.values())
