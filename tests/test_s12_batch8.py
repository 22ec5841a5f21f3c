"""Session-12 batch-8 laws: macro/micro F1 algebra + replay, vacuum
time-travel safety (every retained snapshot stays resolvable), k-core
peel-trace replay against an independent Python peel."""
import os
from collections import defaultdict

import pandas as pd

import __spark_entry__ as em

SF01 = "/root/testdata/sf0.01"


# ------------------------------------------------------- macro F1


def test_macro_f1_algebra(spark):
    out = em.q_macro_f1(spark, SF01).toPandas().set_index("label")
    cm = em.q_lang_id_ngram(spark, SF01).toPandas()
    classes = sorted(set(cm["lang"]) | set(cm["pred_lang"]))
    f1qs = []
    for c in classes:
        tp = int(cm[(cm["lang"] == c) & (cm["pred_lang"] == c)]["n_docs"].sum())
        fp = int(cm[cm["pred_lang"] == c]["n_docs"].sum()) - tp
        fn = int(cm[cm["lang"] == c]["n_docs"].sum()) - tp
        r = out.loc[c]
        assert (int(r["tp"]), int(r["fp"]), int(r["fn"])) == (tp, fp, fn), c
        assert int(r["f1_num"]) == 2 * tp
        assert int(r["f1_den"]) == 2 * tp + fp + fn
        f1qs.append(int(r["f1_q"]))
        # the classifier is genuinely confused: 0 < F1 < 1 per class
        assert 0.0 < r["f1"] < 1.0, c
    mi, ma = out.loc["__micro__"], out.loc["__macro__"]
    total = int(cm["n_docs"].sum())
    tps = int(cm[cm["lang"] == cm["pred_lang"]]["n_docs"].sum())
    # micro-F1 == accuracy in single-label multiclass
    assert int(mi["tp"]) == tps and int(mi["f1_den"]) == 2 * total
    assert abs(mi["f1"] - tps / total) < 1e-9
    # macro = mean of the 1e-9-quantized per-class F1s, exactly
    assert int(ma["f1_num"]) == sum(f1qs)
    assert int(ma["f1_den"]) == len(classes) * em.F1_Q_SCALE
    assert abs(ma["f1"] - sum(f1qs) / (len(classes) * em.F1_Q_SCALE)) < 1e-9


# ---------------------------------------------------- vacuum plan


def test_vacuum_time_travel_safety(spark):
    out = em.q_vacuum_plan(spark, SF01).toPandas()
    ev = pd.read_parquet(os.path.join(SF01, "events.parquet"))
    files = (
        ev.assign(d=ev["ts"].dt.strftime("%Y-%m-%d"))
        .groupby(["user_id", "d"])
        .size()
    )
    assert len(out) == len(files)
    days = sorted({d for _, d in files.index})
    retained = days[-em.VACUUM_RETAIN_DAYS:]
    # non-vacuity: both classes occur
    assert (out["vacuum"] == 1).any() and (out["vacuum"] == 0).any()
    # time-travel safety: for every retained snapshot s, every user
    # whose first file precedes s still has EXACTLY ONE live
    # (non-vacuumed) file whose validity covers s
    live = out[out["vacuum"] == 0]
    for s in retained:
        for uid, grp in live.groupby("user_id"):
            first_day = out[out["user_id"] == uid]["d"].min()
            if first_day > s:
                continue
            covering = grp[
                (grp["d"] <= s)
                & (grp["next_d"].isna() | (grp["next_d"] > s))
            ]
            assert len(covering) == 1, (s, uid)
    # minimality: every vacuumed file is truly unreachable from any
    # retained snapshot
    vac = out[out["vacuum"] == 1]
    mn = retained[0]
    assert (vac["next_d"] <= mn).all()
    # size accounting survives the plan
    assert int(out["n_events"].sum()) == len(ev)


# -------------------------------------------------------- k-core


def test_kcore_trace_replay(spark):
    out = em.q_kcore_decompose(spark, SF01).toPandas()
    # independent Python peel over the same edge universe
    und = em._kcore_edges(spark, SF01).toPandas()
    adj = defaultdict(set)
    for _, r in und.iterrows():
        adj[int(r["a"])].add(int(r["b"]))
        adj[int(r["b"])].add(int(r["a"]))
    trace = {}
    rnd = 0
    while True:
        drop = [v for v, ns in adj.items() if len(ns) < em.KCORE_K]
        if not drop:
            break
        rnd += 1
        for v in drop:
            trace[v] = (rnd, len(adj[v]))
        for v in drop:
            for u in list(adj[v]):
                adj[u].discard(v)
            del adj[v]
    for v, ns in adj.items():
        trace[v] = (0, len(ns))
    got = {
        int(r["node"]): (int(r["peel_round"]), int(r["deg"]))
        for _, r in out.iterrows()
    }
    assert got == trace
    # structure: survivors exist (the clique overlay) and the cascade
    # is deep (>= 4 peel rounds — a single-pass filter cannot fake it)
    assert (out["peel_round"] == 0).sum() >= em.KCORE_CLIQUE
    assert out["peel_round"].max() >= 4
    # core members' in-core degree is >= K by definition
    core = out[out["peel_round"] == 0]
    assert (core["deg"] >= em.KCORE_K).all()
    # the sf0.01 cascade must fix within the oracle's 8 unrolled
    # rounds — if this grows past 8, bump the oracle unroll depth
    assert out["peel_round"].max() <= 8
