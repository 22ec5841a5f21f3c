"""Session-12 batch-7 laws: golden-record entity structure +
survivorship replay, k-anonymity ladder monotonicity + replay,
seasonal-anomaly integer flag replay + both-directions non-vacuity."""
import math
import os

import pandas as pd

import __spark_entry__ as em

SF01 = "/root/testdata/sf0.01"


# -------------------------------------------------- golden record


def test_golden_record_structure_and_survivorship(spark):
    out = em.q_golden_record(spark, SF01).toPandas()
    assert len(out) > 0
    sizes = set(out["n_members"])
    # clone pairs give size-2 entities; the two variant systems give
    # size->=3 entities — the transitive-closure step is non-vacuous
    assert 2 in sizes and 3 in sizes
    # entity id is the component min, and the survivor is a member:
    # survivor_id maps back to the same source row as its entity
    assert (out["entity_id"] <= out["survivor_id"]).all()
    docs = pd.read_parquet(os.path.join(SF01, "documents.parquet"))
    # every survivor resolves to a real source row (entities may span
    # TWO source docs when the FS matcher links them cross-doc, so
    # survivor's source need not equal the entity min)
    ids = set(docs["doc_id"])
    assert all(int(s) % em.GR_CLONE_OFF in ids for s in out["survivor_id"])
    # survivorship replay on one PURE variant entity (entity min is a
    # variant source and all three members derive from it): members
    # are {Y, Y+20M, Y+30M}; survivor has the max text length
    tri_all = out[
        (out["n_members"] == 3) & (out["entity_id"] % em.ED_VARIANT_MOD == 9)
    ]
    assert len(tri_all) > 0
    tri = tri_all.iloc[0]
    y = int(tri["entity_id"])
    src = docs.loc[docs["doc_id"] == y, "text"].iloc[0]
    toks = src.split(" ")
    var_a = " ".join(toks[:4] + ["EDITED"] + toks[5:])
    var_b = " ".join(toks[:4] + ["AMENDED"] + toks[5:])
    lens = {y: len(src), y + em.GR_VAR_A_OFF: len(var_a),
            y + em.GR_VAR_B_OFF: len(var_b)}
    best_len = max(lens.values())
    best_id = min(i for i, l in lens.items() if l == best_len)
    assert int(tri["survivor_id"]) == best_id
    assert int(tri["survivor_len"]) == best_len
    # modes equal the source row's fields (members inherit them)
    row = docs.loc[docs["doc_id"] == y].iloc[0]
    assert tri["lang_mode"] == row["lang"]
    assert tri["source_mode"] == row["source"]


# --------------------------------------------------- k-anonymity


def test_k_anonymity_ladder(spark):
    out = em.q_k_anonymity(spark, SF01).toPandas()
    cust = pd.read_parquet(os.path.join(SF01, "customer.parquet"))
    assert out["n"].sum() == len(cust)
    # replay level-0 classes
    cust = cust.assign(
        bal_b=(cust["c_acctbal"] / em.KANON_B0).apply(math.floor)
    )
    want = (
        cust.groupby(["c_nationkey", "c_mktsegment", "bal_b"])
        .size()
        .to_dict()
    )
    got = {
        (int(r["nation"]), r["segment"], int(r["bal_b"])): int(r["n"])
        for _, r in out.iterrows()
    }
    assert got == want
    # ladder laws: generalized classes are supersets, monotone sizes
    assert (out["n1"] >= out["n"]).all()
    assert (out["n2"] >= out["n1"]).all()
    assert (out["violates"] == (out["n"] < em.KANON_K).astype(int)).all()
    # the audit is non-vacuous in both directions: violations exist,
    # and the level-2 generalization rescues classes level-1 doesn't
    assert out["violates"].any()
    assert ((out["gen1_ok"] == 0) & (out["gen2_ok"] == 1)).any()
    # level-1 re-aggregation consistency: n1 equals the sum of n over
    # the level-1 class
    g1 = out.assign(
        bal_b1=(out["bal_b"] / (em.KANON_B1 // em.KANON_B0)).apply(math.floor)
    )
    chk = g1.groupby(["nation", "segment", "bal_b1"])["n"].sum()
    for _, r in g1.drop_duplicates(["nation", "segment", "bal_b1"]).iterrows():
        assert int(r["n1"]) == int(
            chk[(r["nation"], r["segment"], r["bal_b1"])]
        )


# ---------------------------------------------- seasonal anomaly


def test_seasonal_anomaly_replay(spark):
    out = em.q_seasonal_anomaly(spark, SF01).toPandas()
    assert len(out) > 0
    # both directions occur on the fixture
    assert out["flag_hi"].any() and out["flag_lo"].any()
    assert ((out["flag_hi"] == 1) ^ (out["flag_lo"] == 1)).all()
    # integer cross-multiplication law on every flagged row
    for _, r in out.iterrows():
        if r["flag_hi"]:
            assert r["c"] * r["m"] > em.SEAS_MULT * r["s"]
        else:
            assert em.SEAS_MULT * r["c"] * r["m"] < r["s"]
    # full replay from parquet
    ev = pd.read_parquet(os.path.join(SF01, "events.parquet"))
    ev = ev.assign(d=ev["ts"].dt.date, h=ev["ts"].dt.hour)
    cells = (
        ev.groupby(["event_type", "d", "h"]).size().rename("c").reset_index()
    )
    epoch = pd.Timestamp("1970-01-01").date()
    cells["dw"] = cells["d"].apply(lambda x: (x - epoch).days % 7)
    base = (
        cells.groupby(["event_type", "dw", "h"])["c"]
        .agg(m="count", s="sum")
        .reset_index()
    )
    j = cells.merge(base, on=["event_type", "dw", "h"])
    hi = j["c"] * j["m"] > em.SEAS_MULT * j["s"]
    lo = em.SEAS_MULT * j["c"] * j["m"] < j["s"]
    want = {
        (r["event_type"], str(r["d"]), int(r["h"]))
        for _, r in j[hi | lo].iterrows()
    }
    got = {
        (r["event_type"], r["d"], int(r["h"])) for _, r in out.iterrows()
    }
    assert got == want
