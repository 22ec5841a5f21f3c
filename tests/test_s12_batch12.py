"""Session-12 batch-12 laws: schema-inference widening rules on the
synthesized conflicts, LPM specificity (overrides beat their /8) +
accounting, SLO burn algebra + two-window AND semantics."""
import hashlib
import os

import pandas as pd

import __spark_entry__ as em

SF01 = "/root/testdata/sf0.01"


def test_json_schema_infer_widening(spark):
    out = em.q_json_schema_infer(spark, SF01).toPandas().set_index("key")
    ev = pd.read_parquet(os.path.join(SF01, "events.parquet"))
    n = len(ev)
    eid = ev["event_id"]
    # k: long normally, string on %7 rows (conflict -> string),
    # missing on %11 rows (nullable)
    k = out.loc["k"]
    assert k["inferred"] == "string" and k["nullable"] == 1
    assert int(k["n_present"]) == int((eid % 11 != 0).sum())
    assert int(k["n_string"]) == int(((eid % 11 != 0) & (eid % 7 == 0)).sum())
    assert int(k["n_long"]) == int(((eid % 11 != 0) & (eid % 7 != 0)).sum())
    # tag: pure string, sparse
    t = out.loc["tag"]
    assert t["inferred"] == "string"
    assert int(t["n_present"]) == int((eid % 3 == 0).sum())
    assert int(t["n_string"]) == int(t["n_present"])
    # score: pure double
    s = out.loc["score"]
    assert s["inferred"] == "double"
    assert int(s["n_double"]) == int((eid % 5 == 0).sum())
    assert int(s["n_string"]) == 0
    # flag: pure bool
    f = out.loc["flag"]
    assert f["inferred"] == "bool"
    assert int(f["n_bool"]) == int((eid % 2 == 0).sum())
    assert (out["n_total"] == n).all()
    assert (out["nullable"] == 1).all()  # every key is sometimes absent


def test_ip_lpm_specificity(spark):
    out = em.q_ip_lpm_join(spark, SF01).toPandas()
    ev = pd.read_parquet(os.path.join(SF01, "events.parquet"))
    nat = pd.read_parquet(os.path.join(SF01, "nation.parquet"))
    # replay: ip + LPM in pure Python
    def ip_of(u, e):
        h = int(hashlib.md5(f"{u}:{e}".encode()).hexdigest()[:6], 16)
        return (em.LPM_NET_BASE + u % 25) * (1 << 24) + h % (1 << 24)

    names = dict(zip(nat["n_nationkey"], nat["n_name"]))
    from collections import Counter, defaultdict

    n_events = Counter()
    users = defaultdict(set)
    for u, e in zip(ev["user_id"], ev["event_id"]):
        ip = ip_of(int(u), int(e))
        nk = int(u) % 25
        base = (em.LPM_NET_BASE + nk) * (1 << 24)
        if nk % 5 == 0 and (ip >> 16) == (base >> 16) + 7:
            key = (base + (7 << 16), 16, f"override:{names[nk]}")
        else:
            key = (base, 8, f"nation:{names[nk]}")
        n_events[key] += 1
        users[key].add(int(u))
    got = {
        (int(r["prefix"]), int(r["plen"]), r["owner"]):
            (int(r["n_events"]), int(r["n_users"]))
        for _, r in out.iterrows()
    }
    want = {k: (c, len(users[k])) for k, c in n_events.items()}
    assert got == want
    # every event is attributed exactly once
    assert int(out["n_events"].sum()) == len(ev)
    # the /16 override class genuinely occurs (specificity exercised)
    assert (out["plen"] == 16).any()


def test_slo_burn_algebra(spark):
    out = em.q_slo_burn(spark, SF01).toPandas()
    ev = pd.read_parquet(os.path.join(SF01, "events.parquet"))
    ev = ev.assign(d=ev["ts"].dt.strftime("%Y-%m-%d"),
                   e=(ev["value"] > em.SLO_THRESHOLD).astype(int))
    daily = ev.groupby(["event_type", "d"]).agg(
        n=("e", "size"), err=("e", "sum")
    ).reset_index().sort_values(["event_type", "d"])
    daily["n3"] = daily.groupby("event_type")["n"].transform(
        lambda s: s.rolling(3, min_periods=1).sum()
    )
    daily["e3"] = daily.groupby("event_type")["err"].transform(
        lambda s: s.rolling(3, min_periods=1).sum()
    )
    got = out.set_index(["event_type", "d"]).sort_index()
    for _, r in daily.iterrows():
        g = got.loc[(r["event_type"], r["d"])]
        assert (int(g["n"]), int(g["err"])) == (int(r["n"]), int(r["err"]))
        assert (int(g["n3"]), int(g["e3"])) == (int(r["n3"]), int(r["e3"]))
        want_alert = int(
            5 * r["err"] >= r["n"] and 20 * r["e3"] >= 3 * r["n3"]
        )
        assert int(g["alert"]) == want_alert
    # both alert classes occur, and the two-window AND genuinely
    # suppresses some single-window spikes
    assert (out["alert"] == 1).any() and (out["alert"] == 0).any()
    spiky = out[(5 * out["err"] >= out["n"]) & (out["alert"] == 0)]
    assert len(spiky) > 0, "the long window must veto some 1d spikes"
