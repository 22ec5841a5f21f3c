"""Session-16 batch-27 laws: the Simpson detector replayed with the
engineered reversal firing (within-cluster slopes +1, pooled
negative) and the real metric classified deterministically, and
Chao1 replayed count-for-count with the S_obs lower-bound law."""
import os

import pandas as pd

import __spark_entry__ as em

SF01 = "/root/testdata/sf0.01"


def _ntile(keys, nt=5):
    n = len(keys)
    base, extra = divmod(n, nt)
    out, i = {}, 0
    for b in range(1, nt + 1):
        size = base + (1 if b <= extra else 0)
        for k in keys[i:i + size]:
            out[k] = b
        i += size
    return out


def test_simpson_detector_replay_and_planted_reversal(spark):
    out = em.q_simpson_detector(spark, SF01).toPandas().set_index(
        "metric"
    )
    ev = pd.read_parquet(os.path.join(SF01, "events.parquet"))
    anchor = ev["ts"].min().replace(minute=0, second=0, microsecond=0)
    h = ((ev["ts"] - anchor).dt.total_seconds() // 3600).astype(int)
    pre = (h < em.DID_SPLIT_H).astype(int)
    c = (ev["value"] * 100).round().astype("int64")
    df = pd.DataFrame({"u": ev["user_id"], "pre": pre, "c": c})
    xs, ys = {}, {}
    for u, g in df.groupby("u"):
        xs[int(u)] = int(g["pre"].sum())
        ys[int(u)] = int(g.loc[g["pre"] == 0, "c"].sum())
    bins = _ntile(sorted(xs, key=lambda u: (xs[u], u)))
    metrics = {
        "value": [
            (bins[u], xs[u], ys[u]) for u in xs
        ],
        "planted": [(1, g, g + 40) for g in range(1, 12)]
        + [(2, g + 40, g) for g in range(1, 12)],
    }

    def cov(rows):
        n = len(rows)
        sx = sum(x for x, _ in rows)
        sy = sum(y for _, y in rows)
        sxy = sum(x * y for x, y in rows)
        return n * sxy - sx * sy

    for metric, rows in metrics.items():
        segs = {}
        for s, x, y in rows:
            segs.setdefault(s, []).append((x, y))
        signs = [
            (cov(v) > 0) - (cov(v) < 0) for v in segs.values()
        ]
        pooled = cov([(x, y) for _, x, y in rows])
        npos = sum(1 for s in signs if s > 0)
        nneg = sum(1 for s in signs if s < 0)
        row = out.loc[metric]
        assert int(row["n_segments"]) == len(segs)
        assert int(row["n_pos"]) == npos
        assert int(row["n_neg"]) == nneg
        assert int(row["pooled_cov_num"]) == pooled
        want = (
            "reversal"
            if (npos == len(segs) and pooled < 0)
            or (nneg == len(segs) and pooled > 0)
            else "consistent"
            if npos == len(segs) or nneg == len(segs)
            else "mixed"
        )
        assert row["verdict"] == want
    # the engineered paradox fires: both clusters trend +, pooled -
    assert out.loc["planted", "verdict"] == "reversal"
    assert int(out.loc["planted", "n_pos"]) == 2
    assert int(out.loc["planted", "pooled_sign"]) == -1


def test_chao1_replay_and_lower_bound(spark):
    out = em.q_chao1_richness(spark, SF01).toPandas().set_index("source")
    docs = pd.read_parquet(os.path.join(SF01, "documents.parquet"))
    for src, g in docs.groupby("source"):
        tf = {}
        for text in g["text"]:
            for tok in str(text).split(" "):
                if tok:
                    tf[tok] = tf.get(tok, 0) + 1
        s_obs = len(tf)
        f1 = sum(1 for v in tf.values() if v == 1)
        f2 = sum(1 for v in tf.values() if v == 2)
        if f2 > 0:
            num, den = 2 * f2 * s_obs + f1 * f1, 2 * f2
        else:
            num, den = 2 * s_obs + f1 * (f1 - 1), 2
        row = out.loc[src]
        assert (int(row["s_obs"]), int(row["f1"]), int(row["f2"])) == (
            s_obs, f1, f2,
        )
        assert int(row["chao1_num"]) == num
        assert int(row["chao1_den"]) == den
        # lower bound: the estimator never falls below the observed
        # richness, with equality iff no singletons
        assert row["chao1"] >= s_obs
        if f1 == 0:
            assert row["chao1"] == s_obs
    # the fixture's tiny vocabulary is mostly saturated: most
    # sources see every token >2 times, so chao1 ~ s_obs
    assert (out["chao1"] - out["s_obs"] < 5).all()
