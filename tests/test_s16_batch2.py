"""Session-16 batch-2 laws: Adamic-Adar pinned by the anti-join
self-consistency check (no reported candidate is an existing edge)
plus quantizer monotonicity, DBSCAN pinned by the planted-geometry
contract (every blob point core with the blob-min cluster id, every
satellite border into its blob, role thresholds readable off the
output), and motif discovery replayed by brute-force integer SAD
for every user with the planted zero-SAD motif found at (3, 20)."""
import math
import os

import pandas as pd

import __spark_entry__ as em

SF01 = "/root/testdata/sf0.01"


def test_adamic_adar_laws(spark):
    out = em.q_adamic_adar(spark, SF01).toPandas()
    # non-vacuous: the crawl links produce real 2-hop-but-not-linked
    # candidates past the clique edges
    assert len(out) > 100
    assert (out["cn"] >= em.AA_MIN_CN).all()
    assert (out["aa_num"] > 0).all() and (out["u"] < out["v"]).all()
    # anti-join self-consistency: recompute the SAME canonical edge
    # set (crawl + cliques) and assert zero overlap with candidates
    from pyspark.sql import functions as F
    from ocular_spark.functions import html as H

    d = spark.read.parquet(os.path.join(SF01, "documents.parquet"))
    wrapped = d.select("doc_id", F.expr(H.wrap_links_spark()).alias("html"))
    crawl = wrapped.select(
        F.col("doc_id").alias("src"),
        F.explode(F.expr(H.doc_links_expr("html"))).alias("dd"),
    ).select("src", F.col("dd").cast("long").alias("dst"))
    clique = d.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.expr("transform(sequence(0, 4), j -> (doc_id div 5) * 5 + j)")
        ).alias("dst"),
    )
    und = {
        (min(r.src, r.dst), max(r.src, r.dst))
        for r in crawl.unionByName(clique).collect()
        if r.src != r.dst
    }
    cand = set(zip(out["u"].astype(int), out["v"].astype(int)))
    assert cand and not (cand & und)
    # quantized 1/ln(deg) weight is strictly decreasing in degree:
    # hub neighbors are downweighted (pure quantizer law)
    q = lambda deg: math.floor(em.AA_SCALE / math.log(float(deg)))  # noqa
    ws = [q(d_) for d_ in range(2, 50)]
    assert all(a > b for a, b in zip(ws, ws[1:]))
    # aa column is the one-division assembly
    for r in out.head(50).itertuples():
        assert abs(r.aa - r.aa_num / em.AA_SCALE) < 1e-12


def test_dbscan_planted_geometry(spark):
    out = em.q_dbscan_cluster(spark, SF01).toPandas()
    by_pid = out.set_index("pid")
    # every planted blob point is core and carries the blob-min label
    for b in range(3):
        pids = [-(b * 20 + k + 1) for k in range(20)]
        want = min(pids)  # -(b*20+20)
        for p in pids:
            assert by_pid.loc[p, "role"] == "core"
            assert int(by_pid.loc[p, "cluster"]) == want
            assert int(by_pid.loc[p, "n_eps"]) >= 20
        # the satellite is border into the SAME cluster
        s = -1001 - b
        assert by_pid.loc[s, "role"] == "border"
        assert int(by_pid.loc[s, "cluster"]) == want
        assert int(by_pid.loc[s, "n_eps"]) < em.DBSCAN_MIN_PTS
    # role thresholds are readable off the output columns
    core = out[out["role"] == "core"]
    rest = out[out["role"] != "core"]
    assert (core["n_eps"] >= em.DBSCAN_MIN_PTS).all()
    assert (rest["n_eps"] < em.DBSCAN_MIN_PTS).all()
    noise = out[out["role"] == "noise"]
    assert (noise["cluster"] == -999999).all()
    assert (out[out["role"] != "noise"]["cluster"] != -999999).all()
    # the hash-scattered background is overwhelmingly noise
    assert len(noise) > 9000
    # exactly the three planted clusters among core labels
    assert set(core["cluster"].astype(int)) == {-20, -40, -60}


def _brute_motif(series: list[int], m: int):
    best = None
    npairs = 0
    last = len(series) - m + 1
    for i in range(1, last + 1):
        for j in range(i + m, last + 1):
            npairs += 1
            sad = sum(
                abs(series[i - 1 + t] - series[j - 1 + t]) for t in range(m)
            )
            key = (sad, i, j)
            if best is None or key < best:
                best = key
    return best, npairs


def test_motif_discovery_replay_and_plant(spark):
    out = em.q_motif_discovery(spark, SF01).toPandas()
    ev = pd.read_parquet(os.path.join(SF01, "events.parquet")).sort_values(
        ["user_id", "ts", "event_id"]
    )
    series = {
        int(u): [int(round(v * 100)) for v in g["value"]]
        for u, g in ev.groupby("user_id")
    }
    series[-1] = [
        em._motif_overlay_cents(i) for i in range(1, em.MOTIF_OVL_N + 1)
    ]
    got = {
        int(r.user_id): (int(r.sad), int(r.i), int(r.j), int(r.n_pairs))
        for r in out.itertuples()
    }
    for u, s in series.items():
        best, npairs = _brute_motif(s, em.MOTIF_M)
        if npairs == 0:
            assert u not in got
            continue
        assert got[u] == (best[0], best[1], best[2], npairs), u
    assert set(got) == {u for u, s in series.items()
                        if len(s) >= 2 * em.MOTIF_M}
    # the planted motif: exact zero SAD at (3, 20), uniquely
    assert got[-1][:3] == (0, 3, 20)
    # non-overlap law holds everywhere
    assert all(j - i >= em.MOTIF_M for _, i, j, _ in got.values())
