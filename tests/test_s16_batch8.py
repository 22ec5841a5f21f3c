"""Session-16 batch-8 laws: the LSH recall audit replayed
end-to-end in pure Python (shingle hashing, permutations, band
collisions, exact-line ground truth) with the monotone-curve law,
and the trimmed mean replayed with the zero-tolerance breakdown
contrast (spike magnitude moves the mean ~10x and the trimmed mean
not at all)."""
import hashlib
import os

import pandas as pd

import __spark_entry__ as em

SF01 = "/root/testdata/sf0.01"


def _hs(text: str) -> set[int]:
    toks = text.split(" ")
    n = max(len(toks) - 2, 1)
    out = set()
    for i in range(n):
        s = " ".join(toks[i:i + 3])
        h = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
        out.add(h % em.MINHASH_P)
    return out


def test_lsh_recall_audit_full_replay(spark):
    out = em.q_lsh_recall_audit(spark, SF01).toPandas().set_index("nb")
    docs = pd.read_parquet(os.path.join(SF01, "documents.parquet"))
    hs = {int(r.doc_id): _hs(str(r.text)) for r in docs.itertuples()}
    ids = sorted(hs)
    truth = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(hs[a] & hs[b])
            if inter >= 1 and 3 * inter >= len(hs[a]) + len(hs[b]):
                truth.add((a, b))
    # band signatures with the production constants
    sig = {}
    for d in ids:
        rows = []
        for band in range(4):
            m0 = min(
                (h * em.MINHASH_A[2 * band] + em.MINHASH_C[2 * band])
                % em.MINHASH_P
                for h in hs[d]
            )
            m1 = min(
                (h * em.MINHASH_A[2 * band + 1]
                 + em.MINHASH_C[2 * band + 1]) % em.MINHASH_P
                for h in hs[d]
            )
            rows.append((band, m0, m1))
        sig[d] = rows
    buckets: dict[tuple, list[int]] = {}
    for d in ids:
        for key in sig[d]:
            buckets.setdefault(key, []).append(d)
    min_band: dict[tuple[int, int], int] = {}
    for (band, _m0, _m1), members in buckets.items():
        for i, a in enumerate(members):
            for b in members[i + 1:]:
                p = (min(a, b), max(a, b))
                min_band[p] = min(min_band.get(p, 99), band)
    for nb in range(1, 5):
        cand = {p for p, mb in min_band.items() if mb < nb}
        row = out.loc[nb]
        assert int(row["n_cand"]) == len(cand)
        assert int(row["n_truth"]) == len(truth)
        assert int(row["tp"]) == len(cand & truth)
    # monotone-curve laws + sanity
    rec = [out.loc[nb, "recall"] for nb in range(1, 5)]
    ncs = [int(out.loc[nb, "n_cand"]) for nb in range(1, 5)]
    assert rec == sorted(rec) and ncs == sorted(ncs)
    assert all(
        int(out.loc[nb, "tp"])
        <= min(int(out.loc[nb, "n_cand"]), int(out.loc[nb, "n_truth"]))
        for nb in range(1, 5)
    )
    # the audit is non-vacuous: truth exists, and 1 band misses some
    assert len(truth) > 10 and out.loc[1, "recall"] < 1.0
    assert out.loc[4, "recall"] == 1.0  # 4 bands recover everything here


def test_trimmed_mean_replay_and_breakdown(spark):
    out = em.q_trimmed_mean(spark, SF01).toPandas().set_index("etype")
    ev = pd.read_parquet(os.path.join(SF01, "events.parquet"))
    series = {
        t: sorted((g * 100).round().astype("int64"))
        for t, g in ev.groupby("event_type")["value"]
    }
    base = [1000 + 7 * k for k in range(1, em.TRIM_OVL_BASE + 1)]
    lows = [0] * em.TRIM_OVL_SPIKES
    series["spike_a"] = sorted(
        base + lows + [100_000_000] * em.TRIM_OVL_SPIKES
    )
    series["spike_b"] = sorted(
        base + lows + [1_000_000_000] * em.TRIM_OVL_SPIKES
    )
    for t, cs in series.items():
        n = len(cs)
        k = n // em.TRIM_PCT_DEN
        kept = cs[k:n - k]
        row = out.loc[t]
        assert int(row["n"]) == n and int(row["k_trim"]) == k
        assert int(row["sum_all"]) == sum(cs)
        assert int(row["sum_kept"]) == sum(kept)
        assert int(row["n_kept"]) == len(kept)
    # zero-tolerance breakdown contrast: identical trimmed sums,
    # wildly different raw sums
    assert (
        int(out.loc["spike_a", "sum_kept"])
        == int(out.loc["spike_b", "sum_kept"])
    )
    assert int(out.loc["spike_a", "n_kept"]) == int(
        out.loc["spike_b", "n_kept"]
    )
    assert (
        out.loc["spike_b", "mean_cents"]
        > 5 * out.loc["spike_a", "mean_cents"]
    )
    # trimmed mean lies inside the kept range for every group
    for t, cs in series.items():
        n = len(cs)
        k = n // em.TRIM_PCT_DEN
        tm = out.loc[t, "trimmed_mean_cents"]
        assert cs[k] <= tm <= cs[n - k - 1]
