"""Session-16 batch-10 laws: RFM replayed bucket-for-bucket with
the NTILE fill rule and balanced-quintile law, and geohash replayed
bit-for-bit in pure Python with the prefix-locality bound (equal
4-char prefixes confine |dx| to the 10-bit lane cell) and the
truncation-coarsening law."""
import os

import pandas as pd

import __spark_entry__ as em

SF01 = "/root/testdata/sf0.01"


def _ntile(keys: list, nt: int = 5) -> dict:
    """keys pre-sorted; SQL NTILE fill: first n%nt buckets get the
    extra row."""
    n = len(keys)
    base, extra = divmod(n, nt)
    out, i = {}, 0
    for b in range(1, nt + 1):
        size = base + (1 if b <= extra else 0)
        for k in keys[i:i + size]:
            out[k] = b
        i += size
    return out


def test_rfm_replay_and_balance(spark):
    out = em.q_rfm_segments(spark, SF01).toPandas()
    ev = pd.read_parquet(os.path.join(SF01, "events.parquet"))
    anchor = ev["ts"].min().replace(minute=0, second=0, microsecond=0)
    day = ((ev["ts"] - anchor).dt.total_seconds() // 86400).astype(int)
    c = (ev["value"] * 100).round().astype("int64")
    df = pd.DataFrame({"u": ev["user_id"], "d": day, "c": c})
    pu = df.groupby("u").agg(
        last_day=("d", "max"), freq=("d", "size"), mon=("c", "sum")
    )
    md = int(pu["last_day"].max())
    pu["rec"] = md - pu["last_day"]
    r = _ntile(sorted(pu.index, key=lambda u: (-pu.loc[u, "rec"], u)))
    f = _ntile(sorted(pu.index, key=lambda u: (pu.loc[u, "freq"], u)))
    m = _ntile(sorted(pu.index, key=lambda u: (pu.loc[u, "mon"], u)))

    def seg(rr, ff, mm):
        if rr >= 4 and ff >= 4 and mm >= 4:
            return "champion"
        if ff >= 4:
            return "loyal"
        if mm >= 4:
            return "big_spender"
        if rr <= 2 and ff >= 3:
            return "at_risk"
        if rr <= 2:
            return "hibernating"
        return "regular"

    got = {
        int(x.user_id): (
            int(x.recency_d), int(x.freq), int(x.monetary_c),
            int(x.r), int(x.f), int(x.m), x.segment,
        )
        for x in out.itertuples()
    }
    expected = {
        int(u): (
            int(pu.loc[u, "rec"]), int(pu.loc[u, "freq"]),
            int(pu.loc[u, "mon"]), r[u], f[u], m[u],
            seg(r[u], f[u], m[u]),
        )
        for u in pu.index
    }
    assert got == expected
    # balanced quintiles: sizes within one, and multiple segments hit
    for col in ("r", "f", "m"):
        sizes = out[col].value_counts()
        assert set(sizes.index) == {1, 2, 3, 4, 5}
        assert sizes.max() - sizes.min() <= 1
    assert len(set(out["segment"])) >= 4


def _py_geohash(x: int, y: int) -> str:
    gx = (x << em.GEOHASH_BITS) // em.SPATIAL_PX
    gy = (y << em.GEOHASH_BITS) // em.SPATIAL_PY
    z = 0
    for i in range(em.GEOHASH_BITS):
        z |= ((gx >> i) & 1) << (2 * i + 1)
        z |= ((gy >> i) & 1) << (2 * i)
    return "".join(
        em.GEOHASH_ALPHA[(z >> (25 - 5 * k)) & 31] for k in range(6)
    )


def test_geohash_replay_and_locality(spark):
    out = em.q_geohash_encode(spark, SF01).toPandas()
    got = {
        int(r.pid): (int(r.x), int(r.y), r.gh6, r.gh4, int(r.cell_n))
        for r in out.itertuples()
    }
    cells: dict[str, int] = {}
    hashes = {}
    for pid, (x, y, *_rest) in got.items():
        gh = _py_geohash(x, y)
        hashes[pid] = gh
        cells[gh[:4]] = cells.get(gh[:4], 0) + 1
    for pid, (x, y, gh6, gh4, cn) in got.items():
        assert gh6 == hashes[pid]
        assert gh4 == gh6[:4]  # truncation IS coarsening
        assert cn == cells[gh4]
    # prefix-locality: a 4-char prefix pins 20 bits (10 per lane),
    # so same-gh4 points differ by < 2^(15-10) lane units ~ 98 px
    bound_x = 32 * em.SPATIAL_PX // (1 << em.GEOHASH_BITS) + 2
    bound_y = 32 * em.SPATIAL_PY // (1 << em.GEOHASH_BITS) + 2
    by4: dict[str, list] = {}
    for pid, (x, y, _g6, g4, _cn) in got.items():
        by4.setdefault(g4, []).append((x, y))
    multi = 0
    for pts in by4.values():
        if len(pts) < 2:
            continue
        multi += 1
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        assert max(xs) - min(xs) < bound_x
        assert max(ys) - min(ys) < bound_y
    # non-vacuity: ~10k²/2 / 2^20 ≈ 48 birthday collisions expected
    assert multi > 30
