"""Session-16 batch-3 laws: phonetic blocking replayed against an
INDEPENDENT pure-Python American Soundex (classic NARA vectors
pinned, plus the Thompson/Tomson recall-gap law proven non-vacuous),
RAKE replayed phrase-by-phrase from a pure-Python scorer with the
stopword-free-phrase invariant, and the CDX/SURT index replayed
string-for-string with the domain-contiguity ordering law."""
import hashlib
import os

import pandas as pd

import __spark_entry__ as em

SF01 = "/root/testdata/sf0.01"

_SDX_MAP = {}
for letters, d in [
    ("BFPV", "1"), ("CGJKQSXZ", "2"), ("DT", "3"),
    ("L", "4"), ("MN", "5"), ("R", "6"), ("AEIOUY", "0"),
]:
    for ch in letters:
        _SDX_MAP[ch] = d


def _py_soundex(name: str) -> str:
    """Independent reference implementation (not the SQL emitter)."""
    s = "".join(ch for ch in name.upper() if "A" <= ch <= "Z")
    first = s[0]
    digits = [_SDX_MAP[c] for c in s if c not in "HW"]
    runs = []
    for d in digits:
        if not runs or runs[-1] != d:
            runs.append(d)
    if first not in "HW":
        runs = runs[1:]
    body = "".join(d for d in runs if d != "0")
    return first + (body + "000")[:3]


def test_soundex_classic_vectors_and_cross_engine():
    # NARA/Wikipedia canonical vectors
    vectors = {
        "Robert": "R163", "Rupert": "R163", "Ashcraft": "A261",
        "Ashcroft": "A261", "Tymczak": "T522", "Pfister": "P236",
        "Honeyman": "H555", "Washington": "W252", "Lee": "L000",
        "Gutierrez": "G362", "Jackson": "J250", "VanDeusen": "V532",
    }
    for name, want in vectors.items():
        assert _py_soundex(name) == want, name
    # the SQL emitter agrees with the reference implementation in
    # BOTH engines on the roster and the vectors
    import duckdb

    con = duckdb.connect()
    sql = em._soundex_sql("n")
    for name in list(vectors) + em.PB_NAMES:
        got = con.execute(
            f"SELECT {sql} FROM (SELECT '{name}' AS n)"
        ).fetchone()[0]
        assert got == _py_soundex(name), name


def _pb_records():
    cust = pd.read_parquet(os.path.join(SF01, "customer.parquet"))
    nn = len(em.PB_NAMES)
    recs = {}
    for ck in cust["c_custkey"].astype(int):
        fn = em.PB_NAMES[(ck * 7) % nn]
        ln = em.PB_NAMES[(ck * 13 + 3) % nn]
        recs[ck] = (fn, ln, _py_soundex(fn), _py_soundex(ln))
    return recs


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_phonetic_blocking_replay_and_recall_gap(spark):
    out = em.q_phonetic_blocking(spark, SF01).toPandas()
    recs = _pb_records()
    expected = set()
    keys = sorted(recs)
    by_block: dict[tuple, list[int]] = {}
    for ck in keys:
        fn, ln, sf, sl = recs[ck]
        by_block.setdefault((sf, sl), []).append(ck)
    for (sf, sl), members in by_block.items():
        for i, a in enumerate(members):
            for b in members[i + 1:]:
                d = _lev(
                    f"{recs[a][0]} {recs[a][1]}",
                    f"{recs[b][0]} {recs[b][1]}",
                )
                if 1 <= d <= em.PB_MAX_LEV:
                    expected.add((a, b, sf, sl, d))
    got = {
        (int(r.a), int(r.b), r.sdx_f, r.sdx_l, int(r.lev))
        for r in out.itertuples()
    }
    assert got == expected and len(got) > 1000
    # recall-gap law: Thompson (T512) and Tomson (T525) are a TRUE
    # match at the verify threshold (lev 2 <= PB_MAX_LEV) that
    # classic Soundex blocks apart — the blocker can never emit any
    # (Thompson, Tomson) pair.  (The fixture's hash assignment makes
    # their last names provably distinct — 7Δ≡-1 and 13Δ≡0 mod 20
    # have no common solution — so the gap is pinned structurally:)
    assert _lev("Thompson", "Tomson") == 2 <= em.PB_MAX_LEV
    assert _py_soundex("Thompson") == "T512"
    assert _py_soundex("Tomson") == "T525"
    fn_of = {k: v[0] for k, v in recs.items()}
    for a, b, *_ in got:
        assert {fn_of[a], fn_of[b]} != {"Thompson", "Tomson"}
    # every emitted pair genuinely shares its block (codes recomputed
    # from the independent implementation)
    for a, b, sf, sl, _d in got:
        assert recs[a][2] == recs[b][2] == sf
        assert recs[a][3] == recs[b][3] == sl


def _py_rake(text: str):
    toks = [t for t in text.split(" ") if t]
    phrases, cur = [], []
    for t in toks:
        if t in em.RAKE_STOPWORDS:
            if cur:
                phrases.append(cur)
            cur = []
        else:
            cur.append(t)
    if cur:
        phrases.append(cur)
    if not phrases:
        return None
    deg: dict[str, int] = {}
    freq: dict[str, int] = {}
    for p in phrases:
        for w in p:
            deg[w] = deg.get(w, 0) + len(p)
            freq[w] = freq.get(w, 0) + 1
    wsq = {w: (deg[w] * em.RAKE_SCALE) // freq[w] for w in deg}
    scored = [(" ".join(p), sum(wsq[w] for w in p)) for p in phrases]
    best = min(scored, key=lambda t: (-t[1], t[0]))
    return best[0], best[1], len(scored)


def test_rake_keywords_replay(spark):
    out = em.q_rake_keywords(spark, SF01).toPandas()
    docs = pd.read_parquet(os.path.join(SF01, "documents.parquet"))
    expected = {}
    for r in docs.itertuples():
        res = _py_rake(str(r.text))
        if res:
            expected[int(r.doc_id)] = res
    got = {
        int(r.doc_id): (r.phrase, int(r.score_q), int(r.n_phrases))
        for r in out.itertuples()
    }
    assert got == expected
    # a phrase never contains a stopword, and scores are positive
    for phrase, score_q, _ in got.values():
        assert not set(phrase.split(" ")) & set(em.RAKE_STOPWORDS)
        assert score_q > 0


def test_cdx_surt_replay_and_ordering(spark):
    out = em.q_cdx_surt_index(spark, SF01).toPandas()
    docs = pd.read_parquet(os.path.join(SF01, "documents.parquet"))
    rows = {}
    for r in docs.itertuples():
        did = int(r.doc_id)
        scheme = "http" if did % 2 == 0 else "https"
        host = ["example.org", "WWW.example.org", "sub.example.org",
                "archive.net"][did % 4]
        port = ":8080" if did % 7 == 2 else ""
        path = f"/p/{did}"
        query = {0: "b=2&a=1", 1: "a=1"}.get(did % 5, "")
        url = f"{scheme}://{host}{port}{path}" + (
            f"?{query}" if query else ""
        )
        h2 = host.lower()
        if h2.startswith("www."):
            h2 = h2[4:]
        surt = ",".join(reversed(h2.split("."))) + port + ")" + path + (
            "?" + "&".join(sorted(query.split("&"))) if query else ""
        )
        digest = hashlib.md5(str(r.text).encode()).hexdigest()
        rows[did] = (url, surt, digest)
    got = {
        int(r.doc_id): (r.url, r.surt, r.digest)
        for r in out.itertuples()
    }
    assert got == rows
    # idx pins the (surt, doc_id) total order exactly
    order = sorted(rows, key=lambda d: (rows[d][1], d))
    idx = out.set_index("doc_id")["idx"]
    assert [int(idx[d]) for d in order] == list(range(1, len(order) + 1))
    # domain contiguity: every registered-domain block is one run,
    # and 'org,example)' (bare + www) sorts strictly before
    # 'org,example,sub)' because ASCII ')' < ','
    # ASCII ')' (0x29) < ',' (0x2C) < ':' (0x3A): bare-domain rows,
    # then subdomains, then port-qualified captures — three
    # contiguous runs in exactly that order
    surt_sorted = [rows[d][1] for d in order]
    bare = [i for i, s in enumerate(surt_sorted)
            if s.startswith("org,example)")]
    sub = [i for i, s in enumerate(surt_sorted)
           if s.startswith("org,example,")]
    ported = [i for i, s in enumerate(surt_sorted)
              if s.startswith("org,example:")]
    assert bare and sub and ported
    assert max(bare) < min(sub) < max(sub) < min(ported)
    for run in (bare, sub, ported):
        assert run == list(range(run[0], run[-1] + 1))
    # www is folded into the registered domain (dedup-ready keys)
    www = docs[docs["doc_id"] % 4 == 1]["doc_id"].astype(int)
    assert all(rows[d][1].startswith("org,example") for d in www)
