"""Mimics the driver's correctness gate: run each __spark_entry__
query on Spark and its oracle_sql on DuckDB over the same parquet,
compare row count, column names, and order-insensitive values.

Uses sf0.001 for speed (driver uses sf0.01; same code paths)."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")


def _duck_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(rows, cols):
    # sort columns by name (like the driver), then sort rows
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "nan"
                else:
                    v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda r: tuple(str(x) for x in r))
    return [c for _, c in sorted(zip(range(len(cols)), cols), key=lambda p: cols[p[0]])], out


# the frozen VALUES-goldens are pinned to sf0.01 (the driver's
# correctness scale) — they get their own sf0.01 test below; the
# recomputable oracles are checked here at sf0.001 for speed
try:
    from golden_oracles import GOLDEN_ORACLES
except ImportError:
    GOLDEN_ORACLES = {}

RECOMPUTABLE = sorted(
    set(entry_mod.oracle_sql())
    - set(GOLDEN_ORACLES)
    - entry_mod.GOLDEN_DERIVED  # golden-derived oracles are sf0.01-pinned
)


@pytest.mark.parametrize("name", RECOMPUTABLE)
def test_query_matches_duckdb_oracle(spark, sf_dir, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]

    sdf = q(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = _duck_con(sf_dir)
    res = con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), name
    assert len(spark_rows) == len(duck_rows), (
        name, len(spark_rows), len(duck_rows))

    _, s_norm = _normalize(spark_rows, spark_cols)
    _, d_norm = _normalize(duck_rows, duck_cols)
    mismatches = [
        (a, b) for a, b in zip(s_norm, d_norm) if a != b
    ]
    assert not mismatches, (name, mismatches[:5])


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"doc_id", "kind", "text", "media_ref", "offset"}
    # media spans must carry decoded text
    media_rows = [r for r in rows if r.kind == "media"]
    assert media_rows and all(r.text for r in media_rows)


def test_minhash_bands_are_rank_independent(spark):
    """The per-band minhash permutations must be statistically
    independent: with the round-1 XOR-constant derivation all bands
    shared the candidate-min ordering of the top bits (rank correlation
    ~1 across bands), silently breaking the b-band LSH recall math.
    The universal-hash family (a_b*h + c_b mod 2^31-1) must show low
    cross-band rank correlation of per-doc band minima."""
    import hashlib

    import numpy as np

    texts = [
        " ".join(
            hashlib.sha256(f"{i}|{j}".encode()).hexdigest()[:6] for j in range(30)
        )
        for i in range(80)
    ]
    docs = spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(texts)], "doc_id string, text string"
    )
    mh = entry_mod._minhash_minhashes(docs).collect()
    by_band = {}
    for r in mh:
        by_band.setdefault(r.band, {})[r.doc_id] = r.minhash
    doc_ids = sorted(by_band[0])
    mat = np.array([[by_band[b][d] for d in doc_ids] for b in range(4)], dtype=np.float64)
    ranks = np.argsort(np.argsort(mat, axis=1), axis=1).astype(np.float64)
    for i in range(4):
        for j in range(i + 1, 4):
            rho = np.corrcoef(ranks[i], ranks[j])[0, 1]
            assert abs(rho) < 0.5, (i, j, rho)


def test_every_query_has_an_oracle():
    """Since round 2 every driver query carries an oracle entry — the
    OCR-core queries via frozen sf0.01 goldens (golden_oracles.py)."""
    assert set(entry_mod.queries()) == set(entry_mod.oracle_sql())
    assert set(GOLDEN_ORACLES) == {
        "transcribe_spans", "transcribe_spans_cs", "transcribe_spans_offset",
        "transcribe_spans_crop", "transcribe_metrics", "em_font_counts",
        "train_font_step", "train_font_step_cs", "lm_perplexity",
        "bpe_train", "bpe_encode", "layout_reading_order",
        "transcribe_confidence",
    }


def test_golden_queries_match_frozen_oracles_at_sf001(spark):
    """Mimic the driver's gate for the golden queries AT sf0.01 (the
    scale the goldens were frozen at): rows, columns, and
    order-insensitive values must match the VALUES-select exactly."""
    sf_dir = os.path.join(TESTDATA, "sf0.01")
    con = _duck_con(sf_dir)
    all_sql = entry_mod.oracle_sql()
    for name in sorted(set(GOLDEN_ORACLES) | entry_mod.GOLDEN_DERIVED):
        sdf = entry_mod.queries()[name](spark, sf_dir)
        spark_cols = sdf.columns
        spark_rows = [tuple(r) for r in sdf.collect()]
        res = con.execute(all_sql[name])
        duck_cols = [d[0] for d in res.description]
        duck_rows = res.fetchall()
        assert sorted(spark_cols) == sorted(duck_cols), name
        assert len(spark_rows) == len(duck_rows), name
        _, s_norm = _normalize(spark_rows, spark_cols)
        _, d_norm = _normalize(duck_rows, duck_cols)
        mismatches = [(a, b) for a, b in zip(s_norm, d_norm) if a != b]
        assert not mismatches, (name, mismatches[:5])


def test_bench_list_subset_of_contract():
    """Every bench headline query must exist in queries() — a rename
    that breaks `python bench.py` should fail here, not in the
    driver's per-round bench run."""
    import bench

    missing = [n for n in bench.RELATIONAL if n not in entry_mod.queries()]
    assert not missing, missing
