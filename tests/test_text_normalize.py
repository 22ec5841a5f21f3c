"""Unicode text normalization (ocular_spark/functions/text.py):
cross-engine NFC agreement, hand-pinned stage behavior, and the
map-side plan contract.  The driver gate (text_normalize) hashes the
full sf0.01 corpus against DuckDB's independent nfc_normalize; these
tests pin the edge semantics and probe the Unicode-table agreement
directly on an adversarial corpus."""

import duckdb
import pytest

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from ocular_spark.functions import text as T


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def U(*cp):
    return "".join(chr(c) for c in cp)


# adversarial NFC corpus: composition, blocked composition, combining
# reordering (canonical ordering step), hangul, ligature passthrough,
# fullwidth passthrough (NFC != NFKC), multiple marks, singletons
NFC_CORPUS = [
    "cafe" + U(0x301),
    "u" + U(0x308) + "ber",
    U(0x65, 0x301, 0x301),              # e + acute + acute (one composes)
    "d" + U(0x307, 0x323),              # reorder: dot-above after dot-below
    U(0x1100, 0x1161, 0x11A8),          # jamo -> syllable
    U(0x1100, 0x1161),                  # LV-only syllable
    U(0xFB01) + "le",                   # fi ligature: NFC-invariant
    U(0xFF46, 0xFF57),                  # fullwidth: NFC-invariant
    U(0x212B),                          # angstrom sign singleton -> Aring
    U(0x2126),                          # ohm singleton -> omega
    U(0x0041, 0x030A, 0x0301),          # A + ring + acute
    U(0x03B9, 0x0308, 0x0301),          # greek iota + diaeresis + acute
    U(0x09C7, 0x09BE),                  # bengali vowel sign composition
    "x" + U(0x0F71, 0x0F72),            # tibetan (composition exclusions)
    U(0x1E0B, 0x0323),                  # d-dot-above + dot-below reorder
]


def test_nfc_agreement_python_vs_duckdb():
    import unicodedata

    con = duckdb.connect()
    for s in NFC_CORPUS:
        py = unicodedata.normalize("NFC", s)
        db = con.execute("SELECT nfc_normalize(?)", [s]).fetchone()[0]
        assert py == db, f"NFC divergence on {s!r}: {py!r} vs {db!r}"


def test_norm_decor_hand_pinned(spark):
    """Each fixture decoration, appended to a base word, normalizes to
    a hand-computed expectation through the FULL Spark path."""
    rows = [(i, "base" + d) for i, d in enumerate(T.NORM_DECOR)]
    df = spark.createDataFrame(rows, "i long, t string")
    out = {
        r["i"]: r["n"]
        for r in df.select(
            "i", T.normalize_col(T.nfc_kernel()("t")).alias("n")
        ).collect()
    }
    assert out[0] == "base caf" + U(0xE9) + " " + U(0xFC) + "ber"
    assert out[1] == "base " + U(0xC5) + "ngstr" + U(0xF6) + "ms"
    assert out[2] == "base " + U(0xAC01) + " word"
    assert out[3] == "base multi space run x y"
    assert out[4] == "base ctrlchars.\nnext"  # CRLF -> LF, C0/C1 gone
    assert out[5] == "base"


def test_normalize_preserves_newlines_and_astral(spark):
    s = "a\n\nb " + U(0x1F600) + " c"  # newlines + astral emoji survive
    df = spark.createDataFrame([(s,)], "t string")
    got = df.select(T.normalize_col(T.nfc_kernel()("t")).alias("n")).first()["n"]
    assert got == s


def test_normalize_idempotent(spark):
    rows = [(i, "base" + d) for i, d in enumerate(T.NORM_DECOR)]
    df = spark.createDataFrame(rows, "i long, t string")
    once = df.select("i", T.normalize_col(T.nfc_kernel()("t")).alias("n"))
    twice = once.select("i", T.normalize_col(T.nfc_kernel()("n")).alias("n"))
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_text_normalize_plan_is_map_side(spark, sf_dir):
    """One Arrow Python node (the NFC kernel), stages 2-5 a JVM
    projection: no shuffle beyond the gated input spread, no window,
    no sort, no join."""
    plan = _plan(entry_mod.q_text_normalize(spark, sf_dir))
    assert plan.count("Exchange") <= 1
    assert "Window" not in plan and "Join" not in plan and "Sort" not in plan
    assert plan.count("ArrowEvalPython") == 1
