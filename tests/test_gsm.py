"""Ported vectors from BasicGlyphSubstitutionModelTests.java:23-67."""

import numpy as np
import pytest

from ocular_spark.charset import LONG_S, TILDE_COMBINING, CharIndexer
from ocular_spark.gsm import BasicGlyphSubstitutionModelFactory


@pytest.fixture()
def gsmf():
    sc = 0.1
    mult = 500.0
    lang_names = ["spanish", "latin"]
    chars = [" ", "-", "a", "b", "c", "d", "e", "f", "k", "n", "o", "s", "\\'o"]
    ci = CharIndexer()
    ci.index(chars)
    full = {ci.get_index(c) for c in chars}
    active = [set(full), set(full)]
    ci.get_index("z")
    ci.get_index(LONG_S)
    for c in ["a", "b", "c", "d", "e", "f", "k", "n", "o", "s", "z"]:
        ci.get_index(c + TILDE_COMBINING)
    ci.lock()
    return BasicGlyphSubstitutionModelFactory(sc, mult, lang_names, ci, active, 2.0, 2), ci


def test_smoothing_values(gsmf):
    f, ci = gsmf
    sc, mult = 0.1, 500.0
    assert f.get_smoothing_value(0, ci.get_index("\\'o"), f.GLYPH_ELISION_TILDE) == pytest.approx(sc * mult)
    assert f.get_smoothing_value(0, ci.get_index("k"), ci.get_index("k")) == pytest.approx(sc)
    assert f.get_smoothing_value(0, ci.get_index("k"), f.GLYPH_FIRST_ELIDED) == pytest.approx(sc * mult)
    assert f.get_smoothing_value(0, ci.get_index("k"), f.GLYPH_TILDE_ELIDED) == pytest.approx(sc * mult)
    assert f.get_smoothing_value(0, ci.get_index("a"), ci.get_index("a")) == pytest.approx(sc)
    assert f.get_smoothing_value(0, ci.get_index("n"), f.GLYPH_TILDE_ELIDED) == pytest.approx(sc * mult)
    assert f.get_smoothing_value(0, ci.get_index("a"), ci.get_index("z")) == 0.0
    assert f.get_smoothing_value(0, ci.get_index("a"), ci.get_index(LONG_S)) == 0.0
    assert f.get_smoothing_value(0, ci.get_index("s"), ci.get_index(LONG_S)) == pytest.approx(sc)


def test_make_normalizes_rows(gsmf):
    f, ci = gsmf
    counts = f.initialize_new_counts_matrix()
    gsm = f.make(counts)
    sums = gsm.probs.sum(axis=2)
    a = ci.get_index("a")
    assert sums[0, a] == pytest.approx(1.0)
    # inactive lm chars (e.g. z, never in active set) have all-zero rows
    z = ci.get_index("z")
    assert sums[0, z] == 0.0
    # gsmPower applies
    p = gsm.probs[0, a, a]
    assert gsm.glyph_prob(0, a, 5, a) == pytest.approx(p ** 2.0)  # NORMAL_CHAR=5


def test_increment_counts_tmpl_and_elided_hyphen(gsmf):
    from ocular_spark.decoder import LMRGN, RMRGN_HPHN_INIT, TMPL
    from ocular_spark.gsm import NORMAL_CHAR

    f, ci = gsmf
    counts = np.zeros((f.num_languages, f.num_chars, f.num_glyphs))
    a, sp = ci.get_index("a"), ci.get_index(" ")
    hy = ci.get_index("-")
    seq = [
        (TMPL, 0, a, NORMAL_CHAR, a),
        (TMPL, -1, a, NORMAL_CHAR, a),  # no language -> skipped
        (LMRGN, 0, sp, NORMAL_CHAR, sp),  # margins skipped
        (RMRGN_HPHN_INIT, 0, hy, NORMAL_CHAR, sp),  # elided line-break hyphen
        (RMRGN_HPHN_INIT, 0, hy, NORMAL_CHAR, hy),  # rendered hyphen -> skipped
    ]
    f.increment_counts(counts, seq)
    assert counts[0, a, a] == 1
    assert counts[0, hy, sp] == 1
    assert counts.sum() == 2
