"""Markov vertical-offset decode variant (O13;
reference: model/transition/CharacterNgramTransitionModelMarkovOffset.java
+ model/emission/CachingEmissionModelExplicitOffset.java)."""

import numpy as np
import pytest

from ocular_spark.decoder import Decoder, build_emission_cache, build_emission_cache_explicit
from ocular_spark.font import MAX_OFFSET, WHITE
from ocular_spark.markov_offset import (
    MAX_OFFSET_DIFF,
    MarkovOffsetTransitionModel,
    N_OFF,
    log_offset_trans_probs,
)
from ocular_spark.transcriptions import diplomatic_text
from tests.test_decoder import CORPUS, make_fixture, render_line_image


@pytest.fixture(scope="module")
def fixture():
    return make_fixture()


def test_offset_trans_probs_structure():
    m = log_offset_trans_probs()
    assert m.shape == (N_OFF, N_OFF)
    # banded: |prev-next| > 2 impossible
    for p in range(N_OFF):
        for n in range(N_OFF):
            if abs(p - n) > MAX_OFFSET_DIFF:
                assert m[p, n] == -np.inf
    # columns normalized (a.normalizecoli): sum over prev of exp == 1
    col_sums = np.exp(m).sum(axis=0)
    np.testing.assert_allclose(col_sums, 1.0, rtol=1e-12)


def test_explicit_cache_offset_max_matches_default(fixture):
    ci, lm, font = fixture
    dec = Decoder(font, lm, beam_size=10)
    img = render_line_image("the cat")
    c3 = build_emission_cache(img, dec.stack)
    c4 = build_emission_cache_explicit(img, dec.stack)
    # max over offsets of the explicit cache == the offset-maxed cache
    np.testing.assert_allclose(c4.log_probs, c3.log_probs, atol=1e-5)


def test_markov_offset_decodes_clean_text(fixture):
    ci, lm, font = fixture
    tm = MarkovOffsetTransitionModel(lm)
    dec = Decoder(font, lm, beam_size=20, transition_model=tm)
    assert dec.explicit_offset
    img = render_line_image("the cat sat")
    decodes, lp = dec.decode_document([img])
    assert diplomatic_text(decodes, ci.get_objects()).strip() == "the cat sat"
    assert np.isfinite(lp)
    # decoded offsets come from the state path and move smoothly
    offs = decodes[0].offsets.astype(int)
    assert (np.abs(np.diff(offs)) <= 2 * MAX_OFFSET).all()


def test_markov_offset_tracks_shifted_glyphs(fixture):
    """A line whose glyphs are uniformly shifted down by 3 rows should
    decode with predominantly shifted offsets on TMPL states."""
    from ocular_spark.decoder import TMPL

    ci, lm, font = fixture
    tm = MarkovOffsetTransitionModel(lm)
    dec = Decoder(font, lm, beam_size=20, transition_model=tm)
    img = render_line_image("the rat sat").copy()
    shifted = np.full_like(img, WHITE)
    shifted[:, 3:] = img[:, :-3]  # shift content down 3 rows
    decodes, _ = dec.decode_document([shifted])
    text = diplomatic_text(decodes, ci.get_objects()).strip()
    assert text == "the rat sat"
    ld = decodes[0]
    sp = ci.get_index(" ")
    mask = (ld.types == TMPL) & (ld.glyph_chars != sp)
    offs = ld.offsets[mask].astype(int)
    # template row j+offset is read for observation row j: content moved
    # down => matching template rows are found at negative offsets
    assert np.median(offs) <= -2
