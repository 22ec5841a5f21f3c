"""Decoder tests.

The reference decoder is unbuildable here (lib/murphy.jar missing), so
correctness is pinned by construction (SURVEY.md §5):
  * self-consistent goldens — pages rendered from the fixture font with
    known text must decode back to exactly that text;
  * path-score consistency — the joint log-prob returned by the DP must
    equal an independent replay of start/transition/emission scores
    along the returned state path;
  * beam robustness — a huge beam (≈ exact Viterbi) and the default
    beam agree on clean fixtures;
  * multi-line continuity and hyphenation state machinery.
"""

import numpy as np
import pytest

from ocular_spark.charset import SPACE, CharIndexer
from ocular_spark.decoder import (
    LMRGN,
    RMRGN,
    RMRGN_HPHN,
    RMRGN_HPHN_INIT,
    TMPL,
    N_TYPES,
    Decoder,
    build_emission_cache,
)
from ocular_spark.font import LINE_HEIGHT, WHITE, BLACK
from ocular_spark.glyphs import build_init_font, render_glyph
from ocular_spark.lm import KNESER_NEY, build_ngram_lm_from_chars
from ocular_spark.transcriptions import assemble, diplomatic_text, render_line

CORPUS = [
    "the cat sat on the mat",
    "the man ran to the van",
    "a cat and a rat sat",
    "the van ran past the cat",
    "a man and a cat sat on a mat",
    "the rat sat on a van",
    "no man ran past a rat",
    "a tan cat sat on the tan mat",
    "the man ran past the van",
    "no rat sat on the mat",
] * 3


def make_fixture(order=4):
    ci = CharIndexer()
    # force hyphen (UNIV_PUNC member) into the charset like
    # InitializeLanguageModel.java:272-274 forces universal punctuation
    lines = [list(l) for l in CORPUS] + [list("-")]
    lm = build_ngram_lm_from_chars(lines, order, KNESER_NEY, 1.0, ci)
    chars = ci.get_objects()
    font = build_init_font(chars)
    return ci, lm, font


def render_line_image(text, margin=4, char_width=10, space_width=6, pad=2):
    """Compose a page line from fixture glyphs: margin, then each char
    rendered at char_width with `pad` white columns after."""
    cols = [np.full((margin, LINE_HEIGHT), WHITE, dtype=np.uint8)]
    for ch in text:
        if ch == " ":
            cols.append(np.full((space_width, LINE_HEIGHT), WHITE, dtype=np.uint8))
        else:
            cols.append(render_glyph(ch, target_width=char_width))
            cols.append(np.full((pad, LINE_HEIGHT), WHITE, dtype=np.uint8))
    cols.append(np.full((margin, LINE_HEIGHT), WHITE, dtype=np.uint8))
    return np.concatenate(cols, axis=0)


@pytest.fixture(scope="module")
def fixture():
    return make_fixture()


def _decode_text(decoder, ci, lines):
    decodes, logp = decoder.decode_document(lines)
    return diplomatic_text(decodes, ci.get_objects()), decodes, logp


def test_decode_recovers_rendered_text(fixture):
    ci, lm, font = fixture
    decoder = Decoder(font, lm, beam_size=10)
    text = "the cat sat"
    img = render_line_image(text)
    dipl, decodes, logp = _decode_text(decoder, ci, [img])
    assert dipl.strip() == text
    assert np.isfinite(logp)


def test_decode_two_lines_and_continuity(fixture):
    ci, lm, font = fixture
    decoder = Decoder(font, lm, beam_size=10)
    img1 = render_line_image("the man ran")
    img2 = render_line_image("to the van")
    dipl, decodes, _ = _decode_text(decoder, ci, [img1, img2])
    assert [l.strip() for l in dipl.split("\n")] == ["the man ran", "to the van"]
    assert len(decodes) == 2


def test_decode_with_noise(fixture):
    ci, lm, font = fixture
    decoder = Decoder(font, lm, beam_size=10)
    text = "a cat and a rat"
    img = render_line_image(text).copy()
    rng = np.random.RandomState(7)
    flip = rng.rand(*img.shape) < 0.02  # 2% salt-and-pepper
    img[flip] = np.where(img[flip] == WHITE, BLACK, WHITE).astype(np.uint8)
    dipl, _, _ = _decode_text(decoder, ci, [img])
    assert dipl.strip() == text


def test_large_beam_matches_default_on_clean_input(fixture):
    ci, lm, font = fixture
    text = "the rat sat"
    img = render_line_image(text)
    d10, _, lp10 = _decode_text(Decoder(font, lm, beam_size=10), ci, [img])
    d500, _, lp500 = _decode_text(Decoder(font, lm, beam_size=500), ci, [img])
    assert d10 == d500
    # larger beam can only improve (or match) the Viterbi score
    assert lp500 >= lp10 - 1e-9


def _replay_path_score(decoder, decodes, caches_lines):
    """Independent score replay: start + transitions + emissions."""
    tm = decoder.tm
    total = None
    prev_end_state = None
    for ld, line_obs in zip(decodes, caches_lines):
        cache = build_emission_cache(line_obs, decoder.stack)
        for i in range(len(ld.states)):
            s = int(ld.states[i])
            w = int(ld.widths[i])
            t0 = int(ld.start_cols[i])
            emit = float(cache.log_probs[t0, int(ld.glyph_chars[i]), w])
            if i == 0:
                if prev_end_state is None:
                    ss, lps = tm.start_states()
                    trans = float(lps[np.where(ss == s)[0][0]])
                else:
                    ns, lps = tm.next_line_start_states(prev_end_state)
                    trans = float(lps[np.where(ns == s)[0][0]])
                total = (total if total is not None else 0.0) + trans + emit
            else:
                prev = int(ld.states[i - 1])
                ns, lps = tm.forward_transitions(prev)
                trans = float(lps[np.where(ns == s)[0][0]])
                total += trans + emit
        prev_end_state = int(ld.states[-1])
    return total


def test_path_score_consistency(fixture):
    ci, lm, font = fixture
    decoder = Decoder(font, lm, beam_size=10)
    lines = [render_line_image("the cat sat"), render_line_image("on the mat")]
    decodes, logp = decoder.decode_document(lines)
    replay = _replay_path_score(decoder, decodes, lines)
    assert replay == pytest.approx(logp, abs=1e-4)


def test_assembly_collapses_hyphens_and_margins(fixture):
    ci, lm, font = fixture
    # hand-build a LineDecode-like structure via decoding a real image,
    # then check margin states produce spaces around the text
    decoder = Decoder(font, lm, beam_size=10)
    img = render_line_image("a cat")
    decodes, _ = decoder.decode_document([img])
    ld = decodes[0]
    # line starts in the left margin; the trailing whitespace is either a
    # right-margin state or a space TMPL (their scores tie exactly:
    # margin 0.5*(1-1e-8)*P(space|ctx) vs char 0.5*P(space|ctx))
    assert int(ld.types[0]) == LMRGN
    space_idx = ci.get_index(SPACE)
    assert int(ld.types[-1]) in (RMRGN, RMRGN_HPHN, RMRGN_HPHN_INIT) or (
        int(ld.types[-1]) == TMPL and int(ld.glyph_chars[-1]) == space_idx
    )
    tr = assemble(decodes, ci.get_objects())
    assert render_line(tr.normalized_lines[0]).strip() == "a cat"
    # running normalized: no leading/trailing spaces, single spaces inside
    running = render_line(tr.normalized_running)
    assert running == "a cat"


def test_widths_partition_line(fixture):
    ci, lm, font = fixture
    decoder = Decoder(font, lm, beam_size=10)
    img = render_line_image("no rat")
    decodes, _ = decoder.decode_document([img])
    ld = decodes[0]
    assert int(ld.widths.sum()) == img.shape[0]
    assert (ld.start_cols[1:] == np.cumsum(ld.widths)[:-1]).all()
