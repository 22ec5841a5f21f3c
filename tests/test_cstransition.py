"""Code-switch + glyph-substitution transition model tests
(reference: model/transition/CodeSwitchTransitionModel.java).

The reference ships no unit tests for this class; correctness is
pinned by construction on self-rendered fixtures:
  * bilingual decode recovers each language's text and assigns the
    right language index to its characters;
  * glyph substitution: a page rendered with a long-s glyph ("faſt")
    decodes to diplomatic "faſt" but normalized "fast";
  * endLogProb forbids ending on DOUBLED / ELISION_TILDE states.
"""

import numpy as np
import pytest

from ocular_spark.charset import LONG_S, CharIndexer
from ocular_spark.cstransition import CodeSwitchTransitionModel
from ocular_spark.decoder import Decoder, TMPL
from ocular_spark.fixtures import render_text_line
from ocular_spark.glyphs import build_init_font
from ocular_spark.gsm import (
    DOUBLED,
    ELISION_TILDE,
    NORMAL_CHAR,
    BasicGlyphSubstitutionModelFactory,
    NoSubGlyphSubstitutionModel,
)
from ocular_spark.lm import (
    KNESER_NEY,
    BasicCodeSwitchLanguageModel,
    add_auxiliary_glyph_chars,
    build_ngram_lm_from_chars,
)
from ocular_spark.transcriptions import assemble, render_line

CORPUS_EN = [
    "the cat sat on the mat",
    "the man ran to the van",
    "a cat and a rat sat",
    "no man ran past a rat",
    "the fast man sat",
] * 4
CORPUS_LA = [
    "lorem ipsum dolor sit",
    "quod erat demonstrandum",
    "veni vidi vici",
    "carpe diem lorem ipsum",
    "alea iacta est",
] * 4


@pytest.fixture(scope="module")
def bilingual():
    from ocular_spark.lm import CorpusCounter, NgramLanguageModel

    ci = CharIndexer()
    counters = []
    actives = []
    for corpus in (CORPUS_EN, CORPUS_LA):
        counter = CorpusCounter(4)
        for i, line in enumerate(corpus):
            counter.count_line_chars(list(line), ci, i)
        actives.append(set(counter.active_characters) | {ci.get_index(" ")})
        counters.append(counter)
    ci.get_index("-")
    add_auxiliary_glyph_chars(ci)
    ci.lock()
    lm_en = NgramLanguageModel(ci, counters[0].counts, actives[0], KNESER_NEY, 1.0)
    lm_la = NgramLanguageModel(ci, counters[1].counts, actives[1], KNESER_NEY, 1.0)
    cslm = BasicCodeSwitchLanguageModel(
        [(lm_en, 0.6), (lm_la, 0.4)], ci, ["english", "latin"], 0.999999
    )
    font = build_init_font(ci.get_objects())
    return ci, cslm, font


def test_bilingual_decode_recovers_both_languages(bilingual):
    ci, cslm, font = bilingual
    gsm = NoSubGlyphSubstitutionModel(ci)
    tm = CodeSwitchTransitionModel(cslm, True, gsm, allow_glyph_substitution=False)
    dec = Decoder(font, cslm, beam_size=20, transition_model=tm)
    img_en = render_text_line("the cat sat")
    img_la = render_text_line("lorem ipsum")
    decodes, lp = dec.decode_document([img_en, img_la])
    tr = assemble(decodes, ci.get_objects())
    assert render_line(tr.diplomatic_lines[0]).strip() == "the cat sat"
    assert render_line(tr.diplomatic_lines[1]).strip() == "lorem ipsum"
    assert np.isfinite(lp)
    # language assignment: TMPL non-space states carry the right language
    for li, want_lang in ((0, 0), (1, 1)):
        ld = decodes[li]
        sp = ci.get_index(" ")
        mask = (ld.types == TMPL) & (ld.lm_chars != sp)
        langs = ld.langs[mask]
        assert len(langs) > 0
        # majority of the line's characters in the expected language
        assert (langs == want_lang).mean() > 0.8, (li, langs)


@pytest.fixture(scope="module")
def gs_fixture():
    from ocular_spark.lm import CorpusCounter, NgramLanguageModel

    ci = CharIndexer()
    counter = CorpusCounter(4)
    for i, line in enumerate(CORPUS_EN + ["-"]):
        counter.count_line_chars(list(line), ci, i)
    active = set(counter.active_characters) | {ci.get_index(" ")}
    add_auxiliary_glyph_chars(ci)
    ci.lock()
    lm = NgramLanguageModel(ci, counter.counts, active, KNESER_NEY, 1.0)
    cslm = BasicCodeSwitchLanguageModel([(lm, 1.0)], ci, ["english"], 0.999999)
    font = build_init_font(ci.get_objects())
    active_sets = [lm.get_active_characters()]
    gsm_factory = BasicGlyphSubstitutionModelFactory(
        1.0, 100.0, ["english"], ci, active_sets, gsm_power=1.0
    )
    gsm = gsm_factory.uniform()
    return ci, cslm, font, gsm


def test_glyph_substitution_long_s(gs_fixture):
    ci, cslm, font, gsm = gs_fixture
    tm = CodeSwitchTransitionModel(
        cslm, True, gsm, allow_glyph_substitution=True, no_char_sub_prior=0.9
    )
    dec = Decoder(font, cslm, beam_size=20, transition_model=tm)
    img = render_text_line("the faſt man")  # rendered with a long-s glyph
    decodes, _ = dec.decode_document([img])
    tr = assemble(decodes, ci.get_objects())
    dipl = render_line(tr.diplomatic_lines[0]).strip()
    norm = render_line(tr.normalized_lines[0]).strip()
    assert dipl == "the faſt man"
    assert norm == "the fast man"


def test_no_gs_cs_model_matches_monolingual_text(gs_fixture):
    """With one language and GS off, the CS model must read the same
    text as the monolingual model (DecoderEM would not even build it,
    but semantics should agree)."""
    ci, cslm, font, gsm = gs_fixture
    tm = CodeSwitchTransitionModel(cslm, True, NoSubGlyphSubstitutionModel(ci), False)
    dec_cs = Decoder(font, cslm, beam_size=10, transition_model=tm)
    dec_mono = Decoder(font, cslm.get(0), beam_size=10)
    img = render_text_line("no man ran past a rat")
    d_cs, _ = dec_cs.decode_document([img])
    d_mono, _ = dec_mono.decode_document([img])
    t_cs = assemble(d_cs, ci.get_objects())
    t_mono = assemble(d_mono, ci.get_objects())
    assert t_cs.diplomatic_lines == t_mono.diplomatic_lines


def test_end_log_prob_blocks_incomplete_glyphs(gs_fixture):
    ci, cslm, font, gsm = gs_fixture
    tm = CodeSwitchTransitionModel(cslm, True, gsm, True, 0.5)
    a = ci.get_index("a")
    s_doubled = tm.state(tm.empty_ctx, TMPL, 0, a, DOUBLED)
    s_tilde = tm.state(tm.empty_ctx, TMPL, 0, a, ELISION_TILDE)
    s_normal = tm.state(tm.empty_ctx, TMPL, 0, a, NORMAL_CHAR)
    eps = tm.end_log_probs(np.array([s_doubled, s_tilde, s_normal], dtype=np.int64))
    assert eps[0] == float("-inf")
    assert eps[1] == float("-inf")
    assert eps[2] == 0.0
