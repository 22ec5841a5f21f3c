"""Micro-lattice exact-Viterbi vectors (FIXTURES.md §6).

With beam_size >= the reachable state count the beam DP must equal
exact Viterbi.  A deliberately naive, memoized exhaustive recursion
over the SAME transition/emission tables (no beams, no column
buffers, no vectorized dedup — a different code path for the DP
machinery itself) recomputes the optimal score; the tiny alphabet and
short line keep it tractable.
"""

import functools

import numpy as np
import pytest

from ocular_spark.charset import CharIndexer
from ocular_spark.decoder import Decoder, build_emission_cache, NEG_INF
from ocular_spark.font import LINE_HEIGHT, WHITE
from ocular_spark.glyphs import build_init_font, render_glyph
from ocular_spark.lm import KNESER_NEY, build_ngram_lm_from_chars


@pytest.fixture(scope="module")
def micro():
    ci = CharIndexer()
    corpus = [list("ab ba ab ab b a"), list("a b ab ba"), list("-")]
    lm = build_ngram_lm_from_chars(corpus, 2, KNESER_NEY, 1.0, ci)
    font = build_init_font(ci.get_objects())
    return ci, lm, font


def exhaustive_best(decoder, obs):
    """Naive exact Viterbi: forward recursion max over all
    (state, width) expansions, memoized on (t, state)."""
    cache = build_emission_cache(obs, decoder.stack)
    tm = decoder.tm
    T = obs.shape[0]

    @functools.lru_cache(maxsize=None)
    def best_from(t, s):
        """Best score of any completion starting by EMITTING state s at
        column t (score excludes the transition INTO s)."""
        glyph = int(tm.glyph_char_of_states(np.array([s], dtype=np.int64))[0])
        best = NEG_INF
        for w in decoder.stack.allowed_w_list[glyph]:
            nt = t + int(w)
            if nt > T:
                continue
            emit = float(cache.log_probs[t, glyph, w])
            if emit == NEG_INF:
                continue
            if nt == T:
                endp = float(tm.end_log_probs(np.array([s], dtype=np.int64))[0])
                if endp == NEG_INF:
                    continue
                cand = emit + endp
            else:
                ns, lps = tm.forward_transitions(int(s))
                cont = NEG_INF
                for k in range(len(ns)):
                    sub = best_from(nt, int(ns[k]))
                    if sub > NEG_INF:
                        cont = max(cont, float(lps[k]) + sub)
                cand = emit + cont if cont > NEG_INF else NEG_INF
            best = max(best, cand)
        return best

    s0, lp0 = tm.start_states()
    total = NEG_INF
    for k in range(len(s0)):
        sub = best_from(0, int(s0[k]))
        if sub > NEG_INF:
            total = max(total, float(lp0[k]) + sub)
    return total


def _tiny_line(text, char_width=6, space_width=4, pad=1, margin=2):
    cols = [np.full((margin, LINE_HEIGHT), WHITE, dtype=np.uint8)]
    for ch in text:
        if ch == " ":
            cols.append(np.full((space_width, LINE_HEIGHT), WHITE, dtype=np.uint8))
        else:
            cols.append(render_glyph(ch, target_width=char_width))
            cols.append(np.full((pad, LINE_HEIGHT), WHITE, dtype=np.uint8))
    cols.append(np.full((margin, LINE_HEIGHT), WHITE, dtype=np.uint8))
    return np.concatenate(cols, axis=0)


@pytest.mark.parametrize("text", ["a", "ab", "b a"])
def test_beam_dp_equals_exhaustive_viterbi(micro, text):
    ci, lm, font = micro
    decoder = Decoder(font, lm, beam_size=10_000)  # beam >= state count
    obs = _tiny_line(text)
    assert obs.shape[0] <= 40
    decodes, beam_score = decoder.decode_document([obs])
    exact = exhaustive_best(decoder, obs)
    assert beam_score == pytest.approx(exact, abs=1e-9), text
    # and the default beam matches exact Viterbi on these tiny lattices
    small = Decoder(font, lm, beam_size=10)
    _, small_score = small.decode_document([obs])
    assert small_score <= exact + 1e-9


def test_beam_never_beats_exact(micro):
    ci, lm, font = micro
    obs = _tiny_line("ab")
    exact = exhaustive_best(Decoder(font, lm, beam_size=10_000), obs)
    for beam in (1, 2, 5):
        _, score = Decoder(font, lm, beam_size=beam).decode_document([obs])
        assert score <= exact + 1e-9, beam
