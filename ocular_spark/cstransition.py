"""Code-switch + glyph-substitution transition model.

Re-expresses ``model/transition/CodeSwitchTransitionModel.java``
(tberg12/ocular, 822 LoC — the reference's hardest component): the
decoder state becomes (context, type, language, glyph), where glyph =
(template_char, glyph_type).  Language switches only after spaces
(optionally on punctuation); glyph proposals cover substitution,
long-s, elision-tilde decoration, tilde-elision chains, first-of-word
elision, doubling (incl. s->ſ), diacritic disregard, and the
elide-anything mode; glyph probability =
``noCharSubPrior·[glyph==lmChar] + (1-noCharSubPrior)·GSM^gsmPower``
(calculateGlyphLogProb :798-810).

States pack into int64s; transition lists are computed lazily per
state (with the per-language context shrinking of :812-822 — NOTE the
CS model shrinks *before* appending the new char, unlike the
monolingual model) and memoized, so the vectorized beam DP in
decoder.py runs unchanged.  Duck-types CompiledTransitionModel.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import numpy as np

from ocular_spark import charset as cs
from ocular_spark.decoder import (
    LMRGN,
    LMRGN_HPHN,
    N_TYPES,
    NEG_INF,
    RMRGN,
    RMRGN_HPHN,
    RMRGN_HPHN_INIT,
    TMPL,
    LINE_MRGN_PROB,
    LINE_END_HYPHEN_PROB,
    LOG_MRGN,
    LOG_NOT_MRGN,
)
from ocular_spark.gsm import (
    DOUBLED,
    ELIDED,
    ELISION_TILDE,
    FIRST_ELIDED,
    NORMAL_CHAR,
    TILDE_ELIDED,
)

N_GLYPH_TYPES = 6
_ALWAYS_SPACE_TYPES = {LMRGN, LMRGN_HPHN, RMRGN, RMRGN_HPHN}


class CodeSwitchTransitionModel:
    def __init__(
        self,
        cslm,
        allow_language_switch_on_punct: bool = True,
        gsm=None,
        allow_glyph_substitution: bool = False,
        no_char_sub_prior: float = 0.0,
        elide_anything: bool = False,
    ) -> None:
        self.lm = cslm
        self.gsm = gsm
        self.allow_language_switch_on_punct = allow_language_switch_on_punct
        self.allow_glyph_substitution = allow_glyph_substitution
        self.no_char_sub_prior = no_char_sub_prior
        self.elide_anything = elide_anything

        ci = cslm.get_character_indexer()
        self.char_indexer = ci
        C = ci.size()
        self.n_chars = C
        self.space = ci.get_index(cs.SPACE)
        self.hyphen = ci.get_index(cs.HYPHEN)
        self.s_char = ci.get_index("s") if ci.contains("s") else -1
        self.longs_char = ci.get_index(cs.LONG_S) if ci.contains(cs.LONG_S) else -1
        self.punct_set = cs.make_punct_set(ci)
        self.can_be_replaced = cs.make_can_be_replaced_set(ci)
        self.valid_substitution_chars = cs.make_valid_substitution_chars_set(ci)
        self.valid_doublable = cs.make_valid_doublable_set(ci)
        self.can_be_elided = cs.make_can_be_elided_set(ci)
        self.add_tilde = cs.make_add_tilde_map(ci)
        self.diacritic_disregard_map = cs.make_diacritic_disregard_map(ci)

        self.n_langs = cslm.num_languages()
        self.active_chars = [
            sorted(cslm.get(l).get_active_characters()) for l in range(self.n_langs)
        ]

        # context registry (tuples -> ids), lazily grown
        self._ctx_ids: Dict[Tuple[int, ...], int] = {}
        self._ctxs: List[Tuple[int, ...]] = []
        self.empty_ctx = self._intern(())
        # per (lang, ctx_id): prob vector over chars (not log)
        self._prob_vec: Dict[Tuple[int, int], np.ndarray] = {}
        # per (lang, ctx_id): shrunk ctx_id (shrinkContext :812-822)
        self._shrunk: Dict[Tuple[int, int], int] = {}
        self._fwd_cache: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
        self._nls_cache: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
        self._glyph_lp: Dict[Tuple[int, int, int, int, int], float] = {}

    # ---- state packing: (((ctx*6+type)*(L+1)+(lang+1))*C+tmpl)*6+gtype ----

    def state(self, ctx_id: int, stype: int, lang: int, tmpl_char: int, gtype: int) -> int:
        return (
            (((ctx_id * N_TYPES + stype) * (self.n_langs + 1) + (lang + 1)) * self.n_chars
             + tmpl_char) * N_GLYPH_TYPES + gtype
        )

    def unpack(self, s: int) -> Tuple[int, int, int, int, int]:
        gtype = s % N_GLYPH_TYPES
        s //= N_GLYPH_TYPES
        tmpl = s % self.n_chars
        s //= self.n_chars
        lang = s % (self.n_langs + 1) - 1
        s //= self.n_langs + 1
        stype = s % N_TYPES
        ctx = s // N_TYPES
        return ctx, stype, lang, tmpl, gtype

    def _intern(self, ctx: Tuple[int, ...]) -> int:
        idx = self._ctx_ids.get(ctx)
        if idx is None:
            idx = len(self._ctxs)
            self._ctx_ids[ctx] = idx
            self._ctxs.append(ctx)
        return idx

    # ---- vectorized per-state attribute lookups for the DP ----

    def type_of_states(self, states: np.ndarray) -> np.ndarray:
        return ((states // (N_GLYPH_TYPES * self.n_chars * (self.n_langs + 1))) % N_TYPES).astype(
            np.int8
        )

    def glyph_char_of_states(self, states: np.ndarray) -> np.ndarray:
        """Rendered template char; elided glyphs carry spaceCharIndex as
        their template char (GlyphChar construction in the reference)
        so they consume whitespace-like columns."""
        return ((states // N_GLYPH_TYPES) % self.n_chars).astype(np.int32)

    def glyph_type_of_states(self, states: np.ndarray) -> np.ndarray:
        return (states % N_GLYPH_TYPES).astype(np.int8)

    def lang_of_states(self, states: np.ndarray) -> np.ndarray:
        return (
            (states // (N_GLYPH_TYPES * self.n_chars)) % (self.n_langs + 1) - 1
        ).astype(np.int8)

    def lm_char_of_states(self, states: np.ndarray) -> np.ndarray:
        out = np.empty(len(states), dtype=np.int32)
        for i, s in enumerate(states):
            ctx, stype, _lang, _tmpl, _g = self.unpack(int(s))
            out[i] = self._lm_char(self._ctxs[ctx], stype)
        return out

    def end_log_probs(self, states: np.ndarray) -> np.ndarray:
        """endLogProb (:445-450): can't end on DOUBLED or ELISION_TILDE."""
        gtypes = states % N_GLYPH_TYPES
        return np.where((gtypes == DOUBLED) | (gtypes == ELISION_TILDE), NEG_INF, 0.0)

    def _lm_char(self, ctx: Tuple[int, ...], stype: int) -> int:
        """makeLmCharIndex (:608-619)."""
        if len(ctx) == 0 or stype in _ALWAYS_SPACE_TYPES:
            return self.space
        if stype == RMRGN_HPHN_INIT:
            return self.hyphen
        return ctx[-1]

    # ---- LM helpers ----

    def _shrink(self, lang: int, ctx_id: int) -> int:
        key = (lang, ctx_id)
        v = self._shrunk.get(key)
        if v is None:
            slm = self.lm.get(lang)
            ctx = self._ctxs[ctx_id]
            max_order = slm.get_max_order()
            if len(ctx) > max_order - 1:
                ctx = ctx[len(ctx) - (max_order - 1):]
            ctx = slm.shrink_context(ctx)
            v = self._intern(tuple(ctx))
            self._shrunk[key] = v
        return v

    def _probs(self, lang: int, ctx_id: int) -> np.ndarray:
        """P(c | shrink_lang(ctx)) for all c; lang == -1 marginalizes
        over languages with the language priors (getNgramProb :779-793)."""
        key = (lang, ctx_id)
        v = self._prob_vec.get(key)
        if v is None:
            if lang < 0:
                v = np.zeros(self.n_chars)
                for l in range(self.n_langs):
                    v = v + self._probs(l, ctx_id) * self.lm.language_prior(l)
            else:
                slm = self.lm.get(lang)
                sctx = self._ctxs[self._shrink(lang, ctx_id)]
                v = np.array(
                    [slm.get_char_ngram_prob(sctx, c) for c in range(self.n_chars)]
                )
            self._prob_vec[key] = v
        return v

    def _glyph_log_prob(self, next_type: int, next_lang: int, next_lm_char: int,
                        g_tmpl: int, g_type: int) -> float:
        """calculateGlyphLogProb (:798-810)."""
        key = (next_type, next_lang, next_lm_char, g_tmpl, g_type)
        v = self._glyph_lp.get(key)
        if v is None:
            if next_lang < 0:
                v = 0.0 if (next_type in _ALWAYS_SPACE_TYPES and g_tmpl == self.space) else NEG_INF
            else:
                p = (1.0 - self.no_char_sub_prior) * self.gsm.glyph_prob(
                    next_lang, next_lm_char, g_type, g_tmpl
                )
                if g_type == NORMAL_CHAR and g_tmpl == next_lm_char:
                    p = self.no_char_sub_prior + p
                v = math.log(p) if p > 0 else NEG_INF
            self._glyph_lp[key] = v
        return v

    # ---- state emission helpers ----

    def _add(self, out, ctx_id, stype, lang, g_tmpl, g_type, score) -> None:
        if score != NEG_INF:
            out.append((self.state(ctx_id, stype, lang, g_tmpl, g_type), score))

    def _add_no_sub_glyph_states(self, out, cur_gtype, next_lm_char, next_ctx_id,
                                 next_type, next_lang, score) -> None:
        """addNoSubGlyphStates (:97-152)."""
        if not self.allow_glyph_substitution:
            self._add(out, next_ctx_id, next_type, next_lang, next_lm_char, NORMAL_CHAR, score)
            return
        if next_type in (RMRGN_HPHN_INIT, RMRGN_HPHN, LMRGN_HPHN):
            g = self._glyph_log_prob(next_type, next_lang, next_lm_char, next_lm_char, cur_gtype)
            self._add(out, next_ctx_id, next_type, next_lang, next_lm_char, cur_gtype, score + g)
            if next_type == RMRGN_HPHN_INIT:
                g2 = self._glyph_log_prob(next_type, next_lang, next_lm_char, self.space, cur_gtype)
                self._add(out, next_ctx_id, next_type, next_lang, self.space, cur_gtype, score + g2)
        else:
            if cur_gtype != ELISION_TILDE:
                g = self._glyph_log_prob(next_type, next_lang, next_lm_char, next_lm_char, NORMAL_CHAR)
                self._add(out, next_ctx_id, next_type, next_lang, next_lm_char, NORMAL_CHAR, score + g)

    def _potential_glyphs(self, cur_gtype: int, cur_lm_char: int, cur_type: int,
                          next_lm_char: int, next_type: int, next_lang: int):
        """The glyph-proposal cases of addGlyphStates (:162-252)."""
        glyphs = set()
        if cur_gtype == DOUBLED:
            raise RuntimeError("DOUBLED must be handled by the duplication branch")
        if cur_gtype == ELISION_TILDE:
            if next_lm_char in self.can_be_elided:
                glyphs.add((self.space, TILDE_ELIDED))
            return glyphs
        glyphs.add((next_lm_char, NORMAL_CHAR))
        if next_lm_char in self.can_be_replaced:
            for g in self.active_chars[next_lang]:
                if g in self.valid_substitution_chars:
                    glyphs.add((g, NORMAL_CHAR))
        if next_lm_char == self.s_char and self.longs_char >= 0:
            glyphs.add((self.longs_char, NORMAL_CHAR))
        tilde_dec = self.add_tilde.get(next_lm_char)
        if tilde_dec is not None:
            glyphs.add((tilde_dec, ELISION_TILDE))
        if cur_gtype == TILDE_ELIDED and next_lm_char in self.can_be_elided:
            glyphs.add((self.space, TILDE_ELIDED))
        base = self.diacritic_disregard_map.get(next_lm_char)
        if base is not None:
            glyphs.add((base, NORMAL_CHAR))
        if not self.elide_anything:
            if (
                cur_gtype != FIRST_ELIDED
                and cur_lm_char == self.space
                and cur_type not in (LMRGN_HPHN, RMRGN_HPHN_INIT, RMRGN_HPHN)
                and next_type == TMPL
                and next_lm_char in self.can_be_elided
            ):
                glyphs.add((self.space, FIRST_ELIDED))
        if next_lm_char in self.valid_doublable:
            glyphs.add((next_lm_char, DOUBLED))
            if next_lm_char == self.s_char and self.longs_char >= 0:
                glyphs.add((self.longs_char, DOUBLED))
        if self.elide_anything and next_type == TMPL and next_lm_char in self.can_be_elided:
            glyphs.add((self.space, ELIDED))
        return glyphs

    def _add_glyph_states(self, out, cur_gtype, cur_lm_char, cur_type,
                          next_lm_char, next_ctx_id, next_type, next_lang, score) -> None:
        if not self.allow_glyph_substitution:
            self._add(out, next_ctx_id, next_type, next_lang, next_lm_char, NORMAL_CHAR, score)
            return
        for g_tmpl, g_type in sorted(
            self._potential_glyphs(cur_gtype, cur_lm_char, cur_type, next_lm_char, next_type, next_lang)
        ):
            g = self._glyph_log_prob(next_type, next_lang, next_lm_char, g_tmpl, g_type)
            self._add(out, next_ctx_id, next_type, next_lang, g_tmpl, g_type, score + g)

    def _add_doubled_continuation(self, out, ctx_id, lang, lm_char, prev_score) -> None:
        """The forced second half of a doubled glyph (:262-283 etc.):
        same context/lang/lmChar, Doubled => Normal; doubled 's' may
        render short or long s."""
        if lm_char == self.s_char and self.longs_char >= 0:
            for g_tmpl in (self.s_char, self.longs_char):
                g = self._glyph_log_prob(TMPL, lang, lm_char, g_tmpl, NORMAL_CHAR)
                self._add(out, ctx_id, TMPL, lang, g_tmpl, NORMAL_CHAR, prev_score + g)
        else:
            g = self._glyph_log_prob(TMPL, lang, lm_char, lm_char, NORMAL_CHAR)
            self._add(out, ctx_id, TMPL, lang, lm_char, NORMAL_CHAR, prev_score + g)

    def _add_transitions_to_tmpl(self, out, s_fields, ctx_id, prev_score=0.0,
                                 clear_context=False) -> None:
        """addTransitionsToTmpl (:256-363)."""
        _ctx0, cur_type, lang, _tmpl, cur_gtype = s_fields
        ctx = self._ctxs[ctx_id]
        cur_lm_char = self._lm_char(self._ctxs[_ctx0], cur_type)
        if cur_gtype == DOUBLED:
            self._add_doubled_continuation(out, ctx_id, lang, cur_lm_char, prev_score)
            return
        if lang < 0:
            for dest in range(self.n_langs):
                probs = self._probs(dest, ctx_id)
                p_dest = self.lm.language_prior(dest)
                shrunk = self._shrink(dest, ctx_id)
                for c in self.active_chars[dest]:
                    if c == self.space:
                        continue
                    p = probs[c]
                    if p <= 0 or p_dest <= 0:
                        continue
                    score = LOG_NOT_MRGN + prev_score + math.log(p) + math.log(p_dest)
                    next_ctx = (
                        self._intern(self._ctxs[shrunk] + (c,)) if not clear_context
                        else self._intern((c,))
                    )
                    self._add_glyph_states(out, cur_gtype, cur_lm_char, cur_type,
                                           c, next_ctx, TMPL, dest, score)
        else:
            switch_allowed = cur_lm_char == self.space
            if switch_allowed:
                for dest in range(self.n_langs):
                    probs = self._probs(dest, ctx_id)
                    shrunk = self._shrink(dest, ctx_id)
                    for c in self.active_chars[dest]:
                        if c in self.punct_set:
                            if self.allow_language_switch_on_punct:
                                p_dest = self.lm.language_transition_prob(lang, dest)
                            elif lang == dest:
                                p_dest = 1.0
                            else:
                                continue
                            p = probs[c]
                            if p <= 0 or p_dest <= 0:
                                continue
                            score = LOG_NOT_MRGN + prev_score + math.log(p) + math.log(p_dest)
                            next_ctx = (
                                self._intern(self._ctxs[shrunk] + (c,)) if not clear_context
                                else self._intern((c,))
                            )
                            self._add_no_sub_glyph_states(out, cur_gtype, c, next_ctx, TMPL, dest, score)
                        elif c != self.space:
                            p_dest = self.lm.language_transition_prob(lang, dest)
                            p = probs[c]
                            if p <= 0 or p_dest <= 0:
                                continue
                            score = LOG_NOT_MRGN + prev_score + math.log(p) + math.log(p_dest)
                            next_ctx = (
                                self._intern(self._ctxs[shrunk] + (c,)) if not clear_context
                                else self._intern((c,))
                            )
                            self._add_glyph_states(out, cur_gtype, cur_lm_char, cur_type,
                                                   c, next_ctx, TMPL, dest, score)
            else:
                dest = lang
                probs = self._probs(dest, ctx_id)
                shrunk = self._shrink(dest, ctx_id)
                for c in self.active_chars[dest]:
                    if c == self.space:
                        continue
                    p = probs[c]
                    if p <= 0:
                        continue
                    score = LOG_NOT_MRGN + prev_score + math.log(p)
                    next_ctx = (
                        self._intern(self._ctxs[shrunk] + (c,)) if not clear_context
                        else self._intern((c,))
                    )
                    self._add_glyph_states(out, cur_gtype, cur_lm_char, cur_type,
                                           c, next_ctx, TMPL, dest, score)
        # space transition (never switches language, :339-361)
        p_space = self._probs(lang, ctx_id)[self.space]
        if p_space > 0:
            score = LOG_NOT_MRGN + prev_score + math.log(p_space)
            if lang >= 0:
                shrunk = self._shrink(lang, ctx_id)
                next_ctx = (
                    self._intern(self._ctxs[shrunk] + (self.space,)) if not clear_context
                    else self._intern((self.space,))
                )
            else:
                next_ctx = (
                    self._intern(ctx + (self.space,)) if not clear_context
                    else self._intern((self.space,))
                )
            self._add_no_sub_glyph_states(out, cur_gtype, self.space, next_ctx, TMPL, lang, score)

    # ---- the SparseTransitionModel interface ----

    def start_states(self) -> Tuple[np.ndarray, np.ndarray]:
        """startStates (:738-777)."""
        out: List[Tuple[int, float]] = []
        self._add_no_sub_glyph_start(out, self.empty_ctx, LMRGN, -1, LOG_MRGN)
        for dest in range(self.n_langs):
            probs = self._probs(dest, self.empty_ctx)
            prior = self.lm.language_prior(dest)
            for c in self.active_chars[dest]:
                if c == self.space:
                    continue
                p = probs[c]
                if p <= 0 or prior <= 0:
                    continue
                score = LOG_NOT_MRGN + math.log(p) + math.log(prior)
                self._add_glyph_start_states(out, c, self._intern((c,)), TMPL, dest, score)
        total_space = sum(
            self._probs(l, self.empty_ctx)[self.space] * self.lm.language_prior(l)
            for l in range(self.n_langs)
        )
        if total_space > 0:
            score = LOG_NOT_MRGN + math.log(total_space)
            self._add_no_sub_glyph_start(
                out, self._intern((self.space,)), TMPL, -1, score
            )
        return self._pack(out)

    def _add_no_sub_glyph_start(self, out, ctx_id, stype, lang, score) -> None:
        if not self.allow_glyph_substitution:
            self._add(out, ctx_id, stype, lang, self.space, NORMAL_CHAR, score)
        else:
            g = self._glyph_log_prob(stype, lang, self.space, self.space, NORMAL_CHAR)
            self._add(out, ctx_id, stype, lang, self.space, NORMAL_CHAR, score + g)

    def _add_glyph_start_states(self, out, lm_char, ctx_id, stype, lang, score) -> None:
        """addGlyphStartStates (:669-732): like addGlyphStates but the
        "previous" state is an implicit space with NORMAL glyph."""
        if not self.allow_glyph_substitution:
            self._add(out, ctx_id, stype, lang, lm_char, NORMAL_CHAR, score)
            return
        glyphs = set()
        glyphs.add((lm_char, NORMAL_CHAR))
        if lm_char in self.can_be_replaced:
            for g in self.active_chars[lang]:
                if g in self.valid_substitution_chars:
                    glyphs.add((g, NORMAL_CHAR))
        if lm_char == self.s_char and self.longs_char >= 0:
            glyphs.add((self.longs_char, NORMAL_CHAR))
        tilde_dec = self.add_tilde.get(lm_char)
        if tilde_dec is not None:
            glyphs.add((tilde_dec, ELISION_TILDE))
        base = self.diacritic_disregard_map.get(lm_char)
        if base is not None:
            glyphs.add((base, NORMAL_CHAR))
        if not self.elide_anything and stype == TMPL and lm_char in self.can_be_elided:
            glyphs.add((self.space, FIRST_ELIDED))
        if lm_char in self.valid_doublable:
            glyphs.add((lm_char, DOUBLED))
            if lm_char == self.s_char and self.longs_char >= 0:
                glyphs.add((self.longs_char, DOUBLED))
        if self.elide_anything and stype == TMPL and lm_char in self.can_be_elided:
            glyphs.add((self.space, ELIDED))
        for g_tmpl, g_type in sorted(glyphs):
            g = self._glyph_log_prob(stype, lang, lm_char, g_tmpl, g_type)
            self._add(out, ctx_id, stype, lang, g_tmpl, g_type, score + g)

    def forward_transitions(self, s: int) -> Tuple[np.ndarray, np.ndarray]:
        cached = self._fwd_cache.get(s)
        if cached is not None:
            return cached
        fields = self.unpack(s)
        ctx_id, stype, lang, _tmpl, gtype = fields
        out: List[Tuple[int, float]] = []
        if stype == LMRGN:
            self._add_no_sub_glyph_states(out, gtype, self.space, ctx_id, LMRGN, lang, LOG_MRGN)
            self._add_transitions_to_tmpl(out, fields, ctx_id)
        elif stype == LMRGN_HPHN:
            self._add_no_sub_glyph_states(out, gtype, self.space, ctx_id, LMRGN_HPHN, lang, LOG_MRGN)
            if lang >= 0:
                self._hyphen_continuations(out, fields, ctx_id)
        elif stype == RMRGN:
            self._add_no_sub_glyph_states(out, gtype, self.space, ctx_id, RMRGN, lang, LOG_MRGN)
        elif stype == RMRGN_HPHN:
            self._add_no_sub_glyph_states(out, gtype, self.space, ctx_id, RMRGN_HPHN, lang, LOG_MRGN)
        elif stype == RMRGN_HPHN_INIT:
            self._add_no_sub_glyph_states(out, gtype, self.space, ctx_id, RMRGN_HPHN, lang, LOG_MRGN)
        elif stype == TMPL:
            p_space = self._probs(lang, ctx_id)[self.space]
            if p_space > 0:
                score = LOG_MRGN + math.log(1.0 - LINE_END_HYPHEN_PROB) + math.log(p_space)
                if lang >= 0:
                    next_ctx = self._intern(
                        self._ctxs[self._shrink(lang, ctx_id)] + (self.space,)
                    )
                else:
                    next_ctx = self._intern(self._ctxs[ctx_id] + (self.space,))
                self._add_no_sub_glyph_states(out, gtype, self.space, next_ctx, RMRGN, lang, score)
            score = LOG_MRGN + math.log(LINE_END_HYPHEN_PROB)
            # lmChar of the RMRGN_HPHN_INIT target per makeLmCharIndex:
            # hyphen unless the context is empty (then space)
            init_lm_char = self._lm_char(self._ctxs[ctx_id], RMRGN_HPHN_INIT)
            self._add_no_sub_glyph_states(out, gtype, init_lm_char, ctx_id, RMRGN_HPHN_INIT, lang, score)
            self._add_transitions_to_tmpl(out, fields, ctx_id)
        result = self._pack(out)
        self._fwd_cache[s] = result
        return result

    def _hyphen_continuations(self, out, fields, ctx_id) -> None:
        """LMRGN_HPHN / RMRGN_HPHN* -> TMPL continuations (:475-508 /
        :398-430): no space/punct after a line-break hyphen."""
        _c, cur_type, lang, _t, gtype = fields
        cur_lm_char = self._lm_char(self._ctxs[_c], cur_type)
        if gtype == DOUBLED:
            self._add_doubled_continuation(out, ctx_id, lang, cur_lm_char, 0.0)
            return
        probs = self._probs(lang, ctx_id)
        shrunk = self._shrink(lang, ctx_id)
        for c in self.active_chars[lang]:
            if c == self.space or c in self.punct_set:
                continue
            p = probs[c]
            if p <= 0:
                continue
            score = LOG_NOT_MRGN + math.log(p)
            next_ctx = self._intern(self._ctxs[shrunk] + (c,))
            self._add_glyph_states(out, gtype, cur_lm_char, cur_type, c, next_ctx, TMPL, lang, score)

    def next_line_start_states(self, s: int) -> Tuple[np.ndarray, np.ndarray]:
        cached = self._nls_cache.get(s)
        if cached is not None:
            return cached
        fields = self.unpack(s)
        ctx_id, stype, lang, _tmpl, gtype = fields
        out: List[Tuple[int, float]] = []
        if stype == TMPL:
            p_space = self._probs(lang, ctx_id)[self.space]
            if p_space > 0:
                sws = math.log(p_space)
                if lang >= 0:
                    ctx_with_space = self._intern(
                        self._ctxs[self._shrink(lang, ctx_id)] + (self.space,)
                    )
                else:
                    ctx_with_space = self._intern(self._ctxs[ctx_id] + (self.space,))
                self._add_no_sub_glyph_states(
                    out, gtype, self.space, ctx_with_space, LMRGN, lang, LOG_MRGN + sws
                )
                self._add_transitions_to_tmpl(out, fields, ctx_with_space, sws, False)
        elif stype == RMRGN:
            self._add_no_sub_glyph_states(out, gtype, self.space, ctx_id, LMRGN, lang, LOG_MRGN)
            self._add_transitions_to_tmpl(out, fields, ctx_id)
        elif stype in (RMRGN_HPHN, RMRGN_HPHN_INIT):
            self._add_no_sub_glyph_states(out, gtype, self.space, ctx_id, LMRGN_HPHN, lang, LOG_MRGN)
            if lang >= 0:
                self._hyphen_continuations(out, fields, ctx_id)
        elif stype in (LMRGN, LMRGN_HPHN):
            self._add_no_sub_glyph_states(out, gtype, self.space, self.empty_ctx, LMRGN, lang, LOG_MRGN)
            self._add_transitions_to_tmpl(out, fields, ctx_id, 0.0, True)
        result = self._pack(out)
        self._nls_cache[s] = result
        return result

    @staticmethod
    def _pack(out: List[Tuple[int, float]]) -> Tuple[np.ndarray, np.ndarray]:
        if not out:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
        # dedup identical states keeping max score (HashSet in the
        # reference dedups glyph proposals before scoring; transition
        # targets themselves may repeat across branches)
        states = np.array([o[0] for o in out], dtype=np.int64)
        logps = np.array([o[1] for o in out], dtype=np.float64)
        order = np.lexsort((-logps, states))
        so = states[order]
        first = np.ones(len(so), dtype=bool)
        first[1:] = so[1:] != so[:-1]
        sel = order[first]
        return states[sel], logps[sel]
