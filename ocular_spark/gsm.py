"""Glyph substitution model.

Re-expresses ``gsm/BasicGlyphSubstitutionModel.java`` (tberg12/ocular):
dense ``probs[language][lmChar][glyph]`` with glyph space = chars + 5
special glyph types; smoothing-count matrix driven by the charset
class sets (Charset.java:235-329); counts accumulated over Viterbi
TMPL states (+ elided line-break hyphens at RMRGN_HPHN_INIT) and
row-normalized (:234-283).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Set

import numpy as np

from ocular_spark import charset as cs
from ocular_spark.charset import CharIndexer

# GlyphType ordinals (gsm/GlyphChar.java:59-66)
ELISION_TILDE, TILDE_ELIDED, FIRST_ELIDED, DOUBLED, ELIDED, NORMAL_CHAR = range(6)
N_SPECIAL_GLYPHS = 5  # GlyphType.values().length - 1 (NORMAL_CHAR is not special)


class BasicGlyphSubstitutionModel:
    def __init__(
        self,
        probs: np.ndarray,  # (L, C, C + 5)
        gsm_power: float,
        lang_names: Sequence[str],
        char_indexer: CharIndexer,
    ) -> None:
        self.probs = probs
        self.gsm_power = gsm_power
        self.lang_names = list(lang_names)
        self.char_indexer = char_indexer
        self.num_chars = char_indexer.size()

    def glyph_prob(self, language: int, lm_char: int, glyph_type: int, template_char: int) -> float:
        glyph = template_char if glyph_type == NORMAL_CHAR else self.num_chars + glyph_type
        return float(self.probs[language, lm_char, glyph]) ** self.gsm_power


class NoSubGlyphSubstitutionModel:
    """gsm/NoSubGlyphSubstitutionModel.java: identity rendering only."""

    def __init__(self, char_indexer: CharIndexer) -> None:
        self.char_indexer = char_indexer

    def glyph_prob(self, language: int, lm_char: int, glyph_type: int, template_char: int) -> float:
        return 1.0 if (glyph_type == NORMAL_CHAR and template_char == lm_char) else 0.0


class BasicGlyphSubstitutionModelFactory:
    """gsm/BasicGlyphSubstitutionModel.BasicGlyphSubstitutionModelFactory."""

    def __init__(
        self,
        gsm_smoothing_count: float,
        elision_smoothing_count_multiplier: float,
        lang_names: Sequence[str],
        char_indexer: CharIndexer,
        active_character_sets: Sequence[Set[int]],
        gsm_power: float = 4.0,
        min_counts_for_eval_gsm: int = 0,
    ) -> None:
        self.gsm_smoothing_count = gsm_smoothing_count
        self.elision_smoothing_count_multiplier = elision_smoothing_count_multiplier
        self.lang_names = list(lang_names)
        self.char_indexer = char_indexer
        self.active_character_sets = [set(s) for s in active_character_sets]
        self.gsm_power = gsm_power
        self.min_counts_for_eval_gsm = min_counts_for_eval_gsm

        ci = char_indexer
        self.can_be_replaced = cs.make_can_be_replaced_set(ci)
        self.can_be_doubled = cs.make_valid_doublable_set(ci)
        self.valid_substitution_chars = cs.make_valid_substitution_chars_set(ci)
        self.can_be_elided = cs.make_can_be_elided_set(ci)
        self.add_tilde = cs.make_add_tilde_map(ci)
        self.diacritic_disregard_map = cs.make_diacritic_disregard_map(ci)

        self.s_char = ci.get_index("s") if ci.contains("s") else -1
        self.longs_char = ci.get_index(cs.LONG_S)
        self.f_char = ci.get_index("f") if ci.contains("f") else -1
        self.l_char = ci.get_index("l") if ci.contains("l") else -1
        self.hyphen_char = ci.get_index(cs.HYPHEN)
        self.space_char = ci.get_index(cs.SPACE)

        self.num_languages = len(self.lang_names)
        self.num_chars = ci.size()
        self.num_glyphs = self.num_chars + N_SPECIAL_GLYPHS
        self.GLYPH_ELISION_TILDE = self.num_chars + ELISION_TILDE
        self.GLYPH_TILDE_ELIDED = self.num_chars + TILDE_ELIDED
        self.GLYPH_FIRST_ELIDED = self.num_chars + FIRST_ELIDED
        self.GLYPH_DOUBLED = self.num_chars + DOUBLED
        self.GLYPH_ELIDED = self.num_chars + ELIDED

    def get_smoothing_value(self, language: int, lm_char: int, glyph: int) -> float:
        """:167-229 — the unit-tested smoothing matrix."""
        if not (lm_char in self.active_character_sets[language] or lm_char == self.hyphen_char):
            return 0.0
        sc = self.gsm_smoothing_count
        mult = self.elision_smoothing_count_multiplier
        if glyph == self.GLYPH_ELISION_TILDE:
            return sc * mult if self.add_tilde.get(lm_char) is not None else 0.0
        if glyph == self.GLYPH_TILDE_ELIDED:
            return sc * mult if lm_char in self.can_be_elided else 0.0
        if glyph == self.GLYPH_FIRST_ELIDED:
            return sc * mult if lm_char in self.can_be_elided else 0.0
        if glyph == self.GLYPH_DOUBLED:
            return sc if lm_char in self.can_be_doubled else 0.0
        if glyph == self.GLYPH_ELIDED:
            return sc if lm_char in self.can_be_elided else 0.0
        # normal-character glyph
        base_char = self.diacritic_disregard_map.get(lm_char)
        if base_char is not None and base_char == glyph:
            return sc * mult
        if lm_char == self.s_char and glyph == self.longs_char:
            return sc
        if lm_char == self.s_char and glyph in (self.f_char, self.l_char):
            return 0.0
        if lm_char == self.hyphen_char and glyph == self.space_char:
            return sc  # line-break hyphens may be elided
        if (
            lm_char in self.can_be_replaced
            and glyph in self.valid_substitution_chars
            and glyph in self.active_character_sets[language]
        ):
            return sc
        if lm_char == glyph:
            return sc
        return 0.0

    def initialize_new_counts_matrix(self) -> np.ndarray:
        counts = np.zeros((self.num_languages, self.num_chars, self.num_glyphs))
        for lang in range(self.num_languages):
            for lm_char in range(self.num_chars):
                for glyph in range(self.num_glyphs):
                    counts[lang, lm_char, glyph] = self.get_smoothing_value(
                        lang, lm_char, glyph
                    )
        return counts

    def increment_counts(
        self,
        counts: np.ndarray,
        seq: Sequence[tuple],
    ) -> None:
        """:234-257 over a full Viterbi state sequence given as tuples
        (state_type, language, lm_char, glyph_type, template_char);
        state types follow decoder.py's TMPL..RMRGN_HPHN encoding."""
        from ocular_spark.decoder import RMRGN_HPHN_INIT, TMPL

        for stype, language, lm_char, glyph_type, template_char in seq:
            if language < 0:
                continue
            if stype == TMPL:
                glyph = (
                    template_char
                    if glyph_type == NORMAL_CHAR
                    else self.num_chars + glyph_type
                )
                counts[language, lm_char, glyph] += 1
            elif stype == RMRGN_HPHN_INIT:
                if template_char == self.space_char:  # elided line-break hyphen
                    glyph = (
                        template_char
                        if glyph_type == NORMAL_CHAR
                        else self.num_chars + glyph_type
                    )
                    counts[language, self.hyphen_char, glyph] += 1

    def make(self, counts: np.ndarray) -> BasicGlyphSubstitutionModel:
        """:263-283 — row-normalize, zeroing sub-epsilon cells."""
        sums = counts.sum(axis=2, keepdims=True)
        with np.errstate(invalid="ignore", divide="ignore"):
            probs = np.where(counts > 1e-9, counts / sums, 0.0)
        return BasicGlyphSubstitutionModel(
            probs, self.gsm_power, self.lang_names, self.char_indexer
        )

    def uniform(self) -> BasicGlyphSubstitutionModel:
        return self.make(self.initialize_new_counts_matrix())
