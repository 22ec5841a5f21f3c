"""Character n-gram language models.

Re-expresses the reference's LM stack (tberg12/ocular):
  * ``lm/CorpusCounter.java``      — multi-order n-gram counting with the
    type-count cascade (first occurrence of an order-k gram increments
    continuation/type counts at lower orders),
  * ``lm/NgramCounts.java``        — MLE / absolute-discounting / Kneser-Ney
    probability computation (DISCOUNT=0.75, UNK_LOG_PROB=-10),
  * ``lm/NgramLanguageModel.java`` — context shrinking + lmPower,
  * ``lm/InterpolatingSingleLanguageModel.java``,
  * ``lm/BasicCodeSwitchLanguageModel.java`` — language mixture + switch priors,
  * ``eval/LmPerplexity.java``     — per-char perplexity metric.

Two counting paths produce identical tables:
  * :class:`CorpusCounter` — sequential, mirrors the reference loop
    (driver-side small corpora, tests);
  * :func:`derive_count_db` — derives every type count from final
    token-count tables alone (continuation counts), which is the
    **distributive** formulation used by the Spark counting job: map
    partitions emit (order, ngram) -> partial token counts, a single
    shuffle sums them, and the cascade is recovered exactly on the
    driver.  Equality of the two paths is asserted in tests.

The decode hot path never calls ``get_char_ngram_prob`` per char: the
transition model precomputes ``P(c|ctx)**lmPower`` vectors per stored
context once per broadcast (see transition.py), matching what the
reference's DenseBigramTransitionModel does for bigrams.
"""

from __future__ import annotations

import math
from collections import defaultdict
from typing import Dict, Iterable, List, Optional, Sequence, Set, Tuple

import numpy as np

from ocular_spark.charset import SPACE, CharIndexer
from ocular_spark.textread import TextReader

Ngram = Tuple[int, ...]

# CountType indices (lm/CountType.java)
TOKEN = 0
HISTORY_TYPE = 1
LOWER_ORDER_TYPE = 2
LOWER_ORDER_TYPE_NORMALIZER = 3

UNK_LOG_PROB = -10.0  # lm/NgramCounts.java:166
DISCOUNT = 0.75  # lm/NgramCounts.java:167

MLE = "MLE"
ABS_DISC = "ABS_DISC"
KNESER_NEY = "KNESER_NEY"


class CountDb:
    """Counts for one n-gram order (lm/CountDbBig.java, dict-backed).

    ``num_count_types`` mirrors the reference sizing: 4 for low orders,
    3 at maxOrder-1 (no LOWER_ORDER_TYPE_NORMALIZER), 1 at maxOrder
    (TOKEN only) — CorpusCounter.java:52-56.
    """

    __slots__ = ("counts", "num_count_types", "num_tokens", "num_bigram_types")

    def __init__(self, num_count_types: int) -> None:
        self.counts: Dict[Ngram, List[int]] = {}
        self.num_count_types = num_count_types
        self.num_tokens = 0  # trainNumTokens
        self.num_bigram_types = 0

    def get(self, ngram: Ngram, count_type: int) -> int:
        row = self.counts.get(ngram)
        return 0 if row is None else row[count_type]

    def increment(self, ngram: Ngram, count_type: int) -> int:
        row = self.counts.get(ngram)
        if row is None:
            row = [0] * self.num_count_types
            self.counts[ngram] = row
        old = row[count_type]
        row[count_type] += 1
        if count_type == TOKEN:
            self.num_tokens += 1
        return old

    def keys_with_history_type(self) -> Iterable[Ngram]:
        for k, row in self.counts.items():
            if self.num_count_types > HISTORY_TYPE and row[HISTORY_TYPE] > 0:
                yield k


def _make_dbs(max_order: int) -> List[CountDb]:
    dbs = [CountDb(4) for _ in range(max(0, max_order - 2))]
    if max_order >= 2:
        dbs.append(CountDb(3))
    dbs.append(CountDb(1))
    return dbs


class CorpusCounter:
    """Sequential port of lm/CorpusCounter.java:98-203."""

    def __init__(self, max_ngram_order: int) -> None:
        if max_ngram_order < 2:
            raise ValueError("maxNgramOrder must be >= 2")
        self.max_order = max_ngram_order
        self.counts = _make_dbs(max_ngram_order)
        self.token_count = 0
        self.active_characters: Set[int] = set()
        self.unigram_counts: Dict[int, int] = defaultdict(int)

    def count_line_chars(
        self, chars: Sequence[str], char_indexer: CharIndexer, line_number: int = 0
    ) -> None:
        indexed: List[int] = []
        for c in chars:
            if c == "\\":
                c = "\\\\"
            if char_indexer.locked() and not char_indexer.contains(c):
                indexed.append(-1)
            else:
                indexed.append(char_indexer.get_index(c))
        self.count_line(indexed, line_number)

    def count_line(self, line: Sequence[int], line_idx: int = 0) -> None:
        n = self.max_order
        window = [-1] * n
        for ch in line:
            window.pop(0)
            window.append(ch)
            if ch != -1:
                # order = length of -1-free suffix (CorpusCounter.java:141-144)
                first_m1 = -1
                for i in range(n - 1, -1, -1):
                    if window[i] == -1:
                        first_m1 = i
                        break
                self._increment_counts(tuple(window), n - (first_m1 + 1))
                self.active_characters.add(ch)
                self.unigram_counts[ch] += 1
            self.token_count += 1

    def _increment_counts(self, window: Ngram, order: int) -> None:
        # CorpusCounter.java:177-203
        if order < 1:
            raise ValueError("order < 1")
        for o in range(order, 0, -1):
            ngram = window[len(window) - o :]
            old = self.counts[o - 1].increment(ngram, TOKEN)
            if old == 0 and o > 1:
                lower = ngram[1:]
                history = ngram[:-1]
                self.counts[o - 2].increment(lower, LOWER_ORDER_TYPE)
                self.counts[o - 2].increment(history, HISTORY_TYPE)
                if o > 2:
                    self.counts[o - 3].increment(history[1:], LOWER_ORDER_TYPE_NORMALIZER)
                else:
                    self.counts[0].num_bigram_types += 1


def token_tables_from_lines(
    lines: Iterable[Sequence[int]], max_order: int
) -> List[Dict[Ngram, int]]:
    """Per-order token counts only — the map-side partial aggregate.

    Emits exactly the TOKEN increments of CorpusCounter.count_line:
    for each non(-1) position, every -1-free suffix up to max_order.
    Partition partials merge by plain summation (a Spark ``groupBy(
    order, ngram).sum()``); the cascade is recovered in
    :func:`derive_count_db`.
    """
    tables: List[Dict[Ngram, int]] = [defaultdict(int) for _ in range(max_order)]
    for line in lines:
        window = [-1] * max_order
        for ch in line:
            window.pop(0)
            window.append(ch)
            if ch != -1:
                order = 0
                for i in range(max_order - 1, -1, -1):
                    if window[i] == -1:
                        break
                    order += 1
                for o in range(1, order + 1):
                    tables[o - 1][tuple(window[max_order - o :])] += 1
    return [dict(t) for t in tables]


def merge_token_tables(
    a: List[Dict[Ngram, int]], b: List[Dict[Ngram, int]]
) -> List[Dict[Ngram, int]]:
    out: List[Dict[Ngram, int]] = []
    for ta, tb in zip(a, b):
        m = dict(ta)
        for k, v in tb.items():
            m[k] = m.get(k, 0) + v
        out.append(m)
    return out


def derive_count_db(token_tables: List[Dict[Ngram, int]]) -> List[CountDb]:
    """Recover the full CountDb array from final token tables.

    The reference's "first occurrence" cascade increments are, summed
    to completion, plain distinct-extension counts:
      LOWER_ORDER_TYPE[w @ order k]        = |{g : order k+1, tok(g)>0, g[1:]  == w}|
      HISTORY_TYPE[h @ order k]            = |{g : order k+1, tok(g)>0, g[:-1] == h}|
      LOWER_ORDER_TYPE_NORMALIZER[m @ k]   = |{g : order k+3 grams… }| grouped by g[1:-1]
      numBigramTypes                       = |{g : order 2, tok(g)>0}|
    which makes the whole pipeline a single shuffle over (order, ngram).
    """
    max_order = len(token_tables)
    dbs = _make_dbs(max_order)
    for o_idx, table in enumerate(token_tables):
        db = dbs[o_idx]
        for ngram, tok in table.items():
            row = db.counts.get(ngram)
            if row is None:
                row = [0] * db.num_count_types
                db.counts[ngram] = row
            row[TOKEN] += tok
            db.num_tokens += tok
    for o_idx in range(1, max_order):  # grams of order o_idx+1 cascade down
        table = token_tables[o_idx]
        lower_db = dbs[o_idx - 1]
        for ngram in table:
            for key, ct in ((ngram[1:], LOWER_ORDER_TYPE), (ngram[:-1], HISTORY_TYPE)):
                row = lower_db.counts.get(key)
                if row is None:
                    row = [0] * lower_db.num_count_types
                    lower_db.counts[key] = row
                row[ct] += 1
            if o_idx + 1 > 2:
                norm_db = dbs[o_idx - 2]
                key = ngram[1:-1]
                row = norm_db.counts.get(key)
                if row is None:
                    row = [0] * norm_db.num_count_types
                    norm_db.counts[key] = row
                row[LOWER_ORDER_TYPE_NORMALIZER] += 1
            else:
                dbs[0].num_bigram_types += 1
    return dbs


class NgramCounts:
    """lm/NgramCounts.java — per-query count extraction + smoothing."""

    def __init__(self, ngram: Ngram, counts: List[CountDb]) -> None:
        self.ngram = ngram
        order = len(ngram)
        self.order = order
        self.token_counts = [0] * order
        self.token_normalizers = [0] * order
        self.history_type_counts = [0] * order
        n_type = min(order, len(counts) - 1)
        self.type_counts = [0] * n_type
        self.type_normalizers = [0] * n_type
        for i in range(order):
            temp = ngram[order - (i + 1) :]
            hist = temp[:-1]
            self.token_counts[i] = counts[i].get(temp, TOKEN)
            if i > 0:
                self.token_normalizers[i] = counts[i - 1].get(hist, TOKEN)
                self.history_type_counts[i] = counts[i - 1].get(hist, HISTORY_TYPE)
            else:
                self.token_normalizers[i] = counts[i].num_tokens
            if i < n_type:
                self.type_counts[i] = counts[i].get(temp, LOWER_ORDER_TYPE)
                if i > 0:
                    self.type_normalizers[i] = counts[i - 1].get(
                        hist, LOWER_ORDER_TYPE_NORMALIZER
                    )
                else:
                    self.type_normalizers[i] = counts[0].num_bigram_types

    def highest_usable_order(self) -> int:
        for i in range(self.order - 1, -1, -1):
            if self.token_normalizers[i] > 0:
                return i + 1
        raise RuntimeError("getHighestUsableOrder() failed")

    def token_mle_or_epsilon(self, order_index: int) -> float:
        if self.token_counts[order_index] == 0:
            return math.exp(UNK_LOG_PROB)
        return self.token_counts[order_index] / self.token_normalizers[order_index]

    def get_token_mle(self) -> float:
        i = self.highest_usable_order() - 1
        return self.token_counts[i] / self.token_normalizers[i]

    def get_absolute_discounting(self) -> float:
        return self._ad_helper(self.highest_usable_order())

    def _ad_helper(self, order: int) -> float:
        i = order - 1
        if order == 1:
            return self.token_mle_or_epsilon(i)
        alpha = max(0.0, self.token_counts[i] - DISCOUNT) / self.token_normalizers[i]
        bow = self.history_type_counts[i] * DISCOUNT / self.token_normalizers[i]
        return alpha + bow * self._ad_helper(order - 1)

    def get_kneser_ney(self) -> float:
        highest = self.highest_usable_order()
        hi = highest - 1
        if highest == 1:
            return self.token_mle_or_epsilon(hi)
        if highest == self.order:
            alpha = max(0.0, self.token_counts[hi] - DISCOUNT) / self.token_normalizers[hi]
            bow = self.history_type_counts[hi] * DISCOUNT / self.token_normalizers[hi]
            return alpha + bow * self._kn_helper(highest - 1)
        return self._kn_helper(highest)

    def _kn_helper(self, order: int) -> float:
        i = order - 1
        if order == 1:
            if self.type_counts[0] == 0:
                return math.exp(UNK_LOG_PROB)
            return self.type_counts[0] / self.type_normalizers[0]
        alpha = max(0.0, self.type_counts[i] - DISCOUNT) / self.type_normalizers[i]
        bow = self.history_type_counts[i] * DISCOUNT / self.type_normalizers[i]
        return alpha + bow * self._kn_helper(order - 1)


class NgramLanguageModel:
    """lm/NgramLanguageModel.java — SingleLanguageModel over CountDbs."""

    def __init__(
        self,
        char_indexer: CharIndexer,
        counts: List[CountDb],
        active_characters: Set[int],
        lm_type: str = KNESER_NEY,
        lm_power: float = 1.0,
    ) -> None:
        if not counts:
            raise ValueError("maxOrder must be greater than zero")
        if active_characters is None:
            raise ValueError("activeCharacters is null")
        self.char_indexer = char_indexer
        self.counts = counts
        self.max_order = len(counts)
        self.lm_type = lm_type
        self.lm_power = lm_power
        self.active_characters = active_characters
        self.all_contexts: Set[Ngram] = set()
        for i in range(self.max_order - 1):
            for key in counts[i].keys_with_history_type():
                self.all_contexts.add(key)

    def get_max_order(self) -> int:
        return self.max_order

    def get_active_characters(self) -> Set[int]:
        return self.active_characters

    def get_character_indexer(self) -> CharIndexer:
        return self.char_indexer

    def contains_context(self, context: Ngram) -> bool:
        return len(context) == 0 or context in self.all_contexts

    def shrink_context(self, context: Ngram) -> Ngram:
        ctx = tuple(context)
        if len(ctx) > self.max_order - 1:
            ctx = ctx[len(ctx) - (self.max_order - 1) :]
        while not self.contains_context(ctx) and len(ctx) > 0:
            ctx = ctx[1:]
        return ctx

    def get_char_ngram_prob(self, context: Sequence[int], c: int) -> float:
        ngram = tuple(context) + (c,)
        nc = NgramCounts(ngram, self.counts)
        if self.lm_type == MLE:
            prob = nc.get_token_mle()
        elif self.lm_type == ABS_DISC:
            prob = nc.get_absolute_discounting()
        elif self.lm_type == KNESER_NEY:
            prob = nc.get_kneser_ney()
        else:
            raise ValueError("Bad type: " + self.lm_type)
        return prob ** self.lm_power


def build_ngram_lm_from_chars(
    char_lines: Iterable[Sequence[str]],
    max_order: int,
    lm_type: str = KNESER_NEY,
    lm_power: float = 1.0,
    char_indexer: Optional[CharIndexer] = None,
    min_char_count: int = 0,
    extra_indexer_chars: Optional[Sequence[str]] = None,
) -> NgramLanguageModel:
    """NgramLanguageModel.buildFromText (driver-side path) with the
    minCharCount pruning of main/InitializeLanguageModel.java:264-274.

    extra_indexer_chars: auxiliary glyph characters added to the
    indexer but NOT to the active set (InitializeLanguageModel.java
    :287-307 adds LONG_S, ligatures, tilde-decorated variants so the
    glyph-substitution search space can render them)."""
    counter = CorpusCounter(max_order)
    indexer = char_indexer if char_indexer is not None else CharIndexer()
    for i, chars in enumerate(char_lines):
        counter.count_line_chars(chars, indexer, i)
    active = set(counter.active_characters)
    if min_char_count > 0:
        active = {c for c in active if counter.unigram_counts.get(c, 0) >= min_char_count}
    active.add(indexer.get_index(SPACE))
    for c in extra_indexer_chars or ():
        indexer.get_index(c)
    indexer.lock()
    return NgramLanguageModel(indexer, counter.counts, active, lm_type, lm_power)


def add_auxiliary_glyph_chars(indexer: CharIndexer) -> None:
    """InitializeLanguageModel.java:287-307: add alternate glyph
    versions of the characters (long-s, ligatures + expansions,
    elision-tilde-decorated variants, de-diacriticked bases) to the
    indexer WITHOUT activating them for any language — they exist so
    the glyph-substitution search space can render them."""
    from ocular_spark.charset import (
        CHARS_THAT_CAN_BE_DECORATED_WITH_AN_ELISION_TILDE,
        LIGATURES,
        LONG_S,
        add_tilde,
        read_normalize_characters,
        remove_any_diacritic_from_char,
    )

    indexer.get_index(LONG_S)
    for lig, expansion in LIGATURES.items():
        chars = read_normalize_characters(lig)
        if len(chars) > 1:
            raise ValueError("Ligature [%s] has more than one character" % lig)
        indexer.get_index(chars[0])
        for c in read_normalize_characters(expansion):
            indexer.get_index(c)
    for c in list(indexer.get_objects()):
        base = remove_any_diacritic_from_char(c)
        if c in CHARS_THAT_CAN_BE_DECORATED_WITH_AN_ELISION_TILDE:
            indexer.get_index(add_tilde(c))
        if base in CHARS_THAT_CAN_BE_DECORATED_WITH_AN_ELISION_TILDE:
            indexer.get_index(add_tilde(base))
        indexer.get_index(base)


class InterpolatingSingleLanguageModel:
    """lm/InterpolatingSingleLanguageModel.java:24-101."""

    def __init__(self, sub_models_and_weights: Sequence[Tuple[NgramLanguageModel, float]]):
        if not sub_models_and_weights:
            raise ValueError("sub models may not be empty")
        total = sum(w for _, w in sub_models_and_weights)
        self.sub_models = [m for m, _ in sub_models_and_weights]
        self.interp_weights = [w / total for _, w in sub_models_and_weights]
        self.char_indexer = self.sub_models[0].get_character_indexer()
        self.active_characters = self.sub_models[0].get_active_characters()
        self.max_order = max(m.get_max_order() for m in self.sub_models)
        self.lm_power = self.sub_models[0].lm_power

    def get_max_order(self) -> int:
        return self.max_order

    def get_active_characters(self) -> Set[int]:
        return self.active_characters

    def get_character_indexer(self) -> CharIndexer:
        return self.char_indexer

    def contains_context(self, context: Ngram) -> bool:
        return any(m.contains_context(m.shrink_context(context)) for m in self.sub_models)

    def shrink_context(self, context: Ngram) -> Ngram:
        # Keep the longest context any sub-model can use; sub-model
        # probs re-shrink per model (reference lines 247-254).
        ctx = tuple(context)
        if len(ctx) > self.max_order - 1:
            ctx = ctx[len(ctx) - (self.max_order - 1) :]
        return ctx

    def get_char_ngram_prob(self, context: Sequence[int], c: int) -> float:
        total = 0.0
        for m, w in zip(self.sub_models, self.interp_weights):
            shrunk = m.shrink_context(tuple(context))
            total += m.get_char_ngram_prob(shrunk, c) * w
        return total


def make_language_transition_probs(
    language_priors: Sequence[float],
    p_keep_same_language: float,
    lang_names: Optional[Sequence[str]] = None,
) -> List[List[float]]:
    """BasicCodeSwitchLanguageModel.makeLanguageTransitionProbs
    (BasicCodeSwitchLanguageModel.java:97-143).

    Returns Map[destLanguage][fromLanguage] -> P(dest | from)."""
    if len(language_priors) == 0:
        raise ValueError("languagePriors may not be empty")
    if p_keep_same_language <= 0.0 or p_keep_same_language > 1.0:
        raise ValueError(
            "pKeepSameLanguage must be between 0 and 1, was %s" % p_keep_same_language
        )
    n = len(language_priors)
    names = lang_names or [str(i) for i in range(n)]
    if n == 1:
        return [[1.0]]
    p_switch = (1.0 - p_keep_same_language) / (n - 1)
    result: List[List[float]] = []
    for dest in range(n):
        dest_prior = language_priors[dest]
        if dest_prior <= 0.0:
            raise ValueError(
                "prior on %s is not positive (it's %s)" % (names[dest], dest_prior)
            )
        row = []
        for frm in range(n):
            t = p_keep_same_language if frm == dest else p_switch
            row.append(t * dest_prior)
        result.append(row)
    for frm in range(n):
        total = sum(result[dest][frm] for dest in range(n))
        for dest in range(n):
            result[dest][frm] /= total
    return result


class BasicCodeSwitchLanguageModel:
    """lm/BasicCodeSwitchLanguageModel.java:65-166."""

    def __init__(
        self,
        sub_models_and_priors: Sequence[Tuple[NgramLanguageModel, float]],
        char_indexer: CharIndexer,
        lang_names: Sequence[str],
        p_keep_same_language: float,
    ) -> None:
        if not sub_models_and_priors:
            raise ValueError("languageModelsAndPriors may not be empty")
        if p_keep_same_language <= 0.0 or p_keep_same_language > 1.0:
            raise ValueError(
                "pKeepSameLanguage must be between 0 and 1, was %s" % p_keep_same_language
            )
        prior_sum = 0.0
        for i, (_, prior) in enumerate(sub_models_and_priors):
            if prior <= 0.0:
                raise ValueError(
                    "prior on %s is not positive (it's %s)" % (lang_names[i], prior)
                )
            prior_sum += prior
        self.sub_models = [m for m, _ in sub_models_and_priors]
        self.language_priors = [p / prior_sum for _, p in sub_models_and_priors]
        self.language_transition_probs = make_language_transition_probs(
            self.language_priors, p_keep_same_language, lang_names
        )
        self.char_indexer = char_indexer
        self.lang_names = list(lang_names)
        self.p_keep_same_language = p_keep_same_language

    def num_languages(self) -> int:
        return len(self.sub_models)

    def get(self, language: int):
        return None if language == -1 else self.sub_models[language]

    def language_prior(self, language: int) -> float:
        return self.language_priors[language]

    def language_transition_prob(self, from_lang: int, dest_lang: int) -> float:
        return self.language_transition_probs[dest_lang][from_lang]

    def get_character_indexer(self) -> CharIndexer:
        return self.char_indexer

    def get_prob_keep_same_language(self) -> float:
        return self.p_keep_same_language

    def get_char_ngram_prob(self, context: Sequence[int], c: int) -> float:
        # language-marginalized prob (used by DenseBigramTransitionModel)
        total = 0.0
        for lang in range(len(self.sub_models)):
            m = self.sub_models[lang]
            total += (
                m.get_char_ngram_prob(m.shrink_context(tuple(context)), c)
                * self.language_priors[lang]
            )
        return total


class LmPerplexity:
    """eval/LmPerplexity.java:24-82."""

    def __init__(self, lm) -> None:
        self.lm = lm
        self.space_index = lm.get_character_indexer().get_index(SPACE)

    def perplexity(self, char_indices: Sequence[int], lang_indices: Sequence[int]) -> float:
        log_total = 0.0
        n = len(char_indices)
        for i in range(n):
            cur_c = char_indices[i]
            cur_l = self._lang(lang_indices, i)
            lt = self._lang_transition_prob(i, cur_l, char_indices, lang_indices)
            ng = self._ngram_prob(i, cur_c, cur_l, char_indices, lang_indices)
            log_total += math.log(lt) + math.log(ng)
        return math.exp(-log_total / n)

    def _ngram_prob(self, i, cur_c, cur_l, chars, langs) -> float:
        start = i
        max_order = self.lm.get(cur_l).get_max_order()
        while start > 0 and self._lang(langs, start - 1) == cur_l and i - start < max_order - 1:
            start -= 1
        return self.lm.get(cur_l).get_char_ngram_prob(tuple(chars[start:i]), cur_c)

    def _lang_transition_prob(self, i, cur_l, chars, langs) -> float:
        if i > 0:
            prev_c = chars[i - 1]
            prev_l = self._lang(langs, i - 1)
            if prev_c != self.space_index:
                if prev_l != cur_l:
                    raise RuntimeError("Characters cannot change languages mid-word.")
                return 1.0
            return self.lm.language_transition_prob(prev_l, cur_l)
        return self.lm.language_prior(cur_l)

    def _lang(self, langs, i) -> int:
        cur_l = langs[i]
        if cur_l < 0:
            if self.lm.num_languages() == 1:
                cur_l = 0
            elif i > 0:
                raise RuntimeError("curl=%d, i=%d" % (cur_l, i))
        return cur_l


class DensePplTables:
    """Vectorized char-LM scoring tables for corpus perplexity (O20).

    Built ONCE on the driver from the decoder's compiled dense tables
    (decoder.CompiledTransitionModel) and broadcast as plain NumPy
    arrays; the per-document kernel is pure vector ops — no
    per-character Python loop and no Kneser-Ney recursion at scoring
    time (the round-1 kernel walked lm.get_char_ngram_prob per char).

    Semantics match the reference's corpus scoring: the context of
    position i is shrink(last max_order-1 filtered chars) — identical
    to the rolling decoder automaton because n-gram counting makes the
    context set suffix-closed (every suffix of an observed context is
    itself observed).
    """

    def __init__(self, tm) -> None:
        self.log_probs = tm.log_probs  # (n_ctx, C) float64
        self.empty_ctx = int(tm.empty_ctx)
        self.max_order = tm.lm.get_max_order()
        C = tm.n_chars
        self.n_chars = C
        # codepoint -> char index LUT (single-codepoint chars only;
        # anything outside the indexer is dropped, as in the reference)
        objs = tm.char_indexer.get_objects()
        max_cp = max((ord(s) for s in objs if len(s) == 1), default=0)
        lut = np.full(max_cp + 1, -1, dtype=np.int32)
        for i, s in enumerate(objs):
            if len(s) == 1:
                lut[ord(s)] = i
        self.cp_lut = lut
        # per-order sorted context-code tables: code(ctx) = sum ctx[j]*C^(k-1-j)
        self.order_tables: List[Tuple[np.ndarray, np.ndarray]] = []
        by_len: Dict[int, List[Tuple[Tuple[int, ...], int]]] = {}
        for ctx, cid in tm._ctx_ids.items():
            by_len.setdefault(len(ctx), []).append((ctx, cid))
        for k in range(1, self.max_order):
            entries = by_len.get(k, [])
            if not entries:
                self.order_tables.append(
                    (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
                )
                continue
            codes = np.array(
                [sum(c * C ** (k - 1 - j) for j, c in enumerate(ctx)) for ctx, _ in entries],
                dtype=np.int64,
            )
            cids = np.array([cid for _, cid in entries], dtype=np.int64)
            order = np.argsort(codes)
            self.order_tables.append((codes[order], cids[order]))

    def index_text(self, text: str) -> np.ndarray:
        """Filtered char-index array for a text (unknown chars dropped)."""
        cps = np.frombuffer(str(text).encode("utf-32-le"), dtype=np.uint32)
        L = len(self.cp_lut)
        ids = np.where(cps < L, self.cp_lut[np.minimum(cps, max(L - 1, 0))], -1)
        return ids[ids >= 0].astype(np.int64)

    def context_ids(self, ids: np.ndarray) -> np.ndarray:
        """Longest-match context id per position, fully vectorized:
        one strided window-code pass + searchsorted per order."""
        n = len(ids)
        ctx = np.full(n, self.empty_ctx, dtype=np.int64)
        if n == 0:
            return ctx
        resolved = np.zeros(n, dtype=bool)
        C = self.n_chars
        for k in range(self.max_order - 1, 0, -1):
            if n <= k:
                continue
            sorted_codes, cids = self.order_tables[k - 1]
            if len(sorted_codes) == 0:
                continue
            win = np.lib.stride_tricks.sliding_window_view(ids, k)[: n - k]
            powers = C ** np.arange(k - 1, -1, -1, dtype=np.int64)
            codes = win @ powers
            pos = np.searchsorted(sorted_codes, codes)
            pos_c = np.minimum(pos, len(sorted_codes) - 1)
            ok = sorted_codes[pos_c] == codes
            sel = ok & ~resolved[k:]
            ctx[k:][sel] = cids[pos_c[sel]]
            resolved[k:][sel] = True
        return ctx

    def score(self, text: str) -> Tuple[int, float]:
        """(n_indexed_chars, perplexity) of one document."""
        ids = self.index_text(text)
        if len(ids) == 0:
            return 0, float("nan")
        ctx = self.context_ids(ids)
        logp = self.log_probs[ctx, ids]
        finite = np.isfinite(logp)
        n = int(finite.sum())
        if n == 0:
            return len(ids), float("nan")
        return len(ids), float(np.exp(-logp[finite].sum() / n))

    def score_batch(self, texts: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
        """(n_chars, perplexity) arrays for a whole batch of documents
        in ONE vectorized pass: documents are concatenated, context
        windows are masked at document boundaries (a window that spans
        two docs falls back to the shorter within-doc suffix, exactly
        like per-doc scoring), and per-doc log-prob sums come from
        np.add.reduceat — batch cost is ~40 NumPy calls total instead
        of ~40 per document."""
        D = len(texts)
        ids_list = [self.index_text(t) for t in texts]
        lengths = np.array([len(a) for a in ids_list], dtype=np.int64)
        n_chars = lengths.copy()
        ppl = np.full(D, np.nan, dtype=np.float64)
        nonempty = lengths > 0
        if not nonempty.any():
            return n_chars, ppl
        kept = [a for a in ids_list if len(a)]
        ids_all = np.concatenate(kept)
        klens = lengths[nonempty]
        starts = np.zeros(len(kept), dtype=np.int64)
        np.cumsum(klens[:-1], out=starts[1:])
        doc_of = np.repeat(np.arange(len(kept)), klens)
        N = len(ids_all)
        ctx = np.full(N, self.empty_ctx, dtype=np.int64)
        resolved = np.zeros(N, dtype=bool)
        C = self.n_chars
        for k in range(self.max_order - 1, 0, -1):
            if N <= k:
                continue
            sorted_codes, cids = self.order_tables[k - 1]
            if len(sorted_codes) == 0:
                continue
            win = np.lib.stride_tricks.sliding_window_view(ids_all, k)[: N - k]
            powers = C ** np.arange(k - 1, -1, -1, dtype=np.int64)
            codes = win @ powers
            pos = np.searchsorted(sorted_codes, codes)
            pos_c = np.minimum(pos, len(sorted_codes) - 1)
            ok = sorted_codes[pos_c] == codes
            same_doc = doc_of[k:] == doc_of[: N - k]
            sel = ok & same_doc & ~resolved[k:]
            ctx[k:][sel] = cids[pos_c[sel]]
            resolved[k:][sel] = True
        logp = self.log_probs[ctx, ids_all]
        finite = np.isfinite(logp)
        sums = np.add.reduceat(np.where(finite, logp, 0.0), starts)
        counts = np.add.reduceat(finite.astype(np.float64), starts)
        with np.errstate(divide="ignore", invalid="ignore"):
            p = np.exp(-sums / counts)
        p[counts == 0] = np.nan
        ppl[nonempty] = p
        return n_chars, ppl
