"""Transcription evaluation: edit distance, CER/WER.

Re-expresses ``eval/MarkovEditDistanceComputer.java`` (standard
Levenshtein with optional zero-cost f->s confusion, :94-152),
``eval/Form.java`` (char- or word-glyph sequences, diacritics
optionally scored separately), and ``eval/Evaluator.java`` (the 8
CER/WER metric variants + incremental weighted macro-average
:22-55).  NumPy DP (row-sweep) instead of the reference's
object-chart; identical costs.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from ocular_spark.charset import (
    is_punctuation_char,
    normalize_char_separate_diacritics,
    read_normalize_characters,
)

EQUAL, SUBST, INSERT, DELETE = range(4)


def chars_as_glyphs(s: str, char_includes_diacritic: bool = True) -> List[str]:
    """Form.charsAsGlyphs (:275-301)."""
    glyphs: List[str] = []
    for c in read_normalize_characters(s):
        if char_includes_diacritic:
            glyphs.append(c)
        else:
            letter, diacritics = normalize_char_separate_diacritics(c)
            for d in sorted(diacritics):
                glyphs.append(d)
            glyphs.append(letter)
    return glyphs


def _fs_equal(src_g: str, trg_g: str, allow_fs: bool) -> bool:
    """isLegalToApply's equality incl. f->s confusion (:130-149)."""
    if src_g == trg_g:
        return True
    if not allow_fs:
        return False
    if len(src_g) == len(trg_g):
        if len(src_g) == 1:
            return src_g == "f" and trg_g == "s"
        return src_g.replace("f", "*").replace("s", "*") == trg_g.replace("s", "*")
    return False


def edit_distance(
    src: Sequence[str],
    trg: Sequence[str],
    allow_fs_confusion: bool = False,
    equal_cost: float = 0.0,
    subst_cost: float = 1.0,
    insert_cost: float = 1.0,
    delete_cost: float = 1.0,
) -> float:
    """MarkovEditDistanceComputer.runEditDistance — min-cost alignment."""
    n, m = len(src), len(trg)
    eq = np.zeros((n, m), dtype=bool)
    for i, sg in enumerate(src):
        for j, tg in enumerate(trg):
            eq[i, j] = _fs_equal(sg, tg, allow_fs_confusion)
    prev = np.arange(m + 1, dtype=np.float64) * insert_cost
    for i in range(1, n + 1):
        cur = np.empty(m + 1)
        cur[0] = prev[0] + delete_cost
        match = np.where(eq[i - 1], equal_cost, subst_cost)
        # vector recurrence: cur[j] = min(prev[j]+del, prev[j-1]+match, cur[j-1]+ins)
        cand = np.minimum(prev[1:] + delete_cost, prev[:-1] + match)
        # resolve the left-to-right dependency on cur[j-1]
        run = cur[0]
        for j in range(1, m + 1):
            run = min(cand[j - 1], run + insert_cost)
            cur[j] = run
        prev = cur
    return float(prev[m])


class EvalSuffStats:
    """Evaluator.EvalSuffStats (:22-55): doc-count-weighted incremental
    mean — this is the reference's macro-average reduction, and it is
    exactly a weighted-mean merge, so it maps to groupBy().agg(
    sum(score*docs)/sum(docs)) in Spark."""

    def __init__(self, score: float = 0.0, doc_count: float = 0.0) -> None:
        self.score = score
        self.doc_count = doc_count

    @classmethod
    def from_numer_denom(cls, numer: float, denom: float) -> "EvalSuffStats":
        return cls(numer / denom, 1.0)

    def increment(self, other: "EvalSuffStats") -> None:
        next_count = self.doc_count + other.doc_count
        self.score = (self.doc_count / next_count) * self.score + (
            other.doc_count / next_count
        ) * other.score
        self.doc_count = next_count


def _convert_to_one_line(lines: Sequence[Sequence[str]]) -> str:
    return "".join("".join(line) + " " for line in lines)


def _split_out_punc(s: str) -> str:
    return " ".join(
        "".join(c for c in read_normalize_characters(s) if not is_punctuation_char(c)).split()
    )


def _fully_normalize(lines: Sequence[Sequence[str]], remove_punc: bool) -> str:
    s = _convert_to_one_line(lines)
    if remove_punc:
        s = _split_out_punc(s)
    return " ".join(s.split())


def cer_suff_stats(
    guess_lines, gold_lines, remove_punc: bool, allow_fs: bool,
    char_includes_diacritic: bool = True,
) -> Tuple[float, int]:
    guess = chars_as_glyphs(_fully_normalize(guess_lines, remove_punc), char_includes_diacritic)
    gold = chars_as_glyphs(_fully_normalize(gold_lines, remove_punc), char_includes_diacritic)
    cost = edit_distance(guess, gold, allow_fs)
    return cost, len(gold)


def wer_suff_stats(
    guess_lines, gold_lines, remove_punc: bool, allow_fs: bool
) -> Tuple[float, int]:
    guess = _fully_normalize(guess_lines, remove_punc).split()
    gold = _fully_normalize(gold_lines, remove_punc).split()
    cost = edit_distance(guess, gold, allow_fs)
    return cost, len(gold)


def get_unsegmented_eval(
    guess_lines, gold_lines, char_includes_diacritic: bool = True
) -> Dict[str, EvalSuffStats]:
    """Evaluator.getUnsegmentedEval (:67-78) — the 8 metric variants."""
    out: Dict[str, EvalSuffStats] = {}
    for name, (rp, fs) in {
        "CER, keep punc, allow f->s": (False, True),
        "CER, keep punc  ": (False, False),
        "CER, remove punc, allow f->s": (True, True),
        "CER, remove punc": (True, False),
    }.items():
        c, n = cer_suff_stats(guess_lines, gold_lines, rp, fs, char_includes_diacritic)
        out[name] = EvalSuffStats.from_numer_denom(c, n)
    for name, (rp, fs) in {
        "WER, keep punc, allow f->s": (False, True),
        "WER, keep punc  ": (False, False),
        "WER, remove punc, allow f->s": (True, True),
        "WER, remove punc": (True, False),
    }.items():
        c, n = wer_suff_stats(guess_lines, gold_lines, rp, fs)
        out[name] = EvalSuffStats.from_numer_denom(c, n)
    return out


def render_eval(evals: Dict[str, EvalSuffStats]) -> str:
    return "".join(f"{k}: {evals[k].score}\n" for k in sorted(evals))
