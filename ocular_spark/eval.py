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

from typing import Dict, List, Sequence, Tuple, NamedTuple

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


def edit_distance_alignment(
    src: Sequence[str],
    trg: Sequence[str],
    allow_fs_confusion: bool = False,
) -> Tuple[float, List[int]]:
    """Full alignment: (cost, ops) with ops in {EQUAL, SUBST, INSERT,
    DELETE} — MarkovEditDistanceComputer.backwardPass (:213-243)."""
    n, m = len(src), len(trg)
    cost = np.zeros((n + 1, m + 1))
    cost[0, :] = np.arange(m + 1)
    cost[:, 0] = np.arange(n + 1)
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            match = 0.0 if _fs_equal(src[i - 1], trg[j - 1], allow_fs_confusion) else 1.0
            cost[i, j] = min(
                cost[i - 1, j - 1] + match, cost[i - 1, j] + 1.0, cost[i, j - 1] + 1.0
            )
    ops: List[int] = []
    i, j = n, m
    while i > 0 or j > 0:
        if i > 0 and j > 0:
            match = 0.0 if _fs_equal(src[i - 1], trg[j - 1], allow_fs_confusion) else 1.0
            if cost[i, j] == cost[i - 1, j - 1] + match:
                # reference classifies by raw equality in the trace (:233-237)
                ops.append(EQUAL if src[i - 1] == trg[j - 1] else SUBST)
                i, j = i - 1, j - 1
                continue
        if i > 0 and cost[i, j] == cost[i - 1, j] + 1.0:
            ops.append(DELETE)
            i -= 1
        else:
            ops.append(INSERT)
            j -= 1
    ops.reverse()
    return float(cost[n, m]), ops


def error_analyze(
    guess_lines, gold_lines, remove_punc: bool = False, allow_fs: bool = False
) -> str:
    """Evaluator.errorAnalyze (:96-172): word-level alignment error
    breakdown + most-missed words."""
    guess = _fully_normalize(guess_lines, remove_punc).split()
    gold = _fully_normalize(gold_lines, remove_punc).split()
    _, ops = edit_distance_alignment(guess, gold, allow_fs)
    guess_i = gold_i = 0
    insertions = deletions = isolated = non_isolated = 0
    confusions: Dict[Tuple[str, str], int] = {}
    for k, op in enumerate(ops):
        if op == EQUAL:
            guess_i += 1
            gold_i += 1
        elif op == SUBST:
            if (k == 0 or ops[k - 1] == EQUAL) and (
                k == len(ops) - 1 or ops[k + 1] == EQUAL
            ):
                isolated += 1
                key = (gold[gold_i], guess[guess_i])
                confusions[key] = confusions.get(key, 0) + 1
            else:
                non_isolated += 1
            guess_i += 1
            gold_i += 1
        elif op == INSERT:
            insertions += 1
            gold_i += 1
        else:
            deletions += 1
            guess_i += 1
    lines = [
        "%d isolated substitutions, %d non-isolated substitutions, "
        "%d insertions, %d deletions" % (isolated, non_isolated, insertions, deletions)
    ]
    missed: Dict[str, int] = {}
    for (gold_w, _guess_w), n in confusions.items():
        missed[gold_w] = missed.get(gold_w, 0) + n
    lines.append("Most frequent missed words")
    for w, n in sorted(missed.items(), key=lambda kv: (-kv[1], kv[0]))[:20]:
        lines.append("  %s: %d" % (w, n))
    return "\n".join(lines) + "\n"


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


# ---- ErrorSampler (eval/ErrorSampler.java:18-130) ----

INSERTION = "<INSERTION>"
DELETION = "<DELETION>"


class WordError(NamedTuple):
    """One word-level error site (ErrorSampler.Error :18-50); sort
    order is (doc, line, guess token index)."""

    doc_idx: int
    line_idx: int
    guess_token_idx: int
    guess: str
    gold: str

    def render(self) -> str:
        return (
            "Doc %d, line %d, guess idx %d: guess = %s, gold = %s"
            % (self.doc_idx, self.line_idx, self.guess_token_idx, self.guess, self.gold)
        )


def aggregate_word_errors(
    docs: Sequence[Tuple[Sequence[str], Sequence[str]]]
) -> List[WordError]:
    """ErrorSampler.aggregateWordErrors (:64-110): for each doc's
    (guess_lines, gold_lines), align WORDS (wordsAsGlyphs) with the
    Markov edit distance and emit one WordError per SUBST/INSERT/
    DELETE op.  '|' (the long-s output escape) reads as 's' (:73-74)."""
    all_errors: List[WordError] = []
    for doc_idx, (guess_lines, gold_lines) in enumerate(docs):
        if len(guess_lines) != len(gold_lines):
            raise ValueError("guess/gold line counts differ")
        for li, (guess_line, gold_line) in enumerate(zip(guess_lines, gold_lines)):
            guess_words = [w for w in guess_line.replace("|", "s").split() if w]
            gold_words = [w for w in gold_line.replace("|", "s").split() if w]
            _, ops = edit_distance_alignment(guess_words, gold_words)
            si = ti = 0
            for op in ops:
                if op == EQUAL:
                    si += 1
                    ti += 1
                elif op == SUBST:
                    all_errors.append(
                        WordError(doc_idx, li, si, guess_words[si], gold_words[ti])
                    )
                    si += 1
                    ti += 1
                elif op == INSERT:
                    all_errors.append(
                        WordError(doc_idx, li, si, INSERTION, gold_words[ti])
                    )
                    ti += 1
                else:  # DELETE
                    all_errors.append(
                        WordError(doc_idx, li, si, guess_words[si], DELETION)
                    )
                    si += 1
    return all_errors


def sample_errors(
    errors: Sequence[WordError], n: int = 50, seed: int = 0
) -> List[WordError]:
    """ErrorSampler.main (:53-62): Collections.shuffle with
    java.util.Random(seed) (bit-exact Fisher-Yates), take the first
    min(n, len), re-sort by (doc, line, token)."""
    from ocular_spark.preprocess import JavaRandom

    shuffled = list(errors)
    rnd = JavaRandom(seed)
    # java.util.Collections.shuffle: i from size-1 downto 1,
    # swap(i, rnd.nextInt(i + 1))
    for i in range(len(shuffled) - 1, 0, -1):
        j = rnd.next_int(i + 1)
        shuffled[i], shuffled[j] = shuffled[j], shuffled[i]
    selected = shuffled[: min(n, len(shuffled))]
    selected.sort(key=lambda e: (e.doc_idx, e.line_idx, e.guess_token_idx))
    return selected
