"""Byte-pair-encoding tokenizer (Sennrich et al. 2016, ACL — 'Neural
Machine Translation of Rare Words with Subword Units').

The reference repo has no tokenizer; this is part of the
training-data surface beyond reference parity.  Architecture follows
what SentencePiece / HF tokenizers do at corpus scale:

- WORD COUNTING is the distributed stage (one groupBy shuffle over
  the corpus) — the only stage whose cost grows with data size.
- TRAINING runs driver-side over the collected word-count dictionary.
  The dictionary is bounded (distinct words, capped deterministically
  at BPE_MAX_VOCAB by (count DESC, word ASC)), so at 100 TB the merge
  loop still sees at most BPE_MAX_VOCAB rows — training cost grows
  with the VOCABULARY, not the corpus.
- ENCODING is applied once per DISTINCT word (the Zipf trick: encode
  cost also grows with vocabulary), then joined back to documents.

Determinism contract (what the frozen-golden gate checks): pair
counts are per adjacent occurrence (overlapping, i.e. 'aaa'
contributes ('a','a') twice); the best pair maximizes count with ties
broken by the lexicographically SMALLEST (left, right); merging
within a word is greedy left-to-right (so 'aaaa' + ('a','a') ->
['aa', 'aa']); encoding repeatedly applies the lowest-RANK adjacent
pair present (rank = training order), not the most frequent one.

An independent regex-based implementation of the same contract (the
formulation Sennrich's original learn_bpe/apply_bpe scripts use,
space-joined symbol strings + lookaround-anchored substitution) lives
in tools/freeze_goldens.py and produces the DuckDB golden the driver
gate compares against — a genuine two-implementation gate.
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, Iterable, List, Sequence, Tuple

EOW = "</w>"  # end-of-word marker: lets the model learn suffixes

Pair = Tuple[str, str]


def merge_pair(syms: Sequence[str], pair: Pair) -> Tuple[str, ...]:
    """Greedy left-to-right merge of every occurrence of `pair`.
    Overlaps resolve leftmost-first: ('a','a','a') -> ('aa','a')."""
    left, right = pair
    out: List[str] = []
    i = 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_bpe(
    word_counts: Dict[str, int], n_merges: int
) -> List[Pair]:
    """Learn up to `n_merges` merges from a word-frequency dict.
    Stops early when no adjacent pair remains (every word fully
    merged into a single symbol)."""
    vocab: Dict[Tuple[str, ...], int] = {}
    for w, c in word_counts.items():
        if w:
            key = tuple(w) + (EOW,)
            vocab[key] = vocab.get(key, 0) + c
    merges: List[Pair] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        # max count, tie -> lexicographically smallest pair
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        vocab = {merge_pair(syms, best): c for syms, c in vocab.items()}
    return merges


def encode_word(word: str, ranks: Dict[Pair, int]) -> Tuple[str, ...]:
    """Tokenize one word: repeatedly apply the LOWEST-RANK adjacent
    pair present until none applies (the standard BPE inference
    order — rank order, not frequency order)."""
    syms: Tuple[str, ...] = tuple(word) + (EOW,)
    while len(syms) > 1:
        best: Pair | None = None
        best_rank = len(ranks)
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and r < best_rank:
                best_rank = r
                best = (syms[i], syms[i + 1])
        if best is None:
            break
        syms = merge_pair(syms, best)
    return syms


def encode_words(
    words: Iterable[str], merges: Sequence[Pair]
) -> Dict[str, Tuple[str, ...]]:
    """Encode a batch of distinct words (memoized by construction)."""
    ranks = {p: i for i, p in enumerate(merges)}
    return {w: encode_word(w, ranks) for w in words}
