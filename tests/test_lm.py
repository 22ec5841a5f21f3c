"""LM tests.

Ported vectors: LanguageTransitionPriorsTests.java, LmPerplexityTests.java.
Plus: equivalence of the sequential CorpusCounter and the distributive
token-table derivation (the Spark-side formulation), KN sanity, and
context shrinking.
"""

import math
import random

import pytest

from ocular_spark.charset import CharIndexer
from ocular_spark.lm import (
    ABS_DISC,
    HISTORY_TYPE,
    KNESER_NEY,
    LOWER_ORDER_TYPE,
    LOWER_ORDER_TYPE_NORMALIZER,
    MLE,
    TOKEN,
    CorpusCounter,
    LmPerplexity,
    NgramLanguageModel,
    build_ngram_lm_from_chars,
    derive_count_db,
    make_language_transition_probs,
    merge_token_tables,
    token_tables_from_lines,
)


def test_language_transition_probs_multiple():
    priors = [0.5, 0.3, 0.1]
    t = make_language_transition_probs(priors, 0.8, ["spanish", "latin", "nahuatl"])
    sp, la, na = 0, 1, 2
    assert t[sp][na] == pytest.approx((0.1 * 0.5) / 0.16, abs=1e-9)
    assert t[la][na] == pytest.approx((0.1 * 0.3) / 0.16, abs=1e-9)
    assert t[na][na] == pytest.approx((0.8 * 0.1) / 0.16, abs=1e-9)
    assert t[sp][la] == pytest.approx((0.1 * 0.5) / 0.30, abs=1e-9)
    assert t[la][la] == pytest.approx((0.8 * 0.3) / 0.30, abs=1e-9)
    assert t[na][la] == pytest.approx((0.1 * 0.1) / 0.30, abs=1e-9)
    assert t[sp][sp] == pytest.approx((0.8 * 0.5) / 0.44, abs=1e-9)
    assert t[la][sp] == pytest.approx((0.1 * 0.3) / 0.44, abs=1e-9)
    assert t[na][sp] == pytest.approx((0.1 * 0.1) / 0.44, abs=1e-9)


def test_language_transition_probs_one_language():
    assert make_language_transition_probs([0.5], 0.8, ["spanish"]) == [[1.0]]


def test_language_transition_probs_errors():
    with pytest.raises(ValueError, match="languagePriors may not be empty"):
        make_language_transition_probs([], 0.8, [])
    with pytest.raises(ValueError, match="pKeepSameLanguage must be between 0 and 1"):
        make_language_transition_probs([0.5, 0.3, 0.1], 1.1, ["s", "l", "n"])
    with pytest.raises(ValueError, match="pKeepSameLanguage must be between 0 and 1"):
        make_language_transition_probs([0.5, 0.3, 0.1], 0.0, ["s", "l", "n"])
    with pytest.raises(ValueError, match="prior on latin is not positive"):
        make_language_transition_probs([0.5, 0.0, 0.2], 0.8, ["spanish", "latin", "nahuatl"])


class _MockSingleLm:
    def __init__(self, table, max_order):
        self.table = table
        self.max_order = max_order

    def get_max_order(self):
        return self.max_order

    def get_char_ngram_prob(self, context, c):
        return self.table[(tuple(context), c)]


class _MockCsLm:
    def __init__(self, char_indexer, sub, priors, trans):
        self.char_indexer = char_indexer
        self.sub = sub
        self.priors = priors
        self.trans = trans

    def get_character_indexer(self):
        return self.char_indexer

    def num_languages(self):
        return len(self.sub)

    def get(self, lang):
        return self.sub[lang]

    def language_prior(self, lang):
        return self.priors[lang]

    def language_transition_prob(self, frm, dest):
        return self.trans[(frm, dest)]


def _perplexity_fixture(l1_max_order):
    ci = CharIndexer()
    ci.index(["a", "b", "x", "y", " "])
    a, b, x, y, s = (ci.get_index(c) for c in ["a", "b", "x", "y", " "])
    if l1_max_order == 4:
        lm1 = _MockSingleLm(
            {
                ((), a): 0.11, ((a, b, s), a): 0.12,
                ((a,), b): 0.13, ((b, s, a), b): 0.14,
                ((a, b), s): 0.15, ((s, a, b), s): 0.16,
            },
            4,
        )
    else:
        lm1 = _MockSingleLm(
            {
                ((), a): 0.11, ((a, b, s), a): 0.12,
                ((a,), b): 0.13, ((a, b, s, a), b): 0.14,
                ((a, b), s): 0.15, ((b, s, a, b), s): 0.16,
            },
            5,
        )
    lm2 = _MockSingleLm({((), x): 0.21, ((x,), y): 0.22, ((x, y), s): 0.23}, 4)
    cs = _MockCsLm(
        ci,
        [lm1, lm2],
        {0: 0.31},
        {(0, 0): 0.32, (0, 1): 0.33, (1, 0): 0.35, (1, 1): 0.34},
    )
    return cs, (a, b, x, y, s)


def test_perplexity():
    cs, (a, b, x, y, s) = _perplexity_fixture(4)
    pp = LmPerplexity(cs)
    p1 = pp.perplexity([a, b, s], [0, 0, 0])
    assert p1 == pytest.approx(11.456984790348551, abs=1e-14)
    p2 = pp.perplexity(
        [a, b, s, a, b, s, x, y, s, a, b], [0, 0, 0, 0, 0, 0, 1, 1, 1, 0, 0]
    )
    assert p2 == pytest.approx(9.996534024760905, abs=1e-14)


def test_perplexity_different_max_orders():
    cs, (a, b, x, y, s) = _perplexity_fixture(5)
    pp = LmPerplexity(cs)
    p2 = pp.perplexity(
        [a, b, s, a, b, s, x, y, s, a, b], [0, 0, 0, 0, 0, 0, 1, 1, 1, 0, 0]
    )
    assert p2 == pytest.approx(9.996534024760905, abs=1e-14)


# ---- counting equivalence: sequential cascade vs distributive derivation ----

def _random_lines(seed, n_lines, vocab, max_len):
    rng = random.Random(seed)
    return [
        [rng.randrange(vocab) for _ in range(rng.randrange(1, max_len))]
        for _ in range(n_lines)
    ]


@pytest.mark.parametrize("max_order", [2, 3, 6])
def test_distributive_counts_match_sequential(max_order):
    lines = _random_lines(42, 30, 5, 40)
    seq = CorpusCounter(max_order)
    for line in lines:
        seq.count_line(line)

    # split into 3 "partitions", count separately, merge, derive
    parts = [lines[0::3], lines[1::3], lines[2::3]]
    merged = token_tables_from_lines(parts[0], max_order)
    for p in parts[1:]:
        merged = merge_token_tables(merged, token_tables_from_lines(p, max_order))
    derived = derive_count_db(merged)

    for o in range(max_order):
        sdb, ddb = seq.counts[o], derived[o]
        assert sdb.num_tokens == ddb.num_tokens, o
        assert sdb.num_bigram_types == ddb.num_bigram_types, o
        assert set(sdb.counts) == set(ddb.counts), o
        for k in sdb.counts:
            for ct in (TOKEN, HISTORY_TYPE, LOWER_ORDER_TYPE, LOWER_ORDER_TYPE_NORMALIZER):
                if ct < sdb.num_count_types:
                    assert sdb.counts[k][ct] == ddb.counts[k][ct], (o, k, ct)


def test_kneser_ney_normalizes():
    # The reference's KN only *approximately* normalizes (line-boundary
    # mass and the UNK epsilon leak probability; NgramLanguageModel's
    # own checkNormalizes prints but never asserts 1.0).  Guard the
    # ballpark so a broken backoff (e.g. 0.48 from a wrong normalizer)
    # fails loudly.
    lines = _random_lines(7, 50, 4, 60)
    ci = CharIndexer()
    char_lines = [[chr(ord("a") + i) for i in line] for line in lines]
    lm = build_ngram_lm_from_chars(char_lines, 3, KNESER_NEY, 1.0, ci)
    for ctx_chars in ["ab", "a", ""]:
        ctx = tuple(ci.get_index(c) for c in ctx_chars)
        ctx = lm.shrink_context(ctx)
        total = sum(lm.get_char_ngram_prob(ctx, c) for c in range(ci.size()))
        assert 0.95 < total < 1.02, (ctx_chars, total)


def test_mle_and_shrink_context():
    ci = CharIndexer()
    char_lines = [list("abab"), list("abb")]
    lm = build_ngram_lm_from_chars(char_lines, 3, MLE, 1.0, ci)
    a, b = ci.get_index("a"), ci.get_index("b")
    # token MLE: P(b | a) = count(ab)/count(a) = 3/3
    assert lm.get_char_ngram_prob((a,), b) == pytest.approx(1.0)
    # P(a | b) = count(ba)/count(b) = 1/4
    assert lm.get_char_ngram_prob((b,), a) == pytest.approx(0.25)
    # unseen context shrinks away
    assert lm.shrink_context((b, b, b, a, b)) == (a, b)
    # lmPower applies
    lm4 = build_ngram_lm_from_chars([list("abab"), list("abb")], 3, MLE, 4.0, CharIndexer())
    assert lm4.get_char_ngram_prob((1,), 0) == pytest.approx(0.25 ** 4)


def test_abs_disc_backoff():
    ci = CharIndexer()
    lm = build_ngram_lm_from_chars([list("abab"), list("abb")], 2, ABS_DISC, 1.0, ci)
    a, b = ci.get_index("a"), ci.get_index("b")
    # P_AD(b|a) = (3-.75)/3 + 2*... historyType(a)=|{ab}|=1 → bow = 1*.75/3
    # unigram MLE(b)=4/7
    assert lm.get_char_ngram_prob((a,), b) == pytest.approx(2.25 / 3 + 0.75 / 3 * 4 / 7)


def test_dense_ppl_tables_match_reference_walk():
    """The vectorized batch scorer (DensePplTables.score_batch) must
    reproduce exactly the per-character reference walk
    (shrink_context + get_char_ngram_prob per position) including
    boundary behavior at doc starts, unknown chars, and empty docs."""
    import numpy as np

    from ocular_spark.decoder import CompiledTransitionModel
    from ocular_spark.lm import DensePplTables, build_ngram_lm_from_chars

    ci = CharIndexer()
    corpus = [list(s) for s in [
        "the cat sat on a mat", "a man ran to the van",
        "no rat sat", "the fast man ran", "-",
    ]]
    lm = build_ngram_lm_from_chars(corpus, 3, KNESER_NEY, 1.0, ci)
    tables = DensePplTables(CompiledTransitionModel(lm))

    idx = {c: i for i, c in enumerate(ci.get_objects())}
    m = lm.get_max_order()

    def ref_score(text):
        cs = [idx[ch] for ch in text if ch in idx]
        lt, n = 0.0, 0
        for i, c in enumerate(cs):
            ctx = lm.shrink_context(tuple(cs[max(0, i - (m - 1)):i]))
            p = lm.get_char_ngram_prob(ctx, c)
            if p > 0:
                lt += math.log(p)
                n += 1
        return len(cs), (math.exp(-lt / n) if n else float("nan"))

    texts = ["the cat ran", "zzz unseen zzz", "", "Ω", "a", "man on a mat sat"]
    n_chars, ppl = tables.score_batch(texts)
    for t, nc, p in zip(texts, n_chars, ppl):
        rnc, rp = ref_score(t)
        assert nc == rnc, t
        if math.isnan(rp):
            assert math.isnan(p), t
        else:
            assert p == pytest.approx(rp, abs=1e-9), t
