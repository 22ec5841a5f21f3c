"""Property-based tests (hypothesis) for the foundational algebra.

The reference has no randomized testing (SURVEY.md §5.1); these pin
algebraic invariants that the ported unit vectors can't cover
exhaustively."""

from hypothesis import given, settings, strategies as st

from ocular_spark.charset import (
    ACUTE_ESCAPE,
    GRAVE_ESCAPE,
    TILDE_ESCAPE,
    fully_escape_char,
    normalize_char,
    read_normalize_characters,
    unescape_char,
)
from ocular_spark.eval import edit_distance
from ocular_spark.lm import CorpusCounter, derive_count_db, token_tables_from_lines

# plain letters plus precomposed/escaped/combining variants
_CHAR = st.one_of(
    st.sampled_from(list("abcdefghijklmnopqrstuvwxyz .,-")),
    st.sampled_from(["á", "è", "ñ", "ü", "õ", "ç"]),
    st.sampled_from([TILDE_ESCAPE + "a", ACUTE_ESCAPE + "e", GRAVE_ESCAPE + "o"]),
)


@settings(max_examples=200, deadline=None)
@given(_CHAR)
def test_normalize_idempotent(c):
    n = normalize_char(c)
    assert normalize_char(n) == n


@settings(max_examples=200, deadline=None)
@given(_CHAR)
def test_escape_roundtrips_preserve_normal_form(c):
    n = normalize_char(c)
    assert normalize_char(fully_escape_char(c)) == n
    assert normalize_char(unescape_char(c)) == n
    assert normalize_char(unescape_char(c, precomposed_only=True)) == n


@settings(max_examples=100, deadline=None)
@given(st.lists(_CHAR, min_size=0, max_size=12))
def test_read_normalize_characters_concatenation(chars):
    # reading the concatenation of normalized chars yields the chars
    normalized = [normalize_char(c) for c in chars]
    assert read_normalize_characters("".join(normalized)) == normalized


_WORD = st.text(alphabet="abs f", min_size=0, max_size=8)


@settings(max_examples=150, deadline=None)
@given(_WORD, _WORD)
def test_edit_distance_metric_properties(a, b):
    d = edit_distance(list(a), list(b))
    assert d >= 0
    assert (d == 0) == (a == b)
    # symmetric without the (asymmetric) f->s confusion
    assert d == edit_distance(list(b), list(a))
    # bounded by max length
    assert d <= max(len(a), len(b))


@settings(max_examples=150, deadline=None)
@given(_WORD, _WORD, _WORD)
def test_edit_distance_triangle(a, b, c):
    ab = edit_distance(list(a), list(b))
    bc = edit_distance(list(b), list(c))
    ac = edit_distance(list(a), list(c))
    assert ac <= ab + bc


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=4), min_size=0, max_size=25),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=2, max_value=4),
)
def test_distributive_counting_property(lines, max_order):
    """The sequential cascade and the shuffle-friendly derivation agree
    on arbitrary inputs (not just the fixed-seed corpus)."""
    seq = CorpusCounter(max_order)
    for line in lines:
        seq.count_line(line)
    derived = derive_count_db(token_tables_from_lines(lines, max_order))
    for o in range(max_order):
        assert seq.counts[o].counts == derived[o].counts, o
        assert seq.counts[o].num_tokens == derived[o].num_tokens
    assert seq.counts[0].num_bigram_types == derived[0].num_bigram_types


# ---------------------------------------------------------------- BPE

from ocular_spark.functions.bpe import EOW, encode_word, merge_pair, train_bpe

_WORD = st.text(alphabet="abcde", min_size=1, max_size=12)


@settings(max_examples=150, deadline=None)
@given(st.dictionaries(_WORD, st.integers(1, 50), min_size=1, max_size=20),
       st.integers(0, 30))
def test_bpe_encode_concatenation_invariant(words, n_merges):
    """Every token sequence concatenates back to word + EOW — for any
    corpus, any merge budget, any word (seen or unseen)."""
    merges = train_bpe(words, n_merges)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in list(words) + ["zz", "abcabc"]:
        toks = encode_word(w, ranks)
        assert "".join(toks) == w + EOW
        assert all(t for t in toks)


@settings(max_examples=150, deadline=None)
@given(st.lists(st.sampled_from("ab"), min_size=1, max_size=14))
def test_bpe_merge_pair_greedy_left_to_right(syms):
    """merge_pair('a','a') output never contains two adjacent
    originals that were mergeable — the greedy scan consumed leftmost
    occurrences first — and concatenation is preserved."""
    out = merge_pair(tuple(syms), ("a", "a"))
    assert "".join(out) == "".join(syms)
    for i in range(len(out) - 1):
        # an ('a','a') adjacency may only survive if the left element
        # was already consumed as the RIGHT half of a prior merge —
        # i.e. the left element is the 2-char merged token
        if out[i] == "a" and out[i + 1] == "a":
            raise AssertionError((syms, out))


@settings(max_examples=100, deadline=None)
@given(st.dictionaries(_WORD, st.integers(1, 50), min_size=1, max_size=15))
def test_bpe_more_merges_never_lengthen_tokenization(words):
    """Token counts are monotone non-increasing in the merge budget
    for the words the model was trained on."""
    m_small = train_bpe(words, 3)
    m_big = train_bpe(words, 12)
    assert m_big[: len(m_small)] == m_small  # training is a prefix chain
    r_small = {p: i for i, p in enumerate(m_small)}
    r_big = {p: i for i, p in enumerate(m_big)}
    for w in words:
        assert len(encode_word(w, r_big)) <= len(encode_word(w, r_small))
