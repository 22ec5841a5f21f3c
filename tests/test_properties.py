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
