"""BPE tokenizer kernel: the determinism contract the frozen-golden
gate rests on (overlapping pair counts, lexicographic tie-break,
greedy left-to-right merging, rank-order inference), checked against
the INDEPENDENT regex-based implementation in tools/freeze_goldens.py
on adversarial inputs the fixture corpus doesn't contain."""

import importlib.util
import os

import pandas as pd
import pytest

from ocular_spark.functions.bpe import (
    EOW,
    encode_word,
    encode_words,
    merge_pair,
    train_bpe,
)

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF = os.path.join(TESTDATA, "sf0.001")


def _freeze_mod():
    path = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                        "tools", "freeze_goldens.py")
    spec = importlib.util.spec_from_file_location("freeze_goldens", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_merge_pair_overlaps_resolve_leftmost_first():
    assert merge_pair(("a", "a", "a"), ("a", "a")) == ("aa", "a")
    assert merge_pair(("a", "a", "a", "a"), ("a", "a")) == ("aa", "aa")
    assert merge_pair(("x", "a", "a", "a"), ("a", "a")) == ("x", "aa", "a")


def test_train_tie_break_is_lexicographic():
    # 'ab' and 'cd' each occur once -> ('a','b') ties ('c','d') (and
    # the EOW pairs); smallest (left, right) wins
    merges = train_bpe({"ab": 1, "cd": 1}, 1)
    assert merges == [("a", "b")]


def test_encode_applies_rank_order_not_frequency():
    # merges: rank0 = ('b','c'), rank1 = ('a','b').  Encoding 'abc'
    # must apply rank0 first (a, bc) even though ('a','b') is also
    # adjacent at the start.
    ranks = {("b", "c"): 0, ("a", "b"): 1}
    assert encode_word("abc", ranks) == ("a", "bc", EOW)


def test_encode_unseen_word_falls_back_to_chars():
    assert encode_word("zq", {}) == ("z", "q", EOW)


def test_overlapping_pair_counts():
    # 'aaa' contributes ('a','a') TWICE (positions 0-1 and 1-2), so it
    # beats ('b','c') which appears in two distinct words
    merges = train_bpe({"aaa": 1, "bc": 1, "xbc": 1}, 1)
    assert merges[0] == ("a", "a")


def test_kernel_equals_independent_regex_implementation():
    fz = _freeze_mod()
    words = {
        "hash": 3, "hashes": 2, "aaa": 5, "aaaa": 1, "banana": 2,
        "bandana": 1, "a": 4, "join": 3, "joining": 1, "x": 1,
    }
    for n_merges in (1, 5, 12, 40):
        prod = train_bpe(words, n_merges)
        ref = fz._bpe_train_regex(words, n_merges)
        assert prod == ref, n_merges
        enc = encode_words(list(words) + ["unseen", "banananana"], prod)
        for w, toks in enc.items():
            assert list(toks) == fz._bpe_encode_regex(w, prod), (w, prod)


def test_spark_encode_consistent_with_serial(spark):
    import __spark_entry__ as entry_mod

    out = entry_mod.q_bpe_encode(spark, SF).toPandas().set_index("doc_id")
    merges = entry_mod._bpe_merges(spark, SF)
    docs = pd.read_parquet(os.path.join(SF, "documents.parquet"))
    ranks = {p: i for i, p in enumerate(merges)}
    for r in docs.itertuples():
        ws = [w for w in r.text.split(" ") if w]
        if not ws:
            continue
        n_tokens = sum(len(encode_word(w, ranks)) for w in ws)
        row = out.loc[int(r.doc_id)]
        assert int(row.n_words) == len(ws)
        assert int(row.n_tokens) == n_tokens
    # every token sequence concatenates back to the original word
    for w in {w for r in docs.itertuples() for w in r.text.split(" ") if w}:
        toks = encode_word(w, ranks)
        assert "".join(toks) == w + EOW
