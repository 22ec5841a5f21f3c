"""Transcription assembly unit vectors.

Ports the lattice of the reference's FontTrainEMTests.java:60-91 —
NOTE: that committed test expects ids (2,3,4,1) while the committed
implementation (FontTrainer.makeFullViterbiStateSeq :437-459)
produces (1,2,3,...); the reference test is stale relative to its own
code (it cannot run there either: the project does not build without
lib/murphy.jar).  We assert the *implementation* semantics, plus the
multi-hyphen collapse rule it exists to test.
"""

import numpy as np

from ocular_spark.decoder import (
    LMRGN,
    LMRGN_HPHN,
    RMRGN,
    RMRGN_HPHN,
    RMRGN_HPHN_INIT,
    TMPL,
    LineDecode,
)
from ocular_spark.gsm import NORMAL_CHAR
from ocular_spark.transcriptions import (
    assemble,
    make_full_viterbi_state_seq,
    render_line,
)

CHARS = [" ", "-", "a", "b", "c"]


def _ld(entries):
    """entries: list of (type, lm_char, glyph_char, lang)."""
    n = len(entries)
    return LineDecode(
        states=np.arange(n, dtype=np.int64),
        widths=np.full(n, 5, dtype=np.int32),
        start_cols=np.arange(n, dtype=np.int32) * 5,
        glyph_chars=np.array([e[2] for e in entries], dtype=np.int32),
        lm_chars=np.array([e[1] for e in entries], dtype=np.int32),
        types=np.array([e[0] for e in entries], dtype=np.int8),
        exposures=np.zeros(n, dtype=np.int8),
        offsets=np.zeros(n, dtype=np.int8),
        pad_widths=np.ones(n, dtype=np.int8),
        glyph_types=np.full(n, NORMAL_CHAR, dtype=np.int8),
        langs=np.array([e[3] for e in entries], dtype=np.int8),
    )


def _reference_lattice():
    sp, hy, a, b, c = range(5)
    line1 = _ld([
        (LMRGN, sp, sp, -1),
        (LMRGN, sp, sp, -1),
        (TMPL, sp, sp, -1),
        (TMPL, a, a, 1),
        (TMPL, b, b, 1),
        (TMPL, c, c, 1),
        (RMRGN_HPHN_INIT, hy, hy, 1),
        (RMRGN_HPHN, sp, sp, 1),
        (RMRGN_HPHN, sp, sp, 1),
    ])
    line2 = _ld([
        (LMRGN_HPHN, sp, sp, 1),
        (LMRGN_HPHN, sp, sp, 1),
        (TMPL, sp, sp, 1),
        (TMPL, a, a, 1),
        (TMPL, b, b, 1),
        (TMPL, c, c, 1),
        (RMRGN, sp, sp, 1),
        (RMRGN, sp, sp, 1),
    ])
    return [line1, line2]


def test_full_viterbi_state_seq_reference_lattice():
    decodes = _reference_lattice()
    seq = make_full_viterbi_state_seq(decodes, CHARS)
    # no adjacent glyph-hyphens anywhere -> every state survives
    assert seq == [(0, i) for i in range(9)] + [(1, i) for i in range(8)]


def test_full_viterbi_collapses_adjacent_hyphens():
    sp, hy, a = 0, 1, 2
    ld = _ld([
        (TMPL, a, a, 0),
        (TMPL, hy, hy, 0),
        (RMRGN_HPHN_INIT, hy, hy, 0),  # adjacent hyphen glyph -> dropped
        (TMPL, a, a, 0),
    ])
    seq = make_full_viterbi_state_seq([ld], CHARS)
    assert seq == [(0, 0), (0, 1), (0, 3)]


def test_assemble_running_text_hyphenation():
    """Line-break-hyphenated word re-joins in the running normalized
    text (ModelTranscriptions.java:253-273): abc- / abc -> 'abc abc'
    ... margins produce single separating spaces."""
    decodes = _reference_lattice()
    tr = assemble(decodes, CHARS)
    assert render_line(tr.diplomatic_lines[0]) == "   abc-  "
    assert render_line(tr.diplomatic_lines[1]) == "   abc  "
    # running normalized: spaces collapsed, hyphen-margins contribute
    # nothing (the hyphenated word continues across the line break)
    running = render_line(tr.normalized_running)
    assert running == "abc abc"
