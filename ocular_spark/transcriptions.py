"""Transcription assembly from decode states.

Re-expresses ``eval/ModelTranscriptions.java:30-104`` (diplomatic /
normalized / running-normalized assembly — this defines the output
span text contract), ``train/FontTrainer.makeFullViterbiStateSeq``
(:437-459, duplicate line-break hyphens collapsed), and the line
rendering of ``BasicSingleDocumentEvaluatorAndOutputPrinter``
(:58-63, 98-110: join unescaped chars per line).

Works on the flat-array LineDecode output of decoder.py; pure Python/
NumPy so it runs identically in tests and inside Spark kernels.
"""

from __future__ import annotations

from typing import List, NamedTuple, Sequence, Tuple

import numpy as np

from ocular_spark.charset import HYPHEN, SPACE, unescape_char
from ocular_spark.decoder import (
    LMRGN,
    LMRGN_HPHN,
    RMRGN,
    RMRGN_HPHN,
    RMRGN_HPHN_INIT,
    TMPL,
    LineDecode,
)

# GlyphChar.GlyphType ordinals (gsm/GlyphChar.java:59-66)
ELISION_TILDE, TILDE_ELIDED, FIRST_ELIDED, DOUBLED, ELIDED, NORMAL_CHAR = range(6)
_ELIDED_TYPES = {TILDE_ELIDED, FIRST_ELIDED, ELIDED}


class Transcriptions(NamedTuple):
    diplomatic_lines: List[List[str]]  # per line, normalized char strings
    normalized_lines: List[List[str]]
    normalized_running: List[str]
    # language index per running char (-1 = none), aligned with
    # normalized_running — the ModelTranscriptions charLang tuples
    # (eval/ModelTranscriptions.java:84,93) that
    # separateTranscriptionsByLanguage consumes
    normalized_running_langs: Sequence[int] = ()


def assemble(
    decodes: Sequence[LineDecode],
    char_strs: Sequence[str],
    glyph_types: Sequence[np.ndarray] = None,
) -> Transcriptions:
    """ModelTranscriptions semantics.  ``glyph_types`` per line default
    to NORMAL_CHAR (monolingual model renders exactly the LM char,
    CharacterNgramTransitionState:338-341)."""
    dipl_lines: List[List[str]] = []
    norm_lines: List[List[str]] = []
    running: List[str] = []
    running_langs: List[int] = []
    for li, ld in enumerate(decodes):
        dipl: List[str] = []
        norm: List[str] = []
        if glyph_types is not None:
            gts = glyph_types[li]
        else:
            gts = getattr(ld, "glyph_types", None)
        n = len(ld.states)
        for i in range(n):
            gt = int(gts[i]) if gts is not None else NORMAL_CHAR
            curr_dipl = char_strs[int(ld.glyph_chars[i])]
            prev_dipl = dipl[-1] if dipl else None
            if prev_dipl == HYPHEN and curr_dipl == HYPHEN:
                continue  # collapse multi-hyphens
            if gt not in _ELIDED_TYPES:
                dipl.append(curr_dipl)
            if gt != DOUBLED:
                curr_norm = char_strs[int(ld.lm_chars[i])]
                norm.append(curr_norm)
                stype = int(ld.types[i])
                lang = int(ld.langs[i]) if getattr(ld, "langs", None) is not None else -1
                if stype in (RMRGN_HPHN_INIT, RMRGN_HPHN, LMRGN_HPHN):
                    pass
                elif stype in (LMRGN, RMRGN):
                    if running and running[-1] != SPACE:
                        running.append(SPACE)
                        running_langs.append(lang)
                elif stype == TMPL:
                    if curr_norm == SPACE and (not running or running[-1] == SPACE):
                        pass  # collapse spaces
                    else:
                        running.append(curr_norm)
                        running_langs.append(lang)
        dipl_lines.append(dipl)
        norm_lines.append(norm)
    if running and running[-1] == SPACE:
        running.pop()
        running_langs.pop()
    return Transcriptions(dipl_lines, norm_lines, running, running_langs)


def render_line(chars: Sequence[str]) -> str:
    """joinLineForPrinting (:58-63): unescape each normalized char."""
    return "".join(unescape_char(c) for c in chars)


def diplomatic_text(decodes: Sequence[LineDecode], char_strs: Sequence[str]) -> str:
    """The media-span text contract: diplomatic transcription lines
    joined with newlines (FIXTURES.md §1; DIPL output format)."""
    tr = assemble(decodes, char_strs)
    return "\n".join(render_line(line) for line in tr.diplomatic_lines)


def make_full_viterbi_state_seq(
    decodes: Sequence[LineDecode], char_strs: Sequence[str]
) -> List[Tuple[int, int]]:
    """FontTrainer.makeFullViterbiStateSeq (:437-459): concatenate
    lines, dropping a glyph-hyphen that immediately follows another
    glyph-hyphen within the same line.  Returns (line_idx, state_idx)
    pairs.

    NOTE: the reference's own unit test (FontTrainEMTests.java:60-91)
    expects ids (2,3,4,1) for a sequence whose implementation-produced
    prefix is (1,2,3,4) — the committed test is stale w.r.t. the
    committed implementation (it is not run here: the project cannot
    build, lib/murphy.jar is absent).  We port the *implementation*
    semantics and test those.
    """
    out: List[Tuple[int, int]] = []
    for li, ld in enumerate(decodes):
        line_chars: List[str] = []
        for i in range(len(ld.states)):
            c = char_strs[int(ld.glyph_chars[i])]
            if not line_chars or not (line_chars[-1] == HYPHEN and c == HYPHEN):
                line_chars.append(c)
                out.append((li, i))
    return out
