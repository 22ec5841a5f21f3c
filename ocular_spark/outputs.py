"""Output sinks: ALTO XML, HTML, whitespace layout.

Re-expresses the reference's optional output formatters:
  * output/AltoOutputWriter.java:40-236 — word-segmented ALTO v3 XML
    with per-word language + diplomatic/normalized alternatives
    (header metadata simplified: no wall-clock timestamps, this
    engine's own software name; word segmentation and String/
    ALTERNATIVE semantics preserved),
  * output/HtmlOutputWriter.java:28-81 — language-colored HTML with
    [norm/dipl] substitution marks,
  * the whitespace-layout sink of
    eval/BasicSingleDocumentEvaluatorAndOutputPrinter.java (WHITESPACE
    format): ``{n}`` pixel-gap annotations from charWidth/padWidth.

Pure functions LineDecode -> str, usable driver-side or inside a
pandas UDF as extra output columns.
"""

from __future__ import annotations

from typing import List, Sequence
from xml.sax.saxutils import escape, quoteattr

from ocular_spark.charset import HYPHEN, SPACE, is_punctuation_char, unescape_char
from ocular_spark.decoder import (
    LMRGN,
    LMRGN_HPHN,
    RMRGN,
    RMRGN_HPHN,
    RMRGN_HPHN_INIT,
    TMPL,
    LineDecode,
)
from ocular_spark.gsm import DOUBLED, NORMAL_CHAR
from ocular_spark.transcriptions import _ELIDED_TYPES


def whitespace_layout(
    decodes: Sequence[LineDecode], char_strs: Sequence[str], space_idx: int
) -> str:
    """`{n}` gap annotations (BasicSingleDocumentEvaluatorAndOutputPrinter,
    WHITESPACE block): spaces contribute charWidth, every state
    contributes padWidth."""
    out_lines = []
    for ld in decodes:
        buf: List[str] = []
        whitespace = 0
        for i in range(len(ld.states)):
            c = int(ld.glyph_chars[i])
            char_width = int(ld.widths[i]) - int(ld.pad_widths[i])
            if c == space_idx:
                whitespace += char_width
            else:
                if whitespace > 0:
                    buf.append("{%d}" % whitespace)
                    whitespace = 0
                buf.append(unescape_char(char_strs[c]))
            whitespace += int(ld.pad_widths[i])
        if whitespace > 0:
            buf.append("{%d}" % whitespace)
        out_lines.append("".join(buf))
    return "\n".join(out_lines) + "\n"


def _word_dipl_norm(word_states, char_strs):
    dipl_buf: List[str] = []
    norm_buf: List[str] = []
    for (gtype, glyph_c, lm_c, stype, _lang) in word_states:
        if gtype not in _ELIDED_TYPES:
            dipl_buf.append(unescape_char(char_strs[glyph_c]))
        if gtype != DOUBLED:
            if stype == RMRGN_HPHN_INIT:
                norm_buf.append(HYPHEN)
            elif stype in (RMRGN_HPHN, LMRGN_HPHN):
                pass
            elif stype in (LMRGN, RMRGN):
                norm_buf.append(SPACE)
            elif stype == TMPL:
                norm_buf.append(unescape_char(char_strs[lm_c]))
    return "".join(dipl_buf).strip(), "".join(norm_buf).strip()


def alto_xml(
    decodes: Sequence[LineDecode],
    char_strs: Sequence[str],
    lang_names: Sequence[str],
    space_idx: int,
    hyphen_idx: int,
    image_name: str = "page",
    output_normalized: bool = False,
) -> str:
    """Word-segmented ALTO v3 (AltoOutputWriter.write :40-236)."""
    buf: List[str] = []
    buf.append('<?xml version="1.0" encoding="UTF-8"?>')
    buf.append(
        '<alto xmlns="http://www.loc.gov/standards/alto/ns-v3#">'
    )
    buf.append("  <Description>")
    buf.append("    <MeasurementUnit>pixel</MeasurementUnit>")
    buf.append("    <sourceImageInformation>")
    buf.append("      <fileName>%s</fileName>" % escape(image_name))
    buf.append("    </sourceImageInformation>")
    buf.append("  </Description>")
    buf.append("  <Layout>")
    buf.append('    <Page ID=%s>' % quoteattr(image_name))
    buf.append("      <PrintSpace>")
    buf.append('        <TextBlock ID="par_1">')

    word_index = 0
    for line_no, ld in enumerate(decodes):
        buf.append('          <TextLine ID="line_%d">' % (line_no + 1))
        word: List[tuple] = []
        word_width = 0
        n = len(ld.states)
        for i in range(n + 1):
            if i < n:
                gtype = int(ld.glyph_types[i])
                glyph_c = int(ld.glyph_chars[i])
                lm_c = int(ld.lm_chars[i])
                stype = int(ld.types[i])
                lang = int(ld.langs[i])
                is_space = lm_c == space_idx and glyph_c == space_idx
                is_punct = lm_c != hyphen_idx and is_punctuation_char(char_strs[lm_c])
            else:
                is_space, is_punct = True, False
            # flush a completed word at a space/punct/line boundary
            if (is_space or is_punct or i == n) and word:
                dipl, norm = _word_dipl_norm(word, char_strs)
                if dipl:
                    lang_name = (
                        lang_names[word[0][4]] if word[0][4] >= 0 else "None"
                    )
                    content = norm if output_normalized else dipl
                    buf.append(
                        '            <String ID="word_%d" WIDTH="%d" CONTENT=%s LANG=%s'
                        % (word_index, word_width, quoteattr(content), quoteattr(lang_name))
                    )
                    if norm != dipl:
                        alt = dipl if output_normalized else norm
                        purpose = "Diplomatic" if output_normalized else "Normalization"
                        buf.append(
                            '              ><ALTERNATIVE PURPOSE="%s">%s</ALTERNATIVE></String>'
                            % (purpose, escape(alt))
                        )
                    else:
                        buf[-1] += "/>"
                    word_index += 1
                word = []
                word_width = 0
            if i < n and not is_space:
                word.append((gtype, glyph_c, lm_c, stype, int(ld.langs[i])))
                word_width += int(ld.widths[i])
        buf.append("          </TextLine>")
    buf.append("        </TextBlock>")
    buf.append("      </PrintSpace>")
    buf.append("    </Page>")
    buf.append("  </Layout>")
    buf.append("</alto>")
    return "\n".join(buf) + "\n"


def html_output(
    decodes: Sequence[LineDecode],
    char_strs: Sequence[str],
    lang_names: Sequence[str],
) -> str:
    """Language-colored HTML (HtmlOutputWriter.write :28-81)."""
    colors = [
        "Black", "Red", "Blue", "Olive", "Orange", "Magenta",
        "Lime", "Cyan", "Purple", "Green", "Brown",
    ]
    buf: List[str] = []
    buf.append('<HTML xmlns="http://www.w3.org/1999/xhtml" xml:lang="en" lang="en">')
    buf.append(
        '<HEAD><META http-equiv="Content-Type" content="text/html; charset=UTF-8"></HEAD>'
    )
    buf.append("<body>")
    prev_lang = -2
    for ld in decodes:
        for i in range(len(ld.states)):
            lm_c = int(ld.lm_chars[i])
            glyph_c = int(ld.glyph_chars[i])
            gtype = int(ld.glyph_types[i])
            sglyph = unescape_char(char_strs[glyph_c])
            lang = int(ld.langs[i])
            if lang != prev_lang:
                buf.append('<font color="%s">' % colors[(lang + 1) % len(colors)])
            if lm_c != glyph_c or gtype != NORMAL_CHAR:
                norm = unescape_char(char_strs[lm_c])
                dipl = (
                    "2x" + sglyph
                    if gtype == DOUBLED
                    else ("" if gtype in _ELIDED_TYPES else sglyph)
                )
                buf.append("[%s/%s]" % (escape(norm), escape(dipl)))
            else:
                buf.append(escape(sglyph))
            prev_lang = lang
        buf.append("</br>")
    buf.append("<br/><br/>")
    for i in range(-1, len(lang_names)):
        buf.append(
            '<font color="%s">%s</font></br>'
            % (colors[(i + 1) % len(colors)], "none" if i < 0 else lang_names[i])
        )
    buf.append("</body></html>")
    return "\n".join(buf) + "\n"
