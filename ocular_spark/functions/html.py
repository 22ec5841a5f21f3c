"""Main-content extraction: HTML boilerplate strip + block-level DOM
heuristics (the north_rule's extraction surface), Spark-first.

One deterministic heuristic, two independent implementations:

* EXPRESSION path (``blocks_expr`` / ``main_content_cols``): pure JVM
  regex + array expressions — whole-stage-codegen'd, shuffle-free (a
  projection over the scan), DuckDB-mirrorable for the driver oracle.
  This is the 100 TB hot path: boilerplate stripping is per-row
  map-side work, so it scales embarrassingly with executors.
* DOM path (``main_content_kernel``): a real stdlib ``html.parser``
  tag walk inside an Arrow-batched ``mapInPandas`` kernel — the
  extensible form for tag soup, attribute heuristics, or per-tag-path
  rules that regexes can't express.  tests/test_html.py pins it
  block-for-block equal to the expression path, and the driver gate
  checks BOTH against the same DuckDB SQL oracle (two genuinely
  independent implementations against one oracle).

Heuristic (the public jusText / boilerpipe family — Pomikálek 2011,
Kohlschütter et al. WSDM 2010 — reduced to its deterministic core):
split the page into block-level segments (p, div, nav, footer, li,
h1), strip <script>/<style> outright, per block compute the
tag-stripped whitespace-collapsed text and its LINK LENGTH (total
anchor-text chars), and KEEP blocks with

    text_len >= MIN_TEXT_LEN  and  3 * link_len < text_len

(integer cross-multiplication for link_density < 1/3 — no float
compare to drift between engines).  Survivors join in document order.
Nested block elements split at the first block close — fine for the
flat fixture pages; the DOM kernel is the extension point for deep
nesting.

The fixture synthesizer (``wrap_boilerplate_*``) wraps each document's
text in a deterministic page: nav + ad-link <div> boilerplate, the
text tiled into <p> paragraphs (6 words each) with a share/like link
cluster after every 3rd paragraph, and a link-heavy footer — so the
extractor provably has to drop the link-dense blocks and keep the
content tiling.  Fixture text is plain lowercase words (no </&<
escaping needed; real pages would html-unescape after stripping).
"""

from __future__ import annotations

from typing import Iterator, List

MIN_TEXT_LEN = 20
BLOCK_TAGS = ("p", "div", "nav", "footer", "li", "h1")

_BLOCK_PAT = r"<(?:p|div|nav|footer|li|h1)[^>]*>(.*?)</(?:p|div|nav|footer|li|h1)>"
_ANCHOR_PAT = r"<a[^>]*>(.*?)</a>"

_NAV = (
    '<nav><a href="/">home</a> <a href="/a">about</a>'
    ' <a href="/c">contact</a></nav>'
)
_AD = (
    '<div class="ad"><a href="/b">buy</a> <a href="/n">now</a>'
    ' <a href="/d">deals</a></div>'
)
_SHARE = '<div><a href="/s">share</a> <a href="/l">like</a></div>'
_FOOTER = (
    '<footer><a href="/t">terms</a> <a href="/p">privacy</a>'
    " copyright 2024</footer>"
)


def wrap_boilerplate_spark(text_col: str = "text", id_col: str = "doc_id") -> str:
    """Spark SQL expression string: deterministic boilerplate page for
    a document (see module docstring).  Mirrored character-for-
    character by wrap_boilerplate_duckdb."""
    words = f"split({text_col}, ' ')"
    paras = (
        f"array_join(transform(sequence(1, greatest((size({words}) + 5) div 6, 1)),"
        f" i -> concat('<p>', array_join(slice({words}, (i-1)*6+1, 6), ' '), '</p>',"
        f" case when i % 3 = 0 then '{_SHARE}' else '' end)), '')"
    )
    return (
        f"concat('<html><head><title>', {id_col}, '</title>"
        f"<script>var x=1;</script></head><body>', '{_NAV}', '{_AD}', "
        f"{paras}, '{_FOOTER}</body></html>')"
    )


def wrap_boilerplate_duckdb(text_col: str = "text", id_col: str = "doc_id") -> str:
    """DuckDB twin of wrap_boilerplate_spark (|| concat, // int div,
    inclusive [a:b] list slices)."""
    words = f"string_split({text_col}, ' ')"
    paras = (
        f"array_to_string(list_transform(generate_series(1, greatest((len({words}) + 5) // 6, 1)),"
        f" i -> '<p>' || array_to_string({words}[(i-1)*6+1 : (i-1)*6+6], ' ') || '</p>'"
        f" || (case when i % 3 = 0 then '{_SHARE}' else '' end)), '')"
    )
    return (
        f"'<html><head><title>' || {id_col} || '</title>"
        f"<script>var x=1;</script></head><body>{_NAV}{_AD}' || "
        f"{paras} || '{_FOOTER}</body></html>'"
    )


def blocks_expr_spark(html_col: str) -> str:
    """Block-level segmentation as a Spark SQL expression: strip
    script/style, then extract block inner-HTML in document order
    (single alternation regex — one pass, no per-tag re-scan)."""
    cleaned = (
        f"regexp_replace(regexp_replace({html_col},"
        f" '<script[^>]*>.*?</script>', ' '), '<style[^>]*>.*?</style>', ' ')"
    )
    return f"regexp_extract_all({cleaned}, '{_BLOCK_PAT}', 1)"


def blocks_expr_duckdb(html_col: str) -> str:
    cleaned = (
        f"regexp_replace(regexp_replace({html_col},"
        f" '<script[^>]*>.*?</script>', ' ', 'g'), '<style[^>]*>.*?</style>', ' ', 'g')"
    )
    return f"regexp_extract_all({cleaned}, '{_BLOCK_PAT}', 1)"


_TXT_SPARK = "trim(regexp_replace(regexp_replace(b, '<[^>]*>', ' '), ' +', ' '))"
_LINK_SPARK = f"length(array_join(regexp_extract_all(b, '{_ANCHOR_PAT}', 1), ''))"
_TXT_DUCK = (
    "trim(regexp_replace(regexp_replace(b, '<[^>]*>', ' ', 'g'), ' +', ' ', 'g'))"
)
# COALESCE: DuckDB's array_to_string of an EMPTY extract list is NULL
# (Spark's array_join gives ''), and a NULL link_len would NULL the
# keep predicate and silently drop every anchor-free content block
_LINK_DUCK = (
    f"coalesce(length(array_to_string("
    f"regexp_extract_all(b, '{_ANCHOR_PAT}', 1), '')), 0)"
)


def stats_expr_spark(blocks_col: str) -> str:
    """(txt, link_len) struct per block."""
    return (
        f"transform({blocks_col}, b -> struct({_TXT_SPARK} as txt,"
        f" {_LINK_SPARK} as link_len))"
    )


def keep_pred_spark(s: str = "s") -> str:
    return f"length({s}.txt) >= {MIN_TEXT_LEN} and 3 * {s}.link_len < length({s}.txt)"


def main_content_sql_duckdb(html_expr: str) -> str:
    """DuckDB SELECT fragment computing (n_blocks, n_kept, main_text)
    from an html expression — the oracle for BOTH Spark paths."""
    blocks = blocks_expr_duckdb(html_expr)
    stats = (
        f"list_transform({blocks}, b -> {{'txt': {_TXT_DUCK},"
        f" 'link_len': {_LINK_DUCK}}})"
    )
    keep = (
        f"list_filter({stats}, s -> length(s.txt) >= {MIN_TEXT_LEN}"
        f" and 3 * s.link_len < length(s.txt))"
    )
    return (
        f"CAST(len({blocks}) AS BIGINT) AS n_blocks, "
        f"CAST(len({keep}) AS BIGINT) AS n_kept, "
        f"array_to_string(list_transform({keep}, s -> s.txt), ' ') AS main_text"
    )


def main_text_expr_spark(html_expr: str) -> str:
    """Full extraction as ONE Spark SQL scalar expression (usable
    inside an outer lambda, e.g. over each span of a spans array)."""
    stats = stats_expr_spark(blocks_expr_spark(html_expr))
    return (
        f"array_join(transform(filter({stats}, s -> {keep_pred_spark()}),"
        f" s -> s.txt), ' ')"
    )


def main_text_expr_duckdb(html_expr: str) -> str:
    blocks = blocks_expr_duckdb(html_expr)
    stats = (
        f"list_transform({blocks}, b -> {{'txt': {_TXT_DUCK},"
        f" 'link_len': {_LINK_DUCK}}})"
    )
    keep = (
        f"list_filter({stats}, s -> length(s.txt) >= {MIN_TEXT_LEN}"
        f" and 3 * s.link_len < length(s.txt))"
    )
    return f"array_to_string(list_transform({keep}, s -> s.txt), ' ')"


# fixed second text span for the interleaved strip_spans_html query:
# nav/footer boilerplate around one short content paragraph
APPENDIX_HTML = (
    "<html><body>" + _NAV + "<p>closing appendix notes section</p>"
    + _FOOTER + "</body></html>"
)


# ----------------------------------------------------------- DOM kernel

def extract_main_content_dom(html: str) -> tuple:
    """(n_blocks, n_kept, main_text) via a real html.parser DOM walk —
    same heuristic, independent implementation.  Tag boundaries inside
    a block contribute a space (mirroring the expression path's
    tag -> ' ' replacement) before whitespace collapse."""
    import re
    from html.parser import HTMLParser

    block_tags = set(BLOCK_TAGS)

    class _P(HTMLParser):
        def __init__(self) -> None:
            super().__init__()
            self.blocks: List[tuple] = []  # (raw_text, link_len)
            self._depth = 0  # nesting depth inside a block
            self._buf: List[str] = []
            self._link_len = 0
            self._in_anchor = 0
            self._skip = 0  # inside script/style

        def handle_starttag(self, tag, attrs):
            if tag in ("script", "style"):
                self._skip += 1
                return
            if self._skip:
                return
            if tag in block_tags:
                if self._depth == 0:
                    self._buf, self._link_len = [], 0
                else:
                    self._buf.append(" ")
                self._depth += 1
                return
            if self._depth:
                self._buf.append(" ")
                if tag == "a":
                    self._in_anchor += 1

        def handle_endtag(self, tag):
            if tag in ("script", "style"):
                self._skip = max(0, self._skip - 1)
                return
            if self._skip:
                return
            if tag in block_tags:
                if self._depth:
                    self._depth -= 1
                    if self._depth == 0:
                        self.blocks.append(("".join(self._buf), self._link_len))
                    else:
                        self._buf.append(" ")
                return
            if self._depth:
                self._buf.append(" ")
                if tag == "a":
                    self._in_anchor = max(0, self._in_anchor - 1)

        def handle_data(self, data):
            if self._skip:
                return
            if self._depth:
                self._buf.append(data)
                if self._in_anchor:
                    self._link_len += len(data)

    p = _P()
    p.feed(html)
    p.close()
    kept = []
    for raw, link_len in p.blocks:
        txt = re.sub(" +", " ", raw).strip()
        if len(txt) >= MIN_TEXT_LEN and 3 * link_len < len(txt):
            kept.append(txt)
    return len(p.blocks), len(kept), " ".join(kept)


def main_content_kernel(html_col: str = "html", id_col: str = "doc_id"):
    """mapInPandas kernel: rows (doc_id, html) ->
    (doc_id, n_blocks, n_kept, main_text), Arrow-batched (the html
    strings never round-trip through per-row Python UDF pickling)."""
    import pandas as pd

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for did, html in zip(pdf[id_col], pdf[html_col]):
                nb, nk, txt = extract_main_content_dom(html)
                rows.append((did, nb, nk, txt))
            yield pd.DataFrame(
                rows, columns=[id_col, "n_blocks", "n_kept", "main_text"]
            )

    return fn


MAIN_CONTENT_SCHEMA = (
    "doc_id long, n_blocks long, n_kept long, main_text string"
)
