"""Main-content extraction: HTML boilerplate strip + block-level DOM
heuristics (the north_rule's extraction surface), Spark-first.

One deterministic heuristic, two independent implementations:

* EXPRESSION path (``segments_expr_*`` / ``main_content_cols_spark``):
  pure JVM regex + array expressions — whole-stage-codegen'd,
  shuffle-free (a projection over the scan), DuckDB-mirrorable for the
  driver oracle.  This is the 100 TB hot path: boilerplate stripping
  is per-row map-side work, so it scales embarrassingly with
  executors.
* DOM path (``main_content_kernel``): a real stdlib ``html.parser``
  tag walk inside an Arrow-batched ``mapInPandas`` kernel — the
  extensible form for tag soup, exotic character references, or
  per-tag-path rules that regexes can't express.  tests/test_html.py
  pins it block-for-block equal to the expression path on flat,
  nested, and adversarial pages, and the driver gate checks BOTH
  against the same DuckDB SQL oracle (two genuinely independent
  implementations against one oracle).

Heuristic (the public jusText / boilerpipe family — Pomikálek 2011,
Kohlschütter et al. WSDM 2010 — reduced to its deterministic core):
segment the page into ATOMIC TEXT BLOCKS — the maximal text runs
between consecutive block-level tag boundaries (open OR close of
p/div/nav/footer/li/h1, any case, with or without attributes).  This
is boilerpipe's own block model and, unlike "inner HTML of a block
element", it is EXACT under arbitrary nesting: <div>intro<p>inner</p>
outer</div> yields the blocks [intro, inner, outer] from a regex
split and from a DOM walk alike (round-4 weak flag: the old
first-close regex truncated nested blocks; the DOM walk merged them —
the paths agreed only on flat pages).  <script>/<style> elements and
comments are stripped outright (→ one space), remaining non-block
tags inside a segment contribute a space, entities are unescaped, and
whitespace is collapsed.  Per block compute its text and its LINK
LENGTH (total anchor-text chars of anchors closed within the block)
and KEEP blocks with

    text_len >= MIN_TEXT_LEN  and  3 * link_len < text_len

(integer cross-multiplication for link_density < 1/3 — no float
compare to drift between engines).  Survivors join in document order.

Tag-name matching is ANCHORED (round-4 ADVICE: '<li' must not match
'<link ...>', '<p' must not match '<pre>'): a tag matches only when
the name is followed by '>' or a separator ([^a-zA-Z0-9>] — space,
tab, newline, or '/'), case-insensitively in both engines.

Entity handling: the expression path unescapes the five standard
XML/HTML entities (&lt; &gt; &quot; &#39;/&apos; &amp;, with &amp;
LAST so double-escaped text resolves one level, matching Python);
the DOM path inherits html.parser's convert_charrefs and therefore
handles the FULL named/numeric reference set — a documented
superset.  Route pages with exotic charrefs to the DOM kernel, or
extend the replace chain.

Known, documented divergences of the expression path on genuinely
malformed input (the DOM kernel mirrors the regex semantics where it
can): CDATA sections or comments containing '>' inside attribute-less
text are handled identically (comments are stripped with an explicit
(?s)<!--.*?--> pass), but a block-level tag opened INSIDE an anchor
voids that anchor's link accounting on both paths (an anchor counts
only if its open/close pair is segment-local — mirrored in the DOM
walk by discarding uncommitted anchor text at a block flush).

The fixture synthesizer (``wrap_boilerplate_*``) wraps each
document's text in a deterministic flat page: nav + ad-link <div>
boilerplate, the text tiled into <p> paragraphs (6 words each) with a
share/like link cluster after every 3rd paragraph, and a link-heavy
footer.  ``wrap_nested_*`` builds the adversarial variant the round-4
weak flag asked for: mixed-case block tags, three-deep div nesting
with text at every depth, a <link> head element (the tag-prefix
trap), a multi-part heading with entities, an entity-bearing anchor
in a link-dense sidebar, and a comment containing '>'.
"""

from __future__ import annotations

from typing import Iterator, List

MIN_TEXT_LEN = 20
BLOCK_TAGS = ("p", "div", "nav", "footer", "li", "h1")

# a tag NAME is anchored by '>' or a separator char (space/tab/
# newline//); written as an explicit negated class so the (?i) flag
# only case-folds the tag names, identically in Java regex and RE2
_SEP = "[^a-zA-Z0-9>]"
_ALT = "|".join(BLOCK_TAGS)
_BOUNDARY_PAT = f"(?i)</?(?:{_ALT})(?:>|{_SEP}[^>]*>)"
_SCRIPT_PAT = f"(?is)<script(?:>|{_SEP}[^>]*>).*?</script *>"
_STYLE_PAT = f"(?is)<style(?:>|{_SEP}[^>]*>).*?</style *>"
_COMMENT_PAT = "(?s)<!--.*?-->"
_TAG_PAT = "<[^>]*>"
_ANCHOR_PAT = f"(?is)<a(?:>|{_SEP}[^>]*>)(.*?)</a *>"
# real tab/newline/carriage-return characters embedded in the class —
# Spark SQL string literals eat single backslashes, so '\\s' is not
# portable between the Spark and DuckDB pattern literals
_WS_PAT = "[ \t\n\r]+"

# (&amp; LAST: '&amp;lt;' must become '&lt;', not '<')
ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
)

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


def _sql_quote(s: str) -> str:
    return s.replace("'", "''")


def _unescape_sql(x: str) -> str:
    """Entity unescape as a replace() chain — identical syntax and
    semantics in Spark SQL and DuckDB."""
    for ent, rep in ENTITIES:
        x = f"replace({x}, '{_sql_quote(ent)}', '{_sql_quote(rep)}')"
    return x


def _g(duck: bool) -> str:
    return ", 'g'" if duck else ""


def _cleaned_expr(html_col: str, duck: bool) -> str:
    """Strip <script>/<style> elements and comments (→ one space)
    before segmentation."""
    x = html_col
    for pat in (_SCRIPT_PAT, _STYLE_PAT, _COMMENT_PAT):
        x = f"regexp_replace({x}, '{pat}', ' '{_g(duck)})"
    return x


def segments_expr_spark(html_col: str) -> str:
    """Atomic text blocks: split the cleaned page at every block-tag
    boundary — one regex split, exact under arbitrary nesting."""
    return f"split({_cleaned_expr(html_col, False)}, '{_BOUNDARY_PAT}')"


def segments_expr_duckdb(html_col: str) -> str:
    return (
        f"regexp_split_to_array({_cleaned_expr(html_col, True)},"
        f" '{_BOUNDARY_PAT}')"
    )


def _txt_frag(duck: bool, var: str = "b") -> str:
    """Segment text: remaining (non-block) tags → space, unescape the
    standard entities, collapse whitespace, trim."""
    x = f"regexp_replace({var}, '{_TAG_PAT}', ' '{_g(duck)})"
    x = _unescape_sql(x)
    return f"trim(regexp_replace({x}, '{_WS_PAT}', ' '{_g(duck)}))"


def _link_frag(duck: bool, var: str = "b") -> str:
    """Anchor-text length: captures of segment-local <a>…</a> pairs,
    inline tags dropped (no space — they are markup, not link text),
    entities unescaped so '&amp;' counts 1 char as in the DOM walk."""
    if duck:
        # DuckDB's array_to_string of an EMPTY extract list is NULL
        # (Spark's array_join gives ''), and a NULL link_len would
        # NULL the keep predicate and drop every anchor-free block
        cap = (
            f"coalesce(array_to_string("
            f"regexp_extract_all({var}, '{_ANCHOR_PAT}', 1), ''), '')"
        )
    else:
        cap = f"array_join(regexp_extract_all({var}, '{_ANCHOR_PAT}', 1), '')"
    cap = f"regexp_replace({cap}, '{_TAG_PAT}', ''{_g(duck)})"
    return f"length({_unescape_sql(cap)})"


def stats_expr_spark(segments_col: str) -> str:
    """(txt, link_len) struct per NON-EMPTY segment — empty runs
    between adjacent tags are not blocks."""
    return (
        f"filter(transform({segments_col}, b -> struct("
        f"{_txt_frag(False)} as txt, {_link_frag(False)} as link_len)),"
        f" s -> s.txt != '')"
    )


def stats_expr_duckdb(segments_col: str) -> str:
    return (
        f"list_filter(list_transform({segments_col},"
        f" b -> {{'txt': {_txt_frag(True)}, 'link_len': {_link_frag(True)}}}),"
        f" s -> s.txt != '')"
    )


def keep_pred_spark(s: str = "s") -> str:
    return f"length({s}.txt) >= {MIN_TEXT_LEN} and 3 * {s}.link_len < length({s}.txt)"


def main_content_cols_spark(html_expr: str) -> dict:
    """The three output expressions (n_blocks, n_kept, main_text) for
    a Spark select over an html expression."""
    stats = stats_expr_spark(segments_expr_spark(html_expr))
    keep = f"filter({stats}, s -> {keep_pred_spark()})"
    return {
        "n_blocks": f"size({stats})",
        "n_kept": f"size({keep})",
        "main_text": f"array_join(transform({keep}, s -> s.txt), ' ')",
    }


def main_content_sql_duckdb(html_expr: str) -> str:
    """DuckDB SELECT fragment computing (n_blocks, n_kept, main_text)
    from an html expression — the oracle for BOTH Spark paths."""
    stats = stats_expr_duckdb(segments_expr_duckdb(html_expr))
    keep = (
        f"list_filter({stats}, s -> length(s.txt) >= {MIN_TEXT_LEN}"
        f" and 3 * s.link_len < length(s.txt))"
    )
    return (
        f"CAST(len({stats}) AS BIGINT) AS n_blocks, "
        f"CAST(len({keep}) AS BIGINT) AS n_kept, "
        # coalesce: DuckDB's array_to_string of an EMPTY list is NULL
        # (Spark's array_join gives '') — a zero-kept page must yield
        # '' in both engines
        f"coalesce(array_to_string(list_transform({keep}, s -> s.txt), ' '), '')"
        f" AS main_text"
    )


def main_text_expr_spark(html_expr: str) -> str:
    """Full extraction as ONE Spark SQL scalar expression (usable
    inside an outer lambda, e.g. over each span of a spans array)."""
    return main_content_cols_spark(html_expr)["main_text"]


def main_text_expr_duckdb(html_expr: str) -> str:
    stats = stats_expr_duckdb(segments_expr_duckdb(html_expr))
    keep = (
        f"list_filter({stats}, s -> length(s.txt) >= {MIN_TEXT_LEN}"
        f" and 3 * s.link_len < length(s.txt))"
    )
    return (
        f"coalesce(array_to_string(list_transform({keep}, s -> s.txt), ' '), '')"
    )


# ------------------------------------------------- fixture synthesizers

def wrap_boilerplate_spark(text_col: str = "text", id_col: str = "doc_id") -> str:
    """Spark SQL expression string: deterministic flat boilerplate
    page for a document (see module docstring).  Mirrored character-
    for-character by wrap_boilerplate_duckdb."""
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


# adversarial page parts (round-4 weak flag): mixed-case + attribute
# block tags, a <link> head element (tag-prefix trap for '<li'), a
# multiline script, entities in heading and anchor text, a comment
# containing '>', and three-deep block nesting with text at every
# depth — all deterministic per (doc_id, text)
_NESTED_HEAD = (
    '<head><link rel="stylesheet" href="/s.css">'
    "<style>p{color:red}</style>"
    "<script>\nvar y = 2;\nif (y > 1) { y = 0; }\n</script></head>"
)
_NESTED_SIDEBAR = (
    '<DIV class="sidebar"><li><a href="/x">tom &amp; jerry</a></li>'
    '<li><a href="/y">more &#39;links&#39;</a></li></DIV>'
)
_NESTED_COMMENT = "<!-- sidebar ends > main resumes -->"


def wrap_nested_spark(text_col: str = "text", id_col: str = "doc_id") -> str:
    """Adversarial nested/entity page: the document text tiled into
    <p> paragraphs INSIDE a three-deep mixed-case div structure with
    intro/outro text at the outer depths, an entity-bearing heading,
    a link-dense sidebar, and comment/script/tag-prefix traps."""
    words = f"split({text_col}, ' ')"
    paras = (
        f"array_join(transform(sequence(1, greatest((size({words}) + 5) div 6, 1)),"
        f" i -> concat('<p>', array_join(slice({words}, (i-1)*6+1, 6), ' '), '</p>')), '')"
    )
    return (
        f"concat('<html>{_sql_quote(_NESTED_HEAD)}<body>"
        f"<DIV class=\"article\">"
        f"<h1>heading &lt;no. ', {id_col}, '&gt; tom &amp; jerry</h1>"
        f"article intro text at depth one"
        f"<div class=\"bd\">body preamble at depth two<Div id=\"inner\">', "
        f"{paras}, "
        f"'</Div>body postscript at depth two</div>"
        f"{_sql_quote(_NESTED_SIDEBAR)}{_sql_quote(_NESTED_COMMENT)}"
        f"</DIV>{_sql_quote(_FOOTER)}</body></html>')"
    )


def wrap_nested_duckdb(text_col: str = "text", id_col: str = "doc_id") -> str:
    words = f"string_split({text_col}, ' ')"
    paras = (
        f"array_to_string(list_transform(generate_series(1, greatest((len({words}) + 5) // 6, 1)),"
        f" i -> '<p>' || array_to_string({words}[(i-1)*6+1 : (i-1)*6+6], ' ') || '</p>'), '')"
    )
    return (
        f"'<html>{_sql_quote(_NESTED_HEAD)}<body>"
        f"<DIV class=\"article\">"
        f"<h1>heading &lt;no. ' || {id_col} || '&gt; tom &amp; jerry</h1>"
        f"article intro text at depth one"
        f"<div class=\"bd\">body preamble at depth two<Div id=\"inner\">' || "
        f"{paras} || "
        f"'</Div>body postscript at depth two</div>"
        f"{_sql_quote(_NESTED_SIDEBAR)}{_sql_quote(_NESTED_COMMENT)}"
        f"</DIV>{_sql_quote(_FOOTER)}</body></html>'"
    )


# fixed second text span for the interleaved strip_spans_html query:
# nav/footer boilerplate around one short content paragraph
APPENDIX_HTML = (
    "<html><body>" + _NAV + "<p>closing appendix notes section</p>"
    + _FOOTER + "</body></html>"
)


# ----------------------------------------------------------- DOM kernel

def extract_main_content_dom(html: str) -> tuple:
    """(n_blocks, n_kept, main_text) via a real html.parser walk —
    same atomic-text-block heuristic, independent implementation.

    Semantics mirrored from the expression path (see module
    docstring): every block-tag boundary flushes the current text run
    as a block; script/style/comment/decl each contribute one space;
    other tags inside a run contribute a space; anchor text counts
    toward link_len only when the anchor CLOSES within the same block
    (uncommitted anchor text is discarded at a flush).  Entities are
    unescaped by the parser itself (convert_charrefs — the full
    charref set, a documented superset of the expression path's five
    standard entities)."""
    import re
    from html.parser import HTMLParser

    block_tags = set(BLOCK_TAGS)

    class _P(HTMLParser):
        def __init__(self) -> None:
            super().__init__(convert_charrefs=True)
            self.segs: List[tuple] = []  # (raw_text, link_len)
            self._buf: List[str] = []
            self._link_len = 0
            self._pending: List[str] = []  # anchor text awaiting </a>
            self._in_anchor = 0
            self._skip = 0  # inside script/style

        def _flush(self) -> None:
            self.segs.append(("".join(self._buf), self._link_len))
            self._buf, self._link_len = [], 0
            # a block boundary inside an anchor voids the pair
            # (mirrors the regex: pairs must be segment-local)
            self._pending, self._in_anchor = [], 0

        def _gap(self) -> None:
            """script/style/comment/decl → one space (they were
            replaced by ' ' BEFORE segmentation in the expression
            path, so inside an anchor they count as link text)."""
            self._buf.append(" ")
            if self._in_anchor:
                self._pending.append(" ")

        def handle_starttag(self, tag, attrs):
            if tag in ("script", "style"):
                if not self._skip:
                    self._gap()
                self._skip += 1
                return
            if self._skip:
                return
            if tag in block_tags:
                self._flush()
                return
            self._buf.append(" ")
            # a nested '<a>' inside an open anchor is just a stripped
            # tag (the regex captures first-open .. first-close)
            if tag == "a" and not self._in_anchor:
                self._in_anchor = 1
                self._pending = []

        def handle_endtag(self, tag):
            if tag in ("script", "style"):
                self._skip = max(0, self._skip - 1)
                return
            if self._skip:
                return
            if tag in block_tags:
                self._flush()
                return
            self._buf.append(" ")
            # first '</a>' commits (regex: first-open .. first-close);
            # a stray close with no open commits nothing
            if tag == "a" and self._in_anchor:
                self._in_anchor = 0
                self._link_len += len("".join(self._pending))
                self._pending = []

        def handle_data(self, data):
            if self._skip:
                return
            self._buf.append(data)
            if self._in_anchor:
                self._pending.append(data)

        def handle_comment(self, data):
            if not self._skip:
                self._gap()

        def handle_decl(self, decl):
            if not self._skip:
                self._gap()

        def handle_pi(self, data):
            if not self._skip:
                self._gap()

        def unknown_decl(self, data):
            if not self._skip:
                self._gap()

    p = _P()
    p.feed(html)
    p.close()
    p._flush()  # trailing run
    blocks = []
    for raw, link_len in p.segs:
        txt = re.sub(r"[ \t\n\r]+", " ", raw).strip()
        if txt:
            blocks.append((txt, link_len))
    kept = [
        txt
        for txt, link_len in blocks
        if len(txt) >= MIN_TEXT_LEN and 3 * link_len < len(txt)
    ]
    return len(blocks), len(kept), " ".join(kept)


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


# ------------------------------------------------------- link graph
# Deterministic doc->doc "related articles" links for the web-graph
# operators (anchor extraction + PageRank): each page gets the
# standard nav/footer boilerplate anchors PLUS three links to
# /doc/{(doc_id*a+c) % LINK_UNIVERSE}.  The same arithmetic is
# replayed by the DuckDB oracle, so the extracted edge list is pinned
# end-to-end (page synthesis -> regex extraction -> graph).
LINK_UNIVERSE = 500
LINK_RULES = ((7, 1), (13, 3), (29, 11))

# full anchor elements (group 0) and href values; no backslashes, so
# the literals survive both Spark SQL and DuckDB quoting unchanged
ANCHOR_FULL_PAT = f"(?is)<a(?:>|{_SEP}[^>]*>).*?</a *>"
HREF_PAT = 'href="([^"]*)"'
DOC_HREF_PAT = 'href="/doc/([0-9]+)"'


def wrap_links_spark(text_col: str = "text", id_col: str = "doc_id") -> str:
    """Page synthesis for the link-graph fixtures (identical string in
    Spark and DuckDB: CASE-free || concatenation only)."""
    rel = " || ".join(
        f"'<a href=\"/doc/' || (({id_col} * {a} + {c}) % {LINK_UNIVERSE})"
        f" || '\">see article ' || (({id_col} * {a} + {c}) % {LINK_UNIVERSE})"
        f" || '</a> '"
        for a, c in LINK_RULES
    )
    return (
        f"'{_sql_quote(_NAV)}<p>' || {text_col} || '</p>"
        f"<nav class=\"rel\">' || {rel} || '</nav>{_sql_quote(_FOOTER)}'"
    )


def wrap_links_duckdb(text_col: str = "text", id_col: str = "doc_id") -> str:
    return wrap_links_spark(text_col, id_col)


# --------------------------------------------- crawl metadata fixtures

# head-metadata extraction patterns: no backslashes, identical Java /
# RE2 semantics, group(1) with '' on no-match in BOTH engines (pinned
# by tests/test_html.py::test_meta_missing_description)
TITLE_PAT = "<title>([^<]*)</title>"
DESC_PAT = '<meta name="description" content="([^"]*)"'
CANON_PAT = '<link rel="canonical" href="([^"]*)"'
LANG_PAT = '<html lang="([^"]*)"'
A_OPEN_PAT = "<a href"


def wrap_meta(
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    source_col: str = "source",
) -> str:
    """Deterministic crawl-page head for the metadata-extraction row:
    html@lang, a title from the first 3 words, a meta description from
    the first 8 words — OMITTED on every 5th doc so the no-match path
    is exercised at corpus scale — a canonical link derived from
    (source, doc_id), and a body whose anchor count varies by doc.
    One string, valid verbatim in Spark SQL AND DuckDB (|| concat,
    shared CASE syntax, first-N-words via regexp instead of engine-
    specific list slicing)."""
    w3 = f"regexp_extract({text_col}, '^([a-z]+ [a-z]+ [a-z]+)', 1)"
    w8 = (
        f"regexp_extract({text_col}, "
        f"'^([a-z]+(?: [a-z]+){{0,7}})', 1)"
    )
    desc = (
        f"CASE WHEN {id_col} % 5 = 0 THEN '' ELSE "
        f"'<meta name=\"description\" content=\"' || {w8} || '\">' END"
    )
    extra_a = (
        f"CASE WHEN {id_col} % 3 = 0 THEN "
        f"'<a href=\"/extra/' || {id_col} || '\">extra</a>' ELSE '' END"
    )
    return (
        f"'<html lang=\"' || {lang_col} || '\"><head><title>' || {w3} ||"
        f" ' | example.com</title>' || {desc} ||"
        f" '<link rel=\"canonical\" href=\"https://example.com/' ||"
        f" {source_col} || '/' || {id_col} || '\">"
        f"<meta property=\"og:type\" content=\"article\"></head><body>"
        f"{_sql_quote(_NAV)}<p>' || {text_col} || '</p>' || {extra_a} ||"
        f" '{_sql_quote(_FOOTER)}</body></html>'"
    )


def meta_cols(html_col: str, size_fn: str = "size") -> dict:
    """Extraction expressions over a metadata page — shared by the
    Spark projection and the DuckDB oracle (pass size_fn='len' for
    DuckDB's list-length spelling)."""
    return {
        "title": f"regexp_extract({html_col}, '{TITLE_PAT}', 1)",
        "description": f"regexp_extract({html_col}, '{DESC_PAT}', 1)",
        "canonical": f"regexp_extract({html_col}, '{CANON_PAT}', 1)",
        "lang_attr": f"regexp_extract({html_col}, '{LANG_PAT}', 1)",
        "n_links": (
            f"{size_fn}(regexp_extract_all({html_col}, '{A_OPEN_PAT}', 0))"
        ),
    }


def anchors_expr(html_col: str) -> str:
    """Array of full <a>...</a> elements — Spark regexp_extract_all
    and DuckDB regexp_extract_all share this call shape for group 0."""
    return f"regexp_extract_all({html_col}, '{ANCHOR_FULL_PAT}', 0)"


def doc_links_expr(html_col: str) -> str:
    """Array of /doc/NNN link targets (group 1 captures)."""
    return f"regexp_extract_all({html_col}, '{DOC_HREF_PAT}', 1)"
