"""Main-content extraction tests: expression path == DOM path, the
boilerplate actually drops, the content round-trips, and the plan is
a pure projection."""

import pytest

import __spark_entry__ as entry_mod
from ocular_spark.functions import html as H


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def extracted(spark, sf_dir):
    expr = {
        r.doc_id: r
        for r in entry_mod.q_html_main_content(spark, sf_dir).collect()
    }
    dom = {
        r.doc_id: r
        for r in entry_mod.q_html_main_content_dom(spark, sf_dir).collect()
    }
    return expr, dom


def test_dom_and_expression_paths_agree(extracted):
    """Two independent implementations (regex pipeline vs html.parser
    walk) must agree on every document: block counts, kept counts,
    and the extracted text byte-for-byte."""
    expr, dom = extracted
    assert set(expr) == set(dom) and len(expr) == 500
    for did in expr:
        e, d = expr[did], dom[did]
        assert (e.n_blocks, e.n_kept, e.main_text) == (
            d.n_blocks,
            d.n_kept,
            d.main_text,
        ), did


def test_boilerplate_dropped_content_round_trips(spark, sf_dir):
    """The extractor must drop every synthesized boilerplate block
    (nav, ad links, share/like clusters, footer) and keep exactly the
    content paragraphs >= MIN_TEXT_LEN chars — i.e. main_text equals
    an independent pure-Python re-chunking of the source text."""
    import os

    import pyarrow.parquet as pq

    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet")).to_pandas()
    got = {
        r.doc_id: r.main_text
        for r in entry_mod.q_html_main_content(spark, sf_dir).collect()
    }
    for r in docs.itertuples():
        words = str(r.text).split(" ")
        paras = [
            " ".join(words[i : i + 6]) for i in range(0, max(len(words), 1), 6)
        ]
        want = " ".join(p for p in paras if len(p) >= H.MIN_TEXT_LEN)
        txt = got[r.doc_id]
        assert txt == want, (r.doc_id, txt, want)
        for boiler in ("home about contact", "buy now deals", "share like",
                       "terms privacy copyright"):
            assert boiler not in txt


def test_strip_spans_preserves_interleaved_order(spark, sf_dir):
    """north_rule invariant: (kind, text, media_ref, offset) sequence
    preserved — media spans pass through untouched between the two
    extracted text spans."""
    rows = entry_mod.q_strip_spans_html(spark, sf_dir).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc) == 500
    for did, sp in by_doc.items():
        sp.sort(key=lambda r: r.offset)
        assert [r.kind for r in sp] == ["text", "media", "text"]
        assert sp[1].media_ref == f"m-{did}" and sp[1].text is None
        assert sp[2].text == "closing appendix notes section"
        for r in sp:
            assert "<" not in (r.text or "")


def test_nested_fixture_paths_agree(spark, sf_dir):
    """Round-4 weak flag: the two-implementation gate must hold on
    NESTED + ENTITY-BEARING pages, not just the flat fixture — block
    counts, kept counts, and text byte-for-byte on the adversarial
    wrap_nested_* pages (mixed-case tags, 3-deep nesting, <link>
    trap, entities, comment containing '>')."""
    expr = {
        r.doc_id: r
        for r in entry_mod.q_html_main_content_nested(spark, sf_dir).collect()
    }
    dom = {
        r.doc_id: r
        for r in entry_mod.q_html_main_content_nested_dom(spark, sf_dir).collect()
    }
    assert set(expr) == set(dom) and len(expr) == 500
    for did in expr:
        e, d = expr[did], dom[did]
        assert (e.n_blocks, e.n_kept, e.main_text) == (
            d.n_blocks,
            d.n_kept,
            d.main_text,
        ), did
    # the nested page's depth-one/-two content and unescaped heading
    # survive; sidebar links, footer, script and comment do not
    some = expr[min(expr)]
    assert "tom & jerry" in some.main_text  # &amp; unescaped, h1 kept
    assert "article intro text at depth one" in some.main_text
    assert "body preamble at depth two" in some.main_text
    assert "body postscript at depth two" in some.main_text
    for boiler in ("more 'links'", "terms", "privacy", "var y", "sidebar ends"):
        assert boiler not in some.main_text


# hand-pinned adversarial cases: (html, n_blocks, n_kept, main_text).
# Each exercises one divergence class the round-4 flat fixture never
# reached; expectations computed BY HAND from the documented
# atomic-text-block semantics, then asserted identical across the
# DOM walk, the Spark expression path, and the DuckDB oracle fragment.
ADVERSARIAL_CASES = [
    # nesting: text at every depth becomes its own block
    (
        "<div>intro text at depth one<p>inner paragraph body text</p>"
        "outer closing remark text</div>",
        3, 3,
        "intro text at depth one inner paragraph body text"
        " outer closing remark text",
    ),
    # tag-prefix traps: <link> is not <li..., <pre> is not <p...
    (
        '<body><link rel="x"><pre>not a paragraph trap</pre>'
        "<p>a real paragraph of text</p></body>",
        2, 2,
        "not a paragraph trap a real paragraph of text",
    ),
    # mixed-case block tags with attributes
    (
        '<DIV CLASS="a">mixed case block tags work</DIV>',
        1, 1,
        "mixed case block tags work",
    ),
    # entities incl. the double-escape one-level rule
    (
        "<p>tom &amp; jerry &lt;3 &amp;lt;escaped&amp;gt;"
        " &quot;q&quot; &#39;s&#39;</p>",
        1, 1,
        'tom & jerry <3 &lt;escaped&gt; "q" \'s\'',
    ),
    # link-density drop: long anchor vs short tail
    (
        '<p><a href="/x">a much longer link text</a> tail</p>',
        1, 0,
        "",
    ),
    # link-density keep: short anchor inside long content
    (
        '<p><a href="/x">short link</a> surrounding content text here</p>',
        1, 1,
        "short link surrounding content text here",
    ),
    # comment containing '>' must not truncate the strip
    (
        "<p>before</p><!-- comment > tricky -->"
        "<p>after the comment block text</p>",
        2, 1,
        "after the comment block text",
    ),
    # multiline script whose body contains '>' and fake tags
    (
        "<p>keep this paragraph of text</p><script>\n"
        'if (1 > 0) { x = "<p>fake</p>"; }\n'
        "</script><p>second real paragraph text</p>",
        2, 2,
        "keep this paragraph of text second real paragraph text",
    ),
    # self-closing block tag is a single boundary
    (
        "<p>first block of text here</p><p/>"
        "<p>second block of text here</p>",
        2, 2,
        "first block of text here second block of text here",
    ),
    # block boundary inside an anchor voids the pair on both paths
    (
        '<p>intro <a href="/x">link start<p>continuation of anchor'
        " text</p>tail</a></p>",
        3, 1,
        "continuation of anchor text",
    ),
]


def test_adversarial_cases_pinned_all_three_engines(spark):
    """DOM walk == Spark expression == DuckDB oracle == hand-computed
    expectation, per adversarial case."""
    import duckdb

    from pyspark.sql import functions as F

    # DOM (pure function)
    for html, nb, nk, txt in ADVERSARIAL_CASES:
        assert H.extract_main_content_dom(html) == (nb, nk, txt), html

    # Spark expression path, one DF for all cases
    df = spark.createDataFrame(
        [(i, h) for i, (h, *_ ) in enumerate(ADVERSARIAL_CASES)],
        "doc_id long, html string",
    )
    cols = H.main_content_cols_spark("html")
    got = {
        r.doc_id: (r.n_blocks, r.n_kept, r.main_text)
        for r in df.select(
            "doc_id",
            F.expr(cols["n_blocks"]).cast("long").alias("n_blocks"),
            F.expr(cols["n_kept"]).cast("long").alias("n_kept"),
            F.expr(cols["main_text"]).alias("main_text"),
        ).collect()
    }
    for i, (html, nb, nk, txt) in enumerate(ADVERSARIAL_CASES):
        assert got[i] == (nb, nk, txt), html

    # DuckDB oracle fragment
    con = duckdb.connect()
    for html, nb, nk, txt in ADVERSARIAL_CASES:
        lit = "'" + html.replace("'", "''") + "'"
        row = con.execute(
            f"SELECT {H.main_content_sql_duckdb(lit)}"
        ).fetchone()
        assert row == (nb, nk, txt), html


def test_extraction_plan_is_projection(spark, sf_dir):
    """Wrap + segment + score + join-survivors is ONE map-side
    projection: no join, no sort, no window, no aggregate; the only
    exchange allowed is _load_wide's gated small-file repartition."""
    plan = _plan(entry_mod.q_html_main_content(spark, sf_dir))
    for bad in ("Join", "Sort", "Window", "Aggregate"):
        assert bad not in plan, bad
    exchanges = [l for l in plan.splitlines() if "Exchange" in l]
    assert all("RoundRobinPartitioning" in l or "AQEShuffleRead" in l
               for l in exchanges), exchanges


def test_span_dedup_drops_boilerplate_keeps_content(spark, sf_dir):
    """Cross-doc span dedup: the nav/ad/share/footer blocks (same
    exact text in all 500 docs) are dropped from every doc, the
    per-doc unique title block and content paragraphs survive with
    their ORIGINAL offsets, and media spans pass through untouched."""
    rows = entry_mod.q_span_dedup(spark, sf_dir).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc) == 500
    dropped_some = 0
    for did, sp in by_doc.items():
        sp.sort(key=lambda r: r.offset)
        # exactly one media span, last in offset order, untouched
        media = [r for r in sp if r.kind == "media"]
        assert len(media) == 1
        assert media[0].media_ref == f"m-{did}" and media[0].text is None
        assert media[0].offset == max(r.offset for r in sp)
        # offsets are a strict subsequence of the original 0..n ints:
        # strictly increasing with gaps exactly where spans dropped
        offs = [r.offset for r in sp]
        assert offs == sorted(set(offs))
        if len(offs) < offs[-1] + 1:
            dropped_some += 1
        # the title block (contains the doc_id, unique per doc) kept
        assert any(str(did) in (r.text or "") for r in sp), did
        # no universal boilerplate text survives
        for r in sp:
            assert (r.text or "") != "home news sports opinion subscribe now"
    assert dropped_some == 500  # every doc had boilerplate removed


def test_span_dedup_serving_side_is_broadcast_anti_join(spark, sf_dir):
    """At 10^12 docs the flat span table is huge and the frequent-block
    set is tiny: the anti-join must broadcast the frequent set, never
    shuffle the span table on the join key."""
    plan = _plan(entry_mod.q_span_dedup(spark, sf_dir))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    # the only hash exchanges belong to the doc-frequency AGGREGATION
    # (8-byte hash keys), not to the serving join
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "xxhash64" in line or "h#" in line, line


def test_html_tables_extraction(spark):
    """Table extraction: attribute-bearing tags, th+td mix, inline
    markup stripped, whitespace collapsed; the non-greedy flat-table
    match is pinned on a nested table (documented DOM-kernel route)."""
    import pandas as pd

    pages = pd.DataFrame({
        "doc_id": [0, 1],
        "html": [
            '<TABLE class="x"><tr><th> A </th><td><i>b</i>  c</td></tr>'
            "<tr><td>d</td></tr></table>",
            # nested: the inner </table> closes the non-greedy match,
            # so the outer table's trailing row is NOT extracted —
            # the documented flat-only contract
            "<table><tr><td>out</td><td><table><tr><td>in</td></tr>"
            "</table></td></tr><tr><td>tail</td></tr></table>",
        ],
    })
    from pyspark.sql import functions as F

    tbls = F.regexp_extract_all(
        F.col("html"), F.lit(r"(?is)<table[^>]*>(.*?)</table>"), 1
    )
    t = spark.createDataFrame(pages).select(
        "doc_id", F.posexplode(tbls).alias("table_idx", "tbl")
    )
    trs = F.regexp_extract_all(
        F.col("tbl"), F.lit(r"(?is)<tr[^>]*>(.*?)</tr>"), 1
    )
    r = t.select("doc_id", "table_idx",
                 F.posexplode(trs).alias("row_idx", "row"))
    cells = F.transform(
        F.regexp_extract_all(
            F.col("row"), F.lit(r"(?is)<t[dh][^>]*>(.*?)</t[dh]>"), 1
        ),
        lambda c: F.trim(F.regexp_replace(
            F.regexp_replace(c, "<[^>]*>", ""), "[ \t\n\r]+", " ")),
    )
    rows = r.select("doc_id", "table_idx", "row_idx",
                    F.array_join(cells, "|").alias("cell_text")).collect()
    got = {(x.doc_id, x.table_idx, x.row_idx): x.cell_text for x in rows}
    assert got[(0, 0, 0)] == "A|b c"
    assert got[(0, 0, 1)] == "d"
    # nested page: exactly one (truncated) table row survives the
    # flat-only match — behavior pinned, not hidden
    doc1 = {k: v for k, v in got.items() if k[0] == 1}
    assert doc1 == {(1, 0, 0): "out|in"}


def test_meta_missing_description(spark):
    """The html_metadata no-match contract: every 5th page omits the
    meta description and regexp_extract group 1 must come back ''
    (never NULL) in BOTH engines; anchor counts follow the fixture
    arithmetic (5 boilerplate links, +1 extra when doc_id % 3 = 0)."""
    import duckdb
    import pandas as pd
    from pyspark.sql import functions as F

    from ocular_spark.functions import html as H

    docs = pd.DataFrame({
        "doc_id": [0, 3, 5, 7],
        "text": ["alpha beta gamma delta epsilon zeta eta theta iota"] * 4,
        "lang": ["en", "de", "es", "zh"],
        "source": ["web", "web", "news", "web"],
    })
    cols = H.meta_cols("html", size_fn="size")
    sdf = (
        spark.createDataFrame(docs)
        .select("doc_id",
                F.expr(H.wrap_meta("text", "doc_id", "lang", "source"))
                .alias("html"))
        .select("doc_id",
                F.expr(cols["description"]).alias("description"),
                F.expr(cols["title"]).alias("title"),
                F.expr(cols["n_links"]).alias("n_links"))
    )
    got = {r.doc_id: r for r in sdf.collect()}
    # doc 0 and 5: no description -> empty string, not NULL
    assert got[0].description == "" and got[5].description == ""
    assert got[3].description == (
        "alpha beta gamma delta epsilon zeta eta theta")
    assert got[7].title == "alpha beta gamma | example.com"
    # 3 nav + 2 footer (+1 extra on doc_id % 3 == 0)
    assert got[7].n_links == 5 and got[0].n_links == 6
    assert got[3].n_links == 6

    # DuckDB twin over the SAME fragment strings
    con = duckdb.connect()
    con.register("documents", docs)
    dc = H.meta_cols(
        "(" + H.wrap_meta("text", "doc_id", "lang", "source") + ")",
        size_fn="len")
    rows = con.execute(
        "SELECT doc_id, " + dc["description"] + " AS description, "
        + dc["n_links"] + " AS n_links FROM documents ORDER BY doc_id"
    ).fetchall()
    assert [(r[1], r[2]) for r in rows] == [
        (got[i].description, got[i].n_links) for i in (0, 3, 5, 7)]
