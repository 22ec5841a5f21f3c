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
