"""c4_line_filter: injected markers trigger each C4 rule; kept lines
satisfy all line predicates; plan is a pure projection."""

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod


def test_c4_rules(spark, sf_dir):
    rows = {r.doc_id: r for r in
            entry_mod.q_c4_line_filter(spark, sf_dir).collect()}
    assert len(rows) == 500
    kept = [r for r in rows.values() if r.page_kept]
    dropped = [r for r in rows.values() if not r.page_kept]
    assert kept and dropped
    # page-level markers
    assert not rows[13].page_kept and rows[13].clean_text is None  # lorem
    assert not rows[27].page_kept  # curly brace
    for r in kept:
        assert r.clean_text is not None
        lines = r.clean_text.split("\n")
        assert len(lines) == r.n_kept_lines >= 3
        for l in lines:
            assert l[-1] in ".!?"
            assert len(l.split(" ")) >= 5
            assert "javascript" not in l
    # javascript docs (doc_id%7==0) lose their injected lines but can
    # still be page-kept — the line rule, not the page rule
    js = rows[0]
    assert js.n_kept_lines < js.n_lines


def test_c4_plan_is_projection(spark, sf_dir):
    plan = entry_mod.q_c4_line_filter(spark, sf_dir)._jdf.queryExecution() \
        .executedPlan().toString()
    for op in ("hashpartitioning", "Join", "Aggregate", "Python", "Sort"):
        assert op not in plan, op
