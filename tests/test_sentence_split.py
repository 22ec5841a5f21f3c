"""sentence_split: reassembly invariant (sentences rejoin to the
marked text), abbreviation protection, and the no-shuffle plan."""

import __spark_entry__ as entry_mod


def test_sentences_reassemble_and_protect(spark, sf_dir):
    rows = entry_mod.q_sentence_split(spark, sf_dir).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc) == 500
    saw_eg = saw_multi = False
    for doc, rs in by_doc.items():
        rs.sort(key=lambda r: r.sent_idx)
        assert [r.sent_idx for r in rs] == list(range(len(rs)))
        for r in rs:
            assert r.n_chars == len(r.sentence)
            # a sentence never contains an internal terminator-space
            # boundary except inside the protected abbreviation
            core = r.sentence.replace("e.g.", "")
            for t in (". ", "! ", "? "):
                assert t not in core, (doc, r.sentence)
            if "e.g." in r.sentence:
                saw_eg = True
        if len(rs) > 1:
            saw_multi = True
            # every non-final sentence ends with a terminator
            for r in rs[:-1]:
                assert r.sentence[-1] in ".!?", r.sentence
    assert saw_eg and saw_multi


def test_plan_is_projection_generate(spark, sf_dir):
    plan = entry_mod.q_sentence_split(spark, sf_dir)._jdf.queryExecution() \
        .executedPlan().toString()
    # the only exchange allowed is _load_wide's deliberate round-robin
    # input rebalance — no data-dependent (hash/range) shuffle at all
    for op in ("hashpartitioning", "rangepartitioning", "Join",
               "Aggregate", "Python", "Sort"):
        assert op not in plan, op
