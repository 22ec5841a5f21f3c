"""crawl_upsert: latest-wins merge semantics + the no-window plan
(declarative argmax must keep map-side partial aggregation)."""

import __spark_entry__ as entry_mod


def test_merge_semantics(spark, sf_dir):
    rows = {r.doc_id: r for r in
            entry_mod.q_crawl_upsert(spark, sf_dir).collect()}
    assert len(rows) == 550  # 500 urls + 50 discovered
    for doc_id, r in rows.items():
        if doc_id >= 100_000:
            assert (r.crawl_id, r.n_versions) == (1, 1)  # new url
        elif doc_id % 4 == 1:
            assert (r.crawl_id, r.n_versions) == (1, 2)  # refetched
            assert r.fetch_ts == 1_700_500_000 + doc_id
        else:
            assert (r.crawl_id, r.n_versions) == (0, 1)  # untouched


def test_plan_has_partial_agg_no_window(spark, sf_dir):
    plan = entry_mod.q_crawl_upsert(spark, sf_dir)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Window" not in plan
    # one hash-partial + one final aggregate around a single exchange
    assert "partial_" in plan, plan
