"""robots_filter: RFC 9309 longest-match precedence on the fixture,
all three outcomes present, and the rules side broadcast in the plan."""

from collections import Counter

import __spark_entry__ as entry_mod


def test_outcomes_and_precedence(spark, sf_dir):
    rows = entry_mod.q_robots_filter(spark, sf_dir).collect()
    assert len(rows) == 500
    by = {r.doc_id: r for r in rows}
    kinds = Counter(
        (r.decision, r.matched_rule is not None) for r in rows
    )
    assert kinds[("fetch", False)] > 0, "no-match fetch missing"
    assert kinds[("skip", True)] > 0, "disallow skip missing"
    assert kinds[("fetch", True)] > 0, "allow carve-out missing"
    for r in rows:
        sec = (r.doc_id // 3) % 5
        k = int(r.source[3:]) % 5
        if sec != k:
            assert r.decision == "fetch" and r.matched_rule is None
        elif str(r.doc_id).startswith("1"):
            # carve-out /sec<k>/item/1 is longer than /sec<k>/ -> allow
            assert r.decision == "fetch"
            assert r.matched_rule.endswith("/item/1")
        else:
            assert r.decision == "skip"
            assert r.matched_rule == f"/sec{k}/"
    assert by  # sanity


def test_rules_join_is_broadcast(spark, sf_dir):
    plan = entry_mod.q_robots_filter(spark, sf_dir)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
