"""span_lang_id / compaction_plan structural laws.

- span_lang_id: the per-row invariant (kind, media_ref, offset order
  preserved; media spans untouched with NULL votes) and the plan law
  (annotation happens inside the array projection — no join/sort/agg
  before the flatten).
- compaction_plan: prefix-sum binning's packing guarantee — every
  group's payload is < TARGET + its largest member (a group overshoots
  by at most the one file that straddles the boundary), groups are
  contiguous doc_id ranges per source.
"""

import os

import __spark_entry__ as entry_mod

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF = os.path.join(TESTDATA, "sf0.001")


def test_span_order_and_media_passthrough(spark):
    out = entry_mod.q_span_lang_id(spark, SF).toPandas()
    for doc_id, grp in out.groupby("doc_id"):
        grp = grp.sort_values("offset")
        assert list(grp["offset"]) == [0, 1, 2]
        assert list(grp["kind"]) == ["text", "media", "text"]
        media = grp[grp["kind"] == "media"].iloc[0]
        assert media["media_ref"] == f"m-{doc_id}"
        import pandas as pd

        assert pd.isna(media["lang_guess"]) and pd.isna(media["n_common"])
        text = grp[grp["kind"] == "text"]
        assert text["lang_guess"].isin(["common", "tech"]).all()


def test_span_annotation_is_projection_only(spark):
    df = entry_mod.q_span_lang_id(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for op in ("SortMergeJoin", "BroadcastHashJoin", "HashAggregate", "Sort "):
        assert op not in plan, (op, plan)


def test_compaction_groups_pack_to_target(spark):
    import pandas as pd

    out = entry_mod.q_compaction_plan(spark, SF).toPandas()
    docs = pd.read_parquet(os.path.join(SF, "documents.parquet"))
    max_file = int(docs["n_chars"].max())
    assert (out["bytes"] < entry_mod.COMPACT_TARGET + max_file).all()
    # per source: group ids contiguous from 0, doc ranges non-overlapping
    for source, grp in out.groupby("source"):
        grp = grp.sort_values("grp")
        assert grp["grp"].iloc[0] == 0
        assert (grp["first_doc"] <= grp["last_doc"]).all()
        prev_last = -1
        for r in grp.itertuples():
            assert r.first_doc > prev_last
            prev_last = r.last_doc
    # totals conserved: every file in exactly one group
    assert int(out["n_files"].sum()) == len(docs)
    assert int(out["bytes"].sum()) == int(docs["n_chars"].sum())
