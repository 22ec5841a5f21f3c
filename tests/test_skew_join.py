"""Skew-salted shuffle join: the mechanics the driver gate can't see
(it only proves result equality with the plain join).

- the physical plan must be a SortMergeJoin whose keys include the
  salt (no broadcast — a broadcast would hide the skew problem);
- the mega-key's rows must actually SPREAD: after salting, the largest
  (k, salt) group is ~1/S of the unsalted mega-key group.
"""

import os

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF = os.path.join(TESTDATA, "sf0.001")


def test_plan_is_salted_sort_merge_join(spark):
    df = entry_mod.q_skew_join(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan
    smj = plan[plan.index("SortMergeJoin"):].splitlines()[0]
    assert "salt" in smj, smj


def test_salt_spreads_the_mega_key(spark):
    ev = entry_mod._skew_keyed_events(spark, SF)
    n = ev.count()
    unsalted_max = (
        ev.groupBy("k").count().agg(F.max("count")).collect()[0][0]
    )
    assert unsalted_max >= 0.6 * n, "fixture must actually be skewed"
    salted_max = (
        ev.withColumn(
            "salt", F.pmod(F.xxhash64("event_id"), F.lit(entry_mod.SKEW_NSALT))
        )
        .groupBy("k", "salt")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    # the hot key's rows spread across S sub-keys; allow 40% slack for
    # hash unevenness on the small fixture
    assert salted_max <= unsalted_max / entry_mod.SKEW_NSALT * 1.4, (
        unsalted_max,
        salted_max,
    )


def test_salting_preserves_per_key_multiplicity(spark):
    # joining the exploded dim on (k, salt) must hit EXACTLY one dim
    # row per event row — the semantics-preservation argument in
    # miniature, visible at row level rather than aggregate level
    ev = entry_mod._skew_keyed_events(spark, SF)
    dim = ev.select("k").distinct().select("k", (F.col("k") % 7).alias("category"))
    salted_ev = ev.withColumn(
        "salt", F.pmod(F.xxhash64("event_id"), F.lit(entry_mod.SKEW_NSALT))
    )
    salted_dim = dim.select(
        "k",
        "category",
        F.explode(
            F.sequence(F.lit(0), F.lit(entry_mod.SKEW_NSALT - 1))
        ).alias("salt"),
    ).withColumn("salt", F.col("salt").cast("long"))
    joined = salted_ev.hint("merge").join(salted_dim, ["k", "salt"])
    assert joined.count() == ev.count()
