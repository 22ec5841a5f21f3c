"""funnel_steps / retention_cohorts: edge semantics the sf-data drive
can't distinguish.

funnel: strictly-increasing-time ordered matching — clicks BEFORE the
first view must not count, a click at the SAME microsecond as the view
must not count (strict >), and the fold must pick the EARLIEST feasible
chain.  retention: the week_offset=0 cell of every cohort equals the
cohort size (every user is active in their own first week).
"""
from pyspark.sql import functions as F

from __spark_entry__ import q_retention_cohorts


def _fold(spark, rows):
    """Run the exact production fold over hand-built (user, type, us)."""
    from __spark_entry__ import FUNNEL_STEPS

    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, us long"
    ).where(F.col("event_type").isin(*FUNNEL_STEPS))
    per_user = ev.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("us", "event_type"))).alias("seq")
    )
    out = per_user.select(
        "user_id",
        F.expr(
            """
            aggregate(
              seq,
              named_struct('t1', -1L, 't2', -1L, 't3', -1L),
              (acc, x) -> named_struct(
                't1', CASE WHEN acc.t1 = -1L AND x.event_type = 'view'
                           THEN x.us ELSE acc.t1 END,
                't2', CASE WHEN acc.t2 = -1L AND acc.t1 <> -1L
                                AND x.event_type = 'click'
                                AND x.us > acc.t1
                           THEN x.us ELSE acc.t2 END,
                't3', CASE WHEN acc.t3 = -1L AND acc.t2 <> -1L
                                AND x.event_type = 'purchase'
                                AND x.us > acc.t2
                           THEN x.us ELSE acc.t3 END))
            """
        ).alias("f"),
    ).collect()
    return {r["user_id"]: (r["f"]["t1"], r["f"]["t2"], r["f"]["t3"])
            for r in out}


def test_funnel_edge_semantics(spark):
    rows = [
        # u1: clean complete funnel, earliest chain (10, 20, 30) even
        # though later alternatives exist
        (1, "view", 10), (1, "click", 20), (1, "purchase", 30),
        (1, "view", 15), (1, "click", 25), (1, "purchase", 40),
        # u2: click BEFORE the first view -> must not count; the later
        # click does
        (2, "click", 5), (2, "view", 10), (2, "click", 50),
        # u3: click at the SAME us as the view -> strict > rejects it
        (3, "view", 10), (3, "click", 10),
        # u4: purchase before click -> funnel stops at step 2
        (4, "view", 1), (4, "purchase", 2), (4, "click", 3),
        # u5: purchase AFTER the late click still completes
        (5, "view", 1), (5, "purchase", 2), (5, "click", 3),
        (5, "purchase", 9),
        # u6: no view at all -> nothing counts
        (6, "click", 1), (6, "purchase", 2),
    ]
    got = _fold(spark, rows)
    assert got[1] == (10, 20, 30)
    assert got[2] == (10, 50, -1)
    assert got[3] == (10, -1, -1)
    assert got[4] == (1, 3, -1)
    assert got[5] == (1, 3, 9)
    assert got[6] == (-1, -1, -1)


def test_retention_week0_equals_cohort_size(spark, sf_dir):
    rows = q_retention_cohorts(spark, sf_dir).collect()
    assert rows
    week0 = {r["cohort_week"]: (r["n_active"], r["cohort_size"])
             for r in rows if r["week_offset"] == 0}
    # every cohort has its offset-0 cell and it equals the cohort size
    cohorts = {r["cohort_week"] for r in rows}
    assert set(week0) == cohorts
    for n_active, size in week0.values():
        assert n_active == size
    # offsets never negative, actives never exceed the cohort
    for r in rows:
        assert r["week_offset"] >= 0
        assert 0 < r["n_active"] <= r["cohort_size"]
