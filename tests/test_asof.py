"""Backward as-of join operator (ocular_spark/operators/asof.py):
hand-pinned semantics on a tiny frame + the scale contract in the
physical plan.  The driver gate (events_asof) checks it against
DuckDB's native ASOF LEFT JOIN — an independent second algorithm —
at sf0.01; these tests pin the edge semantics that fixture can't
isolate (exact-timestamp matches, no-prior-row NULLs, duplicate
right timestamps, left multiplicity)."""

import datetime as dt

import pytest

import __spark_entry__ as entry_mod
from ocular_spark.operators.asof import asof_join_backward


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


TS = dt.datetime(2024, 1, 1, 0, 0, 0)


def _t(sec):
    return TS + dt.timedelta(seconds=sec)


def test_asof_backward_hand_pinned(spark):
    left = spark.createDataFrame(
        [
            (1, "a", _t(10)),   # exact match with right ts=10 -> r2
            (2, "a", _t(9)),    # before 10, after 5 -> r1
            (3, "a", _t(4)),    # before any right row -> NULL
            (4, "b", _t(100)),  # key with no right rows -> NULL
            (5, "a", _t(99)),   # latest -> r2
            (6, "a", _t(9)),    # duplicate left (user, ts) -> r1 too
        ],
        "event_id long, k string, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [("a", _t(5), 101), ("a", _t(10), 102)],
        "k string, ts timestamp_ntz, rid long",
    )
    out = {
        r["event_id"]: r["rid"]
        for r in asof_join_backward(
            left, right, on=["k"], ts="ts", payload=["rid"]
        ).collect()
    }
    assert out == {1: 102, 2: 101, 3: None, 4: None, 5: 102, 6: 101}


def test_asof_duplicate_right_ts_picks_greatest_payload(spark):
    """Ties at identical (key, ts) on the right resolve to the
    greatest payload tuple — deterministic under any partitioning
    (DuckDB's ASOF is nondeterministic here, so the oracle-gated
    fixture dedupes; the operator itself must still be stable)."""
    left = spark.createDataFrame(
        [(1, "a", _t(20))], "event_id long, k string, ts timestamp_ntz"
    )
    right = spark.createDataFrame(
        [("a", _t(20), 7), ("a", _t(20), 9), ("a", _t(20), 8)],
        "k string, ts timestamp_ntz, rid long",
    )
    rows = asof_join_backward(
        left, right, on=["k"], ts="ts", payload=["rid"]
    ).collect()
    assert len(rows) == 1 and rows[0]["rid"] == 9


def test_asof_preserves_left_multiplicity_and_columns(spark):
    left = spark.createDataFrame(
        [(1, "a", _t(10), "x"), (1, "a", _t(10), "x")],
        "event_id long, k string, ts timestamp_ntz, extra string",
    )
    right = spark.createDataFrame(
        [("a", _t(1), 5)], "k string, ts timestamp_ntz, rid long"
    )
    out = asof_join_backward(left, right, on=["k"], ts="ts", payload=["rid"])
    assert out.columns == ["event_id", "k", "ts", "extra", "rid"]
    assert out.count() == 2


def test_asof_payload_collision_raises(spark):
    left = spark.createDataFrame([(1, "a", _t(1))], "rid long, k string, ts timestamp_ntz")
    right = spark.createDataFrame([("a", _t(1), 2)], "k string, ts timestamp_ntz, rid long")
    with pytest.raises(ValueError, match="collides"):
        asof_join_backward(left, right, on=["k"], ts="ts", payload=["rid"])


def test_events_asof_plan_one_shuffle_no_range_explosion(spark, sf_dir):
    """The 100 TB contract: ONE hash exchange on user_id feeding a
    window sort — never a range cross-product (no CartesianProduct /
    BroadcastNestedLoopJoin; in fact no join operator at all: the
    operator is Union + Exchange + Sort + Window)."""
    plan = _plan(entry_mod.q_events_asof(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "Join" not in plan
    exchanges = [
        l for l in plan.splitlines() if "Exchange hashpartitioning" in l
    ]
    assert len(exchanges) == 1, plan
    assert "user_id" in exchanges[0]
    assert "Window" in plan
