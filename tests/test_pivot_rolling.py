"""Behavior pins for the pivot/crosstab and RANGE-frame rolling rows
(event_pivot, rolling_stats) beyond the generic oracle parity gate:
the absent-combo-means-zero contract and the exact frame boundary."""
import datetime

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as em


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )


def _run(q, spark, df, tmp_path):
    path = str(tmp_path / "events.parquet")
    df.write.mode("overwrite").parquet(path)
    # queries load f"{sf_dir}/events.parquet"
    return q(spark, str(tmp_path))


T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _ts(sec, micro=0):
    return T0 + datetime.timedelta(seconds=sec, microseconds=micro)


def test_event_pivot_absent_combo_is_zero(spark, tmp_path):
    """A user with NO events of a pivoted type must get 0 (not NULL)
    in both the _n and _cents columns — Spark's PivotFirst yields NULL
    for an empty cell and the query pins the COALESCE contract."""
    df = _events(
        spark,
        [
            (1, _ts(10), 7, "click", 1.25, "{}"),
            (2, _ts(20), 7, "click", 2.50, "{}"),
            (3, _ts(30), 8, "view", 0.10, "{}"),
        ],
    )
    out = {r["user_id"]: r for r in _run(
        em.q_event_pivot, spark, df, tmp_path).collect()}
    u7, u8 = out[7], out[8]
    assert u7["click_n"] == 2 and u7["click_cents"] == 125 + 250
    # absent combos are EXACT zero, never null
    for t in ("error", "purchase", "signup", "view"):
        assert u7[f"{t}_n"] == 0 and u7[f"{t}_cents"] == 0
    assert u8["view_n"] == 1 and u8["click_n"] == 0
    # no NULLs anywhere in the wide output
    row = u7.asDict()
    assert all(v is not None for v in row.values())


def test_event_pivot_width_is_type_vocabulary(spark, tmp_path):
    """Output width is pinned by _EVENT_TYPES (1 + 2*|types|), never
    by what the data happens to contain — the property that keeps the
    schema stable at any corpus scale."""
    df = _events(spark, [(1, _ts(0), 1, "click", 1.0, "{}")])
    out = _run(em.q_event_pivot, spark, df, tmp_path)
    assert len(out.columns) == 1 + 2 * len(em._EVENT_TYPES)


def test_rolling_stats_frame_boundary(spark, tmp_path):
    """The trailing-hour frame is [ts-3599, ts] on truncated integer
    seconds: an event exactly 3599 s earlier is IN, 3600 s earlier is
    OUT; a peer in the same truncated second is IN (RANGE includes
    peers); other users never contribute."""
    df = _events(
        spark,
        [
            (0, _ts(0), 1, "view", 1.00, "{}"),        # base
            (1, _ts(3599), 1, "view", 2.00, "{}"),     # in: gap 3599
            (2, _ts(7199), 1, "view", 4.00, "{}"),     # base+7199
            (3, _ts(3599, 999999), 1, "view", 8.00, "{}"),  # peer of 1
            (4, _ts(3599), 2, "view", 100.00, "{}"),   # other user
        ],
    )
    out = {r["event_id"]: r for r in _run(
        em.q_rolling_stats, spark, df, tmp_path).collect()}
    # event 1 at sec 3599: sees event 0 (gap 3599 -> in), its peer 3,
    # and itself; user 2's event never leaks in
    assert out[1]["n_1h"] == 3
    assert out[1]["cents_1h"] == 100 + 200 + 800
    # event 2 at sec 7199: event 0 is 7199 s back (out), events 1/3 at
    # truncated sec 3599 are 3600 s back (out) -> frame is itself only
    assert out[2]["n_1h"] == 1 and out[2]["cents_1h"] == 400
    # microsecond peer truncates to the same second and shares a frame
    assert out[3]["n_1h"] == out[1]["n_1h"]
    assert out[4]["n_1h"] == 1 and out[4]["cents_1h"] == 10000
