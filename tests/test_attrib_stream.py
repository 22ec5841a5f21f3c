"""Stream-stream join: the cross-restart law that makes it a real
streaming operator and not a dressed-up batch join — impressions
buffered in JOIN STATE must match clicks that arrive in a LATER run
resuming from the same checkpoint, and already-emitted matches must
not re-emit (exactly-once per match across restarts)."""

import os
import shutil
import tempfile
from datetime import datetime, timedelta

import pytest

from ocular_spark.streaming.jobs import attrib_join_stream


@pytest.fixture()
def tmp_root():
    d = tempfile.mkdtemp(prefix="attrib_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _write(spark, rows, ddl, path, mode="overwrite"):
    spark.createDataFrame(rows, ddl).coalesce(1).write.mode(mode).parquet(path)


def test_join_state_survives_restart_no_reemission(spark, tmp_root):
    t0 = datetime(2026, 1, 1, 12, 0, 0)
    imps_dir = os.path.join(tmp_root, "imps")
    clicks_dir = os.path.join(tmp_root, "clicks")
    out_dir = os.path.join(tmp_root, "out")
    ckpt = os.path.join(tmp_root, "ckpt")

    # impressions arrive once, up front
    _write(
        spark,
        [(1, 100, t0), (1, 101, t0 + timedelta(minutes=5)),
         (2, 102, t0)],
        "imp_user long, imp_id long, imp_ts timestamp",
        imps_dir,
    )
    # batch 1 of clicks: user 1 clicks 10 min after t0 -> matches
    # imps 100 and 101; user 3 clicks (no impression) -> no match
    _write(
        spark,
        [(1, 900, t0 + timedelta(minutes=10)),
         (3, 901, t0 + timedelta(minutes=1))],
        "click_user long, click_id long, click_ts timestamp",
        clicks_dir,
    )
    q = attrib_join_stream(spark, imps_dir, clicks_dir, out_dir, ckpt)
    assert q.awaitTermination(300)
    first = {(r.imp_id, r.click_id)
             for r in spark.read.parquet(out_dir).collect()}
    assert first == {(100, 900), (101, 900)}

    # batch 2: a LATE click for user 2 lands in a new file; resuming
    # from the checkpoint must join it against the imp-state built in
    # run 1 (imp 102 was never matched) and must NOT re-emit run 1's
    _write(
        spark,
        [(2, 902, t0 + timedelta(minutes=20))],
        "click_user long, click_id long, click_ts timestamp",
        clicks_dir,
        mode="append",
    )
    q2 = attrib_join_stream(spark, imps_dir, clicks_dir, out_dir, ckpt)
    assert q2.awaitTermination(300)
    rows = [(r.imp_id, r.click_id)
            for r in spark.read.parquet(out_dir).collect()]
    assert sorted(rows) == sorted(
        [(100, 900), (101, 900), (102, 902)]
    ), "exactly the new match is appended, nothing re-emits"
    # window bound: a click outside 30 min must not match
    _write(
        spark,
        [(1, 903, t0 + timedelta(minutes=45))],
        "click_user long, click_id long, click_ts timestamp",
        clicks_dir,
        mode="append",
    )
    q3 = attrib_join_stream(spark, imps_dir, clicks_dir, out_dir, ckpt)
    assert q3.awaitTermination(300)
    rows = [(r.imp_id, r.click_id)
            for r in spark.read.parquet(out_dir).collect()]
    # 903 is 45 min after imp 100 (out of window) but 40 min after imp
    # 101 (also out) -> nothing new
    assert sorted(rows) == sorted(
        [(100, 900), (101, 900), (102, 902)]
    )
